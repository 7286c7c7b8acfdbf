"""A/B adjudication for the exact ngram-Jaccard pair join (VERDICT r3/r4
task #2): PPJoin prefix path vs plain inverted-index join vs candidate
variants, timed with ALTERNATING reps inside ONE Spark session (the VM's
CPU swings 3-4x between back-to-back runs — NOTES.md discipline; never
trust a single run).

Usage:  python tools/ab_ngram.py [sf_dir] [reps]
Prints per-variant all-rep timings + min/median and a verdict line.
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from keboola_storage_duckdb_spark.session import get_spark  # noqa: E402
from keboola_storage_duckdb_spark.sources.tables import load_table  # noqa: E402
from keboola_storage_duckdb_spark.functions import dedup_ml as DM  # noqa: E402


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-ngram")
    docs = load_table(spark, sf_dir, "documents").cache()
    docs.count()

    variants = {
        "prefix": lambda: DM.ngram_jaccard_prefix_pairs(
            docs, "doc_id", "text", threshold=0.8),
        "prefix_nopos": lambda: DM.ngram_jaccard_prefix_pairs(
            docs, "doc_id", "text", threshold=0.8, positional=False),
        "inverted": lambda: DM.ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.8, pack_ids=True),
    }

    # result parity first (cheap, and guards the A/B itself)
    counts = {k: v().count() for k, v in variants.items()}
    assert len(set(counts.values())) == 1, f"variant outputs differ: {counts}"
    print(f"parity OK: every variant returns {counts['prefix']} pairs")

    times: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(reps):
        for name, build in variants.items():
            t0 = time.perf_counter()
            materialize(build())
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"rep {rep + 1} {name:14s} {dt:6.2f} s", flush=True)

    print("\n== summary ==")
    best = None
    for name, ts in times.items():
        mn, md = min(ts), statistics.median(ts)
        print(f"{name:14s} min {mn:6.2f}  median {md:6.2f}  all "
              + " ".join(f"{t:.2f}" for t in ts))
        if best is None or mn < best[1]:
            best = (name, mn)
    print(f"\nwinner (by min): {best[0]} at {best[1]:.2f} s")
    spark.stop()


if __name__ == "__main__":
    main()
