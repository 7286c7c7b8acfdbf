"""Probe the tiled exact-cosine path past the broadcast bound.

Replicates sf0.1 embeddings (2k x 64 f32) to --n vectors with distinct
ids, then times the FULL cosine_near_dup_pairs (candidate + exact
verify) at each --rows-per-tile setting, alternating reps inside one
session (the only trustworthy signal on this VM — NOTES.md). Row count
of the output pair graph is printed per rep as a correctness anchor
(settings must agree or the A/B is void).

Usage: python tools/probe_cosine_tiled.py --n 200000 \
           --rows-per-tile 65536 131072 --reps 2
(rows_per_tile for dim=64: 65536 ~= 32 MB f64 tiles, 131072 ~= 64 MB.)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--rows-per-tile", type=int, nargs="+",
                    default=[65536, 131072])
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--threshold", type=float, default=0.95)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from keboola_storage_duckdb_spark.functions.similarity import (
        cosine_near_dup_pairs)
    from keboola_storage_duckdb_spark.session import get_spark

    spark = get_spark(app_name="probe_cosine_tiled")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(os.path.join(args.sf, "embeddings.parquet"))
    n_base = base.count()
    copies = (args.n + n_base - 1) // n_base
    rep = spark.range(copies).select(F.col("id").alias("copy"))
    df = (base.crossJoin(rep)
              .select((F.col("vec_id") + F.col("copy") * 10_000_000)
                      .alias("vec_id"), "embedding")
              .limit(args.n))
    path = "/root/repo/.tmp/probe_cosine_tiled"
    df.write.mode("overwrite").parquet(path)
    vecs = spark.read.parquet(path)
    print(f"fixture: {vecs.count()} vectors", file=sys.stderr)

    times: dict[int, list[float]] = {r: [] for r in args.rows_per_tile}
    counts: dict[int, int] = {}
    for rep_i in range(args.reps):
        for rpt in args.rows_per_tile:
            t0 = time.perf_counter()
            c = cosine_near_dup_pairs(vecs, "vec_id", "embedding",
                                      threshold=args.threshold,
                                      rows_per_tile=rpt).count()
            dt = time.perf_counter() - t0
            times[rpt].append(dt)
            counts.setdefault(rpt, c)
            print(f"rep {rep_i + 1} rows_per_tile={rpt}: {dt:.1f}s "
                  f"pairs={c}", file=sys.stderr)
            if counts[rpt] != c:
                print(f"  WARNING: pair count changed {counts[rpt]} -> {c}",
                      file=sys.stderr)
    for rpt in args.rows_per_tile:
        print(f"rows_per_tile={rpt}: min={min(times[rpt]):.1f}s "
              f"all={[round(t, 1) for t in times[rpt]]} pairs={counts[rpt]}")


if __name__ == "__main__":
    main()
