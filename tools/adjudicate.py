"""Adjudicate a suspected per-query regression: run N alternating reps of
one or more registry queries inside ONE Spark session and print all-rep
timings + min/median per query.

The harness VM's CPU swings 3-4x between back-to-back runs (NOTES.md);
the ONLY trustworthy signal is the minimum over alternating reps in a
single session. This tool is the pattern NOTES reinvented by hand every
round (VERDICT r6 task #8) — point it at the query the driver's bench
record flagged, read the min, and compare against the prior round's
record before calling anything a regression.

Usage:  python tools/adjudicate.py QUERY [QUERY ...] [--reps N] [--sf DIR]
        python tools/adjudicate.py join_lineitem_part --reps 6
Alternating order: q1 q2 ... q1 q2 ... so every query samples every
contention window equally.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+", help="registry query name(s)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import __spark_entry__ as E
    from keboola_storage_duckdb_spark.session import get_spark

    registry = E.queries()
    missing = [q for q in args.queries if q not in registry]
    if missing:
        sys.exit(f"unknown queries: {missing}; see __spark_entry__.queries()")

    spark = get_spark(app_name="adjudicate")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()   # JVM warmup

    times: dict[str, list[float]] = {q: [] for q in args.queries}
    for rep in range(args.reps):
        for q in args.queries:
            t0 = time.perf_counter()
            registry[q](spark, args.sf).collect()
            dt = time.perf_counter() - t0
            times[q].append(dt)
            print(f"  rep {rep + 1}/{args.reps}  {q}: {dt:.3f}s",
                  file=sys.stderr)
            import gc
            gc.collect()

    print(f"{'query':<28} {'min':>8} {'median':>8} {'max':>8}  reps")
    for q, rs in times.items():
        print(f"{q:<28} {min(rs):>8.3f} {statistics.median(rs):>8.3f} "
              f"{max(rs):>8.3f}  {[round(r, 2) for r in rs]}")
    print("\nverdict rule: compare MIN against the prior round's record; "
          "a wide spread (max/min > 2) is VM contention, not code.")


if __name__ == "__main__":
    main()
