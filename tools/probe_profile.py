"""A/B the profile wall at 10x: profile_table over the scale_smoke
lineitem replica (6M rows), alternating grouped-pattern vs per-row
pattern evaluation inside one session (NOTES: never trust single draws).

Usage: python tools/probe_profile.py [--reps 3]
Requires .tmp/scale_smoke (run tools/scale_smoke.py once to build).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--table", default="lineitem")
    args = ap.parse_args()

    from keboola_storage_duckdb_spark.operators.profile import profile_table
    from keboola_storage_duckdb_spark.session import get_spark
    from keboola_storage_duckdb_spark.sources.tables import load_table

    spark = get_spark(app_name="probe_profile")
    spark.sparkContext.setLogLevel("ERROR")
    df = load_table(spark, "/root/repo/.tmp/scale_smoke", args.table)
    print(f"{args.table}: {df.count()} rows", file=sys.stderr)

    times = {"grouped": [], "per_row": []}
    results = {}
    for rep in range(args.reps):
        for mode, flag in (("grouped", True), ("per_row", False)):
            t0 = time.perf_counter()
            prof = profile_table(df, grouped_patterns=flag)
            dt = time.perf_counter() - t0
            times[mode].append(dt)
            results.setdefault(mode, prof)
            print(f"  rep {rep + 1} {mode}: {dt:.1f}s", file=sys.stderr)
    assert results["grouped"] == results["per_row"], "profiles diverged!"
    for mode in times:
        print(f"{mode}: min={min(times[mode]):.1f}s "
              f"all={[round(t, 1) for t in times[mode]]}")
    print("profiles identical: True")


if __name__ == "__main__":
    main()
