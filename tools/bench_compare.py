"""Side-by-side: our Spark bench vs DuckDB running the oracle SQL on the
same parquet at the same SF — the judge's 2×-budget yardstick, per query.

Usage: python tools/bench_compare.py [bench_json_file]
Reads the bench JSON (or runs DuckDB fresh against the latest timings you
paste), prints per-query ratios sorted worst-first and the total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

# must match the SF the Spark bench ran at (bench.py honors the same env)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    import duckdb

    import __spark_entry__ as E

    if len(sys.argv) > 1:
        bench = json.load(open(sys.argv[1]))["queries"]
    else:
        import subprocess

        out = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                             text=True, cwd="/root/repo")
        head = json.loads(out.stdout.strip().splitlines()[-1])
        # bench.py keeps stdout short (driver capture window); per-query
        # timings live in the sidecar it names
        bench = json.load(
            open(os.path.join("/root/repo", head["detail_file"])))["queries"]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    duck: dict[str, float] = {}
    for name, sql in E.oracle_sql().items():
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        a = time.perf_counter() - t0
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        duck[name] = round(min(a, time.perf_counter() - t0), 3)

    rows = []
    for name, d in duck.items():
        s = bench.get(name, -1)
        rows.append((s / d if d > 0 and s > 0 else float("inf"), name, s, d))
    rows.sort(reverse=True)
    print(f"{'query':28s} {'spark':>8s} {'duck':>8s} {'ratio':>7s}")
    for ratio, name, s, d in rows:
        print(f"{name:28s} {s:8.2f} {d:8.3f} {ratio:7.1f}")
    ts = sum(bench[n] for _, n, _, _ in rows if bench.get(n, -1) > 0)
    td = sum(duck.values())
    print(f"\nTOTAL oracle-matched: spark {ts:.1f}s vs duckdb {td:.1f}s "
          f"-> {ts / td:.2f}x (budget 2x)")


if __name__ == "__main__":
    main()
