"""Plan audit over the whole registry (r16 optimization round): for every
query, count Exchange nodes, per-table parquet scans, SinglePartition
exchanges, CartesianProduct/BroadcastNestedLoopJoin, and Python eval nodes
— flags duplicate-subtree plans (same table scanned >1x) and accidental
shuffles without executing the queries (builders with eager probe actions
do run those actions).

Usage: python tools/plan_audit.py [sf_dir] [query ...]
Writes a TSV report to stdout, sorted by (dup scans, exchanges) desc.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as E
    from keboola_storage_duckdb_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    registry = E.queries()
    names = sys.argv[2:] or list(registry)
    rows = []
    for name in names:
        try:
            df = registry[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as ex:  # noqa: BLE001 - audit must not die
            rows.append((name, -1, -1, -1, -1, -1, f"ERR {ex}"))
            continue
        exch = len(re.findall(r"^\(\d+\) Exchange", txt, re.M))
        single = txt.count("SinglePartition")
        scans = re.findall(r"file:[^\]\s]+?/(\w+)\.parquet", txt)
        per = {}
        for t in scans:
            per[t] = per.get(t, 0) + 1
        dups = {t: c for t, c in per.items() if c > 1}
        cart = (txt.count("CartesianProduct")
                + txt.count("BroadcastNestedLoopJoin"))
        pyev = txt.count("EvalPython") + txt.count("MapInPandas") \
            + txt.count("FlatMapGroupsInPandas")
        rows.append((name, exch, len(scans), sum(dups.values()), single,
                     cart, ",".join(f"{t}x{c}" for t, c in dups.items())
                     + (f" py={pyev}" if pyev else "")))
    rows.sort(key=lambda r: (-(r[3] if isinstance(r[3], int) else 0),
                             -(r[1] if isinstance(r[1], int) else 0)))
    print("query\texch\tscans\tdup_scans\tsingle_part\tnested_loop\tnotes")
    for r in rows:
        print("\t".join(str(x) for x in r))


if __name__ == "__main__":
    main()
