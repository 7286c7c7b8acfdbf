"""Dump .explain("formatted") output for named registry queries into
plans/r17/<query>_<tag>.txt — the optimization round's before/after plan
evidence (guide §1: capture the plan shape before and after each change).

Usage: python tools/dump_r17_plans.py TAG QUERY [QUERY ...]
       python tools/dump_r17_plans.py before containment_dedup fuzzy_join_names
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as E
    from keboola_storage_duckdb_spark.session import get_spark

    spark = get_spark(app_name=f"plans-r17-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    registry = E.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r17")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = registry[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        txt = buf.getvalue()
        print(f"{name}: {txt.count('Exchange')} Exchange, "
              f"{txt.count('BroadcastHashJoin')} BHJ, "
              f"{txt.count('SortMergeJoin')} SMJ, "
              f"{txt.count('EvalPython')} PyEval -> {path}")


if __name__ == "__main__":
    main()
