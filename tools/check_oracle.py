"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the given scale factor, then compares
row count, column-name set, and an order-insensitive value multiset
(columns sorted by name). Reports bit-exact vs rounded(9) match so FP
drift is visible before the real driver runs.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = set(sys.argv[2:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v, ndigits=None):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, ndigits) if ndigits is not None else v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x, ndigits) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v) if ndigits is None else round(float(v), ndigits)
    except ImportError:
        pass
    return v


def multiset(rows, colnames, ndigits=None):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(norm_cell(r[i], ndigits) for i in order) for r in rows)


def main():
    import duckdb
    import __spark_entry__ as E
    from keboola_storage_duckdb_spark.session import get_spark

    spark = get_spark(app_name="check-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    certified = set(list(qs)[:50])
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            # complex-type audit (VERDICT r8 #2): the driver's pandas row
            # canonicalizer cannot sort ARRAY/MAP/STRUCT cells
            # (unhashable list — the r08 quality_verdict red). The local
            # tuple-sort compares lists fine, so this class is invisible
            # to the value check; ban the types outright in the
            # certification window (array_join / to_json them).
            from pyspark.sql.types import ArrayType, MapType, StructType
            complex_cols = [
                f"{f.name}:{f.dataType.simpleString()}"
                for f in sdf.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))]
            if complex_cols and name in certified:
                print(f"FAIL {name}: certified entry emits complex-typed "
                      f"columns the driver canon cannot sort: {complex_cols}")
                failures.append(name)
                continue
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"OK?  {name}: rows-only (no oracle), {len(srows)} rows")
            if not srows:
                failures.append(name)
            continue
        try:
            rel = con.sql(sql)
            # type audit (VERDICT r7 #2): the driver hash is TYPE-
            # sensitive; DuckDB widens integer SUMs to HUGEINT, which
            # Spark cannot emit — values equal, driver hash red. Catch
            # it here where the value compare is blind to it.
            bad_types = [
                f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
                if any(b in str(t).upper() for b in
                       ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER",
                        "USMALLINT", "UTINYINT"))]
            if name in certified:
                # driver canon cannot sort list/map/struct cells (r08)
                bad_types += [
                    f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
                    if "[]" in str(t)
                    or str(t).upper().startswith(("MAP(", "STRUCT("))]
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failures.append(name)
            continue

        problems = []
        if bad_types:
            problems.append(
                f"oracle emits Spark-unrepresentable types {bad_types}"
                " (CAST AS BIGINT)")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        exact = rounded = False
        if not problems:
            exact = multiset(srows, scols) == multiset(drows, dcols)
            rounded = exact or (multiset(srows, scols, 9) == multiset(drows, dcols, 9))
            if not rounded:
                problems.append("value mismatch")
                ms, md = multiset(srows, scols, 6), multiset(drows, dcols, 6)
                onlys = list((ms - md).items())[:3]
                onlyd = list((md - ms).items())[:3]
                problems.append(f"spark-only sample: {onlys}")
                problems.append(f"duck-only sample: {onlyd}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            tag = "exact" if exact else "round9"
            print(f"PASS {name}: {len(srows)} rows [{tag}]")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
