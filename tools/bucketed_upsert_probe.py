"""10×-scale probe of the bucket-scoped merge (VERDICT r13 #4 doneness):
quantify what `optimize_table(hash_bucket_by=PK)` buys a W3 incremental
import against the full stage-and-swap rewrite, on the ≈sf1 6M-row
lineitem replica.

Three measured paths, same staged delta semantics (update_duplicates):
  flat        — default layout: every merge is a full-table rewrite
  bucket-all  — bucketed layout, delta keys uniform over the PK space
                (a bulk delta hits every bucket: pruning can't help —
                 the honest bound)
  bucket-few  — bucketed layout, delta confined to 2 of N buckets (the
                targeted-fixup / late-data shape bucket pruning exists
                for: only those leaf dirs are read+merged+swapped)

Run: python tools/bucketed_upsert_probe.py [repl] [n_buckets]
Prints one JSON line; record the numbers in NOTES.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from keboola_storage_duckdb_spark.engine import StorageEngine  # noqa: E402
from keboola_storage_duckdb_spark.session import get_spark  # noqa: E402
from keboola_storage_duckdb_spark.sources.tables import load_table  # noqa: E402

REPL = int(sys.argv[1]) if len(sys.argv) > 1 else 10
NB = int(sys.argv[2]) if len(sys.argv) > 2 else 64
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WH = "/root/repo/.tmp/bucketed_probe_wh"


def main() -> None:
    import shutil

    spark = get_spark()
    shutil.rmtree(WH, ignore_errors=True)
    eng = StorageEngine(spark, WH)
    eng.create_project("p")
    eng.create_bucket("p", "in_c_b")

    li = load_table(spark, SRC, "lineitem")
    n0 = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    big = li
    for i in range(1, REPL):
        big = big.unionByName(
            li.withColumn("l_orderkey",
                          F.col("l_orderkey") + F.lit(int(i * n0))))
    from keboola_storage_duckdb_spark.catalog.types import (
        spark_to_duckdb_type)

    cols = [{"name": f.name,
             "type": spark_to_duckdb_type(f.dataType.simpleString()),
             "nullable": True} for f in big.schema.fields]
    pk = ["l_orderkey", "l_linenumber"]

    src_dir = os.path.join(WH, "_probe_src")
    big.repartition(32).write.mode("overwrite").parquet(src_dir)
    out: dict = {"repl": REPL, "n_buckets": NB}

    def mk(table: str) -> None:
        eng.create_table("p", "in_c_b", table, cols, primary_key=pk)
        t = time.time()
        eng.import_file("p", "in_c_b", table, src_dir,
                        file_format="parquet")
        out.setdefault("import_s", round(time.time() - t, 1))

    def delta(frame):
        return (frame.withColumn("l_comment", F.lit("probe-updated"))
                     .localCheckpoint())

    full = spark.read.parquet(src_dir)
    # uniform bulk delta: 5k keys spread over the whole PK space
    bulk = delta(full.filter(F.col("l_orderkey") % 1201 == 0))
    # targeted delta: only keys whose PK hashes into buckets {0, 1}
    bexpr = F.pmod(F.xxhash64(*[F.col(c) for c in pk]), F.lit(NB))
    few = delta(full.filter(bexpr.isin(0, 1))
                    .filter(F.col("l_orderkey") % 37 == 0))
    out["bulk_rows"] = bulk.count()
    out["few_rows"] = few.count()

    def _tree_bytes_newer(root: str, ts: float) -> int:
        total = 0
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                p = os.path.join(dirpath, fn)
                try:
                    st = os.stat(p)
                except OSError:
                    continue
                if st.st_mtime >= ts:
                    total += st.st_size
        return total

    def upsert(table: str, staged) -> tuple[float, int]:
        sd = os.path.join(WH, f"_stage_{table}_{int(time.time()*1e3)}")
        staged.write.mode("overwrite").parquet(sd)
        _, data_dir = eng.catalog.resolve_table("p", "in_c_b", table, None)
        mark = time.time()
        eng.import_file("p", "in_c_b", table, sd, file_format="parquet",
                        incremental=True, dedup_mode="update_duplicates")
        # bytes REWRITTEN by the merge — the metric that scales with the
        # table at 100 TB (walls on this VM are I/O-floor noise)
        _, data_dir = eng.catalog.resolve_table("p", "in_c_b", table, None)
        return round(time.time() - mark, 1), _tree_bytes_newer(data_dir,
                                                               mark)

    mk("flat")
    out["flat_upsert_bulk_s"], out["flat_bulk_bytes"] = upsert("flat", bulk)
    out["flat_upsert_few_s"], out["flat_few_bytes"] = upsert("flat", few)

    mk("bucketed")
    t = time.time()
    eng.optimize_table("p", "in_c_b", "bucketed",
                       hash_bucket_by=pk, n_hash_buckets=NB)
    out["optimize_s"] = round(time.time() - t, 1)
    out["bucketed_upsert_bulk_s"], out["bucketed_bulk_bytes"] = \
        upsert("bucketed", bulk)
    out["bucketed_upsert_few_s"], out["bucketed_few_bytes"] = \
        upsert("bucketed", few)
    ops = [o for o in eng.operations_log(50)
           if o.get("op") == "merge_hash_bucketed"]
    out["bucketed_merge_buckets"] = [o.get("buckets") for o in ops]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
