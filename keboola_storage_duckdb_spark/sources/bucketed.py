"""Bucketed (co-located) table layout — the shuffle-elimination strategy
for repeated large-table joins at 100 TB.

A plain parquet join of two fact tables shuffles BOTH sides on the join
key every query. Writing the tables bucketed (hash-partitioned into a
fixed bucket count, sorted within buckets) records the co-location in the
session catalog, and Catalyst then plans repeated equi-joins/aggregations
on the bucket key with NO Exchange on either side — the per-query shuffle
cost is paid once at layout time. This is the Spark-native equivalent of
the reference engine keeping both tables ordered by key in one DuckDB file
(joins there are always local; reference src/database.py table files).

Rules of thumb encoded here:
  * bucket count ≈ max parallelism you want for the join stage (it caps
    the task count of the shuffle-free join);
  * both sides must be bucketed by the SAME key into the SAME count;
  * ``sortBy`` the key so the join can run as a sort-merge without a
    per-task sort.

`tests/test_plans.py::test_bucketed_join_is_shuffle_free` pins the
no-Exchange plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, key: str | list[str],
                   n_buckets: int = 32) -> None:
    """Persist ``df`` as a bucketed, sorted managed table (overwrite)."""
    keys = [key] if isinstance(key, str) else list(key)
    (df.write.mode("overwrite")
       .bucketBy(n_buckets, *keys)
       .sortBy(*keys)
       .saveAsTable(table_name))


def bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata (must go through
    the catalog — ``spark.read.parquet`` on the files would lose it)."""
    return spark.table(table_name)
