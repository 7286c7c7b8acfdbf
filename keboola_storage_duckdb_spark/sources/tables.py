"""Parquet table loading (S3/S9) with nanosecond-timestamp normalization.

Spark rejects parquet TIMESTAMP(NANOS) columns outright
(PARQUET_TYPE_ILLEGAL); DuckDB silently *truncates* ns → µs (verified:
epoch_us(ts) == ns // 1000). For oracle parity and for real-world ns data
(arrow-written event streams), we read ns columns via
``spark.sql.legacy.parquet.nanosAsLong`` and rebuild the timestamp with the
same truncation: ``timestamp_micros(ns div 1000)``. Floor-div == truncation
for the post-1970 data we target; documented limitation for pre-epoch rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to TIMESTAMP.

    Unannotated parquet timestamp[us] columns (no UTC-adjustment flag) are
    inferred as TIMESTAMP_NTZ when ``spark.sql.parquet.inferTimestampNTZ``
    is on (the PySpark 4.x default). DuckDB reads the identical file as
    plain TIMESTAMP, and ``unix_micros()`` rejects NTZ input. Under the
    engine's pinned UTC session timezone the NTZ->TIMESTAMP cast is
    bit-exact (equal unix_micros on both read paths), so the loader always
    presents TimestampType regardless of which session built it."""
    ntz = [f.name for f in df.schema.fields
           if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def _nanos_columns(path: str) -> list[str]:
    """Columns stored as parquet timestamp[ns] (pyarrow footer inspection —
    driver-side only, one footer read)."""
    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(path)
    except Exception:
        return []
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return out


# (applicationId, path) -> DataFrame plan. The fixture files are
# immutable, and a cached DataFrame is just a reusable logical plan (no
# materialized data), but building one costs ~200 ms driver-side (pyarrow
# footer read + JVM schema inference + file listing) — ~20 s of pure
# overhead across a full bench sweep without the cache. Mutable warehouse
# tables never come through this loader (engine.read_table has its own
# path), so staleness is not a concern.
_PLAN_CACHE: dict[tuple[str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one warehouse/testdata table; normalizes ns-timestamps so the
    logical schema always presents TIMESTAMP (µs) columns. Plans are
    memoized per (session, path) — the loader serves immutable fixtures."""
    path = f"{sf_dir}/{name}.parquet"
    key = (spark.sparkContext.applicationId, path)
    cached = _PLAN_CACHE.get(key)
    if cached is not None:
        return cached
    df = _load_table_uncached(spark, path)
    _PLAN_CACHE[key] = df
    return df


def _load_table_uncached(spark: SparkSession, path: str) -> DataFrame:
    ns_cols = _nanos_columns(path)
    if not ns_cols:
        return _normalize_ntz(spark.read.parquet(path))
    prev = spark.conf.get(_NANOS_CONF, "false")
    spark.conf.set(_NANOS_CONF, "true")
    try:
        df = spark.read.parquet(path)
        for c in ns_cols:
            df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
        return _normalize_ntz(df)
    finally:
        spark.conf.set(_NANOS_CONF, prev)


def register_views(spark: SparkSession, sf_dir: str, names: list[str],
                   prefix: str = "") -> None:
    """S9 analog: expose tables as temp views ``{prefix}{name}`` for
    spark.sql passthrough (reference ATTACHes per-table files read-only,
    src/pgwire_server.py:107-152)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(f"{prefix}{n}")
