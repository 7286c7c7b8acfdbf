"""SparkSession factory with scale-oriented defaults.

The reference tunes DuckDB per-connection (``SET threads=4, memory_limit=4GB``,
src/config.py:52-57 in the reference). The Spark analog is a session configured
for adaptive execution, vectorized parquet IO, and a shuffle-partition count
sized to the deployment — small for local tests, large for a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[32] test harness; on a 1000-executor cluster
# shuffle partitions should be ~2-3x total cores (set via env/spark-submit).
DEFAULT_CONF = {
    # Adaptive query execution: runtime coalescing of shuffle partitions,
    # skew-join splitting, and dynamic join-strategy switching. At 100 TB the
    # static shuffle-partition count is always wrong for some stage; AQE fixes
    # it per-stage from runtime statistics.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic timestamps regardless of host TZ (oracle parity).
    "spark.sql.session.timeZone": "UTC",
    # Arrow for any pandas-UDF path (similarity / multimodal operators).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet: vectorized reader on, zstd to mirror the reference's snapshot
    # compression (src/routers/snapshots.py:198-237).
    "spark.sql.parquet.compression.codec": "zstd",
    # Broadcast joins for dimension tables up to 64 MB (region/nation/part
    # style dims stay broadcast even at sf100).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # ANSI off: the reference's TRY_CAST-based filter grammar wants
    # null-on-error cast semantics (we use try_cast explicitly anyway).
    "spark.sql.ansi.enabled": "false",
    # Unannotated parquet timestamp[us] columns (no isAdjustedToUTC flag)
    # would otherwise be inferred as TIMESTAMP_NTZ, while DuckDB reads the
    # same file as plain TIMESTAMP — breaking unix_micros() paths and oracle
    # type parity. With the session TZ pinned to UTC the two readings are
    # bit-identical, so always present TimestampType. load_table() also
    # casts defensively for sessions built elsewhere.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def get_spark(
    app_name: str = "keboola-storage-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    # local[N] runs everything in the driver JVM, whose default 1g heap OOMs
    # on shuffle-heavy operators (e.g. the inverted-index near-dup joins).
    # Only effective at JVM launch — getOrCreate passes it to spark-submit;
    # a no-op on an already-running session.
    conf.setdefault("spark.driver.memory",
                    os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"))
    conf.setdefault("spark.driver.maxResultSize", "4g")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def apply_session_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-created
    session (the driver hands us one in ``__spark_entry__.entry``)."""
    for k, v in DEFAULT_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a running session — keep its value
    return spark
