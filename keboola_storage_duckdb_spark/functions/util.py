"""Shared helpers for compute-heavy operator stages."""

from __future__ import annotations

from pyspark.sql import DataFrame


def par(df: DataFrame, mult: int = 1) -> int:
    """Target partition count for compute-heavy stages: the session's core
    parallelism (not the input's — a single-row-group parquet scan or an
    AQE-coalesced shuffle can leave a tiny partition count feeding a stage
    whose cost is quadratic in its *output*, serializing the heavy work)."""
    return df.sparkSession.sparkContext.defaultParallelism * mult
