"""As-of (point-in-time) join — a training-data / event-pipeline staple the
reference lacks (its only temporal operator is the changeSince/changeUntil
filter, reference src/grpc/handlers/schema.py:400-404; SURVEY §2.3 "no
range/as-of joins").

Spark has no native ASOF JOIN, but the classic union+window formulation is a
*better* plan at scale than a range join: one shuffle on the key, one
sort within partitions, zero row expansion — versus a range join's
candidate-pair blowup. DuckDB's native `ASOF JOIN` computes the same result,
which is what the oracle uses.

Scale notes (100 TB): the single shuffle partitions by join key; within each
key the window sort is linear. Skewed keys (one user with billions of rows)
would need key-salting with carry-over of the last left row per salt — not
needed at fixture scale, noted for the cluster deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              right_cols: list[str], suffix: str = "_asof") -> DataFrame:
    """For each left row, attach the columns of the most recent right row
    with ``right.ts <= left.ts`` and the same ``on`` key (inclusive match,
    ties broken toward the right row — i.e. a right row at exactly left.ts
    matches).

    Returns all left columns plus ``<right_col><suffix>`` columns (null when
    no prior right row exists).
    """
    lcols = left.columns
    # kind 0 = right (sorts first at equal ts → inclusive as-of), 1 = left
    r = right.select(
        F.col(on).alias("_k"), F.col(ts).alias("_t"), F.lit(0).alias("_kind"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        *[F.lit(None).alias(f"_l_{c}") for c in lcols])
    l = left.select(
        F.col(on).alias("_k"), F.col(ts).alias("_t"), F.lit(1).alias("_kind"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}")
          for c in right_cols],
        *[F.col(c).alias(f"_l_{c}") for c in lcols])
    u = r.unionByName(l)
    w = (Window.partitionBy("_k")
               .orderBy("_t", "_kind", f"_r_{right_cols[0]}")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.select(
        "*",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
          for c in right_cols])
    return (carried.filter(F.col("_kind") == 1)
                   .select(*[F.col(f"_l_{c}").alias(c) for c in lcols],
                           *[F.col(f"_c_{c}").alias(f"{c}{suffix}")
                             for c in right_cols]))
