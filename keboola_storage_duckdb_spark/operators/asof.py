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
    if not right_cols:
        raise ValueError("asof_join requires at least one right column")
    lcols = left.columns
    rtypes = dict(right.dtypes)
    # kind 0 = right (sorts first at equal ts → inclusive as-of), 1 = left.
    # The right payload is carried as ONE struct so the match is atomic —
    # carrying columns independently with last(ignorenulls) would stitch
    # fields from *different* right rows whenever a right column is NULL.
    payload = F.struct(*[F.col(c).alias(c) for c in right_cols])
    r = right.select(
        F.col(on).alias("_k"), F.col(ts).alias("_t"), F.lit(0).alias("_kind"),
        payload.alias("_r"),
        *[F.lit(None).alias(f"_l_{c}") for c in lcols])
    struct_ddl = "struct<" + ",".join(
        f"{c}:{rtypes[c]}" for c in right_cols) + ">"
    l = left.select(
        F.col(on).alias("_k"), F.col(ts).alias("_t"), F.lit(1).alias("_kind"),
        F.lit(None).cast(struct_ddl).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols])
    u = r.unionByName(l)
    w = (Window.partitionBy("_k")
               .orderBy("_t", "_kind", F.col("_r"))
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_c"))
    return (carried.filter(F.col("_kind") == 1)
                   .select(*[F.col(f"_l_{c}").alias(c) for c in lcols],
                           *[F.col("_c")[c].alias(f"{c}{suffix}")
                             for c in right_cols]))
