"""Z-order data layout — multi-dimensional clustering for data skipping.

A 100 TB table is pruned at the scan by per-file min/max statistics
(parquet row-group / file footers; the same stats every lakehouse
format exposes). Sorting by ONE column gives perfect skipping on that
column and none on any other; interleaving the bits of two (or more)
normalized column keys — the Z-order / Morton curve (public: Morton
1966; used by Delta/Iceberg OPTIMIZE ZORDER) — gives each dimension
roughly √-of-total skipping, which is what multi-predicate scans want.

This module computes the Morton key and the DECISION FRAME: the same
rows bucketed (a) by the natural single-column layout and (b) by the
Z-order key, with per-bucket min/max spans of each dimension — the
span fraction IS the fraction of a point-predicate scan that canNOT be
skipped, so the frame directly reads as "what Z-ordering buys before
you pay the rewrite".

Exactness: keys are pure integer arithmetic — per-dim bucket =
((v − min) · 2¹⁶) DIV (range + 1), interleave = Σ bit shifts, bucket =
key >> (32 − log2 nbuckets) — every step exact BIGINT on both engines
(no doubles until the final span-fraction division of two exact ints).

Scale shape: one tiny min/max agg (broadcast as literals), a narrow
per-row map, one grouped agg with map-side partials. The actual
rewrite a table would run is `repartitionByRange(zkey)` +
`sortWithinPartitions(zkey)` — range-parallel, never a global sort on
one task. No reference counterpart (`/root/reference` has no layout
optimizer; its `optimize` verb is file compaction only — cited
`duckdb-api-service/src/duckdb_api/database.py` compaction path); part
of the brief's 100 TB-efficiency surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key_expr", "zorder_layout_frame"]

_BITS = 16                      # per-dimension key bits; 2 dims -> 32


def zorder_key_expr(x_col: str, y_col: str, x_min: int, x_range: int,
                    y_min: int, y_range: int):
    """Morton key of two integer columns, normalized to 16 bits each
    via exact integer scaling. All BIGINT arithmetic; bits of x land in
    even positions, y in odd."""
    xb = (f"(CAST({x_col} AS BIGINT) - CAST({x_min} AS BIGINT)) "
          f"* CAST(65536 AS BIGINT) DIV CAST({x_range} + 1 AS BIGINT)")
    yb = (f"(CAST({y_col} AS BIGINT) - CAST({y_min} AS BIGINT)) "
          f"* CAST(65536 AS BIGINT) DIV CAST({y_range} + 1 AS BIGINT)")
    # disjoint bit positions -> plain + is a bitwise OR; the aggregate
    # folds 16 exact integer terms per dimension
    return F.expr(
        f"aggregate(sequence(0, {_BITS - 1}), CAST(0 AS BIGINT), "
        f"(acc, i) -> acc "
        f"+ shiftleft((shiftright({xb}, i) & CAST(1 AS BIGINT)) "
        f"& CAST(1 AS BIGINT), 2 * i) "
        f"+ shiftleft((shiftright({yb}, i) & CAST(1 AS BIGINT)) "
        f"& CAST(1 AS BIGINT), 2 * i + 1))")


def zorder_layout_frame(rows: DataFrame, x_col: str, y_col: str,
                        n_buckets: int = 64) -> DataFrame:
    """The pay-for-the-rewrite decision frame: bucket the table two
    ways — ``natural`` (range buckets of ``x_col``, i.e. what a
    single-column sort gives) and ``zorder`` (range buckets of the
    Morton key) — and emit per (layout, bucket): row count, per-dim
    min/max, and the span fractions ``(max − min + 1)/range`` of each
    dimension. A bucket's span fraction is exactly the probability a
    uniform point predicate on that dimension CANNOT skip the bucket;
    natural gives ~1/n_buckets on x and ~1 on y, Z-order ~1/√n on
    both. ``n_buckets`` must be a power of two ≤ 2¹⁶ (the bucket is a
    pure shift of the 32-bit key — no sampling, no engine-specific
    range boundaries, so the DuckDB oracle is bit-identical)."""
    if n_buckets & (n_buckets - 1) or not 0 < n_buckets <= 65536:
        raise ValueError("n_buckets must be a power of two <= 65536")
    shift = 32 - (n_buckets.bit_length() - 1)
    base = rows.select(F.col(x_col).cast("long").alias("x"),
                       F.col(y_col).cast("long").alias("y")) \
               .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    lims = base.agg(F.min("x"), F.max("x"), F.min("y"), F.max("y")) \
               .collect()[0]
    x_min, x_range = int(lims[0]), int(lims[1] - lims[0])
    y_min, y_range = int(lims[2]), int(lims[3] - lims[2])

    zkey = zorder_key_expr("x", "y", x_min, x_range, y_min, y_range)
    # natural layout: 16-bit normalized x, high bits = bucket — the
    # same exact-integer bucketing, single-dimension
    xnorm = (f"(x - CAST({x_min} AS BIGINT)) * CAST(65536 AS BIGINT) "
             f"DIV CAST({x_range} + 1 AS BIGINT)")
    nat_bucket = F.expr(
        f"shiftright({xnorm}, {16 - (n_buckets.bit_length() - 1)})")
    keyed = base.select(
        "x", "y",
        F.shiftright(zkey, shift).alias("z_bucket"),
        nat_bucket.alias("n_bucket"))
    frames = []
    for layout, bcol in (("natural", "n_bucket"), ("zorder", "z_bucket")):
        frames.append(
            keyed.groupBy(F.col(bcol).alias("bucket"))
                 .agg(F.count(F.lit(1)).alias("n_rows"),
                      F.min("x").alias("x_min"), F.max("x").alias("x_max"),
                      F.min("y").alias("y_min"), F.max("y").alias("y_max"))
                 .withColumn("layout", F.lit(layout)))
    out = frames[0].unionByName(frames[1])
    xr = float(x_range + 1)
    yr = float(y_range + 1)
    return out.select(
        "layout", "bucket", "n_rows", "x_min", "x_max", "y_min", "y_max",
        ((F.col("x_max") - F.col("x_min") + F.lit(1)).cast("double")
         / F.lit(xr)).alias("x_span_frac"),
        ((F.col("y_max") - F.col("y_min") + F.lit(1)).cast("double")
         / F.lit(yr)).alias("y_span_frac"))
