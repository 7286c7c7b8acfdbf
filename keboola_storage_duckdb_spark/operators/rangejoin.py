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

__all__ = ["bucketed_range_join"]


def bucketed_range_join(points: DataFrame, intervals: DataFrame,
                        t_col: str, start_col: str, end_col: str,
                        bucket: float, keys: list[str] | None = None,
                        ) -> DataFrame:
    """Inner-join ``points`` to every interval containing them:
    ``start <= t < end`` (half-open), optionally ANDed with equality on
    ``keys`` columns present on both sides. ``t_col``/``start_col``/
    ``end_col`` must be numeric (cast timestamps to epoch units first).
    Returns all point columns + all interval columns.

    ``bucket`` trades expansion for selectivity: intervals explode into
    ``(end-start)/bucket + 1`` rows each, and every bucket-mate pair is
    tested exactly once. Degenerate/inverted intervals (end <= start)
    produce nothing, like the predicate itself.
    """
    keys = keys or []
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
