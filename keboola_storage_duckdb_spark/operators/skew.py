"""Skew-mitigation operators: salted aggregation and salted join.

AQE's skew-join splitting handles most cases at runtime
(`spark.sql.adaptive.skewJoin.enabled`, on in our session defaults); these
explicit forms are for the cases AQE can't fix — a single mega-hot key in a
shuffle *aggregation* (AQE cannot split one hash-group), and broadcast-
ineligible joins against a skewed key distribution.

Both are RESULT-IDENTICAL to their plain counterparts (tested) — salting is
a physical rewrite, not a semantic change.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, keys: list[str], aggs: list[Column],
               reaggs: list[Column], salt_col: Column,
               n_salts: int = 16) -> DataFrame:
    """Two-phase aggregation: phase 1 groups on (keys, salt) spreading each
    hot key over ``n_salts`` reducers; phase 2 combines the partials.

    ``aggs`` must be decomposable with matching ``reaggs`` (count→sum,
    sum→sum, min→min, max→max; avg must be expressed as sum+count). The
    caller picks ``salt_col`` (any well-distributed int, e.g. a row id)."""
    p1 = df.groupBy(*keys, (salt_col % n_salts).alias("__salt")).agg(*aggs)
    return p1.groupBy(*keys).agg(*reaggs)


def salted_join(skewed: DataFrame, small: DataFrame, key: str,
                n_salts: int = 8) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys and ``small`` is too large to
    broadcast: salt the skewed side (random-ish salt from a hash of all
    columns is NOT needed — a per-row uniform salt suffices), replicate the
    small side ``n_salts``× with an exploded salt column, join on
    (key, salt). Each hot key's rows now land on ``n_salts`` reducers.

    Row-multiplication cost: small side ×n_salts — choose n_salts from the
    observed skew factor. Result identical to ``skewed.join(small, key)``.
    """
    salted = skewed.withColumn(
        "__salt", (F.monotonically_increasing_id() % n_salts).cast("int"))
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = salted.join(replicated, on=[key, "__salt"])
    return out.drop("__salt")
