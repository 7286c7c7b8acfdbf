"""Statistical table profiler (SURVEY.md §2.4, reference
src/database.py:5132-5437 ``get_table_profile`` / ``_get_column_stats``).

The reference issues one DuckDB query per column per statistic, serially.
Spark-first redesign: ONE ``df.agg(...)`` pass computes every per-column
aggregate for the whole table (count/non-null/min/max + exact decimal power
sums for moments + empty/whitespace/length stats), a second bounded pass
computes distinct counts + quantile-dependent stats (IQR outliers), and a
third single pass the correlation matrix. At 100 TB that is 2-3 scans with
map-side partial aggregation instead of O(columns × stats) scans.

Numeric moments use **exact decimal power sums** (S1..S4) followed by
deterministic IEEE double arithmetic (+,-,*,/,sqrt only — no pow/exp, which
are not correctly rounded and differ across libm implementations). This makes
skewness/kurtosis bit-reproducible and lets a DuckDB oracle running the same
formula hash-match exactly. DuckDB's builtins are the bias-corrected sample
estimators  G1 = g1*sqrt(n(n-1))/(n-2)  and  G2 = ((n+1)g2+6)(n-1)/((n-2)(n-3))
(verified numerically against DuckDB 1.0); Spark's builtins are population
g1/g2 — hence the formula-level reimplementation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Profiler pattern detectors (reference src/database.py:5439-5472;
# regexp_full_match is anchored — Spark rlike is substring search, so every
# pattern carries explicit ^…$ anchors).
PATTERNS: dict[str, str] = {
    "email": r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$",
    "uuid": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[1-5][0-9a-fA-F]{3}-[89abAB][0-9a-fA-F]{3}-[0-9a-fA-F]{12}$",
    "url": r"^https?://[^\s]+$",
    "phone": r"^\+?[0-9][0-9 \-()]{6,}$",
    "ipv4": r"^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$",
    "date_iso": r"^\d{4}-\d{2}-\d{2}$",
    "datetime_iso": r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}(:\d{2}(\.\d+)?)?$",
}
PATTERN_MATCH_THRESHOLD = 0.9  # share of non-null values that must match


def pattern_prefilter(c, name: str):
    """A cheap condition NECESSARILY implied by ``PATTERNS[name]`` (length
    bounds / required literal), placed left of the rlike so codegen's
    short-circuiting And skips the regex on the vast majority of
    non-matching rows. Counts are provably unchanged — each prefilter is
    entailed by its pattern (uuid is exactly 36 chars, emails contain
    '@', "0.0.0.0"–"255.255.255.255" spans 7–15 chars, …). This is where
    the 10× profile wall lived (r15, VERDICT r14 #7): the mega-agg ran
    |string cols| × |patterns| full regex execs per row."""
    if name == "email":
        return c.contains("@")
    if name == "uuid":
        return F.length(c) == 36
    if name == "url":
        return c.startswith("http")
    if name == "phone":
        # first char is '+' or a digit by the pattern — one substring
        # compare kills the regex on prose columns where the bare length
        # bound passes almost every row (the r16 profile-wall residue)
        return (F.length(c) >= 7) & F.substring(c, 1, 1).isin(
            "+", "0", "1", "2", "3", "4", "5", "6", "7", "8", "9")
    if name == "ipv4":
        return (F.length(c) >= 7) & (F.length(c) <= 15)
    if name == "date_iso":
        return (F.length(c) == 10) & (F.substring(c, 5, 1) == "-")
    if name == "datetime_iso":
        return (F.length(c) >= 16) & (F.substring(c, 5, 1) == "-")
    return F.lit(True)

NUMERIC_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                 T.FloatType, T.DoubleType, T.DecimalType)
STRING_TYPES = (T.StringType,)

QUANTILE_PROBS = [0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99]


def numeric_columns(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, NUMERIC_TYPES)]


def string_columns(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, STRING_TYPES)]


# ---------------------------------------------------------------------------
# Exact-decimal moment machinery
# ---------------------------------------------------------------------------

@dataclass
class DecimalSpec:
    """Decimal cast spec for a numeric column so that power sums up to
    ``max_power`` stay within DECIMAL(38) under BOTH Spark's and DuckDB's
    multiplication precision rules (p1+p2+1 capped at 38)."""
    precision: int
    scale: int
    max_power: int = 4

    @property
    def ddl(self) -> str:
        return f"DECIMAL({self.precision},{self.scale})"


def decimal_spec_for(df_or_stats, col: str, max_abs: float, scale: int = 2) -> DecimalSpec:
    """Pick the narrowest decimal that holds |x| ≤ max_abs with ``scale``
    fractional digits, and determine how many exact power sums fit."""
    int_digits = max(1, int(math.floor(math.log10(max(max_abs, 1)))) + 1)
    p = int_digits + scale
    # power k needs roughly k*p + (k-1) digits for the product type, +10 for sum
    max_power = 1
    for k in (2, 3, 4):
        prod_p = k * p + (k - 1)
        if prod_p <= 38:
            max_power = k
    return DecimalSpec(precision=p, scale=scale, max_power=max_power)


def power_sum_exprs(col: str, spec: DecimalSpec, alias_prefix: str) -> list[Column]:
    """Exact power sums S1..S4 (as far as the decimal budget allows) plus
    count of non-nulls. Products are built by repeated binary multiplication
    so Spark and DuckDB assign identical result types (p1+p2+1, s1+s2)."""
    d = F.col(col).cast(spec.ddl)
    exprs = [
        F.count(F.col(col)).alias(f"{alias_prefix}_n"),
        F.sum(d).cast("double").alias(f"{alias_prefix}_s1"),
    ]
    if spec.max_power >= 2:
        exprs.append(F.sum(d * d).cast("double").alias(f"{alias_prefix}_s2"))
    if spec.max_power >= 3:
        exprs.append(F.sum(d * d * d).cast("double").alias(f"{alias_prefix}_s3"))
    if spec.max_power >= 4:
        exprs.append(F.sum((d * d) * (d * d)).cast("double").alias(f"{alias_prefix}_s4"))
    return exprs


def moments_from_power_sums(n: float, s1: float, s2: float | None,
                            s3: float | None, s4: float | None) -> dict:
    """Driver-side: mean/stddev/skewness/kurtosis from power sums using the
    DuckDB (bias-corrected sample) estimator formulas."""
    out: dict[str, float | None] = {"mean": None, "stddev": None,
                                    "skewness": None, "kurtosis": None}
    if not n:
        return out
    mean = s1 / n
    out["mean"] = mean
    if s2 is None or n < 2:
        return out
    m2 = s2 / n - mean * mean            # population variance
    var_samp = (s2 - s1 * s1 / n) / (n - 1)
    out["stddev"] = math.sqrt(var_samp) if var_samp > 0 else 0.0
    if s3 is None or n < 3 or m2 <= 0:
        return out
    m3 = s3 / n - 3 * mean * (s2 / n) + 2 * mean ** 3
    g1 = m3 / (m2 * math.sqrt(m2))
    out["skewness"] = g1 * math.sqrt(n * (n - 1)) / (n - 2)
    if s4 is None or n < 4:
        return out
    m4 = (s4 / n - 4 * mean * (s3 / n) + 6 * mean * mean * (s2 / n)
          - 3 * mean ** 4)
    g2 = m4 / (m2 * m2) - 3
    out["kurtosis"] = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
    return out


# ---------------------------------------------------------------------------
# Cardinality / quality heuristics (driver-side Python over aggregates,
# mirroring reference src/database.py:5188-5341)
# ---------------------------------------------------------------------------

def cardinality_class(distinct: int, count: int,
                      estimated: bool = False) -> str:
    """``estimated=True`` (approx-distinct profile mode) widens the
    'unique' test to ratio ≥ 0.95 — an HLL estimate essentially never
    EQUALS the row count on a true key column (raw-HLL error ~1.6% at
    m=4096; 0.95 is ≈3σ), so the exact equality test would misclassify
    every primary key as merely 'high'."""
    if count == 0:
        return "constant"
    if distinct == count:
        return "unique"
    if distinct == 1:
        return "constant"
    if estimated and distinct / count >= 0.95:
        return "unique"
    ratio = distinct / count
    if ratio > 0.9:
        return "high"
    if ratio > 0.5:
        return "medium"
    if ratio > 0.1:
        return "low"
    return "very_low"


def quality_score(high_null_cols: int, outlier_cols: int) -> int:
    """Reference formula: 100 − 5·high_null_cols − 2·outlier_cols, clamped
    to [0,100] (src/database.py:5188-5257)."""
    return max(0, min(100, 100 - 5 * high_null_cols - 2 * outlier_cols))


# ---------------------------------------------------------------------------
# Full-table profile (engine API)
# ---------------------------------------------------------------------------

@dataclass
class ColumnProfile:
    name: str
    dtype: str
    count: int = 0
    null_count: int = 0
    distinct_count: int = 0
    stats: dict = field(default_factory=dict)
    patterns: list[str] = field(default_factory=list)
    cardinality: str = ""


def approx_distinct_counts(df: DataFrame, cols: list[str],
                           b_bits: int = 12) -> dict[str, int]:
    """Sketch-backed per-column distinct estimates in ONE pass — the
    100 TB profile's distinct engine. Same raw-HLL register math as the
    oracle-certified sketch (functions/sketch.py:hll_register_table) but
    built from ``xxhash64`` instead of md5+hex-conv: each column hashes
    to a long ON ITS NATIVE TYPE (no string cast), the long columns
    unpivot via ``stack`` (a map-side Expand, never a shuffle of raw
    rows), and one mergeable max-aggregation reduces everything to
    ≤ cols × 2^b_bits register rows. The exact ``countDistinct`` twin
    (profile_table's default) shuffles every distinct value; this
    shuffles register maxima only — measured at 10× lineitem: 99.2 MB /
    10.2 M records exact vs 3.2 MB / 241 k records sketch (31× fewer
    bytes, and the sketch side is BOUNDED by cols × 2^b_bits while the
    exact side grows with distinct-value volume — the difference between
    a profile that fits executor memory at 100 TB and one that doesn't).
    Wall time at local 10× is parity (shuffle is never the local
    bottleneck; NOTES r7). Raw-HLL relative error at m = 4096 is
    ~1.04/√m ≈ 1.6 %; the linear-counting branch below covers the n ≪ m
    range where the raw estimator biases high. md5 is reserved for the
    certified query path (hll_distinct) where DuckDB must reproduce the
    registers bit-for-bit; xxhash64 stays JVM-native and ~2× cheaper
    per value. The register→estimate math (ρ, scaled sum, α numerator)
    is SHARED with the certified sketch (functions/sketch.py) — only
    the hash differs."""
    from ..functions.sketch import (HLL_SCALED_SUM_EXPR,
                                    hll_alpha_numerator, hll_rho)

    m = 1 << b_bits
    n = len(cols)
    # NULL-mask before hashing: xxhash64(NULL) yields the seed, which
    # would count NULL as one extra distinct value; countDistinct skips
    # NULLs, so the estimate must too. Column names are data (CSV import
    # maps headers verbatim): escape quotes in the label literal, double
    # backticks in the identifier. Spark string literals also treat
    # backslash as an escape — double it FIRST, then the quotes.
    pairs = ", ".join(
        "'{lit}', IF(`{ident}` IS NULL, NULL, xxhash64(`{ident}`))".format(
            lit=c.replace("\\", "\\\\").replace("'", "''"),
            ident=c.replace("`", "``"))
        for c in cols)
    stacked = df.selectExpr(f"stack({n}, {pairs}) AS (col__, h__)") \
                .filter(F.col("h__").isNotNull())
    reg = F.col("h__").bitwiseAND(F.lit(m - 1))
    tail = F.expr(f"shiftrightunsigned(h__, {b_bits})") \
            .bitwiseAND(F.lit((1 << 48) - 1))
    regs = (stacked.select(F.col("col__"), reg.alias("register"),
                           hll_rho(tail).alias("rho"))
                   .groupBy("col__", "register")
                   .agg(F.max("rho").alias("max_rho")))
    rows = (regs.groupBy("col__")
                .agg(F.count(F.lit(1)).alias("registers_used"),
                     F.sum(F.expr(HLL_SCALED_SUM_EXPR)).alias("sum_scaled"))
                .collect())
    numerator = hll_alpha_numerator(m)
    out: dict[str, int] = {c: 0 for c in cols}   # all-NULL column → 0
    for r in rows:
        empty = m - r.registers_used
        est = numerator / (r.sum_scaled + empty * float(2 ** 49))
        # small-range correction (standard HLL linear counting): applied
        # driver-side on the collected scalars
        if est <= 2.5 * m and empty > 0:
            est = m * math.log(m / empty)
        out[r.col__] = int(round(est))
    return out


# A string column whose (approx) distinct count is under this bound runs
# its pattern regexes over the DISTINCT-VALUE table instead of per row
# (counts recovered exactly by weighting with the group frequencies):
# 65536 regex evaluations replace millions, and the groupBy shuffle is
# tiny because map-side combine collapses low-cardinality columns. High-
# cardinality columns (comments, ids) keep the per-row prefilter+rlike —
# a groupBy there would shuffle ~every row for no regex savings.
_GROUPED_PATTERN_BOUND = 65536


def profile_table(df: DataFrame, max_corr_cols: int = 10,
                  corr_threshold: float = 0.3, top_corr: int = 20,
                  approx_distinct: bool = False,
                  cache_scans: bool = False,
                  grouped_patterns: bool = True) -> dict:
    """Full profile: per-column stats, pattern detection, correlations,
    quality score. Bounded passes over the data; only aggregate scalars are
    collected to the driver.

    Job budget (was 8 before round 6's fusion):

    1. mega-agg — row count, per-column non-null counts, numeric
       min/max/avg/std/skew/kurt, string emptiness/length/pattern stats:
       one scan, one shuffle of aggregate rows only;
    2. EXACT distinct counts for every column, in their own agg —
       deliberately NOT fused with job 1: Catalyst plans multi-distinct
       via Expand (rows × (n_cols+1)), which re-evaluates every other
       aggregate's guard on the duplicated rows; fused was 2.2× slower
       than split at sf0.1 (A/B'd, 3 alternating reps).
       ``approx_distinct=True`` (VERDICT r6 #6) swaps this job for the
       mergeable-HLL sketch (:func:`approx_distinct_counts`): register
       maxima cross the shuffle instead of every distinct value — the
       right 100 TB profile mode; results carry
       ``distinct_estimated: true``. Exact stays the default (and the
       oracle-certified path);
    3. exact quantiles for EVERY numeric column — the ungrouped
       selection engine (all columns fused per scan, literal ranges, no
       joins) with its stats job skipped via job 1's counts/ranges:
       histogram scan + selection scan only;
    4. IQR outlier counts (bounds from the job-3 quantiles) FUSED with
       the correlation matrix into one agg.
    """
    num_cols = numeric_columns(df)
    str_cols = string_columns(df)

    # ---- job 1: everything computable in a single non-distinct agg ----
    exprs: list[Column] = [F.count(F.lit(1)).alias("total__")]
    for c in df.columns:
        exprs.append(F.count(F.col(c)).alias(f"nn__{c}"))
    for c in num_cols:
        d = F.col(c).cast("double")
        exprs += [F.min(c).cast("double").alias(f"min__{c}"),
                  F.max(c).cast("double").alias(f"max__{c}"),
                  F.avg(d).alias(f"avg__{c}"),
                  F.stddev_samp(d).alias(f"std__{c}"),
                  F.skewness(d).alias(f"skewpop__{c}"),
                  F.kurtosis(d).alias(f"kurtpop__{c}"),
                  F.count(F.when(F.isnan(d), True)).alias(f"nan__{c}"),
                  F.min(F.when(~F.isnan(d), d)).alias(f"qmin__{c}"),
                  F.max(F.when(~F.isnan(d), d)).alias(f"qmax__{c}")]
    for c in str_cols:
        exprs += [F.count(F.when(F.col(c) == "", 1)).alias(f"empty__{c}"),
                  F.count(F.when((F.col(c) != "") & (F.trim(F.col(c)) == ""), 1))
                   .alias(f"ws__{c}"),
                  F.avg(F.length(c)).alias(f"lavg__{c}"),
                  F.min(F.length(c)).alias(f"lmin__{c}"),
                  F.max(F.length(c)).alias(f"lmax__{c}")]
        if grouped_patterns:
            # routing signal only (exactness never depends on it): decides
            # per-row vs distinct-value pattern evaluation below
            exprs.append(F.approx_count_distinct(F.col(c))
                          .alias(f"apxd__{c}"))
        else:
            for pname, pat in PATTERNS.items():
                exprs.append(F.count(F.when(
                    pattern_prefilter(F.col(c), pname) & F.col(c).rlike(pat),
                    1)).alias(f"pat__{pname}__{c}"))

    def _pattern_job(apxd: dict) -> dict:
        """Pattern counts AFTER the mega-agg (VERDICT r15 #4, second bite
        of the 10x profile wall): low-cardinality columns evaluate the
        |patterns| regexes over their DISTINCT values, weighting matches
        by the group frequencies — exactly the per-row count, at
        cardinality-many regex executions instead of row-many. High-
        cardinality columns keep the per-row prefilter+rlike block. All
        low-card branches ride ONE action (union of 1-row aggs — Spark
        schedules the branch stages concurrently)."""
        from functools import reduce

        low = [c for c in str_cols
               if apxd.get(c, 0) <= _GROUPED_PATTERN_BOUND]
        high = [c for c in str_cols if c not in low]
        out: dict = {}
        branches = []
        for c in low:
            g = (df.groupBy(F.col(c).alias("v__"))
                   .agg(F.count(F.lit(1)).alias("f__")))
            branches.append(g.agg(
                *[F.sum(F.when(
                    pattern_prefilter(F.col("v__"), pname)
                    & F.col("v__").rlike(pat), F.col("f__")))
                   .alias(f"p__{pname}")
                  for pname, pat in PATTERNS.items()])
                .select(F.lit(c).alias("col__"), "*"))
        if branches:
            for r in reduce(lambda x, y: x.unionByName(y),
                            branches).collect():
                for pname in PATTERNS:
                    out[f"pat__{pname}__{r['col__']}"] = r[f"p__{pname}"]
        if high:
            hexprs = []
            for c in high:
                for pname, pat in PATTERNS.items():
                    hexprs.append(F.count(F.when(
                        pattern_prefilter(F.col(c), pname)
                        & F.col(c).rlike(pat), 1))
                        .alias(f"pat__{pname}__{c}"))
            out.update(df.agg(*hexprs).collect()[0].asDict())
        return out

    # jobs 1+2 are independent — submit the distinct-count agg from a
    # worker thread so the Spark scheduler interleaves both jobs' stages
    # (their stages leave cores idle at the tails; overlapping measured
    # 34% off the sequential profile wall at 10×). A second worker takes
    # the pattern job once the mega-agg's routing signal is in, so it
    # overlaps the quantile scans on the main thread.
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(2) as pool:
        if approx_distinct:
            fut_distinct = pool.submit(
                lambda: {f"d__{c}": v for c, v in
                         approx_distinct_counts(df, df.columns).items()})
        else:
            fut_distinct = pool.submit(
                lambda: df.agg(*[F.countDistinct(F.col(c)).alias(f"d__{c}")
                                 for c in df.columns]).collect()[0].asDict())
        row1 = df.agg(*exprs).collect()[0].asDict()
        total = row1["total__"]
        fut_patterns = None
        if grouped_patterns and str_cols:
            apxd = {c: row1.get(f"apxd__{c}", 0) or 0 for c in str_cols}
            fut_patterns = pool.submit(_pattern_job, apxd)

        # ---- jobs 3a-3b (quantiles) overlap the distinct job too ----
        row2 = None  # resolved after quantiles

        # ---- job 3: exact quantiles — bit-identical to percentile()
        # but never buffers a whole column in one aggregation buffer
        # (100 TB safe). The ungrouped engine fuses every column into one
        # histogram scan + one selection scan with LITERAL ranges (no
        # joins); its own stats job is skipped by injecting job 1's
        # counts/ranges ----
        # cache_scans=True persists the numeric projection across the
        # quantile engine's two passes + the outlier/corr agg. A/B-REFUTED
        # as a default at 10× (r15, VERDICT r14 #7): each stage alone is
        # ~2× faster on the cache (isolated probes), but the composition
        # LOSES — warm profile 29 s cached vs 22 s uncached, first call
        # 173 s vs 66 s — because the cache build serializes the pipeline
        # the thread-overlapped parquet jobs otherwise interleave. The
        # real 10× wall was the mega-agg's regex counts (fixed via
        # pattern_prefilter). Kept as an opt-in for deployments whose
        # scan is genuinely expensive (remote object store).
        num_df = df.select(*num_cols) if num_cols else None
        if num_df is not None and cache_scans:
            from pyspark import StorageLevel
            num_df = num_df.persist(StorageLevel.MEMORY_AND_DISK)
        if num_cols:
            from .quantiles import exact_quantiles
            pre = {c: (row1[f"nn__{c}"], row1[f"nan__{c}"],
                       row1[f"qmin__{c}"], row1[f"qmax__{c}"])
                   for c in num_cols}
            qvals = exact_quantiles(num_df, num_cols, list(QUANTILE_PROBS),
                                    precomputed_stats=pre)
            for c in num_cols:
                row1[f"q__{c}"] = qvals[c] if any(
                    v is not None for v in qvals[c]) else None
        row2 = fut_distinct.result()
        if fut_patterns is not None:
            row1.update(fut_patterns.result())

    # ---- job 4: IQR outlier counts (bounds from the quantiles) fused
    # with the correlation matrix (single multi-agg, no join — J4) ----
    oexprs = []
    bounds = {}
    for c in num_cols:
        q = row1.get(f"q__{c}")
        if q is None:
            continue
        q25, q75 = q[2], q[4]
        iqr = q75 - q25
        lo, hi = q25 - 1.5 * iqr, q75 + 1.5 * iqr
        bounds[c] = (lo, hi)
        oexprs.append(F.count(F.when((F.col(c) < lo) | (F.col(c) > hi), 1))
                       .alias(f"out__{c}"))
    corr_cols = num_cols[:max_corr_cols]
    cexprs = []
    for i, a in enumerate(corr_cols):
        for b in corr_cols[i + 1:]:
            cexprs.append(F.corr(F.col(a).cast("double"), F.col(b).cast("double"))
                           .alias(f"corr__{a}__{b}"))
    src34 = num_df if num_df is not None else df
    row34 = (src34.agg(*oexprs, *cexprs).collect()[0].asDict()
             if (oexprs or cexprs) else {})
    if num_df is not None and cache_scans:
        num_df.unpersist(blocking=False)
    row3 = row34
    row4 = {k: v for k, v in row34.items() if k.startswith("corr__")}
    correlations = []
    for k, v in row4.items():
        if v is not None and abs(v) > corr_threshold:
            _, a, b = k.split("__")
            correlations.append({"column_a": a, "column_b": b, "correlation": v})
    correlations.sort(key=lambda r: (-abs(r["correlation"]), r["column_a"], r["column_b"]))
    correlations = correlations[:top_corr]

    # ---- assemble ----
    columns: list[dict] = []
    high_null_cols = 0
    outlier_cols = 0
    dtype_by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for c in df.columns:
        nn = row1.get(f"nn__{c}", 0) or 0
        nulls = total - nn
        distinct = row2.get(f"d__{c}", 0) or 0
        if approx_distinct:
            # an HLL estimate may land above the non-null count; clamp so
            # distinct_count/ratios stay internally consistent
            distinct = min(distinct, nn)
        prof = {
            "name": c, "type": dtype_by_name[c], "count": total,
            "non_null_count": nn, "null_count": nulls,
            "null_ratio": (nulls / total) if total else 0.0,
            "distinct_count": distinct,
            "cardinality": cardinality_class(
                distinct, nn, estimated=approx_distinct),
        }
        if c in num_cols:
            prof.update({
                "min": row1.get(f"min__{c}"), "max": row1.get(f"max__{c}"),
                "avg": row1.get(f"avg__{c}"), "stddev": row1.get(f"std__{c}"),
                "quantiles": dict(zip([str(p) for p in QUANTILE_PROBS],
                                      row1.get(f"q__{c}") or [])),
                "outlier_count": row3.get(f"out__{c}", 0) or 0,
                "outlier_bounds": bounds.get(c),
            })
            if prof["outlier_count"]:
                outlier_cols += 1
        if c in str_cols:
            prof.update({
                "empty_count": row1.get(f"empty__{c}", 0) or 0,
                "whitespace_count": row1.get(f"ws__{c}", 0) or 0,
                "length_avg": row1.get(f"lavg__{c}"),
                "length_min": row1.get(f"lmin__{c}"),
                "length_max": row1.get(f"lmax__{c}"),
            })
            pats = []
            for pname in PATTERNS:
                hits = row1.get(f"pat__{pname}__{c}", 0) or 0
                if nn and hits / nn >= PATTERN_MATCH_THRESHOLD:
                    pats.append(pname)
            prof["patterns"] = pats
        if total and nulls / total > 0.5:
            high_null_cols += 1
        columns.append(prof)

    out = {
        "row_count": total,
        "column_count": len(df.columns),
        "columns": columns,
        "correlations": correlations,
        "quality_score": quality_score(high_null_cols, outlier_cols),
        "quality_issues": {
            "high_null_columns": high_null_cols,
            "outlier_columns": outlier_cols,
        },
    }
    if approx_distinct:
        out["distinct_estimated"] = True
    return out


# ---------------------------------------------------------------------------
# Histogram (A8): DuckDB HISTOGRAM() auto-buckets; we declare an explicit
# equal-width rule (bins over [min, max], last bin right-inclusive) that both
# engines can evaluate with floor arithmetic (DuckDB 1.0 has no width_bucket).
# ---------------------------------------------------------------------------

def histogram(df: DataFrame, col: str, lo: float, hi: float, bins: int = 10) -> DataFrame:
    """Equal-width histogram with declared bounds. Bin i covers
    [lo + i*w, lo + (i+1)*w) except the last bin which includes hi."""
    w = (hi - lo) / bins
    c = F.col(col).cast("double")
    bucket = F.least(F.floor((c - F.lit(lo)) / F.lit(w)), F.lit(bins - 1)).cast("int")
    return (df.filter((c >= lo) & (c <= hi))
              .groupBy(bucket.alias("bucket"))
              .agg(F.count(F.lit(1)).alias("cnt"))
              .withColumn("lo", (F.lit(lo) + F.col("bucket") * F.lit(w)))
              .withColumn("hi", (F.lit(lo) + (F.col("bucket") + 1) * F.lit(w)))
              .select("bucket", "lo", "hi", "cnt"))


# ---------------------------------------------------------------------------
# Pattern detection as a standalone relational operator (profiler piece
# A-patterns, reference src/database.py:5439-5472: regexp_full_match of 7
# anchored detectors per string column). One scan computes every
# (column, pattern) count; stack() reshapes the single agg row.
# ---------------------------------------------------------------------------

def pattern_counts(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col, pattern, n_nonnull, n_match, match_share) for every string
    column × detector. Anchored rlike == DuckDB regexp_full_match semantics
    (Spark rlike is substring search; PATTERNS carry ^…$ anchors)."""
    aggs = []
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
        for pname, pat in PATTERNS.items():
            aggs.append(F.count(F.when(
                pattern_prefilter(F.col(c), pname) & F.col(c).rlike(pat),
                1)).alias(f"m_{c}_{pname}"))
    one = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', '{p}', nn_{c}, m_{c}_{p}, "
        f"CAST(m_{c}_{p} AS DOUBLE) / nullif(nn_{c}, 0)"
        for c in cols for p in PATTERNS)
    n = len(cols) * len(PATTERNS)
    return one.selectExpr(
        f"stack({n}, {parts}) as (col, pattern, n_nonnull, n_match, match_share)")
