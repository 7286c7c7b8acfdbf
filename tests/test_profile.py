"""Profiler parity: our moment formulas vs DuckDB's builtin estimators, and
the full profile_table pass."""

import math

import pytest
from pyspark.sql import functions as F

from keboola_storage_duckdb_spark.operators import profile as P


def test_moments_match_duckdb_builtins(lineitem, duck):
    """Our bias-corrected formulas == DuckDB SKEWNESS/KURTOSIS/STDDEV
    (semantic parity; tolerance because DuckDB streams in fp64)."""
    want = duck.execute("""
        SELECT avg(l_quantity), stddev(l_quantity),
               skewness(l_quantity), kurtosis(l_quantity)
        FROM lineitem""").fetchone()
    d = F.col("l_quantity").cast("decimal(9,2)")
    row = lineitem.agg(
        F.count("l_quantity").alias("n"),
        F.sum(d).cast("double").alias("s1"),
        F.sum(d * d).cast("double").alias("s2"),
        F.sum(d * d * d).cast("double").alias("s3"),
        F.sum((d * d) * (d * d)).cast("double").alias("s4"),
    ).collect()[0]
    got = P.moments_from_power_sums(row.n, row.s1, row.s2, row.s3, row.s4)
    assert got["mean"] == pytest.approx(want[0], rel=1e-9)
    assert got["stddev"] == pytest.approx(want[1], rel=1e-9)
    assert got["skewness"] == pytest.approx(want[2], rel=1e-6)
    assert got["kurtosis"] == pytest.approx(want[3], rel=1e-6)


def test_quantiles_match_duckdb(lineitem, duck):
    want = duck.execute(
        "SELECT quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]) FROM lineitem"
    ).fetchone()[0]
    got = lineitem.agg(F.expr(
        "percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))")).collect()[0][0]
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=1e-12)


def test_exact_quantiles_bitwise_match_builtin(lineitem):
    """The bounded-memory two-pass selection must be BIT-identical to
    Spark's percentile() — including when tiny bins force the recursive
    refinement round."""
    from keboola_storage_duckdb_spark.operators.quantiles import exact_quantiles

    probs = [0.01, 0.25, 0.5, 0.75, 0.99]
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    parr = "array(" + ",".join(f"CAST({p} AS DOUBLE)" for p in probs) + ")"
    ref = lineitem.agg(*[F.expr(f"percentile({c}, {parr})").alias(c)
                         for c in cols]).first()
    for kwargs in ({}, {"bins": 4, "max_inbin": 50}):
        got = exact_quantiles(lineitem, cols, probs, **kwargs)
        for c in cols:
            assert list(ref[c]) == got[c], (c, kwargs)


def test_exact_quantiles_grouped_bitwise_match_builtin(spark, sf_dir):
    """Grouped bounded-memory selection == per-group percentile(),
    bit-for-bit — orders.o_totalprice is the column where the one-sided
    lerp form provably differs in the last ulp, so this pins the exact
    Spark interpolation expression."""
    from keboola_storage_duckdb_spark.operators.quantiles import (
        exact_quantiles_grouped)
    from keboola_storage_duckdb_spark.sources.tables import load_table

    df = load_table(spark, sf_dir, "orders")
    parr = "array(CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(0.75 AS DOUBLE))"
    ref = {r.o_orderpriority: list(r.qs) for r in
           df.groupBy("o_orderpriority")
             .agg(F.expr(f"percentile(o_totalprice, {parr})").alias("qs"))
             .collect()}
    for kwargs in ({}, {"bins": 4, "max_inbin": 20}):
        got = exact_quantiles_grouped(df, "o_orderpriority", "o_totalprice",
                                      [0.25, 0.5, 0.75], **kwargs)
        assert got == ref, kwargs

    # null groups, all-null groups, null values
    d2 = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), (None, 5.0), (None, 7.0),
         ("c", 2.0), ("c", None), ("d", None)], "g string, v double")
    ref2 = {r.g: (list(r.qs) if r.qs is not None else [None]) for r in
            d2.groupBy("g").agg(F.expr("percentile(v, array(0.5D))")
                                 .alias("qs")).collect()}
    assert exact_quantiles_grouped(d2, "g", "v", [0.5]) == ref2


def test_grouped_quantiles_auto_routes_and_matches(spark, sf_dir):
    """grouped_quantiles_auto: BOTH routes of the density guard — native
    per-group percentile() below max_group_rows, bounded-memory frame
    above it — return bit-identical (group, n, qs) rows."""
    from keboola_storage_duckdb_spark.operators.quantiles import (
        grouped_quantiles_auto)
    from keboola_storage_duckdb_spark.sources.tables import load_table

    df = load_table(spark, sf_dir, "orders")
    parr = ("array(CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE), "
            "CAST(0.75 AS DOUBLE))")
    ref = {r.o_orderpriority: (r.n, list(r.qs)) for r in
           df.groupBy("o_orderpriority")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.expr(f"percentile(o_totalprice, {parr})").alias("qs"))
             .collect()}
    # guard wide open → native percentile route
    got_native = {r.o_orderpriority: (r.n, list(r.qs)) for r in
                  grouped_quantiles_auto(
                      df, "o_orderpriority", "o_totalprice",
                      [0.25, 0.5, 0.75]).collect()}
    # guard forced shut → bounded frame route
    got_frame = {r.o_orderpriority: (r.n, list(r.qs)) for r in
                 grouped_quantiles_auto(
                     df, "o_orderpriority", "o_totalprice",
                     [0.25, 0.5, 0.75], max_group_rows=1).collect()}
    assert got_native == ref
    assert got_frame == ref

    # null group keys / null values agree across routes too
    d2 = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), (None, 5.0), (None, 7.0),
         ("c", 2.0), ("c", None), ("d", None)], "g string, v double")
    a = {r.g: (r.n, list(r.qs) if r.qs is not None else None)
         for r in grouped_quantiles_auto(d2, "g", "v", [0.5]).collect()}
    b = {r.g: (r.n, list(r.qs) if r.qs is not None else None)
         for r in grouped_quantiles_auto(d2, "g", "v", [0.5],
                                         max_group_rows=1).collect()}
    assert a == b


def test_grouped_quantiles_hybrid_frame_bitwise_match_builtin(spark, sf_dir):
    """exact_quantiles_grouped_frame (driver-metadata hybrid, values
    resolved in-plan) == per-group percentile(), bit-for-bit, incl. the
    tiny-bins refinement branch; single-pass unpivot wrapper matches the
    ungrouped engine on every column."""
    import math

    from keboola_storage_duckdb_spark.operators.quantiles import (
        exact_quantiles, exact_quantiles_grouped_frame,
        exact_quantiles_single_pass)
    from keboola_storage_duckdb_spark.sources.tables import load_table

    df = load_table(spark, sf_dir, "orders")
    parr = ("array(CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE), "
            "CAST(0.75 AS DOUBLE))")
    ref = {r.o_orderpriority: list(r.qs) for r in
           df.groupBy("o_orderpriority")
             .agg(F.expr(f"percentile(o_totalprice, {parr})").alias("qs"))
             .collect()}
    for kwargs in ({}, {"bins": 4, "max_inbin": 20}):
        rows = exact_quantiles_grouped_frame(
            df, "o_orderpriority", "o_totalprice",
            [0.25, 0.5, 0.75], **kwargs).collect()
        assert {r.o_orderpriority: list(r.qs) for r in rows} == ref, kwargs

    # NaN / NULL / all-null-group semantics match percentile()
    d2 = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", float("nan")), (None, 5.0),
         (None, 7.0), ("c", 2.0), ("c", None), ("d", None)],
        "g string, v double")
    ref2 = {r.g: (list(r.qs) if r.qs is not None else None) for r in
            d2.groupBy("g")
              .agg(F.expr("percentile(v, array(0.5D, 0.9D))").alias("qs"))
              .collect()}
    got2 = {r.g: list(r.qs) for r in
            exact_quantiles_grouped_frame(d2, "g", "v", [0.5, 0.9])
            .collect()}
    for g, want in ref2.items():
        if want is None:
            assert got2[g] == [None, None]
        else:
            for gv, wv in zip(got2[g], want):
                assert (gv == wv) or (math.isnan(gv) and math.isnan(wv)), g

    # single-pass unpivot wrapper == ungrouped engine, every column
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    assert (exact_quantiles_single_pass(df, cols, [0.25, 0.5, 0.75])
            == exact_quantiles(df, cols, [0.25, 0.5, 0.75]))


def test_grouped_quantiles_df_bitwise_match_builtin(spark, sf_dir):
    """The fully-distributed single-DAG grouped path == per-group
    percentile(), bit-for-bit, including the max_inbin level-2 refinement
    branch; NULL/NaN/all-null groups match percentile semantics."""
    import math

    from keboola_storage_duckdb_spark.operators.quantiles import (
        grouped_quantiles_df)
    from keboola_storage_duckdb_spark.sources.tables import load_table

    df = load_table(spark, sf_dir, "orders")
    parr = ("array(CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE), "
            "CAST(0.75 AS DOUBLE))")
    ref = {r.o_orderpriority: list(r.qs) for r in
           df.groupBy("o_orderpriority")
             .agg(F.expr(f"percentile(o_totalprice, {parr})").alias("qs"))
             .collect()}
    nref = {r.o_orderpriority: r.n for r in
            df.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    for kwargs in ({}, {"bins": 4, "max_inbin": 20}):
        rows = grouped_quantiles_df(df, "o_orderpriority", "o_totalprice",
                                    [0.25, 0.5, 0.75], **kwargs).collect()
        assert {r.o_orderpriority: list(r.qs) for r in rows} == ref, kwargs
        assert {r.o_orderpriority: r.n for r in rows} == nref

    # null group keys, all-null groups, NULL values, NaN placement
    d2 = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", float("nan")), (None, 5.0),
         (None, 7.0), ("c", 2.0), ("c", None), ("d", None)],
        "g string, v double")
    ref2 = {r.g: (list(r.qs) if r.qs is not None else None) for r in
            d2.groupBy("g")
              .agg(F.expr("percentile(v, array(0.5D, 0.9D))").alias("qs"))
              .collect()}
    got2 = {r.g: list(r.qs) for r in
            grouped_quantiles_df(d2, "g", "v", [0.5, 0.9]).collect()}
    for g, want in ref2.items():
        if want is None:
            assert got2[g] == [None, None]
        else:
            for gv, wv in zip(got2[g], want):
                assert (gv == wv) or (math.isnan(gv) and math.isnan(wv)), g


def test_exact_quantiles_edge_cases(spark):
    from keboola_storage_duckdb_spark.operators.quantiles import exact_quantiles

    df = spark.createDataFrame(
        [(1.0, None, 5.0), (1.0, None, 2.5), (1.0, None, None)],
        "const double, nulls double, mixed double")
    got = exact_quantiles(df, ["const", "nulls", "mixed"], [0.0, 0.5, 1.0])
    assert got["const"] == [1.0, 1.0, 1.0]
    assert got["nulls"] == [None, None, None]
    assert got["mixed"] == [2.5, 3.75, 5.0]  # interpolated over 2 non-nulls


def test_exact_quantiles_nan_matches_builtin(spark):
    # Spark orders NaN above every double: percentile() counts NaN and
    # resolves top ranks to it. The bounded-memory engine must agree
    # instead of crashing on a NaN bin width (ADVICE r5, quantiles.py).
    import math

    from pyspark.sql import functions as F

    from keboola_storage_duckdb_spark.operators.quantiles import exact_quantiles

    rows = [(float(i),) for i in range(20)] + \
        [(float("nan"),)] * 3 + [(None,)] * 2
    df = spark.createDataFrame(rows, "v double")
    probs = [0.0, 0.25, 0.5, 0.9, 0.95, 1.0]
    ref = df.agg(F.expr(
        "percentile(v, array(0.0D,0.25D,0.5D,0.9D,0.95D,1.0D))")
        .alias("qs")).first().qs
    got = exact_quantiles(df, ["v"], probs)["v"]
    for g, r in zip(got, ref):
        assert (math.isnan(g) and math.isnan(r)) or g == r, (got, list(ref))
    # all-NaN column: every rank sits in the NaN region
    d2 = spark.createDataFrame([(float("nan"),)] * 4, "v double")
    got2 = exact_quantiles(d2, ["v"], [0.5])["v"]
    assert math.isnan(got2[0])


def test_profile_table_shape(spark, sf_dir):
    from keboola_storage_duckdb_spark.sources.tables import load_table

    df = load_table(spark, sf_dir, "orders")
    prof = P.profile_table(df)
    assert prof["row_count"] == df.count()
    assert prof["column_count"] == len(df.columns)
    by_name = {c["name"]: c for c in prof["columns"]}
    ok = by_name["o_orderkey"]
    assert ok["cardinality"] == "unique"
    assert ok["null_count"] == 0
    tp = by_name["o_totalprice"]
    assert tp["min"] is not None and tp["max"] is not None
    assert "quantiles" in tp and len(tp["quantiles"]) == 7
    assert 0 <= prof["quality_score"] <= 100
    # price correlates with nothing forced, but correlations list exists
    assert isinstance(prof["correlations"], list)


def test_profile_approx_distinct_within_hll_bounds(spark, sf_dir):
    """VERDICT r6 #6: approx_distinct=True serves distinct counts from
    the mergeable HLL sketch — every column's estimate lands within raw
    HLL error bounds (~1.6 % at m=4096; assert 6 % headroom for n ≪ m
    columns, where the estimator is near-exact) and the result is
    flagged distinct_estimated."""
    from keboola_storage_duckdb_spark.sources.tables import load_table

    df = load_table(spark, sf_dir, "orders")
    exact = P.profile_table(df)
    approx = P.profile_table(df, approx_distinct=True)
    assert approx.get("distinct_estimated") is True
    assert "distinct_estimated" not in exact
    ex = {c["name"]: c["distinct_count"] for c in exact["columns"]}
    ap = {c["name"]: c["distinct_count"] for c in approx["columns"]}
    assert set(ex) == set(ap)
    for name, true_d in ex.items():
        est = ap[name]
        assert abs(est - true_d) <= max(0.06 * true_d, 2.0), (
            name, true_d, est)
    # non-distinct stats identical between modes
    assert exact["row_count"] == approx["row_count"]
    # r7 review fixes: a key column keeps its 'unique' class under
    # estimation, the estimate never exceeds the non-null count, and
    # cardinality classes agree with exact mode everywhere
    exc = {c["name"]: c for c in exact["columns"]}
    apc = {c["name"]: c for c in approx["columns"]}
    assert exc["o_orderkey"]["cardinality"] == "unique"
    assert apc["o_orderkey"]["cardinality"] == "unique"
    order = ["constant", "very_low", "low", "medium", "high", "unique"]
    for name, c in apc.items():
        assert c["distinct_count"] <= c["non_null_count"], name
        # estimation near a ratio boundary may flip to the ADJACENT
        # class (o_custkey sits at ratio ~0.100); never further
        drift = abs(order.index(c["cardinality"])
                    - order.index(exc[name]["cardinality"]))
        assert drift <= 1, (name, c["cardinality"], exc[name]["cardinality"])


def test_approx_distinct_survives_hostile_column_names(spark):
    """Column names are data (CSV headers map verbatim): quotes and
    backticks must not break or inject into the stack() expression."""
    df = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, "y", 2.0)],
        ["it's", "a`b", "c\\d"])
    got = P.approx_distinct_counts(df, df.columns)
    assert got == {"it's": 3, "a`b": 2, "c\\d": 2}


def test_pattern_detection(spark):
    rows = [(f"user{i}@example.com", f"https://example.com/{i}", "10.0.0.%d" % i,
             "2025-01-31", "not-a-pattern") for i in range(20)]
    df = spark.createDataFrame(rows, ["email", "url", "ip", "d_iso", "plain"])
    prof = P.profile_table(df)
    pats = {c["name"]: c.get("patterns", []) for c in prof["columns"]}
    assert "email" in pats["email"]
    assert "url" in pats["url"]
    assert "ipv4" in pats["ip"]
    assert "date_iso" in pats["d_iso"]
    assert pats["plain"] == []


def test_quality_score_formula():
    assert P.quality_score(0, 0) == 100
    assert P.quality_score(2, 3) == 100 - 10 - 6
    assert P.quality_score(50, 50) == 0  # clamped


def test_cardinality_classes():
    assert P.cardinality_class(100, 100) == "unique"
    assert P.cardinality_class(1, 100) == "constant"
    assert P.cardinality_class(95, 100) == "high"
    assert P.cardinality_class(60, 100) == "medium"
    assert P.cardinality_class(20, 100) == "low"
    assert P.cardinality_class(2, 100) == "very_low"


def test_histogram_bins(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["x"])
    h = {r.bucket: r.cnt for r in P.histogram(df, "x", 0.0, 100.0, bins=10).collect()}
    assert sum(h.values()) == 100
    assert h[0] == 10 and h[9] == 10


def test_grouped_patterns_equal_per_row(spark, monkeypatch):
    """The distinct-value pattern evaluation (VERDICT r15 #4) must give
    the identical profile to the per-row regex block — including when a
    column routes HIGH-cardinality (forced via a tiny routing bound)."""
    rows = [(i,
             "user@example.com" if i % 3 == 0 else "nope",
             f"2024-01-{(i % 28) + 1:02d}",
             f"free text {i}",
             None if i % 7 == 0 else "10.0.0.%d" % (i % 256))
            for i in range(500)]
    df = spark.createDataFrame(
        rows, "id long, email string, d string, txt string, ip string")
    base = P.profile_table(df, grouped_patterns=False)
    grouped = P.profile_table(df, grouped_patterns=True)
    assert grouped == base
    # force every column through the high-card per-row branch too
    monkeypatch.setattr(P, "_GROUPED_PATTERN_BOUND", 0)
    forced_high = P.profile_table(df, grouped_patterns=True)
    assert forced_high == base
