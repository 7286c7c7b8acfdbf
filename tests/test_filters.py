"""Filter grammar semantics (SURVEY §2.2) against hand-computed expectations."""

import pytest
from pyspark.sql import functions as F

from keboola_storage_duckdb_spark.operators import filters as KF


def test_typed_where_ops(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "s"])
    assert df.filter(KF.typed_where("id", "eq", [2])).count() == 1
    assert df.filter(KF.typed_where("id", "ne", [2])).count() == 2
    assert df.filter(KF.typed_where("id", "gt", [1])).count() == 2
    assert df.filter(KF.typed_where("id", "ge", [1])).count() == 3
    assert df.filter(KF.typed_where("id", "lt", [3])).count() == 2
    assert df.filter(KF.typed_where("id", "le", [3])).count() == 3
    assert df.filter(KF.typed_where("id", "eq", [1, 3])).count() == 2
    assert df.filter(KF.typed_where("id", "ne", [1, 3])).count() == 1


def test_typed_where_try_cast_null_on_error(spark):
    # dataType implies TRY_CAST of the column: non-numeric strings become
    # NULL and drop out of the comparison (DuckDB TRY_CAST semantics).
    df = spark.createDataFrame([("1",), ("2",), ("x",)], ["v"])
    got = df.filter(KF.typed_where("v", "ge", [2], data_type="INTEGER")).count()
    assert got == 1


def test_typed_where_rejects_bad_input(spark):
    with pytest.raises(KF.WhereClauseError):
        KF.typed_where("c", "eq", [])
    with pytest.raises(KF.WhereClauseError):
        KF.typed_where("c", "like", ["x"])
    with pytest.raises(KF.WhereClauseError):
        KF.typed_where("c", "gt", [1, 2])


def test_raw_where_blacklist():
    # mirrors reference src/database.py:5086-5094
    for bad in ["1=1; DROP TABLE x", "a -- b", "x /* y */", "drop me",
                "truncate t", "id in (select 1) and delete"]:
        with pytest.raises(KF.WhereClauseError):
            KF.validate_raw_where(bad)
    assert KF.validate_raw_where("a > 1 AND b = 'x'")


def test_ref_table_filter(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    ref = spark.createDataFrame([(2,), (9,)], ["r"])
    got_in = KF.ref_table_filter(df, "k", "IN", ref, "r").collect()
    got_out = KF.ref_table_filter(df, "k", "NOT_IN", ref, "r").collect()
    assert [r.k for r in got_in] == [2]
    assert sorted(r.k for r in got_out) == [1, 3]


def test_empty_to_null(spark):
    df = spark.createDataFrame([("",), ("x",), (None,)], ["v"])
    out = KF.empty_to_null(df, ["v"])
    assert out.filter(F.col("v").isNull()).count() == 2


def test_fulltext_spans_no_column_boundary(spark):
    # needle must not match across the \x01 separator
    df = spark.createDataFrame([("ab", "cd")], ["x", "y"])
    assert df.filter(KF.fulltext_search(df, "abcd")).count() == 0
    assert df.filter(KF.fulltext_search(df, "cd")).count() == 1


def test_change_interval(spark, sf_dir):
    from keboola_storage_duckdb_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    n = ev.filter(KF.change_interval("2024-01-10", None, column="ts")).count()
    m = ev.filter(KF.change_interval(None, "2024-01-10", column="ts")).count()
    assert n + m == ev.count()  # boundary belongs to both (>= and <=) only if exact hit
