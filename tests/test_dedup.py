"""Import TRANSFORM dedup/merge modes (SURVEY §2.5) — semantics checks."""

import pytest

from keboola_storage_duckdb_spark.operators import dedup as KD


def _frames(spark):
    existing = spark.createDataFrame(
        [(1, "old1"), (2, "old2"), (3, "old3")], ["id", "val"])
    staging = spark.createDataFrame(
        [(2, "new2a", 1), (2, "new2b", 2), (4, "new4", 1)], ["id", "val", "seq"])
    return existing, staging


def test_update_duplicates_last_wins(spark):
    existing, staging = _frames(spark)
    out = KD.upsert_update_duplicates(existing, staging, ["id"], order_col="seq")
    got = {r.id: r.val for r in out.collect()}
    assert got == {1: "old1", 2: "new2b", 3: "old3", 4: "new4"}


def test_do_nothing_keeps_existing(spark):
    existing, staging = _frames(spark)
    out = KD.upsert_do_nothing(existing, staging, ["id"], order_col="seq")
    got = {r.id: r.val for r in out.collect()}
    assert got == {1: "old1", 2: "old2", 3: "old3", 4: "new4"}


def test_fail_on_duplicates_conflict(spark):
    existing, staging = _frames(spark)
    with pytest.raises(KD.DuplicateKeyError):
        KD.check_fail_on_duplicates(existing, staging, ["id"])


def test_fail_on_duplicates_internal_dupes(spark):
    existing, staging = _frames(spark)
    fresh = staging.filter("id = 2")  # no PK overlap with existing after filter? id=2 overlaps
    clean_existing = existing.filter("id = 99")
    with pytest.raises(KD.DuplicateKeyError):
        KD.check_fail_on_duplicates(clean_existing, fresh, ["id"])


def test_fail_on_duplicates_clean(spark):
    existing, staging = _frames(spark)
    ok = staging.filter("id = 4")
    KD.check_fail_on_duplicates(existing, ok, ["id"])  # must not raise


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], ["id", "val"])
    assert KD.exact_dedup(df).count() == 2
    out = KD.exact_dedup(df.withColumn("rk", df.id * 10), subset=["val"],
                         keep_order_col="rk")
    assert out.count() == 2
