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


def test_minhash_index_incremental_equals_restricted_full(spark, sf_dir,
                                                          tmp_path):
    """Persisted MinHash index: querying the delta against the stored
    corpus artifacts == the full inline LSH pipeline over corpus ∪
    delta restricted to (corpus, delta) pairs (the md5 permutations are
    parameter-determined, so split computation changes nothing).
    add-then-query == rebuild-then-query."""
    from pyspark.sql import functions as F

    from keboola_storage_duckdb_spark.functions import dedup_ml as DM
    from keboola_storage_duckdb_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 9)
    delta = docs.filter(F.col("doc_id") % 10 == 9)
    p = str(tmp_path / "mh_idx")
    DM.minhash_index_build(corpus, "doc_id", "text", p)
    got = {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in
           DM.minhash_index_query(spark, p, delta, "doc_id", "text",
                                  0.8).collect()}
    full = DM.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8)
    want = set()
    for r in full.collect():
        a, b, j = r.id_a, r.id_b, round(r.jaccard, 9)
        # orient as (corpus id, delta id) — the index query's frame
        if a % 10 != 9 and b % 10 == 9:
            want.add((a, b, j))
        elif b % 10 != 9 and a % 10 == 9:
            want.add((b, a, j))
    assert got == want and got
    # incremental add under frozen params == rebuild
    half_a = corpus.filter(F.col("doc_id") % 2 == 0)
    half_b = corpus.filter(F.col("doc_id") % 2 == 1)
    p2 = str(tmp_path / "mh_add")
    DM.minhash_index_build(half_a, "doc_id", "text", p2)
    DM.minhash_index_add(spark, p2, half_b, "doc_id", "text")
    got2 = {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in
            DM.minhash_index_query(spark, p2, delta, "doc_id", "text",
                                   0.8).collect()}
    assert got2 == want
