"""Persisted ANN index lifecycle (VERDICT r10 #1/#2): build/add/merge/
search against the in-line certified kernels, plus plan-shape pins —
search must never read raw vectors or retrain."""

import os

import pytest
from pyspark.sql import functions as F

from keboola_storage_duckdb_spark.functions import ann_index as AI
from keboola_storage_duckdb_spark.functions.similarity import (
    ivfpq_ann_topk, pq_ann_topk)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from keboola_storage_duckdb_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 10)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_build_then_search_equals_inline(spark, emb, queries, tmp_path):
    """The persisted path must be bit-identical to the train-inline
    kernel (same deterministic training, codes round-trip as ints,
    codebooks round-trip exactly through JSON)."""
    idx = AI.pq_index_build(emb, "vec_id", "embedding",
                            str(tmp_path / "pq"))
    got = _rows(AI.pq_index_search(spark, idx, queries, "vec_id",
                                   "embedding", k=5))
    want = _rows(pq_ann_topk(emb, queries, "vec_id", "embedding", k=5))
    assert got == want and len(got) == 50


def test_ivfpq_build_then_search_equals_inline(spark, emb, queries,
                                               tmp_path):
    idx = AI.pq_index_build(emb, "vec_id", "embedding",
                            str(tmp_path / "ivfpq"), label_col="label")
    got = _rows(AI.pq_index_search(spark, idx, queries, "vec_id",
                                   "embedding", k=5, nprobe=2))
    want = _rows(ivfpq_ann_topk(emb, queries, "vec_id", "embedding",
                                "label", k=5, nprobe=2))
    assert got == want and len(got) == 50


def test_add_then_search_equals_rebuild_same_cb(spark, emb, queries,
                                                tmp_path):
    """FAISS Index.add semantics: encoding is per-row deterministic
    given frozen codebooks, so append-then-search == encode-everything
    search with the same codebooks."""
    base = emb.filter(F.col("vec_id") % 10 != 9)
    delta = emb.filter(F.col("vec_id") % 10 == 9)
    p = str(tmp_path / "pq_add")
    idx = AI.pq_index_build(base, "vec_id", "embedding", p)
    AI.pq_index_add(spark, p, delta, "vec_id", "embedding")
    got = _rows(AI.pq_index_search(spark, p, queries, "vec_id",
                                   "embedding", k=5))
    want = _rows(pq_ann_topk(emb, queries, "vec_id", "embedding", k=5,
                             cb=idx.cb))
    assert got == want and len(got) == 50


def test_merge_equals_full_and_rejects_foreign_codebooks(spark, emb,
                                                         queries,
                                                         tmp_path):
    full = AI.pq_index_build(emb, "vec_id", "embedding",
                             str(tmp_path / "full"))
    sa, sb = str(tmp_path / "sa"), str(tmp_path / "sb")
    AI.pq_index_build(emb.filter(F.col("vec_id") % 2 == 0), "vec_id",
                      "embedding", sa, cb=full.cb)
    AI.pq_index_build(emb.filter(F.col("vec_id") % 2 == 1), "vec_id",
                      "embedding", sb, cb=full.cb)
    AI.pq_index_merge(spark, sa, sb, str(tmp_path / "merged"))
    got = _rows(AI.pq_index_search(spark, str(tmp_path / "merged"),
                                   queries, "vec_id", "embedding", k=5))
    want = _rows(AI.pq_index_search(spark, full, queries, "vec_id",
                                    "embedding", k=5))
    assert got == want
    # shards must share ONE trained codebook — a shard trained on its
    # own half has different codebooks and must be rejected
    AI.pq_index_build(emb.filter(F.col("vec_id") % 2 == 1), "vec_id",
                      "embedding", str(tmp_path / "sb_own"))
    with pytest.raises(ValueError, match="share one trained codebook"):
        AI.pq_index_merge(spark, sa, str(tmp_path / "sb_own"),
                          str(tmp_path / "bad"))


def test_ensure_reuses_warm_index(spark, emb, sf_dir, tmp_path):
    """Second ensure call must NOT rebuild (the warm serving path):
    the codes table's files are untouched."""
    src = os.path.join(sf_dir, "embeddings.parquet")
    AI.ensure_pq_index(spark, emb, src, "vec_id", "embedding",
                       str(tmp_path))
    codes_dir = None
    for d in os.listdir(tmp_path):
        codes_dir = os.path.join(tmp_path, d, "codes")
    before = sorted(os.listdir(codes_dir))
    mtimes = {f: os.stat(os.path.join(codes_dir, f)).st_mtime_ns
              for f in before}
    AI.ensure_pq_index(spark, emb, src, "vec_id", "embedding",
                       str(tmp_path))
    after = sorted(os.listdir(codes_dir))
    assert after == before
    assert all(os.stat(os.path.join(codes_dir, f)).st_mtime_ns
               == mtimes[f] for f in after)
    # different params → different fingerprint → a second index dir
    AI.ensure_pq_index(spark, emb, src, "vec_id", "embedding",
                       str(tmp_path), m=8, ksub=4)
    assert len(os.listdir(tmp_path)) == 2


def test_search_plan_reads_codes_only(spark, emb, queries, tmp_path):
    """Scale pins: the search scan must read the codes table (m ints),
    never the raw embedding column; routing joins broadcast; no
    CartesianProduct / SinglePartition."""
    idx = AI.pq_index_build(emb, "vec_id", "embedding",
                            str(tmp_path / "ivfpq"), label_col="label")
    df = AI.pq_index_search(spark, idx, queries, "vec_id", "embedding",
                            k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the streamed corpus side scans the persisted codes table; every
    # scan of the raw embeddings parquet must carry the vec_id < 10
    # QUERY pushdown — i.e. no full-corpus raw-vector scan anywhere
    assert "codes" in plan, plan
    for line in plan.splitlines():
        if "FileScan" in line and "embeddings.parquet" in line:
            assert "vec_id" in line and "< 10" in line, line
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan


def test_lut_search_equals_inline_lut(spark, emb, queries, tmp_path):
    """The persisted LUT serving path must be bit-identical to the
    train-inline LUT kernel (same codebooks, same subspace-order cell
    sums)."""
    from keboola_storage_duckdb_spark.functions.similarity import (
        pq_ann_topk_lut)

    idx = AI.pq_index_build(emb, "vec_id", "embedding",
                            str(tmp_path / "pq"))
    got = _rows(AI.pq_index_search_lut(spark, idx, queries, "vec_id",
                                       "embedding", k=5))
    want = _rows(pq_ann_topk_lut(emb, queries, "vec_id", "embedding",
                                 k=5))
    assert got == want and len(got) == 50
    # and the LUT form agrees with the fold form row-for-row (ranking
    # identity — different arithmetic order, same round-6 values)
    fold = _rows(AI.pq_index_search(spark, idx, queries, "vec_id",
                                    "embedding", k=5))
    assert got == fold


def test_indexed_rerank_equals_inline(spark, emb, queries, tmp_path):
    from keboola_storage_duckdb_spark.functions.similarity import (
        ivfpq_rerank_topk)

    idx = AI.pq_index_build(emb, "vec_id", "embedding",
                            str(tmp_path / "ivfpq"), label_col="label")
    got = _rows(AI.pq_index_rerank(spark, idx, emb, queries, "vec_id",
                                   "embedding", k=5, nprobe=2,
                                   shortlist=20))
    want = _rows(ivfpq_rerank_topk(emb, queries, "vec_id", "embedding",
                                   "label", k=5, nprobe=2, shortlist=20))
    assert got == want and len(got) == 50


def test_index_quality_frames(spark, emb, tmp_path):
    """Distortion: positive per list, totals match the corpus, and mean
    = sum/n. Imbalance: >= 1 by Cauchy-Schwarz (== 1 iff perfectly
    balanced lists), extremes bracket the mean list size."""
    idx = AI.pq_index_build(emb, "vec_id", "embedding",
                            str(tmp_path / "ivfpq"), label_col="label")
    dist = AI.pq_index_distortion(spark, idx, emb, "vec_id",
                                  "embedding", "label").collect()
    assert sum(r.n_vectors for r in dist) == emb.count()
    for r in dist:
        assert r.sum_distortion > 0
        assert abs(r.mean_distortion - r.sum_distortion / r.n_vectors) \
            < 1e-12
    st = AI.ivf_list_stats(spark, idx).collect()[0]
    assert st.imbalance >= 1.0
    assert st.min_list <= st.n_vectors / st.n_lists <= st.max_list
    assert st.n_vectors == emb.count()
    # a PQ-only index has no lists to report on
    AI.pq_index_build(emb, "vec_id", "embedding", str(tmp_path / "pq"))
    with pytest.raises(ValueError, match="no IVF labels"):
        AI.ivf_list_stats(spark, str(tmp_path / "pq"))


def test_merge_rejects_overlapping_shards(spark, emb, tmp_path):
    """Shard id sets must be disjoint (ADVICE r11): overlap would union
    into duplicate postings and rank the same neighbor twice."""
    full = AI.pq_index_build(emb, "vec_id", "embedding",
                             str(tmp_path / "ov_full"))
    sa, sb = str(tmp_path / "ov_a"), str(tmp_path / "ov_b")
    AI.pq_index_build(emb.filter(F.col("vec_id") % 2 == 0), "vec_id",
                      "embedding", sa, cb=full.cb)
    AI.pq_index_build(emb.filter(F.col("vec_id") % 3 == 0), "vec_id",
                      "embedding", sb, cb=full.cb)  # overlaps at % 6 == 0
    with pytest.raises(ValueError, match="share vector ids"):
        AI.pq_index_merge(spark, sa, sb, str(tmp_path / "ov_out"))


def test_compact_shrinks_files_search_unchanged(spark, emb, queries,
                                                tmp_path):
    """Index compaction (VERDICT r11 #5): repeated adds accumulate
    small parquet files; compaction coalesces lists past max_files,
    atomically, with search results byte-unchanged."""
    base = emb.filter(F.col("vec_id") % 10 == 0)
    p = str(tmp_path / "cmp")
    AI.pq_index_build(base, "vec_id", "embedding", p, label_col="label")
    for rem in range(1, 10):    # nine appends -> many files per list
        AI.pq_index_add(spark, p, emb.filter(F.col("vec_id") % 10 == rem),
                        "vec_id", "embedding")
    before = _rows(AI.pq_index_search(spark, p, queries, "vec_id",
                                      "embedding", k=5, nprobe=2))
    codes_dir = os.path.join(p, "codes")
    leaf = sorted(n for n in os.listdir(codes_dir)
                  if n.startswith("label="))[0]
    n_before = len([f for f in os.listdir(os.path.join(codes_dir, leaf))
                    if f.endswith(".parquet")])
    assert n_before > 4     # the add path really did fragment
    report = AI.pq_index_compact(spark, p, max_files=4)
    assert report, "no list was compacted"
    for leaf_name, (nb, na) in report.items():
        assert na < nb and na >= 1, report
    n_after = len([f for f in os.listdir(os.path.join(codes_dir, leaf))
                   if f.endswith(".parquet")])
    assert n_after <= 4
    # no stray staging/old dirs inside the codes table (partition
    # discovery must stay clean)
    assert all(n.startswith(("label=", "_", "."))
               for n in os.listdir(codes_dir)), os.listdir(codes_dir)
    after = _rows(AI.pq_index_search(spark, p, queries, "vec_id",
                                     "embedding", k=5, nprobe=2))
    assert after == before
    # idempotent: a second compaction finds nothing to do
    assert AI.pq_index_compact(spark, p, max_files=4) == {}


def test_compact_unlabeled_codes_table(spark, emb, queries, tmp_path):
    p = str(tmp_path / "cmp_flat")
    AI.pq_index_build(emb.filter(F.col("vec_id") % 2 == 0), "vec_id",
                      "embedding", p)
    for _ in range(6):
        AI.pq_index_add(spark, p,
                        emb.filter(F.col("vec_id") % 97 == 1).limit(5),
                        "vec_id", "embedding")
    # NOTE: duplicate adds above are fine for the file-count mechanics
    # being tested; search correctness is covered by the labeled test
    codes_dir = os.path.join(p, "codes")
    n_before = len([f for f in os.listdir(codes_dir)
                    if f.endswith(".parquet")])
    assert n_before > 4
    report = AI.pq_index_compact(spark, p, max_files=4)
    assert report and "codes" in report
    n_after = len([f for f in os.listdir(codes_dir)
                   if f.endswith(".parquet")])
    assert n_after <= 4


def test_filtered_search_equals_prefiltered_inline(spark, emb, queries,
                                                   tmp_path):
    """filter_labels (VERDICT r11 #7): search restricted to allowed
    inverted lists == the inline PQ kernel over the pre-filtered
    corpus with the same codebooks (training unchanged — it never
    reads labels)."""
    idx = AI.pq_index_build(emb, "vec_id", "embedding",
                            str(tmp_path / "filt"), label_col="label")
    got = _rows(AI.pq_index_search(spark, idx, queries, "vec_id",
                                   "embedding", k=5,
                                   filter_labels=[1, 3, 5, 7]))
    want = _rows(pq_ann_topk(
        emb.filter(F.col("label").isin(1, 3, 5, 7)), queries,
        "vec_id", "embedding", k=5, cb=idx.cb))
    assert got == want and len(got) == 50
    # filter + nprobe compose: routed lists ⊆ allowed lists
    both = AI.pq_index_search(spark, idx, queries, "vec_id",
                              "embedding", k=5, nprobe=2,
                              filter_labels=[1, 3, 5, 7])
    labels = {r["label"] for r in
              idx.codes(spark).join(
                  both.select(F.col("neighbor_id").alias("id")), "id")
                 .select("label").distinct().collect()}
    assert labels <= {1, 3, 5, 7}, labels


def test_corrupt_meta_falls_back_to_rebuild(spark, emb, sf_dir, tmp_path):
    """A truncated/corrupt meta.json must read as 'rebuild', never
    crash the serving query (ADVICE r11: json.JSONDecodeError is a
    ValueError, not an OSError)."""
    src = os.path.join(sf_dir, "embeddings.parquet")
    base = str(tmp_path / "corrupt_base")
    idx = AI.ensure_pq_index(spark, emb, src, "vec_id", "embedding", base)
    with open(os.path.join(idx.path, "meta.json"), "w") as f:
        f.write('{"m": 4, "ksub"')        # truncated mid-key
    again = AI.ensure_pq_index(spark, emb, src, "vec_id", "embedding",
                               base)
    assert again.meta["cb"] == idx.meta["cb"]


def test_stream_index_add_equals_batch(spark, emb, queries, tmp_path):
    """Streaming ingestion (r12): micro-batched encode-and-append
    against frozen codebooks == one batch add == rebuild with the same
    codebooks, regardless of micro-batch boundaries (encoding is
    per-row deterministic)."""
    base = emb.filter(F.col("vec_id") % 10 != 9)
    delta = emb.filter(F.col("vec_id") % 10 == 9)
    p = str(tmp_path / "stream_idx")
    idx = AI.pq_index_build(base, "vec_id", "embedding", p)
    src = str(tmp_path / "delta_src")
    # several files -> several micro-batches with maxFilesPerTrigger=1
    delta.repartition(3).write.parquet(src)
    q = AI.stream_index_add(spark, p, src, delta.schema, "vec_id",
                            "embedding", str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = _rows(AI.pq_index_search(spark, p, queries, "vec_id",
                                   "embedding", k=5))
    want = _rows(pq_ann_topk(emb, queries, "vec_id", "embedding", k=5,
                             cb=idx.cb))
    assert got == want and len(got) == 50
    # restart with the same checkpoint: nothing new -> no re-append
    n_files = len([f for f in os.listdir(os.path.join(p, "codes"))
                   if f.endswith(".parquet")])
    q2 = AI.stream_index_add(spark, p, src, delta.schema, "vec_id",
                             "embedding", str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    n_files2 = len([f for f in os.listdir(os.path.join(p, "codes"))
                    if f.endswith(".parquet")])
    assert n_files2 == n_files
    # ADVICE r12 (low): a live feed needs a non-availableNow trigger —
    # the parameter must reach writeStream (unbounded, so stop() it)
    q3 = AI.stream_index_add(spark, p, src, delta.schema, "vec_id",
                             "embedding", str(tmp_path / "ckpt"),
                             trigger={"processingTime": "1 hour"})
    assert q3.isActive
    q3.stop()


def test_filtered_lut_search_equals_filtered_fold(spark, emb, queries,
                                                  tmp_path):
    """filter_labels on the LUT serving path == the reconstruction-fold
    filtered search row-for-row (different arithmetic order, same
    round-6 values — the certified LUT identity restricted to the
    allowed lists)."""
    idx = AI.pq_index_build(emb, "vec_id", "embedding",
                            str(tmp_path / "flut"), label_col="label")
    got = _rows(AI.pq_index_search_lut(spark, idx, queries, "vec_id",
                                       "embedding", k=5,
                                       filter_labels=[1, 3, 5, 7]))
    want = _rows(AI.pq_index_search(spark, idx, queries, "vec_id",
                                    "embedding", k=5,
                                    filter_labels=[1, 3, 5, 7]))
    assert got == want and len(got) == 50


def test_trained_quantizer_ivfpq_full_probe_equals_pq(spark, emb,
                                                      queries, tmp_path):
    """Persisted trained-quantizer IVFPQ (r12): probing every trained
    list is a no-op filter, so nprobe >= n_clusters must equal plain PQ
    search with the same codebooks; route_metric round-trips; shards
    with different route metrics refuse to merge."""
    from keboola_storage_duckdb_spark.functions.clustering import (
        kmeans_fit)

    labeled, cents = kmeans_fit(emb, "vec_id", "embedding", k=4, rounds=2)
    p = str(tmp_path / "tq")
    idx = AI.pq_index_build(labeled, "id", "v", p, label_col="cluster",
                            centroids=[[i, c] for i, c in
                                       enumerate(cents)],
                            route_metric="l2")
    assert AI.pq_index_load(spark, p).meta["route_metric"] == "l2"
    got = _rows(AI.pq_index_search(spark, idx, queries, "vec_id",
                                   "embedding", k=5, nprobe=4))
    flat = AI.pq_index_build(emb, "vec_id", "embedding",
                             str(tmp_path / "flat"), cb=idx.cb)
    want = _rows(AI.pq_index_search(spark, flat, queries, "vec_id",
                                    "embedding", k=5))
    assert got == want and len(got) == 50


def test_delete_equals_rebuild_without_deleted(spark, emb, queries,
                                               tmp_path):
    """FAISS remove_ids semantics: codes of survivors are untouched and
    codebooks stay frozen, so delete-then-search == rebuild over the
    survivor corpus with the SAME codebooks."""
    path = str(tmp_path / "del")
    full = AI.pq_index_build(emb, "vec_id", "embedding", path,
                             label_col="label")
    report = AI.pq_index_delete(
        spark, path, emb.filter(F.col("vec_id") % 7 == 3)
                        .select("vec_id"), id_col="vec_id")
    assert report["deleted"] == emb.filter(
        F.col("vec_id") % 7 == 3).count()
    got = _rows(AI.pq_index_search(spark, path, queries, "vec_id",
                                   "embedding", k=5))
    want_idx = AI.pq_index_build(
        emb.filter(F.col("vec_id") % 7 != 3), "vec_id", "embedding",
        str(tmp_path / "ref"), label_col="label", cb=full.cb)
    want = _rows(AI.pq_index_search(spark, want_idx, queries, "vec_id",
                                    "embedding", k=5))
    assert got == want and len(got) == 50
    # nothing deleted may surface as a neighbor
    bad = {r.neighbor_id for r in AI.pq_index_search(
        spark, path, queries, "vec_id", "embedding", k=5).collect()
        if r.neighbor_id % 7 == 3}
    assert not bad


def test_delete_rewrites_only_affected_leaves(spark, emb, tmp_path):
    """Targeted delete: posting lists without a deleted id keep their
    parquet files byte-identical (at 100 TB a delete touches a handful
    of partitions, never the corpus)."""
    path = str(tmp_path / "leafdel")
    AI.pq_index_build(emb, "vec_id", "embedding", path,
                      label_col="label")
    codes = os.path.join(path, "codes")

    def leaf_files(leaf):
        d = os.path.join(codes, leaf)
        return sorted((n, os.path.getsize(os.path.join(d, n)))
                      for n in os.listdir(d) if n.endswith(".parquet"))

    # ids confined to one label -> exactly one leaf rewritten
    victims = [r.vec_id for r in emb.filter(F.col("label") == 2)
                                    .select("vec_id").limit(3).collect()]
    before = {leaf: leaf_files(leaf)
              for leaf in os.listdir(codes) if leaf.startswith("label=")}
    report = AI.pq_index_delete(spark, path, victims)
    assert report["leaves_rewritten"] == ["label=2"]
    assert report["deleted"] == 3
    for leaf, files in before.items():
        if leaf != "label=2":
            assert leaf_files(leaf) == files, leaf
    # absent ids are a no-op
    report2 = AI.pq_index_delete(spark, path, [-1, -2])
    assert report2 == {"deleted": 0, "leaves_rewritten": []}


def test_delete_all_of_a_list_removes_the_leaf(spark, emb, tmp_path):
    path = str(tmp_path / "emptyleaf")
    AI.pq_index_build(emb, "vec_id", "embedding", path,
                      label_col="label")
    codes = os.path.join(path, "codes")
    ids = [r.vec_id for r in emb.filter(F.col("label") == 5)
                                .select("vec_id").collect()]
    AI.pq_index_delete(spark, path, ids)
    assert "label=5" not in os.listdir(codes)
    labels = {r.label for r in AI.pq_index_load(spark, path)
                               .codes(spark).select("label")
                               .distinct().collect()}
    assert 5 not in labels


def test_rrf_fuse_arithmetic_and_missing_sides(spark):
    """RRF pin: a doc ranked by both systems beats a single-system doc
    of equal best rank; a missing side contributes exactly 0; score is
    1/(60+ra) + 1/(60+rb)."""
    from keboola_storage_duckdb_spark.functions.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id int, neighbor_id int, rank int")
    b = spark.createDataFrame(
        [(1, 10, 2), (1, 12, 1)], "query_id int, neighbor_id int, rank int")
    rows = {r.neighbor_id: (r.rrf_score, r.rank)
            for r in rrf_fuse(a, b, k=3).collect()}
    assert rows[10][0] == 1.0 / 61 + 1.0 / 62      # both systems
    assert rows[12][0] == 1.0 / 61                 # b only
    assert rows[11][0] == 1.0 / 62                 # a only
    assert rows[10][1] == 1                        # fused winner
    assert rows[12][1] == 2 and rows[11][1] == 3   # 1/61 > 1/62


def test_centroid_drift_zero_before_add_positive_after(spark, emb,
                                                       tmp_path):
    """Stored centroids ARE the build-time member means, so drift == 0
    right after build; adding held-out vectors against frozen
    centroids makes it strictly positive somewhere."""
    base = emb.filter(F.col("vec_id") % 10 != 9)
    path = str(tmp_path / "drift")
    AI.pq_index_build(base, "vec_id", "embedding", path,
                      label_col="label")
    zero = AI.ivf_centroid_drift(spark, path, emb, "vec_id",
                                 "embedding", "label").collect()
    assert all(r.drift == 0.0 for r in zero)
    AI.pq_index_add(spark, path, emb.filter(F.col("vec_id") % 10 == 9),
                    "vec_id", "embedding")
    after = AI.ivf_centroid_drift(spark, path, emb, "vec_id",
                                  "embedding", "label").collect()
    assert any(r.drift > 0.0 for r in after)
    assert {r.label: r.n_vectors for r in after} == {
        r.label: r.n for r in emb.groupBy(F.col("label"))
                                 .agg(F.count("*").alias("n")).collect()}


def test_sq8_build_then_search_equals_inline(spark, emb, queries,
                                             tmp_path):
    """Persisted SQ8 == inline sq8_ann_topk: the stored uint8 code is
    exactly the inline clamp-floor value and lo + code*s reproduces the
    inline reconstruction bit-for-bit."""
    from keboola_storage_duckdb_spark.functions.similarity import (
        sq8_ann_topk)

    idx = AI.sq8_index_build(emb, "vec_id", "embedding",
                             str(tmp_path / "sq8"))
    got = _rows(AI.sq8_index_search(spark, idx, queries, "vec_id",
                                    "embedding", k=5))
    want = _rows(sq8_ann_topk(emb, queries, "vec_id", "embedding", k=5))
    assert got == want and len(got) == 50


def test_code_agnostic_verbs_work_on_sq8_index(spark, emb, queries,
                                               tmp_path):
    """delete and compact only touch (id, codes) — they must operate on
    an SQ8 index unchanged: delete-then-search == rebuild over the
    survivor corpus with the SAME trained grid."""
    path = str(tmp_path / "sq8del")
    idx = AI.sq8_index_build(emb, "vec_id", "embedding", path)
    report = AI.pq_index_delete(
        spark, path, emb.filter(F.col("vec_id") % 7 == 3)
                        .select("vec_id"), id_col="vec_id")
    assert report["deleted"] > 0
    AI.pq_index_compact(spark, path, max_files=0)
    got = _rows(AI.sq8_index_search(spark, path, queries, "vec_id",
                                    "embedding", k=5))
    # survivors re-encoded against the SAME stored grid
    from keboola_storage_duckdb_spark.functions.similarity import (
        sq8_encode)
    ref = str(tmp_path / "sq8ref")
    surv = emb.filter(F.col("vec_id") % 7 != 3)
    os.makedirs(ref)
    (sq8_encode(surv, "vec_id", "embedding",
                trained=(idx.meta["lo"], idx.meta["hi"]))
     .write.mode("overwrite").parquet(os.path.join(ref, "codes")))
    AI._write_meta(ref, idx.meta)
    want = _rows(AI.sq8_index_search(spark, ref, queries, "vec_id",
                                     "embedding", k=5))
    assert got == want and len(got) == 50


def test_stream_index_add_dedupe_survives_redelivery(spark, emb,
                                                     queries, tmp_path):
    """Record-level exactly-once (dedupe=True): an at-least-once source
    that re-delivers rows already in the postings (fresh checkpoint =
    the worst case: every batch replays) adds nothing twice — the
    index equals the clean batch-add result."""
    base = emb.filter(F.col("vec_id") % 10 != 9)
    delta = emb.filter(F.col("vec_id") % 10 == 9)
    p = str(tmp_path / "dedup_idx")
    idx = AI.pq_index_build(base, "vec_id", "embedding", p)
    src = str(tmp_path / "src")
    delta.repartition(2).write.parquet(src)
    q = AI.stream_index_add(spark, p, src, delta.schema, "vec_id",
                            "embedding", str(tmp_path / "ck1"),
                            dedupe=True)
    q.awaitTermination(120)
    n_rows = AI.pq_index_load(spark, p).codes(spark).count()
    # redeliver EVERYTHING via a fresh checkpoint — without dedupe this
    # would double the postings
    q2 = AI.stream_index_add(spark, p, src, delta.schema, "vec_id",
                             "embedding", str(tmp_path / "ck2"),
                             dedupe=True)
    q2.awaitTermination(120)
    assert AI.pq_index_load(spark, p).codes(spark).count() == n_rows
    got = _rows(AI.pq_index_search(spark, p, queries, "vec_id",
                                   "embedding", k=5))
    want = _rows(pq_ann_topk(emb, queries, "vec_id", "embedding", k=5,
                             cb=idx.cb))
    assert got == want and len(got) == 50


def test_residual_build_then_search_equals_inline(spark, emb, queries,
                                                  tmp_path):
    """Persisted residual IVFPQ == inline ivfpq_residual_topk: the grid
    residuals, Lloyd training and per-list query re-expression are all
    deterministic and centroids/codebooks round-trip exactly through
    JSON."""
    from keboola_storage_duckdb_spark.functions.similarity import (
        ivfpq_residual_topk)

    idx = AI.pq_index_build(emb, "vec_id", "embedding",
                            str(tmp_path / "res"), label_col="label",
                            residual=True)
    got = _rows(AI.pq_index_search(spark, idx, queries, "vec_id",
                                   "embedding", k=5, nprobe=2))
    want = _rows(ivfpq_residual_topk(emb, queries, "vec_id",
                                     "embedding", "label", k=5,
                                     nprobe=2))
    assert got == want and len(got) == 50
    # residual ADC is per-probed-list — unrouted search must refuse
    with pytest.raises(ValueError, match="residual"):
        AI.pq_index_search(spark, idx, queries, "vec_id", "embedding",
                           k=5)
    # the raw-space LUT kernel must refuse too
    with pytest.raises(ValueError, match="residual"):
        AI.pq_index_search_lut(spark, idx, queries, "vec_id",
                               "embedding", k=5)


def test_residual_add_equals_rebuild_same_artifacts(spark, emb, queries,
                                                    tmp_path):
    """Frozen-artifact residual add: new vectors encode their residuals
    against the STORED centroids and codebooks, so add-then-search ==
    rebuild with the same centroids + codebooks."""
    base = emb.filter(F.col("vec_id") % 10 != 9)
    delta = emb.filter(F.col("vec_id") % 10 == 9)
    p = str(tmp_path / "resadd")
    idx = AI.pq_index_build(base, "vec_id", "embedding", p,
                            label_col="label", residual=True)
    AI.pq_index_add(spark, p, delta, "vec_id", "embedding")
    got = _rows(AI.pq_index_search(spark, p, queries, "vec_id",
                                   "embedding", k=5, nprobe=2))
    ref = AI.pq_index_build(
        emb, "vec_id", "embedding", str(tmp_path / "resref"),
        label_col="label", residual=True, cb=idx.cb,
        centroids=[(l, v) for l, v in idx.meta["centroids"]])
    want = _rows(AI.pq_index_search(spark, ref, queries, "vec_id",
                                    "embedding", k=5, nprobe=2))
    assert got == want and len(got) == 50


def test_routed_lut_ranks_within_own_probed_lists(spark, emb, queries,
                                                  tmp_path):
    """Routed LUT search (the composed production serving kernel): each
    query's result equals the LUT kernel restricted to that query's OWN
    probed lists (same arithmetic, per-query candidate set), and
    neighbors come only from probed lists."""
    idx = AI.pq_index_build(emb, "vec_id", "embedding",
                            str(tmp_path / "rl"), label_col="label")
    got = AI.pq_index_search_lut(spark, idx, queries, "vec_id",
                                 "embedding", k=5, nprobe=2).collect()
    assert len(got) == 50
    _, routed = AI._routed_frame(
        spark, idx, queries.select(F.col("vec_id").alias("query_id"),
                                   F.col("embedding").alias("qv")),
        2, None)
    probed = {}
    for r in routed.collect():
        probed.setdefault(r.query_id, set()).add(r.label)
    labels = {r.vec_id: r.label
              for r in emb.select("vec_id", "label").collect()}
    for r in got:
        assert labels[r.neighbor_id] in probed[r.query_id]
    # per-query equivalence with the filter_labels form (2 spot queries)
    for qid in [0, 7]:
        one = queries.filter(F.col("vec_id") == qid)
        want = sorted(tuple(x) for x in AI.pq_index_search_lut(
            spark, idx, one, "vec_id", "embedding", k=5,
            filter_labels=sorted(probed[qid])).collect())
        have = sorted(tuple(x) for x in got if x.query_id == qid)
        assert have == want


def test_delete_hive_escaped_string_labels(spark, emb, tmp_path):
    """ADVICE r12 (medium): Spark hive-escapes special characters in
    partition dir names ('=' -> %3D, ':' -> %3A), so the delete's leaf
    paths must come from the on-disk listing, not raw f"label={value}"
    interpolation — which read a nonexistent path and blew up."""
    labeled = emb.withColumn(
        "slabel",
        F.element_at(F.array(F.lit("a=b"), F.lit("x:y"), F.lit("plain")),
                     (F.col("vec_id") % 3 + 1).cast("int")))
    path = str(tmp_path / "escdel")
    AI.pq_index_build(labeled, "vec_id", "embedding", path,
                      label_col="slabel")
    codes = os.path.join(path, "codes")
    # the dirs really are escaped on disk — the precondition of the bug
    leaves = sorted(n for n in os.listdir(codes) if n.startswith("label="))
    assert "label=a%3Db" in leaves and "label=x%3Ay" in leaves
    total = emb.count()
    # victims span BOTH escaped leaves
    victims = [r.vec_id for r in
               labeled.filter(F.col("slabel").isin("a=b", "x:y"))
                      .select("vec_id", "slabel")
                      .orderBy("slabel", "vec_id").collect()]
    victims = victims[:3] + victims[-3:]          # 3 per escaped leaf
    report = AI.pq_index_delete(spark, path, victims)
    assert report["deleted"] == 6
    assert sorted(report["leaves_rewritten"]) == ["label=a%3Db",
                                                  "label=x%3Ay"]
    kept = AI.pq_index_load(spark, path).codes(spark)
    assert kept.count() == total - 6
    assert kept.filter(F.col("id").isin(victims)).count() == 0
    # emptying an escaped leaf drops the escaped dir, not a phantom one
    rest = [r.vec_id for r in
            labeled.filter(F.col("slabel") == "a=b")
                   .select("vec_id").collect()]
    AI.pq_index_delete(spark, path, rest)
    assert "label=a%3Db" not in os.listdir(codes)


def test_unescape_partition_value_cases():
    """Hive %XX unescaping: known pairs plus malformed-sequence
    passthrough (a literal '%' not followed by two hex digits must
    survive verbatim, never raise)."""
    u = AI._unescape_partition_value
    assert u("a%3Db") == "a=b"
    assert u("x%3Ay") == "x:y"
    assert u("%25") == "%"
    assert u("plain") == "plain"
    assert u("100%") == "100%"          # trailing % — malformed, kept
    assert u("%zz") == "%zz"            # non-hex — malformed, kept
    assert u("a%0Ab") == "a\nb"


def test_rebuild_recommendation_empty_index_not_flagged(spark, emb,
                                                        tmp_path):
    """ADVICE r13: an index emptied by deletes must not recommend a
    rebuild on a vacuous 0 >= 0 imbalance — there is nothing to
    retrain."""
    idx = AI.pq_index_build(emb, "vec_id", "embedding",
                            str(tmp_path / "empty_gov"),
                            label_col="label")
    AI.pq_index_delete(spark, idx.path, emb.select("vec_id"),
                       id_col="vec_id")
    rec = AI.rebuild_recommendation(spark, idx.path, emb, "vec_id",
                                    "embedding", "label")
    assert rec["recommend_rebuild"] is False
    assert rec["reasons"] == []


def test_delete_resolves_bool_label_dirs(spark, tmp_path):
    """ADVICE r13: non-int/string labels (bool here) render differently
    in Python str() ('True') and Spark partition dirs ('true'); the
    delete's leaf lookup must key on Spark's own rendering, or it falls
    back to a raw f-string path that does not exist."""
    import os

    rows = [(i, i % 2 == 0,
             [float((i * 7 + j) % 13) for j in range(8)])
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "vec_id bigint, flag boolean, embedding array<double>")
    idx = AI.pq_index_build(df, "vec_id", "embedding",
                            str(tmp_path / "boolidx"), label_col="flag",
                            m=2, ksub=4, dim=8)
    leaves = sorted(os.listdir(os.path.join(idx.path, "codes")))
    assert any(d.startswith("label=true") for d in leaves), leaves
    report = AI.pq_index_delete(
        spark, idx.path, df.filter("flag").select("vec_id"),
        id_col="vec_id")
    assert report["deleted"] == 20
    assert report["leaves_rewritten"] == ["label=true"]
    # the true-list is gone (emptied), the false-list intact
    remaining = AI.pq_index_load(spark, idx.path).codes(spark)
    labs = {r["label"] for r in remaining.select("label").distinct()
            .collect()}
    assert labs == {False}
