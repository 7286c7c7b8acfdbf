"""Round-10 operators: LUT-form ADC ranking, composed IVFPQ search +
recall frame, and the dedup-aware (leakage-safe) train/val/test split.

Reference parity note: the reference has none of these — they are part of
the training-pipeline surface (SURVEY.md §2.14); public contracts are
Jégou et al. 2011 / FAISS IVFPQ and Lee et al. 2022 §6 (dedup-aware
splits).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from keboola_storage_duckdb_spark.sources.tables import load_table


def test_lut_ranking_equals_fold_ranking(spark, sf_dir):
    """The LUT kernel is algebraically the same ADC distance as the
    fold kernel (different summation grouping only): identical
    (query, neighbor, rank) triples, adist equal to round-6 (both are
    certified against their own exact oracles; this pins the twins to
    EACH OTHER)."""
    from keboola_storage_duckdb_spark.functions.similarity import (
        pq_ann_topk, pq_ann_topk_lut, pq_train_codebooks)

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    cb = pq_train_codebooks(emb, "vec_id", "embedding",
                            m=4, ksub=8, dim=64, iters=2)
    fold = {(r.query_id, r.neighbor_id): (r.rank, r.adist) for r in
            pq_ann_topk(emb, q, "vec_id", "embedding", k=5,
                        cb=cb).collect()}
    lut = {(r.query_id, r.neighbor_id): (r.rank, r.adist) for r in
           pq_ann_topk_lut(emb, q, "vec_id", "embedding", k=5,
                           cb=cb).collect()}
    assert set(fold) == set(lut)
    for key, (rank_f, ad_f) in fold.items():
        rank_l, ad_l = lut[key]
        assert rank_f == rank_l
        assert abs(ad_f - ad_l) < 1e-9


def test_lut_query_cap_raises(spark, sf_dir):
    """The driver-built LUT is bounded: past max_queries the kernel
    refuses instead of collecting an unbounded query side."""
    import pytest

    from keboola_storage_duckdb_spark.functions.similarity import (
        pq_ann_topk_lut)

    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="max_queries"):
        pq_ann_topk_lut(emb, emb, "vec_id", "embedding", max_queries=3)


def test_ivfpq_full_probe_equals_pq(spark, sf_dir):
    """With nprobe >= #labels the routing prunes nothing, so the
    composed search must return EXACTLY the PQ ranking (same fold
    expression over the same reconstruction) — isolating the routing
    as the only source of divergence."""
    from keboola_storage_duckdb_spark.functions.similarity import (
        ivfpq_ann_topk, pq_ann_topk, pq_train_codebooks)

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    n_labels = emb.select("label").distinct().count()
    cb = pq_train_codebooks(emb, "vec_id", "embedding",
                            m=4, ksub=8, dim=64, iters=2)
    pq = sorted((r.query_id, r.neighbor_id, r.rank, r.adist) for r in
                pq_ann_topk(emb, q, "vec_id", "embedding", k=5,
                            cb=cb).collect())
    ivfpq = sorted((r.query_id, r.neighbor_id, r.rank, r.adist) for r in
                   ivfpq_ann_topk(emb, q, "vec_id", "embedding", "label",
                                  k=5, nprobe=n_labels, cb=cb).collect())
    assert pq == ivfpq


def test_ivfpq_prunes_to_probed_labels(spark, sf_dir):
    """nprobe=1: every returned neighbor lives in the single probed
    label of its query — the scan really is pruned to the inverted
    list (the partition-skip contract at 100 TB)."""
    from keboola_storage_duckdb_spark.functions.similarity import (
        ivfpq_ann_topk, pq_train_codebooks)

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    cb = pq_train_codebooks(emb, "vec_id", "embedding",
                            m=4, ksub=8, dim=64, iters=2)
    res = ivfpq_ann_topk(emb, q, "vec_id", "embedding", "label",
                         k=5, nprobe=1, cb=cb)
    labels = dict(emb.select("vec_id", "label").collect())
    per_q: dict = {}
    for r in res.collect():
        per_q.setdefault(r.query_id, set()).add(labels[r.neighbor_id])
    for qid, ls in per_q.items():
        assert len(ls) == 1, (qid, ls)


def test_ivfpq_recall_bounds(spark, sf_dir):
    """Composed recall: one row per query, recall = n_hits/k in [0,1]."""
    from keboola_storage_duckdb_spark.functions.similarity import (
        ivfpq_recall)

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    rows = ivfpq_recall(emb, q, "vec_id", "embedding", "label",
                        k=5, nprobe=2).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.n_hits <= 5
        assert abs(r.recall - r.n_hits / 5) < 1e-15


def test_dedup_safe_split_never_straddles(spark):
    """The leakage planted by construction: two near-identical docs
    whose DOC-ID hash buckets differ (a doc-id split WOULD separate
    them) must land in ONE split because the bucket hashes the cluster
    id; and split is constant within every cluster."""
    import hashlib

    from keboola_storage_duckdb_spark.functions.dedup_ml import (
        dedup_safe_split, minhash_lsh_pairs)

    base = ("the quick brown fox jumps over the lazy dog again and "
            "again while the band plays on %s")

    def bucket(i: int) -> int:
        return int(hashlib.md5(f"split|{i}".encode()).hexdigest()[:8],
                   16) % 10

    # pick a near-dup pair whose DOC-ID buckets fall in different
    # splits (train vs test) — the leakage case a doc-id split permits
    pair = None
    for a in range(1000, 1100):
        for b in range(a + 1, a + 50):
            if bucket(a) < 8 and bucket(b) == 9:
                pair = (a, b)
                break
        if pair:
            break
    assert pair is not None
    a, b = pair
    rows = [(a, base % "x"), (b, base % "y")] + \
           [(i, f"unique filler document number {i} with its own words "
             f"entirely {i * 7} distinct {i * 13}") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    edges = minhash_lsh_pairs(docs, "doc_id", "text",
                              n_hashes=12, band_size=4, threshold=0.8)
    out = dedup_safe_split(docs, "doc_id", edges,
                           train=8, val=1, test=1, seed="split")
    got = {r.doc_id: (r.cluster, r.split) for r in out.collect()}
    assert len(got) == 52
    # the planted pair clustered together and shares ONE split
    assert got[a][0] == got[b][0] == a
    assert got[a][1] == got[b][1]
    # invariant: split is a function of cluster
    by_cluster: dict = {}
    for doc, (cl, sp) in got.items():
        by_cluster.setdefault(cl, set()).add(sp)
    assert all(len(s) == 1 for s in by_cluster.values())


def test_dedup_safe_split_proportions(spark, sf_dir):
    """On the fixture corpus the 8/1/1 buckets come out roughly
    80/10/10 (md5 uniformity), with all three splits present."""
    from keboola_storage_duckdb_spark.functions.dedup_ml import (
        dedup_safe_split, minhash_lsh_pairs)

    docs = load_table(spark, sf_dir, "documents")
    edges = minhash_lsh_pairs(docs, "doc_id", "text",
                              n_hashes=12, band_size=4, threshold=0.8)
    out = dedup_safe_split(docs, "doc_id", edges)
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n"))
                 .collect()}
    n = sum(counts.values())
    assert n == docs.count()
    assert set(counts) == {"train", "val", "test"}
    assert 0.6 < counts["train"] / n < 0.95


def test_ivfpq_rerank_equals_exact_when_nothing_pruned(spark, sf_dir):
    """shortlist >= corpus and nprobe >= #labels: the two-stage search
    must return EXACTLY the exact-L2 top-k (stage 1 prunes nothing,
    stage 2 IS the exact ranking)."""
    from keboola_storage_duckdb_spark.functions.similarity import (
        exact_l2_topk, ivfpq_rerank_topk, pq_train_codebooks)

    emb = load_table(spark, sf_dir, "embeddings") \
        .filter(F.col("vec_id") < 60)
    q = emb.filter(F.col("vec_id") < 3)
    n_labels = emb.select("label").distinct().count()
    cb = pq_train_codebooks(emb, "vec_id", "embedding",
                            m=4, ksub=8, dim=64, iters=1)
    exact = sorted((r.query_id, r.neighbor_id, r.rank, r.dist) for r in
                   exact_l2_topk(emb, q, "vec_id", "embedding",
                                 k=4).collect())
    rr = sorted((r.query_id, r.neighbor_id, r.rank, r.dist) for r in
                ivfpq_rerank_topk(emb, q, "vec_id", "embedding", "label",
                                  k=4, nprobe=n_labels, shortlist=100,
                                  cb=cb).collect())
    assert exact == rr


def test_ivfpq_rerank_contract_and_subset(spark, sf_dir):
    """Ranking contract (dense 1..k, no self, dist non-decreasing) and
    stage-2 results are a subset of the stage-1 shortlist."""
    from keboola_storage_duckdb_spark.functions.similarity import (
        ivfpq_ann_topk, ivfpq_rerank_topk, pq_train_codebooks)

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    cb = pq_train_codebooks(emb, "vec_id", "embedding",
                            m=4, ksub=8, dim=64, iters=2)
    short = {(r.query_id, r.neighbor_id) for r in
             ivfpq_ann_topk(emb, q, "vec_id", "embedding", "label",
                            k=20, nprobe=2, cb=cb).collect()}
    rows = ivfpq_rerank_topk(emb, q, "vec_id", "embedding", "label",
                             k=5, nprobe=2, shortlist=20, cb=cb).collect()
    by_q: dict = {}
    for r in rows:
        assert r.neighbor_id != r.query_id
        assert (r.query_id, r.neighbor_id) in short
        by_q.setdefault(r.query_id, []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert all(a.dist <= b.dist for a, b in zip(rs, rs[1:]))


def test_token_length_profile_clamps_and_masses(spark):
    """Crafted lengths: bins are [0,10) [10,20)...; out-of-range lengths
    clamp into edge bins; n_tokens sums the true counts (not the
    clamped bin label)."""
    from keboola_storage_duckdb_spark.functions.text import (
        token_length_profile)

    rows = [("en", "a " * 4 + "b"),        # 5 tokens  -> bucket 0
            ("en", "a " * 14 + "b"),       # 15 tokens -> bucket 1
            ("de", "a " * 150 + "b"),      # 151 tokens -> clamp bucket 9
            ("de", "x")]                   # 1 token   -> bucket 0
    docs = spark.createDataFrame(rows, "lang string, text string")
    got = {(r.lang, r.bucket): (r.lo, r.hi, r.n_docs, r.n_tokens) for r in
           token_length_profile(docs, "text", "lang",
                                lo=0.0, hi=100.0, bins=10).collect()}
    assert got[("en", 0)] == (0.0, 10.0, 1, 5)
    assert got[("en", 1)] == (10.0, 20.0, 1, 15)
    assert got[("de", 9)] == (90.0, 100.0, 1, 151)   # clamped, true mass
    assert got[("de", 0)] == (0.0, 10.0, 1, 1)
    assert len(got) == 4


def test_token_length_profile_totals(spark, sf_dir):
    """Nothing dropped: Σ n_docs == corpus size; Σ n_tokens == the
    corpus ws-token total (the clamp-not-filter contract)."""
    from keboola_storage_duckdb_spark.functions.text import (
        token_length_profile)

    docs = load_table(spark, sf_dir, "documents")
    prof = token_length_profile(docs, "text", "lang")
    agg = prof.agg(F.sum("n_docs").alias("d"),
                   F.sum("n_tokens").alias("t")).collect()[0]
    truth = docs.agg(
        F.count(F.lit(1)).alias("d"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("t")).collect()[0]
    assert agg.d == truth.d and agg.t == truth.t


def test_ivfpq_residual_contract_and_determinism(spark, sf_dir):
    """Residual IVFPQ: dense ranks, no self-match, adist >= 0 and
    non-decreasing; two runs are bit-identical (md5 seeding + grid
    residuals — no hidden nondeterminism through the centroid join)."""
    from keboola_storage_duckdb_spark.functions.similarity import (
        ivfpq_residual_topk)

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    r1 = sorted((r.query_id, r.neighbor_id, r.rank, r.adist) for r in
                ivfpq_residual_topk(emb, q, "vec_id", "embedding",
                                    "label", k=5, nprobe=2).collect())
    r2 = sorted((r.query_id, r.neighbor_id, r.rank, r.adist) for r in
                ivfpq_residual_topk(emb, q, "vec_id", "embedding",
                                    "label", k=5, nprobe=2).collect())
    assert r1 == r2
    by_q: dict = {}
    for qid, nid, rank, adist in r1:
        assert nid != qid and adist >= 0
        by_q.setdefault(qid, []).append((rank, adist))
    assert set(by_q) == {0, 1, 2, 3, 4}
    for rs in by_q.values():
        rs.sort()
        assert [r for r, _ in rs] == [1, 2, 3, 4, 5]
        assert all(a <= b for (_, a), (_, b) in zip(rs, rs[1:]))


def test_ivfpq_residual_prunes_to_probed_labels(spark, sf_dir):
    """nprobe=1: neighbors come from exactly one label per query (the
    routing prune holds through the residual encode)."""
    from keboola_storage_duckdb_spark.functions.similarity import (
        ivfpq_residual_topk)

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    labels = dict(emb.select("vec_id", "label").collect())
    per_q: dict = {}
    for r in ivfpq_residual_topk(emb, q, "vec_id", "embedding", "label",
                                 k=5, nprobe=1).collect():
        per_q.setdefault(r.query_id, set()).add(labels[r.neighbor_id])
    assert per_q and all(len(ls) == 1 for ls in per_q.values())


def test_residual_grid_is_engine_portable(spark):
    """The 2^-16 grid rule on crafted values: residuals are exact
    multiples of 2^-16 (the property that makes the Lloyd AVG an exact
    scaled-integer sum on any engine)."""
    from keboola_storage_duckdb_spark.functions.similarity import (
        ivfpq_residual_topk)

    rows = [(i, [float(i % 7) / 3.0 + j * 0.01 for j in range(64)],
             i % 2) for i in range(24)]
    df = spark.createDataFrame(
        rows, "vec_id int, embedding array<float>, label int")
    out = ivfpq_residual_topk(df, df.filter(F.col("vec_id") < 2),
                              "vec_id", "embedding", "label",
                              k=3, nprobe=2, iters=1).collect()
    assert out  # runs end-to-end on a non-fixture frame
    for r in out:
        # adist is a sum of squares of grid-multiple differences,
        # rounded to 6 — finite, non-negative
        assert r.adist >= 0.0


def test_rerank_recall_dominates_ivfpq_recall(spark, sf_dir):
    """The refine guarantee: with shortlist >= k, any true top-k member
    the codes ranked anywhere inside the shortlist is recovered by the
    exact re-rank, so rerank recall >= plain IVFPQ recall PER QUERY
    (at most k-1 shortlist members can truly beat a true top-k
    member)."""
    from keboola_storage_duckdb_spark.functions.similarity import (
        ivfpq_recall, ivfpq_rerank_recall)

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    plain = {r.query_id: r.recall for r in
             ivfpq_recall(emb, q, "vec_id", "embedding", "label",
                          k=5, nprobe=2).collect()}
    rerank = {r.query_id: r.recall for r in
              ivfpq_rerank_recall(emb, q, "vec_id", "embedding", "label",
                                  k=5, nprobe=2, shortlist=20).collect()}
    assert set(plain) == set(rerank)
    for qid in plain:
        assert rerank[qid] >= plain[qid], (qid, rerank[qid], plain[qid])


def test_sq8_codes_shape_and_range(spark, sf_dir):
    """Every vector gets dim uint8 codes in [0, 255]; constant
    dimensions (scale 0) encode to 0."""
    from keboola_storage_duckdb_spark.functions.similarity import (
        sq8_encode)

    emb = load_table(spark, sf_dir, "embeddings")
    enc = sq8_encode(emb, "vec_id", "embedding")
    assert enc.columns == ["id", "codes"]
    row = enc.selectExpr(
        "min(array_min(codes)) AS lo", "max(array_max(codes)) AS hi",
        "min(size(codes)) AS n").collect()[0]
    assert row.lo >= 0 and row.hi <= 255 and row.n == 64
    assert enc.count() == emb.count()


def test_sq8_near_exact_and_dominates_pq(spark, sf_dir):
    """The storage ladder's quality ordering on the fixture: SQ8
    (64 B/vector, grid step = range/255) is near-exact (mean recall
    >= 0.9) and far above PQ's 4-byte codes."""
    from keboola_storage_duckdb_spark.functions.similarity import (
        pq_recall, sq8_recall)

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    sq = (sq8_recall(emb, q, "vec_id", "embedding")
          .agg(F.avg("recall")).collect()[0][0])
    pq = (pq_recall(emb, q, "vec_id", "embedding")
          .agg(F.avg("recall")).collect()[0][0])
    assert sq >= 0.9, sq
    assert sq >= pq, (sq, pq)


def test_sq8_constant_dimension_reconstructs_min(spark):
    """A constant dimension has zero scale: codes 0, reconstruction =
    the constant — no 0/0 NaN anywhere in the ranking."""
    from keboola_storage_duckdb_spark.functions.similarity import (
        sq8_ann_topk)

    rows = [(i, [3.5] + [float(i + j) for j in range(3)]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    out = sq8_ann_topk(df, df.filter(F.col("vec_id") < 2),
                       "vec_id", "embedding", dim=4, k=3).collect()
    assert len(out) == 6
    assert all(r.adist >= 0 and r.adist == r.adist for r in out)  # no NaN


def test_temperature_quotas_model(spark):
    """The quota rule against a hand-computed model: groups 100/25/1
    docs, budget 60 -> weights 10/5/1, T=16 -> quotas 37/18/3; the
    sample honors them and a group never exceeds its size."""
    import math

    from keboola_storage_duckdb_spark.functions.sketch import (
        temperature_mixture, temperature_quotas)

    rows = ([("a", i) for i in range(100)] + [("b", i + 100)
            for i in range(25)] + [("c", 999)])
    df = spark.createDataFrame(rows, "src string, id long")
    quotas = temperature_quotas(df, "src", "id", budget=60)
    t = math.sqrt(100.0) + math.sqrt(25.0) + math.sqrt(1.0)
    assert quotas == {"a": int(60 * 10 / t), "b": int(60 * 5 / t),
                      "c": int(60 * 1 / t)}
    assert quotas == {"a": 37, "b": 18, "c": 3}
    out = temperature_mixture(df, "src", "id", budget=60).collect()
    got = {}
    for r in out:
        got[r.g] = got.get(r.g, 0) + 1
        assert r.sample_rank <= r.quota
    assert got == {"a": 37, "b": 18, "c": 1}  # c capped at group size


def test_temperature_mixture_deterministic(spark, sf_dir):
    """Same input -> bit-identical sample (md5 order, exact quota
    arithmetic)."""
    from keboola_storage_duckdb_spark.functions.sketch import (
        temperature_mixture)

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, temperature_mixture(
        docs, "lang", "doc_id", budget=200).collect()))
    b = sorted(map(tuple, temperature_mixture(
        docs, "lang", "doc_id", budget=200).collect()))
    assert a == b and a
