"""Round-9 operators: product-quantization vector compression (codebook
training, encoding, asymmetric-distance ranking, recall frame).

Reference parity note: the reference has no PQ — this is part of the
training-pipeline surface (SURVEY.md §2.14); the public contract is
Jégou et al. 2011 / the FAISS IVFPQ fine-ranking stage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from keboola_storage_duckdb_spark.sources.tables import load_table


def test_pq_codebooks_shape_and_determinism(spark, sf_dir):
    """cb is m × ksub × (dim/m) plain floats, identical across calls
    (md5 seeding + fixed Lloyd rounds = bit-reproducible)."""
    from keboola_storage_duckdb_spark.functions.similarity import (
        pq_train_codebooks)

    emb = load_table(spark, sf_dir, "embeddings")
    cb1 = pq_train_codebooks(emb, "vec_id", "embedding",
                             m=4, ksub=8, dim=64, iters=2)
    cb2 = pq_train_codebooks(emb, "vec_id", "embedding",
                             m=4, ksub=8, dim=64, iters=2)
    assert len(cb1) == 4
    assert all(len(book) == 8 for book in cb1)
    assert all(len(c) == 16 for book in cb1 for c in book)
    assert all(isinstance(x, float) for book in cb1 for c in book for x in c)
    assert cb1 == cb2


def test_pq_encode_codes_in_range(spark, sf_dir):
    """Every vector gets m codes, each in [0, ksub)."""
    from keboola_storage_duckdb_spark.functions.similarity import (
        pq_encode, pq_train_codebooks)

    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_train_codebooks(emb, "vec_id", "embedding",
                            m=4, ksub=8, dim=64, iters=1)
    enc = pq_encode(emb, "vec_id", "embedding", cb)
    assert enc.columns == ["id", "code_0", "code_1", "code_2", "code_3"]
    assert enc.count() == emb.count()
    stats = enc.agg(*[F.min(f"code_{j}").alias(f"lo{j}") for j in range(4)],
                    *[F.max(f"code_{j}").alias(f"hi{j}") for j in range(4)]
                    ).collect()[0]
    for j in range(4):
        assert 0 <= stats[f"lo{j}"] and stats[f"hi{j}"] <= 7


def test_pq_ann_topk_ranking_contract(spark, sf_dir):
    """rank is dense 1..k per query, no self-match, adist >= 0 and
    non-decreasing in rank."""
    from keboola_storage_duckdb_spark.functions.similarity import pq_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    rows = pq_ann_topk(emb, q, "vec_id", "embedding",
                       m=4, ksub=8, dim=64, iters=2, k=5).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        assert r.neighbor_id != r.query_id
        assert r.adist >= 0
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for rs in by_q.values():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == [1, 2, 3, 4, 5]
        assert all(a.adist <= b.adist for a, b in zip(rs, rs[1:]))


def test_pq_recall_one_when_codes_cover_corpus(spark, sf_dir):
    """With ksub >= N every vector seeds (and keeps) its own centroid,
    so reconstruction is exact and the ADC ranking IS the exact L2
    ranking — recall must be 1.0 (the PQ twin of ivf_recall's
    nprobe-equals-all-cells check)."""
    from keboola_storage_duckdb_spark.functions.similarity import pq_recall

    emb = load_table(spark, sf_dir, "embeddings") \
        .filter(F.col("vec_id") < 12)
    q = emb.filter(F.col("vec_id") < 3)
    rows = pq_recall(emb, q, "vec_id", "embedding",
                     m=4, ksub=12, dim=64, iters=1, k=4).collect()
    assert len(rows) == 3
    assert all(r.recall == 1.0 and r.n_hits == 4 for r in rows)


def test_pq_recall_bounds(spark, sf_dir):
    """Lossy codes: recall in [0, 1], n_hits <= k, recall = n_hits/k."""
    from keboola_storage_duckdb_spark.functions.similarity import pq_recall

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    rows = pq_recall(emb, q, "vec_id", "embedding",
                     m=4, ksub=8, dim=64, iters=2, k=5).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.n_hits <= 5
        assert abs(r.recall - r.n_hits / 5) < 1e-15


def test_exact_l2_topk_matches_brute_force_on_crafted(spark):
    """Hand-checkable geometry: 1-d-style vectors embedded in 4 dims;
    nearest by L2 is knowable by eye, ties break to the lower id."""
    from keboola_storage_duckdb_spark.functions.similarity import exact_l2_topk

    rows = [(i, [float(v), 0.0, 0.0, 0.0]) for i, v in
            [(0, 0.0), (1, 1.0), (2, 3.0), (3, -1.0), (4, 100.0)]]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0)
    got = [(r.neighbor_id, r.rank) for r in
           exact_l2_topk(df, q, "vec_id", "embedding", k=3).collect()]
    # dist from 0.0: id1=1, id3=1 (tie -> id1 first), id2=9
    assert sorted(got, key=lambda t: t[1]) == [(1, 1), (3, 2), (2, 3)]
