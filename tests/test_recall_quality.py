"""Retrieval-QUALITY pins on a clustered fixture (VERDICT r12 #4).

The certified hash-oracles prove the ANN arithmetic bit-exact, but on the
uniform-random testdata embeddings every PQ variant scores recall
0.02-0.10 (NOTES r10) — quantization cannot beat noise that has no
structure, so a ROUTING bug (wrong centroid ranking, wrong probed-list
join, wrong residual re-expression) would be invisible to both the
oracles and the recall numbers. This fixture is an md5-deterministic
mixture of Gaussians (8 well-separated centers in 64-d, sigma=0.6
Irwin-Hall noise — no RNG anywhere, TESTDATA discipline), where quality
DOES discriminate; every value below is bit-reproducible, so the floors
are tight:

  routing (ivf_recall, nprobe=4)          = 1.00   (clusters separable)
  SQ8 (64 B/vec)                          = 0.94
  residual IVFPQ (4 B/vec, m=4 ksub=8)    = 0.12
  plain PQ / IVFPQ (4 B/vec)              = 0.02
  residual IVFPQ (m=16 ksub=32, 10 B/vec) = 0.40

Pinned: the byte-budget ladder ordering exact(1.0) >= SQ8 >= residual-PQ
>= PQ, a routing floor of 1.0, and a rich-codebook residual floor —
exactly the failures no hash-oracle can see."""

import pytest
from pyspark.sql import functions as F

from helpers_clustered import clustered_rows
from keboola_storage_duckdb_spark.functions import similarity as S

K, DIM, N, SIG = 8, 64, 2000, 0.6


@pytest.fixture(scope="module")
def clustered(spark):
    emb = spark.createDataFrame(
        clustered_rows(N, K, DIM, SIG),
        "vec_id bigint, label int, embedding array<double>").cache()
    emb.count()
    yield emb
    emb.unpersist()


@pytest.fixture(scope="module")
def cq(clustered):
    return clustered.filter(F.col("vec_id") < 10)


def _mean(df) -> float:
    return float(df.agg(F.avg("recall")).collect()[0][0])


def test_quality_ladder_ordering(clustered, cq):
    """exact(1.0) >= SQ8 >= residual-PQ >= plain PQ at the same 4-byte
    budget — the quality-vs-bytes ladder must order correctly on data
    where quality is measurable. A broken residual re-expression (the
    per-list query residual) collapses residual to <= plain PQ."""
    emb, q = clustered, cq
    sq8 = _mean(S.sq8_recall(emb, q, "vec_id", "embedding", dim=DIM, k=5))
    exact_side = S.exact_l2_topk(emb, q, "vec_id", "embedding", k=5)
    res = _mean(S._recall_frame(
        S.ivfpq_residual_topk(emb, q, "vec_id", "embedding", "label",
                              k=5, nprobe=4), exact_side))
    pq = _mean(S.pq_recall(emb, q, "vec_id", "embedding", k=5))
    assert 1.0 >= sq8 >= res >= pq
    # deterministic fixture + deterministic training -> tight floors
    assert sq8 >= 0.85, sq8
    assert res >= pq + 0.05, (res, pq)      # residual genuinely buys recall


def test_routing_is_perfect_on_separable_clusters(clustered, cq):
    """nprobe=4 of 8 well-separated lists must contain the true top-k for
    every query whose own list is probed — ivf_recall == 1.0 here; any
    centroid-ranking or probe-join bug drops this to ~nprobe/K."""
    r = _mean(S.ivf_recall(clustered, cq, "vec_id", "embedding", "label",
                           k=5, nprobe=4))
    assert r >= 0.99, r


def test_rich_codebook_residual_floor(clustered, cq):
    """m=16 ksub=32 residual IVFPQ reaches 0.40 on this fixture
    (measured, deterministic). Floor at 0.30: a routing or residual
    arithmetic regression lands near 0.05 — far below."""
    exact_side = S.exact_l2_topk(clustered, cq, "vec_id", "embedding", k=5)
    res = _mean(S._recall_frame(
        S.ivfpq_residual_topk(clustered, cq, "vec_id", "embedding",
                              "label", m=16, ksub=32, dim=DIM, iters=2,
                              k=5, nprobe=4), exact_side))
    assert res >= 0.30, res


def test_rrf_fusion_beats_quantized_alone(clustered, cq):
    """VERDICT r13 #7 — the reason RRF exists: fusing the exact dense
    ranking with a (weak) quantized ranking must recover MORE of the
    exact top-k than the quantized system alone. Structurally the fused
    top-5 always carries >= 2 exact-rank items (equal ranks from the two
    systems tie in rrf and interleave), so the floor is 0.4; measured on
    this fixture: quant 0.02, fused 0.44. A fusion bug (wrong outer
    join, missing-side term, rank direction) collapses fused to the
    quantized level."""
    emb, q = clustered, cq
    dense = S.brute_force_topk(emb, q, "vec_id", "embedding", k=5) \
             .localCheckpoint()          # feeds fuse AND the truth side
    quant = S.pq_ann_topk(emb, q, "vec_id", "embedding", k=5)
    fused = S.rrf_fuse(dense, quant, k=5)
    r_quant = _mean(S._recall_frame(quant, dense))
    r_fused = _mean(S._recall_frame(fused, dense))
    assert r_fused >= r_quant + 0.3, (r_fused, r_quant)
    assert r_fused >= 0.4, r_fused
