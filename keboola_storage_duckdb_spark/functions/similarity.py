"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force top-k cosine — the exact baseline; dot products via
    JVM-side ``aggregate(zip_with(...))`` folds in double precision
    (bit-identical to DuckDB's sequential list fold — verified), ranked by
    (score, id) for deterministic top-k.
  * LSH-bucketed ANN (random hyperplanes) — the scale path: signature =
    sign-bits of dot products with md5-derived pseudo-random hyperplanes;
    candidates share a bucket, then exact re-rank within buckets. Linear
    candidate generation instead of the full cross product.

At 100 TB the cross join of brute force is O(Q×N) — fine for small Q
(broadcast the queries), impossible for large Q; the LSH path (or an IVF
partition-pruned variant using a cluster-id column) is the default there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import par as _par

DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
       "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
NORM2 = ("aggregate({a}, CAST(0 AS DOUBLE), "
         "(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))")


def with_norm(df: DataFrame, vec_col: str, out: str = "norm2") -> DataFrame:
    return df.withColumn(out, F.expr(NORM2.format(a=vec_col)))


def cosine_expr(a: str, b: str, norm_a: str, norm_b: str) -> F.Column:
    return (F.expr(DOT.format(a=a, b=b))
            / (F.sqrt(F.col(norm_a)) * F.sqrt(F.col(norm_b))))


def brute_force_topk(vectors: DataFrame, queries: DataFrame, id_col: str,
                     vec_col: str, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (excluding self).

    queries is expected small → broadcast; candidates stream past it with no
    shuffle until the final per-query top-k (window over k·Q rows).
    Returns (query_id, neighbor_id, score, rank)."""
    from pyspark.sql import Window

    q = with_norm(
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv")), "qv", "qn")
    # Candidates stream past the broadcast queries; Q·N dot products are the
    # cost, so pin the streamed side at core parallelism (a single-row-group
    # scan would otherwise run the whole cross product in one task).
    c = with_norm(
        vectors.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("cv")), "cv", "cn") \
        .repartition(_par(vectors))
    scored = (c.crossJoin(F.broadcast(q))
               .filter(F.col("neighbor_id") != F.col("query_id"))
               .withColumn("score", F.round(cosine_expr("qv", "cv", "qn", "cn"), 6)))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "score", "rank"))


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane components in [-1, 1) derived
    from md5 — reproducible across runs and engines without Math.random."""
    import hashlib

    out = []
    for i in range(dim):
        h = hashlib.md5(f"{plane}_{i}".encode()).hexdigest()[:8]
        out.append(int(h, 16) / float(2 ** 31) - 1.0)
    return out


def lsh_bucket(vectors: DataFrame, id_col: str, vec_col: str,
               n_planes: int = 8, dim: int = 64) -> DataFrame:
    """Random-hyperplane LSH signature: bucket = Σ 2^p · [dot(v, r_p) > 0].
    Cosine-similar vectors collide with probability (1 - θ/π)^planes."""
    sig = F.lit(0).cast("bigint")
    for p in range(n_planes):
        plane = _hyperplane(dim, p)
        arr = "array(" + ",".join(f"CAST({x!r} AS DOUBLE)" for x in plane) + ")"
        dot = F.expr(DOT.format(a=vec_col, b=arr))
        sig = sig + F.when(dot > 0, F.lit(1 << p)).otherwise(0)
    return vectors.select(F.col(id_col).alias("id"),
                          F.col(vec_col).alias("vec"),
                          sig.alias("bucket"))


def lsh_ann_topk(vectors: DataFrame, queries: DataFrame, id_col: str,
                 vec_col: str, k: int = 5, n_planes: int = 8,
                 dim: int = 64) -> DataFrame:
    """ANN: exact re-rank restricted to same-LSH-bucket candidates.
    Recall < 1 by construction; bucket join replaces the cross product."""
    from pyspark.sql import Window

    cand = lsh_bucket(vectors.repartition(_par(vectors)),
                      id_col, vec_col, n_planes, dim)
    qb = (lsh_bucket(queries, id_col, vec_col, n_planes, dim)
          .select(F.col("id").alias("query_id"), F.col("vec").alias("qv"),
                  "bucket"))
    joined = (cand.join(F.broadcast(qb), "bucket")
                  .filter(F.col("id") != F.col("query_id")))
    scored = (with_norm(with_norm(joined, "qv", "qn"), "vec", "cn")
              .withColumn("score", F.round(cosine_expr("qv", "vec", "qn", "cn"), 6)))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", F.col("id").alias("neighbor_id"),
                          "score", "rank"))


def cosine_near_dup_pairs(vectors: DataFrame, id_col: str, vec_col: str,
                          threshold: float = 0.95,
                          block_col: str | None = None,
                          broadcast_build: bool = True,
                          unblocked_limit: int = 100_000) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, score ≥ threshold).

    ``block_col`` (e.g. a cluster/label column or an LSH bucket) turns the
    all-pairs product into per-block products — REQUIRED at scale: the
    unblocked path is O(N²). ``broadcast_build`` hints the build side of the
    unblocked cross product (right for corpora that fit executor memory);
    set False on a large unblocked input to degrade to a partitioned
    cartesian instead of a guaranteed broadcast OOM — but at that size use
    ``block_col``.

    The unblocked default is gated: if the input exceeds ``unblocked_limit``
    rows (checked with a bounded ``limit(n+1).count()`` — cheap next to the
    N² work it guards), raise instead of launching an O(N²) cross join /
    broadcast OOM. Pass a larger limit explicitly to override."""
    if block_col is None:
        n_bounded = vectors.limit(unblocked_limit + 1).count()
        if n_bounded > unblocked_limit:
            raise ValueError(
                f"cosine_near_dup_pairs: input exceeds {unblocked_limit} rows; "
                "the unblocked path is O(N^2). Pass block_col= (cluster / LSH "
                "bucket / label) or raise unblocked_limit explicitly.")
    v = with_norm(vectors.select(F.col(id_col).alias("id"),
                                 F.col(vec_col).alias("v"),
                                 *([F.col(block_col).alias("blk")] if block_col else [])),
                  "v", "n2")
    # The N² dot products dominate; spread the streamed side across cores
    # (the other side is broadcast / co-partitioned by block).
    a = v.repartition(_par(vectors)).select(
        F.col("id").alias("id_a"), F.col("v").alias("va"),
        F.col("n2").alias("na"), *([F.col("blk")] if block_col else []))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                 F.col("n2").alias("nb"), *([F.col("blk")] if block_col else []))
    if block_col:
        joined = a.join(b, on="blk")
    else:
        joined = a.crossJoin(F.broadcast(b) if broadcast_build else b)
    return (joined.filter(F.col("id_a") < F.col("id_b"))
                  .withColumn("score", F.round(cosine_expr("va", "vb", "na", "nb"), 6))
                  .filter(F.col("score") >= threshold)
                  .select("id_a", "id_b", "score"))


def ivf_centroids(vectors: DataFrame, id_col: str, vec_col: str,
                  label_col: str) -> DataFrame:
    """Per-cluster centroid vectors (label, centroid) — the coarse
    quantizer for IVF search. Computed distributedly: posexplode to
    (label, dim, component), mean per (label, dim), re-assemble ordered by
    dim. One shuffle keyed (label, dim) — dense and tiny."""
    comps = vectors.select(F.col(label_col).alias("label"),
                           F.posexplode(F.col(vec_col)).alias("dim", "x"))
    means = (comps.groupBy("label", "dim")
                  .agg(F.avg(F.col("x").cast("double")).alias("m")))
    return (means.groupBy("label")
                 .agg(F.array_sort(
                          F.collect_list(F.struct("dim", "m"))).alias("dm"))
                 .select("label",
                         F.expr("transform(dm, s -> s.m)").alias("centroid")))


def ivf_ann_topk(vectors: DataFrame, queries: DataFrame, id_col: str,
                 vec_col: str, label_col: str | None = None, k: int = 5,
                 nprobe: int = 2, n_clusters: int = 16,
                 kmeans_iter: int = 8) -> DataFrame:
    """IVF (inverted-file) ANN: route each query to its ``nprobe`` nearest
    centroids, then exact-rank only within those clusters' inverted lists.

    The coarse quantizer is either an existing partition column
    (``label_col`` — e.g. the on-disk partition key) or, when ``label_col``
    is None, a TRUE k-means quantizer: deterministic Lloyd clustering
    (functions/clustering.kmeans) assigns every vector to one of
    ``n_clusters`` learned cells, which is the classic IVF construction
    and gives balanced, geometry-aware lists when no natural partition
    exists.

    This is the partition-pruned scale path: with C clusters and balanced
    lists, each query scans ~nprobe/C of the corpus instead of all of it —
    at 100 TB the vectors table is PARTITIONED BY the quantizer cell on
    disk, so routing prunes parquet partitions at the scan (the cheapest
    possible skip). Recall < 1 by construction; the exact twin is
    ``brute_force_topk``.
    """
    from pyspark.sql import Window

    if label_col is None:
        from .clustering import kmeans

        assign = kmeans(vectors, id_col, vec_col, k=n_clusters,
                        max_iter=kmeans_iter) \
            .withColumnRenamed("id", id_col) \
            .withColumnRenamed("cluster", "_ivf_cell")
        vectors = vectors.join(assign, id_col)
        label_col = "_ivf_cell"
    cents = ivf_centroids(vectors, id_col, vec_col, label_col)
    q = with_norm(queries.select(F.col(id_col).alias("query_id"),
                                 F.col(vec_col).alias("qv")), "qv", "qn")
    # route: query × centroid scores (C is small → broadcast centroids)
    qc = (q.crossJoin(F.broadcast(
              with_norm(cents, "centroid", "cn")))
            .withColumn("cscore", cosine_expr("qv", "centroid", "qn", "cn")))
    wr = Window.partitionBy("query_id").orderBy(F.col("cscore").desc(),
                                                F.col("label").asc())
    routed = (qc.withColumn("rt", F.row_number().over(wr))
                .filter(F.col("rt") <= nprobe)
                .select("query_id", "qv", "qn", "label"))
    # search only the probed clusters' lists
    c = with_norm(
        vectors.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("cv"),
                       F.col(label_col).alias("label")), "cv", "cn") \
        .repartition(_par(vectors))
    scored = (c.join(F.broadcast(routed), "label")
               .filter(F.col("neighbor_id") != F.col("query_id"))
               .withColumn("score",
                           F.round(cosine_expr("qv", "cv", "qn", "cn"), 6)))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "score", "rank"))


def ivf_recall(vectors: DataFrame, queries: DataFrame, id_col: str,
               vec_col: str, label_col: str, k: int = 5,
               nprobe: int = 2) -> DataFrame:
    """Recall@k of the IVF route against the exact brute-force ranking —
    the evaluation frame every ANN deployment needs before trading
    nprobe for latency (FAISS reports exactly this curve). Per query:
    how many of the true top-k the probed cells actually contained.

    Both sides are the already-certified operators (``ivf_ann_topk``,
    ``brute_force_topk``); the comparison is ONE left-semi join on
    (query, neighbor) plus a per-query count — output is Q rows, so
    every stage after the two searches is negligible. Recall divides
    two small exact integers (IEEE-correctly-rounded on both engines).

    Returns ``(query_id, n_hits, recall)``; mean recall over queries is
    the caller's one-row agg away.
    """
    approx = ivf_ann_topk(vectors, queries, id_col, vec_col, label_col,
                          k=k, nprobe=nprobe)
    # genuine multi-consumer cut point (hits + per_q): without it Spark
    # re-runs the full Q x N exact search once per branch (no
    # cross-branch CSE — the duplicate_spans lesson, NOTES r7)
    exact = brute_force_topk(vectors, queries, id_col, vec_col, k=k) \
        .localCheckpoint(eager=False)
    hits = (exact.join(approx.select("query_id", "neighbor_id"),
                       ["query_id", "neighbor_id"], "left_semi")
                 .groupBy("query_id")
                 .agg(F.count(F.lit(1)).alias("n_hits")))
    per_q = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact"))
    return (per_q.join(hits, "query_id", "left")
                 .select("query_id",
                         F.coalesce("n_hits", F.lit(0)).cast("int")
                          .alias("n_hits"),
                         (F.coalesce("n_hits", F.lit(0)).cast("double")
                          / F.col("n_exact").cast("double"))
                         .alias("recall")))


def brute_force_topk_auto(vectors: DataFrame, queries: DataFrame,
                          id_col: str, vec_col: str, k: int = 5,
                          matmul_min_queries: int = 64) -> DataFrame:
    """Kernel-adaptive exact top-k: the JVM ``aggregate(zip_with(...))``
    fold has no Python/Arrow round-trip and wins for small query sets; the
    mapInPandas BLAS matmul amortizes that overhead across queries and wins
    as Q grows (one N×Q float64 matmul per Arrow batch). The crossover is
    the fixed mapInPandas cost (~0.3-0.5 s locally) vs O(Q·N·dim) fold
    work, so route on the (bounded) query count. Both kernels rank on
    (round-6 score, id) and return identical rows — A/B'd and
    round-6-equality-tested."""
    q_bounded = queries.limit(matmul_min_queries + 1).count()
    if q_bounded <= matmul_min_queries:
        return brute_force_topk(vectors, queries, id_col, vec_col, k)
    return brute_force_topk_pandas(vectors, queries, id_col, vec_col, k)


def brute_force_topk_pandas(vectors: DataFrame, queries: DataFrame,
                            id_col: str, vec_col: str, k: int = 5) -> DataFrame:
    """Vectorized (Arrow/NumPy) twin of ``brute_force_topk``: the query
    matrix is broadcast once; each Arrow batch of candidates computes ALL
    query dot products as one float64 matmul in mapInPandas, emitting local
    per-query top-k; a final tiny window picks the global top-k.

    This is the Pandas-UDF fast path for wide embeddings / many queries —
    batched BLAS beats per-element JVM expression folds as Q·dim grows. Kept
    out of the oracle gate (pairwise summation order differs from the
    sequential fold at the last ulp); ``brute_force_topk`` remains the
    bit-exact reference and the test asserts round-6 agreement."""
    from pyspark.sql import Window
    from pyspark.sql import types as T

    q_rows = queries.select(F.col(id_col).alias("qid"),
                            F.col(vec_col).alias("qv")).collect()
    spark = vectors.sparkSession
    import numpy as np

    id_type = dict(zip(vectors.schema.names,
                       [f.dataType for f in vectors.schema.fields]))[id_col]
    out_schema = T.StructType([
        T.StructField("query_id", id_type),
        T.StructField("neighbor_id", id_type),
        T.StructField("score", T.DoubleType()),
    ])
    if not q_rows:  # JVM twin returns empty; don't crash on a (0,) matrix
        return (spark.createDataFrame([], out_schema)
                     .withColumn("rank", F.lit(1)))

    qids = [r.qid for r in q_rows]
    qmat = np.array([list(r.qv) for r in q_rows], dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    bc = spark.sparkContext.broadcast((qids, qmat, qnorm))

    def score_batches(batches):
        import pandas as pd

        ids, mat, norms = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            cmat = np.array(list(pdf[vec_col].map(list)), dtype=np.float64)
            cnorm = np.sqrt((cmat * cmat).sum(axis=1))
            scores = (cmat @ mat.T) / np.outer(cnorm, norms)  # N×Q
            batch_ids = pdf[id_col].to_numpy()
            frames = []
            for j, qid in enumerate(ids):
                # local top-k must use the FINAL ordering — rounded score
                # desc, id asc — or round-level ties get cut differently
                # than the JVM twin's tie-break
                col = np.round(scores[:, j], 6)
                order = np.lexsort((batch_ids, -col))
                take = order[:min(k + 1, len(order))]  # +1: self may be present
                frames.append(pd.DataFrame({
                    "query_id": qid,
                    "neighbor_id": batch_ids[take],
                    "score": col[take],
                }))
            yield pd.concat(frames, ignore_index=True)

    local = vectors.select(id_col, vec_col) \
                   .repartition(_par(vectors)) \
                   .mapInPandas(score_batches, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col("neighbor_id").asc())
    return (local.filter(F.col("neighbor_id") != F.col("query_id"))
                 .withColumn("rank", F.row_number().over(w))
                 .filter(F.col("rank") <= k)
                 .select("query_id", "neighbor_id", "score", "rank"))
