"""Iterative k-means over embedding columns — the driver-coordinated
iterative-algorithm pattern (like graph.connected_components) applied to
vector clustering: assignment and re-estimation are distributed DataFrame
ops; only the k centroids (tiny) cross to the driver each round.

Deterministic end-to-end: seeds are the k vectors with the smallest
md5(id) (engine-portable hash, no RNG), ties in assignment break toward the
lower cluster id, and convergence is exact assignment-stability.

Scale notes (100 TB): each round is one broadcast of k·dim doubles + one
narrow map (assignment = argmin over k distances, JVM-side expressions) +
one (cluster, dim)-keyed mean aggregation. No shuffle of the vectors
themselves; rounds are the only serialization point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist2(vec_col: str, centroid: list[float]) -> F.Column:
    arr = "array(" + ",".join(f"CAST({x!r} AS DOUBLE)" for x in centroid) + ")"
    return F.expr(
        f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> "
        "(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")


def kmeans(vectors: DataFrame, id_col: str, vec_col: str, k: int = 4,
           max_iter: int = 10) -> DataFrame:
    """(id, cluster) hard assignments after Lloyd iterations (≤max_iter,
    stops early when assignments are stable)."""
    base = vectors.select(F.col(id_col).alias("id"),
                          F.col(vec_col).alias("v"))
    seeds = (base.withColumn("h", F.md5(F.col("id").cast("string")))
                 .orderBy("h").limit(k).select("v").collect())
    centroids = [list(r.v) for r in seeds]

    assign = None
    prev_counts: dict[int, int] | None = None
    for _ in range(max_iter):
        dists = base.select(
            "id", "v",
            *[_dist2("v", c).alias(f"d{j}") for j, c in enumerate(centroids)])
        best = F.lit(0)
        best_d = F.col("d0")
        for j in range(1, len(centroids)):
            cond = F.col(f"d{j}") < best_d
            best = F.when(cond, F.lit(j)).otherwise(best)
            best_d = F.when(cond, F.col(f"d{j}")).otherwise(best_d)
        assign = dists.select("id", "v", best.alias("cluster")) \
                      .localCheckpoint(eager=False)
        # re-estimate: mean per (cluster, dim); collect k tiny rows
        means = (assign.select("cluster", F.posexplode("v").alias("dim", "x"))
                       .groupBy("cluster", "dim")
                       .agg(F.avg(F.col("x").cast("double")).alias("m"))
                       .groupBy("cluster")
                       .agg(F.array_sort(
                            F.collect_list(F.struct("dim", "m"))).alias("dm"))
                       .select("cluster",
                               F.expr("transform(dm, s -> s.m)").alias("c"))
                       .collect())
        new_centroids = list(centroids)
        for r in means:
            new_centroids[r.cluster] = list(r.c)
        # convergence: per-cluster sizes stable AND centroids unchanged
        counts = {r.cluster: r.n for r in
                  assign.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
                        .collect()}
        if new_centroids == centroids and counts == prev_counts:
            break
        centroids = new_centroids
        prev_counts = counts
    return assign.select("id", "cluster")


def kmeans_fit(vectors: DataFrame, id_col: str, vec_col: str, k: int = 8,
               rounds: int = 2):
    """Fixed-round Lloyd TRAINING that also returns the model: exactly
    ``rounds`` assignment passes from the md5-seeded init (the
    bit-reproducible kmeans_fixed contract — no early stop, no RNG),
    returning ``(assignments, centroids)`` where ``assignments`` is
    ``(id, v, cluster)`` from the FINAL pass and ``centroids`` the k
    driver-side vectors that pass ranked against — i.e. the trained
    coarse quantizer an IVF index routes through. Clusters that lose
    all members keep their previous centroid (the COALESCE fallback of
    the certified chain)."""
    base = vectors.select(F.col(id_col).alias("id"),
                          F.col(vec_col).alias("v"))
    seeds = (base.withColumn("h", F.md5(F.col("id").cast("string")))
                 .orderBy("h").limit(k).select("v").collect())
    centroids = [[float(x) for x in r.v] for r in seeds]

    def _assign(cents):
        dists = base.select(
            "id", "v",
            *[_dist2("v", c).alias(f"d{j}") for j, c in enumerate(cents)])
        best = F.lit(0)
        best_d = F.col("d0")
        for j in range(1, len(cents)):
            cond = F.col(f"d{j}") < best_d          # strict: lower cluster
            best = F.when(cond, F.lit(j)).otherwise(best)   # wins ties
            best_d = F.when(cond, F.col(f"d{j}")).otherwise(best_d)
        return dists.select("id", "v", best.alias("cluster")) \
                    .localCheckpoint(eager=False)

    for _ in range(rounds - 1):
        assign = _assign(centroids)
        means = (assign.select("cluster", F.posexplode("v").alias("dim", "x"))
                       .groupBy("cluster", "dim")
                       .agg(F.avg(F.col("x").cast("double")).alias("m"))
                       .groupBy("cluster")
                       .agg(F.array_sort(
                            F.collect_list(F.struct("dim", "m"))).alias("dm"))
                       .select("cluster",
                               F.expr("transform(dm, s -> s.m)").alias("c"))
                       .collect())
        centroids = list(centroids)
        for r in means:
            centroids[r.cluster] = [float(x) for x in r.c]
    return _assign(centroids), centroids


def ivf_kmeans_ann_topk(vectors: DataFrame, queries: DataFrame,
                        id_col: str, vec_col: str, k: int = 5,
                        n_clusters: int = 8, rounds: int = 2,
                        nprobe: int = 2) -> DataFrame:
    """IVF with a TRAINED coarse quantizer (the real FAISS
    ``IndexIVFFlat`` construction — `faiss` trains the coarse
    quantizer by k-means; the repo's earlier ``ann_ivf`` routes
    through a pre-existing label column instead): Lloyd-train k
    centroids (``kmeans_fit``, the certified fixed-round chain),
    assign every vector to its inverted list, route each query to the
    ``nprobe`` nearest centroids by exact L2 (lower-cluster
    tie-break), and exact-rank (squared L2, round-6, lower-id
    tie-break) only inside the probed lists.

    Scale shape: training = ``rounds`` broadcast-literal narrow maps +
    one tiny (cluster, dim) mean agg per round; the corpus never
    shuffles — lists ride with the assignment frame, candidates come
    from ONE broadcast hash join of the tiny routed (query, cluster)
    probes. At 100 TB the assignment is written
    ``partitionBy(cluster)`` once and probes prune partitions — the
    same posting-list layout ``ann_index`` persists."""
    from pyspark.sql import Window

    labeled, centroids = kmeans_fit(vectors, id_col, vec_col,
                                    k=n_clusters, rounds=rounds)
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    qd = q.select(
        "query_id", "qv",
        *[_dist2("qv", c).alias(f"d{j}")
          for j, c in enumerate(centroids)])
    routed = (qd.select(
        "query_id", "qv",
        F.posexplode(F.array(*[F.col(f"d{j}")
                               for j in range(len(centroids))]))
         .alias("cluster", "cd"))
        .withColumn("rt", F.row_number().over(
            Window.partitionBy("query_id")
                  .orderBy(F.col("cd").asc_nulls_last(),
                           F.col("cluster").asc())))
        .filter(F.col("rt") <= nprobe)
        .select("query_id", "qv", "cluster"))
    cand = labeled.join(F.broadcast(routed), "cluster") \
                  .filter(F.col("id") != F.col("query_id"))
    d = F.expr(
        "aggregate(zip_with(qv, v, (x, y) -> "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc_nulls_last(), F.col("neighbor_id").asc())
    return (cand.select("query_id",
                        F.col("id").alias("neighbor_id"),
                        F.round(d, 6).alias("dist"))
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "dist", "rank"))
