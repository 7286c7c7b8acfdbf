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
