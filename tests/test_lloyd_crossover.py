"""Driver-Lloyd crossover (r16 opt): kmeans / kmeans_fit /
pq_train_codebooks run their iteration driver-side under
_DRIVER_LLOYD_MAX_FLOATS — these tests pin BIT-equality of centroids,
codebooks and assignments against the distributed loop
(driver_float_limit=0 forces it), the connected_components /
bpe_train crossover discipline."""

import pytest

from keboola_storage_duckdb_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "/root/testdata/sf0.01", "embeddings")


def test_kmeans_driver_equals_distributed(spark, emb):
    from keboola_storage_duckdb_spark.functions.clustering import kmeans
    drv = sorted(map(tuple, kmeans(emb, "vec_id", "embedding",
                                   k=4, max_iter=10).collect()))
    dist = sorted(map(tuple, kmeans(emb, "vec_id", "embedding", k=4,
                                    max_iter=10,
                                    driver_float_limit=0).collect()))
    assert drv == dist and len(drv) > 0


def test_kmeans_fit_driver_equals_distributed(spark, emb):
    from keboola_storage_duckdb_spark.functions.clustering import kmeans_fit
    a_drv, c_drv = kmeans_fit(emb, "vec_id", "embedding", k=8, rounds=2)
    a_dst, c_dst = kmeans_fit(emb, "vec_id", "embedding", k=8, rounds=2,
                              driver_float_limit=0)
    # centroids bit-equal (plain float lists on both paths)
    assert c_drv == c_dst
    assert (sorted(map(tuple, a_drv.select("id", "cluster").collect()))
            == sorted(map(tuple, a_dst.select("id", "cluster").collect())))


def test_kmeans_fit_more_rounds_bitequal(spark, emb):
    from keboola_storage_duckdb_spark.functions.clustering import kmeans_fit
    _, c_drv = kmeans_fit(emb, "vec_id", "embedding", k=5, rounds=4)
    _, c_dst = kmeans_fit(emb, "vec_id", "embedding", k=5, rounds=4,
                          driver_float_limit=0)
    assert c_drv == c_dst


def test_pq_codebooks_driver_equals_distributed(spark, emb):
    from keboola_storage_duckdb_spark.functions.similarity import (
        pq_train_codebooks)
    cb_drv = pq_train_codebooks(emb, "vec_id", "embedding",
                                m=4, ksub=8, dim=64, iters=2)
    cb_dst = pq_train_codebooks(emb, "vec_id", "embedding",
                                m=4, ksub=8, dim=64, iters=2,
                                driver_float_limit=0)
    assert cb_drv == cb_dst


def test_lloyd_collect_gates(spark, emb):
    """Size gate refuses (falls to distributed), null vectors refuse."""
    from pyspark.sql import functions as F

    from keboola_storage_duckdb_spark.functions.clustering import (
        _lloyd_collect)
    base = emb.select(F.col("vec_id").alias("id"),
                      F.col("embedding").alias("v"))
    assert _lloyd_collect(base, 1) is None            # too many floats
    assert _lloyd_collect(base, 0) is None            # disabled
    withnull = base.withColumn(
        "v", F.when(F.col("id") == 0, F.lit(None)).otherwise(F.col("v")))
    assert _lloyd_collect(withnull, 10**9) is None    # null vector
    assert _lloyd_collect(base, 10**9) is not None


def test_lloyd_collect_refuses_nan_element(spark, emb):
    """ADVICE r16: a NULL ELEMENT inside a vector (NaN after np.stack)
    must refuse the driver route — the distributed F.avg skips NULLs,
    so the routes genuinely diverge there, and the NaN centroid would
    render an unparseable CAST(nan AS DOUBLE) literal."""
    from pyspark.sql import functions as F

    from keboola_storage_duckdb_spark.functions.clustering import (
        _lloyd_collect, kmeans)
    base = emb.select(F.col("vec_id").alias("id"),
                      F.col("embedding").alias("v"))
    poisoned = base.withColumn(
        "v", F.when(F.col("id") == 0,
                    F.expr("transform(v, (x, i) -> "
                           "CASE WHEN i = 0 THEN NULL ELSE x END)"))
             .otherwise(F.col("v")))
    assert _lloyd_collect(poisoned, 10**9) is None
    # and kmeans on such input serves from the distributed loop without
    # crashing (F.avg skips the NULL element)
    out = kmeans(poisoned, "id", "v", k=2, max_iter=1).collect()
    assert len(out) > 0


def test_lloyd_collect_refuses_non_float32_exact(spark):
    """ADVICE r16: driver means use numpy pairwise summation, the
    distributed route merges Spark partial sums — bit-equal only when
    sums are exact. Varying-exponent float64 data (not float32
    round-trippable) must therefore refuse the driver route."""
    from keboola_storage_duckdb_spark.functions.clustering import (
        _lloyd_collect)
    rows = [(i, [1.0 + 1e-12 * i, 2.0 ** (-30 + i), 0.1])
            for i in range(12)]
    df = spark.createDataFrame(rows, "id bigint, v array<double>")
    assert _lloyd_collect(df, 10**9) is None
    # the same magnitudes rounded to float32 pass
    import numpy as np
    rows32 = [(i, [float(np.float32(v)) for v in vec])
              for i, vec in rows]
    df32 = spark.createDataFrame(rows32, "id bigint, v array<double>")
    assert _lloyd_collect(df32, 10**9) is not None
