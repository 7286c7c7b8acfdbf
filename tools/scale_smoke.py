"""Scale smoke: replicate the sf0.1 fixtures 10× (≈ sf1: 6M lineitem rows,
50k docs, 20k embeddings) into .tmp/ and run the headline operators.

This is the "would the plan survive a 10× scale-up" check the fixtures
can't provide: quadratic-output operators must degrade gracefully (the
inverted-index Jaccard REQUIRES its stop-shingle cap here — Σdf² grows
~100×; LSH/prefix paths must stay near-linear).

Usage: python tools/scale_smoke.py [replication_factor] [query ...]
(query names restrict the run — e.g. a 30× probe of just the newest
operators; the service-path smoke is skipped when a filter is given.)
Writes nothing outside /root/repo.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

REPL = int(sys.argv[1]) if len(sys.argv) > 1 else 10
ONLY = set(sys.argv[2:])
SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.tmp/scale_smoke"

ID_COLS = {
    "lineitem": "l_orderkey", "orders": "o_orderkey", "customer": "c_custkey",
    "documents": "doc_id", "embeddings": "vec_id", "events": "event_id",
}


def build(spark) -> None:
    from pyspark.sql import functions as F

    from keboola_storage_duckdb_spark.sources.tables import load_table

    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST, exist_ok=True)
    for t in ["region", "nation", "supplier", "part"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    for t, idc in ID_COLS.items():
        df = load_table(spark, SRC, t)  # ns-timestamp-safe loader
        n = df.agg(F.max(idc)).collect()[0][0] + 1
        reps = [df.withColumn(idc, F.col(idc) + F.lit(int(i * n)))
                for i in range(REPL)]
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        # many row groups → realistic multi-split scans
        out.repartition(16).write.mode("overwrite") \
           .parquet(f"{DST}/{t}.parquet")


def main() -> None:
    import __spark_entry__ as E
    from keboola_storage_duckdb_spark.functions.dedup_ml import (
        minhash_lsh_pairs, ngram_jaccard_pairs)
    from keboola_storage_duckdb_spark.session import get_spark
    from keboola_storage_duckdb_spark.sources.tables import load_table

    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    if os.environ.get("SCALE_SMOKE_REUSE") and os.path.isdir(DST):
        timings = {"build": "reused"}
    else:
        build(spark)
        timings = {"build": round(time.perf_counter() - t0, 1)}

    def run(name, fn):
        # Time construction + collect as ONE region: eager operators (the
        # iterative ones) do their work during construction, lazy ones at
        # collect. collect(), not count() — count() lets Catalyst prune the
        # projection expressions (the operator's actual work).
        t0 = time.perf_counter()
        n = len(fn().collect())
        timings[name] = {"sec": round(time.perf_counter() - t0, 1), "rows": n}

    Q = E.queries()
    for name in ["pricing_summary", "join_lineitem_part", "numeric_moments",
                 "quantiles", "distinct_counts", "sessionize", "minhash_lsh",
                 "ann_topk", "ann_topk_fold", "ann_ivf", "lang_id",
                 "top_terms", "table_profile", "kmeans", "chunk_docs",
                 "decontaminate", "gopher_quality", "pii_redact",
                 "simhash_pairs", "grouped_quantiles", "image_features",
                 "audio_features", "video_features", "range_join",
                 "pack_sequences", "repetition_signals", "hll_distinct",
                 "cm_heavy_hitters", "bottom_k_sample", "duplicate_spans",
                 "quality_verdict", "decontaminate_cut",
                 "weighted_sample", "boilerplate_strings", "dedup_rate",
                 "cut_spans", "dedup_cut_keep_first", "kmeans_fixed",
                 "quota_sample", "ivf_recall", "corpus_shards",
                 "ann_pq", "pq_recall", "ann_pq_lut", "ann_ivfpq",
                 "ann_ivfpq_residual", "ivfpq_rerank", "ivfpq_recall",
                 "dedup_safe_split", "token_length_profile",
                 "ann_pq_indexed", "ann_ivfpq_indexed", "ann_pq_indexed_lut",
                 "ann_index_add", "ann_index_merge", "ivfpq_rerank_indexed",
                 "pq_distortion", "ivf_imbalance", "epoch_plan",
                 "padding_waste", "bfd_pack", "ann_filtered_indexed",
                 "zorder_layout", "ann_ivf_kmeans", "ivf_kmeans_recall",
                 "ann_ivfpq_kmeans_indexed", "ann_index_delete",
                 "hybrid_rrf", "ivf_drift", "ann_sq8_indexed",
                 "ann_residual_indexed", "hybrid_recall",
                 "minhash_dedup_incremental", "ann_ivfpq_indexed_lut",
                 # r14: the exact two-stage cosine kernel + survivor forms
                 # made these 10×-viable (607/1110/1090 s → seconds)
                 "cosine_near_dup", "near_dedup_keep", "dedup_clusters",
                 "simhash_dedup_keep", "minhash_dedup_keep",
                 # r14 late: cluster-bounded pruning ops (T81/T82) and
                 # the persisted-index incremental serve path (T83)
                 "semdedup_keep", "prototype_prune",
                 "semdedup_incremental",
                 # r15: BPE tokenizer train/apply + stdlib PNG decode
                 "bpe_train", "bpe_apply", "image_features_png",
                 # r16: 8-round driver-crossover training + JPEG decode
                 "bpe_train8", "image_features_jpeg",
                 # r16b: container metadata walks (MP3/MP4/mixed sniff)
                 "audio_features_mp3", "video_features_mp4",
                 "media_metadata_mixed",
                 # r16c: event analytics (linkage/containment pair forms
                 # are quadratic-OUTPUT under replication — see below)
                 "funnel_steps", "cohort_retention", "gap_fill",
                 "transition_matrix", "top_paths", "ab_test_readout",
                 "rolling_zscore"]:
        if ONLY and name not in ONLY:
            continue
        run(name, lambda name=name: Q[name](spark, DST))

    # Quadratic-output operators at 10×: the UNBLOCKED/UNCAPPED forms are the
    # documented non-scale paths (the fixture's dense vocabulary makes Σdf²
    # grow ~100×; 20k×20k cosine pairs likewise). Measure the scale forms:
    # stop-shingle-capped inverted index, and label-blocked cosine pairs.
    if not ONLY:
        docs = load_table(spark, DST, "documents")
        run("ngram_jaccard_capped_df200",
            lambda: ngram_jaccard_pairs(docs, "doc_id", "text", 0.8,
                                        max_doc_freq=200, pack_ids=True))
        from keboola_storage_duckdb_spark.functions.similarity import (
            cosine_near_dup_pairs)
        emb = load_table(spark, DST, "embeddings")
        run("cosine_near_dup_blocked",
            lambda: cosine_near_dup_pairs(emb, "vec_id", "embedding", 0.45,
                                          block_col="label"))

        # r16c pair ops: replication duplicates every c_name / doc text
        # 10×, so the TRUE pair output grows ~100× (28M name pairs) and
        # the container posting lists go Σdf²-quadratic — the same wall
        # as the unblocked jaccard. Measure the capped scale forms, and
        # count() instead of collect() (the output IS tens of millions
        # of rows; the filter still forces the levenshtein / intersect
        # work, only the final row shipment is skipped).
        from keboola_storage_duckdb_spark.functions.dedup_ml import (
            ngram_containment_pairs)
        from keboola_storage_duckdb_spark.operators.linkage import (
            fuzzy_pairs_symdelete)

        def run_count(name, fn):
            t0 = time.perf_counter()
            n = fn().count()
            timings[name] = {"sec": round(time.perf_counter() - t0, 1),
                             "rows": n}

        cust = load_table(spark, DST, "customer")
        run_count("fuzzy_names_capped_vf40",
                  lambda: fuzzy_pairs_symdelete(cust, "c_custkey", "c_name",
                                                max_variant_freq=40))
        run_count("containment_capped_df200",
                  lambda: ngram_containment_pairs(docs, "doc_id", "text",
                                                  max_doc_freq=200))

        timings["service"] = service_path(spark)

    print(json.dumps({"replication": REPL, "timings": timings}, indent=2))


def service_path(spark) -> dict:
    """REST-path smoke at 10×: create → import(parquet) → profile → export
    through the Flask app (full routing + middleware), timing each leg.
    The import is the 6M-row lineitem replica; export exercises the
    projection/limit/compression path."""
    from keboola_storage_duckdb_spark.catalog.types import spark_to_duckdb_type
    from keboola_storage_duckdb_spark.engine import StorageEngine
    from keboola_storage_duckdb_spark.service.app import create_app
    from keboola_storage_duckdb_spark.sources.tables import load_table

    wh = os.path.join(DST, "wh_service")
    shutil.rmtree(wh, ignore_errors=True)
    eng = StorageEngine(spark, wh)
    app = create_app(eng)
    app.config["TESTING"] = True
    c = app.test_client()

    def post(url, body=None):
        r = c.post(url, data=json.dumps(body or {}),
                   content_type="application/json")
        assert r.status_code < 400, (url, r.status_code, r.get_data()[:300])
        return r.get_json()

    cols = [{"name": f.name,
             "type": spark_to_duckdb_type(f.dataType.simpleString().upper())}
            for f in load_table(spark, DST, "lineitem").schema.fields]
    post("/projects", {"id": "ps_scale"})
    post("/projects/ps_scale/branches/default/buckets", {"name": "in_c_s"})
    base = "/projects/ps_scale/branches/default/buckets/in_c_s/tables"
    post(base, {"name": "lineitem", "columns": cols})

    out = {}
    t0 = time.perf_counter()
    res = post(base + "/lineitem/import/file",
               {"path": f"{DST}/lineitem.parquet", "format": "parquet"})
    out["import"] = {"sec": round(time.perf_counter() - t0, 1),
                     "rows": res["rows_after"]}
    t0 = time.perf_counter()
    prof = post(base + "/lineitem/profile")
    out["profile"] = {"sec": round(time.perf_counter() - t0, 1),
                      "rows": prof["row_count"]}
    # VERDICT r6 #6: the sketch-backed distinct mode — the 100 TB profile
    # path (register maxima cross the shuffle, not every distinct value)
    t0 = time.perf_counter()
    prof = post(base + "/lineitem/profile", {"approx_distinct": True})
    out["profile_approx"] = {"sec": round(time.perf_counter() - t0, 1),
                             "rows": prof["row_count"]}
    t0 = time.perf_counter()
    exp = post(base + "/lineitem/export",
               {"format": "csv", "compression": "gzip",
                "columns": ["l_orderkey", "l_extendedprice", "l_shipdate"],
                "limit": 500000})
    out["export"] = {"sec": round(time.perf_counter() - t0, 1),
                     "rows": exp["rows_exported"]}
    return out


if __name__ == "__main__":
    main()
