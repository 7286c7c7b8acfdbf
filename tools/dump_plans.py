"""Regenerate PLANS.md: the executed physical plans of flagship queries
with the plan facts the engine's performance rests on.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

SHOWCASE = {
    "range_join": (
        "Interval containment join with NO equi key, re-expressed as a "
        "hash equi-join on interval buckets — the raw theta join would "
        "plan as BroadcastNestedLoop; here each qualifying pair meets in "
        "exactly one bucket."),
    "pack_sequences": (
        "Global token-stream prefix sum as a two-phase parallel scan: "
        "range repartition + per-partition offsets + intra-partition "
        "windows — NO SinglePartition exchange anywhere in the plan."),
    "pricing_summary": (
        "Filter reaches the parquet scan (PushedFilters) and only 7 of 16 "
        "lineitem columns are read (ReadSchema); partial+final hash "
        "aggregate around a single exchange."),
    "join_lineitem_part": (
        "Fact × dimension join: part is broadcast (BroadcastHashJoin) — "
        "the lineitem side is never shuffled."),
    "execute_query": (
        "4-table SQL passthrough: both dimension joins broadcast; only the "
        "orders↔customer join may shuffle, and AQE can upgrade it too."),
    "ngram_jaccard": (
        "PPJoin prefix-filtered set-similarity join: rarest-shingle prefix "
        "inverted index with length + positional candidate pruning, then "
        "int64 array_intersect verification — the Σ df(s)² pair product of "
        "a plain inverted join is never materialized."),
    "minhash_lsh": (
        "Banded signature join for candidates; verification joins whole "
        "shingle arrays (array_intersect) — cost tracks candidates, not "
        "the pair product."),
    "dedup_clusters": (
        "Iterative min-label propagation; each round joins edges⋈labels on "
        "vertex id and localCheckpoints to truncate lineage."),
    "cosine_near_dup": (
        "Exact two-stage threshold join (r14): BLAS candidate superset in "
        "mapInPandas (threshold − 1e-6 slack) → identical JVM round-6 "
        "verify behind two BroadcastHashJoins — NO corpus×corpus "
        "CartesianProduct/BroadcastNestedLoopJoin anywhere."),
    "simhash_dedup_keep": (
        "Survivor form (r14): signature stars + distinct-signature "
        "pigeonhole pairs span the same components as the full pair "
        "closure with O(N) edges; min-id keeper join at the end."),
    "semdedup_keep": (
        "SemDeDup (r14): trained-cluster blocking bounds the pair space "
        "to Σnᵢ²; the within-cluster products ride the BLAS candidate "
        "stage below the GEMM gate — no corpus×corpus product."),
    "prototype_prune": (
        "Prototypicality pruning (r14): distance to own centroid is a "
        "narrow map over centroid literals (no join, no shuffle of the "
        "vectors); rank and count share ONE cluster-keyed exchange."),
    "semdedup_incremental": (
        "Persisted SemDeDup serve path (r14): the delta broadcasts into "
        "the survivor join and the survivor scan prunes to the <= k "
        "routed clusters; the corpus is never re-scored."),
    "sessionize": (
        "lag → flag → running-sum over one user_id shuffle; both window "
        "frames reuse the same sort."),
    "decontaminate": (
        "Benchmark n-gram decontamination: the (small) benchmark shingle "
        "set is broadcast — the corpus side is never shuffled for the "
        "overlap probe; only the per-doc count re-aggregates on doc id."),
    "chunk_docs": (
        "Token-window chunking: tokenize → sequence/explode → slice, a "
        "narrow per-row map — zero joins, zero exchanges beyond the scan."),
    "weighted_sample": (
        "Weighted sampling with replacement: per-group cumulative weights "
        "via ONE running window, integer md5 draws, and the as-of "
        "union+window selection — a RUNNING (UnboundedPreceding) frame, "
        "never the O(n²)-per-partition UnboundedFollowing form."),
    "quality_verdict": (
        "Composed filter stack: three map-side rule frames (only the "
        "repetition leg shuffles) joined 1:1 on doc id; the verdict and "
        "reasons array are pure projections — no extra scan of raw text."),
    "duplicate_spans": (
        "Substring-level dedup: window fingerprints feed ONE "
        "count-per-hash aggregate (map-side partials — duplicate "
        "multiplicity never explodes into pairs), duplicated hashes "
        "broadcast back as a semi-join, and the island merge windows "
        "per-document; the fingerprint frame is localCheckpointed so the "
        "corpus tokenizes once."),
    "quota_sample": (
        "Fixed-budget mixture sampling: an integer hash-threshold "
        "prefilter (sized from one map-side count) means only "
        "~quota-sized survivor sets reach the rank window's shuffle — "
        "the 100 TB group never shuffles wholesale; the quota table is "
        "a BroadcastHashJoin."),
    "ivf_recall": (
        "ANN recall frame: both searches keep their certified shapes "
        "(broadcast queries / broadcast routed probes); the comparison "
        "adds one (query, neighbor) join and a Q-row aggregate — "
        "evaluation costs no more than the searches themselves."),
    "leakage_report": (
        "Benchmark leakage: benchmark window hashes BROADCAST into a "
        "map-side semi-join over the corpus window stream (the corpus "
        "never shuffles wholesale); the matched-hash set — bounded by "
        "the benchmark's own window count — broadcasts back to mark "
        "the benchmark windows."),
    "bloom_membership": (
        "Bloom cross-epoch dedup: the filter is 64 BIGINT words built "
        "by a map-side-combinable bit_or aggregate and BROADCAST to "
        "the probe; probing is a narrow map + tiny join — no corpus "
        "shuffle anywhere."),
    "corpus_shards": (
        "Epoch shuffle: positions come from the shared two-phase "
        "exclusive scan (range partition + driver offsets + "
        "intra-partition rank) — no SinglePartition exchange, no "
        "per-shard single-task sort."),
    "ann_pq": (
        "Product-quantization ANN: training collects only O(m·ksub·sub) "
        "centroid means per Lloyd round; encoding + reconstruction are "
        "ONE single-parse transform over a broadcast codebook literal "
        "(narrow map, no shuffle); ranking streams codes past the "
        "BROADCAST queries — the raw vectors never shuffle."),
    "pq_recall": (
        "PQ quality frame: the exact-L2 side is localCheckpointed so "
        "the Q×N search runs once for both the hit semi-join and the "
        "per-query denominator; every post-search stage is O(Q) rows."),
    "ann_pq_lut": (
        "LUT-form ADC: the scan side carries ONLY the m codes; the "
        "per-query m×ksub subdistance table rides the broadcast — "
        "ranking is m lookups + m−1 adds per pair, no 64-dim fold, "
        "no shuffle of anything vector-sized."),
    "ann_ivfpq": (
        "Composed IVFPQ: centroids broadcast for routing, routed "
        "(query, label) probes broadcast into the codes scan — the "
        "corpus never shuffles; ranking touches only the probed "
        "lists' reconstructions."),
    "dedup_safe_split": (
        "Leakage-safe split: the detector's LSH candidate join is the "
        "only heavy stage; components converge in a few bounded-lineage "
        "rounds, and the split is a narrow md5 map over the cluster id "
        "joined back once."),
    "ivfpq_rerank": (
        "Two-stage retrieval: stage 1 never touches raw vectors (codes "
        "+ broadcast codebooks in probed lists); stage 2 joins only "
        "Q·shortlist ids back to full precision — the sole raw-vector "
        "I/O in the search."),
    "ann_ivfpq_residual": (
        "Residual IVFPQ: centroids broadcast into a narrow residual "
        "map; the grid-quantized residual frame is lazily "
        "localCheckpointed (training materializes it 3+ times — the "
        "cut halved wall time), routing and ADC ranking keep the "
        "certified broadcast shapes."),
    "ann_ivfpq_indexed": (
        "Persisted IVFPQ serving path (r11/r12): codes scan carries "
        "PartitionFilters: label IN (probed set) — the routed labels "
        "are collected driver-side (≤ n_lists values) and pushed as a "
        "STATIC partition filter, so nprobe search reads only the "
        "probed posting-list directories; codebooks are one broadcast "
        "literal, raw vectors never appear."),
    "ann_filtered_indexed": (
        "Filtered serving query (r12): the allowed label set prunes "
        "the label-partitioned codes scan before any ADC work — "
        "PartitionFilters on the scan, certified ranking on what "
        "remains."),
    "ann_ivf_kmeans": (
        "Trained-quantizer IVF (r12): Lloyd training is 2 broadcast-"
        "literal narrow maps + tiny (cluster, dim) mean aggs; lists "
        "ride the assignment frame (no corpus re-join), routed probes "
        "reach the lists as ONE BroadcastHashJoin."),
    "ann_ivfpq_kmeans_indexed": (
        "The complete persisted IndexIVFPQ (r12): k-means-trained "
        "centroids route by L2 from index metadata, probed lists prune "
        "the codes partitions at the scan, ADC ranks stored codes — "
        "training, assignment and encoding all happened at build time."),
    "zorder_layout": (
        "Z-order decision frame (r12): one tiny min/max agg (collected "
        "as literals), a narrow pure-integer Morton map, and two "
        "grouped aggs with map-side partials — scan-bound at any "
        "corpus size."),
    "ivf_kmeans_recall": (
        "Trained-IVF recall frame (r12): exact side localCheckpointed "
        "(the _recall_frame cut), approximate side keeps the trained-"
        "IVF broadcast shapes; comparison is one semi-join + Q-row "
        "agg."),
    "hybrid_rrf": (
        "RRF hybrid retrieval (r12): both shortlists keep their "
        "certified plan shapes (dense broadcast fold, persisted-codes "
        "ADC); the fuse is one join on the Q-times-k result surface — "
        "corpus-size-independent, no score calibration."),
    "ivf_drift": (
        "Quantizer-drift frame (r12): live-member semi-join, one tiny "
        "(label, dim) mean shuffle, stored centroids broadcast from "
        "index metadata — scan-bound governance at any corpus size."),
    "ann_residual_indexed": (
        "Persisted residual IVFPQ (r12): routing + per-list query "
        "residuals are broadcast-side work; the probed label set "
        "prunes the codes partitions at the scan exactly like the "
        "raw-space twin — residual encoding changes the arithmetic, "
        "not the plan shape."),
    "ann_ivfpq_indexed_lut": (
        "The composed production serving kernel (r12): the probed "
        "label set prunes the codes partitions at the scan AND "
        "ranking is m LUT lookups per survivor — candidates join "
        "through the broadcast routed (query, label) pairs, so each "
        "query ranks only its own lists."),
    "minhash_dedup_incremental": (
        "Incremental dedup vs the persisted MinHash index (r12): the "
        "delta shingles/bands map-side, candidates come from one "
        "(band, bucket) join against the stored buckets, and exact "
        "Jaccard verifies only the candidates — corpus cost is its "
        "bucket rows, never a re-shingle."),
}


def main() -> None:
    import __spark_entry__ as E
    from keboola_storage_duckdb_spark.plans import formatted_plan, plan_facts
    from keboola_storage_duckdb_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")

    out = ["# PLANS — executed physical plans of flagship queries",
           "",
           f"Generated by `tools/dump_plans.py` at `{SF_DIR}`. These are the",
           "plan shapes `tests/test_plans.py` pins: pushdown + pruning at",
           "every scan, broadcast dimension joins, codegen over the hot",
           "expressions, no accidental shuffles.",
           ""]
    for name, why in SHOWCASE.items():
        df = E.queries()[name](spark, SF_DIR)
        facts = plan_facts(df, execute=True)
        out += [f"## {name}", "", why, "",
                f"- joins: {facts['joins'] or 'none'}",
                f"- exchanges: {facts['exchanges']}",
                f"- codegen spans: {facts['codegen_spans']}",
                f"- pushed filters: {facts['pushed_filters'] or 'none'}",
                "",
                "```",
                formatted_plan(df, "simple").strip(),
                "```", ""]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
