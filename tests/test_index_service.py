"""Vector indexes as first-class storage objects (beyond-reference —
the persisted ANN lifecycle of functions/ann_index.py exposed over the
REST surface): create a table holding an embedding column, build PQ and
SQ8 indexes on it, search, inspect (stats + staleness after a delete),
compact, drop. The search results are cross-checked against the
functions-API kernels the oracle gate certifies."""

import json
import os

import pytest
from pyspark.sql import functions as F

from keboola_storage_duckdb_spark.engine import StorageEngine
from keboola_storage_duckdb_spark.service.app import create_app

BASE = "/projects/px/branches/default/buckets/in_c_vec/tables"
TBL = BASE + "/emb"


@pytest.fixture(scope="module")
def ctx(spark, sf_dir, tmp_path_factory):
    from keboola_storage_duckdb_spark.sources.tables import load_table

    eng = StorageEngine(spark, str(tmp_path_factory.mktemp("wh_idx")))
    app = create_app(eng)
    app.config["TESTING"] = True
    emb = load_table(spark, sf_dir, "embeddings")
    with app.test_client() as c:
        _post(c, "/projects", {"id": "px"})
        _post(c, "/projects/px/branches/default/buckets",
              {"name": "in_c_vec"})
        cols = [{"name": "vec_id", "type": "BIGINT", "nullable": False},
                {"name": "label", "type": "INTEGER", "nullable": True},
                {"name": "embedding", "type": "FLOAT[]",
                 "nullable": True}]
        r = _post(c, BASE, {"name": "emb", "columns": cols})
        assert r.status_code == 201, r.get_json()
        src = str(tmp_path_factory.mktemp("src") / "emb.parquet")
        emb.select("vec_id", "label", "embedding").write.parquet(src)
        r = _post(c, TBL + "/import/file",
                  {"path": src, "format": "parquet"})
        assert r.status_code == 200, r.get_json()
        yield c, eng, emb


def _post(client, url, body=None, **kw):
    return client.post(url, data=json.dumps(body or {}),
                       content_type="application/json", **kw)


def _query_rows(emb, n=3):
    rows = (emb.filter(F.col("vec_id") < n)
               .select("vec_id", "embedding").collect())
    return [{"id": r.vec_id, "vector": [float(x) for x in r.embedding]}
            for r in rows]


def test_create_search_matches_functions_kernel(ctx):
    c, eng, emb = ctx
    r = _post(c, TBL + "/indexes",
              {"name": "pq_main", "id_column": "vec_id",
               "vector_column": "embedding"})
    assert r.status_code == 201, r.get_json()
    info = r.get_json()
    assert info["kind"] == "pq" and not info["stale"]
    assert info["n_vectors"] == info["built_rows"] > 0

    qs = _query_rows(emb)
    r = _post(c, TBL + "/indexes/pq_main/search",
              {"queries": qs, "k": 5})
    assert r.status_code == 200
    got = {(x["query_id"], x["rank"]): x["neighbor_id"]
           for x in r.get_json()["results"]}
    assert len(got) == 5 * len(qs)
    # cross-check against the certified functions kernel on the SAME
    # stored artifacts
    from keboola_storage_duckdb_spark.functions import ann_index as AI
    idx = AI.pq_index_load(eng.spark, eng._index_path(
        "px", "in_c_vec", "emb", "pq_main"))
    spark = eng.spark
    qdf = spark.createDataFrame(
        [(q["id"], q["vector"]) for q in qs],
        "query_id bigint, vector array<double>")
    want = {(r.query_id, r.rank): r.neighbor_id
            for r in AI.pq_index_search(spark, idx, qdf, "query_id",
                                        "vector", k=5).collect()}
    assert got == want


def test_labeled_index_nprobe_and_filter(ctx):
    c, eng, emb = ctx
    r = _post(c, TBL + "/indexes",
              {"name": "ivf", "id_column": "vec_id",
               "vector_column": "embedding", "label_column": "label"})
    assert r.status_code == 201, r.get_json()
    info = r.get_json()
    assert info["label_column"] == "label" and info["n_lists"] > 1
    assert info["imbalance"] >= 1.0          # Cauchy-Schwarz lower bound
    qs = _query_rows(emb, 2)
    r = _post(c, TBL + "/indexes/ivf/search",
              {"queries": qs, "k": 3, "nprobe": 2})
    assert r.status_code == 200
    assert len(r.get_json()["results"]) == 3 * len(qs)
    r = _post(c, TBL + "/indexes/ivf/search",
              {"queries": qs, "k": 3, "filter_labels": [1, 3]})
    labs = {x["neighbor_id"] for x in r.get_json()["results"]}
    allowed = {r.vec_id for r in emb.filter(
        F.col("label").isin([1, 3])).select("vec_id").collect()}
    assert labs <= allowed


def test_sq8_index_and_validation(ctx):
    c, eng, emb = ctx
    r = _post(c, TBL + "/indexes",
              {"name": "sq8", "id_column": "vec_id",
               "vector_column": "embedding", "kind": "sq8"})
    assert r.status_code == 201
    qs = _query_rows(emb, 2)
    assert _post(c, TBL + "/indexes/sq8/search",
                 {"queries": qs, "k": 3}).status_code == 200
    # sq8 takes no nprobe
    assert _post(c, TBL + "/indexes/sq8/search",
                 {"queries": qs, "k": 3, "nprobe": 2}).status_code == 400
    # wrong dim rejected
    assert _post(c, TBL + "/indexes/sq8/search",
                 {"queries": [{"id": -1, "vector": [0.0] * 3}],
                  "k": 3}).status_code == 400
    # duplicate name rejected, bad columns rejected
    assert _post(c, TBL + "/indexes",
                 {"name": "sq8", "id_column": "vec_id",
                  "vector_column": "embedding",
                  "kind": "sq8"}).status_code == 409
    assert _post(c, TBL + "/indexes",
                 {"name": "bad", "id_column": "nope",
                  "vector_column": "embedding"}).status_code == 400


def test_listing_staleness_compact_drop(ctx):
    c, eng, emb = ctx
    names = {i["name"] for i in
             c.get(TBL + "/indexes").get_json()["indexes"]}
    assert {"pq_main", "ivf", "sq8"} <= names
    # a table mutation flags every index stale
    r = c.delete(TBL + "/rows",
                 data=json.dumps({"where": "vec_id = 0"}),
                 content_type="application/json")
    assert r.status_code == 200, r.get_json()
    info = c.get(TBL + "/indexes/pq_main").get_json()
    assert info["stale"] and info["table_rows"] == info["built_rows"] - 1
    # compact (threshold 0 forces a rewrite) leaves search results intact
    before = _post(c, TBL + "/indexes/pq_main/search",
                   {"queries": _query_rows(emb, 2), "k": 3}).get_json()
    r = _post(c, TBL + "/indexes/pq_main/compact", {"max_files": 0})
    assert r.status_code == 200 and r.get_json()["compacted"]
    after = _post(c, TBL + "/indexes/pq_main/search",
                  {"queries": _query_rows(emb, 2), "k": 3}).get_json()
    assert before == after
    # drop
    assert c.delete(TBL + "/indexes/sq8").status_code == 200
    assert c.get(TBL + "/indexes/sq8").status_code == 404
    names = {i["name"] for i in
             c.get(TBL + "/indexes").get_json()["indexes"]}
    assert "sq8" not in names


def test_refresh_reconciles_without_retraining(ctx, spark):
    """Incremental sync: after the vec_id=0 delete (previous test) the
    index is stale; refresh removes the orphan posting and re-stamps —
    WITHOUT touching codebooks — so search equals a rebuild over the
    current table with the SAME codebooks. A second refresh is a
    no-op."""
    c, eng, emb = ctx
    from keboola_storage_duckdb_spark.functions import ann_index as AI

    path = eng._index_path("px", "in_c_vec", "emb", "pq_main")
    cb_before = AI.pq_index_load(spark, path).cb
    r = _post(c, TBL + "/indexes/pq_main/refresh")
    assert r.status_code == 200
    out = r.get_json()
    assert out == {"added": 0, "deleted": 1,
                   "table_rows": out["table_rows"], "stale": False}
    info = c.get(TBL + "/indexes/pq_main").get_json()
    assert not info["stale"] and info["n_vectors"] == info["table_rows"]
    idx = AI.pq_index_load(spark, path)
    assert idx.cb == cb_before                       # never retrained
    # deleted id gone from results even as a forced near neighbor
    qs = _query_rows(emb, 3)
    res = _post(c, TBL + "/indexes/pq_main/search",
                {"queries": qs, "k": 5}).get_json()["results"]
    assert all(x["neighbor_id"] != 0 for x in res)
    # no-op second refresh
    r = _post(c, TBL + "/indexes/pq_main/refresh").get_json()
    assert r["added"] == 0 and r["deleted"] == 0


DOCS_BASE = "/projects/px/branches/default/buckets/in_c_vec/tables"
DTBL = DOCS_BASE + "/docs"


def test_minhash_dedup_index_over_rest(ctx, spark, tmp_path):
    """Dedup indexes as storage objects: create a minhash index on a
    text column, run the ingestion-time dedup_check, refresh after a
    table mutation, and hit the kind-validation walls."""
    c, eng, _ = ctx
    cols = [{"name": "doc_id", "type": "BIGINT", "nullable": False},
            {"name": "text", "type": "VARCHAR", "nullable": True}]
    r = _post(c, DOCS_BASE, {"name": "docs", "columns": cols})
    assert r.status_code == 201, r.get_json()
    texts = [
        (1, "the quick brown fox jumps over the lazy dog every morning"),
        (2, "the quick brown fox jumps over the lazy dog every evening"),
        (3, "completely different content about storage engines and parquet"),
        (4, "yet another unrelated document mentioning spark and duckdb"),
    ]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(texts, "doc_id bigint, text string") \
         .coalesce(1).write.parquet(src)
    r = _post(c, DTBL + "/import/file", {"path": src, "format": "parquet"})
    assert r.status_code == 200, r.get_json()

    r = _post(c, DTBL + "/indexes",
              {"name": "dd", "kind": "minhash", "id_column": "doc_id",
               "text_column": "text"})
    assert r.status_code == 201, r.get_json()
    info = r.get_json()
    assert info["kind"] == "minhash" and info["n_vectors"] == 4

    # an exact copy of doc 1 must hit with jaccard 1.0
    r = _post(c, DTBL + "/indexes/dd/dedup",
              {"documents": [{"id": -1, "text": texts[0][1]},
                             {"id": -2, "text": "nothing like anything "
                                                "indexed here at all"}]})
    assert r.status_code == 200, r.get_json()
    hits = r.get_json()["hits"]
    assert {h["id"] for h in hits} == {-1}
    assert any(h["duplicate_of"] == 1 and h["jaccard"] == 1.0
               for h in hits)

    # kind walls: vector search on a dedup index / dedup on a vector
    # index / compact on a dedup index
    assert _post(c, DTBL + "/indexes/dd/search",
                 {"queries": [{"id": -1, "vector": [0.0] * 64}],
                  "k": 3}).status_code == 400
    r = _post(c, TBL + "/indexes",
              {"name": "pqx", "id_column": "vec_id",
               "vector_column": "embedding"})
    assert r.status_code == 201, r.get_json()
    assert _post(c, TBL + "/indexes/pqx/dedup",
                 {"documents": [{"id": -1, "text": "x y"}]}
                 ).status_code == 400
    assert _post(c, DTBL + "/indexes/dd/compact", {}).status_code == 400

    # refresh reconciles a table mutation (delete doc 4)
    r = c.delete(DTBL + "/rows",
                 data=json.dumps({"where": "doc_id = 4"}),
                 content_type="application/json")
    assert r.status_code == 200
    info = c.get(DTBL + "/indexes/dd").get_json()
    assert info["stale"]
    r = _post(c, DTBL + "/indexes/dd/refresh")
    assert r.status_code == 200
    assert r.get_json() == {"added": 0, "deleted": 1, "table_rows": 3,
                            "stale": False}
    info = c.get(DTBL + "/indexes/dd").get_json()
    assert not info["stale"] and info["n_vectors"] == 3


def test_refresh_delete_spanning_multiple_leaves(ctx, spark):
    """ADVICE r12 (high): refresh_index used to hand pq_index_delete a
    LAZY gone-frame whose plan read the index's own codes parquet; once
    the first posting list was swapped, the next leaf's rewrite re-read
    already-deleted files (FAILED_READ_FILE) whenever the deleted ids
    spanned >= 2 lists. Repro: delete rows across several labels on the
    LABELED ivf index, then refresh — must reconcile cleanly."""
    c, eng, emb = ctx
    # pick one id per label from 3 distinct labels (all still live)
    victims = [r.vid for r in
               (emb.filter((F.col("vec_id") > 0) & (F.col("label") < 3))
                   .groupBy("label").agg(F.min("vec_id").alias("vid"))
                   .collect())]
    assert len(victims) >= 2
    in_list = ", ".join(str(v) for v in victims)
    r = c.delete(TBL + "/rows",
                 data=json.dumps({"where": f"vec_id IN ({in_list})"}),
                 content_type="application/json")
    assert r.status_code == 200, r.get_json()
    # ivf still carries vec_id=0 from the earlier mutation too
    r = _post(c, TBL + "/indexes/ivf/refresh")
    assert r.status_code == 200, r.get_json()
    out = r.get_json()
    assert out["deleted"] == len(victims) + 1 and out["added"] == 0
    assert not c.get(TBL + "/indexes/ivf").get_json()["stale"]
    # none of the deleted ids may surface from any probed list
    qs = _query_rows(emb, 4)
    res = _post(c, TBL + "/indexes/ivf/search",
                {"queries": qs, "k": 5, "nprobe": 3}).get_json()["results"]
    gone = set(victims) | {0}
    assert all(x["neighbor_id"] not in gone for x in res)


GTBL = BASE + "/gov"


def test_rebuild_recommendation_flips_on_churn(ctx, spark, tmp_path_factory):
    """Index governance (VERDICT r12 #5): the drift/imbalance/distortion
    signals compose into ONE recommend_rebuild verdict on the index-info
    surface. Fresh build -> False (stored centroids ARE the member
    means). Then churn: most of list 0's members are deleted and
    replaced by rows filed under label 0 but POSITIONED in cluster 1's
    region (the data-migrated-under-a-frozen-quantizer scenario) — the
    stored centroid now describes members that left, drift exceeds the
    list's own quantization error, and the flag flips."""
    import numpy as np

    from helpers_clustered import clustered_rows
    c, eng, _ = ctx
    cols = [{"name": "vec_id", "type": "BIGINT", "nullable": False},
            {"name": "label", "type": "INTEGER", "nullable": True},
            {"name": "embedding", "type": "FLOAT[]", "nullable": True}]
    assert _post(c, BASE, {"name": "gov", "columns": cols}).status_code == 201
    rows = clustered_rows(800, k=8)
    df = spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<double>")
    src = str(tmp_path_factory.mktemp("gov") / "gov.parquet")
    df.write.parquet(src)
    assert _post(c, GTBL + "/import/file",
                 {"path": src, "format": "parquet"}).status_code == 200
    r = _post(c, GTBL + "/indexes",
              {"name": "g", "id_column": "vec_id",
               "vector_column": "embedding", "label_column": "label"})
    assert r.status_code == 201, r.get_json()
    # fresh: centroids == member means -> no drift, balanced lists
    info = c.get(GTBL + "/indexes/g?recommend=1").get_json()
    rec = info["recommendation"]
    assert rec["recommend_rebuild"] is False and rec["reasons"] == []
    assert rec["signals"]["drifted_lists"] == []
    # plain metadata read stays cheap: no recommendation key
    assert "recommendation" not in c.get(GTBL + "/indexes/g").get_json()
    # churn list 0: drop 90 of its 100 members...
    r = c.delete(GTBL + "/rows",
                 data=json.dumps(
                     {"where": "label = 0 AND vec_id >= 80"}),
                 content_type="application/json")
    assert r.status_code == 200, r.get_json()
    # ...and file 90 cluster-1-positioned rows under label 0
    churn = clustered_rows(90, k=8, id_offset=10_000,
                           cluster_of=lambda i: 1,
                           label_of=lambda i: 0)
    cdf = spark.createDataFrame(
        churn, "vec_id bigint, label int, embedding array<double>")
    csrc = str(tmp_path_factory.mktemp("gov2") / "churn.parquet")
    cdf.write.parquet(csrc)
    assert _post(c, GTBL + "/import/file",
                 {"path": csrc, "format": "parquet",
                  "import_options": {"incremental": True}}
                 ).status_code == 200
    r = _post(c, GTBL + "/indexes/g/refresh")
    assert r.status_code == 200, r.get_json()
    out = r.get_json()
    assert out["added"] == 90 and out["deleted"] == 90
    info = c.get(GTBL + "/indexes/g?recommend=1").get_json()
    rec = info["recommendation"]
    assert rec["recommend_rebuild"] is True, rec
    assert 0 in rec["signals"]["drifted_lists"], rec
    assert any("drifted" in s for s in rec["reasons"])

    # --- r14 (VERDICT r13 #5): governance ACTS on its own verdict.
    # The gated rebuild re-trains codebooks+centroids at the current
    # corpus and swaps atomically...
    r = _post(c, GTBL + "/indexes/g/rebuild", {"if_recommended": True})
    assert r.status_code == 200, r.get_json()
    out = r.get_json()
    assert out["rebuilt"] is True and out["stale"] is False
    # ...the flag clears (fresh centroids ARE the member means again)...
    rec = c.get(GTBL + "/indexes/g?recommend=1") \
        .get_json()["recommendation"]
    assert rec["recommend_rebuild"] is False, rec
    assert rec["signals"]["drifted_lists"] == []
    # ...search over the swapped artifacts still matches the certified
    # kernel bit-for-bit...
    from keboola_storage_duckdb_spark.functions import ann_index as AI
    qs = _query_rows(
        spark.createDataFrame(rows[:4],
                              "vec_id bigint, label int, "
                              "embedding array<double>"), 4)
    res = _post(c, GTBL + "/indexes/g/search",
                {"queries": qs, "k": 5, "nprobe": 3}).get_json()["results"]
    got = {(x["query_id"], x["rank"]): x["neighbor_id"] for x in res}
    idx = AI.pq_index_load(eng.spark, eng._index_path(
        "px", "in_c_vec", "gov", "g"))
    qdf = spark.createDataFrame(
        [(q["id"], q["vector"]) for q in qs],
        "query_id bigint, vector array<double>")
    want = {(r.query_id, r.rank): r.neighbor_id
            for r in AI.pq_index_search(spark, idx, qdf, "query_id",
                                        "vector", k=5,
                                        nprobe=3).collect()}
    assert got == want
    # ...and a second gated rebuild is a no-op with the verdict attached
    out = _post(c, GTBL + "/indexes/g/rebuild",
                {"if_recommended": True}).get_json()
    assert out["rebuilt"] is False and out["reason"] == "not recommended"
    assert out["recommendation"]["recommend_rebuild"] is False


def test_rebuild_sq8_and_minhash_kinds(ctx, spark, tmp_path_factory):
    """rebuild_index re-trains EVERY index kind at the current corpus:
    SQ8 re-fits the per-dim grid, minhash re-shingles — both swap
    atomically and clear staleness; the gated form refuses non-pq kinds
    (no governance signals to honor)."""
    c, eng, emb = ctx
    # sq8 over the existing emb table
    r = _post(c, TBL + "/indexes",
              {"name": "sq8_rb", "id_column": "vec_id",
               "vector_column": "embedding", "kind": "sq8"})
    assert r.status_code == 201, r.get_json()
    out = _post(c, TBL + "/indexes/sq8_rb/rebuild").get_json()
    assert out["rebuilt"] is True and out["stale"] is False
    qs = _query_rows(emb, 2)
    res = _post(c, TBL + "/indexes/sq8_rb/search",
                {"queries": qs, "k": 3}).get_json()["results"]
    assert len(res) == 6
    r = _post(c, TBL + "/indexes/sq8_rb/rebuild", {"if_recommended": True})
    assert r.status_code == 400, r.get_json()   # ungoverned kind refuses
    # minhash over a small docs table
    cols = [{"name": "doc_id", "type": "BIGINT", "nullable": False},
            {"name": "text", "type": "VARCHAR", "nullable": True}]
    assert _post(c, BASE, {"name": "docs_rb",
                           "columns": cols}).status_code == 201
    rows = [(i, f"the quick brown fox number {i % 7} jumps")
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    src = str(tmp_path_factory.mktemp("rb") / "d.parquet")
    df.write.parquet(src)
    assert _post(c, BASE + "/docs_rb/import/file",
                 {"path": src, "format": "parquet"}).status_code == 200
    r = _post(c, BASE + "/docs_rb/indexes",
              {"name": "mh", "id_column": "doc_id",
               "text_column": "text", "kind": "minhash"})
    assert r.status_code == 201, r.get_json()
    out = _post(c, BASE + "/docs_rb/indexes/mh/rebuild").get_json()
    assert out["rebuilt"] is True and out["stale"] is False
    hits = _post(c, BASE + "/docs_rb/indexes/mh/dedup",
                 {"documents": [{"id": -1,
                                 "text": "the quick brown fox number 3 "
                                         "jumps"}]}).get_json()
    assert hits["n_hits"] >= 1


SEMTBL = DOCS_BASE + "/semv"


def test_semdedup_index_over_rest(ctx, spark, tmp_path):
    """Semantic-dedup indexes as storage objects (T83 over REST):
    create a semdedup index on an embedding column, run the
    ingestion-time vector dedup_check (dropped corpus members never
    veto), refresh after imports/deletes without re-scoring processed
    rows, rebuild retrains at the current corpus, and hit the
    kind-validation walls. Unit-circle fixture, k=1, threshold 0.9
    (cos 20deg = 0.94 matches, cos 40deg = 0.77 does not)."""
    import math

    def vec(deg):
        a = math.radians(deg)
        return [math.cos(a), math.sin(a)]

    c, eng, _ = ctx
    cols = [{"name": "vec_id", "type": "BIGINT", "nullable": False},
            {"name": "embedding", "type": "DOUBLE[]", "nullable": True}]
    r = _post(c, DOCS_BASE, {"name": "semv", "columns": cols})
    assert r.status_code == 201, r.get_json()
    src = str(tmp_path / "semv.parquet")
    spark.createDataFrame(
        [(1, vec(0)), (2, vec(20)), (3, vec(180))],
        "vec_id bigint, embedding array<double>") \
        .coalesce(1).write.parquet(src)
    r = _post(c, SEMTBL + "/import/file", {"path": src,
                                           "format": "parquet"})
    assert r.status_code == 200, r.get_json()

    r = _post(c, SEMTBL + "/indexes",
              {"name": "sd", "kind": "semdedup", "id_column": "vec_id",
               "vector_column": "embedding", "n_clusters": 1,
               "threshold": 0.9})
    assert r.status_code == 201, r.get_json()
    info = r.get_json()
    assert info["kind"] == "semdedup" and info["threshold"] == 0.9
    assert info["n_vectors"] == 2          # survivors: 2 dropped vs 1
    assert info["built_rows"] == 3 and not info["stale"]

    # verdicts: near a SURVIVOR -> drop; near only the DROPPED member
    # -> keep (the index forgot it); far from everything -> keep
    r = _post(c, SEMTBL + "/indexes/sd/dedup",
              {"documents": [{"id": -1, "vector": vec(2)},
                             {"id": -2, "vector": vec(40)},
                             {"id": -3, "vector": vec(270)}]})
    assert r.status_code == 200, r.get_json()
    hits = {h["id"]: h["keep"] for h in r.get_json()["hits"]}
    assert hits == {-3: True, -2: True, -1: False}

    # validation walls
    assert _post(c, SEMTBL + "/indexes/sd/dedup",
                 {"documents": [{"id": -1, "vector": [1.0, 0.0, 0.0]}]}
                 ).status_code == 400       # dim mismatch
    assert _post(c, SEMTBL + "/indexes/sd/dedup",
                 {"documents": [{"id": -1, "text": "not a vector"}]}
                 ).status_code == 400       # wrong payload shape
    assert _post(c, SEMTBL + "/indexes/sd/dedup",
                 {"documents": [{"id": -1, "vector": vec(5)}],
                  "threshold": 0.5}
                 ).status_code == 400   # frozen threshold, no override
    assert _post(c, SEMTBL + "/indexes/sd/search",
                 {"queries": [{"id": -1, "vector": vec(5)}]}
                 ).status_code == 400       # dedup indexes don't search
    assert _post(c, SEMTBL + "/indexes/sd/compact", {}).status_code == 400

    # refresh: new row 5 at 181deg routes next to survivor 3 -> dropped
    # (processed but NOT appended); survivors unchanged
    src2 = str(tmp_path / "semv2.parquet")
    spark.createDataFrame([(5, vec(181))],
                          "vec_id bigint, embedding array<double>") \
         .coalesce(1).write.parquet(src2)
    r = _post(c, SEMTBL + "/import/file",
              {"path": src2, "format": "parquet",
               "import_options": {"incremental": True}})
    assert r.status_code == 200, r.get_json()
    info = c.get(SEMTBL + "/indexes/sd").get_json()
    assert info["stale"]
    r = _post(c, SEMTBL + "/indexes/sd/refresh")
    assert r.status_code == 200, r.get_json()
    assert r.get_json() == {"added": 0, "processed": 1, "deleted": 0,
                            "table_rows": 4, "stale": False}
    info = c.get(SEMTBL + "/indexes/sd").get_json()
    assert not info["stale"] and info["n_vectors"] == 2

    # delete survivor 1 -> refresh drops it from both artifacts
    r = c.delete(SEMTBL + "/rows",
                 data=json.dumps({"where": "vec_id = 1"}),
                 content_type="application/json")
    assert r.status_code == 200
    r = _post(c, SEMTBL + "/indexes/sd/refresh")
    assert r.get_json() == {"added": 0, "processed": 0, "deleted": 1,
                            "table_rows": 3, "stale": False}
    assert c.get(SEMTBL + "/indexes/sd").get_json()["n_vectors"] == 1

    # rebuild retrains at the current corpus {2: 20deg, 3: 180deg,
    # 5: 181deg}: 5 drops vs 3 (cos 1deg), 2 survives
    r = _post(c, SEMTBL + "/indexes/sd/rebuild")
    assert r.status_code == 200, r.get_json()
    assert r.get_json()["rebuilt"] is True
    info = c.get(SEMTBL + "/indexes/sd").get_json()
    assert info["n_vectors"] == 2 and not info["stale"]

    # ADVICE r14 validation walls: bad build params are a 400, not an
    # IndexError-500 from inside kmeans_fit
    for bad in ({"n_clusters": 0}, {"rounds": 0}, {"threshold": 1.5}):
        body = {"name": "sd_bad", "kind": "semdedup",
                "id_column": "vec_id", "vector_column": "embedding"}
        body.update(bad)
        r = _post(c, SEMTBL + "/indexes", body)
        assert r.status_code == 400, (bad, r.get_json())
    # duplicate submitted ids and float-truncating ids are caller bugs
    assert _post(c, SEMTBL + "/indexes/sd/dedup",
                 {"documents": [{"id": -1, "vector": vec(5)},
                                {"id": -1, "vector": vec(50)}]}
                 ).status_code == 400
    assert _post(c, SEMTBL + "/indexes/sd/dedup",
                 {"documents": [{"id": -1.7, "vector": vec(5)}]}
                 ).status_code == 400


def test_bpe_index_over_rest(ctx, spark, tmp_path):
    """Tokenizer as a storage object over REST: create (train), info
    (vocab size + merge count + staleness), tokenize (frozen merges,
    OOV fallback), refresh (extends the vocab cache, merges frozen),
    rebuild (retrains), and the kind walls."""
    import json as _json

    c, eng, _ = ctx
    cols = [{"name": "doc_id", "type": "BIGINT", "nullable": False},
            {"name": "text", "type": "VARCHAR", "nullable": True}]
    r = _post(c, DOCS_BASE, {"name": "toktbl", "columns": cols})
    assert r.status_code == 201, r.get_json()
    src = str(tmp_path / "tok.parquet")
    spark.createDataFrame([(1, "abab abab cd")],
                          "doc_id long, text string") \
         .coalesce(1).write.parquet(src)
    T = DOCS_BASE + "/toktbl"
    assert _post(c, T + "/import/file",
                 {"path": src, "format": "parquet"}).status_code == 200

    r = _post(c, T + "/indexes",
              {"name": "tok", "kind": "bpe", "text_column": "text",
               "rounds": 2})
    assert r.status_code == 201, r.get_json()
    info = r.get_json()
    assert info["kind"] == "bpe" and info["n_merges"] == 2
    assert info["n_vectors"] == 2             # vocab: abab, cd
    # tokenize: in-vocab + OOV
    r = _post(c, T + "/indexes/tok/tokenize",
              {"documents": [{"id": 7, "text": "abab zq"}]})
    assert r.status_code == 200, r.get_json()
    doc = r.get_json()["documents"][0]
    assert doc["tokens"] == ["abab", "z", "q"] and doc["n_tokens"] == 3
    # walls: search/dedup/compact refuse; bad payloads 400
    assert _post(c, T + "/indexes/tok/search",
                 {"queries": [{"id": 1, "vector": [0.0]}]}
                 ).status_code == 400
    assert _post(c, T + "/indexes/tok/dedup",
                 {"documents": [{"id": 1, "text": "x"}]}
                 ).status_code == 400
    assert _post(c, T + "/indexes/tok/compact", {}).status_code == 400
    assert _post(c, T + "/indexes/tok/tokenize",
                 {"documents": []}).status_code == 400
    assert _post(c, T + "/indexes/tok/tokenize",
                 {"documents": [{"id": 1, "text": "x"},
                                {"id": 1, "text": "y"}]}
                 ).status_code == 400
    # refresh: new words enter the vocab cache, merges stay frozen
    src2 = str(tmp_path / "tok2.parquet")
    spark.createDataFrame([(2, "abq abq")], "doc_id long, text string") \
         .coalesce(1).write.parquet(src2)
    assert _post(c, T + "/import/file",
                 {"path": src2, "format": "parquet",
                  "import_options": {"incremental": True}}
                 ).status_code == 200
    assert c.get(T + "/indexes/tok").get_json()["stale"]
    r = _post(c, T + "/indexes/tok/refresh")
    assert r.status_code == 200, r.get_json()
    out = r.get_json()
    assert out["added"] == 1 and not out["stale"]     # 'abq' cached
    info = c.get(T + "/indexes/tok").get_json()
    assert info["n_vectors"] == 3 and not info["stale"]
    assert info["n_merges"] == 2                       # frozen
    r = _post(c, T + "/indexes/tok/tokenize",
              {"documents": [{"id": 8, "text": "abq"}]})
    assert r.get_json()["documents"][0]["tokens"] == ["ab", "q"]
    # rebuild retrains on the grown corpus
    r = _post(c, T + "/indexes/tok/rebuild")
    assert r.status_code == 200 and r.get_json()["rebuilt"] is True
    assert not c.get(T + "/indexes/tok").get_json()["stale"]
