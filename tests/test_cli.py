"""CLI parity layer e2e (cli.py) — mirrors the reference CLI's workflow
tests (cli/tests: create-from-csv → import → preview → export → profile →
files) over a REAL http server (werkzeug in a thread), exercising the
stdlib urllib client end-to-end."""

import json

import pytest

from keboola_storage_duckdb_spark.cli import (
    infer_column_type,
    infer_schema_from_csv,
    main,
)

CSV = "id,name,age,joined\n1,Alice,30,2024-01-02\n2,Bob,25,2024-02-03\n3,,40,2024-03-04\n"


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    from threading import Thread

    from werkzeug.serving import make_server

    from keboola_storage_duckdb_spark.engine import StorageEngine
    from keboola_storage_duckdb_spark.service.app import create_app

    eng = StorageEngine(spark, str(tmp_path_factory.mktemp("wh_cli")))
    srv = make_server("127.0.0.1", 0, create_app(eng))
    t = Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def run(server, *argv, json_out=True, capsys=None):
    args = ["--url", server] + (["--json"] if json_out else []) + list(argv)
    rc = main(args)
    out = capsys.readouterr().out if capsys else ""
    return rc, out


def test_infer_column_type():
    assert infer_column_type(["1", "2", "-3"]) == "INTEGER"
    assert infer_column_type(["1", "99999999999"]) == "BIGINT"
    assert infer_column_type(["1.5", "2"]) == "DOUBLE"
    assert infer_column_type(["true", "false"]) == "BOOLEAN"
    assert infer_column_type(["2024-01-02"]) == "DATE"
    assert infer_column_type(["2024-01-02", "2024-01-02 10:00:00"]) == "TIMESTAMP"
    assert infer_column_type(["abc", "1"]) == "VARCHAR"
    assert infer_column_type(["", "  "]) == "VARCHAR"


def test_infer_schema_from_csv(tmp_path):
    p = tmp_path / "s.csv"
    p.write_text(CSV)
    cols = infer_schema_from_csv(p)
    assert [c["name"] for c in cols] == ["id", "name", "age", "joined"]
    types = {c["name"]: c["type"] for c in cols}
    assert types == {"id": "INTEGER", "name": "VARCHAR",
                     "age": "INTEGER", "joined": "DATE"}
    assert {c["name"]: c["nullable"] for c in cols}["name"] is True


def test_cli_end_to_end(server, tmp_path, capsys):
    csv_file = tmp_path / "users.csv"
    csv_file.write_text(CSV)

    rc, out = run(server, "projects", "create", "pc", capsys=capsys)
    assert rc == 0 and json.loads(out)["id"] == "pc"
    rc, out = run(server, "buckets", "create", "pc", "in_c_cli", capsys=capsys)
    assert rc == 0

    # create with client-side schema inference
    rc, out = run(server, "tables", "create", "pc", "in_c_cli", "users",
                  "--from-csv", str(csv_file), "--pk", "id", capsys=capsys)
    assert rc == 0 and json.loads(out)["table"] == "users"

    # import through the 3-stage files flow
    rc, out = run(server, "tables", "import", "pc", "in_c_cli", "users",
                  str(csv_file), capsys=capsys)
    assert rc == 0 and json.loads(out)["rows_after"] == 3

    # preview (table-rendered output path)
    rc, out = run(server, "tables", "preview", "pc", "in_c_cli", "users",
                  "--limit", "5", "--order-by", "id",
                  json_out=False, capsys=capsys)
    assert rc == 0 and "Alice" in out and "Showing 3 row(s)" in out

    # export back out through files download
    out_csv = tmp_path / "out.csv"
    rc, out = run(server, "tables", "export", "pc", "in_c_cli", "users",
                  str(out_csv), capsys=capsys)
    assert rc == 0 and json.loads(out)["rows_exported"] == 3
    text = out_csv.read_text()
    assert "Alice" in text and text.splitlines()[0].startswith("id")

    # profile
    rc, out = run(server, "tables", "profile", "pc", "in_c_cli", "users",
                  capsys=capsys)
    prof = json.loads(out)
    assert rc == 0 and prof["row_count"] == 3
    assert any(c["name"] == "age" for c in prof["columns"])

    # profile --approx: sketch-backed distinct mode flagged in the result
    rc, out = run(server, "tables", "profile", "pc", "in_c_cli", "users",
                  "--approx", capsys=capsys)
    prof = json.loads(out)
    assert rc == 0 and prof.get("distinct_estimated") is True
    assert prof["row_count"] == 3

    # query passthrough
    rc, out = run(server, "query", "pc",
                  "SELECT COUNT(*) AS n FROM in_c_cli_users", capsys=capsys)
    assert rc == 0 and json.loads(out)["rows"][0]["n"] == "3"

    # files list / delete
    rc, out = run(server, "files", "list", "pc", capsys=capsys)
    files = json.loads(out)
    assert rc == 0 and len(files) >= 2  # staged import + export artifact
    fid = files[0]["id"]
    rc, out = run(server, "files", "delete", "pc", fid, capsys=capsys)
    assert rc == 0

    # optimize: sort-clustering + bloom filters over the REST route
    rc, out = run(server, "tables", "optimize", "pc", "in_c_cli", "users",
                  "--cluster-by", "id", "--bloom-filter", "name",
                  "--target-files", "1", capsys=capsys)
    opt = json.loads(out)
    assert rc == 0 and opt["cluster_by"] == ["id"]
    assert opt["bloom_filter_columns"] == ["name"]

    # tables list + delete
    rc, out = run(server, "tables", "list", "pc", "in_c_cli",
                  json_out=False, capsys=capsys)
    assert rc == 0 and "users" in out
    rc, out = run(server, "tables", "delete", "pc", "in_c_cli", "users",
                  capsys=capsys)
    assert rc == 0


def test_cli_versioned_history_and_time_travel(server, tmp_path, capsys):
    """tables history / vacuum / preview --version against a versioned
    table through the CLI."""
    rc, _ = run(server, "projects", "create", "pv_cli", capsys=capsys)
    assert rc == 0
    rc, _ = run(server, "buckets", "create", "pv_cli", "in_c_v", capsys=capsys)
    assert rc == 0
    cols = '[{"name":"id","type":"INTEGER"},{"name":"v","type":"VARCHAR"}]'
    # versioned storage needs the REST body flag; create via query of the
    # CLI's raw --columns path won't set it, so POST directly through the
    # client helper used by the CLI
    from keboola_storage_duckdb_spark.cli import Client
    c = Client(server)
    c.post("/projects/pv_cli/branches/default/buckets/in_c_v/tables",
           {"name": "t", "columns": json.loads(cols),
            "storage_format": "versioned"})

    v1 = tmp_path / "v1.csv"
    v1.write_text("id,v\n1,a\n2,b\n")
    v2 = tmp_path / "v2.csv"
    v2.write_text("id,v\n3,c\n")
    rc, _ = run(server, "tables", "import", "pv_cli", "in_c_v", "t",
                str(v1), capsys=capsys)
    assert rc == 0
    rc, _ = run(server, "tables", "import", "pv_cli", "in_c_v", "t",
                str(v2), "--incremental", capsys=capsys)
    assert rc == 0

    rc, out = run(server, "tables", "history", "pv_cli", "in_c_v", "t",
                  capsys=capsys)
    hist = json.loads(out)
    assert rc == 0 and [h["version"] for h in hist] == [1, 2]

    rc, out = run(server, "tables", "preview", "pv_cli", "in_c_v", "t",
                  "--version", "1", capsys=capsys)
    assert rc == 0 and json.loads(out)["row_count"] == 2
    rc, out = run(server, "tables", "preview", "pv_cli", "in_c_v", "t",
                  capsys=capsys)
    assert rc == 0 and json.loads(out)["row_count"] == 3

    rc, out = run(server, "tables", "vacuum", "pv_cli", "in_c_v", "t",
                  capsys=capsys)
    assert rc == 0 and json.loads(out)["removed_versions"] == [1]
    rc, _ = run(server, "tables", "preview", "pv_cli", "in_c_v", "t",
                "--version", "1", capsys=capsys)
    assert rc == 1  # vacuumed version is a clean error, not a crash


def test_cli_error_paths(server, capsys):
    rc, _ = run(server, "projects", "create", "pc2", capsys=capsys)
    assert rc == 0
    rc, _ = run(server, "projects", "create", "pc2", capsys=capsys)
    assert rc == 1  # 409 already exists surfaces as exit 1
    err = capsys.readouterr()
    rc, _ = run(server, "tables", "preview", "pc2", "nope", "t", capsys=capsys)
    assert rc == 1


def test_cli_config_roundtrip(tmp_path, monkeypatch, capsys):
    import importlib

    import keboola_storage_duckdb_spark.cli as cli

    monkeypatch.setenv("KEBOOLA_SPARK_CONFIG_DIR", str(tmp_path / "cfg"))
    importlib.reload(cli)
    try:
        assert cli.main(["config", "set", "url", "http://x:1"]) == 0
        assert cli.main(["config", "set", "api-key", "secret-key-123"]) == 0
        capsys.readouterr()
        assert cli.main(["--json", "config", "show"]) == 0
        got = json.loads(capsys.readouterr().out)
        assert got["url"] == "http://x:1"
        assert "secret-key-123" != got["api_key"]  # masked
        assert got["api_key"].startswith("secr")
    finally:
        monkeypatch.undo()
        importlib.reload(cli)


def test_cli_index_lifecycle(server, spark, sf_dir, tmp_path, capsys):
    """indexes create/list/info/search/refresh/compact/drop over the
    real HTTP server, on a table holding the embeddings fixture."""
    from pyspark.sql import functions as F

    from keboola_storage_duckdb_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rc, _ = run(server, "projects", "create", "pidx", capsys=capsys)
    assert rc == 0
    rc, _ = run(server, "buckets", "create", "pidx", "in_c_v",
                capsys=capsys)
    assert rc == 0
    cols = json.dumps([
        {"name": "vec_id", "type": "BIGINT", "nullable": False},
        {"name": "label", "type": "INTEGER", "nullable": True},
        {"name": "embedding", "type": "FLOAT[]", "nullable": True}])
    rc, _ = run(server, "tables", "create", "pidx", "in_c_v", "emb",
                "--columns", cols, capsys=capsys)
    assert rc == 0
    src = str(tmp_path / "emb.parquet")
    emb.select("vec_id", "label", "embedding").coalesce(1) \
       .write.parquet(src)
    import glob
    part = glob.glob(src + "/part-*.parquet")[0]
    rc, _ = run(server, "tables", "import", "pidx", "in_c_v", "emb",
                part, "--format", "parquet", capsys=capsys)
    assert rc == 0

    rc, out = run(server, "indexes", "create", "pidx", "in_c_v", "emb",
                  "main", "--id-column", "vec_id",
                  "--vector-column", "embedding",
                  "--label-column", "label", capsys=capsys)
    assert rc == 0, out
    info = json.loads(out)
    assert info["kind"] == "pq" and not info["stale"]

    rc, out = run(server, "indexes", "list", "pidx", "in_c_v", "emb",
                  capsys=capsys)
    assert rc == 0 and [i["name"] for i in
                        json.loads(out)["indexes"]] == ["main"]

    q = emb.filter(F.col("vec_id") == 1).select("embedding").collect()[0]
    queries = json.dumps(
        [{"id": 1, "vector": [float(x) for x in q.embedding]}])
    rc, out = run(server, "indexes", "search", "pidx", "in_c_v", "emb",
                  "main", "--queries", queries, "--k", "3",
                  "--nprobe", "2", capsys=capsys)
    assert rc == 0, out
    res = json.loads(out)["results"]
    assert len(res) == 3 and all(r["neighbor_id"] != 1 for r in res)

    rc, out = run(server, "indexes", "refresh", "pidx", "in_c_v", "emb",
                  "main", capsys=capsys)
    assert rc == 0 and json.loads(out)["added"] == 0

    # --recommend includes the composed re-train verdict (r13)
    rc, out = run(server, "indexes", "info", "pidx", "in_c_v", "emb",
                  "main", "--recommend", capsys=capsys)
    assert rc == 0, out
    rec = json.loads(out)["recommendation"]
    assert rec["recommend_rebuild"] is False and "signals" in rec
    rc, out = run(server, "indexes", "info", "pidx", "in_c_v", "emb",
                  "main", capsys=capsys)
    assert rc == 0 and "recommendation" not in json.loads(out)

    rc, out = run(server, "indexes", "compact", "pidx", "in_c_v", "emb",
                  "main", "--max-files", "0", capsys=capsys)
    assert rc == 0 and json.loads(out)["compacted"]

    # rebuild: gated form no-ops on a sound index (r14, VERDICT r13 #5),
    # unconditional form re-trains and clears staleness
    rc, out = run(server, "indexes", "rebuild", "pidx", "in_c_v", "emb",
                  "main", "--if-recommended", capsys=capsys)
    assert rc == 0, out
    assert json.loads(out)["rebuilt"] is False
    rc, out = run(server, "indexes", "rebuild", "pidx", "in_c_v", "emb",
                  "main", capsys=capsys)
    assert rc == 0, out
    assert json.loads(out)["rebuilt"] is True
    rc, out = run(server, "indexes", "info", "pidx", "in_c_v", "emb",
                  "main", capsys=capsys)
    assert rc == 0 and json.loads(out)["stale"] is False

    rc, out = run(server, "indexes", "drop", "pidx", "in_c_v", "emb",
                  "main", capsys=capsys)
    assert rc == 0 and json.loads(out)["dropped"] == "main"
    rc, out = run(server, "indexes", "list", "pidx", "in_c_v", "emb",
                  capsys=capsys)
    assert json.loads(out)["indexes"] == []


def test_cli_dedup_index(server, spark, tmp_path, capsys):
    run(server, "projects", "create", "pdd", capsys=capsys)
    run(server, "buckets", "create", "pdd", "in_c_d", capsys=capsys)
    cols = json.dumps([
        {"name": "doc_id", "type": "BIGINT", "nullable": False},
        {"name": "text", "type": "VARCHAR", "nullable": True}])
    run(server, "tables", "create", "pdd", "in_c_d", "docs",
        "--columns", cols, capsys=capsys)
    src = str(tmp_path / "d.parquet")
    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "totally different words describing another topic here")],
        "doc_id bigint, text string").coalesce(1).write.parquet(src)
    import glob
    part = glob.glob(src + "/part-*.parquet")[0]
    rc, _ = run(server, "tables", "import", "pdd", "in_c_d", "docs",
                part, "--format", "parquet", capsys=capsys)
    assert rc == 0
    rc, out = run(server, "indexes", "create", "pdd", "in_c_d", "docs",
                  "dd", "--kind", "minhash", "--id-column", "doc_id",
                  "--text-column", "text", capsys=capsys)
    assert rc == 0, out and json.loads(out)["kind"] == "minhash"
    docs = json.dumps([{"id": -1, "text":
                        "alpha beta gamma delta epsilon zeta eta theta"}])
    rc, out = run(server, "indexes", "dedup", "pdd", "in_c_d", "docs",
                  "dd", "--documents", docs, capsys=capsys)
    assert rc == 0
    hits = json.loads(out)["hits"]
    assert hits and hits[0]["duplicate_of"] == 1
