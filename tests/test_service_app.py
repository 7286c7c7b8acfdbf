"""REST surface e2e (service/app.py) — drives the HTTP workflow the
reference exercises in tests/test_data_pipeline_e2e.py:186-442: create
project → bucket → table, stage a file through the files API, import it,
preview, export back into the files area, delete rows, snapshot
create/restore/delete, branches, workspaces, SQL query — plus the
middleware: X-Idempotency-Key replay and X-API-Key auth."""

import io
import json

import pytest

from keboola_storage_duckdb_spark.engine import StorageEngine
from keboola_storage_duckdb_spark.service.app import create_app

USERS_COLUMNS = [
    {"name": "id", "type": "INTEGER", "nullable": False},
    {"name": "name", "type": "VARCHAR", "nullable": True},
    {"name": "age", "type": "INTEGER", "nullable": True},
]

CSV = "id,name,age\n1,Alice,30\n2,Bob,25\n3,Carol,40\n"
CSV_V2 = "id,name,age\n2,Bobby,26\n4,Dave,50\n"

BASE = "/projects/p1/branches/default/buckets/in_c_data/tables"


@pytest.fixture(scope="module")
def client(spark, tmp_path_factory):
    eng = StorageEngine(spark, str(tmp_path_factory.mktemp("wh_http")))
    app = create_app(eng)
    app.config["TESTING"] = True
    with app.test_client() as c:
        yield c


def _post(client, url, body=None, **kw):
    return client.post(url, data=json.dumps(body or {}),
                       content_type="application/json", **kw)


def _stage_csv(client, data: bytes, filename="users.csv"):
    prep = _post(client, "/projects/p1/files/prepare",
                 {"filename": filename}).get_json()
    up = client.post(f"/projects/p1/files/upload/{prep['upload_key']}",
                     data=data)
    assert up.status_code == 200
    reg = _post(client, "/projects/p1/files", {"upload_key": prep["upload_key"]})
    assert reg.status_code == 201
    return reg.get_json()


def test_project_bucket_table_crud(client):
    assert _post(client, "/projects", {"id": "p1"}).status_code == 201
    assert _post(client, "/projects", {"id": "p1"}).status_code == 409
    assert client.get("/projects").get_json() == [{"id": "p1"}]
    r = _post(client, "/projects/p1/branches/default/buckets",
              {"name": "in_c_data"})
    assert r.status_code == 201
    r = _post(client, BASE, {"name": "users", "columns": USERS_COLUMNS,
                             "primary_key": ["id"]})
    assert r.status_code == 201
    assert client.get(BASE).get_json() == ["users"]
    info = client.get(BASE + "/users").get_json()
    assert info["primary_key"] == ["id"] and info["row_count"] == 0
    assert client.get(BASE + "/nope").status_code == 404


def test_staged_import_preview(client):
    rec = _stage_csv(client, CSV.encode())
    r = _post(client, BASE + "/users/import/file",
              {"file_id": rec["id"], "format": "csv"})
    assert r.status_code == 200 and r.get_json()["rows_after"] == 3
    prev = client.get(BASE + "/users/preview?order_by=id&limit=2").get_json()
    assert prev["row_count"] == 2
    assert prev["rows"][0]["name"] == "Alice"
    # incremental upsert via a second staged file
    rec2 = _stage_csv(client, CSV_V2.encode(), "users_v2.csv")
    r = _post(client, BASE + "/users/import/file",
              {"file_id": rec2["id"], "format": "csv",
               "import_options": {"incremental": True,
                                  "dedup_mode": "update_duplicates"}})
    assert r.get_json()["rows_after"] == 4
    rows = client.get(BASE + "/users/preview?order_by=id").get_json()["rows"]
    assert {r["id"]: r["name"] for r in rows}[2] == "Bobby"


def test_export_registers_file(client):
    r = _post(client, BASE + "/users/export",
              {"format": "csv", "columns": ["id", "name"],
               "where": "age > 26", "file_name": "grown_ups.csv"})
    body = r.get_json()
    assert r.status_code == 200 and body["rows_exported"] == 3
    fid = body["file"]["id"]
    dl = client.get(f"/projects/p1/files/{fid}/download")
    text = dl.data.decode()
    assert text.startswith("id,name") and "Alice" in text and "Bobby" not in text
    assert any(f["id"] == fid for f in
               client.get("/projects/p1/files").get_json())


def test_schema_ops_over_http(client):
    r = _post(client, BASE + "/users/columns",
              {"name": "email", "type": "VARCHAR", "default": "n/a"})
    assert r.status_code == 201
    cols = [c["name"] for c in client.get(BASE + "/users").get_json()["columns"]]
    assert "email" in cols
    r = client.put(BASE + "/users/columns/email",
                   data=json.dumps({"new_name": "mail"}),
                   content_type="application/json")
    assert r.status_code == 200
    r = client.delete(BASE + "/users/columns/mail")
    assert r.status_code == 200
    # PK drop + re-add
    assert client.delete(BASE + "/users/primary-key").status_code == 200
    assert _post(client, BASE + "/users/primary-key",
                 {"columns": ["id"]}).status_code == 201


def test_snapshot_restore_delete_and_row_delete(client):
    snap = _post(client, "/projects/p1/branches/default/snapshots",
                 {"bucket": "in_c_data", "table": "users"}).get_json()
    assert snap["row_count"] == 4
    r = client.delete(BASE + "/users/rows",
                      data=json.dumps({"where": "age > 26"}),
                      content_type="application/json")
    assert r.get_json()["rows_remaining"] == 1  # only Bobby (26) survives
    # the diff endpoint explains what the restore would bring back
    d = _post(client,
              f"/projects/p1/branches/default/snapshots"
              f"/{snap['snapshot_id']}/diff",
              {"bucket": "in_c_data", "table": "users"}).get_json()
    assert d["mode"] == "primary_key"
    assert d["removed"] == 3 and d["added"] == 0 and d["unchanged"] == 1
    rest = _post(client,
                 f"/projects/p1/branches/default/snapshots/{snap['snapshot_id']}/restore",
                 {"bucket": "in_c_data", "table": "users"})
    assert rest.get_json()["row_count"] == 4
    listed = client.get("/projects/p1/branches/default/snapshots"
                        "?bucket=in_c_data&table=users").get_json()
    assert len(listed) == 1
    assert client.delete(
        f"/projects/p1/branches/default/snapshots/{snap['snapshot_id']}"
        "?bucket=in_c_data&table=users").status_code == 200
    assert client.get("/projects/p1/branches/default/snapshots"
                      "?bucket=in_c_data&table=users").get_json() == []


def test_branch_workflow(client):
    assert _post(client, "/projects/p1/branches", {"id": "dev"}).status_code == 201
    # import into branch → CoW copy diverges from main
    rec = _stage_csv(client, CSV_V2.encode(), "branch.csv")
    r = _post(client, "/projects/p1/branches/dev/buckets/in_c_data"
                      "/tables/users/import/file",
              {"file_id": rec["id"], "format": "csv"})
    assert r.get_json()["rows_after"] == 2
    main_rows = client.get(BASE + "/users/preview").get_json()["row_count"]
    assert main_rows == 4  # main untouched
    dev = client.get("/projects/p1/branches/dev/buckets/in_c_data"
                     "/tables/users").get_json()
    assert dev["row_count"] == 2 and dev["source"] == "branch"
    _post(client, "/projects/p1/branches/dev/tables/in_c_data/users/pull")
    dev = client.get("/projects/p1/branches/dev/buckets/in_c_data"
                     "/tables/users").get_json()
    assert dev["row_count"] == 4
    assert client.delete("/projects/p1/branches/dev").status_code == 200


def test_workspace_and_query(client):
    assert _post(client, "/projects/p1/workspaces", {"id": "ws1"}).status_code == 201
    r = _post(client, "/projects/p1/workspaces/ws1/load",
              {"bucket": "in_c_data", "table": "users", "destination": "u",
               "columns": ["id", "name"]})
    assert r.get_json()["rows_loaded"] == 4
    pw = _post(client, "/projects/p1/workspaces/ws1/credentials/reset")
    assert len(pw.get_json()["password"]) == 32
    q = _post(client, "/projects/p1/query",
              {"sql": "SELECT COUNT(*) AS n FROM in_c_data_users"})
    assert q.get_json()["rows"][0]["n"] == "4"  # stringified by default
    q2 = _post(client, "/projects/p1/query",
               {"sql": "SELECT id FROM in_c_data_users ORDER BY id",
                "max_rows": 2, "stringify": False})
    assert q2.get_json()["row_count"] == 2
    assert _post(client, "/projects/p1/workspaces/ws1/clear").status_code == 200
    assert client.delete("/projects/p1/workspaces/ws1").status_code == 200


def test_idempotency_replay(client):
    hdr = {"X-Idempotency-Key": "create-bucket-once"}
    r1 = client.post("/projects/p1/branches/default/buckets",
                     data=json.dumps({"name": "in_c_idem"}),
                     content_type="application/json", headers=hdr)
    assert r1.status_code == 201
    # same key → replay of the 201, NOT a 409, and no re-execution
    r2 = client.post("/projects/p1/branches/default/buckets",
                     data=json.dumps({"name": "in_c_idem"}),
                     content_type="application/json", headers=hdr)
    assert r2.status_code == 201
    assert r2.headers.get("X-Idempotency-Replayed") == "true"
    # without the key the duplicate create is a real conflict
    r3 = _post(client, "/projects/p1/branches/default/buckets",
               {"name": "in_c_idem"})
    assert r3.status_code == 409


def test_error_shapes(client):
    r = client.get(BASE + "/users/preview?where=id%3B%20DROP%20TABLE")
    assert r.status_code == 400
    assert r.get_json()["error"] == "bad_request"
    r = _post(client, BASE + "/users/import/file", {"file_id": "nope"})
    assert r.status_code == 404
    r = _post(client, "/projects/p1/files/prepare", {"filename": "../evil"})
    assert r.status_code == 400


def test_optimize_route(client):
    r = _post(client, BASE + "/users/optimize", {"target_files": 2})
    assert r.status_code == 200
    assert r.get_json()["target_files"] == 2
    prev = client.get(BASE + "/users/preview?order_by=id&limit=1").get_json()
    assert prev["rows"][0]["id"] == 1
    # hash-bucketed layout through the API; __bucket stays internal
    r = _post(client, BASE + "/users/optimize",
              {"hash_bucket_by": ["id"], "n_hash_buckets": 4})
    assert r.status_code == 200
    assert r.get_json()["hash_bucket_by"] == ["id"]
    prev = client.get(BASE + "/users/preview?order_by=id&limit=1").get_json()
    assert prev["rows"][0]["id"] == 1
    assert "__bucket" not in prev["rows"][0]


def test_bucket_sharing_workflow(client):
    """Share → link → read-through → readonly grant → unlink → unshare,
    mirroring reference bucket_sharing.py:48-780 (share records intent,
    link creates the read-through on the target side)."""
    assert _post(client, "/projects", {"id": "p2"}).status_code == 201
    share = "/projects/p1/branches/default/buckets/in_c_data/share"
    link = "/projects/p2/branches/default/buckets/in_c_linked/link"
    # linking an unshared bucket is refused
    r = _post(client, link, {"source_project": "p1",
                             "source_bucket": "in_c_data"})
    assert r.status_code == 400
    assert _post(client, share).get_json() == {"shared": "in_c_data"}
    r = _post(client, link, {"source_project": "p1",
                             "source_bucket": "in_c_data"})
    assert r.status_code == 200
    # the linked bucket reads through to the source's tables
    linked = "/projects/p2/branches/default/buckets/in_c_linked/tables"
    assert client.get(linked).get_json() == ["users"]
    prev = client.get(linked + "/users/preview?order_by=id&limit=1").get_json()
    assert prev["rows"][0]["name"] == "Alice"
    # readonly grant/revoke are metadata-only API-compat ops
    ro = "/projects/p1/branches/default/buckets/in_c_data/grant-readonly"
    assert _post(client, ro).get_json()["status"] == "success"
    assert client.delete(ro).status_code == 204
    assert _post(client, "/projects/p1/branches/default/buckets/nope"
                 "/grant-readonly").status_code == 404
    # unlink removes the indirection; unshare drops the flag
    assert client.delete(link).status_code == 200
    assert client.get(linked).get_json() == []
    assert client.delete(share).status_code == 200
    assert client.delete(share).status_code == 404


def test_metrics_endpoint(client):
    client.get("/health")
    m = client.get("/metrics")
    assert m.status_code == 200
    text = m.data.decode()
    assert 'storage_http_requests_total{method="GET",route="/health"' in text
    assert "storage_http_request_seconds_sum" in text
    assert "storage_uptime_seconds" in text
    # histogram buckets (r7): cumulative le series ending at +Inf, with
    # the +Inf cell equal to the route's request count
    assert 'storage_http_request_seconds_hist_bucket{method="GET",' \
           'route="/health",le="0.005"}' in text
    import re as _re
    inf = _re.search(r'hist_bucket\{method="GET",route="/health",'
                     r'le="\+Inf"\} (\d+)', text)
    cnt = _re.search(r'seconds_count\{method="GET",route="/health"\} (\d+)',
                     text)
    assert inf and cnt and inf.group(1) == cnt.group(1), (inf, cnt)


def test_dashboard_page(client):
    """Ops dashboard (reference dashboard.html): self-contained HTML served
    at /dashboard — no external (CDN) assets, polls /metrics client-side."""
    r = client.get("/dashboard")
    assert r.status_code == 200
    assert r.mimetype == "text/html"
    html = r.data.decode()
    assert "fetch(\"metrics\")" in html
    assert "parseMetrics" in html
    # offline container: the page must not reference external assets
    assert "http://" not in html.replace("HTTP ", "")
    assert "https://" not in html
    assert "cdn" not in html.lower()


def test_auth_required_mode(spark, tmp_path_factory):
    eng = StorageEngine(spark, str(tmp_path_factory.mktemp("wh_auth")))
    key = eng.create_api_key("ci")
    app = create_app(eng, require_auth=True)
    with app.test_client() as c:
        assert c.get("/health").status_code == 200          # health is open
        assert c.get("/dashboard").status_code == 200       # monitoring page too
        assert c.get("/projects").status_code == 401        # no key
        assert c.get("/projects",
                     headers={"X-API-Key": "wrong"}).status_code == 401
        assert c.get("/projects",
                     headers={"X-API-Key": key}).status_code == 200


def test_arrow_ipc_edges(client):
    """ADR-011 parity: preview / query / export answer Arrow IPC under
    content negotiation (byte-valid stream, row-equal with the JSON
    path), and an Arrow IPC request body imports a table."""
    import pyarrow as pa

    from keboola_storage_duckdb_spark.engine import ARROW_MIME

    # preview via Accept header
    r = client.get(BASE + "/users/preview?order_by=id",
                   headers={"Accept": ARROW_MIME})
    assert r.status_code == 200 and r.content_type.startswith(ARROW_MIME)
    tbl = pa.ipc.open_stream(r.data).read_all()
    assert int(r.headers["X-Row-Count"]) == tbl.num_rows
    jrows = client.get(BASE + "/users/preview?order_by=id").get_json()["rows"]
    arows = tbl.to_pylist()
    assert [x["id"] for x in arows] == [x["id"] for x in jrows]
    assert [x["name"] for x in arows] == [x["name"] for x in jrows]

    # query via body format=arrow
    r = _post(client, "/projects/p1/query",
              {"sql": "SELECT count(*) AS n FROM in_c_data_users",
               "format": "arrow"})
    assert r.content_type.startswith(ARROW_MIME)
    qt = pa.ipc.open_stream(r.data).read_all()
    jn = _post(client, "/projects/p1/query",
               {"sql": "SELECT count(*) AS n FROM in_c_data_users"}
               ).get_json()["rows"][0]["n"]
    assert qt.to_pylist()[0]["n"] == int(jn)

    # export ?format=arrow streams directly with a filename
    r = _post(client, BASE + "/users/export", {"format": "arrow"})
    assert r.content_type.startswith(ARROW_MIME)
    assert "users.arrow" in r.headers["Content-Disposition"]
    et = pa.ipc.open_stream(r.data).read_all()
    assert et.num_rows == tbl.num_rows

    # Arrow import: round-trip the exported stream into a fresh table
    _post(client, BASE, {"name": "users_arrow", "columns": USERS_COLUMNS})
    imp = client.post(BASE + "/users_arrow/import/file",
                      data=r.data, content_type=ARROW_MIME)
    assert imp.status_code == 200
    assert imp.get_json()["rows_after"] == tbl.num_rows


def test_arrow_export_streams_full_table(client):
    """ADVICE r6: Arrow-format EXPORT must return the whole table, not
    preview_arrow's silent 10k clamp — 12k rows round-trip intact, and an
    explicit body limit is honored as a real bound."""
    import io

    import pyarrow as pa

    from keboola_storage_duckdb_spark.engine import ARROW_MIME

    _post(client, BASE, {"name": "big_arrow", "columns": [
        {"name": "id", "type": "INTEGER", "nullable": False},
        {"name": "v", "type": "DOUBLE"}]})
    buf = io.StringIO()
    buf.write("id,v\n")
    for i in range(12_000):
        buf.write(f"{i},{float(i)}\n")
    rec = _stage_csv(client, buf.getvalue().encode(), "big.csv")
    imp = _post(client, BASE + "/big_arrow/import/file",
                {"file_id": rec["id"]})
    assert imp.get_json()["rows_after"] == 12_000

    r = _post(client, BASE + "/big_arrow/export", {"format": "arrow"})
    assert r.status_code == 200 and r.content_type.startswith(ARROW_MIME)
    assert int(r.headers["X-Row-Count"]) == 12_000
    tbl = pa.ipc.open_stream(r.data).read_all()
    assert tbl.num_rows == 12_000
    assert sorted(x["id"] for x in tbl.to_pylist())[:3] == [0, 1, 2]

    # explicit limit stays a real bound
    r = _post(client, BASE + "/big_arrow/export",
              {"format": "arrow", "limit": 7})
    tbl = pa.ipc.open_stream(r.data).read_all()
    assert tbl.num_rows == 7


def test_export_parallel_path(client):
    """single_file=false keeps the write distributed and registers every
    part as a sliced file set."""
    r = _post(client, BASE + "/users/export",
              {"format": "csv", "single_file": False})
    body = r.get_json()
    assert r.status_code == 200 and body["rows_exported"] >= 1
    assert "file" in body    # first slice always present


def test_arrow_query_truncation(client):
    """execute_query_arrow honors max_rows with truncation detection."""
    import pyarrow as pa

    from keboola_storage_duckdb_spark.engine import ARROW_MIME

    r = _post(client, "/projects/p1/query",
              {"sql": "SELECT id FROM in_c_data_users ORDER BY id",
               "format": "arrow", "max_rows": 2})
    assert r.content_type.startswith(ARROW_MIME)
    tbl = pa.ipc.open_stream(r.data).read_all()
    assert tbl.num_rows == 2
    assert int(r.headers["X-Row-Count"]) == 2


def test_backend_init_and_remove(client):
    r = client.post("/backend/init")
    assert r.status_code == 200
    body = r.get_json()
    assert body["success"] and "warehouse" in body["storage_paths"]
    import os

    assert os.path.isdir(body["storage_paths"]["files"])
    # idempotent second call: nothing left to create
    r2 = client.post("/backend/init")
    assert r2.status_code == 200
    assert "created" not in r2.get_json()["message"]
    r3 = client.post("/backend/remove")
    assert r3.status_code == 200 and "no-op" in r3.get_json()["message"]


def test_project_scoped_api_keys_lifecycle(client):
    # scope/branch validation (reference api_keys.py:118-147)
    assert _post(client, "/projects/p1/api-keys",
                 {"scope": "branch_admin"}).status_code == 400
    assert _post(client, "/projects/p1/api-keys",
                 {"scope": "project_admin", "branch_id": "b9"}
                 ).status_code == 400
    assert _post(client, "/projects/p1/api-keys",
                 {"scope": "branch_read", "branch_id": "nope"}
                 ).status_code == 404
    assert _post(client, "/projects/ghost/api-keys", {}).status_code == 404

    k1 = _post(client, "/projects/p1/api-keys",
               {"description": "ci", "expires_in_days": 7}).get_json()
    assert k1["scope"] == "project_admin" and k1["api_key"].startswith("pk_")
    assert k1["key_prefix"] == k1["api_key"][:12]
    assert k1["expires_at"] > k1["created_at"]

    listed = client.get("/projects/p1/api-keys").get_json()
    assert [k["id"] for k in listed] == [k1["id"]]
    assert all("api_key" not in k and "sha256" not in k for k in listed)

    got = client.get(f"/projects/p1/api-keys/{k1['id']}").get_json()
    assert got["description"] == "ci" and "api_key" not in got

    # cannot revoke the LAST active project_admin key
    r = client.delete(f"/projects/p1/api-keys/{k1['id']}")
    assert r.status_code == 400

    # rotate: new id + secret, same scope, old key revoked
    k2 = _post(client, f"/projects/p1/api-keys/{k1['id']}/rotate").get_json()
    assert k2["id"] != k1["id"] and k2["api_key"] != k1["api_key"]
    assert k2["description"].endswith("(rotated)")
    old = client.get(f"/projects/p1/api-keys/{k1['id']}").get_json()
    assert old["revoked_at"] is not None
    # rotating a revoked key: 400
    assert _post(client,
                 f"/projects/p1/api-keys/{k1['id']}/rotate").status_code == 400
    # with a second admin key minted by the rotate, the revoke works
    k3 = _post(client, "/projects/p1/api-keys", {}).get_json()
    assert client.delete(
        f"/projects/p1/api-keys/{k3['id']}").status_code == 204


def test_project_scoped_key_authenticates(spark, tmp_path_factory):
    eng = StorageEngine(spark, str(tmp_path_factory.mktemp("wh_auth2")))
    eng.create_project("pa")
    app = create_app(eng, require_auth=True)
    app.config["TESTING"] = True
    with app.test_client() as c:
        assert c.get("/projects").status_code == 401
        secret = eng.create_project_api_key("pa")["api_key"]
        assert c.get("/projects",
                     headers={"X-API-Key": secret}).status_code == 200
        # expired keys are rejected
        assert eng.verify_project_api_key(secret) is not None
        expired = eng.create_project_api_key(
            "pa", expires_in_days=-1)["api_key"]
        assert eng.verify_project_api_key(expired) is None


def test_project_stats(client):
    r = client.get("/projects/p1/stats")
    assert r.status_code == 200
    body = r.get_json()
    assert body["id"] == "p1" and body["bucket_count"] >= 1
    assert body["table_count"] >= 1 and body["size_bytes"] > 0
    assert client.get("/projects/ghost/stats").status_code == 404


def test_pgwire_rest_backchannel(client):
    # workspace + credential
    _post(client, "/projects/p1/workspaces", {"id": "wpg"})
    pw = _post(client,
               "/projects/p1/workspaces/wpg/credentials/reset"
               ).get_json()["password"]
    # auth: wrong password 401, right one returns session init info
    assert _post(client, "/internal/pgwire/auth",
                 {"username": "wpg", "password": "nope"}).status_code == 401
    auth = _post(client, "/internal/pgwire/auth",
                 {"username": "wpg", "password": pw})
    assert auth.status_code == 200
    info = auth.get_json()
    assert info["workspace_id"] == "wpg" and "db_path" in info

    # session lifecycle: register -> activity -> close
    r = _post(client, "/internal/pgwire/sessions",
              {"session_id": "s1", "workspace_id": "wpg",
               "client_ip": "10.0.0.9"})
    assert r.status_code == 201 and r.get_json()["status"] == "active"
    assert _post(client, "/internal/pgwire/sessions",
                 {"session_id": "sx", "workspace_id": "ghost"}
                 ).status_code == 404
    act = client.patch("/internal/pgwire/sessions/s1/activity",
                       data=json.dumps({"increment_queries": 3}),
                       content_type="application/json")
    assert act.get_json()["query_count"] == 3
    listed = client.get(
        "/internal/pgwire/sessions?workspace_id=wpg&status=active"
        ).get_json()
    assert [s["session_id"] for s in listed] == ["s1"]
    assert client.delete(
        "/internal/pgwire/sessions/s1?reason=test_done").status_code == 204
    closed = client.get("/internal/pgwire/sessions/s1").get_json()
    assert closed["status"] == "closed"
    assert closed["closed_reason"] == "test_done"
    assert client.get(
        "/internal/pgwire/sessions/nope").status_code == 404

    # stale cleanup: an active session with old activity flips to timeout
    _post(client, "/internal/pgwire/sessions",
          {"session_id": "s2", "workspace_id": "wpg"})
    res = _post(client,
                "/internal/pgwire/sessions/cleanup?idle_timeout_seconds=0")
    assert res.get_json()["cleaned_up"] == 1
    assert client.get("/internal/pgwire/sessions/s2"
                      ).get_json()["status"] == "timeout"


def test_pgwire_auth_connection_limit(spark, tmp_path_factory):
    eng = StorageEngine(spark, str(tmp_path_factory.mktemp("wh_pgl")))
    eng.create_project("pl")
    eng.create_workspace("wl")
    pw = eng.reset_workspace_password("wl")
    app = create_app(eng, pgwire_max_connections=1)
    app.config["TESTING"] = True
    with app.test_client() as c:
        assert _post(c, "/internal/pgwire/auth",
                     {"username": "wl", "password": pw}).status_code == 200
        _post(c, "/internal/pgwire/sessions",
              {"session_id": "a", "workspace_id": "wl"})
        r = _post(c, "/internal/pgwire/auth",
                  {"username": "wl", "password": pw})
        assert r.status_code == 429
        assert r.get_json()["error"] == "connection_limit_reached"


def test_snapshot_settings_resource_paths(client):
    # defaults + inheritance provenance at the table level
    url_t = ("/projects/p1/branches/default/buckets/in_c_main/tables/"
             "users/settings/snapshots")
    got = client.get(url_t).get_json()
    assert got["effective_config"]["enabled"] is True
    assert got["inheritance"]["enabled"] == "default"
    assert got["local_config"] is None

    # project-level override inherits downward
    r = client.put("/projects/p1/settings/snapshots",
                   data=json.dumps({"retention_days": 30}),
                   content_type="application/json")
    assert r.get_json()["local_config"] == {"retention_days": 30}
    got = client.get(url_t).get_json()
    assert got["effective_config"]["retention_days"] == 30
    assert got["inheritance"]["retention_days"] == "project"

    # table-level override wins over project
    client.put(url_t, data=json.dumps({"retention_days": 5}),
               content_type="application/json")
    got = client.get(url_t).get_json()
    assert got["effective_config"]["retention_days"] == 5
    assert got["inheritance"]["retention_days"] == "table"
    assert got["local_config"] == {"retention_days": 5}

    # DELETE clears the local override -> re-inherits from project
    assert client.delete(url_t).status_code == 204
    got = client.get(url_t).get_json()
    assert got["effective_config"]["retention_days"] == 30
    assert got["inheritance"]["retention_days"] == "project"
    # idempotent delete + cleanup of the project override
    assert client.delete(url_t).status_code == 204
    assert client.delete(
        "/projects/p1/settings/snapshots").status_code == 204
    got = client.get(url_t).get_json()
    assert got["effective_config"]["retention_days"] == 90


def test_update_project_metadata(client):
    got = client.get("/projects/p1").get_json()
    assert got["name"] == "p1" and got["settings"] == {}
    r = client.put("/projects/p1",
                   data=json.dumps({"name": "Prod Warehouse",
                                    "settings": {"tier": "gold"}}),
                   content_type="application/json")
    assert r.get_json()["name"] == "Prod Warehouse"
    got = client.get("/projects/p1").get_json()
    assert got["name"] == "Prod Warehouse"
    assert got["settings"] == {"tier": "gold"}
    # settings merge, name untouched
    client.put("/projects/p1", data=json.dumps({"settings": {"x": 1}}),
               content_type="application/json")
    got = client.get("/projects/p1").get_json()
    assert got["settings"] == {"tier": "gold", "x": 1}
    assert got["name"] == "Prod Warehouse"
    assert client.put("/projects/ghost", data=json.dumps({"name": "n"}),
                      content_type="application/json").status_code == 404
