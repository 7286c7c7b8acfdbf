"""Driver command bridge (service/driver.py) — the reference's HTTP driver
protocol: JSON commands dispatched to the engine handler surface
(reference src/routers/driver.py:338-452, grpc/servicer.py:95-241).
Drives a full lifecycle through /driver/execute only, plus admin-key
authorization and the sharing/settings/api-key REST routes."""

import json

import pytest

from keboola_storage_duckdb_spark.engine import StorageEngine
from keboola_storage_duckdb_spark.service.app import create_app

USERS_COLUMNS = [
    {"name": "id", "type": "INTEGER", "nullable": False},
    {"name": "name", "type": "VARCHAR", "nullable": True},
]


@pytest.fixture(scope="module")
def rig(spark, tmp_path_factory):
    eng = StorageEngine(spark, str(tmp_path_factory.mktemp("wh_drv")))
    app = create_app(eng)
    app.config["TESTING"] = True
    with app.test_client() as c:
        yield eng, c


def _exec(c, command, **kw):
    return c.post("/driver/execute", data=json.dumps({"command": command}),
                  content_type="application/json", **kw)


def test_command_catalog(rig):
    _eng, c = rig
    cmds = c.get("/driver/commands").get_json()
    assert "TableImportFromFileCommand" in cmds
    assert "TableImportFromTableCommand" in cmds
    assert "ExecuteQueryCommand" in cmds
    assert len(cmds) == 36  # the reference's full command set


def test_lifecycle_via_commands(rig, tmp_path):
    _eng, c = rig
    for cmd in (
        {"type": "InitBackendCommand"},
        {"type": "CreateProjectCommand", "projectId": "pd"},
        {"type": "CreateBucketCommand", "projectId": "pd",
         "bucketName": "in_c_b"},
        {"type": "CreateTableCommand", "projectId": "pd",
         "bucketName": "in_c_b", "tableName": "users",
         "columns": USERS_COLUMNS, "primaryKey": ["id"]},
    ):
        r = _exec(c, cmd)
        assert r.status_code == 200, r.get_json()
    csv = tmp_path / "u.csv"
    csv.write_text("id,name\n1,Ann\n2,Ben\n")
    r = _exec(c, {"type": "TableImportFromFileCommand", "projectId": "pd",
                  "bucketName": "in_c_b", "tableName": "users",
                  "path": str(csv), "format": "csv"})
    assert r.get_json()["result"]["rows_after"] == 2
    r = _exec(c, {"type": "PreviewTableCommand", "projectId": "pd",
                  "bucketName": "in_c_b", "tableName": "users"})
    assert len(r.get_json()["result"]["rows"]) == 2
    r = _exec(c, {"type": "ExecuteQueryCommand", "projectId": "pd",
                  "sql": "SELECT COUNT(*) AS n FROM in_c_b_users"})
    assert r.get_json()["result"]["rows"][0]["n"] == "2"
    r = _exec(c, {"type": "AddColumnCommand", "projectId": "pd",
                  "bucketName": "in_c_b", "tableName": "users",
                  "column": {"name": "age", "type": "INTEGER"}})
    assert r.status_code == 200
    r = _exec(c, {"type": "DeleteTableRowsCommand", "projectId": "pd",
                  "bucketName": "in_c_b", "tableName": "users",
                  "where": "id = 1"})
    assert r.get_json()["result"]["rows_remaining"] == 1
    r = _exec(c, {"type": "ObjectInfoCommand", "path": ["pd", "in_c_b", "users"]})
    assert r.get_json()["result"]["row_count"] == 1
    assert _exec(c, {"type": "NopeCommand"}).status_code == 400

    # importStrategy over the wire: enum number 0 = STRING_TABLE loads
    # every column as STRING (proto/table.proto ImportOptions)
    r = _exec(c, {"type": "CreateTableCommand", "projectId": "pd",
                  "bucketName": "in_c_b", "tableName": "users_s",
                  "columns": USERS_COLUMNS, "primaryKey": ["id"]})
    assert r.status_code == 200
    r = _exec(c, {"type": "TableImportFromFileCommand", "projectId": "pd",
                  "bucketName": "in_c_b", "tableName": "users_s",
                  "path": str(csv), "format": "csv", "importStrategy": 0})
    assert r.get_json()["result"]["rows_after"] == 2
    r = _exec(c, {"type": "ObjectInfoCommand",
                  "path": ["pd", "in_c_b", "users_s"]})
    cols = {col["name"]: col["type"]
            for col in r.get_json()["result"]["columns"]}
    assert cols["id"] == "VARCHAR" and cols["name"] == "VARCHAR"


def test_share_link_and_settings_routes(rig):
    _eng, c = rig
    base = "/projects/pd/branches/default/buckets/in_c_b"
    assert c.post(base + "/share").status_code == 200
    r = c.post("/projects/pd/branches/default/buckets/linked_b/link",
               data=json.dumps({"source_project": "pd",
                                "source_bucket": "in_c_b"}),
               content_type="application/json")
    assert r.status_code == 200
    tables = c.get("/projects/pd/branches/default/buckets/linked_b/tables")
    assert tables.get_json() == ["users", "users_s"]  # read-through
    assert c.delete(
        "/projects/pd/branches/default/buckets/linked_b/link").status_code == 200
    assert c.delete(base + "/share").status_code == 200
    assert c.delete(base + "/share").status_code == 404  # already unshared
    r = c.put("/snapshot-settings/table",
              data=json.dumps({"path": ["pd", "in_c_b", "users"],
                               "enabled": False}),
              content_type="application/json")
    assert r.status_code == 200
    r = c.post("/api-keys", data=json.dumps({"name": "ci2"}),
               content_type="application/json")
    assert r.status_code == 201 and len(r.get_json()["key"]) == 64


def test_admin_only_commands_require_admin_key(spark, tmp_path_factory):
    eng = StorageEngine(spark, str(tmp_path_factory.mktemp("wh_drv_auth")))
    admin = eng.create_api_key("admin")
    member = eng.create_api_key("member")
    app = create_app(eng, require_auth=True)
    app.config["TESTING"] = True
    with app.test_client() as c:
        cmd = {"type": "CreateProjectCommand", "projectId": "px"}
        assert _exec(c, cmd).status_code == 401
        assert _exec(c, cmd,
                     headers={"X-API-Key": member}).status_code == 403
        assert _exec(c, cmd,
                     headers={"X-API-Key": admin}).status_code == 200
        # project-scope command works with the member key
        r = _exec(c, {"type": "CreateBucketCommand", "projectId": "px",
                      "bucketName": "in_c_m"},
                  headers={"X-API-Key": member})
        assert r.status_code == 200


def test_import_from_table_command(rig, tmp_path):
    """proto/table.proto TableImportFromTableCommand over the bridge
    (SURVEY §2.5 W8): nested source mapping with whereFilters (enum
    numbers), columnMappings, limit; importOptions importType
    INCREMENTAL vs FULL."""
    _eng, c = rig
    for cmd in (
        {"type": "CreateBucketCommand", "projectId": "pd",
         "bucketName": "in_c_ift"},
        {"type": "CreateTableCommand", "projectId": "pd",
         "bucketName": "in_c_ift", "tableName": "src",
         "columns": USERS_COLUMNS, "primaryKey": ["id"]},
        {"type": "CreateTableCommand", "projectId": "pd",
         "bucketName": "in_c_ift", "tableName": "dst",
         "columns": [{"name": "id", "type": "INTEGER", "nullable": False},
                     {"name": "label", "type": "VARCHAR", "nullable": True}],
         "primaryKey": ["id"]},
    ):
        assert _exec(c, cmd).status_code == 200
    csv = tmp_path / "s.csv"
    csv.write_text("id,name\n1,Ann\n2,Ben\n3,Cyd\n")
    r = _exec(c, {"type": "TableImportFromFileCommand", "projectId": "pd",
                  "bucketName": "in_c_ift", "tableName": "src",
                  "path": str(csv), "format": "csv"})
    assert r.get_json()["result"]["rows_after"] == 3
    # incremental import with a gt-filter (proto enum numbers) and a
    # src→dst column rename
    r = _exec(c, {
        "type": "TableImportFromTableCommand",
        "source": {"path": ["pd", "in_c_ift"], "tableName": "src",
                   "whereFilters": [{"columnsName": "id", "operator": 2,
                                     "values": ["1"], "dataType": 1}],
                   "columnMappings": [
                       {"sourceColumnName": "id",
                        "destinationColumnName": "id"},
                       {"sourceColumnName": "name",
                        "destinationColumnName": "label"}]},
        "destination": {"path": ["pd", "in_c_ift"], "tableName": "dst"},
        "importOptions": {"importType": 1, "dedupType": 0}})
    assert r.status_code == 200, r.get_json()
    assert r.get_json()["result"]["rows_after"] == 2  # ids 2, 3
    # FULL (importType 0, the proto default) replaces; limit caps rows
    r = _exec(c, {
        "type": "TableImportFromTableCommand",
        "source": {"path": ["pd", "in_c_ift"], "tableName": "src",
                   "limit": 1,
                   "columnMappings": [
                       {"sourceColumnName": "id",
                        "destinationColumnName": "id"},
                       {"sourceColumnName": "name",
                        "destinationColumnName": "label"}]},
        "destination": {"path": ["pd", "in_c_ift"], "tableName": "dst"},
        "importOptions": {"importType": 0}})
    assert r.status_code == 200, r.get_json()
    assert r.get_json()["result"]["rows_after"] == 1
    # VIEW(2)/CLONE(3) are NOT implemented — they must be rejected, not
    # silently mapped to a destructive FULL replace (ADVICE r9)
    for bad in (2, 3, "VIEW", "CLONE", 99):
        r = _exec(c, {
            "type": "TableImportFromTableCommand",
            "source": {"path": ["pd", "in_c_ift"], "tableName": "src"},
            "destination": {"path": ["pd", "in_c_ift"],
                            "tableName": "dst"},
            "importOptions": {"importType": bad}})
        assert r.status_code == 400, (bad, r.get_json())
        assert "importType" in r.get_json()["message"]
    # the rejection left the destination untouched (still 1 row from the
    # FULL import above)
    r = _exec(c, {"type": "PreviewTableCommand", "projectId": "pd",
                  "bucketName": "in_c_ift", "tableName": "dst"})
    assert len(r.get_json()["result"]["rows"]) == 1


def test_workspace_commands(rig):
    _eng, c = rig
    for cmd in (
        {"type": "CreateWorkspaceCommand", "workspaceId": "wsd"},
        {"type": "LoadTableToWorkspaceCommand", "workspaceId": "wsd",
         "projectId": "pd", "bucketName": "in_c_b", "tableName": "users",
         "destinationName": "u"},
        {"type": "DropWorkspaceObjectCommand", "workspaceId": "wsd",
         "objectName": "u"},
        {"type": "GrantWorkspaceAccessToProjectCommand",
         "workspaceId": "wsd", "projectId": "pd"},
        {"type": "DropWorkspaceCommand", "workspaceId": "wsd"},
    ):
        r = _exec(c, cmd)
        assert r.status_code == 200, (cmd, r.get_json())
