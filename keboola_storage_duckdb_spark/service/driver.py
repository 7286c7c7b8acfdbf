"""Driver command bridge (SURVEY Q3, REST half) — the reference's HTTP
driver protocol (src/routers/driver.py:338-452): POST /driver/execute takes
``{"command": {"type": "<Name>Command", ...}, "credentials": {...}}`` and
dispatches to the same handler surface the 26 gRPC handlers expose
(src/grpc/servicer.py:95-241); GET /driver/commands lists the catalog.

Authorization mirrors the reference: admin-only lifecycle commands
(Init/RemoveBackend, Create/DropProject) versus project commands. Here the
admin key is any engine API key named 'admin'; project commands accept any
valid API key (per-project keys are a reference-metadata-DB concept; the
engine stores flat keys).

The gRPC transport itself is container-blocked (grpcio not installed); the
command catalog, payload shapes and dispatch are transport-independent so
a gRPC servicer would be a thin wrapper over ``dispatch``.
"""

from __future__ import annotations

from flask import Blueprint, jsonify, request

ADMIN_ONLY = {"InitBackendCommand", "RemoveBackendCommand",
              "CreateProjectCommand", "DropProjectCommand"}


def _strategy(v) -> str:
    """proto/table.proto ImportOptions.ImportStrategy: accepts the enum
    number (0=STRING_TABLE, 1=USER_DEFINED_TABLE), the enum name, or the
    engine's snake_case string; None keeps the engine default."""
    if v in (0, "0", "STRING_TABLE", "string_table"):
        return "string_table"
    return "user_defined_table"


def _create_mode(v):
    """proto/table.proto ImportOptions.CreateMode: 0/CREATE, 1/REPLACE;
    None keeps the engine default (table must pre-exist)."""
    if v in (0, "0", "CREATE", "create"):
        return "create"
    if v in (1, "1", "REPLACE", "replace"):
        return "replace"
    return None


_WHERE_OPS = {0: "eq", 1: "ne", 2: "gt", 3: "ge", 4: "lt", 5: "le"}
_DATA_TYPES = {0: None, 1: "INTEGER", 2: "DOUBLE", 3: "BIGINT", 4: "REAL",
               5: "DECIMAL", 6: "TIMESTAMP"}


def _dedup_type(v) -> str:
    """proto ImportOptions.DedupType: 0=UPDATE_DUPLICATES,
    1=INSERT_DUPLICATES, 2=FAIL_ON_DUPLICATES (enum number, enum name, or
    the engine's snake_case string)."""
    if v in (1, "1", "INSERT_DUPLICATES", "insert_duplicates"):
        return "insert_duplicates"
    if v in (2, "2", "FAIL_ON_DUPLICATES", "fail_on_duplicates"):
        return "fail_on_duplicates"
    return "update_duplicates"


def _import_type_incremental(v) -> bool:
    """proto ImportOptions.ImportType → the engine's ``incremental`` flag.
    Only 0/FULL (truncate-and-replace) and 1/INCREMENTAL (merge) are
    implemented; 2/VIEW and 3/CLONE are explicitly rejected — silently
    mapping them to FULL would clobber the destination table for a client
    that asked for a view/clone (ADVICE r9)."""
    if v in (None, 0, "0", "FULL", "full"):
        return False
    if v in (1, "1", "INCREMENTAL", "incremental"):
        return True
    from ..catalog.catalog import CatalogError
    raise CatalogError(
        f"unsupported importType {v!r}: only FULL(0) and INCREMENTAL(1) "
        "are implemented (VIEW/CLONE are not)")


def _table_ref(t: dict) -> tuple:
    """proto ImportExportShared.Table / SourceTableMapping → engine
    (project, bucket, table): ``path`` carries [projectId, bucketName]."""
    path = t.get("path") or []
    if len(path) < 2:
        raise KeyError("table path must be [projectId, bucketName]")
    return (path[0], path[1], t["tableName"])


def _where_filters_column(filters):
    """proto TableWhereFilter list → one conjunctive Spark Column (the
    grammar ANDs filters). Accepts enum numbers or names for operator and
    dataType; the column key is the proto's ``columnsName`` or the bridge
    JSON's ``column``."""
    if not filters:
        return None
    from ..operators.filters import combine_where, typed_where
    cols = []
    for f in filters:
        op = f.get("operator", "eq")
        if isinstance(op, int) or (isinstance(op, str) and op.isdigit()):
            op = _WHERE_OPS.get(int(op), op)
        dt = f.get("dataType")
        if isinstance(dt, int) or (isinstance(dt, str) and dt.isdigit()):
            dt = _DATA_TYPES.get(int(dt))
        elif dt == "STRING":
            dt = None
        cols.append(typed_where(f.get("column") or f["columnsName"],
                                op, f.get("values", []), dt))
    return combine_where(cols)


def _handlers(engine) -> dict:
    """Command type → callable(payload) → result dict. Payload field names
    follow the reference's driver JSON (projectId/bucketName/tableName…)."""
    def p(c, *names):
        return [c[n] for n in names]

    return {
        # backend lifecycle: the parquet warehouse needs no init; ack +
        # ops-log like the reference's InitBackend no-op on an existing dir
        "InitBackendCommand": lambda c: (
            engine._log("init_backend") or {"initialized": True}),
        "RemoveBackendCommand": lambda c: (
            engine._log("remove_backend") or {"removed": True}),
        "CreateProjectCommand": lambda c: (
            engine.create_project(c["projectId"]) or {"projectId": c["projectId"]}),
        "DropProjectCommand": lambda c: (
            engine.drop_project(c["projectId"]) or {}),
        "CreateBucketCommand": lambda c: (
            engine.create_bucket(*p(c, "projectId", "bucketName")) or {}),
        "DropBucketCommand": lambda c: (
            engine.drop_bucket(c["projectId"], c["bucketName"],
                               force=c.get("force", False)) or {}),
        "CreateTableCommand": lambda c: engine.create_table(
            c["projectId"], c["bucketName"], c["tableName"], c["columns"],
            primary_key=c.get("primaryKey")),
        "DropTableCommand": lambda c: (
            engine.drop_table(*p(c, "projectId", "bucketName", "tableName"))
            or {}),
        "AddColumnCommand": lambda c: (
            engine.add_column(c["projectId"], c["bucketName"], c["tableName"],
                              c["column"]) or {}),
        "DropColumnCommand": lambda c: (
            engine.drop_column(c["projectId"], c["bucketName"],
                               c["tableName"], c["columnName"]) or {}),
        "AlterColumnCommand": lambda c: (
            engine.alter_column(
                c["projectId"], c["bucketName"], c["tableName"],
                c["columnName"], new_name=c.get("newName"),
                new_type=c.get("newType"), set_nullable=c.get("nullable"),
                set_default=c.get("default"),
                drop_default=c.get("dropDefault", False)) or {}),
        "AddPrimaryKeyCommand": lambda c: (
            engine.add_primary_key(c["projectId"], c["bucketName"],
                                   c["tableName"], c["columns"]) or {}),
        "DropPrimaryKeyCommand": lambda c: (
            engine.drop_primary_key(*p(c, "projectId", "bucketName",
                                       "tableName")) or {}),
        "TableImportFromFileCommand": lambda c: engine.import_file(
            c["projectId"], c["bucketName"], c["tableName"],
            path=c.get("path"), file_id=c.get("fileId"),
            file_format=c.get("format", "csv"),
            incremental=c.get("incremental", False),
            dedup_mode=c.get("dedupMode", "update_duplicates"),
            import_strategy=_strategy(c.get("importStrategy")),
            import_as_null=c.get("importAsNull", ()),
            create_mode=_create_mode(c.get("createMode"))),
        # proto/table.proto TableImportFromTableCommand (SURVEY §2.5 W8):
        # copy between workspace/storage tables — source mapping carries
        # path+tableName, seconds (_timestamp recency), whereFilters,
        # limit, columnMappings; importOptions carries importType (0=FULL
        # replaces, 1=INCREMENTAL merges) and dedupType.
        "TableImportFromTableCommand": lambda c: engine.import_from_table(
            _table_ref(c["source"]), _table_ref(c["destination"]),
            column_mappings={m["sourceColumnName"]: m["destinationColumnName"]
                             for m in c["source"].get("columnMappings", [])}
                            or None,
            where=_where_filters_column(c["source"].get("whereFilters")),
            seconds=c["source"].get("seconds") or None,
            limit=c["source"].get("limit") or None,
            dedup_mode=_dedup_type(
                c.get("importOptions", {}).get("dedupType")),
            incremental=_import_type_incremental(
                c.get("importOptions", {}).get("importType"))),
        "TableExportToFileCommand": lambda c: engine.export_to_file(
            c["projectId"], c["bucketName"], c["tableName"], c["path"],
            file_format=c.get("format", "csv"),
            compression=c.get("compression")),
        "DeleteTableRowsCommand": lambda c: engine.delete_rows(
            c["projectId"], c["bucketName"], c["tableName"],
            where=c.get("where"), where_filters=c.get("whereFilters")),
        "PreviewTableCommand": lambda c: {"rows": engine.preview(
            c["projectId"], c["bucketName"], c["tableName"],
            limit=c.get("limit", 1000))},
        "ObjectInfoCommand": lambda c: engine.object_info(c["path"]),
        "ExecuteQueryCommand": lambda c: {"rows": engine.execute_query(
            c["projectId"], c["sql"], stringify=True,
            max_rows=c.get("maxRows", 10_000))},
        "CreateWorkspaceCommand": lambda c: (
            engine.create_workspace(c["workspaceId"]) or {}),
        "DropWorkspaceCommand": lambda c: (
            engine.drop_workspace(c["workspaceId"]) or {}),
        "ClearWorkspaceCommand": lambda c: (
            engine.clear_workspace(c["workspaceId"]) or {}),
        "DropWorkspaceObjectCommand": lambda c: (
            engine.drop_workspace_object(c["workspaceId"], c["objectName"])
            or {}),
        "LoadTableToWorkspaceCommand": lambda c: engine.load_table_to_workspace(
            c["workspaceId"], c["projectId"], c["bucketName"],
            c["tableName"], c.get("destinationName", c["tableName"]),
            columns=c.get("columns"), where=c.get("where")),
        "ResetWorkspacePasswordCommand": lambda c: {
            "password": engine.reset_workspace_password(c["workspaceId"])},
        "CreateDevBranchCommand": lambda c: (
            engine.create_branch(c["projectId"], c["branchId"]) or {}),
        "DropDevBranchCommand": lambda c: (
            engine.drop_branch(c["projectId"], c["branchId"]) or {}),
        "ShareBucketCommand": lambda c: (
            engine.share_bucket(c["projectId"], c["bucketName"]) or {}),
        "UnshareBucketCommand": lambda c: (
            engine.unshare_bucket(c["projectId"], c["bucketName"]) or {}),
        "LinkBucketCommand": lambda c: (
            engine.link_bucket(c["sourceProjectId"], c["sourceBucketName"],
                               c["projectId"], c["bucketName"]) or {}),
        "UnlinkBucketCommand": lambda c: (
            engine.unlink_bucket(c["projectId"], c["bucketName"]) or {}),
        # role grants are a DB-privilege concern in the reference; the
        # parquet engine records them as auditable ops (introspect via
        # /operations) — same observable contract, no DB roles to mutate
        "GrantBucketAccessToReadOnlyRoleCommand": lambda c: (
            engine._log("grant_bucket_readonly", **c) or {"granted": True}),
        "RevokeBucketAccessFromReadOnlyRoleCommand": lambda c: (
            engine._log("revoke_bucket_readonly", **c) or {"revoked": True}),
        "GrantWorkspaceAccessToProjectCommand": lambda c: (
            engine._log("grant_workspace_access", **c) or {"granted": True}),
        "RevokeWorkspaceAccessToProjectCommand": lambda c: (
            engine._log("revoke_workspace_access", **c) or {"revoked": True}),
    }


def driver_blueprint(engine, require_auth: bool = False) -> Blueprint:
    bp = Blueprint("driver", __name__, url_prefix="/driver")
    handlers = _handlers(engine)

    @bp.get("/commands")
    def commands():
        return jsonify(sorted(handlers))

    @bp.post("/execute")
    def execute():
        body = request.get_json(force=True)
        cmd = body.get("command") or {}
        ctype = (cmd.get("type") or cmd.get("@type") or "").split(".")[-1]
        if ctype not in handlers:
            return jsonify({"error": "unknown_command",
                            "message": f"unsupported command {ctype!r}",
                            "supported": sorted(handlers)}), 400
        if require_auth:
            key = request.headers.get("X-API-Key", "")
            name = engine.verify_api_key(key)
            if name is None:
                return jsonify({"error": "unauthorized"}), 401
            if ctype in ADMIN_ONLY and name != "admin":
                return jsonify({"error": "forbidden",
                                "message":
                                f"{ctype} requires the admin API key"}), 403
        result = handlers[ctype](cmd)
        return jsonify({"command": ctype, "result": result or {}})

    return bp
