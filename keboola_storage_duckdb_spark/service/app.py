"""REST service surface over StorageEngine (Flask app factory).

The reference is usable only through its FastAPI routers + gRPC handlers
(reference src/main.py, src/routers/*.py); this module exposes the same
workflow surface over the Spark-backed engine with the same paths and JSON
shapes:

  * projects / buckets / tables CRUD        (routers/projects.py:36-367,
    buckets.py:50-331, tables.py:84-710)
  * schema ops: columns / primary-key / rows (routers/table_schema.py)
  * import from staged file id / export      (routers/table_import.py:227-629)
  * files staging API prepare/upload/register (routers/files.py:98-360)
  * snapshots create/list/restore/delete     (routers/snapshots.py:190-577)
  * branches + pull                          (routers/branches.py)
  * workspaces + load + credentials          (routers/workspaces.py)
  * SQL passthrough /query                   (routers/driver.py:338, ExecuteQuery)
  * health / operations log

Cross-cutting behavior mirrored from the reference middleware:
  * X-Idempotency-Key replay (middleware/idempotency.py) — a retried
    mutating request with the same key returns the first response without
    re-executing.
  * optional X-API-Key auth (routers/api_keys.py) — enabled by passing
    require_auth=True; keys are minted via engine.create_api_key.
  * branch_id path segment: "default" = main storage, anything else is a
    dev branch (reference resolve_branch).

Run it:  app = create_app(engine); app.run(port=8000)  — or any WSGI host.
"""

from __future__ import annotations

import io
import os
import shutil
import time

from flask import Flask, Response, jsonify, request

from ..catalog.catalog import (
    AlreadyExistsError,
    CatalogError,
    NotFoundError,
)
from ..engine import ARROW_MIME
from ..idempotency import IdempotencyCache
from ..operators.dedup import DuplicateKeyError
from ..operators.filters import WhereClauseError
from .files import FileStoreError


def _wants_arrow(body: dict | None = None) -> bool:
    """Arrow IPC content negotiation (reference ADR-011: Accept header or
    an explicit format=arrow in query string / body)."""
    if ARROW_MIME in request.headers.get("Accept", ""):
        return True
    if request.args.get("format") == "arrow":
        return True
    return bool(body) and body.get("format") == "arrow"


def _arrow_response(data, schema: str, n: int,
                    filename: str | None = None) -> Response:
    """``data`` is the full IPC payload (bytes) or an iterator of IPC
    chunks — Flask streams either."""
    # pyarrow renders schemas one field per line; headers are single-line
    headers = {"X-Arrow-Schema": schema.replace("\n", "; "),
               "X-Row-Count": str(n)}
    if filename:
        headers["Content-Disposition"] = f"attachment; filename={filename}"
    return Response(data, mimetype=ARROW_MIME, headers=headers)


def _branch(branch_id: str) -> str | None:
    return None if branch_id in ("default", "main") else branch_id


def create_app(engine, require_auth: bool = False, s3_config=None,
               pgwire_max_connections: int = 20) -> Flask:
    app = Flask("keboola_storage_duckdb_spark")
    idem = IdempotencyCache()

    from .driver import driver_blueprint
    from .metrics import Metrics
    from .s3 import S3Api
    app.register_blueprint(S3Api(engine, s3_config).blueprint())
    app.register_blueprint(driver_blueprint(engine, require_auth))
    metrics = Metrics()

    @app.before_request
    def _time_request():
        request.environ["storage.t0"] = time.time()

    @app.after_request
    def _observe(resp):
        t0 = request.environ.get("storage.t0")
        route = (request.url_rule.rule if request.url_rule
                 else request.path)
        if t0 is not None and route != "/metrics":
            metrics.observe(request.method, route, resp.status_code,
                            time.time() - t0)
        return resp

    @app.get("/metrics")
    def metrics_endpoint():
        return Response(metrics.render(), mimetype="text/plain")

    @app.get("/dashboard")
    def dashboard():
        # reference dashboard.html: static monitoring page over /metrics;
        # self-contained (no CDN assets), polls every 5 s client-side
        from .dashboard import DASHBOARD_HTML
        return Response(DASHBOARD_HTML, mimetype="text/html")

    # ---------------------------------------------------------- middleware
    @app.before_request
    def _auth():
        # /s3 carries its own auth (SigV4 / presigned / api-key)
        if not require_auth \
                or request.path in ("/health", "/metrics", "/dashboard") \
                or request.path.startswith("/s3/"):
            return None
        key = request.headers.get("X-API-Key")
        if not key or (engine.verify_api_key(key) is None
                       and engine.verify_project_api_key(key) is None):
            return jsonify({"error": "unauthorized",
                            "message": "missing or invalid API key"}), 401
        return None

    def _idem_key() -> str | None:
        if request.method not in ("POST", "PUT", "DELETE"):
            return None
        key = request.headers.get("X-Idempotency-Key")
        return f"{request.method} {request.path} {key}" if key else None

    @app.before_request
    def _idempotency_replay():
        """Replays short-circuit before the handler runs
        (reference src/middleware/idempotency.py: 10-min TTL, first
        response wins, replays return it verbatim)."""
        key = _idem_key()
        cached = idem.get(key) if key else None
        if cached is not None:
            # 3-tuple carries the original mimetype (an Arrow replay must
            # not come back as application/json); old 2-tuples default
            body, status, *mt = cached
            return Response(body, status=status,
                            mimetype=(mt[0] if mt else "application/json"),
                            headers={"X-Idempotency-Replayed": "true"})
        return None

    @app.after_request
    def _idempotency_store(resp):
        key = _idem_key()
        if key and resp.status_code < 500:
            idem.put(key, (resp.get_data(), resp.status_code,
                           resp.mimetype))
        return resp

    # ------------------------------------------------------------- errors
    @app.errorhandler(FileStoreError)
    def _fs_err(e):
        return jsonify({"error": e.code, "message": e.message,
                        "details": e.details}), e.status

    @app.errorhandler(NotFoundError)
    def _nf(e):
        return jsonify({"error": "not_found", "message": str(e)}), 404

    @app.errorhandler(AlreadyExistsError)
    def _ae(e):
        return jsonify({"error": "already_exists", "message": str(e)}), 409

    @app.errorhandler(DuplicateKeyError)
    def _dup(e):
        return jsonify({"error": "duplicate_key", "message": str(e)}), 400

    @app.errorhandler(CatalogError)
    def _ce(e):
        return jsonify({"error": "bad_request", "message": str(e)}), 400

    @app.errorhandler(WhereClauseError)
    def _wc(e):
        return jsonify({"error": "bad_request", "message": str(e)}), 400

    # ------------------------------------------------------------- health
    @app.get("/health")
    def health():
        return jsonify({"status": "ok",
                        "spark": engine.spark.version,
                        "projects": len(engine.catalog.list_projects())})

    @app.get("/operations")
    def operations():
        limit = int(request.args.get("limit", 100))
        return jsonify(engine.operations_log(limit=limit))

    # ------------------------------------------------------------- backend
    @app.post("/backend/init")
    def backend_init():
        """Initialize the storage backend (reference routers/backend.py
        :84-149): ensure every storage path exists and is writable,
        report anything created; failures -> 500 init_failed. The
        reference gates this on require_admin — this service's key model
        has no roles, so any valid API key qualifies (documented
        simplification; auth runs in the shared before_request)."""
        created, errors = [], []
        paths = {"warehouse": engine.catalog.warehouse,
                 "files": os.path.join(engine.catalog.warehouse, "_files")}
        for name, path in paths.items():
            try:
                if not os.path.isdir(path):
                    os.makedirs(path, exist_ok=True)
                    created.append(path)
                if not os.access(path, os.W_OK):
                    errors.append(f"{name}: not writable ({path})")
            except OSError as e:
                errors.append(f"{name}: {e}")
        if errors:
            return jsonify({"error": "init_failed",
                            "message": "Backend initialization failed",
                            "details": {"errors": errors}}), 500
        engine._log("init_backend", created=created)
        msg = "Backend initialized successfully" + (
            f" (created: {', '.join(created)})" if created else "")
        return jsonify({"success": True, "message": msg,
                        "storage_paths": paths})

    @app.post("/backend/remove")
    def backend_remove():
        """No-op by design (reference routers/backend.py:151-171 —
        cleanup belongs to the service lifecycle)."""
        engine._log("remove_backend")
        return jsonify({"success": True,
                        "message": "Backend removal acknowledged (no-op)",
                        "storage_paths": None})

    # ----------------------------------------------------------- projects
    @app.post("/projects")
    def create_project():
        body = request.get_json(force=True)
        engine.create_project(body["id"])
        return jsonify({"id": body["id"]}), 201

    @app.get("/projects")
    def list_projects():
        return jsonify([{"id": p} for p in engine.catalog.list_projects()])

    @app.get("/projects/<project>")
    def get_project(project):
        if project not in engine.catalog.list_projects():
            raise NotFoundError(f"project {project} not found")
        return jsonify({"id": project,
                        "buckets": engine.catalog.list_buckets(project),
                        **engine.get_project_meta(project)})

    @app.put("/projects/<project>")
    def update_project(project):
        """Update project metadata — display name / settings dict
        (reference routers/projects.py:314-400 update_project)."""
        body = request.get_json(force=True) or {}
        return jsonify({"id": project,
                        **engine.update_project_meta(
                            project, name=body.get("name"),
                            settings=body.get("settings"))})

    @app.delete("/projects/<project>")
    def drop_project(project):
        engine.drop_project(project)
        return jsonify({"deleted": project})

    # ------------------------------------------------------------ buckets
    @app.post("/projects/<project>/branches/<branch_id>/buckets")
    def create_bucket(project, branch_id):
        body = request.get_json(force=True)
        engine.create_bucket(project, body["name"])
        return jsonify({"name": body["name"]}), 201

    @app.get("/projects/<project>/branches/<branch_id>/buckets")
    def list_buckets(project, branch_id):
        return jsonify([{"name": b}
                        for b in engine.catalog.list_buckets(project)])

    @app.delete("/projects/<project>/branches/<branch_id>/buckets/<bucket>")
    def drop_bucket(project, branch_id, bucket):
        force = request.args.get("force", "false").lower() == "true"
        engine.drop_bucket(project, bucket, force=force)
        return jsonify({"deleted": bucket})

    # ------------------------------------------------------------- tables
    tbl = "/projects/<project>/branches/<branch_id>/buckets/<bucket>/tables"

    @app.post(tbl)
    def create_table(project, branch_id, bucket):
        body = request.get_json(force=True)
        out = engine.create_table(project, bucket, body["name"],
                                  body["columns"],
                                  primary_key=body.get("primary_key"),
                                  storage_format=body.get("storage_format",
                                                          "parquet"))
        return jsonify(out), 201

    @app.get(tbl)
    def list_tables(project, branch_id, bucket):
        return jsonify(engine.list_linked_tables(project, bucket))

    @app.get(tbl + "/<table>")
    def get_table(project, branch_id, bucket, table):
        return jsonify(engine.table_info(project, bucket, table,
                                         _branch(branch_id)))

    @app.delete(tbl + "/<table>")
    def drop_table(project, branch_id, bucket, table):
        engine.drop_table(project, bucket, table)
        return jsonify({"deleted": table})

    @app.get(tbl + "/<table>/preview")
    def preview_table(project, branch_id, bucket, table):
        args = request.args
        filters = {}
        if args.get("columns"):
            filters["columns"] = args["columns"].split(",")
        for k in ("where", "fulltext", "changed_since", "changed_until"):
            if args.get(k):
                filters[k] = args[k]
        if args.get("order_by"):
            filters["order_by"] = [{"column": c}
                                   for c in args["order_by"].split(",")]
        version = int(args["version"]) if args.get("version") else None
        if _wants_arrow():
            data, schema, n = engine.preview_arrow(
                project, bucket, table, _branch(branch_id),
                limit=int(args.get("limit", 1000)),
                version=version, **filters)
            return _arrow_response(data, schema, n)
        rows = engine.preview(project, bucket, table, _branch(branch_id),
                              limit=int(args.get("limit", 1000)),
                              version=version, **filters)
        return jsonify({"rows": rows, "row_count": len(rows)})

    # ---- vector indexes (beyond-reference: persisted ANN lifecycle as
    # first-class storage objects on a table's vector column) ----
    @app.post(tbl + "/<table>/indexes")
    def create_index(project, branch_id, bucket, table):
        body = request.get_json(force=True)
        return jsonify(engine.create_index(
            project, bucket, table,
            name=body.get("name", ""),
            # a bpe tokenizer trains on text alone — id_column optional
            id_column=(body.get("id_column", "")
                       if body.get("kind") == "bpe"
                       else body["id_column"]),
            vector_column=body.get("vector_column"),
            kind=body.get("kind", "pq"),
            label_column=body.get("label_column"),
            m=int(body.get("m") or 4),
            ksub=int(body.get("ksub") or 8),
            dim=int(body.get("dim") or 64),
            text_column=body.get("text_column"),
            n_hashes=int(body.get("n_hashes") or 12),
            band_size=int(body.get("band_size") or 4),
            # is-not-None, not falsy-or: threshold 0.0 (and 0 counts)
            # are explicit values, not requests for the default
            n_clusters=int(body["n_clusters"]
                           if body.get("n_clusters") is not None else 4),
            rounds=int(body["rounds"]
                       if body.get("rounds") is not None else 2),
            threshold=float(body["threshold"]
                            if body.get("threshold") is not None
                            else 0.9))), 201

    @app.get(tbl + "/<table>/indexes")
    def list_indexes(project, branch_id, bucket, table):
        return jsonify({"indexes": engine.list_indexes(project, bucket,
                                                       table)})

    @app.get(tbl + "/<table>/indexes/<name>")
    def index_info(project, branch_id, bucket, table, name):
        # ?recommend=1 composes drift/imbalance/distortion into the
        # re-train verdict (costs one codes x vectors join; opt-in so
        # plain metadata reads stay cheap)
        rec = request.args.get("recommend", "").lower() in ("1", "true")
        return jsonify(engine.index_info(project, bucket, table, name,
                                         recommend=rec))

    @app.delete(tbl + "/<table>/indexes/<name>")
    def drop_index(project, branch_id, bucket, table, name):
        return jsonify(engine.drop_index(project, bucket, table, name))

    @app.post(tbl + "/<table>/indexes/<name>/dedup")
    def dedup_check(project, branch_id, bucket, table, name):
        body = request.get_json(force=True)
        th = body.get("threshold")      # None = each kind's default;
        hits = engine.dedup_check(      # semdedup REFUSES an override
            project, bucket, table, name,
            documents=body.get("documents"),
            threshold=None if th is None else float(th))
        return jsonify({"hits": hits, "n_hits": len(hits)})

    @app.post(tbl + "/<table>/indexes/<name>/tokenize")
    def tokenize_check(project, branch_id, bucket, table, name):
        body = request.get_json(force=True)
        docs = engine.tokenize_check(project, bucket, table, name,
                                     documents=body.get("documents"))
        return jsonify({"documents": docs, "n_documents": len(docs)})

    @app.post(tbl + "/<table>/indexes/<name>/refresh")
    def refresh_index(project, branch_id, bucket, table, name):
        return jsonify(engine.refresh_index(project, bucket, table, name))

    @app.post(tbl + "/<table>/indexes/<name>/rebuild")
    def rebuild_index(project, branch_id, bucket, table, name):
        body = request.get_json(force=True) if request.data else {}
        return jsonify(engine.rebuild_index(
            project, bucket, table, name,
            if_recommended=bool(body.get("if_recommended"))))

    @app.post(tbl + "/<table>/indexes/<name>/compact")
    def compact_index(project, branch_id, bucket, table, name):
        body = request.get_json(force=True) if request.data else {}
        mf = body.get("max_files")          # 0 is a valid threshold
        return jsonify(engine.compact_index(
            project, bucket, table, name,
            max_files=4 if mf is None else int(mf)))

    @app.post(tbl + "/<table>/indexes/<name>/search")
    def search_index(project, branch_id, bucket, table, name):
        body = request.get_json(force=True)
        results = engine.search_index(
            project, bucket, table, name,
            queries=body.get("queries"),
            k=int(body.get("k") or 5),
            nprobe=(int(body["nprobe"]) if body.get("nprobe") is not None
                    else None),
            filter_labels=body.get("filter_labels"))
        return jsonify({"results": results, "n_results": len(results)})

    @app.post(tbl + "/<table>/optimize")
    def optimize_table(project, branch_id, bucket, table):
        body = request.get_json(force=True) if request.data else {}
        return jsonify(engine.optimize_table(
            project, bucket, table,
            partition_by=body.get("partition_by"),
            target_files=body.get("target_files"),
            cluster_by=body.get("cluster_by"),
            bloom_filter_columns=body.get("bloom_filter_columns"),
            hash_bucket_by=body.get("hash_bucket_by"),
            n_hash_buckets=int(body.get("n_hash_buckets") or 16),
            zorder_by=body.get("zorder_by")))

    # Versioned-backend extras (backends/versioned.py): Delta-style
    # history / vacuum; preview?version=N time-travels a pinned commit.
    @app.get(tbl + "/<table>/history")
    def table_history(project, branch_id, bucket, table):
        return jsonify(engine.table_history(project, bucket, table,
                                            _branch(branch_id)))

    @app.post(tbl + "/<table>/vacuum")
    def vacuum_table(project, branch_id, bucket, table):
        body = request.get_json(force=True) if request.data else {}
        return jsonify(engine.vacuum_table(
            project, bucket, table,
            retain_last=int(body.get("retain_last", 1)),
            branch=_branch(branch_id)))

    @app.post(tbl + "/<table>/profile")
    def profile_table(project, branch_id, bucket, table):
        body = request.get_json(force=True) if request.data else {}
        return jsonify(engine.profile(
            project, bucket, table, _branch(branch_id),
            approx_distinct=bool(body.get("approx_distinct", False))))

    # --------------------------------------------------------- schema ops
    @app.post(tbl + "/<table>/columns")
    def add_column(project, branch_id, bucket, table):
        body = request.get_json(force=True)
        engine.add_column(project, bucket, table, body, _branch(branch_id))
        return jsonify({"added": body["name"]}), 201

    @app.delete(tbl + "/<table>/columns/<column>")
    def drop_column(project, branch_id, bucket, table, column):
        engine.drop_column(project, bucket, table, column, _branch(branch_id))
        return jsonify({"deleted": column})

    @app.put(tbl + "/<table>/columns/<column>")
    def alter_column(project, branch_id, bucket, table, column):
        body = request.get_json(force=True)
        engine.alter_column(project, bucket, table, column,
                            new_name=body.get("new_name"),
                            new_type=body.get("new_type"),
                            set_nullable=body.get("nullable"),
                            set_default=body.get("default"),
                            drop_default=body.get("drop_default", False),
                            branch=_branch(branch_id))
        return jsonify({"altered": column})

    @app.post(tbl + "/<table>/primary-key")
    def add_pk(project, branch_id, bucket, table):
        body = request.get_json(force=True)
        engine.add_primary_key(project, bucket, table, body["columns"])
        return jsonify({"primary_key": body["columns"]}), 201

    @app.delete(tbl + "/<table>/primary-key")
    def drop_pk(project, branch_id, bucket, table):
        engine.drop_primary_key(project, bucket, table)
        return jsonify({"primary_key": []})

    @app.delete(tbl + "/<table>/rows")
    def delete_rows(project, branch_id, bucket, table):
        body = request.get_json(force=True) if request.data else {}
        out = engine.delete_rows(project, bucket, table,
                                 where=body.get("where"),
                                 where_filters=body.get("where_filters"),
                                 ref_filter=body.get("ref_filter"),
                                 branch=_branch(branch_id))
        return jsonify(out)

    # ------------------------------------------------------ import/export
    @app.post(tbl + "/<table>/import/file")
    def import_file(project, branch_id, bucket, table):
        if request.content_type == ARROW_MIME:
            # ADR-011 Arrow import: the request body IS the IPC stream
            import tempfile
            opts = request.args
            with tempfile.NamedTemporaryFile(suffix=".arrow",
                                             delete=False) as f:
                f.write(request.get_data())
                tmp = f.name
            try:
                out = engine.import_file(
                    project, bucket, table, path=tmp, file_format="arrow",
                    incremental=opts.get("incremental") == "true",
                    dedup_mode=opts.get("dedup_mode", "update_duplicates"),
                    branch=_branch(branch_id))
            finally:
                os.unlink(tmp)
            return jsonify(out)
        body = request.get_json(force=True)
        opts = body.get("import_options", {})
        out = engine.import_file(
            project, bucket, table,
            path=body.get("path"),
            file_id=body.get("file_id"),
            file_format=body.get("format", "csv"),
            incremental=opts.get("incremental", False),
            dedup_mode=opts.get("dedup_mode", "update_duplicates"),
            import_strategy=opts.get("import_strategy",
                                     "user_defined_table"),
            import_as_null=body.get("import_as_null",
                                    opts.get("import_as_null", ())),
            create_mode=opts.get("create_mode"),
            csv_options=body.get("csv_options"),
            convert_empty_to_null=body.get("convert_empty_to_null", ()),
            branch=_branch(branch_id))
        return jsonify(out)

    @app.post(tbl + "/<table>/export")
    def export_table(project, branch_id, bucket, table):
        """Export into the project files area and register the result —
        the reference's export flow writes into files and records it
        (src/routers/table_import.py:560-629)."""
        body = request.get_json(force=True)
        fmt = body.get("format", "csv")
        filters = {k: body[k] for k in
                   ("columns", "where", "where_filters", "order_by", "limit")
                   if k in body}
        if fmt == "arrow" or _wants_arrow(body):
            # ADR-011 export shape: the FULL result streams back as Arrow
            # IPC record batches (distributed parquet stage → batchwise
            # driver conversion, engine.export_arrow) — no silent 10k
            # preview clamp (ADVICE r6); an explicit `limit` in the body
            # is honored as a real bound via the filter surface
            chunks, schema, n = engine.export_arrow(
                project, bucket, table, _branch(branch_id), **filters)
            return _arrow_response(chunks, schema, n,
                                   filename=f"{table}.arrow")
        staging = os.path.join(engine.files.root, project, "export_tmp")
        out = engine.export_to_file(project, bucket, table, staging,
                                    file_format=fmt,
                                    compression=body.get("compression"),
                                    branch=_branch(branch_id),
                                    single_file=body.get("single_file", True),
                                    **filters)
        # adopt the part file(s) as downloadable file records; the
        # parallel path (single_file=false — large exports keep the write
        # distributed) registers every part as a sliced file set
        name = body.get("file_name", f"{table}.{fmt}")
        parts = [e for e in sorted(os.listdir(staging))
                 if e.startswith("part-")]
        recs = []
        for i, part in enumerate(parts):
            pname = name if len(parts) == 1 else f"{name}.{i:05d}"
            recs.append(engine.files.register_local(
                project, os.path.join(staging, part), pname,
                content_type=f"application/{fmt}"))
        shutil.rmtree(staging, ignore_errors=True)
        resp = {"rows_exported": out["rows_exported"], "file": recs[0]}
        if len(recs) > 1:
            resp["files"] = recs
        return jsonify(resp)

    # -------------------------------------------------------------- files
    @app.post("/projects/<project>/files/prepare")
    def files_prepare(project):
        body = request.get_json(force=True)
        return jsonify(engine.files.prepare(
            project, body["filename"],
            content_type=body.get("content_type"),
            size_bytes=body.get("size_bytes"),
            tags=body.get("tags"))), 201

    @app.post("/projects/<project>/files/upload/<upload_key>")
    def files_upload(project, upload_key):
        return jsonify(engine.files.upload(
            project, upload_key, io.BytesIO(request.get_data())))

    @app.post("/projects/<project>/files")
    def files_register(project):
        body = request.get_json(force=True)
        return jsonify(engine.files.register(
            project, body["upload_key"], name=body.get("name"),
            tags=body.get("tags"),
            expected_sha256=body.get("expected_sha256"))), 201

    @app.get("/projects/<project>/files")
    def files_list(project):
        return jsonify(engine.files.list(project))

    @app.get("/projects/<project>/files/<file_id>")
    def files_get(project, file_id):
        return jsonify(engine.files.get(project, file_id))

    @app.get("/projects/<project>/files/<file_id>/download")
    def files_download(project, file_id):
        rec = engine.files.get(project, file_id)
        with open(engine.files.local_path(project, file_id), "rb") as f:
            data = f.read()
        return Response(
            data,
            mimetype=rec.get("content_type") or "application/octet-stream",
            headers={"Content-Disposition":
                     f'attachment; filename="{rec["name"]}"'})

    @app.delete("/projects/<project>/files/<file_id>")
    def files_delete(project, file_id):
        engine.files.delete(project, file_id)
        return jsonify({"deleted": file_id})

    # ---------------------------------------------------------- snapshots
    snaps = "/projects/<project>/branches/<branch_id>/snapshots"

    @app.post(snaps)
    def snapshot_create(project, branch_id):
        body = request.get_json(force=True)
        out = engine.snapshot_create(project, body["bucket"], body["table"],
                                     description=body.get("description", ""))
        return jsonify(out), 201

    @app.get(snaps)
    def snapshot_list(project, branch_id):
        return jsonify(engine.snapshot_list(
            project, request.args["bucket"], request.args["table"]))

    @app.post(snaps + "/<snapshot_id>/restore")
    def snapshot_restore(project, branch_id, snapshot_id):
        body = request.get_json(force=True)
        return jsonify(engine.snapshot_restore(
            project, body["bucket"], body["table"], snapshot_id))

    @app.post(snaps + "/<snapshot_id>/diff")
    def snapshot_diff(project, branch_id, snapshot_id):
        body = request.get_json(force=True)
        return jsonify(engine.snapshot_diff(
            project, body["bucket"], body["table"], snapshot_id,
            other_snapshot_id=body.get("other_snapshot_id"),
            sample_limit=int(body.get("sample_limit", 100))))

    @app.delete(snaps + "/<snapshot_id>")
    def snapshot_delete(project, branch_id, snapshot_id):
        engine.snapshot_delete(project, request.args["bucket"],
                               request.args["table"], snapshot_id)
        return jsonify({"deleted": snapshot_id})

    # ----------------------------------------------------------- branches
    @app.post("/projects/<project>/branches")
    def create_branch(project):
        body = request.get_json(force=True)
        engine.create_branch(project, body["id"])
        return jsonify({"id": body["id"]}), 201

    @app.delete("/projects/<project>/branches/<branch_id>")
    def drop_branch(project, branch_id):
        engine.drop_branch(project, branch_id)
        return jsonify({"deleted": branch_id})

    @app.post("/projects/<project>/branches/<branch_id>"
              "/tables/<bucket>/<table>/pull")
    def branch_pull(project, branch_id, bucket, table):
        engine.branch_pull(project, branch_id, bucket, table)
        return jsonify({"pulled": f"{bucket}/{table}"})

    # --------------------------------------------------------- workspaces
    @app.post("/projects/<project>/workspaces")
    def create_workspace(project):
        body = request.get_json(force=True)
        engine.create_workspace(body["id"])
        return jsonify({"id": body["id"]}), 201

    @app.delete("/projects/<project>/workspaces/<ws>")
    def drop_workspace(project, ws):
        engine.drop_workspace(ws)
        return jsonify({"deleted": ws})

    @app.post("/projects/<project>/workspaces/<ws>/clear")
    def clear_workspace(project, ws):
        engine.clear_workspace(ws)
        return jsonify({"cleared": ws})

    @app.post("/projects/<project>/workspaces/<ws>/load")
    def workspace_load(project, ws):
        body = request.get_json(force=True)
        out = engine.load_table_to_workspace(
            ws, project, body["bucket"], body["table"],
            body.get("destination", body["table"]),
            columns=body.get("columns"), where=body.get("where"))
        return jsonify(out)

    @app.post("/projects/<project>/workspaces/<ws>/credentials/reset")
    def workspace_credentials(project, ws):
        return jsonify({"password": engine.reset_workspace_password(ws)})

    # ------------------------------------------- sharing / settings / keys
    @app.post("/projects/<project>/branches/<branch_id>/buckets/<bucket>/share")
    def share_bucket(project, branch_id, bucket):
        engine.share_bucket(project, bucket)
        return jsonify({"shared": bucket})

    @app.delete("/projects/<project>/branches/<branch_id>/buckets/<bucket>/share")
    def unshare_bucket(project, branch_id, bucket):
        engine.unshare_bucket(project, bucket)
        return jsonify({"unshared": bucket})

    @app.post("/projects/<project>/branches/<branch_id>/buckets/<bucket>/link")
    def link_bucket(project, branch_id, bucket):
        body = request.get_json(force=True)
        engine.link_bucket(body["source_project"], body["source_bucket"],
                           project, bucket)
        return jsonify({"linked": bucket})

    @app.delete("/projects/<project>/branches/<branch_id>/buckets/<bucket>/link")
    def unlink_bucket(project, branch_id, bucket):
        engine.unlink_bucket(project, bucket)
        return jsonify({"unlinked": bucket})

    # Readonly grant/revoke (reference bucket_sharing.py:648-780): the
    # reference documents these as metadata-only API-compat operations —
    # enforcement is the linked read-through itself, so they validate the
    # bucket and log, nothing else.
    @app.post("/projects/<project>/branches/<branch_id>/buckets/<bucket>"
              "/grant-readonly")
    def grant_readonly(project, branch_id, bucket):
        engine.grant_readonly(project, bucket)
        return jsonify({
            "status": "success",
            "message": "readonly is enforced by link read-through",
            "bucket_name": bucket})

    @app.delete("/projects/<project>/branches/<branch_id>/buckets/<bucket>"
                "/grant-readonly")
    def revoke_readonly(project, branch_id, bucket):
        engine.revoke_readonly(project, bucket)
        return Response(b"", status=204)

    @app.put("/snapshot-settings/<level>")
    def snapshot_settings(level):
        body = request.get_json(force=True)
        engine.set_snapshot_settings(level, body["path"],
                                     enabled=body.get("enabled"),
                                     retention_days=body.get("retention_days"))
        return jsonify({"level": level, "path": body["path"]})

    # Per-resource snapshot-settings paths (reference
    # routers/snapshot_settings.py — GET returns effective config +
    # per-field inheritance + local overrides; PUT sets local overrides;
    # DELETE clears them so the level re-inherits). The flat
    # /snapshot-settings/<level> PUT above predates these and stays.
    def _snap_routes(level, rule, parts):
        def get_fn(**kw):
            return jsonify(engine.get_snapshot_settings(
                level, [kw[p] for p in parts]))

        def put_fn(**kw):
            body = request.get_json(force=True) or {}
            path = [kw[p] for p in parts]
            engine.set_snapshot_settings(
                level, path, enabled=body.get("enabled"),
                retention_days=body.get("retention_days"))
            return jsonify(engine.get_snapshot_settings(level, path))

        def delete_fn(**kw):
            engine.delete_snapshot_settings(level, [kw[p] for p in parts])
            return "", 204

        app.add_url_rule(rule, f"snap_get_{level}", get_fn,
                         methods=["GET"])
        app.add_url_rule(rule, f"snap_put_{level}", put_fn,
                         methods=["PUT"])
        app.add_url_rule(rule, f"snap_del_{level}", delete_fn,
                         methods=["DELETE"])

    _snap_routes("project", "/projects/<project>/settings/snapshots",
                 ("project",))
    _snap_routes("bucket",
                 "/projects/<project>/branches/<branch_id>/buckets"
                 "/<bucket>/settings/snapshots", ("project", "bucket"))
    _snap_routes("table", tbl + "/<table>/settings/snapshots",
                 ("project", "bucket", "table"))

    @app.post("/api-keys")
    def create_api_key():
        body = request.get_json(force=True)
        return jsonify({"name": body["name"],
                        "key": engine.create_api_key(body["name"])}), 201

    # Project-scoped keys (reference routers/api_keys.py:95-440): scope +
    # branch validation, expiry, soft revoke (never the last active
    # project_admin), rotate = new id/secret + old key revoked.
    @app.post("/projects/<project>/api-keys")
    def create_project_key(project):
        body = request.get_json(force=True) or {}
        rec = engine.create_project_api_key(
            project, scope=body.get("scope", "project_admin"),
            branch_id=body.get("branch_id"),
            description=body.get("description"),
            expires_in_days=body.get("expires_in_days"))
        return jsonify(rec), 201

    @app.get("/projects/<project>/api-keys")
    def list_project_keys(project):
        return jsonify(engine.list_project_api_keys(project))

    @app.get("/projects/<project>/api-keys/<key_id>")
    def get_project_key(project, key_id):
        return jsonify(engine.get_project_api_key(project, key_id))

    @app.delete("/projects/<project>/api-keys/<key_id>")
    def revoke_project_key(project, key_id):
        engine.revoke_project_api_key(project, key_id)
        return "", 204

    @app.post("/projects/<project>/api-keys/<key_id>/rotate")
    def rotate_project_key(project, key_id):
        return jsonify(engine.rotate_project_api_key(project, key_id)), 201

    @app.get("/projects/<project>/stats")
    def project_stats(project):
        return jsonify(engine.project_stats(project))

    # -------------------------------------- pgwire REST backchannel
    # (reference routers/pgwire_auth.py, prefix /internal/pgwire: the
    # surface an external pgwire proxy uses — auth check, session
    # register/heartbeat/close, list, stale cleanup). The in-process
    # PG-wire server (service/pgwire.py) authenticates directly; this
    # REST twin exists for proxy deployments and parity. Reference
    # workspace expiry (410) has no analogue — our workspaces carry no
    # TTL (documented simplification).
    @app.post("/internal/pgwire/auth")
    def pgwire_auth():
        body = request.get_json(force=True)
        ws = body.get("username", "")
        if not engine.verify_workspace_password(ws, body.get("password",
                                                             "")):
            return jsonify({"error": "invalid_credentials",
                            "message": "Invalid username or password"}), 401
        active = len(engine.pgwire_sessions_list(workspace_id=ws,
                                                 status="active"))
        if active >= pgwire_max_connections:
            return jsonify({
                "error": "connection_limit_reached",
                "message": f"Maximum connections "
                           f"({pgwire_max_connections}) reached for "
                           f"workspace",
                "details": {"workspace_id": ws,
                            "active_sessions": active,
                            "limit": pgwire_max_connections}}), 429
        d = engine.catalog.workspace_dir(ws)
        objects = sorted(e for e in os.listdir(d)
                         if not e.startswith("_"))
        return jsonify({"workspace_id": ws, "db_path": d,
                        "tables": objects,
                        "memory_limit": "2GB",
                        "query_timeout_seconds": 300})

    @app.post("/internal/pgwire/sessions")
    def pgwire_session_create():
        body = request.get_json(force=True)
        return jsonify(engine.pgwire_session_create(
            body["session_id"], body["workspace_id"],
            client_ip=body.get("client_ip"))), 201

    @app.get("/internal/pgwire/sessions")
    def pgwire_sessions_list():
        return jsonify(engine.pgwire_sessions_list(
            workspace_id=request.args.get("workspace_id"),
            status=request.args.get("status")))

    @app.get("/internal/pgwire/sessions/<session_id>")
    def pgwire_session_get(session_id):
        return jsonify(engine.pgwire_session_get(session_id))

    @app.patch("/internal/pgwire/sessions/<session_id>/activity")
    def pgwire_session_activity(session_id):
        body = request.get_json(force=True) or {}
        return jsonify(engine.pgwire_session_activity(
            session_id,
            increment_queries=body.get("increment_queries", 0)))

    @app.delete("/internal/pgwire/sessions/<session_id>")
    def pgwire_session_close(session_id):
        engine.pgwire_session_close(
            session_id, reason=request.args.get("reason", "disconnected"))
        return "", 204

    @app.post("/internal/pgwire/sessions/cleanup")
    def pgwire_sessions_cleanup():
        timeout = float(request.args.get("idle_timeout_seconds", 1800))
        return jsonify({"cleaned_up": engine.pgwire_sessions_cleanup(
                            timeout),
                        "idle_timeout_seconds": timeout})

    # ---------------------------------------------------------- SQL query
    @app.post("/projects/<project>/query")
    def query(project):
        body = request.get_json(force=True)
        if _wants_arrow(body):
            data, schema, n = engine.execute_query_arrow(
                project, body["sql"],
                branch=_branch(body.get("branch", "default")),
                timeout_seconds=body.get("timeout_seconds"),
                max_rows=body.get("max_rows", 10_000))
            return _arrow_response(data, schema, n)
        rows = engine.execute_query(
            project, body["sql"],
            branch=_branch(body.get("branch", "default")),
            timeout_seconds=body.get("timeout_seconds"),
            stringify=body.get("stringify", True),
            max_rows=body.get("max_rows", 10_000))
        return jsonify({"rows": rows, "row_count": len(rows)})

    return app
