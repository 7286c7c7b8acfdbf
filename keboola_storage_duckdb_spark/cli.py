"""Command-line client for the storage service (CLI parity layer).

The reference ships a typer CLI over its REST API
(cli/src/keboola_duckdb_cli/main.py:14-67, commands/tables.py:89-474,
commands/buckets.py:17-96, commands/files.py:19-171,
commands/projects.py:17-53, commands/config_cmd.py:13-68, client.py:26-242,
config.py:15-113). This module re-expresses that surface with the standard
library only (argparse + urllib — typer/httpx are not available here):

    python -m keboola_storage_duckdb_spark.cli tables import p1 in_c_data users data.csv

Command groups: ``config`` (set/show), ``projects`` (list/create/delete),
``buckets`` (list/create/delete), ``tables`` (create/list/preview/import/
export/profile/delete), ``files`` (list/upload/download/delete), ``query``.

Connection settings resolve env > config file > flags default, mirroring the
reference's precedence (config.py:23-49): ``KEBOOLA_SPARK_URL`` /
``KEBOOLA_SPARK_API_KEY`` env vars, else ``~/.keboola-spark/config.json``.
CSV schema inference for ``tables create --from-csv`` runs client-side like
the reference's (commands/tables.py:18-86), using a csv.reader sample.
"""

from __future__ import annotations

import argparse
import csv
import io
import json
import os
import re
import sys
import urllib.error
import urllib.parse
import urllib.request
from pathlib import Path

CONFIG_DIR = Path(os.environ.get("KEBOOLA_SPARK_CONFIG_DIR",
                                 str(Path.home() / ".keboola-spark")))
CONFIG_FILE = CONFIG_DIR / "config.json"


# --------------------------------------------------------------------------
# config
# --------------------------------------------------------------------------

def load_config() -> dict:
    cfg = {"url": "", "api_key": ""}
    if CONFIG_FILE.exists():
        try:
            cfg.update({k: v for k, v in
                        json.loads(CONFIG_FILE.read_text()).items()
                        if k in cfg})
        except Exception:
            pass
    if os.environ.get("KEBOOLA_SPARK_URL"):
        cfg["url"] = os.environ["KEBOOLA_SPARK_URL"]
    if os.environ.get("KEBOOLA_SPARK_API_KEY"):
        cfg["api_key"] = os.environ["KEBOOLA_SPARK_API_KEY"]
    return cfg


def save_config(cfg: dict) -> None:
    CONFIG_DIR.mkdir(parents=True, exist_ok=True)
    CONFIG_FILE.write_text(json.dumps(
        {"url": cfg.get("url", ""), "api_key": cfg.get("api_key", "")},
        indent=2))


def mask_key(key: str) -> str:
    if len(key) <= 8:
        return "*" * len(key)
    return key[:4] + "*" * (len(key) - 8) + key[-4:]


# --------------------------------------------------------------------------
# HTTP client (stdlib urllib; reference uses httpx, client.py:26-242)
# --------------------------------------------------------------------------

class APIError(Exception):
    def __init__(self, status: int, message: str):
        self.status = status
        super().__init__(f"HTTP {status}: {message}")


class Client:
    def __init__(self, url: str, api_key: str = ""):
        if not url:
            raise APIError(0, "no service URL configured "
                              "(config set url … or KEBOOLA_SPARK_URL)")
        self.base = url.rstrip("/")
        self.api_key = api_key

    def _request(self, method: str, path: str, body: bytes | None = None,
                 content_type: str = "application/json",
                 params: dict | None = None) -> tuple[int, bytes, dict]:
        url = self.base + path
        if params:
            url += "?" + urllib.parse.urlencode(params)
        req = urllib.request.Request(url, data=body, method=method)
        req.add_header("Content-Type", content_type)
        if self.api_key:
            req.add_header("X-API-Key", self.api_key)
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, resp.read(), dict(resp.headers)
        except urllib.error.HTTPError as e:
            data = e.read()
            try:
                msg = json.loads(data).get("error", data.decode(errors="replace"))
            except Exception:
                msg = data.decode(errors="replace")
            raise APIError(e.code, msg) from None
        except urllib.error.URLError as e:
            raise APIError(0, f"cannot reach {self.base}: {e.reason}") from None

    def json(self, method: str, path: str, body: dict | None = None,
             params: dict | None = None):
        raw = (json.dumps(body).encode() if body is not None
               else (b"{}" if method in ("POST", "PUT") else None))
        _, data, _ = self._request(method, path, raw, params=params)
        return json.loads(data) if data else None

    def get(self, path: str, params: dict | None = None):
        return self.json("GET", path, params=params)

    def post(self, path: str, body: dict | None = None):
        return self.json("POST", path, body or {})

    def delete(self, path: str, params: dict | None = None):
        return self.json("DELETE", path, params=params)

    def upload_file_3stage(self, project: str, file_path: Path) -> dict:
        """prepare → upload bytes → register (the reference's 3-stage flow,
        client.py:192-229 against routers/files.py:98-360)."""
        data = file_path.read_bytes()
        prep = self.post(f"/projects/{project}/files/prepare",
                         {"filename": file_path.name,
                          "size_bytes": len(data)})
        self._request("POST",
                      f"/projects/{project}/files/upload/{prep['upload_key']}",
                      data, content_type="application/octet-stream")
        return self.post(f"/projects/{project}/files",
                         {"upload_key": prep["upload_key"]})

    def download(self, path: str, out: Path) -> int:
        _, data, _ = self._request("GET", path)
        out.write_bytes(data)
        return len(data)


# --------------------------------------------------------------------------
# output helpers (reference output.py:15-132)
# --------------------------------------------------------------------------

def print_json(data) -> None:
    print(json.dumps(data, indent=2, default=str))


def print_table(headers: list[str], rows: list[list]) -> None:
    cells = [[("" if v is None else str(v)) for v in r] for r in rows]
    widths = [max([len(h)] + [len(r[i]) for r in cells])
              for i, h in enumerate(headers)]
    line = "  ".join(h.ljust(w) for h, w in zip(headers, widths))
    print(line)
    print("  ".join("-" * w for w in widths))
    for r in cells:
        print("  ".join(c.ljust(w) for c, w in zip(r, widths)))


def format_bytes(size) -> str:
    size = float(size or 0)
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if size < 1024 or unit == "TB":
            return f"{size:.1f} {unit}" if unit != "B" else f"{int(size)} B"
        size /= 1024
    return f"{size:.1f} TB"


# --------------------------------------------------------------------------
# client-side CSV schema inference (reference commands/tables.py:18-86)
# --------------------------------------------------------------------------

_INT_RE = re.compile(r"^[+-]?\d+$")
_FLOAT_RE = re.compile(r"^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$")
_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_TS_RE = re.compile(r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}(:\d{2})?")
_BOOL = {"true", "false", "t", "f", "0", "1", "yes", "no"}
_INT32_MAX = 2_147_483_647


def infer_column_type(values: list[str]) -> str:
    """Narrowest common type over the non-empty sample values; widening
    order mirrors the reference (INTEGER→BIGINT→DOUBLE, DATE→TIMESTAMP,
    anything mixed → VARCHAR)."""
    vals = [v.strip() for v in values if v is not None and v.strip() != ""]
    if not vals:
        return "VARCHAR"
    if all(v.lower() in ("true", "false") for v in vals):
        return "BOOLEAN"
    if all(_INT_RE.match(v) for v in vals):
        return ("INTEGER" if all(abs(int(v)) <= _INT32_MAX for v in vals)
                else "BIGINT")
    if all(_FLOAT_RE.match(v) for v in vals):
        return "DOUBLE"
    if all(_DATE_RE.match(v) for v in vals):
        return "DATE"
    if all(_TS_RE.match(v) or _DATE_RE.match(v) for v in vals):
        return "TIMESTAMP"
    return "VARCHAR"


def infer_schema_from_csv(path: Path, sample_rows: int = 100) -> list[dict]:
    with open(path, newline="", encoding="utf-8-sig") as f:
        reader = csv.reader(f)
        try:
            header = next(reader)
        except StopIteration:
            raise SystemExit(f"Error: empty CSV: {path}")
        sample = []
        for i, row in enumerate(reader):
            if i >= sample_rows:
                break
            sample.append(row)
    cols = []
    for i, name in enumerate(header):
        vals = [r[i] for r in sample if i < len(r)]
        cols.append({"name": name.strip(), "type": infer_column_type(vals),
                     "nullable": any(v.strip() == "" for v in vals) or not vals})
    return cols


# --------------------------------------------------------------------------
# command implementations
# --------------------------------------------------------------------------

def _client(args) -> Client:
    cfg = load_config()
    url = getattr(args, "url", None) or cfg["url"]
    key = getattr(args, "api_key", None) or cfg["api_key"]
    return Client(url, key)


def _tbl_base(a) -> str:
    return (f"/projects/{a.project}/branches/{a.branch}"
            f"/buckets/{a.bucket}/tables")


def cmd_config_set(args):
    if args.key.lower().replace("-", "_") not in ("url", "api_key"):
        raise SystemExit(f"Error: unknown config key: {args.key}")
    cfg = load_config()
    cfg[args.key.lower().replace("-", "_")] = args.value
    save_config(cfg)
    print(f"Set {args.key}")


def cmd_config_show(args):
    cfg = load_config()
    out = {"url": cfg["url"],
           "api_key": mask_key(cfg["api_key"]) if cfg["api_key"] else ""}
    if args.json:
        print_json(out)
    else:
        for k, v in out.items():
            print(f"{k}: {v or '-'}")


def cmd_projects_list(args):
    res = _client(args).get("/projects")
    if args.json:
        print_json(res)
    else:
        print_table(["Id"], [[p["id"]] for p in res])


def cmd_projects_create(args):
    res = _client(args).post("/projects", {"id": args.project})
    print_json(res) if args.json else print(f"Project '{res['id']}' created")


def cmd_projects_delete(args):
    res = _client(args).delete(f"/projects/{args.project}")
    print_json(res) if args.json else print(f"Project '{args.project}' deleted")


def cmd_buckets_list(args):
    res = _client(args).get(
        f"/projects/{args.project}/branches/{args.branch}/buckets")
    if args.json:
        print_json(res)
    else:
        print_table(["Name"], [[b["name"]] for b in res])


def cmd_buckets_create(args):
    res = _client(args).post(
        f"/projects/{args.project}/branches/{args.branch}/buckets",
        {"name": args.bucket})
    print_json(res) if args.json else print(f"Bucket '{res['name']}' created")


def cmd_buckets_delete(args):
    res = _client(args).delete(
        f"/projects/{args.project}/branches/{args.branch}/buckets/{args.bucket}",
        params={"force": "true"} if args.force else None)
    print_json(res) if args.json else print(f"Bucket '{args.bucket}' deleted")


def cmd_tables_create(args):
    if bool(args.columns) == bool(args.from_csv):
        raise SystemExit("Error: exactly one of --columns / --from-csv "
                         "is required")
    if args.from_csv:
        p = Path(args.from_csv)
        if not p.exists():
            raise SystemExit(f"Error: file not found: {p}")
        columns = infer_schema_from_csv(p)
        if not args.json:
            print("Detected columns:")
            for c in columns:
                print(f"  - {c['name']}: {c['type']}")
    else:
        try:
            columns = json.loads(args.columns)
        except json.JSONDecodeError as e:
            raise SystemExit(f"Error: invalid JSON for columns: {e}")
    payload = {"name": args.table, "columns": columns}
    if args.pk:
        payload["primary_key"] = [c.strip() for c in args.pk.split(",")]
    res = _client(args).post(_tbl_base(args), payload)
    if args.json:
        print_json(res)
    else:
        print(f"Table '{args.table}' created "
              f"(columns: {len(columns)}, pk: {args.pk or '-'})")


def cmd_tables_list(args):
    res = _client(args).get(_tbl_base(args))
    if args.json:
        print_json(res)
        return
    # the service returns bare table names (engine.list_linked_tables)
    print_table(["Name"], [[t if isinstance(t, str) else t.get("name")]
                           for t in res])
    print(f"\nTotal: {len(res)} table(s)")


def cmd_tables_preview(args):
    params = {"limit": args.limit}
    if args.columns:
        params["columns"] = args.columns
    if args.where:
        params["where"] = args.where
    if args.order_by:
        params["order_by"] = args.order_by
    if args.version is not None:
        params["version"] = args.version
    res = _client(args).get(f"{_tbl_base(args)}/{args.table}/preview",
                            params=params)
    if args.json:
        print_json(res)
        return
    rows = res.get("rows", [])
    if not rows:
        print(f"Table {args.table} is empty")
        return
    headers = list(rows[0].keys())
    print_table(headers, [[r.get(h) for h in headers] for r in rows])
    print(f"\nShowing {res.get('row_count', len(rows))} row(s)")


def cmd_tables_import(args):
    c = _client(args)
    p = Path(args.file)
    if not args.json:
        print(f"Uploading {p.name}…")
    rec = c.upload_file_3stage(args.project, p)
    if not args.json:
        print(f"File uploaded: {rec['id']}")
    opts = {"incremental": args.incremental}
    if args.string_table:
        opts["import_strategy"] = "string_table"
    if args.create_mode:
        opts["create_mode"] = args.create_mode
    if args.null_value:
        opts["import_as_null"] = args.null_value
    res = c.post(f"{_tbl_base(args)}/{args.table}/import/file",
                 {"file_id": rec["id"], "format": args.format,
                  "import_options": opts})
    if args.json:
        print_json(res)
    else:
        print(f"Imported {res.get('rows_delta', 0):,} rows; table now "
              f"has {res.get('rows_after', 0):,} rows")


def cmd_tables_export(args):
    c = _client(args)
    body = {"format": args.format}
    if args.where:
        body["where"] = args.where
    if args.columns:
        body["columns"] = args.columns.split(",")
    res = c.post(f"{_tbl_base(args)}/{args.table}/export", body)
    file_id = res["file"]["id"]
    out = Path(args.output)
    n = c.download(f"/projects/{args.project}/files/{file_id}/download", out)
    if args.json:
        print_json({"file_id": file_id,
                    "rows_exported": res.get("rows_exported"),
                    "output_file": str(out), "bytes": n})
    else:
        print(f"Exported {res.get('rows_exported', 0):,} rows to {out}")


def cmd_tables_profile(args):
    res = _client(args).post(
        f"{_tbl_base(args)}/{args.table}/profile",
        {"approx_distinct": True} if args.approx else {})
    if args.json:
        print_json(res)
        return
    print(f"Rows: {res['row_count']:,}   Columns: {res['column_count']}   "
          f"Quality score: {res.get('quality_score')}")
    rows = [[c["name"], c["type"], c.get("null_count"),
             c.get("distinct_count"), c.get("cardinality"),
             c.get("min"), c.get("max")]
            for c in res.get("columns", [])]
    print_table(["Column", "Type", "Nulls", "Distinct", "Cardinality",
                 "Min", "Max"], rows)


def cmd_tables_delete(args):
    res = _client(args).delete(f"{_tbl_base(args)}/{args.table}")
    print_json(res) if args.json else print(f"Table '{args.table}' deleted")


def cmd_tables_optimize(args):
    body = {}
    if args.partition_by:
        body["partition_by"] = args.partition_by.split(",")
    if args.cluster_by:
        body["cluster_by"] = args.cluster_by.split(",")
    if args.bloom_filter:
        body["bloom_filter_columns"] = args.bloom_filter.split(",")
    if args.target_files:
        body["target_files"] = args.target_files
    res = _client(args).post(f"{_tbl_base(args)}/{args.table}/optimize", body)
    (print_json(res) if args.json
     else print(f"Optimized: partition_by={res['partition_by'] or '-'} "
                f"cluster_by={res['cluster_by'] or '-'} "
                f"bloom={res['bloom_filter_columns'] or '-'} "
                f"target_files={res['target_files'] or '-'}"))


def cmd_indexes_create(args):
    if args.kind != "bpe" and not args.id_column:
        raise SystemExit("--id-column is required for kind != bpe")
    body = {"name": args.name, "id_column": args.id_column or "",
            "kind": args.kind, "m": args.m, "ksub": args.ksub,
            "dim": args.dim, "n_clusters": args.n_clusters,
            "rounds": args.rounds, "threshold": args.threshold}
    if args.vector_column:
        body["vector_column"] = args.vector_column
    if args.text_column:
        body["text_column"] = args.text_column
    if args.label_column:
        body["label_column"] = args.label_column
    res = _client(args).post(
        f"{_tbl_base(args)}/{args.table}/indexes", body)
    (print_json(res) if args.json
     else print(f"Created index {res['name']} ({res['kind']}) over "
                f"{res['n_vectors']:,} rows"))


def cmd_indexes_dedup(args):
    raw = args.documents
    if not raw.lstrip().startswith(("[", "{")):       # a path, not JSON
        raw = Path(raw).read_text()
    body = {"documents": json.loads(raw)}
    if args.threshold is not None:     # semdedup indexes refuse an
        body["threshold"] = args.threshold  # override (frozen at build)
    res = _client(args).post(
        f"{_tbl_base(args)}/{args.table}/indexes/{args.name}/dedup", body)
    if args.json:
        print_json(res)
        return
    if res["hits"] and "keep" in res["hits"][0]:       # semdedup verdicts
        rows = [[h["id"], h["cluster"],
                 "keep" if h["keep"] else "drop"] for h in res["hits"]]
        print_table(["Vector", "Cluster", "Verdict"], rows)
        return
    rows = [[h["id"], h["duplicate_of"], round(h["jaccard"], 4)]
            for h in res["hits"]]
    print_table(["Doc", "Duplicate of", "Jaccard"], rows)


def cmd_indexes_tokenize(args):
    raw = args.documents
    if not raw.lstrip().startswith(("[", "{")):       # a path, not JSON
        raw = Path(raw).read_text()
    res = _client(args).post(
        f"{_tbl_base(args)}/{args.table}/indexes/{args.name}/tokenize",
        {"documents": json.loads(raw)})
    if args.json:
        print_json(res)
        return
    rows = [[d["id"], d["n_tokens"], " ".join(d["tokens"])]
            for d in res["documents"]]
    print_table(["Doc", "Tokens", "Sequence"], rows)


def cmd_indexes_list(args):
    res = _client(args).get(f"{_tbl_base(args)}/{args.table}/indexes")
    if args.json:
        print_json(res)
        return
    rows = [[i["name"], i["kind"], i.get("label_column") or "-",
             i["n_vectors"], "stale" if i["stale"] else "fresh"]
            for i in res["indexes"]]
    print_table(["Name", "Kind", "Label", "Vectors", "State"], rows)


def cmd_indexes_info(args):
    # --recommend composes drift/imbalance/distortion into the
    # recommend_rebuild verdict (one codes x vectors join server-side)
    qs = "?recommend=1" if getattr(args, "recommend", False) else ""
    res = _client(args).get(
        f"{_tbl_base(args)}/{args.table}/indexes/{args.name}{qs}")
    print_json(res)


def cmd_indexes_search(args):
    raw = args.queries
    if not raw.lstrip().startswith(("[", "{")):       # a path, not JSON
        raw = Path(raw).read_text()
    queries = json.loads(raw)
    body = {"queries": queries, "k": args.k}
    if args.nprobe is not None:
        body["nprobe"] = args.nprobe
    if args.filter_labels:
        body["filter_labels"] = json.loads(args.filter_labels)
    res = _client(args).post(
        f"{_tbl_base(args)}/{args.table}/indexes/{args.name}/search", body)
    if args.json:
        print_json(res)
        return
    rows = [[r["query_id"], r["rank"], r["neighbor_id"],
             r.get("adist", r.get("dist"))] for r in res["results"]]
    print_table(["Query", "Rank", "Neighbor", "Distance"], rows)


def cmd_indexes_refresh(args):
    res = _client(args).post(
        f"{_tbl_base(args)}/{args.table}/indexes/{args.name}/refresh", {})
    (print_json(res) if args.json
     else print(f"Refreshed: +{res['added']} / -{res['deleted']} rows"))


def cmd_indexes_rebuild(args):
    # --if-recommended gates the re-train on the governance verdict
    # (rebuild_recommendation): no-op + the verdict back when sound
    res = _client(args).post(
        f"{_tbl_base(args)}/{args.table}/indexes/{args.name}/rebuild",
        {"if_recommended": bool(getattr(args, "if_recommended", False))})
    if args.json:
        print_json(res)
    elif res.get("rebuilt"):
        print(f"Rebuilt at {res['table_rows']} rows")
    else:
        print(f"Skipped: {res.get('reason')}")


def cmd_indexes_compact(args):
    res = _client(args).post(
        f"{_tbl_base(args)}/{args.table}/indexes/{args.name}/compact",
        {"max_files": args.max_files})
    print_json(res) if args.json else print(
        f"Compacted {len(res['compacted'])} posting lists")


def cmd_indexes_drop(args):
    res = _client(args).delete(
        f"{_tbl_base(args)}/{args.table}/indexes/{args.name}")
    print_json(res) if args.json else print(f"Dropped {res['dropped']}")


def cmd_tables_history(args):
    res = _client(args).get(f"{_tbl_base(args)}/{args.table}/history")
    if args.json:
        print_json(res)
        return
    rows = [[h["version"], h["op"], h.get("ts"),
             "shallow-clone" if "base" in h else "local"] for h in res]
    print_table(["Version", "Op", "Ts", "Data"], rows)


def cmd_tables_vacuum(args):
    res = _client(args).post(f"{_tbl_base(args)}/{args.table}/vacuum",
                             {"retain_last": args.retain_last})
    (print_json(res) if args.json
     else print(f"Vacuumed versions: {res['removed_versions'] or '-'}"))


def cmd_files_list(args):
    res = _client(args).get(f"/projects/{args.project}/files")
    if args.json:
        print_json(res)
        return
    rows = [[f["id"], f["name"], format_bytes(f.get("size_bytes", 0)),
             f.get("created_at", "-")] for f in res]
    print_table(["Id", "Name", "Size", "Created"], rows)


def cmd_files_upload(args):
    p = Path(args.file)
    if not p.exists():
        raise SystemExit(f"Error: file not found: {p}")
    rec = _client(args).upload_file_3stage(args.project, p)
    print_json(rec) if args.json else print(f"Uploaded as {rec['id']}")


def cmd_files_download(args):
    n = _client(args).download(
        f"/projects/{args.project}/files/{args.file_id}/download",
        Path(args.output))
    (print_json({"file_id": args.file_id, "bytes": n}) if args.json
     else print(f"Downloaded {n:,} bytes to {args.output}"))


def cmd_files_delete(args):
    res = _client(args).delete(f"/projects/{args.project}/files/{args.file_id}")
    print_json(res) if args.json else print(f"Deleted {args.file_id}")


def cmd_query(args):
    res = _client(args).post(f"/projects/{args.project}/query",
                             {"sql": args.sql})
    if args.json:
        print_json(res)
        return
    rows = res.get("rows", [])
    if not rows:
        print("(no rows)")
        return
    headers = list(rows[0].keys())
    print_table(headers, [[r.get(h) for h in headers] for r in rows])


# --------------------------------------------------------------------------
# argument parser
# --------------------------------------------------------------------------

def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="keboola-spark",
        description="CLI for the PySpark storage service")
    ap.add_argument("--json", "-j", action="store_true",
                    help="JSON output instead of tables")
    ap.add_argument("--url", help="service URL (overrides config/env)")
    ap.add_argument("--api-key", help="API key (overrides config/env)")
    sub = ap.add_subparsers(dest="group", required=True)

    g = sub.add_parser("config").add_subparsers(dest="cmd", required=True)
    s = g.add_parser("set")
    s.add_argument("key")
    s.add_argument("value")
    s.set_defaults(fn=cmd_config_set)
    g.add_parser("show").set_defaults(fn=cmd_config_show)

    g = sub.add_parser("projects").add_subparsers(dest="cmd", required=True)
    g.add_parser("list").set_defaults(fn=cmd_projects_list)
    s = g.add_parser("create")
    s.add_argument("project")
    s.set_defaults(fn=cmd_projects_create)
    s = g.add_parser("delete")
    s.add_argument("project")
    s.set_defaults(fn=cmd_projects_delete)

    g = sub.add_parser("buckets").add_subparsers(dest="cmd", required=True)
    for name, fn, extra in (("list", cmd_buckets_list, False),
                            ("create", cmd_buckets_create, True),
                            ("delete", cmd_buckets_delete, True)):
        s = g.add_parser(name)
        s.add_argument("project")
        if extra:
            s.add_argument("bucket")
        s.add_argument("--branch", "-b", default="default")
        if name == "delete":
            s.add_argument("--force", action="store_true")
        s.set_defaults(fn=fn)

    g = sub.add_parser("tables").add_subparsers(dest="cmd", required=True)

    def table_parser(name, fn, with_table=True):
        s = g.add_parser(name)
        s.add_argument("project")
        s.add_argument("bucket")
        if with_table:
            s.add_argument("table")
        s.add_argument("--branch", "-b", default="default")
        s.set_defaults(fn=fn)
        return s

    s = table_parser("create", cmd_tables_create)
    s.add_argument("--columns", "-c",
                   help='columns JSON: [{"name":…,"type":…}]')
    s.add_argument("--from-csv", "-f", help="infer schema from a CSV file")
    s.add_argument("--pk", "-p", help="primary key columns, comma-separated")
    table_parser("list", cmd_tables_list, with_table=False)
    s = table_parser("preview", cmd_tables_preview)
    s.add_argument("--limit", type=int, default=10)
    s.add_argument("--columns", help="comma-separated projection")
    s.add_argument("--where")
    s.add_argument("--order-by")
    s.add_argument("--version", type=int,
                   help="time-travel to a commit (versioned tables)")
    s = table_parser("import", cmd_tables_import)
    s.add_argument("file")
    s.add_argument("--format", default="csv",
                   choices=["csv", "parquet", "arrow"])
    s.add_argument("--incremental", action="store_true")
    s.add_argument("--string-table", action="store_true",
                   help="STRING_TABLE strategy: every column as VARCHAR")
    s.add_argument("--create-mode", choices=["create", "replace"],
                   help="create the table from the file schema / replace it")
    s.add_argument("--null-value", action="append",
                   help="literal imported as NULL (repeatable)")
    s = table_parser("export", cmd_tables_export)
    s.add_argument("output")
    s.add_argument("--format", default="csv", choices=["csv", "parquet"])
    s.add_argument("--where")
    s.add_argument("--columns")
    s = table_parser("profile", cmd_tables_profile)
    s.add_argument("--approx", action="store_true",
                   help="sketch-backed distinct counts (HLL; the scale "
                        "mode — exact is the default)")
    table_parser("delete", cmd_tables_delete)
    table_parser("history", cmd_tables_history)
    s = table_parser("vacuum", cmd_tables_vacuum)
    s.add_argument("--retain-last", type=int, default=1)

    s = table_parser("optimize", cmd_tables_optimize)
    s.add_argument("--partition-by", help="comma-separated hive partition columns")
    s.add_argument("--cluster-by", help="comma-separated sort-cluster columns")
    s.add_argument("--bloom-filter", help="comma-separated bloom-filter columns")
    s.add_argument("--target-files", type=int)

    g = sub.add_parser("indexes").add_subparsers(dest="cmd", required=True)

    def index_parser(name, fn, with_name=True):
        s = g.add_parser(name)
        s.add_argument("project")
        s.add_argument("bucket")
        s.add_argument("table")
        if with_name:
            s.add_argument("name")
        s.add_argument("--branch", "-b", default="default")
        s.set_defaults(fn=fn)
        return s

    s = index_parser("create", cmd_indexes_create)
    s.add_argument("--id-column",
                   help="row id column (required for every kind except "
                        "bpe — a tokenizer trains on text alone)")
    s.add_argument("--vector-column")
    s.add_argument("--text-column",
                   help="text column for kind=minhash/bpe")
    s.add_argument("--kind", default="pq",
                   choices=["pq", "sq8", "minhash", "semdedup", "bpe"])
    s.add_argument("--label-column",
                   help="IVF label column (pq only): posting lists as "
                        "parquet partitions, nprobe routing at search")
    s.add_argument("--m", type=int, default=4)
    s.add_argument("--ksub", type=int, default=8)
    s.add_argument("--dim", type=int, default=64)
    s.add_argument("--n-clusters", type=int, default=4,
                   help="semdedup: k-means blocking clusters")
    s.add_argument("--rounds", type=int, default=2,
                   help="semdedup: fixed Lloyd rounds")
    s.add_argument("--threshold", type=float, default=0.9,
                   help="semdedup: frozen cosine keep-first threshold")
    index_parser("list", cmd_indexes_list, with_name=False)
    s = index_parser("info", cmd_indexes_info)
    s.add_argument("--recommend", action="store_true",
                   help="include the composed re-train verdict "
                        "(imbalance + drift + distortion)")
    s = index_parser("search", cmd_indexes_search)
    s.add_argument("--queries", required=True,
                   help="JSON file or inline JSON: "
                        '[{"id": ..., "vector": [...]}, ...]')
    s.add_argument("--k", type=int, default=5)
    s.add_argument("--nprobe", type=int)
    s.add_argument("--filter-labels", help="JSON list of allowed labels")
    s = index_parser("tokenize", cmd_indexes_tokenize)
    s.add_argument("--documents", required=True,
                   help="JSON file or inline JSON: "
                        '[{"id": ..., "text": "..."}, ...]')
    s = index_parser("dedup", cmd_indexes_dedup)
    s.add_argument("--documents", required=True,
                   help="JSON file or inline JSON: "
                        '[{"id": ..., "text": "..."}, ...]')
    s.add_argument("--threshold", type=float, default=None,
                   help="minhash Jaccard cutoff (default 0.8); omit "
                        "for semdedup — its threshold froze at build")
    index_parser("refresh", cmd_indexes_refresh)
    s = index_parser("rebuild", cmd_indexes_rebuild)
    s.add_argument("--if-recommended", action="store_true",
                   dest="if_recommended",
                   help="re-train only when rebuild_recommendation "
                        "says the quantizer went stale; otherwise no-op")
    s = index_parser("compact", cmd_indexes_compact)
    s.add_argument("--max-files", type=int, default=4)
    index_parser("drop", cmd_indexes_drop)

    g = sub.add_parser("files").add_subparsers(dest="cmd", required=True)
    s = g.add_parser("list")
    s.add_argument("project")
    s.set_defaults(fn=cmd_files_list)
    s = g.add_parser("upload")
    s.add_argument("project")
    s.add_argument("file")
    s.set_defaults(fn=cmd_files_upload)
    s = g.add_parser("download")
    s.add_argument("project")
    s.add_argument("file_id")
    s.add_argument("output")
    s.set_defaults(fn=cmd_files_download)
    s = g.add_parser("delete")
    s.add_argument("project")
    s.add_argument("file_id")
    s.set_defaults(fn=cmd_files_delete)

    s = sub.add_parser("query")
    s.add_argument("project")
    s.add_argument("sql")
    s.set_defaults(fn=cmd_query)

    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        args.fn(args)
        return 0
    except APIError as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
