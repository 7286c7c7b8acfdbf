"""Storage catalog: projects → buckets → tables on a warehouse directory.

Mirrors the reference's filesystem-is-the-catalog design (ADR-009): a table
exists iff its directory exists (reference src/database.py:4564-4583), a
bucket listing is a directory glob (src/database.py:4533-4562), and only
control-plane state lives elsewhere. Layout:

    warehouse/
      project_{id}/                       (reference src/database.py:2820-2822)
        {bucket}/                         (src/database.py:2824-2826)
          {table}/
            _meta.json                    schema (DuckDB type strings), PK, flags
            data/part-*.parquet           the rows (Spark-written parquet)
      project_{id}_branch_{bid}/          branch CoW copies (src/database.py:2848-2862)
      _workspaces/{workspace}/            per-workspace tables (src/database.py:3591-3630)
      _snapshots/{project}/{bucket}/{table}/{snapshot_id}.parquet + .schema.json

The reference keeps one .duckdb file per table; our unit is one parquet
*directory* per table so a 100 TB table is thousands of distributed files —
same catalog semantics, cluster-scale physical layout.

Writes go through a staging dir + swap (the reference's `_staging/{uuid}`
then move discipline, CLAUDE.md:237) under a per-table lock
(TableLockManager port, src/database.py:37-165).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import threading
import time
import uuid
from contextlib import contextmanager
from dataclasses import dataclass, field

_NAME_RE = re.compile(r"^[A-Za-z0-9_][A-Za-z0-9_.-]*$")


class CatalogError(Exception):
    pass


class NotFoundError(CatalogError):
    pass


class AlreadyExistsError(CatalogError):
    pass


def _check_name(name: str, kind: str) -> str:
    if not _NAME_RE.match(name or ""):
        raise CatalogError(f"invalid {kind} name: {name!r}")
    return name


class TableLockManager:
    """Per-table write mutex keyed project/bucket/table — a direct port of
    the reference's lock manager (src/database.py:37-165). Spark writes on
    plain parquet aren't transactional; the service layer serializes
    writers per table exactly like the reference's single-writer model."""

    def __init__(self) -> None:
        self._locks: dict[str, threading.Lock] = {}
        self._guard = threading.Lock()
        self.wait_seconds: float = 0.0

    def lock(self, project: str, bucket: str, table: str) -> threading.Lock:
        key = f"{project}/{bucket}/{table}"
        with self._guard:
            if key not in self._locks:
                self._locks[key] = threading.Lock()
            return self._locks[key]

    def acquire(self, project: str, bucket: str, table: str):
        lk = self.lock(project, bucket, table)
        t0 = time.perf_counter()
        lk.acquire()
        self.wait_seconds += time.perf_counter() - t0
        return lk


@dataclass
class TableMeta:
    columns: list[dict]                  # {"name","type","nullable","default"}
    primary_key: list[str] = field(default_factory=list)
    created_at: float = 0.0
    properties: dict = field(default_factory=dict)

    def to_json(self) -> dict:
        return {"columns": self.columns, "primary_key": self.primary_key,
                "created_at": self.created_at, "properties": self.properties}

    @classmethod
    def from_json(cls, d: dict) -> "TableMeta":
        return cls(columns=d["columns"], primary_key=d.get("primary_key", []),
                   created_at=d.get("created_at", 0.0),
                   properties=d.get("properties", {}))


class StorageCatalog:
    """Path resolution + metadata CRUD. No Spark dependency — pure control
    plane, like the reference's path helpers (src/database.py:3042-3080)."""

    def __init__(self, warehouse: str) -> None:
        self.warehouse = os.path.abspath(warehouse)
        os.makedirs(self.warehouse, exist_ok=True)
        self.locks = TableLockManager()

    @contextmanager
    def acquire(self, project: str, bucket: str, table: str):
        """Hold the per-table write lock for the duration of a write."""
        lk = self.locks.acquire(project, bucket, table)
        try:
            yield
        finally:
            lk.release()

    # -- path helpers -------------------------------------------------------
    def project_dir(self, project: str, branch: str | None = None) -> str:
        _check_name(project, "project")
        name = f"project_{project}"
        if branch is not None:
            _check_name(branch, "branch")
            name = f"project_{project}_branch_{branch}"
        return os.path.join(self.warehouse, name)

    def bucket_dir(self, project: str, bucket: str, branch: str | None = None) -> str:
        return os.path.join(self.project_dir(project, branch),
                            _check_name(bucket, "bucket"))

    def table_dir(self, project: str, bucket: str, table: str,
                  branch: str | None = None) -> str:
        return os.path.join(self.bucket_dir(project, bucket, branch),
                            _check_name(table, "table"))

    def data_dir(self, project: str, bucket: str, table: str,
                 branch: str | None = None) -> str:
        return os.path.join(self.table_dir(project, bucket, table, branch), "data")

    def workspace_dir(self, workspace: str) -> str:
        return os.path.join(self.warehouse, "_workspaces",
                            _check_name(workspace, "workspace"))

    def snapshot_dir(self, project: str, bucket: str, table: str) -> str:
        return os.path.join(self.warehouse, "_snapshots",
                            f"project_{project}", bucket, table)

    # -- project / bucket CRUD ---------------------------------------------
    def create_project(self, project: str) -> None:
        d = self.project_dir(project)
        if os.path.exists(d):
            raise AlreadyExistsError(f"project {project} exists")
        os.makedirs(d)

    def drop_project(self, project: str) -> None:
        d = self.project_dir(project)
        if not os.path.isdir(d):
            raise NotFoundError(f"project {project} not found")
        shutil.rmtree(d)
        # drop branches of the project too
        for entry in os.listdir(self.warehouse):
            if entry.startswith(f"project_{project}_branch_"):
                shutil.rmtree(os.path.join(self.warehouse, entry))

    def list_projects(self) -> list[str]:
        out = []
        for entry in sorted(os.listdir(self.warehouse)):
            m = re.match(r"^project_([A-Za-z0-9_.-]+?)(_branch_.+)?$", entry)
            if m and not m.group(2):
                out.append(m.group(1))
        return out

    def create_bucket(self, project: str, bucket: str) -> None:
        if not os.path.isdir(self.project_dir(project)):
            raise NotFoundError(f"project {project} not found")
        d = self.bucket_dir(project, bucket)
        if os.path.exists(d):
            raise AlreadyExistsError(f"bucket {bucket} exists")
        os.makedirs(d)

    def drop_bucket(self, project: str, bucket: str, force: bool = False) -> None:
        d = self.bucket_dir(project, bucket)
        if not os.path.isdir(d):
            raise NotFoundError(f"bucket {bucket} not found")
        if not force and self.list_tables(project, bucket):
            raise CatalogError(f"bucket {bucket} is not empty")
        shutil.rmtree(d)

    def list_buckets(self, project: str) -> list[str]:
        d = self.project_dir(project)
        if not os.path.isdir(d):
            raise NotFoundError(f"project {project} not found")
        return sorted(e for e in os.listdir(d)
                      if os.path.isdir(os.path.join(d, e)) and not e.startswith("_"))

    # -- table metadata -----------------------------------------------------
    def table_exists(self, project: str, bucket: str, table: str,
                     branch: str | None = None) -> bool:
        return os.path.isfile(os.path.join(
            self.table_dir(project, bucket, table, branch), "_meta.json"))

    def list_tables(self, project: str, bucket: str,
                    branch: str | None = None) -> list[str]:
        d = self.bucket_dir(project, bucket, branch)
        if not os.path.isdir(d):
            if branch is not None:
                return []
            raise NotFoundError(f"bucket {bucket} not found")
        return sorted(e for e in os.listdir(d)
                      if os.path.isfile(os.path.join(d, e, "_meta.json")))

    def write_meta(self, project: str, bucket: str, table: str, meta: TableMeta,
                   branch: str | None = None) -> None:
        td = self.table_dir(project, bucket, table, branch)
        os.makedirs(td, exist_ok=True)
        tmp = os.path.join(td, f"_meta.json.tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(meta.to_json(), f, indent=2)
        os.replace(tmp, os.path.join(td, "_meta.json"))

    def read_meta(self, project: str, bucket: str, table: str,
                  branch: str | None = None) -> TableMeta:
        p = os.path.join(self.table_dir(project, bucket, table, branch), "_meta.json")
        if not os.path.isfile(p):
            raise NotFoundError(f"table {project}/{bucket}/{table}"
                                + (f"@{branch}" if branch else "") + " not found")
        with open(p) as f:
            return TableMeta.from_json(json.load(f))

    def drop_table(self, project: str, bucket: str, table: str,
                   branch: str | None = None) -> None:
        td = self.table_dir(project, bucket, table, branch)
        if not os.path.isfile(os.path.join(td, "_meta.json")):
            raise NotFoundError(f"table {table} not found")
        shutil.rmtree(td)

    # -- staged data-dir swap (the reference's _staging discipline) ---------
    def staging_data_dir(self, project: str, bucket: str, table: str,
                         branch: str | None = None) -> str:
        return os.path.join(self.table_dir(project, bucket, table, branch),
                            f"data.tmp-{uuid.uuid4().hex}")

    def swap_data_dir(self, project: str, bucket: str, table: str,
                      staged: str, branch: str | None = None) -> None:
        """Replace the live data dir with a staged one. Non-atomic across
        both renames, but serialized by the per-table lock (single-writer,
        same guarantee level as the reference's file swap)."""
        live = self.data_dir(project, bucket, table, branch)
        trash = live + f".old-{uuid.uuid4().hex}"
        if os.path.isdir(live):
            os.rename(live, trash)
        os.rename(staged, live)
        if os.path.isdir(trash):
            shutil.rmtree(trash, ignore_errors=True)

    # -- branch resolution (src/database.py:3082-3133) ----------------------
    def resolve_table(self, project: str, bucket: str, table: str,
                      branch: str | None) -> tuple[str, str]:
        """Return (source, data_dir): branch copy if it exists, else main.
        source ∈ {'main', 'branch'} — the reference's source resolution."""
        if branch is not None and self.table_exists(project, bucket, table, branch):
            return "branch", self.data_dir(project, bucket, table, branch)
        if self.table_exists(project, bucket, table):
            return "main", self.data_dir(project, bucket, table)
        raise NotFoundError(f"table {project}/{bucket}/{table} not found")
