"""Versioned-Parquet backend: commit log + optimistic concurrency + time
travel on top of plain Parquet directories.

The reference lists a transactional-format backend as the structural
answer to concurrent upsert/delete (its DuckDB files get this from the
database itself; Delta/Iceberg would be the Spark-native equivalent —
no Delta jars ship in this environment, so the commit-log protocol those
formats use is implemented directly):

  * every write lands in a fresh immutable data directory
    ``v{version:08d}-{uuid}`` under the table dir — readers of older
    versions are never disturbed (snapshot isolation);
  * a commit is the ATOMIC creation of ``_log/{version:08d}.json`` with
    ``O_CREAT | O_EXCL`` — the filesystem arbitrates racing writers, the
    loser gets :class:`CommitConflictError` (optimistic concurrency, the
    same protocol Delta's ``_delta_log`` uses on a filesystem);
  * reads resolve the latest log entry (or any pinned ``version`` — time
    travel), so a crashed writer leaves only an unreferenced staging dir,
    never a half-visible table;
  * ``vacuum`` deletes data dirs of versions older than a retention
    count, mirroring Delta's VACUUM.

Scale: the log is one tiny JSON per commit (listing it is O(versions),
independent of data size); data dirs are ordinary Parquet so every scan
optimization (pushdown, pruning, partitioned layout) applies unchanged.

Reference parity anchors: concurrent-import serialization
(duckdb-api-service/src/database.py:37-165 table locks) and the staged
.duckdb-then-move import atomicity (src/routers/table_import.py:286-361);
this backend upgrades both to multi-process safety.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from ..catalog.catalog import CatalogError, NotFoundError

LOG_DIR = "_log"


class CommitConflictError(CatalogError):
    """Another writer committed this version first (optimistic-concurrency
    loser). Retry: re-read the table, re-apply the transform, re-commit."""


class VersionLog:
    """The per-table commit log. All state lives in the filesystem; there
    is no in-memory cache, so any number of processes can cooperate."""

    def __init__(self, table_dir: str) -> None:
        self.table_dir = table_dir
        self.log_dir = os.path.join(table_dir, LOG_DIR)

    # ------------------------------------------------------------- reads
    def versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        out = []
        for name in os.listdir(self.log_dir):
            if name.endswith(".json"):
                try:
                    out.append(int(name[:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def latest_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else 0

    def entry(self, version: int) -> dict:
        path = os.path.join(self.log_dir, f"{version:08d}.json")
        if not os.path.isfile(path):
            raise NotFoundError(f"version {version} not in commit log")
        with open(path) as f:
            return json.load(f)

    def data_dir(self, version: int | None = None) -> str | None:
        """Data dir of ``version`` (default latest); None when the log is
        empty (freshly created table — caller falls back to the plain
        empty dir)."""
        if version is None:
            version = self.latest_version()
        if version == 0:
            return None
        e = self.entry(version)
        # shallow-cloned entries (branch CoW) reference the source table's
        # data dir via "base" — zero-copy, like Delta's shallow clone
        d = os.path.join(e.get("base", self.table_dir), e["data"])
        if not os.path.isdir(d):
            raise NotFoundError(
                f"version {version} data was vacuumed (retained log entry "
                f"records op={e['op']!r} at ts={e['ts']})")
        return d

    def history(self) -> list[dict]:
        return [self.entry(v) for v in self.versions()]

    # ------------------------------------------------------------ writes
    def staging_dir(self) -> str:
        """Where a writer stages the next version's Parquet before
        committing. Unreferenced until the log entry lands."""
        return os.path.join(self.table_dir, f"stage-{uuid.uuid4().hex}")

    def commit(self, staged: str, op: str, version: int | None = None,
               **details) -> int:
        """Publish ``staged`` as version ``version`` (the writer's
        read-snapshot version + 1 — pass it so a commit that raced a
        concurrent writer FAILS instead of silently stacking on top of a
        state it never read; default re-reads latest for callers that hold
        an external serialization lock). Atomic via O_EXCL on the log
        file — the loser raises CommitConflictError and its staged dir is
        cleaned up."""
        os.makedirs(self.log_dir, exist_ok=True)
        if version is None:
            version = self.latest_version() + 1
        final = os.path.join(self.table_dir,
                             f"v{version:08d}-{uuid.uuid4().hex[:8]}")
        os.rename(staged, final)
        path = os.path.join(self.log_dir, f"{version:08d}.json")
        entry = {"version": version, "data": os.path.basename(final),
                 "op": op, "ts": time.time(), **details}
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            shutil.rmtree(final, ignore_errors=True)
            raise CommitConflictError(
                f"version {version} was committed concurrently "
                f"(op={op!r} lost the race); re-read and retry")
        with os.fdopen(fd, "w") as f:
            json.dump(entry, f)
        return version

    def vacuum(self, retain_last: int = 1) -> list[int]:
        """Delete data dirs of all but the last ``retain_last`` versions
        (log entries are kept — history stays auditable, the data is
        gone). Returns the vacuumed version numbers."""
        if retain_last < 1:
            raise CatalogError("retain_last must be >= 1")
        vs = self.versions()
        victims = vs[:-retain_last] if retain_last < len(vs) else []
        removed = []
        for v in victims:
            e = self.entry(v)
            if "base" in e:
                continue  # shallow-cloned data belongs to the source table
            d = os.path.join(self.table_dir, e["data"])
            if os.path.isdir(d):
                shutil.rmtree(d, ignore_errors=True)
                removed.append(v)
        return removed

    def shallow_clone_into(self, dst_table_dir: str) -> int:
        """Copy the commit LOG (not the data) into another table dir: every
        entry gains ``base`` = this table dir (entries that are themselves
        clones keep their original base, so clone chains stay one hop).
        The clone time-travels through the full source history at zero
        data cost; new commits in the clone land locally on top. Same
        caveat as Delta shallow clones: vacuuming the SOURCE removes data
        the clone's old versions reference (its local commits are safe).
        Returns the number of versions cloned."""
        dst = VersionLog(dst_table_dir)
        os.makedirs(dst.log_dir, exist_ok=True)
        for v in self.versions():
            e = dict(self.entry(v))
            e.setdefault("base", self.table_dir)
            path = os.path.join(dst.log_dir, f"{v:08d}.json")
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                json.dump(e, f)
        return len(self.versions())
