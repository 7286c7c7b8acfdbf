"""File staging store: the reference's 3-stage upload workflow.

Re-expresses ``src/routers/files.py:98-360`` + the file records in
``src/database.py:1565-1800``:

  1. PREPARE  — mint an upload key + URL; session expires after 24 h
  2. UPLOAD   — stream bytes to ``staging/`` computing sha256/md5 with a
                hard size cap (reference MAX_FILE_SIZE 10 GB)
  3. REGISTER — move staging → permanent, write the file record

Sessions and records are JSON files under ``<warehouse>/_files/<project>/``
so they survive process restarts (the reference keeps records in its
metadata DB; sessions in memory — we persist both, strictly more durable).
All paths stay inside the per-project files dir; ids are uuid4 hex.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid

STAGING_TTL_SECONDS = 24 * 3600           # reference STAGING_TTL_HOURS = 24
MAX_FILE_SIZE_BYTES = 10 * 1024**3        # reference 10 GB cap
_CHUNK = 1 << 20


class FileStoreError(Exception):
    def __init__(self, code: str, message: str, status: int = 400,
                 details: dict | None = None) -> None:
        super().__init__(message)
        self.code = code
        self.message = message
        self.status = status
        self.details = details or {}


class FileStore:
    def __init__(self, root: str,
                 max_size_bytes: int = MAX_FILE_SIZE_BYTES,
                 ttl_seconds: float = STAGING_TTL_SECONDS) -> None:
        self.root = os.path.abspath(root)
        self.max_size = max_size_bytes
        self.ttl = ttl_seconds

    # -- validation ------------------------------------------------------------
    @staticmethod
    def _check_component(value: str, what: str) -> str:
        """Reject path-traversal in any value joined into a store path.
        The reference gates every route on project existence before building
        paths (src/routers/files.py:98-150); with a filesystem-backed store
        the equivalent invariant is: no component may escape its directory."""
        if (not value or "/" in value or "\\" in value or ".." in value
                or value in (".",) or value.startswith("~")):
            raise FileStoreError(f"invalid_{what}",
                                 f"invalid {what} {value!r}", status=400)
        return value

    # -- paths ---------------------------------------------------------------
    def _project_dir(self, project: str) -> str:
        self._check_component(project, "project")
        return os.path.join(self.root, project)

    def _staging_dir(self, project: str) -> str:
        return os.path.join(self._project_dir(project), "staging")

    def _permanent_dir(self, project: str) -> str:
        return os.path.join(self._project_dir(project), "permanent")

    def _sessions_dir(self, project: str) -> str:
        return os.path.join(self._project_dir(project), "sessions")

    def _records_dir(self, project: str) -> str:
        return os.path.join(self._project_dir(project), "records")

    def _session_path(self, project: str, upload_key: str) -> str:
        return os.path.join(self._sessions_dir(project), upload_key + ".json")

    def _record_path(self, project: str, file_id: str) -> str:
        return os.path.join(self._records_dir(project), file_id + ".json")

    @staticmethod
    def _write_json(path: str, data: dict) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(data, f)
        os.replace(tmp, path)

    # -- stage 1: prepare ------------------------------------------------------
    def prepare(self, project: str, filename: str,
                content_type: str | None = None,
                size_bytes: int | None = None,
                tags: dict | None = None) -> dict:
        if size_bytes and size_bytes > self.max_size:
            raise FileStoreError(
                "file_too_large",
                f"File size exceeds maximum of {self.max_size} bytes",
                status=400,
                details={"max_size_bytes": self.max_size,
                         "requested_size_bytes": size_bytes})
        self._check_component(filename, "filename")
        upload_key = uuid.uuid4().hex
        session = {
            "project_id": project,
            "filename": filename,
            "content_type": content_type,
            "expected_size": size_bytes,
            "tags": tags or {},
            "created_at": time.time(),
            "expires_at": time.time() + self.ttl,
        }
        self._write_json(self._session_path(project, upload_key), session)
        return {
            "upload_key": upload_key,
            "upload_url": f"/projects/{project}/files/upload/{upload_key}",
            "expires_at": session["expires_at"],
        }

    def _load_session(self, project: str, upload_key: str) -> dict:
        path = self._session_path(project, upload_key)
        if not os.path.isfile(path):
            raise FileStoreError("upload_session_not_found",
                                 "Upload session not found or expired",
                                 status=404, details={"upload_key": upload_key})
        with open(path) as f:
            session = json.load(f)
        if session["project_id"] != project:
            raise FileStoreError("upload_session_mismatch",
                                 "Upload session does not belong to this project",
                                 status=403, details={"upload_key": upload_key})
        if time.time() > session["expires_at"]:
            os.remove(path)
            raise FileStoreError("upload_session_expired",
                                 "Upload session has expired", status=410,
                                 details={"upload_key": upload_key})
        return session

    # -- stage 2: upload -------------------------------------------------------
    def upload(self, project: str, upload_key: str, stream) -> dict:
        """Stream ``stream`` (any object with .read(n)) into staging,
        computing sha256 + md5 and enforcing the size cap as we go."""
        session = self._load_session(project, upload_key)
        os.makedirs(self._staging_dir(project), exist_ok=True)
        staging_name = f"{upload_key}_{session['filename']}"
        staging_path = os.path.join(self._staging_dir(project), staging_name)
        size = 0
        sha256 = hashlib.sha256()
        md5 = hashlib.md5()
        try:
            with open(staging_path, "wb") as out:
                while True:
                    chunk = stream.read(_CHUNK)
                    if not chunk:
                        break
                    size += len(chunk)
                    if size > self.max_size:
                        raise FileStoreError(
                            "file_too_large",
                            f"File exceeds maximum size of {self.max_size} bytes",
                            status=413,
                            details={"max_size_bytes": self.max_size})
                    sha256.update(chunk)
                    md5.update(chunk)
                    out.write(chunk)
        except BaseException:
            # any failure (size cap, stream read error, disk full) must not
            # leave partial staged bytes behind — reference cleans
            # staging_path on any exception
            if os.path.exists(staging_path):
                os.remove(staging_path)
            raise
        session.update({
            "staging_path": staging_path,
            "size_bytes": size,
            "checksum_sha256": sha256.hexdigest(),
            "checksum_md5": md5.hexdigest(),
            "uploaded_at": time.time(),
        })
        self._write_json(self._session_path(project, upload_key), session)
        return {
            "upload_key": upload_key,
            "staging_path": f"staging/{staging_name}",
            "size_bytes": size,
            "checksum_sha256": session["checksum_sha256"],
            "checksum_md5": session["checksum_md5"],
        }

    # -- stage 3: register -----------------------------------------------------
    def register(self, project: str, upload_key: str,
                 name: str | None = None, tags: dict | None = None,
                 expected_sha256: str | None = None) -> dict:
        session = self._load_session(project, upload_key)
        if "staging_path" not in session:
            raise FileStoreError("file_not_uploaded",
                                 "File has not been uploaded yet", status=400,
                                 details={"upload_key": upload_key})
        staging_path = session["staging_path"]
        if not os.path.isfile(staging_path):
            os.remove(self._session_path(project, upload_key))
            raise FileStoreError("staged_file_not_found",
                                 "Staged file not found (may have been cleaned up)",
                                 status=404, details={"upload_key": upload_key})
        if expected_sha256 and expected_sha256 != session["checksum_sha256"]:
            raise FileStoreError(
                "checksum_mismatch",
                "Uploaded file checksum does not match expected_sha256",
                status=400,
                details={"expected": expected_sha256,
                         "actual": session["checksum_sha256"]})
        final_name = self._check_component(name or session["filename"],
                                           "filename")
        file_id = uuid.uuid4().hex
        os.makedirs(self._permanent_dir(project), exist_ok=True)
        permanent_path = os.path.join(self._permanent_dir(project),
                                      f"{file_id}_{final_name}")
        shutil.move(staging_path, permanent_path)
        record = {
            "id": file_id,
            "project_id": project,
            "name": final_name,
            "path": os.path.relpath(permanent_path, self.root),
            "size_bytes": session["size_bytes"],
            "content_type": session.get("content_type"),
            "checksum_sha256": session["checksum_sha256"],
            "checksum_md5": session["checksum_md5"],
            "is_staged": False,
            "created_at": time.time(),
            "expires_at": None,
            "tags": {**(session.get("tags") or {}), **(tags or {})},
        }
        self._write_json(self._record_path(project, file_id), record)
        os.remove(self._session_path(project, upload_key))
        return record

    # -- convenience: one-shot local register (export sink integration) -------
    def register_local(self, project: str, src_path: str, name: str,
                       content_type: str | None = None,
                       tags: dict | None = None) -> dict:
        """Adopt an already-written local file (e.g. an export) as a
        permanent record — the reference's export path writes straight into
        the files area and records it (src/routers/table_import.py:560-629)."""
        self._check_component(name, "filename")
        file_id = uuid.uuid4().hex
        os.makedirs(self._permanent_dir(project), exist_ok=True)
        permanent_path = os.path.join(self._permanent_dir(project),
                                      f"{file_id}_{name}")
        sha256 = hashlib.sha256()
        md5 = hashlib.md5()
        size = 0
        with open(src_path, "rb") as f:
            while True:
                chunk = f.read(_CHUNK)
                if not chunk:
                    break
                size += len(chunk)
                sha256.update(chunk)
                md5.update(chunk)
        shutil.move(src_path, permanent_path)
        record = {
            "id": file_id, "project_id": project, "name": name,
            "path": os.path.relpath(permanent_path, self.root),
            "size_bytes": size, "content_type": content_type,
            "checksum_sha256": sha256.hexdigest(),
            "checksum_md5": md5.hexdigest(),
            "is_staged": False, "created_at": time.time(),
            "expires_at": None, "tags": tags or {},
        }
        self._write_json(self._record_path(project, file_id), record)
        return record

    # -- records ---------------------------------------------------------------
    def get(self, project: str, file_id: str) -> dict:
        path = self._record_path(project, file_id)
        if not os.path.isfile(path):
            raise FileStoreError("file_not_found", f"File {file_id} not found",
                                 status=404, details={"file_id": file_id})
        with open(path) as f:
            return json.load(f)

    def local_path(self, project: str, file_id: str) -> str:
        rec = self.get(project, file_id)
        return os.path.join(self.root, rec["path"])

    def list(self, project: str) -> list[dict]:
        d = self._records_dir(project)
        if not os.path.isdir(d):
            return []
        out = []
        for entry in sorted(os.listdir(d)):
            if entry.endswith(".json"):
                with open(os.path.join(d, entry)) as f:
                    out.append(json.load(f))
        out.sort(key=lambda r: (r["created_at"], r["id"]))
        return out

    def delete(self, project: str, file_id: str) -> None:
        rec = self.get(project, file_id)
        target = os.path.join(self.root, rec["path"])
        if os.path.isfile(target):
            os.remove(target)
        os.remove(self._record_path(project, file_id))

    # -- TTL cleanup -------------------------------------------------------------
    def cleanup_expired(self, project: str) -> list[str]:
        """Drop expired upload sessions + their staged bytes (the
        reference's staging TTL sweep)."""
        dropped = []
        sd = self._sessions_dir(project)
        if not os.path.isdir(sd):
            return dropped
        now = time.time()
        for entry in os.listdir(sd):
            if not entry.endswith(".json"):
                continue
            path = os.path.join(sd, entry)
            try:
                with open(path) as f:
                    session = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue
            if now > session.get("expires_at", 0):
                staged = session.get("staging_path")
                if staged and os.path.isfile(staged):
                    os.remove(staged)
                os.remove(path)
                dropped.append(entry[:-5])
        return dropped
