"""FileStore (service/files.py) — 3-stage staging workflow + engine wiring.

Mirrors the reference files API tests: prepare→upload→register happy path,
session expiry (410), size cap (413), checksum mismatch, path-traversal
rejection, TTL sweep, and the primary ingest flow: import a table FROM a
registered file id (reference src/routers/table_import.py:286-361)."""

import io
import os

import pytest

from keboola_storage_duckdb_spark.engine import StorageEngine
from keboola_storage_duckdb_spark.service.files import FileStore, FileStoreError

CSV = """id,name,email,age
1,Alice,alice@example.com,30
2,Bob,bob@example.com,25
3,Carol,,40
"""

USERS_COLUMNS = [
    {"name": "id", "type": "INTEGER", "nullable": False},
    {"name": "name", "type": "VARCHAR", "nullable": True},
    {"name": "email", "type": "VARCHAR", "nullable": True},
    {"name": "age", "type": "INTEGER", "nullable": True},
]


@pytest.fixture()
def store(tmp_path):
    return FileStore(str(tmp_path / "files"))


def _upload_bytes(store, project, data: bytes, filename="data.csv", **reg):
    prep = store.prepare(project, filename, content_type="text/csv",
                         size_bytes=len(data))
    up = store.upload(project, prep["upload_key"], io.BytesIO(data))
    rec = store.register(project, prep["upload_key"], **reg)
    return prep, up, rec


def test_three_stage_happy_path(store, tmp_path):
    data = CSV.encode()
    prep, up, rec = _upload_bytes(store, "p1", data, tags={"source": "test"})
    assert up["size_bytes"] == len(data)
    import hashlib
    assert up["checksum_sha256"] == hashlib.sha256(data).hexdigest()
    assert up["checksum_md5"] == hashlib.md5(data).hexdigest()
    # register moved staging → permanent and dropped the session
    local = store.local_path("p1", rec["id"])
    assert os.path.isfile(local)
    assert open(local).read() == CSV
    assert "staging" not in local
    with pytest.raises(FileStoreError) as e:
        store.upload("p1", prep["upload_key"], io.BytesIO(b"x"))
    assert e.value.status == 404  # session consumed
    # record listing + get
    assert [r["id"] for r in store.list("p1")] == [rec["id"]]
    assert store.get("p1", rec["id"])["tags"] == {"source": "test"}
    # delete removes bytes + record
    store.delete("p1", rec["id"])
    assert not os.path.exists(local)
    assert store.list("p1") == []


def test_expired_session_is_410(store):
    store.ttl = -1  # everything born expired
    prep = store.prepare("p1", "late.csv")
    with pytest.raises(FileStoreError) as e:
        store.upload("p1", prep["upload_key"], io.BytesIO(b"zz"))
    assert e.value.status == 410
    # the expired session file was dropped on access
    with pytest.raises(FileStoreError) as e2:
        store.upload("p1", prep["upload_key"], io.BytesIO(b"zz"))
    assert e2.value.status == 404


def test_size_cap_rejects_and_cleans_staging(store):
    store.max_size = 10
    prep = store.prepare("p1", "big.csv")  # undeclared size → caught mid-stream
    with pytest.raises(FileStoreError) as e:
        store.upload("p1", prep["upload_key"], io.BytesIO(b"x" * 11))
    assert e.value.status == 413
    assert os.listdir(os.path.join(store.root, "p1", "staging")) == []
    # prepare-time declared-size rejection too
    with pytest.raises(FileStoreError):
        store.prepare("p1", "big.csv", size_bytes=11)


def test_stream_error_cleans_staging(store):
    class Boom:
        def read(self, n):
            raise OSError("disk gone")

    prep = store.prepare("p1", "boom.csv")
    with pytest.raises(OSError):
        store.upload("p1", prep["upload_key"], Boom())
    assert os.listdir(os.path.join(store.root, "p1", "staging")) == []


def test_checksum_mismatch(store):
    prep = store.prepare("p1", "sum.csv")
    store.upload("p1", prep["upload_key"], io.BytesIO(b"abc"))
    with pytest.raises(FileStoreError) as e:
        store.register("p1", prep["upload_key"], expected_sha256="0" * 64)
    assert e.value.code == "checksum_mismatch"
    # session still alive → a correct register succeeds afterwards
    import hashlib
    rec = store.register("p1", prep["upload_key"],
                         expected_sha256=hashlib.sha256(b"abc").hexdigest())
    assert rec["size_bytes"] == 3


def test_register_before_upload_is_400(store):
    prep = store.prepare("p1", "empty.csv")
    with pytest.raises(FileStoreError) as e:
        store.register("p1", prep["upload_key"])
    assert e.value.code == "file_not_uploaded"


@pytest.mark.parametrize("bad", ["../evil", "a/b", "a\\b", "", "..", "~root"])
def test_traversal_rejected_everywhere(store, bad, tmp_path):
    # project component
    with pytest.raises(FileStoreError) as e:
        store.prepare(bad, "ok.csv")
    assert e.value.status == 400
    # filename at prepare
    with pytest.raises(FileStoreError):
        store.prepare("p1", bad)
    # name at register (empty name falls back to the session filename)
    if bad:
        prep = store.prepare("p1", "ok.csv")
        store.upload("p1", prep["upload_key"], io.BytesIO(b"x"))
        with pytest.raises(FileStoreError):
            store.register("p1", prep["upload_key"], name=bad)
    # name at register_local
    src = tmp_path / "adopt.csv"
    src.write_text("x")
    with pytest.raises(FileStoreError):
        store.register_local("p1", str(src), bad)
    # nothing escaped the store root
    outside = os.path.join(os.path.dirname(store.root), "evil")
    assert not os.path.exists(outside)


def test_cleanup_expired_sweeps_sessions_and_bytes(store):
    keep = store.prepare("p1", "keep.csv")
    store.ttl = -1
    gone = store.prepare("p1", "gone.csv")
    # upload for the expired one would 410; write the staged bytes manually
    staged = os.path.join(store.root, "p1", "staging",
                          f"{gone['upload_key']}_gone.csv")
    os.makedirs(os.path.dirname(staged), exist_ok=True)
    open(staged, "w").write("zz")
    sess = store._session_path("p1", gone["upload_key"])
    import json
    s = json.load(open(sess))
    s["staging_path"] = staged
    store._write_json(sess, s)
    dropped = store.cleanup_expired("p1")
    assert gone["upload_key"] in dropped
    assert keep["upload_key"] not in dropped
    assert not os.path.exists(staged)


def test_register_local_adopts_export(store, tmp_path):
    src = tmp_path / "out.csv"
    src.write_text(CSV)
    rec = store.register_local("p1", str(src), "export.csv",
                               content_type="text/csv")
    assert not src.exists()  # moved, not copied
    assert open(store.local_path("p1", rec["id"])).read() == CSV
    assert rec["size_bytes"] == len(CSV.encode())


def test_engine_staged_file_import(spark, tmp_path):
    """The reference's primary ingest path: stage a file through the files
    API, then import the table by file id."""
    eng = StorageEngine(spark, str(tmp_path / "wh"))
    eng.create_project("p1")
    eng.create_bucket("p1", "in_c_data")
    eng.create_table("p1", "in_c_data", "users", USERS_COLUMNS,
                     primary_key=["id"])
    prep = eng.files.prepare("p1", "users.csv", content_type="text/csv")
    eng.files.upload("p1", prep["upload_key"], io.BytesIO(CSV.encode()))
    rec = eng.files.register("p1", prep["upload_key"])
    res = eng.import_file("p1", "in_c_data", "users", file_id=rec["id"],
                          file_format="csv")
    assert res["rows_after"] == 3
    rows = {r["id"]: r for r in eng.preview("p1", "in_c_data", "users")}
    assert rows[1]["name"] == "Alice" and rows[3]["email"] is None
    # exactly one of path/file_id is required
    from keboola_storage_duckdb_spark.catalog.catalog import CatalogError
    with pytest.raises(CatalogError):
        eng.import_file("p1", "in_c_data", "users")
    with pytest.raises(CatalogError):
        eng.import_file("p1", "in_c_data", "users", path="x", file_id="y")
