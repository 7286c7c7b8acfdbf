"""Versioned-Parquet backend (backends/versioned.py): commit-log writes,
snapshot-isolated time travel, OCC conflict on racing commits, vacuum,
branch CoW materialization — the transactional story the reference gets
from DuckDB's own file transactionality (src/database.py:37-165 locks,
src/routers/table_import.py:286-361 staged import)."""

import os

import pandas as pd
import pytest

from keboola_storage_duckdb_spark.backends.versioned import (
    CommitConflictError,
    VersionLog,
)
from keboola_storage_duckdb_spark.catalog.catalog import (
    CatalogError,
    NotFoundError,
)
from keboola_storage_duckdb_spark.engine import StorageEngine

COLS = [
    {"name": "id", "type": "INTEGER", "nullable": False},
    {"name": "v", "type": "VARCHAR", "nullable": True},
]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    e = StorageEngine(spark, str(tmp_path_factory.mktemp("wh_ver")))
    e.create_project("pv")
    e.create_bucket("pv", "in_c_v")
    e.create_table("pv", "in_c_v", "t", COLS, primary_key=["id"],
                   storage_format="versioned")
    return e


def _csv(tmp_path, name, rows):
    path = str(tmp_path / name)
    pd.DataFrame(rows).to_csv(path, index=False)
    return path


def test_commit_log_and_time_travel(eng, tmp_path):
    # v0: freshly created → empty
    assert eng.read_table("pv", "in_c_v", "t").count() == 0
    eng.import_file("pv", "in_c_v", "t",
                    _csv(tmp_path, "a.csv", {"id": [1, 2], "v": ["a", "b"]}),
                    file_format="csv")
    eng.import_file("pv", "in_c_v", "t",
                    _csv(tmp_path, "b.csv", {"id": [2, 3], "v": ["B", "c"]}),
                    file_format="csv", incremental=True)
    hist = eng.table_history("pv", "in_c_v", "t")
    assert [h["version"] for h in hist] == [1, 2]
    assert all(h["op"].startswith("import:") for h in hist)
    # latest = upserted; v1 = first load only; v0 = empty
    assert eng.read_table("pv", "in_c_v", "t").count() == 3
    v1 = {r.id: r.v for r in
          eng.read_table("pv", "in_c_v", "t", version=1).collect()}
    assert v1 == {1: "a", 2: "b"}
    assert eng.read_table("pv", "in_c_v", "t", version=0).count() == 0
    latest = {r.id: r.v for r in eng.read_table("pv", "in_c_v", "t").collect()}
    assert latest == {1: "a", 2: "B", 3: "c"}


def test_delete_creates_version(eng):
    eng.delete_rows("pv", "in_c_v", "t", where="id = 1")
    hist = eng.table_history("pv", "in_c_v", "t")
    assert hist[-1]["op"] == "delete_rows" and hist[-1]["version"] == 3
    assert eng.read_table("pv", "in_c_v", "t").count() == 2
    # earlier snapshot untouched (snapshot isolation)
    assert eng.read_table("pv", "in_c_v", "t", version=2).count() == 3


def test_occ_conflict_raises_and_leaves_state_clean(eng, tmp_path, monkeypatch):
    log = VersionLog(eng.catalog.table_dir("pv", "in_c_v", "t"))
    n = log.latest_version()
    blocker = os.path.join(log.log_dir, f"{n + 1:08d}.json")
    external = os.path.join(log.table_dir, "external")

    # a concurrent writer lands its commit while ours is staging parquet —
    # simulated by hooking the staging-dir call (after the engine snapshots
    # its expected version, before its commit)
    orig = VersionLog.staging_dir

    def raced(self):
        os.makedirs(external, exist_ok=True)
        with open(blocker, "w") as f:
            f.write('{"version": %d, "data": "external", "op": "x", "ts": 0}'
                    % (n + 1))
        return orig(self)

    monkeypatch.setattr(VersionLog, "staging_dir", raced)
    with pytest.raises(CommitConflictError):
        eng.import_file("pv", "in_c_v", "t",
                        _csv(tmp_path, "c.csv", {"id": [9], "v": ["z"]}),
                        file_format="csv", incremental=True)
    monkeypatch.undo()
    os.remove(blocker)
    os.rmdir(external)
    # loser left no stray staged data; table still readable at version n
    assert log.latest_version() == n
    stray = [d for d in os.listdir(log.table_dir) if d.startswith("stage-")]
    assert stray == []
    assert eng.read_table("pv", "in_c_v", "t").count() == 2
    # and a retry (the documented OCC recovery) succeeds
    eng.import_file("pv", "in_c_v", "t",
                    _csv(tmp_path, "d.csv", {"id": [9], "v": ["z"]}),
                    file_format="csv", incremental=True)
    assert log.latest_version() == n + 1
    assert eng.read_table("pv", "in_c_v", "t").count() == 3


def test_vacuum_drops_old_versions_keeps_history(eng):
    hist = eng.table_history("pv", "in_c_v", "t")
    latest = hist[-1]["version"]
    out = eng.vacuum_table("pv", "in_c_v", "t", retain_last=1)
    assert out["removed_versions"] == list(range(1, latest))
    # history remains auditable, old data is gone
    assert [h["version"] for h in eng.table_history("pv", "in_c_v", "t")] == \
        list(range(1, latest + 1))
    with pytest.raises(NotFoundError):
        eng.read_table("pv", "in_c_v", "t", version=1)
    assert eng.read_table("pv", "in_c_v", "t").count() == 3


def test_branch_cow_shallow_clones_log(eng, tmp_path):
    """Branch CoW shallow-clones the commit log (zero data copy): the
    branch keeps full time travel through main's history, branch writes
    commit locally on top, and main never sees them."""
    eng.create_branch("pv", "dev")
    main_latest = eng.table_history("pv", "in_c_v", "t")[-1]["version"]
    eng.import_file("pv", "in_c_v", "t",
                    _csv(tmp_path, "e.csv", {"id": [50], "v": ["branch"]}),
                    file_format="csv", incremental=True, branch="dev")
    # branch saw the pre-write latest (3 rows) + 1
    assert eng.read_table("pv", "in_c_v", "t", branch="dev").count() == 4
    # main unaffected, still versioned
    assert eng.read_table("pv", "in_c_v", "t").count() == 3
    assert eng.table_history("pv", "in_c_v", "t")[-1]["version"] == main_latest

    # branched TIME TRAVEL: pre-branch versions resolve through the clone
    assert eng.read_table("pv", "in_c_v", "t", branch="dev",
                          version=main_latest).count() == 3
    # branch history = cloned main history + the local commit
    bh = eng.table_history("pv", "in_c_v", "t", branch="dev")
    assert [h["version"] for h in bh][-2:] == [main_latest, main_latest + 1]
    assert "base" in bh[0] and "base" not in bh[-1]

    # vacuumed-on-main versions stay vacuumed for the clone too
    with pytest.raises(NotFoundError):
        eng.read_table("pv", "in_c_v", "t", branch="dev", version=1)

    # a second branch write stacks another local version
    eng.import_file("pv", "in_c_v", "t",
                    _csv(tmp_path, "f.csv", {"id": [51], "v": ["b2"]}),
                    file_format="csv", incremental=True, branch="dev")
    assert eng.read_table("pv", "in_c_v", "t", branch="dev").count() == 5
    assert eng.read_table("pv", "in_c_v", "t", branch="dev",
                          version=main_latest + 1).count() == 4
    # branch vacuum never touches main's data dirs
    out = VersionLog(eng.catalog.table_dir("pv", "in_c_v", "t", "dev")) \
        .vacuum(retain_last=1)
    assert out == [main_latest + 1]  # only the branch-local old version
    assert eng.read_table("pv", "in_c_v", "t", version=main_latest).count() == 3


def test_versioned_over_http(eng, tmp_path):
    """create(storage_format) → import → history → time-travel preview →
    vacuum, through the REST surface."""
    import json as _json

    from keboola_storage_duckdb_spark.service.app import create_app
    app = create_app(eng)
    app.config["TESTING"] = True
    base = "/projects/pv/branches/default/buckets/in_c_v/tables"
    with app.test_client() as c:
        r = c.post(base, data=_json.dumps(
            {"name": "ht", "columns": COLS, "primary_key": ["id"],
             "storage_format": "versioned"}), content_type="application/json")
        assert r.status_code == 201
        assert r.get_json()["storage_format"] == "versioned"
        for i, rows in enumerate(({"id": [1], "v": ["x"]},
                                  {"id": [2], "v": ["y"]})):
            eng.import_file("pv", "in_c_v", "ht",
                            _csv(tmp_path, f"h{i}.csv", rows),
                            file_format="csv", incremental=True)
        hist = c.get(base + "/ht/history").get_json()
        assert [h["version"] for h in hist] == [1, 2]
        assert c.get(base + "/ht/preview?version=1").get_json()["row_count"] == 1
        assert c.get(base + "/ht/preview").get_json()["row_count"] == 2
        out = c.post(base + "/ht/vacuum", data=_json.dumps({"retain_last": 1}),
                     content_type="application/json").get_json()
        assert out["removed_versions"] == [1]


def test_branch_scoped_vacuum_via_api(eng, tmp_path):
    """ADVICE r5 (service/app.py vacuum route): a branch-scoped vacuum
    must reach the BRANCH's version log — not silently vacuum main,
    whose data dirs the branch clone's time travel references."""
    import json as _json

    from keboola_storage_duckdb_spark.service.app import create_app
    eng.create_table("pv", "in_c_v", "bv", COLS, primary_key=["id"],
                     storage_format="versioned")
    for i in (1, 2):
        eng.import_file("pv", "in_c_v", "bv",
                        _csv(tmp_path, f"bv{i}.csv",
                             {"id": [i], "v": [f"r{i}"]}),
                        file_format="csv", incremental=True)
    main_latest = eng.table_history("pv", "in_c_v", "bv")[-1]["version"]
    eng.create_branch("pv", "bdev")
    eng.import_file("pv", "in_c_v", "bv",
                    _csv(tmp_path, "bv3.csv", {"id": [3], "v": ["b"]}),
                    file_format="csv", incremental=True, branch="bdev")
    eng.import_file("pv", "in_c_v", "bv",
                    _csv(tmp_path, "bv4.csv", {"id": [4], "v": ["b2"]}),
                    file_format="csv", incremental=True, branch="bdev")
    app = create_app(eng)
    app.config["TESTING"] = True
    with app.test_client() as c:
        out = c.post("/projects/pv/branches/bdev/buckets/in_c_v/tables"
                     "/bv/vacuum", data=_json.dumps({"retain_last": 1}),
                     content_type="application/json").get_json()
    # only the branch-local old version dropped; main's history intact
    assert out["removed_versions"] == [main_latest + 1]
    assert eng.read_table("pv", "in_c_v", "bv",
                          version=main_latest).count() == 2
    assert [h["version"] for h in eng.table_history("pv", "in_c_v", "bv")] \
        == [1, 2]


def test_write_table_requires_branch_copy(eng, spark):
    """ADVICE r5 (engine.py _write_table): a branch write with no branch
    copy must fail loudly instead of silently committing into MAIN."""
    from keboola_storage_duckdb_spark.catalog.catalog import CatalogError as CE
    df = spark.createDataFrame([(9, "x")], "id int, v string")
    with pytest.raises(CE):
        eng._write_table("pv", "in_c_v", "bv", df, branch="no-such-branch")


def test_plain_table_rejects_version_pin(eng, tmp_path):
    eng.create_table("pv", "in_c_v", "plain", COLS)
    with pytest.raises(CatalogError):
        eng.read_table("pv", "in_c_v", "plain", version=1)
    with pytest.raises(CatalogError):
        eng.table_history("pv", "in_c_v", "plain")
    with pytest.raises(CatalogError):
        eng.create_table("pv", "in_c_v", "bad", COLS, storage_format="nope")
