"""Hash-bucketed table layout (r12): optimize_table(hash_bucket_by=PK)
lays the table out in __bucket=k hive dirs keyed by pmod(xxhash64(PK), n).
A key's bucket never changes, so incremental imports and deletes become
bucket-scoped merges — only the buckets of staged/deleted keys are read,
merged and swapped; everything else keeps its files byte-identical
(inode-pinned below). The Spark-native answer to bucketed tables without
a metastore."""

import os

import pytest
from pyspark.sql import functions as F

from keboola_storage_duckdb_spark.engine import StorageEngine


@pytest.fixture()
def eng(spark, tmp_path):
    e = StorageEngine(spark, str(tmp_path / "wh"))
    e.create_project("p1")
    e.create_bucket("p1", "in_c_main")
    e.create_table("p1", "in_c_main", "t", [
        {"name": "id", "type": "INTEGER", "nullable": False},
        {"name": "val", "type": "DOUBLE"},
    ], primary_key=["id"])
    return e


def _seed(eng, tmp_path, n=80):
    csv = str(tmp_path / "rows.csv")
    with open(csv, "w") as f:
        f.write("id,val\n")
        for i in range(n):
            f.write(f"{i},{float(i)}\n")
    eng.import_file("p1", "in_c_main", "t", csv)


def _bucket_of(spark, ids, n=4):
    rows = spark.createDataFrame([(i,) for i in ids], "id int") \
        .select(F.pmod(F.xxhash64("id"), F.lit(n)).cast("int").alias("b"),
                "id").collect()
    return {r.id: r.b for r in rows}


def _files(data_dir, leaf):
    d = os.path.join(data_dir, leaf)
    return {e: os.stat(os.path.join(d, e)).st_ino
            for e in os.listdir(d) if e.endswith(".parquet")}


def test_bucketed_layout_hidden_and_preserved(eng, spark, tmp_path):
    _seed(eng, tmp_path)
    before = {(r.id, r.val) for r in
              eng.read_table("p1", "in_c_main", "t")
                 .select("id", "val").collect()}
    out = eng.optimize_table("p1", "in_c_main", "t",
                             hash_bucket_by=["id"], n_hash_buckets=4)
    assert out["hash_bucket_by"] == ["id"] and out["n_hash_buckets"] == 4
    df = eng.read_table("p1", "in_c_main", "t")
    assert "__bucket" not in df.columns          # internal layout state
    after = {(r.id, r.val) for r in df.select("id", "val").collect()}
    assert after == before and len(after) == 80
    data_dir = eng.catalog.data_dir("p1", "in_c_main", "t")
    leaves = [e for e in os.listdir(data_dir) if e.startswith("__bucket=")]
    assert sorted(leaves) == [f"__bucket={k}" for k in range(4)]
    # exports/profile surfaces go through read_table — no __bucket leak
    assert "__bucket" not in eng.table_info("p1", "in_c_main", "t")["columns"]


def test_bucketed_upsert_touches_only_staged_buckets(eng, spark, tmp_path):
    _seed(eng, tmp_path)
    eng.optimize_table("p1", "in_c_main", "t",
                       hash_bucket_by=["id"], n_hash_buckets=4)
    data_dir = eng.catalog.data_dir("p1", "in_c_main", "t")
    staged_ids = [0, 1, 500]                      # 2 updates + 1 new key
    bmap = _bucket_of(spark, staged_ids)
    touched = {f"__bucket={b}" for b in bmap.values()}
    untouched = {f"__bucket={k}" for k in range(4)} - touched
    assert untouched, "fixture degenerate: staged keys cover all buckets"
    before = {leaf: _files(data_dir, leaf) for leaf in untouched}

    up = str(tmp_path / "up.csv")
    with open(up, "w") as f:
        f.write("id,val\n0,999.0\n1,888.0\n500,777.0\n")
    eng.import_file("p1", "in_c_main", "t", up, incremental=True,
                    dedup_mode="update_duplicates")

    # untouched buckets byte-identical down to the inode
    for leaf in untouched:
        assert _files(data_dir, leaf) == before[leaf], leaf
    got = {r.id: r.val for r in eng.read_table("p1", "in_c_main", "t")
           .select("id", "val").collect()}
    assert got[0] == 999.0 and got[1] == 888.0 and got[500] == 777.0
    assert len(got) == 81 and got[2] == 2.0
    # layout survives the merge (meta honest, dirs still bucketed)
    meta = eng.catalog.read_meta("p1", "in_c_main", "t")
    assert meta.properties["hash_bucket_by"] == ["id"]


def test_bucketed_do_nothing_and_fail_modes(eng, spark, tmp_path):
    from keboola_storage_duckdb_spark.operators.dedup import (
        DuplicateKeyError)

    _seed(eng, tmp_path)
    eng.optimize_table("p1", "in_c_main", "t",
                       hash_bucket_by=["id"], n_hash_buckets=4)
    up = str(tmp_path / "up.csv")
    with open(up, "w") as f:
        f.write("id,val\n0,999.0\n600,606.0\n")
    eng.import_file("p1", "in_c_main", "t", up, incremental=True,
                    dedup_mode="do_nothing")
    got = {r.id: r.val for r in eng.read_table("p1", "in_c_main", "t")
           .select("id", "val").collect()}
    assert got[0] == 0.0 and got[600] == 606.0    # existing kept, new added
    with pytest.raises(DuplicateKeyError):
        eng.import_file("p1", "in_c_main", "t", up, incremental=True,
                        dedup_mode="fail_on_duplicates")


def test_bucketed_delete_scoped(eng, spark, tmp_path):
    _seed(eng, tmp_path)
    eng.optimize_table("p1", "in_c_main", "t",
                       hash_bucket_by=["id"], n_hash_buckets=4)
    data_dir = eng.catalog.data_dir("p1", "in_c_main", "t")
    b5 = _bucket_of(spark, [5])[5]
    untouched = {f"__bucket={k}" for k in range(4)} - {f"__bucket={b5}"}
    before = {leaf: _files(data_dir, leaf) for leaf in untouched}
    eng.delete_rows("p1", "in_c_main", "t", where_filters=[
        {"column": "id", "operator": "eq", "values": ["5"],
         "dataType": "INTEGER"}])
    for leaf in untouched:
        assert _files(data_dir, leaf) == before[leaf], leaf
    ids = {r.id for r in eng.read_table("p1", "in_c_main", "t")
           .select("id").collect()}
    assert 5 not in ids and len(ids) == 79


def test_full_load_resets_bucket_layout(eng, spark, tmp_path):
    _seed(eng, tmp_path)
    eng.optimize_table("p1", "in_c_main", "t",
                       hash_bucket_by=["id"], n_hash_buckets=4)
    csv = str(tmp_path / "full.csv")
    with open(csv, "w") as f:
        f.write("id,val\n1,1.0\n2,2.0\n")
    eng.import_file("p1", "in_c_main", "t", csv, incremental=False)
    meta = eng.catalog.read_meta("p1", "in_c_main", "t")
    assert meta.properties["hash_bucket_by"] == []   # meta stays honest
    got = {r.id for r in eng.read_table("p1", "in_c_main", "t")
           .select("id").collect()}
    assert got == {1, 2}


def test_optimize_zorder_skips_on_both_dims(spark, tmp_path):
    """OPTIMIZE ZORDER (r12): after the Morton rewrite, per-FILE min/max
    spans are a small fraction of the full range on BOTH dimensions —
    vs cluster_by one column where the second dimension's file spans
    stay ~full. Rows intact, meta records the layout, and the decision
    frame (zorder_layout_frame) predicted exactly this trade."""
    import pyarrow.parquet as pq

    eng = StorageEngine(spark, str(tmp_path / "whz"))
    eng.create_project("p1")
    eng.create_bucket("p1", "in_c_main")
    eng.create_table("p1", "in_c_main", "tz", [
        {"name": "x", "type": "INTEGER", "nullable": False},
        {"name": "y", "type": "INTEGER", "nullable": False},
    ])
    csv = str(tmp_path / "z.csv")
    with open(csv, "w") as f:
        f.write("x,y\n")
        for i in range(64):             # 64x64 grid: x and y independent
            for j in range(64):
                f.write(f"{i},{j}\n")
    eng.import_file("p1", "in_c_main", "tz", csv)
    out = eng.optimize_table("p1", "in_c_main", "tz",
                             zorder_by=["x", "y"], target_files=16)
    assert out["zorder_by"] == ["x", "y"]
    df = eng.read_table("p1", "in_c_main", "tz")
    assert df.count() == 64 * 64

    data_dir = eng.catalog.data_dir("p1", "in_c_main", "tz")
    spans = []
    for e in sorted(os.listdir(data_dir)):
        if not e.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(data_dir, e)).metadata
        cols = {md.schema.column(c).name: c
                for c in range(len(md.schema))}
        sx = [md.row_group(i).column(cols["x"]).statistics
              for i in range(md.num_row_groups)]
        sy = [md.row_group(i).column(cols["y"]).statistics
              for i in range(md.num_row_groups)]
        spans.append((
            (max(s.max for s in sx) - min(s.min for s in sx) + 1) / 64.0,
            (max(s.max for s in sy) - min(s.min for s in sy) + 1) / 64.0))
    assert len(spans) >= 8
    mean_x = sum(s[0] for s in spans) / len(spans)
    mean_y = sum(s[1] for s in spans) / len(spans)
    # ~1/sqrt(16)=0.25 ideal each; allow slack for range-boundary files.
    # The point: BOTH dims far below 1.0 (a single-column sort gives the
    # unsorted dim ~1.0).
    assert mean_x < 0.6 and mean_y < 0.6, (mean_x, mean_y)
    meta = eng.catalog.read_meta("p1", "in_c_main", "tz")
    assert meta.properties["zorder_by"] == ["x", "y"]
