"""Wave-6: stateful streaming (applyInPandasWithState), streaming dedup,
salted join/agg equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from keboola_storage_duckdb_spark.sources.tables import load_table


def test_stream_user_totals_matches_batch(spark, sf_dir, tmp_path):
    from keboola_storage_duckdb_spark.streaming.events import stream_user_totals

    ev = load_table(spark, sf_dir, "events").limit(3000)
    src = str(tmp_path / "ev_src")
    ev.write.parquet(src)
    got = stream_user_totals(spark, src, ev.schema)
    q = (got.writeStream.format("memory").queryName("totals_test")
            .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    stream_rows = {r.user_id: (r.n_events, r.sum_value)
                   for r in spark.sql(
                       "select * from totals_test").collect()}
    batch = {r.user_id: (r.n, round(r.s, 2)) for r in
             spark.read.parquet(src).groupBy("user_id")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.sum("value").alias("s")).collect()}
    assert set(stream_rows) == set(batch)
    for u, (n, s) in batch.items():
        assert stream_rows[u][0] == n
        assert abs(stream_rows[u][1] - s) < 0.05  # float sum rounding


def test_stream_dedup_events(spark, sf_dir, tmp_path):
    from keboola_storage_duckdb_spark.streaming.events import stream_dedup_events

    ev = load_table(spark, sf_dir, "events").limit(500)
    dup = ev.unionByName(ev)  # every event twice
    src = str(tmp_path / "dup_src")
    dup.write.parquet(src)
    got = stream_dedup_events(spark, src, ev.schema)
    q = (got.writeStream.format("memory").queryName("dedup_test")
            .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    n = spark.sql("select count(distinct event_id) c, count(*) n "
                  "from dedup_test").collect()[0]
    assert n.c == n.n == 500


def test_salted_join_equals_plain(spark, sf_dir):
    from keboola_storage_duckdb_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment").withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(cust, "o_custkey")
    salted = salted_join(orders, cust, "o_custkey", n_salts=4)
    a = {(r.o_orderkey, r.c_mktsegment) for r in plain.collect()}
    b = {(r.o_orderkey, r.c_mktsegment) for r in salted.collect()}
    assert a == b and len(a) > 0


def test_salted_agg_equals_plain(spark, sf_dir):
    from keboola_storage_duckdb_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(12,2)")
    plain = {r.event_type: (r.n, r.s) for r in
             ev.groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum(v).cast("double").alias("s")).collect()}
    two = salted_agg(
        ev, ["event_type"],
        aggs=[F.count(F.lit(1)).alias("pn"), F.sum(v).alias("ps")],
        reaggs=[F.sum("pn").alias("n"), F.sum("ps").cast("double").alias("s")],
        salt_col=F.col("event_id"))
    got = {r.event_type: (r.n, r.s) for r in two.collect()}
    assert got == plain


def test_optimize_table_partitions_and_preserves_rows(spark, tmp_path):
    import os
    from keboola_storage_duckdb_spark.engine import StorageEngine

    eng = StorageEngine(spark, str(tmp_path / "wh"))
    eng.create_project("p1")
    eng.create_bucket("p1", "in_c_main")
    eng.create_table("p1", "in_c_main", "t1", [
        {"name": "id", "type": "INTEGER", "nullable": False},
        {"name": "cat", "type": "VARCHAR"},
        {"name": "val", "type": "DOUBLE"},
    ])
    csv = str(tmp_path / "rows.csv")
    with open(csv, "w") as f:
        f.write("id,cat,val\n")
        for i in range(100):
            f.write(f"{i},c{i % 3},{i * 1.5}\n")
    eng.import_file("p1", "in_c_main", "t1", csv)
    before = {(r.id, r.cat, r.val) for r in
              eng.read_table("p1", "in_c_main", "t1")
                 .select("id", "cat", "val").collect()}

    eng.optimize_table("p1", "in_c_main", "t1",
                       partition_by=["cat"], target_files=2)
    after_df = eng.read_table("p1", "in_c_main", "t1")
    after = {(r.id, r.cat, r.val) for r in
             after_df.select("id", "cat", "val").collect()}
    assert before == after and len(after) == 100
    # hive-partitioned layout on disk
    data_dir = eng.catalog.data_dir("p1", "in_c_main", "t1")
    assert any(e.startswith("cat=") for e in os.listdir(data_dir))
    # partition pruning: filtered scan only lists the matching partition
    assert after_df.filter("cat = 'c1'").count() == 33


def test_optimize_cluster_by_sorts_row_groups(spark, tmp_path):
    """cluster_by range-partitions + sorts so parquet row-group min/max
    stats become selective: every data file covers a narrow, disjoint id
    range (the property min/max row-group skipping needs)."""
    import os

    import pyarrow.parquet as pq

    from keboola_storage_duckdb_spark.engine import StorageEngine

    eng = StorageEngine(spark, str(tmp_path / "whc"))
    eng.create_project("p1")
    eng.create_bucket("p1", "in_c_main")
    eng.create_table("p1", "in_c_main", "t2", [
        {"name": "id", "type": "INTEGER", "nullable": False},
        {"name": "val", "type": "DOUBLE"},
    ])
    csv = str(tmp_path / "rows2.csv")
    import random
    rng = random.Random(7)
    ids = list(range(1000))
    rng.shuffle(ids)                     # unsorted on disk before optimize
    with open(csv, "w") as f:
        f.write("id,val\n")
        for i in ids:
            f.write(f"{i},{i * 0.5}\n")
    eng.import_file("p1", "in_c_main", "t2", csv)

    out = eng.optimize_table("p1", "in_c_main", "t2",
                             cluster_by=["id"], target_files=4)
    assert out["cluster_by"] == ["id"]
    df = eng.read_table("p1", "in_c_main", "t2")
    assert df.count() == 1000
    assert {r.id for r in df.select("id").collect()} == set(range(1000))

    data_dir = eng.catalog.data_dir("p1", "in_c_main", "t2")
    ranges = []
    for e in sorted(os.listdir(data_dir)):
        if not e.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(data_dir, e)).metadata
        stats = [md.row_group(i).column(0).statistics
                 for i in range(md.num_row_groups)]
        ranges.append((min(st.min for st in stats),
                       max(st.max for st in stats)))
    assert len(ranges) >= 2
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2                 # disjoint file key ranges
    # meta records the layout
    meta = eng.catalog.read_meta("p1", "in_c_main", "t2")
    assert meta.properties["cluster_by"] == ["id"]


def test_optimize_bloom_filter_columns(spark, tmp_path):
    """bloom_filter_columns writes parquet bloom filters (the point-lookup
    complement of min/max skipping for unsorted high-cardinality keys):
    rows intact, meta records the layout, and the bloom-enabled file is
    strictly larger than the plain rewrite of identical data."""
    import os

    from keboola_storage_duckdb_spark.engine import StorageEngine

    eng = StorageEngine(spark, str(tmp_path / "whb"))
    eng.create_project("p1")
    eng.create_bucket("p1", "in_c_main")
    eng.create_table("p1", "in_c_main", "t3", [
        {"name": "id", "type": "INTEGER", "nullable": False},
        {"name": "key", "type": "VARCHAR"},
    ])
    csv = str(tmp_path / "rows3.csv")
    with open(csv, "w") as f:
        f.write("id,key\n")
        for i in range(5000):
            f.write(f"{i},k{i * 7919 % 100000:05d}\n")
    eng.import_file("p1", "in_c_main", "t3", csv)

    def data_bytes():
        d = eng.catalog.data_dir("p1", "in_c_main", "t3")
        return sum(os.path.getsize(os.path.join(d, e))
                   for e in os.listdir(d) if e.endswith(".parquet"))

    eng.optimize_table("p1", "in_c_main", "t3", target_files=1)
    plain = data_bytes()
    out = eng.optimize_table("p1", "in_c_main", "t3", target_files=1,
                             bloom_filter_columns=["key"])
    assert out["bloom_filter_columns"] == ["key"]
    with_bloom = data_bytes()
    assert with_bloom > plain             # bloom bitset adds bytes
    df = eng.read_table("p1", "in_c_main", "t3")
    assert df.count() == 5000
    assert df.filter("key = 'k07919'").count() == 1
    meta = eng.catalog.read_meta("p1", "in_c_main", "t3")
    assert meta.properties["bloom_filter_columns"] == ["key"]


def test_idempotency_cache_replays_and_expires():
    import time as _time
    from keboola_storage_duckdb_spark.idempotency import IdempotencyCache

    cache = IdempotencyCache(ttl_seconds=0.2)
    calls = []

    def op():
        calls.append(1)
        return len(calls)

    assert cache.run("k1", op) == 1
    assert cache.run("k1", op) == 1          # replayed, not re-executed
    assert cache.run(None, op) == 2          # no key → always executes
    assert cache.run("k2", op) == 3
    _time.sleep(0.25)
    assert cache.run("k1", op) == 4          # TTL expired → re-executes


def test_api_keys_and_ops_log(spark, tmp_path):
    from keboola_storage_duckdb_spark.engine import StorageEngine

    eng = StorageEngine(spark, str(tmp_path / "wh"))
    key = eng.create_api_key("ci-bot")
    assert eng.verify_api_key(key) == "ci-bot"
    assert eng.verify_api_key("nope") is None
    eng.create_project("p1")
    ops = [r["op"] for r in eng.operations_log()]
    assert ops[-1] == "create_project" and "create_api_key" in ops


def test_snapshot_settings_hierarchy(spark, tmp_path):
    from keboola_storage_duckdb_spark.engine import StorageEngine

    eng = StorageEngine(spark, str(tmp_path / "wh"))
    # defaults
    got = eng.resolve_snapshot_settings("p1", "b1", "t1")
    assert got == {"enabled": True, "retention_days": 90,
                   "auto_retention_days": 7}
    # project-level off, bucket overrides retention, table re-enables
    eng.set_snapshot_settings("project", ["p1"], enabled=False)
    assert eng.resolve_snapshot_settings("p1", "b1", "t1")["enabled"] is False
    eng.set_snapshot_settings("bucket", ["p1", "b1"], retention_days=30)
    got = eng.resolve_snapshot_settings("p1", "b1", "t1")
    assert got["enabled"] is False and got["retention_days"] == 30
    eng.set_snapshot_settings("table", ["p1", "b1", "t1"], enabled=True)
    got = eng.resolve_snapshot_settings("p1", "b1", "t1")
    assert got["enabled"] is True and got["retention_days"] == 30
    # sibling table unaffected by the table-level override
    assert eng.resolve_snapshot_settings("p1", "b1", "t2")["enabled"] is False


def test_snapshot_settings_gate_auto_snapshot_and_prune(spark, tmp_path):
    import json as _json
    import os as _os
    from keboola_storage_duckdb_spark.engine import StorageEngine

    eng = StorageEngine(spark, str(tmp_path / "wh"))
    eng.create_project("p1")
    eng.create_bucket("p1", "b1")
    eng.create_table("p1", "b1", "t1",
                     [{"name": "id", "type": "INTEGER", "nullable": False}])
    csv = str(tmp_path / "r.csv")
    with open(csv, "w") as f:
        f.write("id\n1\n2\n")
    eng.import_file("p1", "b1", "t1", csv)

    # snapshots disabled → delete-all must NOT auto-snapshot
    eng.set_snapshot_settings("table", ["p1", "b1", "t1"], enabled=False)
    eng.delete_rows("p1", "b1", "t1")
    assert eng.snapshot_list("p1", "b1", "t1") == []

    # re-enable → auto snapshot happens; then prune with backdated age
    eng.set_snapshot_settings("table", ["p1", "b1", "t1"], enabled=True)
    eng.import_file("p1", "b1", "t1", csv)
    eng.delete_rows("p1", "b1", "t1")
    snaps = eng.snapshot_list("p1", "b1", "t1")
    assert len(snaps) == 1 and snaps[0]["description"].startswith("auto:")
    # backdate the sidecar past the 7-day auto retention
    sd = eng.catalog.snapshot_dir("p1", "b1", "t1")
    sc = _os.path.join(sd, snaps[0]["snapshot_id"] + ".schema.json")
    d = _json.load(open(sc)); d["created_at"] -= 8 * 86400
    _json.dump(d, open(sc, "w"))
    assert eng.snapshot_prune("p1", "b1", "t1") == [snaps[0]["snapshot_id"]]
    assert eng.snapshot_list("p1", "b1", "t1") == []


def test_partition_scoped_upsert(spark, tmp_path):
    """Incremental imports into a hive-partitioned table rewrite ONLY the
    touched partitions: untouched partition directories keep their files
    byte-identical (inode-level), results equal the full-rewrite
    semantics, and a key moving partitions is erased from its old home."""
    import os

    from keboola_storage_duckdb_spark.engine import StorageEngine

    eng = StorageEngine(spark, str(tmp_path / "whp"))
    eng.create_project("p1")
    eng.create_bucket("p1", "in_c_main")
    eng.create_table("p1", "in_c_main", "t4", [
        {"name": "id", "type": "INTEGER", "nullable": False},
        {"name": "cat", "type": "VARCHAR"},
        {"name": "val", "type": "DOUBLE"},
    ], primary_key=["id"])
    csv = str(tmp_path / "p_rows.csv")
    with open(csv, "w") as f:
        f.write("id,cat,val\n")
        for i in range(90):
            f.write(f"{i},c{i % 3},{float(i)}\n")
    eng.import_file("p1", "in_c_main", "t4", csv)
    eng.optimize_table("p1", "in_c_main", "t4", partition_by=["cat"])
    data_dir = eng.catalog.data_dir("p1", "in_c_main", "t4")

    def part_files(p):
        d = os.path.join(data_dir, p)
        return {e: os.stat(os.path.join(d, e)).st_ino
                for e in os.listdir(d) if e.endswith(".parquet")}

    before_c2 = part_files("cat=c2")

    # upsert rows into c0 and c1 only (ids 0,1 keep their cat; 300 is new)
    up = str(tmp_path / "p_up.csv")
    with open(up, "w") as f:
        f.write("id,cat,val\n0,c0,999.0\n1,c1,888.0\n300,c0,777.0\n")
    eng.import_file("p1", "in_c_main", "t4", up, incremental=True,
                    dedup_mode="update_duplicates")

    # untouched partition files identical down to the inode
    assert part_files("cat=c2") == before_c2
    df = eng.read_table("p1", "in_c_main", "t4")
    rows = {r.id: (r.cat, r.val) for r in df.collect()}
    assert len(rows) == 91
    assert rows[0] == ("c0", 999.0) and rows[1] == ("c1", 888.0)
    assert rows[300] == ("c0", 777.0) and rows[2] == ("c2", 2.0)
    # partition layout survives the incremental import
    meta = eng.catalog.read_meta("p1", "in_c_main", "t4")
    assert meta.properties["partition_by"] == ["cat"]

    # a key MOVING partitions is erased from its old home
    mv = str(tmp_path / "p_mv.csv")
    with open(mv, "w") as f:
        f.write("id,cat,val\n2,c0,111.0\n")
    eng.import_file("p1", "in_c_main", "t4", mv, incremental=True,
                    dedup_mode="update_duplicates")
    df = eng.read_table("p1", "in_c_main", "t4")
    assert {r.cat for r in df.filter("id = 2").collect()} == {"c0"}
    assert df.count() == 91

    # do_nothing: existing key ignored, new key lands in its partition
    dn = str(tmp_path / "p_dn.csv")
    with open(dn, "w") as f:
        f.write("id,cat,val\n0,c1,123.0\n301,c1,5.0\n")
    before_c0 = part_files("cat=c0")
    eng.import_file("p1", "in_c_main", "t4", dn, incremental=True,
                    dedup_mode="do_nothing")
    assert part_files("cat=c0") == before_c0     # c0 untouched
    df = eng.read_table("p1", "in_c_main", "t4")
    rows = {r.id: (r.cat, r.val) for r in df.collect()}
    assert rows[0] == ("c0", 999.0)              # existing kept
    assert rows[301] == ("c1", 5.0)
    assert df.count() == 92

    # partition-scoped DELETE: rows deleted from c1 only — c0/c2 files
    # stay byte-identical
    before_c0 = part_files("cat=c0")
    before_c2 = part_files("cat=c2")
    out = eng.delete_rows("p1", "in_c_main", "t4", where="cat = 'c1'")
    assert out["rows_deleted"] > 0
    assert part_files("cat=c0") == before_c0
    assert part_files("cat=c2") == before_c2
    import os as _os
    assert not _os.path.isdir(_os.path.join(data_dir, "cat=c1"))
    df = eng.read_table("p1", "in_c_main", "t4")
    assert df.filter("cat = 'c1'").count() == 0
    assert df.count() == 92 - out["rows_deleted"]


def test_partitioned_delete_null_predicate_matches_full_path(spark,
                                                             tmp_path):
    """ADVICE r6: rows whose delete predicate evaluates NULL are dropped
    by the full-rewrite path (survivors = filter(~cond)); the
    partition-scoped path must agree — its deleted-set is the TRUE
    complement of survivors, so NULL-predicate rows land in the
    affected-partition probe regardless of which partition they share."""
    from keboola_storage_duckdb_spark.engine import StorageEngine

    eng = StorageEngine(spark, str(tmp_path / "whn"))
    eng.create_project("p1")
    eng.create_bucket("p1", "in_c_main")
    eng.create_table("p1", "in_c_main", "tn", [
        {"name": "id", "type": "INTEGER", "nullable": False},
        {"name": "cat", "type": "VARCHAR"},
        {"name": "val", "type": "DOUBLE"},
    ], primary_key=["id"])
    csv = str(tmp_path / "n_rows.csv")
    with open(csv, "w") as f:
        f.write("id,cat,val\n")
        for i in range(30):
            # val NULL for ids 0-9, all of them isolated in cat=cnull —
            # no TRUE-matching row shares their partition, the exact
            # layout that made the r6 bug visible
            v = "" if i < 10 else str(float(i))
            c = "cnull" if i < 10 else f"c{i % 2}"
            f.write(f"{i},{c},{v}\n")
    eng.import_file("p1", "in_c_main", "tn", csv)

    # full-rewrite ground truth on an identical unpartitioned twin
    eng.create_table("p1", "in_c_main", "tn_flat", [
        {"name": "id", "type": "INTEGER", "nullable": False},
        {"name": "cat", "type": "VARCHAR"},
        {"name": "val", "type": "DOUBLE"},
    ], primary_key=["id"])
    eng.import_file("p1", "in_c_main", "tn_flat", csv)
    out_flat = eng.delete_rows("p1", "in_c_main", "tn_flat",
                               where="val >= 15.0")

    eng.optimize_table("p1", "in_c_main", "tn", partition_by=["cat"])
    out_part = eng.delete_rows("p1", "in_c_main", "tn", where="val >= 15.0")

    # NULL-val rows (predicate NULL) deleted on BOTH paths
    assert out_part["rows_deleted"] == out_flat["rows_deleted"]
    ids_part = {r.id for r in
                eng.read_table("p1", "in_c_main", "tn").collect()}
    ids_flat = {r.id for r in
                eng.read_table("p1", "in_c_main", "tn_flat").collect()}
    assert ids_part == ids_flat == set(range(10, 15))


def test_branch_full_rewrite_resets_branch_partition_meta(spark, tmp_path):
    """ADVICE r6: a full import on a BRANCH copy of a partitioned table
    writes flat data — the branch meta's partition_by must reset too, or
    a later branch incremental would selective-rewrite hive leaves into
    the flat dir (mixed layout)."""
    from keboola_storage_duckdb_spark.engine import StorageEngine

    eng = StorageEngine(spark, str(tmp_path / "whb"))
    eng.create_project("p1")
    eng.create_bucket("p1", "in_c_main")
    eng.create_table("p1", "in_c_main", "tb", [
        {"name": "id", "type": "INTEGER", "nullable": False},
        {"name": "cat", "type": "VARCHAR"},
    ], primary_key=["id"])
    csv = str(tmp_path / "b_rows.csv")
    with open(csv, "w") as f:
        f.write("id,cat\n")
        for i in range(20):
            f.write(f"{i},c{i % 2}\n")
    eng.import_file("p1", "in_c_main", "tb", csv)
    eng.optimize_table("p1", "in_c_main", "tb", partition_by=["cat"])

    # branch full load → flat branch data; branch meta must drop the layout
    eng.import_file("p1", "in_c_main", "tb", csv, branch="dev")
    bmeta = eng.catalog.read_meta("p1", "in_c_main", "tb", "dev")
    assert bmeta.properties.get("partition_by") in ([], None)
    # main keeps its hive layout untouched
    mmeta = eng.catalog.read_meta("p1", "in_c_main", "tb")
    assert mmeta.properties["partition_by"] == ["cat"]

    # a later branch incremental stays consistent (no mixed layout)
    up = str(tmp_path / "b_up.csv")
    with open(up, "w") as f:
        f.write("id,cat\n0,c1\n99,c0\n")
    eng.import_file("p1", "in_c_main", "tb", up, incremental=True,
                    branch="dev")
    df = eng.read_table("p1", "in_c_main", "tb", "dev")
    rows = {r.id: r.cat for r in df.collect()}
    assert len(rows) == 21 and rows[0] == "c1" and rows[99] == "c0"
    # main unaffected
    assert eng.read_table("p1", "in_c_main", "tb").count() == 20


def test_register_project_views_cache_hit_returns_names(spark, tmp_path):
    """ADVICE r6 (low): a cache hit returns the same view-name list as a
    fresh registration — the documented ATTACH-equivalent contract."""
    from keboola_storage_duckdb_spark.engine import StorageEngine

    eng = StorageEngine(spark, str(tmp_path / "whv"))
    eng.create_project("p1")
    eng.create_bucket("p1", "in_c_main")
    eng.create_table("p1", "in_c_main", "tv", [
        {"name": "id", "type": "INTEGER", "nullable": False}])
    first = eng.register_project_views("p1")
    assert first == ["in_c_main_tv"]
    assert eng.register_project_views("p1") == first     # cache hit
    # a mutation invalidates; the list refreshes
    eng.create_table("p1", "in_c_main", "tv2", [
        {"name": "id", "type": "INTEGER", "nullable": False}])
    assert set(eng.register_project_views("p1")) == {
        "in_c_main_tv", "in_c_main_tv2"}


def test_bucketed_range_join_matches_theta_join(spark):
    """Bucketed interval join == the naive theta join, for bucket widths
    smaller/larger than the intervals, with and without extra equi keys;
    half-open boundaries and inverted intervals behave like the
    predicate."""
    from pyspark.sql import functions as F

    from keboola_storage_duckdb_spark.operators.rangejoin import (
        bucketed_range_join)

    pts = spark.createDataFrame(
        [(i, i % 3, float(v)) for i, v in enumerate(
            [0, 1, 5, 7, 10, 10, 12, 19, 20, 25, 33, 47])],
        "pid long, k int, t double")
    ivs = spark.createDataFrame(
        [(100, 0, 0.0, 10.0), (101, 1, 5.0, 5.0),     # empty interval
         (102, 2, 20.0, 12.0),                        # inverted
         (103, 0, 10.0, 21.0), (104, 1, 30.0, 50.0)],
        "iv long, k int, s double, e double")

    naive = {(r.pid, r.iv) for r in
             pts.alias("p").join(
                 ivs.alias("i"),
                 (F.col("t") >= F.col("s")) & (F.col("t") < F.col("e")))
                .select("pid", "iv").collect()}
    naive_k = {(r.pid, r.iv) for r in
               pts.alias("p").join(
                   ivs.alias("i"),
                   (F.col("t") >= F.col("s")) & (F.col("t") < F.col("e"))
                   & (F.col("p.k") == F.col("i.k")))
                  .select("pid", "iv").collect()}
    assert naive and naive_k
    for width in (1, 4, 16, 100):
        got = {(r.pid, r.iv) for r in
               bucketed_range_join(pts, ivs, "t", "s", "e",
                                   bucket=width).select("pid", "iv")
                                                .collect()}
        assert got == naive, width
        gotk = {(r.pid, r.iv) for r in
                bucketed_range_join(pts, ivs, "t", "s", "e", bucket=width,
                                    keys=["k"]).select("pid", "iv")
                                               .collect()}
        assert gotk == naive_k, width

    # AUTO width (bucket=None, VERDICT r6 #5): same exact result, and the
    # derived width is sane — positive, within the point domain
    from keboola_storage_duckdb_spark.operators.rangejoin import (
        auto_bucket_width)
    got = {(r.pid, r.iv) for r in
           bucketed_range_join(pts, ivs, "t", "s", "e")
           .select("pid", "iv").collect()}
    assert got == naive
    w = auto_bucket_width(pts, ivs, "t", "s", "e")
    assert 0 < w <= 47.0
    # degenerate inputs fall back instead of dividing by zero
    empty_iv = ivs.filter("iv < 0")
    assert auto_bucket_width(pts, empty_iv, "t", "s", "e") == 1.0
    assert bucketed_range_join(pts, empty_iv, "t", "s", "e").count() == 0


def test_hll_sketch_accuracy_and_mergeability(spark):
    """Raw HLL at m=4096: estimate within a few percent of the true
    distinct count at n >> m, and the sketch is MERGEABLE — register-wise
    max of two halves equals the whole corpus's registers (the property
    that makes it a shuffle-light 100 TB distinct)."""
    from pyspark.sql import functions as F

    from keboola_storage_duckdb_spark.functions.sketch import (
        hll_estimate, hll_register_table)

    n = 60_000
    df = spark.range(n).select(F.lit("g").alias("grp"),
                               F.col("id").cast("string").alias("v"))
    est = hll_estimate(df, "grp", "v").collect()[0]
    assert abs(est.hll_estimate - n) / n < 0.05

    a = hll_register_table(df.filter(F.crc32("v") % 2 == 0), "grp", "v")
    b = hll_register_table(df.filter(F.crc32("v") % 2 != 0), "grp", "v")
    merged = (a.unionByName(b).groupBy("g", "register")
               .agg(F.max("max_rho").alias("max_rho")))
    whole = hll_register_table(df, "grp", "v")
    assert (merged.exceptAll(whole).count() == 0
            and whole.exceptAll(merged).count() == 0)


def test_stream_hll_registers_equal_batch(spark, sf_dir, tmp_path):
    """Streaming HLL register state == the batch sketch over the same
    data, register for register (the mergeable max makes the streaming
    fold exact, with state bounded at groups x m rows)."""
    from keboola_storage_duckdb_spark.functions.sketch import (
        hll_register_table)
    from keboola_storage_duckdb_spark.streaming.events import (
        stream_hll_registers)

    ev = load_table(spark, sf_dir, "events").limit(2000)
    src = str(tmp_path / "hll_src")
    ev.write.parquet(src)
    got = stream_hll_registers(spark, src, ev.schema)
    q = (got.writeStream.format("memory").queryName("hll_stream")
            .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    stream_regs = {(r.g, r.register): r.max_rho for r in
                   spark.sql("select * from hll_stream").collect()}
    batch_regs = {(r.g, r.register): r.max_rho for r in
                  hll_register_table(ev, "event_type", "user_id").collect()}
    assert stream_regs == batch_regs and len(batch_regs) > 50


def test_cm_sketch_upper_bound_and_mergeability(spark):
    """Count-Min: estimates are one-sided upper bounds on true counts
    (equal when no collision), and summing two halves' counters equals
    the whole sketch — the additive-merge property."""
    from pyspark.sql import functions as F

    from keboola_storage_duckdb_spark.functions.sketch import (
        cm_estimate, cm_sketch_table)

    df = spark.range(20_000).select(
        (F.col("id") % 100).cast("string").alias("v"))
    items = df.distinct().withColumnRenamed("v", "item")
    est = {r.item: r.cm_estimate for r in
           cm_estimate(df, "v", items, "item", width=64).collect()}
    true_n = {r.v: r.n for r in
              df.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(est[k] >= n for k, n in true_n.items())
    # width=64 for 100 items forces collisions; at width=4096 none remain
    wide = {r.item: r.cm_estimate for r in
            cm_estimate(df, "v", items, "item", width=4096).collect()}
    assert wide == true_n

    a = cm_sketch_table(df.filter(F.crc32("v") % 2 == 0), "v")
    b = cm_sketch_table(df.filter(F.crc32("v") % 2 != 0), "v")
    merged = {(r.row, r.bucket): r.cnt for r in
              a.unionByName(b).groupBy("row", "bucket")
               .agg(F.sum("cnt").alias("cnt")).collect()}
    whole = {(r.row, r.bucket): r.cnt for r in
             cm_sketch_table(df, "v").collect()}
    assert merged == whole


def test_bottom_k_sample_mergeability(spark):
    """Bottom-k sampling: exactly k per group, deterministic, and the
    bottom-k of two halves' bottom-k samples equals the whole dataset's
    bottom-k — the merge property that lets partial samples combine
    without reshuffling raw data."""
    from pyspark.sql import functions as F

    from keboola_storage_duckdb_spark.functions.sketch import (
        bottom_k_sample)

    df = spark.range(5000).select(
        (F.col("id") % 4).cast("string").alias("grp"),
        F.col("id").cast("string").alias("doc"))
    whole = {(r.g, r.id) for r in
             bottom_k_sample(df, "grp", "doc", k=5).collect()}
    assert len(whole) == 20                    # 4 groups x k
    ha = bottom_k_sample(df.filter(F.crc32("doc") % 2 == 0),
                         "grp", "doc", k=5).select("g", "id")
    hb = bottom_k_sample(df.filter(F.crc32("doc") % 2 != 0),
                         "grp", "doc", k=5).select("g", "id")
    merged = {(r.g, r.id) for r in
              bottom_k_sample(ha.unionByName(hb), "g", "id", k=5)
              .collect()}
    assert merged == whole


def test_weighted_sample_deterministic_and_exact(spark):
    """weighted_sample's integer-md5 draws are reproducible and match a
    brute-force Python reimplementation row for row; k rows per group;
    zero-weight rows never selected."""
    import hashlib

    from keboola_storage_duckdb_spark.functions.sketch import weighted_sample

    rows = [("a", 1, 10), ("a", 2, 1), ("a", 3, 0),      # zero weight
            ("b", 4, 5), ("b", 5, 5)]
    df = spark.createDataFrame(rows, ["g", "id", "w"])
    got = {(r.group, r.draw): (r.id, r.weight)
           for r in weighted_sample(df, "g", "id", "w", k=4).collect()}
    assert len(got) == 8        # 4 draws x 2 groups

    # brute-force expectation
    data = {"a": [(1, 10), (2, 1)], "b": [(4, 5), (5, 5)]}
    for g, members in data.items():
        total = sum(w for _, w in members)
        cum, acc = [], 0
        for i, w in members:                 # ordered by id
            acc += w
            cum.append((i, w, acc))
        for d in range(1, 5):
            u = int(hashlib.md5(f"ws|{g}|{d}".encode())
                    .hexdigest()[:12], 16) % total
            sel = next((i, w) for i, w, c in cum if c > u)
            assert got[(g, d)] == sel, (g, d, u, got[(g, d)], sel)

    # reproducible across invocations
    again = {(r.group, r.draw): (r.id, r.weight)
             for r in weighted_sample(df, "g", "id", "w", k=4).collect()}
    assert got == again


def test_weighted_sample_proportionality(spark):
    """With a 99:1 weight split, the heavy row dominates the draws."""
    from keboola_storage_duckdb_spark.functions.sketch import weighted_sample

    df = spark.createDataFrame([("g", 1, 990), ("g", 2, 10)],
                               ["grp", "id", "w"])
    got = [r.id for r in
           weighted_sample(df, "grp", "id", "w", k=64).collect()]
    assert len(got) == 64
    assert got.count(1) > 55    # E[heavy] = 63.4; md5 draws are fixed


def test_auto_bucket_width_degenerate_domains(spark):
    """Round-7 review fixes: a single-instant point domain must NOT
    collapse the width to ~0 (that explodes each interval into
    len/width buckets — the exact scale-killer bucketing exists to
    avoid), and all-NULL point timestamps fall back cleanly instead of
    raising TypeError."""
    from keboola_storage_duckdb_spark.operators.rangejoin import (
        auto_bucket_width, bucketed_range_join)

    ivs = spark.createDataFrame(
        [(i, float(i * 10), float(i * 10 + 7)) for i in range(20)],
        ["iv", "s", "e"])
    one_t = spark.createDataFrame([(1, 55.0), (2, 55.0), (3, 55.0)],
                                  ["pid", "t"])
    w = auto_bucket_width(one_t, ivs, "t", "s", "e")
    assert w >= 7.0 / 4.0 - 1e-9       # never clamped to the 0-span domain
    got = {(r.pid, r.iv) for r in
           bucketed_range_join(one_t, ivs, "t", "s", "e")
           .select("pid", "iv").collect()}
    assert got == {(p, 5) for p in (1, 2, 3)}   # interval [50, 57)

    null_t = spark.createDataFrame(
        [(1, None), (2, None)],
        schema="pid int, t double")
    assert auto_bucket_width(null_t, ivs, "t", "s", "e") == 1.0
    assert bucketed_range_join(null_t, ivs, "t", "s", "e").count() == 0


def test_weighted_sample_rejects_nonintegral_weights(spark):
    """Fractional weights are excluded (truncate-vs-round cast divergence
    across engines); integer-valued DOUBLEs pass."""
    from keboola_storage_duckdb_spark.functions.sketch import weighted_sample

    df = spark.createDataFrame(
        [("g", 1, 5.0), ("g", 2, 1.6), ("g", 3, 0.4), ("g", 4, 3.0)],
        ["grp", "id", "w"])
    got = {r.id for r in weighted_sample(df, "grp", "id", "w", k=32).collect()}
    assert got <= {1, 4}               # 2 (fractional) and 3 (<1) excluded
    assert 1 in got                    # weight-5 row dominates draws


def test_cut_spans_null_text_is_empty_doc(spark):
    from keboola_storage_duckdb_spark.functions.spans import (
        cut_spans, duplicate_spans)

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, None)],
        schema="doc_id int, text string")
    spans = duplicate_spans(df, "doc_id", "text", k=4)
    out = {r.doc_id: r for r in
           cut_spans(df, spans, "doc_id", "text").collect()}
    assert out[3].clean_text == ""     # NULL text == empty doc, not NULL
    assert (out[3].kept_tokens, out[3].removed_tokens) == (0, 0)


def test_stream_bottom_k_matches_batch(spark, sf_dir, tmp_path):
    """Streaming bottom-k sample: GroupState carries at most k sample
    rows per group (bounded regardless of stream length) and the final
    sample equals the batch operator over the SAME RAW rows — repeated
    ids occupy one slot each on both sides (ADVICE r7 fix)."""
    from keboola_storage_duckdb_spark.functions.sketch import bottom_k_sample
    from keboola_storage_duckdb_spark.streaming.events import stream_bottom_k

    ev = load_table(spark, sf_dir, "events").limit(4000)
    src = str(tmp_path / "ev_bk")
    # several files -> several micro-batch merges under availableNow
    ev.repartition(4).write.parquet(src)
    got = stream_bottom_k(spark, src, ev.schema,
                          group_col="event_type", id_col="user_id", k=8)
    q = (got.writeStream.format("memory").queryName("bk_test")
            .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # update mode re-emits per batch: keep the LAST emission per group
    stream_rows = {(r.g, r.sample_rank): r.id for r in spark.sql(
        "select * from bk_test").collect()}

    batch = bottom_k_sample(spark.read.parquet(src),
                            "event_type", "user_id", k=8)
    batch_rows = {(r.g, r.sample_rank): r.id for r in batch.collect()}
    assert stream_rows == batch_rows


def test_stream_bottom_k_duplicate_rows(spark, tmp_path):
    """ADVICE r7: a repeated id must fill one sample slot PER occurrence
    in the streaming reservoir, exactly like the batch row_number — even
    when the occurrences arrive in different micro-batches."""
    from keboola_storage_duckdb_spark.functions.sketch import bottom_k_sample
    from keboola_storage_duckdb_spark.streaming.events import stream_bottom_k

    rows = ([("g1", 7)] * 5 + [("g1", i) for i in range(20, 26)]
            + [("g2", 3)] * 2)
    df = spark.createDataFrame(rows, "grp string, uid bigint")
    src = str(tmp_path / "dup_src")
    df.repartition(3).write.parquet(src)   # repeats split across batches
    got = stream_bottom_k(spark, src, df.schema,
                          group_col="grp", id_col="uid", k=4)
    q = (got.writeStream.format("memory").queryName("bk_dup")
            .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    stream_rows = {(r.g, r.sample_rank): r.id for r in
                   spark.sql("select * from bk_dup").collect()}
    batch_rows = {(r.g, r.sample_rank): r.id for r in
                  bottom_k_sample(df, "grp", "uid", k=4).collect()}
    assert stream_rows == batch_rows
    # g2 has 2 rows of one id -> both sampled; multiplicity preserved
    assert [stream_rows[("g2", i)] for i in (1, 2)] == [3, 3]


def test_stream_bottom_k_string_ids(spark, tmp_path):
    """r7 review fix: the streaming reservoir follows the id column's
    type like its batch twin — string ids must work."""
    from keboola_storage_duckdb_spark.functions.sketch import bottom_k_sample
    from keboola_storage_duckdb_spark.streaming.events import stream_bottom_k

    df = spark.createDataFrame(
        [("g1", f"sess-{i}") for i in range(20)]
        + [("g2", f"sess-{i}") for i in range(5)],
        "grp string, sid string")
    src = str(tmp_path / "sid_src")
    df.repartition(3).write.parquet(src)
    got = stream_bottom_k(spark, src, df.schema,
                          group_col="grp", id_col="sid", k=4)
    q = (got.writeStream.format("memory").queryName("bk_sid")
            .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    stream_rows = {(r.g, r.sample_rank): r.id for r in
                   spark.sql("select * from bk_sid").collect()}
    batch_rows = {(r.g, r.sample_rank): r.id for r in
                  bottom_k_sample(df, "grp", "sid", k=4).collect()}
    assert stream_rows == batch_rows
