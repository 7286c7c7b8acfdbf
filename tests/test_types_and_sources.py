"""Type mapping (§1.2) and ns-timestamp parquet loading."""

import datetime

import pytest

from keboola_storage_duckdb_spark.catalog.types import (
    duckdb_to_spark_type,
    spark_to_duckdb_type,
    struct_from_columns,
)


def test_duckdb_to_spark_scalars():
    assert duckdb_to_spark_type("VARCHAR") == "STRING"
    assert duckdb_to_spark_type("varchar(255)") == "STRING"
    assert duckdb_to_spark_type("INTEGER") == "INT"
    assert duckdb_to_spark_type("BIGINT") == "BIGINT"
    assert duckdb_to_spark_type("DOUBLE") == "DOUBLE"
    assert duckdb_to_spark_type("HUGEINT") == "DECIMAL(38,0)"
    assert duckdb_to_spark_type("DECIMAL(10,2)") == "DECIMAL(10,2)"
    assert duckdb_to_spark_type("TIMESTAMPTZ") == "TIMESTAMP"
    assert duckdb_to_spark_type("FLOAT[]") == "ARRAY<FLOAT>"
    with pytest.raises(ValueError):
        duckdb_to_spark_type("GEOMETRY")


def test_roundtrip_to_duckdb():
    assert spark_to_duckdb_type("STRING") == "VARCHAR"
    assert spark_to_duckdb_type("DECIMAL(12,3)") == "DECIMAL(12,3)"
    assert spark_to_duckdb_type("ARRAY<FLOAT>") == "REAL[]"


def test_struct_from_columns(spark):  # parsing DDL strings needs the JVM
    st = struct_from_columns([
        {"name": "id", "type": "INTEGER", "nullable": False},
        {"name": "name", "type": "VARCHAR"},
        {"name": "ts", "type": "TIMESTAMP"},
    ])
    assert [f.name for f in st.fields] == ["id", "name", "ts"]
    assert st.fields[0].nullable is False
    assert st.fields[1].dataType.simpleString() == "string"


def test_ns_timestamp_load_matches_duckdb(spark, sf_dir, duck):
    """events.ts is timestamp[ns]; our loader must truncate exactly like
    DuckDB (epoch_us == ns // 1000)."""
    from keboola_storage_duckdb_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    got = {r.event_id: r.ts for r in ev.orderBy("event_id").limit(50).collect()}
    want = dict(duck.execute(
        "SELECT event_id, ts FROM events ORDER BY event_id LIMIT 50").fetchall())
    assert got == want


def test_unannotated_us_timestamp_loads_as_timestamp(spark, tmp_path):
    """A parquet timestamp[us] column with NO UTC-adjustment annotation must
    load as TimestampType (not TIMESTAMP_NTZ), regardless of the session's
    inferTimestampNTZ setting — DuckDB reads the same file as plain
    TIMESTAMP, and unix_micros() rejects NTZ. The loader must be invariant
    to how a fixture writer serializes timestamps (second regeneration
    breakage after ns->us)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from keboola_storage_duckdb_spark.sources.tables import load_table

    pq.write_table(
        pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            # tz-naive us timestamps -> parquet TIMESTAMP(MICROS,
            # isAdjustedToUTC=false)
            "ts": pa.array(
                [datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
                 datetime.datetime(2024, 6, 7, 8, 9, 10),
                 None],
                pa.timestamp("us")),
        }),
        str(tmp_path / "naive.parquet"),
    )
    prev = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        df = load_table(spark, str(tmp_path), "naive")
        assert dict(df.dtypes)["ts"] == "timestamp"
        from pyspark.sql import functions as F
        micros = [r[0] for r in
                  df.orderBy("id").select(F.unix_micros("ts")).collect()]
        assert micros == [1704164645123456, 1717747750000000, None]
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", prev)


def test_register_views(spark, sf_dir):
    from keboola_storage_duckdb_spark.sources.tables import register_views

    register_views(spark, sf_dir, ["nation", "region"], prefix="kb_")
    n = spark.sql("""
        SELECT r_name, COUNT(*) AS n FROM kb_nation
        JOIN kb_region ON n_regionkey = r_regionkey GROUP BY r_name""").count()
    assert n == 5


def test_infer_csv_schema(spark, tmp_path):
    from keboola_storage_duckdb_spark.sources.infer import infer_csv_schema

    p = str(tmp_path / "sample.csv")
    with open(p, "w") as f:
        f.write("id,name,price,active,created,big\n")
        f.write("1,alpha,9.99,true,2024-01-02,9999999999\n")
        f.write("2,beta,12,false,2024-01-03,3\n")
        f.write("3,,0.5,true,2024-01-04 10:00:00,4\n")
    got = {c["name"]: c for c in infer_csv_schema(spark, p)}
    assert got["id"]["type"] == "INTEGER"
    assert got["name"]["type"] == "VARCHAR" and got["name"]["nullable"]
    assert got["price"]["type"] == "DOUBLE"
    assert got["active"]["type"] == "BOOLEAN"
    assert got["created"]["type"] == "TIMESTAMP"  # DATE widened by 3rd row
    assert got["big"]["type"] == "BIGINT"
