"""DuckDB ⇄ Spark type-string mapping.

The reference passes DuckDB type strings verbatim from the API into CREATE
TABLE DDL (reference src/database.py:4353-4370; driver protocol constrains
filter datatypes to STRING|INTEGER|DOUBLE|BIGINT|REAL|DECIMAL|TIMESTAMP,
proto/table.proto ImportExportShared.DataType). We accept the same strings and
translate to Spark SQL DDL types; one table is used by CREATE TABLE, ADD/ALTER
COLUMN, and the typed where-filter's try_cast.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# Canonical DuckDB→Spark name map (upper-cased lookup). Parametrized types
# (DECIMAL(p,s), VARCHAR(n)) are handled in duckdb_to_spark_type.
_DUCK_TO_SPARK: dict[str, str] = {
    "VARCHAR": "STRING",
    "TEXT": "STRING",
    "STRING": "STRING",
    "CHAR": "STRING",
    "BPCHAR": "STRING",
    "BOOLEAN": "BOOLEAN",
    "BOOL": "BOOLEAN",
    "LOGICAL": "BOOLEAN",
    "TINYINT": "TINYINT",
    "INT1": "TINYINT",
    "SMALLINT": "SMALLINT",
    "INT2": "SMALLINT",
    "SHORT": "SMALLINT",
    "INTEGER": "INT",
    "INT": "INT",
    "INT4": "INT",
    "SIGNED": "INT",
    "BIGINT": "BIGINT",
    "INT8": "BIGINT",
    "LONG": "BIGINT",
    # Unsigned / oversized integers widen to the next signed container.
    "UTINYINT": "SMALLINT",
    "USMALLINT": "INT",
    "UINTEGER": "BIGINT",
    "UBIGINT": "DECIMAL(20,0)",
    "HUGEINT": "DECIMAL(38,0)",
    "UHUGEINT": "DECIMAL(38,0)",
    "REAL": "FLOAT",
    "FLOAT4": "FLOAT",
    "FLOAT": "FLOAT",
    "DOUBLE": "DOUBLE",
    "FLOAT8": "DOUBLE",
    "NUMERIC": "DECIMAL(18,3)",  # DuckDB default DECIMAL(18,3)
    "DECIMAL": "DECIMAL(18,3)",
    "DATE": "DATE",
    "TIME": "STRING",  # Spark has no TIME type; keep ISO string
    "TIMESTAMP": "TIMESTAMP",
    "DATETIME": "TIMESTAMP",
    "TIMESTAMPTZ": "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE": "TIMESTAMP",
    "TIMESTAMP_S": "TIMESTAMP",
    "TIMESTAMP_MS": "TIMESTAMP",
    "TIMESTAMP_NS": "TIMESTAMP",
    "INTERVAL": "INTERVAL DAY TO SECOND",
    "BLOB": "BINARY",
    "BYTEA": "BINARY",
    "BINARY": "BINARY",
    "VARBINARY": "BINARY",
    "UUID": "STRING",
    "JSON": "STRING",
}

_SPARK_TO_DUCK: dict[str, str] = {
    "STRING": "VARCHAR",
    "BOOLEAN": "BOOLEAN",
    "TINYINT": "TINYINT",
    "BYTE": "TINYINT",
    "SMALLINT": "SMALLINT",
    "INT": "INTEGER",
    "INTEGER": "INTEGER",
    "BIGINT": "BIGINT",
    "LONG": "BIGINT",
    "FLOAT": "REAL",
    "DOUBLE": "DOUBLE",
    "DATE": "DATE",
    "TIMESTAMP": "TIMESTAMP",
    "BINARY": "BLOB",
}

_PARAM_RE = re.compile(r"^\s*(DECIMAL|NUMERIC)\s*\(\s*(\d+)\s*,?\s*(\d+)?\s*\)\s*$", re.I)
_VARCHAR_RE = re.compile(r"^\s*(VARCHAR|CHAR|BPCHAR)\s*\(\s*\d+\s*\)\s*$", re.I)
_LIST_RE = re.compile(r"^\s*(.+?)\s*\[\s*\]\s*$")


def duckdb_to_spark_type(duck_type: str) -> str:
    """Translate a DuckDB type string to a Spark SQL DDL type string."""
    s = duck_type.strip()
    m = _LIST_RE.match(s)
    if m:  # FLOAT[] → ARRAY<FLOAT> (embeddings; beyond the flat reference model)
        return f"ARRAY<{duckdb_to_spark_type(m.group(1))}>"
    m = _PARAM_RE.match(s)
    if m:
        prec = int(m.group(2))
        scale = int(m.group(3) or 0)
        prec = min(prec, 38)
        return f"DECIMAL({prec},{min(scale, prec)})"
    if _VARCHAR_RE.match(s):
        return "STRING"
    mapped = _DUCK_TO_SPARK.get(s.upper())
    if mapped is None:
        raise ValueError(f"Unsupported column type: {duck_type!r}")
    return mapped


def spark_to_duckdb_type(spark_type: str) -> str:
    """Inverse mapping (for introspection responses that speak DuckDB types)."""
    s = spark_type.strip().upper()
    m = re.match(r"^DECIMAL\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$", s)
    if m:
        return f"DECIMAL({m.group(1)},{m.group(2)})"
    m = re.match(r"^ARRAY<(.+)>$", s)
    if m:
        return f"{spark_to_duckdb_type(m.group(1))}[]"
    mapped = _SPARK_TO_DUCK.get(s)
    if mapped is None:
        raise ValueError(f"Unsupported Spark type: {spark_type!r}")
    return mapped


def struct_from_columns(columns: list[dict]) -> T.StructType:
    """Build a StructType from the reference's column dicts
    ``{"name", "type", "nullable"?, "default"?}`` (reference
    src/models/responses.py:174-183)."""
    fields = []
    for col in columns:
        spark_ddl = duckdb_to_spark_type(col["type"])
        dt = T._parse_datatype_string(spark_ddl)
        fields.append(T.StructField(col["name"], dt, bool(col.get("nullable", True))))
    return T.StructType(fields)
