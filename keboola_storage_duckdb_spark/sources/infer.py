"""CSV schema inference (the reference CLI's client-side feature,
reference cli/src/keboola_duckdb_cli/commands/tables.py:18-86: regex-sample
100 rows → INTEGER/BIGINT/DOUBLE/BOOLEAN/DATE/TIMESTAMP/VARCHAR).

The service-side schema is always declared (SURVEY §1.2); this is the
convenience layer that builds the declaration from a sample. Re-expressed
on Spark: read the first ``sample_rows`` lines as strings (bounded driver
work — never a full-file scan), classify each column by regex vote, widen
to the most general type seen. Unlike ``inferSchema=true`` this never
triggers a second full pass over a 100 TB staging file.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

_INT = re.compile(r"^[+-]?\d+$")
_DOUBLE = re.compile(r"^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$")
_BOOL = re.compile(r"^(true|false|t|f|0|1)$", re.IGNORECASE)
_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_TS = re.compile(r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}(:\d{2}(\.\d+)?)?$")

_INT32_MIN, _INT32_MAX = -2 ** 31, 2 ** 31 - 1

# widening lattice: anything conflicting falls through to VARCHAR
_WIDEN = {
    ("INTEGER", "BIGINT"): "BIGINT",
    ("INTEGER", "DOUBLE"): "DOUBLE",
    ("BIGINT", "DOUBLE"): "DOUBLE",
    ("DATE", "TIMESTAMP"): "TIMESTAMP",
}


def _classify(value: str) -> str | None:
    if value == "":
        return None  # nulls don't vote
    if _BOOL.match(value) and not _INT.match(value):
        # bare 0/1 count as integers, like the reference
        return "BOOLEAN"
    if _INT.match(value):
        v = int(value)
        return "INTEGER" if _INT32_MIN <= v <= _INT32_MAX else "BIGINT"
    if _DOUBLE.match(value):
        return "DOUBLE"
    if _DATE.match(value):
        return "DATE"
    if _TS.match(value):
        return "TIMESTAMP"
    return "VARCHAR"


def _merge(a: str | None, b: str | None) -> str | None:
    if a is None:
        return b
    if b is None or a == b:
        return a
    return _WIDEN.get((a, b)) or _WIDEN.get((b, a)) or "VARCHAR"


def infer_csv_schema(spark: SparkSession, path: str,
                     sample_rows: int = 100, header: bool = True,
                     sep: str = ",") -> list[dict]:
    """Infer ``[{"name", "type", "nullable"}, …]`` (DuckDB type strings, the
    engine's declared-schema currency) from a bounded CSV sample."""
    raw = (spark.read.option("header", header).option("sep", sep)
                .option("inferSchema", False).csv(path))
    names = raw.columns
    sample = raw.limit(sample_rows).collect()
    types: dict[str, str | None] = {c: None for c in names}
    saw_null: dict[str, bool] = {c: False for c in names}
    for row in sample:
        for c in names:
            v = row[c]
            if v is None or v == "":
                saw_null[c] = True
                continue
            types[c] = _merge(types[c], _classify(v))
    return [{"name": c,
             "type": types[c] or "VARCHAR",
             "nullable": saw_null[c]} for c in names]
