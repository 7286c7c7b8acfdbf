"""Predicate operators: the reference's export/delete filter surface.

Covers SURVEY.md §2.2:
  P2 raw WHERE with injection blacklist (reference src/database.py:5086-5094)
  P3 typed where-filter grammar  (proto TableWhereFilter; impl
     src/grpc/handlers/schema.py:406-432)
  P4 changeSince / changeUntil   (src/grpc/handlers/schema.py:400-404)
  P5 fulltext search             (proto ExportFilters.fulltextSearch)
  P6 ref-table subquery filter   (proto DeleteTableRowsCommand.WhereRefTableFilter)
  P7 empty-string→NULL coercion  (proto ImportOptions)

All filters compile to Catalyst ``Column`` expressions so predicate pushdown
into the parquet scan happens for free; none of these require UDFs.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..catalog.types import duckdb_to_spark_type

# Operator tokens of the driver grammar (proto ImportExportShared.Operator).
_OPS = {
    "eq": lambda c, v: c == v,
    "ne": lambda c, v: c != v,
    "gt": lambda c, v: c > v,
    "ge": lambda c, v: c >= v,
    "lt": lambda c, v: c < v,
    "le": lambda c, v: c <= v,
}

# The reference's injection blacklist for raw WHERE clauses
# (src/database.py:5086-5094): reject statement separators, comments and DDL.
_FORBIDDEN_TOKENS = (";", "--", "/*", "*/")
_FORBIDDEN_WORDS = ("drop", "truncate", "alter", "insert", "update", "delete",
                    "create", "attach", "detach", "pragma", "copy")


class WhereClauseError(ValueError):
    pass


def validate_raw_where(clause: str) -> str:
    """Mirror the reference's blacklist check before accepting a raw SQL
    condition; returns the clause if acceptable."""
    low = clause.lower()
    for tok in _FORBIDDEN_TOKENS:
        if tok in low:
            raise WhereClauseError(f"forbidden token {tok!r} in where clause")
    words = set(low.replace("(", " ").replace(")", " ").split())
    for w in _FORBIDDEN_WORDS:
        if w in words:
            raise WhereClauseError(f"forbidden keyword {w!r} in where clause")
    return clause


def raw_where(clause: str) -> Column:
    """P2: free-text SQL condition → Column (after blacklist validation)."""
    return F.expr(validate_raw_where(clause))


def typed_where(column: str, op: str, values: Iterable, data_type: str | None = None) -> Column:
    """P3: one TableWhereFilter → Column.

    Semantics (reference src/grpc/handlers/schema.py:406-432): with a
    dataType, the *column* is TRY_CAST to it before comparison; a single
    value compiles to ``col <op> v``, multiple values to ``col IN (…)``
    (only valid for eq; ne with N values compiles to NOT IN, matching
    DuckDB's `col != ALL`? the reference only emits IN for eq-shaped ops).
    """
    values = list(values)
    if not values:
        raise WhereClauseError("typed where-filter requires at least one value")
    if op not in _OPS:
        raise WhereClauseError(f"unknown operator {op!r}")
    col: Column = F.col(column)
    if data_type:
        col = col.try_cast(duckdb_to_spark_type(data_type))
    if len(values) == 1:
        return _OPS[op](col, F.lit(values[0]))
    if op == "eq":
        return col.isin(values)
    if op == "ne":
        return ~col.isin(values)
    raise WhereClauseError(f"operator {op!r} does not accept multiple values")


def combine_where(filters: Iterable[Column]) -> Column | None:
    """AND-combine a list of filter Columns (the grammar is conjunctive)."""
    out = None
    for f in filters:
        out = f if out is None else (out & f)
    return out


def change_interval(since: str | None = None, until: str | None = None,
                    column: str = "_timestamp") -> Column:
    """P4: changeSince/changeUntil on the system ``_timestamp`` column."""
    conds = []
    if since is not None:
        conds.append(F.col(column) >= F.lit(since).cast("timestamp"))
    if until is not None:
        conds.append(F.col(column) <= F.lit(until).cast("timestamp"))
    if not conds:
        raise WhereClauseError("change_interval needs since and/or until")
    out = combine_where(conds)
    assert out is not None
    return out


def fulltext_search(df: DataFrame, query: str, columns: list[str] | None = None) -> Column:
    """P5: substring match across all (string-rendered) columns.

    Concatenate with a \\x01 separator so the needle can't span column
    boundaries, then substring-search. Stays JVM-side (no UDF).
    """
    cols = columns or df.columns
    rendered = [F.col(c).cast("string") for c in cols]
    return F.concat_ws("\x01", *[F.coalesce(c, F.lit("")) for c in rendered]).contains(query)


def ref_table_filter(df: DataFrame, column: str, mode: str,
                     ref_df: DataFrame, ref_column: str) -> DataFrame:
    """P6: WhereRefTableFilter — keep rows whose ``column`` is IN / NOT_IN
    the set of ``ref_column`` values of another table.

    Implemented as a left-semi / left-anti join: distributed, no collect,
    and broadcastable when the reference side is small. At 100 TB the ref
    side is typically a small lookup table → Catalyst/AQE picks broadcast.
    """
    ref = ref_df.select(F.col(ref_column).alias("__ref_val")).distinct()
    how = {"IN": "left_semi", "NOT_IN": "left_anti"}.get(mode.upper().replace(" ", "_"))
    if how is None:
        raise WhereClauseError(f"unknown ref-table mode {mode!r}")
    return df.join(ref, on=df[column] == ref["__ref_val"], how=how)


def empty_to_null(df: DataFrame, columns: Iterable[str]) -> DataFrame:
    """P7: convertEmptyValuesToNullOnColumns — '' → NULL on given columns."""
    out = df
    for c in columns:
        out = out.withColumn(c, F.when(F.col(c) == F.lit(""), F.lit(None)).otherwise(F.col(c)))
    return out
