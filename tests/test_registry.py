"""Registry contract pins — the driver-facing invariants NOTES documents:
the first 50 `queries()` slots are the certification window, every query
has an oracle twin unless deliberately rows-only, and the mapping stays
duplicate-free. A broken rotation silently costs a round of
certification, so pin it."""

from __future__ import annotations

import __spark_entry__ as E

# deliberately rows-only (iterative / no SQL-expressible shape); anything
# else missing an oracle is a registry bug
ROWS_ONLY = {"kmeans", "bfd_pack"}


def test_every_query_has_an_oracle_twin():
    q = list(E.queries())
    o = E.oracle_sql()
    assert len(q) == len(set(q))
    missing = [n for n in q if n not in o and n not in ROWS_ONLY]
    assert not missing, missing
    stale = [n for n in o if n not in q]
    assert not stale, stale           # oracle without a query is dead code


def test_certification_window_is_full():
    q = list(E.queries())
    assert len(q) >= 50, "driver certifies slots 1-50; keep them filled"
    window = q[:50]
    # every window entry must be oracle-backed or known rows-only —
    # a rows-only query only gets the weaker row-count check there
    o = E.oracle_sql()
    unbacked = [n for n in window if n not in o and n not in ROWS_ONLY]
    assert not unbacked, unbacked


def test_oracle_result_types_are_spark_representable():
    """Oracle-exactness rule (VERDICT r7 #2): the driver's hash is
    TYPE-sensitive, and DuckDB silently widens integer window/group SUMs
    to HUGEINT (int128) — a type Spark cannot emit, so values match but
    hashes don't (shipped twice: r01/r02 `sessionize`, r07
    `pack_sequences`). Probe every oracle's result schema via DuckDB's
    lazy relation types (no execution) and fail on any unsigned /
    128-bit integer column. Fix is always `CAST(... AS BIGINT)` at the
    point the SUM reaches the output."""
    import duckdb

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    banned = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT",
              "UTINYINT")
    offenders = []
    for name, sql in E.oracle_sql().items():
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if any(b in t for b in banned):
                offenders.append(f"{name}.{col}: {t}")
    assert not offenders, (
        "oracle columns with Spark-unrepresentable DuckDB types "
        f"(CAST them AS BIGINT): {offenders}")


def test_certified_oracle_outputs_no_complex_types():
    """Oracle-exactness rule (VERDICT r8 #2): the driver's pandas row
    canonicalizer sorts rows across all columns and dies on unhashable
    cells — `TypeError: unhashable type: 'list'` was the r08
    `quality_verdict` red, the THIRD hash-class (after HUGEINT and
    ns-timestamps) the local tuple-sort gate structurally cannot see
    (Python tuples compare lists fine). Ban ARRAY/MAP/STRUCT output
    columns in the certification window (slots 1-50): `array_join` /
    `to_json` them on BOTH sides instead. Parked (51+) entries may keep
    complex outputs — they are never driver-hashed — but must be
    flattened before any rotation into the window."""
    import duckdb

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    window = set(list(E.queries())[:50])
    oracles = E.oracle_sql()
    offenders = []
    for name in window:
        sql = oracles.get(name)
        if sql is None:          # rows-only: no hash, no canon sort
            continue
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ)
            if "[]" in t or t.upper().startswith(("MAP(", "STRUCT(")):
                offenders.append(f"{name}.{col}: {t}")
    assert not offenders, (
        "certified oracle columns with complex types the driver canon "
        f"cannot sort (array_join/to_json them on both sides): {offenders}")


def test_oracle_sql_mentions_no_forbidden_libm():
    """Oracle-exactness rule (README correctness discipline): no
    pow/exp/log in oracle SQL — libm differs across engines. sqrt and
    integer ops only. (log-free HLL uses shifts; moments use power
    sums.)"""
    import re

    for name, sql in E.oracle_sql().items():
        low = sql.lower()
        for fn in ("pow(", "power(", "exp(", "ln(", "log(", "log2(",
                   "log10("):
            # allow inside words (e.g. 'explode') — match as call tokens
            for m in re.finditer(re.escape(fn), low):
                start = m.start()
                if start == 0 or not (low[start - 1].isalnum()
                                      or low[start - 1] == "_"):
                    raise AssertionError(f"{name} uses {fn}")
