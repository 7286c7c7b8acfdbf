"""Registry contract pins — the driver-facing invariants NOTES documents:
the first 50 `queries()` slots are the certification window, every query
has an oracle twin unless deliberately rows-only, and the mapping stays
duplicate-free. A broken rotation silently costs a round of
certification, so pin it."""

from __future__ import annotations

import __spark_entry__ as E

# deliberately rows-only (iterative / no SQL-expressible shape); anything
# else missing an oracle is a registry bug
ROWS_ONLY = {"kmeans"}


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
