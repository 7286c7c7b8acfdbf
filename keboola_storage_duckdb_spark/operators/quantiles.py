"""Bounded-memory EXACT quantiles (A6) — two-pass selection by histogram.

Spark's built-in ``percentile()`` (like DuckDB's ``quantile_cont``,
reference src/database.py:5372-5386) buffers every value of the column in
one aggregation buffer: exact, but O(column) driver-side-style memory in a
single executor buffer — fine at sf0.1, OOM-bait at 6 B rows. This module
computes the SAME interpolated order statistics with bounded memory:

1. one scan: per-column non-null count / min / max;
2. one scan per refinement round (almost always exactly one): equal-width
   bin counts + per-bin min/max for every (column, active range) — the
   shuffle carries at most ``bins`` rows per column per partition thanks to
   map-side partial aggregation;
3. the driver walks cumulative bin counts to locate each needed global rank
   (lower/upper order statistic of each requested probability), then either
   resolves it immediately (degenerate bin: min == max), recurses into the
   bin (count > ``max_inbin`` — range shrinks every round, so depth is
   bounded by the float64 mantissa), or marks it for
4. one final scan: in-bin selection — rows of the few needed bins are
   grouped per probe and sorted (``sort_array(collect_list)``), a buffer
   bounded by ``max_inbin`` values, and the target order statistic is read
   with ``element_at``.

Interpolation uses Spark Percentile.getPercentile's own formula
(``(higher - position) * lower + (position - lower) * higher`` at position
``p * (n - 1)``, integer positions special-cased) with the same IEEE-754
op order, so the result is bit-identical to ``percentile()`` — verified by
tests against the built-in at every fixture SF. (The one-sided form
``lo + (hi - lo) * frac`` is NOT bit-safe: it disagrees in the last ulp on
real data, observed on orders.o_totalprice.)

At 100 TB this is the only viable exact-quantile shape: every scan is a
narrow projection with map-side-combined aggregation; nothing larger than
``bins`` rows per column crosses a shuffle until the final bounded in-bin
sort.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["exact_quantile_order_stats", "exact_quantiles",
           "exact_quantiles_grouped"]


def _rank_set(n: int, probs: list[float]) -> dict[float, tuple[int, int, float]]:
    """For each probability: (lower_rank, higher_rank, position) at
    position p*(n-1), 0-based — Spark Percentile.getPercentile's
    arithmetic."""
    out = {}
    for p in probs:
        pos = p * (n - 1)
        out[p] = (int(math.floor(pos)), int(math.ceil(pos)), pos)
    return out


def _interp(lo_rank: int, hi_rank: int, pos: float,
            lo_val: float, hi_val: float) -> float:
    """Spark Percentile's exact interpolation, same IEEE op order:
    ``(higher - position) * lower + (position - lower) * higher`` with the
    integer-position special case (Percentile.getPercentile)."""
    if lo_rank == hi_rank:
        return lo_val
    return (hi_rank - pos) * lo_val + (pos - lo_rank) * hi_val


def exact_quantile_order_stats(df: DataFrame, cols: list[str],
                               probs: list[float], bins: int = 4096,
                               max_inbin: int = 4_000_000,
                               ) -> dict[str, dict[float, tuple]]:
    """Resolve every (col, prob) to ``(lower_value, higher_value,
    interpolated_value)`` — the two exact order statistics Spark's
    percentile interpolates between, plus the interpolation computed with
    Spark's own formula — with bounded memory. Returns
    ``{col: {prob: (lo_val, hi_val, value) | None}}`` (None when the
    column has no non-null values). Columns are evaluated as DOUBLE.
    """
    spark = df.sparkSession
    # NaN → NULL in the scan base: Spark orders NaN ABOVE every double
    # (and `NaN >= x` is true), so a NaN would poison min/max (width NaN
    # → null bin ids) and leak into range predicates. percentile() still
    # COUNTS NaN and resolves top ranks to NaN — reproduced below from
    # the separate nan__ count, so results stay bit-identical.
    casts = {c: F.col(c).cast("double") for c in cols}
    base = df.select(*[F.when(~F.isnan(casts[c]), casts[c]).alias(c)
                       for c in cols])

    stats = df.agg(*[e for c in cols for e in (
        F.count(casts[c]).alias(f"n__{c}"),
        F.count(F.when(F.isnan(casts[c]), True)).alias(f"nan__{c}"),
        F.min(F.when(~F.isnan(casts[c]), casts[c])).alias(f"min__{c}"),
        F.max(F.when(~F.isnan(casts[c]), casts[c])).alias(f"max__{c}"),
        )]).first()

    resolved: dict[tuple[str, int], float] = {}   # (col, rank) -> value
    # active probes: (col, rank, range_lo, range_hi, offset) — offset =
    # number of the column's non-null values strictly below range_lo.
    probes: list[tuple[str, int, float, float, int]] = []
    # selection probes: (col, lo, hi, rank, local_rank)
    selection: list[tuple[str, float, float, int, int]] = []
    ranks_by_col: dict[str, dict[float, tuple[int, int, float]]] = {}

    def _route(c: str, rank: int, lo: float, hi: float, offset: int,
               out_probes: list) -> None:
        # refinement needs a finite positive bin width; a range whose
        # (hi-lo)/bins is 0 (denormal underflow) or non-finite would
        # yield null bin ids — resolve such ranges by direct selection
        w = (hi - lo) / bins
        if math.isfinite(w) and w > 0:
            out_probes.append((c, rank, lo, hi, offset))
        else:
            selection.append((c, lo, hi, rank, rank - offset))

    for c in cols:
        n = stats[f"n__{c}"]
        m = n - stats[f"nan__{c}"]          # non-NaN count
        cmin, cmax = stats[f"min__{c}"], stats[f"max__{c}"]
        if not n:
            ranks_by_col[c] = {}
            continue
        ranks_by_col[c] = _rank_set(n, probs)
        needed = sorted({r for lo, hi, _ in ranks_by_col[c].values()
                         for r in (lo, hi)})
        for r in needed:
            if r >= m:                      # NaN region: top of the order
                resolved[(c, r)] = float("nan")
            elif cmin == cmax:
                resolved[(c, r)] = cmin
            else:
                _route(c, r, cmin, cmax, 0, probes)

    while probes:
        # group probes by (col, range) → one histogram task each
        tasks: dict[tuple[str, float, float], int] = {}
        for c, _r, lo, hi, _o in probes:
            tasks.setdefault((c, lo, hi), len(tasks))
        entries = []
        for (c, lo, hi), tid in tasks.items():
            w = (hi - lo) / bins
            v = F.col(c)
            idx = F.least(F.lit(bins - 1),
                          F.floor((v - F.lit(lo)) / F.lit(w))).cast("int")
            entries.append(
                F.when((v >= F.lit(lo)) & (v <= F.lit(hi)),
                       F.struct(F.lit(tid).alias("tid"), idx.alias("bin"),
                                v.alias("v"))))
        hist = (base.select(F.explode(F.array(*entries)).alias("e"))
                    .filter(F.col("e").isNotNull())
                    .groupBy(F.col("e.tid").alias("tid"),
                             F.col("e.bin").alias("bin"))
                    .agg(F.count(F.lit(1)).alias("cnt"),
                         F.min("e.v").alias("bmin"),
                         F.max("e.v").alias("bmax"))
                    .collect())
        by_task: dict[int, list] = {}
        for row in hist:
            by_task.setdefault(row.tid, []).append(row)
        for t in by_task.values():
            t.sort(key=lambda r: r.bin)

        nxt = []
        for c, rank, lo, hi, offset in probes:
            cum = offset
            for b in by_task.get(tasks[(c, lo, hi)], []):
                if rank < cum + b.cnt:
                    if b.bmin == b.bmax:
                        resolved[(c, rank)] = b.bmin
                    elif b.cnt <= max_inbin:
                        selection.append((c, b.bmin, b.bmax, rank, rank - cum))
                    else:
                        _route(c, rank, b.bmin, b.bmax, cum, nxt)
                    break
                cum += b.cnt
        probes = nxt

    if selection:
        # dedupe probe groups by (col, range); several ranks may share one
        groups: dict[tuple[str, float, float], int] = {}
        for c, lo, hi, _r, _lr in selection:
            groups.setdefault((c, lo, hi), len(groups))
        entries = [F.when((F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi)),
                          F.struct(F.lit(pid).alias("pid"),
                                   F.col(c).alias("v")))
                   for (c, lo, hi), pid in groups.items()]
        sorted_bins = (base.select(F.explode(F.array(*entries)).alias("e"))
                           .filter(F.col("e").isNotNull())
                           .groupBy(F.col("e.pid").alias("pid"))
                           .agg(F.sort_array(F.collect_list("e.v"))
                                 .alias("vs")))
        want = spark.createDataFrame(
            [(groups[(c, lo, hi)], lr, i)
             for i, (c, lo, hi, _r, lr) in enumerate(selection)],
            "pid int, lr int, k int")
        got = (sorted_bins.join(F.broadcast(want), "pid")
                          .select("k", F.element_at("vs", F.col("lr") + 1)
                                        .alias("v")).collect())
        vals = {row.k: row.v for row in got}
        for i, (c, _lo, _hi, rank, _lr) in enumerate(selection):
            resolved[(c, rank)] = vals[i]

    out: dict[str, dict[float, tuple]] = {}
    for c in cols:
        out[c] = {}
        for p in probs:
            rs = ranks_by_col[c].get(p)
            if rs is None:
                out[c][p] = None
            else:
                lo_v, hi_v = resolved[(c, rs[0])], resolved[(c, rs[1])]
                out[c][p] = (lo_v, hi_v,
                             _interp(rs[0], rs[1], rs[2], lo_v, hi_v))
    return out


def exact_quantiles_grouped(df: DataFrame, group_col: str, value_col: str,
                            probs: list[float], bins: int = 1024,
                            max_inbin: int = 4_000_000,
                            ) -> dict[object, list[float]]:
    """GROUPED exact interpolated quantiles with bounded memory — the
    grouped twin of :func:`exact_quantiles`. A per-group ``percentile()``
    buffers one whole group per aggregation buffer, which is the same
    OOM shape at scale whenever any single group is huge. Here every scan
    aggregates by (group, bin) with map-side combine, so nothing bigger
    than ``bins`` rows per group crosses a shuffle until the final bounded
    in-bin sorts.

    Driver state is O(groups x bins): sized for low-cardinality group
    columns (priorities, categories, labels — the profiler shape, up to a
    few thousand groups). NULL group keys participate like any other key;
    NULL values are ignored per percentile semantics. Returns
    ``{group: [v per prob]}`` bit-identical to
    ``percentile(value, probs)`` under the same groupBy (tested)."""
    spark = df.sparkSession
    base = df.select(F.col(group_col).alias("g"),
                     F.col(value_col).cast("double").alias("v"))

    stats = (base.groupBy("g")
                 .agg(F.count("v").alias("n"), F.min("v").alias("mn"),
                      F.max("v").alias("mx")).collect())

    resolved: dict[tuple[object, int], float] = {}
    probes: list[tuple[object, int, float, float, int]] = []
    ranks_by_g: dict[object, dict[float, tuple[int, int, float]]] = {}
    for row in stats:
        if not row.n:
            ranks_by_g[row.g] = {}
            continue
        ranks_by_g[row.g] = _rank_set(row.n, probs)
        needed = sorted({r for lo, hi, _ in ranks_by_g[row.g].values()
                         for r in (lo, hi)})
        if row.mn == row.mx:
            for r in needed:
                resolved[(row.g, r)] = row.mn
        else:
            probes.extend((row.g, r, row.mn, row.mx, 0) for r in needed)

    selection: list[tuple[object, float, float, int, int]] = []
    while probes:
        # one histogram task per distinct (group, range); ranges come from
        # per-group min/max so they differ per group — ship them as a
        # broadcast lookup joined on the group key
        tasks: dict[tuple[object, float, float], int] = {}
        for g, _r, lo, hi, _o in probes:
            tasks.setdefault((g, lo, hi), len(tasks))
        spec = spark.createDataFrame(
            [(tid, g, lo, hi) for (g, lo, hi), tid in tasks.items()],
            base.select(F.lit(0).alias("tid"), "g",
                        F.col("v").alias("lo"),
                        F.col("v").alias("hi")).schema)
        w = (F.col("hi") - F.col("lo")) / bins
        idx = F.least(F.lit(bins - 1),
                      F.floor((F.col("v") - F.col("lo")) / w)).cast("int")
        # eqNullSafe: a NULL group key is a group like any other
        hist = (base.join(F.broadcast(spec),
                          base["g"].eqNullSafe(spec["g"]))
                    .filter((F.col("v") >= F.col("lo"))
                            & (F.col("v") <= F.col("hi")))
                    .groupBy("tid", idx.alias("bin"))
                    .agg(F.count(F.lit(1)).alias("cnt"),
                         F.min("v").alias("bmin"), F.max("v").alias("bmax"))
                    .collect())
        by_task: dict[int, list] = {}
        for row in hist:
            by_task.setdefault(row.tid, []).append(row)
        for t in by_task.values():
            t.sort(key=lambda r: r.bin)
        nxt = []
        for g, rank, lo, hi, offset in probes:
            cum = offset
            for b in by_task.get(tasks[(g, lo, hi)], []):
                if rank < cum + b.cnt:
                    if b.bmin == b.bmax:
                        resolved[(g, rank)] = b.bmin
                    elif b.cnt <= max_inbin:
                        selection.append((g, b.bmin, b.bmax, rank, rank - cum))
                    else:
                        nxt.append((g, rank, b.bmin, b.bmax, cum))
                    break
                cum += b.cnt
        probes = nxt

    if selection:
        groups: dict[tuple[object, float, float], int] = {}
        for g, lo, hi, _r, _lr in selection:
            groups.setdefault((g, lo, hi), len(groups))
        spec = spark.createDataFrame(
            [(pid, g, lo, hi) for (g, lo, hi), pid in groups.items()],
            base.select(F.lit(0).alias("pid"), "g",
                        F.col("v").alias("lo"),
                        F.col("v").alias("hi")).schema)
        sorted_bins = (base.join(F.broadcast(spec),
                                 base["g"].eqNullSafe(spec["g"]))
                           .filter((F.col("v") >= F.col("lo"))
                                   & (F.col("v") <= F.col("hi")))
                           .groupBy("pid")
                           .agg(F.sort_array(F.collect_list("v"))
                                 .alias("vs")))
        want = spark.createDataFrame(
            [(groups[(g, lo, hi)], lr, i)
             for i, (g, lo, hi, _r, lr) in enumerate(selection)],
            "pid int, lr int, k int")
        got = (sorted_bins.join(F.broadcast(want), "pid")
                          .select("k", F.element_at("vs", F.col("lr") + 1)
                                        .alias("v")).collect())
        vals = {row.k: row.v for row in got}
        for i, (g, _lo, _hi, rank, _lr) in enumerate(selection):
            resolved[(g, rank)] = vals[i]

    out: dict[object, list[float]] = {}
    for g, ranks in ranks_by_g.items():
        vs = []
        for p in probs:
            rs = ranks.get(p)
            vs.append(None if rs is None else
                      _interp(rs[0], rs[1], rs[2],
                              resolved[(g, rs[0])], resolved[(g, rs[1])]))
        out[g] = vs
    return out


def exact_quantiles(df: DataFrame, cols: list[str], probs: list[float],
                    bins: int = 4096, max_inbin: int = 4_000_000,
                    ) -> dict[str, list[float]]:
    """Interpolated exact quantiles per column, bit-identical to Spark's
    ``percentile(col, array(probs))`` (same order statistics, same
    interpolation expression and IEEE op order), computed with bounded
    memory. Returns ``{col: [v per prob]}`` (None entries for all-null
    columns)."""
    stats = exact_quantile_order_stats(df, cols, probs, bins, max_inbin)
    out: dict[str, list[float]] = {}
    for c in cols:
        out[c] = [None if stats[c][p] is None else stats[c][p][2]
                  for p in probs]
    return out
