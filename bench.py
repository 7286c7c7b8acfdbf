"""Benchmark harness: runs the registered queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
SHORT JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"n_queries": N, "n_failed": N, "sf": ..., "n_contended": N,
"detail_file": "BENCH_QUERIES.json"}. Per-query timings go to the
BENCH_QUERIES.json sidecar (the driver's stdout capture window truncates
~88 inline float entries — lost rounds 6 and 7's records).

Timing = full execution to driver-side materialization (collect), matching
what the DuckDB baseline pays when fetching the oracle result.

Self-adjudication (VERDICT r14 #2): the harness VM has multi-hour
contention windows during which EVERY rep of a query lands 3-30x over its
calm floor — the per-query inline tie-break can't see those, so r14's
driver session published a 205 s total against a 102 s engine. After the
main loop, any query whose session min still exceeds ADJUDICATE_RATIO x
its committed BENCH_QUERIES.json record gets extra ALTERNATING re-reps
(cycling through all suspects so each samples different windows — the
tools/adjudicate.py loop, inline); ones that never come down are named in
a `contended` field so a reader knows those rows are suspect, not
regressions.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# A session min this far over the committed record (and with this much
# absolute slack — sub-second queries jitter multiplicatively) is either a
# regression or a sustained contention window; alternating re-reps decide.
ADJUDICATE_RATIO = 2.5
ADJUDICATE_SLACK_SEC = 1.0
ADJUDICATE_MAX_REPS = 3


def adjudicate_pass(run_query, timings: dict[str, float],
                    spreads: dict[str, list[float]],
                    prior: dict[str, float],
                    max_reps: int = ADJUDICATE_MAX_REPS,
                    log=lambda msg: print(msg, file=sys.stderr),
                    ) -> list[str]:
    """Re-rep every suspect query in ALTERNATING order until it comes
    back under the contention bound or ``max_reps`` extra reps are spent;
    return the (sorted) names that never came down. Mutates ``timings``
    (per-query min) and ``spreads`` in place. ``run_query(name)`` returns
    one rep's wall seconds. Factored out of main() so the re-rep logic is
    unit-testable without a Spark session."""
    def _suspect(name: str) -> bool:
        p, t = prior.get(name), timings.get(name, -1.0)
        return (t > 0 and p is not None and p > 0
                and t > ADJUDICATE_RATIO * p
                and t - p > ADJUDICATE_SLACK_SEC)

    suspects = [n for n in timings if _suspect(n)]
    if not suspects:
        return []
    log(f"bench adjudication: re-repping {len(suspects)} suspect "
        f"queries {suspects}")
    open_set = list(suspects)
    errored: set[str] = set()
    for _ in range(max_reps):
        # Alternating order: every suspect samples every window equally,
        # so one sustained burst can't inflate a single query's re-reps.
        for name in list(open_set):
            t = run_query(name)
            if t < 0:
                # Rep errored: keep the session value, stop re-repping,
                # but the suspect stays FLAGGED — its 2.5×-over-record
                # session value is being published unverified, which is
                # exactly what the contended field exists to mark.
                open_set.remove(name)
                errored.add(name)
                continue
            spreads.setdefault(name, [timings[name]]).append(round(t, 4))
            timings[name] = round(min(timings[name], t), 4)
            if not _suspect(name):
                open_set.remove(name)
        if not open_set:
            break
    still = sorted(set(open_set) | errored)
    if still:
        log(f"bench adjudication: still contended after re-reps: {still}")
    return still


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as E
    from keboola_storage_duckdb_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on a trivial job so q1 isn't charged for startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    # Best-of-N for non-trivial queries: the harness VM's CPU allocation is
    # bursty (same query swings 3-4x between back-to-back runs; 3.5-69 s
    # observed for identical code within ONE session), so a single draw is
    # a lottery; min-of-2 reports the machine's actual capability, and
    # tie-break runs fire only while the draws disagree wildly — up to 5
    # reps for the multi-second queries where a bad window costs tens of
    # seconds. History-aware tie-break (VERDICT r10 #4): a query whose
    # best draw is >3x its last committed record (and >2 s absolute)
    # keeps re-running — a real regression reproduces across spaced
    # draws, a contention window usually doesn't.
    prior: dict[str, float] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_QUERIES.json")) as f:
            prior = {k: v for k, v in json.load(f)["queries"].items()
                     if isinstance(v, (int, float)) and v > 0}
    except (OSError, ValueError, KeyError):
        pass

    registry = E.queries()

    def run_one(name: str) -> float:
        """One timed rep; -1.0 on error."""
        import gc
        try:
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).collect()
            t = time.perf_counter() - t0
        except Exception as ex:
            print(f"bench error in {name}: {ex}", file=sys.stderr)
            return -1.0
        # drop py4j-held DataFrame/RDD refs promptly: lazy
        # localCheckpoints from earlier queries otherwise accumulate
        # on the executors until Python GC happens to run
        gc.collect()
        return t

    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name in registry:
        runs = [run_one(name)]
        if runs[0] < 0:
            timings[name] = -1.0
            continue
        if runs[0] > 0.8:
            runs.append(run_one(name))
            # heavy queries tie-break on a tighter spread: a 20 s query
            # under contention rarely swings a full 2x between two
            # draws, but 1.5x is routine — and a bad record there costs
            # tens of seconds of reported wall
            def _suspect(rs):
                if (max(rs) / min(rs) > (1.5 if min(rs) > 3 else 2)
                        and len(rs) < (5 if min(rs) > 3 else 3)):
                    return True
                p = prior.get(name)
                return (p is not None and min(rs) > 3 * p
                        and min(rs) - p > 2 and len(rs) < 5)

            while min(r for r in runs if r >= 0) > 0.8 and _suspect(
                    [r for r in runs if r >= 0]):
                nxt = run_one(name)
                if nxt < 0:
                    break
                runs.append(nxt)
        runs = [r for r in runs if r >= 0]
        timings[name] = round(min(runs), 4)
        if len(runs) > 1:
            # full rep spread so a reader can separate VM contention
            # (wide spread) from a real regression (tight spread at a
            # higher level) without a rerun
            spreads[name] = [round(r, 4) for r in runs]

    # Post-loop adjudication (VERDICT r14 #2): alternating re-reps for
    # queries still far over their committed record.
    contended = adjudicate_pass(run_one, timings, spreads, prior)

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    # The driver tail-captures stdout with a BOUNDED window: rounds 6 AND
    # 7 lost their records (`parsed: null`) because even the minimized
    # single JSON line with ~88 per-query floats overflows that window.
    # Per VERDICT r7 #4: per-query timings and rep spreads go to sidecar
    # files (BENCH_QUERIES.json / BENCH_SPREADS.json, committed to the
    # repo) and stderr; stdout carries ONLY the short headline line that
    # the capture window can never truncate.
    try:
        with open(os.path.join(here, "BENCH_QUERIES.json"), "w") as f:
            json.dump({"metric": "total_query_wall_sec", "value": total,
                       "unit": "sec", "sf": sf, "queries": timings,
                       "contended": contended},
                      f, indent=1)
        with open(os.path.join(here, "BENCH_SPREADS.json"), "w") as f:
            json.dump({"sf": sf, "spreads": spreads}, f, indent=1)
    except OSError as ex:
        print(f"bench: could not write sidecar files: {ex}",
              file=sys.stderr)
    print(json.dumps({"queries": timings, "spreads": spreads}),
          file=sys.stderr)
    head = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "n_failed": sum(1 for t in timings.values() if t < 0),
        "sf": sf,
        "detail_file": "BENCH_QUERIES.json",
    }
    if contended:
        head["n_contended"] = len(contended)
        # names stay in the headline while they fit the driver's bounded
        # stdout capture; full list always in the sidecar
        head["contended"] = contended[:10]
    print(json.dumps(head))


if __name__ == "__main__":
    main()
