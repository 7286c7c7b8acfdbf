"""Event-stream operators: time-bucketed rollups and sessionization.

The reference is strictly batch (SURVEY §2.10) — these are the beyond-parity
operators an events table needs. Both are expressed as batch DataFrame ops
(oracle-checkable) and, for live pipelines, as Structured Streaming
(`stream_hourly_rollup`) with watermarked windows.

Scale: both shuffle once on the natural key (bucket / user). Sessionization
uses a per-user ordered window — at 100 TB the partitionBy(user) window is
the standard approach; skewed power-users would get a two-phase split
(intra-day sub-sessions, then merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame, ts_col: str = "ts",
                  value_col: str = "value") -> DataFrame:
    """Tumbling 1-hour aggregate: events, distinct users, exact value sum."""
    val = F.col(value_col).cast("decimal(12,2)")
    return (events
            .groupBy(F.date_trunc("hour", F.col(ts_col)).alias("bucket"),
                     F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.sum(val).cast("double").alias("sum_value")))


def sessionize(events: DataFrame, gap_minutes: int = 30,
               ts_col: str = "ts") -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is idle
    longer than ``gap_minutes``. Returns one row per session with bounds
    and counts. Classic lag → flag → running-sum pattern (single shuffle
    on user_id, both window frames reuse the same sort)."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy(F.col(ts_col).asc(),
                                              F.col("event_id").asc())
    us = F.unix_micros(F.col(ts_col))
    flagged = events.withColumn(
        "new_session",
        F.when(us - F.unix_micros(F.lag(ts_col).over(w)) > gap_us, 1)
         .when(F.lag(ts_col).over(w).isNull(), 1)
         .otherwise(0))
    sessions = flagged.withColumn(
        "session_idx",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val = F.col("value").cast("decimal(12,2)")
    return (sessions.groupBy("user_id", "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.sum(val).cast("double").alias("sum_value")))


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us} THEN 1
              ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), numbered AS (
  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM numbered
GROUP BY user_id, session_idx
"""


def stream_hourly_rollup(spark, source_dir: str, schema) -> DataFrame:
    """Structured-Streaming twin of hourly_rollup: file-source stream with a
    1-hour watermark for late events and tumbling windows. Run with
    ``trigger(availableNow=True)`` for catch-up batch processing or a
    processing-time trigger for a live feed."""
    stream = (spark.readStream.schema(schema).parquet(source_dir))
    return (stream
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
                  .alias("sum_value"))
            .select(F.col("win.start").alias("bucket"), "event_type",
                    "n_events", "sum_value"))


def session_window_agg(events: DataFrame, gap_minutes: int = 30,
                       ts_col: str = "ts") -> DataFrame:
    """Gap-based sessions via Spark's native ``session_window`` — the same
    grouping the lag→flag→running-sum formulation computes, expressed as a
    merging window aggregate (works identically over batch and streams).
    Returns (user_id, session_start, session_end, n_events, sum_value) with
    session_end = last event ts (the raw window end includes the gap)."""
    return (events
            .groupBy(F.session_window(F.col(ts_col), f"{gap_minutes} minutes")
                      .alias("win"),
                     F.col("user_id"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.max(ts_col).alias("session_end"),
                 F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
                  .alias("sum_value"))
            .select("user_id", F.col("win.start").alias("session_start"),
                    "session_end", "n_events", "sum_value"))


def stream_sessionize(spark, source_dir: str, schema,
                      gap_minutes: int = 30) -> DataFrame:
    """Structured-Streaming sessionization: watermarked session_window.
    State for a user's open session is kept until the watermark passes
    session_end + gap; update/complete output modes emit closed sessions.
    The batch twin is ``session_window_agg`` (tested equivalent)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (stream
            .withWatermark("ts", f"{gap_minutes * 2} minutes")
            .groupBy(F.session_window(F.col("ts"), f"{gap_minutes} minutes")
                      .alias("win"),
                     F.col("user_id"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.max("ts").alias("session_end"),
                 F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
                  .alias("sum_value"))
            .select("user_id", F.col("win.start").alias("session_start"),
                    "session_end", "n_events", "sum_value"))


def stream_dedup_events(spark, source_dir: str, schema,
                        watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id — the streaming twin of
    exact_dedup. Uses ``dropDuplicatesWithinWatermark`` so state for a key
    is EVICTED once the watermark passes it: plain
    ``dropDuplicates(["event_id"])`` would keep one state row per distinct
    event_id forever (the watermark only bounds state when the event-time
    column is part of the dedup key). Bounded state at 100 TB/day ingest;
    duplicates arriving farther apart than the watermark are not caught —
    that's the documented contract of within-watermark dedup."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (stream.withWatermark("ts", watermark)
                  .dropDuplicatesWithinWatermark(["event_id"]))


USER_TOTALS_SCHEMA = "user_id BIGINT, n_events BIGINT, sum_value DOUBLE"
_USER_STATE_SCHEMA = "n BIGINT, s DOUBLE"


def stream_user_totals(spark, source_dir: str, schema) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running (event count, value sum) carried in GroupState across
    micro-batches — the pattern for any accumulator Spark's built-in
    streaming aggs can't express (model-ish state, decaying counters, …).

    State is one tiny row per user; each micro-batch updates only the users
    it touches. Batch twin: groupBy(user).agg(count, sum) — tested equal
    after a full availableNow pass."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "sum_value": [round(s, 2)]})

    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (stream.groupBy("user_id")
                  .applyInPandasWithState(
                      update,
                      outputStructType=USER_TOTALS_SCHEMA,
                      stateStructType=_USER_STATE_SCHEMA,
                      outputMode="update",
                      timeoutConf=GroupStateTimeout.NoTimeout))


def stream_hll_registers(spark, source_dir: str, schema,
                         group_col: str = "event_type",
                         value_col: str = "user_id",
                         b_hex: int = 3) -> DataFrame:
    """Streaming twin of the mergeable HyperLogLog sketch
    (functions/sketch.py): the register table is just a streaming
    ``groupBy(group, register).max(rho)`` — state is bounded at
    groups × 16^b_hex tiny rows REGARDLESS of stream length (the whole
    point of sketching a stream), each micro-batch folds in map-side, and
    the registers stay bit-identical to the batch sketch over the same
    data (tested), so estimates come from the same exact-integer formula.
    """
    from pyspark.sql import functions as F

    from ..functions.sketch import hll_rho

    stream = spark.readStream.schema(schema).parquet(source_dir)
    h = F.md5(F.col(value_col).cast("string"))
    reg = F.conv(F.substring(h, 1, b_hex), 16, 10).cast("long")
    tail = F.conv(F.substring(h, b_hex + 1, 12), 16, 10).cast("bigint")
    rho = hll_rho(tail)   # SHARED with the batch sketch — registers must
    #                       stay bit-identical across batch and stream
    return (stream.filter(F.col(value_col).isNotNull())
                  .select(F.col(group_col).alias("g"),
                          reg.alias("register"), rho.alias("rho"))
                  .groupBy("g", "register")
                  .agg(F.max("rho").alias("max_rho")))




def stream_bottom_k(spark, source_dir: str, schema,
                    group_col: str = "event_type",
                    id_col: str = "user_id", k: int = 8) -> DataFrame:
    """Streaming twin of the bottom-k uniform sample
    (functions/sketch.py:bottom_k_sample): per group, keep the k rows
    with the smallest ``md5(id)``. Bottom-k is MERGEABLE — the bottom-k
    of (state ∪ batch) is the bottom-k of state's bottom-k plus the
    batch — so GroupState carries exactly k (hash, id) pairs per group
    REGARDLESS of stream length: the bounded-state property that makes
    a uniform sample of an infinite stream possible at all (this is
    reservoir sampling's job, done deterministically — same rows as the
    batch operator over the same data, tested).

    Emits the group's full current sample each micro-batch (update
    mode), ranked by hash order like the batch twin. Duplicate rows
    (same id repeated in a group) occupy one sample slot EACH, exactly
    like the batch operator's row_number over the raw rows (ADVICE r7:
    the previous hash-dedup state diverged from batch on repeats), so
    state carries per-hash multiplicities capped at k total rows.

    CHECKPOINT COMPATIBILITY (ADVICE r8): the r8 multiplicity fix grew
    ``stateStructType`` from 2 arrays to 3 (``counts`` added). A query
    restarted from a checkpoint written by the 2-array version fails on
    the incompatible state schema — discard the old checkpoint directory
    and re-run from the source (the operator is deterministic over the
    same files, so the sample is reproduced). See MIGRATION.md.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        if state.exists:
            hs, ids, cnts = state.get
            agg = {h: [i, c] for h, i, c in zip(hs, ids, cnts)}
        else:
            agg = {}
        for pdf in pdfs:
            for h, i in zip(pdf["h"], pdf["id"]):
                if h in agg:
                    agg[h][1] += 1
                else:
                    # numpy scalar -> plain Python, preserving the type
                    agg[h] = [i.item() if hasattr(i, "item") else i, 1]
        # expand to row level in hash order and keep the first k ROWS —
        # the same cut the batch row_number filter makes inside a run of
        # equal hashes; counts beyond the cap never matter again, so the
        # re-compacted state stays <= k entries (bounded)
        expanded = []
        for h in sorted(agg):
            i, c = agg[h]
            take = min(c, k - len(expanded))
            expanded.extend([(h, i)] * take)
            if len(expanded) >= k:
                break
        compact: dict = {}
        for h, i in expanded:
            if h in compact:
                compact[h][1] += 1
            else:
                compact[h] = [i, 1]
        state.update(([h for h in compact],
                      [v[0] for v in compact.values()],
                      [v[1] for v in compact.values()]))
        yield pd.DataFrame({
            "g": [key[0]] * len(expanded),
            "id": [i for _, i in expanded],
            "h": [h for h, _ in expanded],
            "sample_rank": list(range(1, len(expanded) + 1)),
        })

    stream = spark.readStream.schema(schema).parquet(source_dir)
    rows = (stream.filter(F.col(id_col).isNotNull())
                  .select(F.col(group_col).cast("string").alias("g"),
                          F.col(id_col).alias("id"),
                          F.md5(F.col(id_col).cast("string")).alias("h")))
    # the id keeps its source type (BIGINT doc ids, STRING session ids,
    # ...) — output and state schemas follow it, like the batch twin
    idt = rows.schema["id"].dataType.simpleString()
    return (rows.groupBy("g")
                .applyInPandasWithState(
                    update,
                    outputStructType=(
                        f"g STRING, id {idt}, h STRING, sample_rank INT"),
                    stateStructType=(
                        f"hs ARRAY<STRING>, ids ARRAY<{idt}>, "
                        f"counts ARRAY<INT>"),
                    outputMode="update",
                    timeoutConf=GroupStateTimeout.NoTimeout))


def stream_exact_dedup(spark, source_dir: str, schema,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Streaming twin of the exact-dedup survivor selection
    (__spark_entry__.q_dedup_survivors / functions/text.fingerprint):
    keyed by the content fingerprint ``md5(coalesce(text, ''))``,
    GroupState carries ONE value — the smallest id seen so far — so
    state is O(distinct contents) with O(1) per key regardless of how
    often a content repeats across the stream. Each micro-batch emits
    the key's current survivor (update mode); after the stream drains,
    the last emission per fingerprint equals the batch operator's
    min-id survivor over the same rows — the keep-first policy, stated
    stream-tolerantly as keep-min so arrival order cannot matter.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        best = state.get[0] if state.exists else None
        n_prev = state.get[1] if state.exists else 0
        n = 0
        for pdf in pdfs:
            for i in pdf["id"]:
                v = i.item() if hasattr(i, "item") else i
                n += 1
                if best is None or v < best:
                    best = v
        state.update((best, n_prev + n))
        yield pd.DataFrame({
            "fp": [key[0]], "survivor": [best],
            "n_rows": [n_prev + n],
        })

    stream = spark.readStream.schema(schema).parquet(source_dir)
    # null ids are skipped like the batch twin's min() would skip them
    # (review fix: a None/NaN id would otherwise crash or poison the
    # running min in state)
    rows = (stream.filter(F.col(id_col).isNotNull())
                  .select(
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("fp"),
        F.col(id_col).alias("id")))
    idt = rows.schema["id"].dataType.simpleString()
    return (rows.groupBy("fp")
                .applyInPandasWithState(
                    update,
                    outputStructType=(
                        f"fp STRING, survivor {idt}, n_rows LONG"),
                    stateStructType=f"best {idt}, n LONG",
                    outputMode="update",
                    timeoutConf=GroupStateTimeout.NoTimeout))


def stream_cm_sketch(spark, source_dir: str, schema,
                     value_col: str = "event_type", depth: int = 4,
                     width: int = 256) -> DataFrame:
    """Streaming twin of the Count-Min sketch
    (functions/sketch.py:cm_sketch_table): counters are plain additive
    SUMs, so the sketch IS a built-in streaming aggregation — state is
    bounded at depth x width rows regardless of stream length or item
    cardinality (the whole point of CM at 100 TB/day ingest), and the
    counters equal the batch sketch over the same rows (tested).
    Bucket derivation shares the batch op's seeded-md5 form so batch
    and stream sketches merge by addition."""
    from pyspark.sql import functions as F

    from ..functions.sketch import cm_bucket_entries

    stream = spark.readStream.schema(schema).parquet(source_dir)
    entries = cm_bucket_entries(value_col, depth, width)
    return (stream.filter(F.col(value_col).isNotNull())
                  .select(F.explode(F.array(*entries)).alias("e"))
                  .groupBy(F.col("e.row").alias("row"),
                           F.col("e.bucket").alias("bucket"))
                  .agg(F.count(F.lit(1)).alias("cnt")))


def funnel_steps(events: DataFrame, steps: list[str],
                 ts_col: str = "ts", user_col: str = "user_id",
                 order_col: str = "event_id") -> DataFrame:
    """Ordered-funnel analysis: how many users completed step 1, then step
    2 at-or-after their earliest step-1 completion, then step 3 after
    that, … Classic product-analytics sequence matching (the reference's
    SQL surface has no MATCH_RECOGNIZE; this is the window-chain
    formulation).

    One window pass per user: ``q_k`` marks an event as a *qualified*
    step-k completion when the running earliest qualified step-(k-1) time
    over STRICTLY PRECEDING rows is set; the per-user earliest step-k
    completion is then just ``min(q_k)``. "After" means later in the
    total (ts, event_id) event order — deterministic under equal
    timestamps. Single shuffle on user_id; the chained window columns
    share one sort (Catalyst stacks the Window nodes over the same
    ordering). At 100 TB this is the standard per-user funnel shape:
    no self-joins, no per-step rescans of the events table.

    Returns one row per step: (step, event_type, n_users, conversion)
    where conversion = n_users / step-1 users (double)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(),
                                             F.col(order_col).asc())
    prev = w.rowsBetween(Window.unboundedPreceding, -1)
    df = events
    for k, step in enumerate(steps):
        qual = F.when(F.col("event_type") == step, F.col(ts_col))
        if k > 0:
            qual = F.when(
                (F.col("event_type") == step)
                & F.min(f"_q{k-1}").over(prev).isNotNull(), F.col(ts_col))
        df = df.withColumn(f"_q{k}", qual)
    per_user = df.groupBy(user_col).agg(
        *[F.min(f"_q{k}").alias(f"_r{k}") for k in range(len(steps))])
    counts = per_user.agg(
        *[F.count(f"_r{k}").alias(f"_n{k}") for k in range(len(steps))])
    rows = counts.select(F.explode(F.array(*[
        F.struct(F.lit(k + 1).cast("int").alias("step"),
                 F.lit(s).alias("event_type"),
                 F.col(f"_n{k}").alias("n_users"),
                 (F.col(f"_n{k}").cast("double")
                  / F.col("_n0").cast("double")).alias("conversion"))
        for k, s in enumerate(steps)])).alias("f"))
    return rows.select("f.step", "f.event_type", "f.n_users", "f.conversion")


def cohort_retention(events: DataFrame, cohort_event: str = "signup",
                     ts_col: str = "ts",
                     user_col: str = "user_id") -> DataFrame:
    """Weekly cohort-retention matrix: users are cohorted by the Monday
    week of their earliest ``cohort_event``; a cohort member is retained
    in week offset k if they have ANY event in cohort_week + k weeks.
    Both engines truncate weeks to Monday, and offsets are exact integer
    day-diffs / 7 (week truncs are 7-day aligned), so the matrix is
    engine-exact.

    Shape at scale: one groupBy(user) for first-touch, one shuffle join
    back on user (both sides already hash-partitioned on user_id — AQE
    reuses the exchange), one distinct + count per (cohort, offset).
    Events before the user's cohort week (possible when cohort_event is
    not their first event) are excluded."""
    first = (events.filter(F.col("event_type") == cohort_event)
             .groupBy(user_col)
             .agg(F.date_trunc("week", F.min(ts_col)).alias("cohort_week")))
    act = (events.select(user_col, F.col(ts_col))
           .join(first, user_col)
           .select(user_col, "cohort_week",
                   F.date_trunc("week", F.col(ts_col)).alias("week"))
           .filter(F.col("week") >= F.col("cohort_week"))
           .distinct())
    return (act.groupBy(
                F.col("cohort_week").cast("date").alias("cohort_week"),
                (F.datediff(F.col("week").cast("date"),
                            F.col("cohort_week").cast("date")) / 7)
                .cast("int").alias("week_offset"))
            .agg(F.count(F.lit(1)).alias("n_users")))


def gap_fill_hourly(events: DataFrame, series_col: str = "event_type",
                    ts_col: str = "ts",
                    value_col: str = "value") -> DataFrame:
    """Time-series gap fill (the timescale `time_bucket_gapfill` family):
    per-series hourly buckets densified over each series' [min, max] hour
    range, with missing buckets filled by LOCF (last observation carried
    forward) and by linear interpolation between the neighbouring
    observed buckets.

    Exactness: bucket means are exact-decimal sums / integer counts cast
    to double (one correctly-rounded division); the interpolation is
    ``prev + (next - prev) * (dh / span)`` over integer-valued doubles —
    every step IEEE-correctly-rounded and written in the same order in
    the SQL twin, so results are bit-equal cross-engine (no libm).

    Shape at scale: the dense spine is generated per series (explode of
    sequence(min, max, 1 hour) — rows bounded by series' time spans, not
    by raw event count), left-joined to the hourly aggregate, then four
    ignore-nulls window columns over one (series, bucket) sort. One
    shuffle for the aggregate, one for the window."""
    hourly = (events.groupBy(
                  F.col(series_col).alias("series"),
                  F.date_trunc("hour", F.col(ts_col)).alias("bucket"))
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.sum(F.col(value_col).cast("decimal(12,2)"))
                    .alias("_sum")))
    spine = (hourly.groupBy("series")
             .agg(F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1"))
             .select("series",
                     F.explode(F.sequence(
                         "_b0", "_b1", F.expr("interval 1 hour")))
                      .alias("bucket")))
    filled = (spine.join(hourly, ["series", "bucket"], "left")
              .withColumn("avg_value",
                          F.col("_sum").cast("double")
                          / F.col("n_events").cast("double")))
    w = Window.partitionBy("series").orderBy("bucket")
    wp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_t = F.when(F.col("avg_value").isNotNull(), F.col("bucket"))
    out = (filled
           .withColumn("_pv", F.last("avg_value", ignorenulls=True).over(wp))
           .withColumn("_pt", F.last(obs_t, ignorenulls=True).over(wp))
           .withColumn("_nv", F.first("avg_value", ignorenulls=True).over(wf))
           .withColumn("_nt", F.first(obs_t, ignorenulls=True).over(wf)))
    dh = (F.unix_micros(F.col("bucket")) - F.unix_micros(F.col("_pt")))
    span = (F.unix_micros(F.col("_nt")) - F.unix_micros(F.col("_pt")))
    interp = (F.col("_pv")
              + (F.col("_nv") - F.col("_pv"))
              * (dh.cast("double") / span.cast("double")))
    return (out.select(
        "series", "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "avg_value",
        F.coalesce("avg_value", F.col("_pv")).alias("filled_locf"),
        F.coalesce("avg_value",
                   F.when(F.col("_pt").isNotNull()
                          & F.col("_nt").isNotNull(), interp))
         .alias("filled_interp"),
        F.col("n_events").isNull().cast("int").alias("is_gap")))


def stream_funnel_state(spark, source_dir: str, schema,
                        steps: list[str]) -> DataFrame:
    """Streaming twin of ``funnel_steps``: per-user step-completion
    times carried in GroupState across micro-batches. Each batch's
    events are processed in (ts, event_id) order with the same chaining
    rule as the batch windows — step k's time is set by the first
    qualifying event once step k−1 is already set by an earlier event —
    so after a full in-order ``availableNow`` pass the per-user vectors
    equal the batch form's running minima exactly (tested).

    Contract (the honest streaming-funnel caveat, like
    within-watermark dedup): a user's events must arrive in event-time
    order ACROSS micro-batches for exact equality — an event arriving
    after a later-timestamped one can miss enabling a chain the batch
    form would count. State is len(steps) nullable int64s per user.

    Output (update mode): one row per touched user per micro-batch with
    the current completion times as epoch micros (NULL = not reached);
    the funnel report is a downstream count over the latest row per
    user."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ns = len(steps)
    out_schema = ("user_id BIGINT, "
                  + ", ".join(f"r{k} BIGINT" for k in range(ns)))
    state_schema = ", ".join(f"s{k} BIGINT" for k in range(ns))
    step_idx = {s: k for k, s in enumerate(steps)}

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        r = list(state.get) if state.exists else [None] * ns
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        for ts, et in zip(batch["ts"], batch["event_type"]):
            k = step_idx.get(et)
            if k is None or r[k] is not None:
                continue
            if k == 0 or r[k - 1] is not None:
                r[k] = int(ts.value) // 1000   # pandas ns → epoch µs
        state.update(tuple(r))
        yield pd.DataFrame({"user_id": [key[0]],
                            **{f"r{k}": [r[k]] for k in range(ns)}})

    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (stream.filter(F.col("event_type").isin(list(steps)))
                  .groupBy("user_id")
                  .applyInPandasWithState(
                      update,
                      outputStructType=out_schema,
                      stateStructType=state_schema,
                      outputMode="update",
                      timeoutConf=GroupStateTimeout.NoTimeout))


def transition_matrix(events: DataFrame, ts_col: str = "ts",
                      user_col: str = "user_id",
                      order_col: str = "event_id") -> DataFrame:
    """Clickstream transition matrix: P(next event type | current type)
    from each user's (ts, event_id)-ordered event sequence — the
    first-order Markov summary of user journeys. lead() per user, one
    pair count, probabilities as exact-integer counts cast to double in
    one correctly-rounded division. Single shuffle on user, second on
    the tiny (from, to) key space."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(),
                                             F.col(order_col).asc())
    pairs = (events
             .withColumn("_next", F.lead("event_type").over(w))
             .filter(F.col("_next").isNotNull())
             .groupBy(F.col("event_type").alias("from_type"),
                      F.col("_next").alias("to_type"))
             .agg(F.count(F.lit(1)).alias("n")))
    tot = Window.partitionBy("from_type")
    return pairs.withColumn(
        "p", F.col("n").cast("double")
        / F.sum("n").over(tot).cast("double"))


def top_paths(events: DataFrame, k: int = 20, path_len: int = 5,
              ts_col: str = "ts", user_col: str = "user_id",
              order_col: str = "event_id") -> DataFrame:
    """Top-k user journeys: each user's first ``path_len`` event types
    (in (ts, event_id) order) joined into one path string, counted, and
    ranked (count desc, path asc — pinned ties). collect_list is
    order-nondeterministic, so the sequence is rebuilt deterministically
    by array_sort over (ts, event_id, type) structs before slicing —
    the portable ordered-agg form both engines agree on."""
    seq = (events.groupBy(F.col(user_col).alias("user"))
           .agg(F.array_sort(F.collect_list(F.struct(
               F.col(ts_col).alias("t"),
               F.col(order_col).alias("o"),
               F.col("event_type").alias("e")))).alias("evs")))
    path = seq.select(
        "user",
        F.array_join(F.expr(f"transform(slice(evs, 1, {path_len}), "
                            "x -> x.e)"), ">").alias("path"))
    ranked = (path.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
              .withColumn("rank", F.row_number().over(
                  Window.orderBy(F.col("n_users").desc(),
                                 F.col("path").asc())))
              .filter(F.col("rank") <= k))
    return ranked.select("path", "n_users", F.col("rank").cast("int")
                         .alias("rank"))


def ab_test_readout(events: DataFrame, convert_event: str = "purchase",
                    user_col: str = "user_id") -> DataFrame:
    """Experiment readout: users hash-split 50/50 by md5 (the
    deterministic split every sampler here uses), conversion = any
    ``convert_event``; per variant the user count, conversions, rate,
    and the two-proportion z-score vs variant 0 (pooled). The z formula
    uses only + − × ÷ √ — every step correctly rounded, so the readout
    is bit-equal cross-engine (no erf/p-values: those need libm; rank
    the |z| against the usual 1.96/2.58 cutoffs downstream)."""
    users = (events.groupBy(F.col(user_col).alias("user"))
             .agg(F.max(F.when(F.col("event_type") == convert_event, 1)
                        .otherwise(0)).alias("converted"))
             .withColumn("variant", (F.conv(F.substring(
                 F.md5(F.col("user").cast("string")), 1, 8), 16, 10)
                 .cast("bigint") % 2).cast("int")))
    per = (users.groupBy("variant")
           .agg(F.count(F.lit(1)).alias("n_users"),
                F.sum("converted").alias("conversions"))
           # consumed twice (own side of the crossJoin + the variant-0
           # control row): without this cut the full scan + per-user
           # aggregate runs twice (r16 opt; the before-plan showed both
           # subtrees). 2-row frame — the checkpoint is free.
           .localCheckpoint(eager=False))
    ctrl = per.filter(F.col("variant") == 0).select(
        F.col("n_users").alias("_n0"), F.col("conversions").alias("_c0"))
    j = per.crossJoin(ctrl)
    n, c = F.col("n_users").cast("double"), F.col("conversions").cast("double")
    n0, c0 = F.col("_n0").cast("double"), F.col("_c0").cast("double")
    rate = c / n
    p_pool = (c + c0) / (n + n0)
    z = ((c / n) - (c0 / n0)) / F.sqrt(
        p_pool * (F.lit(1.0) - p_pool)
        * (F.lit(1.0) / n + F.lit(1.0) / n0))
    # degenerate pools (0% or 100% pooled conversion) have a zero
    # denominator: integer-guard to NULL — double x/0 is
    # engine-divergent (NaN vs NULL)
    pooled_ok = ((F.col("conversions") + F.col("_c0") > 0)
                 & (F.col("conversions") + F.col("_c0")
                    < F.col("n_users") + F.col("_n0")))
    return j.select("variant", "n_users", "conversions",
                    rate.alias("rate"),
                    F.when(F.col("variant") == 0, F.lit(0.0))
                     .when(pooled_ok, z).alias("z"))


def rolling_zscore(events: DataFrame, series_col: str = "event_type",
                   ts_col: str = "ts", window: int = 24,
                   min_obs: int = 12, cutoff: float = 3.0) -> DataFrame:
    """Time-series anomaly detection: per-series hourly event counts
    scored against the trailing ``window`` OBSERVED buckets (strictly
    preceding rows — the current bucket never scores itself). mean, std
    and z are built from exact integer sums in correctly-rounded double
    steps (+ − × ÷ √ only; variance clamped at 0 before the sqrt so
    rounding can't produce NaN), identical order in the SQL twin.
    Buckets with fewer than ``min_obs`` trailing observations emit NULL
    z (warm-up). One shuffle to the hourly aggregate, one sort per
    series for the frame."""
    hourly = (events.groupBy(
        F.col(series_col).alias("series"),
        F.date_trunc("hour", F.col(ts_col)).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n")))
    w = (Window.partitionBy("series").orderBy("bucket")
         .rowsBetween(-window, -1))
    nobs = F.count(F.lit(1)).over(w)
    s = F.sum("n").over(w).cast("double")
    ss = F.sum(F.col("n") * F.col("n")).over(w).cast("double")
    cnt = nobs.cast("double")
    mean = s / cnt
    var = F.greatest((ss - s * s / cnt) / (cnt - F.lit(1.0)), F.lit(0.0))
    std = F.sqrt(var)
    # std == 0 (constant trailing window) emits NULL z, never a division
    # by zero: double x/0 is engine-divergent (IEEE inf vs NULL).
    z = F.when(std > F.lit(0.0),
               (F.col("n").cast("double") - mean) / std)
    out = (hourly
           .withColumn("n_obs", nobs)
           .withColumn("mean_w", F.when(nobs >= min_obs, mean))
           .withColumn("z", F.when(nobs >= min_obs, z)))
    return out.select(
        "series", "bucket", "n", "n_obs", "mean_w", "z",
        (F.when(F.col("z").isNotNull()
                & (F.abs("z") > F.lit(cutoff)), 1).otherwise(0))
        .cast("int").alias("is_anomaly"))
