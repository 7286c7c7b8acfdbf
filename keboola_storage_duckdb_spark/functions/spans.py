"""Substring-level exact deduplication: duplicated token spans.

Doc-level dedup (operators/dedup.py, functions/dedup_ml.py) removes whole
near-identical documents; the complementary operator an LLM training
pipeline needs is SPAN-level: find every run of >= k consecutive tokens
that also appears elsewhere in the corpus, so boilerplate (license
headers, navigation chrome, templated intros) can be cut out of otherwise
unique documents. This is the distributed re-expression of the
suffix-array substring dedup of Lee et al., "Deduplicating Training Data
Makes Language Models Better" (ACL 2022): a suffix array finds duplicated
substrings >= k tokens on one machine; here every k-token window hashes
to a fingerprint, duplicated fingerprints mark their positions, and
overlapping/adjacent marked windows merge into maximal spans — the same
spans the suffix array reports, k-token-aligned.

Shape at 100 TB:
  * window fingerprinting is a per-row map (``transform`` over token
    positions + md5) — one output row per token, embarrassingly parallel;
  * the duplicate test is ONE groupBy(hash) count with map-side partial
    aggregation; unlike an inverted-index pair join a hash shared by a
    million documents costs one aggregate row, never a pair explosion;
  * marked positions re-join the corpus hash-partitioned (shuffle #2) and
    the island merge windows over (doc, pos) — per-doc state only.
Nothing is quadratic in corpus size or in duplicate multiplicity.

md5 keeps the fingerprints engine-portable: the DuckDB oracle
(``DUPLICATE_SPANS_SQL_TEMPLATE``) reproduces every window hash, island
boundary, and span bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .util import par as _par

__all__ = ["duplicate_spans", "cut_spans", "boilerplate_ngrams",
           "contamination_spans", "leakage_report",
           "DUPLICATE_SPANS_SQL_TEMPLATE", "CUT_SPANS_SQL_TEMPLATE",
           "BOILERPLATE_SQL_TEMPLATE",
           "CONTAMINATION_SPANS_SQL_TEMPLATE",
           "DUPLICATE_SPANS_KEEP_FIRST_SQL_TEMPLATE",
           "LEAKAGE_REPORT_SQL_TEMPLATE"]


def duplicate_spans(df: DataFrame, id_col: str, text_col: str,
                    k: int = 8, cross_doc: bool = True,
                    keep_first: bool = False) -> DataFrame:
    """Maximal duplicated token spans per document.

    A position ``p`` (0-based) in a document is *marked* when the k-token
    window starting at ``p`` occurs more than once in the corpus —
    anywhere if ``cross_doc=False``, in >= 2 distinct documents if
    ``cross_doc=True`` (the training-data default: internal repetition is
    repetition_signals' job, operators/..:text.py:330). Overlapping and
    adjacent marked windows merge into maximal spans.

    ``keep_first=True`` applies the SURVIVOR policy in-operator: the
    canonical occurrence of each duplicated window — smallest
    ``(doc_id, pos)`` — is NOT marked, so composing with
    :func:`cut_spans` keeps exactly one copy of every duplicated run in
    the corpus instead of deleting all of them (the keep-one exact
    dedup a training pipeline usually wants; default False reports
    every occurrence, the audit view).

    Returns ``(doc_id, span_start, span_end, span_tokens, n_windows)``
    with token-index ranges [span_start, span_end) and ``n_windows`` =
    marked windows merged into the span. Documents shorter than ``k``
    tokens produce no rows (no window fits — mirrors the suffix-array
    length threshold).
    """
    wins = _window_fingerprints(df, id_col, text_col, k)
    # genuine multi-consumer cut point (dup-test agg AND the semi-join
    # probe): without it Spark re-tokenizes and re-hashes the whole corpus
    # per branch — no cross-branch CSE (NOTES). Lazy = cache-on-first-use.
    wins = wins.localCheckpoint(eager=False)
    if cross_doc:
        # "≥ 2 distinct docs" as min(id) != max(id) — equivalent to
        # countDistinct(id) > 1 (incl. null-id rows: both skip nulls)
        # but partial-aggregates map-side in ONE exchange, where the
        # distinct aggregation re-shuffles every distinct (h, id) pair
        # through a second full-width exchange (r17 opt; plan pair in
        # plans/r17, rows pinned identical).
        dup = (wins.groupBy("h")
                   .agg(F.min("id").alias("_i0"), F.max("id").alias("_i1"))
                   .filter(F.col("_i0") != F.col("_i1")))
    else:
        dup = (wins.groupBy("h")
                   .agg(F.count(F.lit(1)).alias("occ"))
                   .filter(F.col("occ") > 1))
    marked = wins.join(dup.select("h"), "h", "left_semi")
    if keep_first:
        # rank occurrences per hash; the (id, pos)-first survives. One
        # extra shuffle by h — same key the dup test already groups on.
        wo = Window.partitionBy("h").orderBy("id", "pos")
        marked = (marked.withColumn("rn", F.row_number().over(wo))
                        .filter(F.col("rn") >= 2).drop("rn"))
    return _merge_islands(marked, k)


def _window_fingerprints(df: DataFrame, id_col: str, text_col: str,
                         k: int) -> DataFrame:
    """(id, pos, h): md5 fingerprint of every k-token window, one row per
    start position. sequence() guarded ascending by the size filter
    (Spark sequence() DESCENDS when stop < start)."""
    toks = (df.select(F.col(id_col).alias("id"),
                      F.split(F.col(text_col), " ").alias("t"))
              .filter(F.size("t") >= k)
              .repartition(_par(df)))  # explode fan-out off 1-split inputs
    return toks.select(
        "id",
        F.posexplode(F.expr(
            f"transform(sequence(0, size(t) - {k}), "
            f"i -> md5(array_join(slice(t, i + 1, {k}), ' ')))"
        )).alias("pos", "h"))


def _merge_islands(marked: DataFrame, k: int) -> DataFrame:
    """Gaps-and-islands over marked window positions: windows [pos, pos+k)
    merge while pos <= prev + k (overlap OR token-adjacency); island id =
    running count of breaks. Shared by corpus-dedup and decontamination
    spans so the merge semantics cannot drift."""
    w = Window.partitionBy("id").orderBy("pos")
    marked = marked.withColumn(
        "brk", F.when(F.col("pos") <= F.lag("pos").over(w) + k,
                      F.lit(0)).otherwise(F.lit(1)))
    marked = marked.withColumn(
        "island", F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (marked.groupBy("id", "island")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + k).alias("span_end"),
                 F.count(F.lit(1)).alias("n_windows"))
            .select(F.col("id").alias("doc_id"),
                    F.col("span_start").cast("int").alias("span_start"),
                    F.col("span_end").cast("int").alias("span_end"),
                    (F.col("span_end") - F.col("span_start"))
                    .cast("int").alias("span_tokens"),
                    F.col("n_windows")))


def contamination_spans(docs: DataFrame, benchmark: DataFrame,
                        id_col: str, text_col: str,
                        k: int = 8) -> DataFrame:
    """SPAN-level decontamination — the surgical complement of
    dedup_ml.decontaminate's doc-level flag: positions of every k-token
    window of the corpus that also appears ANYWHERE in the benchmark
    set, merged to maximal spans (same output shape as
    :func:`duplicate_spans`, so :func:`cut_spans` removes exactly the
    overlapping text while keeping the rest of the document — instead of
    dropping the whole doc for one shared sentence).

    Scale: the benchmark's distinct window hashes are tiny next to a
    100 TB corpus and BROADCAST to the probe (map-side semi-join — the
    corpus token stream never shuffles for the match); only marked
    positions shuffle, by doc, for the island merge.
    """
    dw = _window_fingerprints(docs, id_col, text_col, k)
    bw = _window_fingerprints(benchmark, id_col, text_col, k) \
        .select("h").distinct()
    marked = dw.join(F.broadcast(bw), "h", "left_semi")
    return _merge_islands(marked, k)


def cut_spans(df: DataFrame, spans: DataFrame, id_col: str,
              text_col: str) -> DataFrame:
    """The actionable half of substring dedup: rebuild each document's
    text with its duplicated spans REMOVED (Lee et al. cut the duplicated
    substring from the training corpus; which single occurrence to keep —
    if any — is a survivor-selection question like dedup_survivors',
    orthogonal to the cut and left to the caller's span set).

    ``spans`` is :func:`duplicate_spans` output (or any frame with
    ``doc_id, span_start, span_end`` token ranges [start, end)). Returns
    ``(doc_id, clean_text, kept_tokens, removed_tokens)``; documents with
    no spans pass through intact (left join — never an inner-join drop).

    Scale: spans aggregate per doc to a small struct array (a doc's span
    list is bounded by its own token count), ONE hash join against the
    corpus, then a per-row higher-order filter over token positions —
    no shuffle beyond the join, no Python.
    """
    sp = (spans.groupBy(F.col("doc_id").alias("id"))
               .agg(F.collect_list(
                   F.struct(F.col("span_start").alias("s"),
                            F.col("span_end").alias("e"))).alias("sp")))
    # NULL text normalizes to the empty doc on BOTH engines (split(NULL)
    # is NULL; the oracle's empty-list array_to_string COALESCEs to '',
    # so the Spark side must land on [] too, not NULL)
    toks = df.select(F.col(id_col).alias("id"),
                     F.coalesce(F.split(F.col(text_col), " "),
                                F.array().cast("array<string>")).alias("t"))
    joined = toks.join(sp, "id", "left")
    # keep token i unless a span covers it; single-arg lambdas only
    # (2-arg higher-order lambdas dispatch as (element, index) — NOTES)
    kept = F.expr(
        "CASE WHEN sp IS NULL THEN t ELSE "
        "transform(filter(sequence(0, size(t) - 1), "
        "  i -> NOT exists(sp, x -> x.s <= i AND i < x.e)), "
        "  i -> element_at(t, i + 1)) END")
    return (joined
            .withColumn("kept", kept)
            .select(F.col("id").alias("doc_id"),
                    F.array_join("kept", " ").alias("clean_text"),
                    F.size("kept").cast("int").alias("kept_tokens"),
                    (F.size("t") - F.size("kept")).cast("int")
                    .alias("removed_tokens")))


def boilerplate_ngrams(df: DataFrame, id_col: str, text_col: str,
                       k: int = 8, top_n: int = 20) -> DataFrame:
    """The boilerplate REPORT: the most-repeated k-token windows
    themselves (duplicate_spans tells you *where* duplication is; this
    tells you *what* it is — license headers, navigation chrome,
    templated intros — the strings a pipeline owner reads before
    deciding what to cut). Returns the ``top_n`` windows by
    ``(occurrences DESC, snippet ASC)`` as
    ``(snippet, occurrences, n_docs)``, cross-document repeats only.

    Same linear shape as duplicate_spans (explode windows → ONE groupBy
    with map-side partials), aggregated on the window STRING so the
    snippet survives to the report; the top-n is a single ordered limit
    over ≤ distinct-window rows. Deterministic tie-break, no floats.
    """
    toks = (df.select(F.col(id_col).alias("id"),
                      F.split(F.col(text_col), " ").alias("t"))
              .filter(F.size("t") >= k)
              .repartition(_par(df)))
    wins = toks.select(
        "id",
        F.explode(F.expr(
            f"transform(sequence(0, size(t) - {k}), "
            f"i -> array_join(slice(t, i + 1, {k}), ' '))")).alias("w"))
    return (wins.groupBy("w")
                .agg(F.count(F.lit(1)).alias("occurrences"),
                     F.countDistinct("id").alias("n_docs"))
                .filter(F.col("n_docs") > 1)
                .orderBy(F.col("occurrences").desc(), F.col("w").asc())
                .limit(top_n)
                .select(F.col("w").alias("snippet"),
                        "occurrences", "n_docs"))


BOILERPLATE_SQL_TEMPLATE = """
WITH toks AS (
    SELECT {id_col} AS id, str_split({text_col}, ' ') AS t
    FROM {table} WHERE len(str_split({text_col}, ' ')) >= {k}),
wins AS (
    SELECT id, array_to_string(t[i + 1 : i + {k}], ' ') AS w
    FROM toks, unnest(generate_series(0, len(t) - {k})) AS u(i)),
agg AS (
    SELECT w AS snippet, COUNT(*) AS occurrences,
           COUNT(DISTINCT id) AS n_docs
    FROM wins GROUP BY w HAVING COUNT(DISTINCT id) > 1)
SELECT snippet, occurrences, n_docs
FROM agg ORDER BY occurrences DESC, snippet ASC LIMIT {top_n}"""


# DuckDB twin: identical tokenization (str_split on ' '), window hashes
# (1-based inclusive slicing t[i+1 : i+k] == 0-based window [i, i+k)),
# duplicate rule, island merge, and output aliases. LAG() + SUM() OVER
# reproduce the Spark islands; COUNT(*) stays BIGINT in both engines.
DUPLICATE_SPANS_SQL_TEMPLATE = """
WITH toks AS (
    SELECT {id_col} AS id, str_split({text_col}, ' ') AS t
    FROM {table} WHERE len(str_split({text_col}, ' ')) >= {k}),
wins AS (
    SELECT id, i AS pos,
           md5(array_to_string(t[i + 1 : i + {k}], ' ')) AS h
    FROM toks, unnest(generate_series(0, len(t) - {k})) AS u(i)),
dup AS (
    SELECT h FROM wins GROUP BY h HAVING {dup_rule}),
marked AS (
    SELECT id, pos FROM wins WHERE h IN (SELECT h FROM dup)),
flagged AS (
    SELECT id, pos,
           CASE WHEN pos <= LAG(pos) OVER w + {k} THEN 0 ELSE 1 END AS brk
    FROM marked WINDOW w AS (PARTITION BY id ORDER BY pos)),
islands AS (
    SELECT id, pos,
           SUM(brk) OVER (PARTITION BY id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
    FROM flagged)
SELECT id AS doc_id,
       CAST(MIN(pos) AS INTEGER) AS span_start,
       CAST(MAX(pos) + {k} AS INTEGER) AS span_end,
       CAST(MAX(pos) + {k} - MIN(pos) AS INTEGER) AS span_tokens,
       COUNT(*) AS n_windows
FROM islands GROUP BY id, island"""

# keep_first=True twin: identical except the canonical (id, pos)-first
# occurrence of each duplicated window is excluded from `marked`.
DUPLICATE_SPANS_KEEP_FIRST_SQL_TEMPLATE = DUPLICATE_SPANS_SQL_TEMPLATE.replace(
    """marked AS (
    SELECT id, pos FROM wins WHERE h IN (SELECT h FROM dup)),""",
    """marked AS (
    SELECT id, pos FROM (
        SELECT id, pos,
               ROW_NUMBER() OVER (PARTITION BY h ORDER BY id, pos) AS rn
        FROM wins WHERE h IN (SELECT h FROM dup)) ranked
    WHERE rn >= 2),""")



# cut_spans twin: {spans_sql} is a full spans query (e.g. the template
# above, formatted); nested lambdas replace Spark's exists() (DuckDB
# rejects subqueries inside lambdas — len(list_filter(...)) = 0 is the
# equivalent), t[i + 1] mirrors element_at's 1-based indexing.
CUT_SPANS_SQL_TEMPLATE = """
WITH spans AS ({spans_sql}),
sp AS (SELECT doc_id AS id,
              list(struct_pack(s := span_start, e := span_end)) AS sp
       FROM spans GROUP BY doc_id),
toks AS (SELECT {id_col} AS id,
                COALESCE(str_split({text_col}, ' '),
                         CAST([] AS VARCHAR[])) AS t
         FROM {table}),
j AS (SELECT toks.id, t, sp.sp FROM toks LEFT JOIN sp ON sp.id = toks.id),
k AS (SELECT id, t,
             CASE WHEN sp IS NULL THEN t ELSE
               list_transform(list_filter(generate_series(0, len(t) - 1),
                   i -> len(list_filter(sp,
                            x -> x.s <= i AND i < x.e)) = 0),
                 i -> t[i + 1]) END AS kept
      FROM j)
SELECT id AS doc_id,
       -- array_to_string([]) is NULL in DuckDB but '' via Spark's
       -- array_join: coalesce pins the fully-cut-document case
       COALESCE(array_to_string(kept, ' '), '') AS clean_text,
       CAST(len(kept) AS INTEGER) AS kept_tokens,
       CAST(len(t) - len(kept) AS INTEGER) AS removed_tokens
FROM k"""


# decontamination twin: {corpus} / {bench} are table names or aliased
# parenthesized subqueries; marked = corpus windows whose hash exists in
# the benchmark's distinct window set, islands merged exactly like the
# dedup template.
CONTAMINATION_SPANS_SQL_TEMPLATE = """
WITH ctoks AS (
    SELECT {id_col} AS id, str_split({text_col}, ' ') AS t
    FROM {corpus} WHERE len(str_split({text_col}, ' ')) >= {k}),
cwins AS (
    SELECT id, i AS pos,
           md5(array_to_string(t[i + 1 : i + {k}], ' ')) AS h
    FROM ctoks, unnest(generate_series(0, len(t) - {k})) AS u(i)),
btoks AS (
    SELECT str_split({text_col}, ' ') AS t
    FROM {bench} WHERE len(str_split({text_col}, ' ')) >= {k}),
bwins AS (
    SELECT DISTINCT md5(array_to_string(t[i + 1 : i + {k}], ' ')) AS h
    FROM btoks, unnest(generate_series(0, len(t) - {k})) AS u(i)),
marked AS (
    SELECT id, pos FROM cwins WHERE h IN (SELECT h FROM bwins)),
flagged AS (
    SELECT id, pos,
           CASE WHEN pos <= LAG(pos) OVER w + {k} THEN 0 ELSE 1 END AS brk
    FROM marked WINDOW w AS (PARTITION BY id ORDER BY pos)),
islands AS (
    SELECT id, pos,
           SUM(brk) OVER (PARTITION BY id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
    FROM flagged)
SELECT id AS doc_id,
       CAST(MIN(pos) AS INTEGER) AS span_start,
       CAST(MAX(pos) + {k} AS INTEGER) AS span_end,
       CAST(MAX(pos) + {k} - MIN(pos) AS INTEGER) AS span_tokens,
       COUNT(*) AS n_windows
FROM islands GROUP BY id, island"""


def leakage_report(benchmark: DataFrame, corpus: DataFrame,
                   id_col: str, text_col: str, k: int = 8) -> DataFrame:
    """Per-BENCHMARK-doc contamination report — the number papers
    actually publish ("x% of the eval set appears in the training
    corpus"): for every benchmark document, how many of its k-token
    windows occur anywhere in the corpus, and the leaked fraction.
    The reverse perspective of :func:`contamination_spans` (which marks
    the CORPUS side for cutting); both share the window-fingerprint
    machinery so the two reports can never disagree about what a match
    is.

    Scale: benchmark window hashes are tiny next to a 100 TB corpus
    and BROADCAST into a map-side semi-join that filters the corpus
    window stream down to matched hashes only (never the corpus
    shuffling wholesale); the distinct matched-hash set — bounded by
    the benchmark's own window count — broadcasts back to mark the
    benchmark windows. Benchmark docs shorter than k tokens report
    zero windows and fraction 0.0.

    Returns ``(doc_id, n_windows, n_leaked, leak_fraction)``.
    """
    bw = _window_fingerprints(benchmark, id_col, text_col, k) \
        .localCheckpoint(eager=False)     # hash set + per-doc counts
    bh = bw.select("h").distinct()
    matched = (_window_fingerprints(corpus, id_col, text_col, k)
               .join(F.broadcast(bh), "h", "left_semi")
               .select("h").distinct())
    leaked = (bw.join(F.broadcast(matched.withColumn(
                  "m", F.lit(1))), "h", "left")
                .groupBy("id")
                .agg(F.count(F.lit(1)).alias("n_windows"),
                     F.count("m").alias("n_leaked")))
    return (benchmark.select(F.col(id_col).alias("id")).distinct()
            .join(leaked, "id", "left")
            .select(F.col("id").alias("doc_id"),
                    F.coalesce("n_windows", F.lit(0)).cast("long")
                     .alias("n_windows"),
                    F.coalesce("n_leaked", F.lit(0)).cast("long")
                     .alias("n_leaked"),
                    F.when(F.coalesce("n_windows", F.lit(0)) == 0,
                           F.lit(0.0))
                     .otherwise(F.col("n_leaked").cast("double")
                                / F.col("n_windows").cast("double"))
                     .alias("leak_fraction")))


LEAKAGE_REPORT_SQL_TEMPLATE = """
WITH btoks AS (
    SELECT {id_col} AS id, str_split({text_col}, ' ') AS t
    FROM {bench} WHERE len(str_split({text_col}, ' ')) >= {k}),
bwins AS (
    SELECT id, md5(array_to_string(t[i + 1 : i + {k}], ' ')) AS h
    FROM btoks, unnest(generate_series(0, len(t) - {k})) AS u(i)),
ctoks AS (
    SELECT str_split({text_col}, ' ') AS t
    FROM {corpus} WHERE len(str_split({text_col}, ' ')) >= {k}),
matched AS (
    SELECT DISTINCT md5(array_to_string(t[i + 1 : i + {k}], ' ')) AS h
    FROM ctoks, unnest(generate_series(0, len(t) - {k})) AS u(i)
    WHERE md5(array_to_string(t[i + 1 : i + {k}], ' '))
          IN (SELECT h FROM bwins)),
leaked AS (
    SELECT id, CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(COUNT(*) FILTER (WHERE h IN (SELECT h FROM matched))
                AS BIGINT) AS n_leaked
    FROM bwins GROUP BY id)
SELECT b.id AS doc_id,
       COALESCE(l.n_windows, 0) AS n_windows,
       COALESCE(l.n_leaked, 0) AS n_leaked,
       CASE WHEN COALESCE(l.n_windows, 0) = 0 THEN 0.0
            ELSE CAST(l.n_leaked AS DOUBLE) / CAST(l.n_windows AS DOUBLE)
       END AS leak_fraction
FROM (SELECT DISTINCT {id_col} AS id FROM {bench}) b
LEFT JOIN leaked l ON l.id = b.id"""
