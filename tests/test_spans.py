"""Substring-level duplicate spans (functions/spans.py) — behavioral edges
the oracle sweep can't pin: short docs, cross-doc vs global duplicate
rules, overlap/adjacency merging, island boundaries."""

from __future__ import annotations

from keboola_storage_duckdb_spark.functions.spans import duplicate_spans


def _spans(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = duplicate_spans(df, "doc_id", "text", **kw)
    return {(r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_windows)
            for r in out.collect()}


def test_exact_copy_is_one_full_span(spark):
    text = " ".join(f"w{i}" for i in range(12))
    got = _spans(spark, [(1, text), (2, text)], k=4)
    # every window duplicated -> one maximal span covering all 12 tokens,
    # 9 windows of length 4 merged, in BOTH docs
    assert got == {(1, 0, 12, 12, 9), (2, 0, 12, 12, 9)}


def test_shared_infix_bounded(spark):
    shared = "a b c d e"
    got = _spans(spark, [(1, f"x1 x2 {shared} x3 x4"),
                         (2, f"y1 {shared} y2 y3 y4")], k=5)
    # only the 5-token shared run is marked; span = exactly those tokens
    assert got == {(1, 2, 7, 5, 1), (2, 1, 6, 5, 1)}


def test_doc_shorter_than_k_yields_nothing(spark):
    got = _spans(spark, [(1, "a b c"), (2, "a b c")], k=4)
    assert got == set()


def test_cross_doc_excludes_internal_repetition(spark):
    rep = "p q r s p q r s p q r s"     # internal repeats only
    assert _spans(spark, [(1, rep), (2, "u v w x y z")], k=4) == set()
    # global rule counts within-doc occurrences: "p q r s" repeats
    got = _spans(spark, [(1, rep), (2, "u v w x y z")],
                 k=4, cross_doc=False)
    assert any(d == 1 for d, *_ in got) and not any(d == 2 for d, *_ in got)


def test_disjoint_duplicates_stay_separate_islands(spark):
    a = "s1 s2 s3 s4 GAPA1 GAPA2 GAPA3 GAPA4 GAPA5 t1 t2 t3 t4"
    b = "s1 s2 s3 s4 GAPB1 GAPB2 GAPB3 GAPB4 GAPB5 t1 t2 t3 t4"
    got = _spans(spark, [(1, a), (2, b)], k=4)
    # two distinct 4-token spans per doc (positions 0-4 and 9-13),
    # separated by > k so they must NOT merge
    assert got == {(1, 0, 4, 4, 1), (1, 9, 13, 4, 1),
                   (2, 0, 4, 4, 1), (2, 9, 13, 4, 1)}


def test_adjacent_windows_merge(spark):
    # doc 2 contains two doc-1 windows that touch (end of first == start
    # of second): islands merge on adjacency, not only overlap
    a = "a1 a2 a3 a4 b1 b2 b3 b4"
    got = _spans(spark, [(1, a), (2, f"z1 {a} z2")], k=4)
    full = {(1, 0, 8, 8, 5), (2, 1, 9, 8, 5)}
    assert got == full


def test_cut_spans_removes_and_passes_through(spark):
    from keboola_storage_duckdb_spark.functions.spans import cut_spans

    shared = "a b c d e"
    rows = [(1, f"x1 x2 {shared} x3 x4"),
            (2, f"y1 {shared} y2 y3 y4"),
            (3, "entirely unique words only here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = duplicate_spans(df, "doc_id", "text", k=5)
    out = {r.doc_id: r for r in
           cut_spans(df, spans, "doc_id", "text").collect()}
    assert out[1].clean_text == "x1 x2 x3 x4"
    assert (out[1].kept_tokens, out[1].removed_tokens) == (4, 5)
    assert out[2].clean_text == "y1 y2 y3 y4"
    # doc without spans passes through byte-identical
    assert out[3].clean_text == rows[2][1] and out[3].removed_tokens == 0


def test_cut_spans_full_document(spark):
    from keboola_storage_duckdb_spark.functions.spans import cut_spans

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
    spans = duplicate_spans(df, "doc_id", "text", k=4)
    out = {r.doc_id: r for r in
           cut_spans(df, spans, "doc_id", "text").collect()}
    for d in (1, 2):
        assert out[d].clean_text == ""
        assert (out[d].kept_tokens, out[d].removed_tokens) == (0, 10)


def test_contamination_spans_cut(spark):
    """Span-level decontamination: only the benchmark-overlapping run is
    cut; the rest of the document survives (vs the doc-level flag that
    would drop everything)."""
    from keboola_storage_duckdb_spark.functions.spans import (
        contamination_spans, cut_spans)

    bench = spark.createDataFrame(
        [(100, "the secret eval answer is forty two")],
        ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(1, "intro words then the secret eval answer is forty two and more"),
         (2, "completely unrelated document text here")],
        ["doc_id", "text"])
    spans = contamination_spans(corpus, bench, "doc_id", "text", k=4)
    got = {(r.doc_id, r.span_start, r.span_end) for r in spans.collect()}
    # doc 1 tokens: the shared 7-token run spans positions 3..10
    assert got == {(1, 3, 10)}
    out = {r.doc_id: r for r in
           cut_spans(corpus, spans, "doc_id", "text").collect()}
    assert out[1].clean_text == "intro words then and more"
    assert out[1].removed_tokens == 7
    assert out[2].clean_text == corpus.collect()[1].text


def test_keep_first_survivor_policy(spark):
    """keep_first=True: the canonical (doc_id, pos)-first occurrence of
    each duplicated run survives the cut; every other copy is removed —
    the corpus keeps exactly one copy."""
    from keboola_storage_duckdb_spark.functions.spans import cut_spans

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, text)], ["doc_id", "text"])
    spans = duplicate_spans(df, "doc_id", "text", k=4, keep_first=True)
    got = {r.doc_id for r in spans.collect()}
    assert got == {2, 3}                  # doc 1 is canonical — untouched
    out = {r.doc_id: r for r in
           cut_spans(df, spans, "doc_id", "text").collect()}
    assert out[1].clean_text == text and out[1].removed_tokens == 0
    for d in (2, 3):
        assert out[d].clean_text == "" and out[d].removed_tokens == 10
