"""Semantic tests for dedup_spans_global (llm/dedup.py, r8): the
gram-granular exact-substring rule — a token dies iff a non-owner
occurrence of a corpus-duplicated n-gram covers it. Exact-value parity
vs DuckDB is the dedup_spans gate row."""

from __future__ import annotations

from jetro_spark.llm.dedup import dedup_spans_global


def _run(spark, rows, n):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")
    return {r["doc_id"]: r
            for r in dedup_spans_global(df, n=n).collect()}


def test_owner_keeps_duplicate_loses(spark):
    span = "a b c d"                      # the duplicated 4-gram
    out = _run(spark, [span + " tail0",   # doc 0: owner (first occ)
                       span + " tail1",   # doc 1: span removed
                       "x y z w v"],      # doc 2: untouched
               n=4)
    assert out[0]["text_dedup"] == span + " tail0"
    assert out[1]["text_dedup"] == "tail1"
    assert out[1]["n_kept"] == 1 and out[1]["n_tokens"] == 5
    assert out[2]["text_dedup"] == "x y z w v"


def test_overlapping_duplicate_grams_merge_spans(spark):
    # docs share a 6-token run; with n=4 the three duplicated grams in
    # doc 1 overlap and their union (all 6 tokens) is removed
    run = "p q r s t u"
    out = _run(spark, [run + " one", run + " two"], n=4)
    assert out[0]["text_dedup"] == run + " one"
    assert out[1]["text_dedup"] == "two"


def test_within_doc_repetition_keeps_first(spark):
    # one doc repeating its own 4-gram: the first occurrence owns,
    # the second is removed
    out = _run(spark, ["m n o p filler m n o p"], n=4)
    assert out[0]["text_dedup"] == "m n o p filler"
    assert out[0]["n_kept"] == 5 and out[0]["n_tokens"] == 9


def test_docs_shorter_than_n_pass_through(spark):
    out = _run(spark, ["one two", "one two"], n=4)
    assert out[0]["text_dedup"] == "one two"
    assert out[1]["text_dedup"] == "one two"   # no 4-gram exists
