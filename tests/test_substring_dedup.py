"""Cross-document exact-substring dedup (Lee et al. 2021 ExactSubstr
mode) — operator-level semantics on constructed docs plus the paper's
all-but-one-copy guarantee as a property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from team_02_spark.operators.dedup import (
    strip_cross_duplicate_spans,
    substring_dedup_stats,
    substring_duplicate_spans,
)

K = 4

W = "w{} "  # distinct filler tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _filler(start, n):
    return " ".join(f"u{start + i}" for i in range(n))


def test_no_shared_runs_no_spans(spark):
    docs = _docs(spark, [(1, _filler(0, 10)), (2, _filler(100, 10))])
    assert substring_duplicate_spans(docs, k=K).count() == 0


def test_shared_run_marks_all_but_canonical(spark):
    shared = "a b c d"  # exactly K tokens
    docs = _docs(spark, [
        (1, _filler(0, 3) + " " + shared),
        (2, shared + " " + _filler(100, 3)),
        (3, _filler(200, 2) + " " + shared + " " + _filler(300, 2)),
    ])
    spans = substring_duplicate_spans(docs, k=K).collect()
    # canonical = doc 1 (smallest doc_id*1e6+pos); docs 2 and 3 marked
    by_doc = {r.doc_id: (r.span_start, r.span_end) for r in spans}
    assert set(by_doc) == {2, 3}
    assert by_doc[2] == (0, 3)
    assert by_doc[3] == (2, 5)


def test_overlapping_covers_merge_to_one_span(spark):
    # a run of K+2 tokens shared => 3 overlapping K-gram anchors in
    # the non-canonical doc merge into ONE maximal span of K+2 tokens
    shared = "a b c d e f"
    docs = _docs(spark, [
        (1, shared + " " + _filler(0, 3)),
        (2, _filler(100, 3) + " " + shared),
    ])
    spans = substring_duplicate_spans(docs, k=K).collect()
    assert len(spans) == 1
    (r,) = spans
    assert (r.doc_id, r.span_start, r.span_end, r.span_tokens) == (2, 3, 8, 6)


def test_disjoint_spans_stay_separate(spark):
    s1, s2 = "a b c d", "p q r s"
    docs = _docs(spark, [
        (1, s1 + " " + _filler(0, 4) + " " + s2),
        (2, s1 + " " + _filler(100, 4) + " " + s2),
    ])
    spans = substring_duplicate_spans(docs, k=K)
    got = {(r.span_start, r.span_end) for r in spans.collect()}
    assert got == {(0, 3), (8, 11)}
    assert spans.select("doc_id").distinct().collect()[0].doc_id == 2


def test_stats_zero_rows_kept_and_ratio(spark):
    shared = "a b c d"
    docs = _docs(spark, [
        (1, shared + " " + _filler(0, 4)),   # canonical, 8 tokens
        (2, shared + " " + _filler(100, 4)),  # dup span of 4 / 8 tokens
        (3, _filler(200, 5)),                 # untouched
    ])
    stats = {r.doc_id: r for r in
             substring_dedup_stats(docs, k=K).collect()}
    assert stats[1].dup_tokens == 0 and stats[1].n_spans == 0
    assert stats[2].dup_tokens == 4 and stats[2].n_spans == 1
    assert stats[2].dup_ratio == pytest.approx(0.5)
    assert stats[3].dup_tokens == 0 and stats[3].n_tokens == 5


def test_short_docs_pass_through(spark):
    docs = _docs(spark, [(1, "a b"), (2, "a b")])  # < K tokens
    assert substring_duplicate_spans(docs, k=K).count() == 0
    stats = substring_dedup_stats(docs, k=K).collect()
    assert all(r.dup_tokens == 0 and r.n_tokens == 2 for r in stats)


def test_strip_removes_all_but_one_copy(spark):
    shared = "a b c d e"
    docs = _docs(spark, [
        (1, _filler(0, 3) + " " + shared),
        (2, shared + " " + _filler(100, 3)),
    ])
    out = {r.doc_id: r.text for r in
           strip_cross_duplicate_spans(docs, k=K).collect()}
    assert out[1] == _filler(0, 3) + " " + shared  # canonical untouched
    assert out[2] == _filler(100, 3)


def test_strip_guarantee_no_k_gram_twice_across_docs(spark):
    """Lee et al.'s post-condition: after removal, no K-token run
    occurs in two documents (canonical keeps the only copy)."""
    shared1, shared2 = "a b c d e f", "p q r s"
    docs = _docs(spark, [
        (1, shared1 + " " + _filler(0, 4)),
        (2, _filler(100, 2) + " " + shared1 + " " + shared2),
        (3, shared2 + " " + _filler(200, 4) + " " + shared1),
    ])
    cleaned = strip_cross_duplicate_spans(docs, k=K)
    again = substring_duplicate_spans(cleaned, k=K)
    assert again.count() == 0


def test_strip_preserves_other_columns_and_all_rows(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d x y z w", "s1"), (2, "a b c d q r s t", "s2")],
        "doc_id bigint, text string, source string")
    out = strip_cross_duplicate_spans(docs, k=K)
    assert out.count() == 2
    assert set(out.columns) == {"doc_id", "text", "source"}
    assert {r.source for r in out.collect()} == {"s1", "s2"}


def test_fixture_non_vacuous(spark):
    """The sf fixture's near-duplicate docs must light the lane up —
    a zero-span result would make the driver row vacuous."""
    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    stats = substring_dedup_stats(docs, k=10)
    assert stats.filter(F.col("dup_tokens") > 0).count() > 0
    assert stats.count() == docs.count()


def test_null_and_empty_text_are_safe(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c d e f g h i j"),
         (4, "a b c d e f g h i j")],
        "doc_id bigint, text string")
    stats = {r.doc_id: r for r in
             substring_dedup_stats(docs, k=K).collect()}
    assert stats[1].n_tokens == 0 and stats[1].dup_tokens == 0
    assert stats[2].n_tokens == 0
    out = {r.doc_id: r.text for r in
           strip_cross_duplicate_spans(docs, k=K).collect()}
    assert out[1] == "" and out[2] == ""
    assert out[3] == "a b c d e f g h i j"  # canonical kept
    assert out[4] == ""                     # full-dup doc emptied
