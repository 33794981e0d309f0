"""Substring-level (span) dedup: crafted-corpus semantics tests for
`duplicate_spans` / `duplicate_span_stats` / `remove_duplicate_spans`
(Lee et al. ACL 2022 granularity; oracle parity is covered by the
registered queries — these pin the operator contracts the oracle
can't see: merge behavior, ownership, idempotence-on-output)."""

import pytest
from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import dedup as dd


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


W = "w{} "  # distinct filler tokens


def _words(a, b):
    return " ".join(f"w{i}" for i in range(a, b))


@pytest.fixture(scope="module")
def corpus(spark):
    shared = _words(0, 10)  # 10 shared tokens -> dup 4-grams
    rows = [
        (1, shared + " " + _words(100, 110), "a"),  # owner of the shared block
        (2, _words(200, 210) + " " + shared, "a"),  # shared block at the tail
        (3, _words(300, 320), "b"),  # no duplication
        (4, shared, "b"),  # fully covered by the shared block
        (5, None, "b"),  # NULL text passes through
        (6, "only three tokens", "b"),  # shorter than k -> no grams
    ]
    return _docs(spark, rows)


def test_spans_found_and_merged(corpus):
    out = dd.duplicate_spans(corpus, k=4).orderBy("doc_id", "span_start").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    # doc 1: shared block = tokens 1..10, overlapping 4-gram hits merge to one span
    assert by_doc[1] == [(1, 10)]
    # doc 2: shared block sits at positions 11..20
    assert by_doc[2] == [(11, 20)]
    # doc 4 fully covered
    assert by_doc[4] == [(1, 10)]
    # docs 3/5/6 emit nothing
    assert set(by_doc) == {1, 2, 4}


def test_span_min_docs_threshold(corpus):
    # the shared block appears in 3 docs; min_docs=4 finds nothing
    assert dd.duplicate_spans(corpus, k=4, min_docs=4).count() == 0


def test_removal_ownership_and_full_coverage(corpus):
    out = {r["doc_id"]: r["text"] for r in dd.remove_duplicate_spans(corpus, k=4).collect()}
    shared = _words(0, 10)
    # doc 1 is min-id owner of every shared gram -> untouched
    assert out[1] == shared + " " + _words(100, 110)
    # doc 2 loses the shared tail, keeps its own head
    assert out[2] == _words(200, 210)
    # doc 4 fully covered -> empty string, not NULL
    assert out[4] == ""
    # untouched docs pass through (including NULL text and short docs)
    assert out[3] == _words(300, 320)
    assert out[5] is None
    assert out[6] == "only three tokens"


def test_removal_second_pass_noop(corpus):
    once = dd.remove_duplicate_spans(corpus, k=4)
    again = dd.remove_duplicate_spans(once, k=4)
    assert {r["doc_id"]: r["text"] for r in once.collect()} == {
        r["doc_id"]: r["text"] for r in again.collect()
    }


def test_stats_tokens_conserved(corpus):
    stats = {
        r["source"]: r
        for r in dd.duplicate_span_stats(corpus, k=4, by_col="source").collect()
    }
    # source a: docs 1 (20 tok, 10 dup) + 2 (20 tok, 10 dup)
    assert stats["a"]["total_tokens"] == 40
    assert stats["a"]["dup_span_tokens"] == 20
    assert stats["a"]["dup_fraction"] == 0.5
    # source b: docs 3 (20) + 4 (10, all dup) + 5 (0) + 6 (3)
    assert stats["b"]["total_tokens"] == 33
    assert stats["b"]["dup_span_tokens"] == 10


def test_spans_disjoint_islands(spark):
    # two separate shared regions inside one doc stay two spans
    blk1, blk2 = _words(0, 6), _words(50, 56)
    df = _docs(
        spark,
        [
            (1, blk1 + " " + _words(100, 120) + " " + blk2, "a"),
            (2, blk1 + " x y z " + blk2, "a"),
        ],
    )
    spans = [
        (r["span_start"], r["span_end"])
        for r in dd.duplicate_spans(df, k=4)
        .filter(F.col("doc_id") == 1)
        .orderBy("span_start")
        .collect()
    ]
    assert spans == [(1, 6), (27, 32)]
