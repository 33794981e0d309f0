"""Bounded n-gram Jaccard blocking: a skewed length distribution must
not explode the within-bucket quadratic pairing."""

import pandas as pd
from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators.dedup import (
    ngram_jaccard_overflow,
    ngram_jaccard_pairs,
)

CAP = 10


def _skewed(spark, n=200):
    """All docs land in the SAME length bucket (equal length ±1 word):
    the worst case for length-bucket blocking — n²/2 pairs unbounded."""
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(12)))
        for i in range(n)
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_capped_pair_count_is_bounded(spark):
    df = _skewed(spark)
    unbounded = ngram_jaccard_pairs(df).count()
    assert unbounded > 10_000  # the skew really is quadratic

    capped = ngram_jaccard_pairs(df, max_bucket=CAP)
    # ≤ CAP docs survive per block; with B blocks the pair count is
    # ≤ B · CAP·(CAP-1)/2 — here every doc shares ~2 blocks
    assert capped.count() <= 2 * CAP * (CAP - 1) // 2


def test_cap_is_deterministic_prefix_by_id(spark):
    df = _skewed(spark)
    capped = ngram_jaccard_pairs(df, max_bucket=CAP)
    ids = {r["id_a"] for r in capped.collect()} | {
        r["id_b"] for r in capped.collect()
    }
    # survivors are the lowest ids of each block (deterministic truncation)
    assert ids and max(ids) < CAP


def test_overflow_report_names_truncated_buckets(spark):
    df = _skewed(spark, n=200)
    report = ngram_jaccard_overflow(df, CAP).collect()
    assert report, "skewed data must produce an overflow report"
    total_dropped = sum(r["n_dropped"] for r in report)
    # 200 docs × 2 blocks = 400 memberships; ≤ CAP kept per block
    assert total_dropped >= 400 - CAP * len(report) - 1
    for r in report:
        assert r["n_docs"] > CAP
        assert r["n_dropped"] == r["n_docs"] - CAP


def test_uncapped_default_semantics_unchanged(spark):
    # the registered dedup_ngram_jaccard query runs uncapped; the cap
    # must be strictly opt-in
    rows = [(0, "a b c d e f"), (1, "a b c d e g"), (2, "x y z p q r")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = ngram_jaccard_pairs(df, min_jaccard=0.2).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(0, 1)}
