"""r12 wave invariants: probe-dispatched dedup, incremental BPE
trainer equivalence, water-fill integer exactness."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import time_series_data_trimmer_spark.operators.dedup as dd
import time_series_data_trimmer_spark.operators.text as tx


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (4, "pack my box with five dozen liquor jugs"),
        (6, "pack my box with five dozen liquor jugs"),
        (8, "sphinx of black quartz judge my vow"),
        (10, "completely different text with unique words here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_density_decision_is_integer_exact(docs):
    dec = dd.posting_density_decision(docs, envelope=(64, 1))
    assert dec["method"] == "ppjoin"
    # re-derive the forecast by hand from the gram posting lists
    toks = docs.select(
        "doc_id", F.explode(dd.word_shingles(F.col("text"))).alias("g")
    )
    dfs = [
        r["df"]
        for r in toks.groupBy("g").agg(F.count(F.lit(1)).alias("df")).collect()
    ]
    assert dec["n_postings"] == sum(dfs)
    assert dec["candidate_upper_bound"] == sum(d * (d - 1) // 2 for d in dfs)
    # the tightened envelope must flip the decision via the SAME ints
    tight = dd.posting_density_decision(docs, envelope=(0, 1))
    assert tight["method"] == "lsh_first"
    assert tight["n_postings"] == dec["n_postings"]
    assert tight["candidate_upper_bound"] == dec["candidate_upper_bound"]


def test_auto_pairs_exact_arm_matches_brute_force(docs):
    pairs, dec = dd.dedup_auto_pairs(docs, min_jaccard=0.5, envelope=(64, 1))
    assert dec["method"] == "ppjoin"
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (4, 6) in got  # exact duplicate pair
    assert (0, 2) in got  # 1-word-off near-dup at tau=0.5
    assert all(a < b for a, b in got)


def test_auto_pairs_lsh_arm_is_subset_of_exact(docs):
    exact, _ = dd.dedup_auto_pairs(docs, min_jaccard=0.5, envelope=(64, 1))
    lsh, dec = dd.dedup_auto_pairs(docs, min_jaccard=0.5, envelope=(0, 1))
    assert dec["method"] == "lsh_first"
    e = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    l = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    # LSH verifies exactly on its candidates: no false positives, and
    # the identical-text pair shares every band so it can never be lost
    assert l <= e
    assert (4, 6) in l
    # jaccard values on shared pairs are the same exact ratio
    ej = {(r["id_a"], r["id_b"]): r["jaccard"] for r in exact.collect()}
    lj = {(r["id_a"], r["id_b"]): r["jaccard"] for r in lsh.collect()}
    for k in lj:
        assert lj[k] == ej[k]


def test_bpe_incremental_trainer_matches_full_recount(spark):
    """The r12 incremental pair-count maintenance must be
    merge-for-merge identical to the distributed trainer (which still
    recounts via Spark aggregation) — counts AND tie-breaks."""
    rows = [
        (1, "a b a b a b c"),
        (2, "a b c d a b"),
        (3, "x y x y x y x y"),
        (4, "c d c d"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    local = tx.bpe_train_merges_local(df, rounds=6)
    dist = tx.bpe_train_merges(df, rounds=6)
    assert local == dist
    assert len(local) == 6


def test_waterfill_budget_integer_div(spark):
    """Budget must be sum(avail) div 2 exactly (ADVICE r11 #3): odd
    totals truncate, never round."""
    from time_series_data_trimmer_spark.queries import REGISTRY
    import time_series_data_trimmer_spark.queries_ext  # noqa: F401

    fn, _ = REGISTRY["mix_waterfill_token_budget"]
    out = fn(spark, "/root/testdata/sf0.001").collect()
    total = sum(r["avail_tokens"] for r in out)
    assert all(r["budget_tokens"] == total // 2 for r in out)
    alloc = sum(r["allocated_tokens"] for r in out)
    assert alloc <= total // 2
