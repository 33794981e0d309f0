"""r8: BPE tokenizer APPLICATION (`text.bpe_encode`) — the learned
merge table applied to a corpus with the trainer's exact fold
semantics, plus the real-token packing hook
(`sequence_pack_offsets(n_tokens_col=...)`).

Reference anchor: the trainer itself mirrors Sennrich et al. 2016
word-level BPE (see text.bpe_merge_trainer); the encoder is the
deployment half a tokenizer ships.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from time_series_data_trimmer_spark.operators import sampling as sp
from time_series_data_trimmer_spark.operators import text as tx


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_encode_applies_merges_leftmost_nonoverlapping(spark):
    """'a a a' with merge (a,a): first two merge, third survives —
    the fold's (arr, carry) semantics, identical to the trainer's
    rewrite (shared `_merge_fold`)."""
    df = _docs(spark, [(1, "a a a"), (2, "a a a a")])
    out = {
        r["doc_id"]: r["bpe_tokens"]
        for r in tx.bpe_encode(df, [("a", "a")]).collect()
    }
    assert out[1] == ["a a", "a"]
    assert out[2] == ["a a", "a a"]


def test_encode_applies_merges_in_training_order(spark):
    """Later merges see earlier merges' output: (a,b) then (a b,c)
    turns 'a b c' into one token 'a b c'."""
    df = _docs(spark, [(1, "a b c"), (2, "b c a")])
    merges = [("a", "b"), ("a b", "c")]
    out = {
        r["doc_id"]: r["bpe_tokens"] for r in tx.bpe_encode(df, merges).collect()
    }
    assert out[1] == ["a b c"]
    assert out[2] == ["b", "c", "a"]  # no adjacency → untouched


def test_encode_accepts_trainer_tuples_and_matches_trainer_rewrite(spark):
    """bpe_encode over the trainer's own (round, lhs, rhs, n) tuples
    reproduces the trainer's final rewritten corpus: encoding the
    training corpus with the learned table is the identity check
    between the two halves."""
    df = _docs(
        spark,
        [(i, "the cat sat on the mat " * 3) for i in range(4)]
        + [(9, "a different doc entirely")],
    )
    merges = tx.bpe_train_merges(df, rounds=3)
    assert len(merges) == 3 and all(len(m) == 4 for m in merges)
    enc = tx.bpe_encode(df, merges)
    # every merged token contains a space; re-splitting recovers raw
    row = enc.filter(F.col("doc_id") == 0).collect()[0]
    rejoined = " ".join(row["bpe_tokens"]).split(" ")
    raw = [t for t in "the cat sat on the mat ".lower().split() * 3 if t]
    assert rejoined == raw
    assert row["n_tokens_raw"] == len(raw)


def test_encode_normalization_and_null_text(spark):
    """Same normalization as the trainer: lowercase, non-alnum → space;
    NULL text rows are dropped; all-punctuation docs encode to []."""
    df = _docs(spark, [(1, "Foo,BAR!"), (2, None), (3, "!!!")])
    out = {r["doc_id"]: r for r in tx.bpe_encode(df, [("x", "y")]).collect()}
    assert set(out) == {1, 3}
    assert out[1]["bpe_tokens"] == ["foo", "bar"]
    assert out[3]["bpe_tokens"] == [] and out[3]["n_tokens_raw"] == 0


def test_encode_checkpoint_batching_matches_unbatched(spark):
    """checkpoint_every bounds codegen depth without changing values."""
    df = _docs(spark, [(1, "a b c d a b c d a b")])
    merges = [("a", "b"), ("c", "d"), ("a b", "c d")]
    a = tx.bpe_encode(df, merges, checkpoint_every=1).collect()[0]["bpe_tokens"]
    b = tx.bpe_encode(df, merges, checkpoint_every=0).collect()[0]["bpe_tokens"]
    assert a == b == ["a b c d", "a b c d", "a b"]


def test_pack_offsets_on_precomputed_counts(spark):
    """sequence_pack_offsets(n_tokens_col=...) budgets on the given
    counts (not the chars/4 estimate) and keeps the packing contract:
    contiguous [tok_start, tok_end) intervals in hash order, seq ids =
    floor division of the global offsets."""
    df = spark.createDataFrame(
        [(i, 7) for i in range(1, 41)], "doc_id long, n_tokens long"
    )
    out = sp.sequence_pack_offsets(
        df, seq_len=10, n_tokens_col="n_tokens"
    ).collect()
    assert len(out) == 40
    rows = sorted(out, key=lambda r: r["tok_start"])
    assert rows[0]["tok_start"] == 0
    for prev, cur in zip(rows, rows[1:]):
        assert cur["tok_start"] == prev["tok_end"]  # contiguous
    for r in rows:
        assert r["tok_end"] - r["tok_start"] == 7
        assert r["first_seq"] == r["tok_start"] // 10
        assert r["last_seq"] == (r["tok_end"] - 1) // 10


def test_pack_offsets_estimate_path_unchanged(spark):
    """The default text_col path still runs the chars/4 estimate —
    n_tokens_col is additive, not a behavior change."""
    df = _docs(spark, [(1, "x" * 40), (2, "y" * 12)])
    out = {
        r["doc_id"]: r["n_tokens"]
        for r in sp.sequence_pack_offsets(df, seq_len=8).collect()
    }
    est = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", tx.token_count(F.col("text")).alias("n")
        ).collect()
    }
    assert out == {k: v for k, v in est.items() if v > 0}
