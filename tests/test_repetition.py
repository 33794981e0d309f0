"""Gopher-style repetition metrics (`tx.repetition_stats`) and the
repetition filter — edge semantics the oracle run can't isolate:
single-token docs (no bigrams), char-mass tie-breaking, and the exact
Rae-et-al-style definitions on hand-computable documents."""

from __future__ import annotations

import pytest

from time_series_data_trimmer_spark.operators import text as tx


def _stats(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = tx.repetition_stats(df)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_known_document(spark):
    # tokens: the(2) cat(1) sat(1) -> n=4 nd=3 chars=12
    # top unigram by char mass: 'the' 2*3=6 over cat 3 / sat 3
    s = _stats(spark, [(1, "the cat the sat")])[1]
    assert s["n_tokens"] == 4
    assert s["n_distinct"] == 3
    assert s["dup_token_frac"] == pytest.approx(0.25)
    assert s["top_token"] == "the"
    assert s["top_token_count"] == 2
    assert s["top_token_char_frac"] == pytest.approx(6 / 12)
    # bigrams: 'the cat','cat the','the sat' all count 1; mass = 6 each
    # -> lexicographically smallest among ties wins
    assert s["top_bigram"] == "cat the"
    assert s["top_bigram_count"] == 1
    assert s["top_bigram_char_frac"] == pytest.approx(6 / 12)


def test_single_token_doc_has_empty_bigram(spark):
    s = _stats(spark, [(1, "hello")])[1]
    assert s["n_tokens"] == 1
    assert s["top_bigram"] == ""
    assert s["top_bigram_count"] == 0
    assert s["top_bigram_char_frac"] == 0.0


def test_char_mass_beats_raw_count(spark):
    # 'aa' x3 (mass 6) loses to 'bbbbbbb' x1 (mass 7)
    s = _stats(spark, [(1, "aa aa aa bbbbbbb")])[1]
    assert s["top_token"] == "bbbbbbb"
    assert s["top_token_count"] == 1


def test_tie_breaks_to_lexicographically_smallest(spark):
    # 'xx' and 'yy' both twice: same mass 4 -> 'xx'
    s = _stats(spark, [(1, "yy xx yy xx")])[1]
    assert s["top_token"] == "xx"


def test_null_and_empty_text_dropped(spark):
    out = _stats(spark, [(1, None), (2, "   "), (3, "ok ok")])
    assert set(out) == {3}
    assert out[3]["dup_token_frac"] == pytest.approx(0.5)


def test_whitespace_runs_do_not_create_empty_tokens(spark):
    s = _stats(spark, [(1, "a  a   b")])[1]
    assert s["n_tokens"] == 3
    assert s["n_distinct"] == 2


def test_repetition_filter_rules(spark):
    base = "the a value " + " ".join(f"tok{i}" for i in range(20))
    rows = [
        (1, base),                                # survives every rule
        (2, "the a " + "dup " * 40),              # R4/R5: one token dominates
        (3, " ".join(f"tok{i}" for i in range(25))),  # R3: no stopwords
        (4, "the a tiny doc"),                    # R1: under 20 tokens
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = {r["doc_id"] for r in tx.gopher_repetition_filter(df).collect()}
    assert kept == {1}


# ---------------------------------------------------------------------------
# property: the sorted-run-length argmax equals a brute-force Counter
# ---------------------------------------------------------------------------

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_token = st.text(alphabet="abcx", min_size=1, max_size=4)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tokens=st.lists(_token, min_size=1, max_size=30))
def test_top_token_matches_counter(spark, tokens):
    s = _stats(spark, [(1, " ".join(tokens))])[1]
    cnt = Counter(tokens)
    # argmax by (char mass desc, token asc) — the documented tie-break
    best = min(cnt.items(), key=lambda kv: (-kv[1] * len(kv[0]), kv[0]))
    total_chars = sum(len(t) for t in tokens)
    assert s["top_token"] == best[0]
    assert s["top_token_count"] == best[1]
    assert s["n_tokens"] == len(tokens)
    assert s["n_distinct"] == len(cnt)
    import math
    assert s["top_token_char_frac"] == math.floor(
        best[1] * len(best[0]) / total_chars * 1e6 + 0.5
    ) / 1e6
