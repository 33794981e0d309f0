"""Hand-computed contract test for the corpus-trained bigram LM score
(`tx.bigram_lm_score`); oracle parity is covered by the registered
`text_bigram_lm_score` query."""

from time_series_data_trimmer_spark.operators import text as tx


def test_bigram_lm_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "solo"), (4, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.bigram_lm_score(df).collect()}
    # corpus: bigrams {a b: 2, b a: 1}; contexts {a: 2, b: 1}; V = 3
    # (tokens a, b, solo); p(b|a) = 3/5, p(a|b) = 2/4
    # nll(a b) = -log2(0.6) = 0.736966; nll(b a) = -log2(0.5) = 1.0
    assert set(out) == {1, 2}  # <2-token and NULL docs excluded
    assert out[2]["n_bigrams"] == 1
    assert out[2]["avg_nll"] == 0.736966
    assert out[1]["n_bigrams"] == 2
    assert out[1]["avg_nll"] == round((0.736966 + 1.0) / 2, 6)


def test_bigram_lm_repartition_stable(spark):
    rows = [(i, f"tok{i % 7} tok{(i + 1) % 5} tok{i % 3} common common") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["avg_nll"] for r in tx.bigram_lm_score(df).collect()}
    b = {
        r["doc_id"]: r["avg_nll"]
        for r in tx.bigram_lm_score(df.repartition(7)).collect()
    }
    assert a == b
