"""Wave-34: BPE merge trainer — hand-checked merge semantics, overlap
handling, and phrase growth across rounds."""

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import text as tx


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_learns_planted_phrase_then_extends_it(spark):
    texts = ["new york city is big"] * 6 + ["new york state"] * 3 + ["the city"]
    out = tx.bpe_merge_trainer(_docs(spark, texts), rounds=2).collect()
    r1, r2 = out[0], out[1]
    # round 1: 'new york' appears 9 times, the most frequent pair
    assert (r1["lhs"], r1["rhs"], r1["n_merges"]) == ("new", "york", 9)
    # round 2: the merged token itself pairs on: 'new york'+'city' (6)
    # beats 'city is' (6)? tie -> lexicographic a asc: 'city' < 'new york'
    assert r2["round"] == 2 and r2["n_merges"] == 6
    assert (r2["lhs"], r2["rhs"]) == ("city", "is")  # tie-break a asc


def test_bpe_overlap_merges_leftmost_nonoverlapping(spark):
    # 'a a a' with pair (a,a): count sees 2 adjacencies; rewrite merges
    # the first two only -> next round pair ('a a', 'a') exists
    out = tx.bpe_merge_trainer(_docs(spark, ["a a a"] * 4), rounds=2).collect()
    assert (out[0]["lhs"], out[0]["rhs"], out[0]["n_merges"]) == ("a", "a", 8)
    assert (out[1]["lhs"], out[1]["rhs"]) == ("a a", "a")


def test_bpe_round_counts_never_exceed_prior_corpus(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["text_bpe_merge_rounds"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert [r["round"] for r in rows] == [1, 2, 3, 4, 5]
    assert all(r["n_merges"] > 0 for r in rows)
    # round 1 is the global argmax over the raw corpus: every later
    # round's winning count is bounded by it (merges only shrink or
    # relabel adjacencies; a new pair inherits at most the merged count)
    assert all(r["n_merges"] <= rows[0]["n_merges"] for r in rows[1:])
