"""r14 optimization-round internals: the one-scan scorer/gate fusion
and the empty-subset aggregation convention must reproduce the shapes
they replaced value-for-value (the oracle pins the registered queries;
these tests pin the OPERATOR contracts on adversarial mini-corpora the
test SFs don't contain — NULL text, empty buckets, sub-threshold docs).
"""

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import text as tx

_DOCS = [
    # (doc_id, lang, source, text)
    (1, "en", "web", None),                       # NULL text
    (2, "en", "web", ""),                         # empty
    (3, "en", "web", "   "),                      # whitespace only
    (4, "en", "web", "short text only"),          # < 10 tokens
    (
        5, "en", "web",
        "the quick brown fox jumps over the lazy dog and it is in that "
        "field of green grass where the animals play all day long",
    ),                                            # plausible survivor
    (
        6, "de", "news",
        "der hund und die katze sind nicht ein paar mit dem vogel und "
        "der maus die gerne zusammen in dem garten spielen und essen",
    ),                                            # non-English (fails lang_en)
    (
        7, "en", "web",
        "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20 21 22 23",
    ),                                            # digit-ratio fail
]


def _docs_df(spark):
    return spark.createDataFrame(
        _DOCS, "doc_id bigint, lang string, source string, text string"
    )


def test_hls_vs_c4_frame_matches_two_pass_join(spark):
    docs = _docs_df(spark)
    fused = {
        r["doc_id"]: (r["n_tokens"], r["logit"], r["__pass"])
        for r in tx.hls_vs_c4_frame(docs).collect()
    }
    scores = tx.hashed_linear_score(docs)
    surv = tx.c4_filter_survivors(docs).select(
        "doc_id", F.lit(1).alias("__pass")
    )
    two_pass = {
        r["doc_id"]: (r["n_tokens"], r["logit"], r["p"])
        for r in scores.join(surv, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "logit",
            F.coalesce(F.col("__pass"), F.lit(0)).alias("p"),
        )
        .collect()
    }
    assert fused == two_pass
    # the row filter must drop exactly the NULL/empty/whitespace docs
    assert set(fused) == {4, 5, 6, 7}
    # and at least one doc must land on each side of the gate
    passes = {v[2] for v in fused.values()}
    assert passes == {0, 1}, f"gate not exercised both ways: {fused}"


def test_c4_label_frame_matches_left_join(spark):
    docs = _docs_df(spark).filter(F.col("text").isNotNull())
    fused = sorted(
        (r["lang"], r["source"], r["__pass"])
        for r in tx.c4_label_frame(docs, ("lang", "source")).collect()
    )
    surv = tx.c4_filter_survivors(docs).select(
        "doc_id", F.lit(1).alias("__pass")
    )
    joined = sorted(
        (r["lang"], r["source"], r["p"])
        for r in docs.select("doc_id", "lang", "source")
        .join(surv, "doc_id", "left")
        .select(
            "lang",
            "source",
            F.coalesce(F.col("__pass"), F.lit(0)).alias("p"),
        )
        .collect()
    )
    assert fused == joined


def test_branch_conditional_sums_empty_subset_convention(spark):
    # the hc() pattern in sim_recall_suite (ADVICE r13): an empty
    # BRANCH (no rows match) must yield (n_hits=NULL, n_candidates=0)
    # — the DuckDB oracle's sum(hit)/count(*) over an empty subquery —
    # and an empty JOINED FRAME must yield the same, never (0, 0) or
    # (NULL, NULL).
    def agg(df):
        m = F.sum(F.when(F.col("x") > 10, 1).otherwise(0))
        h = F.sum(
            F.when((F.col("x") > 10) & (F.col("t") == 1), 1).otherwise(0)
        )
        return df.agg(
            F.when(m > 0, h).cast("long").alias("h"),
            F.coalesce(m, F.lit(0)).cast("long").alias("c"),
        ).collect()[0]

    df = spark.createDataFrame([(1, 1), (2, 0)], "x int, t int")
    row = agg(df)  # non-empty frame, empty branch subset
    assert row["h"] is None and row["c"] == 0
    row = agg(df.filter("x > 100"))  # empty frame
    assert row["h"] is None and row["c"] == 0
    row = agg(spark.createDataFrame([(11, 1), (12, 0)], "x int, t int"))
    assert row["h"] == 1 and row["c"] == 2  # populated branch unchanged


def _brute_pairs(docs, tau):
    import itertools

    rows = {r["doc_id"]: r["text"] for r in docs.collect()}

    def grams(t):
        w = t.split(" ")
        if len(w) < 3:
            return {" ".join(w)}
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    out = {}
    for a, b in itertools.combinations(sorted(rows), 2):
        ga, gb = grams(rows[a]), grams(rows[b])
        j = len(ga & gb) / len(ga | gb)
        if j >= tau:
            out[(a, b)] = round(j, 12)
    return out


def test_prefix_pairs_match_brute_force_with_df_ties(spark):
    from time_series_data_trimmer_spark.operators.dedup import (
        ngram_jaccard_prefix_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [
        base,
        base + " lambda",
        "alpha beta gamma delta epsilon zeta eta theta iota mu",
        "one two three four five six seven eight nine ten",
        "one two three four five six seven eight nine eleven",
        "completely different words with no overlap at all here now",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 12)
        for r in ngram_jaccard_prefix_pairs(docs, min_jaccard=0.2).collect()
    }
    assert got == _brute_pairs(docs, 0.2)
