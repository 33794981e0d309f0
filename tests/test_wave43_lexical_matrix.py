"""Wave-43: lexical complexity identities; cross-source matrix
symmetry-free pairing and planted-template detection."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_lexical_complexity_identities(spark):
    rows = entry.queries()["text_lexical_complexity_by_source"](
        spark, SF
    ).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_words"] > 0
        assert 1.0 <= r["mean_word_len"] <= 20.0
        assert 0.0 < r["mean_syllables"] <= r["mean_word_len"]
        assert 0.0 <= r["pct_long_words"] <= 1.0
        assert 0.0 <= r["pct_monosyllabic"] <= 1.0
    # the synthetic vocabulary is shared across sources: complexity
    # must be tightly clustered (a real corpus would spread)
    ml = [r["mean_word_len"] for r in rows]
    assert max(ml) - min(ml) < 1.0


def test_cross_source_matrix_planted_template(spark):
    # 16+ tokens so the doc-specific tail falls OUTSIDE the prefix key
    opener = (
        "breaking news from the wire today in a statement officials said "
        "that the regional press office has now confirmed"
    )
    rows = [
        (1, opener + " alpha beta gamma", "sA"),
        (2, opener + " delta epsilon zeta", "sB"),
        (3, opener + " eta theta iota", "sB"),
        (4, "completely different text with no template at all here", "sC"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # drive the registered construction on the toy: rebuild inline
    prefix = F.concat_ws(
        " ",
        F.slice(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), " "),
                lambda x: F.length(x) > 0,
            ),
            1, 16,
        ),
    )
    d = df.select(F.md5(prefix).alias("dig"), "source")
    ds = d.distinct()
    pairs = (
        ds.alias("a")
        .join(ds.alias("b"), "dig")
        .filter(F.col("a.source") < F.col("b.source"))
        .select(F.col("a.source").alias("sa"), F.col("b.source").alias("sb"))
        .collect()
    )
    assert {(p["sa"], p["sb"]) for p in pairs} == {("sA", "sB")}

    # and the registered query's invariants on real data
    out = entry.queries()["dedup_cross_source_matrix"](spark, SF).collect()
    for r in out:
        assert r["source_a"] < r["source_b"]
        assert r["n_docs_involved"] >= 2 * r["n_shared_digests"]
