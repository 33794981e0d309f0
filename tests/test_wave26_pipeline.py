"""Wave 26: cluster-size histogram and the dedup→budget→pack pipeline."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_cluster_histogram_partitions_corpus(spark):
    """Histogram doc counts sum to the corpus; bucket bounds hold
    (2^bucket <= size < 2^(bucket+1))."""
    from time_series_data_trimmer_spark.queries import _table

    rows = entry.queries()["dedup_cluster_size_histogram"](spark, SF).collect()
    docs = _table(spark, SF, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert 2 ** r["bucket"] <= r["min_size"] <= r["max_size"] < 2 ** (
            r["bucket"] + 1
        )
        assert r["n_clusters"] >= 1


def test_pipeline_tighter_than_raw(spark):
    """The dedup+budget corpus is a subset of the raw corpus: fewer
    docs and tokens than the raw pack report, same invariants."""
    raw = entry.queries()["mix_pack_efficiency_report"](spark, SF).collect()[0]
    out = entry.queries()["pipeline_dedup_budget_pack"](spark, SF).collect()[0]
    assert out["n_docs"] <= raw["n_docs"]
    assert out["n_tokens"] <= raw["n_tokens"]
    assert 0 <= out["tail_pad_tokens"] < 512
    assert out["n_sequences"] * 512 == out["n_tokens"] + out["tail_pad_tokens"]
    assert 0.0 < out["utilization"] <= 1.0
