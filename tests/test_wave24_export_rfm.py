"""Wave 24: export manifest and RFM segmentation."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_manifest_covers_corpus_and_localizes(spark):
    """Shard doc counts partition the corpus; a shard's fingerprint
    changes iff its rows change (spot-check: fingerprints are distinct
    across shards on real data)."""
    from time_series_data_trimmer_spark.queries import _table

    rows = entry.queries()["export_manifest_shards"](spark, SF).collect()
    docs = _table(spark, SF, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert all(0 <= r["shard"] < 8 for r in rows)
    sums = [r["content_sum_mod"] for r in rows]
    assert len(set(sums)) == len(sums)  # no accidental collisions here


def test_rfm_scores_and_segments(spark):
    rows = entry.queries()["events_rfm_segments"](spark, SF).collect()
    assert rows
    n_champ = 0
    for r in rows:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
        assert r["recency_days"] >= 0
        if r["segment"] == "champion":
            n_champ += 1
            assert r["r_score"] >= 4 and r["f_score"] >= 4 and r["m_score"] >= 4
        if r["segment"] == "hibernating":
            assert r["r_score"] <= 2 and r["f_score"] <= 2
    # quintile scoring must actually spread users: >1 distinct f_score
    assert len({r["f_score"] for r in rows}) > 1
