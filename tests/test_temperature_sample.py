"""α=0.5 temperature sampling (`sp.temperature_sample`): the domain-
rebalancing semantics on a deliberately skewed corpus — rates must rise
for rare domains and fall for dominant ones, membership must be
layout-independent, and the overall rate must track the target."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import sampling as sp


@pytest.fixture(scope="module")
def skewed(spark):
    # 900 docs in 'big', 90 in 'mid', 10 in 'rare'
    rows = [(i, "big" if i < 900 else ("mid" if i < 990 else "rare")) for i in range(1000)]
    return spark.createDataFrame(rows, ["doc_id", "source"])


def _rates(df):
    out = sp.temperature_sample(df, target_frac=0.3)
    return {r["source"]: r["keep_rate"] for r in out.select("source", "keep_rate").distinct().collect()}


def test_rare_domains_upweighted(skewed):
    rates = _rates(skewed)
    # α=0.5: keep rate ∝ 1/√count — strictly increasing as count drops
    assert rates["big"] < rates["mid"] < rates["rare"]
    # analytic check: T = √900+√90+√10 ≈ 42.65, N=1000, target 0.3
    # r_big = 0.3·1000·30/(900·T) ≈ 0.2345
    assert rates["big"] == pytest.approx(0.3 * 1000 * 30 / (900 * (30 + 90**0.5 + 10**0.5)), abs=1e-6)


def test_overall_rate_tracks_target(skewed):
    kept = sp.temperature_sample(skewed, target_frac=0.3).count()
    # expected 300; hash noise is a few percent at n=1000
    assert 240 <= kept <= 360


def test_membership_is_layout_independent(skewed):
    a = {r["doc_id"] for r in sp.temperature_sample(skewed, target_frac=0.3).collect()}
    b = {
        r["doc_id"]
        for r in sp.temperature_sample(skewed.repartition(13, "doc_id"), target_frac=0.3).collect()
    }
    assert a == b


def test_rate_clamps_at_one(spark):
    # 2 docs in 'tiny' vs 998 in 'huge' at a high target: tiny's raw
    # rate exceeds 1 and must clamp (keeping every tiny doc)
    rows = [(i, "huge" if i < 998 else "tiny") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = sp.temperature_sample(df, target_frac=0.9)
    tiny = out.filter(F.col("source") == "tiny")
    assert tiny.count() == 2
    assert {r["keep_rate"] for r in tiny.collect()} == {1.0}
