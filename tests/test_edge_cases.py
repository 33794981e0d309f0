"""Degenerate-input edge cases: empty frames, single-row trials,
full-range deletions, invalid ranges."""

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import aggregates as aggs
from time_series_data_trimmer_spark.operators import edits
from time_series_data_trimmer_spark.operators.filters import apply_filter


def _trial(spark, times, values, trial="t1"):
    rows = [(trial, float(t), None if v is None else float(v)) for t, v in zip(times, values)]
    return spark.createDataFrame(rows, "trial_id string, normalized_time double, ch double")


def _empty(spark):
    return spark.createDataFrame([], "trial_id string, normalized_time double, ch double")


def test_filters_on_empty_frame(spark):
    df = _empty(spark)
    for ft in ("moving_average", "normalize_zscore", "derivative", "integrate",
               "detrend", "interpolate", "savgol", "butter_lowpass"):
        assert apply_filter(df, ["ch"], ft, {}).count() == 0


def test_resample_on_empty_and_single_row(spark):
    assert apply_filter(_empty(spark), ["ch"], "resample", {"target_fs": 10.0}).count() == 0
    single = _trial(spark, [0.0], [1.0])
    # <2 rows → frame returned unchanged (filter_engine.py:152-153)
    out = apply_filter(single, ["ch"], "resample", {"target_fs": 10.0}).toPandas()
    assert len(out) == 1 and out["ch"].iloc[0] == 1.0


def test_delete_everything(spark):
    df = _trial(spark, [0.0, 1.0, 2.0], [1, 2, 3])
    assert edits.delete_segment(df, -1.0, 10.0).count() == 0


def test_single_row_trial_through_operators(spark):
    df = _trial(spark, [0.0], [5.0])
    assert apply_filter(df, ["ch"], "moving_average", {"window": 5}).toPandas()["ch"].iloc[0] == 5.0
    # zscore: std of one value = 0 → guard → (x - x)/1 = 0
    assert apply_filter(df, ["ch"], "normalize_zscore", {}).toPandas()["ch"].iloc[0] == 0.0
    # suggestions: deriv = |x - x| = 0, thr = 0 → no segments
    assert aggs.suggest_segments(df, "ch").count() == 0
    # sample rate falls back to 120
    assert float(aggs.infer_sample_rate(df).toPandas()["sample_rate"].iloc[0]) == 120.0


def test_all_null_channel(spark):
    df = _trial(spark, [0.0, 1.0, 2.0], [None, None, None])
    out = apply_filter(df, ["ch"], "normalize_zscore", {}).toPandas()
    assert out["ch"].isna().all()
    out = apply_filter(df, ["ch"], "interpolate", {"method": "linear"}).toPandas()
    assert out["ch"].isna().all()  # nothing to interpolate from
    segs = aggs.suggest_segments(df, "ch").toPandas()
    assert set(segs["kind"]) == {"nan"} and segs["n_samples"].sum() == 3


def test_selection_outside_data_range_is_noop(spark):
    df = _trial(spark, [0.0, 1.0, 2.0], [1, 5, 9])
    out = apply_filter(
        df, ["ch"], "moving_average", {"window": 3}, selection=(100.0, 200.0)
    ).toPandas().sort_values("normalized_time")
    np.testing.assert_allclose(out["ch"], [1, 5, 9])


def test_sessionize_single_events(spark):
    df = _trial(spark, [0.0], [1.0])
    out = aggs.sessionize(df, 10.0).toPandas()
    assert len(out) == 1 and out["n_events"].iloc[0] == 1


def test_mark_bad_inverted_range_noop(spark):
    df = _trial(spark, [0.0, 1.0], [1, 2])
    out = edits.mark_bad(df, 5.0, 1.0)
    assert "is_bad_segment" not in out.columns or not out.toPandas()["is_bad_segment"].any()
