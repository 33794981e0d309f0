"""Edit/aggregate operator tests vs pandas re-implementations of the
cited reference lines (data_model.py / main.py)."""

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import aggregates as aggs
from time_series_data_trimmer_spark.operators import edits


def _trial(spark, times, values, trial="t1"):
    rows = [(trial, float(t), float(v) if v is not None else None) for t, v in zip(times, values)]
    return spark.createDataFrame(rows, "trial_id string, normalized_time double, ch double")


def test_delete_segment_collapse_reference_semantics(spark):
    # data_model.py:170-194: drop [start,end], dt = round(median +diff, 3),
    # new_time = round(arange(n)*dt, 3)
    times = [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7]
    df = _trial(spark, times, range(8))
    out = (
        edits.delete_segment(df, 0.25, 0.45, sample_rate=10.0)
        .toPandas().sort_values("normalized_time")
    )
    kept = [0.0, 0.1, 0.2, 0.5, 0.6, 0.7]
    diffs = np.diff(kept)
    dt = round(float(np.median(diffs[diffs > 0])), 3)
    want = np.round(np.arange(len(kept)) * dt, 3)
    np.testing.assert_allclose(out["normalized_time"].to_numpy(), want)
    assert list(out["ch"]) == [0, 1, 2, 5, 6, 7]


def test_delete_segment_invalid_range_noop(spark):
    df = _trial(spark, [0.0, 1.0], [1, 2])
    assert edits.delete_segment(df, 5.0, 2.0).count() == 2


def test_post_delete_sample_rate(spark):
    df = _trial(spark, [0.0, 0.1, 0.2, 0.3], range(4))
    out = edits.post_delete_sample_rate(df).toPandas()
    assert float(out["sample_rate"].iloc[0]) == 10.0


def test_mark_bad_range(spark):
    df = _trial(spark, [0.0, 0.5, 1.0, 1.5], range(4))
    out = edits.mark_bad(df, 0.4, 1.1).toPandas().sort_values("normalized_time")
    assert list(out["is_bad_segment"]) == [False, True, True, False]


def test_infer_sample_rate_reference(spark):
    # data_model.py:116-126: round(1/median(+diffs), 2); <2 rows → 120
    df = _trial(spark, [0.0, 0.0083, 0.0167, 0.025], range(4))
    out = aggs.infer_sample_rate(df).toPandas()
    diffs = np.diff([0.0, 0.0083, 0.0167, 0.025])
    want = round(1.0 / float(np.median(diffs[diffs > 0])), 2)
    assert abs(float(out["sample_rate"].iloc[0]) - want) < 1e-9

    single = _trial(spark, [0.0], [1])
    assert float(aggs.infer_sample_rate(single).toPandas()["sample_rate"].iloc[0]) == 120.0


def test_suggest_segments_matches_reference_loop(spark):
    # main.py:1279-1308 in numpy, compared segment-for-segment
    rng = np.random.RandomState(3)
    vals = rng.randn(60).astype(float)
    vals[[20, 21, 22]] += 40.0  # spike run
    vals[[40, 41]] = np.nan     # nan run
    times = np.arange(60) / 10.0
    df = _trial(spark, times, [None if np.isnan(v) else v for v in vals])
    got = (
        aggs.suggest_segments(df, "ch")
        .toPandas().sort_values(["kind", "seg_start"]).reset_index(drop=True)
    )

    series = vals
    deriv = np.abs(np.diff(series, prepend=series[0]))
    thr = np.nanmean(deriv) + 3 * np.nanstd(deriv)
    segments = []
    for mask, label in [(deriv > thr, "spike"), (~np.isfinite(series), "nan")]:
        idx = np.where(mask)[0]
        if len(idx) == 0:
            continue
        start = prev = idx[0]
        for i in idx[1:]:
            if i != prev + 1:
                segments.append((times[start], times[prev], label))
                start = i
            prev = i
        segments.append((times[start], times[prev], label))
    want = pd.DataFrame(segments, columns=["seg_start", "seg_end", "kind"]).sort_values(
        ["kind", "seg_start"]
    ).reset_index(drop=True)
    assert len(got) == len(want)
    np.testing.assert_allclose(got["seg_start"], want["seg_start"])
    np.testing.assert_allclose(got["seg_end"], want["seg_end"])
    assert list(got["kind"]) == list(want["kind"])


def test_episode_overlay_reference_semantics(spark):
    # main.py:1233-1277: ffill index, min/max time, modal type/state, colors
    rows = []
    data = [
        (0.0, 1, "inspection", "start"),
        (0.1, None, "inspection", "start"),
        (0.2, None, "action", "go"),       # mode of ep1 type = inspection (2/3... tie? 2 inspection 1 action)
        (0.3, 2, "action", "go"),
        (0.4, None, "action", "go"),
        (0.5, 3, "other", None),
    ]
    for t, ep, typ, st in data:
        rows.append(("t1", t, ep, typ, st))
    df = spark.createDataFrame(
        rows, "trial_id string, normalized_time double, episode_index long, episode_type string, episode_state string"
    )
    out = (
        aggs.episode_overlay(df)
        .toPandas().sort_values("episode_id").reset_index(drop=True)
    )
    assert list(out["episode_id"]) == [1, 2, 3]
    assert out.loc[0, "label"] == "episode:inspection:start"
    assert out.loc[0, "color"] == "#6bd47a"
    assert out.loc[1, "label"] == "episode:action:go"
    assert out.loc[1, "color"] == "#ffa500"
    assert out.loc[2, "label"] == "episode:other"
    assert out.loc[2, "color"] == "#8888ff"
    np.testing.assert_allclose(out["start"], [0.0, 0.3, 0.5])
    np.testing.assert_allclose(out["end"], [0.2, 0.4, 0.5])


def test_calibration_offset(spark):
    df = spark.createDataFrame(
        [("t1", float(i), 10.0 + i, 2.0 + i) for i in range(10)],
        "trial_id string, normalized_time double, src double, ref double",
    )
    out = aggs.calibration_offset(df, "src", "ref", 2.0, 6.0).toPandas()
    assert abs(float(out["offset"].iloc[0]) - 8.0) < 1e-12


def test_asof_lookup_nearest(spark):
    df = _trial(spark, [0.0, 1.0, 2.0, 3.0], [10, 11, 12, 13])
    row = edits.asof_lookup(df, 1.6).toPandas().iloc[0]
    assert row["normalized_time"] == 2.0 and row["ch"] == 12.0
    # exact midpoint ties to the earlier sample (argmin behavior)
    row = edits.asof_lookup(df, 1.5).toPandas().iloc[0]
    assert row["normalized_time"] == 1.0


def test_snap_to_extremum_reference_pick(spark):
    # main.py:979-991: pick min when |max - v| < |min - v|, else max
    vals = [0.0, 5.0, 1.0, -8.0, 2.0, 0.5, 0.2]
    df = _trial(spark, np.arange(7.0), vals)
    out = edits.snap_to_extremum(df, "ch", reach=3).toPandas().sort_values("normalized_time")
    # at index 0: window [0..3], max=5 (t1), min=-8 (t3); |5-0|<|−8−0| → snap to min? no:
    # pick_min = |max - v| < |min - v| → 5 < 8 → min → t=3
    assert out.iloc[0]["snap_time"] == 3.0
    # at index 1 (v=5): |5-5|=0 < |−8−5|=13 → min → t=3
    assert out.iloc[1]["snap_time"] == 3.0


def test_annotations_at_times_join(spark):
    samples = _trial(spark, [0.0, 1.0, 2.0, 3.0], range(4))
    anns = spark.createDataFrame(
        [("t1", 0.5, 2.5, "blink")], "trial_id string, start double, end double, label string"
    )
    out = edits.annotations_at_times(samples, anns).toPandas().sort_values("normalized_time")
    assert list(out["label"].fillna("-")) == ["-", "blink", "blink", "-"]
