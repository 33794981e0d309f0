"""Wave-32: banded DTW — recurrence exactness vs an independent NumPy
DP, shift recovery, and the DTW <= lockstep identity."""

import math

from pyspark.sql import functions as F

import __spark_entry__ as entry
from time_series_data_trimmer_spark.operators import timeseries as ts

B = 1_000_000


def _ref_dtw(xs, ys, W):
    INF = 10**15
    L = len(xs)
    dp = [[INF] * L for _ in range(L)]
    for i in range(L):
        for j in range(L):
            if abs(i - j) > W:
                continue
            c = abs(xs[i] - ys[j])
            if i == 0 and j == 0:
                dp[i][j] = c
            elif i == 0:
                dp[i][j] = c + dp[0][j - 1]
            elif j == 0:
                dp[i][j] = c + dp[i - 1][0]
            else:
                dp[i][j] = c + min(dp[i - 1][j], dp[i - 1][j - 1], dp[i][j - 1])
    return dp[L - 1][L - 1]


def test_dtw_matches_reference_dp_and_finds_shift(spark):
    rows = []
    for i in range(30):
        rows.append(("a", i * B + 5, float(i % 7), i))
        rows.append(("b", i * B + 7, float((i - 2) % 7), 100 + i))
    df = spark.createDataFrame(
        rows, "event_type string, t_us long, value double, event_id long"
    )
    got = ts.dtw_band_distance(df, bucket_us=B, n_buckets=30, band=4).collect()[0]
    xs = [math.floor((i % 7) * 10000.0 + 0.5) for i in range(30)]
    ys = [math.floor(((i - 2) % 7) * 10000.0 + 0.5) for i in range(30)]
    assert got["dtw_cost_e4"] == _ref_dtw(xs, ys, 4)
    assert got["lockstep_cost_e4"] == sum(abs(a - b) for a, b in zip(xs, ys))
    # the 2-bucket shift is inside the band -> warping wins big
    assert got["dtw_cost_e4"] < got["lockstep_cost_e4"] / 2


def test_dtw_identical_series_is_zero(spark):
    rows = []
    for i in range(20):
        v = float((i * 3) % 11)
        rows.append(("a", i * B, v, i))
        rows.append(("b", i * B + 1, v, 100 + i))
    df = spark.createDataFrame(
        rows, "event_type string, t_us long, value double, event_id long"
    )
    got = ts.dtw_band_distance(df, bucket_us=B, n_buckets=20, band=3).collect()[0]
    assert got["dtw_cost_e4"] == 0 and got["lockstep_cost_e4"] == 0


def test_registered_dtw_identities(spark):
    rows = entry.queries()["ts_dtw_channel_pairs"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 10  # C(5,2) channel pairs
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert 0 <= r["dtw_cost_e4"] <= r["lockstep_cost_e4"]
        assert r["dtw_cost_e4"] < ts.DTW_INF  # band always admits a path
