"""Wave-30 semantics: cross-correlation lag alignment, spectral probe,
interpolated as-of join, prototypicality pruning."""

import math

import pytest
from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import edits
from time_series_data_trimmer_spark.operators import similarity as sim
from time_series_data_trimmer_spark.operators import timeseries as ts

B = 1_000_000  # 1-second buckets for the toys


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, t_us long, value double, event_id long"
    )


def test_xcorr_recovers_known_shift(spark):
    # y is x delayed by exactly 3 buckets -> r(lag=3) == 1.0 and is the max
    xs = [(i, math.sin(i / 5.0) * 10 + 20) for i in range(60)]
    rows = [("a", i * B + 7, v, i) for i, v in xs]
    rows += [("b", (i + 3) * B + 11, v, 1000 + i) for i, v in xs]
    out = ts.xcorr_lag(
        _events(spark, rows), "a", "b", max_lag=5, bucket_us=B
    ).collect()
    by_lag = {r["lag"]: r for r in out}
    assert by_lag[3]["r"] == pytest.approx(1.0, abs=1e-6)
    best = max(out, key=lambda r: (r["r"] is not None and r["r"], r["lag"]))
    assert best["lag"] == 3
    # n_overlap shrinks as the lag walks off the 60-bucket support
    assert by_lag[3]["n_overlap"] == 60
    assert by_lag[-5]["n_overlap"] < 60


def test_xcorr_constant_series_yields_null_r(spark):
    rows = [("a", i * B, 5.0, i) for i in range(10)]
    rows += [("b", i * B, float(i), 100 + i) for i in range(10)]
    out = {r["lag"]: r["r"] for r in ts.xcorr_lag(
        _events(spark, rows), "a", "b", max_lag=1, bucket_us=B
    ).collect()}
    assert all(v is None for v in out.values())  # zero x-variance


def test_spectral_probe_finds_planted_period(spark):
    # pure sine with period 20 s, amplitude 3: probe at 20 s and 7 s
    p = 20 * B
    rows = [
        ("a", i * B, 3.0 * math.sin(2 * math.pi * i / 20.0), i)
        for i in range(200)
    ]
    out = ts.spectral_probe(
        _events(spark, rows), periods_us=(p, 7 * B)
    ).collect()
    # both toy periods truncate to period_h=0 -> distinguish by amplitude
    amps = sorted(r["amp"] for r in out)
    assert amps[-1] == pytest.approx(3.0, rel=0.02)  # planted amplitude
    assert amps[0] < 0.5  # off-frequency probe sees little energy


def test_interp_asof_bracket_cases(spark):
    series = spark.createDataFrame(
        [(1, 0, 10, 0.0), (1, 1000, 11, 10.0), (2, 500, 12, 4.0)],
        "user_id long, t_us long, event_id long, value double",
    )
    queries = spark.createDataFrame(
        [
            (1, 250, 100),   # interior: 0.0 + 10*(250/1000) = 2.5
            (1, 0, 101),     # equal-time sample -> exactly that sample
            (1, 2000, 102),  # no next -> NULL
            (2, 100, 103),   # no prev -> NULL
            (2, 500, 104),   # degenerate bracket (prev == next) -> 4.0
        ],
        "user_id long, t_us long, event_id long",
    )
    got = {
        r["event_id"]: r
        for r in edits.interp_asof_join(queries, series).collect()
    }
    assert got[100]["v_interp"] == pytest.approx(2.5)
    assert got[100]["t_prev_us"] == 0 and got[100]["t_next_us"] == 1000
    assert got[101]["v_interp"] == pytest.approx(0.0)
    assert got[102]["v_interp"] is None
    assert got[103]["v_interp"] is None
    assert got[104]["v_interp"] == pytest.approx(4.0)


def test_prototypicality_cut_line(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [
        (int(i), [float(x) for x in rng.randn(8)]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sim.prototypicality_prune(df, n_centroids=4, prune_pct=25)
    pdf = out.toPandas()
    assert len(pdf) == 120 and pdf["vec_id"].nunique() == 120
    for cid, grp in pdf.groupby("centroid_id"):
        n = len(grp)
        pruned = int((~grp["keep"]).sum())
        assert pruned == (n * 25) // 100
        # pruned rows are exactly the top-scored ones (ties aside)
        kept_max = grp.loc[grp["keep"], "proto_cos"].max() if pruned < n else None
        pruned_min = grp.loc[~grp["keep"], "proto_cos"].min() if pruned else None
        if pruned and pruned < n:
            assert pruned_min >= kept_max - 1e-12
