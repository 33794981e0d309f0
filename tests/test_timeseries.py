"""Property tests for the r6 time-series wave (operators/timeseries.py):
M4 downsampling, gap report, MAD outliers, CUSUM changepoint, and the
half-life EWMA. Exact values are the DuckDB oracle's job; these pin
planted-signal recovery and the single-exchange plan shape."""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F
import pytest

from time_series_data_trimmer_spark.operators import timeseries as ts

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_us(spark):
    from time_series_data_trimmer_spark.sources.events import event_micros

    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return df.withColumn("t_us", event_micros(df)).cache()


def _mk(spark, rows):
    """rows: (user_id, t_us, event_id, value)"""
    return spark.createDataFrame(
        rows, "user_id long, t_us long, event_id long, value double"
    )


# --- M4 --------------------------------------------------------------------


def test_m4_envelope_and_coverage(events_us):
    out = ts.m4_downsample(events_us, bucket_us=3_600_000_000).cache()
    total = events_us.count()
    assert out.agg(F.sum("n")).first()[0] == total  # every row in one bucket
    bad = out.filter(
        (F.col("v_min") > F.least("v_first", "v_last"))
        | (F.col("v_max") < F.greatest("v_first", "v_last"))
        | (F.col("v_min") > F.col("v_max"))
    )
    assert bad.count() == 0
    # global extremes survive downsampling exactly (the M4 guarantee)
    lo, hi = events_us.agg(F.min("value"), F.max("value")).first()
    slo, shi = out.agg(F.min("v_min"), F.max("v_max")).first()
    assert (slo, shi) == (lo, hi)
    out.unpersist()


def test_m4_first_last_follow_total_order(spark):
    rows = [
        (1, 100, 7, 5.0),
        (1, 100, 3, 9.0),  # same t: event_id breaks the tie -> first
        (1, 200, 1, -2.0),  # last in bucket 0 (bucket=1000us)
        (1, 1200, 2, 4.0),  # alone in bucket 1
    ]
    out = {
        r["bucket_us"]: r
        for r in ts.m4_downsample(
            _mk(spark, rows), bucket_us=1000, order_cols=("t_us", "event_id")
        ).collect()
    }
    b0 = out[0]
    assert (b0["v_first"], b0["v_last"]) == (9.0, -2.0)
    assert (b0["v_min"], b0["v_max"], b0["n"]) == (-2.0, 9.0, 3)
    assert out[1000]["v_first"] == out[1000]["v_last"] == 4.0


# --- gap report -------------------------------------------------------------


def test_gap_report_planted_gap_only(spark):
    # regular 10us grid with one 100us hole between 50 and 150
    tus = [0, 10, 20, 30, 40, 50, 150, 160, 170, 180]
    rows = [(1, t, i, 0.0) for i, t in enumerate(tus)]
    got = ts.gap_report(_mk(spark, rows), factor=5).collect()
    assert len(got) == 1
    g = got[0]
    assert (g["gap_start_us"], g["gap_end_us"], g["gap_us"]) == (50, 150, 100)


def test_gap_report_regular_grid_is_silent(spark):
    rows = [(1, 10 * i, i, 0.0) for i in range(50)]
    assert ts.gap_report(_mk(spark, rows), factor=5).count() == 0


# --- MAD outliers ------------------------------------------------------------


def test_mad_flags_planted_spike_and_stays_robust(spark):
    # 99 quiet samples + one wild spike: MAD flags exactly the spike;
    # med/mad are untouched by it (the robustness claim).
    rows = [(1, i, i, float(i % 7)) for i in range(99)] + [(1, 99, 99, 1e6)]
    r = ts.mad_outliers(_mk(spark, rows), k=3.0).first()
    assert r["n"] == 100
    assert r["n_outliers"] >= 1
    assert r["med"] == 3.0  # median of 0..6 cycle, spike-proof
    assert r["mad"] <= 3.0


def test_mad_constant_series_has_no_outliers(spark):
    rows = [(1, i, i, 5.0) for i in range(20)]
    r = ts.mad_outliers(_mk(spark, rows), k=3.0).first()
    assert (r["n_outliers"], r["med"], r["mad"]) == (0, 5.0, 0.0)


# --- CUSUM -------------------------------------------------------------------


def test_cusum_recovers_planted_level_shift(spark):
    # level 0 for k=1..50, level 10 after: |S_k| peaks exactly at the
    # last pre-shift sample (k=50)
    rows = [(1, i, i, 0.0 if i < 50 else 10.0) for i in range(100)]
    r = ts.cusum_changepoint(_mk(spark, rows)).first()
    assert r["cp_index"] == 50
    assert r["cp_t_us"] == 49
    # max_dev = |S_k| = |cum_k - k*mean| in value units: |0 - 50*5| = 250
    assert r["max_dev"] == pytest.approx(250.0, abs=1e-6)


def test_cusum_tie_breaks_earliest(spark):
    # symmetric ramp: |D_k| ties at multiple k; earliest (t, event) wins
    rows = [(1, i, i, v) for i, v in enumerate([1.0, -1.0, 1.0, -1.0])]
    r = ts.cusum_changepoint(_mk(spark, rows)).first()
    assert r["cp_index"] == 1


# --- EWMA --------------------------------------------------------------------


def _brute_ewma(vals, depth=16):
    out = []
    for i in range(len(vals)):
        num = den = 0
        for j in range(min(depth, i + 1)):
            w = 1 << (depth - 1 - j)
            num += round(vals[i - j] * 1e4) * w
            den += w
        out.append(num / den / 1e4)
    return out


def test_ewma_matches_bruteforce_replica(spark):
    vals = [3.1, -2.0, 7.25, 0.0, 4.4, 4.4, 100.0, -5.5] * 4
    rows = [(1, i, i, v) for i, v in enumerate(vals)]
    got = [
        r["ewma"]
        for r in ts.ewma_halflife(_mk(spark, rows), depth=16)
        .orderBy("t_us")
        .collect()
    ]
    want = _brute_ewma(vals)
    assert got == pytest.approx(want, abs=1e-6)


def test_ewma_head_renormalizes(spark):
    # first row = its own value exactly (weights renormalize, no zero-fill bias)
    rows = [(1, 0, 0, 42.5), (1, 1, 1, 0.0)]
    got = ts.ewma_halflife(_mk(spark, rows)).orderBy("t_us").collect()
    assert got[0]["ewma"] == 42.5
    assert got[1]["ewma"] == pytest.approx((2 * 0.0 + 1 * 42.5) / 3, abs=1e-6)


# --- plan shape ---------------------------------------------------------------


@pytest.mark.parametrize(
    "build",
    [
        lambda df: ts.m4_downsample(df, bucket_us=3_600_000_000),
        lambda df: ts.gap_report(df),
        lambda df: ts.mad_outliers(df),
        lambda df: ts.cusum_changepoint(df),
        lambda df: ts.ewma_halflife(df),
        lambda df: ts.sax_symbols(df),
        lambda df: ts.seasonal_decompose_hourly(df),
    ],
    ids=["m4", "gap", "mad", "cusum", "ewma", "sax", "seasonal"],
)
def test_single_exchange_plans(events_us, build):
    # every operator promises exactly ONE shuffle on the trial key
    df = build(events_us)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    body = buf.getvalue().split("===== Subqueries")[0]
    n_ex = sum(
        1 for ln in body.splitlines() if ln.strip().startswith(("Exchange", "+- Exchange"))
    )
    # exactly one exchange of ANY kind (a rangepartitioning or
    # SinglePartition exchange sneaking in would be a plan regression
    # the hashpartitioning-only count below can't see)
    assert n_ex <= 1, body
    assert body.count("Exchange hashpartitioning") <= 1, body
    assert "SortMergeJoin" not in body and "CartesianProduct" not in body


def test_sax_symbols_known_series(spark):
    from time_series_data_trimmer_spark.operators.timeseries import sax_symbols

    # 8 rows, segment=2 -> 4 segments; low-low-high-high halves give a
    # symmetric z pattern: segments (1,1),(1,1),(5,5),(5,5) -> PAA
    # 1,1,5,5; mu=3, var=4, std=2 -> z=-1,-1,+1,+1 -> a,a,d,d
    rows = [(1, i, 1.0 if i < 4 else 5.0) for i in range(8)]
    df = spark.createDataFrame(rows, "user_id long, t_us long, value double")
    out = sax_symbols(
        df, segment_rows=2, order_cols=("t_us",)
    ).orderBy("seg").collect()
    assert [r["symbol"] for r in out] == ["a", "a", "d", "d"]
    assert [r["z"] for r in out] == [-1.0, -1.0, 1.0, 1.0]


def test_sax_symbols_constant_series_is_all_c(spark):
    from time_series_data_trimmer_spark.operators.timeseries import sax_symbols

    df = spark.createDataFrame(
        [(1, i, 7.5) for i in range(6)], "user_id long, t_us long, value double"
    )
    out = sax_symbols(df, segment_rows=3, order_cols=("t_us",)).collect()
    assert all(r["symbol"] == "c" and r["z"] == 0.0 for r in out)


def test_binary_segmentation_recovers_two_planted_shifts(spark):
    """Level 1 finds the dominant break; level 2 finds the secondary
    break inside the left regime."""
    from time_series_data_trimmer_spark.operators import timeseries as ts

    rows = []
    for i in range(90):
        # regimes: [0,30) = 0.0, [30,60) = 5.0, [60,90) = 100.0
        v = 0.0 if i < 30 else (5.0 if i < 60 else 100.0)
        rows.append((7, 1_000_000 * i, i, v))
    df = spark.createDataFrame(rows, "user_id long, t_us long, event_id long, value double")
    out = {r["seg"]: r for r in ts.binary_segmentation(df).collect()}
    assert set(out) == {"all", "L", "R"}
    # dominant break at the 100-jump (after index 60 -> cp_index 60)
    assert out["all"]["cp_index"] == 60
    # left half = first 60 samples; its break is the 0->5 shift at 30
    assert out["L"]["cp_index"] == 30
    assert out["L"]["cp_t_us"] == 1_000_000 * 29
    # right half is flat: max_dev ~ 0
    assert out["R"]["max_dev"] == 0.0
