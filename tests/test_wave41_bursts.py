"""Wave-41: hysteresis burst segments — planted-burst recovery and the
no-flicker property a single threshold would fail."""

from time_series_data_trimmer_spark.operators import timeseries as ts

S = 1_000_000  # 1 s in micros


def _df(spark, gaps):
    rows, t = [], 0
    for i, g in enumerate(gaps):
        t += g
        rows.append(("a", t, i))
    return spark.createDataFrame(rows, "event_type string, t_us long, event_id long")


def test_burst_recovers_planted_segment(spark):
    # norm ~10 s gaps; one planted burst of 20 fast (0.5 s) arrivals
    gaps = [10 * S] * 30 + [S // 2] * 20 + [10 * S] * 30
    out = ts.burst_segments(_df(spark, gaps)).collect()
    assert len(out) == 1
    seg = out[0]
    assert seg["n_events"] == 20
    assert seg["mean_gap_s"] == 0.5
    # burst span covers exactly the fast run
    assert seg["end_us"] - seg["start_us"] == 19 * (S // 2)


def test_hysteresis_holds_through_borderline_gaps(spark):
    # inside the burst, two gaps at ~0.6x mean: below the exit (1x)
    # threshold but above the enter (1/3x) threshold -> a single-cutoff
    # detector at mean/3 would split the burst; hysteresis must not
    fast, mid, slow = S // 2, None, 10 * S
    gaps = [slow] * 30 + [fast] * 8
    # compute the overall mean these gaps imply to place the mid gap
    # between mean/3 and mean
    total = sum(gaps) + 2 * 4 * S + 10 * fast + 30 * slow
    n = len(gaps) + 2 + 10 + 30
    mean = total / n
    assert mean / 3 < 4 * S < mean
    gaps = gaps + [4 * S, 4 * S] + [fast] * 10 + [slow] * 30
    out = ts.burst_segments(_df(spark, gaps)).collect()
    assert len(out) == 1  # ONE segment spanning the borderline gaps
    assert out[0]["n_events"] == 8 + 2 + 10
