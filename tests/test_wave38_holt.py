"""Wave-38: Brown double smoothing — trend-lag correction identity and
the exact-weight construction vs a NumPy reference."""

import math

import pytest
from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import timeseries as ts


def _ref(xs, D):
    """Truncated Brown: S1/S2 from the integer-weight formulas."""
    den1 = (1 << D) - 1
    out = []
    for t in range(len(xs)):
        if t < 2 * D - 2:
            out.append(None)
            continue
        v = [math.floor(x * 10000.0 + 0.5) for x in xs]
        n1 = sum(v[t - j] * (1 << (D - 1 - j)) for j in range(D))
        n2 = sum(
            v[t - m] * (min(m + 1, 2 * D - 1 - m) * (1 << (2 * D - 2 - m)))
            for m in range(2 * D - 1)
        )
        fc = (3 * n1 * den1 - 2 * n2) / (den1 * den1) / 10000.0
        out.append(math.floor(fc * 1e6 + 0.5) / 1e6)
    return out


def test_holt_matches_reference_and_cancels_trend_lag(spark):
    # pure linear ramp: Brown's forecast of the NEXT value is exact in
    # the untruncated limit; truncated depth-8 gets within the 2^-8 tail
    xs = [2.0 * i for i in range(40)]
    rows = [(1, i * 1000, i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(
        rows, "user_id long, t_us long, event_id long, value double"
    )
    got = {
        r["event_id"]: r
        for r in ts.holt_brown_forecast(df, depth=8).collect()
    }
    want = _ref(xs, 8)
    for i, w in enumerate(want):
        g = got[i]["forecast_next"]
        if w is None:
            assert g is None
        else:
            assert g == pytest.approx(w, abs=1e-9)
    # trend correction: at the last full row, forecast ~= next ramp value
    last = got[39]["forecast_next"]
    assert last == pytest.approx(80.0, rel=0.02)  # 2*40 = true next
    # a plain EWMA would sit ~2*trend BELOW the next value; Brown must
    # beat it decisively
    ew = ts.ewma_halflife(df, depth=8).collect()
    ew_last = [r["ewma"] for r in ew if r["event_id"] == 39][0]
    assert abs(last - 80.0) < abs(ew_last - 80.0) / 4
