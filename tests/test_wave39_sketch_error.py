"""Wave-39: sketch accuracy report — error bounds and reconciliation
with the standalone sketch/exact queries."""

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_sketch_error_report_identities(spark):
    rows = entry.queries()["sketch_quantile_error_report"](spark, SF).collect()
    assert len(rows) == 10  # 5 types x 2 quantiles
    for r in rows:
        assert r["n_kept"] <= 32 and r["n_kept"] <= r["n_total"]
        assert abs(r["abs_err"] - abs(r["sketch_q"] - r["exact_q"])) < 1e-9
        # the sketch value is a REAL sample: it must lie within the
        # channel's observed range, so the error is bounded by it
        assert r["abs_err"] >= 0.0
    # 32 uniform-hash samples estimate the median of a smooth synthetic
    # distribution to well under half its scale; p90 is looser
    med = [r for r in rows if r["q"] == 0.5]
    assert all(r["abs_err"] < 0.5 * max(r["exact_q"], 1.0) for r in med)


def test_sketch_error_matches_standalone_queries(spark):
    qs = entry.queries()
    rep = {
        (r["event_type"], r["q"]): r["sketch_q"]
        for r in qs["sketch_quantile_error_report"](spark, SF).collect()
    }
    # the streaming quantile query uses the same registers/estimator
    stream = {
        (r["event_type"], r["q"]): r["q_est"]
        for r in qs["stream_quantile_value_by_type"](spark, SF).collect()
    }
    for k, v in stream.items():
        assert rep[k] == v  # same seed, same k=32 -> bit-equal samples
