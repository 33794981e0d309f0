"""Hand-computed cases for the distributed sweep-line
(`iv.coverage_sweep`): union coverage, peak concurrency, day-boundary
splitting, point intervals, and the day-keyed plan shape."""

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import intervals as iv

B = 1000  # tiny bucket for hand math


def _sweep(spark, rows, bucket=B):
    df = spark.createDataFrame(rows, "start_us long, end_us long")
    return {
        r["bucket"]: (r["n_intervals"], r["covered_us"], r["max_concurrency"])
        for r in iv.coverage_sweep(df, bucket_us=bucket).collect()
    }


def test_coverage_union_and_peak(spark):
    # bucket 0: [100,400) and [300,600) overlap -> union 500, peak 2;
    # [700,800) disjoint -> +100. Total covered 600, peak 2, n=3.
    got = _sweep(spark, [(100, 400), (300, 600), (700, 800)])
    assert got == {0: (3, 600, 2)}


def test_coverage_day_boundary_split(spark):
    # [900, 2100) spans buckets 0,1,2: covered 100 + 1000 + 100
    got = _sweep(spark, [(900, 2100)])
    assert got == {0: (1, 100, 1), 1: (1, 1000, 1), 2: (1, 100, 1)}


def test_coverage_point_intervals_invisible(spark):
    # a point interval adds +1-1 at one timestamp: no coverage, no
    # peak contribution, not counted as a positive-length piece
    got = _sweep(spark, [(500, 500), (100, 200)])
    assert got == {0: (1, 100, 1)}


def test_coverage_exact_boundary_end(spark):
    # end exactly on the bucket edge: zero-length piece in bucket 1
    # contributes nothing there
    got = _sweep(spark, [(600, 1000)])
    assert got[0] == (1, 400, 1)
    assert got.get(1, (0, 0, 0))[1] == 0


def test_coverage_nested_and_identical(spark):
    # identical twins + fully nested: union is the outer span
    got = _sweep(spark, [(100, 900), (100, 900), (300, 400)])
    assert got == {0: (3, 800, 3)}


def test_coverage_plan_is_bucket_keyed(spark):
    df = spark.createDataFrame([(100, 400)], "start_us long, end_us long")
    plan = iv.coverage_sweep(df, bucket_us=B)._jdf.queryExecution().executedPlan().toString()
    # no keyless window: every Window node partitions on bucket
    import re

    windows = re.findall(r"Window \[.*", plan)
    assert windows, "expected at least one Window node"
    for w in windows:
        assert "bucket" in w
