"""Wave 16: exact-integer KS two-sample drift and one-way ANOVA.

Hand-computable fixtures pin the statistics to their textbook values;
a plan assertion pins the KS query to a single event_type Exchange
(running sums, partition totals, lead, and final max all ride one
hash partitioning).
"""

import math
import os
import sys

from pyspark.sql import Row
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _ks_exact(a, b):
    """Brute-force two-sample KS in Python (evaluated at every point)."""
    xs = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    return max(
        abs(
            sum(1 for v in a if v <= x) / na
            - sum(1 for v in b if v <= x) / nb
        )
        for x in xs
    )


def test_ks_matches_bruteforce(spark):
    """The integer cross-product max equals the float textbook KS on a
    small mixed-tie sample."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    a_vals = [1.0, 2.0, 2.0, 3.0, 5.0, 8.0]
    b_vals = [2.0, 4.0, 4.0, 6.0, 6.0, 9.0, 9.5]
    for i, v in enumerate(a_vals):  # first half
        rows.append(Row(event_id=i, ts=t0 + dt.timedelta(minutes=i),
                        event_type="t", value=float(v)))
    for i, v in enumerate(b_vals):  # second half
        rows.append(Row(event_id=100 + i,
                        ts=t0 + dt.timedelta(days=10, minutes=i),
                        event_type="t", value=float(v)))
    df = spark.createDataFrame(rows)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        out = entry.queries()["stats_ks_halves_by_type"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_a"] == len(a_vals) and r["n_b"] == len(b_vals)
    expect = _ks_exact(a_vals, b_vals)
    assert abs(r["ks_stat"] - expect) < 1e-6
    c = 1.358 * math.sqrt((r["n_a"] + r["n_b"]) / (r["n_a"] * r["n_b"]))
    assert abs(r["c_alpha_05"] - c) < 1e-5
    assert r["drift_flag"] == (1 if r["ks_stat"] > r["c_alpha_05"] else 0)


def test_ks_single_type_exchange(spark):
    """One hashpartitioning Exchange on event_type carries the whole
    statistic (the scalar-range broadcast is the only other movement)."""
    df = entry.queries()["stats_ks_halves_by_type"](spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # exactly one hash exchange (on event_type); the only other data
    # movement is the 1-row min/max scalar (SinglePartition + its
    # broadcast), which is the sanctioned scalar-subquery shape
    assert plan.count("Arguments: hashpartitioning") == 1, plan
    assert "hashpartitioning(event_type" in plan, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_anova_matches_numpy(spark):
    """F and η² equal the textbook decomposition computed in numpy on
    the same values (after the 4-dp value grid both sides share)."""
    import numpy as np

    out = entry.queries()["stats_anova_value_by_type"](spark, SF).collect()[0]
    import duckdb

    con = duckdb.connect()
    vals = con.execute(
        f"SELECT event_type, round(value, 4) FROM read_parquet('{SF}/events.parquet') "
        "WHERE value IS NOT NULL"
    ).fetchall()
    groups = {}
    for t, v in vals:
        groups.setdefault(t, []).append(float(v))
    allv = np.array([v for g in groups.values() for v in g])
    gmean = allv.mean()
    ssb = sum(len(g) * (np.mean(g) - gmean) ** 2 for g in groups.values())
    ssw = sum(((np.array(g) - np.mean(g)) ** 2).sum() for g in groups.values())
    k, n = len(groups), len(allv)
    f_expect = (ssb / (k - 1)) / (ssw / (n - k))
    assert out["k_groups"] == k and out["n"] == n
    assert abs(out["ss_between"] - ssb) < max(1e-3, 1e-6 * ssb)
    assert abs(out["ss_within"] - ssw) < max(1e-3, 1e-6 * ssw)
    assert abs(out["f_stat"] - f_expect) < 1e-3
    assert abs(out["eta_squared"] - ssb / (ssb + ssw)) < 1e-4
