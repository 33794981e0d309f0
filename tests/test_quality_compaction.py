"""Data-quality expectations engine + compaction planner + the new
sketch roll-ups: violation accounting on planted-dirty data, the
global-quantile register-rollup equality, and the KMV intersection
estimator's exact-regime behavior."""

import pytest
from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import layout as ly
from time_series_data_trimmer_spark.operators import quality as dq
from time_series_data_trimmer_spark.operators import sketches as sk


def _report_map(df):
    return {
        r["rule"]: (r["n_checked"], r["n_violations"], r["violation_rate"])
        for r in df.collect()
    }


def test_expectations_report_counts_planted_violations(spark):
    rows = [
        # (key, price, status, pri, fkkey)
        (1, 10.0, "O", "1-URGENT", 100),
        (2, -5.0, "X", "9-BAD", 100),      # range + set + format violations
        (3, None, None, None, 999),        # null value rules skip; fk orphan
        (3, 20.0, "F", "2-HIGH", None),    # duplicate key; null fk not checked
    ]
    df = spark.createDataFrame(rows, "k long, price double, status string, pri string, fk long")
    dim = spark.createDataFrame([(100,)], "dk long")
    rep = dq.expectations_report(
        df,
        row_rules=[
            dq.not_null("price"),
            dq.in_range("price", 0.0, 100.0),
            dq.in_set("status", ["O", "F"]),
            dq.matches("pri", "^[1-5]-", label="pri_format"),
        ],
        unique_cols=["k"],
        fks=[("fk", dim, "dk")],
    )
    m = _report_map(rep)
    assert m["not_null(price)"] == (4, 1, 0.25)
    # value rules check only the 3 non-null rows
    assert m["in_range(price,0.0,100.0)"] == (3, 1, pytest.approx(1 / 3, abs=1e-6))
    assert m["in_set(status)"][0:2] == (3, 1)
    assert m["pri_format"][0:2] == (3, 1)
    # 4 non-null keys, 3 distinct -> 1 extra copy
    assert m["unique(k)"][0:2] == (4, 1)
    # 3 non-null fks, one orphan (999)
    assert m["fk(fk)"][0:2] == (3, 1)


def test_expectations_report_clean_data_is_all_zero(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    rep = dq.expectations_report(
        df,
        row_rules=[dq.not_null("v"), dq.in_range("v", 0.0, 10.0)],
        unique_cols=["k"],
    )
    assert all(r["n_violations"] == 0 for r in rep.collect())


def test_quantile_global_rollup_equals_direct_global_sketch(spark):
    """The hinge property: per-group registers rolled up to the global
    bottom-k EQUAL the bottom-k of sketching all rows directly,
    register for register."""
    df = spark.range(0, 2000).select(
        (F.col("id") % 7).alias("g"),
        F.col("id").alias("rid"),
        (F.col("id") * 37 % 101).cast("double").alias("v"),
    )
    per_group = sk.quantile_sketch_registers(df, "g", "v", "rid", k=32)
    rolled = sk.quantile_sketch_global(per_group, k=32)
    direct = sk.quantile_sketch_registers(
        df.withColumn("c", F.lit("_all_")), "c", "v", "rid", k=32
    )
    a = sorted((r["u"], r["v"]) for r in rolled.collect())
    b = sorted((r["u"], r["v"]) for r in direct.collect())
    assert a == b and len(a) == 32


def test_kmv_intersection_exact_below_k(spark):
    """Below k distinct values everything is exact: est_a/est_b/union
    are the true counts and the intersection estimate is the true
    overlap."""
    rows = [("a", f"t{i}") for i in range(20)] + [
        ("b", f"t{i}") for i in range(10, 40)
    ]
    df = spark.createDataFrame(rows, "g string, tok string")
    regs = sk.kmv_registers(df, "g", "tok", k=64)
    out = sk.kmv_pairwise_intersection(regs, k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["est_a"], r["est_b"]) == (20.0, 30.0)
    assert r["est_union"] == 40.0
    assert r["jaccard_est"] == pytest.approx(10 / 40, abs=1e-6)
    assert r["est_intersection"] == pytest.approx(10.0, abs=1e-6)


def test_compaction_plan_arithmetic(spark):
    df = spark.createDataFrame(
        [("a", "x" * 100)] * 30 + [("b", "y" * 10)] * 2,
        "part string, text string",
    )
    plan = ly.compaction_plan(
        df, "part", F.octet_length("text").cast("long"), target_file_bytes=1000
    )
    m = {r["part"]: r for r in plan.collect()}
    assert m["a"]["est_bytes"] == 3000 and m["a"]["n_files"] == 3
    assert m["b"]["est_bytes"] == 20 and m["b"]["n_files"] == 1  # floor at 1 file
    assert m["a"]["pct_of_total"] == pytest.approx(3000 / 3020, abs=1e-6)
    assert m["a"]["avg_file_mb"] == pytest.approx(1000 / 1048576, abs=1e-6)


def test_stream_dq_batch_schedule_invariant(spark, tmp_path):
    """The streaming DQ gate's final state is identical under a
    3-batch schedule and a single batch (window-pure counter fold),
    and violation counts match a hand computation."""
    import os
    import time as _time

    import pandas as pd

    from time_series_data_trimmer_spark.streaming.stream_ops import (
        stream_dq_violations,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = pd.Timestamp("2024-01-01 00:00:00")
    t0 = _time.time()
    # 90 rows over 2 hours; every 9th value out of range, every 10th
    # type is 'error', every 15th value null
    rows = []
    for i in range(90):
        v = 500.0 if i % 9 == 0 else 10.0
        if i % 15 == 0:
            v = None
        et = "error" if i % 10 == 0 else "view"
        rows.append((i, base + pd.Timedelta(minutes=2 * i), 1, et, v))
    for fi in range(3):
        df = pd.DataFrame(
            [
                {"event_id": eid, "ts": ts.to_datetime64(), "user_id": uid,
                 "event_type": et, "value": v}
                for eid, ts, uid, et, v in rows[fi::3]
            ]
        )
        df["ts"] = df["ts"].astype("datetime64[us]")
        p = os.path.join(src, f"f{fi}.parquet")
        df.to_parquet(p, index=False)
        os.utime(p, (t0 + fi * 100, t0 + fi * 100))

    def run(mfpt):
        out = stream_dq_violations(spark, src, max_files_per_trigger=mfpt)
        return {
            (str(r["window_start"]), r["rule"], r["n_checked"], r["n_violations"])
            for r in out.collect()
        }

    multi = run(1)
    single = run(None)
    assert multi == single
    # hand check: hour 0 holds minutes 0..58 -> i in 0..29
    h0 = {r[1]: r for r in multi if r[0].endswith("00:00:00")}
    i0 = list(range(30))
    nulls = sum(1 for i in i0 if i % 15 == 0)
    assert h0["not_null(value)"][2:] == (30, nulls)
    oor = sum(1 for i in i0 if i % 9 == 0 and i % 15 != 0)
    assert h0["in_range(value,0.0,300.0)"][2:] == (30 - nulls, oor)
    errs = sum(1 for i in i0 if i % 10 == 0)
    assert h0["in_set(event_type)"][2:] == (30, errs)
