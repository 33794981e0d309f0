"""Wave-40: chi2 residual drill-down reconciles with the parent test;
exponential-fit KS behaves on known processes."""

import math
import random

import pytest

import __spark_entry__ as entry
from time_series_data_trimmer_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_residuals_reconcile_with_chi2(spark):
    qs = entry.queries()
    cells = qs["stats_chi2_residuals"](spark, SF).collect()
    parent = qs["stats_chi2_type_vs_hour"](spark, SF).collect()[0]
    # sum of squared 6-dp residuals ~= the parent chi2 (parent rounds
    # each term at 6 dp too; residual squaring doubles rounding noise)
    approx = sum(r["std_residual"] ** 2 for r in cells)
    assert approx == pytest.approx(parent["chi2"], rel=1e-3)
    assert sum(r["obs"] for r in cells) == parent["n"]
    # expected cell counts reproduce margins: per-type sums of expected
    # equal per-type observed totals (margin identity of the model)
    by_type = {}
    for r in cells:
        a = by_type.setdefault(r["event_type"], [0.0, 0])
        a[0] += r["expected"]
        a[1] += r["obs"]
    for ev, (se, so) in by_type.items():
        assert se == pytest.approx(so, rel=1e-4), ev


def test_expfit_detects_regular_vs_poisson(spark):
    rng = random.Random(11)
    rows = []
    t = 0
    for i in range(400):  # metronome: perfectly regular arrivals
        t += 1_000_000
        rows.append(("regular", t, i))
    t = 0
    for i in range(400):  # Poisson-ish: exponential gaps
        t += int(-math.log(1.0 - rng.random()) * 1_000_000) + 1
        rows.append(("poisson", t, 1000 + i))
    df = spark.createDataFrame(rows, "event_type string, t_us long, event_id long")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("event_type").orderBy("t_us", "event_id")
    d = df.select(
        "event_type",
        (F.col("t_us") - F.lag("t_us", 1).over(w)).alias("__dt"),
        "event_id",
    ).filter(F.col("__dt").isNotNull())
    st = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("__dt").alias("sdt")
    )
    # sanity of the toy itself
    stats = {r["event_type"]: r for r in st.collect()}
    assert stats["regular"]["n"] == 399

    out = {}
    # inline replication of the registered query's KS formula
    wr = Window.partitionBy("event_type").orderBy("__dt", "event_id")
    r = d.join(F.broadcast(st), "event_type").select(
        "event_type", "__dt", "n", "sdt",
        F.row_number().over(wr).alias("i"),
    )
    fm = F.lit(1.0) - F.exp(
        -(F.col("__dt").cast("double") * F.col("n") / F.col("sdt"))
    )
    k = r.groupBy("event_type", "n").agg(
        F.max(F.col("i") / F.col("n") - fm).alias("dp"),
        F.max(fm - (F.col("i") - 1) / F.col("n")).alias("dm"),
    )
    for row in k.collect():
        out[row["event_type"]] = max(row["dp"], row["dm"])
    c05 = 1.358 / math.sqrt(399)
    assert out["regular"] > c05  # a metronome is maximally non-exponential
    assert out["poisson"] < out["regular"] / 2  # true process fits far better
