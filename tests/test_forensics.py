"""Wave-9 forensics/robust-trend properties: fingerprint
order-invariance + sensitivity, Benford digit domain, exact moments vs
a pure-Python replica, and the lag-slope median's spike robustness."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_content_fingerprint_is_partition_invariant(spark):
    from time_series_data_trimmer_spark.queries import _table
    from time_series_data_trimmer_spark.operators import sampling as sp

    docs = _table(spark, SF, "documents")

    def fp(df):
        row_repr = F.concat_ws(
            "|",
            F.col("doc_id").cast("string"),
            F.coalesce(F.col("text"), F.lit("")),
            F.coalesce(F.col("lang"), F.lit("")),
            F.col("n_chars").cast("string"),
        )
        out = (
            df.select("source", sp.hash_u32(row_repr, "tsdt|fp").alias("u"))
            .groupBy("source")
            .agg(F.sum(F.col("u").cast("decimal(38,0)")).alias("s"))
        )
        return {r["source"]: r["s"] for r in out.collect()}

    base = fp(docs)
    assert fp(docs.repartition(17)) == base  # order/partitioning invariant
    # flipping ONE row's payload moves that source's sum
    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 1, F.concat(F.coalesce("text", F.lit("")), F.lit("!")))
        .otherwise(F.col("text")),
    )
    changed = fp(mutated)
    src = docs.filter(F.col("doc_id") == 1).select("source").first()["source"]
    assert changed[src] != base[src]
    assert all(changed[s] == base[s] for s in base if s != src)


def test_benford_digits_and_mass(spark):
    out = entry.queries()["dq_benford_first_digit"](spark, SF).collect()
    digits = sorted(r["digit"] for r in out)
    assert digits == list(range(1, 10))
    assert sum(r["pct"] for r in out) == pytest.approx(1.0, abs=1e-4)
    # each column is independently 6-dp rounded, so the identity holds to ~1e-6
    assert all(abs(r["pct"] - r["benford_pct"] - r["deviation"]) < 2e-6 for r in out)


def test_moments_match_pure_python(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in [1, 2, 2, 3, 3, 3, 4, 4, 10]],
        "event_type string, value double",
    )
    from time_series_data_trimmer_spark.functions.rounding import rd

    sv = F.floor(F.col("value") * 10000.0 + 0.5).cast("long").cast("decimal(12,0)")
    e = df.select("event_type", sv.alias("__sv")).withColumn(
        "__p2", (F.col("__sv") * F.col("__sv")).cast("decimal(19,0)")
    )
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__sv").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.col("__p2").cast("decimal(38,0)")).alias("s2"),
        F.sum((F.col("__p2") * F.col("__sv")).cast("decimal(38,0)")).alias("s3"),
        F.sum((F.col("__p2") * F.col("__p2")).cast("decimal(38,0)")).alias("s4"),
    ).first()
    vals = [10000 * v for v in [1, 2, 2, 3, 3, 3, 4, 4, 10]]
    n = len(vals)
    mu = sum(vals) / n
    m2 = sum(v * v for v in vals) / n - mu * mu
    m3 = sum(v**3 for v in vals) / n - 3 * mu * sum(v * v for v in vals) / n + 2 * mu**3
    m4 = (
        sum(v**4 for v in vals) / n
        - 4 * mu * sum(v**3 for v in vals) / n
        + 6 * mu * mu * sum(v * v for v in vals) / n
        - 3 * mu**4
    )
    assert int(s["s1"]) == sum(vals) and int(s["s4"]) == sum(v**4 for v in vals)
    skew = m3 / m2**1.5
    kurt = m4 / (m2 * m2) - 3
    # sanity: planted outlier makes the distribution right-skewed, heavy-tailed
    assert skew > 1.5 and kurt > 2.0


def test_lag_slope_median_resists_spike(spark):
    # linear series slope 2.0/s with the LAST point corrupted: an
    # interior spike cancels in the mean (lag-1 slope sums telescope),
    # so endpoint corruption is the mean's worst case — the median
    # shrugs either way
    rows = []
    for i in range(60):
        v = 2.0 * i
        if i == 59:
            v += 1e4
        rows.append((1, i, 1_000_000 * i, float(v)))
    df = spark.createDataFrame(rows, "user_id long, event_id long, t_us long, value double")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    sv = F.floor(F.col("value") * 10000.0 + 0.5).cast("long")
    d = df.select(
        "user_id",
        ((F.lead(sv).over(w) - sv).cast("double") / 10000.0).alias("dv"),
        ((F.lead("t_us").over(w) - F.col("t_us")).cast("double") / 1e6).alias("dt"),
    ).filter(F.col("dt").isNotNull())
    slopes = sorted(r["dv"] / r["dt"] for r in d.collect())
    median = slopes[(len(slopes) + 1) // 2 - 1]
    mean = sum(slopes) / len(slopes)
    assert median == pytest.approx(2.0, abs=1e-6)
    assert abs(mean - 2.0) > 10.0
