"""Skew helpers: salted aggregation correctness, bucketed co-located joins."""

import numpy as np

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators.skew import (
    bucketed_join_is_shuffle_free,
    salted_agg,
    write_bucketed,
)


def _skewed(spark, n_hot=5000, n_cold=50):
    rows = [(0, float(i), i) for i in range(n_hot)]  # one hot key
    rows += [(k, float(k), k) for k in range(1, n_cold + 1)]
    return spark.createDataFrame(rows, "key long, v double, uid long")


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    got = (
        salted_agg(
            df, ["key"],
            {"n": ("count", "*"), "total": ("sum", "v"), "lo": ("min", "v"), "hi": ("max", "v")},
            salt_buckets=8, salt_source="uid",
        )
        .toPandas().sort_values("key").reset_index(drop=True)
    )
    want = (
        df.groupBy("key").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"),
            F.min("v").alias("lo"), F.max("v").alias("hi"),
        )
        .toPandas().sort_values("key").reset_index(drop=True)
    )
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
    np.testing.assert_allclose(got["total"], want["total"])
    np.testing.assert_allclose(got["lo"], want["lo"])
    np.testing.assert_allclose(got["hi"], want["hi"])


def test_salted_agg_partial_phase_spreads_hot_key(spark):
    df = _skewed(spark)
    part = (
        df.withColumn("__salt", F.pmod(F.xxhash64("uid"), F.lit(8)).cast("int"))
        .groupBy("key", "__salt").count()
    )
    hot = part.filter(F.col("key") == 0).toPandas()
    assert len(hot) == 8  # the hot key's rows really split across salts
    assert hot["count"].max() < 5000


def test_salted_agg_rejects_non_algebraic():
    import pytest

    with pytest.raises(ValueError):
        salted_agg(None, ["k"], {"m": ("median", "v")})


def test_aqe_splits_skewed_join_partition(spark):
    # JOIN-side skew (the case salting doesn't cover): one hot join key
    # holding most of the fact rows. With broadcast disabled (so the
    # join really shuffles) and the skew thresholds lowered to test
    # volume, AQE must split the hot partition — the final adaptive
    # plan marks the join skew=true — and the join result must be
    # unchanged.
    from time_series_data_trimmer_spark.operators.skew import (
        aqe_skew_split_applied,
    )

    # incompressible padding: shuffle skew detection reads COMPRESSED
    # map-output sizes, so a constant pad would vanish
    pad = F.repeat(F.md5(F.col("id").cast("string")), 8)
    facts = spark.range(0, 120_000).select(
        F.when(F.col("id") % 10 < 8, F.lit(0)).otherwise(F.col("id") % 97).alias("k"),
        F.col("id").alias("fid"),
        pad.alias("pad"),
    )
    dims = spark.range(0, 97).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("dval")
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "262144",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "131072",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16384",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = facts.join(dims, "k")
        assert aqe_skew_split_applied(joined), (
            "AQE did not split the hot partition:\n"
            + joined._jdf.queryExecution().executedPlan().toString()[:2000]
        )
        # correctness unchanged by the split
        n = facts.join(dims, "k").count()
        assert n == 120_000
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_bucketed_join_no_exchange(spark, tmp_path):
    # warehouse.dir is static conf — tables land in ./spark-warehouse
    # (gitignored); clear both catalog entries AND stale locations left by
    # earlier sessions (the in-memory catalog forgets them, the dirs remain)
    import shutil
    for t in ("bt_left", "bt_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    left = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(left, "bt_left", ["k"], n_buckets=8, sort_cols=["k"])
    write_bucketed(right, "bt_right", ["k"], n_buckets=8, sort_cols=["k"])
    # force a non-broadcast join so bucketing (not broadcast) is what
    # removes the shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert bucketed_join_is_shuffle_free(spark, "bt_left", "bt_right", ["k"])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    out = spark.table("bt_left").join(spark.table("bt_right"), "k")
    assert out.count() == 10000
    spark.sql("DROP TABLE IF EXISTS bt_left")
    spark.sql("DROP TABLE IF EXISTS bt_right")


def test_runtime_bloom_filter_engages_on_selective_join(spark):
    """Rehearsal of Spark's runtime bloom-filter pruning: with the
    application-side size threshold lowered to test volume (production
    default 10GB engages on real fact tables), a selective dim filter
    injects a bloom probe into the fact side of the join — and without
    the selective filter, no bloom is built (the mechanism is guarded,
    not unconditional)."""
    from time_series_data_trimmer_spark.operators.skew import (
        runtime_bloom_filter_applied,
    )

    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        sel = o.filter(F.col("o_orderpriority") == "1-URGENT")
        j = l.join(sel.hint("shuffle_hash"), l["l_orderkey"] == sel["o_orderkey"])
        assert runtime_bloom_filter_applied(j)
        # no selective creation-side filter -> no bloom injected
        j2 = l.join(o.hint("shuffle_hash"), l["l_orderkey"] == o["o_orderkey"])
        assert not runtime_bloom_filter_applied(j2)
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
