"""Wave-35: streaming PSI — stream state equals the batch computation
row-for-row, and the PSI contract holds per window."""

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.streaming.stream_ops import stream_psi_drift

PATH = "/root/testdata/sf0.001/events.parquet"


def test_stream_psi_equals_batch_and_contract(spark):
    got = stream_psi_drift(spark, PATH).collect()
    assert len(got) > 0
    by_key = {(r["window_start"], r["event_type"]): r for r in got}

    # batch replication: same bins, same windows, computed directly
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from time_series_data_trimmer_spark.sources.events import event_time

    ev = spark.read.parquet(PATH)
    ev = ev.withColumn("__t", event_time(ev)).filter(F.col("value").isNotNull())
    qs = [i / 10.0 for i in range(1, 10)]
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", F.array(*[F.lit(q) for q in qs])).alias("__bs")
    )
    binned = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        F.window("__t", "1 day").start.alias("w"),
        F.aggregate(
            F.col("__bs"), F.lit(0),
            lambda a, q: a + F.when(F.col("value") > q, 1).otherwise(0),
        ).alias("__bin"),
    )
    batch_n = {
        (r["w"], r["event_type"]): r["n"]
        for r in binned.groupBy("w", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(by_key) == set(batch_n)
    for k, r in by_key.items():
        assert r["n"] == batch_n[k]
        assert r["n_bins_used"] + r["n_bins_skipped"] == 10
        # reference bins always occupied (they're the corpus deciles),
        # so a used bin is exactly a window-occupied bin
        assert r["n_bins_used"] >= 1
        assert r["psi"] is not None and r["psi"] >= -1e-9
