"""Tests for multimodal plumbing and streaming operators."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import multimodal as mm
from time_series_data_trimmer_spark.sources.events import event_seconds, event_time


def test_extract_features_deterministic(spark):
    assets = mm.synthetic_assets(spark, n=8, kind="image")
    a = mm.extract_features(assets).toPandas().sort_values("asset_id")
    b = mm.extract_features(assets).toPandas().sort_values("asset_id")
    assert len(a) == 8
    for fa, fb in zip(a["features"], b["features"]):
        assert len(fa) == mm.FEATURE_DIM
        np.testing.assert_array_equal(fa, fb)
        assert all(-1.0 <= x < 1.0 for x in fa)


def test_extract_features_real_path_raises(spark):
    assets = mm.synthetic_assets(spark, n=2, kind="image")
    with pytest.raises(Exception, match="NotImplementedError|real image decode"):
        mm.extract_features(assets, decode="real").collect()


def test_image_resize_stub_updates_metadata(spark):
    assets = mm.synthetic_assets(spark, n=4, kind="image")
    out = mm.image_resize_stub(assets, 32, 24).toPandas()
    assert (out["width"] == 32).all() and (out["height"] == 24).all()
    assert out["payload"].map(lambda b: len(b)).eq(16).all()


def test_frame_sample_stub_row_explosion(spark):
    assets = mm.synthetic_assets(spark, n=3, kind="video")  # durations 10,11,12
    out = mm.frame_sample_stub(assets, every_s=2.0).toPandas()
    want = sum(max(1, int((10.0 + i) / 2.0)) for i in range(3))
    assert len(out) == want
    one = out[out.asset_id == 0].sort_values("frame_idx")
    np.testing.assert_allclose(one["frame_time_s"], np.arange(len(one)) * 2.0)


def test_streaming_tumbling_matches_batch(spark):
    from time_series_data_trimmer_spark.streaming.stream_ops import tumbling_hour_agg

    path = "/root/testdata/sf0.001/events.parquet"
    got = tumbling_hour_agg(spark, path).toPandas()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(path)
    ev = ev.withColumn("event_time", event_time(ev))
    want = (
        ev.groupBy("user_id", F.date_trunc("hour", F.col("event_time")).alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .toPandas()
    )
    assert len(got) == len(want)
    g = got.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    w = want.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    assert (g["n_events"].to_numpy() == w["n_events"].to_numpy()).all()


def test_streaming_sliding_mean_runs(spark):
    from time_series_data_trimmer_spark.streaming.stream_ops import sliding_mean

    out = sliding_mean(spark, "/root/testdata/sf0.001/events.parquet").toPandas()
    assert len(out) > 0
    assert {"user_id", "window_start", "window_end", "mean_value", "n_events"} <= set(out.columns)


def test_streaming_session_window_matches_batch_sessionize(spark):
    from time_series_data_trimmer_spark.operators.aggregates import sessionize
    from time_series_data_trimmer_spark.streaming.stream_ops import session_agg

    path = "/root/testdata/sf0.001/events.parquet"
    got = session_agg(spark, path, gap="30 minutes").toPandas()

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(path)
    ev = ev.withColumn("t", event_seconds(ev))
    want = sessionize(ev, 1800.0, trial_key="user_id", time_col="t").toPandas()
    # same session structure: session counts per user and event totals agree
    g = got.groupby("user_id")["n_events"].agg(["count", "sum"]).sort_index()
    w = want.groupby("user_id")["n_events"].agg(["count", "sum"]).sort_index()
    assert (g["count"].to_numpy() == w["count"].to_numpy()).all()
    assert (g["sum"].to_numpy() == w["sum"].to_numpy()).all()


def test_stateful_running_counts(spark):
    from time_series_data_trimmer_spark.streaming.stream_ops import running_counts_with_state

    path = "/root/testdata/sf0.001/events.parquet"
    got = running_counts_with_state(spark, path, threshold=250.0).toPandas()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(path)
    want = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("value") > 250.0).cast("long")).alias("n_spikes"),
        )
        .toPandas()
    )
    g = got.sort_values("user_id").reset_index(drop=True)
    w = want.sort_values("user_id").reset_index(drop=True)
    assert (g["n_events"].to_numpy() == w["n_events"].to_numpy()).all()
    assert (g["n_spikes"].to_numpy() == w["n_spikes"].to_numpy()).all()


def test_streaming_file_sink_matches_batch_on_closed_windows(spark, tmp_path):
    # production path: append-mode parquet sink emits each window exactly
    # once when the watermark closes it; every emitted row must equal the
    # batch aggregate for that window, and every window strictly older
    # than (max event time - watermark delay) must have been emitted
    from time_series_data_trimmer_spark.functions.rounding import rd
    from time_series_data_trimmer_spark.streaming.stream_ops import (
        tumbling_hour_agg_to_files,
    )

    path = "/root/testdata/sf0.001/events.parquet"
    got = tumbling_hour_agg_to_files(
        spark, path, str(tmp_path / "sink"), str(tmp_path / "ckpt")
    ).toPandas()
    assert len(got) > 0

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(path)
    ev = ev.withColumn("event_time", event_time(ev))
    batch = (
        ev.groupBy("user_id", F.date_trunc("hour", F.col("event_time")).alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(rd(F.col("value"), 2).cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
        .toPandas()
    )
    max_t = ev.agg(F.max("event_time")).collect()[0][0]

    bkey = {
        (r.user_id, r.window_start): (r.n_events, r.sum_value)
        for r in batch.itertuples()
    }
    # (a) value parity: every emitted window equals the batch aggregate
    for r in got.itertuples():
        k = (r.user_id, r.window_start)
        assert k in bkey, f"sink emitted a window batch does not have: {k}"
        n, s = bkey[k]
        assert r.n_events == n
        assert abs(r.sum_value - s) < 1e-9
    # (b) completeness: windows closed strictly before the final
    # watermark (max event time - 1h delay) were all emitted
    import pandas as pd

    emitted = {(r.user_id, r.window_start) for r in got.itertuples()}
    wm = pd.Timestamp(max_t) - pd.Timedelta(hours=1)
    for r in batch.itertuples():
        window_end = pd.Timestamp(r.window_start) + pd.Timedelta(hours=1)
        if window_end < wm:
            assert (r.user_id, r.window_start) in emitted, (
                f"closed window missing from sink: {(r.user_id, r.window_start)}"
            )


def test_streaming_session_file_sink_runs(spark, tmp_path):
    from time_series_data_trimmer_spark.streaming.stream_ops import session_agg_to_files

    path = "/root/testdata/sf0.001/events.parquet"
    out = session_agg_to_files(
        spark, path, str(tmp_path / "sink"), str(tmp_path / "ckpt")
    )
    assert out.count() > 0
    assert set(out.columns) == {"user_id", "session_start", "session_end", "n_events"}


def test_stream_dedup_file_sink_matches_batch_distinct(spark, tmp_path):
    # streaming dedup production path: append-mode parquet sink; the
    # emitted rows must equal batch SELECT DISTINCT on the same digest
    # (watermark delay covers the corpus span so nothing is late), and
    # a SECOND run off the same checkpoint must emit nothing new
    # (exactly-once restartability)
    from time_series_data_trimmer_spark.streaming.stream_ops import (
        stream_dedup_to_files,
    )

    path = "/root/testdata/sf0.001/events.parquet"
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    got = stream_dedup_to_files(spark, path, sink, ckpt).toPandas()

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(path)
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    batch = (
        ev.select(
            "user_id",
            F.md5(
                F.concat(
                    F.coalesce(F.col("event_type"), F.lit("<null>")),
                    F.lit("|"),
                    F.coalesce(cents.cast("string"), F.lit("<null>")),
                )
            ).alias("content_key"),
        )
        .distinct()
        .toPandas()
    )
    want = set(map(tuple, batch[["user_id", "content_key"]].itertuples(index=False)))
    emitted = set(map(tuple, got[["user_id", "content_key"]].itertuples(index=False)))
    assert emitted == want
    assert len(got) == len(emitted), "sink contains duplicate rows"

    rerun = stream_dedup_to_files(spark, path, sink, ckpt).toPandas()
    assert len(rerun) == len(got), "restart from checkpoint re-emitted rows"


def test_stream_kmv_batch_schedule_invariant(spark, tmp_path):
    """The streaming KMV estimate is identical under a 3-batch schedule
    and a single batch, and equals the batch sketch — bottom-k's
    closure under union makes emissions re-mergeable regardless of
    micro-batch boundaries."""
    import os
    import time as _time

    import pandas as pd

    from time_series_data_trimmer_spark.operators import sketches as sk
    from time_series_data_trimmer_spark.streaming.stream_ops import (
        stream_kmv_distinct,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = pd.Timestamp("2024-01-01 00:00:00")
    t0 = _time.time()
    rows = [(i, i % 97, "a" if i % 3 else "b", float(i)) for i in range(300)]
    for fi in range(3):
        df = pd.DataFrame(
            [
                {
                    "event_id": eid,
                    "ts": (base + pd.Timedelta(minutes=eid)).to_datetime64(),
                    "user_id": uid,
                    "event_type": et,
                    "value": v,
                }
                for eid, uid, et, v in rows[fi::3]
            ]
        )
        df["ts"] = df["ts"].astype("datetime64[us]")
        path = os.path.join(src, f"f{fi}.parquet")
        df.to_parquet(path, index=False)
        os.utime(path, (t0 + fi * 100, t0 + fi * 100))

    def run(mfpt):
        out = stream_kmv_distinct(
            spark, src, group_col="event_type", key_col="user_id", k=32,
            max_files_per_trigger=mfpt,
        )
        return {
            (r["event_type"], r["n_kept"], r["est_distinct"])
            for r in out.collect()
        }

    multi = run(1)      # three micro-batches
    single = run(None)  # one batch
    assert multi == single
    batch_df = spark.createDataFrame(
        [(et, uid) for _e, uid, et, _v in rows], "event_type string, user_id long"
    )
    batch = {
        (r["event_type"], r["n_kept"], r["est_distinct"])
        for r in sk.kmv_distinct(batch_df, "event_type", "user_id", k=32)
        .select("event_type", "n_kept", "est_distinct")
        .collect()
    }
    assert multi == batch


def test_stream_quantile_batch_schedule_invariant(spark, tmp_path):
    """Streaming quantile sketch: 3-batch == 1-batch == batch-mode
    registers (bottom-k closure, as for the KMV twin)."""
    import os
    import time as _time

    import pandas as pd

    from time_series_data_trimmer_spark.operators import sketches as sk
    from time_series_data_trimmer_spark.streaming.stream_ops import (
        stream_quantile_sketch,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = pd.Timestamp("2024-01-01 00:00:00")
    t0 = _time.time()
    rows = [(i, i % 11, "a" if i % 2 else "b", float((i * 13) % 101)) for i in range(240)]
    for fi in range(3):
        df = pd.DataFrame(
            [
                {
                    "event_id": eid,
                    "ts": (base + pd.Timedelta(minutes=eid)).to_datetime64(),
                    "user_id": uid,
                    "event_type": et,
                    "value": v,
                }
                for eid, uid, et, v in rows[fi::3]
            ]
        )
        df["ts"] = df["ts"].astype("datetime64[us]")
        path = os.path.join(src, f"f{fi}.parquet")
        df.to_parquet(path, index=False)
        os.utime(path, (t0 + fi * 100, t0 + fi * 100))

    def run(mfpt):
        out = stream_quantile_sketch(
            spark, src, qs=(0.5, 0.9), k=16, max_files_per_trigger=mfpt
        )
        return {
            (r["event_type"], r["q"], r["n_kept"], r["q_est"]) for r in out.collect()
        }

    multi, single = run(1), run(None)
    assert multi == single
    batch = spark.createDataFrame(
        [(et, eid, v) for eid, _u, et, v in rows],
        "event_type string, event_id long, value double",
    )
    regs = sk.quantile_sketch_registers(batch, "event_type", "value", "event_id", k=16)
    want = {
        (r["event_type"], r["q"], r["n_kept"], r["q_est"])
        for r in sk.quantile_sketch_estimate(regs, [0.5, 0.9], group_col="event_type").collect()
    }
    assert multi == want
