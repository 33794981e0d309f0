"""Late / out-of-order data tests for the streaming family.

The batch-parity tests prove the streaming plans compute the right
aggregates on in-order data; these tests prove the WATERMARK CONTRACT
on late data:

* tumbling agg (1 h watermark): a row whose window was already EVICTED
  (emitted) is dropped — the emitted window is never revised and no
  second row for it ever appears; a late row whose window state is
  still open is accepted. (Spark's drop guarantee is tied to state
  eviction: a row later than the watermark whose state still exists
  MAY merge — observed and pinned by this test's batch schedule, which
  evicts the window one batch before the late replay arrives.)
* streaming dedup (dropDuplicatesWithinWatermark): a duplicate
  arriving within the delay of its first occurrence is suppressed; once
  the watermark passes the entry's expiry (first event time + delay)
  the state is evicted AT BATCH END and a replay in a LATER batch is
  re-emitted. This operator does NOT filter late input rows (watermark
  drives state expiry only) — also pinned here, because relying on a
  drop that doesn't happen would corrupt a pipeline built on it.

Determinism: each source file becomes its own micro-batch
(maxFilesPerTrigger=1, modification times spaced so the file source
orders them), and Spark advances the filter watermark only between
batches — so which rows are "late" is exact, not racy.
"""

import os
import time

import pandas as pd
import pytest


def _write_events(dirpath: str, fname: str, rows: list[tuple], mtime: float) -> None:
    """rows: (event_id, minutes_after_epoch_hour0, user_id, event_type, value)"""
    base = pd.Timestamp("2024-01-01 00:00:00")
    df = pd.DataFrame(
        [
            {
                "event_id": eid,
                "ts": (base + pd.Timedelta(minutes=m)).to_datetime64(),
                "user_id": uid,
                "event_type": et,
                "value": val,
            }
            for eid, m, uid, et, val in rows
        ]
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    path = os.path.join(dirpath, fname)
    df.to_parquet(path, index=False)
    os.utime(path, (mtime, mtime))


def test_tumbling_late_rows_drop_after_watermark(spark, tmp_path):
    from time_series_data_trimmer_spark.streaming.stream_ops import (
        tumbling_hour_agg_to_files,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = time.time() - 1000
    # batch 0: two rows in window [00,01), one at 03:30 (raises max
    # event time → next batch's watermark = 02:30)
    _write_events(
        src,
        "f1.parquet",
        [(1, 30, 1, "a", 1.0), (2, 40, 1, "a", 2.0), (3, 210, 1, "a", 3.0)],
        t0,
    )
    # batch 1: advancer at 06:30. End-of-batch watermark 02:30 EVICTS
    # and emits [00,01) n=2; next batch's watermark becomes 05:30.
    _write_events(src, "f2.parquet", [(6, 390, 1, "a", 5.0)], t0 + 100)
    # batch 2 (watermark 05:30, [00,01) state GONE):
    #   00:45 → evicted window → guaranteed DROP (never revised)
    #   05:45 → window [05,06) end 06:00 > 05:30 → accepted (late but
    #           inside the open-state horizon)
    _write_events(
        src,
        "f3.parquet",
        [(4, 45, 1, "a", 100.0), (5, 345, 1, "a", 4.0)],
        t0 + 200,
    )
    # batch 3: far-future row flushes [03,04), [05,06), [06,07)
    _write_events(src, "f4.parquet", [(7, 720, 1, "a", 6.0)], t0 + 300)

    got = tumbling_hour_agg_to_files(
        spark,
        src,
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    ).toPandas()

    emitted = {
        (pd.Timestamp(r.window_start).hour, int(r.n_events))
        for r in got.itertuples()
    }
    # [00,01) emitted ONCE with the two on-time rows only (had the
    # post-eviction 00:45 replay been admitted, a second hour-0 row
    # would exist); the still-open-state 05:45 row was accepted
    assert emitted == {(0, 2), (3, 1), (5, 1), (6, 1)}, emitted
    assert len(got) == 4, got  # no window revised / duplicated
    h0 = got[pd.to_datetime(got.window_start).dt.hour == 0]
    assert float(h0.sum_value.iloc[0]) == pytest.approx(3.0)  # 1.0 + 2.0, not +100


def test_dedup_watermark_eviction_and_replay(spark, tmp_path):
    from time_series_data_trimmer_spark.streaming.stream_ops import (
        stream_dedup_to_files,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = time.time() - 1000
    K = (1, "a", 1.0)  # (user_id, event_type, value) → one content_key
    # batch 0: first occurrence of K at 00:00 → emitted
    _write_events(src, "f1.parquet", [(1, 0, *K)], t0)
    # batch 1 (watermark still behind K's expiry): replay K at 00:10 →
    # suppressed; advancer row (distinct content) at 05:00 moves max
    # event time so batch 2 runs with watermark 04:00
    _write_events(
        src, "f2.parquet", [(2, 10, *K), (3, 300, 9, "z", 9.0)], t0 + 100
    )
    # batch 2 (watermark 04:00 > K's expiry 01:00): end-of-batch
    # eviction removes K's state. A late row (user 5 at 03:00, older
    # than the watermark) is still ADMITTED — this operator has no
    # input-side late filter.
    _write_events(src, "f3.parquet", [(5, 180, 5, "b", 5.0)], t0 + 200)
    # batch 3: replay K at 04:50 → state gone → RE-EMITTED
    _write_events(src, "f4.parquet", [(4, 290, *K)], t0 + 300)

    got = stream_dedup_to_files(
        spark,
        src,
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
        watermark="1 hour",
        max_files_per_trigger=1,
    ).toPandas()

    by_user = got.groupby("user_id").size().to_dict()
    # K emitted twice: once in batch 0, suppressed in batch 1 (within
    # the delay), re-emitted in batch 3 after batch-2 eviction
    assert by_user.get(1) == 2, got.to_dict("records")
    assert by_user.get(9) == 1
    # the late row IS emitted — watermark drives state expiry, not an
    # input drop; a pipeline needing late-row drops must filter upstream
    assert by_user.get(5) == 1, got.to_dict("records")
    # both user-1 rows carry the SAME content key (it is a true replay)
    assert got[got.user_id == 1].content_key.nunique() == 1


def test_stream_upsert_latest_wins_and_replay_idempotent(spark, tmp_path):
    from time_series_data_trimmer_spark.streaming.stream_ops import (
        stream_upsert_to_keyed_parquet,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = time.time() - 1000
    # batch 0: users 1,2; batch 1: user 1 updated (later event), user 3 new
    _write_events(
        src, "f1.parquet", [(1, 10, 1, "a", 1.0), (2, 10, 2, "a", 2.0)], t0
    )
    _write_events(
        src, "f2.parquet", [(3, 20, 1, "a", 9.0), (4, 5, 3, "a", 3.0)], t0 + 100
    )
    out, ckpt = str(tmp_path / "table"), str(tmp_path / "ckpt")
    got = stream_upsert_to_keyed_parquet(
        spark, src, out, ckpt, max_files_per_trigger=1
    ).toPandas()
    state = dict(zip(got.user_id, got.value))
    assert state == {1: 9.0, 2: 2.0, 3: 3.0}, state
    assert len(got) == 3  # one row per key, not per event

    # replay from the same checkpoint: nothing new to process, and the
    # idempotent merge leaves the table unchanged
    again = stream_upsert_to_keyed_parquet(
        spark, src, out, ckpt, max_files_per_trigger=1
    ).toPandas()
    assert dict(zip(again.user_id, again.value)) == state
    assert len(again) == 3


def test_stream_upsert_rewrites_only_affected_buckets(spark, tmp_path):
    # dynamic partition overwrite is scoped: a later run whose batch
    # touches other keys must leave untouched buckets' files alone
    from time_series_data_trimmer_spark.streaming.stream_ops import (
        stream_upsert_to_keyed_parquet,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = time.time() - 1000
    _write_events(
        src, "f1.parquet", [(i, 10, uid, "a", float(uid)) for i, uid in enumerate(range(20))], t0
    )
    out, ckpt = str(tmp_path / "table"), str(tmp_path / "ckpt")
    stream_upsert_to_keyed_parquet(spark, src, out, ckpt, n_buckets=8)

    def bucket_files():
        state = {}
        for d in os.listdir(out):
            if d.startswith("__bucket="):
                p = os.path.join(out, d)
                state[d] = sorted(
                    (f, os.path.getmtime(os.path.join(p, f)))
                    for f in os.listdir(p)
                    if f.endswith(".parquet")
                )
        return state

    before = bucket_files()
    assert len(before) >= 4  # several buckets populated

    # second run: ONE key updated
    _write_events(src, "f2.parquet", [(100, 20, 0, "a", 99.0)], t0 + 100)
    stream_upsert_to_keyed_parquet(spark, src, out, ckpt, n_buckets=8)
    after = bucket_files()

    from pyspark.sql import functions as F

    hot = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(0).cast("long")), F.lit(8)).cast("int").alias("b")
    ).collect()[0]["b"]
    changed = {d for d in after if after[d] != before.get(d)}
    assert f"__bucket={hot}" in changed
    untouched = set(before) - {f"__bucket={hot}"}
    assert all(after[d] == before[d] for d in untouched), (
        f"unaffected buckets rewritten: {changed - {f'__bucket={hot}'}}"
    )
    # and the update landed
    final = spark.read.parquet(out)
    assert final.filter(F.col("user_id") == 0).select("value").collect()[0][0] == 99.0


def test_rocksdb_state_store_is_default_with_metrics(spark):
    """r5: every streaming query runs on the RocksDB state store (state
    off-heap — the HDFS-backed provider holds all keys on the JVM heap
    and OOMs at a 100 TB keyspace). Pin the conf takes effect and that
    state metrics are observable for capacity planning."""
    import uuid

    from time_series_data_trimmer_spark.streaming import stream_ops

    plan = stream_ops._dedup_plan(spark, "/root/testdata/sf0.001/events.parquet")
    name = f"rocks_{uuid.uuid4().hex[:8]}"
    stream_ops._streaming_confs(spark)
    q = (
        plan.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert "RocksDB" in spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass"
    )
    assert spark.table(name).count() > 0
    m = stream_ops.state_store_metrics(q)
    assert m, "no stateOperators in progress"
    dedup = m[0]
    assert dedup["state_rows"] and dedup["state_rows"] > 0
    assert dedup["memory_used_bytes"] and dedup["memory_used_bytes"] > 0


def test_stream_funnel_state_carries_across_batches(spark, tmp_path):
    """The funnel latches stages across micro-batches: view in batch 0,
    click in batch 1, purchase in batch 2 must produce stage 3 with the
    exact strictly-after timestamps; a click BEFORE the first view and
    a purchase arriving before its click must not latch; and the
    multi-batch result equals the single-batch run (time-ordered
    arrival => batch answer)."""
    from time_series_data_trimmer_spark.streaming.stream_ops import stream_funnel

    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = time.time() - 1000
    # user 1: clean view->click->purchase across three batches
    # user 2: click first (never latches without a view), then view;
    #         purchase at the SAME micro as the view (strict > fails)
    _write_events(
        src,
        "f1.parquet",
        [(1, 10, 1, "view", 1.0), (2, 5, 2, "click", 1.0)],
        t0,
    )
    _write_events(
        src,
        "f2.parquet",
        [(3, 20, 1, "click", 1.0), (4, 30, 2, "view", 1.0)],
        t0 + 100,
    )
    _write_events(
        src,
        "f3.parquet",
        [(5, 40, 1, "purchase", 1.0), (6, 30, 2, "purchase", 1.0)],
        t0 + 200,
    )

    multi = {
        r["user_id"]: r.asDict()
        for r in stream_funnel(spark, src, max_files_per_trigger=1).collect()
    }
    single = {
        r["user_id"]: r.asDict()
        for r in stream_funnel(spark, src).collect()
    }
    assert multi == single
    u1 = multi[1]
    assert u1["stage_reached"] == 3
    assert u1["t1_us"] < u1["t2_us"] < u1["t3_us"]
    u2 = multi[2]
    # view latched, but click came before it and purchase isn't
    # strictly after a latched click -> stage 1
    assert u2["stage_reached"] == 1
    assert u2["t2_us"] is None and u2["t3_us"] is None
