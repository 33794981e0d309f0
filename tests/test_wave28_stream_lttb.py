"""Wave 28: streaming fingerprint == batch fingerprint; LTOB picks."""

import datetime as dt
import os
import sys
import tempfile

from pyspark.sql import Row

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_stream_fingerprint_equals_batch(spark):
    """The streaming state after availableNow ingest equals the batch
    fingerprint row-for-row — the continuous-handoff contract."""
    stream = {
        r["source"]: r
        for r in entry.queries()["stream_content_fingerprint"](
            spark, SF
        ).collect()
    }
    batch = {
        r["source"]: r
        for r in entry.queries()["dq_content_fingerprint"](spark, SF).collect()
    }
    assert set(stream) == set(batch)
    for src, b in batch.items():
        s = stream[src]
        assert s["n_rows"] == b["n_rows"]
        assert s["content_sum_mod"] == b["content_sum_mod"]
        assert s["content_min"] == b["content_min"]
        assert s["content_max"] == b["content_max"]


def test_lttb_one_point_per_bucket(spark):
    rows = entry.queries()["ts_lttb_downsample"](spark, SF).collect()
    seen = set()
    for r in rows:
        key = (r["user_id"], r["bucket"])
        assert key not in seen  # exactly one pick per bucket
        seen.add(key)
        assert r["bucket"] == r["t_us"] // 3_600_000_000
        assert r["n_in_bucket"] >= 1


def test_lttb_picks_salient_point(spark):
    """Three hour-buckets; the middle bucket holds a flat line plus one
    spike — LTOB must keep the spike, not the flat points."""
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def ev(minute, v):
        nonlocal eid
        eid += 1
        rows.append(Row(event_id=eid, ts=t0 + dt.timedelta(minutes=minute),
                        user_id=1, event_type="view", value=float(v)))

    for m in (0, 30):          # bucket 0 (edge -> earliest kept)
        ev(m, 10.0)
    for m, v in ((70, 10.0), (80, 99.0), (90, 10.0)):  # bucket 1: spike at 80
        ev(m, v)
    for m in (130, 150):       # bucket 2 (edge)
        ev(m, 10.0)
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.mode("overwrite").parquet(
            os.path.join(d, "events.parquet")
        )
        out = {r["bucket"] - rows[0].ts.year * 0: r
               for r in entry.queries()["ts_lttb_downsample"](spark, d).collect()}
    buckets = sorted(out)
    assert len(buckets) == 3
    mid = out[buckets[1]]
    assert mid["value"] == 99.0  # the spike survives downsampling
    # edge buckets keep their EARLIEST point (endpoint preservation)
    first, last = out[buckets[0]], out[buckets[2]]
    assert first["t_us"] == int(t0.timestamp() * 1_000_000)
    assert last["t_us"] == int(
        (t0 + dt.timedelta(minutes=130)).timestamp() * 1_000_000
    )
