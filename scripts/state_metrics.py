#!/usr/bin/env python
"""Streaming state-store metrics for the stream-stream interval join
(VERDICT r5 #6): state keys, state memory, and per-batch latency at
sf0.1 vs the 10× scratch events, RocksDB (default) vs HDFS provider.

The join buffers BOTH sides inside the watermark+window horizon, so its
state is the biggest of any streaming query in the registry — the right
probe for the "128 RocksDB instances fixed cost vs heap-resident state"
claim in BENCH_NOTES.

Usage:
    python scripts/state_metrics.py                 # rocksdb, sf0.1 + 10x
    SPARK_GRAFT_STATE_STORE=hdfs python scripts/state_metrics.py

Prints one JSON line per (provider, dataset) run.
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.session import get_spark
from time_series_data_trimmer_spark.streaming import stream_ops as so

DATASETS = {
    "sf0.1": "/root/testdata/sf0.1/events.parquet",
    "10x": "/tmp/tsdt_scale10/events.parquet",
}


def run_join_with_metrics(spark, path: str) -> dict:
    """stream_stream_interval_join's exact pipeline, but keeping the
    query handle so lastProgress state metrics survive the run."""
    so._streaming_confs(spark)
    clicks = (
        so._events_stream(spark, path)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("event_time").alias("c_time"),
        )
        .withWatermark("c_time", "3 hours")
    )
    purchases = (
        so._events_stream(spark, path)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("event_time").alias("p_time"),
            "value",
        )
        .withWatermark("p_time", "3 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_time") >= F.col("c_time"))
        & (F.col("p_time") <= F.col("c_time") + F.expr("INTERVAL 2 hours")),
        "inner",
    )
    name = f"sm_{uuid.uuid4().hex[:12]}"
    t0 = time.time()
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    prog = q.lastProgress or {}
    batch_ms = (prog.get("durationMs") or {}).get("triggerExecution")
    return {
        "provider": os.environ.get("SPARK_GRAFT_STATE_STORE", "rocksdb"),
        "n_pairs": spark.table(name).count(),
        "wall_sec": round(wall, 2),
        "last_batch_ms": batch_ms,
        "state": so.state_store_metrics(q),
    }


def main() -> None:
    spark = get_spark("state-metrics")
    spark.sparkContext.setLogLevel("ERROR")
    for label, path in DATASETS.items():
        if not os.path.exists(path):
            print(json.dumps({"dataset": label, "err": f"missing {path} — run scripts/scaling_run.py --rebuild"}))
            continue
        row = run_join_with_metrics(spark, path)
        row["dataset"] = label
        print(json.dumps(row))


if __name__ == "__main__":
    main()
