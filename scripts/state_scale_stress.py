#!/usr/bin/env python
"""K× state-growth stress for the stateful streaming family (VERDICT
r11 #5): the salted-replica projection that adversarially tested the
dedup stack (SCALING.md r11), applied to streaming STATE — the one
100 TB claim that was still argued from design.

Replicas salt the STATE KEYS — user_id/event_id offsets for the
session and dedup ops, an `event_type || '_repK'` suffix for the
GroupState CUSUM op — while keeping event_time untouched, so the
watermark horizon is constant and distinct state keys scale exactly
×K. The question each row answers: do state rows, state bytes, and
per-batch latency track K linearly (the RocksDB-backed design claim),
or is there a cliff?

Usage:  python scripts/state_scale_stress.py [K ...]   # default 1 4 8
Prints one JSON line per (K, op): state rows / bytes from the query's
own stateOperators progress, wall seconds, trigger-execution ms.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from time_series_data_trimmer_spark.session import get_spark  # noqa: E402
from time_series_data_trimmer_spark.streaming import stream_ops as so  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/tmp/tsdt_state_scale"
KS = [int(k) for k in sys.argv[1:]] or [1, 4, 8]


def build_replica(spark, k: int) -> str:
    """K salted copies of events: key columns offset per replica (state
    keys scale ×K), event_time unchanged (watermark horizon constant)."""
    out = os.path.join(SCRATCH, f"k{k}", "events.parquet")
    if os.path.exists(out):
        return out
    base = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    reps = []
    off = 10_000_000
    for i in range(k):
        reps.append(
            base.select(
                (F.col("event_id") + F.lit(i * off)).alias("event_id"),
                (F.col("user_id") + F.lit(i * off)).alias("user_id"),
                "ts",
                F.concat(F.col("event_type"), F.lit(f"_r{i}")).alias(
                    "event_type"
                ),
                "value",
            )
        )
    df = reps[0]
    for r in reps[1:]:
        df = df.unionByName(r)
    df.coalesce(max(1, k)).write.mode("overwrite").parquet(out)
    return out


def run_with_handle(plan, mode: str, partitions: int) -> dict:
    spark = plan.sparkSession
    so._streaming_confs(spark)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    name = f"ss_{uuid.uuid4().hex[:12]}"
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
        t0 = time.time()
        q = (
            plan.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.time() - t0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    prog = q.lastProgress or {}
    batch_ms = (prog.get("durationMs") or {}).get("triggerExecution")
    st = so.state_store_metrics(q)
    spark.catalog.dropTempView(name)
    return {
        "wall_sec": round(wall, 2),
        "batch_ms": batch_ms,
        "state_rows": sum(s.get("state_rows") or 0 for s in st),
        "state_bytes": sum(s.get("memory_used_bytes") or 0 for s in st),
        "partitions": partitions,
    }


def session_plan(spark, path: str):
    stream = so._events_stream(spark, path)
    return (
        stream.withWatermark("event_time", "1 hour")
        .groupBy(
            F.session_window("event_time", "30 minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    ), "complete"


def dedup_plan(spark, path: str):
    return so._dedup_plan(spark, path), "append"


def cusum_plan(spark, path: str):
    return so._cusum_plan(spark, path), "update"


OPS = {
    "session_window_agg": session_plan,
    "dedup_within_watermark": dedup_plan,
    "cusum_groupstate": cusum_plan,
}


def main() -> None:
    spark = get_spark("state-scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    for k in KS:
        path = build_replica(spark, k)
        n_rows = spark.read.parquet(path).count()
        parts = so._auto_state_partitions(spark, n_rows)
        for op, builder in OPS.items():
            plan, mode = builder(spark, path)
            row = run_with_handle(plan, mode, parts)
            row.update({"k": k, "op": op, "input_rows": n_rows})
            print(json.dumps(row))
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
