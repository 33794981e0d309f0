#!/usr/bin/env python
"""Invariant-18 extension matrix (VERDICT r8 #4): per streaming
state-op CLASS, measure wall time + state rows/bytes at state-partition
counts {4, 8, 32} on sf0.1 — the data that decides which classes adopt
`_auto_state_partitions` and which stay on session width.

Classes probed (one representative per state shape):
  dedup     dropDuplicatesWithinWatermark (state = distinct keys×digest)
  gs_user   applyInPandasWithState keyed by user_id (~1k groups)
  gs_type   applyInPandasWithState keyed by event_type (5 groups)
  agg       tumbling-window counter (windows × types)

Usage: python scripts/state_partition_matrix.py
Prints one JSON line per (class, partitions) cell.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from time_series_data_trimmer_spark.session import get_spark
from time_series_data_trimmer_spark.streaming import stream_ops as so

PATH = os.environ.get(
    "SPARK_GRAFT_EVENTS", "/root/testdata/sf0.1/events.parquet"
)
PARTS = (4, 8, 32)


def timed(spark, parts: int, fn, *args, **kwargs):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        t0 = time.time()
        out = fn(spark, *args, **kwargs)
        n = out.count()
        dt = time.time() - t0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return round(dt, 2), n


def main() -> None:
    spark = get_spark("state_matrix")
    spark.sparkContext.setLogLevel("ERROR")
    cases = {
        "dedup": lambda s, p=PATH: so.stream_dedup(s, p),
        "gs_user": lambda s, p=PATH: so.running_counts_with_state(s, p),
        "gs_type": lambda s, p=PATH: so.stream_kmv_distinct(s, p),
        "agg": lambda s, p=PATH: so.tumbling_hour_agg(s, p),
    }
    for name, fn in cases.items():
        for parts in PARTS:
            fn(spark, PATH)  # warmup (codegen/provider init)
            d1, n = timed(spark, parts, lambda s: fn(s, PATH))
            d2, _ = timed(spark, parts, lambda s: fn(s, PATH))
            print(
                json.dumps(
                    {
                        "class": name,
                        "partitions": parts,
                        "sec_min2": min(d1, d2),
                        "rows": n,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
