#!/usr/bin/env python
"""State-store provider matrix for streaming operator classes
(VERDICT r7 #2 — root-cause the stream_stream_click_purchase_join
5.38 -> 8.01 s regression that coincided with the r7 module default
flipping to RocksDB + changelog checkpointing).

Measures TWO operator classes under THREE providers at sf0.1 (and the
10x scratch events when present):

* join  = stream_stream_click_purchase_join — stream-stream interval
  join. FOUR state-store instances per partition (left/right x
  keyToNumValues/keyWithIndexToValue), append-heavy: every buffered row
  is written once and evicted by watermark, nothing is mutated in
  place. Changelog checkpointing uploads one changelog file PER STORE
  INSTANCE per batch, so this class pays 4x the per-batch file count
  for zero delta-vs-snapshot savings.
* agg   = stream_tumbling_hour_agg — windowed counter. ONE store per
  partition, state mutated in place every batch; a full-snapshot
  upload re-ships unchanged windows, which is exactly what changelog
  mode avoids (the measured r7 16 -> 3.2 s win).

Providers: hdfs (JVM-heap baseline) | rocksdb_snapshot |
rocksdb_changelog, selected via SPARK_GRAFT_STATE_STORE (the module's
env override, see stream_ops._streaming_confs).

Timing: min of 2 steady runs after 1 warmup (bench.py methodology).
Prints one JSON line per (op, provider, dataset) plus a summary line.

Usage: python scripts/state_store_matrix.py [--with-10x]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from time_series_data_trimmer_spark.session import get_spark
from time_series_data_trimmer_spark.streaming import stream_ops as so

SF_DIR = "/root/testdata/sf0.1"
TENX = "/tmp/tsdt_scale10"

OPS = {
    "join": lambda spark, sf: so.stream_stream_interval_join(
        spark, os.path.join(sf, "events.parquet")
    ),
    "agg": lambda spark, sf: so.tumbling_hour_agg(
        spark, os.path.join(sf, "events.parquet")
    ),
}

PROVIDERS = ["hdfs", "rocksdb_snapshot", "rocksdb_changelog"]


def steady(fn, runs: int = 2) -> float:
    fn()  # warmup: codegen/analysis
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark("state-matrix")
    spark.sparkContext.setLogLevel("ERROR")
    datasets = {"sf0.1": SF_DIR}
    if "--with-10x" in sys.argv and os.path.isdir(
        os.path.join(TENX, "events.parquet")
    ):
        datasets["10x"] = TENX
    results = []
    for ds_name, ds in datasets.items():
        for op_name, op in OPS.items():
            for prov in PROVIDERS:
                os.environ["SPARK_GRAFT_STATE_STORE"] = prov
                try:
                    sec = steady(lambda: op(spark, ds).count())
                    row = {
                        "op": op_name,
                        "provider": prov,
                        "dataset": ds_name,
                        "sec": sec,
                    }
                except Exception as exc:  # noqa: BLE001
                    row = {
                        "op": op_name,
                        "provider": prov,
                        "dataset": ds_name,
                        "err": f"{type(exc).__name__}: {exc}"[:200],
                    }
                results.append(row)
                print(json.dumps(row), flush=True)
    os.environ.pop("SPARK_GRAFT_STATE_STORE", None)
    print(json.dumps({"matrix": results}))


if __name__ == "__main__":
    main()
