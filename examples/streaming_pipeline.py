#!/usr/bin/env python
"""The streaming family end-to-end on one event source: enrichment
against a broadcast static dimension, watermarked tumbling aggregation
into an append-mode parquet sink, content dedup with state expiry, a
foreachBatch CDC upsert maintaining latest state per key, and the
small-file compaction pass the append sink eventually needs.

Every stage is the production path (file sinks + checkpoints, not
memory sinks); AvailableNow processes the bounded test file and stops,
but pointed at a live directory the same code runs unbounded.

Run: python examples/streaming_pipeline.py [sf_dir]   (default sf0.001)
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from time_series_data_trimmer_spark.session import get_spark
from time_series_data_trimmer_spark.sources.corpus_io import compact_directory
from time_series_data_trimmer_spark.streaming import stream_ops

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("streaming-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    events = os.path.join(SF_DIR, "events.parquet")
    work = tempfile.mkdtemp(prefix="tsdt_stream_demo_")
    try:
        # 1. stream ⋈ broadcast static dimension → per-cohort counts
        enriched = stream_ops.stream_static_enriched_counts(spark, events)
        print("enriched cohorts:", enriched.count())

        # 2. watermarked tumbling agg → append-mode parquet sink
        sink = stream_ops.tumbling_hour_agg_to_files(
            spark, events, f"{work}/hourly", f"{work}/hourly_ckpt"
        )
        n_sink = sink.count()  # capture BEFORE compaction replaces the files
        print("closed hourly windows in sink:", n_sink)

        # 3. streaming dedup (state expires with the watermark)
        deduped = stream_ops.stream_dedup_to_files(
            spark, events, f"{work}/dedup", f"{work}/dedup_ckpt"
        )
        print("distinct (user, content) observations:", deduped.count())

        # 4. CDC upsert: latest state per user in bucketed parquet
        state = stream_ops.stream_upsert_to_keyed_parquet(
            spark, events, f"{work}/state", f"{work}/state_ckpt"
        )
        print("keyed state rows:", state.count())

        # 5. the append sink's layout debt, then the maintenance pass.
        # The hourly query is stopped (one-shot availableNow run), so the
        # sink can be FINALIZED: compaction drops _spark_metadata and the
        # directory becomes batch-read-only from here on.
        b, a = compact_directory(
            spark, f"{work}/hourly", 64 * 1024 * 1024, finalize_streaming_sink=True
        )
        print(f"compaction: {b} files -> {a}")
        # fresh read: re-running the OLD sink frame would scan its
        # stale (pre-compaction) file listing
        assert spark.read.parquet(f"{work}/hourly").count() == n_sink
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
