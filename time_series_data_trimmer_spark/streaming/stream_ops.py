"""Structured Streaming operators (SURVEY §2.10, §7.3-M6).

The reference has no streaming (README.md:358 lists incremental loading
as future roadmap); its seasonal fold (plot2d.py:497-501) is a batch
tumbling-window assignment. These operators are the streaming
generalization the north-star asks for: file-source streams with
watermarks, tumbling/sliding window aggregations, and a stateful
spike-suggestion variant.

All builders run with ``Trigger.AvailableNow`` + memory sink when used
from the batch query registry, so their FINAL state is comparable to a
batch SQL oracle; pointed at a live directory with a real sink they run
unbounded, unchanged.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from time_series_data_trimmer_spark.functions.rounding import rd
from time_series_data_trimmer_spark.sources.events import event_time


def _events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events parquet (either ts layout →
    proper event-time timestamp column; see sources/events.py).

    ``max_files_per_trigger`` bounds each micro-batch to N source files
    (oldest modification time first) — production backpressure control,
    and the lever the late-data tests use to force a deterministic
    batch-per-file schedule so watermark advancement between batches is
    observable."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    if os.path.isdir(path):
        # a parquet DIRECTORY (the normal layout) streams directly
        stream = reader.parquet(path)
    else:
        # a single parquet FILE: the file-source needs a directory, so
        # stream the containing dir with a glob filter for the one file
        base, fname = os.path.split(path)
        stream = reader.option("pathGlobFilter", fname).parquet(base)
    return stream.withColumn("event_time", event_time(stream))


#: default state-store backend for every streaming query in this module.
#: The HDFS-backed provider keeps ALL state keys as JVM heap objects —
#: at a 100 TB keyspace (streaming dedup state is one digest per
#: distinct key in the watermark horizon) that is an executor OOM, not a
#: tuning problem. RocksDB keeps state off-heap with incremental
#: checkpointing; Spark ships the JNI bundle, so this is conf-only.
#: Override (e.g. to A/B the providers) with
#: SPARK_GRAFT_STATE_STORE=hdfs.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


HDFS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)


def _streaming_confs(spark: SparkSession, state_class: str = "agg") -> None:
    """Apply the module's streaming state-store defaults to the session.
    Called at every query-start point so ad-hoc sessions get the same
    backend. Default for EVERY operator class: RocksDB + changelog
    checkpointing, confirmed per class by the r8 provider matrix
    (scripts/state_store_matrix.py, sf0.1, min-of-2 steady):

    * agg class (tumbling counter): hdfs 1.89 / rocksdb_snapshot 2.06 /
      rocksdb_changelog 1.74 s — and r7's snapshot-dominated GroupState
      case measured 16 -> 3.2 s, per-batch cost scaling with state
      CHANGED, not state SIZE.
    * join class (stream-stream interval join, the r7 regression
      suspect): hdfs 9.52 / rocksdb_snapshot 8.52 / rocksdb_changelog
      7.33 s — changelog wins HERE TOO, which ACQUITS the r7 provider
      flip: the real cost driver was the state-PARTITION count (four
      store instances per partition x session shuffle width; see
      `_auto_state_partitions`), not the provider.

    ``state_class`` is kept so large-state operator classes can pick
    class-specific knobs later without re-threading call sites.

    Env override for A/B: ``SPARK_GRAFT_STATE_STORE`` in
    ``hdfs`` | ``rocksdb_snapshot`` | ``rocksdb_changelog`` (empty =
    the changelog default).
    """
    del state_class  # classes currently share the measured-best default
    mode = os.environ.get("SPARK_GRAFT_STATE_STORE", "").lower()
    if mode in ("", "rocksdb"):
        mode = "rocksdb_changelog"
    if mode == "hdfs":
        # JVM-heap provider: all state keys live as heap objects. Kept
        # only as an A/B arm — at a 100 TB keyspace this is an executor
        # OOM, not a tuning problem.
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", HDFS_PROVIDER
        )
        return
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true" if mode == "rocksdb_changelog" else "false",
    )


def state_store_metrics(query) -> list[dict]:
    """Per-stateful-operator state metrics of a finished/running query
    (from ``lastProgress``): operator name, state rows, memory bytes —
    the numbers capacity planning needs (state growth per watermark
    horizon, bytes per key)."""
    p = query.lastProgress
    if not p:
        return []
    return [
        {
            "operator": op.get("operatorName"),
            "state_rows": op.get("numRowsTotal"),
            "memory_used_bytes": op.get("memoryUsedBytes"),
            "rows_updated": op.get("numRowsUpdated"),
        }
        for op in p.get("stateOperators", [])
    ]


def _auto_state_partitions(
    spark: SparkSession, n_rows: int, target_rows: int = 25_000
) -> int:
    """Data-derived state-partition count for LARGE-state streaming ops
    (the stream-stream join class). The number of state-store instances
    is partitions x stores-per-operator (a stream-stream join runs FOUR
    stores per partition), and each instance pays a fixed open/commit/
    upload cost EVERY micro-batch — measured r8 at sf0.1 (100k events,
    RocksDB+changelog): 32 partitions = 7.66 s, 8 = 2.86 s, 4 = 2.50 s,
    pure per-instance overhead, state volume unchanged. So partitions
    must scale with STATE SIZE, not inherit the session shuffle width:
    ceil(buffered_rows / target_rows), floor 4, capped at the session's
    shuffle partitions (= cluster width on a real deployment — at 100 TB
    the cap binds and you get full parallelism; at test scale the floor
    binds and you stop paying 128 idle store commits per batch). Same
    adaptive-parameter discipline as `_knn_bits` / `bucket_us="auto"`.
    """
    cap = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return max(4, min(cap, -(-int(n_rows) // int(target_rows))))


def _derived_state_partitions(spark: SparkSession, path: str) -> int:
    """Invariant 18 at EVERY stateful start point (r9, VERDICT r8 #4):
    the source's parquet-footer row count (a free metadata read, and an
    upper bound on state keys for every op class — dedup holds ≤1 row
    per input row, GroupState ≤1 per group, window aggs ≤1 per open
    (window, key)) fed through `_auto_state_partitions`. Measured r9
    matrix (scripts/state_partition_matrix.py, sf0.1, min-of-2):
    session width 32 is the WORST cell for every class — dedup
    2.26→1.47 s at 8, GroupState-by-type 1.73→1.27 s, window agg
    1.68→1.26 s — same fixed per-instance store cost the r8 join fix
    measured; at 100 TB the session-width cap binds and full
    parallelism returns. `stream_state_partition_report` exposes the
    same derivation as an oracle-backed capacity-planning query."""
    return _auto_state_partitions(spark, spark.read.parquet(path).count())


def _run_to_memory(
    windowed: DataFrame,
    mode: str = "complete",
    state_class: str = "agg",
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Execute a streaming aggregation to a memory sink with
    AvailableNow (process everything currently in the source, then
    stop) and return the materialized result table.

    ``shuffle_partitions`` (from `_auto_state_partitions`) pins the
    query's state-partition count; the session conf is restored after
    the run so co-resident batch queries keep the session width."""
    spark = windowed.sparkSession
    _streaming_confs(spark, state_class=state_class)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    name = f"st_{uuid.uuid4().hex[:12]}"
    try:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        q = (
            windowed.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def _run_to_files(
    out: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Execute a streaming aggregation to a PARQUET sink in APPEND mode
    with AvailableNow — the production path. Append emits each window
    exactly once, when the watermark closes it, so sink size is
    O(closed windows per trigger), never O(total state): unlike the
    complete-mode memory sink (which collects the entire aggregate state
    into driver memory and is kept only as the oracle harness), this
    scales to unbounded streams. Windows still open at end-of-stream
    (inside the watermark delay of max event time) remain in state and
    are emitted by the next run off the same checkpoint.

    Returns a batch DataFrame over the sink with the plan's own schema
    pinned on the read: a short stream can end with NO window closed
    past the watermark, leaving the sink directory without data files —
    schema inference would fail there, while the pinned schema yields an
    empty DataFrame with the right shape."""
    spark = out.sparkSession
    _streaming_confs(spark)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        if shuffle_partitions is not None:
            # first run only: a checkpoint restart keeps its original
            # state-partition count (Spark pins it at query creation)
            spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        q = (
            out.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.schema(out.schema).parquet(out_dir)


def _tumbling_hour_windowed(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Shared streaming plan: per-user tumbling 1-hour aggregation with
    a 1-hour watermark — count + order-independent decimal sum."""
    stream = _events_stream(spark, path, max_files_per_trigger)
    windowed = (
        stream.withWatermark("event_time", "1 hour")
        .groupBy(F.col("user_id"), F.window("event_time", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(rd(F.col("value"), 2).cast("decimal(38,6)")).alias("sum_dec"),
        )
    )
    return windowed.select(
        "user_id",
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n_events",
        F.col("sum_dec").cast("double").alias("sum_value"),
    )


def tumbling_hour_agg(spark: SparkSession, path: str) -> DataFrame:
    """Oracle-harness form: complete-mode memory sink, so the FINAL
    state (every window) is comparable to the batch SQL oracle. The
    production form is `tumbling_hour_agg_to_files`."""
    out = _run_to_memory(
        _tumbling_hour_windowed(spark, path),
        mode="complete",
        shuffle_partitions=_derived_state_partitions(spark, path),
    )
    return out.select("user_id", "window_start", "n_events", "sum_value")


def tumbling_hour_agg_to_files(
    spark: SparkSession,
    path: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Production form: append-mode parquet sink (exactly-once via the
    checkpoint; only watermark-closed windows are written). Returns a
    batch DataFrame over the sink directory (schema pinned, so an
    empty sink reads as an empty frame rather than failing inference)."""
    return _run_to_files(
        _tumbling_hour_windowed(spark, path, max_files_per_trigger),
        out_dir,
        checkpoint_dir,
        shuffle_partitions=_derived_state_partitions(spark, path),
    )


def session_agg_to_files(
    spark: SparkSession, path: str, out_dir: str, checkpoint_dir: str, gap: str = "30 minutes"
) -> DataFrame:
    """Append-mode production form of `session_agg` (closed session
    windows only)."""
    stream = _events_stream(spark, path)
    windowed = (
        stream.withWatermark("event_time", "1 hour")
        .groupBy(F.session_window("event_time", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    return _run_to_files(
        windowed,
        out_dir,
        checkpoint_dir,
        shuffle_partitions=_derived_state_partitions(spark, path),
    )


def sliding_mean(spark: SparkSession, path: str, window: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Sliding-window mean of ``value`` per user — the streaming analog
    of the centered moving average (F1)."""
    stream = _events_stream(spark, path)
    windowed = (
        stream.withWatermark("event_time", "2 hours")
        .groupBy(F.col("user_id"), F.window("event_time", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(rd(F.col("value"), 2).cast("decimal(38,6)")).alias("sum_dec"),
        )
    )
    out = _run_to_memory(
        windowed,
        mode="complete",
        shuffle_partitions=_derived_state_partitions(spark, path),
    )
    return out.select(
        "user_id",
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        (F.col("sum_dec").cast("double") / F.col("n")).alias("mean_value"),
        F.col("n").alias("n_events"),
    )


def streaming_spike_counts(spark: SparkSession, path: str, threshold: float = 400.0) -> DataFrame:
    """Stateful per-user spike counter via fixed threshold (streaming
    cannot see the global mean+3σ without two passes; production would
    broadcast a precomputed per-user threshold — this operator takes it
    as a parameter)."""
    stream = _events_stream(spark, path)
    spikes = stream.filter(F.col("value") > threshold)
    windowed = (
        spikes.withWatermark("event_time", "1 hour")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_spikes"))
    )
    return _run_to_memory(
        windowed,
        mode="complete",
        shuffle_partitions=_derived_state_partitions(spark, path),
    )


def session_agg(spark: SparkSession, path: str, gap: str = "30 minutes") -> DataFrame:
    """Streaming session windows: ``session_window`` merges events whose
    gaps stay under ``gap`` into one stateful window per user — the
    incremental twin of aggregates.sessionize."""
    stream = _events_stream(spark, path)
    windowed = (
        stream.withWatermark("event_time", "1 hour")
        .groupBy(F.session_window("event_time", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _run_to_memory(
        windowed,
        mode="complete",
        shuffle_partitions=_derived_state_partitions(spark, path),
    )
    return out.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
    )


def _dedup_plan(
    spark: SparkSession,
    path: str,
    keys: tuple[str, ...] = ("user_id",),
    watermark: str = "45 days",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Shared streaming-dedup plan: content digest + watermarked
    ``dropDuplicatesWithinWatermark`` — exactly-once emission of each
    distinct (key, content) observation.

    The digest is md5 over the content columns with the float channel
    quantized to an integer (floor(value·100 + 0.5) — cents), never a
    raw double→string cast: engines disagree on float formatting, and
    the batch oracle must reproduce the digest bit-for-bit. NULL inputs
    coalesce to a '<null>' sentinel BEFORE hashing — a bare concat
    null-propagates, which would silently collapse every null-bearing
    observation per key into one regardless of the other column's
    value (r3 advice).

    State holds one digest per distinct key seen within the watermark
    delay; the watermark purges entries older than the delay, so state
    is O(distinct keys per delay window), not O(stream length). The
    default delay is chosen to cover the bounded test corpus (~30 days
    of events) so the final result equals batch DISTINCT exactly; a
    production deployment picks the delay that matches its duplicate
    horizon (how stale a replayed record can be).
    """
    stream = _events_stream(spark, path, max_files_per_trigger)
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    digest = F.md5(
        F.concat(
            F.coalesce(F.col("event_type"), F.lit("<null>")),
            F.lit("|"),
            F.coalesce(cents.cast("string"), F.lit("<null>")),
        )
    )
    keyed = stream.withColumn("content_key", digest).withWatermark(
        "event_time", watermark
    )
    deduped = keyed.dropDuplicatesWithinWatermark([*keys, "content_key"])
    return deduped.select(*keys, "content_key")


def stream_dedup(
    spark: SparkSession,
    path: str,
    keys: tuple[str, ...] = ("user_id",),
    watermark: str = "45 days",
) -> DataFrame:
    """Oracle-harness form: append-mode memory sink; the emitted rows
    are one per distinct (keys, content_key) — comparable to batch
    SELECT DISTINCT. Production form: `stream_dedup_to_files`."""
    return _run_to_memory(
        _dedup_plan(spark, path, keys, watermark),
        mode="append",
        shuffle_partitions=_derived_state_partitions(spark, path),
    )


def stream_dedup_to_files(
    spark: SparkSession,
    path: str,
    out_dir: str,
    checkpoint_dir: str,
    keys: tuple[str, ...] = ("user_id",),
    watermark: str = "45 days",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Production form: append-mode parquet sink with checkpoint —
    exactly-once deduped records, restartable from the checkpoint
    (a second run over the same source emits nothing new)."""
    return _run_to_files(
        _dedup_plan(spark, path, keys, watermark, max_files_per_trigger),
        out_dir,
        checkpoint_dir,
        shuffle_partitions=_derived_state_partitions(spark, path),
    )


def running_counts_with_state(spark: SparkSession, path: str, threshold: float = 250.0) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running totals (events seen, spikes over threshold) maintained in
    GroupState across triggers — the pattern for operators that native
    window aggs can't express (e.g. order-dependent state machines)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType, StructField, StructType,
    )
    import pandas as pd

    stream = _events_stream(spark, path)
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("n_spikes", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("n_events", LongType()), StructField("n_spikes", LongType())]
    )

    def update(key, pdfs, state: GroupState):
        n_events, n_spikes = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n_events += len(pdf)
            n_spikes += int((pdf["value"] > threshold).sum())
        state.update((n_events, n_spikes))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n_events], "n_spikes": [n_spikes]}
        )

    result = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(
        result,
        mode="update",
        shuffle_partitions=_derived_state_partitions(spark, path),
    )


def stream_kmv_distinct(
    spark: SparkSession,
    path: str,
    group_col: str = "event_type",
    key_col: str = "user_id",
    k: int = 64,
    seed: str = "tsdt|kmv",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming KMV distinct-count sketch: per-group bottom-k md5
    registers maintained in GroupState across micro-batches, final
    estimate BIT-EQUAL to the batch `sketches.kmv_distinct` over the
    same data — the sketch family's streaming face.

    Why this is micro-batch-schedule-proof (and therefore exactly
    oracle-checkable even though the file-source's batch boundaries
    are an implementation detail): the state update is
    ``bottom_k(state ∪ batch_hashes)`` and every per-batch emission is
    the current register list; bottom-k is CLOSED under union
    (bottom-k(A ∪ B) is a function of bottom-k(A) ∪ bottom-k(B)), so
    re-merging ALL emissions — stale ones included — still yields
    exactly bottom-k(everything). The post-pass is therefore the
    ordinary `kmv_merge`-shaped re-rank + `kmv_estimate`, and no
    emission ordering or batch count can change the answer.

    State per group is ≤ k longs (the RocksDB story from
    `stream_dedup` applies unchanged); hashes are computed scan-side
    before the grouped-map, so raw keys never enter Python."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType, LongType, StringType, StructField, StructType,
    )
    import pandas as pd

    from time_series_data_trimmer_spark.operators.sampling import hash_u32
    from time_series_data_trimmer_spark.operators import sketches as sk

    stream = _events_stream(spark, path, max_files_per_trigger)
    hashed = stream.select(
        F.col(group_col).cast("string").alias("g"),
        hash_u32(F.col(key_col), seed).alias("u"),
    )
    out_schema = StructType(
        [StructField("g", StringType()), StructField("u", LongType())]
    )
    state_schema = StructType([StructField("us", ArrayType(LongType()))])

    def update(key, pdfs, state: GroupState):
        regs = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            regs.update(int(u) for u in pdf["u"])
        kept = sorted(regs)[: int(k)]
        state.update((kept,))
        yield pd.DataFrame({"g": [key[0]] * len(kept), "u": kept})

    emitted = hashed.groupBy("g").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    emissions = _run_to_memory(
        emitted,
        mode="update",
        shuffle_partitions=_derived_state_partitions(spark, path),
    )
    # merge ALL emissions (union → dedup → re-rank to bottom-k) and
    # estimate — correct regardless of which emission was "final"
    regs = emissions.distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy(F.col("u").asc())
    merged = (
        regs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
        .select("g", "u")
    )
    return sk.kmv_estimate(merged, k=k, group_col=group_col)


def stream_quantile_sketch(
    spark: SparkSession,
    path: str,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    qs: tuple[float, ...] = (0.5, 0.9),
    k: int = 32,
    seed: str = "tsdt|qsk",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming QUANTILES from the bottom-k row-sample sketch held in
    GroupState — latency/size percentile monitoring over an unbounded
    stream with ≤ k (hash, value) pairs of state per group, final
    estimates BIT-EQUAL to the batch sketch.

    Same correctness argument as `stream_kmv_distinct`: the state
    update is bottom-k(state ∪ batch), every emission is the current
    register list, and bottom-k is closed under union, so re-merging
    ALL emissions yields exactly bottom-k(everything) no matter how
    the file source batched the data. The post-pass is the batch
    `quantile_sketch_estimate` on the re-merged registers."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StringType, StructField, StructType,
    )
    import pandas as pd

    from time_series_data_trimmer_spark.operators.sampling import hash_u32
    from time_series_data_trimmer_spark.operators import sketches as sk

    stream = _events_stream(spark, path, max_files_per_trigger)
    hashed = stream.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).cast("string").alias("g"),
        hash_u32(F.col(id_col), seed).alias("u"),
        F.col(value_col).cast("double").alias("v"),
    )
    out_schema = StructType(
        [
            StructField("g", StringType()),
            StructField("u", LongType()),
            StructField("v", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("us", ArrayType(LongType())),
            StructField("vs", ArrayType(DoubleType())),
        ]
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            us, vs = state.get
            regs = set(zip((int(u) for u in us), (float(v) for v in vs)))
        else:
            regs = set()
        for pdf in pdfs:
            regs.update(zip((int(u) for u in pdf["u"]), (float(v) for v in pdf["v"])))
        kept = sorted(regs)[: int(k)]  # (u, v) lexicographic == the batch window order
        state.update(([u for u, _ in kept], [v for _, v in kept]))
        yield pd.DataFrame(
            {"g": [key[0]] * len(kept), "u": [u for u, _ in kept], "v": [v for _, v in kept]}
        )

    emitted = hashed.groupBy("g").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    emissions = _run_to_memory(
        emitted,
        mode="update",
        shuffle_partitions=_derived_state_partitions(spark, path),
    ).distinct()
    merged = sk.quantile_sketch_merge(emissions, emissions.limit(0), k=k)
    return sk.quantile_sketch_estimate(merged, list(qs), group_col=group_col)


def stream_static_enriched_counts(
    spark: SparkSession, path: str, n_cohorts: int = 10
) -> DataFrame:
    """Stream-static enrichment join: the event stream joins a STATIC
    dimension (computed once per query start, broadcast to every
    micro-batch) and aggregates per enriched key — the
    "events ⋈ user-profile" production shape. The static side here is
    a derived cohort table (user_id % n); in production it is any
    batch DataFrame — Spark replans the join per trigger, so a
    broadcast-able dim stays broadcast.

    Stream-static joins need no watermark on the static side and the
    stream side needs none for an inner equi-join; the aggregate runs
    in complete mode for the oracle harness (final state == batch
    join + groupBy).
    """
    stream = _events_stream(spark, path)
    static_dim = (
        spark.read.parquet(path)
        .select("user_id")
        .distinct()
        .withColumn(
            # sign-following % (not pmod): the DuckDB oracle's user_id %
            # n is sign-following, and the two must agree if a data
            # round ever ships negative ids
            "cohort", (F.col("user_id") % F.lit(n_cohorts)).cast("long")
        )
    )
    joined = stream.join(F.broadcast(static_dim), "user_id")
    agg = joined.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(rd(F.col("value"), 2).cast("decimal(38,6)")).alias("sum_dec"),
    )
    out = _run_to_memory(
        agg,
        mode="complete",
        shuffle_partitions=_derived_state_partitions(spark, path),
    )
    return out.select(
        "cohort", "n_events", F.col("sum_dec").cast("double").alias("sum_value")
    )


def stream_stream_interval_join(
    spark: SparkSession,
    path: str,
    window: str = "2 hours",
    watermark: str = "3 hours",
    max_files_per_trigger: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Watermarked STREAM-STREAM inner interval join: each click joins
    the same user's purchases inside ``[click, click + window]`` — the
    attribution-join production shape (two live streams, neither
    broadcast-able, correlated by key + event-time proximity).

    Both sides carry a watermark and the join condition carries the
    event-time interval, which is what lets Spark BOUND the join state:
    a buffered click can only ever match purchases up to
    ``click + window``, so once the purchase-side watermark passes that
    horizon the click's state row is dropped (and symmetrically for
    buffered purchases). State is O(events per watermark+window
    horizon), never O(stream length). Inner stream-stream joins emit in
    APPEND mode only — each matched pair exactly once — which is also
    why the memory-sink harness compares finals against the batch
    interval join directly.

    State-partition count is DATA-DERIVED (`_auto_state_partitions`
    over the source's parquet-footer row count — an upper bound on
    buffered rows): the join runs four state-store instances per
    partition, so inheriting the session shuffle width pays
    4 x width fixed store costs per micro-batch regardless of state
    volume. Measured r8 (sf0.1, SCALING.md §r8 state-partition table):
    7.66 s at width 32 -> 2.50 s at the derived 4.
    """
    _streaming_confs(spark, state_class="join")
    n_rows = spark.read.parquet(path).count()  # footer metadata count
    state_parts = _auto_state_partitions(spark, n_rows)
    clicks = (
        _events_stream(spark, path, max_files_per_trigger)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("event_time").alias("c_time"),
        )
        .withWatermark("c_time", watermark)
    )
    purchases = (
        _events_stream(spark, path, max_files_per_trigger)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("event_time").alias("p_time"),
            "value",
        )
        .withWatermark("p_time", watermark)
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_time") >= F.col("c_time"))
        & (F.col("p_time") <= F.col("c_time") + F.expr(f"INTERVAL {window}")),
        how,
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.unix_micros(F.col("p_time")) - F.unix_micros(F.col("c_time"))).alias(
            "gap_us"
        ),
        rd(F.col("value"), 2).alias("purchase_value"),
    )
    return _run_to_memory(
        joined, mode="append", state_class="join",
        shuffle_partitions=state_parts,
    )


def stream_upsert_to_keyed_parquet(
    spark: SparkSession,
    path: str,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    n_buckets: int = 16,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming UPSERT (CDC apply) into plain parquet — latest state
    per key maintained across micro-batches, no table format required.

    Each micro-batch runs a MERGE via ``foreachBatch``:

    1. the batch's keys map to hash buckets (``pmod(xxhash64(key), n)``
       — the table is hive-partitioned by bucket so a batch touching k
       buckets rewrites only those directories);
    2. existing rows of the AFFECTED buckets are read back, unioned
       with the batch, and reduced to latest-per-key (greatest
       (event_time, event_id) — a total order, so ties are impossible);
    3. dynamic partition overwrite rewrites exactly the affected
       buckets.

    Restart/replay safety: foreachBatch side effects are AT-LEAST-once,
    but the merge is IDEMPOTENT (latest-per-key over a total order), so
    replaying a batch converges to the same table — the standard
    recipe for exactly-once-effective sinks without ACID tables. At
    100 TB, bucket count scales so a bucket rewrite stays modest;
    hot-key batches touch few buckets.

    Returns the final keyed table (one row per key seen).
    """
    stream = _events_stream(spark, path, max_files_per_trigger)
    bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
    keyed = stream.withColumn("__bucket", bucket)
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window as W

        b = batch_df.select(
            key_col, "__bucket", "event_time", "event_id", "value"
        )
        if b.isEmpty():
            return
        sess = b.sparkSession
        sess.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        affected = [r["__bucket"] for r in b.select("__bucket").distinct().collect()]
        merged = b
        if os.path.exists(out_dir):
            existing = sess.read.parquet(out_dir).filter(
                F.col("__bucket").isin(affected)
            )
            merged = b.unionByName(existing)
        w = W.partitionBy(key_col).orderBy(
            F.col("event_time").desc(), F.col("event_id").desc()
        )
        latest = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        (
            latest.write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(out_dir)
        )

    _streaming_confs(spark)
    q = (
        keyed.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        # restore even when a micro-batch throws: leaking dynamic mode
        # session-wide silently turns later full-table overwrites into
        # partial partition overwrites
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    if not os.path.exists(out_dir):
        return spark.createDataFrame([], "user_id long")
    return spark.read.parquet(out_dir).drop("__bucket")


def stream_funnel(
    spark: SparkSession,
    path: str,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming ordered-funnel state machine via
    applyInPandasWithState: per user, track the earliest time each
    funnel stage was reached STRICTLY after the previous stage — the
    real-time twin of the batch `funnel_view_click_purchase` query.

    State per user is ``len(stages)`` nullable longs (stage timestamps
    in micros) — constant, RocksDB-friendly. Each micro-batch's rows
    are processed in (t_us, event_id) order against the carried state,
    so with event-time-ordered arrival (the file source's normal
    append layout) the final emission per user is EXACTLY the batch
    answer, and the oracle can check it. Late/out-of-order arrivals
    degrade exactly like the batch query would if it ran before the
    late rows landed: a stage already latched never un-latches
    (timestamps only matter through the strict-after chain).

    Emission is the user's current (stage_reached, t₁..tₙ) each
    trigger, update mode; the post-pass keeps the max-stage emission
    per user (monotone, so schedule-independent for ordered arrival).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType
    import pandas as pd

    n_stages = len(stages)
    stage_of = {s: i for i, s in enumerate(stages)}
    stream = _events_stream(spark, path, max_files_per_trigger)
    ev = stream.select(
        F.col("user_id"),
        F.col("event_type"),
        F.col("event_id"),
        F.unix_micros(F.col("event_time")).alias("t_us"),
    ).filter(F.col("event_type").isin(*stages))

    fields = [StructField(f"t{i + 1}_us", LongType()) for i in range(n_stages)]
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("stage_reached", IntegerType()),
            *fields,
        ]
    )
    state_schema = StructType(fields)

    def update(key, pdfs, state: GroupState):
        ts = list(state.get) if state.exists else [None] * n_stages
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["t_us", "event_id"])
        for typ, t in zip(rows["event_type"], rows["t_us"]):
            i = stage_of[typ]
            t = int(t)
            if ts[i] is not None:
                continue
            if i == 0 or (ts[i - 1] is not None and t > ts[i - 1]):
                ts[i] = t
        state.update(tuple(ts))
        reached = sum(1 for t in ts if t is not None)
        out = {"user_id": [key[0]], "stage_reached": [reached]}
        for i in range(n_stages):
            out[f"t{i + 1}_us"] = [ts[i]]
        yield pd.DataFrame(out)

    emitted = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    emissions = _run_to_memory(
        emitted,
        mode="update",
        shuffle_partitions=_derived_state_partitions(spark, path),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("stage_reached").desc(),
        *[F.col(f.name).asc_nulls_last() for f in fields],
    )
    return (
        emissions.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def stream_dq_violations(
    spark: SparkSession,
    path: str,
    rules=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming face of the wave-8 data-quality gate
    (`operators/quality.py`): the declarative RowRule suite compiled
    into ONE stateless tumbling-1-hour aggregation — per window, each
    rule's (checked, violated) counters ride the same map-side-combined
    agg, then unpivot to (window_start, rule, ...) rows via an explode
    over the bounded per-window result. This is the continuous
    ingest-quality monitor: violation rates per rule per hour as data
    lands, with watermark semantics identical to the other tumbling
    queries (state is one row of counters per open window — bytes, not
    data).

    Batch==stream: the aggregation is a pure per-window fold, so the
    complete-mode final state equals the batch GROUP BY — same exact
    DuckDB oracle as every streaming query here."""
    from time_series_data_trimmer_spark.operators import quality as dq

    if rules is None:
        rules = [
            dq.not_null("value"),
            dq.in_range("value", 0.0, 300.0),
            dq.in_set("event_type", ["view", "click", "purchase", "signup"]),
        ]
    stream = _events_stream(spark, path, max_files_per_trigger)
    aggs = []
    for i, r in enumerate(rules):
        aggs.append(F.sum(r.checked.cast("long")).alias(f"__c{i}"))
        aggs.append(F.sum(r.violated.cast("long")).alias(f"__v{i}"))
    windowed = (
        stream.withWatermark("event_time", "1 hour")
        .groupBy(F.window("event_time", "1 hour").alias("w"))
        .agg(*aggs)
    )
    out = _run_to_memory(
        windowed,
        mode="complete",
        shuffle_partitions=_derived_state_partitions(spark, path),
    )
    rows = out.select(
        F.col("w.start").alias("window_start"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r.name).alias("rule"),
                    F.col(f"__c{i}").alias("n_checked"),
                    F.col(f"__v{i}").alias("n_violations"),
                )
                for i, r in enumerate(rules)
            ])
        ).alias("s"),
    )
    rate = F.when(
        F.col("s.n_checked") > 0,
        F.col("s.n_violations").cast("double") / F.col("s.n_checked").cast("double"),
    ).otherwise(F.lit(0.0))
    return rows.select(
        "window_start",
        F.col("s.rule").alias("rule"),
        F.col("s.n_checked").cast("long").alias("n_checked"),
        F.col("s.n_violations").cast("long").alias("n_violations"),
        rd(rate, 6).alias("violation_rate"),
    )


def stream_content_fingerprint(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of the batch reconciliation fingerprint
    (`dq_content_fingerprint`): as document files arrive, maintain per
    source a running count and the order-insensitive md5-row-hash
    decimal SUM — commutative-associative state, so the running
    fingerprint after ingesting everything equals the batch fingerprint
    of the same corpus bit-for-bit (the portable-register rule extended
    to streaming: a receiver can verify a 100 TB continuous handoff
    WITHOUT ever running a batch job over the whole corpus). State per
    source is four scalars; complete-mode memory sink for the oracle
    harness (production would append per-trigger manifest rows).

    min/max/count/sum are all merge-equals-one-shot aggregations, which
    is exactly why this is safe as streaming state — a TopK or rank
    could not make this guarantee across triggers.
    """
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if os.path.isdir(path):
        stream = reader.parquet(path)
    else:
        base, fname = os.path.split(path)
        stream = reader.option("pathGlobFilter", fname).parquet(base)
    from time_series_data_trimmer_spark.operators.sampling import hash_u32

    row_repr = F.concat_ws(
        "|",
        F.col("doc_id").cast("string"),
        F.coalesce(F.col("text"), F.lit("")),
        F.coalesce(F.col("lang"), F.lit("")),
        F.col("n_chars").cast("string"),
    )
    h = stream.select("source", hash_u32(row_repr, "tsdt|fp").alias("u"))
    agg = h.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("u").cast("decimal(38,0)")).alias("__s"),
        F.min("u").alias("content_min"),
        F.max("u").alias("content_max"),
    )
    out = _run_to_memory(
        agg,
        mode="complete",
        shuffle_partitions=_derived_state_partitions(spark, path),
    )
    return out.select(
        "source",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("__s") % F.lit(1000000000000000000).cast("decimal(38,0)"))
        .cast("long")
        .alias("content_sum_mod"),
        "content_min",
        "content_max",
    )


def stream_psi_drift(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming face of the batch PSI drift alarm
    (`stats_psi_halves_by_type`): per tumbling 1-DAY window and
    channel, the Population Stability Index of that window's value
    distribution against the corpus-wide reference deciles — the
    drift monitor a dashboard runs continuously ("which day did this
    channel's distribution move, and how far").

    Structure: the reference (per-type decile bounds + per-bin
    reference counts) is a BATCH frame over the same source; the
    stream assigns bins scan-side via a stream-static broadcast join +
    the same array fold the batch query uses (stateless), and the only
    streaming STATE is one row of 10 bin counters + a total per open
    (window, type) — bytes, not data, and every counter is a pure
    map-side-combinable sum, so the complete-mode final state equals
    the batch GROUP BY (batch==stream, same exact oracle). PSI terms
    are computed POST-SINK from the counters (8-dp decimal-summed,
    empty bins skipped and reported — the batch query's contract).
    """
    from time_series_data_trimmer_spark.functions.rounding import rd

    qs = [i / 10.0 for i in range(1, 10)]
    batch = spark.read.parquet(path).filter(F.col("value").isNotNull())
    bounds = batch.groupBy("event_type").agg(
        F.percentile(F.col("value"), F.array(*[F.lit(q) for q in qs])).alias(
            "__bs"
        )
    )

    def bin_col():
        return F.aggregate(
            F.col("__bs"),
            F.lit(0),
            lambda acc, q: acc + F.when(F.col("value") > q, 1).otherwise(0),
        ).alias("__bin")

    refb = batch.join(F.broadcast(bounds), "event_type").select(
        "event_type", bin_col()
    )
    ref = refb.groupBy("event_type").agg(
        *[
            F.sum(F.when(F.col("__bin") == i, 1).otherwise(0)).alias(f"__r{i}")
            for i in range(10)
        ],
        F.count(F.lit(1)).alias("__nr"),
    )
    stream = _events_stream(spark, path, max_files_per_trigger)
    s = (
        stream.filter(F.col("value").isNotNull())
        .join(F.broadcast(bounds), "event_type")
        .select("event_type", "event_time", "value", bin_col())
    )
    windowed = (
        s.withWatermark("event_time", "1 day")
        .groupBy(
            F.window("event_time", "1 day").alias("w"), F.col("event_type")
        )
        .agg(
            *[
                F.sum(F.when(F.col("__bin") == i, 1).otherwise(0)).alias(
                    f"__c{i}"
                )
                for i in range(10)
            ],
            F.count(F.lit(1)).alias("__n"),
        )
    )
    out = _run_to_memory(
        windowed,
        mode="complete",
        shuffle_partitions=_derived_state_partitions(spark, path),
    )
    j = out.join(F.broadcast(ref), "event_type").select(
        F.col("w.start").alias("window_start"),
        "event_type",
        F.col("__n"),
        F.col("__nr"),
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("__i"),
        F.array(*[F.col(f"__c{i}") for i in range(10)]).alias("__cs"),
        F.array(*[F.col(f"__r{i}") for i in range(10)]).alias("__rs"),
    )
    cw = F.element_at(F.col("__cs"), F.col("__i") + 1)
    rc = F.element_at(F.col("__rs"), F.col("__i") + 1)
    pw = cw.cast("double") / F.col("__n").cast("double")
    pr = rc.cast("double") / F.col("__nr").cast("double")
    ok = (cw > 0) & (rc > 0)
    term = F.when(ok, rd((pw - pr) * F.log(pw / pr), 8).cast("decimal(38,8)"))
    return (
        j.select(
            "window_start",
            "event_type",
            "__n",
            F.when(ok, 1).otherwise(0).alias("__used"),
            term.alias("__term"),
        )
        .groupBy("window_start", "event_type")
        .agg(
            F.max("__n").cast("long").alias("n"),
            F.sum("__used").cast("long").alias("n_bins_used"),
            (F.count(F.lit(1)) - F.sum("__used"))
            .cast("long")
            .alias("n_bins_skipped"),
            rd(F.sum("__term").cast("double"), 6).alias("psi"),
        )
    )


def _cusum_plan(
    spark: SparkSession,
    path: str,
    mu0: float = 100.0,
    kappa: float = 5.0,
    h: float = 500.0,
    group_col: str = "event_type",
    value_col: str = "value",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Plan-builder half of `stream_cusum_alert` (split r12 so the
    state-scale stress harness can own the query handle and read
    state metrics): returns the applyInPandasWithState DataFrame,
    un-started.

    Streaming one-sided CUSUM level-shift monitor per group (Page
    1954 — the streaming twin of `ts_cusum_changepoint`): maintain
    S⁺ = max(0, S⁺ + (x − μ₀ − κ)) in GroupState and count alert
    crossings S⁺ > h. The state is O(1) per group — the closed form
    S⁺_n = cum_n − min(0, min_{j≤n} cum_j) needs only the running
    cumulative and its running floor, both carried across triggers.

    Exactness: values quantize to integer ten-thousandths BEFORE any
    arithmetic (μ₀+κ becomes one integer offset), so cum/floor/S are
    exact int64 in the stream AND in the batch oracle's two window
    passes — no float accumulation anywhere. Order contract: rows
    sort by (event_time, event_id) within every micro-batch; across
    triggers the recurrence assumes in-order arrival (the file
    source's mod-time ordering — the standard contract for
    order-dependent streaming state machines; out-of-order files
    would need a watermark-delayed reorder buffer in front).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )
    import numpy as np
    import pandas as pd

    offset = int(round((float(mu0) + float(kappa)) * 10000.0))
    h_scaled = int(round(float(h) * 10000.0))

    stream = _events_stream(spark, path, max_files_per_trigger)
    base = stream.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).cast("string").alias("g"),
        F.col("event_time").alias("et"),
        F.col("event_id").cast("long").alias("eid"),
        (F.floor(F.col(value_col) * F.lit(10000.0) + F.lit(0.5)).cast("long")
         - F.lit(offset)).alias("d"),
    )
    out_schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("n_obs", LongType()),
            StructField("max_cusum", DoubleType()),
            StructField("n_alerts", LongType()),
            StructField("cusum_now", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("cum", LongType()),
            StructField("floor", LongType()),
            StructField("n", LongType()),
            StructField("alerts", LongType()),
            StructField("maxs", LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        cum, floor_min, n, alerts, maxs = (
            state.get if state.exists else (0, 0, 0, 0, 0)
        )
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["et", "eid"], kind="mergesort")
            c = cum + np.cumsum(pdf["d"].to_numpy(dtype="int64"))
            runmin = np.minimum(np.minimum.accumulate(c), floor_min)
            s = c - runmin
            alerts += int((s > h_scaled).sum())
            maxs = max(maxs, int(s.max()))
            n += len(pdf)
            cum = int(c[-1])
            floor_min = int(runmin[-1])
        state.update((cum, floor_min, n, alerts, maxs))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_obs": [n],
                "max_cusum": [float(np.floor(maxs / 10000.0 * 10000.0 + 0.5) / 10000.0)],
                "n_alerts": [alerts],
                "cusum_now": [float(np.floor((cum - floor_min) / 10000.0 * 10000.0 + 0.5) / 10000.0)],
            }
        )

    return base.groupBy("g").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_cusum_alert(
    spark: SparkSession,
    path: str,
    mu0: float = 100.0,
    kappa: float = 5.0,
    h: float = 500.0,
    group_col: str = "event_type",
    value_col: str = "value",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Oracle-harness runner for the streaming CUSUM monitor — plan
    semantics, exactness, and order contract documented on
    `_cusum_plan` (split r12 so the state-scale stress harness can
    run the same plan with its own query handle)."""
    result = _cusum_plan(
        spark, path, mu0, kappa, h, group_col, value_col,
        max_files_per_trigger,
    )
    return _run_to_memory(
        result,
        mode="update",
        shuffle_partitions=_derived_state_partitions(spark, path),
    )
