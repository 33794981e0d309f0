"""Corpus layout management: partition pruning and small-file compaction."""

import contextlib
import io
import os

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.sources.corpus_io import (
    compact_directory,
    parquet_file_stats,
    write_partitioned,
)


def test_write_partitioned_prunes_at_planning_time(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "by_source")
    write_partitioned(docs, out, ["source"])
    # one directory per source value
    dirs = [d for d in os.listdir(out) if d.startswith("source=")]
    n_sources = docs.select("source").distinct().count()
    assert len(dirs) == n_sources

    # pick a REAL source value (don't hardcode one — the driver
    # regenerates testdata per round)
    some_source = docs.select("source").first()[0]
    one = spark.read.parquet(out).filter(F.col("source") == some_source)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one.explain("formatted")
    plan = buf.getvalue()
    # the filter lands in PartitionFilters (directory pruning), and the
    # result matches the unpartitioned read
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("source" in ln for ln in pf), plan
    want = docs.filter(F.col("source") == some_source).count()
    assert one.count() == want


def test_compact_directory_merges_small_files(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "shattered")
    # simulate an append-sink's layout debt: 64 tiny files
    docs.repartition(64).write.mode("overwrite").parquet(out)
    before_n, before_bytes = parquet_file_stats(out)
    assert before_n >= 64
    rows_before = spark.read.parquet(out).count()

    # target = total size → everything fits in one file
    b, a = compact_directory(spark, out, target_file_bytes=before_bytes * 2)
    assert b == before_n and a < before_n and a <= 2

    # contents unchanged (rows and a content checksum)
    after = spark.read.parquet(out)
    assert after.count() == rows_before
    chk = lambda df: df.agg(
        F.sum(F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long"))
    ).collect()[0][0]
    assert chk(after) == chk(docs)
    # no staging/backup residue
    parent = os.path.dirname(out)
    assert not [d for d in os.listdir(parent) if "__compact" in d]


def test_compact_partitioned_keeps_values_colocated(spark, tmp_path):
    # r4 review finding: round-robin repartition + partitionBy writes up
    # to n_files x n_values files; keyed repartition keeps each value in
    # few tasks so compaction actually compacts
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "part_shatter")
    docs.repartition(32).write.mode("overwrite").partitionBy("source").parquet(out)
    before_n, before_bytes = parquet_file_stats(out)
    n_sources = docs.select("source").distinct().count()
    assert before_n > n_sources * 4  # genuinely shattered

    b, a = compact_directory(
        spark, out, target_file_bytes=before_bytes * 2, partition_by=["source"]
    )
    # one task holds each source -> at most one file per source dir
    assert a <= n_sources, (b, a)
    assert spark.read.parquet(out).count() == docs.count()


def test_compact_recovers_from_crash_residue(spark, tmp_path):
    import shutil

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "crashy")
    docs.repartition(8).write.mode("overwrite").parquet(out)
    n_rows = spark.read.parquet(out).count()

    # simulate dying mid-swap: corpus renamed to backup, staging stranded
    os.rename(out, out + ".__compact_old__")
    os.makedirs(out + ".__compact_tmp__")
    b, a = compact_directory(spark, out, target_file_bytes=1 << 30)
    assert a >= 1
    assert spark.read.parquet(out).count() == n_rows, "backup not restored"
    parent = os.path.dirname(out)
    assert not [d for d in os.listdir(parent) if "__compact" in d]


def test_compact_streaming_sink_end_to_end(spark, tmp_path):
    """Compaction against the engine's OWN streaming sink output — the
    stated motivation for compact_directory (r4 verdict #6), plus the
    advisor's _spark_metadata contract: refuse without the finalize
    flag, drop the log with it, batch read equals the sink's result."""
    import pytest

    from time_series_data_trimmer_spark.streaming import stream_ops

    out = str(tmp_path / "dedup_sink")
    ckpt = str(tmp_path / "dedup_ckpt")
    sink = stream_ops.stream_dedup_to_files(
        spark, "/root/testdata/sf0.001/events.parquet", out, ckpt
    )
    rows_before = sink.count()
    assert rows_before > 0
    schema = sink.schema
    chk = lambda df: df.agg(
        F.sum(
            F.conv(
                F.substring(F.md5(F.concat_ws("\x1f", *df.columns)), 1, 8), 16, 10
            ).cast("long")
        )
    ).collect()[0][0]
    chk_before = chk(sink)
    assert os.path.isdir(os.path.join(out, "_spark_metadata"))
    before_n, before_bytes = parquet_file_stats(out)
    assert before_n > 1, "sink produced a single file; layout debt not exercised"

    # a live-looking sink (metadata log present) refuses compaction
    with pytest.raises(ValueError, match="_spark_metadata"):
        compact_directory(spark, out, target_file_bytes=before_bytes * 2)

    b, a = compact_directory(
        spark, out, target_file_bytes=before_bytes * 2, finalize_streaming_sink=True
    )
    assert b == before_n and a < before_n, (b, a)
    # finalized: log gone, directory is a plain batch-readable corpus
    assert not os.path.exists(os.path.join(out, "_spark_metadata"))
    after = spark.read.schema(schema).parquet(out)
    assert after.count() == rows_before
    assert chk(after) == chk_before


def test_read_documents_jsonl_roundtrip(spark, tmp_path):
    import json as _json

    from time_series_data_trimmer_spark.sources.corpus_io import read_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = [r.asDict() for r in docs.limit(50).collect()]
    p = tmp_path / "corpus.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")

    back = read_documents(spark, str(p), fmt="jsonl")
    assert back.count() == 50
    a = back.select("doc_id", "text").toPandas().sort_values("doc_id")
    b = (
        docs.limit(50).select("doc_id", "text").toPandas().sort_values("doc_id")
    )
    assert a["text"].tolist() == b["text"].tolist()
    assert dict(back.dtypes)["doc_id"] == "bigint"


def test_read_documents_rejects_unknown_format(spark):
    import pytest

    from time_series_data_trimmer_spark.sources.corpus_io import read_documents

    with pytest.raises(ValueError):
        read_documents(spark, "/nonexistent", fmt="avro")


def test_range_sorted_write_has_disjoint_file_ranges(spark, tmp_path):
    """write_range_sorted produces files whose per-file [min, max] on
    the sort key are pairwise disjoint — the zone map a point/range
    predicate prunes against — and preserves the data exactly."""
    from time_series_data_trimmer_spark.sources.corpus_io import (
        parquet_key_ranges,
        write_range_sorted,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "sorted")
    write_range_sorted(docs, out, ["doc_id"], num_files=8)

    ranges = sorted(
        (lo, hi) for _f, lo, hi in parquet_key_ranges(out, "doc_id")
    )
    assert len(ranges) >= 2  # actually split across files
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
        assert lo_a <= hi_a < lo_b  # contiguous, non-overlapping

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }


def test_range_sorted_point_read_touches_one_file_worth_of_ranges(spark, tmp_path):
    """A point predicate on the sort key intersects exactly ONE file's
    [min, max] range — the layout-level pruning guarantee (Spark pushes
    the predicate to parquet, and only that file's row groups can
    produce rows)."""
    from time_series_data_trimmer_spark.sources.corpus_io import (
        parquet_key_ranges,
        write_range_sorted,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "sorted")
    write_range_sorted(docs, out, ["doc_id"], num_files=8)
    target = docs.select("doc_id").orderBy("doc_id").limit(1).collect()[0][0]

    hits = [
        f for f, lo, hi in parquet_key_ranges(out, "doc_id") if lo <= target <= hi
    ]
    assert len(hits) == 1

    got = spark.read.parquet(out).filter(F.col("doc_id") == target)
    assert got.count() == 1
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id" in plan


def test_zorder_gives_both_columns_locality(spark, tmp_path):
    """Z-order trade pinned: a plain range sort on user_id gives the
    time column NO locality (every file spans ~the full time range);
    the Z-ordered layout tightens time ranges substantially while
    keeping user_id ranges useful — both predicates prune."""
    from time_series_data_trimmer_spark.sources.corpus_io import (
        parquet_key_ranges,
        write_range_sorted,
        write_zordered,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "user_id", "ts"
    ).withColumn("t_us", F.unix_micros(F.col("ts").cast("timestamp")))

    single, zord = str(tmp_path / "single"), str(tmp_path / "zord")
    write_range_sorted(ev, single, ["user_id"], num_files=16)
    write_zordered(ev, zord, ["user_id", "t_us"], bits=8, num_files=16)

    def total_span(path, col):
        return sum(hi - lo for _f, lo, hi in parquet_key_ranges(path, col))

    # time locality: z-order must beat the user-sorted layout by a wide
    # margin (files under user-sort each span ~the whole time axis)
    assert total_span(zord, "t_us") < 0.5 * total_span(single, "t_us")
    # user locality: z-order keeps per-file user ranges FAR tighter than
    # the unsorted worst case (16 files x full span), within the
    # documented ~2^(bits/N) widening vs the dedicated sort
    full_span = 16 * (
        ev.agg(F.max("user_id") - F.min("user_id")).first()[0]
    )
    assert total_span(zord, "user_id") < 0.5 * full_span


def test_read_documents_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC ingestion: exact round-trip through Spark's native ORC
    writer/reader, and a doc_id predicate reaches the ORC scan as a
    pushed filter (same planning-time story as parquet)."""
    import io
    import contextlib

    from time_series_data_trimmer_spark.sources.corpus_io import read_documents

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = str(tmp_path / "docs_orc")
    src.write.orc(p)
    back = read_documents(spark, p, fmt="orc")
    assert back.count() == src.count()
    a = sorted(map(tuple, src.select("doc_id", "text").collect()))
    b = sorted(map(tuple, back.select("doc_id", "text").collect()))
    assert a == b
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter(back.doc_id < 10).explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "doc_id" in plan


def test_sharded_manifest_roundtrip_and_tamper(spark, tmp_path):
    """Write shards + manifest; the receiver verification is empty on
    an intact copy and names exactly the damaged shard after tampering."""
    from pyspark.sql import functions as F

    from time_series_data_trimmer_spark.sources import corpus_io as cio

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "handoff")
    manifest = cio.write_sharded_with_manifest(docs, out, n_shards=8)
    rows = manifest.collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()

    # intact copy: zero discrepancies
    assert cio.verify_shard_manifest(spark, out).count() == 0

    # tamper with one shard: rewrite shard 3 dropping one row
    shard_dir = f"{out}/data/shard=3"
    damaged = spark.read.parquet(shard_dir)
    n3 = damaged.count()
    victim = damaged.orderBy("doc_id").limit(1).collect()[0]["doc_id"]
    damaged.filter(F.col("doc_id") != victim).write.mode("overwrite").parquet(
        str(tmp_path / "shard3_new")
    )
    import shutil

    shutil.rmtree(shard_dir)
    shutil.copytree(str(tmp_path / "shard3_new"), shard_dir)

    bad = cio.verify_shard_manifest(spark, out).collect()
    assert len(bad) == 1
    assert bad[0]["shard"] == 3
    assert bad[0]["arrived_n_docs"] == n3 - 1
    assert bad[0]["manifest_fingerprint"] != bad[0]["arrived_fingerprint"]
