"""Global training-shuffle export (`sp.shuffle_to_shards` /
`sp.write_training_shards`) and C4-style filter funnel contracts."""

import os

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import sampling as sp
from time_series_data_trimmer_spark.operators import text as tx


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), F.col("id").cast("string")).alias("text"),
    )


def test_shards_are_dense_and_deterministic(spark):
    df = _docs(spark)
    out = sp.shuffle_to_shards(df, n_shards=8)
    assert out.count() == 400
    # per-shard positions are dense 0..count-1
    per = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.min("pos").alias("lo"), F.max("pos").alias("hi")
    )
    for r in per.collect():
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1
    # pure function of (seed, key): repartitioning changes nothing
    again = sp.shuffle_to_shards(df.repartition(13), n_shards=8)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_shards_decorrelate_input_order(spark):
    # consecutive doc_ids should not stay consecutive within a shard
    out = sp.shuffle_to_shards(_docs(spark), n_shards=4).filter(F.col("shard") == 0)
    rows = sorted((r["pos"], r["doc_id"]) for r in out.collect())
    ids = [d for _, d in rows]
    adjacent = sum(1 for a, b in zip(ids, ids[1:]) if abs(a - b) == 1)
    assert adjacent < len(ids) // 10


def test_write_training_shards_roundtrip(spark, tmp_path):
    df = _docs(spark, 200)
    path = os.path.join(str(tmp_path), "shards")
    sp.write_training_shards(df, path, n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert set(r["shard"] for r in back.select("shard").distinct().collect()) == {0, 1, 2, 3}
    # shard content matches the logical operator exactly
    expect = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in sp.shuffle_to_shards(df, n_shards=4).collect()
    }
    got = {(r["doc_id"], r["shard"], r["pos"]) for r in back.collect()}
    assert got == expect


def test_c4_funnel_monotone_and_consistent(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and runs far away today."),
            (2, None),
            (3, "short"),
            (4, "1 2 3 4 5 6 7 8 9 10 11 12 13 14"),  # digit noise
            (5, "the and is in to of that it was for this with as on be at by"),
        ],
        "doc_id long, text string",
    )
    funnel = {r["stage"]: r["n_pass"] for r in tx.c4_filter_funnel(df).collect()}
    # cumulative counts never increase
    stages = sorted(funnel)
    assert all(funnel[a] >= funnel[b] for a, b in zip(stages, stages[1:]))
    assert funnel[0] == 5
    # final funnel count equals the survivor query
    assert funnel[stages[-1]] == tx.c4_filter_survivors(df).count()
