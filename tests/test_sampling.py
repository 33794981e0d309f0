"""Deterministic sampling / data mixing: membership must be a pure
function of (seed, key) — stable under repartitioning — and budgets
must bound token totals exactly."""

import pandas as pd
from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import sampling as sp


def _docs(spark, n=400):
    rows = [
        (i, f"src{i % 5}", " ".join(f"w{j}" for j in range((i % 30) + 5)))
        for i in range(n)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    )


def test_membership_stable_under_repartitioning(spark):
    df = _docs(spark)
    a = {r["doc_id"] for r in sp.hash_sample(df, 0.3).select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in sp.hash_sample(df.repartition(17, "source"), 0.3)
        .select("doc_id")
        .collect()
    }
    c = {
        r["doc_id"]
        for r in sp.hash_sample(df.coalesce(1), 0.3).select("doc_id").collect()
    }
    assert a == b == c and 0 < len(a) < 400
    # df.sample (per-partition RNG) would NOT give this guarantee


def test_rates_approximately_honored_and_seed_independent(spark):
    df = _docs(spark)
    n = sp.hash_sample(df, 0.5).count()
    assert 120 <= n <= 280  # 0.5 ± generous binomial slack on 400
    # different seeds give different (deterministic) samples
    s1 = {r["doc_id"] for r in sp.hash_sample(df, 0.5, seed="a").collect()}
    s2 = {r["doc_id"] for r in sp.hash_sample(df, 0.5, seed="b").collect()}
    assert s1 != s2
    assert s1 == {r["doc_id"] for r in sp.hash_sample(df, 0.5, seed="a").collect()}


def test_stratified_rates_per_stratum(spark):
    df = _docs(spark)
    out = sp.stratified_hash_sample(df, {"src0": 1.0, "src1": 0.0}, 0.5)
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_src.get("src0") == 80  # rate 1.0 keeps all 80
    assert "src1" not in by_src  # rate 0.0 drops all
    for s in ("src2", "src3", "src4"):
        assert 20 <= by_src.get(s, 0) <= 60  # default 0.5 of 80


def test_token_budget_is_exact_prefix(spark):
    df = _docs(spark)
    budget = 200
    out = sp.token_budget_per_stratum(df, budget).toPandas()
    # never exceeded, per stratum
    assert (out.groupby("source")["n_tokens"].sum() <= budget).all()
    assert (out["cum_tokens"] <= budget).all()
    # prefix property: the kept set is the maximal hash-ordered prefix —
    # recompute the order in pandas and compare exactly
    full = df.withColumn("h", sp.hash_u32(F.col("doc_id"))).toPandas()
    full["n_tokens"] = full["text"].str.split().str.len()
    kept_want = set()
    for _, grp in full.sort_values(["h", "doc_id"]).groupby("source"):
        cum = 0
        for r in grp.itertuples():
            cum += r.n_tokens
            if cum <= budget:
                kept_want.add(r.doc_id)
    assert set(out["doc_id"]) == kept_want


def test_pack_offsets_contiguous_and_covering(spark):
    # distributed prefix-sum invariants: offsets are contiguous in the
    # global hash order (next tok_start == prev tok_end), start at 0,
    # and cover exactly the total token count
    import pandas as pd

    from time_series_data_trimmer_spark.operators.sampling import (
        sequence_pack_offsets,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = sequence_pack_offsets(docs, seq_len=128).toPandas()
    out = out.sort_values("tok_start").reset_index(drop=True)
    assert out.tok_start.iloc[0] == 0
    assert (out.tok_end - out.tok_start == out.n_tokens).all()
    assert (
        out.tok_start.iloc[1:].to_numpy() == out.tok_end.iloc[:-1].to_numpy()
    ).all(), "gaps or overlaps in the packed stream"
    assert out.tok_end.iloc[-1] == out.n_tokens.sum()


def test_pack_sharded_shard_major_and_contiguous(spark):
    # shard-major: all of shard A's interval precedes shard B's for
    # A < B; within AND across shards the stream is contiguous
    from time_series_data_trimmer_spark.operators.sampling import (
        sequence_pack_offsets_sharded,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = sequence_pack_offsets_sharded(docs, seq_len=128).toPandas()
    out = out.sort_values("tok_start").reset_index(drop=True)
    assert out.tok_start.iloc[0] == 0
    assert (
        out.tok_start.iloc[1:].to_numpy() == out.tok_end.iloc[:-1].to_numpy()
    ).all()
    # shard blocks are intervals: the source sequence, read in offset
    # order, never returns to an earlier shard
    sources = out.source.tolist()
    first_seen = {}
    for i, s in enumerate(sources):
        if s in first_seen:
            assert sources[i - 1] == s, f"shard {s} interleaved at row {i}"
        else:
            first_seen[s] = i


def test_train_val_test_split_stable_and_exhaustive(spark):
    from time_series_data_trimmer_spark.operators.sampling import train_val_test_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {
        (r["doc_id"], r["split"])
        for r in train_val_test_split(docs).select("doc_id", "split").collect()
    }
    b = {
        (r["doc_id"], r["split"])
        for r in train_val_test_split(docs.repartition(13))
        .select("doc_id", "split")
        .collect()
    }
    assert a == b  # membership is layout-independent
    labels = {s for _, s in a}
    assert labels <= {"train", "val", "test"}
    n = len(a)
    n_train = sum(1 for _, s in a if s == "train")
    assert n_train / n > 0.6  # 80% nominal, generous tolerance at small N


def test_hash_top_n_per_group_append_stability(spark):
    """Appending new rows can only ADD/DISPLACE by hash rank — it never
    arbitrarily churns existing picks (the reservoir-sampling failure
    this operator exists to avoid)."""
    from time_series_data_trimmer_spark.operators.sampling import (
        hash_top_n_per_group,
        hash_u32,
    )

    base = spark.createDataFrame(
        [(i, "s") for i in range(40)], "doc_id long, source string"
    )
    extra = spark.createDataFrame(
        [(i, "s") for i in range(40, 60)], "doc_id long, source string"
    )
    pick1 = {r["doc_id"] for r in hash_top_n_per_group(base, 10).collect()}
    pick2 = {
        r["doc_id"]
        for r in hash_top_n_per_group(base.unionByName(extra), 10).collect()
    }
    assert len(pick1) == len(pick2) == 10
    # members leaving pick1 were displaced ONLY by lower-hash newcomers
    newcomers = pick2 - pick1
    assert newcomers <= set(range(40, 60))
    assert len(pick1 - pick2) == len(newcomers)


def test_pps_systematic_total_hits_exactly_k(spark):
    from time_series_data_trimmer_spark.operators import sampling as sp

    rows = [(i, (i * 37) % 500 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    for k in (1, 7, 50, 299):
        out = sp.pps_systematic_sample(df, k=k, weight_col="n_chars")
        assert sum(r["n_hits"] for r in out.collect()) == k


def test_pps_systematic_oversized_row_always_hit(spark):
    from time_series_data_trimmer_spark.operators import sampling as sp

    # one row owns >half the total weight: with k=10 its span covers
    # >5 grid points, so it MUST appear with n_hits >= 5
    rows = [(i, 10) for i in range(100)] + [(999, 1200)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = {r["doc_id"]: r["n_hits"] for r in sp.pps_systematic_sample(
        df, k=10, weight_col="n_chars").collect()}
    assert out.get(999, 0) >= 5
    assert sum(out.values()) == 10


def test_pps_systematic_zero_weight_rows_excluded(spark):
    from time_series_data_trimmer_spark.operators import sampling as sp

    rows = [(1, 100), (2, 0), (3, 100)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = {r["doc_id"] for r in sp.pps_systematic_sample(
        df, k=2, weight_col="n_chars").collect()}
    assert 2 not in out
