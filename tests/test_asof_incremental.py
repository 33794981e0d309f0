"""Unit tests for the general as-of join and incremental dedup."""

import pandas as pd

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators.dedup import dedup_incremental
from time_series_data_trimmer_spark.operators.edits import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 2, 2, 3],
                "t": [1.0, 5.0, 9.0, 2.0, 4.0, 7.0],
                "lid": [10, 11, 12, 20, 21, 30],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 2, 9],
                "t": [0.5, 5.0, 8.0, 3.0, 1.0],
                "v": [100.0, 200.0, 300.0, 400.0, 900.0],
            }
        )
    )
    return left, right


def test_asof_join_backward_matches_merge_asof(spark):
    left, right = _frames(spark)
    got = (
        asof_join(left, right, ["k"], "t", ["v"])
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    lp = left.toPandas().sort_values(["t", "k"])
    rp = right.toPandas().sort_values(["t", "k"])
    want = pd.merge_asof(lp, rp, on="t", by="k", direction="backward").sort_values(
        "lid"
    ).reset_index(drop=True)
    assert got["v"].fillna(-1).tolist() == want["v"].fillna(-1).tolist()
    # tie at t=5.0 is INCLUSIVE (right row at the same instant matches)
    assert got.loc[got.lid == 11, "v"].iloc[0] == 200.0
    # left row before any right row → null match
    assert pd.isna(got.loc[got.lid == 20, "v"].iloc[0])
    # matched right time surfaces
    assert got.loc[got.lid == 12, "asof_t"].iloc[0] == 8.0


def test_asof_join_forward_matches_merge_asof(spark):
    left, right = _frames(spark)
    got = (
        asof_join(left, right, ["k"], "t", ["v"], direction="forward")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    lp = left.toPandas().sort_values(["t", "k"])
    rp = right.toPandas().sort_values(["t", "k"])
    want = pd.merge_asof(lp, rp, on="t", by="k", direction="forward").sort_values(
        "lid"
    ).reset_index(drop=True)
    assert got["v"].fillna(-1).tolist() == want["v"].fillna(-1).tolist()


def test_asof_join_randomized_vs_merge_asof(spark):
    # seeded fuzz: random keys/times (with deliberate exact-tie
    # collisions via integer times), both directions, vs pandas
    import random

    rng = random.Random(99)
    lrows = [
        (rng.randrange(6), float(rng.randrange(50)), i) for i in range(400)
    ]
    seen = set()
    rrows = []
    for j in range(200):
        k, t = rng.randrange(6), float(rng.randrange(50))
        if (k, t) not in seen:  # right must be unique per (key, time)
            seen.add((k, t))
            rrows.append((k, t, float(j)))
    left = spark.createDataFrame(pd.DataFrame(lrows, columns=["k", "t", "lid"]))
    right = spark.createDataFrame(pd.DataFrame(rrows, columns=["k", "t", "v"]))
    lp = left.toPandas().sort_values(["t", "k", "lid"]).reset_index(drop=True)
    rp = right.toPandas().sort_values(["t", "k"]).reset_index(drop=True)
    for direction in ("backward", "forward"):
        got = (
            asof_join(left, right, ["k"], "t", ["v"], direction=direction)
            .toPandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            lp, rp, on="t", by="k", direction=direction
        ).sort_values("lid").reset_index(drop=True)
        assert got["v"].fillna(-1).tolist() == want["v"].fillna(-1).tolist(), direction


def test_asof_join_rejects_bad_direction(spark):
    import pytest

    left, right = _frames(spark)
    with pytest.raises(ValueError):
        asof_join(left, right, ["k"], "t", ["v"], direction="nearest")


def test_dedup_incremental_survivors_and_state_update(spark):
    new = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "text": ["aa", "bb", "aa", "cc", "bb"],
            }
        )
    )
    import hashlib

    seen = spark.createDataFrame(
        pd.DataFrame({"digest": [hashlib.md5(b"cc").hexdigest()]})
    )
    got = (
        dedup_incremental(new, seen)
        .toPandas()
        .sort_values("keep_id")
        .reset_index(drop=True)
    )
    # 'cc' already ingested → dropped; 'aa' and 'bb' survive once each
    # with their in-batch dup counts
    assert got["keep_id"].tolist() == [1, 2]
    assert got["batch_dups"].tolist() == [2, 2]


def test_asof_join_null_payload_not_blended(spark):
    # r4 review finding: a matched right row with a NULL payload must
    # surface AS NULL — per-column last(ignorenulls) would skip it and
    # blend a STALE value with the newer asof_t
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1], "t": [3.0], "lid": [1]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "t": [1.0, 2.0], "v": [100.0, None]})
    )
    got = asof_join(left, right, ["k"], "t", ["v"]).toPandas()
    assert got["asof_t"].iloc[0] == 2.0
    assert pd.isna(got["v"].iloc[0]), "stale v=100.0 blended into the t=2.0 match"


def test_dedup_incremental_null_text_suppressed_on_next_batch(spark):
    # r4 review finding: md5(NULL)=NULL and NULL==NULL is never true in
    # the anti-join, so null-text docs would re-emit forever; the
    # sentinel digest makes the state update actually suppress them
    batch1 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [None, "aa"]})
    )
    out1 = dedup_incremental(batch1, spark.createDataFrame(pd.DataFrame({"digest": ["x"]})))
    rows1 = out1.toPandas()
    assert len(rows1) == 2 and rows1["digest"].notna().all()
    # feed batch1's output digests back as state; replay the same batch
    out2 = dedup_incremental(batch1, out1.select("digest"))
    assert out2.count() == 0, "replayed batch must be fully suppressed"


def test_asof_and_packing_invariant_under_repartitioning(spark):
    # the determinism contract: results are pure functions of the DATA,
    # never of the physical layout (retries/cluster-size changes can't
    # shift a training mix or an as-of match)
    from time_series_data_trimmer_spark.operators.sampling import (
        sequence_pack_offsets,
    )

    left, right = _frames(spark)
    a = asof_join(left, right, ["k"], "t", ["v"]).toPandas()
    b = asof_join(
        left.repartition(7), right.repartition(3), ["k"], "t", ["v"]
    ).toPandas()
    key = ["k", "t", "lid"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
        check_like=True,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p1 = sequence_pack_offsets(docs, seq_len=256).toPandas()
    p2 = sequence_pack_offsets(docs.repartition(13), seq_len=256).toPandas()
    pd.testing.assert_frame_equal(
        p1.sort_values("doc_id").reset_index(drop=True),
        p2.sort_values("doc_id").reset_index(drop=True),
        check_like=True,
    )


def test_asof_join_null_left_time_gets_no_match(spark):
    # r4 review finding #2: a left row with NULL time has no as-of
    # position — forward direction sorted NULLs last and fabricated a
    # match (the funnel's second hop feeds exactly this shape)
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "t": [None, 5.0], "lid": [1, 2]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "t": [3.0, 7.0], "v": [30.0, 70.0]})
    )
    for direction, want in (("backward", 30.0), ("forward", 70.0)):
        got = (
            asof_join(left, right, ["k"], "t", ["v"], direction=direction)
            .toPandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        assert pd.isna(got.loc[got.lid == 1, "v"].iloc[0]), direction
        assert pd.isna(got.loc[got.lid == 1, "asof_t"].iloc[0]), direction
        assert got.loc[got.lid == 2, "v"].iloc[0] == want, direction


def test_asof_join_null_right_time_never_matches(spark):
    # r4 advisor finding (medium): a NULL-time RIGHT row sorts FIRST under
    # the ascending (backward) window order, so left rows before any real
    # right row inherited its payload (v with asof_t NULL). DuckDB ASOF
    # returns no match for them. The right frame is now filtered on
    # time-not-null before the union.
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "t": [1.0, 5.0], "lid": [1, 2]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "t": [None, 3.0], "v": [99.0, 30.0]})
    )
    for direction, want1, want2 in (
        ("backward", None, 30.0),  # t=1: no right row <= 1; t=5: matches 3.0
        ("forward", 30.0, None),  # t=1: matches 3.0; t=5: no right row >= 5
    ):
        got = (
            asof_join(left, right, ["k"], "t", ["v"], direction=direction)
            .toPandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        for lid, want in ((1, want1), (2, want2)):
            val = got.loc[got.lid == lid, "v"].iloc[0]
            if want is None:
                assert pd.isna(val), (direction, lid)
                assert pd.isna(got.loc[got.lid == lid, "asof_t"].iloc[0]), (
                    direction,
                    lid,
                )
            else:
                assert val == want, (direction, lid)


def test_incremental_multi_batch_converges_to_one_shot(spark):
    """r5: three sequential batches through the bucketed-history loop
    equal one-shot exact dedup over the union (associativity). Batches
    arrive in id order (the append-only ingest case), so keep_id is the
    GLOBAL min id per digest, not just the earliest-batch min."""
    from time_series_data_trimmer_spark.operators.dedup import (
        exact_dedup_groups,
        incremental_dedup_batches,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # id-ordered tertiles — data-derived split points, testdata-proof
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    c1, c2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    batches = [
        docs.filter(F.col("doc_id") <= c1),
        docs.filter((F.col("doc_id") > c1) & (F.col("doc_id") <= c2)),
        docs.filter(F.col("doc_id") > c2),
    ]
    table = "tsdt_hist_test_conv"
    try:
        hist = incremental_dedup_batches(spark, batches, history_table=table)
        got = {
            r["digest"]: r["keep_id"] for r in hist.select("digest", "keep_id").collect()
        }
        want = {
            r["content_key"]: r["keep_id"]
            for r in exact_dedup_groups(docs).withColumn(
                "content_key", F.coalesce("content_key", F.lit("<NULL>"))
            ).collect()
        }
        assert got == want
        # every batch contributed
        assert hist.select("batch_id").distinct().count() == 3
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_incremental_history_antijoin_is_colocated(spark):
    """The history side of the per-batch anti-join must be a bucketed
    scan with NO exchange: the ever-growing side never re-shuffles."""
    from time_series_data_trimmer_spark.operators.dedup import (
        incremental_dedup_batches,
    )
    from time_series_data_trimmer_spark.operators.skew import (
        bucketed_join_is_shuffle_free,
        write_bucketed,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hist_t, batch_t = "tsdt_hist_test_plan", "tsdt_batch_test_plan"
    try:
        incremental_dedup_batches(
            spark,
            [docs.filter(F.col("doc_id") % 2 == 0)],
            history_table=hist_t,
        )
        # a co-bucketed batch digest table joins with ZERO exchanges
        batch = docs.filter(F.col("doc_id") % 2 == 1).select(
            F.coalesce(F.md5("text"), F.lit("<NULL>")).alias("digest"),
            "doc_id",
        )
        write_bucketed(batch, batch_t, ["digest"], n_buckets=8)
        assert bucketed_join_is_shuffle_free(spark, hist_t, batch_t, ["digest"])

        # and in the operator's own anti-join (plain batch side), the
        # HISTORY side still plans without an exchange: exactly one
        # Exchange total (the batch side)
        seen = spark.table(hist_t).select("digest")
        fresh = batch.join(seen, "digest", "left_anti").groupBy("digest").agg(
            F.min("doc_id").alias("keep_id")
        )
        plan = fresh._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, plan
    finally:
        for t in (hist_t, batch_t):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_funnel_n_step_chain_and_break_propagation(spark):
    """r5 N-step funnel: windows enforced per hop, a broken hop NULLs
    every later hop (the NULL-time as-of guard), repeated step types
    allowed, and window-count validation."""
    import pytest

    from time_series_data_trimmer_spark.operators.edits import (
        funnel,
        funnel_summary,
    )

    rows = pd.DataFrame(
        {
            # user 1: a->b(+5)->c(+5): converted
            # user 2: a->b(+5), no c: hop 2 NULL
            # user 3: a, no b: hops 1 AND 2 NULL (break propagates)
            # user 4: a->b(+50: window blown)->c: not converted, times present
            "user_id": [1, 1, 1, 2, 2, 3, 4, 4, 4],
            "event_type": ["a", "b", "c", "a", "b", "a", "a", "b", "c"],
            "t": [0.0, 5.0, 10.0, 0.0, 5.0, 0.0, 0.0, 50.0, 55.0],
            "event_id": [1, 2, 3, 4, 5, 6, 7, 8, 9],
        }
    )
    ev = spark.createDataFrame(rows)
    hops = funnel(ev, ["a", "b", "c"], [10.0, 10.0]).toPandas().set_index("user_id")
    assert bool(hops.loc[1, "converted"]) is True
    assert hops.loc[2, "t_1"] == 5.0 and pd.isna(hops.loc[2, "t_2"])
    assert pd.isna(hops.loc[3, "t_1"]) and pd.isna(hops.loc[3, "t_2"])
    assert hops.loc[4, "t_1"] == 50.0 and hops.loc[4, "t_2"] == 55.0
    assert not bool(hops.loc[4, "converted"])

    summ = funnel_summary(
        funnel(ev, ["a", "b", "c"], [10.0, 10.0])
    ).toPandas().set_index("user_id")
    assert summ.loc[1, "n_converted"] == 1 and summ.loc[4, "n_converted"] == 0

    # repeated step type: a -> a retention hop matches the NEXT a
    two_a = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1],
                "event_type": ["a", "a"],
                "t": [0.0, 7.0],
                "event_id": [1, 2],
            }
        )
    )
    rep = funnel(two_a, ["a", "a"], [10.0]).toPandas().sort_values("event_id")
    # ties are inclusive, so each anchor's nearest at-or-after 'a' is
    # itself — the retention hop is the SAME instant (documented
    # inclusive semantics, identical to chained ASOF)
    assert rep["t_1"].tolist() == [0.0, 7.0]

    with pytest.raises(ValueError):
        funnel(ev, ["a", "b", "c"], [10.0])


def test_incremental_dedup_resume_continues_history(spark):
    """resume=True keeps the stored history: a second PROCESS RUN'S
    batch anti-joins against day 1's digests instead of rebuilding —
    the nightly production shape (r5 review finding)."""
    from time_series_data_trimmer_spark.operators.dedup import (
        incremental_dedup_batches,
    )

    b1 = spark.createDataFrame([(1, "aa"), (2, "bb")], "doc_id long, text string")
    b2 = spark.createDataFrame([(3, "aa"), (4, "cc")], "doc_id long, text string")
    tbl = "tsdt_hist_resume_test"
    incremental_dedup_batches(spark, [b1], history_table=tbl)
    out = incremental_dedup_batches(spark, [b2], history_table=tbl, resume=True)
    rows = {(r["keep_id"], r["batch_id"]) for r in out.collect()}
    # doc 3 ("aa") is suppressed by day-1 history; doc 4 survives as
    # batch_id 1 (continuing from the stored max)
    assert rows == {(1, 0), (2, 0), (4, 1)}
    # resume=False (default) rebuilds: doc 3 would survive again
    out2 = incremental_dedup_batches(spark, [b2], history_table=tbl)
    keep = {r["keep_id"] for r in out2.collect()}
    assert keep == {3, 4}
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_asof_tolerance_matches_pandas_merge_asof(spark):
    """tolerance= must reproduce pandas.merge_asof(tolerance=...) row
    for row, including the all-NULL payload for too-stale matches and
    the inclusive zero-gap match."""
    import pandas as pd
    from time_series_data_trimmer_spark.operators.edits import asof_join

    left = pd.DataFrame(
        {"k": [1, 1, 1, 2, 2], "t": [5.0, 10.0, 30.0, 1.0, 8.0]}
    )
    right = pd.DataFrame(
        {"k": [1, 1, 2], "t": [4.0, 10.0, 7.0], "v": [40.0, 100.0, 70.0]}
    )
    expected = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t"),
        on="t",
        by="k",
        tolerance=3.0,
        direction="backward",
        suffixes=("", "_r"),
    )
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            key_cols=["k"],
            time_col="t",
            value_cols=["v"],
            tolerance=3.0,
        )
        .orderBy("t")
        .toPandas()
    )
    exp = expected.sort_values("t").reset_index(drop=True)
    assert list(got["v"].fillna(-1)) == list(exp["v"].fillna(-1)), (got, exp)
    # zero-gap inclusive: left t=10 matches right t=10 exactly
    assert got.loc[got["t"] == 10.0, "v"].iloc[0] == 100.0
    # stale: left t=30 has nearest right at 10 (gap 20 > 3) -> NULL
    assert pd.isna(got.loc[got["t"] == 30.0, "v"].iloc[0])


def test_funnel_step_latency_contract(spark):
    """Hop rows: within <= matched <= anchors; hop-2 anchors equal
    hop-1 matches (the chain); p50 <= p90 <= window."""
    import __spark_entry__ as entry

    rows = {r["hop"]: r for r in entry.queries()["funnel_step_latency"](
        spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {1, 2}
    for hop, win in ((1, 600.0), (2, 3600.0)):
        r = rows[hop]
        assert r["n_within"] <= r["n_matched"] <= r["n_anchors"]
        if r["n_within"] > 0:
            assert 0.0 <= r["p50_latency_s"] <= r["p90_latency_s"] <= win
    assert rows[2]["n_anchors"] == rows[1]["n_matched"]
