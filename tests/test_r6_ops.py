"""Property tests for the round-6 operator wave: SemDeDup, BM25,
epoch upsampling, user-event sessionization, per-group quality
percentiles, CUBE. (Exact-value correctness is the DuckDB oracle's
job — scripts/check_oracle.py; these pin the semantic invariants that
survive refactors.)"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from time_series_data_trimmer_spark.operators import aggregates as ag
from time_series_data_trimmer_spark.operators import sampling as sp
from time_series_data_trimmer_spark.operators import similarity as sim
from time_series_data_trimmer_spark.operators import text as tx

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


# --- SemDeDup -------------------------------------------------------------


def test_semdedup_survivors_partition_of_input(emb):
    surv = sim.semdedup_survivors(emb, tau=0.4, n_centroids=16)
    n, n_surv = emb.count(), surv.count()
    assert 0 < n_surv <= n
    # survivor ids are input ids, once each
    assert surv.select("vec_id").distinct().count() == n_surv
    assert surv.join(emb, "vec_id", "left_anti").count() == 0


def test_semdedup_dropped_have_smaller_neighbor(emb):
    """Every dropped vector has a same-cell smaller-id neighbor with
    cosine >= tau (the drop rule, verified against the pair set)."""
    pairs = sim.semdedup_pairs(emb, tau=0.4, n_centroids=16)
    surv = sim.semdedup_survivors(emb, tau=0.4, n_centroids=16)
    dropped = emb.select("vec_id").join(surv, "vec_id", "left_anti")
    uncovered = dropped.join(
        pairs.select(F.col("id_b").alias("vec_id")).distinct(), "vec_id", "left_anti"
    )
    assert uncovered.count() == 0
    # and no survivor appears as a dropped id_b
    bad = surv.join(
        pairs.select(F.col("id_b").alias("vec_id")).distinct(), "vec_id", "inner"
    )
    assert bad.count() == 0


def test_semdedup_pairs_are_within_cell_and_thresholded(emb):
    pairs = sim.semdedup_pairs(emb, tau=0.4, n_centroids=16)
    rows = pairs.collect()
    assert all(r.id_a < r.id_b for r in rows)
    assert all(r.cosine >= 0.4 for r in rows)


# --- BM25 -----------------------------------------------------------------


def test_bm25_topk_invariants(docs):
    out = tx.bm25_topk(docs, ["spark", "window", "join"], k=10).collect()
    assert 0 < len(out) <= 10
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r.n_terms_matched <= 3 for r in out)
    assert all(r.score > 0 for r in out)


def test_bm25_single_term_matches_manual(spark):
    """3-doc corpus small enough to check BM25 by hand."""
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b c d"), (3, "b c d e")], "doc_id long, text string"
    )
    out = {r.doc_id: r.score for r in tx.bm25_topk(df, ["a"], k=3).collect()}
    # df("a")=2, N=3 -> idf = (3-2+0.5)/(2+0.5) = 0.6; avgdl = 4
    # doc1: tf=3, dl=4 -> 0.6*3*2.2/(3+1.2*(0.25+0.75*1)) = 3.96/4.2
    assert out[1] == pytest.approx(0.6 * 3 * 2.2 / (3 + 1.2), abs=1e-6)
    assert out[2] == pytest.approx(0.6 * 1 * 2.2 / (1 + 1.2), abs=1e-6)
    assert 3 not in out  # no query term -> not retrieved
    assert out[1] > out[2]  # higher tf wins at equal dl


# --- epoch upsampling -----------------------------------------------------


def test_epoch_upsample_replication_counts(docs):
    out = sp.epoch_upsample(docs, max_epochs=4)
    per_src = (
        out.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_out"), F.max("epoch").alias("epochs"))
        .collect()
    )
    base = {r.source: r.n_in for r in
            docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_in")).collect()}
    for r in per_src:
        assert 1 <= r.epochs <= 4
        assert r.n_out == base[r.source] * r.epochs  # exact integer replication
    # the largest domain is never upsampled
    largest = max(base, key=lambda s: base[s])
    assert {r.epochs for r in per_src if r.source == largest} == {1}


def test_epoch_upsample_preserves_schema_plus_epoch(docs):
    out = sp.epoch_upsample(docs, max_epochs=4)
    assert out.columns == docs.columns + ["epoch"]


# --- user-event sessionization -------------------------------------------


def test_sessionize_gap_property(events):
    """Within a session all consecutive gaps are <= 30 min; across
    consecutive sessions of one user the boundary gap is > 30 min."""
    sess = ag.sessionize_user_events(events, gap_minutes=30)
    rows = sorted(
        sess.collect(), key=lambda r: (r.user_id, r.session_idx)
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for _u, ss in by_user.items():
        for i, r in enumerate(ss):
            assert r.session_start <= r.session_end
            if i:
                gap = (r.session_start - ss[i - 1].session_end).total_seconds()
                assert gap > 30 * 60
    # every event accounted for exactly once
    assert sum(r.n_events for r in rows) == events.count()


def test_sessionize_single_shuffle_plan(events):
    plan = ag.sessionize_user_events(events)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # window + cumsum + agg share one shuffle


# --- quality percentile ---------------------------------------------------


def test_quality_percentile_bounds_and_monotonicity(docs):
    out = tx.quality_percentile_by_group(docs).collect()
    assert all(0.0 <= r.pct_rank <= 1.0 for r in out)
    assert all(0 <= r.decile <= 9 for r in out)
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for _lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.quality)
        for a, b in zip(rs, rs[1:]):
            assert a.pct_rank <= b.pct_rank  # rank monotone in score
            if a.quality == b.quality:
                assert a.pct_rank == b.pct_rank  # value-ties share rank


# --- contamination fraction ----------------------------------------------


def test_contamination_fraction_total_and_bounded(docs, spark):
    from time_series_data_trimmer_spark.operators import dedup as dd

    train = docs.filter(F.col("source") != "src0")
    held = docs.filter(F.col("source") == "src0")
    out = dd.contamination_fraction(train, held, n=4)
    rows = out.collect()
    # total scoring: every train doc with text appears exactly once
    assert len(rows) == train.filter(F.col("text").isNotNull()).count()
    assert all(0.0 <= r.contamination_frac <= 1.0 for r in rows)
    assert all(r.n_shared <= r.n_grams for r in rows)
    # consistency with the hard-threshold flag: flagged set == frac > 0
    flagged = {r.doc_id for r in dd.decontaminate(train, held, n=4).collect()}
    assert {r.doc_id for r in rows if r.n_shared > 0} == flagged


# --- KMV sketch -----------------------------------------------------------


def test_kmv_exact_below_k(spark):
    from time_series_data_trimmer_spark.operators import sketches as sk

    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(40)], "grp string, val string"
    )
    r = sk.kmv_distinct(df, "grp", "val", k=64).collect()[0]
    assert r.n_kept == 40
    assert r.est_distinct == 40.0  # below k the sketch IS the exact count
    assert r.exact_distinct == 40


def test_kmv_estimator_rel_error(spark):
    from time_series_data_trimmer_spark.operators import sketches as sk

    n = 2000
    df = spark.createDataFrame(
        [("g", f"value-{i}") for i in range(n)], "grp string, val string"
    )
    r = sk.kmv_distinct(df, "grp", "val", k=64).collect()[0]
    assert r.n_kept == 64
    assert r.exact_distinct == n
    # KMV rel error ~ 1/sqrt(k-2) ≈ 13%; allow 4 sigma
    assert abs(r.est_distinct - n) / n < 4 / (62 ** 0.5)


def test_kmv_duplicates_do_not_inflate(spark):
    from time_series_data_trimmer_spark.operators import sketches as sk

    df = spark.createDataFrame(
        [("g", f"v{i % 10}") for i in range(500)], "grp string, val string"
    )
    r = sk.kmv_distinct(df, "grp", "val", k=64).collect()[0]
    assert r.est_distinct == 10.0 and r.exact_distinct == 10


# --- global n-gram top-k --------------------------------------------------


def test_ngram_topk_matches_brute_force(spark):
    from collections import Counter

    from time_series_data_trimmer_spark.operators import text as tx2

    rows = [(1, "a b a b c"), (2, "a b x"), (3, "q")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.gram, r.occurrences) for r in tx2.ngram_topk_global(df, n=2, k=10).collect()}
    want = Counter()
    for _i, t in rows:
        w = t.split(" ")
        for j in range(len(w) - 1):
            want[" ".join(w[j : j + 2])] += 1
    assert got == set(want.items())


# --- cohort retention -----------------------------------------------------


def test_cohort_retention_invariants(events):
    from time_series_data_trimmer_spark.operators import aggregates as ag2

    rows = ag2.cohort_retention(events).collect()
    assert all(r.week_offset >= 0 for r in rows)
    assert all(0.0 < r.retained_frac <= 1.0 for r in rows)
    # at offset 0 every cohort member is active by definition of first week
    for r in rows:
        if r.week_offset == 0:
            assert r.n_active == r.cohort_size
    # cohort sizes partition the user base
    sizes = {r.cohort_week: r.cohort_size for r in rows}
    assert sum(sizes.values()) == events.select("user_id").distinct().count()


# --- interval overlap join ------------------------------------------------


def test_overlap_join_lossless_vs_naive(spark):
    """Bucket blocking finds EXACTLY the naive-join pairs, including
    intervals spanning many buckets and touching endpoints."""
    from time_series_data_trimmer_spark.operators import intervals as iv

    H = 3_600_000_000
    rows = [
        (1, 0, H // 2),            # inside bucket 0
        (2, H // 4, 10 * H),       # spans 10 buckets
        (3, 3 * H, 3 * H + 1),     # tiny, inside bucket 3 (overlaps 2)
        (4, 20 * H, 21 * H),       # isolated
        (5, H // 2, H // 2),       # point interval touching 1's end
    ]
    df = spark.createDataFrame(rows, "iid long, start_us long, end_us long")
    got = {
        (r.iid_a, r.iid_b)
        for r in iv.overlap_join(df, df).collect()
        if r.iid_a < r.iid_b
    }
    want = {
        (a[0], b[0])
        for a in rows
        for b in rows
        if a[0] < b[0] and a[1] <= b[2] and b[1] <= a[2]
    }
    assert got == want == {(1, 2), (2, 3), (1, 5), (2, 5)}
    ov = {
        (r.iid_a, r.iid_b): r.overlap_us
        for r in iv.overlap_join(df, df).collect()
        if r.iid_a < r.iid_b
    }
    assert ov[(1, 2)] == H // 2 - H // 4
    assert ov[(1, 5)] == 0  # touching endpoints: closed-interval overlap 0


def test_overlap_join_bucket_invariant_and_auto(spark):
    """Results are bucket-invariant (losslessness at two more bucket
    sizes) and bucket_us='auto' derives the exact median duration."""
    from time_series_data_trimmer_spark.operators import intervals as iv

    H = 3_600_000_000
    rows = [
        (1, 0, H // 2),
        (2, H // 4, 10 * H),
        (3, 3 * H, 3 * H + 1),
        (4, 20 * H, 21 * H),
        (5, H // 2, H // 2),
    ]
    df = spark.createDataFrame(rows, "iid long, start_us long, end_us long")
    want = {(1, 2), (2, 3), (1, 5), (2, 5)}

    def pairs(bucket):
        return {
            (r.iid_a, r.iid_b)
            for r in iv.overlap_join(df, df, bucket_us=bucket).collect()
            if r.iid_a < r.iid_b
        }

    assert pairs(H // 7) == want          # small bucket: more fan-out
    assert pairs(50 * H) == want          # one bucket holds everything
    assert pairs("auto") == want          # derived bucket, same answer
    # no-duplicate guarantee WITHOUT a distinct: at the smallest
    # bucket, multi-bucket pairs would surface once per shared bucket
    # if the first-overlap-bucket guard regressed (sets above would
    # hide that) — row count must equal unique-tuple count
    small = iv.overlap_join(df, df, bucket_us=H // 7).collect()
    assert len(small) == len({tuple(r) for r in small})
    # auto = exact median of the POSITIVE durations (point intervals
    # excluded — gap-sessionized data is full of them and they would
    # drag the median to 0), both sides of the self join
    durs = sorted(e - s for _i, s, e in rows if e > s) * 2
    med = sorted(durs)[len(durs) // 2 - 1 : len(durs) // 2 + 1]
    assert iv.auto_bucket_us(df, df) == max(1_000_000, int(sum(med) / 2))
    # all-point-interval degenerate input falls back to the default
    pts = spark.createDataFrame(
        [(1, 10, 10), (2, 20, 20)], "iid long, start_us long, end_us long"
    )
    assert iv.auto_bucket_us(pts, pts) == iv.DEFAULT_BUCKET_US
    # the 1-second floor: sub-second medians cannot explode the fan-out
    tiny = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 12)], "iid long, start_us long, end_us long"
    )
    assert iv.auto_bucket_us(tiny, tiny) == 1_000_000


def test_overlap_join_plan_no_bnlj(spark):
    from time_series_data_trimmer_spark.operators import intervals as iv

    df = spark.createDataFrame(
        [(1, 0, 100), (2, 50, 150)], "iid long, start_us long, end_us long"
    )
    plan = iv.overlap_join(df, df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_kmv_merge_equals_sketch_of_union(spark):
    """The mergeability contract: merge(sketch(A), sketch(B)) gives
    the SAME registers — hence the same estimate — as sketch(A ∪ B),
    with no rescan. Split overlaps so dedup across batches matters."""
    from time_series_data_trimmer_spark.operators import sketches as sk

    rows = [("g", f"value-{i}") for i in range(300)]
    full = spark.createDataFrame(rows, "grp string, val string")
    a = spark.createDataFrame(rows[:200], "grp string, val string")
    b = spark.createDataFrame(rows[150:], "grp string, val string")
    merged = sk.kmv_merge(
        sk.kmv_registers(a, "grp", "val", k=64),
        sk.kmv_registers(b, "grp", "val", k=64),
        k=64,
    )
    direct = sk.kmv_registers(full, "grp", "val", k=64)
    assert {r.u for r in merged.collect()} == {r.u for r in direct.collect()}
    em = sk.kmv_estimate(merged, k=64).collect()[0]
    ed = sk.kmv_estimate(direct, k=64).collect()[0]
    assert em.est_distinct == ed.est_distinct


# --- PageRank -------------------------------------------------------------


def test_pagerank_matches_reference_loop(spark):
    """3-iteration decimal PageRank vs a plain-Python replica on a
    small weighted digraph (star + chain), including a rank sink."""
    from time_series_data_trimmer_spark.operators import graph as gr

    edges = [(1, 2, 1.0), (2, 1, 1.0), (1, 3, 2.0), (3, 1, 1.0), (3, 2, 3.0)]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    got = {r.node: r.pagerank for r in gr.pagerank(df, 0.85, 3).collect()}

    def rd9(x):
        import math
        return math.floor(x * 1e9 + 0.5) / 1e9

    nodes = sorted({s for s, _d, _w in edges})
    n = float(len(nodes))
    wdeg = {s: sum(w for s2, _d, w in edges if s2 == s) for s in nodes}
    r = {v: 1.0 / n for v in nodes}
    for _ in range(3):
        inc = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            inc[d] = inc[d] + rd9(r[s] * w / wdeg[s])  # decimal sum == exact here
        r = {v: rd9((1.0 - 0.85) / n + 0.85 * inc[v]) for v in nodes}
    assert got == pytest.approx(r, abs=1e-9)
    # conservation sanity: no dangling nodes -> total mass stays ~1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_uniform_on_symmetric_clique(spark):
    from time_series_data_trimmer_spark.operators import graph as gr

    edges = [(a, b, 1.0) for a in range(4) for b in range(4) if a != b]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    got = [r.pagerank for r in gr.pagerank(df, 0.85, 3).collect()]
    assert all(v == pytest.approx(0.25, abs=1e-9) for v in got)


# --- DSIR importance ------------------------------------------------------


def test_dsir_importance_discriminates(spark):
    """Docs written in the target's vocabulary score higher than docs
    written in a disjoint vocabulary."""
    from time_series_data_trimmer_spark.operators import sampling as sp2

    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta alpha beta") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),   # in-domain
            (2, "zig zag zoom zip zap"),     # out-of-domain
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.importance for r in sp2.dsir_importance(raw, target).collect()}
    assert out[1] > out[2]
    assert out[2] > 0  # smoothing keeps every score positive


def test_dsir_importance_total_over_bigram_docs(docs):
    from time_series_data_trimmer_spark.operators import sampling as sp2

    train = docs.filter(F.col("source") != "src0")
    target = docs.filter(F.col("source") == "src0")
    out = sp2.dsir_importance(train, target)
    # every raw doc with >= 1 bigram is scored
    with_bigram = train.filter(
        F.size(F.split(F.trim(F.col("text")), " ")) >= 2
    ).count()
    assert out.count() == with_bigram
    assert out.filter(F.col("importance") <= 0).count() == 0


# --- autocorrelation peak -------------------------------------------------


def test_autocorr_peak_finds_planted_period(spark):
    """A strict period-3 signal peaks at lag 3 (lags 1-10)."""
    import datetime

    from time_series_data_trimmer_spark.operators import aggregates as ag2

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i), 7, [5.0, 0.0, -5.0][i % 3])
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = ag2.autocorr_peak_lag(df, max_lag=10).collect()
    assert len(out) == 1
    assert out[0].peak_lag == 3
    assert out[0].peak_score > 0


# --- RRF fusion -----------------------------------------------------------


def test_rrf_fuse_matches_manual(spark):
    from time_series_data_trimmer_spark.operators import text as tx2

    lex = spark.createDataFrame(
        [("q", 1, 9.0), ("q", 2, 5.0), ("q", 3, 1.0)],
        "query_id string, doc_id long, score double",
    )
    dense = spark.createDataFrame(
        [("q", 2, 0.9), ("q", 4, 0.8)],
        "query_id string, doc_id long, score double",
    )
    got = {r.doc_id: (r.n_lists, r.rrf_score)
           for r in tx2.rrf_fuse([lex, dense], k=60).collect()}
    import math
    rd9 = lambda x: math.floor(x * 1e9 + 0.5) / 1e9
    assert got[2] == (2, pytest.approx(rd9(rd9(1 / 62.0) + rd9(1 / 61.0)), abs=1e-9))
    assert got[1] == (1, pytest.approx(rd9(1 / 61.0), abs=1e-9))
    assert got[4] == (1, pytest.approx(rd9(1 / 62.0), abs=1e-9))  # dense rank 2
    # doc in both lists outranks single-list docs at comparable ranks
    assert got[2][1] > got[1][1]


def test_rrf_fuse_multi_query_independence(spark):
    """Ranks are per query — a dominant doc in q1 cannot leak into q2."""
    from time_series_data_trimmer_spark.operators import text as tx2

    lst = spark.createDataFrame(
        [("q1", 1, 9.0), ("q1", 2, 5.0), ("q2", 2, 9.0), ("q2", 1, 5.0)],
        "query_id string, doc_id long, score double",
    )
    got = {(r.query_id, r.doc_id): r.rrf_score
           for r in tx2.rrf_fuse([lst], k=60).collect()}
    assert got[("q1", 1)] == got[("q2", 2)]  # both rank 1
    assert got[("q1", 2)] == got[("q2", 1)]  # both rank 2


# --- fuzzy prefix pairs ---------------------------------------------------


def test_fuzzy_prefix_pairs_finds_typos_not_rewrites(spark):
    from time_series_data_trimmer_spark.operators import dedup as dd2

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over it"),
            (2, "the quikc brown fax jumps over it"),   # 3 edits
            (3, "the entirely different text body here"),
            (4, "quick brown fox"),                     # different first token
        ],
        "doc_id long, text string",
    )
    pairs = {(r.id_a, r.id_b): r.edit_dist
             for r in dd2.fuzzy_prefix_pairs(df, prefix_len=32, max_dist=5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 5
    assert all(p == (1, 2) for p in pairs)  # 3 too far, 4 blocked away


# --- token Gini -----------------------------------------------------------


def test_token_gini_extremes(spark):
    from time_series_data_trimmer_spark.operators import text as tx2

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a a b b")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in tx2.token_gini(df).collect()}
    assert got[1].gini == 0.0                      # one repeated token
    assert got[2].gini == pytest.approx(0.75, abs=1e-9)   # all distinct: 1 - 4/16
    assert got[3].gini == pytest.approx(0.5, abs=1e-9)    # two even tokens
    assert got[2].n_distinct == 4 and got[1].n_tokens == 4


# --- equi-depth histogram -------------------------------------------------


def test_equidepth_histogram_depth_and_coverage(events):
    from time_series_data_trimmer_spark.operators import aggregates as ag2

    rows = ag2.equidepth_histogram(events).collect()
    by_key: dict[str, list] = {}
    for r in rows:
        by_key.setdefault(r.event_type, []).append(r)
    total = 0
    for _k, bs in by_key.items():
        bs.sort(key=lambda r: r.bucket)
        n_rows = sum(r.n for r in bs)
        total += n_rows
        # equi-depth: every bucket within 2x of the ideal depth (ties
        # can pile into one bucket, but not explode it arbitrarily)
        ideal = n_rows / len(bs)
        assert all(r.n <= 2 * ideal + 1 for r in bs)
        # buckets tile the value range in order without overlap
        for a, b in zip(bs, bs[1:]):
            assert a.hi <= b.lo
    assert total == events.count()


# --- sorted-neighborhood pairs --------------------------------------------


def test_sorted_neighborhood_no_selfjoin_and_linear_pairs(spark, docs):
    from time_series_data_trimmer_spark.operators import dedup as dd2

    out = dd2.sorted_neighborhood_pairs(docs, window=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # the whole point: no self-join anywhere
    rows = out.collect()
    assert all(r.id_a < r.id_b for r in rows)
    assert all(r.edit_dist <= 5 for r in rows)
    # compare volume is bounded by N*w even before the distance filter
    n = docs.filter(F.col("text").isNotNull()).count()
    assert len(rows) <= n * 3


def test_sorted_neighborhood_finds_adjacent_typos(spark):
    from time_series_data_trimmer_spark.operators import dedup as dd2

    df = spark.createDataFrame(
        [
            (1, "abcd the quick brown fox"),
            (2, "abcd the quikc brown fox"),   # sorts adjacent to 1
            (3, "abcd zzz totally different"),
            (4, "wxyz other block entirely"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.id_a, r.id_b) for r in dd2.sorted_neighborhood_pairs(df, window=3).collect()}
    assert (1, 2) in pairs
    assert all(4 not in p for p in pairs)  # different block


# --- KMV pairwise Jaccard ---------------------------------------------------


def _tok_frame(spark, rows):
    return spark.createDataFrame(rows, "source string, token string")


def test_kmv_jaccard_identical_and_disjoint_groups(spark):
    from time_series_data_trimmer_spark.operators import sketches as sk

    vocab_a = [f"w{i}" for i in range(40)]
    vocab_c = [f"z{i}" for i in range(40)]
    rows = (
        [("a", w) for w in vocab_a]
        + [("b", w) for w in vocab_a]  # b == a exactly
        + [("c", w) for w in vocab_c]  # c disjoint from both
    )
    regs = sk.kmv_registers(_tok_frame(spark, rows), "source", "token", k=64)
    out = {
        (r["src_a"], r["src_b"]): r
        for r in sk.kmv_pairwise_jaccard(regs, k=64).collect()
    }
    assert out[("a", "b")]["jaccard_est"] == 1.0
    assert out[("a", "c")]["jaccard_est"] == 0.0
    assert out[("b", "c")]["jaccard_est"] == 0.0
    # union register counts: |a ∪ b| = 40 hashes, |a ∪ c| = 64 kept of 80
    assert out[("a", "b")]["n_union_kept"] == 40
    assert out[("a", "c")]["n_union_kept"] == 64


def test_kmv_jaccard_estimates_known_overlap(spark):
    from time_series_data_trimmer_spark.operators import sketches as sk

    # 50% true overlap: J = 50/150 = 1/3; k=64 of 150-hash union → ~13% rel err
    shared = [f"s{i}" for i in range(50)]
    rows = [("a", w) for w in shared + [f"a{i}" for i in range(50)]] + [
        ("b", w) for w in shared + [f"b{i}" for i in range(50)]
    ]
    regs = sk.kmv_registers(_tok_frame(spark, rows), "source", "token", k=64)
    r = sk.kmv_pairwise_jaccard(regs, k=64).first()
    assert 0.15 < r["jaccard_est"] < 0.55  # centered on 1/3


# --- vocabulary growth --------------------------------------------------------


def test_vocab_growth_monotone_and_exact_totals(spark, docs):
    out = sorted(
        tx.vocab_growth(docs, n_buckets=10).collect(), key=lambda r: r["bucket"]
    )
    toks = docs.filter(F.col("text").isNotNull()).select(
        F.explode(F.split(F.trim("text"), " ")).alias("tok")
    ).filter(F.length("tok") > 0)
    assert out[-1]["vocab_cum"] == toks.select("tok").distinct().count()
    assert out[-1]["instances_cum"] == toks.count()
    assert out[-1]["docs_cum"] == docs.filter(F.col("text").isNotNull()).count()
    for a, b in zip(out, out[1:]):
        assert a["docs_cum"] <= b["docs_cum"]
        assert a["instances_cum"] <= b["instances_cum"]
        assert a["vocab_cum"] <= b["vocab_cum"]
    # Heaps: vocabulary grows sub-linearly vs instances in the tail —
    # the last tenth adds proportionally fewer NEW tokens than the first
    first_rate = out[0]["vocab_cum"] / max(out[0]["instances_cum"], 1)
    last_rate = (out[-1]["vocab_cum"] - out[-2]["vocab_cum"]) / max(
        out[-1]["instances_cum"] - out[-2]["instances_cum"], 1
    )
    assert last_rate <= first_rate


# --- CCNet buckets -------------------------------------------------------------


def test_ccnet_buckets_cover_and_order(spark):
    import __spark_entry__ as entry

    q = entry.queries()["pipeline_ccnet_buckets"]
    rows = q(spark, SF_DIR).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    scored_total = sum(r["n_docs"] for r in rows)
    assert scored_total > 0
    for lang, buckets in by_lang.items():
        n = sum(r["n_docs"] for r in buckets.values())
        # terciles within tie slack: each present bucket holds >= 1 doc,
        # and head gets at least its floor share when n >= 3
        if n >= 3 and "head" in buckets:
            assert buckets["head"]["n_docs"] >= n // 3 - 1
        # fluency ordering: head (lowest nll) <= middle <= tail
        means = [
            buckets[b]["mean_nll"]
            for b in ("head", "middle", "tail")
            if b in buckets
        ]
        assert means == sorted(means), (lang, means)
