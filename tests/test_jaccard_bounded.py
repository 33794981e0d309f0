"""Bounded n-gram Jaccard blocking: a skewed length distribution must
not explode the within-bucket quadratic pairing."""

import pandas as pd
from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators.dedup import (
    ngram_jaccard_overflow,
    ngram_jaccard_pairs,
)

CAP = 10


def _skewed(spark, n=200):
    """All docs land in the SAME length bucket (equal length ±1 word):
    the worst case for length-bucket blocking — n²/2 pairs unbounded."""
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(12)))
        for i in range(n)
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_capped_pair_count_is_bounded(spark):
    df = _skewed(spark)
    unbounded = ngram_jaccard_pairs(df, max_bucket=None).count()
    assert unbounded > 10_000  # the skew really is quadratic

    capped = ngram_jaccard_pairs(df, max_bucket=CAP)
    # ≤ CAP docs survive per block; with B blocks the pair count is
    # ≤ B · CAP·(CAP-1)/2 — here every doc shares ~2 blocks
    assert capped.count() <= 2 * CAP * (CAP - 1) // 2


def test_cap_is_deterministic_prefix_by_id(spark):
    df = _skewed(spark)
    capped = ngram_jaccard_pairs(df, max_bucket=CAP)
    ids = {r["id_a"] for r in capped.collect()} | {
        r["id_b"] for r in capped.collect()
    }
    # survivors are the lowest ids of each block (deterministic truncation)
    assert ids and max(ids) < CAP


def test_overflow_report_names_truncated_buckets(spark):
    df = _skewed(spark, n=200)
    report = ngram_jaccard_overflow(df, CAP).collect()
    assert report, "skewed data must produce an overflow report"
    total_dropped = sum(r["n_dropped"] for r in report)
    # 200 docs × 2 blocks = 400 memberships; ≤ CAP kept per block
    assert total_dropped >= 400 - CAP * len(report) - 1
    for r in report:
        assert r["n_docs"] > CAP
        assert r["n_dropped"] == r["n_docs"] - CAP


def test_default_is_bounded_and_small_corpus_results_unchanged(spark):
    # the DEFAULT is now the bounded form (DEFAULT_MAX_BUCKET); on a
    # corpus below the cap it returns exactly the unbounded answer, and
    # unbounded pairing is strictly opt-in via max_bucket=None
    from time_series_data_trimmer_spark.operators.dedup import DEFAULT_MAX_BUCKET

    assert DEFAULT_MAX_BUCKET is not None and DEFAULT_MAX_BUCKET > 0
    rows = [(0, "a b c d e f"), (1, "a b c d e g"), (2, "x y z p q r")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = ngram_jaccard_pairs(df, min_jaccard=0.2).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(0, 1)}
    explicit = ngram_jaccard_pairs(df, min_jaccard=0.2, max_bucket=None).collect()
    assert {(r["id_a"], r["id_b"]) for r in explicit} == {(0, 1)}


def test_default_cap_bounds_skewed_corpus(spark):
    # same skewed corpus as above, but through the DEFAULT call — the
    # point of the r3 change: no parameter needed for the bound to hold
    from time_series_data_trimmer_spark.operators import dedup as dd

    old = dd.DEFAULT_MAX_BUCKET
    dd.DEFAULT_MAX_BUCKET = CAP  # shrink the cap so 200 docs overflow it
    try:
        capped = ngram_jaccard_pairs(_skewed(spark), max_bucket=dd.DEFAULT_MAX_BUCKET)
        assert capped.count() <= 2 * CAP * (CAP - 1) // 2
    finally:
        dd.DEFAULT_MAX_BUCKET = old


def _brute_jaccard(rows, n=3, tau=0.2):
    def shingles(text):
        w = text.split(" ")
        if len(w) >= n:
            return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}
        return {" ".join(w)}

    sets = {i: shingles(t) for i, t in rows}
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            j = inter / union
            if j >= tau:
                out[(a, b)] = j
    return out


def test_prefix_join_equals_brute_force(spark):
    # planted near-dups + random docs: PPJoin-style prefix filtering
    # must reproduce the exhaustive τ-Jaccard answer EXACTLY (zero
    # false negatives is the operator's contract)
    import random

    from time_series_data_trimmer_spark.operators.dedup import (
        ngram_jaccard_prefix_pairs,
    )

    rng = random.Random(7)
    rows = [
        (i, " ".join(f"t{rng.randrange(40)}" for _ in range(20))) for i in range(80)
    ]
    for i in range(10):  # plant near-dups of the first ten docs
        words = rows[i][1].split()
        words[3] = "X"
        rows.append((200 + i, " ".join(words)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_prefix_pairs(df, min_jaccard=0.2).collect()
    }
    want = _brute_jaccard(rows, tau=0.2)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12
    assert any(a < 100 <= b for a, b in got), "planted dups must be found"


def test_prefix_join_exact_integer_boundary(spark):
    # r3 advice counterexample: τ·|doc| lands on an exact integer for
    # BOTH docs, so the old sz - floor(τ·sz) prefix was one gram short
    # and the qualifying pair had no common gram in either prefix.
    # 'w1..w6' → 4 shingles, 'w3..w6' → 2; J = 2/4 = 0.5 exactly.
    from time_series_data_trimmer_spark.operators.dedup import (
        ngram_jaccard_prefix_pairs,
    )

    rows = [(1, "w1 w2 w3 w4 w5 w6"), (2, "w3 w4 w5 w6")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_prefix_pairs(df, min_jaccard=0.5).collect()
    }
    assert got == {(1, 2): 0.5}, got


def test_prefix_join_boundary_sweep(spark):
    # sweep τ over values that hit integer τ·sz products on many sizes
    # (incl. non-dyadic τ where binary floats jitter) and check the
    # operator against brute force each time — the filters must only
    # prune, never drop a qualifying pair.
    import random

    from time_series_data_trimmer_spark.operators.dedup import (
        ngram_jaccard_prefix_pairs,
    )

    rng = random.Random(13)
    rows = []
    doc_id = 0
    # subset chains: doc k = first (4 + k) words of a 16-word base —
    # pairwise Jaccards land on many exact rationals
    base = [f"s{i}" for i in range(16)]
    for k in range(8):
        rows.append((doc_id, " ".join(base[: 4 + k])))
        doc_id += 1
    for _ in range(30):  # noise docs
        rows.append((doc_id, " ".join(f"t{rng.randrange(30)}" for _ in range(12))))
        doc_id += 1
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    for tau in (0.2, 0.25, 0.5, 0.75):
        got = {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_prefix_pairs(df, min_jaccard=tau).collect()
        }
        want = set(_brute_jaccard(rows, tau=tau))
        assert got == want, f"tau={tau}: missing={want - got} extra={got - want}"


def test_prefix_join_rejects_nonpositive_tau(spark):
    import pytest as _pytest

    from time_series_data_trimmer_spark.operators.dedup import (
        ngram_jaccard_prefix_pairs,
    )

    df = spark.createDataFrame(pd.DataFrame([(0, "a b c")], columns=["doc_id", "text"]))
    with _pytest.raises(ValueError):
        ngram_jaccard_prefix_pairs(df, min_jaccard=0.0)


def _capped_ref(rows, n=3, tau=0.2, cap=5, length_bucket=64):
    """Python reference for the CAPPED τ>0 semantics: explode each doc
    to its (bucket, bucket+1) blocks, keep the first `cap` doc ids per
    block, emit every co-surviving pair that shares ≥1 gram with
    Jaccard ≥ τ."""
    from collections import defaultdict

    def shingles(text):
        w = text.split(" ")
        if len(w) >= n:
            return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}
        return {" ".join(w)}

    blocks = defaultdict(list)
    for i, t in rows:
        b = len(t) // length_bucket
        for blk in (b, b + 1):
            blocks[blk].append(i)
    sets = {i: shingles(t) for i, t in rows}
    out = {}
    for blk, ids in blocks.items():
        surv = sorted(ids)[:cap]
        for x in range(len(surv)):
            for y in range(x + 1, len(surv)):
                a, b = surv[x], surv[y]
                inter = len(sets[a] & sets[b])
                if inter == 0:
                    continue
                j = inter / len(sets[a] | sets[b])
                if j >= tau:
                    out[(a, b)] = j
    return out


def _dup_dense_rows(n_families=8, copies=5):
    """Byte-identical families (the corpus shape the r5 digest-collapse
    targets) plus one near-dup variant per family."""
    rows, did = [], 0
    for f in range(n_families):
        words = [f"t{f}w{j}" for j in range(12)]
        text = " ".join(words)
        near = " ".join(words[:-1] + [f"zz{f}"])
        for _ in range(copies):
            rows.append((did, text))
            did += 1
        rows.append((did, near))
        did += 1
    return rows


def test_digest_collapsed_equals_reference_no_cap(spark):
    # r5: the capped τ>0 path is digest-collapsed; with the cap not
    # binding it must equal the plain blocked-Jaccard answer, including
    # the intra-family 1.0 pairs generated from membership alone
    rows = _dup_dense_rows()
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, min_jaccard=0.2, max_bucket=10_000).collect()
    }
    want = _capped_ref(rows, cap=10_000)
    assert got == want
    # sanity: the corpus really is dup-dense and families pair at 1.0
    assert sum(1 for j in got.values() if j == 1.0) >= 8 * (5 * 4 // 2)


def test_digest_collapsed_cap_splits_families_exactly(spark):
    # the cap is per DOC, so a byte-identical family straddling the cap
    # boundary must contribute only its surviving members' pairs — the
    # per-block co-survival join preserves doc-level cap semantics
    rows = _dup_dense_rows(n_families=6, copies=5)
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    for cap in (3, 7, 12):
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(df, min_jaccard=0.2, max_bucket=cap).collect()
        }
        want = _capped_ref(rows, cap=cap)
        assert got == want, f"cap={cap}"


def test_digest_collapsed_null_text_sane(spark):
    # NULL texts group under the sentinel digest: they pair with each
    # other (word_shingles gives them the single "" shingle) and never
    # self-pair or cross-pair with real text
    rows = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": [None, None, "a b c d e f"]}
    )
    df = spark.createDataFrame(rows)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, min_jaccard=0.2).collect()
    }
    assert got == {(1, 2): 1.0}


def test_null_text_corpus_matches_sql_oracle(spark, tmp_path):
    """The registered dedup_ngram_jaccard oracle reproduces the digest
    path on a corpus WITH NULL texts (r5: NULL-safe block membership +
    coalesced grams in the SQL) — the divergence the r5 review flagged
    as latent is now gate-checked, not just documented."""
    import duckdb

    import __spark_entry__ as entry

    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [None, None, "a b c d e f", "a b c d e f"],
        }
    )
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows).coalesce(1).write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in entry.queries()["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    odf = con.execute(entry.oracle_sql()["dedup_ngram_jaccard"]).df()
    want = {
        (int(r.id_a), int(r.id_b), float(r.jaccard)) for r in odf.itertuples()
    }
    assert got == want
    assert (1, 2, 1.0) in got and (3, 4, 1.0) in got
