"""N-adaptive combinatorial SimHash blocking: layout selection, recall
vs brute force, and parity across layouts."""

import itertools

import pandas as pd
import pytest
from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import dedup as dd


def test_chunk_plan_pigeonhole_and_adaptivity():
    # default (no corpus size): 30-bit keys → m=6, C(6,3)=20 combos
    m, combos = dd.simhash_chunk_plan(3)
    assert m == 6 and len(combos) == 20
    assert combos == list(itertools.combinations(range(6), 3))
    # a 10^9-doc corpus needs ~40-bit keys → the rule widens to m=10
    m_big, combos_big = dd.simhash_chunk_plan(3, n_docs=10**9)
    assert (m_big - 3) * (60 // m_big) >= 40
    assert len(combos_big) <= dd.SIMHASH_MAX_KEYS_PER_DOC
    # tiny corpus: the rule may narrow keys (cheaper — fewer keys/doc)
    # but always covers log2(N) + 10 margin bits
    m_small, _ = dd.simhash_chunk_plan(3, n_docs=100)
    assert (m_small - 3) * (60 // m_small) >= 17
    # explicit layout must divide 60 and exceed max_hamming
    with pytest.raises(ValueError):
        dd.simhash_chunk_plan(3, n_chunks=7)
    with pytest.raises(ValueError):
        dd.simhash_chunk_plan(3, n_chunks=3)


def _near_dup_docs(spark):
    """50 base docs plus 10 near-duplicates (one token changed)."""
    base = [
        (i, " ".join(f"tok{(i * 13 + j) % 97}" for j in range(30)))
        for i in range(50)
    ]
    dups = []
    for i in range(10):
        words = base[i][1].split()
        words[5] = "CHANGED"
        dups.append((100 + i, " ".join(words)))
    return spark.createDataFrame(
        pd.DataFrame(base + dups, columns=["doc_id", "text"])
    )


def test_blocking_recall_vs_brute_force(spark):
    fp = dd.simhash(_near_dup_docs(spark))
    rows = fp.collect()
    brute = set()
    for a, b in itertools.combinations(sorted(rows, key=lambda r: r["doc_id"]), 2):
        if bin(a["simhash"] ^ b["simhash"]).count("1") <= 3:
            brute.add((a["doc_id"], b["doc_id"]))
    # pigeonhole guarantee: blocked pair set == brute force EXACTLY,
    # for both the default layout and a wider adaptive one
    for kwargs in ({}, {"n_chunks": 10}, {"n_docs": 10**9}):
        got = {
            (r["id_a"], r["id_b"])
            for r in dd.simhash_pairs(fp, max_hamming=3, **kwargs).collect()
        }
        assert got == brute, f"layout {kwargs} missed/invented pairs"


def test_bucket_population_shrinks_with_wider_keys(spark):
    """The scale argument made observable: expected bucket size under the
    m=6 layout (30-bit keys) is 2^15× smaller than the old fixed 4×15-bit
    layout; on real data the max bucket must not grow."""
    fp = dd.simhash(_near_dup_docs(spark))

    def max_bucket(m):
        mm, combos = dd.simhash_chunk_plan(3, n_chunks=m)
        width = dd.SIMHASH_BITS // mm
        mask = (1 << width) - 1
        keyed = fp.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(ci).alias("ck"),
                            sum(
                                (
                                    F.shiftleft(
                                        F.shiftright(F.col("simhash"), c * width).bitwiseAND(F.lit(mask)),
                                        pos * width,
                                    )
                                    for pos, c in enumerate(combo)
                                ),
                                F.lit(0),
                            ).alias("cv"),
                        )
                        for ci, combo in enumerate(combos)
                    ]
                )
            ).alias("k"),
        )
        return (
            keyed.groupBy("k.ck", "k.cv").count().agg(F.max("count")).collect()[0][0]
        )

    assert max_bucket(6) <= max_bucket(4)
