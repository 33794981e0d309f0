"""Wave-33: NDCG@k — weight-table exactness, hand-computed toy, and
the MRR/NDCG consistency relation on real data."""

import math

import pytest

import __spark_entry__ as entry
from time_series_data_trimmer_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


def test_ndcg_weights_table():
    ws, idcg = sim.ndcg_weights(10)
    assert ws[0] == 1.0 and ws[1] == round(1 / math.log2(3), 9)
    assert len(ws) == len(idcg) == 10
    # prefix sums are exactly cumulative (Decimal-exact on the 9-dp grid)
    acc = 0.0
    for w, s in zip(ws, idcg):
        acc = round(acc + w, 9)
        assert s == pytest.approx(acc, abs=1e-12)
    assert all(a > b for a, b in zip(ws, ws[1:]))  # position discount


def test_ndcg_toy_perfect_vs_buried(spark):
    # 4 vectors: q's only relevant neighbor either top-ranked or rank-3
    # cluster geometry: label 1 = {0, 1}; vec 0 is the query of interest
    rows_perfect = [
        (0, [1.0, 0.0, 0.0, 0.0], 1),
        (1, [0.99, 0.14, 0.0, 0.0], 1),   # closest -> rank 1
        (2, [0.7, 0.7, 0.1, 0.0], 2),
        (3, [0.0, 1.0, 0.0, 0.0], 2),
    ]
    rows_buried = [
        (0, [1.0, 0.0, 0.0, 0.0], 1),
        (1, [0.5, 0.86, 0.0, 0.0], 1),    # two label-2 vecs rank above
        (2, [0.99, 0.14, 0.0, 0.0], 2),
        (3, [0.97, 0.24, 0.0, 0.0], 2),
    ]

    def ndcg0(rows):
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = sim.retrieval_ndcg(df, k=10, bits=1, tables=1, dim=4)
        return {r["label"]: r["ndcg"] for r in out.collect()}

    # with bits=1/tables=1 nearly everything shares a block -> full rank
    perfect = ndcg0(rows_perfect)[1]
    buried = ndcg0(rows_buried)[1]
    assert perfect > buried


def test_registered_ndcg_vs_mrr(spark):
    qs = entry.queries()
    ndcg = {r["label"]: r for r in qs["emb_retrieval_ndcg"](spark, SF).collect()}
    mrr = {r["label"]: r for r in qs["emb_retrieval_mrr"](spark, SF).collect()}
    assert set(ndcg) == set(mrr)
    for lbl, r in ndcg.items():
        assert 0.0 <= r["ndcg"] <= 1.0
        assert r["n_queries"] == mrr[lbl]["n_queries"]
        # every MRR miss (no relevant candidate anywhere) is an NDCG
        # zero; NDCG may add zeros for hits buried below k
        assert r["n_zero"] >= r["n_queries"] - mrr[lbl]["n_hit"]
