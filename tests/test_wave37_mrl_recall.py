"""Wave-37: Matryoshka recall sweep — identity row, monotonicity, and
the recall==|truth ∩ shortlist| accounting."""

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_mrl_recall_identities(spark):
    rows = sorted(
        entry.queries()["emb_matryoshka_recall_by_dim"](spark, SF).collect(),
        key=lambda r: r["prefix_dims"],
    )
    assert [r["prefix_dims"] for r in rows] == [8, 16, 32, 64]
    # full-dim shortlist (40) always contains the full-dim top-10
    assert rows[-1]["recall_at_10"] == 1.0
    assert rows[-1]["n_hits"] == 80  # 8 probes x 10
    for r in rows:
        assert 0 <= r["n_hits"] <= 80
        assert abs(r["recall_at_10"] - r["n_hits"] / 80.0) < 1e-9
    # prefix quality grows with dims on this corpus (random embeddings:
    # strictly more coordinates -> strictly better cosine estimate)
    recalls = [r["recall_at_10"] for r in rows]
    assert recalls == sorted(recalls)
