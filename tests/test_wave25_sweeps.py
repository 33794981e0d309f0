"""Wave 25: SemDeDup τ-sensitivity sweep and measured LSH recall."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_tau_sweep_monotone(spark):
    """Higher τ can only shrink pairs and drops; drop_frac in [0, 1];
    the lowest-τ row covers every higher row's pairs."""
    rows = sorted(
        entry.queries()["dedup_semantic_tau_sweep"](spark, SF).collect(),
        key=lambda r: r["tau"],
    )
    assert [r["tau"] for r in rows] == [0.5, 0.7, 0.9]
    for a, b in zip(rows, rows[1:]):
        assert a["n_pairs"] >= b["n_pairs"]
        assert a["n_dropped"] >= b["n_dropped"]
    for r in rows:
        assert 0.0 <= r["drop_frac"] <= 1.0
        assert r["n_dropped"] <= r["n_pairs"] or r["n_pairs"] == 0


def test_recall_monotone_and_bounded(spark):
    """Nested buckets: recall and candidate volume both monotone
    non-increasing in bits; recall@10 in [0, 1]; 10 bits on ~50 vecs
    still finds SOMETHING or reports honestly."""
    rows = {
        r["n_bits"]: r
        for r in entry.queries()["emb_lsh_recall_by_bits"](spark, SF).collect()
    }
    assert set(rows) == {6, 8, 10}
    assert (
        rows[6]["recall_at_10"]
        >= rows[8]["recall_at_10"]
        >= rows[10]["recall_at_10"]
    )
    assert (
        rows[6]["n_candidates"]
        >= rows[8]["n_candidates"]
        >= rows[10]["n_candidates"]
    )
    for r in rows.values():
        assert 0.0 <= r["recall_at_10"] <= 1.0


def test_nprobe_recall_monotone(spark):
    """More probed cells can only help: recall monotone non-decreasing
    in nprobe; nprobe covering all cells would be exact (recall at the
    largest swept value is already high on this corpus)."""
    rows = {
        r["nprobe"]: r
        for r in entry.queries()["sim_ivf_nprobe_recall"](spark, SF).collect()
    }
    assert set(rows) == {1, 2, 4}
    assert (
        rows[1]["recall_at_10"]
        <= rows[2]["recall_at_10"]
        <= rows[4]["recall_at_10"]
    )
    for r in rows.values():
        assert 0.0 <= r["recall_at_10"] <= 1.0
        assert r["n_hits"] == round(r["recall_at_10"] * 50)
