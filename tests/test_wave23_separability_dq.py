"""Wave 23: closed-form label separability and row-level quarantine."""

import math
import os
import sys

from pyspark.sql import Row

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_separability_closed_form_vs_bruteforce(spark):
    """On a tiny corpus, the closed-form means equal the brute-force
    pairwise means computed in Python."""
    import tempfile

    import numpy as np

    rng = [
        ("a", [1.0, 0.2, 0.0, 0.1]),
        ("a", [0.9, 0.3, 0.1, 0.0]),
        ("a", [1.1, 0.1, 0.0, 0.2]),
        ("b", [0.0, 0.1, 1.0, 0.8]),
        ("b", [0.1, 0.0, 0.9, 1.0]),
    ]
    rows = [
        Row(vec_id=i, label=lbl, embedding=v) for i, (lbl, v) in enumerate(rng)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.mode("overwrite").parquet(
            os.path.join(d, "embeddings.parquet")
        )
        out = {
            r["label"]: r
            for r in entry.queries()["emb_separability_by_label"](
                spark, d
            ).collect()
        }
    units = {}
    for i, (lbl, v) in enumerate(rng):
        a = np.array(v)
        units.setdefault(lbl, []).append(a / np.linalg.norm(a))
    for lbl, us in units.items():
        n = len(us)
        intra = (
            sum(float(np.dot(us[i], us[j]))
                for i in range(n) for j in range(n) if i != j)
            / (n * (n - 1))
        )
        others = [u for l2, vs in units.items() if l2 != lbl for u in vs]
        inter = sum(
            float(np.dot(u, o)) for u in us for o in others
        ) / (n * len(others))
        assert abs(out[lbl]["intra_mean_cos"] - intra) < 1e-5
        assert abs(out[lbl]["inter_mean_cos"] - inter) < 1e-5
        assert out[lbl]["separability_gap"] > 0  # the two clusters separate


def test_separability_real_bounds(spark):
    for r in entry.queries()["emb_separability_by_label"](spark, SF).collect():
        assert -1.0 - 1e-6 <= r["intra_mean_cos"] <= 1.0 + 1e-6
        assert -1.0 - 1e-6 <= r["inter_mean_cos"] <= 1.0 + 1e-6
        assert math.isclose(
            r["separability_gap"],
            r["intra_mean_cos"] - r["inter_mean_cos"],
            abs_tol=2e-6,
        )


def test_quarantine_reconciles_with_report(spark):
    """Per-rule row counts in the quarantine equal the report's
    violation counts for orders-table rules."""
    q = entry.queries()["dq_quarantine_rows"](spark, SF).collect()
    rep = {
        r["rule"]: r["n_violations"]
        for r in entry.queries()["dq_expectations_report"](spark, SF).collect()
    }
    from collections import Counter

    per_rule = Counter()
    for r in q:
        assert r["n_reasons"] == len(r["reasons"].split(","))
        for reason in r["reasons"].split(","):
            per_rule[reason] += 1
    assert per_rule.get("in_set(o_orderstatus)", 0) == rep["in_set(o_orderstatus)"]
    assert per_rule.get("priority_format", 0) == rep["priority_format"]
    assert (
        per_rule.get("in_range(o_totalprice)", 0)
        == rep["in_range(o_totalprice,0.0,100000.0)"]
    )
