"""Wave-36: isotonic calibration (PAVA identities) and the
k-anonymity audit's partition contract."""

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _pava_ref(ns, ps):
    """Textbook pool-adjacent-violators on (count, pass) blocks."""
    stack = []
    for n, p in zip(ns, ps):
        stack.append([n, p])
        while len(stack) > 1 and (
            stack[-2][1] * stack[-1][0] > stack[-1][1] * stack[-2][0]
        ):  # rate[-2] > rate[-1] -> pool (exact integer cross-compare)
            n2, p2 = stack.pop()
            stack[-1][0] += n2
            stack[-1][1] += p2
    expanded, idx = [], 0
    for n, p in stack:
        acc = 0
        cnt = 0
        while acc < n:  # how many original bins this block pooled
            acc += ns[idx]
            idx += 1
            cnt += 1
        expanded.extend([p / n] * cnt)
    return expanded


def test_isotonic_matches_textbook_pava_and_is_monotone(spark):
    rows = sorted(
        entry.queries()["eval_isotonic_calibration"](spark, SF).collect(),
        key=lambda r: r["bin"],
    )
    ns = [r["n_docs"] for r in rows]
    ps = [r["n_pass"] for r in rows]
    want = _pava_ref(ns, ps)
    got = [r["iso_rate"] for r in rows]
    for g, w in zip(got, want):
        assert g == pytest.approx(w, abs=1e-6)
    assert all(a <= b + 1e-12 for a, b in zip(got, got[1:]))  # monotone
    # PAVA preserves the weighted mean exactly
    assert sum(g * n for g, n in zip(want, ns)) == pytest.approx(sum(ps))


def test_k_anonymity_partitions_corpus(spark):
    rows = entry.queries()["privacy_k_anonymity_audit"](spark, SF).collect()
    n_docs = sum(r["n_docs"] for r in rows)
    import duckdb

    con = duckdb.connect()
    (total,) = con.execute(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()
    assert n_docs == total  # risk classes partition the corpus
    for r in rows:
        assert r["min_k"] >= 1 and r["min_k"] <= r["max_k"]
        if r["risk_class"] == "k=1 unique":
            assert r["n_groups"] == r["n_docs"]
