"""Physical-plan shape assertions for the r3 join-family queries —
the properties PLANS.md claims, locked in as tests.

All assertions run on the optimizer output (explain text) at sf0.001:
no query executes, so regressions here are pure plan regressions.
"""

import contextlib
import io

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = entry.queries()[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q19_disjunction_pushed_to_both_scans(spark):
    plan = _plan(spark, "tpch_q19_disjunctive_revenue")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    or_scans = [ln for ln in pushed if "Or(" in ln]
    # the quantity disjunction reaches the lineitem scan AND the
    # brand/size disjunction reaches the part scan
    assert len(or_scans) >= 2, f"OR predicates not pushed to both scans:\n{pushed}"
    assert any("l_quantity" in ln for ln in or_scans)
    assert any("p_brand" in ln for ln in or_scans)
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q21_semi_and_anti_are_shuffled_hash(spark):
    plan = _plan(spark, "tpch_q21_waiting_supplier")
    assert "Join type: LeftSemi" in plan
    assert "Join type: LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q22_only_bnlj_is_the_one_row_scalar_broadcast(spark):
    plan = _plan(spark, "tpch_q22_global_sales_opportunity")
    assert "Join type: LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    # exactly one BNLJ: the 1-row scalar-subquery cross join
    assert plan.count("BroadcastNestedLoopJoin") <= 2  # node + detail line
    assert "Cross" in plan


def test_simhash_pairs_plan_has_no_joins(spark):
    # bucket-local pair explosion: the fingerprint aggregation must
    # execute once, with NO self-join anywhere in the plan
    plan = _plan(spark, "dedup_simhash_pairs")
    for node in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan, f"unexpected {node} in simhash_pairs plan"


def test_sampling_queries_have_no_shuffle(spark):
    # scan-side membership: no Exchange in the Bernoulli/stratified plans
    for name in ("sample_hash_bernoulli", "sample_stratified_by_source"):
        plan = _plan(spark, name)
        body = plan.split("===== Subqueries")[0]
        assert "Exchange" not in body, f"{name} plans a shuffle:\n{body}"
