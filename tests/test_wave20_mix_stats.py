"""Wave 20: dedup-then-budget composition, CUPED, freshness audit."""

import datetime as dt
import os
import sys
import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from time_series_data_trimmer_spark.operators import dedup as dd

SF = "/root/testdata/sf0.001"


def test_budget_after_dedup_only_survivors(spark):
    """Every budgeted doc is a near-dedup survivor and every source
    stays within budget."""
    from time_series_data_trimmer_spark.queries import _table

    out = entry.queries()["mix_budget_after_dedup"](spark, SF).collect()
    assert out
    assert all(r["cum_tokens"] <= 600 for r in out)
    docs = _table(spark, SF, "documents")
    pairs = dd.minhash_lsh_pairs(docs).select("id_a", "id_b")
    comp = dd.connected_components(pairs, all_ids=docs.select("doc_id"))
    keep = {
        r["doc_id"]
        for r in comp.filter(F.col("doc_id") == F.col("cluster_id")).collect()
    }
    assert all(r["doc_id"] in keep for r in out)


def test_cuped_perfect_covariate(spark):
    """If each user's second-half values repeat the first half exactly,
    y == x per user, so theta == 1 and the adjustment removes ~all
    variance."""
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u, v in [(1, 3.0), (2, 7.0), (3, 20.0)]:
        for half_shift in (0, 30):
            eid += 1
            rows.append(
                Row(event_id=eid, ts=t0 + dt.timedelta(days=half_shift),
                    user_id=u, event_type="view", value=v)
            )
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.mode("overwrite").parquet(
            os.path.join(d, "events.parquet")
        )
        out = entry.queries()["stats_cuped_halves"](spark, d).collect()[0]
    assert out["n_users"] == 3
    assert abs(out["theta"] - 1.0) < 1e-6
    assert abs(out["variance_reduction"] - 1.0) < 1e-4
    assert out["var_y_adjusted"] < 1e-6


def test_freshness_lags(spark):
    """The globally-freshest type has lag 0; all lags non-negative."""
    out = entry.queries()["dq_freshness_by_type"](spark, SF).collect()
    assert out
    assert min(r["lag_us"] for r in out) == 0
    assert all(r["lag_us"] >= 0 for r in out)
    for r in out:
        assert r["stale_flag"] == (1 if r["lag_us"] > 21_600_000_000 else 0)
