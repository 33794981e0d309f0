"""Wave 18: point-in-time SCD2 join, leakage-safe rolling features,
dedup impact report — the feature-store / mix-accounting trio.

The leakage property is the point: every test here checks that NOTHING
from t (or later) reaches a feature computed "as of t".
"""

import datetime as dt
import os
import sys
import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _write_events(spark, rows, d):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )


def test_pointintime_never_future_state(spark):
    """A purchase BEFORE any browse event gets a NULL state; a purchase
    between states gets the EARLIER state even though a later one is
    closer in time."""
    t0 = dt.datetime(2024, 1, 1)

    def ev(i, mins, typ):
        return Row(event_id=i, ts=t0 + dt.timedelta(minutes=mins),
                   user_id=7, event_type=typ, value=1.0)

    rows = [
        ev(1, 10, "purchase"),   # before any state -> NULL
        ev(2, 20, "view"),       # state v1: view from t+20
        ev(3, 30, "purchase"),   # inside view state
        ev(4, 40, "click"),      # state v2: click from t+40
        ev(5, 39, "purchase"),   # 1 min before click state -> still view
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, rows, d)
        out = {
            r["event_id"]: r
            for r in entry.queries()["feature_pointintime_state"](
                spark, d
            ).collect()
        }
    assert out[1]["state_type"] is None
    assert out[3]["state_type"] == "view"
    assert out[5]["state_type"] == "view"  # the future click state must not leak
    assert out[3]["state_age_us"] == 10 * 60_000_000


def test_rolling_past_excludes_now_and_far_past(spark):
    """The RANGE frame excludes the current instant (ties included) and
    anything older than 7 days."""
    t0 = dt.datetime(2024, 1, 10)

    def ev(i, delta, v):
        return Row(event_id=i, ts=t0 + delta, user_id=1,
                   event_type="view", value=float(v))

    rows = [
        ev(1, dt.timedelta(days=-12), 100.0),  # >7d before every other row
        ev(2, dt.timedelta(days=-3), 10.0),    # inside
        ev(3, dt.timedelta(0), 1.0),           # tie with 4: must not see 4
        ev(4, dt.timedelta(0), 2.0),           # tie with 3: must not see 3
        ev(5, dt.timedelta(minutes=1), 5.0),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, rows, d)
        out = {
            r["event_id"]: r
            for r in entry.queries()["feature_rolling_past_window"](
                spark, d
            ).collect()
        }
    assert out[2]["n_past_7d"] == 0  # ev1 is 8 days old
    assert out[3]["n_past_7d"] == 1 and out[3]["sum_value_past_7d"] == 10.0
    assert out[4]["n_past_7d"] == 1 and out[4]["sum_value_past_7d"] == 10.0
    # ev5 sees both tied rows plus ev2
    assert out[5]["n_past_7d"] == 3
    assert out[5]["sum_value_past_7d"] == 13.0


def test_dedup_impact_orderings(spark):
    """Per source: near-dedup survivors <= exact survivors <= raw (LSH
    clusters exact dups too, so near is the strictest); totals
    reconcile with the corpus."""
    rows = entry.queries()["dedup_impact_by_source"](spark, SF).collect()
    assert rows
    from time_series_data_trimmer_spark.queries import _table

    docs = _table(spark, SF, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert r["n_docs_near"] <= r["n_docs_exact"] <= r["n_docs"]
        assert r["n_tokens_near"] <= r["n_tokens_exact"] <= r["n_tokens"]
        assert 0.0 <= r["pct_tokens_removed_near"] <= 1.0
