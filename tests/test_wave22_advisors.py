"""Wave 22: partition advisor, A/B power composition, SAX motifs."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_partition_advisor_invariants(spark):
    rows = {r["part_col"]: r
            for r in entry.queries()["layout_partition_advisor"](spark, SF).collect()}
    assert set(rows) == {"event_type", "user_id", "event_day"}
    totals = {r["total_rows"] for r in rows.values()}
    assert len(totals) == 1  # every candidate keying covers the same scan
    for r in rows.values():
        assert r["skew_ratio"] >= 1.0 - 1e-6
        assert r["max_part_rows"] * r["n_partitions"] >= r["total_rows"]
        assert r["advisable"] in (0, 1)
    # event_type: 5 values, near-uniform synthetic data -> advisable
    assert rows["event_type"]["n_partitions"] <= 10
    assert rows["event_type"]["advisable"] == 1


def test_ab_power_cuped_never_worse(spark):
    r = entry.queries()["stats_ab_power"](spark, SF).collect()[0]
    assert r["n_required_cuped"] <= r["n_required_raw"]
    assert 0.0 <= r["sample_saving"] < 1.0
    assert r["n_required_raw"] > 0


def test_sax_motifs_ranked(spark):
    rows = entry.queries()["ts_sax_motifs"](spark, SF).collect()
    assert rows
    by_user = {}
    for r in rows:
        assert 1 <= r["rank"] <= 3
        assert len(r["word"]) == 4 and set(r["word"]) <= set("abcd")
        by_user.setdefault(r["user_id"], []).append(r)
    for rs in by_user.values():
        rs.sort(key=lambda r: r["rank"])
        cnts = [r["cnt"] for r in rs]
        assert cnts == sorted(cnts, reverse=True)
