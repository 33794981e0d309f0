"""Wave 21: JSD source divergence and Adamic-Adar link prediction."""

import datetime as dt
import math
import os
import sys
import tempfile

from pyspark.sql import Row

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_jsd_two_disjoint_sources(spark):
    """Two sources with disjoint vocabularies and equal token mass:
    each sits at the hand-computable JSD
    0.5·log2(4/3) + 0.25·log2(2/3) + 0.25 ≈ 0.311278 bits from the
    50/50 corpus blend."""
    rows = [
        Row(doc_id=1, text="aa bb cc dd", lang="en", source="s1", n_chars=11),
        Row(doc_id=2, text="ee ff gg hh", lang="en", source="s2", n_chars=11),
    ]
    expect = 0.5 * math.log2(4 / 3) + 0.25 * math.log2(2 / 3) + 0.25
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        out = entry.queries()["text_jsd_source_divergence"](spark, d).collect()
    got = {r["source"]: r["jsd_bits"] for r in out}
    assert abs(got["s1"] - expect) < 1e-4
    assert abs(got["s2"] - expect) < 1e-4


def test_jsd_single_source_zero(spark):
    """A corpus with ONE source: its distribution IS the corpus —
    JSD must be ~0."""
    rows = [
        Row(doc_id=1, text="x y z x", lang="en", source="only", n_chars=7),
        Row(doc_id=2, text="y z x y", lang="en", source="only", n_chars=7),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        out = entry.queries()["text_jsd_source_divergence"](spark, d).collect()
    assert len(out) == 1
    assert abs(out[0]["jsd_bits"]) < 1e-5


def test_jsd_bounds(spark):
    """JSD in bits lives in [0, 1]."""
    for r in entry.queries()["text_jsd_source_divergence"](spark, SF).collect():
        assert -1e-6 <= r["jsd_bits"] <= 1.0 + 1e-6


def test_adamic_adar_star(spark):
    """u1 overlaps u2 and u3; u2/u3 never overlap: the unique predicted
    link is (2,3) through hub u1 with score 1/log2(deg(1)) = 1.0."""
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def add(u, m0, m1):
        nonlocal eid
        for m in (m0, m1):
            eid += 1
            rows.append(Row(event_id=eid, ts=t0 + dt.timedelta(minutes=m),
                            user_id=u, event_type="view", value=1.0))

    add(1, 0, 20)    # u1 session spans 0-20
    add(2, 0, 5)     # overlaps u1
    add(3, 18, 20)   # overlaps u1, not u2
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.mode("overwrite").parquet(
            os.path.join(d, "events.parquet")
        )
        out = entry.queries()["graph_adamic_adar_links"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["user_a"], r["user_b"]) == (2, 3)
    assert abs(r["aa_score"] - 1.0) < 1e-6


def test_adamic_adar_excludes_existing(spark):
    """No predicted pair may already be an edge of the concurrency
    graph (anti-join contract), and scores are positive."""
    out = entry.queries()["graph_adamic_adar_links"](spark, SF).collect()
    for r in out:
        assert r["user_a"] < r["user_b"]
        assert r["aa_score"] > 0
