"""The driver contract itself, regression-proofed: every query has an
oracle, names are stable, and the flagship entry produces rows."""

import __spark_entry__ as entry


def test_every_query_has_an_oracle():
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(oracles), (
        f"queries without oracle: {set(qs) - set(oracles)}; "
        f"orphan oracles: {set(oracles) - set(qs)}"
    )
    assert len(qs) >= 105, f"registry shrank to {len(qs)}"
    # oracle strings are non-trivial SQL
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_entry_flagship_returns_rows(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert {"user_id", "kind", "seg_start", "seg_end", "n_samples"} <= set(df.columns)
