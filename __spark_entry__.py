"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (SURVEY §7.2): z-score the
``value`` channel per user over ``events`` and report spike/NaN artifact
segments via the gaps-and-islands suggestion operator — scan →
partitioned window agg (F9) → lag-diff (F7-shaped deriv) → A5 islands.

``queries()`` / ``oracle_sql()`` expose every implemented SURVEY §2
operator with a DuckDB oracle (see
``time_series_data_trimmer_spark/queries.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from time_series_data_trimmer_spark.queries import REGISTRY  # noqa: E402
import time_series_data_trimmer_spark.queries_ext  # noqa: E402,F401  (fills REGISTRY)
import time_series_data_trimmer_spark.queries_parity  # noqa: E402,F401  (fills REGISTRY)
import time_series_data_trimmer_spark.queries_compose  # noqa: E402,F401  (fills REGISTRY)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from time_series_data_trimmer_spark.operators.aggregates import suggest_segments
    from time_series_data_trimmer_spark.operators.filters import apply_filter
    from time_series_data_trimmer_spark.queries import _events

    sf_dir = "/root/testdata/sf0.001"
    events = _events(spark, sf_dir)
    z = apply_filter(
        events, ["value"], "normalize_zscore", {},
        trial_key="user_id", time_col="t", order_cols=["t", "event_id"], sample_rate=120.0,
    )
    return suggest_segments(
        z, "value", trial_key="user_id", time_col="t", order_cols=["t", "event_id"]
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
