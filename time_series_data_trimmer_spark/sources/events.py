"""Layout-adaptive time-axis derivation for the driver's ``events``
table (SURVEY §1.1 time axis; reference `data_model.py:110-114` keeps a
float-seconds axis).

The driver has shipped ``events.parquet`` with two different physical
layouts for ``ts`` across rounds:

* **int64 nanoseconds** (rounds 1-3): Spark's vectorized reader rejects
  parquet nanos, so the session conf
  ``spark.sql.legacy.parquet.nanosAsLong`` reads them as raw longs and
  ``ts div 1000`` truncates to microseconds — matching DuckDB, which
  truncates nanos→micros on read.
* **timestamp[us]** (round 4+): arrives as TIMESTAMP_NTZ; with the
  session TZ pinned to UTC, ``unix_micros(cast(ts as timestamp))`` is
  the exact integer-micros epoch, bit-identical to DuckDB ``epoch(ts)``
  on the same file.

Every consumer derives the double-seconds axis ``t`` through these
helpers so a future layout change is a one-file fix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def event_micros(df: DataFrame, ts_col: str = "ts") -> Column:
    """Integer epoch-microseconds column for either ``ts`` layout.

    Works on batch and streaming DataFrames alike (dtype inspection
    only touches the analyzed schema, never the data).
    """
    dt = dict(df.dtypes).get(ts_col)
    if dt in ("bigint", "long"):  # legacy nanos-as-long layout
        return F.expr(f"{ts_col} div 1000")
    # timestamp[us] layout (TIMESTAMP or TIMESTAMP_NTZ; session TZ=UTC)
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def event_seconds(df: DataFrame, ts_col: str = "ts") -> Column:
    """Double epoch-seconds time axis ``t`` (micros / 1e6 — exact for
    the ~2^50-microsecond range of the test data, far inside double's
    2^53 integer window)."""
    return event_micros(df, ts_col).cast("double") / F.lit(1e6)


def event_time(df: DataFrame, ts_col: str = "ts") -> Column:
    """Proper TIMESTAMP event-time column (for streaming watermarks)."""
    dt = dict(df.dtypes).get(ts_col)
    if dt in ("bigint", "long"):
        return F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
    # already a timestamp: a plain cast (no-op for TIMESTAMP, wall-clock
    # reinterpretation for NTZ under the pinned UTC session TZ) beats a
    # timestamp_micros(unix_micros(...)) round trip
    return F.col(ts_col).cast("timestamp")


def event_ts_pushdown(
    df: DataFrame, lo_s: float, hi_s: float, ts_col: str = "ts"
) -> Column:
    """A raw-``ts`` predicate implied by ``t ∈ [lo_s, hi_s]`` that the
    parquet scan can push down (PushedFilters → row-group min/max
    pruning), which the equivalent predicate on the DERIVED ``t``
    cannot. Deliberately a hair wider than exact (±1 µs / the nanos
    truncation window) — callers re-filter on ``t`` for exactness, so
    the raw bound only has to be a superset.
    """
    import math

    dt = dict(df.dtypes).get(ts_col)
    if dt in ("bigint", "long"):
        # nanos: widen the top by the 999 ns truncation window, and BOTH
        # ends by 2048 ns float slack — at 2024-epoch magnitudes (~1.7e18)
        # a double ulp is 256 ns, so the bare product can overshoot the
        # exact bound and silently prune rows the exact t-filter keeps
        return F.col(ts_col).between(
            int(lo_s * 1e9) - 2048, int(hi_s * 1e9) + 999 + 2048
        )
    lo = F.timestamp_micros(F.lit(math.floor(lo_s * 1e6) - 1)).cast(dt)
    hi = F.timestamp_micros(F.lit(math.ceil(hi_s * 1e6) + 1)).cast(dt)
    return F.col(ts_col).between(lo, hi)
