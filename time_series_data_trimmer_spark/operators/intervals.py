"""Scalable interval-overlap join — the range-join primitive Spark
lacks natively.

A naive overlap join (``a.start <= b.end AND b.start <= a.end``) has no
equi-key, so Spark plans it as BroadcastNestedLoopJoin or a cartesian
product — O(N·M) compares and a single-task disaster at scale. The
standard fix (used by every production range-join implementation,
e.g. the Databricks range-join optimization and DuckDB's IEJoin
complement): COARSE BUCKETS as the equi-key. Each interval explodes to
the integer buckets it spans; two overlapping intervals necessarily
share the bucket containing any overlap point, so a bucket equi-join is
a lossless candidate generator; the exact predicate then filters, and a
``distinct`` collapses multi-bucket duplicates.

Cost: |candidates| = Σ_buckets |A_b|·|B_b| — linear for time-localized
data with bucket ≈ median interval length; explode fan-out is
``duration/bucket`` per interval (bounded for gap-bounded sessions).
Everything is integer microsecond math, engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: one hour, in microseconds — the default bucket. Tune toward the
#: median interval length: too small → explode fan-out, too large →
#: bucket-local quadratic candidates.
DEFAULT_BUCKET_US = 3_600_000_000


def auto_bucket_us(
    left: DataFrame,
    right: DataFrame,
    start_col: str = "start_us",
    end_col: str = "end_us",
) -> int:
    """Derive the bucket from the data: the exact median interval
    length across both sides (one global aggregate over the interval
    tables — which are session/annotation-sized, orders of magnitude
    smaller than the fact tables they were built from).

    Median ≈ the sweet spot PLANS.md's cost note names: explode
    fan-out per interval is ``duration/bucket`` (≈2 at the median) and
    bucket-local candidate count stays near-linear because a typical
    interval spans O(1) buckets. Exact integer-median (interpolates on
    .5, exact in double) → deterministic and oracle-reproducible: the
    same ``median(end-start)`` expression in SQL yields the identical
    bucket. Returns ≥ 1 µs."""
    dur = F.col(end_col).cast("long") - F.col(start_col).cast("long")
    u = left.select(dur.alias("d")).unionByName(right.select(dur.alias("d")))
    med = u.agg(F.percentile(F.col("d"), F.lit(0.5)).alias("m")).collect()[0]["m"]
    return max(1, int(med)) if med is not None else DEFAULT_BUCKET_US


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    bucket_us: int | str = DEFAULT_BUCKET_US,
    start_col: str = "start_us",
    end_col: str = "end_us",
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """All (left, right) interval pairs that overlap
    (``start_a <= end_b AND start_b <= end_a``, closed intervals,
    integer microseconds), via bucket-blocked candidates + exact
    predicate.

    ``left``/``right`` carry arbitrary payload columns plus the
    ``start_col``/``end_col`` bounds; output columns are the payloads
    suffixed per side plus ``overlap_us``. Self-joins: pass the same
    frame twice and filter the id ordering downstream.

    Plan shape: two scan-side ``explode(sequence(floor(start/bucket),
    floor(end/bucket)))`` fan-outs, ONE shuffle-hash equi-join on the
    bucket id, the exact overlap predicate as a join-time filter, and
    one distinct on the (already exact) pair rows to collapse
    multi-bucket duplicates. No BNLJ, no cartesian product, no range
    condition left for the planner to mis-plan.

    ``bucket_us="auto"`` derives the bucket from the exact median
    interval length (`auto_bucket_us`); results are bucket-invariant
    (losslessness pytest-pinned at multiple bucket sizes), only the
    candidate volume moves.
    """
    if bucket_us == "auto":
        bucket_us = auto_bucket_us(left, right, start_col, end_col)
    sa, sb = suffixes

    def fan(df: DataFrame, suffix: str) -> DataFrame:
        cols = [F.col(c).alias(f"{c}{suffix}") for c in df.columns]
        bucket = F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(int(bucket_us))),
                F.floor(F.col(end_col) / F.lit(int(bucket_us))),
            )
        ).alias("__bucket")
        return df.select(*cols, bucket)

    la, rb = fan(left, sa), fan(right, sb)
    exact = (F.col(f"{start_col}{sa}") <= F.col(f"{end_col}{sb}")) & (
        F.col(f"{start_col}{sb}") <= F.col(f"{end_col}{sa}")
    )
    overlap = F.least(
        F.col(f"{end_col}{sa}"), F.col(f"{end_col}{sb}")
    ) - F.greatest(F.col(f"{start_col}{sa}"), F.col(f"{start_col}{sb}"))
    return (
        la.join(rb.hint("shuffle_hash"), "__bucket")
        .filter(exact)
        .drop("__bucket")
        .distinct()
        .withColumn("overlap_us", overlap)
    )
