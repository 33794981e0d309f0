"""Skew-handling helpers: salting for hot keys, bucketed tables for
co-located joins.

AQE's skew-join splitting (enabled in the session conf) handles most
runtime skew; these helpers cover the two cases it cannot:

* **Salted aggregation** — one pathological key (a single enormous
  trial / user) overwhelms one reducer even when AQE splits joins.
  Two-phase aggregate: (key, salt) partial → key final. Works for any
  algebraic aggregate; the helper wires the common count/sum/min/max.
* **Bucketed tables** — two big fact tables repeatedly joined on the
  same key should be written bucketed so the join is co-located
  (zero Exchange on either side at read time). This is the "pay the
  shuffle once at write" pattern the 100 TB lake uses for
  samples ⋈ features joins.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs`` maps output name → (function, column) with function in
    {count, sum, min, max}; the partial phase groups by
    (keys..., salt) and the final phase re-combines per key — the hot
    key's rows spread over ``salt_buckets`` reducers in phase one.

    The salt derives from a deterministic hash of ``salt_source`` (a
    row-unique column, e.g. the event id) — never ``rand()``, so plans
    stay re-executable/resumable.
    """
    unsupported = [fn for fn, _ in aggs.values() if fn not in ("count", "sum", "min", "max")]
    if unsupported:
        raise ValueError(f"salted_agg cannot re-combine {unsupported[0]!r} (not algebraic here)")
    if salt_source is None:
        salt = (F.monotonically_increasing_id() % salt_buckets).cast("int")
    else:
        src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
        salt = F.pmod(F.xxhash64(src), F.lit(salt_buckets)).cast("int")
    d = df.withColumn("__salt", salt)

    partial_exprs = []
    final_exprs = []
    for out, (fn, col) in aggs.items():
        p = f"__p_{out}"
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"salted_agg cannot re-combine {fn!r} (not algebraic here)")
    part = d.groupBy(*key_cols, "__salt").agg(*partial_exprs)
    return part.groupBy(*key_cols).agg(*final_exprs)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table:
    subsequent equi-joins/aggregations on ``bucket_cols`` between
    co-bucketed tables need NO exchange — the shuffle was paid once at
    write. Sorting within buckets additionally removes the join's sort.
    ``mode="append"`` grows an existing table batch-by-batch under the
    SAME bucket spec (the incremental-dedup digest history)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def aqe_skew_split_applied(df: DataFrame) -> bool:
    """Diagnostic: execute ``df`` (noop sink — full plan, no collect)
    and report whether AQE's skew-join handling actually split a hot
    partition (the final adaptive plan marks the join ``skew=true``).

    This is the runtime complement to `salted_agg`: JOIN-side skew is
    AQE's job (`spark.sql.adaptive.skewJoin.*` — on in the session
    conf), and at 100 TB you want proof the mechanism engages rather
    than faith that it might. Pair with lowered
    ``skewedPartitionThresholdInBytes`` /
    ``advisoryPartitionSizeInBytes`` to rehearse the behavior on test
    volumes; production defaults (256 MB) engage on real hot keys.
    """
    # execute through the frame's OWN QueryExecution: a sink write (or
    # count()) builds a separate QueryExecution, leaving this one's
    # adaptive plan un-finalized (isFinalPlan=false, no skew markers).
    # JVM-only action: toRdd().count() finalizes the same adaptive plan
    # without pickling a single row into Python (foreachPartition would
    # serialize the whole join output to Python workers just to drop it)
    df._jdf.queryExecution().toRdd().count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "skew=true" in plan


def bucketed_join_is_shuffle_free(spark: SparkSession, left: str, right: str, on: Sequence[str]) -> bool:
    """Diagnostic: True iff joining two saved tables on ``on`` plans
    without any Exchange (i.e., bucketing was honored)."""
    j = spark.table(left).join(spark.table(right), list(on))
    plan = j._jdf.queryExecution().executedPlan().toString()
    # only SHUFFLE exchanges count — BroadcastExchange moves no fact rows
    return "Exchange hashpartitioning" not in plan


def runtime_bloom_filter_applied(df: DataFrame) -> bool:
    """Diagnostic: does the optimized plan carry a runtime BLOOM FILTER
    on the large (application) side of a join — Spark's row-level
    runtime pruning for selective joins the optimizer cannot push
    statically (the dimension filter's qualifying keys are only known
    at run time).

    The complement to static pushdown and AQE skew handling: at 100 TB
    a selective dim join prunes the fact scan by probing the bloom
    filter built from the filtered creation side, cutting shuffle input
    by the dim filter's selectivity. Injection is guarded by
    ``spark.sql.optimizer.runtime.bloomFilter.*`` thresholds — the
    application side must look big enough to be worth the build
    (default 10 GB scan), so bench-scale rehearsals lower
    ``applicationSideScanSizeThreshold`` exactly as the skew rehearsal
    lowers its partition thresholds; production defaults engage on
    real fact tables.
    """
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return "bloom" in plan.lower()
