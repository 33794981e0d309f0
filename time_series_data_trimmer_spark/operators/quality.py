"""Declarative data-quality expectations over a DataFrame.

The ingestion-gate problem at 100 TB: before a daily drop enters the
corpus you want null-rate / range / set-membership / format /
uniqueness / referential-integrity checks — and you want ALL the
row-level rules answered by ONE pass over the fact table, not one
scan per rule (a Great-Expectations-style suite naively re-scans per
expectation; at 100 TB that multiplies the dominant cost by the rule
count).

Design:
  * every ROW rule compiles to a (violation, checked) indicator pair
    evaluated scan-side; the whole rule set folds into a single
    global aggregation (one job, one pass, map-side combined), then
    unpivots to (rule, ...) rows via an explode over the 1-row
    aggregate — no join, no window;
  * ``unique`` is its own exact aggregation (count minus distinct
    count over the key — the distinct is unavoidable for exactness
    and shuffles only the key column);
  * ``fk`` (referential integrity) is a narrow LEFT ANTI join of the
    non-null fact keys against the dimension keys — the orphan count,
    hash-joined on the key.
The three bounded report frames union into one (rule, n_checked,
n_violations, violation_rate) result.

Row-rule convention: ``not_null`` checks every row; the value rules
(range / set / format) check only NON-null values, so a missing value
is exactly one violation (of ``not_null``), not one per rule.

Reference anchor: the reference validates incoming CSVs by coercing
bad cells to NaN and masking them (data_model.py bad-mask path); this
module is that gate generalized to declarative rule suites with
per-rule accounting.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from time_series_data_trimmer_spark.functions.rounding import rd


@dataclass(frozen=True)
class RowRule:
    """A scan-side expectation: `checked` selects the rows the rule
    applies to; `violated` marks failures among them."""

    name: str
    checked: Column
    violated: Column


def not_null(col: str) -> RowRule:
    return RowRule(
        f"not_null({col})", F.lit(True), F.col(col).isNull()
    )


def in_range(col: str, lo: float, hi: float) -> RowRule:
    c = F.col(col)
    return RowRule(
        f"in_range({col},{lo},{hi})",
        c.isNotNull(),
        c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
    )


def in_set(col: str, values: Sequence[str]) -> RowRule:
    c = F.col(col)
    vals = [F.lit(v) for v in sorted(values)]
    return RowRule(
        f"in_set({col})", c.isNotNull(), c.isNotNull() & ~c.isin(*vals)
    )


def matches(col: str, pattern: str, label: str | None = None) -> RowRule:
    """Format rule; keep `pattern` in the portable regex subset
    (no lookarounds) so the oracle's RE2 agrees with Java regex."""
    c = F.col(col)
    return RowRule(
        label or f"matches({col})",
        c.isNotNull(),
        c.isNotNull() & ~c.rlike(pattern),
    )


def expectations_report(
    df: DataFrame,
    row_rules: Sequence[RowRule],
    unique_cols: Sequence[str] = (),
    fks: Sequence[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """Evaluate the suite; returns (rule, n_checked, n_violations,
    violation_rate) with one row per rule, rate on the checked count
    (0-checked rules report rate 0.0)."""
    aggs = []
    for i, r in enumerate(row_rules):
        aggs.append(F.sum(r.checked.cast("long")).alias(f"__c{i}"))
        aggs.append(F.sum(r.violated.cast("long")).alias(f"__v{i}"))
    one = df.agg(*aggs)
    rows = one.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r.name).alias("rule"),
                    F.col(f"__c{i}").alias("n_checked"),
                    F.col(f"__v{i}").alias("n_violations"),
                )
                for i, r in enumerate(row_rules)
            ])
        ).alias("s")
    ).select("s.rule", "s.n_checked", "s.n_violations")
    parts = [rows]
    for col in unique_cols:
        parts.append(
            df.agg(
                F.count(F.col(col)).alias("__n"),
                F.count_distinct(F.col(col)).alias("__d"),
            ).select(
                F.lit(f"unique({col})").alias("rule"),
                F.col("__n").alias("n_checked"),
                (F.col("__n") - F.col("__d")).alias("n_violations"),
            )
        )
    for col, dim, dim_col in fks:
        keys = df.filter(F.col(col).isNotNull()).select(F.col(col).alias("__k"))
        dimk = dim.select(F.col(dim_col).alias("__k"))
        orphans = keys.join(dimk.hint("shuffle_hash"), "__k", "left_anti").agg(
            F.count(F.lit(1)).alias("__v")
        )
        total = keys.agg(F.count(F.lit(1)).alias("__n"))
        parts.append(
            total.crossJoin(orphans)  # 1-row × 1-row scalar cross (sanctioned)
            .select(
                F.lit(f"fk({col})").alias("rule"),
                F.col("__n").alias("n_checked"),
                F.col("__v").alias("n_violations"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    rate = F.when(
        F.col("n_checked") > 0,
        F.col("n_violations").cast("double") / F.col("n_checked").cast("double"),
    ).otherwise(F.lit(0.0))
    return out.select(
        "rule",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_violations").cast("long").alias("n_violations"),
        rd(rate, 6).alias("violation_rate"),
    )
