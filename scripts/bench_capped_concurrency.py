#!/usr/bin/env python
"""Skewed-concurrency measurement for the per-bucket interval cap
(VERDICT r9 #6): one HOT HOUR where n_hot users' sessions all co-run
(the worst case the bucket blocking cannot help with — k co-running
intervals emit k² candidates at any bucket width), on top of a uniform
background. Times the uncapped session-concurrency edge build against
`overlap_join(per_bucket_cap=64)` + its `bucket_cap_report` forfeit
accounting, at growing hot-bucket occupancy.

Usage: python scripts/bench_capped_concurrency.py [n_hot ...]
Defaults: 1000 4000. Prints one line per (n_hot, engine) with the
pair count, and the capped run's forfeit accounting.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import intervals as iv
from time_series_data_trimmer_spark.session import get_spark

HOUR = 3_600_000_000
CAP = 64
N_BACKGROUND = 200_000  # uniform: one session per user, spread over a year


def build(spark, n_hot: int):
    """n_hot sessions inside hour 1000 (pairwise overlapping) +
    N_BACKGROUND 10-minute sessions spread uniformly over ~8760 hours
    (sparse: ~23/bucket at the default build)."""
    hot = spark.range(n_hot).select(
        F.col("id").alias("user_id"),
        F.lit(0).cast("long").alias("session_idx"),
        (F.lit(1000 * HOUR) + F.lit(60_000_000)).alias("start_us"),
        (F.lit(1000 * HOUR) + F.lit(3_000_000_000) + F.col("id")).alias(
            "end_us"
        ),
    )
    bg = spark.range(N_BACKGROUND).select(
        (F.col("id") + 1_000_000).alias("user_id"),
        F.lit(0).cast("long").alias("session_idx"),
        ((F.col("id") % 8760) * HOUR + (F.col("id") % 50) * 60_000_000).alias(
            "start_us"
        ),
        (
            (F.col("id") % 8760) * HOUR
            + (F.col("id") % 50) * 60_000_000
            + 600_000_000
        ).alias("end_us"),
    )
    return hot.unionByName(bg).localCheckpoint()


def cap_sweep(spark, sizes: list[int], caps: list[int]) -> None:
    """VERDICT r10 #6: forfeit fraction + capped pair volume vs CAP at
    each skew level, plus the data-derived p99 auto-cap for reference
    — the curve that justifies (or indicts) a cap choice."""
    for n_hot in sizes:
        ivl = build(spark, n_hot)
        auto = iv.auto_bucket_cap(ivl, HOUR, pct=0.99, floor_cap=16)
        total = ivl.count()
        print(f"n_hot={n_hot:6d} auto_cap(p99)={auto} n_intervals={total}")
        for cap in caps:
            t0 = time.monotonic()
            pairs = (
                iv.overlap_join(
                    ivl,
                    ivl,
                    bucket_us=HOUR,
                    per_bucket_cap=cap,
                    cap_order_cols=["user_id", "session_idx"],
                )
                .filter(F.col("user_id_a") < F.col("user_id_b"))
                .count()
            )
            el = time.monotonic() - t0
            rep = (
                iv.bucket_cap_report(ivl, HOUR, cap)
                .agg(
                    F.sum("n_rows").alias("rows"),
                    F.sum("n_forfeited").alias("forf"),
                    F.sum((F.col("n_rows") > cap).cast("int")).alias("hot"),
                )
                .collect()[0]
            )
            share = rep["forf"] / rep["rows"] if rep["rows"] else 0.0
            print(
                f"n_hot={n_hot:6d} cap={cap:5d} {el:6.2f} s pairs={pairs:>12d}"
                f" forfeited={rep['forf']:>8d} ({share:.4%})"
                f" hot_buckets={rep['hot']}"
            )


def main() -> None:
    spark = get_spark("capped-concurrency-bench")
    spark.sparkContext.setLogLevel("ERROR")
    if sys.argv[1:2] == ["--cap-sweep"]:
        sizes = [int(s) for s in sys.argv[2:]] or [1000, 40000]
        cap_sweep(spark, sizes, caps=[16, 32, 64, 128, 256, 512])
        return
    sizes = [int(s) for s in sys.argv[1:]] or [1000, 4000]
    for n_hot in sizes:
        ivl = build(spark, n_hot)
        for label, kwargs in (
            ("uncapped", {}),
            (
                f"cap{CAP}",
                {
                    "per_bucket_cap": CAP,
                    "cap_order_cols": ["user_id", "session_idx"],
                },
            ),
        ):
            best, pairs = float("inf"), -1
            for _ in range(3):
                t0 = time.monotonic()
                pairs = (
                    iv.overlap_join(ivl, ivl, bucket_us=HOUR, **kwargs)
                    .filter(F.col("user_id_a") < F.col("user_id_b"))
                    .count()
                )
                best = min(best, time.monotonic() - t0)
            print(
                f"n_hot={n_hot:6d} engine={label:9s} best-of-3 "
                f"{best:7.2f} s  pairs={pairs}"
            )
        rep = (
            iv.bucket_cap_report(ivl, HOUR, CAP)
            .agg(
                F.sum("n_rows").alias("rows"),
                F.sum("n_forfeited").alias("forfeited"),
                F.sum((F.col("n_rows") > CAP).cast("int")).alias("hot_buckets"),
            )
            .collect()[0]
        )
        print(
            f"n_hot={n_hot:6d} forfeit report: rows={rep['rows']} "
            f"forfeited={rep['forfeited']} hot_buckets={rep['hot_buckets']}"
        )


if __name__ == "__main__":
    main()
