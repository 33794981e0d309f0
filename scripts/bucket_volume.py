#!/usr/bin/env python
"""Overlap-join candidate volume vs bucket size (VERDICT r6 #6).

For the session-interval self-join behind `overlap_join_user_sessions`,
measure at sf0.1 and the 10x scratch build:

* fan rows per side (explode fan-out, cost of a SMALL bucket)
* bucket-join candidate rows BEFORE the exact predicate (bucket-local
  quadratic blow-up, cost of a LARGE bucket)
* the auto bucket (`iv.auto_bucket_us` = exact median interval length)

Prints one JSON line per (dataset, bucket) point.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import aggregates as ag
from time_series_data_trimmer_spark.operators import intervals as iv
from time_series_data_trimmer_spark.session import get_spark

H = 3_600_000_000


def intervals_of(spark, sf_dir):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    sess = ag.sessionize_user_events(ev, gap_minutes=30)
    return sess.select(
        "user_id",
        "session_idx",
        F.unix_micros(F.col("session_start").cast("timestamp")).alias("start_us"),
        F.unix_micros(F.col("session_end").cast("timestamp")).alias("end_us"),
    ).cache()


def fan(df, bucket_us):
    return df.select(
        "user_id",
        "session_idx",
        "start_us",
        "end_us",
        F.explode(
            F.sequence(
                F.floor(F.col("start_us") / F.lit(int(bucket_us))),
                F.floor(F.col("end_us") / F.lit(int(bucket_us))),
            )
        ).alias("b"),
    )


def main():
    spark = get_spark("bucket-volume")
    spark.sparkContext.setLogLevel("ERROR")
    for label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("x10", "/tmp/tsdt_scale10")):
        if not os.path.exists(os.path.join(sf_dir, "events.parquet")):
            continue
        ivl = intervals_of(spark, sf_dir)
        n = ivl.count()
        auto = iv.auto_bucket_us(ivl, ivl)
        for bl, b in (
            ("15min", H // 4),
            ("1h(default)", H),
            (f"auto({auto}us)", auto),
            ("6h", 6 * H),
        ):
            f = fan(ivl, b)
            fan_rows = f.count()
            cand = (
                f.select("b", F.col("user_id").alias("ua"))
                .join(f.select("b", F.col("user_id").alias("ub")).hint("shuffle_hash"), "b")
                .count()
            )
            print(
                json.dumps(
                    {
                        "dataset": label,
                        "n_intervals": n,
                        "bucket": bl,
                        "fan_rows_per_side": fan_rows,
                        "bucket_join_candidates": cand,
                    }
                )
            )
        ivl.unpersist()


if __name__ == "__main__":
    main()
