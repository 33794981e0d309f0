#!/usr/bin/env python
"""Measured row-group pruning: Z-order vs natural time-ordered layout.

Builds two copies of the sf events table in /tmp with IDENTICAL writer
settings (same row-group byte size, same file count) — one sorted by
``ts`` (the natural arrival order), one Z-ordered on
(user_id, epoch-hour) via `layout.zorder_write` — then, for three
predicate shapes, counts the row groups whose parquet min/max stats
survive pruning (what any engine's scan planner reads).

Prints one JSON line per (layout, predicate).
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators.layout import zorder_write
from time_series_data_trimmer_spark.session import get_spark
from time_series_data_trimmer_spark.sources.events import event_micros

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAT = "/tmp/tsdt_layout_natural"
ZO = "/tmp/tsdt_layout_zorder"
RG_BYTES = 1 << 18
N_FILES = 8
H_US = 3_600_000_000


def build(spark):
    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    us = event_micros(ev)
    base = ev.select("event_id", "user_id", us.alias("t_us"), "event_type", "value")
    (
        base.repartitionByRange(N_FILES, F.col("t_us"))
        .sortWithinPartitions("t_us")
        .write.mode("overwrite")
        .option("parquet.block.size", RG_BYTES)
        .parquet(NAT)
    )
    zorder_write(
        base.withColumn("__hour", (F.col("t_us") / F.lit(float(H_US))).cast("long")),
        ZO,
        a_col="user_id",
        b_col="__hour",
        bits=16,
        n_files=N_FILES,
        row_group_bytes=RG_BYTES,
    )


def row_groups(dirpath):
    out = []
    for f in sorted(glob.glob(os.path.join(dirpath, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            stats = {}
            for col in ("user_id", "t_us"):
                st = rg.column(idx[col]).statistics
                stats[col] = (st.min, st.max)
            out.append(stats)
    return out


def survivors(groups, pred):
    n = 0
    for st in groups:
        ok = True
        for col, (lo, hi) in pred.items():
            cmin, cmax = st[col]
            if cmax < lo or cmin > hi:
                ok = False
                break
        if ok:
            n += 1
    return n


def main():
    spark = get_spark("zorder-prune")
    spark.sparkContext.setLogLevel("ERROR")
    if "--rebuild" in sys.argv or not os.path.exists(os.path.join(ZO, "_SUCCESS")):
        build(spark)
    ev = spark.read.parquet(NAT)
    t_min, t_max, u_max = ev.agg(
        F.min("t_us"), F.max("t_us"), F.max("user_id")
    ).collect()[0]
    preds = {
        "one_user": {"user_id": (42, 42)},
        "one_hour": {"t_us": (t_min, t_min + H_US)},
        "user_x_day": {"user_id": (42, 42), "t_us": (t_min, t_min + 24 * H_US)},
    }
    for label, path in (("natural_time_sorted", NAT), ("zorder_user_hour", ZO)):
        groups = row_groups(path)
        for pname, pred in preds.items():
            n = survivors(groups, pred)
            print(
                json.dumps(
                    {
                        "layout": label,
                        "predicate": pname,
                        "row_groups_total": len(groups),
                        "row_groups_read": n,
                        "read_frac": round(n / len(groups), 4),
                    }
                )
            )


if __name__ == "__main__":
    main()
