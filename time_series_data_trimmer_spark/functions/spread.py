"""Guarded CPU-spread for tiny single-split scans (r14, guide §2.5/§6).

At the test SFs every input table is ONE parquet file with ONE row group,
so a scan yields ONE task — and Spark fuses CPU-dense row-local work
(per-token md5 folds, shingle digests, vector expansions) into that scan
stage, serializing seconds of compute on one core while the rest idle.

``spread_scan`` hash-repartitions to defaultParallelism ONLY when the
input has fewer partitions than that. At real scale the scan already has
≥ par splits and the helper returns the input UNCHANGED — no exchange —
so the guard is scale-adaptive, never a local[32] constant. Keyed
(deterministic hash), never round-robin: retried tasks reproduce the same
row-to-partition assignment (guide §2.5 / SPARK-38388).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_scan(df: DataFrame, key: str) -> DataFrame:
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par, F.col(key))
    return df
