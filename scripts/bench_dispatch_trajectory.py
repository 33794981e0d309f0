#!/usr/bin/env python
"""Dispatcher-decision trajectory under duplication growth (r12):
run `dd.posting_density_decision` on K exact replicas of the sf0.1
documents corpus (exact copies, doc_id offset — the duplication-heavy
regime, unlike the salted near-dup replicas of the scale projection)
and print candidate volume, posting rows, density ratio, and the
method the envelope picks at each K.

The point: the density ratio grows ~linearly in K on a duplicated
corpus (each gram's posting list multiplies), so the probe's forecast
crosses the 64 cand/posting envelope on exactly the corpora where the
r11 salted-replica stress measured exact PPJoin going quadratic —
the dispatcher flips to lsh_first where the measurement says it must.

Usage: python scripts/bench_dispatch_trajectory.py [K ...]  # default 1 4 8 16 32
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from time_series_data_trimmer_spark.operators import dedup as dd  # noqa: E402
from time_series_data_trimmer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KS = [int(k) for k in sys.argv[1:]] or [1, 4, 8, 16, 32]


def replicate(base, k: int):
    reps = [
        base.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            "text",
        )
        for i in range(k)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out.localCheckpoint()


def main() -> None:
    spark = get_spark("dispatch-trajectory")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).filter(
        F.col("text").isNotNull()
    )
    for k in KS:
        docs = replicate(base, k)
        dec = dd.posting_density_decision(docs, envelope=(64, 1))
        ratio = (
            dec["candidate_upper_bound"] / dec["n_postings"]
            if dec["n_postings"]
            else 0.0
        )
        print(
            json.dumps(
                {
                    "k": k,
                    "n_postings": dec["n_postings"],
                    "candidates": dec["candidate_upper_bound"],
                    "density_ratio": round(ratio, 2),
                    "method": dec["method"],
                }
            )
        )


if __name__ == "__main__":
    main()
