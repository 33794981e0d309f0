#!/usr/bin/env python
"""VERDICT r10 #5: the BPE trainer's production-scale story, measured.

Compares, at $SPARK_GRAFT_SF_DIR (default sf0.1) on the documents
table, for a 50-merge vocabulary:

  a) distributed per-round trainer (`bpe_train_merges`) — one Spark
     job per merge round (the oracle-contract path, fine at 5 rounds);
  b) sample-to-driver local trainer (`bpe_train_merges_local`,
     sample_rate=0.25) — one bounded collect, zero per-merge jobs;
  c) full-corpus encode of the learned 50-rule table via the ranked
     Arrow kernel (`bpe_encode_auto`) — the merge-count-constant half.

Prints one JSON line for SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from time_series_data_trimmer_spark.operators import text as tx  # noqa: E402
from time_series_data_trimmer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("BPE_BENCH_ROUNDS", "50"))


def main() -> None:
    spark = get_spark("bench-bpe-rounds")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.count()  # warm the scan

    t0 = time.time()
    dist = tx.bpe_train_merges(docs, rounds=ROUNDS)
    t_dist = time.time() - t0

    t0 = time.time()
    local = tx.bpe_train_merges_local(
        docs, rounds=ROUNDS, sample_rate=0.25, sample_seed="bpe-sample"
    )
    t_local = time.time() - t0

    t0 = time.time()
    n = (
        tx.bpe_encode_auto(docs, local)
        .agg(F.sum(F.size("bpe_tokens")))
        .collect()[0][0]
    )
    t_encode = time.time() - t0

    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "rounds": ROUNDS,
                "distributed_train_sec": round(t_dist, 2),
                "distributed_sec_per_round": round(t_dist / ROUNDS, 3),
                "local_sampled_train_sec": round(t_local, 2),
                "full_corpus_encode_sec": round(t_encode, 2),
                "n_merges_dist": len(dist),
                "n_merges_local": len(local),
                "encoded_tokens": int(n),
            }
        )
    )


if __name__ == "__main__":
    main()
