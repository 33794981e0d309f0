#!/usr/bin/env python
"""Scale-projection curve for the heavy dedup/similarity stack: run
the candidate-bounded operators on K× replicas of the sf0.1 documents
corpus (K = 1, 2, 4, 8) and record time + output volume growth.

Replicas are SALTED — each copy appends its replica index as a final
token and offsets doc_id — so shingle/minhash structure stays
near-dup-like instead of collapsing to exact duplicates; the measured
growth is the honest "bigger corpus" curve, not the pathological
all-duplicates one (exact-dup worst case is exercised separately by
the dedup tests).

Prints one line per (K, op). The question each row answers: is the
operator's cost tracking the corpus (linear) or the pair space
(quadratic)? Bounded candidate generators must stay linear.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from time_series_data_trimmer_spark.operators import dedup as dd  # noqa: E402
from time_series_data_trimmer_spark.operators import text as tx  # noqa: E402
from time_series_data_trimmer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KS = [int(k) for k in sys.argv[1:]] or [1, 2, 4, 8]


def scaled_docs(spark, base, k: int):
    reps = []
    n = 1_000_000
    for i in range(k):
        reps.append(
            base.select(
                (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" rep{i}")).alias("text"),
                "lang",
                "source",
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out.localCheckpoint()


def main() -> None:
    spark = get_spark("scale-projection")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).filter(
        F.col("text").isNotNull()
    )
    for k in KS:
        docs = scaled_docs(spark, base, k)
        n_docs = docs.count()
        ops = {
            "minhash_lsh_pairs": lambda d: dd.minhash_lsh_pairs(d).count(),
            "simhash_pairs": lambda d: dd.simhash_pairs(dd.simhash(d)).count(),
            "ngram_jaccard_prefix": lambda d: dd.ngram_jaccard_prefix_pairs(
                d, min_jaccard=0.2
            ).count(),
            "exact_dedup_groups": lambda d: dd.exact_dedup_groups(d).count(),
            "bpe_encode_ranked_50r": lambda d: tx.bpe_encode_auto(
                d, _MERGES
            )
            .agg(F.sum(F.size("bpe_tokens")))
            .collect()[0][0],
        }
        global _MERGES
        if k == KS[0]:
            _MERGES = tx.bpe_train_merges_local(
                base, rounds=50, sample_rate=0.25
            )
        for name, fn in ops.items():
            t0 = time.monotonic()
            out = fn(docs)
            el = time.monotonic() - t0
            print(
                f"K={k} n_docs={n_docs:7d} {name:22s} {el:7.2f} s out={out}"
            )


if __name__ == "__main__":
    main()
