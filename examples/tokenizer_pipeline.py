#!/usr/bin/env python
"""The production tokenizer path on this engine (r11 contract):

1. TRAIN on a deterministic sample — `bpe_train_merges_local` collects
   a bounded md5-coin sample to the driver and trains pure-Python with
   the distributed trainer's exact tie-breaks. A 10^4-merge vocabulary
   costs zero additional Spark jobs (the per-round distributed trainer
   is the oracle-contract path, linear in |merges|; see SCALING.md).
2. ENCODE the full corpus in ONE merge-count-constant Arrow pass
   (`bpe_encode_auto` → the ranked kernel).
3. AUDIT fertility per language slice (tokenizer equity).
4. ALLOCATE a global token budget max-min fairly across sources with
   the closed-form water-fill (`mix_waterfill_token_budget` semantics,
   here on REAL encoded counts instead of whitespace counts).

Run: python examples/tokenizer_pipeline.py [sf_dir]   (default sf0.01)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import text as tx
from time_series_data_trimmer_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("tokenizer-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    # 1. sample-train: 25% md5-coin sample, 50 merge rounds, bounded
    #    collect (raises rather than OOM if the sample is oversized)
    merges = tx.bpe_train_merges_local(
        docs, rounds=50, sample_rate=0.25, sample_seed="bpe-sample"
    )
    print(f"trained {len(merges)} merges; last: {merges[-1]}")

    # 2. full-corpus encode, one Arrow pass, flat in |merges|
    enc = tx.bpe_encode_auto(docs, merges)

    # 3. fertility audit per language (bpe tokens per word)
    fert = (
        enc.join(docs.select("doc_id", "lang", "source"), "doc_id")
        .filter(F.col("n_tokens_raw") > 0)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens_raw").alias("n_words"),
            F.sum(F.size("bpe_tokens")).alias("n_bpe"),
        )
        .withColumn(
            "fertility",
            F.round(F.col("n_bpe") / F.col("n_words"), 4),
        )
        .orderBy("lang")
    )
    fert.show(truncate=False)

    # 4. water-fill half the encoded-token total across sources:
    #    small sources keep everything, large ones cap at the level C
    av = (
        enc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.sum(F.size("bpe_tokens")).alias("avail"))
    )
    arr = av.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("avail"), F.col("source")))
        ).alias("a"),
        F.count(F.lit(1)).alias("n"),
        (F.sum("avail") / 2).cast("long").alias("b"),
    )
    rk = arr.select(
        "n", "b", "a", F.posexplode("a").alias("k0", "s")
    ).select(
        F.col("s.source").alias("source"),
        F.col("s.avail").alias("avail"),
        (F.col("k0") + 1).alias("k"),
        F.expr(
            "aggregate(slice(a, 1, k0 + 1), CAST(0 AS BIGINT),"
            " (acc, x) -> acc + x.avail)"
        ).alias("pfx"),
        "n",
        "b",
    ).withColumn(
        "feas",
        (F.col("pfx") + (F.col("n") - F.col("k")) * F.col("avail")
         <= F.col("b")).cast("int"),
    )
    jj = rk.agg(
        F.sum("feas").alias("j"),
        F.coalesce(F.max(F.when(F.col("feas") == 1, F.col("pfx"))), F.lit(0)).alias("pfxj"),
        F.max("n").alias("n"), F.max("b").alias("b"),
    )
    lvl = jj.select(
        F.when(
            F.col("j") < F.col("n"),
            F.floor((F.col("b") - F.col("pfxj")) / (F.col("n") - F.col("j"))),
        ).cast("long").alias("c")
    )
    alloc = rk.crossJoin(F.broadcast(lvl)).select(
        "source", "avail",
        F.when(F.col("feas") == 1, F.col("avail")).otherwise(F.col("c")).alias("allocated"),
        (F.col("feas") == 0).alias("capped"),
    ).orderBy(F.col("allocated").desc())
    alloc.show(25, truncate=False)


if __name__ == "__main__":
    main()
