#!/usr/bin/env python
"""Measure the fold-vs-ranked BPE encoder crossover (VERDICT r9 #2).

Times `tx.bpe_encode` (one codegen fold stage per rule,
`text.py:1549`) against `tx.bpe_encode_ranked` (one Arrow
`mapInPandas` pass, constant in |merges|) on the SAME corpus and the
SAME ranked merge table at growing rule counts, and asserts the two
encoders stay token-identical at each size.

The merge table is built from ONE adjacent-pair count over the corpus
(top-N pairs by count, ties by token) rather than N true training
rounds — the encoders don't care where the ranked table came from, and
this keeps the benchmark about ENCODE cost, not training cost.

Usage: python scripts/bench_bpe_crossover.py [sf_dir] [sizes...]
Defaults: /root/testdata/sf0.1, sizes 5 10 32 64 128 500.
Prints one line per (size, engine) and a final crossover estimate.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import text as tx
from time_series_data_trimmer_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SIZES = [int(s) for s in sys.argv[2:]] or [5, 10, 32, 64, 128, 500]


def main() -> None:
    spark = get_spark()
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs = docs.select("doc_id", "text").localCheckpoint()

    # One pair-count pass -> ranked table of the top max(SIZES) pairs.
    toks = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", tx._norm_tokens("text").alias("__toks")
    )
    n = F.size("__toks")
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("__toks"), F.lit(1), n - 1),
                F.slice(F.col("__toks"), F.lit(2), n - 1),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    top = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(max(SIZES))
        .collect()
    )
    table = [(r["a"], r["b"]) for r in top]
    print(f"corpus={SF_DIR} docs={docs.count()} table={len(table)} pairs")

    results: dict[int, dict[str, float]] = {}
    for size in SIZES:
        rules = table[:size]
        if len(rules) < size:
            print(f"size={size}: only {len(rules)} distinct pairs; skipping")
            continue
        results[size] = {}
        for name, fn in (
            ("fold", tx.bpe_encode),
            ("ranked", tx.bpe_encode_ranked),
        ):
            best = float("inf")
            for _ in range(2):
                t0 = time.monotonic()
                fn(docs, rules).agg(
                    F.sum(F.size("bpe_tokens")), F.sum("n_tokens_raw")
                ).collect()
                best = min(best, time.monotonic() - t0)
            results[size][name] = best
            print(
                f"size={size:4d} engine={name:6s} best-of-2 {best:7.2f} s",
                flush=True,
            )
        if size == max(SIZES):
            # token-identity spot check once, at the largest table
            a = fn_tokens(tx.bpe_encode(docs, rules))
            b = fn_tokens(tx.bpe_encode_ranked(docs, rules))
            assert a == b, f"size={size}: encoders disagree ({a} vs {b})"
            print(f"size={size:4d} identity ok (checksum {a})", flush=True)

    crossed = [s for s, r in sorted(results.items()) if r["fold"] > r["ranked"]]
    print(
        "crossover: fold slower than ranked from size "
        + (str(crossed[0]) if crossed else f">{max(results)} (never crossed)")
    )


def fn_tokens(df):
    row = df.agg(
        F.sum(F.crc32(F.concat_ws("", "bpe_tokens"))).alias("c"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return (int(row["c"]), int(row["n"]))


if __name__ == "__main__":
    main()
