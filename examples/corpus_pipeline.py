#!/usr/bin/env python
"""Training-corpus curation end-to-end on this engine: redact → quality
gate → exact dedup → near-dup pairs (minhash LSH) → clusters (connected
components) → survivor selection → corpus stats → token-budget +
Bernoulli mix → shard-major sequence packing → incremental dedup of the
next batch. Every stage is the production scale path (digest shuffles,
bucket-local pair explosion, window survivor picks, distributed
prefix-sum packing — no broadcasts of unbounded frames, no all-pairs
joins, no global sorts).

Run: python examples/corpus_pipeline.py [sf_dir]   (default sf0.01)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import dedup as dd
from time_series_data_trimmer_spark.operators import sampling as sp
from time_series_data_trimmer_spark.operators import text as tx
from time_series_data_trimmer_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("corpus-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    print(f"input: {docs.count()} documents from {SF_DIR}")

    # 1. scrub PII-ish spans (emails/URLs/number runs) — codegen regex chain
    docs = tx.redact_documents(docs).withColumn("text", F.col("text_redacted")).drop(
        "text_redacted"
    )

    # 2. quality gate: language + score, keep docs that look like prose.
    # Materialize this stage boundary: redact+language+quality composed
    # into ONE projection exceeds whole-stage-codegen method limits
    # (Catalyst's project collapsing re-inlines every marker-count
    # subtree), and Spark would silently fall back to interpreted
    # execution. At 100 TB the stage boundary is a parquet write; here
    # localCheckpoint plays that role.
    scored = tx.quality_score(tx.language_id(docs)).localCheckpoint()
    kept = scored.filter((F.col("quality") >= 0.4) & (F.col("lang_pred") != "und"))
    print(f"quality gate kept: {kept.count()}")

    # 2b. intra-doc repetition cleanup (r5): collapse scraper-stutter
    # token runs before any digesting (dedup digests must see the
    # CLEANED text or stuttered near-copies evade exact dedup)
    cleaned = tx.collapse_repeat_tokens(kept)
    kept = (
        kept.join(cleaned.select("doc_id", "cleaned"), "doc_id")
        .withColumn("text", F.col("cleaned"))
        .drop("cleaned")
    )
    print(f"repeat-collapsed: {cleaned.filter(F.col('n_removed') > 0).count()} docs had stutter runs")

    # 2c. Gopher-style repetition gate (r5): drop docs whose repetition
    # is INTRA-document (one dominant token / high duplicate-token
    # fraction) — invisible to exact dedup, scan-side integer rules
    kept = tx.gopher_repetition_survivor_rows(kept).drop("n_tokens")
    print(f"after repetition rules: {kept.count()}")

    # 3. exact dedup — row_number over md5(text), one digest shuffle
    exact = dd.exact_dedup(kept)
    print(f"after exact dedup: {exact.count()}")

    # 4. near-dup pairs → clusters → survivors (min id per cluster)
    pairs = dd.minhash_lsh_pairs(exact)
    survivors = dd.dedup_cluster_survivors(exact, pairs)
    print(f"near-dup pairs: {pairs.count()}; survivors: {survivors.count()}")

    # 4b. decontamination (r5/r6): GRADED per-doc contamination
    # fraction vs the held-out benchmark slice (source src0 stands in
    # for the eval set) — digest equi-join, nothing broadcast. The
    # fraction (r6) is the tunable knob the binary flag lacks: drop
    # hard leaks, keep docs with trivial incidental overlap.
    heldout = docs.filter(F.col("source") == "src0")
    scored_leak = dd.contamination_fraction(
        survivors.filter(F.col("source") != "src0"), heldout, n=4
    )
    leaked = scored_leak.filter(F.col("contamination_frac") >= 0.2)
    survivors = survivors.join(leaked.select("doc_id"), "doc_id", "left_anti")
    print(
        "decontamination dropped:", leaked.count(),
        "docs at frac>=0.2; docs with ANY overlap:",
        scored_leak.filter(F.col("n_shared") > 0).count(),
    )

    # 4b-2. SEMANTIC dedup (r6, SemDeDup): drop docs whose EMBEDDINGS
    # are near-dups within an IVF cell — catches paraphrase-level
    # duplication that every lexical digest above misses. The cell
    # structure is the same index the ANN queries probe.
    from time_series_data_trimmer_spark.operators import similarity as sim

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    sem_surv = sim.semdedup_survivors(emb, tau=0.4, n_centroids=16)
    before = survivors.count()
    survivors = survivors.join(
        sem_surv.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi"
    )
    print(f"semantic dedup dropped: {before - survivors.count()} paraphrase-dups")

    # 4c. split labels (r5): hash-bucket train/val/test — membership a
    # pure function of doc_id, immune to re-runs and appends
    survivors = sp.train_val_test_split(survivors)

    # 5. corpus stats a pipeline dashboards
    stats = tx.token_percentiles(survivors).orderBy("lang")
    stats.show(truncate=False)
    dup = tx.dup_rate_by_source(docs).orderBy(F.col("dup_rate").desc()).limit(5)
    dup.show(truncate=False)

    # 5b. vocabulary audit (r6): per-source distinct-token KMV sketch —
    # <= 64 longs per source at every stage, mergeable across daily
    # batches (persist kmv_registers, kmv_merge tomorrow's)
    from time_series_data_trimmer_spark.operators import sketches as sk

    toks = (
        survivors.select(
            "source", F.explode(F.split(F.trim(F.col("text")), " ")).alias("token")
        ).filter(F.length("token") > 0)
    )
    vocab = sk.kmv_distinct(toks, "source", "token", k=64)
    vocab.orderBy(F.col("est_distinct").desc()).limit(3).show(truncate=False)

    # 6. mix: per-source token budgets, then a deterministic Bernoulli
    # thin — both are pure hash membership (repartition/retry/engine
    # stable), so the mix is reproducible forever
    budgeted = sp.token_budget_per_stratum(survivors, budget_tokens=20_000)
    mixed = sp.hash_sample(budgeted, rate=0.9)
    # 6a (r6): the UP-sampling complement — integer multi-epoch
    # replication for small domains (epochs = min(4, ceil(sqrt ratio)));
    # accounting only here, the packer below runs on the single-epoch mix
    up = sp.epoch_upsample(mixed, max_epochs=4)
    print(
        "epoch upsample accounting:",
        up.groupBy("source").agg(F.max("epoch").alias("epochs"))
        .filter(F.col("epochs") > 1).count(),
        "domains would replicate; rows", mixed.count(), "->", up.count(),
    )
    # domain accounting for the final mix: α=0.5 temperature rates show
    # what a rebalanced draw WOULD keep per source (small domains up)
    rates = (
        sp.temperature_sample(budgeted, target_frac=0.5)
        .groupBy("source").agg(F.first("keep_rate").alias("keep_rate"),
                               F.count(F.lit(1)).alias("n_kept"))
        .orderBy(F.col("keep_rate").desc()).limit(3)
    )
    print("temperature-rebalanced top rates:", [tuple(r) for r in rates.collect()])
    print(f"after budget+sample mix: {mixed.count()}")

    # 7. pack: shard-major concat-and-chop sequence layout (per-source
    # shards, globally contiguous offsets; distributed prefix-sum — no
    # global sort anywhere)
    packed = sp.sequence_pack_offsets_sharded(mixed, seq_len=512)
    frag = packed.filter(F.col("first_seq") != F.col("last_seq")).count()
    total = packed.count()
    print(f"packed {total} docs into 512-token sequences; {frag} straddle a boundary")

    # 8. tomorrow's increment: dedup a new batch against today's corpus
    # digests only (never rescan history). Here: replay the raw docs as
    # the "new batch" — everything already ingested is dropped.
    seen = survivors.select(F.md5("text").alias("digest"))
    increment = dd.dedup_incremental(docs, seen)
    print(f"incremental batch: {increment.count()} genuinely-new docs")


if __name__ == "__main__":
    main()
