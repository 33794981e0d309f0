#!/usr/bin/env python
"""Retrieval-index build end-to-end on this engine: chunk documents →
(fake-)embed chunks → mean-pool back to doc vectors → quantization
audit → IVF index (seed → Lloyd refine → assign) → batch probe for a
query set → exact re-rank. Every stage is the production scale path
(scan-side chunking, narrow pooled partials, bounded centroid
broadcasts, per-query probe cells instead of corpus scans).

The embed step is the repo's deterministic fake (md5-derived features,
`operators/multimodal.py` note): the real encoder is a model-serving
concern, and everything AROUND it — schemas, partitioning, the index
math — is the engine's job and is real here.

Run: python examples/retrieval_pipeline.py [sf_dir]   (default sf0.01)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import similarity as sim
from time_series_data_trimmer_spark.operators import text as tx
from time_series_data_trimmer_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DIM = 16


def fake_embed(chunks, dim=DIM):
    """Deterministic md5-feature embedding of chunk_text (stand-in for
    the model encoder; scan-side, zero shuffle)."""
    h = F.md5(F.col("chunk_text"))
    feats = [
        (
            F.conv(F.substring(F.md5(F.concat(h, F.lit(f"|{i}"))), 1, 8), 16, 10)
            .cast("double")
            / F.lit(float(2**31))
            - F.lit(1.0)
        ).cast("float")
        for i in range(dim)
    ]
    return chunks.select(
        F.col("doc_id"), F.col("chunk_id"), F.array(*feats).alias("embedding")
    )


def main() -> None:
    spark = get_spark("retrieval-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    print(f"input: {docs.count()} documents from {SF_DIR}")

    # 1. chunk: sliding 32-token windows, 8-token overlap (scan-side)
    chunks = tx.chunk_documents(docs, chunk_tokens=32, overlap=8)
    print(f"chunks: {chunks.count()}")

    # 2. embed chunks (fake encoder) → 3. mean-pool to doc vectors
    chunk_vecs = fake_embed(chunks)
    pooled = sim.mean_pool(chunk_vecs, group_col="doc_id", vec_col="embedding")
    doc_vecs = (
        pooled.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("i"), F.col("m")))
            ).alias("im")
        )
        .select(
            F.col("doc_id").alias("vec_id"),
            F.transform(F.col("im"), lambda s: s["m"].cast("float")).alias(
                "embedding"
            ),
        )
    )
    doc_vecs.cache()
    print(f"doc vectors: {doc_vecs.count()} ({DIM}-dim, mean-pooled)")

    # 4. quantization audit before committing to the int8 layout
    rep = sim.quantization_report(doc_vecs)
    worst = rep.agg(F.max("max_abs_err").alias("e")).first()["e"]
    print(f"quantization audit: worst reconstruction error {worst:.6f}")

    # 5. IVF index: deterministic seeds → one Lloyd round → assignment
    seeds = sim.ivf_centroids(doc_vecs, 8)
    cents = sim.ivf_lloyd_refine(doc_vecs, seeds, rounds=1)
    assigned = sim.ivf_assign(doc_vecs, cents)
    sizes = assigned.groupBy("centroid_id").count().orderBy("centroid_id")
    print("cell sizes:", [(r["centroid_id"], r["count"]) for r in sizes.collect()])

    # 6. batch probe: top-5 neighbors for 3 query docs in ONE pass
    queries = doc_vecs.limit(3)
    topk = sim.ivf_batch_topk(
        doc_vecs, queries, k=5, n_centroids=8, nprobe=3, centroids=cents
    )
    for r in topk.orderBy("query_id", "rank").collect():
        print(
            f"  query {r['query_id']:>4} rank {r['rank']}: "
            f"doc {r['vec_id']:>4} cosine {r['cosine']:.4f}"
        )
    doc_vecs.unpersist()
    print("retrieval pipeline complete")


if __name__ == "__main__":
    main()
