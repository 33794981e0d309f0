"""IVF-PQ read-path contracts: quantization round-trip inside the
probe, shortlist determinism, and recall of the exact re-rank vs
brute force on planted near-duplicates."""

import numpy as np
from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators import similarity as sim


def _emb(spark, n=200, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, dim)).astype("float32")
    # plant 5 near-dups of vector 0
    for j in range(1, 6):
        base[j] = base[0] + rng.normal(scale=0.01, size=dim).astype("float32")
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), base


def test_pq_recall_on_planted_near_dups(spark):
    df, base = _emb(spark)
    q = [float(x) for x in base[0]]
    got = [r["vec_id"] for r in sim.ivf_pq_topk(df, q, k=6, shortlist=40,
                                                n_centroids=8, nprobe=4).collect()]
    # exact brute-force top-6 for reference
    bf = [r["vec_id"] for r in sim.brute_force_topk(df, q, k=6).collect()]
    # planted near-dups must survive the quantized shortlist
    assert set(got) & set(range(6)) == set(bf) & set(range(6))


def test_pq_shortlist_deterministic_under_repartition(spark):
    df, base = _emb(spark, n=150)
    q = [float(x) for x in base[3]]
    a = [(r["vec_id"], r["cosine"]) for r in sim.ivf_pq_topk(df, q, k=10).collect()]
    b = [
        (r["vec_id"], r["cosine"])
        for r in sim.ivf_pq_topk(df.repartition(11), q, k=10).collect()
    ]
    assert a == b


def test_dequantize_bounds_error(spark):
    df, base = _emb(spark, n=50)
    qz = sim.quantize_embeddings(df, levels=256)
    recon = qz.select(
        "vec_id",
        sim.dequantize(F.col("qvec"), F.col("q_lo"), F.col("q_scale")).alias("rv"),
        "q_scale",
    )
    joined = df.join(recon, "vec_id").select(
        F.max(
            F.array_max(
                F.zip_with(
                    F.col("embedding"),
                    F.col("rv"),
                    lambda x, y: F.abs(x.cast("double") - y),
                )
            )
            / F.col("q_scale")
        ).alias("worst_halfsteps")
    )
    # scalar quantization error is at most half a step
    assert joined.first()["worst_halfsteps"] <= 0.5 + 1e-9
