"""Link-analysis operators over edge DataFrames.

`connected_components` (operators/dedup.py) handles the equivalence
side of graph work (dedup clusters); this module adds the CENTRALITY
side. Everything is edge-table relational algebra — no graph library,
no driver-side adjacency, no vertex broadcast that scales with N: an
iteration is two shuffle-hash joins keyed on the vertex id plus one
map-side-combined aggregation, so a 10⁹-vertex graph shards exactly
like any other fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from time_series_data_trimmer_spark.functions.rounding import rd


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
) -> DataFrame:
    """Weighted PageRank over a directed edge table, fixed iteration
    count, decimal-exact per step — engine-portable like the PCA power
    iteration (`similarity.power_iteration_top_eigen`), with the full
    unrolled recurrence reproducible as SQL.

    Semantics: vertices = nodes appearing as a source (for an
    undirected graph pass both edge directions; every node then has
    out-degree ≥ 1, so there are no dangling nodes and no leaked-mass
    correction — the documented simplification). Uniform start 1/N;
    step ``r'(v) = (1−d)/N + d · Σ_{u→v} rd(r(u)·w/wdeg(u), 9)`` with
    DECIMAL edge-contribution accumulation and a 9-dp round per rank,
    so every iteration is bit-identical in any engine.

    Plan shape per iteration: rank ⋈ out-degree (both keyed on the
    vertex — Exchange reuse), one shuffle-hash join onto the edge
    table, one map-side-combined sum per destination. The scalar N
    joins once as a 1-row broadcast. Nothing driver-side, nothing
    O(V) broadcast, iteration count fixed at plan time.
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("double").alias("w"),
    )
    deg = e.groupBy("src").agg(F.sum("w").alias("wdeg"))
    nodes = deg.select("src")
    n_scalar = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    base = F.lit(1.0 - float(damping)) / F.col("__n")
    r = nodes.crossJoin(F.broadcast(n_scalar)).select(
        "src", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for _ in range(int(iterations)):
        contrib = (
            e.join(r.hint("shuffle_hash"), "src")
            .join(deg.hint("shuffle_hash"), "src")
            .select(
                F.col("dst"),
                rd(F.col("rank") * F.col("w") / F.col("wdeg"), 9)
                .cast("decimal(38,9)")
                .alias("c"),
            )
        )
        summed = contrib.groupBy("dst").agg(
            F.sum("c").cast("double").alias("__s")
        )
        r = (
            nodes.join(
                summed.withColumnRenamed("dst", "src").hint("shuffle_hash"),
                "src",
                "left",
            )
            .crossJoin(F.broadcast(n_scalar))
            .select(
                "src",
                rd(
                    base
                    + F.lit(float(damping)) * F.coalesce(F.col("__s"), F.lit(0.0)),
                    9,
                ).alias("rank"),
            )
        )
    return r.select(F.col("src").alias("node"), F.col("rank").alias("pagerank"))
