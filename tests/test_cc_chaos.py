"""Chaos test: connected_components vs a plain-Python union-find oracle
over randomized graphs — locks in the pointer-jumping fix beyond the
single path-graph regression test."""

import random

import pandas as pd

from time_series_data_trimmer_spark.operators.dedup import connected_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in the component
    label = {}
    for x in range(n_nodes):
        r = find(x)
        label.setdefault(r, []).append(x)
    out = {}
    for members in label.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def _check(spark, n_nodes, edges):
    pairs = spark.createDataFrame(
        pd.DataFrame(edges or [(0, 0)], columns=["id_a", "id_b"]).astype("int64")
    )
    all_ids = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(n_nodes))}).astype("int64")
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs, all_ids=all_ids).collect()
    }
    want = _union_find(n_nodes, edges or [(0, 0)])
    assert got == want, (
        f"n={n_nodes} m={len(edges)}: "
        f"mismatches {[(k, got[k], want[k]) for k in want if got[k] != want[k]][:5]}"
    )


def test_random_graphs_match_union_find(spark):
    for seed in range(4):
        rng = random.Random(seed)
        n = rng.randint(20, 60)
        m = rng.randint(0, 2 * n)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, n, edges)


def test_adversarial_shapes_match_union_find(spark):
    # long chain (diameter >> propagation rounds without pointer
    # jumping), a star, a clique, and isolated singletons — in one graph
    chain = [(i, i + 1) for i in range(40)]               # nodes 0..40
    star = [(50, 50 + i) for i in range(1, 8)]            # nodes 50..57
    clique = [(a, b) for a in range(60, 65) for b in range(a + 1, 65)]
    edges = chain + star + clique                          # 65..69 isolated
    _check(spark, 70, edges)


def test_reversed_chain_labels_propagate_downhill(spark):
    # labels only decrease; a chain fed in DESCENDING id order makes the
    # minimum travel the full diameter — the exact case plain
    # propagation got silently wrong at max_iter
    edges = [(i + 1, i) for i in range(35)]
    _check(spark, 36, edges)


def test_dedup_components_matches_manual_composition(spark):
    """r8: `dedup_components` (the report family's shared prefix) is
    exactly minhash_lsh_pairs → connected_components over all ids —
    same labeling, every doc present, representatives = min id."""
    from time_series_data_trimmer_spark.operators import dedup as dd

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter("text IS NOT NULL")
    )
    comp = dd.dedup_components(docs)
    assert comp.count() == docs.count()  # every doc labeled
    manual = dd.connected_components(
        dd.minhash_lsh_pairs(docs).select("id_a", "id_b"),
        all_ids=docs.select("doc_id"),
    )
    assert (
        comp.exceptAll(manual).count() == 0
        and manual.exceptAll(comp).count() == 0
    )
    # representative invariant: cluster_id is a member of its own cluster
    reps = comp.filter("doc_id = cluster_id").count()
    assert reps == comp.select("cluster_id").distinct().count()
