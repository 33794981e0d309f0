"""Triangle counting: known closed forms + orientation bound.

K4 has C(4,3)=4 triangles, K5 has 10, the 4-cycle has none, and
duplicate / reversed / self-loop edges must not change any answer.
K5 also pins the orientation arithmetic: ranked vertex i gets
out-degree n-1-i, so wedges = sum C(out_deg, 2) = 10.
"""

from __future__ import annotations

import itertools

from time_series_data_trimmer_spark.operators.graph import triangle_count


def _run(spark, pairs):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )
    return triangle_count(df).first().asDict()


def test_k4_has_four_triangles(spark):
    r = _run(spark, itertools.combinations(range(4), 2))
    assert r["n_vertices"] == 4
    assert r["n_edges"] == 6
    assert r["n_triangles"] == 4
    # orientation bound: in K4 every vertex's out-degree <= 3, and the
    # total-order orientation makes the max out-degree exactly n-1=3
    # only for the minimum vertex; wedge count must be >= triangles
    assert r["n_wedges"] >= r["n_triangles"]


def test_square_has_no_triangles(spark):
    r = _run(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    assert r["n_edges"] == 4
    assert r["n_triangles"] == 0


def test_duplicates_loops_and_direction_are_canonicalized(spark):
    tri = [(0, 1), (1, 2), (2, 0)]
    noisy = tri + [(1, 0), (2, 1), (0, 0), (1, 1), (0, 1)]
    assert _run(spark, noisy)["n_triangles"] == 1
    assert _run(spark, tri)["n_triangles"] == 1


def test_k5_matches_binomial(spark):
    r = _run(spark, itertools.combinations(range(5), 2))
    assert r["n_triangles"] == 10  # C(5,3)
    # degree orientation: out-degree of vertex ranked i in the total
    # order is (n-1-i), so max out-degree is n-1=4 and the wedge count
    # is sum C(out_deg, 2) = C(4,2)+C(3,2)+C(2,2)+C(1,2) = 6+3+1+0
    assert r["max_out_degree"] == 4
    assert r["n_wedges"] == 10


def test_label_propagation_denoises_and_breaks_ties(spark):
    from time_series_data_trimmer_spark.operators.graph import label_propagation

    # two 4-cliques bridged by one edge; node 3 is mislabeled into
    # class 9 -> its three clique-neighbors outvote the seed in round 1
    clique_a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    clique_b = [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
    edges = spark.createDataFrame(
        clique_a + clique_b + [(3, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame(
        [(i, 9 if i == 3 else (0 if i < 4 else 1)) for i in range(8)],
        "node long, label int",
    )
    out = {
        r["node"]: r["label"]
        for r in label_propagation(edges, seeds, iterations=2).collect()
    }
    assert all(out[i] == 0 for i in range(4)), out
    assert all(out[i] == 1 for i in range(4, 8)), out

    # pure tie (one neighbor of each label) -> smallest label wins
    edges2 = spark.createDataFrame([(0, 1), (2, 1)], "src long, dst long")
    seeds2 = spark.createDataFrame(
        [(0, 5), (1, 7), (2, 3)], "node long, label int"
    )
    out2 = {
        r["node"]: r["label"]
        for r in label_propagation(edges2, seeds2, iterations=1).collect()
    }
    assert out2[1] == 3  # min(5, 3)


def test_triangle_count_matches_bruteforce_random_graphs(spark):
    """Deterministic pseudo-random graphs (md5-seeded, no RNG state):
    degree-oriented count == brute-force C(n,3) scan."""
    import hashlib
    import itertools

    for seed in ("g1", "g2", "g3"):
        nodes = 18
        edges = [
            (a, b)
            for a, b in itertools.combinations(range(nodes), 2)
            if int(hashlib.md5(f"{seed}|{a}|{b}".encode()).hexdigest()[:4], 16)
            % 100
            < 30  # ~30% density
        ]
        adj = {n: set() for n in range(nodes)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        brute = sum(
            1
            for a, b, c in itertools.combinations(range(nodes), 3)
            if b in adj[a] and c in adj[a] and c in adj[b]
        )
        got = _run(spark, edges)
        assert got["n_triangles"] == brute, (seed, brute, got)
