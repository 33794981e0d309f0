"""Johnson–Lindenstrauss ±1 projection (`sim.jl_project`): sign-matrix
determinism, numpy agreement, and the distance-preservation property
the projection exists for."""

from __future__ import annotations

import numpy as np
import pytest

from time_series_data_trimmer_spark.operators import similarity as sim


def test_sign_matrix_is_deterministic_and_balanced():
    a = sim.jl_sign_matrix(64, 16)
    b = sim.jl_sign_matrix(64, 16)
    assert a == b
    flat = [s for row in a for s in row]
    assert set(flat) == {1, -1}
    # md5 parity is unbiased: the 1024-entry matrix can't be lopsided
    assert 0.4 < (sum(1 for s in flat if s == 1) / len(flat)) < 0.6


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.RandomState(11)
    return rng.randn(60, 32).astype(np.float32)


def test_matches_numpy_projection(spark, vecs):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        ["vec_id", "embedding"],
    )
    out = sim.jl_project(df, in_dim=32, out_dim=8)
    got = {(r["vec_id"], r["k"]): r["y"] for r in out.collect()}
    signs = np.array(sim.jl_sign_matrix(32, 8), dtype=np.float64)
    # the operator rounds each term to 9 dp before the exact sum
    terms = np.floor(vecs.astype(np.float64) * 1e9 + 0.5) / 1e9
    ref = terms @ signs.T / np.sqrt(8)
    for i in range(60):
        for k in range(8):
            assert got[(i, k)] == pytest.approx(ref[i, k], abs=1e-6)


def test_distances_preserved_in_expectation(vecs):
    # pure-numpy JL sanity: with out_dim=16 from 32 dims, pairwise
    # squared distances stay within a loose (0.4, 1.9) ratio band for
    # the bulk of pairs — the property that makes the operator useful.
    signs = np.array(sim.jl_sign_matrix(32, 16), dtype=np.float64)
    proj = vecs.astype(np.float64) @ signs.T / np.sqrt(16)
    n = len(vecs)
    ratios = []
    for i in range(0, n, 3):
        for j in range(i + 1, n, 7):
            d0 = np.sum((vecs[i] - vecs[j]) ** 2)
            d1 = np.sum((proj[i] - proj[j]) ** 2)
            ratios.append(d1 / d0)
    ratios = np.array(ratios)
    assert 0.8 < np.median(ratios) < 1.25
    assert np.mean((ratios > 0.4) & (ratios < 1.9)) > 0.85
