"""`sim.covariance_matrix` vs numpy on a deterministic small matrix —
values (population covariance, E[xy]−E[x]E[y]), triangle shape, and
diagonal = variance."""

from __future__ import annotations

import numpy as np
import pytest

from time_series_data_trimmer_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def mat():
    rng = np.random.RandomState(7)
    return rng.randn(40, 5).astype(np.float32)


def test_matches_numpy(spark, mat):
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        ["vec_id", "embedding"],
    )
    out = {(r["i"], r["j"]): r for r in sim.covariance_matrix(df).collect()}
    ref = np.cov(mat.astype(np.float64), rowvar=False, bias=True)
    d = mat.shape[1]
    assert set(out) == {(i, j) for i in range(d) for j in range(d) if i <= j}
    for (i, j), r in out.items():
        assert r["n_vecs"] == 40
        assert r["cov"] == pytest.approx(ref[i, j], abs=2e-6)
    # diagonal is the per-dimension variance
    for i in range(d):
        assert out[(i, i)]["cov"] == pytest.approx(mat[:, i].astype(np.float64).var(), abs=2e-6)


def test_power_iteration_matches_numpy_dominant_axis(spark, mat):
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        ["vec_id", "embedding"],
    )
    out = sim.power_iteration_top_eigen(df, rounds=8)
    rows = sorted(out.collect(), key=lambda r: r["i"])
    v = np.array([r["v"] for r in rows])
    lam = rows[0]["eigenvalue"]
    C = np.cov(mat.astype(np.float64), rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(C)
    top = evecs[:, -1]
    # direction match up to sign; 8 rounds converge tightly for a
    # well-separated top eigenvalue
    assert abs(float(np.dot(v, top))) > 0.999
    assert lam == pytest.approx(evals[-1], rel=2e-3)
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-6)
