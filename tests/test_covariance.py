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
