"""Expression-function tests (E6–E9) vs numpy, plus hypothesis
property tests running random series through the window filters against
the pandas oracle — SURVEY §5.2's randomized extension of the
reference's fixture pattern."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.functions import expressions as E
from time_series_data_trimmer_spark.operators.filters import apply_filter


def _quat_df(spark, quats):
    return spark.createDataFrame(
        [(float(w), float(x), float(y), float(z)) for w, x, y, z in quats],
        "w double, x double, y double, z double",
    )


def _np_quat_rot(w, x, y, z):
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def test_quat_rotation_matrix_vs_numpy(spark):
    rng = np.random.RandomState(11)
    q = rng.randn(5, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    df = _quat_df(spark, q)
    out = df.select(E.quat_to_rotation_matrix("w", "x", "y", "z").alias("r")).toPandas()
    for row, (w, x, y, z) in zip(out["r"], q):
        got = np.array(row).reshape(3, 3)
        np.testing.assert_allclose(got, _np_quat_rot(w, x, y, z), atol=1e-12)
        # proper rotation: orthonormal, det=1
        np.testing.assert_allclose(got @ got.T, np.eye(3), atol=1e-12)
        assert abs(np.linalg.det(got) - 1.0) < 1e-12


def test_euler_zyx_rotation_matrix(spark):
    df = spark.createDataFrame([(30.0, 20.0, 10.0)], "yaw double, pitch double, roll double")
    out = df.select(E.euler_zyx_to_rotation_matrix("yaw", "pitch", "roll").alias("r")).toPandas()
    got = np.array(out["r"][0]).reshape(3, 3)
    cy, sy = np.cos(np.radians(30)), np.sin(np.radians(30))
    cp, sp = np.cos(np.radians(20)), np.sin(np.radians(20))
    cr, sr = np.cos(np.radians(10)), np.sin(np.radians(10))
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    np.testing.assert_allclose(got, Rz @ Ry @ Rx, atol=1e-12)


def test_quat_yaw_consistent_with_rotation(spark):
    # yaw from quaternion == heading of the rotated +X axis
    rng = np.random.RandomState(5)
    angles = rng.uniform(-np.pi, np.pi, 4)
    quats = [(np.cos(a / 2), 0.0, 0.0, np.sin(a / 2)) for a in angles]  # pure Z rotations
    df = _quat_df(spark, quats)
    out = df.select(E.quat_to_yaw("w", "x", "y", "z").alias("yaw")).toPandas()
    np.testing.assert_allclose(out["yaw"], np.degrees(angles), atol=1e-9)


def test_wrap_degrees_matches_python_mod(spark):
    vals = [-720.0, -181.0, -180.0, -1.0, 0.0, 179.9, 180.0, 359.0, 1234.5]
    df = spark.createDataFrame([(v,) for v in vals], "a double")
    out = df.select(E.wrap_degrees("a").alias("w")).toPandas()
    want = [((v + 180.0) % 360.0) - 180.0 for v in vals]  # Python floored mod
    np.testing.assert_allclose(out["w"], want, atol=1e-12)


# ---------------------------------------------------------------------------
# property-based: random series through the filters vs pandas oracle
# ---------------------------------------------------------------------------

series_strategy = st.lists(
    st.one_of(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        st.none(),
    ),
    min_size=1,
    max_size=40,
)


def _spark_vs_pandas(spark, values, filter_type, params, oracle_fn):
    pdf = pd.DataFrame(
        {
            "trial_id": "t",
            "normalized_time": np.arange(len(values), dtype=float),
            "ch": [np.nan if v is None else v for v in values],
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        apply_filter(df, ["ch"], filter_type, params)
        .toPandas().sort_values("normalized_time")["ch"].to_numpy(dtype=float)
    )
    want = oracle_fn(pdf["ch"]).to_numpy(dtype=float)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9, equal_nan=True)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=series_strategy, window=st.integers(min_value=1, max_value=9))
def test_property_moving_average(spark, values, window):
    _spark_vs_pandas(
        spark, values, "moving_average", {"window": window},
        lambda s: s.rolling(window, min_periods=1, center=True).mean(),
    )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=series_strategy)
def test_property_zscore(spark, values):
    def oracle(s):
        arr = s.to_numpy()
        with np.errstate(all="ignore"):
            std = np.nanstd(arr) or 1.0
            return pd.Series((arr - np.nanmean(arr)) / std, index=s.index)

    _spark_vs_pandas(spark, values, "normalize_zscore", {}, oracle)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=series_strategy)
def test_property_interpolate_linear(spark, values):
    _spark_vs_pandas(
        spark, values, "interpolate", {"method": "linear"},
        lambda s: s.interpolate(method="linear", limit_direction="both"),
    )


def test_direction_to_frame_orthonormal(spark):
    rng = np.random.RandomState(9)
    dirs = rng.randn(6, 3)
    dirs = dirs[np.abs(dirs[:, :2]).sum(axis=1) > 0.1]  # avoid the up-axis singularity
    df = spark.createDataFrame([tuple(map(float, d)) for d in dirs], "dx double, dy double, dz double")
    out = df.select(E.direction_to_frame("dx", "dy", "dz").alias("f")).toPandas()
    for row, d in zip(out["f"], dirs):
        m = np.array(row).reshape(3, 3)  # rows: forward, right, up
        np.testing.assert_allclose(m[0], d / np.linalg.norm(d), atol=1e-12)
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)  # orthonormal
        assert abs(np.dot(m[1], [0, 0, 1])) < 1e-12  # right ⊥ world-up
