"""Scalar expression functions (SURVEY §2.9 E1–E15).

All pure Column expressions — JVM-side, codegen-friendly, no UDFs.
The one semantic trap: the reference's angle math relies on Python's
floored ``%`` (non-negative result); Spark's ``%`` truncates toward
zero, so every modulo here is ``pmod``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def frame_transform(src, dst, offset: float = 0.0) -> Column:
    """E1: heading re-expressed in another frame, wrapped to [-180, 180):
    ``((src - dst - offset + 180) % 360) - 180`` with Python floored
    modulo (main.py:621, README.md:217-223) → ``pmod``."""
    return F.pmod(_c(src) - _c(dst) - F.lit(float(offset)) + F.lit(180.0), F.lit(360.0)) - F.lit(180.0)


def wrap_degrees(angle) -> Column:
    """Wrap any angle to [-180, 180) (floored modulo)."""
    return F.pmod(_c(angle) + F.lit(180.0), F.lit(360.0)) - F.lit(180.0)


def seasonal_fold(t, period: float, t_min) -> Column:
    """E11: tumbling-window assignment (plot2d.py:497-501):
    ``season_id = floor((t - t_min)/period)``. Returns a struct with the
    phase ``t_mod = (t - t_min) mod period`` as well."""
    rel = _c(t) - _c(t_min)
    return F.struct(
        F.floor(rel / F.lit(float(period))).alias("season_id"),
        F.pmod(rel, F.lit(float(period))).alias("t_mod"),
    )


def quat_to_yaw(w, x, y, z) -> Column:
    """E8: quaternion → yaw degrees:
    ``atan2(2(wz + xy), 1 - 2(y² + z²))`` (plot3d.py:167-172)."""
    w, x, y, z = _c(w), _c(x), _c(y), _c(z)
    return F.degrees(
        F.atan2(
            F.lit(2.0) * (w * z + x * y),
            F.lit(1.0) - F.lit(2.0) * (y * y + z * z),
        )
    )


def heading_from_forward(fwd_x, fwd_y) -> Column:
    """E9: heading degrees from a forward vector:
    ``degrees(atan2(fwd_y, fwd_x))`` (plot3d.py:125-132)."""
    return F.degrees(F.atan2(_c(fwd_y), _c(fwd_x)))


def quat_to_rotation_matrix(w, x, y, z) -> Column:
    """E6: quaternion → row-major 3×3 rotation matrix as array<double>
    (plot3d.py:229-239)."""
    w, x, y, z = _c(w), _c(x), _c(y), _c(z)
    two = F.lit(2.0)
    one = F.lit(1.0)
    return F.array(
        one - two * (y * y + z * z), two * (x * y - z * w), two * (x * z + y * w),
        two * (x * y + z * w), one - two * (x * x + z * z), two * (y * z - x * w),
        two * (x * z - y * w), two * (y * z + x * w), one - two * (x * x + y * y),
    )


def euler_zyx_to_rotation_matrix(yaw, pitch, roll) -> Column:
    """E7: intrinsic ZYX Euler (yaw, pitch, roll in degrees) → row-major
    3×3 rotation matrix (plot3d.py:215-227): R = Rz(yaw)·Ry(pitch)·Rx(roll)."""
    cy, sy = F.cos(F.radians(_c(yaw))), F.sin(F.radians(_c(yaw)))
    cp, sp = F.cos(F.radians(_c(pitch))), F.sin(F.radians(_c(pitch)))
    cr, sr = F.cos(F.radians(_c(roll))), F.sin(F.radians(_c(roll)))
    return F.array(
        cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
        sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
        -sp, cp * sr, cp * cr,
    )


def normalize_column_name(name) -> Column:
    """E14: lowercase, non-alphanumerics → ``_`` (plot3d.py:370-371)."""
    return F.regexp_replace(F.lower(_c(name)), "[^a-z0-9]+", "_")


def _cross(ax, ay, az, bx, by, bz) -> tuple[Column, Column, Column]:
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def direction_to_frame(dx, dy, dz) -> Column:
    """E10: direction vector → orthonormal frame (plot3d.py:198-212):
    forward = v/|v|; right = forward × worldUp (z), normalized;
    up = right × forward. Row-major 3×3 (rows: forward, right, up) as
    array<double>. Pure trig/arith expressions."""
    dx, dy, dz = _c(dx), _c(dy), _c(dz)
    n = F.sqrt(dx * dx + dy * dy + dz * dz)
    fx, fy, fz = dx / n, dy / n, dz / n
    # world up = (0, 0, 1)
    rx, ry, rz = _cross(fx, fy, fz, F.lit(0.0), F.lit(0.0), F.lit(1.0))
    rn = F.sqrt(rx * rx + ry * ry + rz * rz)
    rx, ry, rz = rx / rn, ry / rn, rz / rn
    ux, uy, uz = _cross(rx, ry, rz, fx, fy, fz)
    return F.array(fx, fy, fz, rx, ry, rz, ux, uy, uz)
