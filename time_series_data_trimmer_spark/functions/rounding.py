"""Cross-engine deterministic rounding.

Spark's ``round(double, k)`` rounds the double's shortest decimal
representation (Java BigDecimal HALF_UP); DuckDB rounds the binary
value. On values that land exactly on a decimal grid (common here:
2-decimal inputs, millisecond grids), the two disagree by one final
digit. ``floor(x * 10^k + 0.5) / 10^k`` evaluated in IEEE doubles is
bit-identical in any engine given the same input double, so every
driver-facing output and every semantic rounding inside an operator
uses this formula on BOTH the Spark and the DuckDB side.

(The reference uses numpy/python round — half-even — which differs from
either engine's ``round`` only at exact halfway points; the explicit
formula is our single documented deviation, chosen for cross-engine
determinism. See SURVEY §7.5-5.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rd(col: Column, k: int) -> Column:
    """Deterministic round-half-up to k decimals (IEEE-stable)."""
    scale = float(10**k)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def sql_rd(expr: str, k: int) -> str:
    """The identical formula as DuckDB SQL text."""
    scale = float(10**k)
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"
