"""Multi-dimensional data layout: Z-order (Morton) clustering for
row-group pruning.

The 100 TB problem: parquet min/max pruning only helps along the sort
order. The events table naturally arrives time-ordered, so a
time-slice query prunes beautifully but a ``user_id`` predicate reads
EVERY row group (each group spans all users). Z-ordering interleaves
the bits of both dimensions into one sort key, so row groups become
axis-aligned rectangles in (user, time) space and min/max pruning
works for predicates on EITHER dimension — the technique behind
Delta/Iceberg ``ZORDER BY`` clustering, here as a plain column
expression + ``repartitionByRange`` write.

Everything is integer bit arithmetic on bucketed coordinates —
scan-side codegen in Spark and literally the same formula in SQL, so
the key is exact-oracle-checkable. `scripts/zorder_prune.py` measures
the pruning win on real parquet footers (SCALING.md §r7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave(cols: list[Column], bits: int) -> Column:
    """Round-robin bit interleave of N non-negative integer
    coordinates: column ``i``'s bit ``b`` lands at position
    ``b·n + i``. A sum of disjoint powers of two — pure codegen (no
    UDF), and the identical expression reproduces in any SQL engine.
    Coordinates beyond ``bits`` bits must be pre-bucketed by the
    caller (the locality tradeoff lives in the bucketing, not the
    interleave). The SINGLE Morton implementation in the repo:
    `sources/corpus_io.write_zordered` (N-column min-max-scaled
    corpus write) and `morton_z` below both delegate here."""
    n = len(cols)
    acc: Column = F.lit(0).cast("long")
    for b in range(int(bits)):
        for i, c in enumerate(cols):
            acc = acc + (
                F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
                * F.lit(1 << (b * n + i)).cast("long")
            )
    return acc


def morton_z(a: Column, b: Column, bits: int = 16) -> Column:
    """Two-coordinate Z-value (a in odd positions, b in even):
    ``z = Σ_i ((a>>i)&1) << (2i+1) + ((b>>i)&1) << (2i)`` —
    `morton_interleave([b, a], bits)`."""
    return morton_interleave([b, a], bits)


def sql_morton_z(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """The identical Z-value as SQL text (DuckDB `>>`/`&`/`<<`)."""
    terms = []
    for i in range(int(bits)):
        terms.append(f"(((CAST({a_expr} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"(((CAST({b_expr} AS BIGINT) >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    out_dir: str,
    a_col: str,
    b_col: str,
    bits: int = 16,
    n_files: int = 32,
    row_group_bytes: int = 1 << 20,
) -> None:
    """Write ``df`` parquet clustered by the Z-value of (a_col, b_col):
    ``repartitionByRange(z)`` (range exchange → each output file owns a
    contiguous Z-range) + ``sortWithinPartitions(z)`` (row groups
    within a file own sub-ranges). Row-group size is the pruning
    granularity — at scale you tune ``row_group_bytes`` against footer
    overhead."""
    z = morton_z(F.col(a_col), F.col(b_col), bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(int(n_files), F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .option("parquet.block.size", int(row_group_bytes))
        .parquet(out_dir)
    )
