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


def encoding_advisor(
    df: DataFrame,
    columns: list[str],
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("t_us", "event_id"),
) -> DataFrame:
    """Storage-encoding audit for a trial-clustered layout: for each
    column, how well would parquet's RLE and dictionary encodings do
    if the table is written clustered by ``key_col`` and sorted by
    ``order_cols`` inside each file (exactly what `zorder_write` /
    the bucketed writer produce)?

    Per column: row count, exact NDV (dictionary size), run count
    under the clustered sort (adjacent-equal collapse = RLE runs),
    ``rle_ratio`` = runs/n (1.0 = incompressible by RLE), and
    ``dict_bits`` = ceil(log2 NDV) (per-value width after dictionary
    encoding). The numbers that decide whether re-clustering a 100 TB
    table pays for itself — the measurement twin of the
    `scripts/zorder_prune.py` row-group-pruning study.

    Plan: one window pass on the trial key computes the run flags for
    ALL audited columns at once; each column then contributes one
    count/NDV/sum aggregation row, unioned into a (column, metrics)
    report — aggregation output is len(columns) rows, so everything
    after the scan is negligible.
    """
    from pyspark.sql import Window

    from time_series_data_trimmer_spark.functions.rounding import rd

    w = Window.partitionBy(key_col).orderBy(*order_cols)
    flagged = df.select(
        *[F.col(c) for c in dict.fromkeys([key_col, *order_cols, *columns])],
        *[
            F.when(
                F.lag(F.col(c)).over(w).isNull()
                | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w)),
                1,
            )
            .otherwise(0)
            .alias(f"__run_{c}")
            for c in columns
        ],
    )
    out = None
    for c in columns:
        row = flagged.agg(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col(c)).alias("ndv"),
            F.sum(f"__run_{c}").alias("n_runs"),
        ).select(
            "column",
            "n",
            "ndv",
            "n_runs",
            rd(F.col("n_runs").cast("double") / F.col("n"), 6).alias("rle_ratio"),
            F.ceil(F.log2(F.col("ndv").cast("double"))).cast("long").alias("dict_bits"),
        )
        out = row if out is None else out.unionAll(row)
    return out


def compaction_plan(
    df: DataFrame,
    part_col: str,
    bytes_col: Column,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """File-sizing plan for a partitioned write: per partition value,
    the exact row count, estimated on-disk bytes, and the file count
    that lands each partition's files at ``target_file_bytes``
    (parquet's sweet spot — too-small files drown the driver/listing
    in metadata, too-large files cap scan parallelism and inflate
    row-group memory).

    ``bytes_col`` is the caller's per-row byte estimate evaluated on
    the scan (e.g. ``octet_length(text) + overhead``); the plan is
    ONE map-side-combined aggregation over (part, bytes), then pure
    arithmetic — the 1-row corpus total joins back as a sanctioned
    scalar broadcast so each partition also reports its share (the
    skew signal: one partition owning 40% of bytes wants salting or
    sub-partitioning, not more files).

    Feeds ``df.repartition(n_files, part_col, salt)`` or AQE's
    rebalance; at 100 TB this query IS the compaction job's planning
    step, and it costs one scan.
    """
    from time_series_data_trimmer_spark.functions.rounding import rd

    per = (
        df.select(F.col(part_col).alias("part"), bytes_col.alias("__b"))
        .groupBy("part")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__b").cast("long").alias("est_bytes"),
        )
    )
    total = per.agg(F.sum("est_bytes").alias("__total"))
    n_files = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(
            F.col("est_bytes").cast("double") / F.lit(float(target_file_bytes))
        ).cast("long"),
    )
    return per.crossJoin(total).select(
        "part",
        "n_rows",
        "est_bytes",
        n_files.alias("n_files"),
        rd(
            F.col("est_bytes").cast("double")
            / n_files.cast("double")
            / F.lit(1024.0 * 1024.0),
            6,
        ).alias("avg_file_mb"),
        rd(
            F.col("est_bytes").cast("double") / F.col("__total").cast("double"),
            6,
        ).alias("pct_of_total"),
    )
