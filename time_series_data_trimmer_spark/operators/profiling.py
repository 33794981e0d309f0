"""One-pass column profiling — the ``ANALYZE TABLE`` primitive on
portable sketches.

What an optimizer (or a data-quality gate) wants per column: row
count, null count, min/max, distinct-count estimate, and quantiles.
At 100 TB the naive recipe is one shuffle per statistic per column;
here the columns unpivot into (col, value) rows on the scan and ONE
column-keyed pass computes everything — scalar stats as a plain
aggregate, NDV via the KMV registers, quantiles via the bottom-k
sketch — all on the repo's portable md5 coin, so the whole profile is
exact-oracle-checkable and the sketch states merge across partitions
and days like every other register in `operators/sketches.py`.

Determinism note: hashing a DOUBLE for KMV requires a canonical text
form, and float→string formatting is engine-specific. Values
canonicalize to the 6-dp scaled integer ``floor(v·10⁶ + 0.5)`` first
— integers print identically everywhere, and 6 dp is the repo's
value grid. That bounds profiled values to |v| < ~9.2e12 (the scaled
int must fit bigint): profile epoch SECONDS, not micros, and rescale
any wider column before profiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from time_series_data_trimmer_spark.functions.rounding import rd
from time_series_data_trimmer_spark.operators.sampling import hash_u32

_HASH_SPACE_F = float(1 << 32)


def profile_columns(
    df: DataFrame,
    cols: list[str],
    id_col: str,
    k_ndv: int = 64,
    k_q: int = 32,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    seed: str = "tsdt|prof",
) -> DataFrame:
    """Profile ``cols`` (numeric) of ``df``: one row per column with
    (n, n_null, min, max, ndv_est, q25/q50/q75 estimates). ``id_col``
    must be row-unique (quantile-sketch row identity)."""
    stacked = df.select(
        F.col(id_col).alias("__rid"),
        F.stack(
            F.lit(len(cols)),
            *[x for c in cols for x in (F.lit(c), F.col(c).cast("double"))],
        ).alias("col", "v"),
    )
    scalar = stacked.groupBy("col").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").isNull().cast("long")).alias("n_null"),
        rd(F.min("v"), 6).alias("min_v"),
        rd(F.max("v"), 6).alias("max_v"),
    )
    nn = stacked.filter(F.col("v").isNotNull())
    canon = F.floor(F.col("v") * F.lit(1e6) + F.lit(0.5)).cast("long").cast("string")
    hashed = nn.select("col", hash_u32(canon, seed).alias("u")).distinct()
    wk = Window.partitionBy("col").orderBy(F.col("u").asc())
    kept = (
        hashed.withColumn("__rn", F.row_number().over(wk))
        .filter(F.col("__rn") <= int(k_ndv))
        .groupBy("col")
        .agg(F.count(F.lit(1)).alias("ndv_kept"), F.max("u").alias("__kth"))
    )
    ndv = kept.select(
        "col",
        rd(
            F.when(F.col("ndv_kept") < int(k_ndv), F.col("ndv_kept").cast("double"))
            .otherwise(
                F.lit(float(k_ndv - 1)) * F.lit(_HASH_SPACE_F) / F.col("__kth").cast("double")
            ),
            6,
        ).alias("ndv_est"),
    )
    qreg = nn.select(
        "col", hash_u32(F.col("__rid"), seed + "|q").alias("u"), F.col("v")
    )
    wq = Window.partitionBy("col").orderBy(F.col("u").asc(), F.col("v").asc())
    regs = qreg.withColumn("__rn", F.row_number().over(wq)).filter(
        F.col("__rn") <= int(k_q)
    )
    wr = Window.partitionBy("col").orderBy(F.col("v").asc(), F.col("u").asc())
    wp = Window.partitionBy("col")
    ranked = regs.select(
        "col", "v",
        F.row_number().over(wr).alias("__vr"),
        F.count(F.lit(1)).over(wp).alias("__nk"),
    )
    quants = None
    for q in qs:
        tgt = F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.lit(float(q)) * F.col("__nk").cast("double")),
        )
        one = ranked.filter(F.col("__vr") == tgt).select(
            "col", rd(F.col("v"), 6).alias(f"q{int(q * 100)}")
        )
        quants = one if quants is None else quants.join(one, "col")
    out = scalar.join(ndv, "col").join(quants, "col")
    return out.select(
        "col", "n", "n_null", "min_v", "max_v", "ndv_est",
        *[f"q{int(q * 100)}" for q in qs],
    )
