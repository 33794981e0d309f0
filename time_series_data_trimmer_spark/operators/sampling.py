"""Deterministic sampling and data-mixing operators for training-data
pipelines.

A 100 TB corpus pipeline needs sampling that is (a) reproducible across
reruns, engines, and partitionings — a bug report must point at the
same sampled doc forever — and (b) executable scan-side with no state.
Spark's ``df.sample`` is seeded per-partition and changes membership
whenever the partitioning changes, so these operators hash CONTENT KEYS
instead: md5 is identical everywhere, membership is a pure function of
the row key, and every operator below is exact-oracle-checkable in
DuckDB.

All math is integer (hash slices, token counts, cumulative sums), so
there is no float boundary anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators.text import token_count

#: hash domain: first 8 md5 hex digits → uniform 32-bit integer
_HASH_SPACE = 1 << 32


def hash_u32(key: Column, seed: str = "tsdt") -> Column:
    """Uniform deterministic 32-bit hash of a key column: integer value
    of the first 8 hex digits of ``md5(seed || '|' || key)``. Same
    value in Spark, DuckDB, and Python — the portable Bernoulli coin."""
    digest = F.md5(F.concat(F.lit(seed), F.lit("|"), key.cast("string")))
    return F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")


def sql_hash_u32(key_expr: str, seed: str = "tsdt") -> str:
    """The identical hash as DuckDB SQL text."""
    return f"('0x' || substr(md5('{seed}' || '|' || CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT"


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    seed: str = "tsdt",
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff
    ``hash_u32(key) < floor(rate · 2^32)``.

    Membership is a pure function of (seed, key) — stable under
    repartitioning, retries, and engine changes, unlike ``df.sample``
    (whose per-partition RNG re-deals whenever the layout moves). The
    filter runs inside the scan's WholeStageCodegen span (no shuffle,
    no state); it is not a parquet-level PushedFilter — md5 must
    evaluate per row, the unavoidable cost of layout-independence.
    """
    threshold = int(rate * _HASH_SPACE)
    return df.filter(hash_u32(F.col(key_col), seed) < F.lit(threshold))


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "tsdt",
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing primitive
    ("keep 50% of web, 10% of forums, drop the rest").

    The per-row threshold is a CASE over the stratum column; everything
    stays scan-side codegen (one branch per configured stratum, no
    join, no shuffle). Strata absent from ``rates`` use
    ``default_rate``.
    """
    thr = F.lit(int(default_rate * _HASH_SPACE))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(int(rate * _HASH_SPACE))
        ).otherwise(thr)
    return df.filter(hash_u32(F.col(key_col), seed) < thr)


def token_budget_per_stratum(
    df: DataFrame,
    budget_tokens: int,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "tsdt",
) -> DataFrame:
    """Cap each stratum at a token budget, keeping a deterministic
    hash-ordered prefix — "at most N tokens per source" for training
    mixes.

    Docs are ordered within their stratum by (hash_u32(key), key) — a
    reproducible shuffle — and kept while the RUNNING token total
    (inclusive) stays within the budget. One window over the stratum
    key: a single shuffle, integer cumulative sum, no joins. A doc that
    straddles the boundary is kept iff its own inclusive total fits
    (documents are atomic — budgets cap, they never split).

    Returns the kept rows plus ``n_tokens`` and ``cum_tokens`` so the
    mix report is free.
    """
    h = hash_u32(F.col(key_col), seed)
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(h.asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.withColumn("n_tokens", token_count(F.col(text_col)).cast("long"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= F.lit(int(budget_tokens)))
    )
    return out


def sequence_pack_offsets(
    df: DataFrame,
    seq_len: int,
    key_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "tsdt",
) -> DataFrame:
    """Concat-and-chop sequence packing offsets — the layout step of
    LLM training-data prep: documents are concatenated in a
    deterministic hash order and the token stream is chopped into
    fixed ``seq_len`` windows.

    Emits, per doc: its global token interval [tok_start, tok_end) and
    the first/last training-sequence index it lands in (a doc straddles
    a boundary iff first_seq < last_seq — the packing report that tells
    you how much attention-masking/fragmentation a mix produces).

    One GLOBAL ordered cumulative sum — in Spark a keyless running
    window means a single-partition sort, so at scale this runs
    per-stratum in production (pass a partition column via
    ``stratum_col`` in `token_budget_per_stratum` first, or pack per
    shard); the registered form demonstrates the semantics. All
    integer math: exact in any engine.
    """
    h = hash_u32(F.col(key_col), seed)
    w = Window.orderBy(h.asc(), F.col(key_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n_tok = token_count(F.col(text_col)).cast("long")
    out = (
        df.withColumn("n_tokens", n_tok)
        .withColumn("tok_end", F.sum("n_tokens").over(w))
        .withColumn("tok_start", F.col("tok_end") - F.col("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    return out.select(
        F.col(key_col),
        "n_tokens",
        "tok_start",
        "tok_end",
        F.floor(F.col("tok_start") / F.lit(int(seq_len))).cast("long").alias("first_seq"),
        F.floor((F.col("tok_end") - 1) / F.lit(int(seq_len))).cast("long").alias("last_seq"),
    )
