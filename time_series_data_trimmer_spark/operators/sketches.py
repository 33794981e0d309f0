"""Mergeable distinct-count sketches over the portable md5 hash.

The 100 TB problem: ``COUNT(DISTINCT x)`` per group shuffles every
distinct value; a sketch shuffles a BOUNDED summary per group instead
and stays mergeable across partitions, days, and corpus snapshots.
Spark's built-in ``approx_count_distinct`` (HyperLogLog++) is the
production answer but its register layout is engine-private — useless
for the exact-oracle gate and for cross-system reconciliation. The KMV
(k-minimum-values / bottom-k) sketch here (Bar-Yossef et al. 2002,
"Counting distinct elements in a data stream") is built on the repo's
portable ``hash_u32`` coin, so every register and the final estimate
are bit-identical in Spark, DuckDB, and Python — a sketch you can ship
between engines and diff.

Accuracy: relative error ~ 1/sqrt(k-2) (k=64 → ~13%); the estimator is
exact below k distinct values (the sketch holds them all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from time_series_data_trimmer_spark.operators.sampling import hash_u32

_HASH_SPACE_F = float(1 << 32)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    seed: str = "tsdt|kmv",
) -> DataFrame:
    """Per-group KMV distinct-count estimate, plus the exact count for
    audit.

    Estimator: keep the ``k`` smallest 32-bit hashes of the distinct
    values; if fewer than ``k`` survive the estimate IS the exact
    count, else ``(k-1) · 2³² / h_k`` with ``h_k`` the k-th smallest
    hash — all IEEE ×/÷ on exact integers, engine-portable.

    Plan shape: one distinct on narrow (group, hash-long) pairs (the
    values themselves never shuffle — ``hash_u32`` evaluates on the
    scan), one keyed row_number window to keep the bottom-k, one
    map-side-combined aggregation. Per-group state is ≤ k longs at
    every stage — the property that makes the sketch mergeable: union
    two corpora's (group, hash) bottom-k sets, re-rank, re-estimate,
    no rescan of either side.
    """
    from time_series_data_trimmer_spark.functions.rounding import rd

    hashed = df.select(
        F.col(group_col).alias("g"),
        hash_u32(F.col(value_col), seed).alias("u"),
    ).distinct()
    w = Window.partitionBy("g").orderBy(F.col("u").asc())
    bottom = hashed.withColumn("__rn", F.row_number().over(w))
    exact = hashed.groupBy("g").agg(F.count(F.lit(1)).alias("exact_distinct"))
    kept = (
        bottom.filter(F.col("__rn") <= int(k))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("u").alias("kth"))
    )
    est = F.when(
        F.col("n_kept") < int(k), F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE_F) / F.col("kth").cast("double")
    )
    return (
        kept.join(exact.hint("shuffle_hash"), "g")
        .select(
            F.col("g").alias(group_col),
            "n_kept",
            rd(est, 6).alias("est_distinct"),
            "exact_distinct",
        )
    )


def sql_kmv_distinct(
    table_expr: str,
    group_col: str,
    value_expr: str,
    k: int = 64,
    seed: str = "tsdt|kmv",
) -> str:
    """The identical KMV estimate as DuckDB SQL (for oracle reuse)."""
    from time_series_data_trimmer_spark.functions.rounding import sql_rd
    from time_series_data_trimmer_spark.operators.sampling import sql_hash_u32

    u = sql_hash_u32(value_expr, seed)
    return f"""
    WITH hashed AS (
      SELECT DISTINCT {group_col} AS g, {u} AS u FROM {table_expr}
    ),
    ranked AS (
      SELECT g, u, row_number() OVER (PARTITION BY g ORDER BY u ASC) AS rn
      FROM hashed
    ),
    exact AS (SELECT g, count(*) AS exact_distinct FROM hashed GROUP BY g),
    kept AS (
      SELECT g, count(*) AS n_kept, max(u) AS kth
      FROM ranked WHERE rn <= {int(k)} GROUP BY g
    )
    SELECT kept.g AS {group_col}, kept.n_kept,
           {sql_rd(
               f"CASE WHEN kept.n_kept < {int(k)} THEN CAST(kept.n_kept AS DOUBLE)"
               f" ELSE {float(k - 1)} * {_HASH_SPACE_F} / CAST(kept.kth AS DOUBLE) END",
               6,
           )} AS est_distinct,
           exact.exact_distinct
    FROM kept JOIN exact ON kept.g = exact.g
    """


def kmv_registers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    seed: str = "tsdt|kmv",
) -> DataFrame:
    """The sketch STATE: per-group bottom-``k`` distinct hashes as
    (g, u) rows — ≤ k longs per group, the thing you persist per
    corpus snapshot / daily batch and merge later."""
    hashed = df.select(
        F.col(group_col).alias("g"),
        hash_u32(F.col(value_col), seed).alias("u"),
    ).distinct()
    w = Window.partitionBy("g").orderBy(F.col("u").asc())
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
        .select("g", "u")
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """Merge two register sets (same seed/k): union the hash sets,
    dedup, keep the bottom-k per group. The union of two corpora's
    sketches IS the sketch of the union — no rescan of either corpus —
    because the bottom-k of a union is a function of the two bottom-k
    sets alone."""
    u = a.unionByName(b).distinct()
    w = Window.partitionBy("g").orderBy(F.col("u").asc())
    return (
        u.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
        .select("g", "u")
    )


def kmv_estimate(registers: DataFrame, k: int = 64, group_col: str = "g") -> DataFrame:
    """Distinct-count estimate from a register set (same estimator as
    `kmv_distinct`, without the exact-count audit join)."""
    from time_series_data_trimmer_spark.functions.rounding import rd

    kept = registers.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("u").alias("kth")
    )
    est = F.when(
        F.col("n_kept") < int(k), F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE_F) / F.col("kth").cast("double")
    )
    return kept.select(
        F.col("g").alias(group_col), "n_kept", rd(est, 6).alias("est_distinct")
    )


def kmv_pairwise_jaccard(regs: DataFrame, k: int = 64) -> DataFrame:
    """All-pairs vocabulary Jaccard between groups, from register sets
    alone (Beyer et al., SIGMOD 2007 §5: the bottom-k of A∪B is
    computable from bottom-k(A) ∪ bottom-k(B), and the fraction of it
    lying in BOTH sets estimates J(A,B)).

    The 100 TB story: raw cross-source token intersection is a
    vocabulary×vocabulary shuffle; this never touches the corpus again
    — it runs on ≤ k longs per group, so comparing every pair of 100
    domains costs ~100²·k tiny rows. Deterministic md5 registers ⇒ the
    estimate is bit-identical in any engine.

    Plan: the group list is a BOUNDED collect (domains are O(10²) at
    any scale — same policy as the IVF centroid collects); each
    register row explodes to the pairs containing its group on the
    scan (literal array, no join), then one (pair)-keyed window keeps
    the union's bottom-k and counts two-sided members.
    """
    from time_series_data_trimmer_spark.functions.rounding import rd

    groups = sorted(r["g"] for r in regs.select("g").distinct().collect())
    other = F.explode(F.array(*[F.lit(g) for g in groups])).alias("other")
    pr = (
        regs.select("g", "u", other)
        .filter(F.col("g") != F.col("other"))
        .select(
            F.least("g", "other").alias("src_a"),
            F.greatest("g", "other").alias("src_b"),
            "u",
            "g",
        )
    )
    per_u = pr.groupBy("src_a", "src_b", "u").agg(
        F.count(F.lit(1)).alias("n_sides")
    )
    w = Window.partitionBy("src_a", "src_b").orderBy(F.col("u").asc())
    kept = per_u.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= int(k)
    )
    agg = kept.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).alias("n_union_kept"),
        F.sum((F.col("n_sides") == 2).cast("long")).alias("n_common"),
    )
    est = F.col("n_common").cast("double") / F.col("n_union_kept").cast("double")
    return agg.select(
        "src_a", "src_b", "n_union_kept", "n_common", rd(est, 6).alias("jaccard_est")
    )


# ---------------------------------------------------------------------------
# Mergeable QUANTILE sketch: bottom-k row sample on the md5 coin
# ---------------------------------------------------------------------------
#
# The 100 TB problem this solves: the exact windowed percentiles the
# per-trial operators use (`ts_gap_report`, `ts_mad_outliers`,
# `histogram_equidepth_value`, the reference's own median-based
# sample-rate inference at data_model.py:116-126) sort every group's
# full row set — fine per-trial, impossible corpus-wide. A quantile
# sketch shuffles a BOUNDED register set per group instead and merges
# across partitions / days / corpus snapshots without rescanning.
#
# Design choice vs KLL (Karnin-Lang-Liberty 2016): KLL reaches
# O(1/k) rank error but its compactions flip random coins, so two
# runs (or two engines) produce different registers — unusable for
# the exact-oracle gate and for cross-system register diffing. The
# sketch here is a bottom-k-by-md5 uniform row sample (the KMV
# construction applied to ROW IDENTITY rather than value identity):
# rank error O(sqrt(q(1-q)/k)), registers bit-identical in Spark,
# DuckDB, and Python, EXACT below k rows per group, and merge of two
# disjoint corpora's registers provably equals the one-shot sketch of
# their union (bottom-k of a union is a function of the two bottom-k
# sets alone). Same lifecycle as KMV above: registers / merge /
# estimate.


def quantile_sketch_registers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 64,
    seed: str = "tsdt|qsk",
) -> DataFrame:
    """Per-group quantile-sketch STATE: the ``k`` rows whose md5 row-
    identity hashes are smallest, as (g, u, v) rows — ≤ k (long,
    double) pairs per group. ``id_col`` must be row-unique within the
    group (duplicates of ``value_col`` keep their multiplicity — this
    hashes row identity, NOT the value, unlike KMV).

    Plan: hash evaluates on the scan (values and ids never shuffle
    beyond the narrow (g, u, v) triple), one keyed row_number window
    keeps the bottom-k."""
    hashed = df.select(
        F.col(group_col).alias("g"),
        hash_u32(F.col(id_col), seed).alias("u"),
        F.col(value_col).cast("double").alias("v"),
    )
    w = Window.partitionBy("g").orderBy(F.col("u").asc(), F.col("v").asc())
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
        .select("g", "u", "v")
    )


def quantile_sketch_merge(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """Merge register sets from DISJOINT row populations (same seed/k):
    union, keep bottom-k by hash per group. Because every row of the
    union's true bottom-k has a hash small enough to survive its own
    side's bottom-k, merge(sketch(A), sketch(B)) == sketch(A ∪ B)
    register-for-register — proven in tests/test_sketches_quantile.py."""
    u = a.unionByName(b)
    w = Window.partitionBy("g").orderBy(F.col("u").asc(), F.col("v").asc())
    return (
        u.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
        .select("g", "u", "v")
    )


def quantile_sketch_estimate(
    registers: DataFrame,
    qs: list[float],
    group_col: str = "g",
) -> DataFrame:
    """Quantile estimates from a register set: for each q, the sample
    value at nearest-rank ``max(1, ceil(q·n_kept))`` under the total
    order (v asc, u asc). IEEE ``q·n`` then ceil — identical literal
    op sequence in the oracle SQL, so estimates are bit-portable.

    One exchange when chained after `quantile_sketch_registers` (both
    windows and the filter share the g partition)."""
    w_rank = Window.partitionBy("g").orderBy(F.col("v").asc(), F.col("u").asc())
    wp = Window.partitionBy("g")
    ranked = registers.select(
        "g", "v",
        F.row_number().over(w_rank).alias("__vr"),
        F.count(F.lit(1)).over(wp).alias("n_kept"),
    )
    q = F.explode(F.array(*[F.lit(float(x)) for x in qs])).alias("q")
    tgt = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.col("q") * F.col("n_kept").cast("double")),
    )
    return (
        ranked.select("g", "v", "__vr", "n_kept", q)
        .filter(F.col("__vr") == tgt)
        .select(
            F.col("g").alias(group_col), "q", "n_kept", F.col("v").alias("q_est")
        )
    )


# ---------------------------------------------------------------------------
# Mergeable FREQUENCY sketch: Count-Min on the portable md5 coin
# ---------------------------------------------------------------------------
#
# Completes the portable sketch family — distinct counts (KMV),
# quantiles (bottom-k sample), and now per-item FREQUENCIES — for the
# queries "how often does token/url/ngram X appear per source" at
# 100 TB, where an exact (group, item) count table IS the vocabulary
# shuffle the sketches exist to avoid. Count-Min (Cormode &
# Muthukrishnan 2005): d hash rows × w counters; add = increment one
# counter per row; estimate(x) = min over rows of counter[h_r(x)].
# Registers are SUMS, so unlike Misra-Gries the state is independent
# of stream/partition order — deterministic, engine-portable, and
# merge is elementwise addition (merge == one-shot by construction,
# still pytest-pinned). Guarantee: est ≥ exact always (never
# underestimates); est ≤ exact + 2N/w with probability 1 − 2⁻ᵈ.


def cm_registers(
    df: DataFrame,
    group_col: str,
    item_col: str,
    d: int = 4,
    w: int = 256,
    seed: str = "tsdt|cm",
) -> DataFrame:
    """Per-group Count-Min STATE as (g, r, c, cnt) rows — ≤ d·w longs
    per group (zero cells are simply absent). Coordinates are the
    portable coin: ``c = hash_u32(item, seed|r) % w`` for each hash
    row r, evaluated on the scan (items never shuffle; only the
    bounded (g, r, c) triple does, pre-aggregated map-side)."""
    coords = F.explode(
        F.array(*[
            F.struct(
                F.lit(r).alias("r"),
                (hash_u32(F.col(item_col), f"{seed}|{r}") % F.lit(int(w))).alias("c"),
            )
            for r in range(int(d))
        ])
    ).alias("rc")
    return (
        df.select(F.col(group_col).alias("g"), coords)
        .select("g", F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .groupBy("g", "r", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge register sets (same seed/d/w): elementwise counter
    addition. Counters are order-independent sums, so
    merge(sketch(A), sketch(B)) == sketch(A ⊎ B) exactly, for ANY
    split of the rows (not just disjoint populations)."""
    return (
        a.unionByName(b).groupBy("g", "r", "c").agg(F.sum("cnt").alias("cnt"))
    )


def cm_estimate(
    registers: DataFrame,
    items: list[str],
    d: int = 4,
    w: int = 256,
    seed: str = "tsdt|cm",
    group_col: str = "g",
    item_col: str = "item",
) -> DataFrame:
    """Frequency estimates for a literal item list, per group:
    ``min`` over the d counters each item hashes to; any ABSENT
    counter means a zero cell, hence estimate 0 (implemented as
    "fewer than d matched rows → 0" — no group×item universe build,
    no cross join).

    The item coordinate table is d·|items| literal rows broadcast
    into one hash join against the registers — nothing scales with
    the corpus."""
    import hashlib

    def _coord(item: str, r: int) -> int:
        digest = hashlib.md5(f"{seed}|{r}|{item}".encode()).hexdigest()
        return int(digest[:8], 16) % int(w)

    spark = registers.sparkSession
    rows = [(it, r, _coord(it, r)) for it in items for r in range(int(d))]
    coords = spark.createDataFrame(rows, f"{item_col} string, r int, c int")
    hit = registers.join(
        F.broadcast(coords), ["r", "c"]
    )
    return (
        hit.groupBy("g", item_col)
        .agg(F.count(F.lit(1)).alias("__nr"), F.min("cnt").alias("__mn"))
        .select(
            F.col("g").alias(group_col),
            item_col,
            F.when(F.col("__nr") >= int(d), F.col("__mn"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("est_count"),
        )
    )


def cm_heavy_hitters(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_count: int,
    d: int = 4,
    w: int = 256,
    seed: str = "tsdt|cm",
) -> DataFrame:
    """EXACT per-group heavy hitters (items with count ≥ ``min_count``)
    with the (group, item) shuffle bounded to CANDIDATE occurrences.

    The 100 TB shape: a naive ``GROUP BY (group, item) HAVING count >=
    T`` shuffles the full vocabulary to find the handful of heavy
    items. Here the Count-Min registers (≤ d·w longs per group) are
    built once, then BROADCAST back as d map-side hash joins — every
    scanned occurrence reads its d counters without leaving its
    partition, and ``least(counters) >= min_count`` gates it. CM never
    underestimates, so the gate is a SUPERSET filter: no heavy item
    can be pruned. Only surviving occurrences enter the exact
    (group, item) count, which removes CM's false positives. Result:
    provably exact; the only vocabulary-keyed shuffle carries the
    heavy tail, and register size (d·w) is the volume/selectivity knob.
    """
    regs = cm_registers(df, group_col, item_col, d=d, w=w, seed=seed)
    gated = df.select(
        F.col(group_col).alias("g"),
        F.col(item_col).alias("item"),
        *[
            (hash_u32(F.col(item_col), f"{seed}|{r}") % F.lit(int(w))).alias(f"__c{r}")
            for r in range(int(d))
        ],
    )
    for r in range(int(d)):
        side = (
            regs.filter(F.col("r") == r)
            .select("g", F.col("c").alias(f"__c{r}"), F.col("cnt").alias(f"__cnt{r}"))
        )
        gated = gated.join(F.broadcast(side), ["g", f"__c{r}"], "left")
    est = F.least(*[F.coalesce(F.col(f"__cnt{r}"), F.lit(0)) for r in range(int(d))])
    cand = gated.filter(est >= int(min_count)).select("g", "item")
    return (
        cand.groupBy("g", "item")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .filter(F.col("exact_count") >= int(min_count))
        .select(
            F.col("g").alias(group_col),
            F.col("item").alias(item_col),
            "exact_count",
        )
    )


def bottom_k_salted(
    rows: DataFrame,
    k: int,
    cols: list[str],
    n_salt: int = 256,
) -> DataFrame:
    """Per-group bottom-k under the lexicographic ``cols`` order, for
    LOW-CARDINALITY groups (including a single constant group): the
    plain keyed-window form degenerates to a keyless Window — a
    single-partition sort — when the optimizer folds a constant group
    key (caught by the repo's own plan sweep on
    `pipeline_corpus_health`, r7). Here stage 1 keeps k per
    (g, hash-salt) with a KEYED window (``n_salt`` parallel partial
    sorts — size it ∝ cluster parallelism); stage 2 combines the
    ≤ n_salt·k survivors per group with a bounded
    collect_list → array_sort → slice aggregation. The register SET
    is identical to the one-stage form (bottom-k closure under
    union, the same theorem the merge lifecycle rests on)."""
    g_salt = (F.col(cols[0]) % F.lit(int(n_salt))).alias("__salt")
    w = Window.partitionBy("g", "__salt").orderBy(
        *[F.col(c).asc() for c in cols]
    )
    part = (
        rows.withColumn("__salt", g_salt)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
    )
    reg = F.struct(*[F.col(c) for c in cols])
    comb = part.groupBy("g").agg(
        F.slice(F.array_sort(F.collect_list(reg)), 1, int(k)).alias("__regs")
    )
    return comb.select("g", F.explode("__regs").alias("__r")).select(
        "g", *[F.col(f"__r.{c}").alias(c) for c in cols]
    )


def quantile_estimate_agg(
    registers: DataFrame,
    qs: list[float],
    group_col: str = "g",
) -> DataFrame:
    """`quantile_sketch_estimate` as a pure AGGREGATION (no window):
    the registers are ≤ k rows per group, so one
    collect_list → array_sort((v, u)) per group is bounded, and each
    quantile reads ``element_at(arr, max(1, ceil(q·n)))``. Identical
    estimates; the window-free form for low-cardinality groups."""
    arr = F.array_sort(F.collect_list(F.struct(F.col("v"), F.col("u"))))
    agg = registers.groupBy("g").agg(arr.alias("__arr"))
    q = F.explode(F.array(*[F.lit(float(x)) for x in qs])).alias("q")
    n = F.size(F.col("__arr"))
    tgt = F.greatest(
        F.lit(1).cast("long"), F.ceil(F.col("q") * n.cast("double"))
    ).cast("int")
    return (
        agg.select("g", "__arr", q)
        .select(
            F.col("g").alias(group_col),
            "q",
            F.size(F.col("__arr")).alias("n_kept"),
            F.element_at(F.col("__arr"), tgt).getField("v").alias("q_est"),
        )
    )


def cm_inner_product(
    a: DataFrame,
    b: DataFrame,
    d: int = 4,
    out_col: str = "est",
) -> DataFrame:
    """Join-size estimate per group from two Count-Min register sets
    (same seed/d/w): ``min`` over the d hash rows of the row-wise
    counter inner product Σ_c cntA(r,c)·cntB(r,c) (AMS/CM join-size
    estimation, Alon-Matias-Szegedy 1996 / Cormode-Muthukrishnan 2005).

    Properties, both pytest-pinned:
    - **Never underestimates**: every true joining pair (x∈A, x∈B)
      lands in the same cell of both sketches on every row, so each
      row sum ≥ |A ⋈ B|; collisions only ADD. A row with ZERO
      overlapping cells proves the true join size is 0 (fewer than d
      matched rows → 0).
    - **Merge-compatible**: counters are sums, so estimating from
      merged registers == estimating from one-shot registers for any
      row split.

    The 100 TB shape: this is join-output-cardinality PLANNING without
    shuffling either fact table on the join key — registers are ≤ d·w
    longs per group per side, and the inner product runs on registers
    only. Products accumulate in DECIMAL(38,0): a cell pair of two
    10¹²-row streams reaches ~10²⁴, far past bigint (Spark non-ANSI
    would wrap silently; DuckDB widens to hugeint)."""
    prod = (
        a.select("g", "r", "c", F.col("cnt").alias("__ca"))
        .join(b.select("g", "r", "c", F.col("cnt").alias("__cb")), ["g", "r", "c"])
        .groupBy("g", "r")
        .agg(
            F.sum(
                F.col("__ca").cast("decimal(19,0)")
                * F.col("__cb").cast("decimal(19,0)")
            ).alias("__s")
        )
    )
    return (
        prod.groupBy("g")
        .agg(F.count(F.lit(1)).alias("__nr"), F.min("__s").alias("__mn"))
        .select(
            "g",
            F.when(F.col("__nr") >= int(d), F.col("__mn"))
            .otherwise(F.lit(0))
            .cast("decimal(38,0)")
            .alias(out_col),
        )
    )


def kmv_sliding_registers(
    df: DataFrame,
    group_col: str,
    bucket_col: str,
    value_col: str,
    window_buckets: int = 24,
    k: int = 64,
    seed: str = "tsdt|kmv",
) -> DataFrame:
    """Sliding-window distinct via mergeable registers: per
    (group, bucket) bottom-k hash registers, each contributed to the
    ``window_buckets`` windows that contain its bucket (a scan-side
    explode of at most ``window_buckets`` small longs per register
    row), then re-ranked to bottom-k per (group, window_end).

    This is THE reason the register form exists: exact sliding
    distinct re-scans ``window_buckets`` hours of raw data per window
    (O(W·N) total), while the register path touches each raw row once
    and thereafter moves only ≤ k longs per (group, bucket) —
    bottom-k's closure under union makes the per-window merge exact
    over the register state, so the estimate for every window is
    BIT-EQUAL to sketching that window's raw rows directly.

    Output: (g, window_end, u) register rows, ready for
    `kmv_estimate` keyed on (g, window_end).
    """
    per_bucket = df.select(
        F.col(group_col).alias("g"),
        F.col(bucket_col).alias("b"),
        hash_u32(F.col(value_col), seed).alias("u"),
    ).distinct()
    w = Window.partitionBy("g", "b").orderBy(F.col("u").asc())
    regs = (
        per_bucket.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
        .select("g", "b", "u")
    )
    spread = regs.select(
        "g",
        "u",
        "b",
        F.explode(
            F.sequence(F.lit(0), F.lit(int(window_buckets) - 1))
        ).alias("__o"),
    ).select("g", "u", (F.col("b") + F.col("__o")).alias("window_end"))
    ww = Window.partitionBy("g", "window_end").orderBy(F.col("u").asc())
    return (
        spread.distinct()
        .withColumn("__rn", F.row_number().over(ww))
        .filter(F.col("__rn") <= int(k))
        .select("g", "window_end", "u")
    )


def kmv_pairwise_intersection(regs: DataFrame, k: int = 64) -> DataFrame:
    """All-pairs JOIN-CARDINALITY card from KMV registers alone: for
    every group pair, estimates of |A|, |B|, |A∪B|, |A∩B| and J(A,B).

    This is the sketch-side answer to "how big is this join / overlap
    before I run it": |A∪B| comes from the KMV estimator applied to
    the union's own bottom-k (which is computable from the two
    register sets alone — Beyer et al. SIGMOD 2007 §5), J from the
    two-sided fraction of that bottom-k, and |A∩B| = Ĵ·|Â∪B| — the
    standard KMV intersection estimator. At 100 TB the alternative is
    a distinct-pair self-join per candidate pair; this never rescans
    the corpus and moves ≤ 2k longs per pair.

    Plan: same shape as `kmv_pairwise_jaccard` (bounded group-list
    collect, scan-side literal-array pair explode, one pair-keyed
    window) plus two G²-row joins against the per-group estimates —
    both sides bounded by the domain count, hash-joined.
    """
    from time_series_data_trimmer_spark.functions.rounding import rd

    groups = sorted(r["g"] for r in regs.select("g").distinct().collect())
    other = F.explode(F.array(*[F.lit(g) for g in groups])).alias("other")
    pr = (
        regs.select("g", "u", other)
        .filter(F.col("g") != F.col("other"))
        .select(
            F.least("g", "other").alias("src_a"),
            F.greatest("g", "other").alias("src_b"),
            "u",
            "g",
        )
    )
    per_u = pr.groupBy("src_a", "src_b", "u").agg(
        F.count(F.lit(1)).alias("n_sides")
    )
    w = Window.partitionBy("src_a", "src_b").orderBy(F.col("u").asc())
    kept = per_u.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= int(k)
    )
    agg = kept.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).alias("n_union_kept"),
        F.max("u").alias("kth"),
        F.sum((F.col("n_sides") == 2).cast("long")).alias("n_common"),
    )
    est_union = F.when(
        F.col("n_union_kept") < int(k), F.col("n_union_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE_F) / F.col("kth").cast("double")
    )
    jac = F.col("n_common").cast("double") / F.col("n_union_kept").cast("double")
    sides = kmv_estimate(regs, k=k)
    ea = sides.select(
        F.col("g").alias("src_a"), F.col("est_distinct").alias("est_a")
    )
    eb = sides.select(
        F.col("g").alias("src_b"), F.col("est_distinct").alias("est_b")
    )
    return (
        agg.join(ea.hint("shuffle_hash"), "src_a")
        .join(eb.hint("shuffle_hash"), "src_b")
        .select(
            "src_a",
            "src_b",
            "est_a",
            "est_b",
            rd(est_union, 6).alias("est_union"),
            rd(jac, 6).alias("jaccard_est"),
            rd(jac * est_union, 6).alias("est_intersection"),
        )
    )


def quantile_sketch_global(registers: DataFrame, k: int = 64) -> DataFrame:
    """Roll per-GROUP quantile registers up to ONE corpus-wide register
    set (g = '_all_'), without touching raw data again.

    Correctness: every row of the global bottom-k (by the shared md5
    row-identity hash) also survives its own group's bottom-k, so the
    global bottom-k of the unioned register sets EQUALS the bottom-k
    of sketching all raw rows directly — pytest-proven register-for-
    register in tests/test_sketches_quantile.py. This is the corpus-
    wide percentile path: per-group sketches are computed/persisted
    once (the parallel part), and the global quantile costs a re-rank
    of ≤ k·G register rows.

    Plan: NO window — a constant group key folds to a keyless Window
    (the single-partition sort the sweep bans), so the rollup is the
    bounded collect_list → array_sort → slice aggregation
    (`bottom_k_salted` stage-2 shape): partial aggregation combines
    register arrays map-side, and the input volume is fixed by the
    sketch (≤ k·G rows), independent of corpus size."""
    comb = registers.agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct("u", "v"))), 1, int(k)
        ).alias("__regs")
    )
    return comb.select(
        F.lit("_all_").alias("g"), F.explode("__regs").alias("__r")
    ).select("g", F.col("__r.u").alias("u"), F.col("__r.v").alias("v"))
