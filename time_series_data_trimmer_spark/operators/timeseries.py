"""Scale-grade time-series operators over the trial axis: M4 viz
downsampling, gap detection, robust (MAD) outlier flags, CUSUM
changepoint location, and a truncated half-life EWMA.

These extend the reference's trim/clean surface (spike suggestions at
`main.py` suggest_bad_segments; decimation for plotting) with the
canonical large-scale forms:

* **M4** (Jugel et al., VLDB 2014 "M4: A Visualization-Oriented Time
  Series Data Aggregation") — the error-free line-chart downsampler:
  per pixel-bucket keep min/max/first/last. One groupBy, no window, no
  join; at 100 TB this is the only operator a dashboard ever needs to
  scan the raw table with.
* **Gap report** — irregular-sampling dropout detection: a gap is a
  lag-delta exceeding ``factor ×`` the trial's median delta. All
  integer-microsecond math on one trial-keyed exchange.
* **MAD outliers** — the robust twin of the reference's ±k·σ spike
  rule (`main.py` suggest_bad_segments uses mean/std): median /
  median-absolute-deviation flags survive the very outliers σ-rules
  are blinded by.
* **CUSUM changepoint** — argmax |S_k|, S_k = Σ_{i≤k}(x_i − x̄), the
  classic level-shift locator (Page 1954). Scale-free trick: compare
  ``n·cumsum_k − k·total`` on integers scaled 10⁴ — no division until
  the final score, so the argmax is bit-exact in any engine.
* **EWMA (half-life form)** — α=1/2 truncated to the last ``depth``
  samples: weights 2⁻ʲ are exact binary fractions, so numerator /
  denominator are exact integers and the single final IEEE division is
  bit-identical across engines. The untruncated recurrence is
  inherently sequential; the 2⁻¹⁶ tail (≤1.6e-5 relative) is the price
  of a one-window-pass distributed plan.

Every operator: exactly ONE exchange on the trial key; values scaled
to integers (4 dp) before any accumulation so unordered partial
aggregation cannot reorder float error.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from time_series_data_trimmer_spark.functions.rounding import rd

#: value → exact integer at 4 dp (the repo's cross-engine rounding
#: grid): floor(v·10⁴ + 0.5). Bigint-safe to |v| ~ 9e14.
def _scaled_int(c: Column, scale: int = 4) -> Column:
    return F.floor(c * F.lit(float(10**scale)) + F.lit(0.5)).cast("long")


def m4_downsample(
    df: DataFrame,
    bucket_us: int,
    key_col: str = "user_id",
    micros_col: str = "t_us",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("t_us", "event_id"),
) -> DataFrame:
    """M4 per (key, time-bucket): n, min, max, first, last of value.

    first/last ride a struct-ordered min/max over the total order
    ``order_cols`` — a pure aggregation (map-side combinable), never a
    window, so the plan is one partial-agg + one exchange on
    (key, bucket) and holds at any scale. Values pass through
    untouched (no arithmetic ⇒ bit-exact).
    """
    # integer-exact bucketing: t − (t % B), TRUNCATION semantics (the
    # Column % operator = Remainder), matching the oracle's `%` so the
    # engines agree for negative t too (pre-1970 timestamps: pmod's
    # floor semantics would shift those one bucket). A double-division
    # form would round within ~2e-10 of the true quotient — the same
    # order as one-microsecond fractions of an hour bucket.
    bucket = F.col(micros_col) - F.col(micros_col) % F.lit(int(bucket_us))
    ordered = F.struct(*[F.col(c) for c in order_cols], F.col(value_col))
    return (
        df.groupBy(F.col(key_col), bucket.alias("bucket_us"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(value_col).alias("v_min"),
            F.max(value_col).alias("v_max"),
            F.min(ordered).getField(value_col).alias("v_first"),
            F.max(ordered).getField(value_col).alias("v_last"),
        )
    )


def gap_report(
    df: DataFrame,
    key_col: str = "user_id",
    micros_col: str = "t_us",
    order_cols: tuple[str, ...] = ("t_us", "event_id"),
    factor: int = 5,
) -> DataFrame:
    """Per-trial sampling-dropout intervals: rows where the delta to
    the previous sample exceeds ``factor ×`` the trial's median delta.

    Integer micros end-to-end; the median delta is an exact
    interpolated percentile over the SAME trial-keyed window partition
    the lag uses, so the whole operator is one exchange, two Window
    ops, zero joins. Median of integers interpolates on .5 — exact in
    double in both engines.
    """
    w = Window.partitionBy(key_col).orderBy(*[F.col(c).asc() for c in order_cols])
    wp = Window.partitionBy(key_col)
    dt = (F.col(micros_col) - F.lag(micros_col, 1).over(w)).alias("dt_us")
    # micros_col carried explicitly (deduped against order_cols) so the
    # parameters are independent — callers may order by other columns
    with_dt = df.select(
        F.col(key_col),
        *[F.col(c) for c in dict.fromkeys([*order_cols, micros_col])],
        dt,
    )
    med = F.percentile(F.col("dt_us"), F.lit(0.5)).over(wp)
    flagged = with_dt.withColumn("med_dt_us", med).filter(
        F.col("dt_us").cast("double") > F.lit(float(factor)) * F.col("med_dt_us")
    )
    return flagged.select(
        F.col(key_col),
        (F.col(micros_col) - F.col("dt_us")).alias("gap_start_us"),
        F.col(micros_col).alias("gap_end_us"),
        F.col("dt_us").alias("gap_us"),
        rd(F.col("med_dt_us"), 4).alias("med_dt_us"),
    )


def mad_outliers(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    k: float = 3.0,
) -> DataFrame:
    """Per-trial robust outlier summary: median, MAD, and the count of
    samples with |x − median| > k·MAD.

    The robust complement of the reference's mean/std spike rule
    (`main.py` suggest_bad_segments): a single wild sample inflates σ
    and hides its neighbors; the breakdown point of median/MAD is 50%.
    Exact percentiles over the trial partition; deviations are IEEE
    double |x − med| — identical literal op sequence in the oracle, so
    comparisons are bit-stable. One exchange (window partition and the
    final groupBy share the trial key).
    """
    wp = Window.partitionBy(key_col)
    med = F.percentile(F.col(value_col), F.lit(0.5)).over(wp)
    with_med = df.select(F.col(key_col), F.col(value_col), med.alias("med"))
    dev = F.abs(F.col(value_col) - F.col("med"))
    with_mad = with_med.withColumn("dev", dev).withColumn(
        "mad", F.percentile(F.col("dev"), F.lit(0.5)).over(wp)
    )
    is_out = (F.col("dev") > F.lit(k) * F.col("mad")).cast("long")
    return (
        with_mad.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(is_out).alias("n_outliers"),
            rd(F.first("med"), 6).alias("med"),
            rd(F.first("mad"), 6).alias("mad"),
        )
    )


def cusum_changepoint(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("t_us", "event_id"),
) -> DataFrame:
    """Per-trial CUSUM level-shift locator: the sample index k that
    maximizes |Σ_{i≤k}(x_i − x̄)| (earliest on ties).

    Integer-exact inside: with V = round(x·10⁴) and
    D_k = n·Σ_{i≤k}V_i − k·ΣV, argmax|D_k| ≡ argmax|S_k| — the mean
    never gets divided, so no engine-specific decimal-division scale
    rules apply. The surfaced score divides once in IEEE double. One
    exchange; cumsum + totals + rank share the trial-key partition.

    D_k grows ~n²·|v|·10⁴, so the n·cum − k·total products accumulate
    in DECIMAL(38,0) (exact to 10³⁸): a trial of 10⁹ rows with
    |value|≈10³ reaches ~10²⁵ — far past bigint (Spark non-ANSI would
    WRAP silently; DuckDB raises), comfortably inside decimal38. The
    cumsum itself stays bigint (≤ n·|v|·10⁴ ≈ 10¹⁶ at that scale).
    """
    w = Window.partitionBy(key_col).orderBy(*[F.col(c).asc() for c in order_cols])
    wp = Window.partitionBy(key_col)
    v = _scaled_int(F.col(value_col))
    base = df.select(
        F.col(key_col), *[F.col(c) for c in dict.fromkeys(order_cols)], v.alias("v")
    )
    cum = F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0))
    kidx = F.row_number().over(w)
    scored = base.select(
        F.col(key_col),
        *[F.col(c) for c in dict.fromkeys(order_cols)],
        cum.alias("cum"),
        kidx.cast("long").alias("k"),
        F.sum("v").over(wp).alias("total"),
        F.count(F.lit(1)).over(wp).alias("n"),
    ).withColumn(
        "d",
        F.col("n").cast("decimal(38,0)") * F.col("cum").cast("decimal(38,0)")
        - F.col("k").cast("decimal(38,0)") * F.col("total").cast("decimal(38,0)"),
    )
    rank = F.row_number().over(
        Window.partitionBy(key_col).orderBy(
            F.abs(F.col("d")).desc(), *[F.col(c).asc() for c in order_cols]
        )
    )
    top = scored.withColumn("__rn", rank).filter(F.col("__rn") == 1)
    score = F.abs(F.col("d")).cast("double") / (
        F.col("n").cast("double") * F.lit(1e4)
    )
    return top.select(
        F.col(key_col),
        *[F.col(c).alias(f"cp_{c}") for c in dict.fromkeys(order_cols)],
        F.col("k").alias("cp_index"),
        rd(score, 6).alias("max_dev"),
    )


def ewma_halflife(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("t_us", "event_id"),
    depth: int = 16,
    out_col: str = "ewma",
) -> DataFrame:
    """Truncated half-life EWMA: ŷ_i = Σ_{j<depth} 2⁻ʲ·x_{i−j} / Σ 2⁻ʲ
    over the lags that exist (head rows renormalize over fewer terms).

    Bit-exact construction: x scaled to int(4 dp); weight for lag j is
    the INTEGER 2^(depth−1−j); numerator and weight-sum stay integer;
    ONE double division at the end, then the shared rounding grid. All
    ``depth`` lags live in one Window partition pass — one exchange,
    one sort, no self-joins.

    Magnitude bound: num ≤ |x|·10⁴·(2^depth − 1), so the "exact
    integer ≤ 2⁵³" claim (bit-identical division in both engines)
    holds for |x| ≤ ~1.37e7 at depth=16; beyond that the division
    rounds identically-specified IEEE either way, and int64 itself
    holds to |x| ≤ ~1.4e10 (Spark non-ANSI wraps past it, DuckDB
    raises — pick a smaller depth/scale for wider-range channels).
    """
    w = Window.partitionBy(key_col).orderBy(*[F.col(c).asc() for c in order_cols])
    v = _scaled_int(F.col(value_col))
    base = df.select(
        F.col(key_col), *[F.col(c) for c in dict.fromkeys(order_cols)], v.alias("v")
    )
    num: Column = F.lit(0).cast("long")
    den: Column = F.lit(0).cast("long")
    for j in range(depth):
        wgt = 1 << (depth - 1 - j)
        lagged = F.col("v") if j == 0 else F.lag("v", j).over(w)
        num = num + F.coalesce(lagged * F.lit(wgt), F.lit(0))
        den = den + F.when(lagged.isNotNull(), F.lit(wgt)).otherwise(F.lit(0))
    ew = num.cast("double") / den.cast("double") / F.lit(1e4)
    return base.select(
        F.col(key_col),
        *[F.col(c) for c in dict.fromkeys(order_cols)],
        rd(ew, 6).alias(out_col),
    )


#: N(0,1) quartile breakpoints for the 4-letter SAX alphabet
#: (Lin et al. 2003) — hardcoded constants, no erf() at query time.
SAX_BREAKPOINTS_4 = (-0.6744897501960817, 0.0, 0.6744897501960817)


def sax_symbols(
    df: DataFrame,
    segment_rows: int = 16,
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("t_us", "event_id"),
) -> DataFrame:
    """PAA + SAX symbolization (Lin, Keogh, Lonardi, Chiu 2003,
    "A Symbolic Representation of Time Series"): split each trial's
    ordered series into fixed-size row segments, average each segment
    (Piecewise Aggregate Approximation), z-normalize against the
    trial's own mean/std, and map to a 4-letter alphabet at the
    standard-normal quartiles. The workhorse representation for
    motif discovery / similarity indexing over raw series 10⁶× too
    big to compare pointwise.

    Determinism: segment means and trial mean/std all derive from the
    4-dp scaled-integer sums (exact under any partial-agg order);
    z and the breakpoint comparisons are then single IEEE double
    expressions over exact inputs — bit-identical in any engine.
    A constant trial (std = 0) maps to z = 0 → symbol 'c'.

    Plan: ONE exchange on the trial key — the row-number window
    partitions by key, and both downstream aggregations
    ((key, segment) PAA and per-key moments) reuse that partitioning
    (hashpartitioning(key) satisfies the (key, seg) clustering), as
    does the final key-equi join.
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    seg = df.select(
        F.col(key_col),
        _scaled_int(F.col(value_col)).alias("__sv"),
        ((F.row_number().over(w) - F.lit(1)) / F.lit(segment_rows))
        .cast("long")
        .alias("seg"),
    )
    paa = seg.groupBy(key_col, "seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__sv").alias("__ssum"),
    )
    stats = seg.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("__tn"),
        F.sum("__sv").alias("__s1"),
        F.sum(F.col("__sv").cast("decimal(38,0)") * F.col("__sv")).alias("__s2"),
    )
    j = paa.join(stats.hint("shuffle_hash"), key_col)
    mu = F.col("__s1").cast("double") / F.col("__tn")
    var = (
        F.col("__s2").cast("double")
        - F.col("__s1").cast("double") * F.col("__s1") / F.col("__tn")
    ) / F.col("__tn")
    m = F.col("__ssum").cast("double") / F.col("n")
    z = F.when(var <= 0.0, F.lit(0.0)).otherwise(
        (m - mu) / F.sqrt(var)
    )
    b = SAX_BREAKPOINTS_4
    sym = (
        F.when(z < F.lit(b[0]), F.lit("a"))
        .when(z < F.lit(b[1]), F.lit("b"))
        .when(z < F.lit(b[2]), F.lit("c"))
        .otherwise(F.lit("d"))
    )
    return j.select(
        F.col(key_col),
        "seg",
        "n",
        rd(z, 6).alias("z"),
        sym.alias("symbol"),
    )


def seasonal_decompose_hourly(
    df: DataFrame,
    key_col: str = "user_id",
    micros_col: str = "t_us",
    value_col: str = "value",
    trend_buckets: int = 24,
) -> DataFrame:
    """Additive seasonal decomposition of an irregular event stream
    aggregated to hourly buckets: value = trend + seasonal(hour-of-day)
    + residual — the classical-decomposition skeleton of STL, with
    every averaging step made engine-exact.

    * hourly level  h = Σsv / n       (exact int sums, one division)
    * trend         T = ΣΣsv / Σn     over a centered ``trend_buckets``
      ROW frame (even split: extra row left, the repo's W6 convention)
      — RATIO-OF-SUMS, not mean-of-means, so the window accumulates
      only integers and stays order-independent; frames clip at series
      edges identically in any engine.
    * detrended     d = rd(h − T, 6)
    * seasonal      s = rd(Σ d₆ / cnt, 6) per (trial, hour-of-day),
      decimal-accumulated over the 6-dp grid
    * residual      r = rd(d − s, 6)

    Buckets are the NON-EMPTY hours in sequence (row frame, the
    gap-report convention): dropouts don't smear the trend window.

    Plan: one explicit exchange on the trial key; the (key, bucket)
    aggregation, both windows, and the (key, hour-of-day) window all
    reuse it (hashpartitioning(key) satisfies every wider clustering).
    """
    hour_us = 3_600_000_000
    left = trend_buckets // 2
    right = trend_buckets - left - 1
    b = (
        df.repartition(F.col(key_col))
        .select(
            F.col(key_col),
            F.expr(f"{micros_col} div {hour_us}").alias("bucket"),
            _scaled_int(F.col(value_col)).alias("__sv"),
        )
        .groupBy(key_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("__sv").alias("__ssum"))
    )
    wt = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(-left, right)
    )
    h = F.col("__ssum").cast("double") / F.col("n") / F.lit(1e4)
    trend = (
        F.sum("__ssum").over(wt).cast("double")
        / F.sum("n").over(wt)
        / F.lit(1e4)
    )
    d = rd(h - trend, 6)
    with_d = b.select(
        F.col(key_col),
        "bucket",
        (F.col("bucket") % 24).alias("hour_of_day"),
        rd(h, 6).alias("hourly"),
        rd(trend, 6).alias("trend"),
        d.alias("__d"),
    )
    ws = Window.partitionBy(key_col, "hour_of_day")
    seasonal = rd(
        F.sum(F.col("__d").cast("decimal(38,6)")).over(ws).cast("double")
        / F.count(F.lit(1)).over(ws),
        6,
    )
    return with_d.select(
        F.col(key_col),
        "bucket",
        "hour_of_day",
        "hourly",
        "trend",
        seasonal.alias("seasonal"),
        rd(F.col("__d") - seasonal, 6).alias("residual"),
    )


def binary_segmentation(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("t_us", "event_id"),
) -> DataFrame:
    """Depth-2 binary-segmentation changepoints (Scott-Knott-style
    recursion over the CUSUM locator): level 1 finds each trial's
    strongest level shift (`cusum_changepoint`); the split then
    partitions the trial into L/R halves and level 2 re-runs the SAME
    integer-exact locator inside each half — the two-changepoint
    answer ("when did it break, and when within each regime") without
    any O(n^2) segmentation DP.

    Scale shape: level 1 is the one-exchange CUSUM; the split point
    joins back as a narrow per-trial row (hash join on the trial key);
    level 2 re-keys on (trial, segment) — one more exchange. The
    recursion is UNROLLED (fixed depth), so the whole thing is one
    lazy plan and the oracle replays it bit-for-bit (decimal-exact
    argmax at every level, earliest-tie pinned).

    Output: (key, seg in {'all','L','R'}, cp_<order cols>, cp_index,
    max_dev) — cp_index is the 1-based rank WITHIN the segment.
    """
    oc = list(dict.fromkeys(order_cols))
    lvl1 = cusum_changepoint(df, key_col, value_col, tuple(oc))
    split = lvl1.select(
        key_col, *[F.col(f"cp_{c}").alias(f"__s_{c}") for c in oc]
    )
    base = df.select(key_col, *oc, value_col)
    joined = base.join(split.hint("shuffle_hash"), key_col)
    # lexicographic (order_cols) <= split point -> left segment,
    # built innermost-first
    left = F.col(oc[-1]) <= F.col(f"__s_{oc[-1]}")
    for c in reversed(oc[:-1]):
        left = (
            F.when(F.col(c) < F.col(f"__s_{c}"), F.lit(True))
            .when(F.col(c) > F.col(f"__s_{c}"), F.lit(False))
            .otherwise(left)
        )
    seg = F.when(left, F.lit("L")).otherwise(F.lit("R"))
    df2 = joined.select(
        F.concat_ws("|", F.col(key_col).cast("string"), seg).alias("__k2"),
        *oc,
        value_col,
    )
    lvl2 = cusum_changepoint(df2, "__k2", value_col, tuple(oc))
    parts = F.split(F.col("__k2"), "\\|")
    l2 = lvl2.select(
        parts.getItem(0).cast("long").alias(key_col),
        parts.getItem(1).alias("seg"),
        *[F.col(f"cp_{c}") for c in oc],
        "cp_index",
        "max_dev",
    )
    l1 = lvl1.select(
        F.col(key_col),
        F.lit("all").alias("seg"),
        *[F.col(f"cp_{c}") for c in oc],
        "cp_index",
        "max_dev",
    )
    return l1.unionByName(l2)


def lttb_downsample(
    df: DataFrame,
    bucket_us: int = 3_600_000_000,
    key_col: str = "user_id",
    micros_col: str = "t_us",
    value_col: str = "value",
) -> DataFrame:
    """Largest-Triangle one-point-per-bucket downsampling (the
    parallelizable LTOB member of Steinarsson's LTTB family, 2013):
    per time bucket keep the point forming the largest triangle with
    the NEIGHBOR BUCKETS' centroids — the shape-preserving complement
    of `m4_downsample` (M4 keeps extremes for lossless min/max
    rendering; LTOB keeps the visually salient point per bucket).
    True LTTB anchors on the previously SELECTED point (a sequential
    chain no engine parallelizes); anchoring on bucket centroids is
    the standard distributed relaxation and keeps every bucket
    independent.

    Determinism: centroid anchors are ratio-of-exact-sums rounded to
    the 9-dp grid (x = t/bucket, dimensionless ~1e5 magnitude; y =
    4-dp scaled-integer mean); each candidate's triangle area is then
    ONE fixed IEEE expression over identical doubles in both engines,
    used only for the per-bucket argmax (never rounded — magnitudes
    here would overflow rd's long floor, PLANS.md invariant 14), with
    the row's timestamp as total tie-break. Edge buckets (missing a
    neighbor) keep their earliest point — the series endpoints, which
    true LTTB also always keeps.

    One hash exchange on the trial key for the bucket-stat window; the
    candidate scoring joins points to the narrow (key, bucket) stat
    rows and argmaxes inside the same key partitioning.
    """
    from time_series_data_trimmer_spark.functions.rounding import rd

    B = int(bucket_us)
    sv = _scaled_int(F.col(value_col))
    pts = df.select(
        F.col(key_col),
        F.col(micros_col).alias("__t"),
        F.col(value_col).alias("__v"),
        sv.alias("__sv"),
        F.expr(f"{micros_col} DIV {B}").alias("__b"),
    )
    stats = pts.groupBy(key_col, "__b").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__t").cast("decimal(38,0)")).alias("__st"),
        F.sum(F.col("__sv").cast("decimal(38,0)")).alias("__ssv"),
    )
    mx = rd(F.col("__st").cast("double") / F.col("__n") / F.lit(float(B)), 9)
    my = rd(F.col("__ssv").cast("double") / F.col("__n") / F.lit(1e4), 6)
    w = Window.partitionBy(key_col).orderBy(F.col("__b").asc())
    anchors = stats.select(
        F.col(key_col),
        "__b",
        "__n",
        F.lag(mx, 1).over(w).alias("__xp"),
        F.lag(my, 1).over(w).alias("__yp"),
        F.lead(mx, 1).over(w).alias("__xn"),
        F.lead(my, 1).over(w).alias("__yn"),
    )
    j = pts.join(anchors.hint("shuffle_hash"), [key_col, "__b"])
    x = F.col("__t").cast("double") / F.lit(float(B))
    y = rd(F.col("__sv").cast("double") / F.lit(1e4), 6)
    area = F.abs(
        (F.col("__xp") - F.col("__xn")) * (y - F.col("__yp"))
        - (F.col("__xp") - x) * (F.col("__yn") - F.col("__yp"))
    )
    has_both = F.col("__xp").isNotNull() & F.col("__xn").isNotNull()
    # every row of one (key, bucket) partition shares has_both, so the
    # -0.0-vs-0.0 sort edge between the two branches can never mix
    # inside a partition
    wsel = Window.partitionBy(key_col, "__b").orderBy(
        F.when(has_both, -area).otherwise(F.lit(0.0)).asc(),
        F.col("__t").asc(),
    )
    return (
        j.withColumn("__rn", F.row_number().over(wsel))
        .filter(F.col("__rn") == 1)
        .select(
            F.col(key_col),
            F.col("__b").alias("bucket"),
            F.col("__t").alias("t_us"),
            F.col("__v").alias("value"),
            F.col("__n").cast("long").alias("n_in_bucket"),
        )
    )


def xcorr_lag(
    df: DataFrame,
    type_x: str,
    type_y: str,
    max_lag: int = 12,
    bucket_us: int = 3_600_000_000,
    type_col: str = "event_type",
    micros_col: str = "t_us",
    value_col: str = "value",
) -> DataFrame:
    """Cross-correlation lag scan between two channels: Pearson r of
    the bucketed series x (``type_x``) against y (``type_y``) shifted
    by each lag in ``[-max_lag, +max_lag]`` buckets — the alignment
    probe run before trimming multi-sensor trials (the reference
    overlays channels visually, `plot_manager.py`; at scale the argmax
    lag IS the alignment). A positive best lag means y follows x.

    Exactness: per-bucket series values are SUMS of 4-dp-scaled
    integers (exact int64); all five Pearson moments (Σx, Σy, Σxy,
    Σx², Σy²) accumulate in DECIMAL(38,0) — bucket sums reach ~1e10
    in 1e-4 units, so cross products pass 1e20, far beyond int64 but
    exact in decimal38 (the CUSUM precedent). ONE final double
    division per lag, then the shared rounding grid.

    Plan: two partial-agg scans of the event table (bucket series are
    |time-range/bucket| rows — thousands, independent of N); the lag
    explode multiplies only the SMALL y series by (2·max_lag+1); the
    lag join is an equi-join on bucket over bounded tables; per-lag
    moments are one more map-side-combinable agg. No window, no BNLJ,
    no driver loop — at 100 TB the event scans dominate and everything
    downstream is kilobytes.
    """
    B = int(bucket_us)
    bucket = (F.col(micros_col) - F.col(micros_col) % F.lit(B)).alias("__b")

    def series(etype: str, out: str) -> DataFrame:
        # bucket sums accumulate in decimal(38,0): a 100 TB bucket
        # population × 1e-4-scaled values can pass int64 (~9.2e18),
        # where Spark (non-ANSI) would wrap silently
        return (
            df.filter(F.col(type_col) == etype)
            .groupBy(bucket)
            .agg(
                F.sum(
                    _scaled_int(F.col(value_col)).cast("decimal(38,0)")
                ).alias(out)
            )
        )

    xs = series(type_x, "__x")
    lags = F.explode(
        F.array(*[F.lit(int(l)) for l in range(-max_lag, max_lag + 1)])
    ).alias("lag")
    # pair x[b] with y[b + lag·B]: shift y's bucket back by lag·B
    ys = (
        series(type_y, "__y")
        .select(lags, F.col("__b"), F.col("__y"))
        .select(
            F.col("lag"),
            (F.col("__b") - F.col("lag").cast("long") * F.lit(B)).alias("__b"),
            F.col("__y"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    per = (
        xs.join(ys.hint("shuffle_hash"), "__b")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_overlap"),
            F.sum(dec("__x")).alias("__sx"),
            F.sum(dec("__y")).alias("__sy"),
            F.sum(dec("__x") * dec("__y")).alias("__sxy"),
            F.sum(dec("__x") * dec("__x")).alias("__sxx"),
            F.sum(dec("__y") * dec("__y")).alias("__syy"),
        )
    )
    n = F.col("n_overlap").cast("decimal(38,0)")
    num = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    dx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    dy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    r = rd(
        num.cast("double") / F.sqrt(dx.cast("double") * dy.cast("double")), 6
    )
    return per.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n_overlap"),
        F.when((dx > 0) & (dy > 0), r).alias("r"),
    )


#: 2π as the explicit literal both engines parse to the same double —
#: never an engine's pi() (arguable last-ulp differences)
TWO_PI = 6.283185307179586


def spectral_probe(
    df: DataFrame,
    periods_us: tuple[int, ...] = (86_400_000_000, 604_800_000_000),
    type_col: str = "event_type",
    micros_col: str = "t_us",
    value_col: str = "value",
) -> DataFrame:
    """Goertzel-style single-frequency DFT probe: per channel and per
    candidate period P, the amplitude of the P-periodic component —
    C = Σ(v−v̄)·cos(2πt/P), S = Σ(v−v̄)·sin(2πt/P), amp = 2√(C²+S²)/n.
    The frequency-domain complement of `seasonal_decompose_hourly`
    (which folds one KNOWN period): probe a handful of candidate
    periods in one scan and read which are real. The reference's
    filter stack (`filter_engine.py` butter_lowpass/bandpass) implies
    exactly this inspection — which band carries energy — done here
    without an FFT, so it distributes as a plain aggregation.

    Cross-engine determinism: the phase argument is built from an
    INTEGER modulus (t mod P) so both engines evaluate cos/sin on the
    identical double in [0, 2π) — no large-argument reduction
    divergence; each product is rounded to the 4-dp grid and
    accumulated in decimal so partial-agg order cannot move float
    error. The mean is subtracted to kill DC leakage through a
    non-integer number of periods; it is derived from exact integer
    (Σ scaled-v, n) by one double division, identical formula both
    sides.

    Plan: one stats agg per channel (5 rows, broadcast back), then ONE
    map-side-combinable agg over the (channel × period)-exploded scan.
    Two scans total, no window, no driver loop; holds at any N.
    """
    stats = df.groupBy(type_col).agg(
        F.count(F.lit(1)).alias("__n"),
        # decimal accumulation: channel-total scaled sums pass int64
        # long before 100 TB (the CUSUM precedent)
        F.sum(_scaled_int(F.col(value_col)).cast("decimal(38,0)")).alias(
            "__sv"
        ),
    )
    mean = F.col("__sv").cast("double") / (
        F.col("__n").cast("double") * F.lit(1e4)
    )
    periods = F.explode(
        F.array(*[F.lit(int(p)) for p in periods_us])
    ).alias("period_us")
    e = (
        df.join(F.broadcast(stats), type_col)
        .select(
            F.col(type_col),
            periods,
            F.col(micros_col),
            (F.col(value_col) - mean).alias("__cv"),
        )
    )
    phase = (
        (F.col(micros_col) % F.col("period_us")).cast("double")
        / F.col("period_us").cast("double")
        * F.lit(TWO_PI)
    )
    term = lambda trig: F.sum(  # noqa: E731
        rd(F.col("__cv") * trig(phase), 4).cast("decimal(38,6)")
    )
    agg = e.groupBy(type_col, "period_us").agg(
        F.count(F.lit(1)).alias("n"),
        term(F.cos).alias("__c"),
        term(F.sin).alias("__s"),
    )
    c, s = F.col("__c").cast("double"), F.col("__s").cast("double")
    amp = rd(
        F.lit(2.0) * F.sqrt(c * c + s * s) / F.col("n").cast("double"), 6
    )
    return agg.select(
        F.col(type_col),
        (F.col("period_us") / F.lit(3_600_000_000)).cast("int").alias("period_h"),
        F.col("n"),
        amp.alias("amp"),
    )


#: out-of-band DP sentinel: far above any reachable path cost
#: (L · max-bucket-|Δ| ≲ 1e13 at 100 TB bucket sums) yet two additions
#: below int64 overflow
DTW_INF = 1_000_000_000_000_000


def dtw_band_distance(
    df: DataFrame,
    bucket_us: int = 21_600_000_000,
    n_buckets: int = 120,
    band: int = 8,
    type_col: str = "event_type",
    micros_col: str = "t_us",
    value_col: str = "value",
) -> DataFrame:
    """Sakoe-Chiba banded Dynamic Time Warping between every channel
    pair, as a PURE Catalyst higher-order-function program — the
    alignment-invariant distance that says which channels move
    together even when one lags or locally stretches (`xcorr_lag`
    finds one GLOBAL shift; DTW prices arbitrary monotone warps within
    ±``band`` buckets). Classic trimming triage: channel pairs with
    small DTW but large lockstep distance are desynchronized, not
    different.

    Construction: each channel becomes a DENSE length-``n_buckets``
    integer series (bucketed 4-dp-scaled value sums from the global
    min-time origin, missing buckets = 0 — total and deterministic);
    the DP dp[i][j] = |x_i−y_j| + min(up, diag, left), cells outside
    |i−j| ≤ band pinned to ``DTW_INF``, runs as a nested
    ``F.aggregate`` fold (outer over rows carrying the previous DP row
    as an array<long>, inner over cells appending to the current row)
    — ALL integer arithmetic end-to-end, executed inside codegen, no
    Python anywhere. The oracle replays the identical recurrence with
    a recursive CTE + list_reduce, so the cost is compared EXACTLY
    (bigint, no rounding at all).

    Scale shape: the event scan aggregates to |channels|·L longs — the
    only data-sized work; series collect to the driver (the bounded
    centroid-collect precedent: ~5·120 longs), pair rows are literals,
    and the O(pairs·L·band) DP runs executor-side. ``lockstep_cost_e4``
    (the band-0 diagonal) rides along: DTW ≤ lockstep is an identity
    the tests pin.
    """
    B, L, W = int(bucket_us), int(n_buckets), int(band)
    t0_row = df.agg(F.min(micros_col).alias("__t0"))
    base = (
        df.crossJoin(F.broadcast(t0_row))
        .select(
            F.col(type_col).alias("__ty"),
            F.expr(f"({micros_col} - __t0) DIV {B}").alias("__b"),
            _scaled_int(F.col(value_col)).alias("__v"),
        )
        .filter((F.col("__b") >= 0) & (F.col("__b") < L))
    )
    sums = base.groupBy("__ty", "__b").agg(F.sum("__v").alias("__s"))
    types = df.select(F.col(type_col).alias("__ty")).distinct()
    grid = types.select(
        "__ty", F.explode(F.sequence(F.lit(0), F.lit(L - 1))).alias("__b")
    )
    dense = grid.join(sums.hint("shuffle_hash"), ["__ty", "__b"], "left").select(
        "__ty",
        "__b",
        F.coalesce(F.col("__s"), F.lit(0)).cast("long").alias("__s"),
    )
    series = dense.groupBy("__ty").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("__b", "__s"))),
            lambda x: x["__s"],
        ).alias("__vs")
    )
    picked = sorted(series.collect(), key=lambda r: r["__ty"])
    pair_rows = [
        (a["__ty"], b["__ty"], list(a["__vs"]), list(b["__vs"]))
        for ai, a in enumerate(picked)
        for b in picked[ai + 1:]
    ]
    pf = df.sparkSession.createDataFrame(
        pair_rows, "type_a string, type_b string, xs array<long>, ys array<long>"
    )
    xs, ys = F.col("xs"), F.col("ys")
    inf = F.lit(DTW_INF).cast("long")

    def cost(i, j):
        return F.abs(F.element_at(xs, i + 1) - F.element_at(ys, j + 1))

    row0 = F.aggregate(
        F.sequence(F.lit(1), F.lit(L - 1)),
        F.array(cost(F.lit(0), F.lit(0))),
        lambda acc, j: F.concat(
            acc,
            F.array(
                F.when(j > W, inf).otherwise(
                    cost(F.lit(0), j) + F.element_at(acc, -1)
                )
            ),
        ),
    )
    full = F.aggregate(
        F.sequence(F.lit(1), F.lit(L - 1)),
        row0,
        lambda prev, i: F.aggregate(
            F.sequence(F.lit(1), F.lit(L - 1)),
            F.array(
                F.when(i > W, inf).otherwise(
                    cost(i, F.lit(0)) + F.element_at(prev, 1)
                )
            ),
            lambda acc, j: F.concat(
                acc,
                F.array(
                    F.when(F.abs(i - j) > W, inf).otherwise(
                        cost(i, j)
                        + F.least(
                            F.element_at(prev, j + 1),
                            F.element_at(prev, j),
                            F.element_at(acc, -1),
                        )
                    )
                ),
            ),
        ),
    )
    lockstep = F.aggregate(
        F.zip_with(xs, ys, lambda x, y: F.abs(x - y)),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    dtw = F.element_at(full, L)
    return pf.select(
        "type_a",
        "type_b",
        F.lit(L).alias("n_buckets"),
        F.lit(W).alias("band"),
        dtw.alias("dtw_cost_e4"),
        lockstep.alias("lockstep_cost_e4"),
        rd(dtw.cast("double") / F.lit(1e4) / F.lit(float(L)), 6).alias(
            "dtw_per_step"
        ),
    )


def holt_brown_forecast(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("t_us", "event_id"),
    depth: int = 8,
    scale: int = 4,
) -> DataFrame:
    """Brown's double exponential smoothing (α = ½) with trend — the
    one-step-ahead forecast ŷ = 2S1 − S2 + (S1 − S2) = 3S1 − 2S2,
    where S2 smooths the smoothed series: the trend-aware member of
    the forecasting family (`ewma_halflife` = level only;
    `ts_seasonal_naive_mase` = seasonal benchmark; `ts_conformal_*` =
    intervals). A trending channel defeats a plain EWMA (it lags by
    trend/α); Brown's correction cancels that lag.

    Truncated-exact construction (the `ewma_halflife` discipline,
    one convolution deeper): with x scaled to ints, truncated S1 has
    integer weights 2^(D−1−j) over D lags (den 2^D − 1); substituting
    the truncated S1 into S2's smoothing gives S2 integer weights
    c_m·2^(2D−2−m) over 2D−1 lags, c_m = min(m+1, 2D−1−m) — the
    triangular self-convolution — over den (2^D − 1)². The forecast
    numerator 3·num1·den − 2·num2 stays an exact integer (≲5e12 at
    depth 8 for |x| ≤ 3e3 — inside 2^53, so the single double
    division is bit-identical in any engine). Rows without the full
    2D−1 history emit NULL (no head renormalization ambiguity). One
    window partition pass; one exchange.
    """
    D = int(depth)
    den1 = (1 << D) - 1
    w = Window.partitionBy(key_col).orderBy(*[F.col(c).asc() for c in order_cols])
    v = _scaled_int(F.col(value_col), scale)
    base = df.select(
        F.col(key_col), *[F.col(c) for c in dict.fromkeys(order_cols)], v.alias("v")
    )

    def lag(m):
        return F.col("v") if m == 0 else F.lag("v", m).over(w)

    num1: Column = F.lit(0).cast("long")
    for j in range(D):
        num1 = num1 + lag(j) * F.lit(1 << (D - 1 - j))
    num2: Column = F.lit(0).cast("long")
    for m in range(2 * D - 1):
        c_m = min(m + 1, 2 * D - 1 - m)
        num2 = num2 + lag(m) * F.lit(c_m * (1 << (2 * D - 2 - m)))
    full = lag(2 * D - 2).isNotNull()
    sc = float(10**scale)
    s1 = num1.cast("double") / F.lit(float(den1)) / F.lit(sc)
    s2 = num2.cast("double") / F.lit(float(den1 * den1)) / F.lit(sc)
    fnum = (
        F.lit(3) * num1 * F.lit(den1) - F.lit(2) * num2
    ).cast("double")
    fc = fnum / F.lit(float(den1 * den1)) / F.lit(sc)
    return base.select(
        F.col(key_col),
        *[F.col(c) for c in dict.fromkeys(order_cols)],
        F.when(full, rd(s1, 6)).alias("s1"),
        F.when(full, rd(s2, 6)).alias("s2"),
        F.when(full, rd(fc, 6)).alias("forecast_next"),
    )


def burst_segments(
    df: DataFrame,
    enter_div: int = 3,
    key_col: str = "event_type",
    micros_col: str = "t_us",
    order_cols: tuple[str, ...] = ("t_us", "event_id"),
) -> DataFrame:
    """Hysteresis burst detector: contiguous runs where arrivals come
    FASTER than the channel's norm — enter a burst when the
    inter-arrival gap drops below mean/``enter_div``, stay in it until
    a gap exceeds the mean (two thresholds = hysteresis, so borderline
    gaps can't flicker segments the way a single cutoff does). The
    practical reading of `stats_interarrival_expfit`'s rejection:
    WHERE the bursts are, as (start, end, count, mean-gap) segments.

    Scale construction — hysteresis is nominally a 1-bit sequential
    state machine, but the state equals "the most recent threshold
    CROSSING was an enter", which is one IGNORE-NULLS last_value over
    the trial-keyed order (the forward-fill primitive) — no fold, no
    per-key arrays, one Exchange carrying the lag, the fill, and the
    island numbering. Thresholds are exact integer ratios of
    (Σgap, n): gap·n·enter_div < Σgap compares INTEGERS (decimal to
    dodge the n·Σgap overflow), so segment membership is bit-portable.
    """
    w = Window.partitionBy(key_col).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    d = df.select(
        F.col(key_col),
        *[F.col(c) for c in dict.fromkeys(order_cols)],
        F.col(micros_col).alias("__t"),
        (F.col(micros_col) - F.lag(micros_col, 1).over(w)).alias("__gap"),
    )
    st = d.groupBy(key_col).agg(
        F.count("__gap").alias("__n"),
        F.sum(F.col("__gap").cast("decimal(38,0)")).alias("__sg"),
    )
    j = d.join(F.broadcast(st), key_col)
    gap_d = F.col("__gap").cast("decimal(38,0)")
    n_d = F.col("__n").cast("decimal(38,0)")
    enter = gap_d * n_d * F.lit(int(enter_div)) < F.col("__sg")
    exit_ = gap_d * n_d > F.col("__sg")
    marker = F.when(F.col("__gap").isNull(), F.lit(0)).when(
        enter, F.lit(1)
    ).when(exit_, F.lit(0))
    filled = F.last(marker, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lab = j.select(
        F.col(key_col),
        *[F.col(c) for c in dict.fromkeys(order_cols)],
        F.col("__t"),
        F.col("__gap"),
        F.coalesce(filled, F.lit(0)).alias("__in"),
    )
    # island id: cumulative count of state CHANGES up to this row
    chg = F.when(
        F.coalesce(F.lag("__in", 1).over(w), F.lit(0)) != F.col("__in"), 1
    ).otherwise(0)
    seg = lab.select(
        F.col(key_col),
        *[F.col(c) for c in dict.fromkeys(order_cols)],
        "__t",
        "__gap",
        "__in",
        F.sum(chg).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__seg"),
    ).filter(F.col("__in") == 1)
    mean_gap = rd(
        F.sum(F.col("__gap").cast("decimal(38,0)")).cast("double")
        / F.count(F.lit(1)).cast("double")
        / F.lit(1e6),
        6,
    )
    return seg.groupBy(F.col(key_col), F.col("__seg")).agg(
        F.min("__t").alias("start_us"),
        F.max("__t").alias("end_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        mean_gap.alias("mean_gap_s"),
    ).drop("__seg")
