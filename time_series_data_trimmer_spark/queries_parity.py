"""Additional reference-parity queries: the Python-kernel filters
(savgol, butterworth fallback, resample) and the join/lookup operators
(J1/J2, P6–P8, W2, E9).

The savgol oracle is exact: the interior of a Savitzky–Golay filter is
a fixed convolution, so the least-squares weight vector is precomputed
once in numpy and inlined as the SAME literals into both the Spark
expression and the DuckDB SQL — every sum then runs in identical
left-fold order. Edge rows use per-position truncated-window weights,
also inlined. The Spark side still runs the real applyInPandas kernel
(tests/test_filters.py proves kernel == per-point polyfit); the oracle
just expresses the same math relationally.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from time_series_data_trimmer_spark.functions import expressions as E
from time_series_data_trimmer_spark.functions.rounding import rd, sql_rd
from time_series_data_trimmer_spark.operators import edits
from time_series_data_trimmer_spark.operators.aggregates import ffill
from time_series_data_trimmer_spark.operators.filters import (
    _apply_pandas_interpolate,
    _scipy_signal,
    apply_filter,
)
from time_series_data_trimmer_spark.queries import _EVK, _T0, _W, _WP, _events, register

R = sql_rd

#: With scipy installed, savgol/butterworth switch to the
#: scipy.signal branch (savgol_filter / filtfilt — filter_engine.py:
#: 94-134), whose float paths and edge semantics the relational oracles
#: below do NOT model. Register those oracles only in scipy-absent
#: environments; under scipy the queries stay registered rows-only and
#: the skipif-gated tests in tests/test_filters.py carry the parity
#: burden instead.
HAS_SCIPY = _scipy_signal is not None

# ---------------------------------------------------------------------------
# F3 savgol — kernel on the Spark side, literal-weight window SQL oracle
# ---------------------------------------------------------------------------

_SG_WINDOW, _SG_POLY = 11, 2


def _savgol_weights(window: int, poly: int) -> tuple[list[float], dict[int, list[float]]]:
    """(interior weight vector, edge weights by row index from each end).

    Interior: value of the LSQ poly fit at the window center. Edges
    (first/last half rows): truncated-window polyfit evaluated at the
    row's own position — identical math to the reference fallback
    (filter_engine.py:100-113)."""
    half = window // 2
    x = np.arange(window, dtype=float)
    V = np.vander(x, poly + 1, increasing=True)
    interior = ((V @ np.linalg.pinv(V))[half]).tolist()
    edges: dict[int, list[float]] = {}
    for i in range(half):
        lo, hi = 0, i + half + 1  # truncated window for row i (from start)
        xs = np.arange(lo, hi, dtype=float)
        Ve = np.vander(xs, min(poly, len(xs) - 1) + 1, increasing=True)
        # fit value at position i = row i of the hat matrix
        edges[i] = (Ve @ np.linalg.pinv(Ve))[i].tolist()
    return interior, edges


def _sg_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir)
    # restrict to trials long enough for a full filter window: shorter
    # trials truncate on BOTH sides (kernel handles them; the relational
    # oracle's one-sided edge weights don't) — same filter in the SQL.
    # Broadcast semi-join rather than a count window: a window here would
    # impose hashpartitioning(user_id) as ENSURE_REQUIREMENTS, Catalyst
    # would collapse the kernel's explicit repartition into it, and AQE
    # would coalesce the whole CPU-bound kernel stage down to 2 tasks.
    big = (
        df.groupBy("user_id").agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= _SG_WINDOW).select("user_id")
    )
    df = df.join(F.broadcast(big), "user_id", "left_semi")
    # π-scale the channel: savgol weights are rational, so on the raw
    # 0.01-grid input the two engines' summation orders land exactly on
    # round-digit boundaries; an irrational factor kills the grid.
    # Project to the 4 needed columns BEFORE the grouped-map kernel —
    # every retained column rides the Arrow round-trip through Python.
    df = df.select(
        "user_id", "event_id", "t", (F.col("value") * F.lit(float(np.pi))).alias("v")
    )
    out = apply_filter(
        df, ["v"], "savgol", {"window": _SG_WINDOW, "polyorder": _SG_POLY},
        sample_rate=120.0, **_EVK,
    )
    return out.select("user_id", "event_id", rd(F.col("v"), 4).alias("sg_value"))


def _sg_oracle() -> str:
    interior, edges = _savgol_weights(_SG_WINDOW, _SG_POLY)
    half = _SG_WINDOW // 2
    n = "count(*) OVER (PARTITION BY user_id)"
    pos = "row_number() OVER (" + _W + ")"
    # interior: sum_j w_j * value[i + j - half]
    terms = " + ".join(
        f"({w!r}) * lag(value, {half - j}) OVER ({_W})" if j < half
        else (f"({w!r}) * value" if j == half else f"({w!r}) * lead(value, {j - half}) OVER ({_W})")
        for j, w in enumerate(interior)
    )
    # edge row at distance d from the start uses edges[d] over rows 0..d+half;
    # by symmetry the end edge uses the reversed weights over the last rows.
    edge_cases = []
    for d, ws in edges.items():
        t_start = " + ".join(
            f"({w!r}) * " + (
                f"lag(value, {d - j}) OVER ({_W})" if j < d
                else ("value" if j == d else f"lead(value, {j - d}) OVER ({_W})")
            )
            for j, w in enumerate(ws)
        )
        # end row r = n-1-d: window rows r-half .. r+d; weight for window
        # index j is ws reflected (ws[d+half-j]), offset j-half from r
        half_ = _SG_WINDOW // 2
        t_end = " + ".join(
            f"({ws[d + half_ - j]!r}) * " + (
                f"lag(value, {half_ - j}) OVER ({_W})" if j < half_
                else ("value" if j == half_ else f"lead(value, {j - half_}) OVER ({_W})")
            )
            for j in range(d + half_ + 1)
        )
        edge_cases.append(f"WHEN pos = {d + 1} THEN ({t_start})")
        edge_cases.append(f"WHEN pos = n - {d} THEN ({t_end})")
    return f"""
    WITH base AS (
      SELECT user_id, event_id, value * pi() AS value, ts, {pos} AS pos, {n} AS n FROM events
      QUALIFY n >= {_SG_WINDOW}
    )
    SELECT user_id, event_id,
           {R("CASE " + " ".join(edge_cases) + f" ELSE ({terms}) END", 4)} AS sg_value
    FROM base
    """


register("f3_savgol", None if HAS_SCIPY else _sg_oracle())(_sg_spark)


# ---------------------------------------------------------------------------
# F4/F5 butterworth — scipy-absent fallback semantics (documented in
# filter_engine.py:115-134: rolling mean of width fs/cutoff, detrend first
# for bandpass). With scipy installed these become filtfilt kernels and the
# oracle no longer applies (rows-only); this build targets the no-scipy env.
# ---------------------------------------------------------------------------

_BL_CUTOFF = 6.0
_BL_WIN = max(3, int(120.0 / max(_BL_CUTOFF, 1)))  # = 20
_BL_LO, _BL_HI = -(_BL_WIN // 2), _BL_WIN - _BL_WIN // 2 - 1


_F4_SQL = f"""
    SELECT user_id, event_id,
           {R(f"avg(value * pi()) OVER ({_W} ROWS BETWEEN {-_BL_LO} PRECEDING AND {_BL_HI} FOLLOWING)", 4)} AS lp_value
    FROM events
    """


@register("f4_butter_lowpass_fallback", None if HAS_SCIPY else _F4_SQL)
def _q_butter_lp(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir).withColumn("v", F.col("value") * F.lit(float(np.pi)))
    out = apply_filter(
        df, ["v"], "butter_lowpass", {"cutoff": _BL_CUTOFF, "order": 2},
        sample_rate=120.0, **_EVK,
    )
    return out.select("user_id", "event_id", rd(F.col("v"), 4).alias("lp_value"))


# ---------------------------------------------------------------------------
# F13 non-linear interpolate MACHINERY: the applyInPandas kernel that the
# scipy methods (nearest/quadratic/cubic) run through, driven here with
# method='linear' (the one method pandas computes without scipy), so the
# kernel path is verified end-to-end against the SAME relational oracle
# as the expression-path f13. The scipy methods themselves are covered by
# skipif-gated parity tests (tests/test_filters.py).
# ---------------------------------------------------------------------------


@register(
    "f13_interpolate_kernel",
    f"""
    WITH holed AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    ),
    pos AS (
      SELECT user_id, event_id, v,
             CAST(row_number() OVER ({_W}) AS DOUBLE) AS idx
      FROM holed
    ),
    filled AS (
      SELECT user_id, event_id, v, idx,
             last_value(v IGNORE NULLS) OVER ({_WP} ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
             first_value(v IGNORE NULLS) OVER ({_WP} ORDER BY idx
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
             last_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS) OVER ({_WP} ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_i,
             first_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS) OVER ({_WP} ORDER BY idx
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_i
      FROM pos
    )
    SELECT user_id, event_id,
           {R('''CASE
             WHEN v IS NOT NULL THEN v
             WHEN prev_v IS NULL THEN next_v
             WHEN next_v IS NULL THEN prev_v
             ELSE prev_v + (next_v - prev_v) * (idx - prev_i) / (next_i - prev_i)
           END''', 4)} AS v_interp
    FROM filled
    """,
)
def _q_interp_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas Series.interpolate(method='linear', limit_direction='both')
    through the grouped-map kernel (filters._apply_pandas_interpolate) —
    the same code path the scipy methods use (filter_engine.py:85-87)."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "t",
        # mirror the oracle's CASE WHEN = 'error' THEN NULL ELSE value END
        # exactly: a != predicate would NULL the value for NULL event_type
        # where the oracle keeps it (three-valued logic divergence)
        F.when(F.col("event_type") == "error", F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    out = _apply_pandas_interpolate(
        ev, ["v"], "linear", trial_key="user_id", time_col="t", has_sel=False
    )
    return out.select("user_id", "event_id", rd(F.col("v"), 4).alias("v_interp"))


# ---------------------------------------------------------------------------
# F14 resample — applyInPandas np.interp kernel, through the EXACT gate.
#
# Everything np.interp does on this input is closed-form IEEE double
# arithmetic, reproducible as SQL text when sequenced identically:
#   grid      t_new[k] = k / 0.001          (int64/double division,
#                                            NOT k * 1000.0 — one ulp apart)
#   n_new     = int(t_last * 0.001)         (double multiply, truncate)
#   bracketing: j = the unique segment with xp[j] <= t < xp[j+1]
#               (t_new < t_last always: n_new*1000 <= t_last; and the
#               time axis is strictly increasing — no duplicate (user,
#               ts) in the corpus — so half-open segments partition it)
#   lerp      slope = (fp[j+1]-fp[j]) / (xp[j+1]-xp[j]);
#             out   = slope*(t - xp[j]) + fp[j]   (same op order)
# Kernel passthrough branches (trials with < 2 rows or a grid of <= 1
# point return their ORIGINAL rows, filter_engine.py:153-156) are
# mirrored as a UNION ALL branch gated on the same conditions.
# ---------------------------------------------------------------------------

_RS_FS = 0.001  # target_fs: one sample per 1000 s over the multi-week span


def _q_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir)
    w = Window.partitionBy("user_id")
    rel = df.select(
        "user_id",
        "event_id",
        (F.col("t") - F.min("t").over(w)).alias("normalized_time"),
        "value",
    )
    out = apply_filter(
        rel, ["value"], "resample", {"target_fs": _RS_FS},
        trial_key="user_id", time_col="normalized_time", sample_rate=_RS_FS,
    )
    return out.select(
        # the kernel schema widens every numeric column to double (the
        # grid rows are synthesized); the key interpolates between
        # identical values so the cast back to long is exact
        F.col("user_id").cast("long").alias("user_id"),
        "normalized_time",
        rd(F.col("value"), 4).alias("value"),
    )


_RS_ORACLE = f"""
    WITH rel AS (
      SELECT user_id,
             epoch(ts) - min(epoch(ts)) OVER (PARTITION BY user_id) AS nt,
             value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts) AS pos
      FROM events
    ),
    meta AS (
      SELECT user_id, max(nt) AS t_last, count(*) AS n,
             CAST(trunc(max(nt) * (0.001::DOUBLE)) AS BIGINT) AS n_new
      FROM rel GROUP BY user_id
    ),
    seg AS (
      SELECT user_id, nt AS x0, value AS f0,
             lead(nt)    OVER (PARTITION BY user_id ORDER BY pos) AS x1,
             lead(value) OVER (PARTITION BY user_id ORDER BY pos) AS f1
      FROM rel
    ),
    grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(0, n_new - 1)) AS DOUBLE) / (0.001::DOUBLE) AS t_new
      FROM meta WHERE n >= 2 AND n_new > 1
    ),
    interp AS (
      SELECT g.user_id, g.t_new AS normalized_time,
             ((s.f1 - s.f0) / (s.x1 - s.x0)) * (g.t_new - s.x0) + s.f0 AS v
      FROM grid g JOIN seg s
        ON g.user_id = s.user_id AND g.t_new >= s.x0 AND g.t_new < s.x1
    ),
    passthru AS (
      SELECT r.user_id, r.nt AS normalized_time, r.value AS v
      FROM rel r JOIN meta m USING (user_id)
      WHERE m.n < 2 OR m.n_new <= 1
    ),
    unioned AS (
      SELECT * FROM interp UNION ALL SELECT * FROM passthru
    )
    SELECT user_id, normalized_time, {R("v", 4)} AS value FROM unioned
    """

register("f14_resample", _RS_ORACLE)(_q_resample)


# ---------------------------------------------------------------------------
# J1/J2, P6 — interval tables joined to samples (annotations fabricated
# deterministically so both engines see the same intervals)
# ---------------------------------------------------------------------------

_ANN_ROWS = [
    (1, _T0 + 0.0, _T0 + 20000.0, "warmup", "default", "#4e79a7"),
    (2, _T0 + 15000.0, _T0 + 40000.0, "episode:inspection", "episode", "#6bd47a"),
    (3, _T0 + 30000.0, _T0 + 90000.0, "episode:action", "episode", "#ffa500"),
    (4, _T0 + 50000.0, _T0 + 52000.0, "blink", "eye", "#e15759"),
]
_ANN_SQL_VALUES = ", ".join(
    f"(CAST({i} AS BIGINT), {s!r}, {e!r}, '{lb}', '{tr}', '{c}')" for i, s, e, lb, tr, c in _ANN_ROWS
)
_ANN_SQL = (
    f"(VALUES {_ANN_SQL_VALUES}) AS ann(ann_id, start, \"end\", label, track, color)"
)


def _ann_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        _ANN_ROWS, "ann_id long, start double, end double, label string, track string, color string"
    )


@register(
    "j1_annotation_containment_join",
    f"""
    SELECT e.event_id, e.user_id, ann.ann_id, ann.label
    FROM events e JOIN {_ANN_SQL} ON epoch(e.ts) >= ann.start AND epoch(e.ts) <= ann."end"
    """,
)
def _q_j1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    ann = _ann_df(spark)
    t = ev["t"]
    joined = ev.join(F.broadcast(ann), (t >= ann["start"]) & (t <= ann["end"]), "inner")
    return joined.select("event_id", "user_id", "ann_id", "label")


@register(
    "j2_deletion_anti_join",
    f"""
    SELECT e.event_id, e.user_id
    FROM events e
    WHERE NOT EXISTS (
      SELECT 1 FROM {_ANN_SQL}
      WHERE ann.track = 'episode' AND epoch(e.ts) >= ann.start AND epoch(e.ts) <= ann."end"
    )
    """,
)
def _q_j2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    dels = _ann_df(spark).filter(F.col("track") == "episode").select("start", "end")
    out = edits.delete_by_intervals(ev, dels, trial_key=None, time_col="t")
    return out.select("event_id", "user_id")


@register(
    "p6_annotation_at_time",
    f"""
    SELECT ann_id, label, track
    FROM {_ANN_SQL}
    WHERE start <= {_T0 + 35000.0} AND "end" >= {_T0 + 35000.0}
    ORDER BY (track != 'episode'), ("end" - start)
    LIMIT 1
    """,
)
def _q_p6(spark: SparkSession, sf_dir: str) -> DataFrame:
    picked = edits.annotation_at_time(_ann_df(spark), _T0 + 35000.0)
    return picked.select("ann_id", "label", "track")


# ---------------------------------------------------------------------------
# P7 as-of lookup, P8 snap-to-extremum, W2 ffill, E9 heading
# ---------------------------------------------------------------------------

_ASOF_T = _T0 + 43210.123


@register(
    "p7_asof_lookup",
    f"""
    SELECT user_id, event_id, epoch(ts) AS t, value FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id
        ORDER BY abs(epoch(ts) - {_ASOF_T}), epoch(ts)
      ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def _q_p7(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "event_id", "t", "value")
    return edits.asof_lookup(ev, _ASOF_T, trial_key="user_id", time_col="t")


@register(
    "p8_snap_to_extremum",
    f"""
    WITH w AS (
      SELECT user_id, event_id, epoch(ts) AS t, value,
             max(value) OVER fr AS vmax, min(value) OVER fr AS vmin,
             max_by(epoch(ts), value * 100000000.0 - (epoch(ts) - {_T0})) OVER fr AS tmax,
             min_by(epoch(ts), value * 100000000.0 + (epoch(ts) - {_T0})) OVER fr AS tmin
      FROM events
      WINDOW fr AS ({_W} ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    )
    SELECT user_id, event_id,
           {R("CASE WHEN abs(vmax - value) < abs(vmin - value) THEN tmin ELSE tmax END", 3)} AS snap_time
    FROM w
    """,
)
def _q_p8(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "event_id", "t", "value")
    out = edits.snap_to_extremum(ev, "value", trial_key="user_id", time_col="t", reach=3)
    return out.select("user_id", "event_id", rd(F.col("snap_time"), 3).alias("snap_time"))


@register(
    "w2_forward_fill",
    f"""
    SELECT user_id, event_id,
           last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
             OVER ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
    FROM events
    """,
)
def _q_w2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).withColumn(
        # exact mirror of the oracle's CASE WHEN event_type <> 'error'
        # THEN value END: both engines yield NULL for NULL event_type
        "v", F.when(F.col("event_type") != "error", F.col("value"))
    )
    out = ffill(ev, "v", trial_key="user_id", time_col="t", out_col="v_ffill")
    return out.select("user_id", "event_id", "v_ffill")


@register(
    "e9_heading_from_forward",
    f"""
    SELECT user_id, event_id,
           {R("degrees(atan2(sin(value), cos(value)))", 6)} AS heading
    FROM events
    """,
)
def _q_e9(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.select(
        "user_id", "event_id",
        rd(E.heading_from_forward(F.cos(F.col("value")), F.sin(F.col("value"))), 6).alias("heading"),
    )
