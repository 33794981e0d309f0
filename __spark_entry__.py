"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (SURVEY §7.2): z-score the
``value`` channel per user over ``events`` and report spike/NaN artifact
segments via the gaps-and-islands suggestion operator — scan →
partitioned window agg (F9) → lag-diff (F7-shaped deriv) → A5 islands.

``queries()`` / ``oracle_sql()`` expose every implemented SURVEY §2
operator with a DuckDB oracle (see
``time_series_data_trimmer_spark/queries.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from time_series_data_trimmer_spark.queries import REGISTRY  # noqa: E402
import time_series_data_trimmer_spark.queries_ext  # noqa: E402,F401  (fills REGISTRY)
import time_series_data_trimmer_spark.queries_parity  # noqa: E402,F401  (fills REGISTRY)
import time_series_data_trimmer_spark.queries_compose  # noqa: E402,F401  (fills REGISTRY)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from time_series_data_trimmer_spark.operators.aggregates import suggest_segments
    from time_series_data_trimmer_spark.operators.filters import apply_filter
    from time_series_data_trimmer_spark.queries import _events

    sf_dir = "/root/testdata/sf0.001"
    events = _events(spark, sf_dir)
    z = apply_filter(
        events, ["value"], "normalize_zscore", {},
        trial_key="user_id", time_col="t", order_cols=["t", "event_id"], sample_rate=120.0,
    )
    return suggest_segments(
        z, "value", trial_key="user_id", time_col="t", order_cols=["t", "event_id"]
    )


#: The driver's correctness gate samples the FIRST 50 registered
#: queries. Registration order had been frozen since r1, so the
#: extension operators (dedup/similarity/text/time-series/graph) were
#: never externally verified. This explicit order interleaves the
#: marquee extension queries into the first 50 alongside a
#: representative reference-parity core; everything else follows in
#: module registration order.
_FIRST_50 = [
    # ~15 reference-parity anchors (SURVEY §2) — stable across rounds so
    # every CORRECTNESS_r*.json re-confirms the parity core
    "f1_moving_average", "f2_rolling_median", "f9_normalize_zscore",
    "f6_detrend", "f14_resample",
    "p1_time_slice", "p4_delete_segment_collapse", "p7_asof_lookup",
    "a1_sample_rate", "a4_episode_overlay", "a5_suggest_segments",
    "e1_frame_transform", "recipe_compiled_chain",
    "tpch_q1_pricing_summary", "tpch_q21_waiting_supplier",
    # r10 rotation (VERDICT r9 #1): 35 names that have NEVER appeared in
    # any driver CORRECTNESS_r1..r9 sample (183/352 remained unverified
    # externally). Priorities from the verdict: the r9 waves never
    # sampled, the remaining TPC-H middle, and unsampled dedup/text
    # standalones.
    "graph_ppr_seed_topk", "graph_lp_modularity", "graph_hits_scores",
    "retrieval_mmr_topk", "mix_dedup_aware_epochs", "mix_doremi_step",
    "mix_interleave_schedule", "stream_cusum_level_alerts",
    "stats_tost_equivalence_by_type", "eval_f1_threshold_sweep",
    "eval_brier_decomposition", "sketch_kmv_error_vs_k",
    "privacy_qi_risk_sweep", "privacy_t_closeness_audit",
    "dedup_family_agreement", "mix_split_leakage_audit",
    "markov_stationary_dist", "ts_holt_backtest_mase",
    "tpch_q4_order_priority", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "tpch_q13_customer_order_distribution",
    "tpch_q14_promo_revenue", "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue", "tpch_q19_disjunctive_revenue",
    "tpch_q22_global_sales_opportunity",
    "sim_recall_suite", "dedup_lsh_band_sweep", "dedup_incremental_batch",
    "text_tfidf_top_terms", "text_chunk_documents", "text_bigram_lm_score",
    "emb_pca_power_iteration", "events_ohlc_hourly",
]


def _ordered_names() -> list[str]:
    head = [n for n in _FIRST_50 if n in REGISTRY]
    seen = set(head)
    return head + [n for n in REGISTRY if n not in seen]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name][0] for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {
        name: REGISTRY[name][1]
        for name in _ordered_names()
        if REGISTRY[name][1] is not None
    }
