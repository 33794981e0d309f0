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
    # r9 rotation (VERDICT r8 #1): 31 names that have NEVER appeared in
    # any driver CORRECTNESS_r1..r8 sample (174/308 remained unverified
    # externally). Priorities from the verdict: the 8 never-checked
    # streaming GroupState queries, the TPC-H tail, the time-series
    # family heads, the r8 additions not yet sampled, and the two
    # drift-triage names (emb_hard_negatives, dedup_impact_by_source).
    "stream_dedup", "stream_funnel_users", "stream_dq_violations",
    "stream_content_fingerprint", "stream_quantile_value_by_type",
    "stream_kmv_distinct_users", "stream_upsert_latest_state",
    "stream_static_enriched_counts",
    "tpch_q2_min_cost_supplier", "tpch_q9_product_type_profit",
    "tpch_q11_important_parts", "tpch_q12_priority_by_returnflag",
    "tpch_q16_supplier_variety", "tpch_q20_heavy_shippers",
    "ts_sax_symbols", "ts_lttb_downsample",
    "text_bpe_suite", "text_bpe_fertility_by_lang", "graph_kcore_bound",
    "privacy_l_diversity_audit", "retrieval_chunk_topk",
    "stats_bootstrap_mean_ci_by_type", "eval_pr_curve_binned",
    "graph_degree_assortativity", "mix_curriculum_shards",
    "mix_pack_len_sweep", "stats_mannwhitney_halves_by_type",
    "emb_hard_negatives", "dedup_impact_by_source",
    "pipeline_dedup_budget_pack", "sketch_kmv_rollup_day",
    # r9 new this round (registered later in the round; the `in REGISTRY`
    # filter below makes unregistered names inert until they land)
    "graph_kcore_exact", "text_bpe_encode_ranked",
    "pipeline_budget_pack_real_tokens", "stream_state_partition_report",
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
