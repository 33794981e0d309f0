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
    # r11 rotation (VERDICT r10 #1): 35 names that have NEVER appeared
    # in any driver CORRECTNESS_r1..r10 sample (153/357 remained
    # unverified externally; set-diff over all ten files). Priorities
    # from the verdict: the 5 r10 registry additions, the one heavy
    # suite truly never sampled (dedup_simhash_eval_report — the other
    # suites it named were r8/r9-sampled), the 12 reference-parity
    # queries that never drew an external check, and a cross-family
    # spread over the remaining sim/text/stats/ts/dq tails.
    # graph_clustering_by_degree doubles as mover triage (VERDICT #3).
    "graph_concurrency_capped_edges", "dq_regex_rule_audit",
    "dq_schema_drift_report", "mix_length_bucket_padding_waste",
    "layout_zonemap_prune_stats",
    "dedup_simhash_eval_report", "mix_budget_after_dedup",
    "f4_butter_lowpass_fallback", "f5_butter_bandpass_fallback",
    "f13_interpolate_kernel", "j1_annotation_containment_join",
    "j2_deletion_anti_join", "p3_selection_masked_filter",
    "p6_annotation_at_time", "p8_snap_to_extremum", "w2_forward_fill",
    "e2_derived_channel", "e9_heading_from_forward", "a9_sessionize",
    "dq_functional_dependency", "privacy_dp_count_report",
    "graph_clustering_by_degree", "sample_kcenter_coreset",
    # the 12 r11 additions (newest-first per the VERDICT rotation
    # precedent — all registered and locally oracle-verified this
    # round, never driver-sampled by construction)
    "text_bpe_sample_train_encode", "graph_concurrency_autocap_edges",
    "eval_cohens_kappa_langid", "text_kn_bigram_ppl",
    "mix_waterfill_token_budget", "ts_ljungbox_whiteness",
    "stats_brown_forsythe_by_type", "layout_bloom_advisor",
    "stream_watermark_lateness_audit", "dedup_prefix_density_probe",
    "privacy_pii_redact_rewrite", "eval_bootstrap_auc_ci",
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
