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
    # r8 rotation (VERDICT r7 #1): ~30 names that have NEVER appeared in
    # any driver CORRECTNESS_r1..r7 sample (194/293 were never externally
    # verified at the r7 rotation rate). All pass the full local
    # check_oracle run; this puts them in front of the external gate.
    "sim_ivf_nprobe_recall", "emb_label_knn_agreement",
    "graph_label_propagation_emb", "graph_adamic_adar_links",
    "linkage_golden_record", "stream_psi_drift_daily",
    "eval_isotonic_calibration", "eval_auc_binned",
    "privacy_k_anonymity_audit", "emb_retrieval_ndcg",
    "emb_matryoshka_recall_by_dim", "ts_holt_forecast",
    "ts_burst_segments", "ts_xcorr_lag", "ts_spectral_probe",
    "funnel_step_latency", "scd2_user_state_history",
    "twap_value_by_user_hour", "dq_expectations_report",
    "layout_partition_advisor", "sketch_quantile_error_report",
    "stats_chi2_residuals", "text_chunk_centrality",
    "decontam_bloom_prefilter", "export_manifest_shards",
    "stream_stream_click_purchase_join", "dedup_containment_pairs",
    "feature_loo_target_encoding", "ts_theilsen_lag_slope",
    "stats_mutual_info_type_hour", "sample_neyman_allocation",
    # r8 new this round (registered later in the round; the `in REGISTRY`
    # filter below makes unregistered names inert until they land)
    "text_bpe_encode_counts", "pipeline_pack_real_tokens",
    "feature_quantile_transform_sketched", "dedup_report_suite",
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
