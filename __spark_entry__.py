"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 (smoke);
``queries()`` / ``oracle_sql()`` expose the engine's full catalog for
the DuckDB hash-compare correctness gate at sf0.01.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from rentals_data_pipeline_spark.plans import catalog  # noqa: E402
from rentals_data_pipeline_spark.plans import relational_queries  # noqa: E402, F401
from rentals_data_pipeline_spark.plans import text_queries  # noqa: E402, F401
from rentals_data_pipeline_spark.plans import dedup_queries  # noqa: E402, F401
from rentals_data_pipeline_spark.plans import similarity_queries  # noqa: E402, F401
from rentals_data_pipeline_spark.plans import multimodal_queries  # noqa: E402, F401
from rentals_data_pipeline_spark.plans import curation_queries  # noqa: E402, F401
from rentals_data_pipeline_spark.plans import sampling_queries  # noqa: E402, F401
from rentals_data_pipeline_spark.plans import timeseries_queries  # noqa: E402, F401
from rentals_data_pipeline_spark.plans import sql_queries  # noqa: E402, F401
from rentals_data_pipeline_spark.plans import tpch_queries  # noqa: E402, F401
from rentals_data_pipeline_spark.plans import graph_queries  # noqa: E402, F401


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.QUERIES["flagship_events_daily"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate checks the FIRST 50 entries of ``queries()``
# in dict order.  With >50 catalog queries we order by certification need.
# Round-5 order (history: CORRECTNESS_r01..r04.json):
#   1. the 30 queries the r4 rotation skipped — certified only in r2/r3,
#      two rounds stale; re-certify first so no certification is ever more
#      than two rounds old;
#   2. r4-certified queries whose backing modules are EDITED this round
#      (relational/multimodal/quality/similarity/layout + curation plans) —
#      an edited module voids the prior hash certification;
#   3. rows-only + r4-certified queries on untouched modules (their r4
#      certification still binds; byte-identical code).
# Any catalog query not named below (i.e. added this round) is newest ->
# checked first, before group 1.
_CHECK_PRIORITY: tuple[str, ...] = (
    # -- group 0: NEW in round 5, never driver-certified — all locally
    # hash-certified at sf0.001+sf0.01+sf0.1 via tools/check_oracle.py
    "multimodal_decoded_wav_stats", "text_pii_redaction",
    "multimodal_decoded_ppm_stats", "quality_psi_value_drift",
    "analytics_copurchase_pairs", "sql_cte_window_topn",
    "ts_anomaly_zscore", "tpch_q3_unshipped_revenue",
    "tpch_q5_local_supplier_volume", "tpch_q10_returned_items",
    "graph_pagerank_copurchase", "graph_triangle_participation",
    "quality_key_skew_events", "analytics_event_transitions",
    "pipeline_training_data_prep",
    # -- group 1: certified r2/r3 only, skipped by round 4's rotation -----
    "flagship_events_daily", "quality_metrics_lineitem",
    "window_period_change", "window_rank_in_group", "window_rolling_avg",
    "window_cumulative_sum", "window_distribution_suite",
    "reshape_unpivot_measures", "reshape_pivot_event_types",
    "dedup_first_event", "topk_orders_per_customer", "join_star_revenue",
    "join_semi_active_customers", "join_anti_no_big_order",
    "join_asof_next_error", "agg_pricing_summary", "agg_rollup_orders",
    "agg_cube_lineitem", "agg_grouping_sets_orders",
    "agg_salted_events_by_type", "analytics_funnel_stages",
    "analytics_retention_cohorts", "scd2_user_value_history",
    "scalar_math_suite", "scalar_variant_json", "text_vocabulary_top100",
    "text_tfidf_top_terms", "text_chunk_documents",
    "text_pack_chunks_by_split", "ts_hierarchical_rollup_daily",
    # -- group 2: r4-certified but backing module edited in round 5 -------
    # (5 rows displaced below the cap by the third-batch group-0 adds:
    # the multimodal metadata/histogram/resize/frame queries and the
    # range join — their code paths are untouched by this round's
    # module edits (decode_media/pack_* only) and all five re-certified
    # in today's full local sf0.01 sweep)
    "cdc_orders_snapshot_diff",
    "profile_orders_columns", "sim_srp_near_dup_pairs",
    "pipeline_embedding_curation", "pipeline_embedding_curation_srp",
    # -- group 3: below the 50-cap this round ----------------------------
    # NEW round-5 queries certified locally (sf0.001 + sf0.01 hash-match
    # — most also at sf0.1 — recorded in COVERAGE.md) — ALL of these
    # must rotate to the FRONT of round 6's order, before the group-1/2
    # re-certs above (they have never been driver-certified):
    "sample_corpus_mixture", "text_gopher_quality_rules",
    "ts_interpolate_linear", "stats_ks_value_drift",
    "window_rolling_autocorr", "text_duplicated_ngram_fraction",
    "stats_equal_frequency_binning", "analytics_activity_streaks",
    "join_asof_tolerance_error", "multimodal_audio_dominant_lag",
    "quality_table_checksum_orders", "sql_not_in_nullable_semantics",
    "stats_weighted_median_orders", "sim_knn_label_vote",
    "text_char_entropy", "graph_jaccard_link_prediction",
    "dedup_normalized_documents", "scd2_apply_changes_incremental",
    "analytics_rfm_segmentation", "multimodal_shot_boundaries",
    "stats_group_confidence_intervals", "analytics_cohort_ltv",
    "quality_cross_field_violations", "analytics_user_lifecycle",
    "ts_changepoint_cusum", "sample_balanced_labels",
    "sim_matryoshka_prefix_rerank", "reshape_denormalize_star",
    "topk_orders_with_ties", "dedup_split_leakage_audit",
    "pipeline_media_curation", "join_temporal_validity_intersection",
    "analytics_rank_movers", "analytics_interval_union_coverage",
    "graph_degree_distribution", "text_unigram_logprob",
    "agg_boolean_aggregates",
    "tpch_q4_priority_checking", "tpch_q6_forecast_revenue",
    "tpch_q8_market_share", "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect", "tpch_q15_top_supplier",
    "tpch_q17_small_quantity", "tpch_q19_discounted_revenue",
    "tpch_q21_suppliers_kept_waiting", "tpch_q22_global_sales_opportunity",
    "tpch_q7_volume_shipping", "tpch_q9_product_type_profit",
    "sim_quantize_int8_stats", "sim_quantized_cosine_topk",
    "analytics_pareto_orders", "stats_chi_square_events",
    "analytics_attribution_last_touch", "ts_seasonal_naive_backtest",
    "ts_ewma_hourly_smoothing",
    "agg_collect_event_types", "reshape_union_schema_evolution",
    "quality_referential_integrity", "analytics_attribution_u_shaped",
    "sql_select_list_scalar_subqueries",
    "tpch_q18_large_volume_customer", "window_range_frame_events",
    "analytics_funnel_conversion_window", "scalar_bitwise_suite",
    "sql_recursive_month_spine", "sql_pivot_status_by_priority",
    "sample_stratified_split_embeddings",
    "dedup_decontaminate_train", "sketch_heavy_hitters_event_types",
    "text_repetition_filters", "cdc_incremental_agg_orders",
    "scalar_array_suite", "stats_winsorized_events",
    "text_corpus_bigrams", "sim_label_centroids",
    "sql_correlated_exists_customers", "sql_above_customer_avg_orders",
    "sql_in_subquery_supplier_nations", "stats_regression_events",
    "scalar_nested_suite", "sim_centroid_outlier_filter",
    "scalar_try_suite", "ts_session_windows_dynamic_gap",
    "agg_mode_orders_priority", "sql_lateral_topk_orders",
    "dedup_edit_distance_pairs", "join_point_in_time_scd2",
    "window_share_of_total",
    # r4-driver-certified, displaced from group 2 (code paths untouched
    # by round-5 module edits; re-verified in the local sf0.01 sweep)
    "join_range_value_bands", "multimodal_frame_sample",
    "multimodal_resize_grid", "multimodal_metadata",
    "multimodal_byte_histogram", "join_full_outer_user_activity",
    "sim_cosine_topk", "sim_embedding_near_dup_pairs",
    "join_asof_last_error", "pipeline_corpus_curation",
    "layout_zorder_cells", "multimodal_audio_energy",
    "join_interval_overlap_orders",
    # rows-only by design (no_oracle rows>0; golden tests pin semantics)
    "sketch_distinct_users_rollup", "sketch_sliding_distinct_users",
    "sketch_distinct_overlap_users", "ts_downsample_lttb",
    "sim_srp_lsh_recall", "sim_ivf_topk",
    "sim_pq_adc_topk_recall", "sim_ivf_pq_topk",
    "sim_ivf_pq_residual_recall",
    "sample_weighted_documents",
    # r4 hash-certified on modules untouched this round
    "dedup_cluster_size_histogram", "sketch_histogram_quantiles",
    "dedup_duplicate_clusters", "sample_deterministic_documents",
    "sample_split_documents", "sample_stratified_events",
    "ts_gap_fill_hourly", "agg_case_bucketing", "agg_distinct_counts",
    "agg_having_frequent_customers", "agg_percentiles_lineitem",
    "dedup_exact_documents", "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_topk", "dedup_simhash_fingerprints",
    "dedup_simhash_hamming_pairs", "scalar_date_suite",
    "scalar_json_extract", "scalar_string_suite",
    "setops_customer_cohorts", "sort_global_top10_orders",
    "text_fingerprints", "text_language_id", "text_quality_score",
    "text_token_stats", "ts_session_windows", "ts_sliding_10m_5m",
    "ts_tumbling_hourly",
)


def _ordered(names: list[str]) -> list[str]:
    known = [n for n in _CHECK_PRIORITY if n in names]
    new = [n for n in names if n not in _CHECK_PRIORITY]
    return new + known


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: catalog.QUERIES[name] for name in _ordered(list(catalog.QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query."""
    order = _ordered(list(catalog.QUERIES))
    return {n: catalog.ORACLE_SQL[n] for n in order if n in catalog.ORACLE_SQL}
