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
# in dict order.  With 220 catalog queries we order by certification need.
# As of round 8 the order is DERIVED, not hand-curated: certification debt
# hit zero in round 7 (every oracle-paired query driver-certified at least
# once), so ``tools/cert_rotation.py`` reads the CORRECTNESS_r*.json
# history and emits group 0 as (queries whose code changed this round,
# passed via --changed) + (oldest driver certification first, ties by
# name); group 2 is the rest of the oracle-paired catalog; group 3 is
# rows-only by design (no_oracle rows>0; golden tests pin semantics).
# Round-12 --changed set: dedup_contamination_report (single-scan
# rewrite — train digests ONCE, all three suite slivers probe in one
# tagged broadcast; 12 scans → 3, verdict r11 #1),
# profile_orders_columns (r12 probe guards: streaming frames skipped,
# partition probe only on exchange-free plans so AQE never eagerly
# executes upstream stages — ADVICE r11), and
# profile_orders_columns_approx (BRAND-NEW rows-only — the documented
# 100 TB profile mode, HLL distincts with no Expand; exact twin
# oracle-paired, agreement pinned by test), sim_hard_negatives
# (BRAND-NEW — contrastive hard-negative mining, the GEMM tier with a
# same-label mask fused into the per-batch top-k), and
# text_vocab_coverage (BRAND-NEW — minimal-vocab coverage curve via a
# frequency-histogram cumulative walk, all-integer arithmetic),
# sim_centroid_drift (BRAND-NEW — split-half class-centroid cosine,
# the embedding-drift monitor; 6-dp-anchored decimal folds), and
# quality_benford_first_digit (BRAND-NEW — first-significant-digit
# audit of money columns vs Python-embedded log10(1+1/d) literals;
# FLOOR→BIGINT→string head sidesteps the double→string and
# half-even-cast cross-engine hazards). The
# seven _ORACLE_COSINE_PAIRS consumers (sim_cosine_topk,
# sim_embedding_near_dup_pairs, sim_srp_near_dup_pairs, both
# pipeline_embedding_curation variants, sim_knn_label_vote,
# sim_matryoshka_prefix_rerank) follow because their shared oracle CTE
# gained the embedding IS NOT NULL filter (r12 hardening — mirrors the
# operators' null-drop; hash-identical on the null-free fixtures,
# re-certified at both SFs).  Later r12 waves: sim_centroid_drift was
# REWRITTEN single-scan (conditional aggregation, 4 scans → 1; review
# finding) plus a NULL-label filter and zero-norm guard on both sides;
# sim_label_centroids / sim_centroid_outlier_filter /
# quality_benford_first_digit re-enter because their rounding lambdas
# now delegate to the shared round_half_up contract;
# stats_mann_whitney_value_drift (BRAND-NEW — exact tie-corrected
# rank-sum drift, decimal/HUGEINT-widened sums),
# stats_gini_revenue_concentration (BRAND-NEW — per-segment revenue
# Gini over the customer dim), stats_spearman_value_trend (BRAND-NEW —
# monotonic-trend monitor over a single-scan count cube),
# dedup_soft_dedup_weights (BRAND-NEW — 1/cluster-size reweighting
# over the certified near-dup CC chain),
# quality_k_anonymity_customers (BRAND-NEW — QI equivalence-class
# privacy audit), dedup_cross_source_overlap (BRAND-NEW — inter-source
# 5-gram redundancy matrix; in-row pair generation from per-digest
# source sets, single scan runtime-pinned), and
# quality_mad_anomaly_events (BRAND-NEW — MAD robust-outlier census;
# two selection lower-medians over the count frame, one fact scan),
# and ts_acf_hourly_lags (BRAND-NEW — hourly-mean ACF at lags
# 1/6/12/24; anchored-decimal Pearson over one window pass).
_CHECK_PRIORITY: tuple[str, ...] = (
    # generated by: python tools/cert_rotation.py --changed sim_hard_negatives dedup_cluster_map_build dedup_duplicate_clusters_probe dedup_cluster_size_histogram_probe dedup_soft_dedup_weights_probe dedup_cluster_map_point_probe ts_ccf_click_purchase text_word_concentration stats_ab_welch_value ts_ingestion_staleness dedup_token_budget_by_source  # history through r12
    # -- group 0: this round's 50 driver checks (changed-this-round
    # first, then oldest driver certification first) ---------------
    "sim_hard_negatives", "dedup_cluster_map_build",
    "dedup_duplicate_clusters_probe", "dedup_cluster_size_histogram_probe",
    "dedup_soft_dedup_weights_probe", "dedup_cluster_map_point_probe",
    "ts_ccf_click_purchase", "text_word_concentration",
    "stats_ab_welch_value", "ts_ingestion_staleness",
    "dedup_token_budget_by_source", "dedup_exact_documents",
    "dedup_minhash_lsh_pairs", "dedup_ngram_jaccard_topk",
    "dedup_simhash_fingerprints", "dedup_simhash_hamming_pairs",
    "join_asof_last_error", "join_full_outer_user_activity",
    "join_interval_overlap_orders", "join_range_value_bands",
    "layout_zorder_cells", "multimodal_audio_energy",
    "multimodal_byte_histogram", "multimodal_frame_sample",
    "multimodal_metadata", "multimodal_resize_grid",
    "pipeline_corpus_curation", "sample_deterministic_documents",
    "sample_split_documents", "sample_stratified_events",
    "scalar_date_suite", "scalar_json_extract", "scalar_string_suite",
    "setops_customer_cohorts", "sketch_distinct_overlap_users_exact",
    "sketch_histogram_quantiles", "sort_global_top10_orders",
    "text_fingerprints", "text_language_id", "text_quality_score",
    "text_token_stats", "tpch_q11_important_stock",
    "tpch_q12_shipmode_priority", "tpch_q16_supplier_part_counts",
    "tpch_q20_potential_promotion", "tpch_q2_min_cost_supplier",
    "ts_gap_fill_hourly", "agg_cube_lineitem", "agg_grouping_sets_orders",
    "agg_pricing_summary",

    # -- group 2: oracle-paired, recently driver-certified ----------
    "agg_rollup_orders", "agg_salted_events_by_type",
    "analytics_copurchase_pairs", "analytics_event_transitions",
    "analytics_funnel_stages", "analytics_retention_cohorts",
    "cdc_orders_snapshot_diff", "dedup_first_event",
    "graph_pagerank_copurchase", "graph_triangle_participation",
    "join_anti_no_big_order", "join_asof_next_error",
    "join_semi_active_customers", "join_star_revenue",
    "quality_key_skew_events", "quality_metrics_lineitem",
    "quality_psi_value_drift", "reshape_pivot_event_types",
    "reshape_unpivot_measures", "scalar_math_suite", "scalar_variant_json",
    "scd2_user_value_history", "sketch_distinct_users_rollup_exact",
    "text_chunk_documents", "text_pii_redaction", "text_tfidf_top_terms",
    "text_vocabulary_top100", "topk_orders_per_customer",
    "tpch_q10_returned_items", "tpch_q3_unshipped_revenue",
    "tpch_q5_local_supplier_volume", "ts_anomaly_zscore",
    "ts_hierarchical_rollup_daily", "ts_session_windows",
    "ts_sliding_10m_5m", "ts_tumbling_hourly", "dedup_decontaminate_train",
    "dedup_edit_distance_pairs", "dedup_normalized_documents",
    "dedup_span_rewrite_documents", "dedup_split_leakage_audit",
    "graph_degree_distribution", "graph_jaccard_link_prediction",
    "multimodal_audio_dominant_lag", "multimodal_container_probe",
    "multimodal_decoded_avi_stats", "multimodal_decoded_bmp_stats",
    "multimodal_decoded_flac_stats", "multimodal_decoded_gif_stats",
    "multimodal_decoded_mp4_stats", "multimodal_decoded_ogg_stats",
    "multimodal_decoded_png_stats", "multimodal_decoded_ppm_stats",
    "pipeline_embedding_curation", "pipeline_embedding_curation_srp",
    "quality_table_checksum_orders", "sample_weighted_documents",
    "sim_cosine_topk", "sim_embedding_near_dup_pairs", "sim_knn_label_vote",
    "sim_matryoshka_prefix_rerank", "sim_quantize_int8_stats",
    "sim_quantized_cosine_topk", "sim_srp_near_dup_pairs",
    "sketch_sliding_distinct_users_exact", "sql_above_customer_avg_orders",
    "sql_correlated_exists_customers", "sql_cte_window_topn",
    "sql_in_subquery_supplier_nations", "sql_lateral_topk_orders",
    "sql_not_in_nullable_semantics", "sql_pivot_status_by_priority",
    "sql_recursive_month_spine", "sql_select_list_scalar_subqueries",
    "text_char_entropy", "window_cumulative_sum",
    "window_distribution_suite", "window_period_change",
    "window_rank_in_group", "window_rolling_avg", "agg_boolean_aggregates",
    "agg_collect_event_types", "agg_mode_orders_priority",
    "analytics_activity_streaks", "analytics_attribution_last_touch",
    "analytics_attribution_u_shaped", "analytics_cohort_ltv",
    "analytics_funnel_conversion_window",
    "analytics_interval_union_coverage", "analytics_pareto_orders",
    "analytics_rank_movers", "analytics_rfm_segmentation",
    "analytics_user_lifecycle", "cdc_incremental_agg_orders",
    "dedup_contamination_report", "dedup_semdedup_embeddings",
    "dedup_semdedup_incremental", "dedup_shared_span_pairs",
    "flagship_events_daily", "multimodal_decoded_wav_stats",
    "pipeline_curation_funnel_by_source", "pipeline_semantic_curation",
    "profile_orders_columns", "sample_dsir_importance",
    "stats_chi_square_events", "stats_equal_frequency_binning",
    "stats_group_confidence_intervals", "stats_ks_value_drift",
    "stats_regression_events", "stats_weighted_median_orders",
    "stats_winsorized_events", "text_corpus_bigrams",
    "text_duplicated_ngram_fraction", "text_gopher_quality_rules",
    "text_repetition_filters", "text_unigram_logprob",
    "tpch_q13_customer_distribution", "tpch_q14_promo_effect",
    "tpch_q15_top_supplier", "tpch_q17_small_quantity",
    "tpch_q18_large_volume_customer", "tpch_q19_discounted_revenue",
    "tpch_q21_suppliers_kept_waiting", "tpch_q22_global_sales_opportunity",
    "tpch_q4_priority_checking", "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_product_type_profit", "window_range_frame_events",
    "agg_case_bucketing", "agg_distinct_counts",
    "agg_having_frequent_customers", "agg_percentiles_lineitem",
    "dedup_cluster_size_histogram", "dedup_cross_source_overlap",
    "dedup_decontaminate_bloom", "dedup_duplicate_clusters",
    "dedup_soft_dedup_weights", "join_asof_tolerance_error",
    "join_point_in_time_scd2", "join_temporal_validity_intersection",
    "multimodal_shot_boundaries", "pipeline_media_curation",
    "pipeline_training_data_prep", "quality_benford_first_digit",
    "quality_cross_field_violations", "quality_k_anonymity_customers",
    "quality_mad_anomaly_events", "quality_referential_integrity",
    "reshape_denormalize_star", "reshape_union_schema_evolution",
    "sample_balanced_labels", "sample_corpus_mixture",
    "sample_stratified_split_embeddings", "scalar_array_suite",
    "scalar_bitwise_suite", "scalar_nested_suite", "scalar_try_suite",
    "scd2_apply_changes_incremental", "sim_centroid_drift",
    "sim_centroid_outlier_filter", "sim_label_centroids",
    "sketch_heavy_hitters_event_types", "stats_gini_revenue_concentration",
    "stats_mann_whitney_value_drift", "stats_spearman_value_trend",
    "text_bpe_encode_fixed_vocab", "text_pack_chunks_by_split",
    "text_vocab_coverage", "topk_orders_with_ties", "ts_acf_hourly_lags",
    "ts_changepoint_cusum", "ts_ewma_hourly_smoothing",
    "ts_interpolate_linear", "ts_seasonal_naive_backtest",
    "ts_session_windows_dynamic_gap", "window_rolling_autocorr",
    "window_share_of_total",

    # -- group 3: rows-only by design --------------------------------
    "multimodal_video_shot_boundaries", "pipeline_video_curation",
    "profile_orders_columns_approx", "sim_ivf_pq_residual_recall",
    "sim_ivf_pq_topk", "sim_ivf_topk", "sim_pq_adc_topk_recall",
    "sim_srp_lsh_recall", "sketch_distinct_overlap_users",
    "sketch_distinct_users_rollup", "sketch_sliding_distinct_users",
    "text_bpe_merges", "text_compression_ratio_filter",
    "ts_downsample_lttb",
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
