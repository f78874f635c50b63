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
# in dict order.  With 197 catalog queries we order by certification need.
# Round-7 order (history: CORRECTNESS_r01..r06.json; the round-6 verdict
# mandated rotating the 41-query group-1 queue to the front to END the
# certification debt):
#   group 0 (exactly 50) — this round's driver checks:
#     * text_bpe_encode_fixed_vocab — NEW this round (the tokenizer's
#       hot encode path, oracle-paired per round-6 verdict item 5);
#     * the 41 never-driver-certified oracle-paired queries (round-6
#       group 1, queued verbatim) — certifying them ends the debt:
#       every oracle-paired catalog query will have been checked by the
#       driver's own gate at least once;
#     * 8 more slots: re-certifications whose prior cert round-7 code
#       changes void — the two packing flagships (NULL-safe offsets
#       join rewrite) and the two decoded-media queries downstream of
#       the JPEG geometry fixes — plus the flagship, the
#       duplicated-ngram r6 perf rewrite, and the TWO new round-7
#       oracle-paired queries (Bloom-prefilter decontamination,
#       cross-doc shared spans), which took the slack re-cert slots
#       (sim_matryoshka_prefix_rerank and multimodal_decoded_wav_stats
#       — both r6-certified on code round 7 does not touch — returned
#       to group 2 to make room).
#   group 2 — driver-certified in r1-r6 on code this round leaves
#     byte-identical (the full catalog is also locally re-certified in
#     driver-faithful --pandas-oracle mode each round; see COVERAGE.md).
#   group 3 — rows-only by design (no_oracle rows>0; golden tests pin
#     semantics).
_CHECK_PRIORITY: tuple[str, ...] = (
    # -- group 0: round-7 driver checks (50) ------------------------------
    "text_bpe_encode_fixed_vocab", "cdc_incremental_agg_orders",
    "scalar_array_suite", "scalar_nested_suite", "scalar_try_suite",
    "agg_mode_orders_priority", "join_point_in_time_scd2",
    "window_share_of_total", "analytics_funnel_conversion_window",
    "scalar_bitwise_suite", "analytics_pareto_orders",
    "analytics_attribution_last_touch", "agg_collect_event_types",
    "reshape_union_schema_evolution", "quality_referential_integrity",
    "analytics_attribution_u_shaped", "analytics_activity_streaks",
    "join_asof_tolerance_error", "scd2_apply_changes_incremental",
    "analytics_rfm_segmentation", "analytics_cohort_ltv",
    "quality_cross_field_violations", "analytics_user_lifecycle",
    "reshape_denormalize_star", "topk_orders_with_ties",
    "join_temporal_validity_intersection", "analytics_rank_movers",
    "analytics_interval_union_coverage", "agg_boolean_aggregates",
    "text_repetition_filters", "text_corpus_bigrams", "sample_corpus_mixture",
    "sample_stratified_split_embeddings", "sample_balanced_labels",
    "sketch_heavy_hitters_event_types", "ts_session_windows_dynamic_gap",
    "ts_seasonal_naive_backtest", "ts_ewma_hourly_smoothing",
    "ts_interpolate_linear", "window_rolling_autocorr",
    "ts_changepoint_cusum", "multimodal_container_probe",
    "text_pack_chunks_by_split", "pipeline_training_data_prep",
    "pipeline_media_curation", "multimodal_shot_boundaries",
    "dedup_decontaminate_bloom", "flagship_events_daily",
    "dedup_shared_span_pairs", "text_duplicated_ngram_fraction",

    # -- group 2: driver-certified r1-r6, code byte-identical -------------
    "sql_cte_window_topn", "window_range_frame_events",
    "quality_table_checksum_orders", "stats_ks_value_drift",
    "sql_not_in_nullable_semantics", "sql_correlated_exists_customers",
    "sql_above_customer_avg_orders", "sql_in_subquery_supplier_nations",
    "sql_lateral_topk_orders", "sql_recursive_month_spine",
    "sql_pivot_status_by_priority", "sql_select_list_scalar_subqueries",
    "tpch_q4_priority_checking", "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_product_type_profit", "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect", "tpch_q15_top_supplier",
    "tpch_q17_small_quantity", "tpch_q18_large_volume_customer",
    "tpch_q19_discounted_revenue", "tpch_q21_suppliers_kept_waiting",
    "tpch_q22_global_sales_opportunity", "stats_weighted_median_orders",
    "stats_chi_square_events", "stats_group_confidence_intervals",
    "stats_winsorized_events", "stats_regression_events",
    "stats_equal_frequency_binning", "dedup_decontaminate_train",
    "dedup_normalized_documents", "dedup_split_leakage_audit",
    "dedup_edit_distance_pairs", "sim_quantized_cosine_topk",
    "sim_quantize_int8_stats", "sim_knn_label_vote", "sim_label_centroids",
    "sim_centroid_outlier_filter", "graph_jaccard_link_prediction",
    "graph_degree_distribution", "multimodal_audio_dominant_lag",
    "text_gopher_quality_rules", "window_period_change",
    "window_rank_in_group", "window_rolling_avg", "window_cumulative_sum",
    "reshape_unpivot_measures", "reshape_pivot_event_types",
    "dedup_first_event", "topk_orders_per_customer", "join_star_revenue",
    "join_semi_active_customers", "join_anti_no_big_order",
    "agg_pricing_summary", "quality_metrics_lineitem",
    "profile_orders_columns", "quality_psi_value_drift",
    "quality_key_skew_events", "agg_rollup_orders", "agg_cube_lineitem",
    "agg_grouping_sets_orders", "setops_customer_cohorts",
    "scalar_string_suite", "scalar_date_suite", "scalar_json_extract",
    "join_range_value_bands", "join_interval_overlap_orders",
    "join_full_outer_user_activity", "sort_global_top10_orders",
    "agg_having_frequent_customers", "agg_case_bucketing",
    "agg_distinct_counts", "join_asof_last_error", "agg_percentiles_lineitem",
    "window_distribution_suite", "scalar_math_suite",
    "agg_salted_events_by_type", "analytics_funnel_stages",
    "analytics_retention_cohorts", "join_asof_next_error",
    "scalar_variant_json", "scd2_user_value_history", "layout_zorder_cells",
    "cdc_orders_snapshot_diff", "analytics_copurchase_pairs",
    "analytics_event_transitions", "text_token_stats", "text_quality_score",
    "text_language_id", "text_vocabulary_top100", "text_tfidf_top_terms",
    "text_fingerprints", "text_chunk_documents", "text_pii_redaction",
    "dedup_minhash_lsh_pairs", "dedup_simhash_fingerprints",
    "dedup_simhash_hamming_pairs", "dedup_ngram_jaccard_topk",
    "dedup_exact_documents", "dedup_duplicate_clusters",
    "dedup_cluster_size_histogram", "sim_cosine_topk", "sim_matryoshka_prefix_rerank",
    "sim_embedding_near_dup_pairs", "sim_srp_near_dup_pairs",
    "pipeline_embedding_curation", "pipeline_embedding_curation_srp",
    "multimodal_metadata", "multimodal_byte_histogram",
    "multimodal_frame_sample", "multimodal_resize_grid",
    "multimodal_audio_energy", "multimodal_decoded_wav_stats",
    "multimodal_decoded_ppm_stats",
    "pipeline_corpus_curation", "sample_split_documents",
    "sample_deterministic_documents", "sample_stratified_events",
    "ts_tumbling_hourly", "ts_sliding_10m_5m", "ts_session_windows",
    "ts_hierarchical_rollup_daily", "sketch_histogram_quantiles",
    "ts_gap_fill_hourly", "ts_anomaly_zscore", "tpch_q3_unshipped_revenue",
    "tpch_q5_local_supplier_volume", "tpch_q10_returned_items",
    "graph_pagerank_copurchase", "graph_triangle_participation",

    # -- group 3: rows-only by design --------------------------------------
    "text_char_entropy", "text_unigram_logprob", "sim_srp_lsh_recall",
    "sim_ivf_topk", "sim_pq_adc_topk_recall", "sim_ivf_pq_topk",
    "sim_ivf_pq_residual_recall", "sample_weighted_documents",
    "sketch_distinct_users_rollup", "sketch_sliding_distinct_users",
    "sketch_distinct_overlap_users", "ts_downsample_lttb",
    "text_compression_ratio_filter", "multimodal_video_shot_boundaries",
    "text_bpe_merges",
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
