"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``aiven_challenge2_cdc_sharing_spark``; this file
just exposes its query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aiven_challenge2_cdc_sharing_spark.queries import load_registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the full CDC slice — deterministic
    Debezium-envelope log -> unwrap -> last-writer-wins snapshot ->
    count-by-classification (the reference's headline dashboard)."""
    registry = load_registry()
    fn = _with_worker_imports(registry["cdc_count_by_classification"].fn)
    return fn(spark, SMOKE_SF_DIR)


# The driver verifies registry queries in dict order and caps the per-round
# CORRECTNESS run at 50 entries, so positions 1-50 are the round-6 window:
# the 17 round-5 third-wave holdovers the round-5 verdict ordered into
# positions 1-17, then the 30 round-6 additions (registry order), then
# three INTENTIONAL re-checks of queries whose semantics or oracle
# changed this round — geo_haversine_nearest (6dp rounding now applied
# before the argmin on both engines), dedup_edit_distance_pairs (oracle
# deletion positions now derived from token length via LATERAL instead
# of a fixed 1..40 ceiling), and dq_referential_orphans (oracle moved
# from NOT IN to NOT EXISTS so a NULL foreign key counts as an orphan
# on both sides) — their old green rows no longer attest the shipping
# code.  Positions 51+ are already-green queries, oldest-checked first
# (regression rotation; they spill to round 7).  Every name in 1-50
# passed the local 3-scale oracle gate (tools/oracle_check.py at
# sf0.001/0.01/0.1) before queuing.
DRIVER_PRIORITY: list[str] = [
    "ab_wilson_intervals",
    "agg_weighted_percentiles",
    "dash_hour_dow_heatmap",
    "fn_xml_roundtrip",
    "graph_label_propagation",
    "join_event_self_interval",
    "ml_knn_classify",
    "ml_neyman_allocation",
    "ml_target_encoding",
    "prep_one_hot_encode",
    "privacy_t_closeness",
    "ts_decompose_residuals",
    "ts_dominant_period",
    "ts_resample_linear",
    "udaf_source_stats_arrow",
    "udf_arrow_map_doc_stats",
    "win_cumulative_distinct_users",
    "ml_knn_classify_ann",
    "geo_cell_nearest",
    "agg_bitmap_distinct_users",
    "agg_mutual_information",
    "dash_dau_mau_stickiness",
    "graph_degree_histogram",
    "stats_theil_sen_slope",
    "stats_mann_kendall_trend",
    "stats_spearman_by_returnflag",
    "stats_kendall_tau_binned",
    "stats_anova_oneway",
    "stats_bootstrap_ci_mean",
    "ml_psi_score_drift",
    "ml_eval_precision_at_k",
    "ml_reservoir_sample_det",
    "dq_drift_early_late",
    "dq_spc_p_chart",
    "prep_robust_scale",
    "funnel_attribution_first_last",
    "privacy_dp_laplace_counts",
    "er_levenshtein_blocked_pairs",
    "emb_density_core_points",
    "search_bm25f_multifield",
    "join_interval_allen_counts",
    "graph_bfs_levels",
    "fn_regexp_suite",
    "win_rolling_zscore_7d",
    "agg_hhi_by_nation",
    "agg_geo_harmonic_means",
    "stats_runs_test",
    "geo_haversine_nearest",
    "dedup_edit_distance_pairs",
    "dq_referential_orphans",
    # -- round-7 queue (never-checked; next rotation pulls them into
    # -- the window) --
    "stats_levene_test",
    "stats_cohens_d_effect",
    "stats_poisson_rate_test",
    "graph_clustering_coefficient",
    "graph_degree_assortativity",
    "ml_ridge_normal_eq",
    "ml_confusion_logreg",
    "ml_lift_by_score_band",
    "dash_new_vs_returning",
    "emb_centroid_shift_drift",
    "dq_duplicate_key_audit",
    "agg_skew_kurtosis_moments",
    "ml_systematic_sample",
    "text_char_entropy_per_source",
    "text_langid_confusion",
    "text_heaps_law_fit",
    "dash_session_duration_hist",
    "dash_bounce_rate",
    "funnel_signup_purchase_latency",
    "agg_abc_classification",
    "agg_lorenz_curve_points",
    "stats_simpsons_paradox",
    "privacy_generalization_bands",
    "emb_cosine_to_centroid_hist",
    "ml_learning_curve",
    "ml_class_weights",
    "dq_freshness_lag",
    "agg_skyline_pareto_2d",
    "ml_woe_binning",
    "emb_norm_profile",
    "dq_spc_c_chart",
    "text_js_divergence_sources",
    "stats_cramers_v_pairs",
    "ts_changepoint_binary_seg",
    "agg_theil_index_decomposition",
    "win_interorder_gap_stats",
    "ml_feature_drift_ks_per_dim",
    "text_type_coverage_budget",
    "stats_welch_t_test",
    "dash_days_to_nth_order",
    "graph_bipartite_ochiai_weights",
    "ts_dow_seasonality_strength",
    "ml_negative_sampling_table",
    "emb_inter_intra_separability",
    "cdc_change_data_stats",
    "win_time_to_next_purchase",
    "agg_histogram_log_bins",
    "agg_pricing_summary",
    "agg_rollup_region_nation",
    "agg_cube_status_priority",
    "agg_grouping_sets",
    "agg_having_top_spenders",
    "agg_median_quantile",
    "agg_stddev_variance",
    "cdc_snapshot",
    "cdc_count_by_classification",
    "cdc_new_customers_over_time",
    "cdc_recent_customers",
    "cdc_wire_roundtrip",
    "cdc_snapshot_at",
    "sort_global_orders",
    "agg_rollup_grouping_flags",
    "win_percent_rank_cume",
    "fn_array_split_ops",
    "cdc_merge_incremental",
    "win_session_windows",
    "text_doc_stats",
    "text_quality_scores",
    "text_top_tokens",
    "text_fingerprints",
    "text_lang_distribution",
    "text_redact_pii",
    "text_char_trigrams",
    "dedup_exact_fingerprint",
    "dedup_distinct_doc_count",
    "dedup_minhash_md5_signatures",
    "dash_count_by_segment",
    "dash_orders_per_month",
    "dash_recent_orders",
    "dash_events_per_hour_by_type",
    "agg_bool_countif",
    "agg_quartiles",
    "fn_datediff_suite",
    "fn_string_extras",
    "dash_orders_per_month_dense",
    "join_orders_customer_inner",
    "join_customer_orders_left",
    "join_full_outer_nations",
    "join_broadcast_region_rollup",
    "join_semi_active_customers",
    "join_anti_dormant_customers",
    "join_range_value_bands",
    "join_asof_purchase_view",
    "join_stream_static_enrich",
    "agg_stats_moments",
    "sort_global_ordinal_scalable",
    "layout_zorder_orders",
    "fn_unpivot_order_measures",
    "dedup_minhash_md5_pairs",
    "dedup_cluster_resolution",
    "dedup_embedding_cosine",
    "dedup_simhash_md5_pairs",
    "text_chunk_documents",
    "sim_cosine_topk",
    "dash_events_sliding_2h",
    "join_orders_customer_right",
    "ml_split_train_eval",
    "ml_mixture_sample",
    "ml_pack_sequences",
    "ml_decontaminate_eval",
    "fn_string_suite",
    "fn_datetime_suite",
    "fn_math_suite",
    "fn_json_suite",
    "fn_conditional_suite",
    "fn_map_suite",
    "fn_array_suite",
    "set_union_all_names",
    "set_union_distinct_nationkeys",
    "set_intersect_nationkeys",
    "set_except_nationkeys",
    "set_except_all_multiset",
    "set_intersect_all_multiset",
    "cdc_scd2_history",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "sim_cosine_topk_pandas",
    "udaf_label_norm_mean",
    "mm_decode_png_features",
    "win_rank_orders_by_price",
    "win_ntile_quartiles",
    "win_lag_lead_user_events",
    "win_running_total",
    "win_moving_sum",
    "win_range_frame_sum",
    "win_latest_event_per_user",
    "win_top3_orders_per_segment",
    "win_value_functions",
    "agg_listagg_nations",
    "user_behavior_entropy",
    "agg_pivot_status_by_segment",
    "agg_approx_percentile_band",
    "text_winnow_fingerprints",
    "text_token_budget_by_source",
    "sim_cosine_topk_lsh",
    "sim_cosine_topk_ivf",
    "text_heavy_hitter_tokens",
    "text_dup_ngram_spans",
    "text_perplexity_filter",
    "dedup_parent_chain_depth",
    "text_url_canonicalize",
    "dash_week_over_week_movers",
    "dash_rolling_7d_active_users",
    "dash_event_transitions",
    "src_csv_ingest_nation",
    "src_jsonl_ingest_orders",
    "src_orc_ingest_part",
    "dq_assertions_orders",
    "emb_standardize_dims",
    "ml_cluster_safe_split",
    "emb_quantize_int8",
    "ml_domain_reweight",
    "search_fuzzy_match",
    "fn_variant_roundtrip",
    "ts_user_profile_similarity",
    "ts_anomaly_daily_values",
    "tpch_q6_forecast_revenue",
    "tpch_q2_min_cost_supplier",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_parts",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q18_large_orders",
    "tpch_q20_promotion_suppliers",
    "tpch_q12_shipmode_priority",
    "tpch_q14_promo_revenue",
    "agg_decimal_money_sums",
    "tpch_q10_returned_items",
    "tpch_q4_order_priority",
    "tpch_q19_bracket_revenue",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q7_nation_volume",
    "sim_label_centroids",
    "mm_decode_features",
    "mm_frame_sample",
    "udtf_sentence_stats",
    "agg_stats_by_segment",
    "agg_approx_count_distinct",
    "funnel_view_purchase",
    "cohort_weekly_retention",
    "agg_value_histogram",
    "cdc_kafka_wire_decode",
    "agg_salted_event_counts",
    "win_percent_rank_scalable",
    "ml_stratified_sample_det",
    "text_bigram_pmi",
    "privacy_k_anonymity",
    "join_null_safe_eq",
    "text_bpe_token_counts",
    "text_lang_id_stopword",
    "dedup_minhash_near_pairs",
    "dedup_simhash_signatures",
    "text_bpe_train_merges",
    "text_bpe_encode_compression",
    "dedup_semantic_pairs",
    "search_hybrid_rrf",
    "agg_hll_sketch_partial_merge",
    "ml_feature_hashing",
    "cdc_snapshot_diff",
    "text_gopher_quality_filter",
    "dedup_incremental_near",
    "emb_pca_top_component",
    "emb_random_projection",
    "ml_weighted_sample_es",
    "mm_decode_wav_features",
    "ml_eval_auc_prf",
    "ml_eval_calibration_bins",
    "dash_sliding_distinct_hll",
    "text_pipeline_e2e",
    "join_lateral_top2_orders",
    "fn_try_suite",
    "dash_top_event_paths",
    "agg_regr_value_by_hour",
    "agg_bitwise_flags",
    "dash_value_percentiles_daily",
    "join_range_binned_scale",
    "dedup_incremental_batch",
    "profile_orders_columns",
    "text_repetition_ratio",
    "dedup_jaccard_threshold_pairs",
    "dedup_containment_pairs",
    "search_bm25_ranking",
    "text_tfidf_top_terms",
    "ts_gapfill_locf",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_global_sales_opportunity",
    "text_bpe_train_merges_batched",
    "cep_purchase_within_hour",
    "agg_count_min_probe",
    "agg_equidepth_histogram",
    "graph_pagerank_suppliers",
    "ml_score_logreg",
    "dash_peak_concurrency",
    "basket_copurchase_pairs",
    "sim_sparse_tfidf_pairs",
    "ts_outliers_mad",
    "cep_regex_journey_patterns",
    "ts_cusum_drift",
    "ab_test_conversion",
    "agg_corr_matrix_lineitem",
    "prep_winsorize_values",
    "agg_equidepth_histogram_scalable",
    "dash_peak_concurrency_scalable",
    "stats_ks_two_sample",
    "stats_chi_square_independence",
    "stats_benford_first_digit",
    "agg_mode_per_group",
    "ts_ewma_smooth",
    "ts_autocorr_lags",
    "ts_rolling_median_7d",
    "win_gaps_islands_streaks",
    "ml_kfold_assign",
    "ml_linreg_normal_eq",
    "ml_naive_bayes_score",
    "text_zipf_fit",
    "text_ttr_lexical_diversity",
    "graph_triangle_count_trade",
    "graph_common_neighbors",
    "join_bloom_prefilter",
    "search_phrase_match",
    "text_rake_keywords",
    "ts_holt_linear",
    "stats_mann_whitney_u",
    "agg_weighted_median",
    "ml_decision_stump",
    "ts_seasonal_dow_profile",
    "privacy_l_diversity",
    "win_pareto_80_20",
    "emb_dim_truncation_recall",
    "ml_feature_target_corr",
    "dq_column_entropy_profile",
    "agg_gini_revenue_concentration",
    "graph_k_core_trade",
]


def _ordered():
    registry = load_registry()
    prio = [n for n in DRIVER_PRIORITY if n in registry]
    rest = [n for n in registry if n not in set(prio)]
    return [(n, registry[n]) for n in prio + rest]


def _with_worker_imports(fn):
    """The driver runs these with ITS OWN SparkSession, possibly built
    from a cwd where this package isn't importable by name — which
    breaks the pandas-UDF queries, whose module-level functions pickle
    by reference and must be re-imported inside the Python workers.
    Ship the package to workers (addPyFile, idempotent) before the
    first query runs on any given session."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from aiven_challenge2_cdc_sharing_spark.session import (
            ensure_workers_can_import,
        )

        ensure_workers_can_import(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _with_worker_imports(q.fn) for name, q in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return {name: q.oracle for name, q in _ordered() if q.oracle is not None}
