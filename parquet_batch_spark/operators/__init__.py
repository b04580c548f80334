"""Operator registry.

Each operator module exposes two dicts:

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLES: dict[str, str]``  (DuckDB ANSI-SQL equivalents; a query
  with no oracle entry gets the driver's weaker rows-only check)

``all_queries()`` / ``all_oracles()`` aggregate every module for the
driver contract in ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

# Registry emission order.  The correctness driver hard-checks only the
# first ~50 registry entries per round, so ordering is coverage policy.
#
# ROTATION LEDGER (update every round; goal: every entry re-verified at
# least every third round):
#   r1 window: the first 50 in module order — scans/sources/relational/
#     joins/tpch + window_distribution.  48 green; source_json_roundtrip
#     + tpch_q12 hash-failed (Arrow int-width oracle casts).
#   r2 window: the 48 r1-unchecked (windows, analytics, scalar funcs,
#     UDFs, text, dedup, similarity, multimodal, streaming) + the two
#     repaired r1 fails.  46 green; 4 ERRs (2 array-column outputs,
#     2 no-oracle rows-only) — all four repaired in r3.
#   r3 window: 27 never-checked r2-new + 4 repaired ERRs + 19 stalest
#     r1 greens (scans/sources/sinks/joins/q1/agg_distinct).  49 green;
#     ann_ivf_topk no_oracle (rows-only then — oracle added in r4).
#   r4 window: slots 1-45 = the 45 continuation-session ops, 46 =
#     join_interval_bucketed, 47 = ann_ivf_topk (first hash check),
#     48-50 = mapInArrow/hll_union/scan_files_metadata.  50/50 green.
#   r5 window (this ordering): slots 1-9 = the ops CHANGED this round
#     (3 int64 second-moment overflow fixes, 2 oracle-portability
#     fixes, 4 dedup ops touched by the absolute shingle cap / shared
#     intersection pass / CC rewrite), slots 10-50 = 41 never-checked
#     stats_ops entries.  45 of 50 slots are stats_ops (VERDICT r4 #1).
#   r6 plan: the remaining 22 never-checked stats_ops, then the 13
#     r5-NEW ops (dedup_exact_substring ... source_xml_roundtrip, each
#     locally dual-SF swept), then the 69 never-checked entries from
#     the other modules in module order (llm_prep, relational,
#     scalar_funcs, windows, joins, sources_ext, dedup, analytics,
#     multimodal, text, warehouse, streaming...).
#   r7+: driver-checked entries, stalest round first (r1 block leads).
_PRIORITY = [
    # --- r5-CHANGED ops (re-verify first): the three int64 second-moment
    #     overflow fixes + the two oracle-portability fixes (ADVICE r4),
    #     and the dedup family touched by the absolute shingle-df cap,
    #     the shared jaccard/containment intersection pass, and the
    #     large-star/small-star connected-components rewrite ---
    "agg_xyz_classification",
    "agg_fano_dispersion",
    "embedding_norm_outliers",
    "quality_schema_contract",
    "func_base64_transport",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_lsh_recall_eval",
    "dedup_clusters",
    # --- never-driver-checked, stats_ops first (63 of the 67 stats/ML
    #     entries that have zero driver rows across r1-r4; the other 4
    #     are in the CHANGED block above).  Slots 1-50 = 9 changed +
    #     41 of these => 45 stats_ops driver rows this round ---
    "agg_regression_per_group",
    "text_zipf_fit",
    "window_rolling_corr",
    "quality_psi_drift",
    "agg_entropy_balance",
    "seq_transition_matrix",
    "quality_ks_drift",
    "agg_survival_km",
    "window_acf_lags",
    "quality_freshness_sla",
    "window_peak_concurrency",
    "agg_touch_attribution",
    "agg_rfm_segmentation",
    "window_order_gap_distribution",
    "text_ngram_coverage_curve",
    "sample_importance_weights",
    "embedding_pca_power_iteration",
    "agg_seasonality_index",
    "agg_weekday_hour_heatmap",
    "agg_price_elasticity",
    "window_rsi_momentum",
    "etl_surrogate_keys",
    "agg_growth_cmgr",
    "text_readability_scores",
    "seq_event_paths",
    "agg_dau_mau_stickiness",
    "quality_duplicate_token_share",
    "text_code_detection",
    "sample_time_split_leakage",
    "agg_welch_ttest",
    "sample_kfold_assignment",
    "func_edit_distance",
    "sort_nulls_placement",
    "agg_smoothed_group_means",
    "agg_anova_oneway",
    "agg_conversion_wilson_ci",
    "agg_power_mde",
    "window_ship_latency_histogram",
    "agg_diff_in_diff",
    "text_js_divergence",
    "agg_mann_whitney_u",
    "window_runs_test",
    "agg_split_gain_gini",
    "text_char_entropy",
    "window_bounce_rate",
    "approx_hll_precision_sweep",
    "quality_cross_field_consistency",
    "ml_rule_eval_f1",
    "agg_lognormal_fit",
    "rollup_iso_week",
    "window_realized_volatility",
    "agg_kendall_tau",
    "window_seasonal_decompose",
    "agg_spearman_rho",
    "agg_hist2d_joint",
    "agg_cohort_ltv_curve",
    "window_cusum_changepoint",
    "agg_pivot_multi",
    "sample_ab_assignment_srm",
    "agg_chi_square_independence",
    "ml_ols_multivar",
    "text_pmi_cooccurrence",
    "sample_bootstrap_means",
    # --- r5-NEW operators (never checked; in the r6 window behind the
    #     stats spill): ExactSubstr-style duplicated-span detection,
    #     SemDeDup semantic dedup over the IVF cells, ANN recall
    #     acceptance gate, model-based quality-filter inference,
    #     per-source epoch/mixture plan — each dual-SF swept locally ---
    "dedup_exact_substring",
    "dedup_semantic_cluster",
    "ann_recall_eval",
    "quality_model_score",
    "sample_epoch_plan",
    "multimodal_audio_energy",
    "embedding_matryoshka_eval",
    "multimodal_video_frame_diff",
    "sample_coreset_kcenter",
    "sql_pipe_syntax",
    "sql_session_variables",
    "udf_apply_in_arrow",
    "source_xml_roundtrip",
    "decontam_bloom_filter",
    "dedup_cdc_chunking",
    "text_dsir_importance",
    "ann_pq_adc",
    "sql_udf_create_function",
    "text_watermark_greenlist",
    "privacy_k_anonymity",
    "ann_ivfpq_topk",
    "quality_perplexity_buckets",
    "sample_weighted_without_replacement",
    "graph_adamic_adar",
    "rollup_downsample_ltob",
    "text_kneser_ney_score",
    "multimodal_webdataset_index",
    "graph_kcore",
    "privacy_l_diversity",
    "text_tokenizer_fertility",
    "multimodal_aspect_bucket",
    "text_lexical_diversity",
    "etl_time_travel",
    "agg_hodges_lehmann",
    "graph_neighborhood_jaccard",
    "multimodal_caption_alignment",
    "scan_rowgroup_stats",
    "privacy_randomized_response",
    "sample_pps_systematic",
    "udf_pandas_scalar_iter",
    "streaming_update_mode_counts",
    # --- never-driver-checked, remaining modules in module order
    #     (llm_prep, relational, scalar_funcs, windows, joins,
    #     sources_ext, dedup, analytics, multimodal, text, warehouse,
    #     streaming, ...).  These lead the r6 window ---
    "scan_observed_metrics",
    "source_jsonl_corrupt_tolerant",
    "sink_retention_prune",
    "source_multiformat_union",
    "source_python_datasource",
    "sink_dynamic_partition_overwrite",
    "scan_ignore_corrupt",
    "sink_compression_codecs",
    "agg_basket_pairs",
    "agg_abc_classification",
    "agg_new_vs_returning",
    "agg_boolean",
    "agg_minmax_by",
    "stat_crosstab",
    "reshape_transpose",
    "explode_outer_semantics",
    "agg_filtered",
    "agg_listagg_sorted",
    "join_null_aware_anti",
    "join_point_in_time_scd2",
    "join_nearest_price",
    "join_lateral_topk",
    "join_null_safe",
    "join_asof_tolerance",
    "join_bloom_prefilter",
    "window_bollinger_breaches",
    "window_streak_islands",
    "window_nth_value",
    "window_percent_change",
    "window_running_distinct",
    "window_rolling_median",
    "agg_benford_profile",
    "explode_positional_tokens",
    "agg_moments_exact",
    "func_csv_struct",
    "sql_named_params",
    "func_struct_field_ops",
    "func_regexp",
    "func_collation",
    "func_try_arith",
    "func_url",
    "func_bitwise",
    "udf_arrow_scalar",
    "text_vocab_growth",
    "quality_langid_confusion",
    "text_bigram_surprisal",
    "dedup_cluster_representative",
    "embedding_kmeans_rollup",
    "multimodal_content_sniff",
    "multimodal_payload_chunks",
    "multimodal_dedup_phash",
    "sample_reservoir_per_group",
    "seq_shard_manifest",
    "sample_balanced_labels",
    "sample_temperature_mixture",
    "graph_degree_histogram",
    "seq_pack_chunks",
    "sample_mix_domains",
    "dedup_paragraph",
    "dedup_incremental_novelty",
    "embedding_quantize_int8",
    "text_rarity_score",
    "window_ewma_decay",
    "curation_pipeline_funnel",
    "etl_snapshot_diff",
    "etl_cdc_apply",
    "dedup_cross_source_matrix",
    "streaming_windowed_topk",
    "streaming_python_source",
    # --- driver-checked entries, stalest round first (r1 -> r4), each
    #     in module order within its round.  Tail of the rotation ---
    "reshape_unpivot",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_pivot",
    "agg_stats",
    "sort_topk",
    "set_ops",
    "tpch_q3",
    "tpch_q5",
    "tpch_q10",
    "tpch_q18",
    "tpch_q2",
    "tpch_q11",
    "tpch_q20",
    "tpch_q21",
    "tpch_q4",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q19",
    "tpch_q22",
    "window_distribution",
    "source_json_roundtrip",
    "tpch_q12",
    "window_range_interval",
    "window_topk_per_group",
    "window_ranks",
    "window_running_sum",
    "window_lag_lead",
    "window_sessionize",
    "agg_percentiles",
    "agg_histogram",
    "agg_corr_exact",
    "sample_systematic",
    "explode_word_counts",
    "func_json_struct",
    "func_string",
    "func_date",
    "func_math",
    "func_json",
    "func_array",
    "func_conditional",
    "udtf_bigram_topk",
    "udaf_pandas_exact_sum",
    "apply_in_pandas_profile",
    "text_token_count",
    "text_stats",
    "text_langid",
    "text_fingerprint",
    "text_corpus_rollup",
    "dedup_fuzzy_levenshtein",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_bruteforce_topk",
    "ann_lsh_bucketed",
    "multimodal_metadata",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "streaming_stream_stream_join",
    "streaming_static_join",
    "streaming_tumbling_window",
    "streaming_sliding_window",
    "streaming_session_window",
    "streaming_stateful_user_stats",
    "scan_projection",
    "scan_count",
    "scan_multifile",
    "filter_pushdown",
    "filter_null_semantics",
    "etl_merge_upsert",
    "join_dpp_prune",
    "sink_compact_small_files",
    "source_schema_evolution",
    "source_csv_roundtrip",
    "source_orc_roundtrip",
    "sink_partitioned_prune",
    "q1_pricing_summary",
    "agg_mode_per_group",
    "agg_distinct",
    "join_bucketed_colocate",
    "join_skew_salted",
    "join_broadcast_dims",
    "join_fact_fact",
    "join_outer",
    "join_semi_anti",
    "join_range",
    "join_asof",
    "join_cross_small",
    "window_anomaly_zscore",
    "window_gap_fill",
    "approx_percentile_sketch",
    "rollup_hypertable",
    "approx_heavy_hitters_cms",
    "approx_distinct_sketch",
    "func_variant",
    "func_map",
    "text_tfidf_topk",
    "text_chunk_windows",
    "graph_pagerank",
    "multimodal_resize",
    "pii_detect",
    "decontam_ngram_overlap",
    "sample_stratified",
    "sample_train_val_test",
    "quality_repetition",
    "window_funnel",
    "window_retention_cohort",
    "quality_expectations",
    "etl_scd2",
    "sink_zorder_cluster",
    "table_stats_profile",
    "streaming_foreach_batch_merge",
    "streaming_dedup_watermark",
    "sink_selective_compaction",
    "source_csv_quoted_multiline",
    "source_binaryfile_ingest",
    "scan_files_metadata",
    "agg_period_overlap",
    "agg_pct_of_parent",
    "set_ops_multiset",
    "sql_recursive_hierarchy",
    "join_spatial_grid_radius",
    "join_interval_bucketed",
    "window_local_extrema",
    "window_seasonal_baseline",
    "window_rank_shift",
    "window_max_drawdown",
    "window_time_weighted_avg",
    "window_linear_interpolate",
    "window_interval_coalesce",
    "agg_vwap",
    "window_winsorize",
    "agg_decile_report",
    "agg_pareto_frontier",
    "rollup_ohlc_bars",
    "quality_mad_outliers",
    "agg_weighted_median",
    "approx_hll_union_sketch",
    "func_crypto_roundtrip",
    "udtf_dynamic_schema",
    "udf_map_in_arrow",
    "text_overlap_stitch",
    "embedding_drift_report",
    "embedding_dim_stats",
    "ann_ivf_topk",
    "text_boilerplate_segments",
    "quality_source_gini",
    "feature_hashing_vectorize",
    "dedup_blocking_quality",
    "sample_neyman_allocation",
    "quality_merkle_checksums",
    "etl_golden_record",
    "window_funnel_latency",
    "etl_incremental_agg",
    "scan_minmax_skipping",
    "agg_bitmap_distinct",
    "join_strategy_hints",
    "quality_gopher_rules",
    "dedup_url_canonical",
    "graph_triangle_count",
    "graph_community_labels",
    "text_bpe_merges",
]


_MODULES = [
    "parquet_batch_spark.operators.scans",
    "parquet_batch_spark.operators.sources_ext",
    "parquet_batch_spark.operators.relational",
    "parquet_batch_spark.operators.joins",
    "parquet_batch_spark.operators.tpch",
    "parquet_batch_spark.operators.tpch2",
    "parquet_batch_spark.operators.windows",
    "parquet_batch_spark.operators.analytics",
    "parquet_batch_spark.operators.scalar_funcs",
    "parquet_batch_spark.operators.udfs",
    "parquet_batch_spark.operators.text_analysis",
    "parquet_batch_spark.operators.dedup",
    "parquet_batch_spark.operators.similarity",
    "parquet_batch_spark.operators.multimodal",
    "parquet_batch_spark.operators.pipeline_ops",
    "parquet_batch_spark.operators.llm_prep",
    "parquet_batch_spark.operators.warehouse",
    "parquet_batch_spark.operators.scale_ops",
    "parquet_batch_spark.operators.corpus_ops",
    "parquet_batch_spark.operators.stats_ops",
    "parquet_batch_spark.streaming.windows",
]


def _modules():
    for name in _MODULES:
        try:
            yield import_module(name)
        except ImportError:
            continue


def _prioritized(mapping: dict) -> dict:
    """Re-emit ``mapping`` with ``_PRIORITY`` names first (in that order),
    then the remainder in module order."""
    out = {k: mapping[k] for k in _PRIORITY if k in mapping}
    out.update((k, v) for k, v in mapping.items() if k not in out)
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        for key, fn in getattr(mod, "QUERIES", {}).items():
            if key in out:
                raise ValueError(f"duplicate query name {key!r} in {mod.__name__}")
            out[key] = fn
    return _prioritized(out)


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLES", {}))
    return _prioritized(out)
