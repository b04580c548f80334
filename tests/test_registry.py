"""Registry integrity: the driver checks roughly the first 50 entries,
so ordering is coverage policy — guard it against silent drift."""

from __future__ import annotations

from parquet_batch_spark.operators import _PRIORITY, all_oracles, all_queries


def test_priority_names_exist_and_are_unique():
    qs = all_queries()
    missing = [n for n in _PRIORITY if n not in qs]
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    assert len(set(_PRIORITY)) == len(_PRIORITY), "duplicate priority entries"


def test_priority_prefix_is_registry_prefix():
    assert list(all_queries())[: len(_PRIORITY)] == _PRIORITY


def test_every_oracle_has_a_query():
    qs, os_ = all_queries(), all_oracles()
    orphans = [n for n in os_ if n not in qs]
    assert not orphans, f"oracles without queries: {orphans}"
    # every query is oracle-checked — fail loudly if a rows-only entry
    # sneaks in (ann_ivf_topk, the last one, gained an oracle in r4
    # when its quantizer moved to hash-sampled data points)
    rows_only = sorted(set(qs) - set(os_))
    assert rows_only == [], rows_only


def test_driver_window_covers_round4_targets():
    """Slots 1-50 must contain every r4-NEW op (new ops go first — the
    r2 lesson: 37 of them after the late-r4 batches landed), every
    r4-CHANGED op, and as many of the r1-stale entries as fit (TPC-H
    window plus ann_ivf_topk, whose only driver row ever is r3's
    no_oracle; the other changed/stale entries lead the r5 window —
    ledger updated)."""
    first50 = list(all_queries())[:50]
    new_ops = {
        "udf_map_in_arrow", "approx_hll_union_sketch", "scan_files_metadata",
        "join_lateral_topk", "reshape_transpose", "scan_observed_metrics",
        "dedup_cluster_representative", "stat_crosstab",
        "sink_dynamic_partition_overwrite",
        "func_regexp", "func_collation", "agg_minmax_by",
        "agg_boolean", "explode_positional_tokens",
        "source_python_datasource", "streaming_python_source",
        "func_csv_struct", "sql_named_params", "func_struct_field_ops",
        "seq_shard_manifest", "multimodal_payload_chunks",
        "seq_pack_chunks", "sample_mix_domains", "dedup_paragraph",
        "dedup_incremental_novelty", "embedding_quantize_int8",
        "text_rarity_score", "curation_pipeline_funnel",
        "multimodal_dedup_phash",
        "text_bigram_surprisal", "etl_snapshot_diff",
        "sample_temperature_mixture", "graph_degree_histogram",
        "join_asof_tolerance", "agg_filtered",
        "quality_langid_confusion", "window_percent_change",
        "sink_compression_codecs",
        "udf_arrow_scalar", "scan_ignore_corrupt", "func_url",
        "join_null_safe", "agg_moments_exact", "window_nth_value",
        "explode_outer_semantics", "func_try_arith",
        "window_streak_islands", "sample_balanced_labels",
        "dedup_containment"}
    assert new_ops <= set(first50), new_ops - set(first50)
    assert "ann_ivf_topk" in first50  # only driver row ever: no_oracle
    # spills lead r5: six r4-new ops with dedicated invariant tests,
    # then the reworked cosine/fuzzy (r2-green, dual-SF sweep locally)
    next_up = list(all_queries())[50:61]
    assert next_up == [
        "window_ewma_decay", "window_rolling_median",
        "agg_listagg_sorted", "window_running_distinct", "func_bitwise",
        "etl_cdc_apply", "join_bloom_prefilter",
        "sample_reservoir_per_group", "embedding_kmeans_rollup",
        "dedup_embedding_cosine", "dedup_fuzzy_levenshtein",
    ]
