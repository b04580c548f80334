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
    """Slots 1-50 (the driver's check window) must lead with every op
    that is new or changed THIS session (21 continuation-session ops +
    join_interval_bucketed, whose oracle was registered this session +
    ann_ivf_topk, whose only driver row ever is r3's no_oracle), then
    fill with the earliest never-checked prior-session batches. The
    exact spill boundary is pinned so the r5 rotation plan in the
    ledger comment stays truthful."""
    first50 = list(all_queries())[:50]
    session_ops = {
        "etl_incremental_agg", "scan_minmax_skipping", "agg_bitmap_distinct",
        "join_strategy_hints", "quality_gopher_rules", "dedup_url_canonical",
        "graph_triangle_count", "graph_community_labels", "text_bpe_merges",
        "agg_weighted_median", "window_interval_coalesce",
        "sql_recursive_hierarchy", "source_binaryfile_ingest",
        "rollup_ohlc_bars", "quality_mad_outliers", "func_crypto_roundtrip",
        "agg_pareto_frontier", "set_ops_multiset", "feature_hashing_vectorize",
        "dedup_blocking_quality", "sample_neyman_allocation",
        "window_linear_interpolate", "text_overlap_stitch",
        "join_spatial_grid_radius", "window_max_drawdown",
        "window_time_weighted_avg", "embedding_dim_stats",
        "quality_source_gini", "agg_decile_report",
        "window_funnel_latency", "text_boilerplate_segments",
        "sink_selective_compaction", "window_rank_shift",
        "agg_pct_of_parent", "window_winsorize", "func_base64_transport",
        "etl_golden_record", "window_seasonal_baseline",
        "agg_period_overlap", "embedding_drift_report",
        "udtf_dynamic_schema", "agg_vwap", "quality_merkle_checksums",
        "window_local_extrema",
        "source_csv_quoted_multiline",
        "join_interval_bucketed", "ann_ivf_topk"}
    assert session_ops <= set(first50), session_ops - set(first50)
    # the remaining 27 slots hold the earliest prior-session batches
    assert first50[47] == "udf_map_in_arrow"
    assert first50[49] == "scan_files_metadata"
    # spill boundary: curation_pipeline_funnel leads the r5 plan
    assert list(all_queries())[50] == "join_lateral_topk"
