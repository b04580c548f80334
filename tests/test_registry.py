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


def test_driver_window_covers_round3_targets():
    """Slots 1-50 must contain the 27 never-checked r2-new queries,
    the 4 repaired r2 ERRs, and 19 stalest r1 greens (this round's
    CORRECTNESS goal — see _PRIORITY's rotation ledger)."""
    first50 = list(all_queries())[:50]
    repaired = {"approx_percentile_sketch", "func_map",
                "approx_distinct_sketch", "streaming_dedup_watermark"}
    assert repaired <= set(first50)
    for never_checked in ("pii_detect", "decontam_ngram_overlap",
                          "graph_pagerank", "ann_ivf_topk", "etl_scd2",
                          "join_dpp_prune", "text_tfidf_topk",
                          "agg_mode_per_group", "quality_expectations"):
        assert never_checked in first50, never_checked
    assert "q1_pricing_summary" in first50  # stalest r1 block present
