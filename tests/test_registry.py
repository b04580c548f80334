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
    # rows-only set is deliberate and small — fail loudly if it grows
    rows_only = sorted(set(qs) - set(os_))
    assert rows_only == [
        "ann_ivf_topk",
        "approx_distinct_sketch",
        "approx_percentile_sketch",
        "streaming_dedup_watermark",
    ], rows_only


def test_driver_window_covers_round2_targets():
    """Slots 1-50 must contain exactly the 48 r1-unchecked queries plus
    the two repaired hash-fails (the round's CORRECTNESS goal)."""
    first50 = list(all_queries())[:50]
    assert "source_json_roundtrip" in first50 and "tpch_q12" in first50
    for family in ("dedup_", "ann_bruteforce", "ann_lsh", "text_", "multimodal_m",
                   "streaming_t", "func_", "window_r", "udtf_"):
        assert any(n.startswith(family) for n in first50), family
