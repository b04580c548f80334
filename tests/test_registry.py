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


def test_driver_window_covers_round6_targets():
    """Slots 1-50 (the driver's check window) must be entirely
    never-driver-checked entries (VERDICT r5 #1: strictly
    never-checked-first), leading with the six never-checked streaming
    patterns (VERDICT r5 #7) and filling the rest with never-checked
    stats_ops.  The ever-checked set is pinned from the recorded
    CORRECTNESS_r01-r05 artifacts."""
    import glob
    import json
    import os

    first50 = list(all_queries())[:50]
    streaming6 = [
        "streaming_update_mode_counts", "streaming_windowed_topk",
        "streaming_python_source", "streaming_state_store_read",
        "streaming_state_metadata_source",
        "streaming_transform_with_state",
    ]
    assert first50[:6] == streaming6
    from parquet_batch_spark.operators import stats_ops

    stats_in_window = sum(n in stats_ops.QUERIES for n in first50)
    assert stats_in_window == 44, stats_in_window
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked = set()
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r0[1-5].json")):
        checked.update(json.load(open(f)))
    rechecks = [n for n in first50 if n in checked]
    assert rechecks == [], f"window wastes slots on re-checks: {rechecks}"
