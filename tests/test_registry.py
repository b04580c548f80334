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


def test_driver_window_covers_round7_targets():
    """Slots 1-50 (the driver's check window) must be entirely
    never-driver-checked entries (VERDICT r6 #1: never-checked-first,
    llm_prep/text_analysis/similarity — the least-certified north-star
    families), leading with the three ops CHANGED this round plus the
    one r7-new op.  The ever-checked set is pinned from the recorded
    CORRECTNESS_r01-r06 artifacts."""
    import glob
    import json
    import os

    first50 = list(all_queries())[:50]
    assert first50[:4] == [
        "ml_mcc_balanced_accuracy",       # ADVICE r6: int64 overflow fix
        "sample_facility_location",       # VERDICT r6 #2: distributed draw
        "embedding_geometric_median",     # ADVICE r6: decimal cast fix
        "table_stats_profile_approx",     # VERDICT r6 #4: the r7-new op
    ]
    from parquet_batch_spark.operators import (
        llm_prep, similarity, text_analysis,
    )

    assert sum(n in llm_prep.QUERIES for n in first50) == 20
    assert sum(n in text_analysis.QUERIES for n in first50) == 19
    assert sum(n in similarity.QUERIES for n in first50) == 9
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked = set()
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r0[1-6].json")):
        checked.update(json.load(open(f)))
    rechecks = [n for n in first50 if n in checked]
    assert rechecks == [], f"window wastes slots on re-checks: {rechecks}"
