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


def test_driver_window_covers_round8_targets():
    """Slots 1-50 (the driver's check window) must be entirely
    never-driver-checked entries in VERDICT r7 #1's composition —
    north-star families before the stats tail: similarity 3,
    multimodal 10, pipeline_ops 11, dedup 8, corpus_ops 8, udfs 3,
    scale_ops 4, scans 1, warehouse top-up 2.  Clears every north-star
    family to 0 judge-only.  The ever-checked set is pinned from the
    recorded CORRECTNESS_r01-r07 artifacts."""
    import glob
    import json
    import os

    first50 = list(all_queries())[:50]
    from parquet_batch_spark.operators import (
        corpus_ops, dedup, multimodal, pipeline_ops, scale_ops, scans,
        similarity, udfs, warehouse,
    )

    assert sum(n in similarity.QUERIES for n in first50) == 3
    assert sum(n in multimodal.QUERIES for n in first50) == 10
    assert sum(n in pipeline_ops.QUERIES for n in first50) == 11
    # dedup_cross_source_matrix lives in corpus_ops, not dedup
    assert sum(n in dedup.QUERIES for n in first50) == 8
    assert sum(n in corpus_ops.QUERIES for n in first50) == 8
    assert sum(n in udfs.QUERIES for n in first50) == 3
    assert sum(n in scale_ops.QUERIES for n in first50) == 4
    assert sum(n in scans.QUERIES for n in first50) == 1
    assert sum(n in warehouse.QUERIES for n in first50) == 2
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked = set()
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r0[1-7].json")):
        checked.update(json.load(open(f)))
    rechecks = [n for n in first50 if n in checked]
    assert rechecks == [], f"window wastes slots on re-checks: {rechecks}"
