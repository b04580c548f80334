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


def test_driver_window_covers_round5_targets():
    """Slots 1-50 (the driver's check window) must lead with the nine
    ops CHANGED in r5 (overflow/oracle/dedup-scale fixes — the driver
    must re-certify them) and fill the rest with never-driver-checked
    stats_ops entries (VERDICT r4 #1: target >= 45 stats_ops rows).
    The spill boundary is pinned so the ledger comment stays truthful:
    window_runs_test is the first never-checked spill and leads r6."""
    first50 = list(all_queries())[:50]
    changed_r5 = [
        "agg_xyz_classification", "agg_fano_dispersion",
        "embedding_norm_outliers", "quality_schema_contract",
        "func_base64_transport", "dedup_ngram_jaccard",
        "dedup_containment", "dedup_lsh_recall_eval", "dedup_clusters",
    ]
    assert first50[:9] == changed_r5
    from parquet_batch_spark.operators import stats_ops

    stats_in_window = sum(n in stats_ops.QUERIES for n in first50)
    assert stats_in_window >= 45, stats_in_window
    # spill boundary pins the r6 plan's head
    assert list(all_queries())[50] == "window_runs_test"
