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


def _ever_checked(through_round: int) -> set[str]:
    """Driver-checked names recorded in CORRECTNESS_r01..r0N artifacts."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r0*.json")):
        rnd = int(os.path.basename(f).split("_r0")[1].split(".")[0])
        if rnd <= through_round:
            checked.update(json.load(open(f)))
    return checked


def test_driver_window_covers_round9_targets():
    """Slots 1-50 (the driver's check window) must be entirely
    never-driver-checked entries in VERDICT r8 #1's pre-staged
    composition: 34 stats_ops + 13 relational + 3 scalar_funcs.
    Burns the stats/relational tail; never-checked drops 95 -> 45.
    The ever-checked set is pinned from CORRECTNESS_r01-r08."""
    first50 = list(all_queries())[:50]
    from parquet_batch_spark.operators import relational, scalar_funcs, stats_ops

    assert sum(n in stats_ops.QUERIES for n in first50) == 34
    assert sum(n in relational.QUERIES for n in first50) == 13
    assert sum(n in scalar_funcs.QUERIES for n in first50) == 3
    checked = _ever_checked(8)
    rechecks = [n for n in first50 if n in checked]
    assert rechecks == [], f"window wastes slots on re-checks: {rechecks}"


def test_round10_prestage_closes_certification():
    """Slots 51-100 (the r10 window after the next rotation) must be
    the remaining 45 never-driver-checked entries plus the 5 stalest
    r1-certified spares (VERDICT r8 #5) — i.e. after r9's window lands
    green, slots 1-100 of today's ordering contain EVERY entry never
    checked in CORRECTNESS_r01-r08, so r10 closes full certification."""
    names = list(all_queries())
    checked = _ever_checked(8)
    never = {n for n in names if n not in checked}
    assert len(never) == 95, f"expected 95 never-checked, got {len(never)}"
    first100 = names[:100]
    uncovered = sorted(never - set(first100))
    assert uncovered == [], f"never-checked entries outside r9+r10: {uncovered}"
    # the 5 spare slots re-check the stalest r1 window entries
    spares = [n for n in names[50:100] if n in checked]
    assert spares == [
        "reshape_unpivot",
        "agg_rollup",
        "agg_cube",
        "agg_grouping_sets",
        "agg_pivot",
    ], spares
