"""End-to-end oracle parity: every registered query must hash-match its
DuckDB oracle at sf0.01 — a local replica of the driver's gate."""

from __future__ import annotations

import pytest

from oracle_harness import run_all


def _all_names():
    import __spark_entry__ as e

    return sorted(e.queries().keys())


@pytest.mark.parametrize("name", _all_names())
def test_query_matches_oracle(spark, sf_dir, name):
    res = run_all(spark, sf_dir, only=[name])[0]
    assert res.ok, f"{res.name}: {res.detail}\n" + "\n".join(res.mismatches)


# Opt-in large-SF sweep: the driver's gate never runs oracles above
# sf0.01, which masked a scale-dependent bug (agg_moments_exact int64
# overflow first visible at sf0.1). Run with:
#   SPARK_GRAFT_SF01_SWEEP=1 python -m pytest tests/test_oracle_parity.py
@pytest.mark.skipif(
    not __import__("os").environ.get("SPARK_GRAFT_SF01_SWEEP"),
    reason="slow sf0.1 sweep; set SPARK_GRAFT_SF01_SWEEP=1 to enable",
)
@pytest.mark.parametrize("name", _all_names())
def test_query_matches_oracle_sf01(spark, name):
    res = run_all(spark, "/root/testdata/sf0.1", only=[name])[0]
    assert res.ok, f"{res.name}: {res.detail}\n" + "\n".join(res.mismatches)
