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
