"""Invariant and data-layout tests for operators/warehouse.py.

Value correctness is covered by the oracle parity sweep
(tests/test_oracle_parity.py); these tests check the properties the
oracle can't see — funnel monotonicity, SCD2 history shape, and the
actual row-group pruning the z-order layout exists to provide.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from parquet_batch_spark.operators.warehouse import (
    _Z_OK_HI,
    _Z_PK_HI,
    etl_scd2,
    sink_zorder_cluster,
    window_funnel,
    zorder_output_dir,
)


def test_funnel_monotone(spark, sf_dir):
    rows = window_funnel(spark, sf_dir).collect()
    assert [r.step_no for r in rows] == [1, 2, 3]
    users = [r.users for r in rows]
    assert users == sorted(users, reverse=True)
    assert all(u > 0 for u in users)
    assert rows[0].conv_from_first == 1.0
    assert all(0.0 < r.conv_from_first <= 1.0 for r in rows)


def test_scd2_history_shape(spark, sf_dir):
    rows = etl_scd2(spark, sf_dir).collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.c_custkey, []).append(r)
    for key, vs in by_key.items():
        current = [v for v in vs if v.is_current]
        assert len(current) == 1, key
        assert current[0].valid_to is None
        if key % 7 == 0:
            assert sorted(v.version for v in vs) == [1, 2]
            closed = next(v for v in vs if not v.is_current)
            assert closed.valid_to == current[0].valid_from
            assert current[0].acctbal == pytest.approx(closed.acctbal + 100.0)
        else:
            assert [v.version for v in vs] == [1]


def _overlapping_files(out_dir: str) -> tuple[int, int]:
    """(files whose row-group stats overlap the box, total files)."""
    files = sorted(glob.glob(f"{out_dir}/part-*.parquet"))
    overlap = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        i_ok = schema_names.index("l_orderkey")
        i_pk = schema_names.index("l_partkey")
        hits = False
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            ok = g.column(i_ok).statistics
            pk = g.column(i_pk).statistics
            if ok.min <= _Z_OK_HI and pk.min <= _Z_PK_HI:
                hits = True
                break
        overlap += hits
    return overlap, len(files)


def test_zorder_layout_prunes(spark, sf_dir):
    """After z-order clustering, the selective 2-D box query touches a
    small minority of files: both dimensions' min/max stats exclude it
    almost everywhere. This is the file-skipping a lakehouse scan
    performs at 100 TB — the query-side correctness is oracle-checked,
    this asserts the layout actually bought the pruning."""
    sink_zorder_cluster(spark, sf_dir).collect()
    overlap, total = _overlapping_files(zorder_output_dir(sf_dir))
    assert total >= 8
    assert overlap <= max(2, total // 4), (overlap, total)
