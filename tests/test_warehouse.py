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


def test_retention_cohort_invariants(spark, sf_dir):
    """Properties the oracle can't see: offset-0 retention is exactly
    1.0 for every cohort (everyone is active on their first day), all
    ratios are in (0, 1], offsets are non-negative, and n_active never
    exceeds the cohort size."""
    from parquet_batch_spark.operators.warehouse import window_retention_cohort

    rows = window_retention_cohort(spark, sf_dir).collect()
    assert rows, "retention matrix must be non-empty"
    day0 = {r.cohort_day: r for r in rows if r.day_offset == 0}
    cohorts = {r.cohort_day for r in rows}
    assert set(day0) == cohorts  # every cohort has an offset-0 row
    for r in day0.values():
        assert r.n_active == r.n_cohort and r.retention == 1.0
    for r in rows:
        assert r.day_offset >= 0
        assert 0 < r.n_active <= r.n_cohort
        assert 0.0 < r.retention <= 1.0


def test_quality_expectations_detects_planted_violations(spark):
    """Run the same check expressions against a planted frame with
    known defects and assert each check counts exactly its violations."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 5.0), (1, 50.0), (2, -3.0), (3, 101.0), (4, None)],
        "k long, v double",
    )
    out = df.agg(
        (F.count(F.lit(1)) - F.countDistinct("k")).alias("dup"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("nulls"),
        F.sum(
            F.when((F.col("v") < 0) | (F.col("v") > 100), 1).otherwise(0)
        ).alias("range_viol"),
    ).collect()[0]
    assert out.dup == 1 and out.nulls == 1 and out.range_viol == 2


def test_golden_record_survivorship(spark, sf_dir):
    from pyspark.sql import functions as F

    from parquet_batch_spark.catalog import load
    from parquet_batch_spark.operators.warehouse import etl_golden_record

    rows = etl_golden_record(spark, sf_dir).collect()
    n_orders = load(spark, sf_dir, "orders").count()
    assert sum(r["n_golden"] for r in rows) == n_orders  # every key survives once
    total_b = sum(r["n_from_b"] for r in rows)
    # B fills exactly the keys A lacks (o_orderkey % 3 == 0)
    expect_b = (
        load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 3 == 0).count()
    )
    assert total_b == expect_b


def test_seasonal_baseline_sane(spark, sf_dir):
    from parquet_batch_spark.operators.warehouse import window_funnel  # noqa: F401
    from parquet_batch_spark.operators.windows import window_seasonal_baseline

    rows = window_seasonal_baseline(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_days"] > 0
        assert 0 <= r["mae"] <= r["max_abs_err"]
