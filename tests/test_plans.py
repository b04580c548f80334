"""Scale-plan assertions: the physical plans that must survive 100 TB.

These tests pin the *plan shape*, not timings: pushdown reached the
scan, projections pruned, dim joins broadcast, aggs partial. A change
that silently regresses any of these fails here instead of on a
cluster.
"""

from __future__ import annotations

from parquet_batch_spark.operators.joins import join_broadcast_dims, join_range
from parquet_batch_spark.operators.relational import q1_pricing_summary
from parquet_batch_spark.operators.scans import filter_pushdown, scan_projection
from parquet_batch_spark.plans.inspect import (
    executed_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    whole_stage_codegen_spans,
)


def test_projection_prunes_read_schema(spark, sf_dir):
    df = scan_projection(spark, sf_dir)
    cols = read_schema_columns(df)
    assert cols == {"l_orderkey", "l_linenumber", "l_quantity"}, cols


def test_filter_reaches_parquet_scan(spark, sf_dir):
    df = filter_pushdown(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "l_quantity" in pushed and "l_discount" in pushed, pushed


def test_q1_pushes_date_filter_and_prunes(spark, sf_dir):
    df = q1_pricing_summary(spark, sf_dir)
    assert any("l_shipdate" in f for f in pushed_filters(df))
    cols = read_schema_columns(df)
    # only the 7 referenced columns, not all 11
    assert "l_orderkey" not in cols and "l_partkey" not in cols, cols


def test_dim_joins_are_broadcast(spark, sf_dir):
    df = join_broadcast_dims(spark, sf_dir)
    assert has_broadcast_join(df)
    # no sort-merge join should appear for the dim lookups
    plan = executed_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]


def test_range_join_is_broadcast_nlj(spark, sf_dir):
    df = join_range(spark, sf_dir)
    plan = executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]


def test_q1_stays_in_codegen(spark, sf_dir):
    df = q1_pricing_summary(spark, sf_dir)
    df.collect()  # finalize the AQE plan so codegen markers appear
    assert whole_stage_codegen_spans(df) >= 2  # scan+partial agg, final agg
