"""Semantics + plan-shape tests for the scale_ops module (incremental
MV maintenance, min/max file skipping, bitmap exact distinct, join
strategy hints)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_batch_spark.operators.scale_ops import (
    INC_CUTOFF,
    agg_bitmap_distinct,
    etl_incremental_agg,
    join_strategy_hints,
    join_strategy_merge_twin,
    scan_minmax_skipping,
    skip_file_counts,
)
from parquet_batch_spark.plans.inspect import executed_plan, pushed_filters


def test_incremental_delta_scan_is_pruned(spark, sf_dir):
    """The refresh plan's orders scan must carry the delta predicate —
    the whole point is never rescanning history from the fact table."""
    df = etl_incremental_agg(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "o_orderdate" in pushed, pushed
    # exactly one orders scan (the delta); history comes from the MV
    plan = executed_plan(df)
    assert plan.count("orders.parquet") == 1, plan


def test_incremental_merge_equals_full_recompute(spark, sf_dir):
    from parquet_batch_spark.catalog import load
    from parquet_batch_spark.functions.numeric import dec

    full = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice"))
            .cast("decimal(18,6)")
            .cast("double")
            .alias("revenue"),
        )
    )
    inc = {r["month"]: (r["n_orders"], r["revenue"]) for r in etl_incremental_agg(spark, sf_dir).collect()}
    ful = {r["month"]: (r["n_orders"], r["revenue"]) for r in full.collect()}
    assert inc == ful  # bit-identical: decimal partials are exact


def test_minmax_skipping_actually_skips(spark, sf_dir):
    kept, total = skip_file_counts(spark, sf_dir)
    assert total == 16, total
    assert 0 < kept < total // 2, (kept, total)


def test_minmax_skipping_result_complete(spark, sf_dir):
    """Stats-pruned scan == unpruned filtered scan (skipping must never
    drop qualifying rows that straddle file boundaries)."""
    from parquet_batch_spark.catalog import load
    from parquet_batch_spark.operators.scale_ops import SKIP_HI, SKIP_LO

    lo = F.lit(SKIP_LO).cast("timestamp_ntz")
    hi = F.lit(SKIP_HI).cast("timestamp_ntz")
    expect = (
        load(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .count()
    )
    got = scan_minmax_skipping(spark, sf_dir).agg(F.sum("n_orders")).collect()[0][0]
    assert got == expect, (got, expect)


def test_bitmap_distinct_no_raw_distinct(spark, sf_dir):
    """The exact count must come from bitmap popcounts, not a planner
    count-distinct expand over raw ids."""
    df = agg_bitmap_distinct(spark, sf_dir)
    plan = executed_plan(df)
    assert "bitmapCount" in plan or "bitmap_count" in plan, plan
    assert "Expand" not in plan, plan


def test_bitmap_partials_are_mergeable(spark, sf_dir):
    """Partial bitmaps must actually merge: with 8 id-shards over ≥1
    bucket, some (priority, bucket) group merges >1 partial."""
    rows = agg_bitmap_distinct(spark, sf_dir).collect()
    assert all(r["n_partial_bitmaps"] >= r["n_distinct_custkeys"] / 32768 for r in rows)
    assert any(r["n_partial_bitmaps"] > 1 for r in rows)


def test_strategy_hints_switch_plans_same_answer(spark, sf_dir):
    sh = join_strategy_hints(spark, sf_dir)
    mj = join_strategy_merge_twin(spark, sf_dir)
    p_sh, p_mj = executed_plan(sh), executed_plan(mj)
    assert "ShuffledHashJoin" in p_sh, p_sh
    assert "SortMergeJoin" in p_mj, p_mj
    assert sh.collect() == mj.collect()


def test_recursive_hierarchy_tree_shape(spark, sf_dir):
    from parquet_batch_spark.operators.relational import sql_recursive_hierarchy

    rows = sql_recursive_hierarchy(spark, sf_dir).collect()
    assert sum(r["n_nodes"] for r in rows) == 500
    for r in rows:
        assert r["n_nodes"] <= 2 ** r["depth"]
    assert [r["depth"] for r in rows] == list(range(len(rows)))


def test_binaryfile_ingest_stable_across_invocations(spark, sf_dir):
    from parquet_batch_spark.operators.sources_ext import source_binaryfile_ingest

    a = sorted(map(tuple, source_binaryfile_ingest(spark, sf_dir).collect()))
    b = sorted(map(tuple, source_binaryfile_ingest(spark, sf_dir).collect()))
    assert a == b
    assert len(a) == 5  # one file per lang
    assert all(n > 0 for (_, n, _) in a)


def test_pareto_frontier_is_nondominated(spark, sf_dir):
    from parquet_batch_spark.operators.analytics import agg_pareto_frontier

    rows = agg_pareto_frontier(spark, sf_dir).collect()
    assert rows
    # descending price must mean strictly ascending date along the frontier
    for a, b in zip(rows, rows[1:]):
        assert a["price"] > b["price"]
        assert a["best_date"] < b["best_date"]


def test_multiset_bag_accounting(spark, sf_dir):
    from parquet_batch_spark.catalog import load
    from parquet_batch_spark.operators.relational import set_ops_multiset

    got = {r["op"]: r for r in set_ops_multiset(spark, sf_dir).collect()}
    o = load(spark, sf_dir, "orders")
    n_urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").count()
    n_f = o.filter(F.col("o_orderstatus") == "F").count()
    # |A ∩all B| + |A \all B| == |A|, and symmetrically for B
    assert got["intersect_all"]["n_rows"] + got["except_all"]["n_rows"] == n_urgent
    assert got["intersect_all"]["n_rows"] + got["except_all_rev"]["n_rows"] == n_f


def test_crypto_roundtrip_all_ok(spark, sf_dir):
    from parquet_batch_spark.operators.scalar_funcs import func_crypto_roundtrip

    rows = func_crypto_roundtrip(spark, sf_dir).collect()
    assert len(rows) == 200
    assert all(r["roundtrip_ok"] for r in rows)
    assert all(r["cipher_len"] % 16 == 0 for r in rows)
    assert len({r["sha256_hex"] for r in rows}) == len(rows)  # distinct texts


def test_spatial_grid_completeness_vs_bruteforce(spark, sf_dir):
    """Grid+3x3 probing must find EXACTLY the same pairs as brute
    force (geometric completeness) — checked on a 2k-point subset."""
    from parquet_batch_spark.catalog import load
    from parquet_batch_spark.operators.joins import (
        SP_RADIUS,
        SP_SPACE,
        join_spatial_grid_radius,
    )

    pts = [
        (
            (i * 2654435761) % SP_SPACE,
            (i * 2246822519 + 12345) % SP_SPACE,
        )
        for r in load(spark, sf_dir, "events").select("event_id").limit(2000).collect()
        for i in [r["event_id"]]
    ]
    # brute force over the subset bounds nothing in the op itself, but
    # the FULL-table op result must dominate the subset's pair count
    full = join_spatial_grid_radius(spark, sf_dir).collect()[0]
    r2 = SP_RADIUS * SP_RADIUS
    brute = sum(
        1
        for i in range(len(pts))
        for j in range(i + 1, len(pts))
        if (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2 <= r2
    )
    assert full["n_pairs"] >= brute
    assert full["min_dist2"] is None or full["min_dist2"] >= 0


def test_drawdown_bounds(spark, sf_dir):
    from parquet_batch_spark.operators.windows import window_max_drawdown

    rows = window_max_drawdown(spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r["max_drawdown"] <= r["peak_value"]


def test_twap_within_value_range(spark, sf_dir):
    from parquet_batch_spark.catalog import load
    from parquet_batch_spark.operators.windows import window_time_weighted_avg

    bounds = {
        r["user_id"]: (r["mn"], r["mx"])
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }
    for r in window_time_weighted_avg(spark, sf_dir).collect():
        mn, mx = bounds[r["user_id"]]
        assert mn - 1e-6 <= r["twap"] <= mx + 1e-6
        assert r["span_s"] > 0


def test_embedding_dim_stats_shape(spark, sf_dir):
    from parquet_batch_spark.operators.similarity import embedding_dim_stats

    rows = embedding_dim_stats(spark, sf_dir).collect()
    assert len(rows) == 64
    for r in rows:
        assert r["n"] == 500
        assert r["min_micro"] <= r["mean_micro"] <= r["max_micro"]
        assert r["var_micro2"] >= 0


def test_csv_multiline_roundtrip_counts(spark, sf_dir):
    from parquet_batch_spark.operators.sources_ext import (
        source_csv_quoted_multiline,
    )

    rows = source_csv_quoted_multiline(spark, sf_dir).collect()
    assert sum(r["n_rows"] for r in rows) == 200
    # payload embeds one newline per row: chars per row > the 20-char slice
    for r in rows:
        assert r["payload_chars"] > r["n_rows"] * 20


def test_spatial_pair_join_is_hash_equi(spark, sf_dir):
    """The candidate join must be a hash equi-join on the cell id —
    a nested loop over points would be the N² plan binning exists to
    avoid. (The only BNLJ allowed is the final 1-row scalar combine.)"""
    from parquet_batch_spark.operators.joins import join_spatial_grid_radius

    plan = executed_plan(join_spatial_grid_radius(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    joins = [l for l in plan.splitlines() if "HashJoin" in l]
    assert any("cx" in l and "cy" in l for l in joins), plan


def test_selective_compaction_targets_only(spark, sf_dir):
    from parquet_batch_spark.operators.sources_ext import (
        _COMPACT_LAYOUT,
        COMPACT_FILE_THRESHOLD,
        sink_selective_compaction,
    )

    rows = {r["status"]: r for r in sink_selective_compaction(spark, sf_dir).collect()}
    for st, staged in _COMPACT_LAYOUT.items():
        expect = 1 if staged > COMPACT_FILE_THRESHOLD else staged
        assert rows[st]["files_after"] == expect, (st, rows[st])
    # idempotent second run, identical content
    again = {r["status"]: r for r in sink_selective_compaction(spark, sf_dir).collect()}
    assert {k: (v["n_rows"], v["revenue"], v["files_after"]) for k, v in rows.items()} == {
        k: (v["n_rows"], v["revenue"], v["files_after"]) for k, v in again.items()
    }


def test_rank_shift_delta_consistency(spark, sf_dir):
    from parquet_batch_spark.operators.windows import window_rank_shift

    rows = window_rank_shift(spark, sf_dir).collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["segment"], []).append(r)
    for seq in by_seg.values():
        seq.sort(key=lambda r: r["month"])
        for a, b in zip(seq, seq[1:]):
            assert b["rank_delta"] == b["rnk"] - a["rnk"]
        assert seq[0]["rank_delta"] is None


def test_pct_of_parent_shares_sum(spark, sf_dir):
    from parquet_batch_spark.operators.relational import agg_pct_of_parent

    rows = agg_pct_of_parent(spark, sf_dir).collect()
    by_region = {}
    for r in rows:
        by_region.setdefault(r["r_name"], []).append(r)
    assert len(by_region) == 5
    for rs in by_region.values():
        total = sum(r["share_of_region_micro"] for r in rs)
        # floors lose < 1 micro-unit per nation
        assert 1_000_000 - len(rs) <= total <= 1_000_000
    world = {r["r_name"]: r["region_share_of_world_micro"] for r in rows}
    assert 1_000_000 - 5 <= sum(world.values()) <= 1_000_000


def test_winsorize_bounds(spark, sf_dir):
    from parquet_batch_spark.operators.analytics import window_winsorize

    for r in window_winsorize(spark, sf_dir).collect():
        # ~5% clamped each side
        assert 0 < r["n_low"] < r["n"] * 0.06
        assert 0 < r["n_high"] < r["n"] * 0.06


def test_base64_all_roundtrip(spark, sf_dir):
    from parquet_batch_spark.operators.scalar_funcs import func_base64_transport

    rows = func_base64_transport(spark, sf_dir).collect()
    assert len(rows) == 200
    assert all(r["b64_roundtrip_ok"] and r["hex_roundtrip_ok"] for r in rows)
    assert all(r["b64_len"] % 4 == 0 for r in rows)


def test_period_overlap_set_identities(spark, sf_dir):
    from parquet_batch_spark.operators.relational import agg_period_overlap

    r = agg_period_overlap(spark, sf_dir).collect()[0]
    assert r["n_both"] <= min(r["n_y1"], r["n_y2"])
    assert 0 <= r["jaccard_micro"] <= 1_000_000
    assert r["n_y1"] > 0 and r["n_y2"] > 0


def test_drift_report_consistency(spark, sf_dir):
    from parquet_batch_spark.operators.similarity import embedding_drift_report

    r = embedding_drift_report(spark, sf_dir).collect()[0]
    assert r["n_dims"] == 64
    assert r["max_dim_shift_micro"] <= r["l1_drift_micro"]
    assert 0 <= r["n_dims_shifted_1pct"] <= 64


def test_local_extrema_bounds(spark, sf_dir):
    from parquet_batch_spark.operators.windows import window_local_extrema

    for r in window_local_extrema(spark, sf_dir).collect():
        # extrema alternate: counts differ by at most 1; endpoints excluded
        assert abs(r["n_peaks"] - r["n_troughs"]) <= 1
        assert r["n_peaks"] + r["n_troughs"] <= max(r["n_events"] - 2, 0)


def test_dynamic_udtf_schema_from_literal(spark, sf_dir):
    from parquet_batch_spark.operators.udfs import udtf_dynamic_schema

    df = udtf_dynamic_schema(spark, sf_dir)
    # the schema was derived from the literal n=3 at PLAN time
    assert [f.name for f in df.schema.fields] == ["tok_1", "tok_2", "tok_3", "n"]
    rows = df.collect()
    assert len(rows) == 10
    assert all(r["n"] >= 1 for r in rows)


def test_vwap_between_min_max_price(spark, sf_dir):
    from parquet_batch_spark.catalog import load
    from parquet_batch_spark.operators.analytics import agg_vwap

    bounds = {
        r["l_returnflag"]: (r["mn"], r["mx"])
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx"))
        .collect()
    }
    for r in agg_vwap(spark, sf_dir).collect():
        mn, mx = bounds[r["l_returnflag"]]
        assert mn <= r["vwap"] <= mx


def test_merkle_root_localizes_partitions(spark, sf_dir):
    from parquet_batch_spark.operators.warehouse import quality_merkle_checksums

    rows = quality_merkle_checksums(spark, sf_dir).collect()
    parts = [r for r in rows if r["level"] == "partition"]
    roots = [r for r in rows if r["level"] == "root"]
    assert len(roots) == 1
    assert roots[0]["n_rows"] == sum(r["n_rows"] for r in parts)
    assert len({r["digest"] for r in rows}) == len(rows)  # all digests distinct


def test_benford_profile_shape(spark, sf_dir):
    from parquet_batch_spark.operators.analytics import agg_benford_profile

    rows = agg_benford_profile(spark, sf_dir).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    assert abs(sum(r["share_micro"] for r in rows) - 1_000_000) <= 9
    assert sum(r["benford_micro"] for r in rows) in range(999_990, 1_000_001)


def test_multiformat_union_covers_all_slices(spark, sf_dir):
    from parquet_batch_spark.catalog import load
    from parquet_batch_spark.operators.sources_ext import source_multiformat_union

    rows = source_multiformat_union(spark, sf_dir).collect()
    assert sum(r["n_rows"] for r in rows) == load(spark, sf_dir, "orders").count()


def test_retention_prune_drops_only_expired(spark, sf_dir):
    from parquet_batch_spark.catalog import load
    from parquet_batch_spark.operators.sources_ext import (
        RETENTION_MIN_YEAR,
        sink_retention_prune,
    )

    rows = sink_retention_prune(spark, sf_dir).collect()
    assert all(r["o_year"] >= RETENTION_MIN_YEAR for r in rows)
    expect = (
        load(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") >= RETENTION_MIN_YEAR)
        .count()
    )
    assert sum(r["n_orders"] for r in rows) == expect


def test_nearest_price_gap_positive(spark, sf_dir):
    from parquet_batch_spark.operators.joins import join_nearest_price

    for r in join_nearest_price(spark, sf_dir).collect():
        assert 0 <= r["min_gap_cents"] <= r["mean_gap_cents"] <= r["max_gap_cents"]
        assert r["n_prices"] > 100


def test_vocab_growth_monotone_concave(spark, sf_dir):
    from parquet_batch_spark.operators.text_analysis import text_vocab_growth

    rows = text_vocab_growth(spark, sf_dir).collect()
    sizes = [r["vocab_size"] for r in rows]
    assert sizes == sorted(sizes)  # monotone growth
    assert sizes[-1] == sum(r["new_tokens"] for r in rows)
    # Heaps: later checkpoints add fewer new tokens than the first
    assert rows[-1]["new_tokens"] <= rows[0]["new_tokens"]


def test_bollinger_breaches_bounded(spark, sf_dir):
    from parquet_batch_spark.operators.windows import window_bollinger_breaches

    rows = window_bollinger_breaches(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 2σ breaches are rare by construction (Chebyshev: ≤ 25%)
        assert r["n_upper_breach"] + r["n_lower_breach"] <= r["n_scored"] * 0.25 + 1


def test_abc_partition_and_order(spark, sf_dir):
    from parquet_batch_spark.catalog import load
    from parquet_batch_spark.operators.relational import agg_abc_classification

    rows = {r["abc_class"]: r for r in agg_abc_classification(spark, sf_dir).collect()}
    n_cust = load(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows.values()) == n_cust
    # class revenue follows the 80/15/5 split by construction, and the
    # per-customer average is monotone (A holds the biggest spenders);
    # note the synthetic totals are near-uniform, so unlike real data
    # A is NOT a small head here — don't assert customer-count shape
    assert rows["A"]["revenue"] > rows["B"]["revenue"] > rows["C"]["revenue"]
    avg = {k: r["revenue"] / r["n_customers"] for k, r in rows.items()}
    assert avg["A"] >= avg["B"] >= avg["C"]


def test_new_vs_returning_conservation(spark, sf_dir):
    from parquet_batch_spark.catalog import load
    from parquet_batch_spark.operators.relational import agg_new_vs_returning

    rows = agg_new_vs_returning(spark, sf_dir).collect()
    total = sum(r["n_new"] + r["n_returning"] for r in rows)
    assert total == load(spark, sf_dir, "orders").count()
    n_cust = load(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    # "new" counts ORDERS in each customer's acquisition month — at
    # least one per customer, possibly more
    assert sum(r["n_new"] for r in rows) >= n_cust
    assert rows[0]["n_returning"] == 0  # nobody returns in the first month


def test_basket_pairs_lift_sane(spark, sf_dir):
    from parquet_batch_spark.operators.relational import (
        BASKET_TOP,
        agg_basket_pairs,
    )

    rows = agg_basket_pairs(spark, sf_dir).collect()
    assert len(rows) == BASKET_TOP
    supports = [r["support"] for r in rows]
    assert supports == sorted(supports, reverse=True)
    for r in rows:
        assert r["brand_x"] < r["brand_y"]
        assert r["lift_micro"] > 0
