"""Invariant tests for the fourth r4 operator batch: temperature-
mixture allocation maths, degree-histogram mass conservation,
running-distinct monotonicity, bitwise identities."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from parquet_batch_spark.catalog import load
from parquet_batch_spark.operators.llm_prep import (
    TEMP_Q,
    graph_degree_histogram,
    sample_temperature_mixture,
)
from parquet_batch_spark.operators.scalar_funcs import func_bitwise
from parquet_batch_spark.operators.windows import window_running_distinct


def test_temperature_mixture_flattens(spark, sf_dir):
    """τ=0.5 must compress the mixture: the largest language's share of
    the sample is strictly below its share of the corpus, the smallest
    language's share strictly above; quotas match √n allocation."""
    rows = sample_temperature_mixture(spark, sf_dir).collect()
    n_total = sum(r["n_avail"] for r in rows)
    w_total = sum(r["w_q"] for r in rows)
    for r in rows:
        assert r["w_q"] == math.floor(math.sqrt(r["n_avail"]) * TEMP_Q)
        assert r["quota"] == math.floor((n_total // 2) * r["w_q"] / w_total)
        assert r["taken"] == min(r["quota"], r["n_avail"])
    big = max(rows, key=lambda r: r["n_avail"])
    small = min(rows, key=lambda r: r["n_avail"])
    taken_total = sum(r["taken"] for r in rows)
    assert big["taken"] / taken_total < big["n_avail"] / n_total
    assert small["taken"] / taken_total > small["n_avail"] / n_total


def test_degree_histogram_conserves_mass(spark, sf_dir):
    """Histogram counts sum to the corpus size; degrees are
    non-negative; there is non-trivial structure (some degree-0 docs
    AND some connected docs in this corpus)."""
    rows = graph_degree_histogram(spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    degs = {r["degree"] for r in rows}
    assert all(d >= 0 for d in degs)
    assert 0 in degs and max(degs) >= 1


def test_running_distinct_monotone_and_bounded(spark, sf_dir):
    """Per user, n_types_seen is non-decreasing in event order and
    never exceeds the user's total distinct types."""
    rows = window_running_distinct(spark, sf_dir).collect()
    totals = {
        r["user_id"]: r["n"]
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("n"))
        .collect()
    }
    last: dict = {}
    for r in rows:  # already ordered by user_id, event_id
        u = r["user_id"]
        assert 1 <= r["n_types_seen"] <= totals[u]
        if u in last:
            assert r["n_types_seen"] >= last[u]
        last[u] = r["n_types_seen"]


def test_bitwise_identities(spark, sf_dir):
    rows = func_bitwise(spark, sf_dir).collect()
    assert rows
    for r in rows[:200]:
        k = r["o_orderkey"]
        assert r["and_255"] == k & 255
        assert r["or_4096"] == k | 4096
        assert r["xor_shift"] == k ^ (k >> 4)
        assert r["shl_2"] == k << 2
        assert r["shr_3"] == k >> 3
        assert r["popcount"] == bin(k).count("1")
        assert r["complement"] == ~k


def test_asof_tolerance_bounds(spark, sf_dir):
    """Matched count never exceeds click count; matched gaps are
    within tolerance; a user's first-ever click (no preceding view)
    can never match."""
    from parquet_batch_spark.operators.joins import (
        ASOF_TOL_SECONDS,
        join_asof_tolerance,
    )

    rows = join_asof_tolerance(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_matched"] <= r["n_clicks"]
        assert 0 <= r["matched_gap_us"] <= r["n_matched"] * ASOF_TOL_SECONDS * 1_000_000


def test_agg_filtered_branch_consistency(spark, sf_dir):
    """Each FILTER branch is a subset of the group: branch counts never
    exceed n_all and sum to plausible totals recomputed directly."""
    from parquet_batch_spark.operators.relational import agg_filtered

    rows = agg_filtered(spark, sf_dir).collect()
    o = load(spark, sf_dir, "orders")
    urgent_direct = {
        r["o_orderstatus"]: r["n"]
        for r in o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert max(r["n_urgent"], r["n_recent"], r["n_big"]) <= r["n_all"]
        assert r["n_urgent"] == urgent_direct.get(r["o_orderstatus"], 0)


def test_listagg_sorted_and_complete(spark, sf_dir):
    from parquet_batch_spark.operators.relational import agg_listagg_sorted

    rows = agg_listagg_sorted(spark, sf_dir).collect()
    assert len(rows) == 5  # TPC-H fixed regions
    for r in rows:
        members = r["nations_csv"].split(",")
        assert members == sorted(members)
        assert len(members) == r["n_nations"]


def test_langid_confusion_mass_and_diagonal(spark, sf_dir):
    """Cell counts sum to the corpus; the heuristic must beat chance:
    diagonal mass (correct predictions) exceeds any single off-diagonal
    cell."""
    from parquet_batch_spark.operators.text_analysis import (
        quality_langid_confusion,
    )

    rows = quality_langid_confusion(spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    diag = sum(r["n_docs"] for r in rows if r["labeled"] == r["predicted"])
    off = max(
        (r["n_docs"] for r in rows if r["labeled"] != r["predicted"]), default=0
    )
    assert diag > off


def test_percent_change_first_month_null(spark, sf_dir):
    from parquet_batch_spark.operators.windows import window_percent_change

    rows = window_percent_change(spark, sf_dir).collect()
    by_status: dict = {}
    for r in rows:  # ordered by status, month
        if r["status"] not in by_status:
            assert r["pct_change"] is None, "first month must have no prior"
        else:
            assert r["pct_change"] is not None
        by_status[r["status"]] = True
        assert r["revenue"] > 0


def test_codec_matrix_identical_content(spark, sf_dir):
    from parquet_batch_spark.operators.sources_ext import (
        SINK_CODECS,
        sink_compression_codecs,
    )

    rows = sink_compression_codecs(spark, sf_dir).collect()
    assert {r["codec"] for r in rows} == set(SINK_CODECS)
    ref = rows[0]
    for r in rows[1:]:
        for c in ("n_rows", "key_checksum", "price_sum", "n_statuses"):
            assert r[c] == ref[c], f"codec {r['codec']} diverges on {c}"


def test_arrow_udf_matches_python(spark, sf_dir):
    from parquet_batch_spark.operators.udfs import udf_arrow_scalar

    rows = udf_arrow_scalar(spark, sf_dir).collect()
    assert rows
    for r in rows[:200]:
        k = r["o_orderkey"]
        assert r["digit_check"] == sum(int(c) for c in str(k)) * 7 + k % 7


def test_ignore_corrupt_reads_all_good_rows(spark, sf_dir):
    """The corrupt file is skipped, every good row survives."""
    from parquet_batch_spark.operators.sources_ext import scan_ignore_corrupt

    row = scan_ignore_corrupt(spark, sf_dir).collect()[0]
    o = load(spark, sf_dir, "orders")
    assert row["n_rows"] == o.count()
    assert row["key_checksum"] == o.agg(F.sum("o_orderkey")).collect()[0][0]


def test_func_url_parse_fields(spark, sf_dir):
    from parquet_batch_spark.operators.scalar_funcs import func_url

    rows = func_url(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source")
        .collect()
    }
    for r in rows[:100]:
        d = docs[r["doc_id"]]
        assert r["host"] == f"{d['source']}.example.com"
        assert r["path"] == f"/docs/{d['lang']}/page"
        assert r["qid"] == str(r["doc_id"])
        assert r["qref"] == "crawl"


def test_null_safe_join_keeps_unknown_band(spark, sf_dir):
    """Every order lands in exactly one label; the NULL band maps to
    'unknown' instead of being dropped (the <=> semantics)."""
    from parquet_batch_spark.operators.joins import join_null_safe

    rows = {r["d_label"]: r["n_orders"] for r in join_null_safe(spark, sf_dir).collect()}
    o = load(spark, sf_dir, "orders")
    assert sum(rows.values()) == o.count(), "null keys must not drop rows"
    n_low = o.filter(F.col("o_orderpriority") == "5-LOW").count()
    assert rows.get("unknown", 0) == n_low


def test_moments_match_numpy(spark, sf_dir):
    """Recompute one event type's moments in numpy from the same
    quantized values and match to 1e-6."""
    import math

    from parquet_batch_spark.operators.analytics import agg_moments_exact

    rows = {r["event_type"]: r for r in agg_moments_exact(spark, sf_dir).collect()}
    vals = [
        math.floor(r["value"])
        for r in load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("value")
        .collect()
    ]
    import numpy as np

    a = np.array(vals, dtype=np.float64)
    m2 = a.var()
    skew = ((a - a.mean()) ** 3).mean() / m2**1.5
    kurt = ((a - a.mean()) ** 4).mean() / m2**2 - 3.0
    got = rows["click"]
    assert abs(got["variance_u2"] - m2) < 1e-4 * max(1, m2)
    assert abs(got["skewness"] - skew) < 1e-6
    assert abs(got["excess_kurtosis"] - kurt) < 1e-6


def test_nth_value_anchors(spark, sf_dir):
    from parquet_batch_spark.operators.windows import window_nth_value

    rows = window_nth_value(spark, sf_dir).collect()
    for r in rows[:200]:
        assert r["n_orders"] >= 1
        if r["n_orders"] == 1:
            assert r["second_key"] is None
            assert r["first_key"] == r["latest_key"]
        else:
            assert r["second_key"] is not None and r["second_key"] != r["first_key"]


def test_explode_outer_accounts_for_dropped_docs(spark, sf_dir):
    """Outer keeps every doc (one NULL row when the array is empty);
    inner drops exactly the empty-array docs."""
    from parquet_batch_spark.operators.relational import explode_outer_semantics

    rows = explode_outer_semantics(spark, sf_dir).collect()
    assert len(rows) == load(spark, sf_dir, "documents").count()
    saw_dropped = False
    for r in rows:
        if r["dropped_by_inner"]:
            saw_dropped = True
            assert r["n_rows"] == 1 and r["n_toks"] == 0 and r["n_inner_rows"] == 0
        else:
            assert r["n_rows"] == r["n_toks"] == r["n_inner_rows"] >= 1
    assert saw_dropped, "corpus must contain docs with no rare tokens"


def test_try_arith_null_on_error(spark, sf_dir):
    from parquet_batch_spark.operators.scalar_funcs import func_try_arith

    rows = func_try_arith(spark, sf_dir).collect()
    for r in rows[:300]:
        k = r["o_orderkey"]
        assert (r["safe_div"] is None) == (k % 7 == 0)
        assert (r["safe_long"] is None) == (k % 3 != 0)
        if r["safe_long"] is not None:
            assert r["safe_long"] == k
        assert r["overflow_dec"] is None or abs(r["overflow_dec"]) < 1000


def test_streak_islands_consistency(spark, sf_dir):
    """Longest streak >= 1, islands partition each user's per-type
    events: sum over (streaks x islands bound) holds and total island
    membership equals the user's event count."""
    from parquet_batch_spark.operators.windows import window_streak_islands

    rows = window_streak_islands(spark, sf_dir).collect()
    per_user_type = {
        (r["user_id"], r["event_type"]): r["n"]
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert len(rows) == len(per_user_type)
    for r in rows:
        n = per_user_type[(r["user_id"], r["event_type"])]
        assert 1 <= r["longest_streak"] <= n
        assert 1 <= r["n_islands"] <= n
        assert r["longest_streak"] + (r["n_islands"] - 1) <= n


def test_balanced_labels_cap(spark, sf_dir):
    from parquet_batch_spark.operators.llm_prep import (
        BALANCE_CAP_FACTOR,
        sample_balanced_labels,
    )

    rows = sample_balanced_labels(spark, sf_dir).collect()
    min_avail = min(r["n_avail"] for r in rows)
    for r in rows:
        assert r["cap"] == min_avail * BALANCE_CAP_FACTOR
        assert r["taken"] == min(r["cap"], r["n_avail"])
    takes = [r["taken"] for r in rows]
    assert max(takes) <= BALANCE_CAP_FACTOR * min(takes)
