"""Semantics, invariant and plan tests for corpus_ops (Gopher rules,
URL canonicalization, triangle census, BPE merges)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_batch_spark.operators.corpus_ops import (
    _apply_merge,
    dedup_url_canonical,
    graph_triangle_count,
    quality_gopher_rules,
    text_bpe_merges,
)
from parquet_batch_spark.plans.inspect import executed_plan


def test_gopher_single_pass(spark, sf_dir):
    df = quality_gopher_rules(spark, sf_dir)
    plan = executed_plan(df)
    assert plan.count("documents.parquet") == 1, plan
    rows = df.collect()
    n = sum(r["n_docs"] for r in rows)
    assert n == 500
    for r in rows:
        assert 0 <= r["n_pass"] <= r["n_docs"]
        for c in ("fail_words", "fail_mwl", "fail_alpha", "fail_stop"):
            assert 0 <= r[c] <= r["n_docs"]
        # a doc passing all rules fails none
        assert r["n_pass"] + max(
            r["fail_words"], r["fail_mwl"], r["fail_alpha"], r["fail_stop"]
        ) <= r["n_docs"]


def test_url_canonical_forms_are_clean(spark, sf_dir):
    rows = dedup_url_canonical(spark, sf_dir).collect()
    assert sum(r["n_variants"] for r in rows) == 500
    assert len(rows) < 500  # canonicalization actually collapsed variants
    for r in rows:
        u = r["canonical_url"]
        assert u.startswith("https://src")  # lowercased, www-stripped
        assert ":443" not in u and "#" not in u and "utm_" not in u
        assert "&" not in u or u.index("?") < u.index("&")


def test_triangle_census_invariants(spark, sf_dir):
    row = graph_triangle_count(spark, sf_dir).collect()[0]
    # every triangle closes exactly 3 wedges
    assert 3 * row["n_triangles"] <= row["n_wedges"]
    assert 0 <= row["gcc_micro"] <= 1_000_000
    assert row["n_vertices"] <= 500
    # handshake bound: e <= v*(v-1)/2
    v, e = row["n_vertices"], row["n_edges"]
    assert e <= v * (v - 1) // 2


def test_triangle_plan_no_cartesian(spark, sf_dir):
    plan = executed_plan(graph_triangle_count(spark, sf_dir))
    # the three scalar-combine crossJoins are broadcast single-row;
    # a CartesianProduct would mean the edge joins degenerated
    assert "CartesianProduct" not in plan, plan


def test_bpe_merge_counts_non_increasing(spark, sf_dir):
    rows = text_bpe_merges(spark, sf_dir).collect()
    counts = [r["pair_count"] for r in rows]
    assert len(counts) == 4
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r["merged"] == r["lhs"] + r["rhs"]


def test_bpe_merge_fixpoint_on_repeats(spark):
    """Left-to-right single-pass replace misses alternating repeats —
    the fixpoint iteration must not ('ababab' → 'ab ab ab')."""
    vocab = spark.createDataFrame(
        [("ababab", 1, " a b a b a b </w> ")], ["word", "cnt", "rep"]
    )
    out = _apply_merge(vocab, "a", "b").collect()[0]["rep"]
    assert out == " ab ab ab </w> ", repr(out)
