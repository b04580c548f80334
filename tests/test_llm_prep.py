"""Invariant tests for the llm_prep operators (beyond oracle parity):
packing conservation, mixture quota maths, paragraph-dedup accounting,
novelty bounds, quantization round-trip error, rarity monotonicity,
EWMA closed form, funnel monotonicity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from parquet_batch_spark.catalog import load
from parquet_batch_spark.operators.llm_prep import (
    EWMA_LAGS,
    MIX_W_SUM,
    PACK_BUDGET,
    SEG_TOKENS,
    curation_pipeline_funnel,
    dedup_incremental_novelty,
    dedup_paragraph,
    embedding_quantize_int8,
    sample_mix_domains,
    seq_pack_chunks,
    text_rarity_score,
    window_ewma_decay,
)


def test_seq_pack_conserves_docs_and_tokens(spark, sf_dir):
    """Packing is a partition of the corpus: every document lands in
    exactly one sequence, token totals are conserved, and within each
    lang the sequence ids are contiguous from 0."""
    rows = seq_pack_chunks(spark, sf_dir).collect()
    d = load(spark, sf_dir, "documents")
    n_docs = d.count()
    tok_total = d.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t")
    ).collect()[0]["t"]
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["seq_tokens"] for r in rows) == tok_total
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["seq_id"])
    for lang, ids in by_lang.items():
        assert sorted(ids) == list(range(len(ids))), lang
    # every non-final sequence must contain at least one doc (by
    # construction of floor(offset/budget) no seq_id is skipped), and
    # a sequence's token count is at least 1
    assert all(r["seq_tokens"] >= 1 for r in rows)


def test_seq_pack_budget_bound(spark, sf_dir):
    """A sequence's STARTING offsets all lie within one budget window,
    so its token count is < budget + the max document length (boundary
    docs straddle; that's the concat-and-chunk contract)."""
    d = load(spark, sf_dir, "documents")
    max_doc = d.select(
        F.max(F.size(F.split(F.trim("text"), r"\s+"))).alias("m")
    ).collect()[0]["m"]
    rows = seq_pack_chunks(spark, sf_dir).collect()
    for r in rows:
        assert r["seq_tokens"] < PACK_BUDGET + max_doc


def test_mix_quota_and_take(spark, sf_dir):
    rows = sample_mix_domains(spark, sf_dir).collect()
    d = load(spark, sf_dir, "documents")
    n_total = d.count()
    avail = {
        r["source"]: r["n"]
        for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    n_target = n_total // 4
    for r in rows:
        expect_quota = int(r["w"] * n_target / MIX_W_SUM)
        assert r["quota"] == expect_quota, r
        assert r["taken"] == min(r["quota"], avail[r["source"]]), r
    # weights follow the declared tiers
    tiers = {r["source"]: r["w"] for r in rows}
    assert tiers["src0"] == 4 and tiers["src5"] == 2 and tiers["src15"] == 1


def test_dedup_paragraph_accounting(spark, sf_dir):
    """Per-doc: kept <= segs; global: total kept == number of distinct
    segment contents; segs match ceil(n_tok/SEG_TOKENS)."""
    rows = dedup_paragraph(spark, sf_dir).collect()
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    expect_segs = {
        r["doc_id"]: r["s"]
        for r in d.select(
            "doc_id",
            F.ceil(F.size(toks) / F.lit(SEG_TOKENS)).cast("long").alias("s"),
        ).collect()
    }
    n_distinct = (
        d.select(
            F.posexplode(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.ceil(F.size(toks) / F.lit(SEG_TOKENS)).cast("int"),
                    ),
                    lambda i: F.concat_ws(
                        " ", F.slice(toks, (i - 1) * SEG_TOKENS + 1, SEG_TOKENS)
                    ),
                )
            ).alias("p", "seg")
        )
        .select("seg")
        .distinct()
        .count()
    )
    assert all(0 <= r["n_kept"] <= r["n_segs"] for r in rows)
    assert all(r["n_segs"] == expect_segs[r["doc_id"]] for r in rows)
    assert sum(r["n_kept"] for r in rows) == n_distinct


def test_novelty_bounds_and_split(spark, sf_dir):
    rows = dedup_incremental_novelty(spark, sf_dir).collect()
    assert all(r["doc_id"] % 2 == 1 for r in rows), "incoming = odd ids"
    for r in rows:
        assert 0 <= r["n_seen_grams"] <= r["n_grams"]
        assert -1e-9 <= r["novelty"] <= 1.0
        if r["is_exact_dup"]:
            # identical text ⇒ identical shingles ⇒ nothing novel
            assert r["n_seen_grams"] == r["n_grams"]


def test_quantize_roundtrip_error_bound(spark, sf_dir):
    """code/127*maxabs reconstructs each element within half a step
    (checked via the checksums: |q_sum| <= q_l1 <= 127*n_dims), and
    every vector saturates at least once (its max-abs element)."""
    rows = embedding_quantize_int8(spark, sf_dir).collect()
    for r in rows:
        assert abs(r["q_sum"]) <= r["q_l1"] <= 127 * r["n_dims"]
        assert r["n_sat"] >= 1, "max-abs element must hit ±127"
        assert r["scale6"] >= 0


def test_rarity_rare_scores_higher(spark, sf_dir):
    """A word appearing in every document contributes ~0 bits; the
    corpus-mean rarity must be strictly positive (not all words are
    everywhere) and every per-doc mean must be >= 0 and <= bitlen(N)."""
    rows = text_rarity_score(spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    cap = len(bin(n_docs)) - 2  # bitlen
    assert all(0 <= r["rarity_mean"] <= cap for r in rows)
    assert sum(r["rarity_sum"] for r in rows) > 0


def test_ewma_closed_form_single_user(spark, sf_dir):
    """Recompute one user's decayed score in Python from the raw
    events and match the operator bit-for-bit."""
    ev = load(spark, sf_dir, "events")
    uid = ev.select("user_id").orderBy("user_id").first()["user_id"]
    hist = (
        ev.filter(F.col("user_id") == uid)
        .select("ts", "event_id", "value")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(EWMA_LAGS)
        .collect()
    )
    expect = 0
    for k, row in enumerate(hist):  # k = lag from the latest event
        v = math.floor(row["value"] * 100.0)
        expect += v * (1 << (EWMA_LAGS - 1 - k))
    got = {
        r["user_id"]: r["ewma_scaled"]
        for r in window_ewma_decay(spark, sf_dir).collect()
    }
    assert got[uid] == expect


def test_funnel_monotonic(spark, sf_dir):
    rows = {r["stage"]: r for r in curation_pipeline_funnel(spark, sf_dir).collect()}
    order = ["0_all", "1_lang", "2_quality", "3_dedup", "4_decontam"]
    assert set(rows) == set(order)
    prev = None
    for st in order:
        s = rows[st]["survivors"]
        if prev is not None:
            assert s <= prev, st
            assert rows[st]["dropped"] == prev - s, st
        prev = s
    assert rows["0_all"]["survivors"] == load(spark, sf_dir, "documents").count()
    assert rows["4_decontam"]["survivors"] > 0, "funnel must not empty the corpus"


def test_feature_hashing_conserves_token_mass(spark, sf_dir):
    from parquet_batch_spark.catalog import load
    from parquet_batch_spark.functions.text import tokens_col
    from parquet_batch_spark.operators.llm_prep import (
        FH_BUCKETS,
        feature_hashing_vectorize,
    )

    rows = feature_hashing_vectorize(spark, sf_dir).collect()
    total_tokens = (
        load(spark, sf_dir, "documents")
        .select(F.size(tokens_col("text")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert sum(r["token_mass"] for r in rows) == total_tokens
    assert all(0 <= r["bucket"] < FH_BUCKETS for r in rows)
    assert all(r["n_distinct_tokens"] >= 1 for r in rows)


def test_blocking_quality_metric_ranges(spark, sf_dir):
    from parquet_batch_spark.operators.llm_prep import dedup_blocking_quality

    r = dedup_blocking_quality(spark, sf_dir).collect()[0]
    assert 0 <= r["n_caught"] <= r["n_true"]
    assert 0 <= r["pair_completeness_micro"] <= 1_000_000
    # blocking must beat all-pairs by a wide margin
    assert r["reduction_ratio_micro"] > 900_000
    assert r["n_true"] > 0  # the prefix proxy finds families in this corpus


def test_neyman_allocation_budget(spark, sf_dir):
    from parquet_batch_spark.operators.llm_prep import (
        NEYMAN_TOTAL,
        sample_neyman_allocation,
    )

    rows = sample_neyman_allocation(spark, sf_dir).collect()
    alloc = sum(r["n_alloc"] for r in rows)
    # floor() loses at most one unit per stratum
    assert NEYMAN_TOTAL - len(rows) <= alloc <= NEYMAN_TOTAL
    assert all(r["s_micro"] > 0 for r in rows)


def test_source_gini_range(spark, sf_dir):
    from parquet_batch_spark.operators.llm_prep import quality_source_gini

    r = quality_source_gini(spark, sf_dir).collect()[0]
    assert r["n_sources"] == 20
    assert 0 <= r["gini_micro"] < 1_000_000
    # top share is at least 1/n and at most total
    assert 1_000_000 // 20 <= r["top_share_micro"] < 1_000_000


def test_boilerplate_reach_ordering(spark, sf_dir):
    from parquet_batch_spark.operators.llm_prep import (
        BOILER_MIN_DOCS,
        text_boilerplate_segments,
    )

    rows = text_boilerplate_segments(spark, sf_dir).collect()
    assert rows
    reaches = [r["n_docs"] for r in rows]
    assert reaches == sorted(reaches, reverse=True)
    assert all(r["n_docs"] >= BOILER_MIN_DOCS for r in rows)
    assert all(0 < r["reach_micro"] <= 1_000_000 for r in rows)


def test_funnel_latency_consistency(spark, sf_dir):
    from parquet_batch_spark.operators.warehouse import (
        window_funnel,
        window_funnel_latency,
    )

    lat = window_funnel_latency(spark, sf_dir).collect()[0]
    funnel = {r["step_no"]: r["users"] for r in window_funnel(spark, sf_dir).collect()}
    assert lat["n_converters"] == funnel[3]  # completers == step-3 users
    assert 0 < lat["median_view_click_us"]
    assert lat["median_total_us"] >= lat["median_view_click_us"]
