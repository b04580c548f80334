"""Invariant tests for the third r4 operator batch: planted-duplicate
detection for the media fingerprint, rolling-median frame bounds,
surprisal model sanity, snapshot-diff reconciliation arithmetic."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from parquet_batch_spark.catalog import load
from parquet_batch_spark.operators.multimodal import (
    PHASH_BANDS,
    multimodal_dedup_phash,
)
from parquet_batch_spark.operators.text_analysis import text_bigram_surprisal
from parquet_batch_spark.operators.warehouse import etl_snapshot_diff
from parquet_batch_spark.operators.windows import ROLL_MED_N, window_rolling_median


def test_phash_finds_planted_duplicates(spark, tmp_path):
    """Two docs with identical text (different ids) share the whole
    content byte-stream, so all bands agree; a doc with different
    text shares none."""
    rows = [
        (1, "alpha beta gamma delta " * 8, "en", "src0", 0),
        (2, "alpha beta gamma delta " * 8, "en", "src0", 0),  # dup of 1
        (3, "omega psi chi phi " * 9, "en", "src0", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    out = {r["doc_id"]: r for r in multimodal_dedup_phash(spark, sf).collect()}
    assert out[1]["best_shared"] == PHASH_BANDS and out[1]["is_near_dup"]
    assert out[2]["best_shared"] == PHASH_BANDS and out[2]["n_partners"] == 1
    assert out[3]["n_partners"] == 0 and not out[3]["is_near_dup"]
    # identical content ⇒ identical fingerprint checksum
    assert out[1]["band_sum"] == out[2]["band_sum"] != out[3]["band_sum"]


def test_rolling_median_frame_bounds(spark, sf_dir):
    """The frame never exceeds ROLL_MED_N rows and the median lies
    within the global per-user value range."""
    rows = window_rolling_median(spark, sf_dir).collect()
    assert rows, "thinned output must not be empty"
    assert all(1 <= r["n_in_frame"] <= ROLL_MED_N for r in rows)
    rng = {
        r["user_id"]: (r["lo"], r["hi"])
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in rows:
        lo, hi = rng[r["user_id"]]
        assert lo <= r["rolling_median"] <= hi


def test_bigram_surprisal_model_sanity(spark, sf_dir):
    """Every doc with >= 2 tokens is scored; pair counts equal
    n_tok - 1; surprisal is non-negative (c2 <= c1 always)."""
    rows = text_bigram_surprisal(spark, sf_dir).collect()
    d = load(spark, sf_dir, "documents")
    expect = {
        r["doc_id"]: r["n"] - 1
        for r in d.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).collect()
        if r["n"] >= 2
    }
    got = {r["doc_id"]: r["n_pairs"] for r in rows}
    assert got == expect
    assert all(r["surprisal_sum"] >= 0 for r in rows)


def test_snapshot_diff_reconciles(spark, sf_dir):
    """added/removed/changed/unchanged partition the union of keys:
    n(v1) = removed + changed + unchanged, n(v2) = added + changed +
    unchanged, and the class sizes match the deterministic derivation
    rules."""
    out = {r["status"]: r for r in etl_snapshot_diff(spark, sf_dir).collect()}
    base = load(spark, sf_dir, "customer").select("c_custkey")
    n = base.count()
    n_removed = base.filter(F.col("c_custkey") % 19 == 0).count()
    n_added = base.filter(F.col("c_custkey") % 23 == 0).count()
    n_changed = base.filter(
        (F.col("c_custkey") % 19 != 0) & (F.col("c_custkey") % 7 == 0)
    ).count()
    assert out["removed"]["n_rows"] == n_removed
    assert out["added"]["n_rows"] == n_added
    assert out["changed"]["n_rows"] == n_changed
    assert out["unchanged"]["n_rows"] == n - n_removed - n_changed
