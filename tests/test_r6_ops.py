"""Invariant tests for the r6 ops.  The oracle-parity suite covers
cross-engine hash equality; these pin the statistical/algorithmic
semantics independently, against pure-Python reference computations
on collected inputs (small at the test SF)."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from parquet_batch_spark.catalog import load
from parquet_batch_spark.operators.pipeline_ops import (
    NULLITY_BIG_ORDER,
    quality_nullity_patterns,
)
from parquet_batch_spark.operators.stats_ops import (
    ISO_BINS,
    ml_isotonic_calibration,
    ml_mcc_balanced_accuracy,
)
from parquet_batch_spark.operators.text_analysis import (
    WIMBD_TOPK,
    quality_wimbd_top_ngrams,
)


def _doc_rows(spark, sf_dir):
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text", "n_chars")
        .collect()
    )


def test_mcc_matches_python_confusion(spark, sf_dir):
    rows = _doc_rows(spark, sf_dir)
    tp = fp = fn = tn = 0
    for r in rows:
        y = 1 if "data" in r["text"].strip().split() else 0
        p = 1 if r["n_chars"] >= 300 else 0
        if y and p:
            tp += 1
        elif not y and p:
            fp += 1
        elif y and not p:
            fn += 1
        else:
            tn += 1
    got = ml_mcc_balanced_accuracy(spark, sf_dir).collect()[0]
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (tp, fp, fn, tn)
    denom = math.sqrt(float((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)))
    assert got["mcc_micro"] == math.floor(1e6 * (tp * tn - fp * fn) / denom)
    # truncating integer division (Spark div semantics; all terms >= 0)
    bal = (1_000_000 * tp * (tn + fp) + 1_000_000 * tn * (tp + fn)) // (
        2 * (tp + fn) * (tn + fp)
    )
    assert got["balanced_accuracy_micro"] == bal
    j = 1_000_000 * tp // (tp + fn) + 1_000_000 * tn // (tn + fp) - 1_000_000
    assert got["youden_j_micro"] == j


def test_isotonic_fit_is_monotone_and_matches_pava(spark, sf_dir):
    rows = _doc_rows(spark, sf_dir)
    bins: dict[int, list[int]] = {}
    for r in rows:
        s = min(1_000_000, 1_000_000 * r["n_chars"] // 3000)
        b = s * ISO_BINS // 1_000_001
        y = 1 if "data" in r["text"].strip().split() else 0
        bins.setdefault(b, []).append(y)
    order = sorted(bins)
    n = [len(bins[b]) for b in order]
    pos = [sum(bins[b]) for b in order]
    # classic PAVA with weighted pools
    pools: list[list[float]] = []  # [sum_pos, sum_n]
    for p, w in zip(pos, n):
        pools.append([float(p), float(w)])
        while len(pools) > 1 and (
            pools[-2][0] * pools[-1][1] >= pools[-1][0] * pools[-2][1]
        ):
            a = pools.pop()
            pools[-1][0] += a[0]
            pools[-1][1] += a[1]
    # expand pools back to per-bin fits
    fit = []
    i = 0
    for pool in pools:
        w = pool[1]
        consumed = 0.0
        while consumed < w - 1e-9:
            fit.append(pool[0] / pool[1])
            consumed += n[i]
            i += 1
    got = {
        r["bin"]: r
        for r in ml_isotonic_calibration(spark, sf_dir).collect()
    }
    assert sorted(got) == order
    prev = -1
    for b, f in zip(order, fit):
        iso = got[b]["isotonic_micro"]
        # minimax == PAVA (floors can differ by at most the float ulp
        # of identical pool means — they are the same rational)
        assert iso == math.floor(1e6 * f), (b, iso, f)
        assert iso >= prev, "isotonic fit must be non-decreasing"
        prev = iso
        assert got[b]["n"] == n[order.index(b)]


def test_nullity_patterns_account_every_customer(spark, sf_dir):
    c = load(spark, sf_dir, "customer").count()
    ev_users = {
        r[0]
        for r in load(spark, sf_dir, "events").select("user_id").distinct().collect()
    }
    big_cust = {
        r[0]
        for r in load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= NULLITY_BIG_ORDER)
        .select("o_custkey")
        .distinct()
        .collect()
    }
    cust = [
        r[0]
        for r in load(spark, sf_dir, "customer").select("c_custkey").collect()
    ]
    expect = Counter(
        (1 if k in ev_users else 0, 1 if k in big_cust else 0) for k in cust
    )
    rows = quality_nullity_patterns(spark, sf_dir).collect()
    assert sum(r["n_customers"] for r in rows) == c
    for r in rows:
        assert r["n_customers"] == expect[(r["has_events"], r["has_big_order"])]
        assert r["n_total"] == c
        assert r["share_micro"] == 1_000_000 * r["n_customers"] // c
    # both optional fields must actually be missing somewhere (the op
    # is vacuous otherwise)
    assert any(r["has_events"] == 0 for r in rows)
    assert any(r["has_events"] == 1 for r in rows)


def test_wimbd_top_ngrams_matches_python_counts(spark, sf_dir):
    rows = _doc_rows(spark, sf_dir)
    counts: Counter[str] = Counter()
    docs: dict[str, set] = {}
    total = 0
    for r in rows:
        toks = r["text"].strip().split()
        total += max(len(toks) - 2, 0)
        for i in range(len(toks) - 2):
            g = " ".join(toks[i : i + 3])
            counts[g] += 1
            docs.setdefault(g, set()).add(r["doc_id"])
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:WIMBD_TOPK]
    got = quality_wimbd_top_ngrams(spark, sf_dir).collect()
    assert len(got) == min(WIMBD_TOPK, len(counts))
    for row, (g, cnt) in zip(got, top):
        assert row["gram"] == g
        assert row["n_occurrences"] == cnt
        assert row["n_docs"] == len(docs[g])
        assert row["n_total_positions"] == total
        assert row["share_micro"] == 1_000_000 * cnt // total
