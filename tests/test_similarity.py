"""LSH ANN quality gate: recall vs the exact brute-force baseline."""

from __future__ import annotations

from parquet_batch_spark.operators.similarity import (
    ann_bruteforce_topk,
    ann_lsh_bucketed,
)


def test_lsh_recall_against_bruteforce(spark, sf_dir):
    """The driver's embeddings are near-uniform (no cluster structure
    — worst case for LSH), so the honest gate is lift over a random
    candidate scan: radius-2 multiprobe examines ~37/256 ≈ 14% of the
    corpus, so random-baseline recall ≈ 0.14; require ≥ 2× that plus
    an absolute floor."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_bruteforce_topk(spark, sf_dir).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_lsh_bucketed(spark, sf_dir).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"LSH recall {recall:.2f} < 0.3 ({len(exact)} truth pairs)"
