"""A/B graph_pagerank checkpoint cadences in one session, alternating.

    python tools/ab_pagerank.py [pairs]

Variants (identical integer trajectory — checkpoints don't change
results, only lineage):
  every1_eager  — current op: localCheckpoint(eager=True) every round
  every2_lazy   — checkpoint every OTHER round, eager=False (kcore's
                  measured cadence)
  every2_eager  — every other round, eager=True
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    from parquet_batch_spark.operators.dedup import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_ITERS,
        PR_SCALE,
        dedup_minhash_lsh,
    )
    from parquet_batch_spark.session import get_spark

    spark = get_spark("ab_pagerank")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    def run(cadence: int, eager: bool) -> None:
        pairs_df = dedup_minhash_lsh(spark, SF_DIR).select("doc_a", "doc_b")
        edges = pairs_df.union(
            pairs_df.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        )
        deg = edges.groupBy("doc_a").agg(F.count(F.lit(1)).alias("deg"))
        e2 = (
            edges.join(deg, "doc_a")
            .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"), "deg")
            .localCheckpoint(eager=True)
        )
        n_nodes = deg.count()
        init = PR_SCALE // n_nodes
        base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * n_nodes)
        ranks = deg.select(F.col("doc_a").alias("doc"), F.lit(init).alias("r"))
        for i in range(PR_ITERS):
            contrib = e2.join(ranks, e2.src == ranks.doc).select(
                F.col("dst").alias("doc"), F.expr("r div deg").alias("c")
            )
            ranks = (
                contrib.groupBy("doc")
                .agg(F.sum("c").alias("s"))
                .select(
                    "doc",
                    (
                        F.lit(base)
                        + F.expr(f"({PR_DAMP_NUM} * s) div {PR_DAMP_DEN}")
                    ).alias("r"),
                )
            )
            if i % cadence == cadence - 1:
                ranks = ranks.localCheckpoint(eager=eager)
        mat(
            ranks.select(
                F.col("doc").alias("doc_id"),
                F.col("r").alias("rank_fp"),
                F.round(
                    F.col("r").cast("double") / F.lit(float(PR_SCALE)), 9
                ).alias("rank"),
            ).orderBy("doc_id")
        )

    # warm the shared LSH candidate stage outside the timed region
    mat(dedup_minhash_lsh(spark, SF_DIR))
    cal = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        mat(spark.range(1 << 31).selectExpr("sum(id) AS s"))
        cal = min(cal, time.monotonic() - t0)
    print(f"cpu_calibration {cal:.3f}", flush=True)

    variants = [
        ("every1_eager", 1, True),
        ("every2_lazy", 2, False),
        ("every2_eager", 2, True),
    ]
    best: dict[str, float] = {}
    runs: dict[str, list[float]] = {n: [] for n, _, _ in variants}
    for _ in range(pairs):
        for name, cadence, eager in variants:
            t0 = time.monotonic()
            run(cadence, eager)
            dt = round(time.monotonic() - t0, 3)
            runs[name].append(dt)
            best[name] = min(best.get(name, float("inf")), dt)
    for name, _, _ in variants:
        print(f"{name}: best {best[name]:.3f}  runs {runs[name]}", flush=True)


if __name__ == "__main__":
    main()
