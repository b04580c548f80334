"""A/B the two embedding_geometric_median shapes (r11 posexplode vs
r12 grouping-free 64-column aggregate), per-phase, alternating reps.

    python tools/ab_gm.py [pairs]

Phases timed separately so the regression's locus is visible:
  mean64   — r12 mean pass (no-grouping, 64 long element_at sums)
  meanPE   — r11 mean pass (posexplode + groupBy(d))
  wei64    — r12 Weiszfeld pass (no-grouping, 64 decimal sums)
  weiPE    — r11 Weiszfeld pass (posexplode + groupBy(d), decimal)
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

    from parquet_batch_spark.catalog import load
    from parquet_batch_spark.operators.similarity import (
        GM_DIMS,
        GM_W_SCALE,
        _trunc_div,
    )
    from parquet_batch_spark.session import get_spark

    spark = get_spark("ab_gm")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    emb = load(spark, SF_DIR, "embeddings")
    xq = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * 1000000).cast("long")
    )
    rows = emb.select(xq.alias("xq"))
    rows.cache()
    mat(rows)  # materialize cache once, outside timed region

    cal = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        mat(spark.range(1 << 31).selectExpr("sum(id) AS s"))
        cal = min(cal, time.monotonic() - t0)
    print(f"cpu_calibration {cal:.3f}", flush=True)

    # fixed center for the Weiszfeld phases: the true mean
    srow = rows.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.element_at("xq", d)).alias(f"s{d}") for d in range(1, GM_DIMS + 1)],
    ).collect()[0]
    n = int(srow["n"])
    c = [_trunc_div(int(srow[f"s{d}"]), n) for d in range(1, GM_DIMS + 1)]
    carr = F.lit([int(v) for v in c])
    dist2 = F.aggregate(
        F.zip_with("xq", carr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    w = F.expr(
        f"cast({GM_W_SCALE} as bigint)"
        " div greatest(cast(floor(sqrt(cast(dist2 as double))) as bigint), 1)"
    )
    staged = rows.select(dist2.alias("dist2"), "xq").select(w.alias("w"), "xq")
    wdec = F.col("w").cast("decimal(20,0)")

    def mean64():
        rows.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.element_at("xq", d)).alias(f"s{d}")
                for d in range(1, GM_DIMS + 1)
            ],
        ).collect()

    def mean_pe():
        (
            rows.select(F.posexplode("xq").alias("d", "xv"))
            .groupBy("d")
            .agg(F.sum("xv").alias("s"), F.count(F.lit(1)).alias("n"))
            .orderBy("d")
            .collect()
        )

    def wei64():
        staged.agg(
            F.sum(wdec).alias("den"),
            *[
                F.sum(wdec * F.element_at("xq", d)).alias(f"num{d}")
                for d in range(1, GM_DIMS + 1)
            ],
        ).collect()

    def wei_pe():
        (
            staged.select("w", F.posexplode("xq").alias("d", "xv"))
            .groupBy("d")
            .agg(
                F.sum(F.col("w").cast("decimal(20,0)") * F.col("xv")).alias("num"),
                F.sum(F.col("w").cast("decimal(20,0)")).alias("den"),
            )
            .select("d", F.expr("cast(num div den as long)").alias("cnew"))
            .orderBy("d")
            .collect()
        )

    phases = [("mean64", mean64), ("meanPE", mean_pe), ("wei64", wei64), ("weiPE", wei_pe)]
    best: dict[str, float] = {}
    runs: dict[str, list[float]] = {k: [] for k, _ in phases}
    for _ in range(pairs):
        for name, fn in phases:
            t0 = time.monotonic()
            fn()
            dt = round(time.monotonic() - t0, 3)
            runs[name].append(dt)
            best[name] = min(best.get(name, float("inf")), dt)
    for name, _ in phases:
        print(f"{name}: best {best[name]:.3f}  runs {runs[name]}", flush=True)


if __name__ == "__main__":
    main()
