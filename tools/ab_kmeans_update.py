"""A/B the k-means centroid-update job shapes over a FIXED assignment
table (alternating reps): r12 groupBy(k) + 64 element_at sums vs r11
posexplode + groupBy(k, d).

    python tools/ab_kmeans_update.py [pairs]
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
        _DIM,
        KM_K,
        _dvec,
        hash32,
    )
    from parquet_batch_spark.operators import similarity as sim
    from parquet_batch_spark.session import get_spark

    spark = get_spark("ab_kmeans")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    em = sim.fan_out(load(spark, SF_DIR, "embeddings"), spark)
    base = em.select(
        "vec_id",
        F.transform(_dvec(), lambda x: F.floor(x * 1_000_000).cast("long")).alias(
            "xq"
        ),
    ).localCheckpoint(eager=False)
    seed_rows = (
        base.withColumn("hk", hash32(F.col("vec_id").cast("string")))
        .orderBy("hk", "vec_id")
        .limit(KM_K)
        .collect()
    )
    cents = [list(r["xq"]) for r in seed_rows]
    carr = F.lit(cents)
    cand = F.transform(
        F.sequence(F.lit(1), F.lit(KM_K)),
        lambda k: F.struct(
            F.aggregate(
                F.sequence(F.lit(1), F.lit(_DIM)),
                F.lit(0).cast("long"),
                lambda acc, d: acc
                + (
                    F.element_at(F.col("xq"), d)
                    - F.element_at(F.element_at(carr, k), d)
                )
                * (
                    F.element_at(F.col("xq"), d)
                    - F.element_at(F.element_at(carr, k), d)
                ),
            ).alias("d2"),
            k.alias("k"),
        ),
    )
    assigned = (
        base.withColumn("best", F.array_min(cand))
        .select("vec_id", "xq", F.col("best.k").alias("k"))
        .localCheckpoint(eager=True)  # FIX the input so only the update is timed
    )

    cal = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        mat(spark.range(1 << 31).selectExpr("sum(id) AS s"))
        cal = min(cal, time.monotonic() - t0)
    print(f"cpu_calibration {cal:.3f}", flush=True)

    def upd64():
        assigned.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.element_at("xq", d)).alias(f"s{d}")
                for d in range(1, _DIM + 1)
            ],
        ).collect()

    def upd_pe():
        (
            assigned.select("k", F.posexplode("xq").alias("d", "xv"))
            .groupBy("k", "d")
            .agg(F.sum("xv").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )

    best: dict[str, float] = {}
    runs: dict[str, list[float]] = {"upd64": [], "updPE": []}
    for _ in range(pairs):
        for name, fn in (("upd64", upd64), ("updPE", upd_pe)):
            t0 = time.monotonic()
            fn()
            dt = round(time.monotonic() - t0, 3)
            runs[name].append(dt)
            best[name] = min(best.get(name, float("inf")), dt)
    for name in runs:
        print(f"{name}: best {best[name]:.3f}  runs {runs[name]}", flush=True)


if __name__ == "__main__":
    main()
