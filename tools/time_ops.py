"""Bench-style isolated timing for named ops: warm session, noop sink,
best-of-N adjacent runs (same methodology as bench.py pass 2).

    python tools/time_ops.py [-nN] name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    n = 2
    if args and args[0].startswith("-n"):
        n = int(args[0][2:])
        args = args[1:]
    from pyspark.sql import functions as F

    from parquet_batch_spark.catalog import load
    from parquet_batch_spark.operators import all_queries
    from parquet_batch_spark.session import get_spark

    spark = get_spark("time_ops")
    qs = all_queries()

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    # same warmups as bench.py: scan every big table + python workers
    for t in ("lineitem", "documents", "embeddings", "events", "orders"):
        mat(load(spark, SF_DIR, t).select(F.count(F.lit(1))))
    mat(
        spark.range(spark.sparkContext.defaultParallelism).mapInArrow(
            lambda it: it, "id long"
        )
    )
    cal = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        mat(spark.range(1 << 31).selectExpr("sum(id) AS s"))
        cal = min(cal, time.monotonic() - t0)
    print(f"cpu_calibration {cal:.3f}", flush=True)
    for name in args:
        runs = []
        for _ in range(n):
            t0 = time.monotonic()
            mat(qs[name](spark, SF_DIR))
            runs.append(round(time.monotonic() - t0, 3))
        print(f"{name}: best {min(runs):.3f}  runs {runs}", flush=True)


if __name__ == "__main__":
    main()
