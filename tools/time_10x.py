"""Time registered queries at 1x vs 10x replication (ROADMAP evidence).

    python tools/replicate_10x.py            # build the 10x dir first
    python tools/time_10x.py q1 q2 ...       # then time any query names
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_batch_spark.operators import all_queries  # noqa: E402
from parquet_batch_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("time10x")
    qs = all_queries()

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    dirs = ["/root/testdata/sf0.01", "/tmp/sf0.01_x10"]
    if os.path.isdir("/tmp/sf0.01_x100"):
        dirs.append("/tmp/sf0.01_x100")  # 100x, when built
    for sf in dirs:
        mat(qs["scan_count"](spark, sf))
        for name in names:
            best = float("inf")
            for _ in range(2):
                t0 = time.monotonic()
                mat(qs[name](spark, sf))
                best = min(best, time.monotonic() - t0)
            print(f"{sf.rsplit('/', 1)[-1]:12s} {name:28s} {best:.2f}s", flush=True)


if __name__ == "__main__":
    main()
