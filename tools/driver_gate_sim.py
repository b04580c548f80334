"""Full driver-gate simulation: a VANILLA SparkSession (none of our
session-factory configs), entry() smoke check, then every registered
query compared against its DuckDB oracle at sf0.01 — the exact shape
of the grading driver's correctness pass, in one fresh process.

    python tools/driver_gate_sim.py [sf_dir] [slice]

``slice`` (optional, e.g. ``0:50`` or ``50:100``) restricts the run to
that window of registry order — the shape of one driver round's
50-entry check window, for pre-verifying an upcoming window exactly.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "10g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e
    from tests.oracle_harness import compare, duckdb_conn

    rows = e.entry(spark).collect()
    print(f"entry(): {len(rows)} rows", flush=True)
    con = duckdb_conn(sf)
    qs, osql = e.queries(), e.oracle_sql()
    if len(sys.argv) > 2:
        a, _, b = sys.argv[2].partition(":")
        names = list(qs)[int(a or 0): int(b) if b else None]
        qs = {n: qs[n] for n in names}
    t0 = time.monotonic()
    fails = []
    for i, (name, fn) in enumerate(qs.items(), 1):
        try:
            r = compare(name, fn(spark, sf), osql[name], con)
            if not r.ok:
                fails.append((name, r.detail))
                print(f"[{i}/{len(qs)}] FAIL {name}: {r.detail}", flush=True)
        except Exception as exc:  # noqa: BLE001
            fails.append((name, str(exc)[:200]))
            print(f"[{i}/{len(qs)}] ERR {name}: {exc}", flush=True)
    wall = time.monotonic() - t0
    print(f"driver-gate sim: {len(qs) - len(fails)}/{len(qs)} green in {wall:.0f}s")
    if fails:
        sys.exit(1)


if __name__ == "__main__":
    main()
