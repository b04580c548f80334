"""Oracle-parity spot check for named ops at one or more SFs.

    python tools/check_ops.py sf0.01,sf0.1 name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sfs = [f"/root/testdata/{s}" for s in sys.argv[1].split(",")]
    names = sys.argv[2:]
    from parquet_batch_spark.session import get_spark
    from tests.oracle_harness import compare, duckdb_conn

    import __spark_entry__ as e

    spark = get_spark("check_ops")
    qs, osql = e.queries(), e.oracle_sql()
    bad = 0
    for sf in sfs:
        con = duckdb_conn(sf)
        for name in names:
            t0 = time.monotonic()
            try:
                r = compare(name, qs[name](spark, sf), osql[name], con)
                ok = r.ok
                detail = "" if ok else r.detail
            except Exception as exc:  # noqa: BLE001
                ok, detail = False, str(exc)[:300]
            dt = time.monotonic() - t0
            print(
                f"{os.path.basename(sf)} {name}: "
                f"{'OK' if ok else 'FAIL ' + detail} ({dt:.2f}s)",
                flush=True,
            )
            bad += 0 if ok else 1
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
