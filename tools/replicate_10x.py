"""Build the 10x key-shifted replication testdata used by ROADMAP's
scale-evidence tables.

Replicates the FACT tables (documents / embeddings / events / orders /
lineitem / customer) 10x with consistently shifted keys — dup-dense by
construction (every document gains 9 exact copies, the adversarial
case for the dedup family) and FK-consistent (lineitem.l_orderkey and
orders.o_orderkey shift together, o_custkey with c_custkey), so
fact-fact joins and the TPC-H core see real 10x/100x cardinality, not
a 10x orders table dangling against a 1x lineitem.  The slow-growing
dimensions (region/nation/supplier/part) pass through unchanged, as
they would at 100 TB.  Usage:

    python tools/replicate_10x.py [src_sf_dir] [dst_dir]

defaults: /root/testdata/sf0.01 -> /tmp/sf0.01_x10
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SHIFTS = {
    "documents": [("doc_id", 100_000)],
    "embeddings": [("vec_id", 100_000)],
    "events": [("event_id", 10_000_000), ("user_id", 100_000)],
    "orders": [("o_orderkey", 100_000_000), ("o_custkey", 10_000_000)],
    "lineitem": [("l_orderkey", 100_000_000)],
    "customer": [("c_custkey", 10_000_000)],
}
PASSTHROUGH = ("region", "nation", "supplier", "part")


def replicate(src: str, dst: str, factor: int = 10) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, shifts in SHIFTS.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'"
            ).fetchall()
        ]
        shifted = dict(shifts)
        sel = ", ".join(
            f"{c} + r*{shifted[c]} AS {c}" if c in shifted else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{table}.parquet'), "
            f"generate_series(0, {factor - 1}) AS t(r)) "
            f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
    for table in PASSTHROUGH:
        out = f"{dst}/{table}.parquet"
        if not os.path.exists(out):
            shutil.copy(f"{src}/{table}.parquet", out)
    print(f"replicated {factor}x: {src} -> {dst}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.01_x10"
    replicate(src, dst)
