"""Local replica of the driver's DuckDB-oracle correctness check.

Runs each registered Spark query and its oracle SQL side-by-side and
compares row count, column names, and order-insensitive values (floats
compared bit-wise after a stable canonicalization — stricter than a
tolerance check, because the engine guarantees bit-identical numerics
via decimal aggregation / rounding).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import DataFrame, SparkSession

from parquet_batch_spark.catalog import TABLES, table_path


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""
    mismatches: list[str] = field(default_factory=list)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon(v):
    """Canonicalize a cell for order-insensitive comparison."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            return "0.0"  # collapse -0.0 / +0.0
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(x)}" for k, x in sorted(v.items())) + "}"
    return f"{type(v).__name__}:{v}"


def _rows_to_multiset(cols: list[str], rows: list[tuple]) -> dict[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out: dict[str, int] = {}
    for row in rows:
        key = "|".join(_canon(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def compare(
    name: str,
    spark_df: DataFrame,
    sql: str,
    con: duckdb.DuckDBPyConnection,
    max_report: int = 5,
) -> CompareResult:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = [tuple(r) for r in rel.fetchall()]

    if sorted(s_cols) != sorted(d_cols):
        return CompareResult(name, False, f"columns differ: spark={s_cols} duckdb={d_cols}")
    if len(s_rows) != len(d_rows):
        return CompareResult(
            name, False, f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"
        )
    s_ms = _rows_to_multiset(s_cols, s_rows)
    d_ms = _rows_to_multiset(d_cols, d_rows)
    if s_ms == d_ms:
        return CompareResult(name, True, f"{len(s_rows)} rows")
    mism = []
    for k in list(s_ms.keys()):
        if d_ms.get(k) != s_ms[k]:
            mism.append(f"spark-only: {k} ×{s_ms[k]} (duck has {d_ms.get(k, 0)})")
        if len(mism) >= max_report:
            break
    for k in list(d_ms.keys()):
        if s_ms.get(k) != d_ms[k]:
            mism.append(f"duck-only: {k} ×{d_ms[k]} (spark has {s_ms.get(k, 0)})")
        if len(mism) >= 2 * max_report:
            break
    return CompareResult(name, False, "value mismatch", mism)


def run_all(
    spark: SparkSession, sf_dir: str, only: list[str] | None = None
) -> list[CompareResult]:
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    con = duckdb_conn(sf_dir)
    results = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                results.append(compare(name, df, oracles[name], con))
            else:
                n = df.count()
                results.append(CompareResult(name, n >= 0, f"rows-only: {n} rows"))
        except Exception as ex:  # noqa: BLE001
            results.append(CompareResult(name, False, f"EXCEPTION: {ex}"))
    return results
