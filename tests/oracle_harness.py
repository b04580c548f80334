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


def _type_sig(t) -> str:
    """Canonical Arrow type signature: nested child field names (e.g.
    ``list<element: …>`` vs DuckDB's ``list<l: …>``) don't affect value
    hashing, so normalize them away."""
    import pyarrow as pa

    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_type_sig(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{_type_sig(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{_type_sig(t.key_type)},{_type_sig(t.item_type)}>"
    return str(t)


def check_driver_hashable(name: str, spark_df: DataFrame) -> CompareResult:
    """The driver's canonicalizer pandas-sorts over ALL output columns
    before hashing; a top-level array/map cell raises ``unhashable
    type: 'list'`` and records an ERR row regardless of correctness
    (the two r2 driver ERRs). Every registered query — rows-only
    included — must therefore project only scalar top-level columns
    (``array_join`` lists, explode maps, or emit per-element scalars)."""
    from pyspark.sql import types as T

    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType))
    ]
    if bad:
        return CompareResult(
            name, False, "driver-unhashable top-level array/map columns", bad
        )
    return CompareResult(name, True, "hashable")


def check_types(
    name: str,
    spark_df: DataFrame,
    sql: str,
    con: duckdb.DuckDBPyConnection,
) -> CompareResult:
    """Driver-grade Arrow type check (schema-only, cheap): the driver
    hashes values over Arrow, where e.g. DuckDB's integer ``SUM``
    surfaces as ``decimal128(38,0)`` while Spark's is ``int64`` —
    identical Python values, different hashes (the round-1 tpch_q12 /
    source_json_roundtrip failures).  We hold oracles to exact Arrow
    type equality, stricter than the driver (which normalizes int
    widths), so any hasher is satisfied."""
    s_types = {f.name: _type_sig(f.type) for f in spark_df.limit(0).toArrow().schema}
    d_types = {
        f.name: _type_sig(f.type)
        for f in con.sql(f"SELECT * FROM ({sql}) LIMIT 0").arrow().schema
    }
    if sorted(s_types) != sorted(d_types):
        return CompareResult(
            name, False, f"columns differ: spark={sorted(s_types)} duckdb={sorted(d_types)}"
        )
    mism = [
        f"{c}: spark={s_types[c]} duckdb={d_types[c]}"
        for c in s_types
        if s_types[c] != d_types[c]
    ]
    if mism:
        return CompareResult(name, False, "arrow type mismatch", mism)
    return CompareResult(name, True, "types identical")


def compare(
    name: str,
    spark_df: DataFrame,
    sql: str,
    con: duckdb.DuckDBPyConnection,
    max_report: int = 5,
) -> CompareResult:
    tr = check_types(name, spark_df, sql, con)
    if not tr.ok:
        return tr
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
            hashable = check_driver_hashable(name, df)
            if not hashable.ok:
                results.append(hashable)
            elif name in oracles:
                results.append(compare(name, df, oracles[name], con))
            else:
                n = df.count()
                results.append(CompareResult(name, n >= 0, f"rows-only: {n} rows"))
        except Exception as ex:  # noqa: BLE001
            results.append(CompareResult(name, False, f"EXCEPTION: {ex}"))
    return results
