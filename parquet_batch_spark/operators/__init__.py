"""Operator registry.

Each operator module exposes two dicts:

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLES: dict[str, str]``  (DuckDB ANSI-SQL equivalents; a query
  with no oracle entry gets the driver's weaker rows-only check)

``all_queries()`` / ``all_oracles()`` aggregate every module for the
driver contract in ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

_MODULES = [
    "parquet_batch_spark.operators.scans",
    "parquet_batch_spark.operators.sources_ext",
    "parquet_batch_spark.operators.relational",
    "parquet_batch_spark.operators.joins",
    "parquet_batch_spark.operators.tpch",
    "parquet_batch_spark.operators.tpch2",
    "parquet_batch_spark.operators.windows",
    "parquet_batch_spark.operators.analytics",
    "parquet_batch_spark.operators.scalar_funcs",
    "parquet_batch_spark.operators.udfs",
    "parquet_batch_spark.operators.text_analysis",
    "parquet_batch_spark.operators.dedup",
    "parquet_batch_spark.operators.similarity",
    "parquet_batch_spark.operators.multimodal",
    "parquet_batch_spark.streaming.windows",
]


def _modules():
    for name in _MODULES:
        try:
            yield import_module(name)
        except ImportError:
            continue


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        for key, fn in getattr(mod, "QUERIES", {}).items():
            if key in out:
                raise ValueError(f"duplicate query name {key!r} in {mod.__name__}")
            out[key] = fn
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLES", {}))
    return out
