"""Scan / projection / filter operators — the reference-parity core.

These re-express the reference library's entire operator surface
(SMurphyDev/parquet-batch, src/parquetreader/reader.py):

- O1/O2 parquet scan of file or multi-file dataset  → spark.read.parquet
- O4 column projection pushdown (reader.py:90-92)   → df.select
- O9 predicate passthrough (reader.py:47-49)        → df.filter

Catalyst pushes both the projection (ReadSchema) and the predicates
(PushedFilters → parquet row-group stats) into the scan; tests assert
this on the physical plan (see tests/test_pushdown.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_batch_spark.catalog import load


def scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned scan: only 3 of 11 lineitem columns are read
    (reference O4, reader.py:90-92)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_quantity")


_SCAN_PROJECTION_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
"""


def scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table row count. Catalyst prunes the projection to ZERO
    columns (``ReadSchema: struct<>``), so the scan materializes no
    column data — the vectorized reader emits row counts from parquet
    metadata. (Spark's DSv2 PushedAggregation would collapse even the
    partial-count stage, but parquet defaults to the V1 source; the
    empty-projection path is equally metadata-bound.)"""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(F.count(F.lit(1)).alias("n_rows"))


_SCAN_COUNT_SQL = "SELECT COUNT(*) AS n_rows FROM lineitem"


def filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicates pushed to row-group stats
    (reference O9 `filter=` passthrough, reader.py:47-49)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 45)
        & (F.col("l_discount") > 0.05)
        & ((F.col("l_returnflag") == "R") | (F.col("l_linestatus") == "O"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


_FILTER_PUSHDOWN_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
FROM lineitem
WHERE l_quantity >= 45 AND l_discount > 0.05
  AND (l_returnflag = 'R' OR l_linestatus = 'O')
"""


def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic: IS NULL / IS NOT NULL / NOT IN with nulls.

    json props with a missing key produce NULL — the filter must keep
    SQL null semantics identical to the oracle.
    """
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.missing_key")
    return (
        ev.withColumn("mk", k)
        .filter(F.col("mk").isNull() & F.col("event_type").isin("click", "view"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


_FILTER_NULL_SQL = """
SELECT event_type, COUNT(*) AS n
FROM (
    SELECT event_type, json_extract_string(props, '$.missing_key') AS mk
    FROM events
)
WHERE mk IS NULL AND event_type IN ('click', 'view')
GROUP BY event_type
ORDER BY event_type
"""


def scan_multifile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-file dataset scan (reference O2: dir-of-parquet as one
    table, reader.py:128-129): read several tables' paths in one
    spark.read call and count per source file."""
    paths = [f"{sf_dir}/region.parquet", f"{sf_dir}/nation.parquet"]
    r = spark.read.parquet(paths[0]).agg(F.count(F.lit(1)).alias("n")).withColumn(
        "src", F.lit("region")
    )
    n = spark.read.parquet(paths[1]).agg(F.count(F.lit(1)).alias("n")).withColumn(
        "src", F.lit("nation")
    )
    return r.union(n).select("src", "n").orderBy("src")


_SCAN_MULTIFILE_SQL = """
SELECT 'region' AS src, COUNT(*) AS n FROM region
UNION ALL
SELECT 'nation' AS src, COUNT(*) AS n FROM nation
ORDER BY src
"""


def scan_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.observe`` / ``Observation`` — pipeline health counters that
    piggyback the SAME pass as the work (CollectMetrics plan nodes):
    rows/quantity at the scan, rows/quantity after the quality filter,
    and the keep ratio. At 100 TB this replaces the classic
    "run the job, then run COUNT(*) twice more to fill the run report"
    pattern — the metrics are aggregated by executors inline and cost
    nothing beyond the registers. Observe nodes also pin filter
    placement: the scan-level observation counts PRE-filter rows even
    though the filter would otherwise push into the scan (verified —
    that subtlety is the point of checking rows_scanned).

    The exact-decimal quantity sums flow through the same numeric
    policy as every other aggregate, so the observed values
    hash-match the oracle bit-for-bit."""
    from pyspark.sql import Observation

    from parquet_batch_spark.functions.numeric import dsum

    li = load(spark, sf_dir, "lineitem")
    scan_obs = Observation("scan")
    kept_obs = Observation("kept")
    kept = (
        li.observe(
            scan_obs,
            F.count(F.lit(1)).alias("rows_scanned"),
            dsum("l_quantity", "qty_scanned"),
        )
        .filter(F.col("l_quantity") > 25)
        .observe(
            kept_obs,
            F.count(F.lit(1)).alias("rows_kept"),
            dsum("l_quantity", "qty_kept"),
        )
    )
    kept.count()  # one action; both observations fill from this pass
    m = {**scan_obs.get, **kept_obs.get}
    return spark.createDataFrame(
        [
            (
                m["rows_scanned"],
                m["qty_scanned"],
                m["rows_kept"],
                m["qty_kept"],
                float(m["rows_kept"]) / float(m["rows_scanned"]),
            )
        ],
        schema="rows_scanned long, qty_scanned double, rows_kept long, "
        "qty_kept double, keep_ratio double",
    )


def _observed_sql() -> str:
    from parquet_batch_spark.functions.numeric import sql_dsum

    kept_sum = (
        "CAST(CAST(SUM(CASE WHEN l_quantity > 25 THEN "
        "CAST(l_quantity AS DECIMAL(18,4)) END) AS DECIMAL(18,6)) AS DOUBLE)"
    )
    return f"""
SELECT COUNT(*) AS rows_scanned,
       {sql_dsum("l_quantity")} AS qty_scanned,
       COUNT(*) FILTER (l_quantity > 25) AS rows_kept,
       {kept_sum} AS qty_kept,
       CAST(COUNT(*) FILTER (l_quantity > 25) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
           AS keep_ratio
FROM lineitem
"""


QUERIES = {
    "scan_observed_metrics": scan_observed_metrics,
    "scan_projection": scan_projection,
    "scan_count": scan_count,
    "scan_multifile": scan_multifile,
    "filter_pushdown": filter_pushdown,
    "filter_null_semantics": filter_null_semantics,
}

ORACLES = {
    "scan_observed_metrics": _observed_sql(),
    "scan_projection": _SCAN_PROJECTION_SQL,
    "scan_count": _SCAN_COUNT_SQL,
    "scan_multifile": _SCAN_MULTIFILE_SQL,
    "filter_pushdown": _FILTER_PUSHDOWN_SQL,
    "filter_null_semantics": _FILTER_NULL_SQL,
}
