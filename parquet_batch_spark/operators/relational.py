"""Relational aggregation operators (TPC-H-style) over the star schema.

Every query is a declarative DataFrame plan: Catalyst pushes filters
and projections into the parquet scan, plans partial+final hash
aggregation (map-side combine), and AQE coalesces shuffle partitions —
the same plan shape that scales to 100 TB unchanged.

Aggregates use exact DECIMAL accumulation (see functions/numeric.py)
so results hash-match the DuckDB oracle bit-for-bit.

Reference parity note: the reference library (SMurphyDev/parquet-batch,
reader.py:47-97) exposes no aggregation operators — this module is the
extension layer mandated by the north star; its scan/filter/projection
underpinnings are the reference's O1-O9 surface re-expressed through
Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_batch_spark.catalog import fan_out, load
from parquet_batch_spark.functions.numeric import (
    davg,
    dec,
    dec9,
    dsum,
    dsum_expr,
    sql_davg,
    sql_dsum,
    sql_dsum_expr,
)

CUTOFF = "2001-09-01"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report.

    scan → filter (pushed to parquet row-group stats) → 8-way agg
    grouped by (returnflag, linestatus). Partial aggregation happens
    map-side; only 6 groups cross the shuffle — this plan is fully
    scan-bound at any scale.
    """
    li = fan_out(load(spark, sf_dir, "lineitem"), spark)
    one = F.lit(1).cast("decimal(12,4)")
    disc_price = dec9("l_extendedprice") * (one - dec9("l_discount"))
    charge = disc_price * (one + dec9("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum_expr(disc_price, "sum_disc_price"),
            dsum_expr(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
    {sql_dsum("l_quantity")} AS sum_qty,
    {sql_dsum("l_extendedprice")} AS sum_base_price,
    {sql_dsum_expr("CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))")} AS sum_disc_price,
    {sql_dsum_expr("CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4))) * (CAST(1 AS DECIMAL(12,4)) + CAST(l_tax AS DECIMAL(12,4)))")} AS sum_charge,
    {sql_davg("l_quantity")} AS avg_qty,
    {sql_davg("l_extendedprice")} AS avg_price,
    {sql_davg("l_discount")} AS avg_disc,
    COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) + multi-agg per group (orders by priority)."""
    o = fan_out(load(spark, sf_dir, "orders"), spark)
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "sum_price"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
        .orderBy("o_orderpriority")
    )


_AGG_DISTINCT_SQL = f"""
SELECT o_orderpriority,
    COUNT(DISTINCT o_custkey) AS n_customers,
    COUNT(*) AS n_orders,
    {sql_dsum("o_totalprice")} AS sum_price,
    MIN(o_orderdate) AS first_order,
    MAX(o_orderdate) AS last_order
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) with grouping_id.

    Hierarchical subtotals computed in one pass (Spark Expand operator
    — one shuffle, not one per grouping set).
    """
    li = fan_out(load(spark, sf_dir, "lineitem"), spark)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .orderBy(
            F.col("gid"),
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


_AGG_ROLLUP_SQL = f"""
SELECT l_returnflag, l_linestatus,
    {sql_dsum("l_quantity")} AS sum_qty,
    COUNT(*) AS n_rows,
    CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority): all 4 grouping sets."""
    o = fan_out(load(spark, sf_dir, "orders"), spark)
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            dsum("o_totalprice", "sum_price"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .orderBy(
            F.col("gid"),
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


_AGG_CUBE_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
    {sql_dsum("o_totalprice")} AS sum_price,
    COUNT(*) AS n_orders,
    CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — mixed granularities in one shuffle."""
    li = fan_out(load(spark, sf_dir, "lineitem"), spark)
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
            COUNT(*) AS n_rows,
            CAST(grouping_id() AS BIGINT) AS gid
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """
    )


_AGG_GROUPING_SETS_SQL = f"""
SELECT l_returnflag, l_linestatus,
    {sql_dsum("l_quantity")} AS sum_qty,
    COUNT(*) AS n_rows,
    CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus values into columns per returnflag.

    Values are enumerated explicitly — at scale an unenumerated pivot
    costs a distinct-scan; never do that on 100 TB.
    """
    li = fan_out(load(spark, sf_dir, "lineitem"), spark)
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
        .withColumnsRenamed({"F": "qty_f", "O": "qty_o"})
        .orderBy("l_returnflag")
    )


_AGG_PIVOT_SQL = f"""
SELECT l_returnflag,
    {sql_dsum_expr("CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,4)) END")} AS qty_f,
    {sql_dsum_expr("CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,4)) END")} AS qty_o
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt — the inverse reshape of agg_pivot: the wide
    per-returnflag (qty_f, qty_o) table melts back to long
    (returnflag, linestatus, qty) form. Unpivot is a zero-shuffle
    projection (each input row fans out to k output rows map-side);
    the only exchange here belongs to the upstream aggregate."""
    wide = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
        .withColumnsRenamed({"F": "qty_f", "O": "qty_o"})
    )
    return (
        wide.unpivot(
            ids=["l_returnflag"],
            values=["qty_f", "qty_o"],
            variableColumnName="l_linestatus",
            valueColumnName="sum_qty",
        )
        .withColumn(
            "l_linestatus",
            F.when(F.col("l_linestatus") == "qty_f", "F").otherwise("O"),
        )
        .filter(F.col("sum_qty").isNotNull())
        .orderBy("l_returnflag", "l_linestatus")
    )


_RESHAPE_UNPIVOT_SQL = f"""
SELECT l_returnflag, l_linestatus, sum_qty
FROM (
    SELECT l_returnflag, 'F' AS l_linestatus,
        {sql_dsum_expr("CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,4)) END")} AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 'O' AS l_linestatus,
        {sql_dsum_expr("CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,4)) END")} AS sum_qty
    FROM lineitem GROUP BY l_returnflag
) long
WHERE sum_qty IS NOT NULL
ORDER BY l_returnflag, l_linestatus
"""


def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 orders by price — Spark plans TakeOrderedAndProject
    (per-partition heap + driver merge; no global sort, no full shuffle).
    """
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


_SORT_TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT composition over customer key sets.

    Customers who placed an urgent-priority order but none with status
    'F', unioned with the 5 highest-balance customers.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    f_status = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    top_bal = (
        c.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(5)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return (
        urgent.intersect(urgent)  # idempotent intersect (distinct semantics)
        .exceptAll(f_status)
        .distinct()
        .union(top_bal)
        .distinct()
        .orderBy("custkey")
    )


_SET_OPS_SQL = """
SELECT DISTINCT custkey FROM (
    SELECT custkey FROM (
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        EXCEPT ALL
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    )
    UNION
    SELECT c_custkey AS custkey FROM (
        SELECT c_custkey FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 5
    )
) ORDER BY custkey
"""


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/corr (rounded for
    cross-engine float stability), min/max, exact median via interpolated
    percentile — per market segment after a broadcast join."""
    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.round(F.stddev_samp("c_acctbal"), 4).alias("std_bal"),
            F.round(F.var_samp("c_acctbal"), 4).alias("var_bal"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            F.round(F.percentile("c_acctbal", F.lit(0.5)), 4).alias("median_bal"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_mktsegment")
    )


_AGG_STATS_SQL = """
SELECT c_mktsegment,
    ROUND(STDDEV_SAMP(c_acctbal), 4) AS std_bal,
    ROUND(VAR_SAMP(c_acctbal), 4) AS var_bal,
    MIN(c_acctbal) AS min_bal,
    MAX(c_acctbal) AS max_bal,
    ROUND(QUANTILE_CONT(c_acctbal, 0.5), 4) AS median_bal,
    COUNT(*) AS n
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mode (most frequent value) of the shipping mode AND the
    priority per order-status group, with a deterministic tie-break
    (higher count first, then lexicographically smallest value — the
    engines' built-in ``mode()`` leaves ties implementation-defined,
    so it can't be hash-compared).

    Plan shape: value-frequency count (one shuffle with map-side
    combine, cardinality = |groups|×|distinct values| — tiny), then a
    row_number window over those counts. The window input is the
    REDUCED frequency table, never the raw rows, so this scales as
    the number of distinct (group, value) pairs, not the fact size.
    """
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders")

    def mode_of(col: str, out: str) -> DataFrame:
        freq = o.groupBy("o_orderstatus", col).agg(F.count(F.lit(1)).alias("cnt"))
        w = W.partitionBy("o_orderstatus").orderBy(F.desc("cnt"), F.asc(col))
        return (
            freq.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "o_orderstatus",
                F.col(col).alias(out),
                F.col("cnt").alias(f"{out}_n"),
            )
        )

    return mode_of("o_orderpriority", "mode_priority").orderBy("o_orderstatus")


_AGG_MODE_SQL = """
WITH freq AS (
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
    FROM orders GROUP BY o_orderstatus, o_orderpriority
),
ranked AS (
    SELECT o_orderstatus, o_orderpriority, cnt,
           ROW_NUMBER() OVER (
               PARTITION BY o_orderstatus
               ORDER BY cnt DESC, o_orderpriority ASC
           ) AS rn
    FROM freq
)
SELECT o_orderstatus, o_orderpriority AS mode_priority,
       cnt AS mode_priority_n
FROM ranked WHERE rn = 1
ORDER BY o_orderstatus
"""


# -------------------------------------------- FILTER-clause aggregates

def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation via the SQL FILTER clause — the
    one-pass replacement for N self-joins when a report needs counts
    and sums over different predicates of the same scan ("orders by
    status, but urgent ones, 1995+ ones, and big-ticket ones broken
    out"). One scan, one shuffle on the group key; every branch is a
    partial-aggregating conditional — the cheapest possible shape for
    multi-predicate dashboards at 100 TB.

    Money sums go through the exact-decimal policy (numeric.py) so
    every branch is order-insensitive and bit-identical cross-engine.
    """
    o = load(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    recent = F.year("o_orderdate") >= 1995
    big = F.col("o_totalprice") > 200000
    price_dec = dec("o_totalprice")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_all"),
            F.sum(urgent.cast("long")).alias("n_urgent"),
            F.sum(recent.cast("long")).alias("n_recent"),
            F.sum(F.when(big, 1).otherwise(0)).cast("long").alias("n_big"),
            F.sum(F.when(urgent, price_dec))
            .cast("decimal(18,6)")
            .cast("double")
            .alias("urgent_revenue"),
            F.sum(F.when(recent & big, price_dec))
            .cast("decimal(18,6)")
            .cast("double")
            .alias("recent_big_revenue"),
        )
        .orderBy("o_orderstatus")
    )


_AGG_FILTERED_SQL = """
SELECT o_orderstatus,
       COUNT(*) AS n_all,
       CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT)
           AS n_urgent,
       CAST(COUNT(*) FILTER (WHERE year(o_orderdate) >= 1995) AS BIGINT)
           AS n_recent,
       CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS n_big,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                 FILTER (WHERE o_orderpriority = '1-URGENT')
            AS DECIMAL(18,6)) AS DOUBLE) AS urgent_revenue,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                 FILTER (WHERE year(o_orderdate) >= 1995
                         AND o_totalprice > 200000)
            AS DECIMAL(18,6)) AS DOUBLE) AS recent_big_revenue
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# ----------------------------------------------- ordered LISTAGG

def agg_listagg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg) — the report
    column "which members make up this group", deterministic by
    sorting members before joining. Spark has no ordered listagg
    aggregate; the exact equivalent is collect_list → array_sort →
    array_join, which keeps the whole pipeline JVM-side. Group sizes
    here are bounded (nations per region, order-priority values per
    status); at 100 TB you cap or top-k the member list first — an
    unbounded listagg is a straggler by construction.
    """
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.array_join(
                F.array_sort(F.collect_list("n_name")), ","
            ).alias("nations_csv"),
        )
        .orderBy("r_name")
    )


_LISTAGG_SQL = """
SELECT r_name, COUNT(*) AS n_nations,
       string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


# --------------------------------------- outer-explode semantics

def explode_outer_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode vs explode_outer on empty arrays — the UNNEST corner
    that silently drops rows: a document whose filter yields no
    matching tokens VANISHES under plain explode but survives as one
    NULL row under explode_outer. Both behaviors are computed side by
    side (rare-token filter: tokens longer than 6 chars, absent from
    many docs) so the row-accounting difference is value-checked, not
    assumed.

    Scale: two explodes of the same derived array — Catalyst evaluates
    the Generate operators per-row, no shuffle before the final sort.
    """
    d = fan_out(load(spark, sf_dir, "documents"), spark, "doc_id")
    toks = F.split(F.trim("text"), r"\s+")
    rare = F.filter(toks, lambda t: F.length(t) > 6)
    base = d.select("doc_id", rare.alias("rare"))
    inner = base.select(
        "doc_id", F.explode("rare").alias("tok")
    ).groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    outer = base.select(
        "doc_id", F.explode_outer("rare").alias("tok")
    ).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("tok").alias("n_toks"),
    )
    return (
        outer.join(inner.withColumnRenamed("n", "n_inner"), "doc_id", "left")
        .select(
            "doc_id",
            "n_rows",
            "n_toks",
            F.coalesce("n_inner", F.lit(0).cast("long")).alias("n_inner_rows"),
            (F.col("n_toks") == 0).alias("dropped_by_inner"),
        )
        .orderBy("doc_id")
    )


_EXPLODE_OUTER_SQL = r"""
WITH base AS (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\s+'),
                       t -> length(t) > 6) AS rare
    FROM documents
),
outer_rows AS (
    SELECT b.doc_id, COUNT(*) AS n_rows, COUNT(u.tok) AS n_toks
    FROM base b LEFT JOIN (
        SELECT doc_id, UNNEST(rare) AS tok FROM base
    ) u ON b.doc_id = u.doc_id
    GROUP BY b.doc_id
),
inner_rows AS (
    SELECT doc_id, COUNT(*) AS n_inner
    FROM (SELECT doc_id, UNNEST(rare) AS tok FROM base)
    GROUP BY doc_id
)
SELECT o.doc_id, o.n_rows, o.n_toks,
       COALESCE(i.n_inner, 0) AS n_inner_rows,
       o.n_toks = 0 AS dropped_by_inner
FROM outer_rows o LEFT JOIN inner_rows i ON o.doc_id = i.doc_id
ORDER BY o.doc_id
"""


def reshape_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.transpose`` (Spark 4.0) — rows↔columns flip of a
    REDUCED metrics table: per-segment customer metrics become one row
    per metric with a column per segment, the report-matrix shape BI
    layers ask for. Transpose requires a common value type, so every
    metric is cast to double first (the exact-decimal sums land on
    doubles already, per the numeric policy). The discipline is the
    same as ``agg_pivot``'s: transpose AFTER the reduction — the input
    here is 5 rows regardless of corpus size, never the fact table.
    The oracle rebuilds the matrix with scalar subqueries per cell."""
    c = load(spark, sf_dir, "customer")
    agg = (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_customers"),
            dsum("c_acctbal", "bal_sum"),
            F.countDistinct("c_nationkey").cast("double").alias("n_nations"),
        )
        .orderBy("c_mktsegment")
    )
    return agg.transpose().withColumnRenamed("key", "metric").orderBy("metric")


_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def _transpose_sql() -> str:
    def cell(metric_expr: str, seg: str) -> str:
        return (
            f"(SELECT {metric_expr} FROM customer WHERE c_mktsegment = '{seg}')"
            f' AS "{seg}"'
        )

    rows = []
    for metric, expr in [
        ("n_customers", "CAST(COUNT(*) AS DOUBLE)"),
        ("bal_sum", sql_dsum("c_acctbal")),
        ("n_nations", "CAST(COUNT(DISTINCT c_nationkey) AS DOUBLE)"),
    ]:
        cells = ", ".join(cell(expr, seg) for seg in _SEGMENTS)
        rows.append(f"SELECT '{metric}' AS metric, {cells}")
    return "\nUNION ALL\n".join(rows) + "\nORDER BY metric"


def stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.stat.crosstab`` — the contingency-table member of the
    DataFrameStatFunctions surface: pairwise frequency of returnflag ×
    linestatus in one pass. Under the hood this is a count aggregation
    pivoted over the (bounded) value domain, so the same discipline as
    ``agg_pivot`` applies — the crossed columns must be low-cardinality
    (their product becomes the result grid), never raw keys. Column
    types are crosstab's own (string key, long counts); the oracle
    mirrors them with FILTER-clause counts."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.stat.crosstab("l_returnflag", "l_linestatus")
        .orderBy("l_returnflag_l_linestatus")
    )


_CROSSTAB_SQL = """
SELECT l_returnflag AS l_returnflag_l_linestatus,
       COUNT(*) FILTER (l_linestatus = 'F') AS "F",
       COUNT(*) FILTER (l_linestatus = 'O') AS "O"
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag_l_linestatus
"""


def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``max_by`` / ``min_by`` — "the key at the extreme" in ONE
    aggregation pass, where the naive formulation is a self-join back
    onto the group maxima (two scans + a shuffle join) or a full
    row_number window (sorts every group). The ordering argument is a
    struct so ties break deterministically on the order key —
    ``max_by(k, price)`` alone is implementation-defined under ties
    and could never hash-match. The oracle mirrors the struct
    comparison with twin row_number windows (DuckDB's arg_max does
    not take a composite ordering)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.expr("max_by(o_orderkey, struct(o_totalprice, o_orderkey))").alias(
                "best_order"
            ),
            F.max("o_totalprice").alias("best_price"),
            F.expr("min_by(o_orderkey, struct(o_totalprice, o_orderkey))").alias(
                "worst_order"
            ),
            F.min("o_totalprice").alias("worst_price"),
        )
        .orderBy("o_orderpriority")
    )


_MINMAX_BY_SQL = """
WITH r AS (
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
    FROM orders
)
SELECT o_orderpriority,
       MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS best_order,
       MAX(CASE WHEN rmax = 1 THEN o_totalprice END) AS best_price,
       MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS worst_order,
       MAX(CASE WHEN rmin = 1 THEN o_totalprice END) AS worst_price
FROM r
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family — ``count_if`` / ``bool_and`` /
    ``bool_or`` — the data-quality assertion primitives: "how many
    rows violate", "do ALL rows satisfy", "does ANY row satisfy", each
    a single-bit aggregation state (the cheapest aggregates that
    exist; at 100 TB these are the expectations layer's fast path,
    cf. ``quality_expectations``)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
            F.bool_and(F.col("o_custkey") % 2 == 0).alias("all_even_cust"),
        )
        .orderBy("o_orderstatus")
    )


_AGG_BOOLEAN_SQL = """
SELECT o_orderstatus,
       CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
       bool_and(o_custkey % 2 = 0) AS all_even_cust
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# sql_recursive_hierarchy — Spark 4 recursive CTE
# ---------------------------------------------------------------------------


def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.0+ ``WITH RECURSIVE``) walking an
    implicit binary tree over doc ids (parent(i) = (i-1) div 2): each
    round joins the frontier to its children until the tree is
    exhausted, then rolls up node count / id range / char mass per
    depth. This is the SQL-native form of iterative graph traversal —
    before Spark 4 it required a driver-side loop (see
    ``dedup_clusters``); the engine now plans the fixpoint itself.

    Scale: each recursive step is one equi-join of the current
    frontier against the child relation (hash-partitioned on the
    parent key); depth is log₂(N) for this topology, so the step
    count grows logarithmically with corpus size. The aggregate is a
    depth-grain reduction.
    """
    load(spark, sf_dir, "documents").createOrReplaceTempView("pbs_rec_docs")
    return spark.sql(
        """
        WITH RECURSIVE tree(id, depth, chars) AS (
            SELECT doc_id, 0, n_chars FROM pbs_rec_docs WHERE doc_id = 0
            UNION ALL
            SELECT d.doc_id, t.depth + 1, d.n_chars
            FROM pbs_rec_docs d
            JOIN tree t ON (d.doc_id - 1) div 2 = t.id AND d.doc_id > 0
        )
        SELECT depth, COUNT(*) AS n_nodes,
               MIN(id) AS min_id, MAX(id) AS max_id,
               SUM(chars) AS sum_chars
        FROM tree
        GROUP BY depth
        ORDER BY depth
        """
    )


_RECURSIVE_SQL = """
WITH RECURSIVE tree(id, depth, chars) AS (
    SELECT doc_id, 0, n_chars FROM documents WHERE doc_id = 0
    UNION ALL
    SELECT d.doc_id, t.depth + 1, d.n_chars
    FROM documents d
    JOIN tree t ON (d.doc_id - 1) // 2 = t.id AND d.doc_id > 0
)
SELECT depth, COUNT(*) AS n_nodes,
       MIN(id) AS min_id, MAX(id) AS max_id,
       CAST(SUM(chars) AS BIGINT) AS sum_chars
FROM tree
GROUP BY depth
ORDER BY depth
"""


# ---------------------------------------------------------------------------
# agg_basket_pairs — market-basket co-occurrence
# ---------------------------------------------------------------------------

BASKET_TOP = 20


def agg_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket analysis: the top co-occurring part-brand pairs
    across orders, with support and lift — the association-rule
    primer (lift > 1 ⇒ brands bought together more than chance).
    Baskets reduce to one sorted distinct-brand array per order (ONE
    shuffle); pairs then come from an in-array combination expansion
    — flatten(transform(...)) over the sorted set yields exactly the
    brand_x < brand_y combinations the former self-equi-join on the
    order key produced, without shuffling the basket table twice more
    for the join (r12: 3 basket recomputations + a self-join exchange
    pair → one grouped table read three times).  Pair work is still
    Θ(Σ C(basket_size, 2)) — basket-bounded (≤13 items here), never
    |orders|². Lift is an exact integer-ratio floor (every factor
    < 2^53). Top {BASKET_TOP} under a total order.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_order = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("bs"))
        .localCheckpoint(eager=False)
    )
    n_baskets = per_order.count()
    singles = (
        per_order.select(F.explode("bs").alias("p_brand"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    pair_combos = F.expr(
        "flatten(transform(bs, (x, i) ->"
        " transform(slice(bs, i + 2, size(bs)),"
        " y -> struct(x AS bx, y AS by))))"
    )
    pairs = (
        per_order.select(F.explode(pair_combos).alias("pr"))
        .groupBy(
            F.col("pr.bx").alias("brand_x"),
            F.col("pr.by").alias("brand_y"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
    )
    lift = F.floor(
        F.lit(1000000.0)
        * F.lit(n_baskets)
        * F.col("support")
        / (F.col("sx") * F.col("sy"))
    ).cast("long")
    return (
        pairs.join(
            F.broadcast(singles.select(F.col("p_brand").alias("brand_x"), F.col("s").alias("sx"))),
            "brand_x",
        )
        .join(
            F.broadcast(singles.select(F.col("p_brand").alias("brand_y"), F.col("s").alias("sy"))),
            "brand_y",
        )
        .select("brand_x", "brand_y", "support", lift.alias("lift_micro"))
        .orderBy(F.desc("support"), "brand_x", "brand_y")
        .limit(BASKET_TOP)
    )


def _basket_sql() -> str:
    return f"""
WITH baskets AS (
    SELECT DISTINCT l_orderkey, p_brand
    FROM lineitem JOIN part ON l_partkey = p_partkey
),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS nb FROM baskets),
singles AS (
    SELECT p_brand, COUNT(*) AS s FROM baskets GROUP BY p_brand
),
pairs AS (
    SELECT x.p_brand AS brand_x, y.p_brand AS brand_y, COUNT(*) AS support
    FROM baskets x JOIN baskets y
      ON x.l_orderkey = y.l_orderkey AND x.p_brand < y.p_brand
    GROUP BY brand_x, brand_y
)
SELECT brand_x, brand_y, support,
       CAST(FLOOR(1000000.0 * n.nb * support / (sx.s * sy.s)) AS BIGINT)
           AS lift_micro
FROM pairs, n
JOIN singles sx ON pairs.brand_x = sx.p_brand
JOIN singles sy ON pairs.brand_y = sy.p_brand
ORDER BY support DESC, brand_x, brand_y
LIMIT {BASKET_TOP}
"""

# ---------------------------------------------------------------------------
# agg_abc_classification — Pareto/ABC revenue segmentation
# ---------------------------------------------------------------------------

ABC_A, ABC_B = 800_000, 950_000  # cumulative-share boundaries (micro)


def agg_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) segmentation: customers ranked by revenue, class A
    = the head covering the first 80% of cumulative revenue, B = the
    next 15%, C = the tail — the inventory/account-management staple.
    Revenue reduces to customer grain first; the cumulative share is
    one running decimal sum over the reduced table (total order:
    revenue desc, custkey — ties can never flip classes between
    engines); shares quantize to exact integer micro-units BEFORE the
    class thresholds apply. Output: class → customers, revenue, share.
    """
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).cast("decimal(18,6)").alias("rev")
    )
    w = W.orderBy(F.desc("rev"), F.asc("o_custkey")).rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = F.sum("rev").over(w)
    tot = F.sum("rev").over(W.partitionBy())
    share_micro = F.floor(
        F.lit(1000000.0) * cum.cast("double") / tot.cast("double")
    )
    classed = per_cust.select(
        "rev",
        F.when(share_micro <= ABC_A, "A")
        .when(share_micro <= ABC_B, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("rev").cast("decimal(18,6)").cast("double").alias("revenue"),
        )
        .orderBy("abc_class")
    )


_ABC_SQL = f"""
WITH per_cust AS (
    SELECT o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,6)) AS rev
    FROM orders GROUP BY o_custkey
),
classed AS (
    SELECT rev,
           CASE WHEN FLOOR(1000000.0
                    * CAST(SUM(rev) OVER (ORDER BY rev DESC, o_custkey ASC
                                          ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                    / CAST(SUM(rev) OVER () AS DOUBLE)) <= {ABC_A} THEN 'A'
                WHEN FLOOR(1000000.0
                    * CAST(SUM(rev) OVER (ORDER BY rev DESC, o_custkey ASC
                                          ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                    / CAST(SUM(rev) OVER () AS DOUBLE)) <= {ABC_B} THEN 'B'
                ELSE 'C' END AS abc_class
    FROM per_cust
)
SELECT abc_class,
       COUNT(*) AS n_customers,
       CAST(CAST(SUM(rev) AS DECIMAL(18,6)) AS DOUBLE) AS revenue
FROM classed
GROUP BY abc_class
ORDER BY abc_class
"""

# ---------------------------------------------------------------------------
# agg_new_vs_returning — growth-accounting split
# ---------------------------------------------------------------------------


def agg_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning growth accounting: per month, orders (and
    revenue) from customers placing their FIRST-ever order that month
    vs repeat customers — the top-line decomposition every growth
    report leads with. Customer first-months reduce once (a min
    aggregate), broadcast back, and each order classifies itself;
    no window over the fact table, no self-join at order grain.
    """
    o = load(spark, sf_dir, "orders")
    month = F.date_format("o_orderdate", "yyyy-MM")
    first = o.groupBy("o_custkey").agg(F.min(month).alias("first_month"))
    return (
        o.select("o_custkey", month.alias("month"), "o_totalprice")
        .join(F.broadcast(first), "o_custkey")
        .groupBy("month")
        .agg(
            F.sum((F.col("month") == F.col("first_month")).cast("long")).alias(
                "n_new"
            ),
            F.sum((F.col("month") != F.col("first_month")).cast("long")).alias(
                "n_returning"
            ),
            F.sum(
                F.when(F.col("month") == F.col("first_month"), dec("o_totalprice"))
            )
            .cast("decimal(18,6)")
            .cast("double")
            .alias("new_revenue"),
        )
        .orderBy("month")
    )


_NEW_RET_SQL = """
WITH first AS (
    SELECT o_custkey, MIN(STRFTIME(o_orderdate, '%Y-%m')) AS first_month
    FROM orders GROUP BY o_custkey
)
SELECT STRFTIME(o_orderdate, '%Y-%m') AS month,
       CAST(SUM(CASE WHEN STRFTIME(o_orderdate, '%Y-%m') = first_month
                THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(SUM(CASE WHEN STRFTIME(o_orderdate, '%Y-%m') != first_month
                THEN 1 ELSE 0 END) AS BIGINT) AS n_returning,
       CAST(CAST(SUM(CASE WHEN STRFTIME(o_orderdate, '%Y-%m') = first_month
                THEN CAST(o_totalprice AS DECIMAL(18,4)) END)
            AS DECIMAL(18,6)) AS DOUBLE) AS new_revenue
FROM orders JOIN first USING (o_custkey)
GROUP BY month
ORDER BY month
"""

# ---------------------------------------------------------------------------
# agg_period_overlap — audience overlap between periods
# ---------------------------------------------------------------------------

OVERLAP_Y1, OVERLAP_Y2 = 2000, 2001


def agg_period_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between two activity periods: customers who
    ordered in {OVERLAP_Y1}, in {OVERLAP_Y2}, in both (retained), and
    the Jaccard of the two sets — the year-over-year audience health
    metric. Set sizes and the intersection come from ONE scan: per
    customer, a boolean pair (bool_or per year), then a single count
    aggregate; no self-join of the fact table, no distinct-expand.
    Jaccard in exact integer micro-units.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("yr")
    )
    flags = (
        o.filter(F.col("yr").isin(OVERLAP_Y1, OVERLAP_Y2))
        .groupBy("o_custkey")
        .agg(
            F.max((F.col("yr") == OVERLAP_Y1).cast("int")).alias("in_y1"),
            F.max((F.col("yr") == OVERLAP_Y2).cast("int")).alias("in_y2"),
        )
    )
    return flags.agg(
        F.sum("in_y1").cast("long").alias("n_y1"),
        F.sum("in_y2").cast("long").alias("n_y2"),
        F.sum(F.col("in_y1") * F.col("in_y2")).cast("long").alias("n_both"),
        F.floor(
            F.lit(1000000.0)
            * F.sum(F.col("in_y1") * F.col("in_y2"))
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("jaccard_micro"),
    )


_PERIOD_OVERLAP_SQL = f"""
WITH flags AS (
    SELECT o_custkey,
           MAX(CASE WHEN year(o_orderdate) = {OVERLAP_Y1} THEN 1 ELSE 0 END) AS in_y1,
           MAX(CASE WHEN year(o_orderdate) = {OVERLAP_Y2} THEN 1 ELSE 0 END) AS in_y2
    FROM orders
    WHERE year(o_orderdate) IN ({OVERLAP_Y1}, {OVERLAP_Y2})
    GROUP BY o_custkey
)
SELECT CAST(SUM(in_y1) AS BIGINT) AS n_y1,
       CAST(SUM(in_y2) AS BIGINT) AS n_y2,
       CAST(SUM(in_y1 * in_y2) AS BIGINT) AS n_both,
       CAST(FLOOR(1000000.0 * SUM(in_y1 * in_y2) / COUNT(*)) AS BIGINT)
           AS jaccard_micro
FROM flags
"""

# ---------------------------------------------------------------------------
# agg_pct_of_parent — hierarchical share-of-parent report
# ---------------------------------------------------------------------------


def agg_pct_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical percent-of-parent: each nation's revenue share
    within its region, and each region's share of the world — the BI
    drill-down every rollup report annotates. Revenue aggregates at
    nation grain FIRST (the fact table shuffles once, reduced), then
    two window sums over the 25-row nation table compute both parent
    totals — shares are ratios of bit-identical exact-decimal doubles,
    in integer micro-units.
    """
    from parquet_batch_spark.functions.numeric import dec

    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    per_nation = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey")
        .agg(F.sum(dec("o_totalprice")).cast("decimal(18,6)").cast("double").alias("rev"))
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("r_name", "n_name", "rev")
    )
    from pyspark.sql import Window as W

    # window sums re-enter exact decimal: double addition is order-
    # dependent and window row order differs between engines
    rev_dec = F.col("rev").cast("decimal(18,6)")
    region_tot = F.sum(rev_dec).over(W.partitionBy("r_name")).cast("double")
    world_tot = F.sum(rev_dec).over(W.partitionBy()).cast("double")
    return (
        per_nation.select(
            "r_name",
            "n_name",
            "rev",
            F.floor(F.lit(1000000.0) * F.col("rev") / region_tot)
            .cast("long")
            .alias("share_of_region_micro"),
            F.floor(F.lit(1000000.0) * region_tot / world_tot)
            .cast("long")
            .alias("region_share_of_world_micro"),
        )
        .orderBy("r_name", "n_name")
    )


def _pct_of_parent_sql() -> str:
    from parquet_batch_spark.functions.numeric import sql_dsum

    return f"""
WITH per_nation AS (
    SELECT r_name, n_name, {sql_dsum("o_totalprice")} AS rev
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
)
SELECT r_name, n_name, rev,
       CAST(FLOOR(1000000.0 * rev /
            CAST(SUM(CAST(rev AS DECIMAL(18,6))) OVER (PARTITION BY r_name) AS DOUBLE))
            AS BIGINT) AS share_of_region_micro,
       CAST(FLOOR(1000000.0 *
            CAST(SUM(CAST(rev AS DECIMAL(18,6))) OVER (PARTITION BY r_name) AS DOUBLE)
            / CAST(SUM(CAST(rev AS DECIMAL(18,6))) OVER () AS DOUBLE)) AS BIGINT)
            AS region_share_of_world_micro
FROM per_nation
ORDER BY r_name, n_name
"""

# ---------------------------------------------------------------------------
# set_ops_multiset — INTERSECT ALL / EXCEPT ALL bag semantics
# ---------------------------------------------------------------------------


def set_ops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — ``intersectAll`` / ``exceptAll``
    — where DUPLICATE COUNTS carry meaning: the custkey multiset of
    urgent orders vs the multiset of 'F'-status orders. INTERSECT ALL
    keeps min(n₁,n₂) copies per key, EXCEPT ALL keeps n₁−n₂ — the
    per-customer "matched demand" and "excess demand" accounting that
    DISTINCT set ops destroy (cf. ``set_ops``). Output: one summary
    row per operation (row count + exact key checksum), so the bag
    cardinalities — the semantics under test — are pinned directly.

    Scale: Spark plans both as a single hash shuffle per side with
    count-based merge (no explode of duplicates); identical topology
    to a groupBy. At 100 TB these replace the fragile
    join-on-rownumber emulation hand-rolled bags need.
    """
    o = load(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("ck")
    )
    fdone = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("ck")
    )

    def summarize(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.lit(tag).alias("op"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("ck").alias("key_checksum"),
        )

    return (
        summarize(urgent.intersectAll(fdone), "intersect_all")
        .unionAll(summarize(urgent.exceptAll(fdone), "except_all"))
        .unionAll(summarize(fdone.exceptAll(urgent), "except_all_rev"))
        .orderBy("op")
    )


_SET_MULTI_SQL = """
WITH urgent AS (
    SELECT o_custkey AS ck FROM orders WHERE o_orderpriority = '1-URGENT'
),
fdone AS (
    SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'F'
),
ia AS (SELECT ck FROM urgent INTERSECT ALL SELECT ck FROM fdone),
ea AS (SELECT ck FROM urgent EXCEPT ALL SELECT ck FROM fdone),
er AS (SELECT ck FROM fdone EXCEPT ALL SELECT ck FROM urgent)
SELECT 'intersect_all' AS op, COUNT(*) AS n_rows,
       CAST(SUM(ck) AS BIGINT) AS key_checksum FROM ia
UNION ALL
SELECT 'except_all', COUNT(*), CAST(SUM(ck) AS BIGINT) FROM ea
UNION ALL
SELECT 'except_all_rev', COUNT(*), CAST(SUM(ck) AS BIGINT) FROM er
ORDER BY op
"""


def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL PIPE syntax (`|>`): the linear query form where each
    stage reads top-to-bottom — the same logical plan Catalyst builds
    from nested SQL, surfaced in pipeline order. The query itself is a
    pushdown-friendly filter → exact-decimal aggregate → sort over
    orders; the oracle is the equivalent classic SQL, proving the pipe
    form changes SYNTAX, not semantics or plan quality.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_pipe_v")
    return spark.sql(
        """
        FROM orders_pipe_v
        |> WHERE o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
        |> EXTEND CAST(o_totalprice AS DECIMAL(18,4)) AS price_dec
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(CAST(SUM(price_dec) AS DECIMAL(28,6)) AS DOUBLE)
                         AS revenue
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        """
    )


_PIPE_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(28,6)) AS DOUBLE)
           AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


SESSION_VAR_THRESHOLD = 200_000  # order-value cutoff the variable carries


def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL session variables (DECLARE / SET VAR): a typed
    server-side variable parameterizes a query in two places (filter
    and CASE label) without string templating — the injection-safe
    way to thread a runtime threshold through SQL, and unlike string
    interpolation the variable folds to a literal at plan time so
    pushdown still applies. The oracle inlines the same literal.
    """
    spark.sql("DECLARE OR REPLACE VARIABLE big_order_cutoff DOUBLE DEFAULT 0.0")
    spark.sql(f"SET VAR big_order_cutoff = {SESSION_VAR_THRESHOLD}.0")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_var_v")
    return spark.sql(
        """
        SELECT o_orderstatus,
               CASE WHEN o_totalprice >= big_order_cutoff THEN 'big'
                    ELSE 'small' END AS bucket,
               COUNT(*) AS n_orders
        FROM orders_var_v
        GROUP BY o_orderstatus, bucket
        ORDER BY o_orderstatus, bucket
        """
    )


_SESSION_VAR_SQL = f"""
SELECT o_orderstatus,
       CASE WHEN o_totalprice >= {SESSION_VAR_THRESHOLD}.0 THEN 'big'
            ELSE 'small' END AS bucket,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus, bucket
ORDER BY o_orderstatus, bucket
"""


# --------------------------------------------------------- SQL UDFs

def sql_udf_create_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL UDFs (CREATE FUNCTION ... RETURN <expr>): the
    engine surface that lets analysts package expression logic WITHOUT
    leaving the JVM.  Two temporary functions — a decimal-exact
    discounted-revenue scalar and a CASE-based quantity tier — are
    declared and then used in an aggregation (the tier even drives the
    GROUP BY).

    The scale property that matters: SQL UDFs are INLINED into the
    Catalyst plan at analysis time (no function-call node survives —
    asserted in tests/test_r5_ops.py), so they whole-stage-codegen
    exactly like hand-written expressions: zero serialization
    boundary, unlike Python/pandas UDFs.  The oracle simply inlines
    the same expressions.  Decimal discipline matches functions/
    numeric.py: (12,4)×(13,4) product = (26,8) < 38, summed then
    squeezed to (18,6) before the double cast."""
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION disc_rev(
            p DECIMAL(12,4), d DECIMAL(12,4)) RETURNS DECIMAL(26,8)
        RETURN p * (1 - d)
    """)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION qty_tier(q DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN q < 10 THEN 'small'
                    WHEN q < 30 THEN 'mid'
                    ELSE 'bulk' END
    """)
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_udf_view")
    return spark.sql("""
        SELECT qty_tier(CAST(l_quantity AS DOUBLE)) AS tier,
               l_returnflag,
               CAST(CAST(SUM(disc_rev(CAST(l_extendedprice AS DECIMAL(12,4)),
                                      CAST(l_discount AS DECIMAL(12,4))))
                    AS DECIMAL(18,6)) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM li_udf_view
        GROUP BY 1, 2
        ORDER BY tier, l_returnflag
    """)


_SQL_UDF_SQL = """
SELECT CASE WHEN CAST(l_quantity AS DOUBLE) < 10 THEN 'small'
            WHEN CAST(l_quantity AS DOUBLE) < 30 THEN 'mid'
            ELSE 'bulk' END AS tier,
       l_returnflag,
       {dsum} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY 1, 2
ORDER BY tier, l_returnflag
""".format(
    dsum=sql_dsum_expr(
        "CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))"
    )
)


QUERIES = {
    "sql_pipe_syntax": sql_pipe_syntax,
    "sql_udf_create_function": sql_udf_create_function,
    "sql_session_variables": sql_session_variables,
    "agg_basket_pairs": agg_basket_pairs,
    "agg_abc_classification": agg_abc_classification,
    "agg_new_vs_returning": agg_new_vs_returning,
    "agg_period_overlap": agg_period_overlap,
    "agg_pct_of_parent": agg_pct_of_parent,
    "set_ops_multiset": set_ops_multiset,
    "sql_recursive_hierarchy": sql_recursive_hierarchy,
    "agg_boolean": agg_boolean,
    "agg_minmax_by": agg_minmax_by,
    "stat_crosstab": stat_crosstab,
    "reshape_transpose": reshape_transpose,
    "explode_outer_semantics": explode_outer_semantics,
    "agg_filtered": agg_filtered,
    "agg_listagg_sorted": agg_listagg_sorted,
    "q1_pricing_summary": q1_pricing_summary,
    "agg_mode_per_group": agg_mode_per_group,
    "reshape_unpivot": reshape_unpivot,
    "agg_distinct": agg_distinct,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_grouping_sets": agg_grouping_sets,
    "agg_pivot": agg_pivot,
    "agg_stats": agg_stats,
    "sort_topk": sort_topk,
    "set_ops": set_ops,
}

ORACLES = {
    "sql_udf_create_function": _SQL_UDF_SQL,
    "sql_pipe_syntax": _PIPE_SQL,
    "sql_session_variables": _SESSION_VAR_SQL,
    "agg_basket_pairs": _basket_sql(),
    "agg_abc_classification": _ABC_SQL,
    "agg_new_vs_returning": _NEW_RET_SQL,
    "agg_period_overlap": _PERIOD_OVERLAP_SQL,
    "agg_pct_of_parent": _pct_of_parent_sql(),
    "set_ops_multiset": _SET_MULTI_SQL,
    "sql_recursive_hierarchy": _RECURSIVE_SQL,
    "agg_boolean": _AGG_BOOLEAN_SQL,
    "agg_minmax_by": _MINMAX_BY_SQL,
    "stat_crosstab": _CROSSTAB_SQL,
    "reshape_transpose": _transpose_sql(),
    "explode_outer_semantics": _EXPLODE_OUTER_SQL,
    "agg_filtered": _AGG_FILTERED_SQL,
    "agg_listagg_sorted": _LISTAGG_SQL,
    "q1_pricing_summary": _Q1_SQL,
    "agg_mode_per_group": _AGG_MODE_SQL,
    "reshape_unpivot": _RESHAPE_UNPIVOT_SQL,
    "agg_distinct": _AGG_DISTINCT_SQL,
    "agg_rollup": _AGG_ROLLUP_SQL,
    "agg_cube": _AGG_CUBE_SQL,
    "agg_grouping_sets": _AGG_GROUPING_SETS_SQL,
    "agg_pivot": _AGG_PIVOT_SQL,
    "agg_stats": _AGG_STATS_SQL,
    "sort_topk": _SORT_TOPK_SQL,
    "set_ops": _SET_OPS_SQL,
}
