"""TPC-H-style queries, second tranche (Q2/Q4/Q6-Q9/Q12-Q17/Q19/Q22
adapted to the driver testdata columns).

The reference library implements no relational operators at all
(reference: src/parquetreader/reader.py — scan/projection only;
SURVEY.md §2.2), so these queries define the analytical surface of the
new engine over the same star schema. Adaptations vs. official TPC-H
(missing columns/tables in the driver testdata: partsupp, l_commitdate,
l_receiptdate, l_shipmode, p_container, p_mfgr, c_phone, comments):

- Q2  min-cost supplier  → min observed unit price (extendedprice /
  quantity) per part from lineitem instead of partsupp supplycost.
- Q4  late-order exists  → EXISTS(lineitem shipped > 60 days after the
  order date) instead of l_commitdate < l_receiptdate.
- Q9  profit             → revenue (no supplycost term).
- Q12 shipmode buckets   → ship-delay buckets (datediff days).
- Q16 complaint filter   → suppliers with negative acctbal.
- Q22 phone-prefix       → nationkey grouping.

Scale design notes (the shapes that matter at 100 TB):

- Every query aggregates or filters the fact table BEFORE joining
  dimension attributes; dims (nation/region always; part/supplier via
  AQE) resolve as broadcasts, so the only big shuffles are fact-side
  groupBys on their natural keys.
- Correlated subqueries (Q2/Q15/Q17/Q22) are expressed as aggregate +
  re-join, which Spark plans as a shuffle-reuse-friendly self-join —
  identical asymptotics to the decorrelation Catalyst would emit.
- All money sums run in DECIMAL (functions/numeric.py) — associative,
  order-insensitive, bit-stable under AQE re-planning at any cluster
  size, and hash-identical to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_batch_spark.catalog import load
from parquet_batch_spark.functions.numeric import (
    dec,
    dec9,
    dsum,
    dsum_expr,
    sql_dsum,
    sql_dsum_expr,
)

_REV = (
    "CAST(l_extendedprice AS DECIMAL(12,4))"
    " * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))"
)
# Mirrors functions/numeric.py::davg for an arbitrary grouped expr.
_AVG_QTY = (
    "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,6))"
    " AS DOUBLE) / COUNT(l_quantity)"
)


def _rev_col() -> F.Column:
    one = F.lit(1).cast("decimal(12,4)")
    return dec9("l_extendedprice") * (one - dec9("l_discount"))


def _davg_col(col: str) -> F.Column:
    return F.sum(dec(col)).cast("decimal(18,6)").cast("double") / F.count(col)


# --------------------------------------------------------------- Q2


def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 (adapted): per small STANDARD part, the supplier(s) offering
    the minimum observed unit price, from lineitem history."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    unit = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    )
    best = (
        unit.groupBy("l_partkey")
        .agg(F.min("unit_price").alias("min_price"))
        .withColumnRenamed("l_partkey", "bp_key")
    )
    return (
        unit.join(
            best,
            (unit.l_partkey == F.col("bp_key")) & (unit.unit_price == best.min_price),
        )
        .drop("bp_key")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            "p_partkey", "p_name", "p_size", "s_suppkey", "s_name", "s_acctbal",
            F.col("unit_price").alias("min_unit_price"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


_Q2_SQL = """
WITH unit AS (
    SELECT l_partkey, l_suppkey,
           MIN(l_extendedprice / l_quantity) AS unit_price
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'STANDARD' AND p_size <= 10
    GROUP BY l_partkey, l_suppkey
), best AS (
    SELECT l_partkey, MIN(unit_price) AS min_price FROM unit GROUP BY l_partkey
)
SELECT p_partkey, p_name, p_size, s_suppkey, s_name, s_acctbal,
       unit_price AS min_unit_price
FROM unit
JOIN best ON unit.l_partkey = best.l_partkey AND unit.unit_price = best.min_price
JOIN part ON unit.l_partkey = p_partkey
JOIN supplier ON unit.l_suppkey = s_suppkey
ORDER BY p_partkey, s_suppkey
"""


# --------------------------------------------------------------- Q4


def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 (adapted): order count per priority for 1996-Q1 orders with at
    least one lineitem shipped > 60 days after the order date."""
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1996-04-01").cast("timestamp_ntz")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------- Q6


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecasting-revenue change: pure scan-filter-aggregate; every
    predicate reaches the parquet row-group stats."""
    lo = F.lit("1997-01-01").cast("timestamp_ntz")
    hi = F.lit("1998-01-01").cast("timestamp_ntz")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo)
        & (F.col("l_shipdate") < hi)
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum_expr(dec9("l_extendedprice") * dec9("l_discount"), "revenue")
    )


_Q6_SQL = """
SELECT {dsum} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
""".format(
    dsum=sql_dsum_expr(
        "CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(12,4))"
    )
)


# --------------------------------------------------------------- Q7


def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping between two nations, by direction and ship
    year. Nation resolves via two broadcast joins; the only shuffle is
    the final 4-group aggregate."""
    n = load(spark, sf_dir, "nation")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    supp_n = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust_n = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(supp_n), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cust_n), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum_expr(_rev_col(), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year, {sql_dsum_expr(_REV)} AS revenue
FROM (
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
           l_extendedprice, l_discount
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------- Q8


def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: NATION_3's share of ECONOMY-part
    revenue sold into AMERICA, per order year. The share divides two
    decimal-exact sums, so the double quotient is bit-stable."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n = load(spark, sf_dir, "nation")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    cust_n = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    supp_n = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    zero = F.lit(0).cast("decimal(12,4)")
    return (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cust_n), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"), "left_semi")
        .join(F.broadcast(supp_n), F.col("s_nationkey") == F.col("sn_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .withColumn("volume", _rev_col())
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(zero)
                ).cast("decimal(18,6)").cast("double")
                / F.sum("volume").cast("decimal(18,6)").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_Q8_SQL = f"""
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE CAST(0 AS DECIMAL(12,4)) END) AS DECIMAL(18,6)) AS DOUBLE)
       / CAST(CAST(SUM(volume) AS DECIMAL(18,6)) AS DOUBLE) AS mkt_share
FROM (
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           {_REV} AS volume,
           ns.n_name AS supp_nation
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    JOIN region   ON nc.n_regionkey = r_regionkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


# --------------------------------------------------------------- Q9


def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 (adapted) product-type profit: revenue per supplier nation
    per order year over parts whose name contains 'widget'."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(dsum_expr(_rev_col(), "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


_Q9_SQL = f"""
SELECT nation, o_year, {sql_dsum_expr(_REV)} AS sum_profit
FROM (
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           l_extendedprice, l_discount
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


# --------------------------------------------------------------- Q12


def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 (adapted): priority mix by ship-delay bucket for 1997
    shipments — fast (<30 d), medium (<90 d), slow (90+ d)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = load(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay < 30, "fast").when(delay < 90, "medium").otherwise("slow")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn("delay_bucket", bucket)
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


_Q12_SQL = """
SELECT delay_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
           AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
           AS BIGINT) AS low_line_count
FROM (
    SELECT o_orderpriority,
           CASE WHEN date_diff('day', o_orderdate::DATE, l_shipdate::DATE) < 30 THEN 'fast'
                WHEN date_diff('day', o_orderdate::DATE, l_shipdate::DATE) < 90 THEN 'medium'
                ELSE 'slow' END AS delay_bucket
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) d
GROUP BY delay_bucket
ORDER BY delay_bucket
"""


# --------------------------------------------------------------- Q13


def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution: left join so zero-order
    customers survive; P-status orders excluded in the join condition."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderstatus != "P"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer
    LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderstatus <> 'P'
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------- Q14


def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect: PROMO-part share of one month's revenue,
    as a percentage. Numerator and denominator are decimal-exact."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    p = load(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(12,4)")
    joined = li.join(
        F.broadcast(p.select("p_partkey", "p_type")), li.l_partkey == F.col("p_partkey")
    ).withColumn("volume", _rev_col())
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(
                F.when(F.col("p_type") == "PROMO", F.col("volume")).otherwise(zero)
            ).cast("decimal(18,6)").cast("double")
            / F.sum("volume").cast("decimal(18,6)").cast("double")
        ).alias("promo_revenue")
    )


_Q14_SQL = f"""
SELECT 100.0 *
       CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN volume
                          ELSE CAST(0 AS DECIMAL(12,4)) END) AS DECIMAL(18,6)) AS DOUBLE)
       / CAST(CAST(SUM(volume) AS DECIMAL(18,6)) AS DOUBLE) AS promo_revenue
FROM (
    SELECT p_type, {_REV} AS volume
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
) pl
"""


# --------------------------------------------------------------- Q15


def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: supplier(s) with the maximum quarterly revenue.
    The revenue aggregate is computed once and self-joined against its
    max (shuffle reuse); equality on doubles is safe because both sides
    come off the same decimal-exact path."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    s = load(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(dsum_expr(_rev_col(), "total_revenue"))
    maxrev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(maxrev), F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q15_SQL = f"""
WITH revenue AS (
    SELECT l_suppkey, {sql_dsum_expr(_REV)} AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue
JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------- Q16


def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 (adapted) supplier-count per part descriptor, excluding one
    brand and suppliers in deficit (negative acctbal) via anti-join."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 9, 19, 29, 39, 49))
    )
    li = load(spark, sf_dir, "lineitem")
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 9, 19, 29, 39, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --------------------------------------------------------------- Q17


def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue: weekly-equivalent revenue from
    Brand#3 lineitems under 20% of that part's average quantity. The
    correlated avg subquery decorrelates to a per-part aggregate that is
    re-joined (both engines see the identical davg arithmetic)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li = load(spark, sf_dir, "lineitem")
    avg_qty = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg(_davg_col("l_quantity").alias("avg_qty"))
        .select(F.col("l_partkey").alias("ap_key"), "avg_qty")
    )
    return (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(avg_qty), li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


_Q17_SQL = f"""
WITH avg_qty AS (
    SELECT l_partkey AS ap_key, {_AVG_QTY} AS aq
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#3'
    GROUP BY l_partkey
)
SELECT {sql_dsum("l_extendedprice")} / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avg_qty ON l_partkey = ap_key
WHERE p_brand = 'Brand#3'
  AND l_quantity < 0.2 * aq
"""


# --------------------------------------------------------------- Q19


def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue under OR'd brand/size/quantity envelopes.
    Spark joins on partkey then applies the disjunction as a post-join
    filter — the same plan DuckDB picks for the OR-of-ANDs form."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    joined = li.join(
        F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
        li.l_partkey == F.col("p_partkey"),
    )
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 30)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(branch).agg(dsum_expr(_rev_col(), "revenue"))


_Q19_SQL = f"""
SELECT {sql_dsum_expr(_REV)} AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 20 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 30 AND l_quantity BETWEEN 20 AND 30)
"""


# --------------------------------------------------------------- Q22


def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 (adapted) global sales opportunity: per nation, the count and
    total balance of above-average-balance customers with no RECENT
    orders (none since 2000-01-01). The scalar avg broadcasts; the
    no-recent-orders test is a left anti-join against the date-filtered
    (and parquet-stats-pruned) orders scan."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        _davg_col("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("c_nationkey")
    )


_Q22_SQL = f"""
SELECT c_nationkey, COUNT(*) AS numcust, {sql_dsum("c_acctbal")} AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(18,6)) AS DOUBLE)
           / COUNT(c_acctbal)
    FROM customer WHERE c_acctbal > 0
)
AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
)
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# --------------------------------------------------------------- Q11


def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 (adapted) important stock: per (suppkey, partkey) traded
    value from lineitem (no partsupp table), keeping pairs whose value
    exceeds 0.05% of the total. The scalar total broadcasts; both
    aggregations share one shuffle lineage."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    nkeys = n.filter(F.col("n_name").isin("NATION_1", "NATION_2")).select("n_nationkey")
    snk = s.join(F.broadcast(nkeys), s.s_nationkey == F.col("n_nationkey"), "left_semi")
    li_n = li.join(
        F.broadcast(snk.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"), "left_semi"
    )
    per_pair = li_n.groupBy("l_suppkey", "l_partkey").agg(
        dsum("l_extendedprice", "pair_value")
    )
    total = per_pair.agg((F.sum(dec("pair_value")) * 0.0005).cast("double").alias("thr"))
    return (
        per_pair.crossJoin(F.broadcast(total))
        .filter(F.col("pair_value") > F.col("thr"))
        .select("l_suppkey", "l_partkey", "pair_value")
        .orderBy(F.desc("pair_value"), "l_suppkey", "l_partkey")
    )


_Q11_SQL = f"""
WITH per_pair AS (
    SELECT l_suppkey, l_partkey, {sql_dsum("l_extendedprice")} AS pair_value
    FROM lineitem
    WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_1', 'NATION_2')
    )
    GROUP BY l_suppkey, l_partkey
)
SELECT l_suppkey, l_partkey, pair_value
FROM per_pair
WHERE pair_value > (
    SELECT CAST(SUM(CAST(pair_value AS DECIMAL(18,4))) * 0.0005 AS DOUBLE) FROM per_pair
)
ORDER BY pair_value DESC, l_suppkey, l_partkey
"""


# --------------------------------------------------------------- Q20


def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 (adapted) potential part promotion: suppliers who moved
    more than 50 units of some red part in 1997 — a nested
    semi-join chain (parts → qualifying (supp,part) volumes →
    suppliers), each level collapsing before the next join."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    qual = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum("l_quantity", "qty"))
        .filter(F.col("qty") > 50.0)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(qual, s.s_suppkey == qual.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


_Q20_SQL = f"""
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
    SELECT l_suppkey FROM (
        SELECT l_suppkey, l_partkey, {sql_dsum("l_quantity")} AS qty
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
    ) q WHERE qty > 50.0
)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------- Q21


def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 (adapted) suppliers who kept orders waiting: count of
    multi-supplier F-status orders where THIS supplier shipped late
    (>60 days after order) and no co-supplier did. The exists /
    not-exists pair decorrelates to two aggregates over one
    lineitem⋈orders lineage."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    lo = li.join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
    per = (
        lo.withColumn(
            "late",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).cast("int"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("late"))
    )
    stats = per.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("late").alias("n_late"),
    )
    waiting = (
        per.filter(F.col("late") == 1)
        .join(
            stats.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
            "l_orderkey",
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return (
        waiting.join(s, waiting.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_suppkey")
    )


_Q21_SQL = """
WITH per AS (
    SELECT l_orderkey, l_suppkey,
        MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS late
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY l_orderkey, l_suppkey
), stats AS (
    SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late
    FROM per GROUP BY l_orderkey
)
SELECT s_suppkey, s_name, numwait
FROM (
    SELECT l_suppkey, COUNT(*) AS numwait
    FROM per
    WHERE late = 1
      AND l_orderkey IN (SELECT l_orderkey FROM stats WHERE n_supp > 1 AND n_late = 1)
    GROUP BY l_suppkey
) w
JOIN supplier ON l_suppkey = s_suppkey
ORDER BY numwait DESC, s_suppkey
"""


QUERIES = {
    "tpch_q2": tpch_q2,
    "tpch_q11": tpch_q11,
    "tpch_q20": tpch_q20,
    "tpch_q21": tpch_q21,
    "tpch_q4": tpch_q4,
    "tpch_q6": tpch_q6,
    "tpch_q7": tpch_q7,
    "tpch_q8": tpch_q8,
    "tpch_q9": tpch_q9,
    "tpch_q12": tpch_q12,
    "tpch_q13": tpch_q13,
    "tpch_q14": tpch_q14,
    "tpch_q15": tpch_q15,
    "tpch_q16": tpch_q16,
    "tpch_q17": tpch_q17,
    "tpch_q19": tpch_q19,
    "tpch_q22": tpch_q22,
}

ORACLES = {
    "tpch_q2": _Q2_SQL,
    "tpch_q11": _Q11_SQL,
    "tpch_q20": _Q20_SQL,
    "tpch_q21": _Q21_SQL,
    "tpch_q4": _Q4_SQL,
    "tpch_q6": _Q6_SQL,
    "tpch_q7": _Q7_SQL,
    "tpch_q8": _Q8_SQL,
    "tpch_q9": _Q9_SQL,
    "tpch_q12": _Q12_SQL,
    "tpch_q13": _Q13_SQL,
    "tpch_q14": _Q14_SQL,
    "tpch_q15": _Q15_SQL,
    "tpch_q16": _Q16_SQL,
    "tpch_q17": _Q17_SQL,
    "tpch_q19": _Q19_SQL,
    "tpch_q22": _Q22_SQL,
}
