"""Multi-join TPC-H-style analytical queries (Q3/Q5/Q10/Q18 adapted).

The reference library has no join or aggregation operators
(reference: src/parquetreader/reader.py is scan-only; SURVEY.md §2.2)
— these queries are the north-star analytical surface over its star
schema, adapted to the driver testdata columns (no o_shippriority /
l_commitdate / p_mfgr).

Scale notes (asserted in tests/test_plans.py):

- Q3: the c_mktsegment filter reduces customer ~5× before the join;
  customer is broadcast at bench SF and AQE decides at larger SF. The
  orders⋈lineitem join shuffles on orderkey with both date filters
  pushed to the parquet scans.
- Q5: classic 6-table star join. region→nation resolve as broadcasts
  (fixed 5/25 rows at ANY scale factor), supplier broadcast under AQE
  threshold; the two fact tables join on orderkey. The
  c_nationkey = s_nationkey condition is applied as a post-join filter
  on broadcast-resolved dims — no extra shuffle.
- Q10: one fact-fact shuffle (orders⋈lineitem), then a groupBy on
  custkey whose partial aggregation collapses the fact rows BEFORE the
  customer join; top-k via TakeOrderedAndProject (no full sort).
- Q18: self-aggregation of lineitem → semi-join filter on orders. The
  having-filter reduces the aggregate to a tiny key set, so the
  subsequent joins broadcast it; lineitem is scanned once for the agg
  and once for the final detail join (at 100 TB, caching the filtered
  key set is preferable to recomputing — expressed here as a reused
  DataFrame so Spark's shuffle reuse kicks in).

All money aggregates use the decimal-exact helpers
(parquet_batch_spark/functions/numeric.py) so results are bit-stable
under any partial-aggregation order — reproducible at any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_batch_spark.catalog import load
from parquet_batch_spark.functions.numeric import (
    dec9,
    dsum,
    dsum_expr,
    sql_dsum,
    sql_dsum_expr,
)

_REV = "CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))"


def _rev_col() -> F.Column:
    one = F.lit(1).cast("decimal(12,4)")
    return dec9("l_extendedprice") * (one - dec9("l_discount"))


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: unshipped-revenue per order for one
    market segment, top 10 by revenue."""
    cutoff = F.lit("1998-06-01").cast("timestamp_ntz")
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum_expr(_rev_col(), "revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


_Q3_SQL = f"""
SELECT l_orderkey, o_orderdate,
    {sql_dsum_expr(_REV)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local supplier volume: revenue per nation in ASIA for one
    year, where the supplier and customer share the nation."""
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum_expr(_rev_col(), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


_Q5_SQL = f"""
SELECT n_name,
    {sql_dsum_expr(_REV)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting: lost revenue per customer for
    returned lineitems in one quarter, top 20 customers."""
    lo = F.lit("1997-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-07-01").cast("timestamp_ntz")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    # Aggregate the fact side down to one row per customer BEFORE
    # joining customer attributes — at 100 TB this is the difference
    # between shuffling 100 TB of lineitem and a few GB of aggregates.
    per_cust = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(dsum_expr(_rev_col(), "revenue"))
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "c_acctbal", "revenue")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q10_SQL = f"""
SELECT c_custkey, c_name, n_name, c_acctbal, revenue
FROM (
    SELECT o_custkey, {sql_dsum_expr(_REV)} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY o_custkey
) pc
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: orders whose total quantity exceeds
    300, with customer attribution."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


_Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN (
    SELECT l_orderkey, {sql_dsum("l_quantity")} AS sum_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING {sql_dsum("l_quantity")} > 300
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
"""


QUERIES = {
    "tpch_q3": tpch_q3,
    "tpch_q5": tpch_q5,
    "tpch_q10": tpch_q10,
    "tpch_q18": tpch_q18,
}

ORACLES = {
    "tpch_q3": _Q3_SQL,
    "tpch_q5": _Q5_SQL,
    "tpch_q10": _Q10_SQL,
    "tpch_q18": _Q18_SQL,
}
