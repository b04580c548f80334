"""Window-function operators.

Windows shuffle once on the partition key, then sort within
partitions. At 100 TB the concern is partition-key cardinality vs
skew: customer/supplier partitions are plentiful and narrow, so these
plans parallelize across executors; a window over a constant key would
serialize and is never used here.

Absent from the reference (SURVEY.md §2.2 "Window functions: Absent")
— north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parquet_batch_spark.catalog import load
from parquet_batch_spark.functions.numeric import dec


def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer segment by price (dense ranking
    pattern: rank within partition then filter ≤ k)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .orderBy("c_mktsegment", "rnk")
    )


_WINDOW_TOPK_SQL = """
SELECT c_mktsegment, o_orderkey, o_totalprice, rnk FROM (
    SELECT c_mktsegment, o_orderkey, o_totalprice,
        (ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                           ORDER BY o_totalprice DESC, o_orderkey))::INTEGER AS rnk
    FROM orders JOIN customer ON o_custkey = c_custkey
)
WHERE rnk <= 3
ORDER BY c_mktsegment, rnk
"""


def window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / ntile over one partition
    spec (suppliers ranked by balance within nation)."""
    s = load(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return (
        s.select("s_nationkey", "s_suppkey", "s_acctbal")
        .withColumn("rnk", F.rank().over(w))
        .withColumn("drnk", F.dense_rank().over(w))
        .withColumn("prnk", F.round(F.percent_rank().over(w), 6))
        .withColumn("quartile", F.ntile(4).over(w))
        .orderBy("s_nationkey", "rnk", "s_suppkey")
    )


_WINDOW_RANKS_SQL = """
SELECT s_nationkey, s_suppkey, s_acctbal,
    (RANK() OVER w)::INTEGER AS rnk,
    (DENSE_RANK() OVER w)::INTEGER AS drnk,
    ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
    (NTILE(4) OVER w)::INTEGER AS quartile
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
ORDER BY s_nationkey, rnk, s_suppkey
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + moving average over an ordered frame
    (cumulative revenue per customer across their orders)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    mov = w.rowsBetween(-2, W.currentRow)
    return (
        o.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .withColumn("cum_spend", F.sum(dec("o_totalprice")).over(cum).cast("double"))
        .withColumn(
            "mov_avg3",
            (F.sum(dec("o_totalprice")).over(mov).cast("double") / F.count(F.lit(1)).over(mov)),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


_WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER cum AS DOUBLE) AS cum_spend,
    (CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER mov AS DOUBLE)
        / COUNT(*) OVER mov) AS mov_avg3
FROM orders
WINDOW cum AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       mov AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with defaults + first/last value frames (event gaps
    per user: time since previous event, type of next event)."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    # exact µs epoch on both engines (session tz pinned to UTC by the
    # catalog loader, so the ntz→instant cast is deterministic)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return (
        ev.select("user_id", "event_id", "ts", "event_type")
        .withColumn("gap_us", us - F.lag(us).over(w))
        .withColumn("next_type", F.lead("event_type", 1, "NONE").over(w))
        .withColumn("first_type", F.first("event_type").over(full))
        .orderBy("user_id", "ts", "event_id")
    )


_WINDOW_LAG_LEAD_SQL = """
SELECT user_id, event_id, ts, event_type,
    epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us,
    COALESCE(LEAD(event_type, 1) OVER w, 'NONE') AS next_type,
    FIRST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, ts, event_id
"""


def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap > 30 min starts a new session (classic
    lag + conditional cumsum — one shuffle on user_id, linear work).

    This is the batch formulation; streaming/windows.py holds the
    session_window() streaming equivalent.
    """
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    wc = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = (
        ev.select("user_id", "event_id", "ts", "value")
        .withColumn("new_sess", new_sess)
        .withColumn("session_id", F.sum("new_sess").over(wc).cast("bigint"))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(dec("value")).cast("double").alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )


_WINDOW_SESSIONIZE_SQL = """
SELECT user_id, session_id,
    COUNT(*) AS n_events,
    MIN(ts) AS session_start,
    MAX(ts) AS session_end,
    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
FROM (
    SELECT user_id, event_id, ts, value,
        CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM (
        SELECT user_id, event_id, ts, value,
            CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                 OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                 THEN 1 ELSE 0 END AS new_sess
        FROM events
    )
)
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: trailing-7-day revenue and active
    day count per order day. The range key is an integer day number so
    both engines bound the frame identically; the in-frame sum runs in
    DECIMAL, exact under either engine's frame-evaluation strategy
    (Spark's running accumulation vs DuckDB's segment tree)."""
    o = load(spark, sf_dir, "orders")
    daily = (
        o.groupBy("o_orderdate")
        .agg(
            F.sum(dec("o_totalprice")).alias("day_rev_dec"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .withColumn(
            "day_no",
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz")),
        )
    )
    w = W.orderBy("day_no").rangeBetween(-6, 0)
    return (
        daily.select(
            "o_orderdate",
            "n_orders",
            F.col("day_rev_dec").cast("double").alias("day_rev"),
            F.sum("day_rev_dec").over(w).cast("double").alias("rev_7d"),
            F.count(F.lit(1)).over(w).alias("days_in_window"),
        )
        .orderBy("o_orderdate")
    )


_WINDOW_RANGE_SQL = """
SELECT o_orderdate, n_orders,
    CAST(day_rev_dec AS DOUBLE) AS day_rev,
    CAST(SUM(day_rev_dec) OVER w AS DOUBLE) AS rev_7d,
    COUNT(*) OVER w AS days_in_window
FROM (
    SELECT o_orderdate,
        SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS day_rev_dec,
        COUNT(*) AS n_orders,
        date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS day_no
    FROM orders
    GROUP BY o_orderdate
) d
WINDOW w AS (ORDER BY day_no RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY o_orderdate
"""


def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — ntile quartiles, percent_rank,
    cume_dist over customer balances per market segment. All three are
    rank arithmetic (exact integer ratios in double), so cross-engine
    results are bit-identical without rounding."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.select("c_custkey", "c_mktsegment", "c_acctbal")
        .withColumn("quartile", F.ntile(4).over(w))
        .withColumn("pct_rank", F.percent_rank().over(w))
        .withColumn("cume", F.cume_dist().over(w))
        .orderBy("c_mktsegment", "c_acctbal", "c_custkey")
    )


_WINDOW_DISTRIBUTION_SQL = """
SELECT c_custkey, c_mktsegment, c_acctbal,
    (NTILE(4) OVER w)::INTEGER AS quartile,
    PERCENT_RANK() OVER w AS pct_rank,
    CUME_DIST() OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
ORDER BY c_mktsegment, c_acctbal, c_custkey
"""


ZS_FRAME = 20  # trailing events per user
ZS_MIN_N = 5  # warmup: need this many priors
ZS_THRESHOLD = 3.0


def window_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style anomaly detection: each event scored against the
    trailing {ZS_FRAME} events of the SAME user (frame excludes the
    current row — no self-leak), flagged when |z| > {ZS_THRESHOLD}.
    The rolling moments come from DECIMAL window sums (sum and
    sum-of-squares), so Spark's running-frame accumulation and DuckDB's
    segment tree produce bit-identical inputs to the double-arithmetic
    finish — the float-order trap rolling variance usually falls into.
    The sum-of-squares is squeezed to (18,4) before the double cast
    (DuckDB's int128→double conversion is off by 1 ulp past 2^53)."""
    from parquet_batch_spark.functions.numeric import dec

    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZS_FRAME, -1)
    )
    n = F.count(F.lit(1)).over(w)
    mean = F.sum(dec("value")).over(w).cast("double") / n
    msq = (
        F.sum(dec("value") * dec("value")).over(w).cast("decimal(18,4)").cast("double")
        / n
    )
    std = F.sqrt(F.greatest(msq - mean * mean, F.lit(0.0)))
    z = (F.col("value") - mean) / std
    return (
        ev.select("user_id", "ts", "event_id", "value",
                  n.alias("n_prior"), std.alias("std"), z.alias("z"))
        .filter((F.col("n_prior") >= ZS_MIN_N) & (F.col("std") > 0)
                & (F.abs(F.col("z")) > ZS_THRESHOLD))
        .select("user_id", "ts", "event_id", "value", F.round("z", 6).alias("zscore"))
        .orderBy("user_id", "ts", "event_id")
    )


_WINDOW_ANOMALY_SQL = f"""
SELECT user_id, ts, event_id, value, ROUND((value - mean) / std, 6) AS zscore
FROM (
    SELECT user_id, ts, event_id, value, n_prior, mean,
        SQRT(GREATEST(msq - mean * mean, 0.0)) AS std
    FROM (
        SELECT user_id, ts, event_id, value,
            COUNT(*) OVER w AS n_prior,
            CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
                / COUNT(*) OVER w AS mean,
            CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))
                           * CAST(value AS DECIMAL(18,4))) OVER w
                      AS DECIMAL(18,4)) AS DOUBLE) / COUNT(*) OVER w AS msq
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {ZS_FRAME} PRECEDING AND 1 PRECEDING)
    )
)
WHERE n_prior >= {ZS_MIN_N} AND std > 0 AND ABS((value - mean) / std) > {ZS_THRESHOLD}
ORDER BY user_id, ts, event_id
"""


GAP_BUCKET_SEC = 6 * 3600  # resample grain


def window_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + forward fill: events bucketed to a 6-hour
    grid per user, EVERY bucket between the user's first and last
    activity emitted (gaps get n_events=0), and the last observed max
    value carried forward — the standard telemetry gap-fill. The spine
    comes from ``sequence()`` + explode (each user's row count is its
    own time span — no global cartesian), the fill from
    ``last(ignorenulls)`` over an unbounded-preceding frame. Only
    order-independent aggregates (count/max) cross the engines, so no
    float-summation drift."""
    ev = load(spark, sf_dir, "events")
    b = F.floor(F.unix_timestamp("ts") / GAP_BUCKET_SEC)
    obs = (
        ev.select("user_id", b.alias("b"), "value")
        .groupBy("user_id", "b")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("value").alias("mx"))
    )
    spine = (
        obs.groupBy("user_id")
        .agg(F.min("b").alias("mn"), F.max("b").alias("mx_b"))
        .select("user_id", F.explode(F.sequence("mn", "mx_b")).alias("b"))
    )
    w = W.partitionBy("user_id").orderBy("b").rowsBetween(W.unboundedPreceding, 0)
    return (
        spine.join(obs, ["user_id", "b"], "left")
        .select(
            "user_id",
            F.timestamp_seconds(F.col("b") * GAP_BUCKET_SEC)
            .cast("timestamp_ntz")
            .alias("bucket_ts"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("mx", ignorenulls=True).over(w).alias("filled_max"),
        )
        .orderBy("user_id", "bucket_ts")
    )


_WINDOW_GAP_FILL_SQL = f"""
WITH obs AS (
    SELECT user_id, CAST(FLOOR(epoch(ts) / {GAP_BUCKET_SEC}) AS BIGINT) AS b,
        COUNT(*) AS n_events, MAX(value) AS mx
    FROM events GROUP BY user_id, b
),
spine AS (
    SELECT user_id, unnest(generate_series(MIN(b), MAX(b))) AS b
    FROM obs GROUP BY user_id
)
SELECT s.user_id,
    (to_timestamp(s.b * {GAP_BUCKET_SEC}))::TIMESTAMP AS bucket_ts,
    COALESCE(o.n_events, 0) AS n_events,
    LAST_VALUE(o.mx IGNORE NULLS) OVER (
        PARTITION BY s.user_id ORDER BY s.b
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_max
FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.b = o.b
ORDER BY s.user_id, bucket_ts
"""


# ---------------------------------------------------- rolling median

ROLL_MED_N = 25  # trailing window width (rows)


def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median of event value over each user's trailing
    {ROLL_MED_N} events — the robust-baseline monitor (median ignores
    the spike that wrecks a rolling mean). ``percentile(…, 0.5)`` as a
    WINDOW aggregate: the frame buffer is at most {ROLL_MED_N} values,
    so unlike a whole-group exact percentile this stays O(frame) memory
    per row at any scale. Interpolation parity with the oracle's
    ``quantile_cont`` is already established by agg_percentiles (the
    midpoint formula is the identical IEEE expression in both engines).

    Scale: one shuffle (window partition by user_id); frame evaluation
    is per-row bounded, no whole-partition buffering beyond the sort.
    The output keeps every 10th event per user (deterministic thinning
    on event_id) so the result set stays bench-sized without losing the
    per-row check granularity.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(ROLL_MED_N - 1), 0)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.expr("percentile(value, 0.5)")
            .over(w)
            .alias("rolling_median"),
            F.count(F.lit(1)).over(w).alias("n_in_frame"),
        )
        .filter(F.col("event_id") % 10 == 0)
        .orderBy("user_id", "event_id")
    )


_ROLL_MED_SQL = f"""
SELECT user_id, event_id, rolling_median, n_in_frame
FROM (
    SELECT user_id, event_id,
           quantile_cont(value, 0.5) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {ROLL_MED_N - 1} PRECEDING AND CURRENT ROW
           ) AS rolling_median,
           COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {ROLL_MED_N - 1} PRECEDING AND CURRENT ROW
           ) AS n_in_frame
    FROM events
)
WHERE event_id % 10 = 0
ORDER BY user_id, event_id
"""


# ------------------------------------------- running distinct count

def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count of DISTINCT event types seen so far per user —
    the engagement-breadth metric ("how many features has this user
    touched by time t?"). COUNT(DISTINCT) is not a window function in
    either engine; the exact decomposition is: flag each row that is
    the FIRST occurrence of its (user, event_type), then running-sum
    the flags — two windows, both exact integers, no approximation.

    Scale: both windows partition by user_id (the second by
    (user_id, event_type)), so this is one shuffle on user_id with
    co-partitioned reuse; per-row state is O(1). Output thinned to
    every 10th event like window_rolling_median.
    """
    ev = load(spark, sf_dir, "events")
    first = (
        F.row_number().over(
            W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        )
        == 1
    ).cast("long")
    running = F.sum("is_first").over(
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        ev.select("user_id", "event_id", first.alias("is_first"), "ts")
        .withColumn("n_types_seen", running)
        .filter(F.col("event_id") % 10 == 0)
        .select("user_id", "event_id", "n_types_seen")
        .orderBy("user_id", "event_id")
    )


_RUN_DISTINCT_SQL = """
SELECT user_id, event_id, n_types_seen
FROM (
    SELECT user_id, event_id,
           CAST(SUM(is_first) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_types_seen
    FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id
               ) = 1 THEN 1 ELSE 0 END AS is_first
        FROM events
    )
)
WHERE event_id % 10 = 0
ORDER BY user_id, event_id
"""


# ------------------------------------------ period-over-period change

def window_percent_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue change per order status — the
    reporting primitive behind every trend dashboard. Revenue is the
    exact-decimal monthly sum (numeric.py policy) cast to double, so
    the lag ratio divides two bit-identical doubles and rounds to 6
    decimals: cross-engine exact despite being a derived float.

    Scale: one shuffle for the monthly aggregate (the reduction), one
    partition-local window over the ~100-row month series per status —
    the window input is the REDUCED table, never the fact table.
    """
    from parquet_batch_spark.functions.numeric import dsum

    o = load(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.col("o_orderstatus").alias("status"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(dsum("o_totalprice", "revenue"))
    )
    w = W.partitionBy("status").orderBy("month")
    prev = F.lag("revenue").over(w)
    return (
        monthly.select(
            "status",
            "month",
            "revenue",
            F.round((F.col("revenue") - prev) / prev * 100, 6).alias(
                "pct_change"
            ),
        )
        .orderBy("status", "month")
    )


def _pct_change_sql() -> str:
    from parquet_batch_spark.functions.numeric import sql_dsum

    return f"""
WITH monthly AS (
    SELECT o_orderstatus AS status, STRFTIME(o_orderdate, '%Y-%m') AS month,
           {sql_dsum("o_totalprice")} AS revenue
    FROM orders
    GROUP BY status, month
)
SELECT status, month, revenue,
       ROUND((revenue - LAG(revenue) OVER w) / LAG(revenue) OVER w * 100, 6)
           AS pct_change
FROM monthly
WINDOW w AS (PARTITION BY status ORDER BY month)
ORDER BY status, month
"""


# ---------------------------------------------- nth_value frames

def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value / first / last over a full-partition frame: each
    customer's order history annotated with their 1st, 2nd and latest
    order keys — the "anchor rows" pattern (compare every row to
    onboarding and to the current state). One shuffle on the partition
    key; the full frame costs one pass because the anchors are
    frame-constant.

    Output thinned to one summary row per customer (the anchors are
    per-partition constants; emitting them per order row would be
    40× redundant).
    """
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    annotated = o.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
        F.last("o_orderkey").over(w).alias("latest_key"),
        F.count(F.lit(1)).over(w).alias("n_orders"),
    )
    return annotated.dropDuplicates(["o_custkey"]).orderBy("o_custkey")


_NTH_VALUE_SQL = """
SELECT DISTINCT o_custkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_key,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_key,
       LAST_VALUE(o_orderkey) OVER w AS latest_key,
       COUNT(*) OVER w AS n_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey
"""


# --------------------------------------------- gaps and islands

def window_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: the longest consecutive run of SAME-TYPE
    events per user — the classic streak/sequence-mining pattern
    (error bursts, repeated retries, habit streaks) that plain
    aggregation can't see. The standard O(n) formulation: island id =
    row_number over the user minus row_number over (user, type) is
    constant within a run — two window passes sharing one shuffle on
    user_id, then an island-size aggregate; no self-join, no
    quadratic anything.

    Output: per (user, event_type), the longest island and island
    count.
    """
    ev = load(spark, sf_dir, "events")
    rn_all = F.row_number().over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    rn_typ = F.row_number().over(
        W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    )
    islands = ev.select(
        "user_id",
        "event_type",
        (rn_all - rn_typ).alias("island"),
    )
    sized = islands.groupBy("user_id", "event_type", "island").agg(
        F.count(F.lit(1)).alias("streak")
    )
    return (
        sized.groupBy("user_id", "event_type")
        .agg(
            F.max("streak").alias("longest_streak"),
            F.count(F.lit(1)).alias("n_islands"),
        )
        .orderBy("user_id", "event_type")
    )


_STREAK_SQL = """
WITH islands AS (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS island
    FROM events
),
sized AS (
    SELECT user_id, event_type, island, COUNT(*) AS streak
    FROM islands GROUP BY user_id, event_type, island
)
SELECT user_id, event_type,
       CAST(MAX(streak) AS BIGINT) AS longest_streak,
       COUNT(*) AS n_islands
FROM sized
GROUP BY user_id, event_type
ORDER BY user_id, event_type
"""


# ------------------------------------------- interval coalescing

IVC_WIDTH_US = 1_800_000_000  # each event spawns a [ts, ts+30min) interval


def window_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping/touching per-user intervals (each event opens
    a 30-minute window; overlapping windows coalesce into islands) —
    the classic interval-union problem behind ad-burst detection,
    on-call coverage and effective-watch-time. Differs from
    ``window_sessionize``: inputs are [start, end) INTERVALS, and two
    intervals merge when start ≤ running-max(previous ends) — the
    cumulative-max gaps-and-islands construction, exact in integer µs.

    Scale: one window per user ordered by start (a hash shuffle at
    user grain), running-max and running-sum frames only — no
    self-join of intervals, no explode of timeline ticks.
    """
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = ev.select(
        "user_id",
        "event_id",
        us.alias("s"),
        (us + IVC_WIDTH_US).alias("e"),
    )
    order = W.partitionBy("user_id").orderBy("s", "e", "event_id")
    prev_max_e = F.max("e").over(order.rowsBetween(W.unboundedPreceding, -1))
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1)
        .otherwise(0)
        .alias("new_island"),
        F.col("event_id"),
    )
    island = F.sum("new_island").over(order.rowsBetween(W.unboundedPreceding, 0))
    islands = (
        flagged.select("user_id", "s", "e", island.alias("island"))
        .groupBy("user_id", "island")
        .agg(F.min("s").alias("start_us"), F.max("e").alias("end_us"))
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum(F.col("end_us") - F.col("start_us")).alias("covered_us"),
        )
        .orderBy("user_id")
    )


_IVC_SQL = f"""
WITH iv AS (
    SELECT user_id, event_id, epoch_us(ts) AS s,
           epoch_us(ts) + {IVC_WIDTH_US} AS e
    FROM events
),
flagged AS (
    SELECT user_id, s, e,
           CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     IS NULL
                  OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                THEN 1 ELSE 0 END AS new_island,
           event_id
    FROM iv
),
islands AS (
    SELECT user_id, s, e,
           SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                                 ROWS UNBOUNDED PRECEDING) AS island
    FROM flagged
),
merged AS (
    SELECT user_id, island, MIN(s) AS start_us, MAX(e) AS end_us
    FROM islands GROUP BY user_id, island
)
SELECT user_id, COUNT(*) AS n_islands,
       CAST(SUM(end_us - start_us) AS BIGINT) AS covered_us
FROM merged
GROUP BY user_id
ORDER BY user_id
"""


# ------------------------------------------- linear interpolation

INTERP_BUCKET_SEC = 21600  # 6-hour resample grid (matches gap_fill)


def window_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + LINEAR interpolation — gap_fill's
    forward-fill sibling for continuous signals (sensor readings,
    rates) where a flat carry-forward biases downstream aggregates:
    missing buckets get v0 + (v1−v0)·(t−t0)/(t1−t0) between the
    nearest observed neighbors. Spine construction is per-user
    ``sequence()`` (no global cartesian); neighbors come from four
    IGNORE-NULLS window lookups (last/first value and bucket id over
    the preceding/following frames). Interior gaps always have both
    neighbors (the spine is bounded by each user's first/last observed
    bucket), so the arithmetic never divides by a missing anchor. The
    interpolation expression is the same IEEE double sequence in both
    engines; rounded to 6dp.
    """
    ev = load(spark, sf_dir, "events")
    b = F.floor(F.unix_timestamp("ts") / INTERP_BUCKET_SEC)
    # localCheckpoint (r12): obs feeds BOTH the spine bounds and the
    # left join — without materialization the bucket groupBy shuffle
    # over the event corpus runs twice (once per consumer subtree)
    obs = (
        ev.select("user_id", b.alias("b"), "value")
        .groupBy("user_id", "b")
        .agg(F.max("value").alias("mx"))
        .localCheckpoint(eager=False)
    )
    spine = (
        obs.groupBy("user_id")
        .agg(F.min("b").alias("mn"), F.max("b").alias("mx_b"))
        .select("user_id", F.explode(F.sequence("mn", "mx_b")).alias("b"))
    )
    joined = spine.join(obs, ["user_id", "b"], "left")
    wp = W.partitionBy("user_id").orderBy("b").rowsBetween(W.unboundedPreceding, 0)
    wf = W.partitionBy("user_id").orderBy("b").rowsBetween(0, W.unboundedFollowing)
    obs_b = F.when(F.col("mx").isNotNull(), F.col("b"))
    v0 = F.last("mx", ignorenulls=True).over(wp)
    b0 = F.last(obs_b, ignorenulls=True).over(wp)
    v1 = F.first("mx", ignorenulls=True).over(wf)
    b1 = F.first(obs_b, ignorenulls=True).over(wf)
    interp = F.when(F.col("mx").isNotNull(), F.col("mx")).otherwise(
        v0 + (v1 - v0) * (F.col("b") - b0) / (b1 - b0)
    )
    return (
        joined.select(
            "user_id",
            F.timestamp_seconds(F.col("b") * INTERP_BUCKET_SEC)
            .cast("timestamp_ntz")
            .alias("bucket_ts"),
            F.col("mx").isNotNull().alias("observed"),
            F.round(interp, 6).alias("value_interp"),
        )
        .orderBy("user_id", "bucket_ts")
    )


_INTERP_SQL = f"""
WITH obs AS (
    SELECT user_id, CAST(FLOOR(epoch(ts) / {INTERP_BUCKET_SEC}) AS BIGINT) AS b,
           MAX(value) AS mx
    FROM events GROUP BY user_id, b
),
spine AS (
    SELECT user_id, unnest(generate_series(MIN(b), MAX(b))) AS b
    FROM obs GROUP BY user_id
),
j AS (
    SELECT s.user_id, s.b, o.mx,
           CASE WHEN o.mx IS NOT NULL THEN s.b END AS ob
    FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.b = o.b
),
n AS (
    SELECT user_id, b, mx,
           LAST_VALUE(mx IGNORE NULLS) OVER wp AS v0,
           LAST_VALUE(ob IGNORE NULLS) OVER wp AS b0,
           FIRST_VALUE(mx IGNORE NULLS) OVER wf AS v1,
           FIRST_VALUE(ob IGNORE NULLS) OVER wf AS b1
    FROM j
    WINDOW wp AS (PARTITION BY user_id ORDER BY b
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wf AS (PARTITION BY user_id ORDER BY b
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id,
       (to_timestamp(b * {INTERP_BUCKET_SEC}))::TIMESTAMP AS bucket_ts,
       (mx IS NOT NULL) AS observed,
       ROUND(CASE WHEN mx IS NOT NULL THEN mx
             ELSE v0 + (v1 - v0) * (b - b0) / (b1 - b0) END, 6) AS value_interp
FROM n
ORDER BY user_id, bucket_ts
"""


# ------------------------------------------- Bollinger band breaches

BOLL_N = 10  # trailing window width
BOLL_K = 2  # band width in standard deviations


def window_bollinger_breaches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breach census: per user, how often the value
    pierces mean ± {BOLL_K}σ of its trailing-{BOLL_N} window — the
    volatility-adaptive threshold that a fixed cutoff can't give
    (cf. ``window_anomaly_zscore``'s global z-score). Trailing moments
    come from exact integer centi-sums over the ROWS frame; σ is one
    correctly-rounded sqrt; the breach comparisons run the identical
    IEEE expression in both engines. Rows with a full window only.
    """
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    vc = F.round(F.col("value") * 100).cast("long")
    base = ev.select("user_id", vc.alias("vc"), us.alias("us"), "event_id")
    w = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-(BOLL_N - 1), 0)
    )
    n = F.count(F.lit(1)).over(w)
    sx = F.sum("vc").over(w)
    sxx = F.sum(F.col("vc") * F.col("vc")).over(w)
    mean = sx.cast("double") / n
    var = (
        n.cast("double") * sxx.cast("double")
        - sx.cast("double") * sx.cast("double")
    ) / (n.cast("double") * n.cast("double"))
    sd = F.sqrt(var)
    scored = base.select(
        "user_id",
        "vc",
        n.alias("wn"),
        mean.alias("m"),
        sd.alias("sd"),
    ).filter(F.col("wn") == BOLL_N)
    return (
        scored.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum(
                (F.col("vc") > F.col("m") + BOLL_K * F.col("sd")).cast("long")
            ).alias("n_upper_breach"),
            F.sum(
                (F.col("vc") < F.col("m") - BOLL_K * F.col("sd")).cast("long")
            ).alias("n_lower_breach"),
        )
        .orderBy("user_id")
    )


_BOLL_SQL = f"""
WITH base AS (
    SELECT user_id,
           CAST(ROUND(value * 100) AS BIGINT) AS vc,
           epoch_us(ts) AS us, event_id
    FROM events
),
scored AS (
    SELECT user_id, vc,
           COUNT(*) OVER w AS wn,
           CAST(SUM(vc) OVER w AS DOUBLE) / COUNT(*) OVER w AS m,
           SQRT((CAST(COUNT(*) OVER w AS DOUBLE) * CAST(SUM(vc * vc) OVER w AS DOUBLE)
                 - CAST(SUM(vc) OVER w AS DOUBLE) * CAST(SUM(vc) OVER w AS DOUBLE))
                / (CAST(COUNT(*) OVER w AS DOUBLE) * CAST(COUNT(*) OVER w AS DOUBLE)))
               AS sd
    FROM base
    WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN {BOLL_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT user_id,
       COUNT(*) AS n_scored,
       CAST(SUM(CASE WHEN vc > m + {BOLL_K} * sd THEN 1 ELSE 0 END) AS BIGINT)
           AS n_upper_breach,
       CAST(SUM(CASE WHEN vc < m - {BOLL_K} * sd THEN 1 ELSE 0 END) AS BIGINT)
           AS n_lower_breach
FROM scored
WHERE wn = {BOLL_N}
GROUP BY user_id
ORDER BY user_id
"""


# ------------------------------------------- local extrema census


def window_local_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local extrema census per user value series: peaks (value
    strictly above both neighbors) and troughs (strictly below) — the
    turning-point counter behind volatility heuristics and
    peak-detection prefilters. One lag+lead window pass over the
    (ts, event_id)-ordered series, then a per-user count aggregate;
    strict comparisons on raw 2-dp doubles are engine-exact. Series
    endpoints have one neighbor and are never extrema.
    """
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy(us, "event_id")
    prev = F.lag("value").over(w)
    nxt = F.lead("value").over(w)
    marked = ev.select(
        "user_id",
        "value",
        ((F.col("value") > prev) & (F.col("value") > nxt)).cast("long").alias("is_peak"),
        ((F.col("value") < prev) & (F.col("value") < nxt)).cast("long").alias("is_trough"),
    )
    return (
        marked.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("is_peak").alias("n_peaks"),
            F.sum("is_trough").alias("n_troughs"),
        )
        .orderBy("user_id")
    )


_EXTREMA_SQL = """
WITH marked AS (
    SELECT user_id, value,
           CASE WHEN value > LAG(value) OVER w AND value > LEAD(value) OVER w
                THEN 1 ELSE 0 END AS is_peak,
           CASE WHEN value < LAG(value) OVER w AND value < LEAD(value) OVER w
                THEN 1 ELSE 0 END AS is_trough
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
)
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(is_peak) AS BIGINT) AS n_peaks,
       CAST(SUM(is_trough) AS BIGINT) AS n_troughs
FROM marked
GROUP BY user_id
ORDER BY user_id
"""


# ------------------------------------------- seasonal naive baseline

SEASONAL_LAG_DAYS = 7


def window_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecasting baseline: predict each day's revenue
    with the value from {SEASONAL_LAG_DAYS} days earlier (same
    weekday), and score the baseline's MAE / worst error per status —
    the floor every forecasting model must beat before it ships.
    Daily revenue reduces first (exact decimal), the lag runs over the
    REDUCED daily table, and the error aggregation re-enters decimal
    (|a−b| of exact (18,6) values) so the MAE is bit-stable.
    """
    o = load(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            "o_orderstatus",
            F.date_trunc("day", "o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum(dec("o_totalprice")).cast("decimal(18,6)").alias("rev"))
    )
    w = W.partitionBy("o_orderstatus").orderBy("day")
    fc = F.lag("rev", SEASONAL_LAG_DAYS).over(w)
    scored = daily.select(
        "o_orderstatus",
        "day",
        "rev",
        fc.alias("fc"),
    ).filter(F.col("fc").isNotNull())
    err = F.abs(F.col("rev") - F.col("fc"))
    return (
        scored.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            (F.sum(err).cast("double") / F.count(F.lit(1))).alias("mae_raw"),
            F.max(err).cast("double").alias("max_abs_err"),
        )
        .select(
            "o_orderstatus",
            "n_days",
            F.round("mae_raw", 6).alias("mae"),
            "max_abs_err",
        )
        .orderBy("o_orderstatus")
    )


def _seasonal_sql() -> str:
    return f"""
WITH daily AS (
    SELECT o_orderstatus, CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,6)) AS rev
    FROM orders GROUP BY o_orderstatus, day
),
scored AS (
    SELECT o_orderstatus, day, rev,
           LAG(rev, {SEASONAL_LAG_DAYS}) OVER (PARTITION BY o_orderstatus ORDER BY day) AS fc
    FROM daily
)
SELECT o_orderstatus,
       COUNT(*) AS n_days,
       ROUND(CAST(SUM(ABS(rev - fc)) AS DOUBLE) / COUNT(*), 6) AS mae,
       CAST(MAX(ABS(rev - fc)) AS DOUBLE) AS max_abs_err
FROM scored
WHERE fc IS NOT NULL
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# ------------------------------------------- leaderboard rank shifts


def window_rank_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard movement: revenue RANK of each market segment
    within each month, plus the rank delta vs the previous month —
    the riser/faller report every periodic leaderboard ships. Two
    stacked windows over the REDUCED (month × segment) table: rank
    within month, then lag along each segment's month series. The
    fact table is aggregated before either window runs (the standing
    reduced-window discipline); revenue is exact decimal so rank
    order can never drift between engines.
    """
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice", "o_orderdate")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    monthly = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.sum(dec("o_totalprice")).cast("decimal(18,6)").cast("double").alias("revenue"))
    )
    rnk = F.rank().over(
        W.partitionBy("month").orderBy(F.desc("revenue"), F.asc("segment"))
    )
    ranked = monthly.select("month", "segment", "revenue", rnk.alias("rnk"))
    prev = F.lag("rnk").over(W.partitionBy("segment").orderBy("month"))
    return (
        ranked.select(
            "month",
            "segment",
            "revenue",
            F.col("rnk").cast("int").alias("rnk"),
            (F.col("rnk") - prev).cast("int").alias("rank_delta"),
        )
        .orderBy("month", "rnk", "segment")
    )


def _rank_shift_sql() -> str:
    from parquet_batch_spark.functions.numeric import sql_dsum

    return f"""
WITH monthly AS (
    SELECT STRFTIME(o_orderdate, '%Y-%m') AS month, c_mktsegment AS segment,
           {sql_dsum("o_totalprice")} AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY month, segment
),
ranked AS (
    SELECT month, segment, revenue,
           RANK() OVER (PARTITION BY month ORDER BY revenue DESC, segment ASC)
               AS rnk
    FROM monthly
)
SELECT month, segment, revenue, CAST(rnk AS INTEGER) AS rnk,
       CAST(rnk - LAG(rnk) OVER (PARTITION BY segment ORDER BY month)
            AS INTEGER) AS rank_delta
FROM ranked
ORDER BY month, rnk, segment
"""


# ------------------------------------------- max drawdown


def window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each user's value series — the largest
    peak-to-trough drop along the (ts, event_id)-ordered path; the
    risk metric every portfolio/SLA monitor reports. One running-max
    window pass (drawdown_i = runmax_i − value_i), then a per-user
    reduction; never a pairwise (peak, trough) join. 2-dp inputs and
    identical IEEE subtraction on both engines keep it hash-exact.
    """
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        W.partitionBy("user_id")
        .orderBy(us, "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    runmax = F.max("value").over(w)
    return (
        ev.select(
            "user_id",
            "value",
            (runmax - F.col("value")).alias("dd"),
            runmax.alias("peak_so_far"),
        )
        .groupBy("user_id")
        .agg(
            F.round(F.max("dd"), 6).alias("max_drawdown"),
            F.max("peak_so_far").alias("peak_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


_DRAWDOWN_SQL = """
WITH r AS (
    SELECT user_id, value,
           MAX(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                            ROWS UNBOUNDED PRECEDING) AS runmax
    FROM events
)
SELECT user_id,
       ROUND(MAX(runmax - value), 6) AS max_drawdown,
       MAX(runmax) AS peak_value,
       COUNT(*) AS n_events
FROM r
GROUP BY user_id
ORDER BY user_id
"""

# ------------------------------------------- time-weighted average


def window_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) of each user's value series: each
    observation is weighted by how long it was in force (until the
    next event) — the correct mean for irregularly-sampled state, vs
    the event-weighted mean that overweights bursty periods. Exact
    arithmetic: values are 2-dp → integer centi-units; durations in
    whole seconds; Σ(centivalue·dur_s) stays < 2^53, so the closing
    double division is correctly rounded identically in both engines.
    Scale: one lead() window pass + one per-user reduction.
    """
    ev = load(spark, sf_dir, "events")
    sec = F.unix_timestamp(F.col("ts").cast("timestamp"))
    vc = F.round(F.col("value") * 100).cast("long")
    base = ev.select(
        "user_id",
        vc.alias("vc"),
        sec.alias("s"),
        "event_id",
    ).select(
        "user_id",
        "vc",
        (F.lead("s").over(W.partitionBy("user_id").orderBy("s", "event_id")) - F.col("s")).alias(
            "dur_s"
        ),
    )
    held = base.filter(F.col("dur_s").isNotNull())
    return (
        held.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_held"),
            F.sum("dur_s").alias("span_s"),
            F.round(
                F.sum(F.col("vc") * F.col("dur_s"))
                / (F.lit(100.0) * F.sum("dur_s")),
                6,
            ).alias("twap"),
        )
        .filter(F.col("span_s") > 0)
        .orderBy("user_id")
    )


_TWAP_SQL = """
WITH base AS (
    SELECT user_id,
           CAST(ROUND(value * 100) AS BIGINT) AS vc,
           LEAD(CAST(FLOOR(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id
                     ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id)
             - CAST(FLOOR(epoch(ts)) AS BIGINT) AS dur_s
    FROM events
)
SELECT user_id,
       COUNT(*) AS n_held,
       CAST(SUM(dur_s) AS BIGINT) AS span_s,
       ROUND(SUM(vc * dur_s) / (100.0 * SUM(dur_s)), 6) AS twap
FROM base
WHERE dur_s IS NOT NULL
GROUP BY user_id
HAVING SUM(dur_s) > 0
ORDER BY user_id
"""


# ----------------------------------------- Allen interval relations

ALLEN_DUR_MOD = 20  # synthetic duration: 2 + key % 20 days


def window_allen_interval_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen's interval-algebra census over consecutive order
    intervals per customer — the classification layer interval
    reasoning (temporal joins, conflict detection, coverage audits)
    is built on: each adjacent pair (sorted by start, so a.start ≤
    b.start) lands in exactly one of the eight start-ordered Allen
    relations (precedes, meets, overlaps, finished_by, contains,
    starts, started_by, equals).  ``window_interval_coalesce`` merges
    overlaps; this names them — the diagnostic before choosing a
    merge/split policy.

    Intervals are synthetic-deterministic (start = order date, length
    2 + key mod {ALLEN_DUR_MOD} days) in exact integer epoch days, so
    every comparison is int64.  Scale: one lead() window per customer
    (hash-partitioned by key like every per-entity sequence op) and a
    relation-grain aggregate — the census output is 8 rows."""
    o = load(spark, sf_dir, "orders")
    # integer division on both sides: DuckDB's double->BIGINT cast
    # ROUNDS while Spark's truncates, so a float quotient would be a
    # cross-engine trap the moment a timestamp isn't midnight-aligned
    day = F.expr(
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
    )
    base = o.select(
        "o_custkey",
        "o_orderkey",
        day.alias("s"),
    ).withColumn(
        "e", F.col("s") + 2 + F.col("o_orderkey") % ALLEN_DUR_MOD
    )
    w = W.partitionBy("o_custkey").orderBy("s", "o_orderkey")
    paired = (
        base.withColumn("s2", F.lead("s").over(w))
        .withColumn("e2", F.lead("e").over(w))
        .filter(F.col("s2").isNotNull())
    )
    rel = (
        F.when(F.col("e") < F.col("s2"), "precedes")
        .when(F.col("e") == F.col("s2"), "meets")
        .when(
            (F.col("s") < F.col("s2")) & (F.col("e") < F.col("e2")), "overlaps"
        )
        .when(
            (F.col("s") < F.col("s2")) & (F.col("e") == F.col("e2")),
            "finished_by",
        )
        .when((F.col("s") < F.col("s2")), "contains")
        .when(F.col("e") < F.col("e2"), "starts")
        .when(F.col("e") == F.col("e2"), "equals")
        .otherwise("started_by")
    )
    return (
        paired.select(rel.alias("relation"))
        .groupBy("relation")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("relation")
    )


_ALLEN_SQL = f"""
WITH base AS (
    SELECT o_custkey, o_orderkey,
        epoch_us(o_orderdate) // 86400000000 AS s,
        epoch_us(o_orderdate) // 86400000000
            + 2 + o_orderkey % {ALLEN_DUR_MOD} AS e
    FROM orders
),
paired AS (
    SELECT s, e,
        LEAD(s) OVER w AS s2, LEAD(e) OVER w AS e2
    FROM base
    WINDOW w AS (PARTITION BY o_custkey ORDER BY s, o_orderkey)
),
rels AS (
    SELECT CASE
        WHEN e < s2 THEN 'precedes'
        WHEN e = s2 THEN 'meets'
        WHEN s < s2 AND e < e2 THEN 'overlaps'
        WHEN s < s2 AND e = e2 THEN 'finished_by'
        WHEN s < s2 THEN 'contains'
        WHEN e < e2 THEN 'starts'
        WHEN e = e2 THEN 'equals'
        ELSE 'started_by'
    END AS relation
    FROM paired WHERE s2 IS NOT NULL
)
SELECT relation, COUNT(*) AS n_pairs
FROM rels
GROUP BY relation
ORDER BY relation
"""


QUERIES = {
    "window_allen_interval_relations": window_allen_interval_relations,
    "window_bollinger_breaches": window_bollinger_breaches,
    "window_local_extrema": window_local_extrema,
    "window_seasonal_baseline": window_seasonal_baseline,
    "window_rank_shift": window_rank_shift,
    "window_max_drawdown": window_max_drawdown,
    "window_time_weighted_avg": window_time_weighted_avg,
    "window_linear_interpolate": window_linear_interpolate,
    "window_interval_coalesce": window_interval_coalesce,
    "window_streak_islands": window_streak_islands,
    "window_nth_value": window_nth_value,
    "window_percent_change": window_percent_change,
    "window_running_distinct": window_running_distinct,
    "window_rolling_median": window_rolling_median,
    "window_distribution": window_distribution,
    "window_anomaly_zscore": window_anomaly_zscore,
    "window_gap_fill": window_gap_fill,
    "window_range_interval": window_range_interval,
    "window_topk_per_group": window_topk_per_group,
    "window_ranks": window_ranks,
    "window_running_sum": window_running_sum,
    "window_lag_lead": window_lag_lead,
    "window_sessionize": window_sessionize,
}

ORACLES = {
    "window_allen_interval_relations": _ALLEN_SQL,
    "window_bollinger_breaches": _BOLL_SQL,
    "window_local_extrema": _EXTREMA_SQL,
    "window_seasonal_baseline": _seasonal_sql(),
    "window_rank_shift": _rank_shift_sql(),
    "window_max_drawdown": _DRAWDOWN_SQL,
    "window_time_weighted_avg": _TWAP_SQL,
    "window_linear_interpolate": _INTERP_SQL,
    "window_interval_coalesce": _IVC_SQL,
    "window_streak_islands": _STREAK_SQL,
    "window_nth_value": _NTH_VALUE_SQL,
    "window_percent_change": _pct_change_sql(),
    "window_running_distinct": _RUN_DISTINCT_SQL,
    "window_rolling_median": _ROLL_MED_SQL,
    "window_distribution": _WINDOW_DISTRIBUTION_SQL,
    "window_anomaly_zscore": _WINDOW_ANOMALY_SQL,
    "window_gap_fill": _WINDOW_GAP_FILL_SQL,
    "window_range_interval": _WINDOW_RANGE_SQL,
    "window_topk_per_group": _WINDOW_TOPK_SQL,
    "window_ranks": _WINDOW_RANKS_SQL,
    "window_running_sum": _WINDOW_RUNNING_SQL,
    "window_lag_lead": _WINDOW_LAG_LEAD_SQL,
    "window_sessionize": _WINDOW_SESSIONIZE_SQL,
}
