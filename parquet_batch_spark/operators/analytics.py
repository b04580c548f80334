"""Statistical / analytical operators beyond plain aggregation.

The reference library has no aggregation surface at all (reference:
src/parquetreader/reader.py — scan/projection only; SURVEY.md §2.2);
this module extends the engine with the statistics a data-quality /
training-data pipeline needs: exact quantiles, histograms, correlation,
deterministic sampling, tokenized word counts, and cardinality
sketches.

Numeric policy (see functions/numeric.py): every sum that feeds a
hash-checked result runs in DECIMAL so partial-aggregation order can
never change a bit. Second-moment sums (x·y, x², y²) use wider
DECIMAL(30,6) finals — at the 100 TB design point those sums reach
~1e19-1e20, past DECIMAL(18,*) but far inside (30,6) capacity (1e24).
The final Pearson quotient is rounded to 6 decimals: the inputs are
exact, so both engines round the same value.

Exact percentiles ARE oracle-safe: Spark's ``percentile`` and DuckDB's
``quantile_cont`` both linearly interpolate over the fully sorted
group, and were verified bit-identical on this data. At 100 TB an
exact percentile is a heavy (per-group sort) operation — the
``approx_distinct_sketch`` entry demonstrates the sketch alternative
(HLL++, mergeable, one pass, no sort) that a real pipeline would
prefer. The sketch entries are still fully oracle-checked: they
project exact values plus deterministic "sketch within bound"
booleans (the sketches are deterministic for fixed data and the
assertion bands sit far outside the guaranteed error), so the oracle
can state the bound as ``TRUE``; tests/test_analytics.py additionally
bounds the raw errors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_batch_spark.catalog import fan_out, load
from parquet_batch_spark.functions.numeric import dec, dec9, dsum, sql_dsum

# ------------------------------------------------------ percentiles


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/p50/p95 of extended price (and median quantity) per
    return flag. Spark plans a single shuffle on the group key; the
    per-group sort happens inside the aggregate buffer. All three
    price quantiles come from ONE ``percentile(col, array(...))``
    aggregate so the value buffer is built (and merged across
    partial aggregation) once, not per-quantile — measured 3× faster
    than three scalar percentile aggregates at sf0.1. Exact
    percentiles still buffer every distinct value per group and are
    inherently heavy at scale; a 100 TB pipeline should reach for
    ``approx_percentile`` (KLL/GK sketch) unless exactness is a hard
    requirement (cf. approx_distinct_sketch below)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.95D))").alias(
                "pp"
            ),
            F.expr("percentile(l_quantity, 0.5)").alias("qty_median"),
        )
        .select(
            "l_returnflag",
            F.col("pp")[0].alias("price_p25"),
            F.col("pp")[1].alias("price_p50"),
            F.col("pp")[2].alias("price_p95"),
            "qty_median",
        )
        .orderBy("l_returnflag")
    )


_PCTL_SQL = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.25) AS price_p25,
       quantile_cont(l_extendedprice, 0.5)  AS price_p50,
       quantile_cont(l_extendedprice, 0.95) AS price_p95,
       quantile_cont(l_quantity, 0.5)       AS qty_median
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# -------------------------------------------------------- histogram


def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (5k buckets) × order
    status — the classic data-profiling two-way frequency table.
    Integer bucket arithmetic: nothing float-order-sensitive."""
    o = load(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / F.lit(50000)).cast("int")
    return (
        o.withColumn("price_bucket", bucket)
        .groupBy("price_bucket", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("price_bucket", "o_orderstatus")
    )


_HIST_SQL = """
SELECT CAST(FLOOR(o_totalprice / 50000) AS INTEGER) AS price_bucket,
       o_orderstatus, COUNT(*) AS n_orders
FROM orders
GROUP BY price_bucket, o_orderstatus
ORDER BY price_bucket, o_orderstatus
"""


# ------------------------------------------------------ correlation


def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation (quantity vs. extended price) per return
    flag, computed from exact decimal co-moments instead of the
    engines' streaming ``corr`` (whose co-moment accumulation is
    float-order-dependent and differs across engines). Five decimal
    sums + one double-arithmetic finish = bit-stable and one pass."""
    li = load(spark, sf_dir, "lineitem")
    W = "decimal(30,6)"
    sx = F.sum(dec9("l_quantity")).cast(W).cast("double")
    sy = F.sum(dec9("l_extendedprice")).cast(W).cast("double")
    sxx = F.sum(dec9("l_quantity") * dec9("l_quantity")).cast(W).cast("double")
    syy = F.sum(dec9("l_extendedprice") * dec9("l_extendedprice")).cast(W).cast("double")
    sxy = F.sum(dec9("l_quantity") * dec9("l_extendedprice")).cast(W).cast("double")
    n = F.count(F.lit(1)).cast("double")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(corr, 6).alias("corr_qty_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


def _sql_mom(expr: str) -> str:
    return f"CAST(CAST(SUM({expr}) AS DECIMAL(30,6)) AS DOUBLE)"


_D9 = "CAST({c} AS DECIMAL(12,4))"
# DuckDB executes a width-24 product in int64 and overflows on price²;
# widening one operand to DECIMAL(24,4) forces its int128 path. The
# values are exact either way, so Spark/DuckDB results stay identical.
_D9W = "CAST({c} AS DECIMAL(24,4))"
_CORR_SQL = """
SELECT l_returnflag,
       ROUND((n * sxy - sx * sy)
             / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6)
           AS corr_qty_price,
       CAST(n AS BIGINT) AS n_rows
FROM (
    SELECT l_returnflag,
           {sx} AS sx, {sy} AS sy, {sxx} AS sxx, {syy} AS syy, {sxy} AS sxy,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
) m
ORDER BY l_returnflag
""".format(
    sx=_sql_mom(_D9.format(c="l_quantity")),
    sy=_sql_mom(_D9.format(c="l_extendedprice")),
    sxx=_sql_mom(f"{_D9W.format(c='l_quantity')} * {_D9.format(c='l_quantity')}"),
    syy=_sql_mom(
        f"{_D9W.format(c='l_extendedprice')} * {_D9.format(c='l_extendedprice')}"
    ),
    sxy=_sql_mom(f"{_D9W.format(c='l_quantity')} * {_D9.format(c='l_extendedprice')}"),
)


# --------------------------------------------------------- sampling


def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% systematic sample (orderkey ≡ 0 mod 20) with a
    revenue summary. Unlike TABLESAMPLE this is reproducible across
    engines, partitionings, and reruns — the property that matters for
    auditable pipeline sampling; the modulo filter pushes down to the
    scan."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 20 == 0)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("l_extendedprice", "sum_price"),
        )
        .orderBy("l_returnflag")
    )


_SAMPLE_SQL = f"""
SELECT l_returnflag, COUNT(*) AS n_rows, {sql_dsum("l_extendedprice")} AS sum_price
FROM lineitem
WHERE l_orderkey % 20 = 0
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------- explode/words


def explode_positional_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``posexplode`` — UNNEST WITH ORDINALITY: each token carries its
    0-based position, the surface that ``explode`` loses (and the one
    sequence work needs: token offsets, windowed chunk boundaries,
    alignment back into the source). A position-stride filter keeps
    the sample bounded; the whole expansion is map-side — no shuffle
    at any corpus size."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return (
        d.select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "token"),
        )
        .filter(F.col("pos") % 25 == 0)
        .orderBy("doc_id", "pos")
    )


_POS_TOKENS_SQL = """
SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, token
FROM (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS token,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
    WHERE doc_id < 100
)
WHERE (i - 1) % 25 = 0
ORDER BY doc_id, pos
"""


def explode_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-25 whitespace tokens via explode (Spark's
    generator/UNNEST surface). The per-document token explosion is
    map-side; only (word, partial-count) pairs shuffle, so the exchange
    is bounded by vocabulary size — not corpus size — at any scale."""
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    words = d.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(25)
    )


_WORDS_SQL = r"""
SELECT word, COUNT(*) AS n
FROM (
    SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
    FROM documents
) w
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
LIMIT 25
"""


# ----------------------------------------------------------- sketch


def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct-customer estimate per order priority, checked
    against the exact count. At 100 TB the sketch is the right
    default: one pass, constant memory, mergeable across partials —
    where exact COUNT(DISTINCT) shuffles every distinct key.

    Oracle strategy: the sketch value itself is engine-specific, so
    the query projects the EXACT count plus a deterministic bound
    check — Spark's HLL++ is deterministic for fixed data (hash-based,
    merge is a register-wise max, so partial order cannot change it),
    and the configured 2 % standard error leaves the 10 % assertion
    band 5 sigma from the boundary (ADVICE r7 class sweep: the old
    5 % band was ~2.5 sigma PER GROUP, so a regenerated dataset had a
    few-percent chance of flipping oracle parity; the TIGHT 5 % bound
    lives in tests/test_analytics.py, where a legitimate failure
    belongs).  An empty/all-null group is in-band by definition,
    guarded so the 0/0 case can't error under ANSI.  The oracle
    states the exact count and ``TRUE``."""
    o = load(spark, sf_dir, "orders")
    approx = F.approx_count_distinct("o_custkey", 0.02)
    exact = F.countDistinct("o_custkey")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            exact.alias("exact_customers"),
            F.when(exact == 0, F.lit(True)).otherwise(
                F.abs(approx.cast("double") / exact.cast("double") - F.lit(1.0))
                <= F.lit(0.10)
            ).alias("within_10pct"),
        )
        .orderBy("o_orderpriority")
    )


_ADS_SQL = """
SELECT o_orderpriority,
    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
    TRUE AS within_10pct
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def approx_hll_union_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasketches HLL partial-sketch MERGE — the mechanism that makes
    distinct counting compose at 100 TB: each shard (here: order
    priority) aggregates its own ``hll_sketch_agg`` binary sketch, and
    the global distinct comes from ``hll_union_agg`` over those FIVE
    sketch blobs — no second pass over the fact, no distinct-key
    shuffle. This is how a 1000-executor rollup tree or an incremental
    daily pipeline maintains corpus-wide distincts: store per-partition
    sketches, union on demand.

    Oracle strategy (same as ``approx_distinct_sketch``): sketches are
    deterministic for fixed data and union is order-insensitive, so
    the query projects the EXACT distinct plus a within-5% bound
    boolean for both the per-shard estimates and the unioned global —
    the oracle states the exacts and ``TRUE``. The union row
    additionally checks union-vs-single-pass consistency WITHIN the
    sketch's own error band (±2%): bit-equality of the two estimates
    holds only while the sketch is sparse — in dense mode the
    Datasketches union gadget re-projects HLL_4 registers through its
    HLL_8 accumulator and the estimates legitimately differ in the
    last few counts (measured 15041 vs 15072 against 14999 exact at
    sf0.1 — the scale-dependent behavior the dual-SF sweep exists to
    catch; an == check here failed at sf0.1 and passed at sf0.01).

    Band-fragility note (ADVICE r7 class sweep): unlike the rsd-2%
    ops, this op's 5 % band is SAFE against dataset regeneration —
    lgConfigK=14 gives rsd ≈ 1.04/sqrt(2^14) ≈ 0.8 %, so 5 % is
    ~6 sigma, and the union-vs-whole ±2 % check compares two sketches
    of the SAME item set (register-wise max over a partition of the
    rows), which is near-structural — so the bands stay as-is."""
    o = load(spark, sf_dir, "orders")
    per = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey", F.lit(14)).alias("sk"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )
    shard_rows = per.select(
        F.col("o_orderpriority").alias("grain"),
        "exact_customers",
        (
            F.abs(
                F.hll_sketch_estimate("sk").cast("double")
                / F.col("exact_customers").cast("double")
                - F.lit(1.0)
            )
            <= F.lit(0.05)
        ).alias("within_5pct"),
    )
    merged = per.agg(F.hll_union_agg("sk").alias("sk_union"))
    whole = o.agg(
        F.hll_sketch_agg("o_custkey", F.lit(14)).alias("sk_whole"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )
    union_row = merged.crossJoin(whole).select(
        F.lit("ALL_UNIONED").alias("grain"),
        "exact_customers",
        (
            (
                F.abs(
                    F.hll_sketch_estimate("sk_union").cast("double")
                    / F.col("exact_customers").cast("double")
                    - F.lit(1.0)
                )
                <= F.lit(0.05)
            )
            & (
                F.abs(
                    F.hll_sketch_estimate("sk_union").cast("double")
                    / F.hll_sketch_estimate("sk_whole").cast("double")
                    - F.lit(1.0)
                )
                <= F.lit(0.02)
            )
        ).alias("within_5pct"),
    )
    return shard_rows.unionByName(union_row).orderBy("grain")


_HLL_UNION_SQL = """
SELECT o_orderpriority AS grain,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
       TRUE AS within_5pct
FROM orders
GROUP BY o_orderpriority
UNION ALL
SELECT 'ALL_UNIONED' AS grain,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
       TRUE AS within_5pct
FROM orders
ORDER BY grain
"""


def approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch via
    ``approx_percentile``) next to their exact counterparts — the
    one-pass, constant-memory, mergeable alternative to the per-group
    sort that ``agg_percentiles`` pays. At 100 TB this is the default;
    exactness is the opt-in.

    Oracle strategy: exact quantiles project as scalars (bit-identical
    linear interpolation in both engines, see module docstring); the
    sketch half projects one deterministic boolean per quantile —
    "approx value lies within the exact [q−0.01, q+0.01] quantile
    band". GK with accuracy 10000 guarantees rank error ≤ 1e-4 (the
    bound survives merges), 100× inside the band, so the boolean is
    robust to any partition layout and the oracle can state ``TRUE``."""
    li = load(spark, sf_dir, "lineitem")
    qs = "array(0.24D, 0.25D, 0.26D, 0.49D, 0.5D, 0.51D, 0.94D, 0.95D, 0.96D)"
    agg = (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(l_extendedprice, array(0.25, 0.5, 0.95), 10000)"
            ).alias("ap"),
            F.expr(f"percentile(l_extendedprice, {qs})").alias("ep"),
        )
    )
    def ok(i: int) -> F.Column:
        return (F.col("ap")[i] >= F.col("ep")[3 * i]) & (
            F.col("ap")[i] <= F.col("ep")[3 * i + 2]
        )

    return (
        agg.select(
            "l_returnflag",
            F.col("ep")[1].alias("price_p25"),
            F.col("ep")[4].alias("price_p50"),
            F.col("ep")[7].alias("price_p95"),
            ok(0).alias("approx_p25_ok"),
            ok(1).alias("approx_p50_ok"),
            ok(2).alias("approx_p95_ok"),
        )
        .orderBy("l_returnflag")
    )


_APS_SQL = """
SELECT l_returnflag,
    quantile_cont(l_extendedprice, 0.25) AS price_p25,
    quantile_cont(l_extendedprice, 0.5)  AS price_p50,
    quantile_cont(l_extendedprice, 0.95) AS price_p95,
    TRUE AS approx_p25_ok,
    TRUE AS approx_p50_ok,
    TRUE AS approx_p95_ok
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-grain rollup (continuous-aggregate
    pattern): events aggregated to minute buckets, hours computed FROM
    the minute aggregates, days FROM the hours — never re-reading raw
    data for a coarser grain. At 100 TB this is the difference between
    one fine-grain pass + tiny re-aggregations and three full scans;
    the same shape maintains materialized rollups incrementally.
    Decimal sums keep the re-aggregation exact (sum-of-sums ==
    direct sum, which is what the oracle computes per grain from raw
    events), with the (18,4) squeeze before the double cast."""
    from parquet_batch_spark.functions.numeric import dec

    ev = load(spark, sf_dir, "events")
    m = (
        ev.groupBy(F.floor(F.unix_timestamp("ts") / 60).alias("b"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).alias("s"),
            F.max("value").alias("mx"),
        )
    )
    h = m.groupBy(F.expr("b div 60").alias("b")).agg(
        F.sum("n").alias("n"), F.sum("s").alias("s"), F.max("mx").alias("mx")
    )
    d = h.groupBy(F.expr("b div 24").alias("b")).agg(
        F.sum("n").alias("n"), F.sum("s").alias("s"), F.max("mx").alias("mx")
    )

    def emit(df: DataFrame, grain: str, sec: int) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            F.timestamp_seconds(F.col("b") * sec).cast("timestamp_ntz").alias(
                "bucket_ts"
            ),
            F.col("n").cast("long").alias("n_events"),
            F.col("s").cast("decimal(18,4)").cast("double").alias("sum_value"),
            F.col("mx").alias("max_value"),
        )

    return (
        emit(m, "minute", 60)
        .unionAll(emit(h, "hour", 3600))
        .unionAll(emit(d, "day", 86400))
        .orderBy("grain", "bucket_ts")
    )


_ROLLUP_GRAIN = """
SELECT '{g}' AS grain,
    (to_timestamp(({b}) * {sec}))::TIMESTAMP AS bucket_ts,
    CAST(SUM(n) AS BIGINT) AS n_events,
    CAST(CAST(SUM(s) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value,
    MAX(mx) AS max_value
FROM m GROUP BY ({b})
"""

_ROLLUP_SQL = f"""
WITH m AS (
    SELECT CAST(FLOOR(epoch(ts) / 60) AS BIGINT) AS b,
        COUNT(*) AS n,
        SUM(CAST(value AS DECIMAL(18,4))) AS s,
        MAX(value) AS mx
    FROM events GROUP BY b
)
{_ROLLUP_GRAIN.format(g="minute", b="b", sec=60)}
UNION ALL
{_ROLLUP_GRAIN.format(g="hour", b="b // 60", sec=3600)}
UNION ALL
{_ROLLUP_GRAIN.format(g="day", b="b // 1440", sec=86400)}
ORDER BY grain, bucket_ts
"""


CMS_D = 4  # hash rows
CMS_W = 2048  # counters per row


def approx_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch heavy hitters: the frequency-sketch sibling of
    the HLL (distinct) and GK (percentile) sketches. Word occurrences
    fold into a {CMS_D}×{CMS_W} counter grid via the portable affine
    hash family — one groupBy whose shuffle is bounded by the GRID, not
    the vocabulary — and the exact top-25 words are then estimated as
    min-over-rows. CMS never underestimates (collisions only add), so
    the output carries the exact count, the estimate, and their gap;
    tests pin estimate ≥ exact and the εN error bound. Deterministic
    hashing ⇒ full SQL oracle, unlike the engine-internal HLL/GK
    sketches."""
    from parquet_batch_spark.functions.hashing import (
        affine_hash,
        hash32,
        hash_params,
    )

    params = hash_params(CMS_D)
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    words = d.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    wcount = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    h = hash32(F.col("word"))
    # localCheckpoint (r12): with_buckets feeds CMS_D grid branches
    # plus the exact top-25 — without materialization Catalyst
    # re-derives the corpus tokenize + word-count subtree for every
    # branch (CMS_D+1 corpus passes, the stage-barrier fan-out that
    # made this op read 2x its quiet floor in burst windows).  The
    # table is VOCABULARY-sized, so materializing it is bounded
    # regardless of corpus size.
    with_buckets = wcount.select(
        "word",
        "n",
        *[
            (affine_hash(h, a, b) % CMS_W).alias(f"b{j}")
            for j, (a, b) in enumerate(params)
        ],
    ).localCheckpoint(eager=False)
    # one explode + one groupBy builds all CMS_D grid rows in a single
    # shuffle (r12: was CMS_D separate groupBy subtrees union'd — same
    # bytes shuffled, CMS_D× the stages)
    cms = (
        with_buckets.select(
            "n",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("row"),
                            F.col(f"b{j}").alias("bucket"),
                        )
                        for j in range(CMS_D)
                    ]
                )
            ).alias("rb"),
        )
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("n").alias("counter"))
    )
    top = with_buckets.orderBy(F.desc("n"), "word").limit(25)
    est = top
    for j in range(CMS_D):
        row_j = cms.filter(F.col("row") == j).select(
            F.col("bucket").alias(f"b{j}"), F.col("counter").alias(f"c{j}")
        )
        est = est.join(F.broadcast(row_j), f"b{j}")
    cms_min = F.least(*[F.col(f"c{j}") for j in range(CMS_D)])
    return est.select(
        "word",
        F.col("n").alias("exact_n"),
        cms_min.alias("cms_estimate"),
        (cms_min - F.col("n")).alias("overestimate"),
    ).orderBy(F.desc("exact_n"), "word")


def _cms_sql() -> str:
    from parquet_batch_spark.functions.hashing import (
        hash_params,
        sql_affine_hash,
        sql_hash32,
    )

    params = hash_params(CMS_D)
    h = sql_hash32("word")
    bucket_cols = ", ".join(
        f"({sql_affine_hash(h, a, b)}) % {CMS_W} AS b{j}"
        for j, (a, b) in enumerate(params)
    )
    grid_union = "\n    UNION ALL ".join(
        f"SELECT {j} AS row, b{j} AS bucket, CAST(SUM(n) AS BIGINT) AS counter "
        f"FROM wb GROUP BY b{j}"
        for j in range(CMS_D)
    )
    joins = "\n".join(
        f"JOIN (SELECT bucket AS jb{j}, counter AS c{j} FROM cms WHERE row = {j}) g{j}"
        f" ON t.b{j} = g{j}.jb{j}"
        for j in range(CMS_D)
    )
    least = "LEAST(" + ", ".join(f"c{j}" for j in range(CMS_D)) + ")"
    return rf"""
WITH words AS (
    SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM documents
),
wc AS (
    SELECT word, COUNT(*) AS n FROM words WHERE word <> '' GROUP BY word
),
wb AS (
    SELECT word, n, {bucket_cols} FROM wc
),
cms AS (
    {grid_union}
),
top AS (
    SELECT * FROM wb ORDER BY n DESC, word LIMIT 25
)
SELECT t.word AS word,
    CAST(t.n AS BIGINT) AS exact_n,
    {least} AS cms_estimate,
    {least} - CAST(t.n AS BIGINT) AS overestimate
FROM top t
{joins}
ORDER BY exact_n DESC, word
"""


# ------------------------------------------- exact higher moments

def agg_moments_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and kurtosis per event type from EXACT power sums —
    the distribution-shape profile (is value heavy-tailed? asymmetric?)
    computed reproducibly: built-in skewness()/kurtosis() accumulate
    doubles in partition order and are not bit-stable across engines
    or re-plans, so values are quantized to integer units and
    power products are computed in exact int64 (|v_c| < 5·10⁴ ⇒ v_c⁴ <
    2⁶³) and summed in DECIMAL(38,0) — exact, associative, order-
    insensitive. The sums exceed 2⁵³, where DuckDB's wide-decimal →
    double cast is not correctly rounded (numeric.py), so the moment
    formulas run on possibly-1-ulp-different doubles; the O(1) outputs
    are rounded to 6 dp, absorbing the ~1e-16 relative wobble — the
    hash check at both SFs is the empirical gate. Same policy as
    numeric.py, one power higher.
    """
    ev = load(spark, sf_dir, "events")
    # Quantization grid = integer units: |value| < 5.5e4 keeps vc^4
    # inside int64 (the sf0.1 sweep caught the hundredths grid
    # overflowing at |value| ≈ 560: 56021^4 > 2^63). The grid is part
    # of the operator contract; shape statistics on unit-quantized
    # values lose nothing at these magnitudes.
    vc = F.floor(F.col("value"))
    dec38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731 - exact sums
    sums = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec38(vc)).cast("double").alias("s1"),
        F.sum(dec38(vc * vc)).cast("double").alias("s2"),
        F.sum(dec38(vc * vc * vc)).cast("double").alias("s3"),
        F.sum(dec38(vc * vc * vc * vc)).cast("double").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    m = s1 / n
    m2 = s2 / n - m * m
    m3 = s3 / n - F.lit(3.0) * m * (s2 / n) + F.lit(2.0) * m * m * m
    m4 = (
        s4 / n
        - F.lit(4.0) * m * (s3 / n)
        + F.lit(6.0) * m * m * (s2 / n)
        - F.lit(3.0) * m * m * m * m
    )
    return sums.select(
        "event_type",
        n.cast("long").alias("n_events"),
        F.round(m2, 6).alias("variance_u2"),
        F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - F.lit(3.0), 6).alias("excess_kurtosis"),
    ).orderBy("event_type")


_MOMENTS_SQL = """
WITH sums AS (
    SELECT event_type,
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(CAST(SUM(vc) AS DECIMAL(38,0)) AS DOUBLE) AS s1,
           CAST(CAST(SUM(vc * vc) AS DECIMAL(38,0)) AS DOUBLE) AS s2,
           CAST(CAST(SUM(vc * vc * vc) AS DECIMAL(38,0)) AS DOUBLE) AS s3,
           CAST(CAST(SUM(vc * vc * vc * vc) AS DECIMAL(38,0)) AS DOUBLE) AS s4
    FROM (SELECT event_type,
                 CAST(FLOOR(value) AS BIGINT) AS vc
          FROM events)
    GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_events,
       ROUND(s2 / n - (s1 / n) * (s1 / n), 6) AS variance_u2,
       ROUND((s3 / n - 3.0 * (s1 / n) * (s2 / n)
              + 2.0 * (s1 / n) * (s1 / n) * (s1 / n))
             / ((s2 / n - (s1 / n) * (s1 / n))
                * SQRT(s2 / n - (s1 / n) * (s1 / n))), 6) AS skewness,
       ROUND((s4 / n - 4.0 * (s1 / n) * (s3 / n)
              + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
              - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
             / ((s2 / n - (s1 / n) * (s1 / n))
                * (s2 / n - (s1 / n) * (s1 / n))) - 3.0, 6)
           AS excess_kurtosis
FROM sums
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# agg_benford_profile — first-digit fraud screen
# ---------------------------------------------------------------------------

# log10(1 + 1/d) in micro-units, precomputed as LITERALS so neither
# engine evaluates a (not-correctly-rounded) log10 at query time.
_BENFORD_MICRO = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910,
    5: 79181, 6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def agg_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit profile of order totals — the classic
    forensic-accounting screen (organic amounts follow
    P(d)=log10(1+1/d); fabricated ones usually don't). First digits
    come from the string head (every total is ≥ 1000, so no leading
    '0.' case), observed shares are exact integer micro-units, and the
    Benford expectations are Python-precomputed literals — no
    transcendental is evaluated in either engine. Output per digit:
    count, observed share, expected share, absolute deviation.
    """
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders")
    digit = F.substring(F.col("o_totalprice").cast("string"), 1, 1).cast("int")
    counts = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = F.sum("n").over(W.partitionBy())
    benford = F.create_map(
        *[F.lit(x) for kv in _BENFORD_MICRO.items() for x in kv]
    )
    share = F.floor(F.lit(1000000.0) * F.col("n") / total).cast("long")
    return (
        counts.select(
            "digit",
            "n",
            share.alias("share_micro"),
            benford[F.col("digit")].cast("long").alias("benford_micro"),
        )
        .withColumn(
            "abs_dev_micro",
            F.abs(F.col("share_micro") - F.col("benford_micro")),
        )
        .orderBy("digit")
    )


_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {v}" for d, v in _BENFORD_MICRO.items()
)

_BENFORD_SQL = f"""
WITH counts AS (
    SELECT CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS INTEGER) AS digit,
           COUNT(*) AS n
    FROM orders GROUP BY digit
)
SELECT digit, n,
       CAST(FLOOR(1000000.0 * n / SUM(n) OVER ()) AS BIGINT) AS share_micro,
       CAST(CASE digit {_BENFORD_CASE} END AS BIGINT) AS benford_micro,
       ABS(CAST(FLOOR(1000000.0 * n / SUM(n) OVER ()) AS BIGINT)
           - CAST(CASE digit {_BENFORD_CASE} END AS BIGINT)) AS abs_dev_micro
FROM counts
ORDER BY digit
"""

# ---------------------------------------------------------------------------
# agg_vwap — volume-weighted average price
# ---------------------------------------------------------------------------


def agg_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per return flag — Σ(p·q)/Σq, the
    market-standard weighted mean (``agg_weighted_median`` is its
    robust sibling). Both the price·quantity products and the sums run
    in exact decimal (the ``agg_corr_exact`` second-moment discipline),
    so the closing division is a ratio of bit-identical doubles. One
    pass, map-side partial aggregation.
    """
    li = load(spark, sf_dir, "lineitem")
    pq = F.sum(dec9("l_extendedprice") * dec9("l_quantity")).cast(
        "decimal(30,6)"
    ).cast("double")
    q = F.sum(dec("l_quantity")).cast("decimal(18,6)").cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            q.alias("total_qty"),
            F.round(pq / q, 6).alias("vwap"),
        )
        .orderBy("l_returnflag")
    )


_VWAP_SQL = """
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,6)) AS DOUBLE)
           AS total_qty,
       ROUND(
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,4))
                         * CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(30,6)) AS DOUBLE)
           / CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,6)) AS DOUBLE),
           6) AS vwap
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# ---------------------------------------------------------------------------
# window_winsorize — robust clamped-mean statistics
# ---------------------------------------------------------------------------

WINSOR_LO, WINSOR_HI = 0.05, 0.95


def window_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized statistics per return flag: clamp extended prices at
    the [p5, p95] percentiles and report the clamped mean — the robust
    mean that tolerates fat tails without discarding rows (vs trimming
    or MAD screens). Decomposed for exactness: the mid-range mass sums
    in exact decimal; the clamped tails contribute count × boundary
    (the boundary percentiles are bit-identical interpolated doubles),
    so the final mean is the same IEEE expression in both engines.
    Two passes over one group grain: percentile reduce + clamped
    aggregate.
    """
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    bounds = li.groupBy("l_returnflag").agg(
        F.expr(
            f"percentile(l_extendedprice, array({WINSOR_LO}D, {WINSOR_HI}D))"
        ).alias("bs")
    ).select(
        "l_returnflag", F.col("bs")[0].alias("lo"), F.col("bs")[1].alias("hi")
    )
    j = li.join(F.broadcast(bounds), "l_returnflag")
    mid = F.col("l_extendedprice").between(F.col("lo"), F.col("hi"))
    low = F.col("l_extendedprice") < F.col("lo")
    high = F.col("l_extendedprice") > F.col("hi")
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(low.cast("long")).alias("n_low"),
            F.sum(high.cast("long")).alias("n_high"),
            F.sum(F.when(mid, dec("l_extendedprice"))).cast("decimal(18,6)").cast("double").alias("mid_sum"),
            F.max("lo").alias("lo"),
            F.max("hi").alias("hi"),
        )
        .select(
            "l_returnflag",
            "n",
            "n_low",
            "n_high",
            F.round(
                (F.col("mid_sum") + F.col("n_low") * F.col("lo") + F.col("n_high") * F.col("hi"))
                / F.col("n"),
                6,
            ).alias("winsorized_mean"),
        )
        .orderBy("l_returnflag")
    )


_WINSOR_SQL = f"""
WITH bounds AS (
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, {WINSOR_LO}) AS lo,
           quantile_cont(l_extendedprice, {WINSOR_HI}) AS hi
    FROM lineitem GROUP BY l_returnflag
),
j AS (
    SELECT l.l_returnflag, l.l_extendedprice, b.lo, b.hi
    FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag
)
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(SUM(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       ROUND((CAST(CAST(SUM(CASE WHEN l_extendedprice BETWEEN lo AND hi
                  THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DECIMAL(18,6)) AS DOUBLE)
              + SUM(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) * MAX(lo)
              + SUM(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) * MAX(hi))
             / COUNT(*), 6) AS winsorized_mean
FROM j
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# ---------------------------------------------------------------------------
# agg_decile_report — distribution report without a global sort
# ---------------------------------------------------------------------------


def agg_decile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile distribution report of order totals (per-decile count /
    min / max / exact revenue) — computed the way it must be at scale:
    ``ntile(10)`` needs a GLOBAL SORT of every row; instead, the nine
    exact decile boundaries come from one percentile aggregate (9
    scalars), broadcast back, and each row buckets itself with nine
    comparisons — one reduce + one map, no total order anywhere.
    Boundary-equal values land in the lower decile (strict-> rule,
    identical in both engines since the interpolated boundaries are
    bit-identical — the agg_percentiles pairing).
    """
    o = load(spark, sf_dir, "orders")
    qs = [i / 10.0 for i in range(1, 10)]
    bounds = o.agg(
        F.expr(
            "percentile(o_totalprice, array("
            + ", ".join(f"{q}D" for q in qs)
            + "))"
        ).alias("bs")
    )
    bucket = F.lit(1)
    for i in range(9):
        bucket = bucket + F.when(F.col("o_totalprice") > F.col("bs")[i], 1).otherwise(0)
    return (
        o.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("decile"), "o_totalprice")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            dsum("o_totalprice", "revenue"),
        )
        .orderBy("decile")
    )


_DECILE_SQL = f"""
WITH b AS (
    SELECT [{", ".join(f"quantile_cont(o_totalprice, {i / 10.0})" for i in range(1, 10))}] AS bs
    FROM orders
)
SELECT 1 {" ".join(f"+ CASE WHEN o_totalprice > bs[{i}] THEN 1 ELSE 0 END" for i in range(1, 10))}
           AS decile,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       {sql_dsum("o_totalprice")} AS revenue
FROM orders, b
GROUP BY decile
ORDER BY decile
"""

# ---------------------------------------------------------------------------
# agg_pareto_frontier — 2-D skyline
# ---------------------------------------------------------------------------


def agg_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline) of orders maximizing both
    total price and order date: the non-dominated (price, date) pairs
    — "no later order was also more expensive". The classic
    sorted-scan construction: reduce to one row per distinct price
    (its max date — same-price earlier dates are dominated), then a
    single running-max window over price descending keeps exactly the
    rows whose date beats every higher-priced row.

    Scale: the dominance test never compares pairs — it is one
    groupBy reduction plus one window over the REDUCED (distinct
    prices) table. The frontier of n random points is O(log n) rows;
    the window input is |distinct prices|, not |orders|.
    """
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders")
    per_price = o.groupBy(F.col("o_totalprice").alias("price")).agg(
        F.max("o_orderdate").alias("best_date")
    )
    prev_best = F.max("best_date").over(
        W.orderBy(F.desc("price")).rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        per_price.withColumn("prev_best", prev_best)
        .filter(F.col("prev_best").isNull() | (F.col("best_date") > F.col("prev_best")))
        .select("price", "best_date")
        .orderBy(F.desc("price"))
    )


_PARETO_SQL = """
WITH per_price AS (
    SELECT o_totalprice AS price, MAX(o_orderdate) AS best_date
    FROM orders GROUP BY price
),
scanned AS (
    SELECT price, best_date,
           MAX(best_date) OVER (ORDER BY price DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_best
    FROM per_price
)
SELECT price, best_date
FROM scanned
WHERE prev_best IS NULL OR best_date > prev_best
ORDER BY price DESC
"""

# ---------------------------------------------------------------------------
# rollup_ohlc_bars — open/high/low/close time-series downsampling
# ---------------------------------------------------------------------------

OHLC_BUCKET_US = 900_000_000  # 15-minute bars


def rollup_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: per (event_type, 15-min bucket), the bar a
    market-data / metrics system keeps — open (first value), high,
    low, close (last value), tick count, decimal-exact volume.
    First/last are defined by the TOTAL order (ts, event_id), so ties
    in ts cannot flip open/close between engines.

    Scale: one window pass ordered within (type, bucket) for the
    open/close row-numbers, then one aggregate — both hash-partitioned
    on the bar key. The bucket id is exact integer arithmetic on epoch
    µs (the float division is exact: quotient magnitude ≪ 2^53 and
    ≥ 1e-9 away from any integer). Downsampling reduces the stream by
    ~bucket/event-rate before anything wide happens.
    """
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = ev.select(
        "event_type",
        F.floor(us / F.lit(OHLC_BUCKET_US)).alias("bucket"),
        "value",
        us.alias("us"),
        "event_id",
    )
    w = W.partitionBy("event_type", "bucket")
    rn_a = F.row_number().over(w.orderBy("us", "event_id"))
    rn_d = F.row_number().over(w.orderBy(F.desc("us"), F.desc("event_id")))
    marked = base.select(
        "event_type",
        "bucket",
        "value",
        rn_a.alias("rn_a"),
        rn_d.alias("rn_d"),
    )
    return (
        marked.groupBy("event_type", "bucket")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "volume"),
        )
        .orderBy("event_type", "bucket")
    )


_OHLC_SQL = f"""
WITH base AS (
    SELECT event_type,
           CAST(FLOOR(epoch_us(ts) / {OHLC_BUCKET_US}.0) AS BIGINT) AS bucket,
           value, epoch_us(ts) AS us, event_id
    FROM events
),
marked AS (
    SELECT event_type, bucket, value,
           ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                              ORDER BY us, event_id) AS rn_a,
           ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                              ORDER BY us DESC, event_id DESC) AS rn_d
    FROM base
)
SELECT event_type, bucket,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS n_events,
       {sql_dsum("value")} AS volume
FROM marked
GROUP BY event_type, bucket
ORDER BY event_type, bucket
"""

# ---------------------------------------------------------------------------
# quality_mad_outliers — median-absolute-deviation outlier screen
# ---------------------------------------------------------------------------

MAD_K = 3  # flag docs beyond K MADs from the cohort median


def quality_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust length-outlier screen per language cohort: median and
    MAD (median absolute deviation) of n_chars, then count docs
    beyond {MAD_K}·MAD — the robust alternative to z-scores
    (``window_anomaly_zscore``) that a single pathological document
    cannot drag. Exact interpolated percentiles over integer inputs
    (the ``agg_percentiles``-proven ``percentile``/``quantile_cont``
    pairing), deviations in exact arithmetic.

    Scale: two reduce+broadcast rounds (cohort medians are |langs|
    rows, broadcast back), never a per-row window over the corpus.
    """
    d = load(spark, sf_dir, "documents").select("lang", "n_chars")
    med = d.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.5)).alias("med")
    )
    dev = d.join(F.broadcast(med), "lang").select(
        "lang", "n_chars", "med", F.abs(F.col("n_chars") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("lang").agg(
        F.max("med").alias("med"),
        F.percentile("adev", F.lit(0.5)).alias("mad"),
    )
    return (
        dev.drop("med")
        .join(F.broadcast(mad), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("med").alias("median_chars"),
            F.max("mad").alias("mad_chars"),
            F.sum(
                F.when(F.col("adev") > MAD_K * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("lang")
    )


_MAD_SQL = f"""
WITH med AS (
    SELECT lang, quantile_cont(n_chars, 0.5) AS med
    FROM documents GROUP BY lang
),
dev AS (
    SELECT d.lang, d.n_chars, m.med, ABS(d.n_chars - m.med) AS adev
    FROM documents d JOIN med m ON d.lang = m.lang
),
mad AS (
    SELECT lang, MAX(med) AS med, quantile_cont(adev, 0.5) AS mad
    FROM dev GROUP BY lang
)
SELECT dev.lang,
       COUNT(*) AS n_docs,
       MAX(mad.med) AS median_chars,
       MAX(mad.mad) AS mad_chars,
       CAST(SUM(CASE WHEN dev.adev > {MAD_K} * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers
FROM dev JOIN mad ON dev.lang = mad.lang
GROUP BY dev.lang
ORDER BY dev.lang
"""

# ---------------------------------------------------------------------------
# agg_weighted_median — exact weighted percentile
# ---------------------------------------------------------------------------


def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median: per return flag, the smallest
    extendedprice v whose cumulative quantity-weight reaches half the
    total (2·cumw ≥ total — pure integer arithmetic, no float
    ordering anywhere). ``percentile_approx`` cannot weight rows;
    the exact construction is reduce-first: collapse to one row per
    DISTINCT price (so tie order cannot matter), then a running-sum
    window over the reduced table.

    Scale: the groupBy reduces the fact to |distinct prices per flag|
    rows before any window runs; the window partitions by flag — never
    a global sort of raw rows. This is the same reduced-window
    discipline as ``window_percent_change``.
    """
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    g = li.groupBy("l_returnflag", "price").agg(F.sum("w").alias("w"))
    cum = F.sum("w").over(
        W.partitionBy("l_returnflag").orderBy("price").rowsBetween(
            W.unboundedPreceding, 0
        )
    )
    tot = F.sum("w").over(W.partitionBy("l_returnflag"))
    return (
        g.select("l_returnflag", "price", cum.alias("cumw"), tot.alias("total"))
        .filter(2 * F.col("cumw") >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(
            F.max("total").alias("total_weight"),
            F.min("price").alias("weighted_median_price"),
        )
        .orderBy("l_returnflag")
    )


_WMEDIAN_SQL = """
WITH g AS (
    SELECT l_returnflag, l_extendedprice AS price,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
    FROM lineitem
    GROUP BY l_returnflag, price
),
c AS (
    SELECT l_returnflag, price,
           SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price
                        ROWS UNBOUNDED PRECEDING) AS cumw,
           SUM(w) OVER (PARTITION BY l_returnflag) AS total
    FROM g
)
SELECT l_returnflag,
       CAST(MAX(total) AS BIGINT) AS total_weight,
       MIN(price) AS weighted_median_price
FROM c
WHERE 2 * cumw >= total
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ------------------------------------------------ LTOB downsampling

LTOB_BUCKET_US = 3_600_000_000  # one representative point per hour (epoch µs)


def rollup_downsample_ltob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-One-Bucket time-series downsampling (Steinarsson
    2013 — the algorithm behind Grafana/Timescale's visualization
    downsampling): keep, per time bucket, the point forming the
    largest triangle with its neighbor buckets' anchors, preserving
    visual extremes that plain averaging erases.

    This is the ONE-bucket variant: anchors are the neighbor buckets'
    (midpoint, floor-mean) — a pure function of the bucket stats, so
    every bucket selects INDEPENDENTLY (the classic LTTB chains
    selections sequentially and cannot parallelize).  All geometry is
    exact int64: x = epoch MICROseconds (unix_micros / epoch_us — second-granularity casts round vs floor differently across engines), y = centi-units, area = |cross
    product| of integer differences; floor-mean via integer division.
    First/last buckets (no neighbor) emit their earliest point.

    Scale: bucket stats are one partial-aggregated groupBy; the
    lag/lead anchor pass runs over the REDUCED bucket table (bounded
    by the time domain, whitelisted global window); selection is a
    per-bucket rank — shuffles touch only bucket-keyed reductions,
    never the raw stream twice."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    x = F.unix_micros(F.col("ts").cast("timestamp"))
    y = F.round(F.col("value") * 100).cast("long")
    pts = ev.select(
        F.floor(x / LTOB_BUCKET_US).cast("long").alias("b"),
        x.alias("x"),
        y.alias("y"),
        "event_id",
    )
    stats = pts.groupBy("b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.min("x").alias("first_x"),
    )
    mid = (F.col("b") * LTOB_BUCKET_US + LTOB_BUCKET_US // 2).cast("long")
    anchors = stats.select(
        "b",
        mid.alias("ax"),
        F.expr("sy div n").alias("ay"),
        "first_x",
    )
    wb = W.orderBy("b")  # reduced table: one row per hour bucket
    nb = anchors.select(
        "b",
        "first_x",
        F.lag("ax").over(wb).alias("px"),
        F.lag("ay").over(wb).alias("py"),
        F.lead("ax").over(wb).alias("nx"),
        F.lead("ay").over(wb).alias("ny"),
    )
    j = pts.join(F.broadcast(nb), "b")
    area = F.abs(
        (F.col("px") - F.col("x")) * (F.col("ny") - F.col("y"))
        - (F.col("nx") - F.col("x")) * (F.col("py") - F.col("y"))
    )
    scored = j.select(
        "b",
        "x",
        "y",
        "event_id",
        F.when(
            F.col("px").isNotNull() & F.col("nx").isNotNull(), area
        ).otherwise(F.lit(None)).alias("area2"),
        (F.col("x") == F.col("first_x")).alias("is_first"),
    )
    wr = W.partitionBy("b").orderBy(
        F.col("area2").desc_nulls_last(), F.col("x"), F.col("event_id")
    )
    picked_mid = scored.filter(F.col("area2").isNotNull())
    picked_edge = scored.filter(F.col("area2").isNull() & F.col("is_first"))
    ranked = picked_mid.withColumn("rn", F.row_number().over(wr)).filter(
        F.col("rn") == 1
    )
    return (
        ranked.select("b", "x", "y", F.col("area2").alias("area2"))
        .unionByName(
            picked_edge.select("b", "x", "y", F.lit(None).cast("long").alias("area2"))
            # an edge bucket can hold several events at the same first_x
            # timestamp — keep one deterministic representative
            .withColumn(
                "rn",
                F.row_number().over(W.partitionBy("b").orderBy("x", "y")),
            )
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        .orderBy("b")
    )


_LTOB_SQL = f"""
WITH pts AS (
    SELECT CAST(FLOOR(epoch_us(ts) / {LTOB_BUCKET_US}) AS BIGINT) AS b,
        epoch_us(ts) AS x,
        CAST(ROUND(value * 100) AS BIGINT) AS y,
        event_id
    FROM events
),
stats AS (
    SELECT b, COUNT(*) AS n, SUM(y) AS sy, MIN(x) AS first_x
    FROM pts GROUP BY b
),
anchors AS (
    SELECT b,
        CAST(b * {LTOB_BUCKET_US} + {LTOB_BUCKET_US // 2} AS BIGINT) AS ax,
        CAST(sy // n AS BIGINT) AS ay,
        first_x
    FROM stats
),
nb AS (
    SELECT b, first_x,
        LAG(ax) OVER (ORDER BY b) AS px,
        LAG(ay) OVER (ORDER BY b) AS py,
        LEAD(ax) OVER (ORDER BY b) AS nx,
        LEAD(ay) OVER (ORDER BY b) AS ny
    FROM anchors
),
scored AS (
    SELECT p.b, p.x, p.y, p.event_id,
        CASE WHEN nb.px IS NOT NULL AND nb.nx IS NOT NULL THEN
            ABS((nb.px - p.x) * (nb.ny - p.y) - (nb.nx - p.x) * (nb.py - p.y))
        END AS area2,
        p.x = nb.first_x AS is_first
    FROM pts p JOIN nb ON p.b = nb.b
),
mid AS (
    SELECT b, x, y, area2,
        ROW_NUMBER() OVER (PARTITION BY b
                           ORDER BY area2 DESC, x, event_id) AS rn
    FROM scored WHERE area2 IS NOT NULL
),
edge AS (
    SELECT b, x, y, CAST(NULL AS BIGINT) AS area2,
        ROW_NUMBER() OVER (PARTITION BY b ORDER BY x, y) AS rn
    FROM scored WHERE area2 IS NULL AND is_first
)
SELECT b, x, y, area2 FROM mid WHERE rn = 1
UNION ALL
SELECT b, x, y, area2 FROM edge WHERE rn = 1
ORDER BY b
"""


# ------------------------------------------- Hodges-Lehmann estimator

HL_BUCKET = 1000  # price quantization (dollars) bounding the pair domain


def agg_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann robust location estimate of order value per
    order priority: the weighted median of all Walsh averages
    (x_i+x_j)/2, i ≤ j — the location estimator behind the Wilcoxon
    signed-rank test (~95% Gaussian efficiency, 29% breakdown; the
    robust alternative when a mean is outlier-poisoned and a median
    wastes too much information).

    Exactness and scale come from the same move: prices are quantized
    to {HL_BUCKET}-dollar buckets FIRST, so the pairwise stage runs on
    the reduced (group, bucket, count) table and its size is bounded
    by the fixed price-domain² — independent of row count (the
    market-basket / weighted-median reduce-first discipline).  Walsh
    averages stay integral as bucket SUMS (2× the mean); pair weights
    are exact products (same-bucket pairs get c·(c+1)/2 — i ≤ j); the
    weighted median is the 2·cumw ≥ total rule over a window
    partitioned by group on the reduced pair table.  Everything is
    int64.  Output per group: pair mass, the HL estimate in bucket-sum
    units, and its dollar value (bucket floors — documented
    quantization semantics)."""
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders")
    b = (
        o.select(
            F.col("o_orderpriority").alias("grp"),
            F.floor(F.col("o_totalprice") / HL_BUCKET)
            .cast("long")
            .alias("bkt"),
        )
        .groupBy("grp", "bkt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    b2 = b.select(
        F.col("grp").alias("grp2"),
        F.col("bkt").alias("bkt2"),
        F.col("c").alias("c2"),
    )
    pairs = b.join(
        b2,
        (F.col("grp") == F.col("grp2")) & (F.col("bkt") <= F.col("bkt2")),
    ).select(
        "grp",
        (F.col("bkt") + F.col("bkt2")).alias("walsh2"),
        F.when(
            F.col("bkt") == F.col("bkt2"),
            F.col("c") * (F.col("c") + 1) / 2,
        )
        .otherwise(F.col("c") * F.col("c2"))
        .cast("long")
        .alias("wt"),
    )
    g = pairs.groupBy("grp", "walsh2").agg(F.sum("wt").alias("wt"))
    cum = F.sum("wt").over(
        W.partitionBy("grp").orderBy("walsh2").rowsBetween(
            W.unboundedPreceding, 0
        )
    )
    tot = F.sum("wt").over(W.partitionBy("grp"))
    return (
        g.select("grp", "walsh2", cum.alias("cumw"), tot.alias("total"))
        .filter(2 * F.col("cumw") >= F.col("total"))
        .groupBy("grp")
        .agg(
            F.max("total").alias("n_pairs"),
            F.min("walsh2").alias("hl_walsh2"),
        )
        .select(
            "grp",
            "n_pairs",
            "hl_walsh2",
            (F.col("hl_walsh2") * (HL_BUCKET // 2)).alias("hl_dollars"),
        )
        .orderBy("grp")
    )


_HL_SQL = f"""
WITH b AS (
    SELECT o_orderpriority AS grp,
        CAST(FLOOR(o_totalprice / {HL_BUCKET}) AS BIGINT) AS bkt,
        COUNT(*) AS c
    FROM orders GROUP BY 1, 2
),
pairs AS (
    SELECT x.grp, x.bkt + y.bkt AS walsh2,
        CAST(CASE WHEN x.bkt = y.bkt THEN x.c * (x.c + 1) / 2
                  ELSE x.c * y.c END AS BIGINT) AS wt
    FROM b x JOIN b y ON x.grp = y.grp AND x.bkt <= y.bkt
),
g AS (
    SELECT grp, walsh2, CAST(SUM(wt) AS BIGINT) AS wt
    FROM pairs GROUP BY grp, walsh2
),
cums AS (
    SELECT grp, walsh2, wt,
        SUM(wt) OVER (PARTITION BY grp ORDER BY walsh2
                      ROWS UNBOUNDED PRECEDING) AS cumw,
        SUM(wt) OVER (PARTITION BY grp) AS total
    FROM g
)
SELECT grp,
    CAST(MAX(total) AS BIGINT) AS n_pairs,
    CAST(MIN(walsh2) AS BIGINT) AS hl_walsh2,
    CAST(MIN(walsh2) * {HL_BUCKET // 2} AS BIGINT) AS hl_dollars
FROM cums
WHERE 2 * cumw >= total
GROUP BY grp
ORDER BY grp
"""


QUERIES = {
    "agg_hodges_lehmann": agg_hodges_lehmann,
    "rollup_downsample_ltob": rollup_downsample_ltob,
    "agg_benford_profile": agg_benford_profile,
    "agg_vwap": agg_vwap,
    "window_winsorize": window_winsorize,
    "agg_decile_report": agg_decile_report,
    "agg_pareto_frontier": agg_pareto_frontier,
    "rollup_ohlc_bars": rollup_ohlc_bars,
    "quality_mad_outliers": quality_mad_outliers,
    "agg_weighted_median": agg_weighted_median,
    "explode_positional_tokens": explode_positional_tokens,
    "approx_hll_union_sketch": approx_hll_union_sketch,
    "agg_moments_exact": agg_moments_exact,
    "approx_percentile_sketch": approx_percentile_sketch,
    "rollup_hypertable": rollup_hypertable,
    "approx_heavy_hitters_cms": approx_heavy_hitters_cms,
    "agg_percentiles": agg_percentiles,
    "agg_histogram": agg_histogram,
    "agg_corr_exact": agg_corr_exact,
    "sample_systematic": sample_systematic,
    "explode_word_counts": explode_word_counts,
    "approx_distinct_sketch": approx_distinct_sketch,
}

ORACLES = {
    "agg_hodges_lehmann": _HL_SQL,
    "rollup_downsample_ltob": _LTOB_SQL,
    "agg_benford_profile": _BENFORD_SQL,
    "agg_vwap": _VWAP_SQL,
    "window_winsorize": _WINSOR_SQL,
    "agg_decile_report": _DECILE_SQL,
    "agg_pareto_frontier": _PARETO_SQL,
    "rollup_ohlc_bars": _OHLC_SQL,
    "quality_mad_outliers": _MAD_SQL,
    "agg_weighted_median": _WMEDIAN_SQL,
    "explode_positional_tokens": _POS_TOKENS_SQL,
    "approx_hll_union_sketch": _HLL_UNION_SQL,
    "agg_moments_exact": _MOMENTS_SQL,
    "approx_percentile_sketch": _APS_SQL,
    "approx_distinct_sketch": _ADS_SQL,
    "agg_percentiles": _PCTL_SQL,
    "rollup_hypertable": _ROLLUP_SQL,
    "approx_heavy_hitters_cms": _cms_sql(),
    "agg_histogram": _HIST_SQL,
    "agg_corr_exact": _CORR_SQL,
    "sample_systematic": _SAMPLE_SQL,
    "explode_word_counts": _WORDS_SQL,
}
