"""Scale-pattern operators: incremental aggregate maintenance, file-level
min/max data skipping, exact mergeable distinct via bitmaps, and
explicit join-strategy control.

The reference is a scan-only Arrow wrapper (reference: src/
parquetreader/reader.py:128-129); these four operators are the plans a
100 TB deployment leans on every day:

- ``etl_incremental_agg``: a standing aggregate ("materialized view")
  is refreshed by scanning ONLY the delta partition and merging exact
  decimal partials — the difference between re-reading 100 TB nightly
  and re-reading 1 TB. Decimal partial sums are associative and exact,
  so partial + merge is bit-identical to a full recompute (the oracle
  IS the full recompute).
- ``scan_minmax_skipping``: the table-format data-skipping pattern
  (Delta/Iceberg manifests, parquet row-group stats writ large): a
  per-file min/max stats manifest is consulted first and only files
  whose [min,max] range intersects the predicate are opened. The
  manifest is thousands of rows where the data is billions — the scan
  reducer that works even without hive partitioning.
- ``agg_bitmap_distinct``: EXACT distinct counting from mergeable
  per-shard bitmaps (``bitmap_construct_agg`` / ``bitmap_or_agg``) —
  the pattern for incremental / cube-level exact COUNT DISTINCT where
  HLL's ±2% is not acceptable. Partial bitmaps are tiny (≤4 KB per
  32k-id bucket), OR-merge is associative, and no shuffle ever carries
  raw ids twice.
- ``join_strategy_hints``: the explicit-strategy escape hatch. The
  optimizer picks SortMergeJoin for two large inputs; when the build
  side is known to fit (or the sort would dominate), ``SHUFFLE_HASH``
  skips both sorts. Results are strategy-independent (the invariant a
  planner must guarantee); tests assert the plan actually switched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_batch_spark.catalog import load
from parquet_batch_spark.functions.numeric import dec, sql_dsum
from parquet_batch_spark.operators.sources_ext import _io_dir

# ---------------------------------------------------------------------------
# etl_incremental_agg — materialized-view delta maintenance
# ---------------------------------------------------------------------------

# The standing view covers history strictly before the cutoff; the
# delta batch is everything at/after it (~15% of rows at the test SFs).
INC_CUTOFF = "2001-01-01"

_MV_STAGED: set[str] = set()


def etl_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a monthly revenue aggregate.

    The standing MV (monthly ``n_orders`` + exact DECIMAL revenue
    partials for all history < {INC_CUTOFF}) is staged to parquet once
    per process — in production it already exists; refresh must never
    rescan it from the fact table. The refresh scans ONLY the delta
    partition (o_orderdate >= cutoff), partial-aggregates it to the
    same grain, unions the two partial sets and re-aggregates. Because
    the partials are exact decimals (associative, order-insensitive),
    the merged result is bit-identical to a full recompute — which is
    exactly what the DuckDB oracle runs.

    Scale: the delta scan is partition-pruned (a date predicate on a
    date-partitioned fact), partials shuffle at month grain (dozens of
    rows per shard), and the merge is a union of two already-tiny
    relations. Full-history rescans never happen.
    """
    out = _io_dir(sf_dir, "orders_monthly_mv")
    if out not in _MV_STAGED:
        base = (
            load(spark, sf_dir, "orders")
            .filter(F.col("o_orderdate") < F.lit(INC_CUTOFF).cast("timestamp_ntz"))
            .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(dec("o_totalprice")).alias("rev_partial"),
            )
        )
        base.write.mode("overwrite").parquet(out)
        _MV_STAGED.add(out)
    mv = spark.read.parquet(out)
    delta = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(INC_CUTOFF).cast("timestamp_ntz"))
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).alias("rev_partial"),
        )
    )
    return (
        mv.unionByName(delta)
        .groupBy("month")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("rev_partial").cast("decimal(18,6)").cast("double").alias("revenue"),
        )
        .orderBy("month")
    )


_INC_AGG_SQL = f"""
SELECT STRFTIME(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice")} AS revenue
FROM orders
GROUP BY month
ORDER BY month
"""

# ---------------------------------------------------------------------------
# scan_minmax_skipping — file-level stats manifest pruning
# ---------------------------------------------------------------------------

SKIP_SHARDS = 16  # staged file count; range-sharded on the skip column
SKIP_LO, SKIP_HI = "1996-06-01", "1996-09-01"

_SKIP_STAGED: set[str] = set()


def scan_minmax_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File skipping from a min/max stats manifest.

    Orders are staged once per process as {SKIP_SHARDS} range-sharded
    parquet files (``repartitionByRange`` on the skip column, so each
    file covers a narrow o_orderdate band — the layout a clustered
    table or a time-ordered ingest produces for free). The query then:

    1. builds the stats manifest — one row per FILE (``_metadata``
       grouping): min/max o_orderdate. Manifest size = file count,
       independent of row count; at 100 TB it is the table-format
       manifest a catalog serves without touching data.
    2. keeps only files whose [min,max] intersects the predicate range
       (a driver-side list of paths — bounded by file count).
    3. scans ONLY those files, re-applies the exact predicate (stats
       prune at file grain; the residual filter is still required),
       and aggregates.

    tests/test_scale_ops.py asserts real skipping (kept < total). The
    oracle is the plain predicate over the logical table — skipping
    must never change answers.
    """
    out = _io_dir(sf_dir, "orders_range_sharded")
    if out not in _SKIP_STAGED:
        (
            load(spark, sf_dir, "orders")
            .repartitionByRange(SKIP_SHARDS, "o_orderdate")
            .write.mode("overwrite")
            .parquet(out)
        )
        _SKIP_STAGED.add(out)
    lo = F.lit(SKIP_LO).cast("timestamp_ntz")
    hi = F.lit(SKIP_HI).cast("timestamp_ntz")
    staged = spark.read.parquet(out)
    manifest = (
        staged.groupBy(F.col("_metadata.file_path").alias("path"))
        .agg(
            F.min("o_orderdate").alias("mn"),
            F.max("o_orderdate").alias("mx"),
        )
        .filter((F.col("mx") >= lo) & (F.col("mn") < hi))
    )
    kept = [r["path"] for r in manifest.select("path").collect()]
    pruned = spark.read.parquet(*kept) if kept else staged.limit(0)
    return (
        pruned.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("decimal(18,6)").cast("double").alias(
                "revenue"
            ),
        )
        .orderBy("month")
    )


def skip_file_counts(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    """(kept, total) staged-file counts for the skipping predicate —
    test hook proving the manifest actually pruned files."""
    scan_minmax_skipping(spark, sf_dir)  # ensure staged
    out = _io_dir(sf_dir, "orders_range_sharded")
    staged = spark.read.parquet(out)
    lo = F.lit(SKIP_LO).cast("timestamp_ntz")
    hi = F.lit(SKIP_HI).cast("timestamp_ntz")
    manifest = staged.groupBy(F.col("_metadata.file_path").alias("path")).agg(
        F.min("o_orderdate").alias("mn"), F.max("o_orderdate").alias("mx")
    )
    total = manifest.count()
    kept = manifest.filter((F.col("mx") >= lo) & (F.col("mn") < hi)).count()
    return kept, total


_SKIP_SQL = f"""
SELECT STRFTIME(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice")} AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '{SKIP_LO} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{SKIP_HI} 00:00:00'
GROUP BY month
ORDER BY month
"""

# ---------------------------------------------------------------------------
# agg_bitmap_distinct — exact mergeable COUNT DISTINCT
# ---------------------------------------------------------------------------

BM_SHARDS = 8  # simulated ingest shards whose partial bitmaps merge


def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct customers per order priority via mergeable
    bitmaps, the incremental-exact-distinct pattern: each ingest shard
    builds per-bucket bitmaps (``bitmap_construct_agg`` over
    ``bitmap_bit_position``; a bucket covers 32k ids → ≤4 KB bitmap),
    shards merge with ``bitmap_or_agg`` (associative — works across
    days/partitions/retries), and the final count is the sum of per-
    bucket popcounts. Raw ids cross the wire once, into fixed-size
    bitmap states; re-aggregating history is never needed.

    ``n_partial_bitmaps`` (distinct (shard, bucket) partials that were
    merged) is part of the output so the oracle also pins the partial
    structure, not just the final counts. Ids are shifted +1: the
    bitmap position functions require strictly positive input and the
    generator's custkeys start at 0.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        (F.col("o_custkey") + 1).alias("ck"),
        (F.col("o_custkey") % BM_SHARDS).alias("shard"),
    )
    partials = o.groupBy(
        "o_orderpriority",
        "shard",
        F.bitmap_bucket_number(F.col("ck")).alias("bucket"),
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position(F.col("ck"))).alias("bm"))
    merged = partials.groupBy("o_orderpriority", "bucket").agg(
        F.bitmap_or_agg("bm").alias("bm"),
        F.count(F.lit(1)).alias("n_partials"),
    )
    return (
        merged.groupBy("o_orderpriority")
        .agg(
            F.sum(F.bitmap_count("bm")).alias("n_distinct_custkeys"),
            F.sum("n_partials").alias("n_partial_bitmaps"),
        )
        .orderBy("o_orderpriority")
    )


# Oracle: plain exact COUNT DISTINCT; the partial-bitmap count is
# mirrored arithmetically — bitmap_bucket_number(v) buckets ids in
# 32768-wide blocks starting at 1, i.e. floor((v-1)/32768)+1.
_BITMAP_SQL = f"""
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_distinct_custkeys,
       COUNT(DISTINCT (o_custkey % {BM_SHARDS}, (o_custkey + 1 - 1) // 32768))
           AS n_partial_bitmaps
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# ---------------------------------------------------------------------------
# join_strategy_hints — explicit physical-strategy control
# ---------------------------------------------------------------------------


def _hinted_rollup(spark: SparkSession, sf_dir: str, strategy: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    j = o.join(c.hint(strategy), o["o_custkey"] == c["c_custkey"])
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("decimal(18,6)").cast("double").alias(
                "revenue"
            ),
        )
        .orderBy("c_mktsegment")
    )


def join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact×dim rollup under an explicit ``SHUFFLE_HASH`` hint.

    With broadcast disabled by size, Spark's default for two unsorted
    inputs is SortMergeJoin; when the build side is known to fit in a
    task (or the sort would dominate — e.g. high-cardinality keys read
    once), ``SHUFFLE_HASH`` skips BOTH sorts: hash-shuffle both sides,
    hash-build the smaller, stream the larger. The answer is strategy-
    independent — the invariant every optimizer transform must hold —
    and tests/test_scale_ops.py asserts (a) this plan contains a
    ShuffledHashJoin while the MERGE-hinted twin plans a SortMergeJoin
    and (b) both produce identical rows. At 100 TB the same hint is
    how you stop an SMJ sort-spill on a join whose output feeds a
    hash aggregate anyway.
    """
    return _hinted_rollup(spark, sf_dir, "shuffle_hash")


def join_strategy_merge_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-hinted twin of :func:`join_strategy_hints` (test hook)."""
    return _hinted_rollup(spark, sf_dir, "merge")


_HINT_SQL = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice")} AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ------------------------------------------------- row-group statistics

RG_SIZE = 64  # rows per row group in the staged file
RG_PRUNE_MIN = 300  # pruning predicate under audit: doc_id >= this

_RG_STAGED: set[str] = set()


def scan_rowgroup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-group statistics audit — one level below
    ``scan_minmax_skipping``'s file-grain manifest: parquet footers
    carry per-ROW-GROUP min/max, and row-group pruning inside a file
    is the scan optimization every engine (Spark included) applies
    before decoding a single page.  This surfaces that footer as a
    queryable table and marks which groups the predicate
    ``doc_id >= {RG_PRUNE_MIN}`` would skip.

    Staging (once per process): documents sorted by doc_id rewritten
    as ONE parquet file with {RG_SIZE}-row row groups (pyarrow's
    deterministic row_group_size cut — Spark's own writer cuts groups
    by memory, which is not reproducible).  The operator under
    measurement is the FOOTER read: metadata only, never data pages;
    driver-side cost is bounded by row-group count (manifest scale —
    the same bound as every stats-manifest collect in this module).
    The oracle recomputes each group's expected stats from the data
    itself, so a hash match proves footer stats ≡ data stats — the
    integrity property stats-based pruning silently relies on."""
    import pyarrow.parquet as pq

    stage_dir = _io_dir(sf_dir, "documents_rowgroups")
    path = os.path.join(stage_dir, "part-0.parquet")
    if path not in _RG_STAGED:
        tmp = os.path.join(stage_dir, "_spark_sorted")
        (
            load(spark, sf_dir, "documents")
            .select("doc_id", "n_chars")
            .orderBy("doc_id")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        os.makedirs(stage_dir, exist_ok=True)
        pq.write_table(
            pq.read_table(tmp), path, row_group_size=RG_SIZE
        )
        _RG_STAGED.add(path)
    md = pq.ParquetFile(path).metadata
    cols = {md.schema.column(j).name: j for j in range(md.num_columns)}
    rows = []
    for i in range(md.num_row_groups):
        rg = md.row_group(i)
        sd = rg.column(cols["doc_id"]).statistics
        sc = rg.column(cols["n_chars"]).statistics
        rows.append(
            (
                i,
                rg.num_rows,
                sd.min,
                sd.max,
                sc.min,
                sc.max,
                sd.max < RG_PRUNE_MIN,
            )
        )
    return spark.createDataFrame(
        rows,
        schema=(
            "row_group_id int, num_rows bigint, min_doc bigint, "
            "max_doc bigint, min_chars bigint, max_chars bigint, "
            "pruned boolean"
        ),
    ).orderBy("row_group_id")


_RG_SQL = f"""
WITH ordered AS (
    SELECT doc_id, n_chars,
        ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rn
    FROM documents
)
SELECT CAST(rn // {RG_SIZE} AS INTEGER) AS row_group_id,
    COUNT(*) AS num_rows,
    MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
    MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
    MAX(doc_id) < {RG_PRUNE_MIN} AS pruned
FROM ordered
GROUP BY rn // {RG_SIZE}
ORDER BY row_group_id
"""


# ---------------------------------------------------------------------------
# scan_partition_pruning_report — stats-pruning effectiveness ladder
# ---------------------------------------------------------------------------

# (label, lo, hi) — literal o_orderdate ranges of increasing width
PRUNE_PREDICATES = (
    ("1_one_day", "1996-03-15", "1996-03-16"),
    ("2_one_month", "1996-03-01", "1996-04-01"),
    ("3_one_year", "1996-01-01", "1997-01-01"),
    ("4_three_years", "1996-01-01", "1999-01-01"),
)


def scan_partition_pruning_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruning effectiveness ladder: for predicate ranges of
    increasing width, how many MONTH partitions of a time-partitioned
    orders table survive manifest min/max intersection — the planning
    table that justifies a partition scheme before the 100 TB
    migration ("a one-day query touches 1 of 80 partitions; a
    three-year query touches 37 — is month the right grain?").
    ``scan_minmax_skipping`` proves skipping is CORRECT; this one
    quantifies how much each query class gets.

    The manifest derives from the deterministic month-shard
    expression (the layout a ``partitionBy(month)`` sink produces),
    so the report is exact and layout-reproducible; intersection
    counts are a ≤(predicates × months) literal cross join.
    """
    o = load(spark, sf_dir, "orders")
    manifest = (
        o.select(
            (
                (F.year("o_orderdate") - F.lit(1970)) * 12
                + F.month("o_orderdate")
                - 1
            ).alias("month_id"),
            F.col("o_orderdate").alias("d"),
        )
        .groupBy("month_id")
        .agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    )
    preds = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(label).alias("predicate"),
                    F.lit(lo).cast("timestamp_ntz").alias("lo"),
                    F.lit(hi).cast("timestamp_ntz").alias("hi"),
                )
                for label, lo, hi in PRUNE_PREDICATES
            ]
        )
    ).alias("p")
    crossed = manifest.select(preds, "mn", "mx").select(
        F.col("p.predicate").alias("predicate"),
        F.col("p.lo").alias("lo"),
        F.col("p.hi").alias("hi"),
        "mn",
        "mx",
    )
    return (
        crossed.groupBy("predicate")
        .agg(
            F.count(F.lit(1)).alias("n_partitions"),
            F.sum(
                F.when(
                    (F.col("mx") >= F.col("lo")) & (F.col("mn") < F.col("hi")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_kept"),
        )
        .select(
            "predicate",
            "n_partitions",
            "n_kept",
            F.expr("(1000000 * n_kept) div n_partitions").alias(
                "keep_micro"
            ),
        )
        .orderBy("predicate")
    )


def _prune_report_sql() -> str:
    rows = " UNION ALL ".join(
        f"SELECT '{label}' AS predicate,"
        f" TIMESTAMP '{lo} 00:00:00' AS lo,"
        f" TIMESTAMP '{hi} 00:00:00' AS hi"
        for label, lo, hi in PRUNE_PREDICATES
    )
    return f"""
WITH manifest AS (
    SELECT (year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1
               AS month_id,
           MIN(o_orderdate) AS mn, MAX(o_orderdate) AS mx
    FROM orders GROUP BY 1
),
preds AS ({rows})
SELECT p.predicate,
       COUNT(*) AS n_partitions,
       CAST(SUM(CASE WHEN m.mx >= p.lo AND m.mn < p.hi THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       (1000000 * CAST(SUM(CASE WHEN m.mx >= p.lo AND m.mn < p.hi
                           THEN 1 ELSE 0 END) AS BIGINT)) // COUNT(*)
           AS keep_micro
FROM preds p CROSS JOIN manifest m
GROUP BY p.predicate
ORDER BY p.predicate
"""


# ---------------------------------------------------------------------------
# sink_clustering_factor — layout quality: range vs hash sharding
# ---------------------------------------------------------------------------

CF_SHARDS = 16


def sink_clustering_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-factor comparison of two {CF_SHARDS}-file layouts of
    the same table — WHY sorted writes prune and hash-scattered ones
    don't, as one number per layout: the expected FILES TOUCHED by a
    point lookup = Σ_shards span_i / key_domain (a shard whose min/max
    covers the whole domain is hit by every probe). Range sharding
    scores ≈1, hash sharding ≈{CF_SHARDS} — the quantified version of
    the z-order/sort advice every table-layout doc hand-waves.

    Shard functions are deterministic expressions (range: key-band
    div; hash: portable md5 mod), so both manifests are exact and the
    oracle reproduces them from the table alone.
    """
    from parquet_batch_spark.functions.hashing import hash32

    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    )
    bounds = o.agg(
        F.min("k").alias("kmin"), F.max("k").alias("kmax")
    )
    base = o.crossJoin(F.broadcast(bounds))

    def manifest(shard_col, label: str) -> DataFrame:
        return (
            base.select(shard_col.alias("shard"), "k", "kmin", "kmax")
            .groupBy("shard")
            .agg(
                F.min("k").alias("mn"),
                F.max("k").alias("mx"),
                F.max("kmax").alias("kmax"),
                F.min("kmin").alias("kmin"),
            )
            .agg(
                F.lit(label).alias("layout"),
                F.count(F.lit(1)).alias("n_shards"),
                F.expr(
                    "CAST((1000000 * sum(mx - mn + 1))"
                    " div (max(kmax) - min(kmin) + 1) AS BIGINT)"
                ).alias("files_touched_micro"),
            )
        )

    rng = manifest(
        F.least(
            F.lit(CF_SHARDS - 1),
            F.expr(
                f"((k - kmin) * {CF_SHARDS}) div (kmax - kmin + 1)"
            ),
        ),
        "1_range_clustered",
    )
    hsh = manifest(
        hash32(F.col("k").cast("string")) % CF_SHARDS, "2_hash_scattered"
    )
    return rng.unionByName(hsh).orderBy("layout")


def _clustering_factor_sql() -> str:
    from parquet_batch_spark.functions.hashing import sql_hash32

    h = sql_hash32("CAST(k AS VARCHAR)")
    return f"""
WITH base AS (
    SELECT o_custkey AS k FROM orders
),
bounds AS (
    SELECT MIN(k) AS kmin, MAX(k) AS kmax FROM base
),
rng AS (
    SELECT LEAST({CF_SHARDS - 1},
               ((k - (SELECT kmin FROM bounds)) * {CF_SHARDS})
               // ((SELECT kmax - kmin + 1 FROM bounds))) AS shard, k
    FROM base
),
hsh AS (
    SELECT {h} % {CF_SHARDS} AS shard, k FROM base
),
m_rng AS (
    SELECT shard, MIN(k) AS mn, MAX(k) AS mx FROM rng GROUP BY shard
),
m_hsh AS (
    SELECT shard, MIN(k) AS mn, MAX(k) AS mx FROM hsh GROUP BY shard
)
SELECT '1_range_clustered' AS layout,
       COUNT(*) AS n_shards,
       CAST((1000000 * SUM(mx - mn + 1))
            // (SELECT kmax - kmin + 1 FROM bounds) AS BIGINT)
           AS files_touched_micro
FROM m_rng
UNION ALL
SELECT '2_hash_scattered', COUNT(*),
       CAST((1000000 * SUM(mx - mn + 1))
            // (SELECT kmax - kmin + 1 FROM bounds) AS BIGINT)
FROM m_hsh
ORDER BY layout
"""


# -------------------------------------------- dictionary-encoding audit

_DICT_COLS = ("doc_id", "n_chars", "lang", "source")
# lang/source: dictionary is right; doc_id: dictionary DELIBERATELY forced
# on a unique key — the misconfiguration the audit exists to flag
_DICT_ON = ("lang", "source", "doc_id")
DICT_NDV_RATIO_MAX = 100_000  # recommend dict when ndv/rows <= 10%
_DICT_STAGED: set[str] = set()


def scan_dictionary_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-encoding audit: per column, the exact NDV/row ratio
    (the statistic that decides whether dictionary encoding pays) next
    to what the parquet footer says the file ACTUALLY used — the
    layout review that finds the classic 100 TB storage bug, a
    high-cardinality column silently falling out of dictionary
    encoding and bloating the table 5×.

    Staging (once per process): the documents projection written via
    pyarrow with dictionary encoding DELIBERATELY enabled only for
    {lang, source} AND (deliberately, wrongly) the unique doc_id key —
    so the footer truth is deterministic and the audit's agreement
    column (``dict_used == dict_recommended``) exercises both the
    agree and the flag-the-misconfiguration paths.  The NDV side is a distributed aggregate; the
    footer side is a metadata-only read bounded by column count.

    Output per column: rows, exact NDV, ndv_ratio_micro,
    dict_recommended (ratio ≤ 10%), dict_used (footer), agreement.
    """
    import pyarrow.parquet as pq

    stage_dir = _io_dir(sf_dir, "documents_dict_audit")
    path = os.path.join(stage_dir, "part-0.parquet")
    if path not in _DICT_STAGED:
        tmp = os.path.join(stage_dir, "_spark_proj")
        (
            load(spark, sf_dir, "documents")
            .select(*_DICT_COLS)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        os.makedirs(stage_dir, exist_ok=True)
        pq.write_table(
            pq.read_table(tmp),
            path,
            use_dictionary=list(_DICT_ON),
        )
        _DICT_STAGED.add(path)
    md = pq.ParquetFile(path).metadata
    used = {}
    for j in range(md.num_columns):
        name = md.schema.column(j).name
        encs = set()
        for i in range(md.num_row_groups):
            encs.update(md.row_group(i).column(j).encodings)
        used[name] = int(any("DICTIONARY" in e for e in encs))
    back = spark.read.parquet(path)
    ndv = back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.countDistinct(c).alias(f"ndv_{c}") for c in _DICT_COLS],
    ).collect()[0]
    rows = []
    for c in _DICT_COLS:
        n, d = int(ndv["n_rows"]), int(ndv[f"ndv_{c}"])
        ratio = 1_000_000 * d // n
        rec = int(ratio <= DICT_NDV_RATIO_MAX)
        rows.append((c, n, d, ratio, rec, used[c], int(rec == used[c])))
    return spark.createDataFrame(
        rows,
        "col_name string, n_rows long, ndv long, ndv_ratio_micro long,"
        " dict_recommended int, dict_used int, agreement int",
    ).orderBy("col_name")


def _dict_audit_sql() -> str:
    parts = []
    for c in _DICT_COLS:
        used = 1 if c in _DICT_ON else 0
        parts.append(f"""SELECT '{c}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,
       (1000000 * CAST(COUNT(DISTINCT {c}) AS BIGINT))
           // CAST(COUNT(*) AS BIGINT) AS ndv_ratio_micro,
       CAST(CASE WHEN (1000000 * CAST(COUNT(DISTINCT {c}) AS BIGINT))
            // CAST(COUNT(*) AS BIGINT) <= {DICT_NDV_RATIO_MAX}
            THEN 1 ELSE 0 END AS INTEGER) AS dict_recommended,
       CAST({used} AS INTEGER) AS dict_used,
       CAST(CASE WHEN (CASE WHEN (1000000 * CAST(COUNT(DISTINCT {c})
            AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
            <= {DICT_NDV_RATIO_MAX} THEN 1 ELSE 0 END) = {used}
            THEN 1 ELSE 0 END AS INTEGER) AS agreement
FROM documents""")
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


QUERIES = {
    "scan_dictionary_encoding_audit": scan_dictionary_encoding_audit,
    "scan_partition_pruning_report": scan_partition_pruning_report,
    "sink_clustering_factor": sink_clustering_factor,
    "scan_rowgroup_stats": scan_rowgroup_stats,
    "etl_incremental_agg": etl_incremental_agg,
    "scan_minmax_skipping": scan_minmax_skipping,
    "agg_bitmap_distinct": agg_bitmap_distinct,
    "join_strategy_hints": join_strategy_hints,
}

ORACLES = {
    "scan_dictionary_encoding_audit": _dict_audit_sql(),
    "scan_partition_pruning_report": _prune_report_sql(),
    "sink_clustering_factor": _clustering_factor_sql(),
    "scan_rowgroup_stats": _RG_SQL,
    "etl_incremental_agg": _INC_AGG_SQL,
    "scan_minmax_skipping": _SKIP_SQL,
    "agg_bitmap_distinct": _BITMAP_SQL,
    "join_strategy_hints": _HINT_SQL,
}
