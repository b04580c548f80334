"""Scalar function surface: string / date / math / array / JSON / map.

All expressions are built-in pyspark.sql.functions — JVM-side inside
whole-stage codegen, no Python in the row path. Each family gets one
oracle-checked query exercising several functions at once.

Absent from the reference (SURVEY.md §2.2 "Scalar functions: Absent"
— it only does Arrow→Python type conversion, reader.py:64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_batch_spark.catalog import fan_out, load


def func_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """substring/concat/upper/lower/trim/lpad/replace/length over part
    names; regexp_extract pulls the brand number."""
    p = load(spark, sf_dir, "part")
    return (
        p.select("p_partkey", "p_name", "p_brand")
        .withColumn("name_upper", F.upper("p_name"))
        .withColumn("name_prefix", F.substring("p_name", 1, 8))
        .withColumn("brand_num", F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int"))
        .withColumn("padded", F.lpad(F.col("p_partkey").cast("string"), 8, "0"))
        .withColumn("label", F.concat_ws("-", "p_brand", F.col("p_partkey").cast("string")))
        .withColumn("name_len", F.length("p_name"))
        .withColumn("vowelless", F.regexp_replace("p_name", "[aeiou]", ""))
        .orderBy("p_partkey")
    )


_FUNC_STRING_SQL = """
SELECT p_partkey, p_name, p_brand,
    UPPER(p_name) AS name_upper,
    SUBSTRING(p_name, 1, 8) AS name_prefix,
    CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INTEGER) AS brand_num,
    LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
    CONCAT_WS('-', p_brand, CAST(p_partkey AS VARCHAR)) AS label,
    LENGTH(p_name)::INTEGER AS name_len,
    regexp_replace(p_name, '[aeiou]', '', 'g') AS vowelless
FROM part
ORDER BY p_partkey
"""


def func_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc/year/month/dayofweek/datediff/add_months over
    order dates; month-level truncation drives the group-by."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.dayofweek("o_orderdate").alias("dow"),  # 1=Sunday
            F.datediff(
                F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("days_to_2002"),
            F.add_months(F.col("o_orderdate").cast("date"), 3).alias("plus3mo"),
        )
        .groupBy("order_month", "yr", "mo")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("dow").alias("min_dow"),
            F.max("days_to_2002").alias("max_days_to_2002"),
            F.min("plus3mo").alias("min_plus3mo"),
        )
        .orderBy("order_month")
    )


_FUNC_DATE_SQL = """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
    CAST(year(o_orderdate) AS INTEGER) AS yr,
    CAST(month(o_orderdate) AS INTEGER) AS mo,
    COUNT(*) AS n,
    CAST(MIN(dayofweek(o_orderdate) + 1) AS INTEGER) AS min_dow,
    CAST(MAX(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')) AS INTEGER) AS max_days_to_2002,
    CAST(MIN(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH) AS DATE) AS min_plus3mo
FROM orders
GROUP BY order_month, yr, mo
ORDER BY order_month
"""


def func_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/pow/sqrt/log/pmod — rounded to 6dp where
    transcendental (libm vs JVM may differ in the last ulp)."""
    li = fan_out(load(spark, sf_dir, "lineitem"), spark)
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .filter(F.col("l_linenumber") == 1)
        .withColumn("qty_ceil", F.ceil(F.col("l_quantity") / 7.0).cast("bigint"))
        .withColumn("qty_floor", F.floor(F.col("l_quantity") / 7.0).cast("bigint"))
        .withColumn("price_round", F.round("l_extendedprice", -2))
        .withColumn("sqrt_qty", F.round(F.sqrt("l_quantity"), 6))
        .withColumn("log_price", F.round(F.log("l_extendedprice"), 6))
        .withColumn("pmod7", F.pmod("l_orderkey", F.lit(7)).cast("bigint"))
        .withColumn("absdiff", F.abs(F.col("l_quantity") - 25.0))
        .orderBy("l_orderkey", "l_linenumber")
    )


_FUNC_MATH_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
    CAST(CEIL(l_quantity / 7.0) AS BIGINT) AS qty_ceil,
    CAST(FLOOR(l_quantity / 7.0) AS BIGINT) AS qty_floor,
    ROUND(l_extendedprice, -2) AS price_round,
    ROUND(SQRT(l_quantity), 6) AS sqrt_qty,
    ROUND(LN(l_extendedprice), 6) AS log_price,
    CAST(l_orderkey % 7 AS BIGINT) AS pmod7,
    ABS(l_quantity - 25.0) AS absdiff
FROM lineitem
WHERE l_linenumber = 1
ORDER BY l_orderkey, l_linenumber
"""


def func_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from events.props (string column) — typed get
    + aggregation over the extracted value."""
    ev = fan_out(load(spark, sf_dir, "events"), spark)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


_FUNC_JSON_SQL = """
SELECT event_type,
    COUNT(*) AS n,
    MIN(k) AS min_k, MAX(k) AS max_k, CAST(SUM(k) AS BIGINT) AS sum_k
FROM (
    SELECT event_type,
        CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
)
GROUP BY event_type
ORDER BY event_type
"""


def func_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over embeddings: size/slice/element_at +
    higher-order transform/filter/aggregate (all JVM-side)."""
    em = load(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    dvec = F.transform(vec, lambda x: x.cast("double"))
    return em.select(
        "vec_id",
        "label",
        F.size(vec).alias("dim"),
        F.round(
            F.aggregate(F.slice(dvec, 1, 3), F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("first3_sum"),
        F.round(F.element_at(dvec, 1), 6).alias("head"),
        F.size(F.filter(vec, lambda x: x > 0)).cast("bigint").alias("n_positive"),
    ).orderBy("vec_id")


_FUNC_ARRAY_SQL = """
SELECT vec_id, label,
    CAST(len(embedding) AS INTEGER) AS dim,
    ROUND(CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
          + CAST(embedding[3] AS DOUBLE), 6) AS first3_sum,
    ROUND(CAST(embedding[1] AS DOUBLE), 6) AS head,
    CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
FROM embeddings
ORDER BY vec_id
"""


def func_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / least / greatest."""
    c = load(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_acctbal", "c_mktsegment")
        .withColumn(
            "bal_class",
            F.when(F.col("c_acctbal") < 0, "negative")
            .when(F.col("c_acctbal") < 1000, "low")
            .when(F.col("c_acctbal") < 5000, "mid")
            .otherwise("high"),
        )
        .withColumn("seg_or_na", F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("N/A")))
        .withColumn("clamped", F.least(F.greatest(F.col("c_acctbal"), F.lit(0.0)), F.lit(5000.0)))
        .orderBy("c_custkey")
    )


_FUNC_CONDITIONAL_SQL = """
SELECT c_custkey, c_acctbal, c_mktsegment,
    CASE WHEN c_acctbal < 0 THEN 'negative'
         WHEN c_acctbal < 1000 THEN 'low'
         WHEN c_acctbal < 5000 THEN 'mid'
         ELSE 'high' END AS bal_class,
    COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'N/A') AS seg_or_na,
    LEAST(GREATEST(c_acctbal, 0.0), 5000.0) AS clamped
FROM customer
ORDER BY c_custkey
"""


def func_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full JSON parsing: ``from_json`` with an explicit struct
    schema (vs. func_json's path-based ``get_json_object``). Typed
    struct access survives Catalyst optimization, and malformed
    documents surface through the PERMISSIVE-mode corrupt-record
    column rather than runtime errors — the contract a pipeline needs
    at scale. ``parse_ok`` is TRUE iff the document parsed cleanly
    (corrupt-record column NULL), FALSE for malformed input, NULL for
    NULL input — matching DuckDB's ``json_valid`` on objects (Spark 4's
    bare ``from_json(...).isNotNull()`` is TRUE even for malformed
    input, because PERMISSIVE mode yields an all-null struct, not a
    NULL struct; pinned by tests/test_scalar_funcs_semantics.py).
    Known residual divergence: valid non-object JSON (``"5"``, ``[1]``)
    is json_valid-TRUE but corrupt for a struct schema — absent from
    the events corpus."""
    ev = load(spark, sf_dir, "events")
    parsed = F.from_json(
        "props",
        "k INT, _corrupt_record STRING",
        {"columnNameOfCorruptRecord": "_corrupt_record"},
    )
    parse_ok = F.when(
        F.col("props").isNull(), F.lit(None).cast("boolean")
    ).otherwise(parsed.getField("_corrupt_record").isNull())
    return (
        ev.select(
            "event_id",
            parsed.getField("k").alias("k"),
            parse_ok.alias("parse_ok"),
        )
        .withColumn("k_bucket", F.floor(F.col("k") / 10).cast("int"))
        .orderBy("event_id")
    )


_FUNC_JSON_STRUCT_SQL = """
SELECT event_id,
    CAST(json_extract(props, '$.k') AS INTEGER) AS k,
    (json_valid(props)) AS parse_ok,
    CAST(FLOOR(CAST(json_extract(props, '$.k') AS INTEGER) / 10) AS INTEGER) AS k_bucket
FROM events
ORDER BY event_id
"""


def func_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction and access: create_map / map_concat /
    element_at / map_keys / map_contains_key / size. The oracle states
    the known ground truth directly (DuckDB's MAP accessors return
    lists, so cross-engine map comparison would test DuckDB quirks,
    not our engine) — the map round-trip itself is what's under test."""
    p = load(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    m2 = F.map_concat(m, F.create_map(F.lit("size"), F.col("p_size").cast("string")))
    return (
        p.select("p_partkey", "p_brand", "p_type", "p_size")
        .withColumn("brand_val", F.element_at(m, "brand"))
        .withColumn("type_val", F.element_at(m2, "type"))
        .withColumn("size_val", F.element_at(m2, "size"))
        .withColumn("missing_val", F.element_at(m, "nope"))
        .withColumn("n_keys", F.size(m2))
        .withColumn("has_brand", F.map_contains_key(m2, "brand"))
        .withColumn(
            "keys_sorted", F.array_join(F.array_sort(F.map_keys(m2)), ",")
        )
        .drop("p_brand", "p_type", "p_size")
        .orderBy("p_partkey")
    )


_FUNC_MAP_SQL = """
SELECT p_partkey,
    p_brand AS brand_val,
    p_type AS type_val,
    CAST(p_size AS VARCHAR) AS size_val,
    CAST(NULL AS VARCHAR) AS missing_val,
    3 AS n_keys,
    TRUE AS has_brand,
    'brand,size,type' AS keys_sorted
FROM part
ORDER BY p_partkey
"""


def func_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``VariantType`` over semi-structured ``events.props``:
    ``parse_json`` once into the binary variant encoding, then typed
    ``try_variant_get`` extraction and ``schema_of_variant`` discovery,
    rolled up per event_type. Variant keeps the parsed tree in a
    compact binary form — at 100 TB, repeated path extraction over
    variant beats re-parsing JSON text per expression (the
    shredded-storage path Spark 4 is built around). Oracle: DuckDB
    JSON extraction computes identical values; schema strings are
    asserted against the known literal."""
    ev = load(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    extracted = v.select(
        "event_type",
        F.try_variant_get("v", "$.k", "bigint").alias("k"),
        F.expr("schema_of_variant(v)").alias("sch"),
    )
    return (
        extracted.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count_distinct("sch").alias("n_schemas"),
            F.min("sch").alias("schema_str"),
        )
        .orderBy("event_type")
    )


_FUNC_VARIANT_SQL = """
SELECT event_type,
    COUNT(*) AS n_events,
    CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
    MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
    MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
    CAST(1 AS BIGINT) AS n_schemas,
    'OBJECT<k: BIGINT>' AS schema_str
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ----------------------------------------------------- bitwise family

def func_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar-function family — AND/OR/XOR, shifts, popcount,
    complement — the primitives under bitmap indexes, bloom masks
    (join_bloom_prefilter builds on them), and flag-field decoding.
    Dialect note baked into the oracle: ``^`` is XOR in Spark SQL but
    EXPONENT in DuckDB, so the oracle uses ``xor()``; everything else
    maps 1:1. All outputs are exact integers."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    k = F.col("o_orderkey")
    return (
        o.select(
            "o_orderkey",
            (k.bitwiseAND(F.lit(255))).alias("and_255"),
            (k.bitwiseOR(F.lit(4096))).alias("or_4096"),
            (k.bitwiseXOR(F.shiftright(k, 4))).alias("xor_shift"),
            F.shiftleft(k, 2).alias("shl_2"),
            F.shiftright(k, 3).alias("shr_3"),
            F.bit_count(k).cast("int").alias("popcount"),
            F.expr("~o_orderkey").alias("complement"),
        )
        .orderBy("o_orderkey")
    )


_BITWISE_SQL = """
SELECT o_orderkey,
       o_orderkey & 255 AS and_255,
       o_orderkey | 4096 AS or_4096,
       xor(o_orderkey, o_orderkey >> 4) AS xor_shift,
       o_orderkey << 2 AS shl_2,
       o_orderkey >> 3 AS shr_3,
       CAST(bit_count(o_orderkey) AS INTEGER) AS popcount,
       ~o_orderkey AS complement
FROM orders
WHERE o_orderkey < 2000
ORDER BY o_orderkey
"""


# --------------------------------------------------- URL parsing

def func_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing via Spark's ``parse_url`` — host / path / query-
    parameter extraction, the normalization step before any URL-keyed
    dedup. URLs are synthesized deterministically from (source,
    doc_id) so the operator is corpus-driven; the oracle mirrors
    parse_url with anchored regexps (DuckDB has no URL parser), which
    doubles as documentation of exactly which grammar subset is
    relied upon.
    """
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("/page?id="),
        F.col("doc_id").cast("string"),
        F.lit("&ref=crawl"),
    )
    return (
        d.select(
            "doc_id",
            F.parse_url(url, F.lit("HOST")).alias("host"),
            F.parse_url(url, F.lit("PATH")).alias("path"),
            F.parse_url(url, F.lit("QUERY"), F.lit("id")).alias("qid"),
            F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("qref"),
        )
        .orderBy("doc_id")
    )


_FUNC_URL_SQL = """
WITH u AS (
    SELECT doc_id,
           'https://' || source || '.example.com/docs/' || lang ||
           '/page?id=' || CAST(doc_id AS VARCHAR) || '&ref=crawl' AS url
    FROM documents
)
SELECT doc_id,
       regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/]+([^?]*)', 1) AS path,
       regexp_extract(url, '[?&]id=([^&]*)', 1) AS qid,
       regexp_extract(url, '[?&]ref=([^&]*)', 1) AS qref
FROM u
ORDER BY doc_id
"""


# ------------------------------------------- error-safe arithmetic

def func_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe functions: ``try_divide`` / ``try_cast``
    return NULL where strict evaluation would abort the job — the
    difference between one bad row poisoning a 100 TB pipeline and a
    NULL you can quarantine. Division by zero, malformed numeric
    strings, and out-of-range casts are each exercised; the oracle
    mirrors NULL-on-error with guards/TRY_CAST, documenting exactly
    which failures are tolerated.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    zero_every_7 = F.col("o_orderkey") % 7  # 0 for multiples of 7
    numlike = F.when(
        F.col("o_orderkey") % 3 == 0, F.col("o_orderkey").cast("string")
    ).otherwise(F.concat(F.lit("k"), F.col("o_orderkey").cast("string")))
    return (
        o.select(
            "o_orderkey",
            F.try_divide(F.col("o_totalprice"), zero_every_7.cast("double"))
            .alias("safe_div"),
            numlike.try_cast("long").alias("safe_long"),
            F.col("o_totalprice").cast("string").try_cast("decimal(5,2)")
            .alias("overflow_dec"),
        )
        .orderBy("o_orderkey")
    )


_TRY_ARITH_SQL = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 7 = 0 THEN NULL
            ELSE o_totalprice / CAST(o_orderkey % 7 AS DOUBLE) END AS safe_div,
       TRY_CAST(CASE WHEN o_orderkey % 3 = 0
                     THEN CAST(o_orderkey AS VARCHAR)
                     ELSE 'k' || CAST(o_orderkey AS VARCHAR) END
                AS BIGINT) AS safe_long,
       TRY_CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(5,2)) AS overflow_dec
FROM orders
WHERE o_orderkey < 3000
ORDER BY o_orderkey
"""


def func_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The regexp family beyond single extract: ``regexp_count``,
    ``regexp_extract_all`` (array surface — joined/sliced to scalars
    for the driver-hashable contract), and global ``regexp_replace``
    digested via md5 so the full rewritten text is value-checked
    without shipping it. Patterns stay in the character-class subset
    where Java regex (Spark) and RE2 (DuckDB) agree — the docstring is
    the contract: no backrefs, no lookarounds in cross-engine paths.
    DuckDB's ``regexp_replace`` is first-match-only by default; the
    oracle passes the ``'g'`` flag to match Spark's replace-all."""
    d = load(spark, sf_dir, "documents")
    runs = F.regexp_extract_all("text", F.lit(r"[aeiou]+"), 0)
    return (
        d.select("doc_id", "text")
        .withColumn("n_vowel_runs", F.regexp_count("text", F.lit(r"[aeiou]+")))
        .withColumn("first_word", F.regexp_extract("text", r"[a-z]+", 0))
        .withColumn("runs_head", F.array_join(F.slice(runs, 1, 5), ","))
        .withColumn(
            "devoweled_md5", F.md5(F.regexp_replace("text", r"[aeiou]+", "_"))
        )
        .drop("text")
        .orderBy("doc_id")
    )


_FUNC_REGEXP_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[aeiou]+')) AS INTEGER) AS n_vowel_runs,
       regexp_extract(text, '[a-z]+') AS first_word,
       array_to_string(list_slice(regexp_extract_all(text, '[aeiou]+'), 1, 5), ',')
           AS runs_head,
       md5(regexp_replace(text, '[aeiou]+', '_', 'g')) AS devoweled_md5
FROM documents
ORDER BY doc_id
"""


def func_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: ``collate(s, 'UTF8_LCASE')`` makes equality,
    grouping and DISTINCT case-insensitive WITHOUT rewriting values —
    the engine-level answer to the lower()-everywhere idiom. A
    three-way-cased variant of p_type is grouped case-insensitively;
    each group also reports its case-sensitive variant count, and an
    ALL row shows the corpus-level cs-vs-ci distinct gap. Collated
    columns never reach the output schema (they carry a distinct
    Arrow type) — only plain strings and counts do; the oracle
    mirrors with lower()."""
    p = load(spark, sf_dir, "part")
    # first-char-upper built explicitly (NOT initcap: Spark's initcap
    # capitalizes every word, DuckDB has no exact mirror)
    titled = F.concat(
        F.upper(F.substring(F.lower("p_type"), 1, 1)),
        F.expr("substr(lower(p_type), 2)"),
    )
    variant = (
        F.when(F.col("p_partkey") % 3 == 0, F.lower("p_type"))
        .when(F.col("p_partkey") % 3 == 1, F.col("p_type"))
        .otherwise(titled)
    )
    base = p.select(F.col("p_partkey"), variant.alias("s"))
    ci = F.collate(F.col("s"), "UTF8_LCASE")
    per = (
        base.groupBy(F.lower("s").cast("string").alias("type_ci"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("s").alias("n_case_variants"),
        )
    )
    total = base.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.countDistinct("s") - F.countDistinct(ci)).alias("n_case_variants"),
    ).select(F.lit("ALL:cs_minus_ci").alias("type_ci"), "n_rows", "n_case_variants")
    return per.unionByName(total).orderBy("type_ci")


_FUNC_COLLATION_SQL = """
SELECT lower(s) AS type_ci, COUNT(*) AS n_rows,
       COUNT(DISTINCT s) AS n_case_variants
FROM (
    SELECT CASE WHEN p_partkey % 3 = 0 THEN lower(p_type)
                WHEN p_partkey % 3 = 1 THEN p_type
                ELSE concat(upper(substr(lower(p_type), 1, 1)),
                            substr(lower(p_type), 2)) END AS s
    FROM part
)
GROUP BY lower(s)
UNION ALL
SELECT 'ALL:cs_minus_ci' AS type_ci, COUNT(*) AS n_rows,
       COUNT(DISTINCT s) - COUNT(DISTINCT lower(s)) AS n_case_variants
FROM (
    SELECT CASE WHEN p_partkey % 3 = 0 THEN lower(p_type)
                WHEN p_partkey % 3 = 1 THEN p_type
                ELSE concat(upper(substr(lower(p_type), 1, 1)),
                            substr(lower(p_type), 2)) END AS s
    FROM part
)
ORDER BY type_ci
"""


def func_csv_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row CSV codec functions — ``to_csv`` serializes a struct to
    a CSV line, ``from_csv`` parses it back against a DDL schema (the
    row-level cousins of the CSV source/sink: what you reach for when
    a STRING COLUMN carries embedded CSV, e.g. a log field). The
    round-trip re-extracts the original values, so the oracle just
    recomputes them from the source columns — proving the
    serialize→parse loop lossless for the typed subset (ints +
    strings; floats are excluded for the same text-format reason as
    ``source_csv_roundtrip``)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 4000)
    line = F.to_csv(
        F.struct("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    )
    parsed = F.from_csv(
        F.col("csv_line"),
        F.lit("k bigint, c bigint, s string, p string"),
    )
    return (
        o.select("o_orderkey", line.alias("csv_line"))
        .withColumn("parsed", parsed)
        .select(
            "o_orderkey",
            "csv_line",
            F.col("parsed.c").alias("back_custkey"),
            F.col("parsed.s").alias("back_status"),
            F.col("parsed.p").alias("back_priority"),
        )
        .orderBy("o_orderkey")
    )


_FUNC_CSV_SQL = """
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR) || ',' || CAST(o_custkey AS VARCHAR)
           || ',' || o_orderstatus || ',' || o_orderpriority AS csv_line,
       o_custkey AS back_custkey,
       o_orderstatus AS back_status,
       o_orderpriority AS back_priority
FROM orders
WHERE o_orderkey < 4000
ORDER BY o_orderkey
"""


def sql_named_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized ``spark.sql`` (named parameter markers, Spark
    3.4+): values bind as TYPED LITERALS through ``args`` instead of
    string interpolation — the SQL-injection-safe templating surface
    every parameterized report/job runner needs. The markers land in
    the plan as foldable literals, so pushdown/pruning work exactly
    as with hand-written constants."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("pbs_param_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CASE WHEN o_totalprice > :big THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_big
        FROM pbs_param_orders
        WHERE o_orderstatus = :status
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"big": 150000.0, "status": "O"},
    )


_SQL_NAMED_PARAMS_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_big
FROM orders
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``EXECUTE IMMEDIATE`` (Spark 4 dynamic SQL): the query TEXT
    lives in a session variable and executes with positional ``?``
    parameters bound via ``USING`` — the metadata-driven-job surface
    (rule engines, saved reports) where the statement itself is data.
    Completes the parameterized-SQL family: ``sql_named_params`` binds
    into a static statement, ``sql_session_variables`` holds state,
    this one composes both into dynamic execution. Parameters bind as
    typed literals (no string splicing), so constant folding and
    filter pushdown see real constants.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("pbs_exec_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE pbs_exec_q STRING")
    spark.sql(
        """SET VAR pbs_exec_q =
        'SELECT o_orderstatus,
                COUNT(*) AS n_orders,
                CAST(SUM(CASE WHEN o_totalprice > ? THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_above,
                CAST(MIN(FLOOR(o_totalprice)) AS BIGINT) AS min_price_usd
         FROM pbs_exec_orders
         WHERE o_orderpriority <> ?
         GROUP BY o_orderstatus
         ORDER BY o_orderstatus'
        """
    )
    return spark.sql(
        "EXECUTE IMMEDIATE pbs_exec_q USING 200000.0, '5-LOW'"
    )


_SQL_EXECUTE_IMMEDIATE_SQL = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_above,
       CAST(MIN(FLOOR(o_totalprice)) AS BIGINT) AS min_price_usd
FROM orders
WHERE o_orderpriority <> '5-LOW'
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def sql_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL TABLE function (``CREATE FUNCTION ... RETURNS TABLE`` —
    Spark 4 SQL UDFs): a parameterized relational view invoked in the
    FROM clause, the catalog-native way to package a reusable
    filtered/aggregated slice (``sql_udf_create_function`` covers the
    scalar flavor; this is the table flavor — together they are the
    SQL-only UDF surface, no Python involved). The body is inlined
    into the calling plan, so pushdown/pruning see through it; the
    query LATERAL-joins the function against a literal priority list
    — each call parameterized by the joined row.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("pbs_tf_orders")
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION pbs_priority_stats(
               prio STRING)
           RETURNS TABLE (o_orderstatus STRING, n BIGINT, rev BIGINT)
           RETURN SELECT o_orderstatus, COUNT(*),
                         CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT))
                              AS BIGINT)
                  FROM pbs_tf_orders
                  WHERE o_orderpriority = prio
                  GROUP BY o_orderstatus"""
    )
    return spark.sql(
        """SELECT p.prio, t.o_orderstatus, t.n, t.rev
           FROM VALUES ('1-URGENT'), ('5-LOW') AS p(prio),
                LATERAL pbs_priority_stats(p.prio) t
           ORDER BY p.prio, t.o_orderstatus"""
    )


_SQL_TABLE_FUNCTION_SQL = """
SELECT p.prio, o.o_orderstatus AS o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(o.o_totalprice) AS BIGINT)) AS BIGINT) AS rev
FROM (SELECT '1-URGENT' AS prio UNION ALL SELECT '5-LOW') p
JOIN orders o ON o.o_orderpriority = p.prio
GROUP BY p.prio, o.o_orderstatus
ORDER BY p.prio, o.o_orderstatus
"""


def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``IDENTIFIER()`` clause (Spark 4): table and column names
    resolved from session-variable STRINGS without string-spliced SQL
    — the injection-safe half of dynamic SQL that ``EXECUTE
    IMMEDIATE`` composes with (there the STATEMENT is dynamic, here
    only the IDENTIFIERS are, keeping the plan statically analyzable:
    pushdown and pruning still see one fixed query shape).
    The query reads the table name AND the aggregated column name
    from variables — the metadata-driven report pattern.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("pbs_ident_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE pbs_ident_tab STRING")
    spark.sql("DECLARE OR REPLACE VARIABLE pbs_ident_col STRING")
    spark.sql("SET VAR pbs_ident_tab = 'pbs_ident_orders'")
    spark.sql("SET VAR pbs_ident_col = 'o_totalprice'")
    return spark.sql(
        """SELECT o_orderstatus,
                  COUNT(*) AS n,
                  CAST(SUM(CAST(FLOOR(IDENTIFIER(pbs_ident_col))
                                AS BIGINT)) AS BIGINT) AS total_usd
           FROM IDENTIFIER(pbs_ident_tab)
           GROUP BY o_orderstatus
           ORDER BY o_orderstatus"""
    )


_SQL_IDENTIFIER_SQL = """
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS total_usd
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def func_struct_field_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-struct surgery — ``Column.withField`` / ``dropFields``
    (Spark 3.1+): patch one field inside a nested struct WITHOUT
    rebuilding the whole struct expression — the schema-evolution
    idiom for deeply nested event payloads. A struct is assembled,
    one field overwritten, one added, one dropped; the result is
    flattened back to scalars (struct columns stay out of the output
    schema per the driver-hashable contract)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    base = F.struct(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
        F.lit("drop_me").alias("scratch"),
    )
    patched = (
        F.col("s")
        .withField("bal", F.round(F.col("s.bal") * 2, 2))
        .withField("tier", F.when(F.col("s.bal") > 0, "pos").otherwise("nonpos"))
        .dropFields("scratch")
    )
    return (
        c.select("c_custkey", base.alias("s"))
        .withColumn("s2", patched)
        .select(
            "c_custkey",
            F.col("s2.seg").alias("seg"),
            F.col("s2.bal").alias("bal_doubled"),
            F.col("s2.tier").alias("tier"),
        )
        .drop("s", "s2")
        .orderBy("c_custkey")
    )


_FUNC_STRUCT_OPS_SQL = """
SELECT c_custkey,
       c_mktsegment AS seg,
       ROUND(c_acctbal * 2, 2) AS bal_doubled,
       CASE WHEN c_acctbal > 0 THEN 'pos' ELSE 'nonpos' END AS tier
FROM customer
WHERE c_custkey < 300
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# func_base64_transport — binary↔text transport codec
# ---------------------------------------------------------------------------


def func_base64_transport(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 transport codec round trip — the encoding every JSON/
    HTTP boundary applies to binary payloads (and the reason payload
    byte budgets grow 4/3×, pinned here in the exact RFC 4648 length
    arithmetic 4·⌈len/3⌉). Encode→decode must be lossless; hex
    (``hex``/``unhex``) rides along as the debugging-dump codec at
    2× expansion. All JVM string ops in one codegen stage.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    raw = F.encode(F.col("text"), "utf-8")
    # GOTCHA pinned here: Spark's base64() emits MIME-chunked output
    # (CRLF every 76 chars — 4 bytes per ~57 input bytes of silent
    # bloat); strip to canonical RFC 4648 before any length math or
    # cross-system comparison.
    b64 = F.regexp_replace(F.base64(raw), "[\\r\\n]", "")
    return d.select(
        "doc_id",
        F.length(b64).alias("b64_len"),
        F.substring(b64, 1, 16).alias("b64_head"),
        (F.decode(F.unbase64(b64), "utf-8") == F.col("text")).alias("b64_roundtrip_ok"),
        (
            F.decode(F.unhex(F.hex(raw)), "utf-8") == F.col("text")
        ).alias("hex_roundtrip_ok"),
        F.length(F.hex(raw)).alias("hex_len"),
    ).orderBy("doc_id")


_BASE64_SQL = """
SELECT doc_id,
       CAST(4 * CEIL(octet_length(encode(text)) / 3.0) AS INTEGER) AS b64_len,
       substr(to_base64(encode(text)), 1, 16) AS b64_head,
       (decode(from_base64(to_base64(encode(text)))) = text)
           AS b64_roundtrip_ok,
       TRUE AS hex_roundtrip_ok,
       CAST(2 * octet_length(encode(text)) AS INTEGER) AS hex_len
FROM documents
WHERE doc_id < 200
ORDER BY doc_id
"""

# ---------------------------------------------------------------------------
# func_crypto_roundtrip — column-level crypto primitives
# ---------------------------------------------------------------------------

_AES_KEY = "0123456789abcdef"  # 16-byte demo key (AES-128)


def func_crypto_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level crypto surface: content fingerprints (sha256/md5 —
    the provenance hashes a data-lineage system stores) and an
    AES-128-ECB encrypt→decrypt round trip per document. ECB is used
    deliberately: it is the one deterministic mode (GCM salts a random
    IV per call, which would be unhashable across engines — and
    un-reproducible across retried tasks, the same reason a 100 TB
    pipeline must pin deterministic modes for idempotent re-runs).
    DuckDB has no AES, so the oracle pins the ciphertext via its exact
    PKCS#7 arithmetic (16·(⌊len/16⌋+1) bytes) and the round trip via
    the decrypted plaintext equalling the source — both fully
    determined. All JVM-side, one codegen stage, no shuffle.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    key = F.lit(_AES_KEY)
    ct = F.aes_encrypt(F.col("text"), key, F.lit("ECB"))
    rt = F.aes_decrypt(ct, key, F.lit("ECB")).cast("string")
    return d.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
        F.md5(F.col("text")).alias("md5_hex"),
        F.length(ct).alias("cipher_len"),
        (rt == F.col("text")).alias("roundtrip_ok"),
    ).orderBy("doc_id")


_CRYPTO_SQL = """
SELECT doc_id,
       sha256(text) AS sha256_hex,
       md5(text) AS md5_hex,
       CAST(16 * (octet_length(encode(text)) // 16 + 1) AS INTEGER) AS cipher_len,
       TRUE AS roundtrip_ok
FROM documents
WHERE doc_id < 200
ORDER BY doc_id
"""


# ------------------------------------------------- geohash encoding

GH_BITS = 20  # bits per axis → 40-bit cell → 8 base32 chars
GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
GH_SPACE = 100_000  # synthetic coordinate space per axis
GH_PREFIX = 3  # locality rollup granularity


def func_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encoding in pure integer arithmetic — the base32
    Z-order cell id geo systems index on (neighbors share prefixes,
    so a prefix GROUP BY is a spatial rollup and a prefix range scan
    is a bounding-box probe).  Neither engine ships a geohash
    builtin; both get the IDENTICAL construction: quantize each axis
    to {GH_BITS} bits, interleave (even bit positions = x/longitude —
    the published layout), then slice the 40-bit word into eight
    5-bit base32 characters from a shared literal alphabet.  Bit
    extraction is (z div 2^k) mod 2 — no bitwise builtins needed, so
    the expression is portable to ANY SQL engine.

    Points are the deterministic synthetic coords of
    ``join_spatial_grid_radius``.  Output: per {GH_PREFIX}-char
    prefix — point count and the coordinate bounding box, which the
    test checks for the locality guarantee (box diameter bounded by
    the prefix's cell size).  Map-only + one rollup."""
    ev = load(spark, sf_dir, "events").select("event_id")
    px = (F.col("event_id") * 2654435761) % GH_SPACE
    py = (F.col("event_id") * 2246822519 + 12345) % GH_SPACE
    pts = ev.select("event_id", px.alias("px"), py.alias("py")).select(
        "event_id",
        "px",
        "py",
        F.expr(f"(px * {1 << GH_BITS}) div {GH_SPACE}").alias("lx"),
        F.expr(f"(py * {1 << GH_BITS}) div {GH_SPACE}").alias("ly"),
    )
    z = F.lit(0).cast("long")
    for i in range(GH_BITS):  # i = bit index from MSB of each axis
        src_bit = GH_BITS - 1 - i
        z = (
            z
            + F.expr(f"((lx div {1 << src_bit}) % 2) * {1 << (39 - 2 * i)}")
            + F.expr(f"((ly div {1 << src_bit}) % 2) * {1 << (38 - 2 * i)}")
        )
    gh = F.concat(
        *[
            F.expr(
                f"substring('{GH_ALPHABET}', "
                f"cast((z div {32 ** (7 - c)}) % 32 as int) + 1, 1)"
            )
            for c in range(8)
        ]
    )
    hashed = pts.withColumn("z", z).withColumn("gh", gh)
    return (
        hashed.groupBy(F.substring("gh", 1, GH_PREFIX).alias("prefix"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("px").alias("min_px"),
            F.max("px").alias("max_px"),
            F.min("py").alias("min_py"),
            F.max("py").alias("max_py"),
        )
        .orderBy("prefix")
    )


def _geohash_sql() -> str:
    terms = []
    for i in range(GH_BITS):
        src_bit = GH_BITS - 1 - i
        terms.append(
            f"((lx // {1 << src_bit}) % 2) * {1 << (39 - 2 * i)}"
        )
        terms.append(
            f"((ly // {1 << src_bit}) % 2) * {1 << (38 - 2 * i)}"
        )
    z = " + ".join(terms)
    chars = " || ".join(
        f"substr('{GH_ALPHABET}', CAST((z // {32 ** (7 - c)}) % 32 AS INTEGER) + 1, 1)"
        for c in range(8)
    )
    return f"""
WITH pts AS (
    SELECT event_id,
        (event_id * 2654435761) % {GH_SPACE} AS px,
        (event_id * 2246822519 + 12345) % {GH_SPACE} AS py
    FROM events
),
quant AS (
    SELECT event_id, px, py,
        (px * {1 << GH_BITS}) // {GH_SPACE} AS lx,
        (py * {1 << GH_BITS}) // {GH_SPACE} AS ly
    FROM pts
),
zed AS (
    SELECT event_id, px, py, {z} AS z FROM quant
),
hashed AS (
    SELECT event_id, px, py, {chars} AS gh FROM zed
)
SELECT substr(gh, 1, {GH_PREFIX}) AS prefix,
    COUNT(*) AS n_points,
    CAST(MIN(px) AS BIGINT) AS min_px, CAST(MAX(px) AS BIGINT) AS max_px,
    CAST(MIN(py) AS BIGINT) AS min_py, CAST(MAX(py) AS BIGINT) AS max_py
FROM hashed
GROUP BY substr(gh, 1, {GH_PREFIX})
ORDER BY prefix
"""


QUERIES = {
    "sql_execute_immediate": sql_execute_immediate,
    "sql_table_function": sql_table_function,
    "sql_identifier_clause": sql_identifier_clause,
    "func_geohash_encode": func_geohash_encode,
    "func_base64_transport": func_base64_transport,
    "func_crypto_roundtrip": func_crypto_roundtrip,
    "func_csv_struct": func_csv_struct,
    "sql_named_params": sql_named_params,
    "func_struct_field_ops": func_struct_field_ops,
    "func_regexp": func_regexp,
    "func_collation": func_collation,
    "func_try_arith": func_try_arith,
    "func_url": func_url,
    "func_bitwise": func_bitwise,
    "func_json_struct": func_json_struct,
    "func_variant": func_variant,
    "func_map": func_map,
    "func_string": func_string,
    "func_date": func_date,
    "func_math": func_math,
    "func_json": func_json,
    "func_array": func_array,
    "func_conditional": func_conditional,
}

ORACLES = {
    "sql_execute_immediate": _SQL_EXECUTE_IMMEDIATE_SQL,
    "sql_table_function": _SQL_TABLE_FUNCTION_SQL,
    "sql_identifier_clause": _SQL_IDENTIFIER_SQL,
    "func_geohash_encode": _geohash_sql(),
    "func_base64_transport": _BASE64_SQL,
    "func_crypto_roundtrip": _CRYPTO_SQL,
    "func_csv_struct": _FUNC_CSV_SQL,
    "sql_named_params": _SQL_NAMED_PARAMS_SQL,
    "func_struct_field_ops": _FUNC_STRUCT_OPS_SQL,
    "func_regexp": _FUNC_REGEXP_SQL,
    "func_collation": _FUNC_COLLATION_SQL,
    "func_try_arith": _TRY_ARITH_SQL,
    "func_url": _FUNC_URL_SQL,
    "func_bitwise": _BITWISE_SQL,
    "func_json_struct": _FUNC_JSON_STRUCT_SQL,
    "func_variant": _FUNC_VARIANT_SQL,
    "func_map": _FUNC_MAP_SQL,
    "func_string": _FUNC_STRING_SQL,
    "func_date": _FUNC_DATE_SQL,
    "func_math": _FUNC_MATH_SQL,
    "func_json": _FUNC_JSON_SQL,
    "func_array": _FUNC_ARRAY_SQL,
    "func_conditional": _FUNC_CONDITIONAL_SQL,
}
