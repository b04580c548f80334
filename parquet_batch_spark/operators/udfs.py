"""Python UDF surfaces: UDTF (Spark 4), grouped-agg pandas UDF, and
applyInPandas — each Arrow-batched, never row-at-a-time.

The reference has no UDF facility; its consumers iterate rows in plain
Python (reference: README.md:41-45 — the for-loop over ``get_rows``
plays the role of a per-row UDF). That pattern is the single biggest
anti-scale design in the reference: all compute funnels through one
Python interpreter. Here the same extensibility lands on Spark's
vectorized Python surfaces, where user code receives Arrow batches on
executors — the 10-100× faster path the task brief mandates, and the
ONLY Python pattern this engine permits in hot paths.

Numeric policy for the pandas aggregate: quantities carry ≤2 fractional
digits, so the UDF sums them as ×100-scaled int64 (exact, associative;
~3e13 « int64 max even at 6e9 rows) and divides once at the end —
the pandas-side equivalent of functions/numeric.py's decimal policy,
producing the identical correctly-rounded double as the DuckDB oracle's
DECIMAL sum.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from parquet_batch_spark.catalog import load

# NOTE: the @udtf / @pandas_udf decorators parse their DDL return-type
# strings eagerly and need an active SparkContext, so the UDFs are
# created inside the query functions, not at module import.

# ------------------------------------------------------------- UDTF


class _Bigrams:
    """Emit word bigrams per document (lowercased, whitespace-split,
    empty tokens dropped). A table function: one input row → N output
    rows, executed per Arrow batch on executors."""

    def eval(self, doc_id: int, text: str):  # noqa: D102
        if text is None:
            return
        words = [w for w in re.split(r"\s+", text.lower()) if w]
        for a, b in zip(words, words[1:]):
            yield doc_id, f"{a} {b}"


def udtf_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-20 word bigrams via a LATERAL join against the UDTF.
    The explosion is map-side; only (bigram, partial count) pairs cross
    the shuffle — bounded by bigram vocabulary, not corpus size."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("pbs_docs")
    bigram_udtf = udtf(_Bigrams, returnType="doc_id: bigint, bigram: string")
    spark.udtf.register("pbs_bigrams", bigram_udtf)
    return spark.sql(
        """
        SELECT b.bigram, COUNT(*) AS n
        FROM pbs_docs, LATERAL pbs_bigrams(doc_id, text) b
        GROUP BY b.bigram
        ORDER BY n DESC, b.bigram
        LIMIT 20
        """
    )


_BIGRAM_SQL = r"""
WITH w0 AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '\s+')) AS word,
           generate_subscripts(string_split_regex(lower(text), '\s+'), 1) AS i
    FROM documents
), w AS (
    SELECT doc_id, word, i FROM w0 WHERE word <> ''
), b AS (
    SELECT doc_id,
           word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY i) AS bigram
    FROM w
)
SELECT bigram, COUNT(*) AS n
FROM b
WHERE bigram IS NOT NULL
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 20
"""


# ---------------------------------------------- grouped-agg pandas UDF


def _exact_scaled_sum_fn(qty: pd.Series) -> float:
    """Exact sum of a ≤2-dp column: scale to int64, sum, unscale."""
    return float(np.rint(qty.to_numpy() * 100.0).astype(np.int64).sum()) / 100.0


def _count_fn(s: pd.Series) -> int:
    # Series→scalar type hints mark this (like the sum above) as a
    # GROUPED_AGG pandas UDF
    return len(s)


def udaf_pandas_exact_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (Arrow batches → scalar per group):
    exact quantity sums per return flag, matching the decimal oracle
    bit-for-bit via integer arithmetic."""
    exact_scaled_sum = pandas_udf(_exact_scaled_sum_fn, "double")
    # a grouped-agg pandas UDF cannot mix with JVM aggregates in one
    # agg() — the row count rides the same Arrow batch instead
    pandas_count = pandas_udf(_count_fn, "long")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            exact_scaled_sum("l_quantity").alias("sum_qty"),
            pandas_count("l_quantity").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


_UDAF_SQL = """
SELECT l_returnflag,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,6)) AS DOUBLE)
           AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --------------------------------------------------- applyInPandas


_MINMAX_SCHEMA = (
    "l_returnflag string, l_linestatus string, n_rows long, "
    "min_price double, max_price double, min_ship timestamp_ntz, max_ship timestamp_ntz"
)


def _group_minmax(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        [
            {
                "l_returnflag": pdf["l_returnflag"].iloc[0],
                "l_linestatus": pdf["l_linestatus"].iloc[0],
                "n_rows": len(pdf),
                "min_price": pdf["l_extendedprice"].min(),
                "max_price": pdf["l_extendedprice"].max(),
                "min_ship": pdf["l_shipdate"].min(),
                "max_ship": pdf["l_shipdate"].max(),
            }
        ]
    )


def apply_in_pandas_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas: whole-group custom logic (here a per-group
    profile of count/min/max — order-insensitive, so exact). Each
    group arrives as ONE pandas DataFrame; with 6 flag×status groups
    the shuffle is trivial, and group size — not corpus size — bounds
    executor memory."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice", "l_shipdate"
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .applyInPandas(_group_minmax, schema=_MINMAX_SCHEMA)
        .orderBy("l_returnflag", "l_linestatus")
    )


_APPLY_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
       MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ------------------------------------------ arrow-optimized scalar UDF

def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (Spark 4 ``useArrow=True``) —
    the fourth Python-execution surface next to UDTF / grouped-agg
    pandas UDF / applyInPandas: same per-row call signature as a
    classic UDF but Arrow-batched transfer instead of pickled rows
    (~an order of magnitude less serialization overhead; still slower
    than built-ins — hot paths stay JVM, this surface is for logic
    that genuinely needs Python).

    The function is a digit-sum + base-7 checksum of the order key —
    trivially mirrored in SQL, so the whole Python transfer path is
    value-checked end to end.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)

    @F.udf("long", useArrow=True)
    def digit_check(k: int) -> int:
        ds = sum(int(c) for c in str(k))
        return ds * 7 + k % 7

    return (
        o.select(
            "o_orderkey",
            digit_check("o_orderkey").alias("digit_check"),
        )
        .orderBy("o_orderkey")
    )


_ARROW_UDF_SQL = """
SELECT o_orderkey,
       CAST(list_sum(list_transform(
                string_split(CAST(o_orderkey AS VARCHAR), ''),
                c -> CAST(c AS BIGINT))) * 7
            + o_orderkey % 7 AS BIGINT) AS digit_check
FROM orders
WHERE o_orderkey < 5000
ORDER BY o_orderkey
"""


# --------------------------------------------------------- mapInArrow


def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the fifth Python-execution surface, and the
    closest analogue to the reference's own consumption model
    (reference reader.py:93-96 hands consumers Arrow RecordBatches):
    user code receives raw ``pyarrow.RecordBatch`` objects per
    partition, no pandas materialization at all. The batch work here
    is pyarrow.compute kernels only (C++ vectorized — zero per-row
    Python), producing a byte/char length profile and the bytes/4
    BPE-ish token-budget estimate for every document. All three
    derived columns are trivially SQL-mirrorable so the whole Arrow
    round-trip is value-checked."""
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def profile(batches):
        for rb in batches:
            text = rb.column("text")
            chars = pc.cast(pc.utf8_length(text), pa.int64())
            nbytes = pc.cast(pc.binary_length(text), pa.int64())
            tok_est = pc.divide(pc.add(nbytes, 3), 4)  # int floor-div
            yield pa.RecordBatch.from_arrays(
                [rb.column("doc_id"), chars, nbytes, tok_est],
                names=["doc_id", "n_chars", "n_bytes", "tok_est"],
            )

    return docs.mapInArrow(
        profile, schema="doc_id long, n_chars long, n_bytes long, tok_est long"
    ).orderBy("doc_id")


_MAP_IN_ARROW_SQL = """
SELECT doc_id,
       length(text) AS n_chars,
       strlen(text) AS n_bytes,
       (strlen(text) + 3) // 4 AS tok_est
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# udtf_dynamic_schema — Spark 4 polymorphic UDTF (analyze-time schema)
# ---------------------------------------------------------------------------

NGRAM_WIDTH = 3  # literal argument that DRIVES the output schema


def udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4): the output SCHEMA is computed
    at plan time by the class's ``analyze`` method from the literal
    ``n`` argument — ``ngrams(text, 3)`` emits columns (tok_1, tok_2,
    tok_3), ``ngrams(text, 5)`` would emit five, with no code change.
    This is the sixth Python execution surface in the engine (after
    scalar/pandas/grouped-agg/applyInPandas/mapInArrow/UDTF-static) and
    the API that makes table functions reusable across call sites —
    the static-returnType UDTF (``udtf_bigram_topk``) must hardcode
    its shape. Top-10 trigram census; explosion is map-side, only
    (gram, partial count) rows shuffle.
    """
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class NGrams:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            width = int(n.value)
            return AnalyzeResult(
                StructType(
                    [
                        StructField(f"tok_{i + 1}", StringType())
                        for i in range(width)
                    ]
                )
            )

        def eval(self, text: str, n: int):
            words = [w for w in re.split(r"\s+", text.strip()) if w]
            for i in range(len(words) - n + 1):
                yield tuple(words[i : i + n])

    spark.udtf.register("pbs_ngrams", udtf(NGrams))
    load(spark, sf_dir, "documents").createOrReplaceTempView("pbs_docs_ng")
    cols = ", ".join(f"g.tok_{i + 1}" for i in range(NGRAM_WIDTH))
    return spark.sql(
        f"""
        SELECT {cols}, COUNT(*) AS n
        FROM pbs_docs_ng, LATERAL pbs_ngrams(text, {NGRAM_WIDTH}) g
        GROUP BY {cols}
        ORDER BY n DESC, {cols}
        LIMIT 10
        """
    )


_DYN_UDTF_SQL = rf"""
WITH w0 AS (
    SELECT doc_id,
           unnest(string_split_regex(trim(text), '\s+')) AS word,
           generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS i
    FROM documents
),
g AS (
    SELECT word AS tok_1,
           lead(word, 1) OVER (PARTITION BY doc_id ORDER BY i) AS tok_2,
           lead(word, 2) OVER (PARTITION BY doc_id ORDER BY i) AS tok_3
    FROM w0
)
SELECT tok_1, tok_2, tok_3, COUNT(*) AS n
FROM g
WHERE tok_2 IS NOT NULL AND tok_3 IS NOT NULL
GROUP BY tok_1, tok_2, tok_3
ORDER BY n DESC, tok_1, tok_2, tok_3
LIMIT 10
"""


def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped ``applyInArrow`` — the SEVENTH Python surface: the whole
    group arrives as one raw ``pyarrow.Table`` (no pandas conversion
    at all) and pyarrow.compute kernels produce the per-group result.
    The closest grouped analogue to the reference's own Arrow-batch
    consumption model (reference reader.py:47-49 hands batches to the
    consumer the same way). Exact integer arithmetic: quantities are
    ≤4dp, so ×10⁴ scaled int64 sums match the decimal oracle
    bit-for-bit.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def group_stats(t: pa.Table) -> pa.Table:
        scaled = pc.round(pc.multiply(t["l_quantity"], 10_000)).cast(pa.int64())
        return pa.table(
            {
                "l_returnflag": [t["l_returnflag"][0].as_py()],
                "sum_qty": [pc.sum(scaled).as_py() / 10_000.0],
                "n_rows": [t.num_rows],
                "max_qty": [pc.max(t["l_quantity"]).as_py()],
            }
        )

    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_quantity")
        .groupBy("l_returnflag")
        .applyInArrow(
            group_stats,
            "l_returnflag string, sum_qty double, n_rows long, max_qty double",
        )
        .orderBy("l_returnflag")
    )


_APPLY_ARROW_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(ROUND(l_quantity * 10000) AS BIGINT)) AS DOUBLE) / 10000.0
           AS sum_qty,
       COUNT(*) AS n_rows,
       MAX(l_quantity) AS max_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --------------------------------------------- iterator-form pandas UDF


def udf_pandas_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form pandas UDF (``Iterator[pd.Series] → Iterator[
    pd.Series]``) — the eighth Python-execution surface, and the one
    whose POINT is amortized per-partition initialization: the
    function body runs once per partition, does its expensive setup
    (model load, dictionary build — here a deterministic tier table
    standing in for one), then streams Arrow batches through the
    already-initialized state.  The per-batch math is exact integer
    (price cents → tier lookup + checksum), so the whole iterator
    protocol — init, multi-batch streaming, tail batch — is
    value-checked against the SQL mirror.

    Scale: same Arrow transfer as a scalar pandas UDF; the iterator
    form only changes WHERE init cost is paid (once per partition, not
    per batch) — at 1000 executors that is the difference between
    loading a scorer 1000 times and 1e6 times."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)

    @pandas_udf("long")
    def tier_checksum(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # one-time per-partition "model load": tier cut points
        tiers = [0, 5_000_00, 15_000_00, 30_000_00]  # cents
        for prices in batches:
            cents = (prices * 100).round().astype("int64")
            tier = sum((cents >= t).astype("int64") for t in tiers[1:])
            yield tier * 1_000_000_000 + cents % 1_000_000

    return (
        o.select(
            "o_orderkey",
            tier_checksum(F.col("o_totalprice")).alias("tier_checksum"),
        )
        .orderBy("o_orderkey")
    )


_ITER_UDF_SQL = """
SELECT o_orderkey,
    CAST(CASE WHEN ROUND(o_totalprice * 100) >= 3000000 THEN 3
              WHEN ROUND(o_totalprice * 100) >= 1500000 THEN 2
              WHEN ROUND(o_totalprice * 100) >= 500000 THEN 1
              ELSE 0 END AS BIGINT) * 1000000000
        + CAST(ROUND(o_totalprice * 100) AS BIGINT) % 1000000
        AS tier_checksum
FROM orders
WHERE o_orderkey < 5000
ORDER BY o_orderkey
"""


QUERIES = {
    "udf_pandas_scalar_iter": udf_pandas_scalar_iter,
    "udf_apply_in_arrow": udf_apply_in_arrow,
    "udtf_dynamic_schema": udtf_dynamic_schema,
    "udf_map_in_arrow": udf_map_in_arrow,
    "udf_arrow_scalar": udf_arrow_scalar,
    "udtf_bigram_topk": udtf_bigram_topk,
    "udaf_pandas_exact_sum": udaf_pandas_exact_sum,
    "apply_in_pandas_profile": apply_in_pandas_profile,
}

ORACLES = {
    "udf_pandas_scalar_iter": _ITER_UDF_SQL,
    "udf_apply_in_arrow": _APPLY_ARROW_SQL,
    "udtf_dynamic_schema": _DYN_UDTF_SQL,
    "udf_map_in_arrow": _MAP_IN_ARROW_SQL,
    "udf_arrow_scalar": _ARROW_UDF_SQL,
    "udtf_bigram_topk": _BIGRAM_SQL,
    "udaf_pandas_exact_sum": _UDAF_SQL,
    "apply_in_pandas_profile": _APPLY_SQL,
}
