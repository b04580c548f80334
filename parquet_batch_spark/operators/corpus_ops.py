"""Corpus-curation operators beyond the r1–r4 families: composite
quality rules, URL canonicalization dedup, graph triangle census, and
iterative BPE merge training.

The reference is a scan-only Arrow wrapper (reference: src/
parquetreader/reader.py:128-129); these are the remaining stages a web-
scale training-data pipeline runs between "scan" and "train":

- ``quality_gopher_rules``: the published Gopher/Dolma-style repetition
  -free quality rule battery (word-count bounds, mean-word-length
  bounds, alphabetic-word fraction, stopword floor) evaluated in ONE
  corpus pass of pure JVM expressions. Every statistic is exact
  integer arithmetic (micro-units instead of float ratios) so the
  DuckDB oracle is bit-identical.
- ``dedup_url_canonical``: URL canonicalization — the FIRST dedup any
  crawl pipeline applies (cheaper than any content hash): lowercase
  scheme/host, strip ``www.`` and default ports, drop fragments and
  ``utm_*`` tracking params, sort surviving query params. Embarrassingly
  parallel scalar work + one count-per-key shuffle.
- ``graph_triangle_count``: triangle census + global clustering
  coefficient of the segment-sharing graph (the dedup-cluster graph's
  transitivity diagnostic). Edges come from the capped inverted
  segment index — never all-pairs — and the triangle join is two
  equi-joins over the (a<b)-oriented edge list, the standard
  distributed edge-iterator algorithm.
- ``text_bpe_merges``: the first K merge steps of byte-pair-encoding
  tokenizer training over the corpus vocabulary — the iterative
  count→argmax→rewrite loop that produces an LLM tokenizer. Each
  round is a distributed pair count plus a scalar argmax (the same
  driver-scalar convergence pattern as ``dedup_clusters``); the merge
  rewrite is a broadcast literal replace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_batch_spark.catalog import fan_out, load
from parquet_batch_spark.functions.hashing import hash32, sql_hash32
from parquet_batch_spark.functions.text import sql_tokens, tokens_col
from parquet_batch_spark.operators.llm_prep import (
    DEGREE_HOT_CAP,
    SEG_TOKENS,
    SEGMENT_EDGES_CTE,
    segment_edges as _segment_edges,
    segment_incidence as _segment_incidence,
)

# ---------------------------------------------------------------------------
# quality_gopher_rules — composite quality rule battery
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 3_000_000, 10_000_000  # mean word len, micro
GOPHER_MIN_ALPHA = 800_000  # ≥80% of words contain an alphabetic char
GOPHER_MIN_STOP = 2  # ≥2 stopword occurrences
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in", "be", "that")


def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rule battery, one corpus pass.

    Per document: word count within bounds, mean word length within
    bounds, ≥80% words alphabetic, ≥{GOPHER_MIN_STOP} stopword hits.
    Ratios are exact integers in micro-units (floor(1e6·x)) — the
    IEEE-division floor is exact here because the true quotient's
    distance from any integer (≥ 1/word_count) dwarfs a double ulp.
    Output: per (lang, source) cohort, docs / survivors / per-rule
    failure counts — the report a curation run publishes.

    Scale: pure JVM expressions inside one whole-stage-codegen pass,
    then a cohort-grain aggregate. No Python, no second scan, no
    shuffle before reduction.
    """
    d = load(spark, sf_dir, "documents")
    toks = tokens_col("text")
    n_words = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, F.length),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    mwl_micro = F.floor(F.lit(1000000.0) * sum_len / n_words)
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    alpha_micro = F.floor(F.lit(1000000.0) * n_alpha / n_words)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*GOPHER_STOPWORDS)))
    flagged = d.select(
        "lang",
        "source",
        n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS).alias("ok_words"),
        mwl_micro.between(GOPHER_MIN_MWL, GOPHER_MAX_MWL).alias("ok_mwl"),
        (alpha_micro >= GOPHER_MIN_ALPHA).alias("ok_alpha"),
        (n_stop >= GOPHER_MIN_STOP).alias("ok_stop"),
    )
    as_fail = lambda c: F.sum(F.when(F.col(c), 0).otherwise(1)).cast("long")  # noqa: E731
    return (
        flagged.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(
                    F.col("ok_words")
                    & F.col("ok_mwl")
                    & F.col("ok_alpha")
                    & F.col("ok_stop"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_pass"),
            as_fail("ok_words").alias("fail_words"),
            as_fail("ok_mwl").alias("fail_mwl"),
            as_fail("ok_alpha").alias("fail_alpha"),
            as_fail("ok_stop").alias("fail_stop"),
        )
        .orderBy("lang", "source")
    )


_STOP_SQL = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)

_GOPHER_SQL = f"""
WITH per_doc AS (
    SELECT lang, source,
           len(tk) AS n_words,
           CAST(FLOOR(1000000.0 * CAST(list_sum(list_transform(tk, t -> len(t))) AS BIGINT) / len(tk)) AS BIGINT) AS mwl_micro,
           CAST(FLOOR(1000000.0 * len(list_filter(tk, t -> regexp_matches(t, '[a-z]'))) / len(tk)) AS BIGINT) AS alpha_micro,
           len(list_filter(tk, t -> t IN ({_STOP_SQL}))) AS n_stop
    FROM (SELECT lang, source, {sql_tokens("text")} AS tk FROM documents)
),
flags AS (
    SELECT lang, source,
           (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}) AS ok_words,
           (mwl_micro BETWEEN {GOPHER_MIN_MWL} AND {GOPHER_MAX_MWL}) AS ok_mwl,
           (alpha_micro >= {GOPHER_MIN_ALPHA}) AS ok_alpha,
           (n_stop >= {GOPHER_MIN_STOP}) AS ok_stop
    FROM per_doc
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN ok_words AND ok_mwl AND ok_alpha AND ok_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN ok_words THEN 0 ELSE 1 END) AS BIGINT) AS fail_words,
       CAST(SUM(CASE WHEN ok_mwl THEN 0 ELSE 1 END) AS BIGINT) AS fail_mwl,
       CAST(SUM(CASE WHEN ok_alpha THEN 0 ELSE 1 END) AS BIGINT) AS fail_alpha,
       CAST(SUM(CASE WHEN ok_stop THEN 0 ELSE 1 END) AS BIGINT) AS fail_stop
FROM flags
GROUP BY lang, source
ORDER BY lang, source
"""

# ---------------------------------------------------------------------------
# dedup_url_canonical — URL canonicalization dedup
# ---------------------------------------------------------------------------

# Deterministic messy-URL synthesis from doc columns (the testdata has
# no URL column; the synthesis expression is IDENTICAL in both engines,
# so the canonicalizer — the operator under test — is fully oracle-
# checked on realistic variation: case, www., default port, tracking
# params, param order, fragments).
_URL_RE = r"^([A-Za-z]+)://([^/]+)(/[^?]*)\?([^#]*)(#.*)?$"


def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize synthesized crawl URLs and dedup by canonical form.

    Canonical form: lowercase scheme+host, strip leading ``www.`` and
    default ``:443`` port, drop the fragment, drop ``utm_*`` tracking
    params, sort the surviving query params. Variants of the same
    logical resource then collapse; output is one row per canonical
    URL with the variant count and the crawl-winner (min doc_id).

    Scale: canonicalization is per-row JVM string/array work in one
    codegen stage; the dedup is a single count-per-key shuffle on the
    canonical hash — identical topology to ``dedup_exact``.
    """
    d = load(spark, sf_dir, "documents")
    scheme = F.when(F.col("doc_id") % 2 == 0, "HTTPS://").otherwise("https://")
    host = F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("WWW."))
        .when(F.col("doc_id") % 3 == 1, F.lit(""))
        .otherwise(F.lit("www.")),
        F.when(F.col("doc_id") % 2 == 0, F.upper("source")).otherwise(F.col("source")),
        F.lit(".Example.COM"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
    )
    path = F.concat(F.lit("/docs/"), (F.col("doc_id") % 40).cast("string"))
    rid = (F.col("doc_id") % 40).cast("string")
    query = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("id="), rid, F.lit("&utm_campaign=promo&ref="), F.col("lang")),
    ).otherwise(F.concat(F.lit("ref="), F.col("lang"), F.lit("&id="), rid))
    frag = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(F.lit("#sec"), (F.col("doc_id") % 3).cast("string")),
    ).otherwise(F.lit(""))
    url = F.concat(scheme, host, path, F.lit("?"), query, frag)

    g = lambda i: F.regexp_extract(url, _URL_RE, i)  # noqa: E731
    chost = F.regexp_replace(
        F.regexp_replace(F.lower(g(2)), "^www\\.", ""), ":443$", ""
    )
    params = F.array_sort(
        F.filter(F.split(g(4), "&"), lambda p: ~p.rlike("^utm_"))
    )
    canon = F.concat(
        F.lit("https://"),
        chost,
        g(3),
        F.when(F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))).otherwise(
            F.lit("")
        ),
    )
    return (
        d.select(canon.alias("canonical_url"), "doc_id")
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .orderBy("canonical_url")
    )


_URL_SQL = rf"""
WITH raw AS (
    SELECT doc_id,
           (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END)
           || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.'
                    WHEN doc_id % 3 = 1 THEN '' ELSE 'www.' END)
           || (CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END)
           || '.Example.COM'
           || (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END)
           || '/docs/' || CAST(doc_id % 40 AS VARCHAR)
           || '?'
           || (CASE WHEN doc_id % 2 = 0
                THEN 'id=' || CAST(doc_id % 40 AS VARCHAR) || '&utm_campaign=promo&ref=' || lang
                ELSE 'ref=' || lang || '&id=' || CAST(doc_id % 40 AS VARCHAR) END)
           || (CASE WHEN doc_id % 5 = 0 THEN '#sec' || CAST(doc_id % 3 AS VARCHAR) ELSE '' END)
           AS url
    FROM documents
),
parts AS (
    SELECT doc_id,
           regexp_replace(regexp_replace(
               lower(regexp_extract(url, '{_URL_RE}', 2)), '^www\.', ''), ':443$', '')
               AS chost,
           regexp_extract(url, '{_URL_RE}', 3) AS cpath,
           list_sort(list_filter(string_split(regexp_extract(url, '{_URL_RE}', 4), '&'),
                     p -> NOT regexp_matches(p, '^utm_'))) AS params
    FROM raw
),
canon AS (
    SELECT doc_id,
           'https://' || chost || cpath
           || (CASE WHEN len(params) > 0
               THEN '?' || array_to_string(params, '&') ELSE '' END)
           AS canonical_url
    FROM parts
)
SELECT canonical_url,
       COUNT(*) AS n_variants,
       MIN(doc_id) AS keep_doc_id
FROM canon
GROUP BY canonical_url
ORDER BY canonical_url
"""

# ---------------------------------------------------------------------------
# graph_triangle_count — triangle census of the segment-sharing graph
# ---------------------------------------------------------------------------


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census + global clustering coefficient.

    Triangles are counted on the (a<b)-oriented unique edge list with
    two equi-joins — e(a,b) ⋈ e(b,c) ⋈ e(a,c) with a<b<c counts each
    triangle exactly once (the distributed edge-iterator algorithm);
    wedges come from the degree table. The clustering coefficient is
    emitted in exact integer micro-units. Scale: the hot-segment cap
    bounds per-bucket edge fan-out, each join is a hash equi-join on a
    vertex id, and no adjacency list is ever collected into one task.
    """
    e = _segment_edges(spark, sf_dir)
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    wedges = deg.agg(
        F.sum(F.floor(F.col("deg") * (F.col("deg") - 1) / 2)).alias("w"),
        F.count(F.lit(1)).alias("nv"),
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"]).agg(F.count(F.lit(1)).alias("t"))
    edges_n = e.agg(F.count(F.lit(1)).alias("ne"))
    return (
        wedges.crossJoin(tri)
        .crossJoin(edges_n)
        .select(
            F.col("nv").alias("n_vertices"),
            F.col("ne").alias("n_edges"),
            F.col("w").cast("long").alias("n_wedges"),
            F.col("t").alias("n_triangles"),
            F.when(F.col("w") > 0, F.floor(F.lit(3000000.0) * F.col("t") / F.col("w")))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("gcc_micro"),
        )
    )


_TRIANGLE_SQL = f"""
WITH {SEGMENT_EDGES_CTE},
deg AS (
    SELECT v, COUNT(*) AS deg
    FROM (SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges)
    GROUP BY v
),
wedges AS (
    SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS w, COUNT(*) AS nv FROM deg
),
tri AS (
    SELECT COUNT(*) AS t
    FROM edges e1
    JOIN edges e2 ON e2.a = e1.b
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
en AS (SELECT COUNT(*) AS ne FROM edges)
SELECT nv AS n_vertices, ne AS n_edges, w AS n_wedges, t AS n_triangles,
       CAST(CASE WHEN w > 0 THEN FLOOR(3000000.0 * t / w) ELSE 0 END AS BIGINT)
           AS gcc_micro
FROM wedges, tri, en
"""

# ---------------------------------------------------------------------------
# dedup_cross_source_matrix — who copies whom
# ---------------------------------------------------------------------------


def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: segment-sharing edges rolled up
    by (source_a, source_b) — the "who copies whom" report that tells
    a crawl team which feeds mirror each other (high off-diagonal
    mass) vs which self-duplicate (diagonal). Edges come from the
    standard capped segment index; the doc→source map is a broadcast
    dimension join; sources are ordered within the pair so each
    unordered source pair appears once. Output: source pair, shared-
    edge count, distinct docs involved.
    """
    e = _segment_edges(spark, sf_dir)
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    labeled = (
        e.join(
            F.broadcast(src.select(F.col("doc_id").alias("a"), F.col("source").alias("sa"))),
            "a",
        )
        .join(
            F.broadcast(src.select(F.col("doc_id").alias("b"), F.col("source").alias("sb"))),
            "b",
        )
        .select(
            F.least("sa", "sb").alias("source_x"),
            F.greatest("sa", "sb").alias("source_y"),
            "a",
            "b",
        )
    )
    return (
        labeled.groupBy("source_x", "source_y")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.size(
                F.array_distinct(F.flatten(F.collect_list(F.array("a", "b"))))
            )
            .cast("long")
            .alias("n_docs"),
        )
        .orderBy("source_x", "source_y")
    )


_CROSS_SOURCE_SQL = f"""
WITH {SEGMENT_EDGES_CTE},
labeled AS (
    SELECT LEAST(da.source, db.source) AS source_x,
           GREATEST(da.source, db.source) AS source_y,
           e.a, e.b
    FROM edges e
    JOIN documents da ON e.a = da.doc_id
    JOIN documents db ON e.b = db.doc_id
)
SELECT source_x, source_y,
       COUNT(*) AS n_edges,
       CAST(len(list_distinct(flatten(list(ARRAY[a, b])))) AS BIGINT) AS n_docs
FROM labeled
GROUP BY source_x, source_y
ORDER BY source_x, source_y
"""

# ---------------------------------------------------------------------------
# graph_community_labels — synchronous label propagation
# ---------------------------------------------------------------------------

LPA_ITERS = 3  # fixed synchronous rounds (unrolled in the oracle)


def graph_community_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation over the
    segment-sharing graph: every vertex starts with its own id as
    label; each round it adopts the MAJORITY label among its neighbors
    (ties → smallest label — a total order, so the rounds are fully
    deterministic and the DuckDB oracle unrolls them exactly).
    {LPA_ITERS} fixed rounds — LPA's standard near-convergence budget;
    a fixed budget also keeps the oracle expressible.

    Unlike ``dedup_clusters`` (connected components = reachability),
    LPA yields DENSITY communities: a chain of weak links does not
    merge two dense groups. Scale: each round is one equi-join
    (adjacency ⋈ labels on the neighbor id) + one count aggregate +
    one per-vertex argmax window — all hash-partitioned by vertex id;
    ``localCheckpoint`` flattens the iterative lineage exactly as in
    ``dedup_clusters``.
    """
    e = _segment_edges(spark, sf_dir).localCheckpoint(eager=False)
    adj = e.select(F.col("a").alias("v"), F.col("b").alias("u")).unionAll(
        e.select(F.col("b").alias("v"), F.col("a").alias("u"))
    )
    labels = adj.select("v").distinct().select("v", F.col("v").alias("lbl"))
    from pyspark.sql import Window as W

    for _ in range(LPA_ITERS):
        nb = adj.join(
            labels.select(F.col("v").alias("u"), "lbl"), "u"
        ).select("v", "lbl")
        counts = nb.groupBy("v", "lbl").agg(F.count(F.lit(1)).alias("cnt"))
        rn = F.row_number().over(
            W.partitionBy("v").orderBy(F.desc("cnt"), F.asc("lbl"))
        )
        labels = (
            counts.withColumn("rn", rn).filter(F.col("rn") == 1).select("v", "lbl")
        )
    return (
        labels.groupBy(F.col("lbl").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("v").alias("member_min"),
            F.max("v").alias("member_max"),
        )
        .orderBy("community")
    )


def _lpa_sql() -> str:
    edges_cte = f"""{SEGMENT_EDGES_CTE},
adj AS (
    SELECT a AS v, b AS u FROM edges UNION ALL SELECT b AS v, a AS u FROM edges
),
l0 AS (
    SELECT DISTINCT v, v AS lbl FROM adj
)"""
    parts = [edges_cte]
    for k in range(1, LPA_ITERS + 1):
        parts.append(f"""
c{k} AS (
    SELECT adj.v, l.lbl, COUNT(*) AS cnt
    FROM adj JOIN l{k - 1} l ON l.v = adj.u
    GROUP BY adj.v, l.lbl
),
l{k} AS (
    SELECT v, lbl FROM (
        SELECT v, lbl,
               ROW_NUMBER() OVER (PARTITION BY v ORDER BY cnt DESC, lbl ASC) AS rn
        FROM c{k}
    ) WHERE rn = 1
)""")
    return (
        "WITH " + ",".join(parts) + f"""
SELECT lbl AS community, COUNT(*) AS n_members,
       MIN(v) AS member_min, MAX(v) AS member_max
FROM l{LPA_ITERS}
GROUP BY community
ORDER BY community
"""
    )


# ---------------------------------------------------------------------------
# text_bpe_merges — first K BPE tokenizer merge steps
# ---------------------------------------------------------------------------

BPE_VOCAB_WORDS = 50  # train over the K most frequent corpus words
BPE_MERGES = 4  # merge iterations emitted
_EOW = "</w>"  # end-of-word marker token


def _bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, cnt, rep): top-{BPE_VOCAB_WORDS} corpus words with their
    frequencies and the space-delimited char+EOW representation
    (' h i </w> ') BPE training operates on."""
    d = fan_out(load(spark, sf_dir, "documents"), spark, "doc_id")
    words = (
        d.select(F.explode(tokens_col("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(BPE_VOCAB_WORDS)
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    rep = F.concat(
        F.lit(" "), F.array_join(chars, " "), F.lit(" " + _EOW + " ")
    )
    return words.select("word", "cnt", rep.alias("rep"))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    tk = F.split(F.trim(F.col("rep")), " ")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(tk) - 1),
        lambda i: F.struct(
            F.element_at(tk, i).alias("lhs"),
            F.element_at(tk, i + F.lit(1)).alias("rhs"),
        ),
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("cnt").alias("pair_count"))
    )


def _apply_merge(vocab: DataFrame, lhs: str, rhs: str) -> DataFrame:
    pat = F.lit(f" {lhs} {rhs} ")
    sub = F.lit(f" {lhs}{rhs} ")
    rep = F.col("rep")
    # Replace to fixpoint: consecutive matches share their boundary
    # space, so one left-to-right pass can miss alternating
    # occurrences ('ababab'); three passes settle any ≤16-token word.
    for _ in range(3):
        rep = F.replace(rep, pat, sub)
    return vocab.select("word", "cnt", rep.alias("rep"))


def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First {BPE_MERGES} BPE tokenizer merge steps over the corpus.

    Classic byte-pair-encoding training: count adjacent token pairs
    weighted by word frequency, merge the most frequent pair (ties:
    lexicographic), rewrite, repeat. Output: one row per merge rank
    with the pair and its weighted count — the head of the merges.txt
    a tokenizer ships.

    The pair count is a distributed aggregate; only the ARGMAX (3
    scalars) returns to the driver each round — the same bounded
    driver-scalar loop as ``dedup_clusters``'s convergence probe. The
    merge rewrite is a literal broadcast into the next round's plan.
    Merge application is defined as left-to-right non-overlapping
    replacement iterated to fixpoint (≤3 passes), identically in both
    engines.

    r12: the vocab (≤{BPE_VOCAB_WORDS} rows — bounded) is
    localCheckpoint'd once after the corpus reduce and again after
    every merge rewrite, so round k's argmax no longer replays the
    corpus word count plus k chained rewrites (the loop was quadratic
    in plan work); the output rows are assembled from the argmax
    scalars ALREADY collected per round instead of a union of
    subtrees that re-derived every round's pair count at
    materialization time.
    """
    vocab = _bpe_vocab(spark, sf_dir).localCheckpoint(eager=False)
    out_rows: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, BPE_MERGES + 1):
        pc = _pair_counts(vocab)
        top = pc.orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs")).limit(1)
        row = top.collect()[0]
        out_rows.append(
            (
                rank,
                row["lhs"],
                row["rhs"],
                row["lhs"] + row["rhs"],
                int(row["pair_count"]),
            )
        )
        vocab = _apply_merge(vocab, row["lhs"], row["rhs"]).localCheckpoint(
            eager=False
        )
    return spark.createDataFrame(
        out_rows,
        "merge_rank int, lhs string, rhs string, merged string, pair_count bigint",
    ).orderBy("merge_rank")


def _bpe_sql() -> str:
    """Oracle: the same {BPE_MERGES}-round loop unrolled as chained
    CTEs; each round's argmax is a 1-row CTE cross-joined into the
    next rewrite."""
    vocab = f"""
w0 AS (
    SELECT word, cnt,
           ' ' || array_to_string(list_transform(
               generate_series(1, len(word)), i -> word[i]), ' ')
           || ' {_EOW} ' AS rep
    FROM (
        SELECT word, COUNT(*) AS cnt
        FROM (SELECT UNNEST({sql_tokens("text")}) AS word FROM documents)
        GROUP BY word
        ORDER BY cnt DESC, word ASC
        LIMIT {BPE_VOCAB_WORDS}
    )
)"""
    parts = [vocab]
    for k in range(1, BPE_MERGES + 1):
        prev = f"w{k - 1}"
        parts.append(f"""
p{k} AS (
    SELECT tk[i] AS lhs, tk[i+1] AS rhs, CAST(SUM(cnt) AS BIGINT) AS pair_count
    FROM (SELECT string_split(trim(rep), ' ') AS tk, cnt FROM {prev}),
         UNNEST(range(1, len(tk))) AS t(i)
    GROUP BY lhs, rhs
),
m{k} AS (
    SELECT lhs, rhs, pair_count FROM p{k}
    ORDER BY pair_count DESC, lhs ASC, rhs ASC LIMIT 1
),
w{k} AS (
    SELECT word, cnt,
           replace(replace(replace(rep,
               ' ' || m.lhs || ' ' || m.rhs || ' ', ' ' || m.lhs || m.rhs || ' '),
               ' ' || m.lhs || ' ' || m.rhs || ' ', ' ' || m.lhs || m.rhs || ' '),
               ' ' || m.lhs || ' ' || m.rhs || ' ', ' ' || m.lhs || m.rhs || ' ')
           AS rep
    FROM {prev}, m{k} m
)""")
    selects = " UNION ALL ".join(
        f"SELECT {k} AS merge_rank, lhs, rhs, lhs || rhs AS merged, pair_count FROM m{k}"
        for k in range(1, BPE_MERGES + 1)
    )
    return "WITH " + ",".join(parts) + f"\n{selects}\nORDER BY merge_rank"


# -------------------------------------------------- Adamic-Adar scoring

AA_SCALE = 1_000_000  # per-segment term quantization


def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link scoring on the segment-sharing graph: for each
    candidate doc pair, Σ over shared segments of 1/ln(df) — rare
    shared segments count for much more than common ones.  The
    link-prediction refinement of plain co-occurrence counting: use it
    to rank dedup/merge candidates before expensive exact comparison.

    Same capped inverted-index topology as the rest of the graph
    family (segments in > {DEGREE_HOT_CAP} docs generate no pairs, so
    no quadratic key).  The float-sum trap is dodged by design: each
    segment's 1/ln(df) term is quantized ONCE to integer micro-units
    from its exact integer df, and the per-pair score is an integer
    SUM — associative, AQE-reorder-proof, bit-identical to the
    oracle."""
    cold = _segment_incidence(spark, sf_dir)
    dfh = (
        cold.groupBy("seg_h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 2)
    )
    terms = dfh.select(
        "seg_h",
        F.round(F.lit(float(AA_SCALE)) / F.log(F.col("df").cast("double")))
        .cast("long")
        .alias("term_micro"),
    )
    inc = cold.join(terms, "seg_h")
    pairs = inc.join(
        cold.select(F.col("seg_h").alias("h2"), F.col("doc_id").alias("doc_b")),
        (F.col("seg_h") == F.col("h2")) & (F.col("doc_id") < F.col("doc_b")),
    )
    return (
        pairs.groupBy(F.col("doc_id").alias("a"), F.col("doc_b").alias("b"))
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.sum("term_micro").cast("long").alias("aa_micro"),
        )
        .orderBy("a", "b")
    )


_AA_SQL = f"""
WITH {SEGMENT_EDGES_CTE},
dfh AS (
    SELECT seg_h, COUNT(*) AS df FROM cold GROUP BY seg_h HAVING COUNT(*) >= 2
),
terms AS (
    SELECT seg_h,
        CAST(ROUND({AA_SCALE}.0 / LN(CAST(df AS DOUBLE))) AS BIGINT) AS term_micro
    FROM dfh
),
pairs AS (
    SELECT s1.doc_id AS a, s2.doc_id AS b, t.term_micro
    FROM cold s1
    JOIN cold s2 ON s1.seg_h = s2.seg_h AND s1.doc_id < s2.doc_id
    JOIN terms t ON t.seg_h = s1.seg_h
)
SELECT a, b, COUNT(*) AS n_shared, CAST(SUM(term_micro) AS BIGINT) AS aa_micro
FROM pairs GROUP BY a, b ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# graph_kcore — bounded-round k-core peeling of the segment-sharing graph
# ---------------------------------------------------------------------------

KCORE_K = 3  # core order: keep nodes with ≥ K surviving neighbors
KCORE_ROUNDS = 8  # fixed peeling budget (keeps the oracle unrollable)


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core extraction ({KCORE_K}-core) of the segment-sharing doc
    graph by synchronous peeling: each round drops every vertex whose
    degree *within the surviving subgraph* is < {KCORE_K}.  The k-core
    is the standard "dense nucleus" screen on a dedup-cluster graph —
    boilerplate/template families survive peeling while chains of
    incidental overlaps do not (contrast: ``dedup_clusters`` keeps any
    reachable blob, ``graph_community_labels`` needs density only
    locally).

    Fixed {KCORE_ROUNDS}-round budget: both engines run the identical
    synchronous schedule, so results are bit-equal whether or not the
    peel has reached its fixpoint (a fixed budget yields a superset of
    the true core; at the tested SFs it converges).  At 100 TB you run
    the same plan to fixpoint with a driver-side stability probe, as
    ``dedup_clusters`` does.

    Scale: each round is two hash equi-joins of the edge list against
    the shrinking vertex set (both sides partitioned by id — no
    broadcast needed, no all-pairs anywhere; edges come from the
    df-capped inverted segment index) plus one partial-aggregated
    degree count.  ``localCheckpoint`` flattens the 8-round lineage.
    Output: surviving vertices with their in-core degree."""
    e = _segment_edges(spark, sf_dir).localCheckpoint(eager=False)
    adj = e.select(F.col("a").alias("v"), F.col("b").alias("u")).unionAll(
        e.select(F.col("b").alias("v"), F.col("a").alias("u"))
    )
    nodes = adj.select("v").distinct()
    for i in range(KCORE_ROUNDS):
        surv = adj.join(nodes, "v").join(
            nodes.select(F.col("v").alias("u")), "u"
        )
        nodes = (
            surv.groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= KCORE_K)
            .select("v")
        )
        # checkpoint every OTHER round: measured best trade between
        # per-round job overhead (every round: 3.5s) and plan-depth
        # analysis blowup (never: 8.3s) at sf0.1 — 3.1s
        if i % 2 == 1:
            nodes = nodes.localCheckpoint(eager=False)
    final = (
        adj.join(nodes, "v")
        .join(nodes.select(F.col("v").alias("u")), "u")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return final.select(
        F.col("v").alias("doc_id"),
        F.col("deg").cast("long").alias("kcore_degree"),
    ).orderBy("doc_id")


def _kcore_sql() -> str:
    # AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs at
    # every reference, and each round references the previous node set
    # twice — un-materialized, the segment pipeline would re-expand
    # ~2^ROUNDS times and the query never finishes.
    parts = [
        f"""{SEGMENT_EDGES_CTE},
adj AS MATERIALIZED (
    SELECT a AS v, b AS u FROM edges UNION ALL SELECT b AS v, a AS u FROM edges
),
n0 AS MATERIALIZED (
    SELECT DISTINCT v FROM adj
)"""
    ]
    for k in range(1, KCORE_ROUNDS + 1):
        parts.append(f"""
n{k} AS MATERIALIZED (
    SELECT v FROM (
        SELECT adj.v, COUNT(*) AS deg
        FROM adj
        JOIN n{k - 1} x ON adj.v = x.v
        JOIN n{k - 1} y ON adj.u = y.v
        GROUP BY adj.v
    ) WHERE deg >= {KCORE_K}
)""")
    r = KCORE_ROUNDS
    return (
        "WITH " + ",".join(parts) + f"""
SELECT adj.v AS doc_id, CAST(COUNT(*) AS BIGINT) AS kcore_degree
FROM adj
JOIN n{r} x ON adj.v = x.v
JOIN n{r} y ON adj.u = y.v
GROUP BY adj.v
ORDER BY doc_id
"""
    )


# ---------------------------------------------------------------------------
# graph_neighborhood_jaccard — structural-equivalence similarity
# ---------------------------------------------------------------------------

WEDGE_CAP = 64  # centers with more neighbors don't generate wedges
NJ_MIN_MICRO = 200_000  # report pairs with neighborhood Jaccard ≥ 0.2


def graph_neighborhood_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural-equivalence scores on the segment-sharing graph:
    J(N(a), N(b)) over doc pairs that share at least one neighbor —
    "two docs whose *overlap partners* coincide", which catches
    template siblings that never directly share a segment (the
    role-similarity complement to ``graph_adamic_adar``'s direct-link
    scores).

    Candidate pairs come from a wedge join (a←w→b) through each
    shared neighbor w, so |N∩| is just the wedge count per pair.
    Scale: centers with degree > {WEDGE_CAP} are excluded from wedge
    generation AND from the neighborhoods being compared (one
    consistent filtered graph), so per-center fan-out is ≤
    {WEDGE_CAP}² at any corpus size — the same hot-key cap discipline
    as the dedup inverted indexes.  Jaccard is exact integer
    micro-units; only pairs ≥ {NJ_MIN_MICRO} µ survive."""
    e = _segment_edges(spark, sf_dir).localCheckpoint(eager=False)
    adj = e.select(F.col("a").alias("v"), F.col("b").alias("u")).unionAll(
        e.select(F.col("b").alias("v"), F.col("a").alias("u"))
    )
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    cold = deg.filter(F.col("d") <= WEDGE_CAP).select("v")
    # adjacency restricted to cold CENTERS: center side is `v` below
    fadj = adj.join(cold.select(F.col("v").alias("u")), "u")
    fdeg = fadj.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    wedges = (
        fadj.select(F.col("u").alias("w"), F.col("v").alias("a"))
        .join(
            fadj.select(F.col("u").alias("w"), F.col("v").alias("b")),
            "w",
        )
        .filter(F.col("a") < F.col("b"))
    )
    inter = wedges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("inter"))
    da = fdeg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = fdeg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    return (
        inter.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "inter",
            "da",
            "db",
            F.expr("(1000000 * inter) div (da + db - inter)").alias(
                "jaccard_micro"
            ),
        )
        .filter(F.col("jaccard_micro") >= NJ_MIN_MICRO)
        .orderBy("a", "b")
    )


_NJ_SQL = f"""
WITH {SEGMENT_EDGES_CTE},
adj AS MATERIALIZED (
    SELECT a AS v, b AS u FROM edges UNION ALL SELECT b AS v, a AS u FROM edges
),
deg AS (
    SELECT v, COUNT(*) AS d FROM adj GROUP BY v
),
okv AS (
    SELECT v FROM deg WHERE d <= {WEDGE_CAP}
),
fadj AS MATERIALIZED (
    SELECT adj.v, adj.u FROM adj JOIN okv c ON adj.u = c.v
),
fdeg AS (
    SELECT v, COUNT(*) AS d FROM fadj GROUP BY v
),
inter AS (
    SELECT x.v AS a, y.v AS b, COUNT(*) AS inter
    FROM fadj x JOIN fadj y ON x.u = y.u AND x.v < y.v
    GROUP BY x.v, y.v
)
SELECT i.a, i.b, CAST(i.inter AS BIGINT) AS inter,
    CAST(dx.d AS BIGINT) AS da, CAST(dy.d AS BIGINT) AS db,
    (1000000 * CAST(i.inter AS BIGINT))
        // (CAST(dx.d AS BIGINT) + CAST(dy.d AS BIGINT)
            - CAST(i.inter AS BIGINT)) AS jaccard_micro
FROM inter i
JOIN fdeg dx ON i.a = dx.v
JOIN fdeg dy ON i.b = dy.v
WHERE (1000000 * CAST(i.inter AS BIGINT))
        // (CAST(dx.d AS BIGINT) + CAST(dy.d AS BIGINT)
            - CAST(i.inter AS BIGINT)) >= {NJ_MIN_MICRO}
ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# graph_clustering_coefficient — per-node local CC distribution
# ---------------------------------------------------------------------------


def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL clustering coefficient distribution — the per-node
    counterpart of ``graph_triangle_count``'s single global ratio:
    cc(v) = 2·t_v / deg_v(deg_v−1) tells whether v's neighborhood is
    a clique (template family — safe to collapse) or a star
    (incidental hub — collapsing loses documents). Reported as a
    decile histogram + per-decile mean (scale-free output: the node
    table never leaves the cluster) plus the Watts–Strogatz mean in
    the micro columns.

    Per-node triangle credits come from the SAME oriented 3-join as
    the global census (each triangle credits its three corners via a
    3-way union — no adjacency list materialization); cc is exact
    integer micro-units.

    Scale: capped segment-edge fan-out bounds the joins; the
    histogram is a 10-row reduce of the node table.
    """
    e = _segment_edges(spark, sf_dir).localCheckpoint(eager=False)
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tris = e1.join(e2, "y").join(e3, ["x", "z"])
    credits = (
        tris.select(F.col("x").alias("v"))
        .unionAll(tris.select(F.col("y").alias("v")))
        .unionAll(tris.select(F.col("z").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    nodes = (
        deg.join(credits, "v", "left")
        .select(
            "v",
            "deg",
            F.coalesce("t", F.lit(0)).alias("t"),
        )
        .where(F.col("deg") >= 2)
        .select(
            "v",
            # t and deg² are hub-degree-scale: decimal (oracle:
            # HUGEINT) so a 1e9-degree hub can't wrap int64
            F.expr(
                "cast((2000000 * cast(t as decimal(19,0)))"
                " div (cast(deg as decimal(19,0)) * (deg - 1)) as bigint)"
            ).alias("cc_micro"),
        )
    )
    return (
        nodes.select(
            F.least(F.lit(9), F.expr("cc_micro div 100000")).alias("decile"),
            "cc_micro",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.expr("sum(cc_micro) div count(1)").alias("mean_cc_micro"),
        )
        .orderBy("decile")
    )


_LOCAL_CC_SQL = f"""
WITH {SEGMENT_EDGES_CTE},
deg AS (
    SELECT v, COUNT(*) AS deg
    FROM (SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges)
    GROUP BY v
),
tris AS (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM edges e1
    JOIN edges e2 ON e2.a = e1.b
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
credits AS (
    SELECT v, COUNT(*) AS t FROM (
        SELECT x AS v FROM tris
        UNION ALL SELECT y AS v FROM tris
        UNION ALL SELECT z AS v FROM tris
    ) GROUP BY v
),
nodes AS (
    SELECT d.v,
           CAST((2000000 * CAST(COALESCE(c.t, 0) AS HUGEINT))
               // (CAST(d.deg AS HUGEINT) * (d.deg - 1)) AS BIGINT)
               AS cc_micro
    FROM deg d LEFT JOIN credits c ON c.v = d.v
    WHERE d.deg >= 2
)
SELECT LEAST(9, cc_micro // 100000) AS decile,
       COUNT(*) AS n_nodes,
       CAST(SUM(cc_micro) AS BIGINT) // COUNT(*) AS mean_cc_micro
FROM nodes
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# graph_rich_club — connectivity among the high-degree core
# ---------------------------------------------------------------------------

RICH_CLUB_KS = (2, 4, 8, 16)


def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient ladder φ(k) = 2·E_{{>k}} / (N_{{>k}}·
    (N_{{>k}}−1)) over the segment-sharing graph: do the high-degree
    documents (the template cores) preferentially connect to EACH
    OTHER — the "one merged boilerplate blob" structure that makes a
    single connected-components pass collapse half the corpus — or do
    hubs sit in separate clubs? Complements ``graph_degree_
    assortativity``'s one global number with the level-by-level view.

    Per literal k: node census via a degree filter, surviving edges
    via two semi-join-style degree lookups; φ in exact integer
    micro-units of the clique bound.
    """
    e = _segment_edges(spark, sf_dir).localCheckpoint(eager=False)
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("db"))
    joined = e.join(da, "a").join(db, "b")
    rows = None
    for k in RICH_CLUB_KS:
        nodes_k = deg.where(F.col("deg") > k).agg(
            F.lit(k).cast("long").alias("k"),
            F.count(F.lit(1)).alias("n_nodes"),
        )
        edges_k = joined.where(
            (F.col("da") > k) & (F.col("db") > k)
        ).agg(F.count(F.lit(1)).alias("n_edges"))
        row = nodes_k.crossJoin(edges_k)
        rows = row if rows is None else rows.unionByName(row)
    return rows.select(
        "k",
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("n_edges").cast("long").alias("n_edges"),
        F.when(
            F.col("n_nodes") >= 2,
            F.expr(
                "cast((2000000 * cast(n_edges as decimal(19,0)))"
                " div (cast(n_nodes as decimal(19,0)) * (n_nodes - 1))"
                " as bigint)"
            ),
        ).alias("phi_micro"),
    ).orderBy("k")


def _rich_club_sql() -> str:
    rows = " UNION ALL ".join(
        f"""SELECT CAST({k} AS BIGINT) AS k,
        (SELECT COUNT(*) FROM deg WHERE deg > {k}) AS n_nodes,
        (SELECT COUNT(*) FROM edges e
         JOIN deg x ON x.v = e.a JOIN deg y ON y.v = e.b
         WHERE x.deg > {k} AND y.deg > {k}) AS n_edges"""
        for k in RICH_CLUB_KS
    )
    return f"""
WITH {SEGMENT_EDGES_CTE},
deg AS (
    SELECT v, COUNT(*) AS deg
    FROM (SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges)
    GROUP BY v
),
ladder AS ({rows})
SELECT k, CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges,
       CASE WHEN n_nodes >= 2
            THEN CAST((2000000 * CAST(n_edges AS HUGEINT))
                 // (CAST(n_nodes AS HUGEINT) * (n_nodes - 1)) AS BIGINT)
       END AS phi_micro
FROM ladder
ORDER BY k
"""


# ---------------------------------------------------------------------------
# graph_degree_assortativity — degree-degree mixing coefficient
# ---------------------------------------------------------------------------


def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the segment-sharing graph — Newman's r:
    the Pearson correlation of endpoint degrees over all DIRECTED
    edge slots. Positive r = hubs prefer hubs (one merged template
    blob — collapse policies behave very differently there), negative
    = hub-and-spoke (a few boilerplate anchors touch everything, the
    common crawl shape). The one-number topology readout after
    ``graph_degree_histogram`` shows the marginals.

    Exact: degrees from the edge list, the five correlation moments
    as decimal(38,0) sums over the symmetrized edge slots, r derived
    in double and rounded. Joins are two hash lookups of the degree
    table against the edge list — no adjacency materialization.
    """
    e = _segment_edges(spark, sf_dir)
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    sym = e.select("a", "b").unionAll(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("dx"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("dy"))
    pairs = sym.join(da, "a").join(db, "b")
    dec38 = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    m = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        # DuckDB SUM(BIGINT) auto-widens to HUGEINT; match with
        # decimal sums so Σdeg can't silently wrap Spark-side
        F.sum(dec38(F.col("dx"))).alias("sx"),
        F.sum(dec38(F.col("dy"))).alias("sy"),
        F.sum(dec38(F.col("dx")) * F.col("dy")).alias("sxy"),
        F.sum(dec38(F.col("dx")) * F.col("dx")).alias("sxx"),
        F.sum(dec38(F.col("dy")) * F.col("dy")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    r = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return m.select(
        (F.col("n") / 2).cast("long").alias("n_edges"),
        F.round(r, 6).alias("assortativity"),
        (F.round(r, 6) > 0).alias("hub_attracts_hub"),
    )


_ASSORT_SQL = f"""
WITH {SEGMENT_EDGES_CTE},
deg AS (
    SELECT v, COUNT(*) AS deg
    FROM (SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges)
    GROUP BY v
),
sym AS (
    SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges
),
pairs AS (
    SELECT da.deg AS dx, db.deg AS dy
    FROM sym s
    JOIN deg da ON da.v = s.a
    JOIN deg db ON db.v = s.b
),
m AS (
    SELECT COUNT(*) AS n, SUM(dx) AS sx, SUM(dy) AS sy,
           SUM(CAST(dx AS HUGEINT) * dy) AS sxy,
           SUM(CAST(dx AS HUGEINT) * dx) AS sxx,
           SUM(CAST(dy AS HUGEINT) * dy) AS syy
    FROM pairs
)
SELECT CAST(n / 2 AS BIGINT) AS n_edges,
    ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        AS assortativity,
    ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) > 0
        AS hub_attracts_hub
FROM m
"""


# ------------------------------------------------------- HITS (bipartite)

HITS_VOCAB = 30
HITS_ITERS = 2
HITS_SCALE = 10**9
HITS_TOPK = 10


def graph_hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg) over the doc↔token
    bipartite graph: documents are hubs, the top-30-df
    tokens are authorities.  A token is authoritative when it appears
    in strong hub documents; a document is a strong hub when it
    contains authoritative tokens — the mutual-reinforcement view of
    vocabulary centrality that raw df flattens (complements PageRank,
    which needs a homogeneous graph).

    Integer recipe: scores in BIGINT 10⁹ fixed-point, max-normalized
    after every half-step; per-doc hub sums are vocab-bounded
    (≤ {HITS_VOCAB}·10⁹ — int64-safe by construction), while the
    authority sums run over the whole corpus and therefore aggregate
    in DECIMAL so 10¹²-doc corpora don't overflow; 2 fixed
    iterations, oracle unrolled as MATERIALIZED CTEs.

    Scale (r12 restructure): the authority side is vocab-bounded
    (≤ {HITS_VOCAB} scores), so each half-step embeds the current
    authority vector as a LITERAL map and folds it over each doc's
    vocab-token array — a map-only pass — instead of the former
    edges⋈auth broadcast join + edges⋈hubs SHUFFLE join per
    iteration (the hub table is corpus-sized, so that join re-
    shuffled the edge table every iteration).  Per iteration: one
    aggregate for hmax, one explode+partial-agg shuffle whose output
    is ≤ {HITS_VOCAB} rows, and a ≤ {HITS_VOCAB}-row driver
    normalization (the PCA bounded-reduced-table pattern).  Zero
    corpus-side joins anywhere in the loop; per-row work is a
    ≤ 30-element fold.
    """
    d = fan_out(load(spark, sf_dir, "documents"), spark, "doc_id")
    tokd = (
        d.select("doc_id", F.explode(tokens_col("text")).alias("w"))
        .distinct()
        .localCheckpoint(eager=True)  # one explode pass feeds df + edges
    )
    df_counts = tokd.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    vocab = df_counts.orderBy(F.desc("df"), F.asc("w")).limit(HITS_VOCAB)
    # per-doc array of its DISTINCT vocab tokens (the same edge set as
    # the former (doc, w) edge table, one row per doc instead)
    doc_toks = (
        tokd.join(F.broadcast(vocab.select("w")), "w")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("w")).alias("ws"))
        .localCheckpoint(eager=True)
    )
    vocab_rows = vocab.collect()  # ≤ HITS_VOCAB rows — bounded
    auth: dict[str, int] = {r["w"]: HITS_SCALE for r in vocab_rows}
    for _ in range(HITS_ITERS):
        # hub half-step: h_raw(doc) = Σ_{w∈doc} a_w as an in-array fold
        # over the literal authority map (≤ 30·10⁹ — int64-exact)
        amap = F.create_map(
            *[x for w, a in sorted(auth.items()) for x in (F.lit(w), F.lit(a))]
        )
        h_raw = F.aggregate(
            "ws",
            F.lit(0).cast("long"),
            lambda acc, w: acc + F.element_at(amap, w),
        )
        hm = int(
            doc_toks.agg(F.max(h_raw).alias("hm")).collect()[0]["hm"]
        )
        # authority half-step: a_raw(w) = Σ_docs∋w h(doc); h is the
        # normalized hub score — (h_raw·SCALE) div hmax with the
        # product in DECIMAL exactly as the r11 form (h_raw ≤ 30·10⁹
        # times SCALE = 10⁹ would overflow int64), summed in decimal
        # against corpus growth
        h = F.expr(
            "CAST((CAST(hraw AS DECIMAL(38,0)) * "
            f"{HITS_SCALE}) div {hm} AS BIGINT)"
        )
        a_rows = (
            doc_toks.select(h_raw.alias("hraw"), "ws")
            .select(h.alias("h"), F.explode("ws").alias("w"))
            .groupBy("w")
            .agg(F.sum(F.col("h").cast("decimal(38,0)")).alias("a_raw"))
            .collect()
        )  # ≤ HITS_VOCAB rows — bounded
        # Safety (ADVICE r12): the h_raw fold's element_at(amap, w)
        # throws under ANSI for a missing key, so the invariant "every
        # vocab word survives into a_rows" must fail LOUDLY here (ws
        # words ⊆ vocab by the broadcast join; a_rows covers every ws
        # word) rather than silently drift if a future filter breaks it.
        new_keys = {r["w"] for r in a_rows}
        assert new_keys == set(auth), (
            "HITS invariant broken: authority map no longer covers the "
            f"vocab (diff: {sorted(set(auth) ^ new_keys)[:5]})"
        )
        am = max(int(r["a_raw"]) for r in a_rows)
        auth = {
            r["w"]: (int(r["a_raw"]) * HITS_SCALE) // am for r in a_rows
        }
    out_rows = sorted(
        (
            (w, int(next(r["df"] for r in vocab_rows if r["w"] == w)), a)
            for w, a in auth.items()
        ),
        key=lambda t: (-t[2], t[0]),
    )[:HITS_TOPK]
    return spark.createDataFrame(
        out_rows, "token string, df long, authority_fp long"
    ).orderBy(F.desc("authority_fp"), F.asc("token"))


def _hits_sql() -> str:
    parts = [
        f"""tok AS MATERIALIZED (
    SELECT DISTINCT doc_id, unnest({sql_tokens("text")}) AS w
    FROM documents
)""",
        f"""vocab AS MATERIALIZED (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS df
    FROM tok GROUP BY w
    ORDER BY df DESC, w ASC LIMIT {HITS_VOCAB}
)""",
        """edges AS MATERIALIZED (
    SELECT t.doc_id, t.w FROM tok t JOIN vocab v ON v.w = t.w
)""",
        f"""a0 AS MATERIALIZED (
    SELECT w, CAST({HITS_SCALE} AS BIGINT) AS a FROM vocab
)""",
    ]
    for k in range(1, HITS_ITERS + 1):
        parts.append(f"""hraw{k} AS MATERIALIZED (
    SELECT e.doc_id, SUM(CAST(a.a AS HUGEINT)) AS h_raw
    FROM edges e JOIN a{k - 1} a ON a.w = e.w
    GROUP BY e.doc_id
)""")
        parts.append(f"""h{k} AS MATERIALIZED (
    SELECT doc_id,
        CAST((h_raw * {HITS_SCALE})
             // (SELECT MAX(h_raw) FROM hraw{k}) AS BIGINT) AS h
    FROM hraw{k}
)""")
        parts.append(f"""araw{k} AS MATERIALIZED (
    SELECT e.w, SUM(CAST(h.h AS HUGEINT)) AS a_raw
    FROM edges e JOIN h{k} h ON h.doc_id = e.doc_id
    GROUP BY e.w
)""")
        parts.append(f"""a{k} AS MATERIALIZED (
    SELECT w,
        CAST((a_raw * {HITS_SCALE})
             // (SELECT MAX(a_raw) FROM araw{k}) AS BIGINT) AS a
    FROM araw{k}
)""")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT a.w AS token, v.df, a.a AS authority_fp
FROM a{HITS_ITERS} a JOIN vocab v ON v.w = a.w
ORDER BY authority_fp DESC, token ASC
LIMIT {HITS_TOPK}
"""
    )


QUERIES = {
    "graph_hits_bipartite": graph_hits_bipartite,
    "graph_clustering_coefficient": graph_clustering_coefficient,
    "graph_degree_assortativity": graph_degree_assortativity,
    "graph_rich_club": graph_rich_club,
    "graph_neighborhood_jaccard": graph_neighborhood_jaccard,
    "graph_kcore": graph_kcore,
    "dedup_cross_source_matrix": dedup_cross_source_matrix,
    "graph_adamic_adar": graph_adamic_adar,
    "quality_gopher_rules": quality_gopher_rules,
    "dedup_url_canonical": dedup_url_canonical,
    "graph_triangle_count": graph_triangle_count,
    "graph_community_labels": graph_community_labels,
    "text_bpe_merges": text_bpe_merges,
}

ORACLES = {
    "graph_hits_bipartite": _hits_sql(),
    "graph_clustering_coefficient": _LOCAL_CC_SQL,
    "graph_degree_assortativity": _ASSORT_SQL,
    "graph_rich_club": _rich_club_sql(),
    "graph_neighborhood_jaccard": _NJ_SQL,
    "graph_kcore": _kcore_sql(),
    "dedup_cross_source_matrix": _CROSS_SOURCE_SQL,
    "graph_adamic_adar": _AA_SQL,
    "graph_community_labels": _lpa_sql(),
    "quality_gopher_rules": _GOPHER_SQL,
    "dedup_url_canonical": _URL_SQL,
    "graph_triangle_count": _TRIANGLE_SQL,
    "text_bpe_merges": _bpe_sql(),
}
