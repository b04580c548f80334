"""Training-data curation operators (north-star, beyond the reference).

The four curation stages every large-scale LLM data pipeline runs that
the reference library (a parquet row reader) has no notion of — each a
Catalyst-planned pipeline with an exact DuckDB oracle:

- ``pii_detect``            : regex PII counts + redacted-text digest
- ``decontam_ngram_overlap``: train/eval n-gram contamination join
- ``sample_stratified``     : deterministic per-stratum downsampling
- ``quality_repetition``    : Gopher-style repetition/quality signals

Scale design (100 TB): pii/quality are embarrassingly parallel JVM
expressions (no shuffle beyond the final ORDER BY, which a pipeline
drops). Decontamination is an inverted-index equi-join on shingle
hashes — identical topology to dedup_ngram_jaccard, never an all-pairs
comparison. Stratified sampling is a stateless hash predicate: no
shuffle at all, any executor can decide keep/drop per row, and the
sample is reproducible across runs and engines (portable md5-derived
hash32, functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_batch_spark.catalog import fan_out, load
from parquet_batch_spark.functions.hashing import (
    MERSENNE_P,
    hash32,
    hash_params,
    sql_affine_hash,
    sql_hash32,
)
from parquet_batch_spark.functions.text import (
    shingles_col,
    sql_shingles,
    sql_tokens,
    tokens_col,
)

# Patterns restricted to syntax Java regex and RE2 interpret identically
# (character classes, bounded repetition, \d and word boundaries).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}[- .]\d{3}[- .]\d{4}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

DECONTAM_K = 5  # eval-overlap n-gram length
BENCH_MOD = 97  # doc_id % 97 == 0 -> the held-out "benchmark" slice

SAMPLE_RATES = {"en": 500, "es": 250, "de": 250}  # per-mille keep rates
SAMPLE_DEFAULT_RATE = 100


def pii_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII scan: email/phone/IP match counts plus a digest
    of the redacted text (emails → ``<EMAIL>`` etc.) so the redaction
    itself is oracle-checked without shipping full text through the
    comparison. Pure JVM regexp — embarrassingly parallel, zero
    shuffle before the output sort."""
    d = load(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"),
            IP_RE,
            "<IP>",
        ),
        PHONE_RE,
        "<PHONE>",
    )
    n_email = F.regexp_count(F.col("text"), F.lit(EMAIL_RE))
    n_phone = F.regexp_count(F.col("text"), F.lit(PHONE_RE))
    n_ip = F.regexp_count(F.col("text"), F.lit(IP_RE))
    return (
        d.select(
            "doc_id",
            n_email.cast("long").alias("n_email"),
            n_phone.cast("long").alias("n_phone"),
            n_ip.cast("long").alias("n_ip"),
            (n_email + n_phone + n_ip > 0).alias("has_pii"),
            F.md5(redacted).alias("redacted_md5"),
        )
        .orderBy("doc_id")
    )


_PII_SQL = f"""
SELECT doc_id,
    CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_email,
    CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phone,
    CAST(len(regexp_extract_all(text, '{IP_RE}')) AS BIGINT) AS n_ip,
    (len(regexp_extract_all(text, '{EMAIL_RE}'))
     + len(regexp_extract_all(text, '{PHONE_RE}'))
     + len(regexp_extract_all(text, '{IP_RE}'))) > 0 AS has_pii,
    md5(regexp_replace(regexp_replace(regexp_replace(
        text, '{EMAIL_RE}', '<EMAIL>', 'g'),
        '{IP_RE}', '<IP>', 'g'),
        '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM documents
ORDER BY doc_id
"""


def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    {DECONTAM_K}-gram with the held-out slice (doc_id % {BENCH_MOD} == 0
    stands in for an eval suite). The overlap check is an equi-join on
    shingle hashes against the (small) benchmark index — at 100 TB the
    benchmark side broadcasts and the train side streams once; never an
    all-pairs text comparison."""
    d = fan_out(load(spark, sf_dir, "documents"), spark, "doc_id")
    # localCheckpoint (r12): grams feeds the benchmark index AND the
    # train stream — without materialization the corpus tokenize +
    # shingle + md5 subtree runs twice
    grams = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles_col(tokens_col("text"), DECONTAM_K))
        ).alias("g"),
    ).select("doc_id", hash32(F.col("g")).alias("h")).localCheckpoint(
        eager=False
    )
    bench = (
        grams.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select("h")
        .distinct()
    )
    train = grams.filter(F.col("doc_id") % BENCH_MOD != 0)
    hits = (
        train.join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
    # every doc yields ≥1 gram (shingles fall back to the whole text),
    # so the train-doc list comes straight from the documents scan —
    # no DISTINCT over the exploded gram stream
    train_docs = d.filter(F.col("doc_id") % BENCH_MOD != 0).select("doc_id")
    return (
        train_docs.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_contaminated_grams", F.lit(0)).alias("n_contaminated_grams"),
            F.col("n_contaminated_grams").isNotNull().alias("contaminated"),
        )
        .orderBy("doc_id")
    )


_DECONTAM_SQL = f"""
WITH grams AS (
    SELECT doc_id, {sql_hash32("g")} AS h FROM (
        SELECT doc_id,
            unnest(list_distinct({sql_shingles("toks", DECONTAM_K)})) AS g
        FROM (SELECT doc_id, {sql_tokens("text")} AS toks FROM documents)
    )
),
bench AS (
    SELECT DISTINCT h FROM grams WHERE doc_id % {BENCH_MOD} = 0
),
train AS (
    SELECT doc_id, h FROM grams WHERE doc_id % {BENCH_MOD} <> 0
),
hits AS (
    SELECT t.doc_id, COUNT(*) AS n
    FROM train t JOIN bench b ON t.h = b.h
    GROUP BY t.doc_id
)
SELECT d.doc_id AS doc_id,
    CAST(COALESCE(hits.n, 0) AS BIGINT) AS n_contaminated_grams,
    hits.n IS NOT NULL AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {BENCH_MOD} <> 0) d
LEFT JOIN hits ON d.doc_id = hits.doc_id
ORDER BY d.doc_id
"""


# ------------------------------------------------------- k-anonymity

KANON_K = 5  # groups smaller than this are re-identification risks
KANON_LEN_BUCKET = 100  # n_chars quantization for the quasi-identifier


def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the release quasi-identifiers (lang,
    source, coarse length bucket): any combination shared by fewer
    than k={KANON_K} documents is a re-identification risk — the
    check privacy review runs before publishing corpus metadata or
    per-group statistics.

    One groupBy over the quasi-identifier tuple (partial-aggregated
    map-side; group count is bounded by the QI domain, not the corpus)
    — the 100 TB cost is one scan plus a tiny shuffle.  Output lists
    every equivalence class with its size and risk flag; suppressing
    or generalizing the risky classes is the downstream action."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(
            "lang",
            "source",
            F.floor(F.col("n_chars") / KANON_LEN_BUCKET)
            .cast("long")
            .alias("len_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("k"))
        .withColumn("risky", F.col("k") < KANON_K)
        .orderBy("lang", "source", "len_bucket")
    )


_KANON_SQL = f"""
SELECT lang, source,
    CAST(FLOOR(CAST(n_chars AS DOUBLE) / {KANON_LEN_BUCKET}) AS BIGINT)
        AS len_bucket,
    COUNT(*) AS k,
    COUNT(*) < {KANON_K} AS risky
FROM documents
GROUP BY 1, 2, 3
ORDER BY lang, source, len_bucket
"""


# ------------------------------------------------------- bloom decontam

BLOOM_M = 16384  # filter size in bits (2^14)
BLOOM_WORD_BITS = 16  # bit-pack width; 16-bit words keep every mask exact
BLOOM_K_PARAMS = hash_params(3, seed=1013)  # 3-hash family (portable affine)


def _bloom_word_count() -> int:
    return BLOOM_M // BLOOM_WORD_BITS


def decontam_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination via a broadcast Bloom filter — the
    100 TB fast path that ``decontam_ngram_overlap``'s exact equi-join
    refines.

    The benchmark slice's {DECONTAM_K}-gram hashes are folded into a
    {BLOOM_M}-bit Bloom filter (3 portable affine hashes of the shared
    md5-derived gram hash).  The filter is ~2 KB — it broadcasts as a
    plan literal, so screening the train corpus is a MAP-ONLY pass:
    per document, the shingle array is filtered by a pure-JVM bit test
    (``element_at`` on the packed word array + ``bitwiseAND``; 16-bit
    words so the ``pow(2, p % 16)`` mask stays integer-exact), with no
    explode, no join, and no shuffle before the output sort.  At scale
    this is the screen you run FIRST: the exact join then only pays for
    the (tiny) bloom-positive survivors.  False positives are inherent
    to the filter and deterministic — both engines compute the same
    bit positions, so the oracle reproduces them bit-for-bit (position
    membership in SQL ≡ testing the packed bit in Spark).

    Driver step: collecting the set bit positions (≤ {BLOOM_M} ints)
    to embed the filter as a literal — bounded by the filter size, not
    the corpus.  Output: per train doc, distinct-gram count, bloom-hit
    count, hit rate, and the flagged screen decision."""
    d = fan_out(load(spark, sf_dir, "documents"), spark, "doc_id")
    toks = tokens_col("text")
    sh = F.array_distinct(shingles_col(toks, DECONTAM_K))
    grams = d.select("doc_id", F.explode(sh).alias("g"))
    bench_h = (
        grams.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select(hash32(F.col("g")).alias("h"))
    )
    pos_cols = [
        ((F.lit(a) * (F.col("h") % MERSENNE_P) + F.lit(b)) % MERSENNE_P % BLOOM_M)
        for a, b in BLOOM_K_PARAMS
    ]
    positions = {
        r["p"]
        for r in bench_h.select(F.explode(F.array(*pos_cols)).alias("p"))
        .distinct()
        .collect()
    }
    words = [0] * _bloom_word_count()
    for p in positions:
        words[p // BLOOM_WORD_BITS] |= 1 << (p % BLOOM_WORD_BITS)
    # a TRUE array literal (one Literal node), not CreateArray(1024
    # literals): higher-order lambdas are interpreted, so a CreateArray
    # here would be rebuilt for every bit test of every gram
    bits = F.lit(words)

    def _is_hit(h):
        # h is the gram's 32-bit hash (already computed once) — each
        # bit test is pure integer arithmetic + element_at on the
        # literal, so the 3-hash membership costs no further md5
        cond = None
        for a, b in BLOOM_K_PARAMS:
            p = (F.lit(a) * (h % MERSENNE_P) + F.lit(b)) % MERSENNE_P % BLOOM_M
            widx = F.floor(p / BLOOM_WORD_BITS).cast("int") + 1
            mask = F.pow(F.lit(2.0), (p % BLOOM_WORD_BITS).cast("double")).cast("int")
            c = F.element_at(bits, widx).bitwiseAND(mask) != F.lit(0)
            cond = c if cond is None else (cond & c)
        return cond

    train = d.filter(F.col("doc_id") % BENCH_MOD != 0)
    # hash every distinct gram ONCE into a projected column — the
    # membership filter then references bound int64s (the inline form
    # re-derived the shingle array and its md5s per use; interpreted
    # higher-order lambdas do no common-subexpression elimination)
    hashed = train.select(
        "doc_id", F.transform(sh, lambda g: hash32(g)).alias("hs")
    )
    return (
        hashed.select(
            "doc_id",
            F.size(F.col("hs")).cast("long").alias("n_grams"),
            F.size(F.filter(F.col("hs"), _is_hit)).cast("long").alias("n_bloom_hits"),
        )
        .withColumn(
            "hit_rate", F.round(F.col("n_bloom_hits") / F.col("n_grams"), 6)
        )
        .withColumn("flagged", F.col("n_bloom_hits") > 0)
        .orderBy("doc_id")
    )


def _bloom_pos_sql(h_expr: str) -> list[str]:
    return [
        f"({sql_affine_hash(h_expr, a, b)} % {BLOOM_M})" for a, b in BLOOM_K_PARAMS
    ]


_BLOOM_SQL = f"""
WITH grams AS (
    SELECT doc_id, {sql_hash32("g")} AS h FROM (
        SELECT doc_id,
            unnest(list_distinct({sql_shingles("toks", DECONTAM_K)})) AS g
        FROM (SELECT doc_id, {sql_tokens("text")} AS toks FROM documents)
    )
),
bench_pos AS (
    SELECT DISTINCT p FROM (
        SELECT unnest([{", ".join(_bloom_pos_sql("h"))}]) AS p
        FROM grams WHERE doc_id % {BENCH_MOD} = 0
    )
),
train AS (
    SELECT doc_id,
        {_bloom_pos_sql("h")[0]} AS p0,
        {_bloom_pos_sql("h")[1]} AS p1,
        {_bloom_pos_sql("h")[2]} AS p2
    FROM grams WHERE doc_id % {BENCH_MOD} <> 0
),
hits AS (
    SELECT doc_id,
        COUNT(*) AS n_grams,
        SUM(CASE WHEN p0 IN (SELECT p FROM bench_pos)
                  AND p1 IN (SELECT p FROM bench_pos)
                  AND p2 IN (SELECT p FROM bench_pos)
             THEN 1 ELSE 0 END) AS n_bloom_hits
    FROM train GROUP BY doc_id
)
SELECT doc_id,
    CAST(n_grams AS BIGINT) AS n_grams,
    CAST(n_bloom_hits AS BIGINT) AS n_bloom_hits,
    ROUND(CAST(n_bloom_hits AS DOUBLE) / n_grams, 6) AS hit_rate,
    n_bloom_hits > 0 AS flagged
FROM hits
ORDER BY doc_id
"""


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: per-language keep rates
    (en 50%, es/de 25%, rest 10%) decided by a stateless portable hash
    predicate — hash32(doc_id) mod 1000 < rate. No shuffle, no RNG
    state, reproducible across engines and runs; the summary aggregates
    kept counts per stratum so rates are oracle-auditable."""
    d = load(spark, sf_dir, "documents")
    rate = F.lit(SAMPLE_DEFAULT_RATE)
    for lang, r in sorted(SAMPLE_RATES.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    bucket = hash32(F.col("doc_id").cast("string")) % 1000
    kept = d.filter(bucket < rate)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang")
    )


def _sql_rate_case() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {r}" for lang, r in sorted(SAMPLE_RATES.items())
    )
    return f"CASE lang {whens} ELSE {SAMPLE_DEFAULT_RATE} END"


_SAMPLE_SQL = f"""
SELECT lang,
    COUNT(*) AS n_kept,
    MIN(doc_id) AS first_doc,
    MAX(doc_id) AS last_doc
FROM documents
WHERE {sql_hash32("CAST(doc_id AS VARCHAR)")} % 1000 < {_sql_rate_case()}
GROUP BY lang
ORDER BY lang
"""


SPLIT_VAL_PERMILLE = 50  # 5% val
SPLIT_TEST_PERMILLE = 50  # 5% test


def sample_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: every document lands in
    exactly one split via the portable hash bucket — disjoint,
    complete, reproducible across engines/runs/cluster sizes, and
    stable under corpus growth (a doc's split never changes when other
    docs arrive — the property random splits lack). Summary rows carry
    per-split counts and an order-independent doc-id checksum so the
    oracle verifies membership, not just sizes."""
    d = load(spark, sf_dir, "documents")
    bucket = hash32(F.col("doc_id").cast("string")) % 1000
    split = (
        F.when(bucket < SPLIT_VAL_PERMILLE, F.lit("val"))
        .when(bucket < SPLIT_VAL_PERMILLE + SPLIT_TEST_PERMILLE, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return (
        d.select(split.alias("split"), "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("docid_checksum"),
        )
        .orderBy("split")
    )


_SPLIT_SQL = f"""
SELECT CASE
        WHEN {sql_hash32("CAST(doc_id AS VARCHAR)")} % 1000 < {SPLIT_VAL_PERMILLE}
            THEN 'val'
        WHEN {sql_hash32("CAST(doc_id AS VARCHAR)")} % 1000
                < {SPLIT_VAL_PERMILLE + SPLIT_TEST_PERMILLE}
            THEN 'test'
        ELSE 'train' END AS split,
    COUNT(*) AS n_docs,
    CAST(SUM(doc_id) AS BIGINT) AS docid_checksum
FROM documents
GROUP BY split
ORDER BY split
"""


def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/quality signals per document: top-word
    frequency fraction (boilerplate detector), distinct-word ratio,
    symbol-to-word ratio, and mean word length. One explode + one
    groupBy — linear in corpus size, partial-aggregated map-side."""
    d = fan_out(load(spark, sf_dir, "documents"), spark, "doc_id")
    words = d.select("doc_id", F.explode(tokens_col("text")).alias("w"))
    per_word = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    sym = F.regexp_count(F.col("w"), F.lit(r"[^A-Za-z0-9\s]"))
    return (
        per_word.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_words"),
            F.round(F.max("c") / F.sum("c"), 6).alias("top_word_frac"),
            F.round(F.count(F.lit(1)) / F.sum("c"), 6).alias("distinct_ratio"),
            F.round(F.sum(sym * F.col("c")) / F.sum("c"), 6).alias("symbol_per_word"),
            F.round(F.sum(F.length("w") * F.col("c")) / F.sum("c"), 6).alias(
                "mean_word_len"
            ),
        )
        .orderBy("doc_id")
    )


_QUALITY_SQL = f"""
WITH words AS (
    SELECT doc_id, unnest({sql_tokens("text")}) AS w FROM documents
),
per_word AS (
    SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w
)
SELECT doc_id,
    CAST(SUM(c) AS BIGINT) AS n_words,
    CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
    ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_word_frac,
    ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS distinct_ratio,
    ROUND(CAST(SUM(len(regexp_extract_all(w, '[^A-Za-z0-9\\s]')) * c) AS DOUBLE)
        / SUM(c), 6) AS symbol_per_word,
    ROUND(CAST(SUM(length(w) * c) AS DOUBLE) / SUM(c), 6) AS mean_word_len
FROM per_word
GROUP BY doc_id
ORDER BY doc_id
"""


RESERVOIR_M = 10  # kept documents per (lang, source) group


def sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap-per-domain sampling: keep a deterministic uniform sample of
    at most {RESERVOIR_M} documents per (lang, source) group — the
    "no single domain dominates the training mix" stage of every
    large-scale data pipeline. Reservoir semantics without reservoir
    STATE: rank docs inside each group by the portable hash of their
    id (uniform, seed-free, reproducible across engines/runs/cluster
    sizes) and keep the first M — equivalent to a uniform without-
    replacement draw of M per group.

    Scale shape: one shuffle on the group key, then a per-group sort
    of (hash, id) pairs only — no payload columns move until the keep
    decision is made. A pathological group (billions of docs in one
    domain) serializes in its sort task; the production refinement is
    a superset hash-threshold prefilter (keep hash < c·M/|group| ·
    2^32, then exact-rank the survivors), which this operator's
    deterministic hash ordering makes a pure optimization — the kept
    set is identical."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    from pyspark.sql import Window as W

    w = W.partitionBy("lang", "source").orderBy("hk", "doc_id")
    return (
        d.withColumn("hk", hash32(F.col("doc_id").cast("string")))
        .withColumn("samp_rank", F.row_number().over(w))
        .filter(F.col("samp_rank") <= RESERVOIR_M)
        .select("lang", "source", "doc_id", "samp_rank")
        .orderBy("lang", "source", "samp_rank")
    )


_RESERVOIR_SQL = f"""
SELECT lang, source, doc_id, CAST(rn AS INTEGER) AS samp_rank
FROM (
    SELECT lang, source, doc_id,
        ROW_NUMBER() OVER (
            PARTITION BY lang, source
            ORDER BY {sql_hash32("CAST(doc_id AS VARCHAR)")}, doc_id
        ) AS rn
    FROM documents
)
WHERE rn <= {RESERVOIR_M}
ORDER BY lang, source, samp_rank
"""


# Fixed integer-quantized weights of the linear quality model (a
# fasttext-style classifier distilled to its decision function).  The
# logit is monotone in the class probability, so gating on the integer
# logit is EXACTLY gating on the sigmoid score — no exp(), nothing
# float, bit-identical across engines and partitionings.
QM_W_MEANLEN = 3      # longer words: prose-like
QM_W_DISTINCT = 5     # vocabulary diversity
QM_W_SYMBOL = -8      # markup/symbol soup
QM_W_STOP = 4         # function-word mass: natural language
QM_BIAS = -4_000_000
QM_THRESH = 0  # logit_micro >= 0  <=>  p >= 0.5
QM_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "for", "on", "it")


def quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering — the classifier-inference stage
    (fasttext/logreg style) that follows the rule-based Gopher screen
    in a production pipeline. Four interpretable features per doc
    (mean word length, distinct-word ratio, symbol density, stopword
    fraction), each an exact floor(1e6·a/b) integer micro-ratio, are
    combined by fixed integer weights into a logit; docs pass at
    logit >= {QM_THRESH}. Output: per-(lang, source) cohort pass
    accounting + mean logit — the report that decides which cohorts a
    model-based filter would starve.

    Scale: one token explode + two reduces, all integer arithmetic in
    whole-stage codegen; inference is embarrassingly parallel (weights
    are plan literals, nothing is broadcast or shuffled for the model).
    """
    d = fan_out(load(spark, sf_dir, "documents"), spark, "doc_id")
    words = d.select(
        "doc_id", "lang", "source", F.explode(tokens_col("text")).alias("w")
    )
    sym = F.regexp_count(F.col("w"), F.lit(r"[^A-Za-z0-9\s]"))
    stop = F.lower(F.col("w")).isin(*QM_STOPWORDS).cast("long")
    feats = words.groupBy("doc_id", "lang", "source").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.count_distinct("w").alias("n_distinct"),
        F.sum(F.length("w")).alias("sum_len"),
        F.sum(sym).alias("sum_sym"),
        F.sum(stop).alias("sum_stop"),
    )
    micro = lambda a, b: F.floor(F.lit(1_000_000) * a / b).cast("long")  # noqa: E731
    logit = (
        F.lit(QM_BIAS)
        + F.lit(QM_W_MEANLEN) * micro(F.col("sum_len"), F.col("n_words"))
        + F.lit(QM_W_DISTINCT) * micro(F.col("n_distinct"), F.col("n_words"))
        + F.lit(QM_W_SYMBOL) * micro(F.col("sum_sym"), F.col("n_words"))
        + F.lit(QM_W_STOP) * micro(F.col("sum_stop"), F.col("n_words"))
    )
    scored = feats.select("lang", "source", logit.alias("logit_micro"))
    return (
        scored.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("logit_micro") >= QM_THRESH).cast("long")).alias("n_pass"),
            F.floor(F.avg("logit_micro")).cast("long").alias("mean_logit_micro"),
        )
        .select(
            "lang",
            "source",
            "n_docs",
            "n_pass",
            F.round(F.col("n_pass") / F.col("n_docs"), 6).alias("pass_rate"),
            "mean_logit_micro",
        )
        .orderBy("lang", "source")
    )


_QM_STOP_SQL = ", ".join(f"'{w}'" for w in QM_STOPWORDS)

_QUALITY_MODEL_SQL = f"""
WITH words AS (
    SELECT doc_id, lang, source, unnest({sql_tokens("text")}) AS w FROM documents
),
feats AS (
    SELECT doc_id, lang, source,
        COUNT(*) AS n_words,
        COUNT(DISTINCT w) AS n_distinct,
        SUM(length(w)) AS sum_len,
        SUM(len(regexp_extract_all(w, '[^A-Za-z0-9\\s]'))) AS sum_sym,
        SUM(CASE WHEN lower(w) IN ({_QM_STOP_SQL}) THEN 1 ELSE 0 END) AS sum_stop
    FROM words GROUP BY doc_id, lang, source
),
scored AS (
    SELECT lang, source,
        {QM_BIAS}
        + {QM_W_MEANLEN} * CAST(FLOOR(1000000.0 * sum_len / n_words) AS BIGINT)
        + {QM_W_DISTINCT} * CAST(FLOOR(1000000.0 * n_distinct / n_words) AS BIGINT)
        + ({QM_W_SYMBOL}) * CAST(FLOOR(1000000.0 * sum_sym / n_words) AS BIGINT)
        + {QM_W_STOP} * CAST(FLOOR(1000000.0 * sum_stop / n_words) AS BIGINT)
            AS logit_micro
    FROM feats
)
SELECT lang, source,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(CASE WHEN logit_micro >= {QM_THRESH} THEN 1 ELSE 0 END) AS BIGINT)
        AS n_pass,
    ROUND(CAST(SUM(CASE WHEN logit_micro >= {QM_THRESH} THEN 1 ELSE 0 END) AS DOUBLE)
          / COUNT(*), 6) AS pass_rate,
    CAST(FLOOR(AVG(logit_micro)) AS BIGINT) AS mean_logit_micro
FROM scored
GROUP BY lang, source
ORDER BY lang, source
"""


# ------------------------------------------------------- l-diversity

LDIV_L = 2  # require at least 2 distinct sensitive values per class
LDIV_C = 2  # recursive (c,l)-diversity multiplier


def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive (c,l)-diversity audit — the attribute-disclosure check
    that k-anonymity misses: an equivalence class can be large (k-safe)
    yet still leak its sensitive attribute if almost every member
    shares one value.  Quasi-identifiers are (source, coarse length
    bucket) — ``privacy_k_anonymity``'s QI tuple minus the sensitive
    column — and the sensitive attribute is ``lang``.

    Per QI class this reports k, l (distinct sensitive values), the
    modal value's frequency r1 and the tail mass Σr2..rm, and flags
    classes failing l ≥ {LDIV_L} or the recursive test
    r1 < {LDIV_C}·(r2+…+rm).  All tests are exact integer compares —
    no float anywhere — so the DuckDB oracle is bit-identical.

    Scale: one partial-aggregated groupBy to the (QI, lang) frequency
    table (bounded by the QI×lang domain, not the corpus), then a
    window over QI classes — partitioned by QI, and the window input
    is the already-reduced frequency table, so no global shuffle of
    fact rows ever happens."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    freq = (
        d.groupBy(
            "source",
            F.floor(F.col("n_chars") / KANON_LEN_BUCKET)
            .cast("long")
            .alias("len_bucket"),
            "lang",
        )
        .agg(F.count(F.lit(1)).alias("r"))
    )
    w = W.partitionBy("source", "len_bucket")
    rn = F.row_number().over(w.orderBy(F.desc("r"), F.asc("lang")))
    per_class = (
        freq.withColumn("rn", rn)
        .groupBy("source", "len_bucket")
        .agg(
            F.sum("r").alias("k"),
            F.count(F.lit(1)).alias("l_distinct"),
            F.max(F.when(F.col("rn") == 1, F.col("lang"))).alias("top_lang"),
            F.sum(F.when(F.col("rn") == 1, F.col("r")).otherwise(0)).alias(
                "top_freq"
            ),
            F.sum(F.when(F.col("rn") > 1, F.col("r")).otherwise(0)).alias(
                "tail_mass"
            ),
        )
    )
    return per_class.select(
        "source",
        "len_bucket",
        "k",
        "l_distinct",
        "top_lang",
        "top_freq",
        "tail_mass",
        (F.col("l_distinct") >= LDIV_L).alias("ok_l"),
        (F.col("top_freq") < LDIV_C * F.col("tail_mass")).alias("ok_recursive"),
        (
            (F.col("l_distinct") >= LDIV_L)
            & (F.col("top_freq") < LDIV_C * F.col("tail_mass"))
        ).alias("diverse"),
    ).orderBy("source", "len_bucket")


_LDIV_SQL = f"""
WITH freq AS (
    SELECT source,
        CAST(FLOOR(CAST(n_chars AS DOUBLE) / {KANON_LEN_BUCKET}) AS BIGINT)
            AS len_bucket,
        lang, COUNT(*) AS r
    FROM documents
    GROUP BY 1, 2, 3
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source, len_bucket ORDER BY r DESC, lang ASC) AS rn
    FROM freq
),
per_class AS (
    SELECT source, len_bucket,
        CAST(SUM(r) AS BIGINT) AS k,
        COUNT(*) AS l_distinct,
        MAX(CASE WHEN rn = 1 THEN lang END) AS top_lang,
        CAST(SUM(CASE WHEN rn = 1 THEN r ELSE 0 END) AS BIGINT) AS top_freq,
        CAST(SUM(CASE WHEN rn > 1 THEN r ELSE 0 END) AS BIGINT) AS tail_mass
    FROM ranked
    GROUP BY source, len_bucket
)
SELECT source, len_bucket, k, l_distinct, top_lang, top_freq, tail_mass,
    l_distinct >= {LDIV_L} AS ok_l,
    top_freq < {LDIV_C} * tail_mass AS ok_recursive,
    (l_distinct >= {LDIV_L} AND top_freq < {LDIV_C} * tail_mass) AS diverse
FROM per_class
ORDER BY source, len_bucket
"""


# ------------------------------------------- Luhn checksum validation

LUHN_DIGITS = 16


def quality_luhn_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn mod-10 checksum validation — the second stage of credit-
    card PII detection: a 16-digit regex (``pii_detect``'s job) has a
    ~10% false-positive rate on arbitrary digit runs, and the Luhn
    check is the standard filter that removes 9 of those 10.
    Candidates here are deterministic synthetic account numbers
    derived from order keys (a production run feeds the regex
    extractor's hits through the identical validator).

    The checksum is pure integer digit arithmetic in one in-row fold
    (double every second digit from the right, subtract 9 above 9,
    sum mod 10) — map-only, whole-stage codegen, no Python.  Output:
    per order priority, candidates / Luhn-valid count / valid rate in
    exact micro-units (≈1/10 by construction — the false-positive
    rate the checksum screens at)."""
    o = load(spark, sf_dir, "orders")
    cand = F.lpad(
        (F.col("o_orderkey") * 48271 % F.lit(10**15)).cast("string"),
        LUHN_DIGITS,
        "0",
    )
    staged = o.select(F.col("o_orderpriority").alias("prio"), cand.alias("s"))
    digit = lambda i: F.substring(F.col("s"), i, 1).cast("int")  # noqa: E731
    # position from the right p = LUHN_DIGITS - i + 1; double evens
    term = lambda i: F.when(  # noqa: E731
        F.lit((LUHN_DIGITS - i + 1) % 2 == 0),
        F.when(digit(i) * 2 > 9, digit(i) * 2 - 9).otherwise(digit(i) * 2),
    ).otherwise(digit(i))
    total = sum([term(i) for i in range(1, LUHN_DIGITS + 1)], F.lit(0))
    flagged = staged.select("prio", (total % 10 == 0).alias("valid"))
    return (
        flagged.groupBy("prio")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(F.when(F.col("valid"), 1).otherwise(0))
            .cast("long")
            .alias("n_valid"),
        )
        .withColumn(
            "valid_rate_micro", F.expr("(1000000 * n_valid) div n_candidates")
        )
        .orderBy("prio")
    )


def _luhn_term_sql(i: int) -> str:
    d = f"CAST(substr(s, {i}, 1) AS INTEGER)"
    if (LUHN_DIGITS - i + 1) % 2 == 0:
        return f"(CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END)"
    return d


_LUHN_SQL = f"""
WITH staged AS (
    SELECT o_orderpriority AS prio,
        lpad(CAST(o_orderkey * 48271 % 1000000000000000 AS VARCHAR),
             {LUHN_DIGITS}, '0') AS s
    FROM orders
),
flagged AS (
    SELECT prio,
        ({" + ".join(_luhn_term_sql(i) for i in range(1, LUHN_DIGITS + 1))})
            % 10 = 0 AS valid
    FROM staged
)
SELECT prio, COUNT(*) AS n_candidates,
    CAST(SUM(CASE WHEN valid THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
    (1000000 * CAST(SUM(CASE WHEN valid THEN 1 ELSE 0 END) AS BIGINT))
        // COUNT(*) AS valid_rate_micro
FROM flagged
GROUP BY prio
ORDER BY prio
"""


# ------------------------------------------- randomized response

RR_FLIP_DEN = 4  # flip probability 1/4 → report is truthful with p = 3/4
# ε = ln(p/(1-p)) = ln 3 ≈ 1.10 — the local-DP budget this mechanism buys


def privacy_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner randomized response — the local-differential-privacy
    mechanism for releasing a sensitive-bit rate without trusting the
    aggregator: each record reports its bit truthfully with
    p = {RR_FLIP_DEN - 1}/{RR_FLIP_DEN} and flipped otherwise, and the
    population rate is recovered by the unbiased inversion
    (p̂_rep − (1−p)) / (2p − 1).  The "coin" is the portable doc-id
    hash, so both engines flip the SAME records and the debiasing is
    reproducible — exactly how a deterministic-salt LDP pipeline
    replays (production uses a secret salt; the plumbing is
    identical).

    Everything is exact integers: flip = (h mod {RR_FLIP_DEN} = 0),
    reported/true counts are plain sums, and the debiased estimate is
    BIGINT micro-units ((2e6·n_rep) div n − 5e5 for p = 3/4).  One
    map-only pass + a lang-grain partial aggregate.  Output keeps the
    ground-truth rate alongside the recovered one to show the
    inversion lands (unknowable in production — diagnostic here)."""
    d = load(spark, sf_dir, "documents")
    h = hash32(F.col("doc_id").cast("string"))
    truth = (F.col("n_chars") % 2 == 0).alias("truth")
    flip = (h % RR_FLIP_DEN == 0).alias("flip")
    rep = d.select(
        "lang",
        truth,
        flip,
        (
            (F.col("n_chars") % 2 == 0) != (h % RR_FLIP_DEN == 0)
        ).alias("reported"),
    )
    return (
        rep.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("truth"), 1).otherwise(0))
            .cast("long")
            .alias("n_true"),
            F.sum(F.when(F.col("reported"), 1).otherwise(0))
            .cast("long")
            .alias("n_reported"),
        )
        .select(
            "lang",
            "n",
            "n_true",
            "n_reported",
            F.expr("(1000000 * n_true) div n").alias("true_rate_micro"),
            (
                F.expr("(2000000 * n_reported) div n") - F.lit(500_000)
            ).alias("est_rate_micro"),
        )
        .orderBy("lang")
    )


_RR_SQL = f"""
WITH rep AS (
    SELECT lang,
        n_chars % 2 = 0 AS truth,
        ({sql_hash32("CAST(doc_id AS VARCHAR)")}) % {RR_FLIP_DEN} = 0 AS flip,
        (n_chars % 2 = 0) <> (({sql_hash32("CAST(doc_id AS VARCHAR)")}) % {RR_FLIP_DEN} = 0)
            AS reported
    FROM documents
),
g AS (
    SELECT lang, COUNT(*) AS n,
        CAST(SUM(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
        CAST(SUM(CASE WHEN reported THEN 1 ELSE 0 END) AS BIGINT) AS n_reported
    FROM rep GROUP BY lang
)
SELECT lang, n, n_true, n_reported,
    (1000000 * n_true) // n AS true_rate_micro,
    (2000000 * n_reported) // n - 500000 AS est_rate_micro
FROM g
ORDER BY lang
"""


# ------------------------------------------- PPS systematic sampling

PPS_K = 20  # target draws per stratum


def sample_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size systematic sampling (Madow)
    per language stratum: walk the hash-shuffled unit list with a
    fixed skip = total_size div {PPS_K} and take every unit whose
    cumulative size crosses a multiple of the skip — inclusion
    probability ∝ n_chars with ZERO random state (the portable hash
    is the shuffle), the classic single-pass survey design that
    ``sample_weighted_without_replacement``'s A-ES keys generalize.
    Units at least one skip long are certainty units (always drawn) —
    the PPS property the test pins.

    All integer arithmetic (crossing test compares integer divisions,
    nonnegative everywhere, so truncation ≡ floor in both engines).
    Scale: one window per lang stratum for the running size (the
    seq_pack_chunks prefix-sum discipline — shard the partition key at
    100 TB), then a map-side filter; output is the K-per-stratum
    sample, not the corpus."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    h = hash32(F.col("doc_id").cast("string"))
    base = d.select(
        "lang", "doc_id", F.col("n_chars").alias("w"), h.alias("h")
    )
    w_cum = W.partitionBy("lang").orderBy("h", "doc_id")
    staged = base.select(
        "lang",
        "doc_id",
        "w",
        F.sum("w").over(
            w_cum.rowsBetween(W.unboundedPreceding, 0)
        ).alias("cumw"),
        F.sum("w").over(W.partitionBy("lang")).alias("total"),
    ).withColumn("skip", F.expr(f"total div {PPS_K}"))
    return (
        staged.filter(
            F.expr("cumw div skip") > F.expr("(cumw - w) div skip")
        )
        .select("lang", "doc_id", "w", "cumw")
        .orderBy("lang", "doc_id")
    )


_PPS_SQL = f"""
WITH base AS (
    SELECT lang, doc_id, n_chars AS w,
        {sql_hash32("CAST(doc_id AS VARCHAR)")} AS h
    FROM documents
),
staged AS (
    SELECT lang, doc_id, w,
        SUM(w) OVER (PARTITION BY lang ORDER BY h, doc_id
                     ROWS UNBOUNDED PRECEDING) AS cumw,
        SUM(w) OVER (PARTITION BY lang) AS total
    FROM base
)
SELECT lang, doc_id, CAST(w AS BIGINT) AS w, CAST(cumw AS BIGINT) AS cumw
FROM staged
WHERE CAST(cumw AS BIGINT) // (CAST(total AS BIGINT) // {PPS_K})
      > (CAST(cumw AS BIGINT) - CAST(w AS BIGINT))
        // (CAST(total AS BIGINT) // {PPS_K})
ORDER BY lang, doc_id
"""


# ---------------------------------------------------------------------------
# sample_horvitz_thompson — design-based total estimation from PPS
# ---------------------------------------------------------------------------


def sample_horvitz_thompson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz–Thompson estimator over the Madow PPS sample
    (``sample_pps_systematic``'s design, closed-loop): estimate each
    language's TOTAL TOKEN count from only the sampled documents,
    weighting every draw by 1/π (π_i = min(1, w_i/skip) under
    systematic PPS with skip = total_chars div K) — then report the
    estimate against the true total, which is the audit that tells
    you whether the sampling design is usable for corpus accounting
    before anyone trusts sampled metrics at 100 TB.

    Exact integers: contributions are (y_i·skip) div w_i (truncating,
    all non-negative) with certainty units (w ≥ skip, π=1) passing y
    through; the relative error is integer micro-units.

    Scale: the sample is drawn with the same one-window + map-filter
    plan as the PPS op; the HT sum is a per-stratum reduce of K≈{PPS_K}
    rows; the true totals come from the same single corpus pass.
    """
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    h = hash32(F.col("doc_id").cast("string"))
    y = F.size(tokens_col("text")).cast("long")
    base = d.select(
        "lang",
        "doc_id",
        F.col("n_chars").alias("w"),
        y.alias("y"),
        h.alias("h"),
    )
    w_cum = W.partitionBy("lang").orderBy("h", "doc_id")
    staged = base.select(
        "lang",
        "doc_id",
        "w",
        "y",
        F.sum("w").over(w_cum.rowsBetween(W.unboundedPreceding, 0)).alias(
            "cumw"
        ),
        F.sum("w").over(W.partitionBy("lang")).alias("total"),
        F.sum("y").over(W.partitionBy("lang")).alias("true_tokens"),
    ).withColumn("skip", F.expr(f"total div {PPS_K}"))
    sampled = staged.filter(
        F.expr("cumw div skip") > F.expr("(cumw - w) div skip")
    ).select(
        "lang",
        "true_tokens",
        F.when(F.col("w") >= F.col("skip"), F.col("y"))
        .otherwise(
            F.expr("CAST((CAST(y AS DECIMAL(38,0)) * skip) div w AS BIGINT)")
        )
        .alias("contrib"),
    )
    out = sampled.groupBy("lang", "true_tokens").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("contrib").cast("long").alias("ht_tokens"),
    )
    return out.select(
        "lang",
        "n_sampled",
        "ht_tokens",
        F.col("true_tokens").cast("long").alias("true_tokens"),
        F.expr(
            "(1000000 * abs(ht_tokens - CAST(true_tokens AS BIGINT)))"
            " div true_tokens"
        ).alias("rel_err_micro"),
    ).orderBy("lang")


_HT_SQL = f"""
WITH base AS (
    SELECT lang, doc_id, n_chars AS w,
        CAST(len({sql_tokens("text")}) AS BIGINT) AS y,
        {sql_hash32("CAST(doc_id AS VARCHAR)")} AS h
    FROM documents
),
staged AS (
    SELECT lang, doc_id, w, y,
        CAST(SUM(w) OVER (PARTITION BY lang ORDER BY h, doc_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw,
        CAST(SUM(w) OVER (PARTITION BY lang) AS BIGINT) AS total,
        CAST(SUM(y) OVER (PARTITION BY lang) AS BIGINT) AS true_tokens
    FROM base
),
skipped AS (
    SELECT *, total // {PPS_K} AS skip FROM staged
),
sampled AS (
    SELECT lang, true_tokens,
        CASE WHEN w >= skip THEN y
             ELSE CAST((CAST(y AS HUGEINT) * skip) // w AS BIGINT)
        END AS contrib
    FROM skipped
    WHERE cumw // skip > (cumw - w) // skip
)
SELECT lang, COUNT(*) AS n_sampled,
    CAST(SUM(contrib) AS BIGINT) AS ht_tokens,
    true_tokens,
    (1000000 * ABS(CAST(SUM(contrib) AS BIGINT) - true_tokens))
        // true_tokens AS rel_err_micro
FROM sampled
GROUP BY lang, true_tokens
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# privacy_dp_laplace_counts — ε-DP noisy group counts (seeded, auditable)
# ---------------------------------------------------------------------------

DP_EPSILON_MICRO = 500_000  # ε = 0.5; sensitivity 1 ⇒ Laplace scale b = 2
DP_SALT = "dp_salt_r5"


def privacy_dp_laplace_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private per-language document counts via the
    Laplace mechanism — the release format privacy reviews ask for
    when group-by counts leave the enclave. Noise is drawn by INVERSE
    CDF from a SEEDED uniform (portable md5 hash of the group key +
    salt), which is what a reproducible DP release pipeline does
    anyway (draws must be auditable and replayable); the uniform is
    u = (h+½)/2³² − ½ ∈ (−½,½) strictly, so ln(1−2|u|) is finite.
    noise = −b·sign(u)·ln(1−2|u|), b = Δ/ε = 1/ε.

    The demo keeps the TRUE count column so the oracle (and a privacy
    auditor) can verify the mechanism exactly; a production release
    drops it — noted here so nobody ships this projection as-is.

    Scale: one count aggregate over the key domain; noise is O(1)
    arithmetic per GROUP, not per row.
    """
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_true"))
    h = hash32(F.concat(F.col("lang"), F.lit("|" + DP_SALT)))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0) - F.lit(0.5)
    b = F.lit(1e6 / DP_EPSILON_MICRO)
    noise = (
        -b
        * F.signum(u)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))
    )
    return counts.select(
        "lang",
        "n_true",
        F.lit(DP_EPSILON_MICRO).alias("epsilon_micro"),
        F.round(noise, 6).alias("noise"),
        F.round(F.col("n_true").cast("double") + noise, 6).alias("n_noisy"),
    ).orderBy("lang")


_DP_LAPLACE_SQL = f"""
WITH counts AS (
    SELECT lang, COUNT(*) AS n_true FROM documents GROUP BY lang
),
seeded AS (
    SELECT lang, n_true,
        (CAST({sql_hash32("lang || '|" + DP_SALT + "'")} AS DOUBLE) + 0.5)
            / 4294967296.0 - 0.5 AS u
    FROM counts
)
SELECT lang, n_true,
    CAST({DP_EPSILON_MICRO} AS INTEGER) AS epsilon_micro,
    ROUND(-{1e6 / DP_EPSILON_MICRO} * SIGN(u) * LN(1.0 - 2.0 * ABS(u)), 6)
        AS noise,
    ROUND(CAST(n_true AS DOUBLE)
          - {1e6 / DP_EPSILON_MICRO} * SIGN(u) * LN(1.0 - 2.0 * ABS(u)), 6)
        AS n_noisy
FROM seeded
ORDER BY lang
"""


NULLITY_BIG_ORDER = 400_000  # ~top 15% of o_totalprice — both sides populated


def quality_nullity_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md.pattern-style missingness audit over an entity-wide view —
    the first table a data QA pass prints: which COMBINATIONS of
    fields are absent together, not just per-field null rates
    (co-missingness is what breaks imputation and silently biases
    joins downstream).

    The wide view is customer-grain with two genuinely-optional
    facts: last event activity (only ~10% of customers appear in the
    events stream) and a big-ticket order (>= NULLITY_BIG_ORDER).
    Both optional columns arrive through LEFT joins against
    per-customer pre-aggregates, so the nulls are REAL relational
    nulls, not simulated.  Output: one row per observed null-pattern
    bitmap with its count and corpus share, plus per-field presence
    counts — exact integers.

    Scale: two partial-agg shuffles (events by user, orders by
    customer) then two hash equi-joins on the entity key and one
    ~2^k-row pattern aggregate.  No broadcast of the fact side; the
    final share window runs over the <= 4-row pattern table.
    """
    c = load(spark, sf_dir, "customer")
    ev = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    big = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= NULLITY_BIG_ORDER)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    wide = (
        c.select("c_custkey")
        .join(ev, "c_custkey", "left")
        .join(big, "c_custkey", "left")
        .select(
            F.col("n_events").isNotNull().cast("int").alias("has_events"),
            F.col("n_big").isNotNull().cast("int").alias("has_big_order"),
        )
    )
    pat = wide.groupBy("has_events", "has_big_order").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    from pyspark.sql import Window

    tot = Window.partitionBy()
    return pat.select(
        F.concat_ws(
            "", F.col("has_events"), F.col("has_big_order")
        ).alias("pattern"),
        "has_events",
        "has_big_order",
        "n_customers",
        F.expr(
            "(1000000 * n_customers)"
        ).cast("long").alias("_num"),
        F.sum("n_customers").over(tot).cast("long").alias("n_total"),
    ).select(
        "pattern",
        "has_events",
        "has_big_order",
        "n_customers",
        F.expr("_num div n_total").alias("share_micro"),
        "n_total",
    ).orderBy("pattern")


_NULLITY_SQL = f"""
WITH ev AS (
    SELECT user_id AS c_custkey, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
),
big AS (
    SELECT o_custkey AS c_custkey, CAST(COUNT(*) AS BIGINT) AS n_big
    FROM orders WHERE o_totalprice >= {NULLITY_BIG_ORDER}
    GROUP BY o_custkey
),
wide AS (
    SELECT CASE WHEN ev.n_events IS NOT NULL THEN 1 ELSE 0 END AS has_events,
           CASE WHEN big.n_big IS NOT NULL THEN 1 ELSE 0 END AS has_big_order
    FROM customer c
    LEFT JOIN ev ON c.c_custkey = ev.c_custkey
    LEFT JOIN big ON c.c_custkey = big.c_custkey
),
pat AS (
    SELECT has_events, has_big_order, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM wide GROUP BY has_events, has_big_order
)
SELECT CAST(has_events AS VARCHAR) || CAST(has_big_order AS VARCHAR)
           AS pattern,
       has_events, has_big_order, n_customers,
       (1000000 * n_customers)
           // CAST(SUM(n_customers) OVER () AS BIGINT) AS share_micro,
       CAST(SUM(n_customers) OVER () AS BIGINT) AS n_total
FROM pat
ORDER BY pattern
"""


QUERIES = {
    "quality_model_score": quality_model_score,
    "privacy_dp_laplace_counts": privacy_dp_laplace_counts,
    "sample_horvitz_thompson": sample_horvitz_thompson,
    "privacy_l_diversity": privacy_l_diversity,
    "privacy_randomized_response": privacy_randomized_response,
    "sample_pps_systematic": sample_pps_systematic,
    "quality_luhn_validation": quality_luhn_validation,
    "pii_detect": pii_detect,
    "decontam_ngram_overlap": decontam_ngram_overlap,
    "decontam_bloom_filter": decontam_bloom_filter,
    "privacy_k_anonymity": privacy_k_anonymity,
    "sample_stratified": sample_stratified,
    "sample_reservoir_per_group": sample_reservoir_per_group,
    "sample_train_val_test": sample_train_val_test,
    "quality_repetition": quality_repetition,
    "quality_nullity_patterns": quality_nullity_patterns,
}

ORACLES = {
    "quality_nullity_patterns": _NULLITY_SQL,
    "quality_model_score": _QUALITY_MODEL_SQL,
    "privacy_dp_laplace_counts": _DP_LAPLACE_SQL,
    "sample_horvitz_thompson": _HT_SQL,
    "sample_train_val_test": _SPLIT_SQL,
    "pii_detect": _PII_SQL,
    "decontam_ngram_overlap": _DECONTAM_SQL,
    "decontam_bloom_filter": _BLOOM_SQL,
    "privacy_k_anonymity": _KANON_SQL,
    "privacy_l_diversity": _LDIV_SQL,
    "privacy_randomized_response": _RR_SQL,
    "sample_pps_systematic": _PPS_SQL,
    "quality_luhn_validation": _LUHN_SQL,
    "sample_stratified": _SAMPLE_SQL,
    "sample_reservoir_per_group": _RESERVOIR_SQL,
    "quality_repetition": _QUALITY_SQL,
}
