"""Similarity search over the embeddings table (north-star).

Two paths:

- ``ann_bruteforce_topk``: exact cosine top-k for a query set —
  broadcast the (small) query side, score with JVM higher-order
  functions, rank with a per-query window. This is the correctness
  baseline and the right plan whenever |queries| is broadcast-able;
  the fact side streams once regardless of corpus size. Oracle-exact.

- ``ann_lsh_bucketed``: random-hyperplane LSH (seeded, deterministic)
  → bucket vectors by sign bits → probe only the query's bucket ±
  multiprobe neighbors. The 100 TB path: candidate generation is an
  equi-join on bucket id (one shuffle), score only candidates. Exact
  recall is not guaranteed → registered without an oracle (driver
  records the weaker rows-only check), but a test asserts recall ≥
  0.8 against the brute-force baseline at sf0.01.

Hyperplanes are derived from the portable hash family (no RNG at
query time): plane p, dim d weight = (affine-LCG(p, d) / P) * 2 - 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parquet_batch_spark.catalog import fan_out, load
from parquet_batch_spark.functions.hashing import MERSENNE_P

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 serve as the query set
N_PLANES = 8


def _dvec(col: str = "embedding"):
    return F.transform(col, lambda x: x.cast("double"))


def _norm(v):
    return F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for each query vector (vec_id<10),
    self excluded; ties broken by neighbor id."""
    em = fan_out(load(spark, sf_dir, "embeddings"), spark)
    base = em.select("vec_id", _dvec().alias("v"))
    base = base.select("vec_id", "v", _norm(F.col("v")).alias("nrm"))
    queries = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    cos = dot / (F.col("nrm") * F.col("qnrm"))
    scored = (
        base.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_sim", cos)
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos_sim", 6).alias("cos_sim"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


_ANN_BRUTE_SQL = f"""
WITH nv AS (
    SELECT vec_id,
        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
base AS (
    SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM nv
),
scored AS (
    SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
        list_sum(list_transform(generate_series(1, len(b.v)), i -> b.v[i] * q.v[i]))
            / (b.nrm * q.nrm) AS cos_raw
    FROM base b
    JOIN base q ON q.vec_id < {N_QUERIES} AND b.vec_id <> q.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cos_raw,
        ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY cos_raw DESC, neighbor_id) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cos_sim, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------- LSH path

def _plane_weight(p: int, d: int) -> float:
    """Deterministic pseudo-random weight in [-1, 1) for plane p, dim d
    (LCG on (p*997 + d), same constants as hashing.hash_params)."""
    state = (p * 997 + d + 1) * 1103515245 + 12345
    state %= 1 << 31
    return (state / float(1 << 31)) * 2.0 - 1.0


def _bucket_col(v, dim: int = 64):
    """Sign-bit bucket id from N_PLANES seeded hyperplanes (JVM-side:
    the per-plane dot product is an aggregate over zip of literals)."""
    bucket = F.lit(0)
    for p in range(N_PLANES):
        weights = F.array(*[F.lit(_plane_weight(p, d)) for d in range(dim)])
        dot = F.aggregate(
            F.zip_with(v, weights, lambda x, w: x * w), F.lit(0.0), lambda a, x: a + x
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-5 via random-hyperplane LSH buckets.

    Candidates = vectors whose bucket id is within hamming distance 2
    of the query's bucket (multiprobe: the query explodes into its
    bucket + all 1-bit and 2-bit flips, 37 probes over 256 buckets ≈
    14% of the corpus); candidate generation is then an EQUI-join on
    bucket id — the shape that scales: no broadcast of the corpus, no
    n² scoring. Recall depends on how clustered the embedding space
    is; the driver's synthetic vectors are near-uniform (the hardest
    case), where tests assert ≥3× lift over a random-candidate scan.
    """
    em = fan_out(load(spark, sf_dir, "embeddings"), spark)
    base = em.select("vec_id", _dvec().alias("v"))
    base = base.select(
        "vec_id", "v", _norm(F.col("v")).alias("nrm"), _bucket_col(F.col("v")).alias("bucket")
    )
    flips = [0] + [1 << p for p in range(N_PLANES)] + [
        (1 << p) | (1 << q)
        for p in range(N_PLANES)
        for q in range(p + 1, N_PLANES)
    ]
    queries = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in flips])
        ).alias("probe_bucket"),
    )
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    cos = dot / (F.col("nrm") * F.col("qnrm"))
    cands = (
        base.join(queries, F.col("bucket") == F.col("probe_bucket"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
        .withColumn("cos_sim", cos)
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos_sim", 6).alias("cos_sim"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


# ann_lsh_bucketed is *approximate relative to brute force* but fully
# DETERMINISTIC (LCG-seeded hyperplanes, fixed multiprobe set), so it
# still gets an exact SQL oracle: DuckDB recomputes the same buckets
# from the same inlined plane weights. tests/test_similarity.py
# additionally asserts recall ≥ 0.8 vs the exact top-k.

_DIM = 64


def _sql_plane_list(p: int, dim: int = _DIM) -> str:
    return "[" + ", ".join(repr(_plane_weight(p, d)) for d in range(dim)) + "]"


_SQL_BUCKET = "\n        + ".join(
    f"(CASE WHEN list_sum(list_transform(generate_series(1, {_DIM}),"
    f" i -> v[i] * ({_sql_plane_list(p)})[i])) > 0 THEN {1 << p} ELSE 0 END)"
    for p in range(N_PLANES)
)

_FLIPS = [0] + [1 << p for p in range(N_PLANES)] + [
    (1 << p) | (1 << q) for p in range(N_PLANES) for q in range(p + 1, N_PLANES)
]

_ANN_LSH_SQL = f"""
WITH nv AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
base AS (
    SELECT vec_id, v,
        sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
        {_SQL_BUCKET} AS bucket
    FROM nv
),
probes AS (
    SELECT vec_id AS query_id, v AS qv, nrm AS qnrm,
        xor(bucket, f) AS probe_bucket
    FROM base, unnest({_FLIPS}) AS t(f)
    WHERE vec_id < {N_QUERIES}
),
cands AS (
    SELECT DISTINCT p.query_id, b.vec_id AS neighbor_id,
        list_sum(list_transform(generate_series(1, {_DIM}), i -> b.v[i] * p.qv[i]))
            / (b.nrm * p.qnrm) AS cos_raw
    FROM base b
    JOIN probes p ON b.bucket = p.probe_bucket AND b.vec_id <> p.query_id
),
ranked AS (
    SELECT query_id, neighbor_id, cos_raw,
        ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY cos_raw DESC, neighbor_id) AS rank
    FROM cands
)
SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cos_sim, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------- IVF path

IVF_K = 16  # coarse-quantizer cells
IVF_ITERS = 3  # fixed Lloyd iterations (determinism > marginal quality)
IVF_NPROBE = 4  # cells probed per query


def _ivf_assignments(spark: SparkSession, sf_dir: str):
    """Deterministic IVF coarse quantizer: seed centroids are the
    vectors with the IVF_K smallest vec_ids, refined by IVF_ITERS fixed
    Lloyd iterations (assign via numpy mapInPandas, re-center via
    groupBy avg — one shuffle per iteration, centroids broadcast).
    Returns (assignments df: vec_id, v, cell; centroids: {cell: np
    array}). Fixed iteration count keeps the operator deterministic —
    no convergence-dependent results across runs or cluster sizes."""
    import numpy as np

    em = fan_out(load(spark, sf_dir, "embeddings"), spark)
    base = em.select("vec_id", _dvec().alias("v"))
    cents = np.asarray(
        [
            np.asarray(r["v"], dtype=np.float64)
            for r in base.orderBy("vec_id").limit(IVF_K).collect()
        ]
    )

    def assigner(centroids):
        def assign(batches):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.asarray([np.asarray(x) for x in pdf["v"]], dtype=np.float64)
                # nearest centroid by L2; ties break to the lower cell id
                d2 = ((V[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "v": pdf["v"],
                        "cell": d2.argmin(axis=1).astype("int32"),
                    }
                )

        return assign

    schema = "vec_id long, v array<double>, cell int"
    assigned = base.mapInPandas(assigner(cents), schema=schema)
    for _ in range(IVF_ITERS):
        means = (
            assigned.select(
                "cell", F.posexplode("v").alias("dim", "x")
            )
            .groupBy("cell", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new_cents = cents.copy()
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["dim"]] = r["m"]
        for cell, dims in by_cell.items():
            for dim, m in dims.items():
                new_cents[cell, dim] = m
        cents = new_cents
        assigned = base.mapInPandas(assigner(cents), schema=schema)
    return assigned, cents


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-5: the third ANN tier after
    brute-force (exact) and hyperplane LSH. A coarse quantizer
    partitions the corpus into IVF_K cells; each query scores only the
    IVF_NPROBE nearest cells' vectors — candidate generation is an
    equi-join on cell id, the same bucketed topology that scales to
    100 TB (cells ≈ partitions; a real deployment raises K with corpus
    size and stores cells clustered on disk so probes are partition
    prunes). Deterministic (fixed seeds/iterations) but its results
    encode float k-means geometry, which SQL can't reproduce readably —
    registered rows-only (driver), with recall vs the exact baseline
    pinned in tests/test_similarity.py."""
    import numpy as np

    assigned, cents = _ivf_assignments(spark, sf_dir)
    # query -> its IVF_NPROBE nearest cells (driver-side: K×Q tiny)
    queries = assigned.filter(F.col("vec_id") < N_QUERIES).collect()
    probe_rows = []
    for r in queries:
        qv = np.asarray(r["v"], dtype=np.float64)
        d2 = ((cents - qv[None, :]) ** 2).sum(axis=1)
        for cell in np.argsort(d2, kind="stable")[:IVF_NPROBE]:
            probe_rows.append((r["vec_id"], int(cell), r["v"]))
    probes = spark.createDataFrame(
        probe_rows, "query_id long, cell int, qv array<double>"
    )
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    nrm = _norm(F.col("v"))
    qnrm = _norm(F.col("qv"))
    cands = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_sim", dot / (nrm * qnrm))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos_sim", 6).alias("cos_sim"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


QUERIES = {
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "ann_lsh_bucketed": ann_lsh_bucketed,
    "ann_ivf_topk": ann_ivf_topk,
}

ORACLES = {
    "ann_bruteforce_topk": _ANN_BRUTE_SQL,
    "ann_lsh_bucketed": _ANN_LSH_SQL,
    # ann_ivf_topk: rows-only by design (float k-means geometry is not
    # readably SQL-expressible; recall pinned in tests/test_similarity.py)
}
