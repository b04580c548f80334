"""Invariant tests for the r7 changes (VERDICT r6 #2/#4, ADVICE r6).

The oracle-parity suite covers cross-engine hash equality; these pin
the fix semantics independently:

- the MCC / balanced-accuracy arithmetic no longer wraps int64 at
  realistic corpus sizes (the ADVICE r6 medium finding),
- ``sample_facility_location``'s distributed candidate draw matches
  the documented hash order exactly (same pool the removed O(N)
  driver sort produced),
- ``table_stats_profile_approx`` agrees with the exact profile on
  everything but the NDV path and plans WITHOUT the EXPAND the exact
  variant pays.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from parquet_batch_spark.catalog import load
from parquet_batch_spark.operators.similarity import (
    FL_CANDS,
    FL_ROUNDS,
    _fl_candidate_pools,
)
from parquet_batch_spark.operators.warehouse import (
    table_stats_profile,
    table_stats_profile_approx,
)


def test_mcc_arithmetic_survives_web_scale_cells(spark):
    """The confusion-cell algebra from ml_mcc_balanced_accuracy,
    evaluated on marginals far past the old int64 wrap point
    (each cell ~2.5e9 => the 4-marginal product ~6e38, the
    1e6-scaled balanced-accuracy numerator ~2.5e25).  The old
    BIGINT-multiply version wrapped silently here; the fixed
    double/decimal paths must produce the closed-form answers."""
    tp, fp, fn, tn = 2_500_000_000, 500_000_000, 1_500_000_000, 3_000_000_000
    cells = spark.createDataFrame(
        [(tp, fp, fn, tn)], "tp long, fp long, fn long, tn long"
    )
    row = cells.select(
        F.floor(
            1_000_000.0
            * (F.col("tp").cast("double") * F.col("tn")
               - F.col("fp").cast("double") * F.col("fn"))
            / F.sqrt(
                (F.col("tp") + F.col("fp")).cast("double")
                * (F.col("tp") + F.col("fn")).cast("double")
                * (F.col("tn") + F.col("fp")).cast("double")
                * (F.col("tn") + F.col("fn")).cast("double")
            )
        ).cast("long").alias("mcc_micro"),
        F.expr(
            "cast((1000000 * cast(tp as decimal(20,0)) * (tn + fp)"
            " + 1000000 * cast(tn as decimal(20,0)) * (tp + fn))"
            " div (2 * cast(tp + fn as decimal(20,0)) * (tn + fp))"
            " as bigint)"
        ).alias("bacc_micro"),
        F.expr(
            "cast((1000000 * cast(tp as decimal(20,0))) div (tp + fn)"
            " + (1000000 * cast(tn as decimal(20,0))) div (tn + fp)"
            " - 1000000 as bigint)"
        ).alias("youden_micro"),
    ).collect()[0]
    # closed forms in exact Python integer/float arithmetic
    import math

    num = float(tp) * tn - float(fp) * fn
    den = math.sqrt(
        float(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert row["mcc_micro"] == math.floor(1_000_000.0 * num / den)
    bacc = (1_000_000 * tp * (tn + fp) + 1_000_000 * tn * (tp + fn)) // (
        2 * (tp + fn) * (tn + fp)
    )
    assert row["bacc_micro"] == bacc
    youden = (
        1_000_000 * tp // (tp + fn) + 1_000_000 * tn // (tn + fp) - 1_000_000
    )
    assert row["youden_micro"] == youden
    # sanity: the old wrap point is well behind us
    assert (tp + fp) * (tp + fn) > 2**63  # would have wrapped in int64


def test_fl_candidate_draw_matches_hash_order(spark, sf_dir):
    """The single-job distributed draw returns, per round, the top
    (FL_CANDS + FL_ROUNDS - 1) vec_ids under the documented portable
    hash order (md5('fl{round}:{id}') first 8 hex chars,
    id-tiebroken) — wide enough that excluding up to FL_ROUNDS - 1
    already-selected ids and truncating to FL_CANDS is bit-identical
    to the oracle's exclusion-before-limit on the full id set."""
    base = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id")
        .limit(500)
        .persist()
    )
    ids = [int(r["vec_id"]) for r in base.collect()]

    def py_order(rnd):
        return sorted(
            ids,
            key=lambda i: (
                int(
                    hashlib.md5(f"fl{rnd}:{i}".encode()).hexdigest()[:8], 16
                ),
                i,
            ),
        )

    pools, vecs = _fl_candidate_pools(base)
    assert vecs == {}  # no vector column on this base: ids only
    assert len(pools) == FL_ROUNDS
    k = FL_CANDS + FL_ROUNDS - 1
    for rnd, pool in enumerate(pools):
        assert pool == py_order(rnd)[:k]
    # exclusion-then-truncate equals WHERE-then-LIMIT on the full set
    excl = set(pools[0][:FL_ROUNDS - 1])
    truncated = [c for c in pools[1] if c not in excl][:FL_CANDS]
    full = [c for c in py_order(1) if c not in excl][:FL_CANDS]
    assert truncated == full
    base.unpersist()


def test_stats_profile_approx_matches_exact_profile(spark, sf_dir):
    """Row counts, null counts, exact NDV, and min/max agree with the
    exact variant column-for-column, and every HLL++ estimate sits in
    the 10 % band (the boolean the oracle pins to TRUE; ADVICE r7
    widened it from 5 % — 2.5 sigma at rsd 2 % — so a regenerated
    dataset can't flip parity).  The TIGHT band lives here instead:
    this test may legitimately fail on regeneration, the oracle must
    not."""
    exact = {
        r["col_name"]: r.asDict()
        for r in table_stats_profile(spark, sf_dir).collect()
    }
    approx = {
        r["col_name"]: r.asDict()
        for r in table_stats_profile_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for col, e in exact.items():
        a = approx[col]
        for k in ("n_rows", "n_nulls", "ndv", "min_val", "max_val"):
            assert a[k] == e[k], (col, k, a[k], e[k])
        assert a["ndv_within_10pct"] is True, col

    # tight-band assertion (not in the oracle): HLL++ at rsd 2 % on
    # this data actually lands within 5 % of exact for every column
    from pyspark.sql import functions as F

    from parquet_batch_spark.catalog import load

    li = load(spark, sf_dir, "lineitem")
    for col in exact:
        a, e = li.agg(
            F.approx_count_distinct(col, 0.02), F.countDistinct(col)
        ).collect()[0]
        assert e == 0 or abs(a / e - 1.0) <= 0.05, (col, a, e)


def test_stats_profile_approx_plans_without_expand(spark, sf_dir):
    """The point of the op: no EXPAND (the exact variant replicates
    every fact row once per distinct aggregate), and each union branch
    scans exactly one pruned column."""
    import re

    plan = (
        table_stats_profile_approx(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert len(schemas) == 4
    assert all(s.count(":") == 1 for s in schemas), schemas


def test_overflow_swept_expressions_survive_web_scale(spark):
    """r7 overflow sweep: the N²-scale count products found in the
    package-wide audit (McNemar χ², lift, AUC rank algebra, Cohen's κ
    chance term, BM25 length ratio, graph densities) evaluated at
    marginals far past the int64 wrap point, against exact Python
    integer arithmetic."""
    N = 4_000_000_000  # 4e9: N² ~ 1.6e19 > int64 max
    b, c = 2_500_000_000, 1_200_000_000
    df_ = spark.createDataFrame(
        [(N, b, c)], "n long, b long, c long"
    )
    row = df_.selectExpr(
        "cast((1000000 * cast(abs(b - c) - 1 as decimal(19,0))"
        " * (abs(b - c) - 1)) div (b + c) as bigint) as mcnemar",
        # lift: cum_pos=b, n_total=n, pos_total=c, cum_n=n
        "cast((1000000 * cast(b as decimal(19,0)) * n)"
        " div (cast(c as decimal(19,0)) * n) as bigint) as lift",
        # kappa chance term: a=b, src=c*c (as decimal), n literal
        "cast((1000000 * (n * cast(b as decimal(19,0))"
        " - cast(c as decimal(19,0)) * c))"
        " div (cast(n as decimal(19,0)) * n"
        " - cast(c as decimal(19,0)) * c) as bigint) as kappa",
        # graph density: edges=b, nodes=n
        "cast((2000000 * cast(b as decimal(19,0)))"
        " div (cast(n as decimal(19,0)) * (n - 1)) as bigint) as phi",
    ).collect()[0]

    def tdiv(a, d):
        q = abs(a) // abs(d)
        return q if (a >= 0) == (d >= 0) else -q

    assert row["mcnemar"] == tdiv(
        1_000_000 * (abs(b - c) - 1) ** 2, b + c
    )
    assert row["lift"] == tdiv(1_000_000 * b * N, c * N)
    assert row["kappa"] == tdiv(
        1_000_000 * (N * b - c * c), N * N - c * c
    )
    assert row["phi"] == tdiv(2_000_000 * b, N * (N - 1))
    assert (b + c) * (b + c) > 2**63  # past the old wrap point


def test_fan_out_bin_packing_estimate(spark, tmp_path):
    """fan_out's parallelism estimate reproduces Spark's file
    bin-packing EXACTLY (ADVICE r7 replaced the ceil(totalWithCost/
    split) approximation, which over-counted near boundaries and
    skipped spreads the contract intends), so its skip/spread
    decision must equal `actual partitions >= target`:

    - many tiny files: openCost bin-packing usually lands BELOW
      target (floor(split/openCost)+1 chunks per bin), so the spread
      the old estimate skipped must now happen,
    - ONE small file: one input split -> the spread must happen
      (this is the case the helper exists for),
    - a non-file-backed frame: documented safe default is to spread.
    """
    from parquet_batch_spark.catalog import fan_out

    target = spark.sparkContext.defaultParallelism

    tiny = str(tmp_path / "tiny")
    spark.range(2 * target).repartition(2 * target).write.parquet(tiny)
    df = spark.read.parquet(tiny)
    assert len(df.inputFiles()) >= target
    actual = df.rdd.getNumPartitions()
    out = fan_out(df, spark)
    if actual >= target:
        assert out is df  # no redundant shuffle
    else:
        assert out is not df  # under-parallelized scan: must spread
        assert out.rdd.getNumPartitions() == target

    one = str(tmp_path / "one")
    spark.range(10_000).coalesce(1).write.parquet(one)
    dfo = spark.read.parquet(one)
    assert dfo.rdd.getNumPartitions() < target
    out1 = fan_out(dfo, spark)
    assert out1 is not dfo
    assert out1.rdd.getNumPartitions() == target

    mem = spark.range(100)
    out2 = fan_out(mem, spark)
    assert out2.rdd.getNumPartitions() == target


def test_pack_estimate_matches_spark_exactly(spark, tmp_path):
    """_spark_pack_estimate reproduces Spark's FilePartition packing
    byte-for-byte on real scans, including ADVICE r7's boundary case
    (one file a bit over 2 split sizes, where the old
    ceil(totalWithCost/split) over-counted by one and fan_out skipped
    a spread it should have made)."""
    import os

    from parquet_batch_spark.catalog import _spark_pack_estimate

    target = spark.sparkContext.defaultParallelism

    # ~10 MB single file: with openCost padding the split lands near
    # total/target, so the estimate sits exactly on the boundary the
    # advisor flagged (est must equal Spark's packing, not exceed it)
    big = str(tmp_path / "big")
    spark.range(1_500_000).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("pad")
    ).coalesce(1).write.parquet(big)
    for path in (big, str(tmp_path / "big2")):
        if path != big:
            spark.range(40_000).repartition(6).write.parquet(path)
        df = spark.read.parquet(path)
        sizes = [
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        ]
        est = _spark_pack_estimate(sizes, target)
        actual = df.rdd.getNumPartitions()
        assert est == actual, (path, sizes, est, actual)

    # zero-length files yield NO chunk in Spark's splitFiles (the
    # `0 until length by split` loop is empty), so they must not add
    # partitions or charge pack-time open cost — they only pad the
    # split-size derivation's totalBytes, as Spark's arithmetic does
    ten_mb = 10 << 20
    assert _spark_pack_estimate([0, 0, 0], target) == 1
    # the zero-padded layout's totalBytes carries 4 open costs, so its
    # split only reaches the 4 MiB openCost floor at target >= 6
    # (27 MiB-ish total / 6 < floor); below that the layouts pack
    # differently BY SPARK'S OWN ARITHMETIC (ADVICE r8: the old literal
    # `== 3` failed on hosts with defaultParallelism <= 5 even though
    # the estimate was correct) — pin the floor case at a fixed target
    # instead of the host's core count, then sanity-check the host
    # value against an explicit re-derivation of the split formula
    assert (
        _spark_pack_estimate([0, 0, 0, ten_mb], 8)
        == _spark_pack_estimate([ten_mb], 8)
        == 3
    )
    open_cost = 4 << 20
    for sizes in ([0, 0, 0, ten_mb], [ten_mb]):
        split = min(
            128 << 20,
            max(open_cost, (sum(sizes) + open_cost * len(sizes)) // target),
        )
        n_full, rem = divmod(ten_mb, split)
        # every chunk + its open cost exceeds the split here, so each
        # chunk packs alone: expected = chunk count
        assert _spark_pack_estimate(sizes, target) == n_full + (1 if rem else 0)


def test_overflow_swept_rank_and_moment_sums_survive_web_scale(spark):
    """The second half of the r7 sweep: rank-sum products
    (Mann-Whitney / AUC two_r1), word second moments (burstiness
    fano), and BM25's length/score terms, at magnitudes where the old
    BIGINT paths wrapped, against exact Python integers."""
    n1, below, n, nb = 3_000_000_000, 5_000_000_000, 2_000_000_000, 4_000_000_000
    s, s2, df_, ndocs = 6_000_000_000, 4 * 10**19, 2_000_000_000, 10**12
    dl, tf, ddf = 100_000, 900, 800_000_000_000
    frame = spark.createDataFrame(
        [(n1, below, n, nb, s, df_, dl, tf, ddf)],
        "n1 long, below long, n long, nb long, s long, df long,"
        " dl long, tf long, ddf long",
    ).withColumn("s2", F.lit(str(s2)).cast("decimal(38,0)"))
    row = frame.selectExpr(
        # MWU/AUC rank product: n1 * (2*below + n + nb + 1)
        "cast(cast(n1 as decimal(19,0))"
        " * (2 * below + n + nb + 1) as decimal(38,0)) as two_r",
        # burstiness fano: (1e6 * (N*s2 - s^2)) div (N*s)
        f"cast((1000000 * ({ndocs} * s2"
        f" - cast(s as decimal(19,0)) * s))"
        f" div ({ndocs} * cast(s as decimal(19,0))) as bigint) as fano",
        # BM25 r_milli: (1000 * dl * n_docs) div sum_dl  (sum_dl = s)
        f"cast((1000 * cast(dl as decimal(19,0)) * {ndocs})"
        " div s as bigint) as r_milli",
        # BM25 score numerator/denominator with df ~ 8e11 docs
        f"cast((1000000 * cast(2 * ({ndocs} - ddf) + 1 as decimal(19,0))"
        " * (2200 * tf))"
        " div (cast(2 * ddf + 1 as decimal(19,0))"
        "      * (1000 * tf + 300)) as bigint) as score",
    ).collect()[0]
    assert int(row["two_r"]) == n1 * (2 * below + n + nb + 1)
    assert n1 * (2 * below + n + nb + 1) > 2**63  # old path wrapped
    assert row["fano"] == (1_000_000 * (ndocs * s2 - s * s)) // (ndocs * s)
    assert row["r_milli"] == (1000 * dl * ndocs) // s
    assert row["score"] == (
        1_000_000 * (2 * (ndocs - ddf) + 1) * (2200 * tf)
    ) // ((2 * ddf + 1) * (1000 * tf + 300))
