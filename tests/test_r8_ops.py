"""Round-8 invariants: the ADVICE r7 fixes (saturation parity, NDV
band guard, fused facility-location draw) pinned against closed forms
and cross-engine behavior."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from parquet_batch_spark.catalog import load
from parquet_batch_spark.operators.similarity import (
    FL_ROUNDS,
    _fl_candidate_pools,
)

INT64_MAX = 9223372036854775807


def test_fl_fused_draw_returns_pool_vectors(spark, sf_dir):
    """The single draw job carries the vector column through the
    TakeOrderedAndProject union (VERDICT r7 #5), so the returned map
    covers exactly the pooled ids and matches the source vectors."""
    base = (
        load(spark, sf_dir, "embeddings")
        .limit(300)
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        .persist()
    )
    pools, vecs = _fl_candidate_pools(base)
    pool_ids = {c for p in pools for c in p}
    assert set(vecs) == pool_ids
    assert len(pools) == FL_ROUNDS
    src = {
        int(r["vec_id"]): [float(x) for x in r["v"]]
        for r in base.filter(F.col("vec_id").isin(sorted(pool_ids))).collect()
    }
    assert vecs == src
    base.unpersist()


def test_sum_rc_saturation_matches_across_engines(spark):
    """ADVICE r7: the kappa sum_rc diagnostic past int64 range must
    SATURATE identically on both engines — the old bare casts silently
    NULLed in non-ANSI Spark but errored in DuckDB."""
    big = str(2**70)  # a marginal product far past int64
    row = spark.sql(
        f"""SELECT CAST(LEAST(CAST('{big}' AS DECIMAL(38,0)),
                    CAST('{INT64_MAX}' AS DECIMAL(38,0))) AS BIGINT) AS v"""
    ).collect()[0]
    duck = duckdb.sql(
        f"""SELECT CAST(LEAST(CAST('{big}' AS HUGEINT),
                    CAST({INT64_MAX} AS HUGEINT)) AS BIGINT) AS v"""
    ).fetchone()[0]
    assert row["v"] == duck == INT64_MAX

    # the in-range path is the identity on both engines
    row = spark.sql(
        f"""SELECT CAST(LEAST(CAST(12345 AS DECIMAL(38,0)),
                    CAST('{INT64_MAX}' AS DECIMAL(38,0))) AS BIGINT) AS v"""
    ).collect()[0]
    assert row["v"] == 12345


def test_ndv_band_guard_all_null_column(spark):
    """ADVICE r7: an all-null column (exact NDV 0, approx 0) must read
    as in-band TRUE.  Unguarded, 0/0 is a DIVIDE_BY_ZERO error under
    ANSI (Spark 4 default) and a NaN <= threshold = false otherwise —
    wrong against the oracle's TRUE either way."""
    df = spark.range(100).select(F.lit(None).cast("string").alias("c"))
    approx = F.approx_count_distinct("c", 0.02)
    exact = F.countDistinct("c")
    band = (
        F.abs(approx.cast("double") / exact.cast("double") - F.lit(1.0))
        <= F.lit(0.10)
    )
    guarded = F.when(exact == 0, F.lit(True)).otherwise(band)
    row = df.agg(guarded.alias("g"), exact.alias("e")).collect()[0]
    assert row["e"] == 0
    assert row["g"] is True
    # the bug the guard exists for: unguarded, the same band errors
    # (ANSI) or reads false (non-ANSI) — never TRUE
    ansi = spark.conf.get("spark.sql.ansi.enabled") == "true"
    if ansi:
        with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
            df.agg(band.alias("u")).collect()
    else:
        assert not df.agg(band.alias("u")).collect()[0]["u"]


def test_streaming_drain_stops_query_on_drain_failure(spark, monkeypatch):
    """ADVICE r7: an exception during the drain must not leak a
    RUNNING streaming query.  A query whose micro-batch fails
    self-terminates (not the leak case); the leak is an interrupting
    exception — py4j hiccup, KeyboardInterrupt — thrown by the drain
    call itself while the query is healthy.  Simulate exactly that by
    making awaitTermination raise on the PRODUCTION `_drain`, and
    assert the healthy query is not left in spark.streams.active —
    reverting the q.stop()-in-finally fix makes this leak (verified:
    without the fix this test fails with the query still active)."""
    from pyspark.sql.streaming import StreamingQuery

    from parquet_batch_spark.streaming.windows import _drain

    n_before = len(spark.streams.active)

    def interrupted(self, *a, **k):
        raise RuntimeError("simulated drain interruption")

    monkeypatch.setattr(StreamingQuery, "awaitTermination", interrupted)
    healthy = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", "8")
        .load()
    )
    with pytest.raises(RuntimeError, match="simulated drain interruption"):
        _drain(healthy, spark, shuffle_partitions=2)
    assert len(spark.streams.active) == n_before, [
        q.name for q in spark.streams.active
    ]
