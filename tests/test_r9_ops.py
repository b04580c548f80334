"""Round-9 guards: the scoped shuffle-partition trim (ADVICE r8 —
the session-global conf mutation in the fixpoint ops is a latent
hazard under concurrency) and the Bradley-Terry n_ij cleanup."""

from __future__ import annotations

from parquet_batch_spark.operators.stats_ops import _trimmed_shuffle_partitions


def test_trim_applies_and_restores_when_idle(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with _trimmed_shuffle_partitions(spark, 3):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_trim_restores_on_exception(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        with _trimmed_shuffle_partitions(spark, 2):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_trim_skipped_while_other_jobs_active(spark, monkeypatch):
    """If another thread has a job running in the same session, the
    trim must NOT touch the session-global conf (the other query's
    shuffles would narrow too) — the fixpoint just runs at full
    width."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")

    class FakeTracker:
        def getActiveJobsIds(self):
            return [7]

    monkeypatch.setattr(
        type(spark.sparkContext), "statusTracker", lambda self: FakeTracker()
    )
    with _trimmed_shuffle_partitions(spark, 1):
        assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
