"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default all cores),
but every config here is chosen to also be the right default on a
1000-executor cluster reading ~100 TB:

- AQE on (runtime partition coalescing, skew-join splitting) so shuffle
  partition counts self-tune with real data sizes.
- UTC session timezone so results are oracle-comparable (DuckDB
  timestamps are naive/UTC).
- Arrow-accelerated Python interchange for the Pandas-UDF slow path.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE coalescing makes the static number mostly irrelevant.

Local-mode assumption (ADVICE r12): operators use
``DataFrame.localCheckpoint`` to truncate iterative/shared-subtree
lineage.  Local checkpoints live in non-replicated executor-local
blocks — correct and cheap on the ``local[n]`` deployments this
engine targets, but on a multi-executor cluster an executor loss
makes an in-flight query fail unrecoverably; a cluster deployment
should swap those sites to reliable ``checkpoint()`` (or persisted
tables) via a shared wrapper if that failure mode matters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEF_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "*")


def get_spark(app_name: str = "parquet_batch_spark", cpus: str | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Parameters mirror what a cluster deployment would set via
    spark-submit; only local-mode knobs live here.
    """
    cpus = cpus or _DEF_CPUS
    # Shuffle partitions track the ACTUAL worker count when it is
    # explicit (the $SPARK_GRAFT_CPUS contract — the driver also runs
    # at a lower core count, where planning os.cpu_count() tasks per
    # stage is pure scheduling overhead); "*" keeps the machine size.
    n_shuffle = int(cpus) if str(cpus).isdigit() else (os.cpu_count() or 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # events.ts is parquet TIMESTAMP(NANOS) which Spark has no native
        # type for; read as raw nanos and convert in the catalog loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    # Deployment-tuning hook: ``SPARK_GRAFT_CONF="k=v;k=v"`` applies
    # LAST, so any default above can be overridden per environment
    # (cluster submit, config sweeps) without code edits.
    extra = os.environ.get("SPARK_GRAFT_CONF", "")
    for kv in filter(None, (s.strip() for s in extra.split(";"))):
        k, _, v = kv.partition("=")
        builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
