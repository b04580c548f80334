"""Structured Streaming operators over the events table.

The events parquet doubles as a file stream (the standard replay
pattern): ``readStream`` over the same path, event-time windowing with
watermarks, results drained synchronously into a memory sink so the
driver's batch-oriented contract still gets a DataFrame back.

Determinism note: with ``availableNow`` + ``processAllAvailable`` the
whole table arrives as one logical replay, watermarks never discard
anything retroactively (append-mode results emit when the watermark
passes the window), so the tumbling/sliding results equal their batch
equivalents — which is exactly what the DuckDB oracles assert. The
stateful dedup query keeps only a rows-only check (cross-micro-batch
arrival order is not SQL-expressible).

Scale: event-time windowed aggregation state is partitioned by
(window, keys) across executors; watermarks bound state size — the
same plan runs against Kafka at cluster scale by swapping the source.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_batch_spark.catalog import table_path
from parquet_batch_spark.functions.numeric import dec

# events.ts is parquet TIMESTAMP(NANOS) → read as raw nanos (see
# catalog.load); the stream schema declares the post-read long type.
_EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # FileStreamSource needs a directory; select just the events file
    # from the scale-factor dir with a glob filter.
    raw = (
        spark.readStream.schema(_EVENTS_STREAM_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _drain(stream_df: DataFrame, spark: SparkSession, mode: str = "append") -> DataFrame:
    """Run the streaming query to completion into a memory sink and
    return the materialized result as a batch DataFrame.

    Windowed aggregations drain in ``complete`` mode: in append mode
    the final windows (whose end the watermark never passes before the
    availableNow replay terminates) would be withheld — complete mode
    emits every window, which is also what the batch oracle computes.
    """
    name = f"sink_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time windows with a 10-minute watermark:
    count + exact value sum per (window, event_type)."""
    ev = _event_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
    )
    out = _drain(agg, spark, mode="complete")
    return out.select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    ).orderBy("window_start", "event_type")


_STREAMING_TUMBLING_SQL = """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
    event_type,
    COUNT(*) AS n_events,
    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""


def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event lands in 2
    windows) with watermark — user-activity smoothing."""
    ev = _event_stream(spark, sf_dir)
    # COUNT(DISTINCT) is unsupported in streaming; exact sums instead.
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
    )
    out = _drain(agg, spark, mode="complete")
    return out.select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"),
        "n_events",
        "sum_value",
    ).orderBy("window_start")


_STREAMING_SLIDING_SQL = """
SELECT window_start, COUNT(*) AS n_events,
    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM (
    SELECT value,
        unnest([time_bucket(INTERVAL 30 MINUTES, ts),
                time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES]) AS window_start
    FROM events
)
GROUP BY window_start
ORDER BY window_start
"""


def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup: first event per (user_id, event_type)
    within the watermark horizon (dropDuplicatesWithinWatermark).

    No SQL oracle — cross-micro-batch arrival semantics are not
    batch-expressible; the driver records the rows-only check and
    tests assert the per-key uniqueness invariant.
    """
    ev = _event_stream(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type", "event_id", "ts")
    )
    out = _drain(deduped, spark)
    return out.orderBy("user_id", "event_type", "event_id")


QUERIES = {
    "streaming_tumbling_window": streaming_tumbling_window,
    "streaming_sliding_window": streaming_sliding_window,
    "streaming_dedup_watermark": streaming_dedup_watermark,
}

ORACLES = {
    "streaming_tumbling_window": _STREAMING_TUMBLING_SQL,
    "streaming_sliding_window": _STREAMING_SLIDING_SQL,
}
