"""Structured Streaming front-end.

The reference is strictly request/response (gunicorn workers,
bin/blackmagic.sh:4) — one HTTP POST per chip/tile. The Spark-native
replacement (BASELINE.json north-star) is a streaming *work queue*:
work items (cx, cy, acquired) arrive on a stream and ``foreachBatch``
runs the batch pipelines of plans/ over each micro-batch — all
reference semantics stay batch inside the micro-batch, so parity
needs no stateful operators.

Also provides the canonical event-stream rollup (watermarked tumbling
window) whose batch twin is registry.q_events_tumbling — same
aggregation expression, so the two can be cross-checked.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

WORK_ITEM = T.StructType([
    T.StructField("kind", T.StringType()),      # segment|tile|prediction
    T.StructField("cx", T.LongType()),
    T.StructField("cy", T.LongType()),
    T.StructField("acquired", T.StringType()),
])

EVENT = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def work_queue(spark: SparkSession, queue_dir: str,
               process: Callable[[DataFrame, int], None],
               checkpoint_dir: str,
               available_now: bool = True) -> StreamingQuery:
    """File-based work queue: JSON work items dropped into
    ``queue_dir`` are processed per micro-batch by ``process`` (which
    runs the batch pipelines and persists results idempotently —
    dynamic partition overwrite makes re-delivery safe).

    ``available_now=True`` drains the backlog and stops (test mode);
    False runs continuously.
    """
    stream = (spark.readStream.schema(WORK_ITEM)
              .option("maxFilesPerTrigger", 64)
              .json(queue_dir))
    writer = (stream.writeStream
              .foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def events_stream(spark: SparkSession, events_dir: str,
                  max_files_per_trigger: int = 8) -> DataFrame:
    """Parquet-directory event stream with the EVENT schema."""
    return (spark.readStream.schema(EVENT)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(events_dir))


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window rollup — the streaming twin of
    registry.q_events_tumbling. Late events beyond the watermark are
    dropped; state is bounded by (watermark / window) per key."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                 .cast("double").alias("total_value"))
            .select(F.col("win.start").alias("bucket"), "event_type",
                    "n", "total_value"))
