"""Structured Streaming ingest path — the streaming twin of the
incremental-batch machinery.

The reference has no true streams (SURVEY §2.9); its landing-log +
tracking tables map naturally onto Structured Streaming: a file-source
stream over the landing directory, event-time watermark for late data,
windowed aggregation state, and an idempotent ``foreachBatch`` sink.
These helpers keep the stream declarations testable with the memory sink
(``processAllAvailable`` drives them synchronously in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a landing directory (explicit schema —
    streaming sources never infer)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def windowed_counts(
    events: DataFrame,
    *,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window rollup; late rows beyond the watermark
    are dropped from state (bounded memory at any scale)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def run_to_memory(df: DataFrame, name: str, mode: str = "append"):
    """Drive a streaming frame through the memory sink until drained."""
    q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    return q


def run_foreach_batch(df: DataFrame, sink, mode: str = "update"):
    """Exactly-once-ish sink: foreachBatch(batch_df, epoch_id) — the
    streaming analogue of the tracking tables' idempotent writes (I2)."""
    q = df.writeStream.outputMode(mode).foreachBatch(sink).start()
    q.processAllAvailable()
    return q
