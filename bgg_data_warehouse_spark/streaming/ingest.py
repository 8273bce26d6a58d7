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


def interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    *,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each purchase matched to the same
    user's clicks in the preceding ``horizon`` (click-to-buy
    attribution). Both sides are watermarked and the join condition
    time-bounds BOTH event times, so Spark can expire join state — an
    unbounded stream-stream join would buffer both streams forever.
    State per key ≈ rows inside (watermark + horizon), independent of
    stream length: the property that keeps this runnable on an
    unbounded 100 TB/day feed."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        "purchase_value",
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


_DEDUP_COLS = ["event_id", "ts", "user_id", "event_type", "value"]


def make_dedup_handler(ttl_minutes: int | None):
    """Build the applyInPandasWithState handler for stateful dedup.

    Module-level so tests can drive the timeout branch with a fake
    GroupState instead of waiting out a processing-time TTL.
    """
    import pandas as pd

    def dedup(key, pdfs, state):
        if state.hasTimedOut:
            # TTL fired for this shard: actually free the state (emit
            # nothing). Without this the handler would re-update and
            # re-arm the timeout, so 'seen' sets would grow forever in a
            # long-running stream — the lease analogue must expire.
            state.remove()
            yield pd.DataFrame(columns=_DEDUP_COLS)
            return
        seen = set(state.get[0]) if state.exists else set()
        rows = []
        for pdf in pdfs:
            for _, r in pdf.iterrows():
                eid = int(r["event_id"])
                if eid not in seen:
                    seen.add(eid)
                    rows.append(r)
        state.update((list(seen),))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        yield pd.DataFrame(rows)[_DEDUP_COLS] if rows else pd.DataFrame(columns=_DEDUP_COLS)

    return dedup


def dedup_stream_stateful(events: DataFrame, *, ttl_minutes: int | None = 60) -> DataFrame:
    """Custom stateful operator: streaming exactly-once-ish dedup by event_id.

    The streaming analogue of the fetch_in_progress lease table (I3 —
    `/root/reference/src/modules/response_fetcher.py:60-64`): per-key state
    remembers ids already emitted; a processing-time timeout expires state
    after ``ttl_minutes`` exactly like the 30-minute lease expiry. Built on
    ``applyInPandasWithState`` — the GroupState API with Arrow batches.

    Keys are hash-partitioned ``event_id % 64`` groups so state stays
    bounded per key and scales with executor count, not with key count.

    ``ttl_minutes=None`` disables the timeout — needed for bounded tests:
    with ProcessingTimeTimeout the query keeps scheduling state-cleanup
    micro-batches, so ``processAllAvailable`` never drains.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    state_schema = "seen array<long>"

    dedup = make_dedup_handler(ttl_minutes)
    keyed = events.withColumn("shard", F.pmod(F.col("event_id"), F.lit(64)))
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
