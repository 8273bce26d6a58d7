"""Watermarked windowed rollup (streaming/windowed.py): the streaming
plan must reproduce the batch hourly rollup, and the watermark must
actually DROP rows that arrive later than the delay (the state-eviction
contract a 100 TB/day stream depends on)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_streaming_rollup_matches_batch(spark, tmp_path):
    from bgg_data_warehouse_spark.sources.tables import load_table
    from bgg_data_warehouse_spark.streaming.windowed import windowed_event_rollup

    ev = load_table(spark, SF_SMALL, "events").select(
        "ts", "event_type", "value"
    )
    landing = str(tmp_path / "landing")
    ev.write.parquet(landing)

    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(landing)
    out = windowed_event_rollup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("rollup_complete")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("rollup_complete").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in windowed_event_rollup(ev).collect()  # batch: same plan
    }
    assert got == want
    assert len(want) > 0


def test_watermark_drops_too_late_rows(spark, tmp_path):
    """Two files, one trigger each: file 1 advances the watermark to
    12:00-2h=10:00; file 2's 05:00 row is beyond the delay and must be
    dropped, while its 11:30 row (late but inside the delay) counts."""
    from bgg_data_warehouse_spark.streaming.windowed import windowed_event_rollup

    landing = tmp_path / "landing"
    landing.mkdir()

    def write_file(name, rows):
        spark.createDataFrame(
            rows, "ts timestamp, event_type string, value double"
        ).coalesce(1).write.mode("append").parquet(str(landing / name))

    d = datetime
    write_file(
        "f1",
        [
            (d(2024, 1, 1, 9, 15), "click", 1.0),
            (d(2024, 1, 1, 12, 0), "click", 1.0),  # watermark -> 10:00
        ],
    )
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(landing / "*"))
    )
    out = windowed_event_rollup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("rollup_late")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        write_file(
            "f2",
            [
                (d(2024, 1, 1, 5, 0), "click", 1.0),  # too late: dropped
                (d(2024, 1, 1, 11, 30), "click", 1.0),  # in-delay: kept
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql(
        "SELECT window_start, sum(n_events) AS n FROM rollup_late GROUP BY 1"
    ).collect()
    by_start = {r.window_start: r.n for r in rows}
    assert d(2024, 1, 1, 5, 0) not in by_start  # too-late row dropped
    assert by_start.get(d(2024, 1, 1, 11, 0)) == 1  # in-delay row kept
    assert by_start.get(d(2024, 1, 1, 9, 0)) == 1
    assert by_start.get(d(2024, 1, 1, 12, 0)) == 1


def test_stream_static_enrichment_join(spark, tmp_path):
    from bgg_data_warehouse_spark.streaming.windowed import enrich_stream

    landing = str(tmp_path / "landing")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "user_id long, value double"
    ).write.parquet(landing)
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    stream = spark.readStream.schema("user_id long, value double").parquet(landing)
    q = (
        enrich_stream(stream, dim, "user_id")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.user_id: r.tier for r in spark.table("enriched").collect()}
    assert got == {1: "gold", 2: "silver", 3: None}


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from datetime import datetime as d

    from bgg_data_warehouse_spark.streaming.windowed import dedup_stream_exact

    landing = str(tmp_path / "landing")
    spark.createDataFrame(
        [
            (1, d(2024, 1, 1, 9, 0)),
            (1, d(2024, 1, 1, 9, 5)),  # dup within delay: dropped
            (2, d(2024, 1, 1, 9, 1)),
        ],
        "k long, ts timestamp",
    ).write.parquet(landing)
    stream = spark.readStream.schema("k long, ts timestamp").parquet(landing)
    q = (
        dedup_stream_exact(stream, ["k"], ts_col="ts", delay="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("dedup_wm").collect()
    assert sorted(r.k for r in rows) == [1, 2]


def test_session_rollup_matches_batch_and_lag_formulation(spark, tmp_path):
    """Three formulations of 30-minute-gap sessionization must agree:
    the streaming session_window plan (memory sink), the same plan run
    as batch, and the lag-gap + running-sum batch sessionize query.
    (Gap semantics coincide unless an inter-event gap is EXACTLY the
    30-minute boundary, which microsecond fixture timestamps never
    produce.)"""
    from bgg_data_warehouse_spark.sources.tables import load_table
    from bgg_data_warehouse_spark.streaming.windowed import session_rollup
    from bgg_data_warehouse_spark.workload import QUERIES

    ev = load_table(spark, SF_SMALL, "events").select("ts", "user_id")
    landing = str(tmp_path / "landing")
    ev.write.parquet(landing)

    stream = spark.readStream.schema("ts timestamp, user_id long").parquet(
        landing
    )
    q = (
        session_rollup(stream)
        .writeStream.format("memory")
        .queryName("sess_complete")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def keyset(rows):
        return {
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in rows
        }

    got_stream = keyset(spark.table("sess_complete").collect())
    got_batch = keyset(session_rollup(ev).collect())
    want = keyset(
        QUERIES["sessionize"](spark, SF_SMALL)
        .select(
            "user_id",
            F.col("session_start"),
            F.col("session_end"),
            "n_events",
        )
        .collect()
    )
    assert got_stream == got_batch == want
    assert len(want) > 0


def test_session_rollup_stream_batch_agree_on_exact_gap_boundary(spark, tmp_path):
    """The one case the corpus-based three-way test above cannot reach:
    an inter-event gap of EXACTLY 30 minutes. Batch session_window
    merges it (inclusive gap comparison — pinned in test_round9_ops);
    the STREAMING state store must apply the identical merge rule, or
    stream and batch would silently diverge right at the boundary."""
    from bgg_data_warehouse_spark.streaming.windowed import session_rollup

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:30:00"),  # exactly the gap: must MERGE
            (1, "2024-01-01 11:00:00"),  # exactly the gap again: chains
            (1, "2024-01-01 11:30:01"),  # ONE second past: must SPLIT
        ],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    landing = str(tmp_path / "landing")
    ev.write.parquet(landing)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(
        landing
    )
    q = (
        session_rollup(stream)
        .writeStream.format("memory")
        .queryName("sess_boundary")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_stream = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("sess_boundary").collect()
    }
    got_batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in session_rollup(ev).collect()
    }
    assert got_stream == got_batch
    assert sorted(n for _, _, _, n in got_stream) == [1, 3]


def test_session_rollup_append_finalizes_closed_sessions(spark, tmp_path):
    """Append mode emits a session only after the watermark passes its
    end: file 1's 09:00 burst closes once file 2 advances event time to
    13:00 (watermark 11:00 > 09:10+gap); file 2's own open session is
    NOT emitted by availableNow."""
    from datetime import datetime as d

    from bgg_data_warehouse_spark.streaming.windowed import session_rollup

    landing = tmp_path / "landing"
    landing.mkdir()

    def write_file(name, rows):
        spark.createDataFrame(rows, "ts timestamp, user_id long").coalesce(
            1
        ).write.mode("append").parquet(str(landing / name))

    write_file("f1", [(d(2024, 1, 1, 9, 0), 1), (d(2024, 1, 1, 9, 10), 1)])
    write_file("f2", [(d(2024, 1, 1, 13, 0), 1)])
    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(landing / "*"))
    )
    q = (
        session_rollup(stream)
        .writeStream.format("memory")
        .queryName("sess_append")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("sess_append").collect()
    assert [
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in rows
    ] == [(1, d(2024, 1, 1, 9, 0), d(2024, 1, 1, 9, 10), 2)]


def test_interval_join_streams_matches_batch(spark, tmp_path):
    """Stream-stream click->purchase attribution (1h window) must equal
    the batch interval join of the same frames."""
    from bgg_data_warehouse_spark.sources.tables import load_table
    from bgg_data_warehouse_spark.streaming.windowed import (
        interval_join_streams,
    )

    ev = load_table(spark, SF_SMALL, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("buy_user"), F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"),
    )
    lc, lb = str(tmp_path / "clicks"), str(tmp_path / "buys")
    clicks.write.parquet(lc)
    buys.write.parquet(lb)

    sc = spark.readStream.schema(
        "user_id long, click_ts timestamp, click_id long"
    ).parquet(lc)
    sb = spark.readStream.schema(
        "buy_user long, buy_ts timestamp, buy_id long"
    ).parquet(lb)
    sb = sb.withColumnRenamed("buy_user", "user_id")
    out = interval_join_streams(
        sc, sb, key="user_id", left_ts="click_ts", right_ts="buy_ts"
    ).select("click_id", "buy_id")
    q = (
        out.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.click_id, r.buy_id) for r in spark.table("attrib").collect()
    }
    want = {
        (r.click_id, r.buy_id)
        for r in interval_join_streams(
            clicks,
            buys.withColumnRenamed("buy_user", "user_id"),
            key="user_id",
            left_ts="click_ts",
            right_ts="buy_ts",
        )
        .select("click_id", "buy_id")
        .collect()
    }
    assert got == want
    assert len(want) > 0
