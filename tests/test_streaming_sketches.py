"""Streaming sketch maintenance (streaming/sketches.py): the drained
stream's merged grid must equal the single-pass batch build exactly —
register-for-register (HLL / MAX) and bin-for-bin (histogram / SUM) —
across multiple arrival epochs, including a replayed-epoch overwrite."""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_chunk(spark, landing, rows):
    spark.createDataFrame(
        rows, "user_id long, event_type string, value double"
    ).coalesce(1).write.mode("append").parquet(landing)


def _chunks():
    import random

    rng = random.Random(7)
    chunks = []
    for c in range(3):
        chunks.append(
            [
                (
                    rng.randrange(200),
                    rng.choice(["click", "view"]),
                    round(rng.uniform(0, 100), 2),
                )
                for _ in range(400)
            ]
        )
    return chunks


def _stream(spark, landing):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    return spark.readStream.schema(schema).parquet(landing)


def test_streaming_hll_equals_batch_build(spark, tmp_path):
    from bgg_data_warehouse_spark.operators.sketches import hll_register_grid
    from bgg_data_warehouse_spark.streaming.sketches import (
        read_hll_sketch,
        start_streaming_hll,
    )

    landing = str(tmp_path / "landing")
    sketch_dir = str(tmp_path / "hll")
    chunks = _chunks()
    _write_chunk(spark, landing, chunks[0])
    q = start_streaming_hll(
        _stream(spark, landing),
        sketch_dir,
        str(tmp_path / "ckpt"),
        key_col="user_id",
        m=16,
        group_cols=("event_type",),
    )
    try:
        q.processAllAvailable()
        _write_chunk(spark, landing, chunks[1])
        q.processAllAvailable()
        _write_chunk(spark, landing, chunks[2])
        q.processAllAvailable()
    finally:
        q.stop()

    merged = sorted(
        (r.event_type, r.register, r.rho)
        for r in read_hll_sketch(
            spark, sketch_dir, group_cols=("event_type",)
        ).collect()
    )
    all_rows = spark.read.parquet(landing)
    direct = sorted(
        (r.event_type, r.register, r.rho)
        for r in hll_register_grid(
            all_rows, "user_id", m=16, group_cols=["event_type"]
        ).collect()
    )
    assert merged == direct


def test_streaming_histogram_equals_batch_and_feeds_quantiles(spark, tmp_path):
    from bgg_data_warehouse_spark.operators.sketches import (
        histogram_quantiles,
        histogram_sketch,
    )
    from bgg_data_warehouse_spark.streaming.sketches import (
        read_histogram_sketch,
        start_streaming_histogram,
    )

    landing = str(tmp_path / "landing")
    sketch_dir = str(tmp_path / "hist")
    chunks = _chunks()
    _write_chunk(spark, landing, chunks[0])
    q = start_streaming_histogram(
        _stream(spark, landing),
        sketch_dir,
        str(tmp_path / "ckpt"),
        value_col="value",
        width=5.0,
    )
    try:
        q.processAllAvailable()
        _write_chunk(spark, landing, chunks[1])
        q.processAllAvailable()
    finally:
        q.stop()

    merged_df = read_histogram_sketch(spark, sketch_dir)
    merged = sorted((r.bin, r.n) for r in merged_df.collect())
    all_rows = spark.read.parquet(landing)
    direct = sorted(
        (r.bin, r.n)
        for r in histogram_sketch(all_rows, "value", width=5.0).collect()
    )
    assert merged == direct
    # the maintained sketch answers quantile queries within one bin width
    p50 = {
        r.q: r.est
        for r in histogram_quantiles(merged_df, [0.5], width=5.0).collect()
    }[0.5]
    exact = all_rows.agg(F.expr("percentile(value, 0.5)")).collect()[0][0]
    assert abs(p50 - exact) <= 5.0


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    """Re-running an epoch's sink overwrite must not change the merged
    sketch (the per-epoch overwrite discipline)."""
    from bgg_data_warehouse_spark.operators.sketches import hll_register_grid
    from bgg_data_warehouse_spark.streaming.sketches import read_hll_sketch

    chunks = _chunks()
    df = spark.createDataFrame(
        chunks[0], "user_id long, event_type string, value double"
    )
    sketch_dir = str(tmp_path / "hll")
    grid = hll_register_grid(df, "user_id", m=16)
    for _ in range(2):  # write epoch 0 twice — replay
        grid.write.mode("overwrite").parquet(f"{sketch_dir}/batch-0")
    merged = sorted(
        (r.register, r.rho)
        for r in read_hll_sketch(spark, sketch_dir).collect()
    )
    direct = sorted((r.register, r.rho) for r in grid.collect())
    assert merged == direct
