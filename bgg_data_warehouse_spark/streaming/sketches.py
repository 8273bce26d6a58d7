"""Streaming sketch maintenance — the Structured Streaming face of the
mergeable sketches (operators/sketches.py).

The mergeability that makes HLL register grids (MAX) and histogram bin
grids (SUM) persistable tables is exactly what makes them STREAMABLE:
each micro-batch writes only its own partial grid under
``sketch_dir/batch-<epoch>`` — a per-epoch overwrite, so a replayed
epoch is idempotent (same discipline as dedup.py / ingest.py) and there
is NO read-modify-write of shared state to race on. The queryable
sketch is the merge of all partials, performed lazily at read time over
grid-sized inputs (``read_hll_sketch`` / ``read_histogram_sketch``);
compaction is optional and can fold old partials into one without
changing any answer, because merge is associative.

This is the steady-state cardinality/quantile monitoring loop a 100 TB
ingest runs: per-batch work is one map-side-combined aggregate bounded
at grid size, the state on disk is a few KB per epoch, and the batch
and streaming paths share one code path (the operators), so the drained
stream equals the batch build exactly — pinned register-for-register in
tests/test_streaming_sketches.py.

Reference parity: no reference counterpart (the reference's streaming
surface is the row-insert tracking loop, SURVEY §2.9 S8) — LLM-pipeline
extension alongside streaming/dedup.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .dedup import _prior_batches


def _partial_dirs(spark: SparkSession, sketch_dir: str) -> list[str]:
    """All batch-* partial-grid directories (Hadoop FS — works on
    hdfs/s3a deployments, not just local paths)."""
    return _prior_batches(spark, sketch_dir)


def start_streaming_hll(
    stream: DataFrame,
    sketch_dir: str,
    checkpoint_dir: str,
    *,
    key_col: str,
    m: int = 16,
    group_cols: tuple[str, ...] = (),
):
    """Maintain a per-group HLL register grid over a stream; returns the
    StreamingQuery. Each epoch persists its partial grid (<= |groups|*m
    rows); ``read_hll_sketch`` folds them with MAX."""
    from ..operators.sketches import hll_register_grid

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        hll_register_grid(
            batch_df, key_col, m=m, group_cols=list(group_cols)
        ).write.mode("overwrite").parquet(
            os.path.join(sketch_dir, f"batch-{epoch_id}")
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_hll_sketch(
    spark: SparkSession,
    sketch_dir: str,
    *,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The current merged register grid — MAX over all epoch partials.
    Raises if no partial has landed yet (an empty sketch has no schema
    to answer with)."""
    from ..operators.sketches import hll_merge

    parts = _partial_dirs(spark, sketch_dir)
    if not parts:
        raise FileNotFoundError(f"no sketch partials under {sketch_dir}")
    return hll_merge(spark.read.parquet(*parts), group_cols=list(group_cols))


def start_streaming_histogram(
    stream: DataFrame,
    sketch_dir: str,
    checkpoint_dir: str,
    *,
    value_col: str,
    width: float,
    group_cols: tuple[str, ...] = (),
):
    """Maintain a per-group histogram bin grid over a stream (SUM-merge
    twin of ``start_streaming_hll``) — feeds streaming quantile
    monitoring through ``histogram_quantiles``."""
    from ..operators.sketches import histogram_sketch

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        histogram_sketch(
            batch_df, value_col, width=width, group_cols=list(group_cols)
        ).write.mode("overwrite").parquet(
            os.path.join(sketch_dir, f"batch-{epoch_id}")
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_histogram_sketch(
    spark: SparkSession,
    sketch_dir: str,
    *,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The current merged bin grid — SUM over all epoch partials."""
    from ..operators.sketches import merge_histogram_sketches

    parts = _partial_dirs(spark, sketch_dir)
    if not parts:
        raise FileNotFoundError(f"no sketch partials under {sketch_dir}")
    frames = [spark.read.parquet(p) for p in parts]
    return merge_histogram_sketches(*frames, group_cols=list(group_cols))


def read_ks_drift(
    spark: SparkSession,
    sketch_dir: str,
    reference_grid: DataFrame,
    *,
    at_name: str = "at_bin",
) -> DataFrame:
    """Distribution-drift check for a streamed histogram sketch: the KS
    distance (exact integer fraction + permyriad, see
    operators/stats_tests.ks_from_grids) between a frozen REFERENCE bin
    grid and the live merged grid under ``sketch_dir``. This is the
    monitoring read a 100 TB ingest pairs with
    ``start_streaming_histogram``: per-epoch state stays grid-bounded,
    and the drift statistic is computed over two sketch-sized inputs —
    never a rescan of the stream. Pair with a CUSUM-style alert on
    d_permyriad for a full drift monitor (workload.cusum_drift is the
    batch twin of that alerting rule)."""
    from ..operators.stats_tests import ks_from_grids

    live = read_histogram_sketch(spark, sketch_dir)
    return ks_from_grids(reference_grid, live, at_name=at_name)


def read_mwu_drift(
    spark: SparkSession,
    sketch_dir: str,
    reference_grid: DataFrame,
) -> DataFrame:
    """Location-shift drift check for a streamed histogram sketch: the
    Mann-Whitney 2U + tie-corrected z (operators/stats_tests.
    mwu_from_grids) between a frozen REFERENCE bin grid and the live
    merged grid under ``sketch_dir``. Pairs with :func:`read_ks_drift`
    over the SAME sketch state: KS flags any shape change, MWU tells
    whether the live distribution systematically moved up or down —
    the pair a 100 TB ingest monitors without ever rescanning the
    stream (both statistics run over two grid-sized inputs)."""
    from ..operators.stats_tests import mwu_from_grids

    live = read_histogram_sketch(spark, sketch_dir)
    return mwu_from_grids(reference_grid, live)
