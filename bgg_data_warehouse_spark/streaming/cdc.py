"""Streaming CDC apply — maintain a latest-state table from a change
stream (the Structured Streaming face of ``operators/merge.
apply_changelog``).

The batch gate (``cdc_upsert``) proves the LWW upsert+delete semantics;
this module runs the same operator as the steady-state consumer loop a
warehouse points at a Debezium-style OLTP feed: each micro-batch of
full-row change images is applied to the stored snapshot with
``apply_changelog`` and the result lands via the staging-dir + atomic
swap rewrite (io.py S9 discipline), so readers never observe a
half-applied batch. The reference's loader stops at insert-if-absent
and delete+insert (`/root/reference/src/data_processor/loader.py:
57-176`); this is the upgrade path once an upstream row feed replaces
batch refreshes — same family as streaming/ingest.py and
streaming/tracking.py (SURVEY §2.9 S8/S9).

Exactly-once state without external transactions:

- Structured Streaming's foreachBatch replays at most the LAST
  uncommitted epoch, never an earlier one, so batches apply in epoch
  order.
- Re-applying the SAME epoch is a no-op by LWW algebra: if the crash
  landed after the swap but before the checkpoint commit, the snapshot
  already reflects the epoch; applying identical change rows again
  picks identical per-key winners against that state (same newest 'U'
  images, deletes of already-absent keys), reproducing the snapshot
  bit-for-bit. The idempotence is pinned by test, not assumed.
- A crash INSIDE the swap itself (between _rewrite's two renames)
  leaves no live table dir, only the ``__old_`` backup — the one state
  where "table missing" must NOT mean "first batch", or the replay
  would silently rebuild state from one epoch. ``apply_cdc_batch``
  therefore calls :func:`io.recover_table` before the existence check;
  the restore-then-replay path is pinned by test.
- Cross-epoch ordering therefore only requires that ``seq_cols`` be
  globally monotone over the log (a commit timestamp + offset — what
  every CDC feed already carries).

Scale shape per batch: one shuffle of the CHANGE batch on the key for
its per-key LWW window, one full-outer join against the snapshot on
the same key (the window's partitioning is reused — audited for the
batch gate in test_plan_audit), one staged rewrite. The join + the
FULL-snapshot rewrite are snapshot-sized — the honest floor for a CDC
consumer without a transactional table format (a partitioned
io.LAYOUTS layout speeds READERS via pruning; it does not shrink the
per-epoch rewrite). When per-epoch rewrite cost matters more than
read-side simplicity, batch changes into longer trigger intervals or
adopt a log-structured layout (base + change partitions compacted by
io.compact_table).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..io import (
    read_table,
    recover_table,
    rewrite_table,
    table_exists,
    write_table,
)
from ..operators.merge import apply_changelog

__all__ = ["start_streaming_cdc", "read_cdc_state", "apply_cdc_batch"]


def apply_cdc_batch(
    batch_df: DataFrame,
    root: str,
    name: str,
    *,
    keys: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
) -> None:
    """Apply ONE batch of change rows to the stored snapshot.

    Exposed separately from the stream wiring so replay behavior is
    directly testable and so a catch-up backfill can drive the same
    code path batch-by-batch.
    """
    # a crash between _rewrite's two renames leaves the snapshot only
    # in its __old_ backup; restore it BEFORE the existence check (and
    # before the empty-batch early-out — an empty catch-up batch must
    # still heal a crashed table) so a replayed epoch merges into full
    # state instead of re-founding the table from one batch
    recover_table(root, name)
    if not batch_df.take(1):
        return
    spark = batch_df.sparkSession
    drop = [op_col, *seq_cols]
    if table_exists(root, name):
        base = read_table(spark, root, name)
        rewrite_table(
            apply_changelog(
                base, batch_df, list(keys), list(seq_cols), op_col=op_col
            ),
            root,
            name,
        )
    else:
        # first batch: the state schema is the change schema minus the
        # log bookkeeping columns; an empty base makes apply_changelog
        # insert every surviving key
        base = batch_df.drop(*drop).limit(0)
        write_table(
            apply_changelog(
                base, batch_df, list(keys), list(seq_cols), op_col=op_col
            ),
            root,
            name,
        )


def start_streaming_cdc(
    stream: DataFrame,
    root: str,
    name: str,
    checkpoint_dir: str,
    *,
    keys: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
):
    """Consume a change stream into a latest-state table; returns the
    StreamingQuery. ``stream`` must carry the key columns, ``seq_cols``
    (a total order over the log), ``op_col`` in {'U','D'}, and every
    state column (full-row images)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        apply_cdc_batch(
            batch_df,
            root,
            name,
            keys=keys,
            seq_cols=seq_cols,
            op_col=op_col,
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_cdc_state(spark: SparkSession, root: str, name: str) -> DataFrame:
    """The current snapshot (one row per live key)."""
    return read_table(spark, root, name)
