"""Streaming graph maintenance — keep a connected-components labeling
fresh from an EDGE change stream (the Structured Streaming face of the
log-structured CC store, completing the family: postings, MinHash,
neighbors, and CDC state all have one; graph state gets its own here).

The consumer a large-scale entity-resolution / dedup-graph pipeline
runs: upstream emits edge change images ('U' = edge added, 'D' = edge
deleted, ``seq_cols`` a total order over the log — what any CDC feed of
a relationship table already carries), and each micro-batch lands on
the paired labels+edges log store through
``io.maintain_components_log`` — per-epoch change-set-sized writes
(SCALING_incremental_r14: epoch shuffle flat 1.12x across a 100x base
step vs the rebuild's 85.8x), the generational merge on read, and
threshold compaction.

Epoch semantics: edges are orientation-normalized, then per-edge LWW by
``seq_cols`` picks each edge's surviving op; deletions apply FIRST,
then additions, so the epoch's end state is exactly
``(stored ∖ dels) ∪ adds`` — the same set algebra a batch reconcile
computes — and the labeling equals CC of that final edge set however
the epoch interleaved the ops. (Order matters only for an edge both
added and deleted in one epoch, which LWW already resolved to a single
op.)

Exactly-once: foreachBatch replays at most the last uncommitted epoch.
Replaying an ADD epoch contracts every delta endpoint to the canonical
the first application already merged, so the super-graph is empty and
the generation carries no label changes (edge rows re-replace
themselves); replaying a DELETE epoch recomputes the same affected
survivors and re-tombstones already-absent nodes. Both pinned by
tests/test_streaming_graph.py, not assumed.

Scale shape per epoch: the delete pass broadcast-semi-localizes to the
affected components' edges; the add pass contracts to a delta-sized
super-graph; writes are change-set generations. Nothing corpus-sized is
shuffled or written — the reference's closest pattern is its wholesale
model-table refresh (`/root/reference/definitions/game_neighbors.sqlx`),
which this family exists to beat at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = [
    "apply_components_log_batch",
    "start_streaming_components_logged",
    "read_components_labels",
    "read_components_edges",
]


def apply_components_log_batch(
    batch_df: DataFrame,
    root: str,
    name: str,
    *,
    src: str,
    dst: str,
    seq_cols: Sequence[str],
    op_col: str = "op",
    auto_compact: bool = True,
    max_generations: int = 16,
    max_delta_fraction: float = 0.2,
    annotate_on_compact: bool = False,
) -> None:
    """Apply ONE epoch of edge changes to the stored CC labeling.

    ``batch_df`` carries ``src``, ``dst``, ``seq_cols`` and ``op_col``
    in {'U','D'}. First epoch bootstraps the store from the surviving
    additions (a delete in the very first epoch can only target an edge
    from the same epoch, which LWW already resolved). Exposed separately
    from the stream wiring so replay behavior is directly testable and
    a catch-up backfill can drive the same code path batch-by-batch.
    """
    from ..io import init_components_log, maintain_components_log
    from ..log_store import (
        compact_pair_if_needed,
        log_store_exists,
        recover_log_store,
    )
    from ..operators.components import connected_components_star

    recover_log_store(root, name)
    spark = batch_df.sparkSession
    # orientation-normalize BEFORE the LWW window so (a,b) and (b,a)
    # are one edge key in the log, exactly as they are in the store
    canon = batch_df.select(
        F.least(F.col(src), F.col(dst)).alias(src),
        F.greatest(F.col(src), F.col(dst)).alias(dst),
        *[F.col(c) for c in seq_cols],
        F.col(op_col),
    )
    # ``seq_cols`` must be a strict total order over the log per edge
    # key (commit ts + offset — what a CDC feed carries); the op column
    # is a deterministic FINAL tiebreak ('U' sorts above 'D' under
    # desc) so that even a feed that violates the contract — e.g. an
    # add from (a,b) and a delete from (b,a) carrying equal seq values
    # in one transaction — replays byte-stably: the add wins every
    # replay rather than whichever row_number saw first (ADVICE r14).
    w = Window.partitionBy(src, dst).orderBy(
        *[F.col(c).desc() for c in seq_cols], F.col(op_col).desc()
    )
    latest = (
        canon.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        # pinned once: the empty-batch probe, both op-split probes, and
        # both maintainers consume this frame — unpinned, the LWW
        # window re-evaluates four-plus times per epoch
        .localCheckpoint(eager=True)
    )
    if not latest.take(1):
        return
    adds = latest.where(F.col(op_col) == "U").select(src, dst)
    dels = latest.where(F.col(op_col) == "D").select(src, dst)
    if not log_store_exists(root, name):
        # first epoch: the graph is exactly the surviving additions
        edges0 = adds.localCheckpoint(eager=True)  # labels + edges part
        init_components_log(
            root,
            name,
            connected_components_star(edges0, src, dst, canonical_edges=True),
            edges0,
            src,
            dst,
        )
        return
    # deletions first, then additions: end state (stored ∖ dels) ∪ adds
    if dels.take(1):
        maintain_components_log(
            spark, root, name, dels, src, dst,
            deleted=True, auto_compact=False,
        )
    if adds.take(1):
        maintain_components_log(
            spark, root, name, adds, src, dst, auto_compact=False
        )
    if auto_compact:
        from ..io import components_log_layouts

        compact_pair_if_needed(
            spark,
            root,
            name,
            {"labels": "node", "edges": [src, dst]},
            max_generations=max_generations,
            max_delta_fraction=max_delta_fraction,
            layouts=(
                components_log_layouts(spark, root, name, src, dst)
                if annotate_on_compact
                else None
            ),
        )


def start_streaming_components_logged(
    stream: DataFrame,
    root: str,
    name: str,
    checkpoint_dir: str,
    *,
    src: str,
    dst: str,
    seq_cols: Sequence[str],
    op_col: str = "op",
    auto_compact: bool = True,
):
    """Consume an edge change stream into the log-structured CC store;
    returns the StreamingQuery."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        apply_components_log_batch(
            batch_df,
            root,
            name,
            src=src,
            dst=dst,
            seq_cols=seq_cols,
            op_col=op_col,
            auto_compact=auto_compact,
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_components_labels(
    spark: SparkSession, root: str, name: str
) -> DataFrame:
    """The current (node, canonical) labeling (generational merge;
    base-only after compaction)."""
    from ..log_store import read_pair_store

    return read_pair_store(spark, root, name, "labels", "node")


def read_components_edges(
    spark: SparkSession, root: str, name: str, src: str, dst: str
) -> DataFrame:
    """The current orientation-normalized edge set. The compaction-time
    ``_comp`` clustering annotation (io.components_log_layouts) is an
    internal layout property — consumers see the plain edge schema."""
    from ..log_store import read_pair_store

    return read_pair_store(spark, root, name, "edges", [src, dst]).drop(
        "_comp"
    )
