"""Streaming search-index maintenance — the Structured Streaming face
of the incremental index family (operators/inverted_index.py
``update_postings``, operators/dedup.py ``update_minhash_index``),
completing it the way streaming/cdc.py completes
``operators/merge.apply_changelog``.

A document change stream (full-text images with an op column, 'U'
re-ingest / 'D' delete, plus a globally-monotone sequence — the same
Debezium-shaped contract the CDC consumer takes) keeps the STORED
postings table and/or MinHash sketch index fresh per micro-batch:
each epoch LWW-collapses to one surviving op per doc, the surviving
re-ingests replace their index rows, the surviving deletes tombstone,
and the updated index lands through the S9 staging + atomic-swap
discipline so term lookups never observe a half-applied epoch.

Within-batch semantics: a doc may appear many times per epoch (rapid
re-edits, delete-then-recreate); ``seq_cols`` orders them and the
NEWEST image wins — so a doc deleted at seq 5 and re-ingested at seq 7
inside one batch ends up indexed, while one re-ingested then deleted
ends up absent. This is the log-ordered refinement of the batch
maintainers' static deletion-precedence rule (there, delta and
tombstone sets are unordered inputs, so delete must win; here the log
supplies the order the batch API lacks).

Exactly-once: identical argument to streaming/cdc.py — foreachBatch
replays at most the last uncommitted epoch; re-applying the same epoch
replaces the same docs with the same tokenizations and re-deletes
already-absent docs (both idempotent, pinned by test); a crash inside
the swap heals via io.recover_table before the existence check.

Scale shape per epoch: one delta-sized LWW window, one delta-sized
tokenize/sketch aggregate, one broadcast map-side anti over the stored
index, one staged rewrite. Only the rewrite is index-sized — the same
honest floor as the CDC snapshot; everything upstream of it is
delta-bounded.

That floor is now CLOSED for the postings table (r12 VERDICT #3):
``apply_postings_log_batch`` / ``start_streaming_index_logged`` land
each epoch as a log_store.py GENERATION — the epoch's write volume is
delta-sized, reads go through the generational merge
(``read_index_logged``), and ``log_store.compact_log_store`` folds
generations into base on whatever cadence amortizes the index-sized
rewrite. The snapshot appliers above remain for the small-index /
read-latency-critical regime where one parquet dir with no merge on
read is worth the rewrite.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import (
    read_table,
    recover_table,
    rewrite_table,
    table_exists,
    write_table,
)


def _lww_split(
    batch_df: DataFrame,
    id_col: str,
    seq_cols: Sequence[str],
    op_col: str,
) -> tuple[DataFrame, DataFrame]:
    """(surviving 'U' rows, surviving 'D' ids): newest image per doc."""
    w = Window.partitionBy(id_col).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    latest = (
        batch_df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return (
        latest.where(F.col(op_col) == "U"),
        latest.where(F.col(op_col) == "D").select(id_col),
    )


def apply_postings_batch(
    batch_df: DataFrame,
    root: str,
    name: str,
    *,
    id_col: str,
    text_col: str,
    seq_cols: Sequence[str],
    op_col: str = "op",
) -> None:
    """Apply ONE epoch of document changes to the stored postings
    table. Exposed separately from the stream wiring (like
    cdc.apply_cdc_batch) so replay behavior is directly testable and a
    backfill can drive the same path batch-by-batch."""
    from ..operators.inverted_index import inverted_postings, update_postings

    recover_table(root, name)
    if not batch_df.take(1):
        return
    spark = batch_df.sparkSession
    delta, deleted = _lww_split(batch_df, id_col, seq_cols, op_col)
    delta = delta.select(id_col, text_col)
    if table_exists(root, name):
        base = read_table(spark, root, name)
        rewrite_table(
            update_postings(
                base, delta, id_col, text_col, deleted_ids=deleted
            ),
            root,
            name,
        )
    else:
        # first epoch: the index is exactly the surviving re-ingests'
        # postings (surviving deletes have nothing to remove)
        write_table(inverted_postings(delta, id_col, text_col), root, name)


def apply_minhash_batch(
    batch_df: DataFrame,
    root: str,
    name: str,
    *,
    id_col: str,
    text_col: str,
    seq_cols: Sequence[str],
    op_col: str = "op",
    shingle_k: int = 3,
    num_hashes: int = 16,
    verify_tokens: bool = False,
) -> None:
    """Same epoch contract for the MinHash sketch index — the dedup
    index stays fresh as documents arrive, so each epoch can be
    near-dup-checked against the live corpus
    (operators/dedup.incremental_minhash_pairs) without re-sketching."""
    from ..operators.dedup import minhash_sketch, update_minhash_index

    conf = dict(
        shingle_k=shingle_k, num_hashes=num_hashes, verify_tokens=verify_tokens
    )
    recover_table(root, name)
    if not batch_df.take(1):
        return
    spark = batch_df.sparkSession
    delta, deleted = _lww_split(batch_df, id_col, seq_cols, op_col)
    delta = delta.select(id_col, text_col)
    if table_exists(root, name):
        base = read_table(spark, root, name)
        rewrite_table(
            update_minhash_index(
                base, delta, id_col, text_col, deleted_ids=deleted, **conf
            ),
            root,
            name,
        )
    else:
        write_table(minhash_sketch(delta, id_col, text_col, **conf), root, name)


def start_streaming_index(
    stream: DataFrame,
    root: str,
    name: str,
    checkpoint_dir: str,
    *,
    id_col: str,
    text_col: str,
    seq_cols: Sequence[str],
    op_col: str = "op",
):
    """Consume a document change stream into a stored postings table;
    returns the StreamingQuery. ``stream`` must carry ``id_col``,
    ``text_col``, ``seq_cols`` (a total order over the log) and
    ``op_col`` in {'U','D'}."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        apply_postings_batch(
            batch_df,
            root,
            name,
            id_col=id_col,
            text_col=text_col,
            seq_cols=seq_cols,
            op_col=op_col,
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_index(spark: SparkSession, root: str, name: str) -> DataFrame:
    """The current stored index."""
    return read_table(spark, root, name)


def apply_postings_log_batch(
    batch_df: DataFrame,
    root: str,
    name: str,
    *,
    id_col: str,
    text_col: str,
    seq_cols: Sequence[str],
    op_col: str = "op",
) -> None:
    """The log-structured twin of :func:`apply_postings_batch`: same
    epoch contract (LWW collapse, 'U' replaces / 'D' tombstones,
    deletion wins within an epoch via the collapsed log order), but the
    epoch lands as ONE log_store generation — write volume is
    delta-sized, never index-sized. Replay idempotence shifts shape:
    re-applying an epoch appends a DUPLICATE generation rather than
    re-rewriting the snapshot, and the generational merge makes the
    duplicate a no-op (the newer copy's rows replace the older copy's
    identical rows) — pinned by tests/test_streaming_index.py."""
    from ..log_store import (
        append_log_delta,
        init_log_store,
        log_store_exists,
        recover_log_store,
    )
    from ..operators.inverted_index import inverted_postings

    recover_log_store(root, name)
    if not batch_df.take(1):
        return
    delta, deleted = _lww_split(batch_df, id_col, seq_cols, op_col)
    fresh = inverted_postings(delta.select(id_col, text_col), id_col, text_col)
    if log_store_exists(root, name):
        append_log_delta(root, name, fresh, "doc", tombstones=deleted)
    else:
        # first epoch: base = the surviving re-ingests' postings
        # (surviving deletes have nothing to remove)
        init_log_store(fresh, root, name)


def start_streaming_index_logged(
    stream: DataFrame,
    root: str,
    name: str,
    checkpoint_dir: str,
    *,
    id_col: str,
    text_col: str,
    seq_cols: Sequence[str],
    op_col: str = "op",
    auto_compact: bool = True,
    max_generations: int = 16,
    max_delta_fraction: float = 0.2,
):
    """Consume a document change stream into a log-structured postings
    store (delta-sized epoch writes); returns the StreamingQuery. With
    ``auto_compact`` (default) each epoch ends with
    ``log_store.compact_if_needed``: generations fold into base only
    when read amplification (count) or merge amplification (delta
    bytes vs base) crosses its threshold, so the index-sized rewrite is
    paid on an amortized cadence instead of every epoch — the LSM
    write/read trade, tunable per store. Compacting inside the sink is
    crash-safe at any point: a died compaction heals via the store's
    recovery matrix and the epoch itself already committed its
    generation."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        apply_postings_log_batch(
            batch_df,
            root,
            name,
            id_col=id_col,
            text_col=text_col,
            seq_cols=seq_cols,
            op_col=op_col,
        )
        if auto_compact:
            from ..log_store import compact_if_needed

            compact_if_needed(
                batch_df.sparkSession,
                root,
                name,
                "doc",
                max_generations=max_generations,
                max_delta_fraction=max_delta_fraction,
            )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_index_logged(spark: SparkSession, root: str, name: str) -> DataFrame:
    """The current log-structured postings store contents (generational
    merge; base-only after compaction)."""
    from ..log_store import read_log_store

    return read_log_store(spark, root, name, "doc")


def apply_minhash_log_batch(
    batch_df: DataFrame,
    root: str,
    name: str,
    *,
    id_col: str,
    text_col: str,
    seq_cols: Sequence[str],
    op_col: str = "op",
    shingle_k: int = 3,
    num_hashes: int = 16,
    verify_tokens: bool = False,
) -> None:
    """Log-structured twin of :func:`apply_minhash_batch`: the sketch
    index is keyed by ``doc`` exactly like the postings table, so the
    same generic log_store carries it — each epoch's re-sketches land
    as one generation (delta-sized write), deletes as its tombstones.
    Read with ``log_store.read_log_store(spark, root, name, "doc")``;
    fold with ``compact_log_store`` / ``compact_if_needed``."""
    from ..log_store import (
        append_log_delta,
        init_log_store,
        log_store_exists,
        recover_log_store,
    )
    from ..operators.dedup import minhash_sketch

    conf = dict(
        shingle_k=shingle_k, num_hashes=num_hashes, verify_tokens=verify_tokens
    )
    recover_log_store(root, name)
    if not batch_df.take(1):
        return
    delta, deleted = _lww_split(batch_df, id_col, seq_cols, op_col)
    fresh = minhash_sketch(delta.select(id_col, text_col), id_col, text_col, **conf)
    if log_store_exists(root, name):
        append_log_delta(root, name, fresh, "doc", tombstones=deleted)
    else:
        init_log_store(fresh, root, name)


def apply_neighbors_batch(
    batch_df: DataFrame,
    root: str,
    name: str,
    *,
    id_col: str,
    band_col: str,
    vec_col: str,
    seq_cols: Sequence[str],
    op_col: str = "op",
    band: float,
    k: int,
) -> None:
    """Same epoch contract for the paired corpus+neighbors store (r12
    VERDICT #5 — the third index family gets its streaming face): a
    vector change stream ('U' upsert with the embedding image / 'D'
    delete, ``seq_cols`` ordering the log) keeps the stored k-NN table
    fresh per micro-batch through ``io.maintain_neighbors_table`` —
    delta-scoped probe, pair swapped atomically, crash windows healed by
    recover_table before the existence check. Replay of an epoch
    re-upserts the same vectors (affected set identical, recomputed
    rows identical) and re-deletes absent ids (anti-join no-op) — both
    idempotent, pinned by tests/test_streaming_index.py."""
    from ..io import (
        init_neighbors_store,
        maintain_neighbors_table,
        recover_table,
        table_exists,
    )

    recover_table(root, name)
    if not batch_df.take(1):
        return
    spark = batch_df.sparkSession
    delta, deleted = _lww_split(batch_df, id_col, seq_cols, op_col)
    delta = delta.select(id_col, band_col, vec_col)
    if table_exists(root, name):
        maintain_neighbors_table(
            spark, root, name, delta, id_col, band_col, vec_col,
            band=band, k=k, deleted_ids=deleted,
        )
    else:
        # first epoch: the corpus is exactly the surviving upserts
        init_neighbors_store(
            spark, root, name, delta, id_col, band_col, vec_col,
            band=band, k=k,
        )


def apply_neighbors_log_batch(
    batch_df: DataFrame,
    root: str,
    name: str,
    *,
    id_col: str,
    band_col: str,
    vec_col: str,
    seq_cols: Sequence[str],
    op_col: str = "op",
    band: float,
    k: int,
    auto_compact: bool = True,
    max_generations: int = 16,
    max_delta_fraction: float = 0.2,
) -> None:
    """Log-structured twin of :func:`apply_neighbors_batch` — the
    delta-sized-WRITE form of the paired corpus+neighbors store: an
    epoch lands as ONE pair-store generation holding (a) the vector
    upserts + tombstones and (b) the CHANGE SET of the k-NN refresh
    (``incremental_neighbors_delta``'s recomputed rows; touched queries
    with no surviving rows become neighbor tombstones). Nothing written
    is corpus- or index-sized in the band-sparse case — the snapshot
    applier rewrites both tables every epoch. Pair atomicity (r12 #4)
    survives delta-sizing because both parts share the generation's
    single commit marker and fold in one base swap. Reads go through
    ``log_store.read_pair_store(spark, root, name, "neighbors",
    "query_id")``; ``compact_pair_if_needed`` folds on the amortized
    cadence."""
    from ..io import _neighbors_topk
    from ..log_store import (
        append_pair_delta,
        compact_pair_if_needed,
        init_pair_store,
        log_store_exists,
        read_pair_store,
        recover_log_store,
    )
    from ..operators.band_join import incremental_neighbors_delta

    recover_log_store(root, name)
    if not batch_df.take(1):
        return
    spark = batch_df.sparkSession
    delta, deleted = _lww_split(batch_df, id_col, seq_cols, op_col)
    delta = delta.select(id_col, band_col, vec_col)
    keys = {"vectors": id_col, "neighbors": "query_id"}
    if log_store_exists(root, name):
        base = read_pair_store(spark, root, name, "vectors", id_col)
        recomputed, touched = incremental_neighbors_delta(
            base, delta, id_col, band_col, vec_col, band, k,
            deleted_ids=deleted,
        )
        # the matmul feeds both the rows write and the tombstone anti —
        # pin it so the change set computes once
        recomputed = recomputed.localCheckpoint(eager=True)
        # a touched query with no recomputed rows has lost its whole
        # top-k (its band emptied) — that is a neighbors tombstone;
        # every other touched query is replaced by its rows
        nbr_tombs = touched.join(
            recomputed.select("query_id").distinct(), "query_id", "left_anti"
        )
        append_pair_delta(
            root,
            name,
            {
                "vectors": (delta, deleted, id_col),
                "neighbors": (recomputed, nbr_tombs, "query_id"),
            },
        )
    else:
        # first epoch: corpus = surviving upserts, neighbors = its top-k
        init_pair_store(
            root,
            name,
            {
                "vectors": delta,
                "neighbors": _neighbors_topk(
                    delta, id_col, band_col, vec_col, band, k
                ),
            },
        )
        return
    if auto_compact:
        compact_pair_if_needed(
            spark, root, name, keys,
            max_generations=max_generations,
            max_delta_fraction=max_delta_fraction,
        )


def start_streaming_neighbors_logged(
    stream: DataFrame,
    root: str,
    name: str,
    checkpoint_dir: str,
    *,
    id_col: str,
    band_col: str,
    vec_col: str,
    seq_cols: Sequence[str],
    op_col: str = "op",
    band: float,
    k: int,
    auto_compact: bool = True,
):
    """Consume a vector change stream into a log-structured paired
    store; returns the StreamingQuery."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        apply_neighbors_log_batch(
            batch_df,
            root,
            name,
            id_col=id_col,
            band_col=band_col,
            vec_col=vec_col,
            seq_cols=seq_cols,
            op_col=op_col,
            band=band,
            k=k,
            auto_compact=auto_compact,
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def start_streaming_neighbors(
    stream: DataFrame,
    root: str,
    name: str,
    checkpoint_dir: str,
    *,
    id_col: str,
    band_col: str,
    vec_col: str,
    seq_cols: Sequence[str],
    op_col: str = "op",
    band: float,
    k: int,
):
    """Consume a vector change stream into a stored neighbors pair;
    returns the StreamingQuery."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        apply_neighbors_batch(
            batch_df,
            root,
            name,
            id_col=id_col,
            band_col=band_col,
            vec_col=vec_col,
            seq_cols=seq_cols,
            op_col=op_col,
            band=band,
            k=k,
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
