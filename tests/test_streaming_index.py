"""Streaming index maintenance (streaming/index_maintenance.py): the
drained document change stream's stored postings must equal a full
rebuild on the final corpus, within-batch LWW must order
delete-vs-reingest by the log, same-epoch replay must be a no-op, and
the MinHash twin must keep sketch-index pairs equal to a fresh
sketch's."""

from __future__ import annotations

from pyspark.sql import functions as F

SCHEMA = "doc_id long, seq long, op string, text string"


def _epochs():
    """Three epochs over six docs. Final corpus: 1 (v2 text), 2, 4, 5
    (re-created after delete); 3 deleted; 6 ingested-then-deleted
    within one epoch."""
    e0 = [
        (1, 1, "U", "alpha beta gamma"),
        (2, 2, "U", "delta epsilon zeta"),
        (3, 3, "U", "eta theta iota"),
        (4, 4, "U", "kappa lambda mu"),
    ]
    e1 = [
        (1, 5, "U", "alpha beta gamma REVISED"),  # re-ingest replaces
        (3, 6, "D", None),  # delete
        (6, 7, "U", "nu xi omicron"),  # insert...
        (6, 8, "D", None),  # ...then delete, same epoch (LWW: absent)
    ]
    e2 = [
        (5, 9, "D", None),  # delete of a never-indexed doc: no-op
        (5, 10, "U", "pi rho sigma"),  # then created (LWW: present)
    ]
    return [e0, e1, e2]


def _final_corpus(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma REVISED"),
            (2, "delta epsilon zeta"),
            (4, "kappa lambda mu"),
            (5, "pi rho sigma"),
        ],
        "doc_id long, text string",
    )


def _postings_set(df):
    return {(r.tok, r.doc, r.tf) for r in df.collect()}


def test_streaming_postings_matches_full_rebuild(spark, tmp_path):
    from bgg_data_warehouse_spark.operators.inverted_index import (
        inverted_postings,
    )
    from bgg_data_warehouse_spark.streaming.index_maintenance import (
        read_index,
        start_streaming_index,
    )

    landing = str(tmp_path / "landing")
    root = str(tmp_path / "tables")
    epochs = _epochs()

    def write_epoch(i):
        spark.createDataFrame(epochs[i], SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    write_epoch(0)
    q = start_streaming_index(
        spark.readStream.schema(SCHEMA).parquet(landing),
        root,
        "postings",
        str(tmp_path / "ckpt"),
        id_col="doc_id",
        text_col="text",
        seq_cols=["seq"],
    )
    try:
        q.processAllAvailable()
        write_epoch(1)
        q.processAllAvailable()
        write_epoch(2)
        q.processAllAvailable()
    finally:
        q.stop()

    got = _postings_set(read_index(spark, root, "postings"))
    want = _postings_set(
        inverted_postings(_final_corpus(spark), "doc_id", "text")
    )
    assert got == want
    docs = {d for _, d, _ in got}
    assert docs == {1, 2, 4, 5}  # 3 deleted, 6 never survives its epoch
    # doc 1 reflects the REVISED text, not the original
    assert ("revised", 1, 1) in got


def test_postings_same_epoch_replay_is_noop(spark, tmp_path):
    from bgg_data_warehouse_spark.streaming.index_maintenance import (
        apply_postings_batch,
        read_index,
    )

    root = str(tmp_path / "tables")
    epochs = _epochs()
    kw = dict(id_col="doc_id", text_col="text", seq_cols=["seq"])
    for e in epochs[:2]:
        apply_postings_batch(
            spark.createDataFrame(e, SCHEMA), root, "postings", **kw
        )
    before = _postings_set(read_index(spark, root, "postings"))
    apply_postings_batch(
        spark.createDataFrame(epochs[1], SCHEMA), root, "postings", **kw
    )
    assert _postings_set(read_index(spark, root, "postings")) == before


VEC_SCHEMA = "vec_id long, label double, vec array<double>, seq long, op string"


def _vec_epochs():
    """Two epochs over six vectors. Final corpus: 1 (re-embedded), 2, 3,
    5 (re-created after delete); 4 deleted; 6 upserted-then-deleted
    within one epoch (LWW: absent)."""
    e0 = [
        (1, 0.0, [1.0, 0.0, 0.0], 1, "U"),
        (2, 0.0, [0.9, 0.1, 0.0], 2, "U"),
        (3, 1.0, [0.0, 1.0, 0.0], 3, "U"),
        (4, 1.0, [0.0, 0.9, 0.1], 4, "U"),
        (5, 2.0, [0.0, 0.0, 1.0], 5, "U"),
    ]
    e1 = [
        (1, 1.0, [0.5, 0.5, 0.0], 6, "U"),  # re-embed, band moves 0→1
        (4, 0.0, None, 7, "D"),  # delete
        (5, 0.0, None, 8, "D"),  # delete...
        (5, 2.0, [0.1, 0.0, 1.0], 9, "U"),  # ...then re-create (LWW: present)
        (6, 2.0, [1.0, 1.0, 1.0], 10, "U"),  # upsert...
        (6, 0.0, None, 11, "D"),  # ...then delete, same epoch (absent)
    ]
    return [e0, e1]


def _vec_final_corpus(spark):
    return spark.createDataFrame(
        [
            (1, 1.0, [0.5, 0.5, 0.0]),
            (2, 0.0, [0.9, 0.1, 0.0]),
            (3, 1.0, [0.0, 1.0, 0.0]),
            (5, 2.0, [0.1, 0.0, 1.0]),
        ],
        "vec_id long, label double, vec array<double>",
    )


def _nbr_set(df):
    return {
        (r.query_id, r.nbr_id, r.cosine_sim, r.rank) for r in df.collect()
    }


def test_streaming_neighbors_matches_full_rebuild(spark, tmp_path):
    from bgg_data_warehouse_spark.io import _neighbors_topk, read_neighbors_table
    from bgg_data_warehouse_spark.streaming.index_maintenance import (
        start_streaming_neighbors,
    )

    landing = str(tmp_path / "landing")
    root = str(tmp_path / "tables")
    epochs = _vec_epochs()

    def write_epoch(i):
        spark.createDataFrame(epochs[i], VEC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    write_epoch(0)
    q = start_streaming_neighbors(
        spark.readStream.schema(VEC_SCHEMA).parquet(landing),
        root,
        "nbr",
        str(tmp_path / "ckpt"),
        id_col="vec_id",
        band_col="label",
        vec_col="vec",
        seq_cols=["seq"],
        band=1.0,
        k=3,
    )
    try:
        q.processAllAvailable()
        write_epoch(1)
        q.processAllAvailable()
    finally:
        q.stop()

    got = _nbr_set(read_neighbors_table(spark, root, "nbr"))
    want = _nbr_set(
        _neighbors_topk(_vec_final_corpus(spark), "vec_id", "label", "vec", 1.0, 3)
    )
    assert got == want


def test_neighbors_epoch_replay_and_crash_heal(spark, tmp_path):
    import os

    from bgg_data_warehouse_spark.io import read_neighbors_table
    from bgg_data_warehouse_spark.streaming.index_maintenance import (
        apply_neighbors_batch,
    )

    root = str(tmp_path / "tables")
    epochs = _vec_epochs()
    kw = dict(
        id_col="vec_id", band_col="label", vec_col="vec",
        seq_cols=["seq"], band=1.0, k=3,
    )
    for e in epochs:
        apply_neighbors_batch(
            spark.createDataFrame(e, VEC_SCHEMA), root, "nbr", **kw
        )
    before = _nbr_set(read_neighbors_table(spark, root, "nbr"))
    # foreachBatch replays at most the last uncommitted epoch
    apply_neighbors_batch(
        spark.createDataFrame(epochs[-1], VEC_SCHEMA), root, "nbr", **kw
    )
    assert _nbr_set(read_neighbors_table(spark, root, "nbr")) == before
    # crash between the pair swap's renames, then the next epoch heals
    # before its existence check — no first-write rebuild from one batch
    store = os.path.join(root, "nbr")
    os.rename(store, store + "__old_00000000000000000009_x")
    apply_neighbors_batch(
        spark.createDataFrame(epochs[-1], VEC_SCHEMA), root, "nbr", **kw
    )
    assert _nbr_set(read_neighbors_table(spark, root, "nbr")) == before


def test_streaming_minhash_index_matches_fresh_sketch(spark, tmp_path):
    from bgg_data_warehouse_spark.operators.dedup import (
        minhash_sketch,
        sketch_pairs,
    )
    from bgg_data_warehouse_spark.streaming.index_maintenance import (
        apply_minhash_batch,
        read_index,
    )

    root = str(tmp_path / "tables")
    conf = dict(shingle_k=1, num_hashes=16)
    kw = dict(id_col="doc_id", text_col="text", seq_cols=["seq"], **conf)
    for e in _epochs():
        apply_minhash_batch(
            spark.createDataFrame(e, SCHEMA), root, "mh_index", **kw
        )
    stored = read_index(spark, root, "mh_index")
    assert {r.doc for r in stored.select("doc").collect()} == {1, 2, 4, 5}
    pconf = dict(num_hashes=16, bands=2, jaccard_threshold=0.9)
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in sketch_pairs(stored, **pconf).collect()
    }
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in sketch_pairs(
            minhash_sketch(_final_corpus(spark), "doc_id", "text", **conf),
            **pconf,
        ).collect()
    }
    assert got == want
