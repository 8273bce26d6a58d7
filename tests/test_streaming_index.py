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
