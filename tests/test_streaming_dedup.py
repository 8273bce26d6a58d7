"""Streaming MinHash dedup (streaming/dedup.py): the drained stream must
reproduce the batch pipeline's full-corpus answer exactly, pair-for-pair,
with each pair emitted in the epoch its later document arrived."""

from __future__ import annotations


def _docs(ids_texts):
    return [(int(i), t) for i, t in ids_texts]


def _batches():
    """Three arrival batches with planted near-dups within AND across
    batches (identical token multisets => Jaccard 1, recall 1 at any
    band config). Doc ids are globally unique across batches (the
    incremental index contract)."""
    b0 = _docs(
        [
            (0, "alpha beta gamma delta"),
            (1, "epsilon zeta eta theta"),
            (2, "alpha beta gamma delta"),  # dup of 0, same batch
            (3, "iota kappa lambda mu"),
        ]
    )
    b1 = _docs(
        [
            (10, "alpha beta gamma delta"),  # dup of 0/2, prior batch
            (11, "nu xi omicron pi"),
            (12, "epsilon zeta eta theta"),  # dup of 1
        ]
    )
    b2 = _docs(
        [
            (20, "nu xi omicron pi"),  # dup of 11
            (21, "rho sigma tau upsilon"),
            (22, "alpha beta gamma delta"),  # dup of 0/2/10
        ]
    )
    return [b0, b1, b2]


def test_streaming_dedup_matches_full_batch_recompute(spark, tmp_path):
    from pyspark.sql import functions as F

    from bgg_data_warehouse_spark.operators.dedup import minhash_lsh_pairs
    from bgg_data_warehouse_spark.streaming.dedup import (
        read_document_stream,
        start_streaming_dedup,
    )

    landing = str(tmp_path / "landing")
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    batches = _batches()
    conf = dict(shingle_k=1, num_hashes=48)

    def write_batch(i):
        spark.createDataFrame(
            batches[i], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(landing)

    write_batch(0)
    q = start_streaming_dedup(
        read_document_stream(spark, landing),
        index_dir,
        pairs_dir,
        ckpt,
        bands=2,
        jaccard_threshold=0.97,
        **conf,
    )
    try:
        q.processAllAvailable()
        write_batch(1)
        q.processAllAvailable()
        write_batch(2)
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in spark.read.parquet(f"{pairs_dir}/batch-*").collect()
    )
    all_docs = spark.createDataFrame(
        [d for b in batches for d in b], "doc_id long, text string"
    )
    expected = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_pairs(
            all_docs, "doc_id", "text", bands=2, jaccard_threshold=0.97, **conf
        ).collect()
    )
    assert got == expected and len(got) > 0
    # every pair exactly once across epochs (no replays, no misses)
    assert len(got) == len(set(got))
    # the index accumulated every ingested doc's sketch
    idx = spark.read.parquet(f"{index_dir}/batch-*")
    assert sorted(r.doc for r in idx.select("doc").collect()) == sorted(
        d for b in batches for d, _ in b
    )


def test_streaming_dedup_restart_is_idempotent(spark, tmp_path):
    """Stop after two epochs, restart from the checkpoint, feed one more
    batch: already-processed epochs must not re-emit or double-write
    their sketches."""
    from bgg_data_warehouse_spark.streaming.dedup import (
        read_document_stream,
        start_streaming_dedup,
    )

    landing = str(tmp_path / "landing")
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    batches = _batches()
    conf = dict(shingle_k=1, num_hashes=48)

    def write_batch(i):
        spark.createDataFrame(
            batches[i], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(landing)

    def start():
        return start_streaming_dedup(
            read_document_stream(spark, landing),
            index_dir,
            pairs_dir,
            ckpt,
            bands=2,
            jaccard_threshold=0.97,
            **conf,
        )

    write_batch(0)
    q = start()
    try:
        q.processAllAvailable()
        write_batch(1)
        q.processAllAvailable()
    finally:
        q.stop()

    q2 = start()
    try:
        write_batch(2)
        q2.processAllAvailable()
    finally:
        q2.stop()

    idx = spark.read.parquet(f"{index_dir}/batch-*")
    docs = sorted(r.doc for r in idx.select("doc").collect())
    assert docs == sorted(d for b in batches for d, _ in b)  # no doubles
    pairs = spark.read.parquet(f"{pairs_dir}/batch-*").collect()
    keys = [(r.doc_a, r.doc_b) for r in pairs]
    assert len(keys) == len(set(keys))  # no duplicate pair emissions
