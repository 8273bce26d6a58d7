"""Round-12 operators: incremental maintenance completion.

- MinHash dedup-index maintenance (operators/dedup.py::
  update_minhash_index / sketch_pairs — r11 VERDICT #2)
- deletion precedence in both incremental index maintainers (ADVICE r11:
  a doc both re-ingested and deleted must end absent)
- postings / sketch maintenance wired through STORED tables with the
  io.py atomic-swap machinery, surviving an injected mid-swap crash
  (r11 VERDICT #3)
- incremental neighbors refresh (r11 VERDICT #5)
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bgg_data_warehouse_spark.operators.dedup import (
    minhash_sketch,
    sketch_pairs,
    update_minhash_index,
)
from bgg_data_warehouse_spark.operators.inverted_index import (
    inverted_postings,
    update_postings,
)

DOCS = [
    (1, "alpha beta gamma delta"),
    (2, "alpha beta gamma delta"),  # exact dup of 1
    (3, "epsilon zeta eta theta"),
    (4, "iota kappa lambda mu"),
    (5, "epsilon zeta eta theta"),  # exact dup of 3
    (6, "nu xi omicron pi"),
]


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs_set(df):
    return {(r.doc_a, r.doc_b, r.jaccard) for r in df.collect()}


def _postings_set(df):
    return {(r.tok, r.doc, r.tf) for r in df.collect()}


CONF = dict(shingle_k=1, num_hashes=16)


def test_update_minhash_index_equals_full_rebuild(spark):
    """Stale sketches replaced + tombstones applied == fresh sketch of
    the post-update corpus, pair-for-pair."""
    docs = _docs(spark)
    stale = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 2, F.lit("totally different stale text"))
        .otherwise(F.col("text")),
    )
    index = minhash_sketch(stale, "doc_id", "text", **CONF)
    maintained = update_minhash_index(
        index,
        docs.where(F.col("doc_id") == 2),  # re-ingest fresh text
        "doc_id",
        "text",
        deleted_ids=docs.where(F.col("doc_id") == 5).select("doc_id"),
        **CONF,
    )
    live = docs.where(F.col("doc_id") != 5)
    rebuilt = minhash_sketch(live, "doc_id", "text", **CONF)
    got = _pairs_set(sketch_pairs(maintained, num_hashes=16, bands=2,
                                  jaccard_threshold=0.9))
    want = _pairs_set(sketch_pairs(rebuilt, num_hashes=16, bands=2,
                                   jaccard_threshold=0.9))
    assert got == want
    # the stale sketch of doc 2 is gone: (1, 2) pairs again
    assert any(p[:2] == (1, 2) for p in got)
    # doc 5 is tombstoned: no pair touches it
    assert not any(5 in p[:2] for p in got)


def test_update_minhash_index_deletion_wins(spark):
    """A doc in both delta_docs and deleted_ids ends up absent."""
    docs = _docs(spark)
    index = minhash_sketch(docs, "doc_id", "text", **CONF)
    maintained = update_minhash_index(
        index,
        docs.where(F.col("doc_id").isin(2, 3)),
        "doc_id",
        "text",
        deleted_ids=docs.where(F.col("doc_id") == 3).select("doc_id"),
        **CONF,
    )
    live = {r.doc for r in maintained.select("doc").collect()}
    assert 3 not in live
    assert live == {1, 2, 4, 5, 6}


def test_update_postings_deletion_wins(spark):
    """Same precedence contract for the inverted index (ADVICE r11: the
    fresh delta postings used to resurrect a concurrently-deleted doc)."""
    docs = _docs(spark)
    base = inverted_postings(docs, "doc_id", "text")
    merged = update_postings(
        base,
        docs.where(F.col("doc_id").isin(2, 3)),
        "doc_id",
        "text",
        deleted_ids=docs.where(F.col("doc_id") == 3).select("doc_id"),
    )
    live = {r.doc for r in merged.select("doc").distinct().collect()}
    assert 3 not in live
    want = _postings_set(
        inverted_postings(docs.where(F.col("doc_id") != 3), "doc_id", "text")
    )
    assert _postings_set(merged) == want


def test_maintain_postings_table_roundtrip(spark, tmp_path):
    """ingest -> re-ingest -> delete through STORED postings tables ==
    a full rebuild on the final corpus (r11 VERDICT #3)."""
    from bgg_data_warehouse_spark.io import (
        maintain_postings_table,
        read_table,
        write_table,
    )

    root = str(tmp_path)
    docs = _docs(spark)
    stale = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 4, F.lit("stale placeholder"))
        .otherwise(F.col("text")),
    )
    write_table(inverted_postings(stale, "doc_id", "text"), root, "postings")
    # round 1: replace doc 4's stale postings
    n = maintain_postings_table(
        spark, root, "postings", docs.where(F.col("doc_id") == 4),
        "doc_id", "text",
    )
    assert n > 0
    # round 2: delete docs 2 and 6 (empty delta)
    maintain_postings_table(
        spark, root, "postings",
        docs.where(F.lit(False)), "doc_id", "text",
        deleted_ids=docs.where(F.col("doc_id").isin(2, 6)).select("doc_id"),
    )
    final = docs.where(~F.col("doc_id").isin(2, 6))
    want = _postings_set(inverted_postings(final, "doc_id", "text"))
    assert _postings_set(read_table(spark, root, "postings")) == want


def test_maintain_postings_table_crash_recovery(spark, tmp_path, monkeypatch):
    """An injected crash between the two swap renames leaves a backup
    that recover_table heals; the maintenance then completes."""
    import bgg_data_warehouse_spark.io as io

    root = str(tmp_path)
    docs = _docs(spark)
    io.write_table(inverted_postings(docs, "doc_id", "text"), root, "postings")

    real_rename = os.rename
    state = {"n": 0}

    def crashing_rename(src, dst):
        state["n"] += 1
        if state["n"] == 2:  # after final->backup, before staging->final
            raise RuntimeError("injected crash mid-swap")
        real_rename(src, dst)

    monkeypatch.setattr(io.os, "rename", crashing_rename)
    with pytest.raises(RuntimeError, match="injected crash"):
        io.maintain_postings_table(
            spark, root, "postings",
            docs.where(F.lit(False)), "doc_id", "text",
            deleted_ids=docs.where(F.col("doc_id") == 1).select("doc_id"),
        )
    monkeypatch.setattr(io.os, "rename", real_rename)
    assert io.recover_table(root, "postings")
    # pre-crash state intact
    want_pre = _postings_set(inverted_postings(docs, "doc_id", "text"))
    assert _postings_set(io.read_table(spark, root, "postings")) == want_pre
    # redo the maintenance cleanly
    io.maintain_postings_table(
        spark, root, "postings",
        docs.where(F.lit(False)), "doc_id", "text",
        deleted_ids=docs.where(F.col("doc_id") == 1).select("doc_id"),
    )
    want = _postings_set(
        inverted_postings(docs.where(F.col("doc_id") != 1), "doc_id", "text")
    )
    assert _postings_set(io.read_table(spark, root, "postings")) == want


def test_maintain_minhash_index_table_roundtrip(spark, tmp_path):
    """The sketch-index twin: stored (doc, shingles, sig) maintenance
    through the atomic swap equals a fresh sketch of the final corpus."""
    from bgg_data_warehouse_spark.io import (
        maintain_minhash_index_table,
        read_table,
        write_table,
    )

    root = str(tmp_path)
    docs = _docs(spark)
    stale = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 2, F.lit("stale")).otherwise(F.col("text")),
    )
    write_table(
        minhash_sketch(stale, "doc_id", "text", **CONF), root, "mh_index"
    )
    maintain_minhash_index_table(
        spark, root, "mh_index", docs.where(F.col("doc_id") == 2),
        "doc_id", "text",
        deleted_ids=docs.where(F.col("doc_id") == 5).select("doc_id"),
        **CONF,
    )
    stored = read_table(spark, root, "mh_index")
    rebuilt = minhash_sketch(
        docs.where(F.col("doc_id") != 5), "doc_id", "text", **CONF
    )
    got = _pairs_set(sketch_pairs(stored, num_hashes=16, bands=2,
                                  jaccard_threshold=0.9))
    want = _pairs_set(sketch_pairs(rebuilt, num_hashes=16, bands=2,
                                   jaccard_threshold=0.9))
    assert got == want


def _knn_set(df):
    return {(r.query_id, r.nbr_id, r.cosine_sim, r.rank) for r in df.collect()}


def test_incremental_neighbors_equals_full_rebuild(spark):
    """Refresh(stored-on-base, delta) == full rebuild on base ∪ delta,
    on the real embeddings testdata."""
    from bgg_data_warehouse_spark.operators.band_join import (
        banded_cosine_pairs,
        incremental_neighbors,
    )
    from bgg_data_warehouse_spark.operators.latest import topk_per_key
    from bgg_data_warehouse_spark.sources.tables import load_table

    def _topk(corpus, probe_df=None):
        return topk_per_key(
            banded_cosine_pairs(
                corpus, "vec_id", "label", "embedding", 1.0, probe_df=probe_df
            ),
            ["s_id"],
            [F.col("cos").desc(), F.col("t_id").asc()],
            k=5,
        ).select(
            F.col("s_id").alias("query_id"),
            F.col("t_id").alias("nbr_id"),
            F.round("cos", 6).alias("cosine_sim"),
            "rank",
        )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    is_delta = (F.col("label") == 9) & (F.col("vec_id") % 5 == 0)
    base, delta = emb.where(~is_delta), emb.where(is_delta)
    assert delta.count() > 0
    stored = _topk(base).localCheckpoint(eager=True)
    got = _knn_set(
        incremental_neighbors(
            stored, base, delta, "vec_id", "label", "embedding", 1.0, 5
        )
    )
    want = _knn_set(_topk(emb))
    assert got == want


def test_incremental_neighbors_probe_scoped_to_affected(spark):
    """The asymmetric band join only ever probes affected ∪ delta
    queries: every s_id the cogroup emits has label within band of a
    delta label, and unaffected queries keep their stored rows."""
    from bgg_data_warehouse_spark.operators.band_join import banded_cosine_pairs
    from bgg_data_warehouse_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    is_delta = (F.col("label") == 9) & (F.col("vec_id") % 5 == 0)
    base, delta = emb.where(~is_delta), emb.where(is_delta)
    bucket = F.floor(F.col("label") / F.lit(1.0)).cast("long")
    delta_buckets = delta.select(
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("_bkt")
    ).distinct()
    affected = (
        base.withColumn("_bkt", bucket)
        .join(F.broadcast(delta_buckets), "_bkt", "left_semi")
        .drop("_bkt")
    )
    probe = affected.unionByName(delta)
    pairs = banded_cosine_pairs(
        emb, "vec_id", "label", "embedding", 1.0, probe_df=probe
    )
    probed = {r.s_id for r in pairs.select("s_id").distinct().collect()}
    allowed = {r.vec_id for r in probe.select("vec_id").collect()}
    assert probed <= allowed
    # the scoping is genuinely partial: labels <= 7 are never probed
    labels = {
        r.label
        for r in emb.join(
            spark.createDataFrame([(i,) for i in probed], "vec_id long"),
            "vec_id",
        ).select("label").distinct().collect()
    }
    assert labels <= {8, 9}
    n_corpus = emb.count()
    assert len(allowed) < n_corpus // 2, (len(allowed), n_corpus)


def test_maintain_neighbors_store_roundtrip_survives_midswap_crash(
    spark, tmp_path
):
    """The paired corpus+neighbors store (r12 VERDICT #4): ingest →
    upsert batch → injected mid-swap crash → delete batch equals the
    full rebuild from the STORED corpus — the wrapper no longer accepts
    a caller-supplied base, so the refresh provably runs against the
    corpus the stored table was built from, and the pair swaps as one
    atomic unit."""
    import os

    from bgg_data_warehouse_spark.io import (
        _neighbors_topk,
        init_neighbors_store,
        maintain_neighbors_table,
        read_neighbors_corpus,
        read_neighbors_table,
    )
    from bgg_data_warehouse_spark.sources.tables import load_table

    root = str(tmp_path)
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    is_add = (F.col("label") == 9) & (F.col("vec_id") % 5 == 0)
    is_del = (F.col("label") == 7) & (F.col("vec_id") % 9 == 0)
    kw = dict(band=1.0, k=5)
    init_neighbors_store(
        spark, root, "nbr", emb.where(~is_add),
        "vec_id", "label", "embedding", **kw,
    )
    n = maintain_neighbors_table(
        spark, root, "nbr", emb.where(is_add),
        "vec_id", "label", "embedding", **kw,
    )
    assert n > 0
    # inject a crash between the pair swap's two renames: the live
    # store vanishes, only the backup remains — exactly the window
    # io._staged_swap leaves if the process dies mid-swap
    store = os.path.join(root, "nbr")
    os.rename(store, store + "__old_00000000000000000009_x")
    # the next read heals the PAIR (corpus and neighbors together —
    # never one without the other)
    assert read_neighbors_table(spark, root, "nbr").count() == n
    assert os.path.isdir(os.path.join(store, "vectors"))
    # delete batch: no base argument anywhere — the stored corpus is
    # the only corpus
    maintain_neighbors_table(
        spark, root, "nbr",
        emb.where(is_add).limit(0),
        "vec_id", "label", "embedding",
        deleted_ids=emb.where(is_del).select("vec_id"), **kw,
    )
    final_corpus = emb.where(~is_del)
    got = _knn_set(read_neighbors_table(spark, root, "nbr"))
    want = _knn_set(
        _neighbors_topk(final_corpus, "vec_id", "label", "embedding", 1.0, 5)
    )
    assert got == want
    # the stored corpus tracked the changes too
    assert read_neighbors_corpus(spark, root, "nbr").count() == final_corpus.count()
