"""Streaming graph maintenance (streaming/graph.py): the drained edge
change stream's labeling must equal full CC on the final edge set,
epoch replay must be a no-op (adds contract to nothing, deletes
recompute identically), and within-epoch LWW must resolve add/delete
conflicts per edge before anything applies."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SCHEMA = "src long, dst long, seq long, op string"

# e0 bootstraps: chain 1-2-3-4, pair 10-11 (one edge arrives reversed —
# orientation-normalized into the same key space)
E0 = [
    (1, 2, 1, "U"), (3, 2, 2, "U"), (3, 4, 3, "U"), (11, 10, 4, "U"),
]
# e1: split the chain, bridge 4 to the pair, open a new component
E1 = [
    (2, 3, 10, "D"), (4, 10, 11, "U"), (20, 21, 12, "U"),
]
# e2: same-epoch delete-then-re-add of (3,4) (LWW winner = U, edge
# survives); delete (10,11); re-add (2,3) (heals e1's split)
E2 = [
    (3, 4, 20, "D"), (4, 3, 21, "U"), (10, 11, 22, "D"), (2, 3, 23, "U"),
]
EPOCHS = [E0, E1, E2]


def _final_edges(epochs):
    e = set()
    for ep in epochs:
        latest = {}
        for s, d, q, op in ep:
            k = (min(s, d), max(s, d))
            if k not in latest or q > latest[k][0]:
                latest[k] = (q, op)
        e -= {k for k, (_, op) in latest.items() if op == "D"}
        e |= {k for k, (_, op) in latest.items() if op == "U"}
    return e


def _labels(spark, root, name):
    from bgg_data_warehouse_spark.streaming.graph import read_components_labels

    return {
        (r.node, r.canonical)
        for r in read_components_labels(spark, root, name).collect()
    }


def _want(spark, edges):
    from bgg_data_warehouse_spark.operators.components import (
        connected_components_star,
    )

    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    return {
        (r.node, r.canonical)
        for r in connected_components_star(
            df, "src", "dst", canonical_edges=True
        ).collect()
    }


def test_streaming_components_matches_full_recompute(spark, tmp_path):
    from bgg_data_warehouse_spark.streaming.graph import (
        start_streaming_components_logged,
    )

    landing = str(tmp_path / "landing")
    root = str(tmp_path / "stores")

    def write_epoch(i):
        spark.createDataFrame(EPOCHS[i], SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    write_epoch(0)
    q = start_streaming_components_logged(
        spark.readStream.schema(SCHEMA).parquet(landing),
        root,
        "cc",
        str(tmp_path / "ckpt"),
        src="src",
        dst="dst",
        seq_cols=["seq"],
        auto_compact=False,
    )
    try:
        q.processAllAvailable()
        write_epoch(1)
        q.processAllAvailable()
        write_epoch(2)
        q.processAllAvailable()
    finally:
        q.stop()

    final = _final_edges(EPOCHS)
    assert _labels(spark, root, "cc") == _want(spark, final)
    # spot-checks: LWW kept (3,4); (10,11) gone isolates neither (10 is
    # bridged via (4,10)), 11 drops out entirely
    assert (3, 4) in final and (10, 11) not in final
    got_nodes = {n for n, _ in _labels(spark, root, "cc")}
    assert 11 not in got_nodes and 10 in got_nodes
    # and the edges part reads back exactly the final set
    from bgg_data_warehouse_spark.streaming.graph import read_components_edges

    got_edges = {
        (r.src, r.dst)
        for r in read_components_edges(spark, root, "cc", "src", "dst").collect()
    }
    assert got_edges == final


def test_components_epoch_replay_is_noop_and_add_replay_writes_no_labels(
    spark, tmp_path
):
    from bgg_data_warehouse_spark.log_store import _delta_dirs, _store_path
    from bgg_data_warehouse_spark.streaming.graph import (
        apply_components_log_batch,
    )

    root = str(tmp_path)
    kw = dict(src="src", dst="dst", seq_cols=["seq"], auto_compact=False)
    for i in (0, 1):
        apply_components_log_batch(
            spark.createDataFrame(EPOCHS[i], SCHEMA), root, "cc", **kw
        )
    before = _labels(spark, root, "cc")
    assert before == _want(spark, _final_edges(EPOCHS[:2]))
    # replay epoch 1 (delete + add passes): labeling is unchanged, and
    # the replayed ADD generation carries zero label rows — every
    # endpoint already contracted to one canonical
    apply_components_log_batch(
        spark.createDataFrame(EPOCHS[1], SCHEMA), root, "cc", **kw
    )
    assert _labels(spark, root, "cc") == before
    gens = _delta_dirs(_store_path(root, "cc"), committed=True)
    add_gen_labels = spark.read.parquet(
        os.path.join(gens[-1], "labels", "rows")
    )
    assert add_gen_labels.count() == 0


def test_components_stream_with_compaction_every_epoch(spark, tmp_path):
    """auto-compacting on every epoch (max_generations=0) folds the pair
    after each batch and converges to the same labeling."""
    from bgg_data_warehouse_spark.log_store import _delta_dirs, _store_path
    from bgg_data_warehouse_spark.streaming.graph import (
        apply_components_log_batch,
    )

    root = str(tmp_path)
    for i in range(3):
        apply_components_log_batch(
            spark.createDataFrame(EPOCHS[i], SCHEMA),
            root,
            "cc",
            src="src",
            dst="dst",
            seq_cols=["seq"],
            auto_compact=True,
            max_generations=0,
        )
    assert _labels(spark, root, "cc") == _want(spark, _final_edges(EPOCHS))
    assert _delta_dirs(_store_path(root, "cc"), committed=True) == []


def test_components_first_epoch_lww_conflict(spark, tmp_path):
    """A first-epoch edge both added and deleted resolves by LWW before
    the bootstrap CC runs."""
    from bgg_data_warehouse_spark.streaming.graph import (
        apply_components_log_batch,
    )

    batch = [(1, 2, 1, "U"), (2, 3, 2, "U"), (2, 1, 3, "D")]
    apply_components_log_batch(
        spark.createDataFrame(batch, SCHEMA), root := str(tmp_path), "cc",
        src="src", dst="dst", seq_cols=["seq"],
    )
    assert _labels(spark, root, "cc") == {(2, 2), (3, 2)}


def test_components_first_epoch_all_deletes_bootstraps_empty(spark, tmp_path):
    """A first epoch whose survivors are all 'D' bootstraps an EMPTY
    store (a delete can only target a same-epoch add, which LWW already
    resolved); a later add epoch then lands normally."""
    from bgg_data_warehouse_spark.streaming.graph import (
        apply_components_log_batch,
    )

    root = str(tmp_path)
    kw = dict(src="src", dst="dst", seq_cols=["seq"])
    apply_components_log_batch(
        spark.createDataFrame([(1, 2, 1, "D"), (3, 4, 2, "D")], SCHEMA),
        root, "cc", **kw,
    )
    assert _labels(spark, root, "cc") == set()
    apply_components_log_batch(
        spark.createDataFrame([(1, 2, 3, "U")], SCHEMA), root, "cc", **kw
    )
    assert _labels(spark, root, "cc") == {(1, 1), (2, 1)}


def _canon_edges(rows):
    return {(min(a, b), max(a, b)) for a, b in rows}


def test_annotated_compaction_prunes_and_stays_correct(spark, tmp_path):
    """r14 VERDICT #4: compacting with components_log_layouts stamps
    the edges base with the folded labeling (_comp) and range-clusters
    both parts; the NEXT delete epoch on the folded store runs the
    canonical_col prune path and must match a full recompute. A second
    delete epoch (generations now present — annotations no longer
    trusted) must fall back and STILL match. Consumers never see
    _comp."""
    from bgg_data_warehouse_spark.io import (
        compact_components_log,
        init_components_log,
        maintain_components_log,
    )
    from bgg_data_warehouse_spark.operators.components import (
        connected_components_star,
    )
    from bgg_data_warehouse_spark.streaming.graph import (
        read_components_edges,
    )

    root = str(tmp_path)
    # chains {1-2-3-4-5}, {10-11-12}, {20-21}
    edges0 = [(i, i + 1) for i in range(1, 5)] + [
        (10, 11), (11, 12), (20, 21)
    ]
    e0 = spark.createDataFrame(edges0, "src long, dst long")
    init_components_log(
        root, "cc",
        connected_components_star(e0, "src", "dst", canonical_edges=True),
        e0, "src", "dst",
    )
    # one add epoch, then fold WITH annotation
    add = spark.createDataFrame([(5, 10, )], "src long, dst long")
    maintain_components_log(
        spark, root, "cc", add, "src", "dst", auto_compact=False
    )
    assert compact_components_log(spark, root, "cc", "src", "dst") >= 1
    # base now annotated; consumer read hides it
    base_edges = spark.read.parquet(os.path.join(root, "cc", "base", "edges"))
    assert "_comp" in base_edges.columns
    got_edges = read_components_edges(spark, root, "cc", "src", "dst")
    assert "_comp" not in got_edges.columns
    cur = _canon_edges(edges0 + [(5, 10)])
    assert {(r.src, r.dst) for r in got_edges.collect()} == cur
    # delete on the FOLDED store: the pruned canonical_col path
    d1 = spark.createDataFrame([(3, 4)], "src long, dst long")
    maintain_components_log(
        spark, root, "cc", d1, "src", "dst", deleted=True, auto_compact=False
    )
    cur -= {(3, 4)}
    assert _labels(spark, root, "cc") == _want(spark, cur)
    # delete with a generation present: fallback path, same contract
    d2 = spark.createDataFrame([(11, 12)], "src long, dst long")
    maintain_components_log(
        spark, root, "cc", d2, "src", "dst", deleted=True, auto_compact=False
    )
    cur -= {(11, 12)}
    assert _labels(spark, root, "cc") == _want(spark, cur)
    # fold again (annotation refreshes over the stale base stamp) and
    # verify the edge set and labels both survive the second fold
    assert compact_components_log(spark, root, "cc", "src", "dst") >= 1
    assert _labels(spark, root, "cc") == _want(spark, cur)
    got_edges = read_components_edges(spark, root, "cc", "src", "dst")
    assert {(r.src, r.dst) for r in got_edges.collect()} == cur


def test_annotated_scan_prune_reaches_parquet(spark, tmp_path):
    """Plan pin for the prune mechanism: a literal _comp IN-filter on
    the annotated, range-clustered edges base is PUSHED to the parquet
    scan (row-group stats prune unaffected components' files)."""
    from bgg_data_warehouse_spark.io import (
        compact_components_log,
        init_components_log,
        maintain_components_log,
    )
    from bgg_data_warehouse_spark.operators.components import (
        connected_components_star,
    )

    root = str(tmp_path)
    edges0 = [(i * 10, i * 10 + 1) for i in range(1, 40)]
    e0 = spark.createDataFrame(edges0, "src long, dst long")
    init_components_log(
        root, "cc",
        connected_components_star(e0, "src", "dst", canonical_edges=True),
        e0, "src", "dst",
    )
    add = spark.createDataFrame([(401, 402)], "src long, dst long")
    maintain_components_log(
        spark, root, "cc", add, "src", "dst", auto_compact=False
    )
    compact_components_log(spark, root, "cc", "src", "dst")
    base = spark.read.parquet(os.path.join(root, "cc", "base", "edges"))
    plan = (
        base.where(F.col("_comp").isin([10, 20]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [In(_comp" in plan
