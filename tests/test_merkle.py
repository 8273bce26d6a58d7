"""Merkle table commitment (operators/merkle.py): tree shape, tamper
localization, empty-slot semantics, and the DuckDB oracle replay."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row

from bgg_data_warehouse_spark.operators.merkle import (
    merkle_tree,
    merkle_tree_oracle_sql,
)


def _leaves(spark, triples):
    return spark.createDataFrame(
        [Row(bucket=b, checksum=c, n_rows=n) for b, c, n in triples]
    )


def _tree(spark, triples, n=8):
    return {
        (r["level"], r["idx"]): r["h"]
        for r in merkle_tree(_leaves(spark, triples), n).collect()
    }


def test_tree_has_full_shape_and_single_root(spark):
    t = _tree(spark, [(0, 5, 2), (3, 7, 1)], n=8)
    assert len(t) == 8 + 4 + 2 + 1
    assert (3, 0) in t  # root of an 8-leaf tree sits at level 3


def test_root_is_content_function_not_occupancy(spark):
    # explicit zero leaf == absent leaf
    a = _tree(spark, [(0, 5, 2)], n=4)
    b = _tree(spark, [(0, 5, 2), (3, 0, 0)], n=4)
    assert a == b


def test_tamper_changes_root_and_localizes(spark):
    a = _tree(spark, [(0, 5, 2), (3, 7, 1)], n=8)
    b = _tree(spark, [(0, 5, 2), (3, 8, 1)], n=8)  # bucket 3 diverges
    assert a[(3, 0)] != b[(3, 0)]
    # the divergence walk: level 2 child 0 differs (covers leaves 0-3),
    # child 1 agrees (leaves 4-7 all empty in both)
    assert a[(2, 0)] != b[(2, 0)]
    assert a[(2, 1)] == b[(2, 1)]
    assert a[(0, 3)] != b[(0, 3)]
    assert a[(0, 0)] == b[(0, 0)]


def test_rejects_non_power_of_two(spark):
    with pytest.raises(ValueError):
        merkle_tree(_leaves(spark, [(0, 1, 1)]), 6)
    with pytest.raises(ValueError):
        merkle_tree_oracle_sql("SELECT 1", 12)


def test_oracle_replays_spark_exactly(spark):
    triples = [(0, 11, 3), (1, 22, 1), (5, 33, 2)]
    got = _tree(spark, triples, n=8)
    values = ", ".join(f"({b}, {c}, {n})" for b, c, n in triples)
    sql = (
        merkle_tree_oracle_sql(
            f"SELECT * FROM (VALUES {values}) t(bucket, checksum, n_rows)", 8
        )
        + " SELECT level, idx, h FROM tree"
    )
    want = {
        (r[0], r[1]): r[2] for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == want


def test_out_of_range_bucket_raises_not_silently_drops(spark):
    bad = _leaves(spark, [(0, 5, 2), (64, 7, 1)])  # 64 outside [0, 8)
    with pytest.raises(Exception, match="outside"):
        merkle_tree(bad, 8).collect()


def test_duplicate_bucket_raises_not_silently_stacks(spark):
    bad = _leaves(spark, [(3, 5, 2), (3, 7, 1)])  # bucket 3 twice
    with pytest.raises(Exception, match="duplicate bucket"):
        merkle_tree(bad, 8).collect()


def test_merkle_update_path_equals_full_rebuild(spark):
    base = [(0, 11, 3), (1, 22, 1), (5, 33, 2)]
    from bgg_data_warehouse_spark.operators.merkle import merkle_update
    from pyspark.sql import functions as F

    tree = merkle_tree(_leaves(spark, base), 8)
    new_leaf = spark.createDataFrame([Row(checksum=99, n_rows=7)])
    got = {
        (r["level"], r["idx"]): r["h"]
        for r in merkle_update(tree, new_leaf, 5, 8).collect()
    }
    want = _tree(spark, [(0, 11, 3), (1, 22, 1), (5, 99, 7)], n=8)
    assert got == want
    # untouched subtree survived verbatim; changed path really changed
    old = _tree(spark, base, n=8)
    assert got[(2, 0)] == old[(2, 0)]
    assert got[(0, 5)] != old[(0, 5)] and got[(3, 0)] != old[(3, 0)]


def test_merkle_update_rejects_bad_leaf_idx(spark):
    from bgg_data_warehouse_spark.operators.merkle import merkle_update

    tree = merkle_tree(_leaves(spark, [(0, 1, 1)]), 8)
    leaf = spark.createDataFrame([Row(checksum=1, n_rows=1)])
    with pytest.raises(ValueError):
        merkle_update(tree, leaf, 8, 8)


def test_merkle_update_rejects_empty_new_leaf(spark):
    """0-row new_leaf must raise, not silently drop the old path (the
    tree would lose its root) — the round-7 ADVICE cardinality guard."""
    from bgg_data_warehouse_spark.operators.merkle import merkle_update

    tree = merkle_tree(_leaves(spark, [(0, 1, 1)]), 8)
    empty = spark.createDataFrame([], "checksum long, n_rows long")
    with pytest.raises(Exception, match="exactly 1 row"):
        merkle_update(tree, empty, 3, 8).collect()


def test_merkle_update_rejects_multi_row_new_leaf(spark):
    """>1-row new_leaf must raise, not duplicate every path node."""
    from bgg_data_warehouse_spark.operators.merkle import merkle_update

    tree = merkle_tree(_leaves(spark, [(0, 1, 1)]), 8)
    two = spark.createDataFrame(
        [Row(checksum=1, n_rows=1), Row(checksum=2, n_rows=2)]
    )
    with pytest.raises(Exception, match="exactly 1 row"):
        merkle_update(tree, two, 3, 8).collect()
