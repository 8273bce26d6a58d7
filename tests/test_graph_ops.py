"""Graph analytics: degree-oriented triangle counting + k-core peeling.

PageRank-on-symmetric-graphs properties (uniform fixed point, mass
conservation) live here too, exercised through the single canonical
operator ``operators/pagerank.py`` (graph.py's duplicate was removed);
directed-graph PageRank semantics are covered in test_clustering.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bgg_data_warehouse_spark.operators.graph import orient_edges, triangle_count
from bgg_data_warehouse_spark.operators.pagerank import pagerank_integer
from tests.test_plan_audit import executed_plan

SCALE = 1_000_000


def _df(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def _tri(spark, pairs):
    return triangle_count(_df(spark, pairs)).collect()[0]["n_triangles"]


def test_triangle_single(spark):
    assert _tri(spark, [(1, 2), (2, 3), (3, 1)]) == 1


def test_triangle_square_without_diagonal_has_none(spark):
    assert _tri(spark, [(1, 2), (2, 3), (3, 4), (4, 1)]) == 0


def test_triangle_two_sharing_an_edge(spark):
    assert _tri(spark, [(1, 2), (2, 3), (3, 1), (2, 4), (4, 3)]) == 2


def test_triangle_k4_has_four(spark):
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    assert _tri(spark, k4) == 4


def test_triangle_ignores_duplicate_and_reverse_edges(spark):
    assert _tri(spark, [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3)]) == 1


def test_orientation_each_edge_once_lower_degree_first(spark):
    # star: centre 1 has degree 3, leaves degree 1 -> all edges point
    # leaf -> centre
    o = orient_edges(_df(spark, [(1, 2), (1, 3), (1, 4)])).collect()
    assert {(r["src"], r["dst"]) for r in o} == {(2, 1), (3, 1), (4, 1)}


def _sym(pairs):
    """Symmetric closure of an undirected pair list (both orientations)."""
    return sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})


def test_pagerank_star_centre_dominates_and_is_deterministic(spark):
    star = _sym([(1, i) for i in range(2, 7)])
    r1 = {
        r["node"]: r["rank"]
        for r in pagerank_integer(_df(spark, star), "src", "dst").collect()
    }
    assert r1[1] > max(v for k, v in r1.items() if k != 1)
    # leaves are symmetric -> identical integer ranks
    assert len({v for k, v in r1.items() if k != 1}) == 1
    # bit-identical under a different partitioning (integer sums commute)
    r2 = {
        r["node"]: r["rank"]
        for r in pagerank_integer(
            _df(spark, star).repartition(7, "dst"), "src", "dst"
        ).collect()
    }
    assert r1 == r2


def test_pagerank_regular_graph_is_uniform_fixed_point(spark):
    # symmetric 4-cycle: every node deg 2 -> uniform SCALE is an exact
    # fixed point of the integer update (contrib = SCALE/2 each:
    # 150_000 + 85 * SCALE DIV 100 == SCALE)
    cyc = _sym([(1, 2), (2, 3), (3, 4), (4, 1)])
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank_integer(_df(spark, cyc), "src", "dst", rounds=4).collect()
    }
    assert set(ranks.values()) == {SCALE}


def test_pagerank_mass_roughly_conserved_on_symmetric_graph(spark):
    # On a symmetric graph there are no dangling nodes, so integer
    # truncation is the ONLY mass leak: total stays in ((1-eps)*V, V].
    pairs = _sym([(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)])
    total = pagerank_integer(_df(spark, pairs), "src", "dst").agg(
        F.sum("rank").alias("s")
    ).collect()[0]["s"]
    assert 5 * SCALE * 0.999 < total <= 5 * SCALE


def test_pagerank_rejects_nonpositive_rounds(spark):
    with pytest.raises(ValueError):
        pagerank_integer(_df(spark, [(1, 2)]), "src", "dst", rounds=0)


def test_triangle_plan_has_no_cartesian(spark):
    pairs = [(i, (i * 7) % 23 + 30) for i in range(1, 40)]
    plan = executed_plan(triangle_count(_df(spark, pairs)))
    assert "CartesianProduct" not in plan, plan


def test_kcore_triangle_with_tail(spark):
    # triangle {1,2,3} plus a dangling tail 3-4: 2-core = the triangle
    e = _df(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    from bgg_data_warehouse_spark.operators.graph import kcore

    out = {r["v"]: r["deg"] for r in kcore(e, k=2, rounds=3).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_cascading_peel_needs_multiple_rounds(spark):
    # path 1-2-3-4-5: every 2-core peel removes the current endpoints;
    # after enough rounds nothing survives
    from bgg_data_warehouse_spark.operators.graph import kcore

    path = [(i, i + 1) for i in range(1, 5)]
    assert kcore(_df(spark, path), k=2, rounds=4).count() == 0
    # with too few rounds the peel is visibly unconverged (by design —
    # rounds is part of the gated function's contract)
    assert kcore(_df(spark, path), k=2, rounds=1).count() > 0


def test_kcore_oracle_replays_spark_exactly(spark):
    import duckdb
    from bgg_data_warehouse_spark.operators.graph import kcore, kcore_oracle_sql

    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (5, 6)]
    got = {
        (r["v"], r["deg"])
        for r in kcore(_df(spark, pairs), k=2, rounds=2).collect()
    }
    values = ", ".join(f"({a}, {b})" for a, b in pairs)
    sql = kcore_oracle_sql(
        f"SELECT * FROM (VALUES {values}) t(src, dst)", k=2, rounds=2
    )
    want = set(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got == want


def test_kcore_rejects_bad_params(spark):
    from bgg_data_warehouse_spark.operators.graph import kcore

    with pytest.raises(ValueError):
        kcore(_df(spark, [(1, 2)]), k=0)
    with pytest.raises(ValueError):
        kcore(_df(spark, [(1, 2)]), k=2, rounds=0)
