"""Distributed graph analytics: triangle counting and k-core peeling.

Completes the graph family alongside connected components
(components.py), label propagation (label_prop.py) and integer
PageRank (pagerank.py — rank centrality lives THERE; this module must
not grow a second copy). Everything here is exact integer arithmetic,
deterministic by construction, so it can be hash-gated against a
DuckDB oracle replay (the same discipline as the CMS/HLL sketches and
the LPA rounds).

Reference provenance: the reference ranks games by pairwise similarity
(`/root/reference/definitions/game_similarity_search.sqlx`); triangle
density and rank centrality over the co-occurrence graph are the next
structural statistics an analyst derives from those same edges.

Scale design (100 TB):

- Triangle counting uses the degree-ordered orientation (each
  undirected edge points from its lower-(degree, id) endpoint to the
  higher one), which caps every out-neighbourhood at O(sqrt(m)) — the
  classic bound that keeps the wedge join from exploding on hub
  vertices (the naive neighbour self-join is quadratic in hub degree).
  Wedge generation is one self-equi-join on the wedge centre; closing
  is one equi-join against the canonical edge set. No cartesians.
- k-core peeling is K bounded rounds; each round is one degree
  aggregate plus two node-sized semi-joins, and the residual edge set
  only shrinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "orient_edges",
    "closed_wedges",
    "triangle_count",
    "kcore",
    "peel_round",
    "kcore_oracle_sql",
]


def _symmetrize(edges: DataFrame) -> DataFrame:
    """Distinct symmetric closure of an edge list, self-loops dropped."""
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev).where(F.col("src") != F.col("dst")).distinct()


def orient_edges(edges: DataFrame, *, assume_symmetric: bool = False) -> DataFrame:
    """Degree-ordered orientation of an undirected edge list.

    Input: (src, dst) in any mix of directions/duplicates. Output: each
    undirected edge exactly once as (src, dst) with
    (deg(src), src) < (deg(dst), dst) lexicographically. Out-degrees in
    the result are O(sqrt(m)), the property triangle counting needs.
    ``assume_symmetric=True`` skips the defensive symmetric closure —
    a full |E| distinct, the builder's dominant exchange — when the
    caller guarantees a distinct symmetric edge list with no self-loops
    (cooccurrence_edges output qualifies by construction).
    """
    return _orient_sym(edges if assume_symmetric else _symmetrize(edges))


def _orient_sym(sym: DataFrame) -> DataFrame:
    """Orientation over an ALREADY-symmetrized distinct edge list —
    split out so triangle_count can share one symmetric closure between
    orientation and its closing set (the closure's distinct is the
    operator's dominant shuffle; within one plan the identical subtree
    materializes once via ReusedExchange)."""
    deg = sym.groupBy("src").agg(F.count("*").alias("deg")).withColumnRenamed(
        "src", "v"
    )
    d1 = deg.withColumnRenamed("v", "src").withColumnRenamed("deg", "dsrc")
    d2 = deg.withColumnRenamed("v", "dst").withColumnRenamed("deg", "ddst")
    half = sym.where(F.col("src") < F.col("dst"))
    joined = half.join(d1, "src").join(d2, "dst")
    keep = (F.col("dsrc") < F.col("ddst")) | (
        (F.col("dsrc") == F.col("ddst")) & (F.col("src") < F.col("dst"))
    )
    return joined.select(
        F.when(keep, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(keep, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )


def triangle_count(edges: DataFrame, *, assume_symmetric: bool = False) -> DataFrame:
    """Global triangle count (1-row DataFrame, column ``n_triangles``).

    Wedges from the oriented edge list (two out-edges of a common
    centre, canonically ordered), closed against the canonical
    undirected half-edge set. Each triangle is counted exactly once:
    its degree-ordered orientation has exactly one vertex with two
    out-edges into the other two. ``assume_symmetric`` as in
    :func:`orient_edges`.
    """
    sym = edges if assume_symmetric else _symmetrize(edges)
    return closed_wedges(sym).agg(F.count("*").alias("n_triangles"))


def closed_wedges(sym: DataFrame) -> DataFrame:
    """One (v, w) row per triangle of an ALREADY-symmetrized distinct
    edge list, keyed by the triangle's canonical closing edge — the
    shared wedge machinery: triangle_count aggregates it globally,
    edge_support (k-truss cohesion) groups it per edge. Wedges come
    from the degree-ordered orientation (out-degree O(sqrt m), hub-safe)
    and close against the canonical half-edge set via one equi-join."""
    o = _orient_sym(sym)
    a = o.select(F.col("src").alias("c"), F.col("dst").alias("v"))
    b = o.select(F.col("src").alias("c"), F.col("dst").alias("w"))
    wedges = a.join(b, "c").where(F.col("v") < F.col("w"))
    closing = sym.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    return wedges.join(closing, ["v", "w"]).select("v", "w")


def kcore(
    edges: DataFrame,
    *,
    k: int,
    rounds: int = 5,
    assume_symmetric: bool = False,
) -> DataFrame:
    """Bounded k-core peeling; returns (v, deg) for surviving nodes.

    Each round removes every node whose degree in the CURRENT residual
    graph is < k, then restricts the edge set to survivors — the
    classic peel, run a FIXED number of rounds so the result is a pure
    function of (edges, k, rounds) and a DuckDB CTE chain can replay
    it for hash gating (``kcore_oracle_sql``). With enough rounds the
    fixed point IS the true k-core; callers gate convergence by
    checking that one extra round changes nothing (cheap: both frames
    are node-sized).

    Scale: each round is one degree aggregate (map-side combinable)
    plus two semi-joins of the |E|-sized residual against the
    node-sized survivor set; the residual only shrinks. Lineage is
    pinned per round. Peeling rounds here are a constant, not the
    graph's degeneracy-ordering depth — the right trade for a bounded
    DAG on a cluster (GraphX-style full convergence loops hide
    unbounded stage counts).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    e = (edges if assume_symmetric else _symmetrize(edges)).localCheckpoint(
        eager=False
    )
    for _ in range(rounds):
        e = peel_round(e, k).localCheckpoint(eager=False)
    return (
        e.groupBy(F.col("src").alias("v"))
        .agg(F.count("*").alias("deg"))
        .where(F.col("deg") >= k)
    )


def peel_round(e: DataFrame, k: int) -> DataFrame:
    """One k-core peeling round over a symmetric residual edge list —
    split out (and NOT checkpointed) so plan audits can see the round's
    real physical shape; ``kcore`` pins lineage between rounds."""
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    keep = deg.where(F.col("deg") >= k).select(F.col("src").alias("kv"))
    return e.join(keep, e["src"] == keep["kv"], "left_semi").join(
        keep, e["dst"] == keep["kv"], "left_semi"
    )


def kcore_oracle_sql(edges_cte: str, *, k: int, rounds: int = 5) -> str:
    """DuckDB CTE chain replaying :func:`kcore` exactly.

    ``edges_cte`` must produce a (src, dst) relation in any direction
    mix; the chain symmetrizes it the same way ``_symmetrize`` does.
    Emits ``e{rounds}`` (residual edges); the final SELECT mirrors the
    operator's closing degree filter. Callers append nothing — this is
    a complete query.
    """
    parts = [
        f"""raw AS ({edges_cte}),
    e0 AS (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw
      ) WHERE src <> dst
    )"""
    ]
    for r in range(1, rounds + 1):
        prev = f"e{r - 1}"
        parts.append(
            f"""k{r} AS (
      SELECT src AS kv FROM {prev} GROUP BY src HAVING count(*) >= {k}
    ), e{r} AS (
      SELECT e.src, e.dst FROM {prev} e
      WHERE e.src IN (SELECT kv FROM k{r}) AND e.dst IN (SELECT kv FROM k{r})
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT src AS v, CAST(count(*) AS BIGINT) AS deg
    FROM e{rounds} GROUP BY src HAVING count(*) >= {k}
    """
    )
