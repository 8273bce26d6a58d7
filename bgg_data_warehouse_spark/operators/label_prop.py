"""Deterministic synchronous label propagation (community detection).

Classic LPA assigns each node the most frequent label among its
neighbours, iterating until convergence; the textbook version breaks
ties randomly, which is useless for a hash-gated oracle comparison.
This variant is fully deterministic:

- synchronous updates (every node votes on the PREVIOUS iteration's
  labels, so there is no dependence on visit order);
- each node's own current label gets exactly one vote (stabilises
  singleton/leaf oscillation);
- ties break to the SMALLEST label.

With a fixed iteration count K the result is a pure function of the
edge set, so a DuckDB oracle can replay it as K chained CTE rounds and
hash-compare the communities bit-for-bit (same pattern as the portable
HLL / CMS sketches).

Reference provenance: the reference's similarity surface
(`/root/reference/definitions/game_similarity_search.sqlx`, served
precomputed from its game_neighbors table) stops at ranked pairwise
neighbours; grouping those neighbourhoods into
communities is the natural next query a warehouse user runs, and LPA
is the standard distributed answer (one equi-join + one grouped vote
per round — no global state).

Scale notes (100 TB): each round is one shuffle-join of the node-sized
label frame against the edge list (hash-partitioned on dst) plus one
(v, label)-keyed vote aggregate that partial-aggregates map-side. The
label frame is bounded by |V| regardless of |E|. Lineage is pinned per
round with a lazy localCheckpoint so K rounds never stack K join plans
(at cluster scale this also gates stage retry cost). Skewed hub nodes
bound the vote-key cardinality at (hub degree), not |V|^2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cooccurrence_edges", "label_propagation", "lpa_oracle_sql"]


def cooccurrence_edges(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Symmetric distinct co-occurrence edges: (src, dst) for every
    ordered pair of distinct items sharing a group (market-basket
    graph). Quadratic only in per-group item count, which is small and
    bounded in basket-shaped data (TPC-H orders: <= 11 lines); the
    self-join is an equi-join on the group key, never a cartesian."""
    items = df.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("p")
    ).distinct()
    right = items.select("g", F.col("p").alias("q"))
    return (
        items.join(right, "g")
        .where(F.col("p") != F.col("q"))
        .select(F.col("p").alias("src"), F.col("q").alias("dst"))
        .distinct()
    )


def label_propagation(edges: DataFrame, *, iters: int = 3) -> DataFrame:
    """Run ``iters`` synchronous LPA rounds over (src, dst) edges;
    returns (v, label). Nodes are the distinct edge endpoints (for a
    symmetrized edge list src-side suffices). Deterministic: max vote
    count, then smallest label."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    nodes = edges.select(F.col("src").alias("v")).distinct()
    labels = nodes.select("v", F.col("v").alias("label"))
    w = Window.partitionBy("v").orderBy(F.col("n").desc(), F.col("label").asc())
    for _ in range(iters):
        votes = (
            edges.join(labels, edges["dst"] == labels["v"])
            .select(edges["src"].alias("v"), "label")
            .unionByName(labels)
        )
        counted = votes.groupBy("v", "label").agg(F.count("*").alias("n"))
        labels = (
            counted.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("v", "label")
            .localCheckpoint(eager=False)
        )
    return labels


def lpa_oracle_sql(edges_cte: str, iters: int = 3) -> str:
    """DuckDB CTE chain replaying :func:`label_propagation` exactly.

    ``edges_cte`` must be the body of a CTE producing (src, dst)
    symmetric distinct edges. Emits ``l{iters}`` as the final (v,
    label) relation; the caller appends its own SELECT over it.
    """
    parts = [
        f"edges AS ({edges_cte})",
        "nodes AS (SELECT DISTINCT src AS v FROM edges)",
        "l0 AS (SELECT v, v AS label FROM nodes)",
    ]
    for k in range(1, iters + 1):
        prev = f"l{k - 1}"
        parts.append(
            f"""v{k} AS (
      SELECT e.src AS v, l.label FROM edges e JOIN {prev} l ON l.v = e.dst
      UNION ALL SELECT v, label FROM {prev}
    ), c{k} AS (
      SELECT v, label, count(*) AS n FROM v{k} GROUP BY 1, 2
    ), r{k} AS (
      SELECT v, label, ROW_NUMBER() OVER (
        PARTITION BY v ORDER BY n DESC, label ASC) AS rn
      FROM c{k}
    ), l{k} AS (SELECT v, label FROM r{k} WHERE rn = 1)"""
        )
    return "WITH " + ",\n    ".join(parts)
