"""Bounded weighted shortest paths: Bellman-Ford rounds over a
weighted symmetric edge set.

Completes the graph family's distance story: bfs.py answers UNWEIGHTED
hop distance, but recommendation and similarity graphs carry edge
strengths — a popular co-purchase pair is a "shorter" step than a
one-off — so the useful distance is the min-cost path under integer
edge weights. No reference counterpart (the reference precomputes
one-hop neighbor pairs only, `/root/reference/definitions/
game_similarity_search.sqlx`); this is the weighted multi-hop
generalization of its similarity graph, the primitive behind
"cheapest introduction path" and taxonomy-distance features.

Level-synchronous Bellman-Ford is a pure function of (edges, seeds,
rounds): dist_r(v) = min(dist_{r-1}(v), min over edges (u,v) of
dist_{r-1}(u) + w). With FIXED rounds and integer weights the whole
relaxation unrolls into chained SQL CTEs, so a DuckDB oracle replays
it exactly and the gate hash-verifies every distance label — the
bfs/kcore/label_propagation replay pattern. Unlike BFS, a later round
may IMPROVE an already-labeled node (a long cheap path beats a short
expensive one), so each round re-minimizes over the full label set
instead of anti-joining it away.

Scale shape: each round is ONE edge-vs-labels equi-join (shuffle
bounded by labeled-set adjacency) plus ONE map-side-combinable MIN
groupBy; the label set stays <= |V| rows and is lineage-pinned per
round (localCheckpoint) so round r+1 never replays rounds 1..r. No
driver-side iteration over nodes, no cartesians; rounds are a small
constant, so the walk is O(rounds) bounded shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["sssp_labels", "sssp_oracle_sql"]


def sssp_labels(edges: DataFrame, seeds: DataFrame, rounds: int) -> DataFrame:
    """Min path cost from ``seeds`` over weighted symmetric ``edges``.

    ``edges`` must carry (src, dst, w) BOTH directions with integer
    ``w`` >= 0; ``seeds`` carries node column ``v``. Returns (v, dist)
    for every node reachable within ``rounds`` relaxation rounds;
    dist is exact (integer arithmetic) and equals the true shortest
    path wherever the optimal path uses <= ``rounds`` edges.
    """
    if rounds < 1:
        raise ValueError(f"sssp_labels: rounds must be >= 1, got {rounds}")
    dist = (
        seeds.select("v")
        .distinct()
        .select("v", F.lit(0).cast("long").alias("dist"))
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        relaxed = edges.join(
            dist.select(F.col("v").alias("src"), F.col("dist").alias("ds")),
            "src",
        ).select(
            F.col("dst").alias("v"),
            (F.col("ds") + F.col("w")).cast("long").alias("dist"),
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("v")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
    return dist


def sssp_oracle_sql(edges_sql: str, seeds_sql: str, rounds: int) -> str:
    """Unrolled Bellman-Ford as chained DuckDB CTEs.

    ``edges_sql`` must emit symmetric (src, dst, w); ``seeds_sql``
    emits v. Each label level feeds both the next relaxation and the
    final read, so every level is AS MATERIALIZED (the 2^n-inlining
    lesson, workload.py module doc). Emits CTEs ``e`` and
    ``d0..d{rounds}`` (v, dist); callers append the final SELECT.
    """
    if rounds < 1:
        raise ValueError(f"sssp_oracle_sql: rounds must be >= 1, got {rounds}")
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql}),",
        f"""d0 AS MATERIALIZED (
      SELECT v, CAST(0 AS BIGINT) AS dist
      FROM ({seeds_sql}) GROUP BY v),""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""d{r} AS MATERIALIZED (
      SELECT v, MIN(dist) AS dist FROM (
        SELECT v, dist FROM d{r - 1}
        UNION ALL
        SELECT e.dst AS v, d{r - 1}.dist + e.w
        FROM e JOIN d{r - 1} ON e.src = d{r - 1}.v)
      GROUP BY v),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    return "\n    ".join(parts) + "\n"
