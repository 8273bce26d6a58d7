"""Bounded multi-source BFS: hop distances over a symmetric edge set.

The graph family so far answers reachability (components), density
(kcore), communities (label_prop), and centrality (pagerank); the
remaining classic is DISTANCE — "how many hops from the seed set is
each node" — the primitive behind influence radius, catalog
navigation depth, and contamination blast-radius questions. No
reference counterpart (the reference precomputes one-hop neighbor
pairs only, `/root/reference/definitions/game_similarity_search.sqlx`);
this is the multi-hop generalization its similarity graph invites.

Level-synchronous BFS is a pure function of (edges, seeds, rounds):
frontier_r = distinct neighbors of frontier_{r-1} minus everything
already visited. With a FIXED round bound the whole run unrolls into
chained SQL CTEs, so a DuckDB oracle replays it exactly and the gate
hash-verifies every hop label — same replay pattern as kcore /
label_propagation.

Scale shape: each round is ONE edge-vs-frontier equi-join (shuffle
bounded by the frontier's adjacency), a distinct, and an anti-join
against the visited set; visited stays |V|-sized and is
lineage-pinned per round (localCheckpoint) so round r+1 never replays
rounds 1..r. No per-node iteration on the driver, no cartesians;
rounds are a small constant, so the whole walk is O(rounds) shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bfs_hops", "bfs_oracle_sql"]


def bfs_hops(edges: DataFrame, seeds: DataFrame, rounds: int) -> DataFrame:
    """Hop distance (0-based) from ``seeds`` over symmetric ``edges``.

    ``edges`` must carry (src, dst) BOTH directions (the
    cooccurrence_edges contract); ``seeds`` carries node column ``v``.
    Returns (v, hop) for every node within ``rounds`` hops; hop is the
    MINIMUM distance because a node enters the visited set the first
    round it is seen and the anti-join bars re-entry.
    """
    if rounds < 1:
        raise ValueError(f"bfs_hops: rounds must be >= 1, got {rounds}")
    frontier = seeds.select("v").distinct().localCheckpoint(eager=False)
    visited = frontier.select("v", F.lit(0).cast("long").alias("hop"))
    for r in range(1, rounds + 1):
        nxt = (
            edges.join(frontier.withColumnRenamed("v", "src"), "src")
            .select(F.col("dst").alias("v"))
            .distinct()
            .join(visited.select("v"), "v", "left_anti")
            .localCheckpoint(eager=False)
        )
        visited = visited.unionByName(
            nxt.select("v", F.lit(r).cast("long").alias("hop"))
        ).localCheckpoint(eager=False)
        frontier = nxt
    return visited


def bfs_oracle_sql(edges_sql: str, seeds_sql: str, rounds: int) -> str:
    """Unrolled level-synchronous BFS as chained DuckDB CTEs.

    Each frontier/visited level is referenced by BOTH the next level
    and the final read, so every level is AS MATERIALIZED (the
    2^n-inlining lesson, workload.py module doc). Emits CTEs ``e``
    (symmetric edges), ``f0..f{rounds}`` (frontiers) and
    ``vis{rounds}`` (v, hop); callers append the final SELECT.
    """
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql}),",
        f"f0 AS MATERIALIZED (SELECT DISTINCT v FROM ({seeds_sql})),",
        "vis0 AS MATERIALIZED (SELECT v, CAST(0 AS BIGINT) AS hop FROM f0),",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""f{r} AS MATERIALIZED (
      SELECT DISTINCT e.dst AS v FROM e JOIN f{r - 1} ON e.src = f{r - 1}.v
      WHERE NOT EXISTS (SELECT 1 FROM vis{r - 1} p WHERE p.v = e.dst)),"""
        )
        parts.append(
            f"""vis{r} AS MATERIALIZED (
      SELECT v, hop FROM vis{r - 1}
      UNION ALL SELECT v, CAST({r} AS BIGINT) FROM f{r}),"""
        )
    # strip the trailing comma of the last CTE
    parts[-1] = parts[-1].rstrip(",")
    return "\n    ".join(parts) + "\n"
