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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "basket_sets",
    "canonical_pairs",
    "canonical_pairs_from_baskets",
    "cooccurrence_edges",
    "label_propagation",
    "lpa_oracle_sql",
]

# packing radix for the (vote count, label) argmax: supports node ids
# < 2^40 and vote counts < 2^23 inside one int64
_PACK = 1 << 40


def cooccurrence_edges(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Symmetric distinct co-occurrence edges: (src, dst) for every
    ordered pair of distinct items sharing a group (market-basket
    graph). Quadratic only in per-group item count, which is small and
    bounded in basket-shaped data (TPC-H orders: <= 11 lines); the
    self-join is an equi-join on the group key, never a cartesian."""
    # Only CANONICAL (src < dst) pairs are deduped — the distinct is
    # this builder's dominant exchange, and halving its input pays at
    # every scale — then the symmetric twin is mirrored back map-side
    # (explode of a 2-struct array, no shuffle) after the dedup.
    canon = canonical_pairs(df, group_col, item_col).distinct()
    return canon.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")


def basket_sets(df: DataFrame, group_col: str, item_col: str) -> DataFrame:
    """(g, ps): distinct item set per group — ONE shuffle to basket
    arrays. Callers deriving several statistics (pair supports, item
    supports, basket totals) should all consume the SAME returned frame
    so the collect_set exchange materializes once via ReusedExchange
    (identical aliases are part of subtree identity — a re-aggregated
    copy with different output names plans a second scan)."""
    return df.groupBy(F.col(group_col).alias("g")).agg(
        F.collect_set(F.col(item_col)).alias("ps")
    )


def canonical_pairs_from_baskets(baskets: DataFrame) -> DataFrame:
    """Canonical (src < dst) pair stream from a basket_sets frame; the
    pair product is generated map-side (bounded: |basket|^2, <= 121 for
    TPC-H's 11-line cap) — measured ~2x cheaper than the
    items-self-equi-join form, which sort-merge-joined two full item
    relations first."""
    return (
        baskets.where(F.size("ps") >= 2)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ps",
                        lambda x: F.filter(
                            F.transform(
                                "ps",
                                lambda y: F.struct(
                                    x.alias("src"), y.alias("dst")
                                ),
                            ),
                            lambda s: s["src"] < s["dst"],
                        ),
                    )
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
    )


def canonical_pairs(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """One (src, dst) row — src < dst — per (group, unordered item
    pair) occurrence, duplicates across groups preserved: the shared
    basket-pair stream that cooccurrence_edges dedups into a graph and
    association-rule mining counts into supports."""
    return canonical_pairs_from_baskets(basket_sets(df, group_col, item_col))


def label_propagation(
    edges: DataFrame,
    *,
    iters: int = 3,
    broadcast_nodes_max: int = 2_000_000,
) -> DataFrame:
    """Run ``iters`` synchronous LPA rounds over (src, dst) edges;
    returns (v, label). Nodes are the distinct edge endpoints (for a
    symmetrized edge list src-side suffices). Deterministic: max vote
    count, then smallest label."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    # the edge list feeds every round: pin it so the (potentially
    # expensive) build runs once, not ``iters`` times. Do NOT
    # pre-partition by the join key: a satisfied output partitioning
    # locks the planner into per-round sort-merge (sorting |E| rows
    # every round, measured 2x slower).
    edges = edges.localCheckpoint(eager=False)
    nodes = edges.select(F.col("src").alias("v")).distinct()
    # Catalyst's row estimate for a generated/exploded edge list can be
    # off by the basket fan-out (a Generate doesn't multiply the
    # parent's estimate), and that bad stat survives the checkpoint —
    # measured picking a broadcast of the |E|-row edge side (3x
    # slower). The join-side decision is made HERE from the true node
    # count instead (one scalar job over the pinned edges): broadcast
    # the |V|-sized label frame only while it is provably small,
    # otherwise a shuffled hash join — labels as build side, no |E|
    # sort per round, valid at any |V|.
    hint = "broadcast" if nodes.count() <= broadcast_nodes_max else "shuffle_hash"
    labels = nodes.select("v", F.col("v").alias("label"))
    for _ in range(iters):
        lab_j = labels.hint(hint)
        votes = (
            edges.join(lab_j, edges["dst"] == lab_j["v"])
            .select(edges["src"].alias("v"), lab_j["label"])
            .unionByName(labels)
        )
        counted = votes.groupBy("v", "label").agg(F.count("*").alias("n"))
        # deterministic argmax with NO sort: pack (n, label-reversed)
        # into one BIGINT so the per-round winner is a plain max —
        # struct-valued max/max_by plans SortAggregate (struct buffers
        # are not hash-aggregable), which sorted the full round-1 vote
        # table twice; the packed form stays in HashAggregate. Total
        # order matches the oracle's ROW_NUMBER (n DESC, label ASC).
        # assert_true guards the label < 2^40 packing bound (node ids
        # beyond that need the struct form back).
        pack = (
            F.col("n") * F.lit(_PACK).cast("long")
            + (F.lit(_PACK - 1).cast("long") - F.col("label"))
        )
        guarded = F.when(
            (F.col("label") >= 0) & (F.col("label") < _PACK), pack
        ).otherwise(F.raise_error(F.lit("label out of packing range")))
        labels = (
            counted.groupBy("v")
            .agg(F.max(guarded).alias("pk"))
            .select(
                "v",
                (F.lit(_PACK - 1).cast("long") - F.col("pk") % F.lit(_PACK))
                .alias("label"),
            )
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
