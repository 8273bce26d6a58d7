"""Similarity search over embedding columns (``array<float>``).

Three tiers, mirroring how the reference serves k-NN
(`/root/reference/definitions/game_neighbors.sqlx` precompute +
`/root/reference/src/warehouse/readers/games.py:134-225` live query):

- ``brute_force_topk``    — exact cosine top-k of queries × corpus. The
  correctness baseline; used when the query set is small (point lookups)
  or the corpus is pre-filtered (the reference's ``users_rated >= 100``
  lesson: filter BEFORE distance+rank — BASELINE.md item 2).
- ``lsh_topk``            — random-hyperplane LSH: sign-bit signatures,
  candidates must share a signature band with the query. Approximate but
  linear-scalable: one narrow shuffle on (band, bucket), never all-pairs.
- ``ivf_topk``            — IVF-style coarse quantization without a
  training step: deterministic seed rows act as centroids, vectors are
  assigned to their nearest centroid (nprobe=1..n), and queries search
  only their probe cells.

All distance math is Catalyst expressions (functions/vector.py) — no
Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity, dot_product, l2_norm


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    query_prefix: str = "q_",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    queries and corpus share the (id_col, vec_col) schema. The query side
    is broadcast (point-lookup / small-probe assumption); the corpus side
    streams — so the plan is a broadcast nested-loop over a SINGLE corpus
    scan, no shuffle of the big side at all.
    """
    q = queries.select(
        F.col(id_col).alias(f"{query_prefix}id"), F.col(vec_col).alias(f"{query_prefix}vec")
    )
    c = corpus.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("nbr_vec"))
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col(f"{query_prefix}id") != F.col("nbr_id"))
        .withColumn(
            "cosine_sim",
            cosine_similarity(F.col(f"{query_prefix}vec"), F.col("nbr_vec")),
        )
    )
    w = Window.partitionBy(f"{query_prefix}id").orderBy(
        F.col("cosine_sim").desc(), F.col("nbr_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col(f"{query_prefix}id").alias("query_id"),
            "nbr_id",
            F.round("cosine_sim", 6).alias("cosine_sim"),
            "rank",
        )
    )


def _hyperplane_sig(vec, num_bits: int, seed: int):
    """Sign-bit signature against pseudo-random hyperplanes.

    Hyperplane h_b component i = hash(b, i) mapped to [-1, 1] — fully
    deterministic, no RNG state, identical on every executor.
    """
    def projector(plane: int):
        # closure, not a default arg — defaults inflate PySpark lambda arity
        return lambda x, i: x.cast("double") * (
            (F.pmod(F.xxhash64(F.lit(seed), F.lit(plane), i), F.lit(2000001)) - 1000000)
            / 1000000.0
        )

    bits = []
    for b in range(num_bits):
        proj = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.size(vec) - 1), projector(b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for x in bits[1:]:
        out = out.bitwiseOR(x)
    return out


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    *,
    num_tables: int = 8,
    bits_per_table: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH candidate join.

    Each vector gets ``num_tables`` bucket keys (one per hash table, each
    an ``bits_per_table``-bit sign signature). Query and corpus join on
    (table, bucket); exact cosine re-ranks within candidates. Recall rises
    with num_tables; cost stays linear (candidates per query ≈ corpus /
    2^bits × tables).
    """

    def with_buckets(df: DataFrame, idn: str, vecn: str) -> DataFrame:
        out = df.select(F.col(id_col).alias(idn), F.col(vec_col).alias(vecn))
        entries = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    _hyperplane_sig(F.col(vecn), bits_per_table, seed + t).alias("bucket"),
                )
                for t in range(num_tables)
            ]
        )
        return out.withColumn("bb", F.explode(entries)).select(
            idn, vecn, "bb.table", "bb.bucket"
        )

    qb = with_buckets(queries, "query_id", "q_vec")
    cb = with_buckets(corpus, "nbr_id", "nbr_vec")

    cand = (
        qb.join(cb, ["table", "bucket"])
        .where(F.col("query_id") != F.col("nbr_id"))
        .dropDuplicates(["query_id", "nbr_id"])
        .withColumn("cosine_sim", cosine_similarity(F.col("q_vec"), F.col("nbr_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("nbr_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    *,
    num_cells: int = 16,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-flat ANN: coarse-quantize the corpus into cells, probe a few.

    Centroids are the ``num_cells`` lowest-id corpus vectors (deterministic,
    training-free — adequate for unit-normalized synthetic data; a k-means
    fit can replace the centroid table without touching the query path).
    Corpus rows are assigned to their nearest centroid; queries search
    their ``nprobe`` nearest cells only.
    """
    centroids = (
        corpus.select(F.col(id_col).alias("cent_src"), F.col(vec_col).alias("cent_vec"))
        .withColumn("_rn", F.row_number().over(Window.orderBy(F.col("cent_src").asc())))
        .where(F.col("_rn") <= num_cells)
        .select((F.col("_rn") - 1).alias("cell"), "cent_vec")
    )

    def assign(df: DataFrame, idn: str, vecn: str, n_assign: int) -> DataFrame:
        scored = (
            df.select(F.col(id_col).alias(idn), F.col(vec_col).alias(vecn))
            .crossJoin(F.broadcast(centroids))
            .withColumn("cent_sim", cosine_similarity(F.col(vecn), F.col("cent_vec")))
        )
        w = Window.partitionBy(idn).orderBy(F.col("cent_sim").desc(), F.col("cell").asc())
        return (
            scored.withColumn("_cr", F.row_number().over(w))
            .where(F.col("_cr") <= n_assign)
            .select(idn, vecn, "cell")
        )

    corpus_cells = assign(corpus, "nbr_id", "nbr_vec", 1)
    query_cells = assign(queries, "query_id", "q_vec", nprobe)

    cand = (
        query_cells.join(corpus_cells, "cell")
        .where(F.col("query_id") != F.col("nbr_id"))
        .dropDuplicates(["query_id", "nbr_id"])
        .withColumn("cosine_sim", cosine_similarity(F.col("q_vec"), F.col("nbr_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("nbr_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float = 0.95,
    num_tables: int = 8,
    bits_per_table: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via the LSH candidate join."""
    sigs = df.select(F.col(id_col).alias("doc"), F.col(vec_col).alias("vec"))
    entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                _hyperplane_sig(F.col("vec"), bits_per_table, seed + t).alias("bucket"),
            )
            for t in range(num_tables)
        ]
    )
    buckets = sigs.withColumn("bb", F.explode(entries)).select(
        "doc", "vec", "bb.table", "bb.bucket"
    )
    cand = (
        buckets.alias("l")
        .join(buckets.alias("r"), ["table", "bucket"])
        .where(F.col("l.doc") < F.col("r.doc"))
        .select(
            F.col("l.doc").alias("doc_a"),
            F.col("r.doc").alias("doc_b"),
            F.col("l.vec").alias("vec_a"),
            F.col("r.vec").alias("vec_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("cosine_sim", cosine_similarity(F.col("vec_a"), F.col("vec_b")))
        .where(F.col("cosine_sim") >= threshold)
    )
    return cand.select("doc_a", "doc_b", F.round("cosine_sim", 6).alias("cosine_sim"))
