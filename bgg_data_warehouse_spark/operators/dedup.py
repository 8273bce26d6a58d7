"""Deduplication family for large-scale training-data pipelines.

Five dedup strategies, all shuffle-lean:

- exact            — hash-groupBy on content (or its fingerprint)
- minhash_lsh      — shingle → MinHash signature → banded LSH buckets →
                     candidate pairs → exact Jaccard verify
- simhash          — 64-bit SimHash → pigeonhole chunk join → Hamming verify
- ngram_jaccard    — inverted-index join on distinct (doc, token) pairs →
                     exact Jaccard (no sketch; the verifier both LSH paths
                     share)
- embedding cosine — see operators/similarity.py (near-dup = cos > τ)

Scale shape: every strategy is (narrow per-row sketch) → (one shuffle on
a short key) → (verify within tiny candidate groups). Nothing materializes
an all-pairs product; candidate generation is linear in corpus size for
LSH and inverted-index bounded by posting-list sizes. At 100 TB, frequent
tokens create skewed posting lists — ``max_posting_len`` drops
ultra-common tokens exactly like public MinHash pipelines drop stopword
shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    hamming64,
    minhash_bands,
    minhash_signature,
    simhash64,
    simhash_chunks,
)
from ..functions.text import word_shingles, word_tokens


def dedup_exact(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per distinct content value (W1 on content)."""
    w = Window.partitionBy(content_col).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def _ordered_pairs(cand: DataFrame, a: str, b: str) -> DataFrame:
    """Canonicalize (a < b) and drop duplicate candidate pairs."""
    return (
        cand.where(F.col(a) < F.col(b))
        .dropDuplicates([a, b])
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs (id_a, id_b, jaccard) via MinHash + banded LSH.

    Pipeline: shingle → signature → explode band buckets → self equi-join
    on (band, bucket) → candidate pairs → exact shingle-set Jaccard verify.
    """
    rows_per_band = num_hashes // bands
    sigs = df.select(
        F.col(id_col).alias("doc"),
        F.array_distinct(word_shingles(F.col(text_col), shingle_k)).alias("shingles"),
    ).withColumn("sig", minhash_signature(F.col("shingles"), num_hashes))

    buckets = sigs.select(
        "doc",
        F.explode(minhash_bands(F.col("sig"), bands, rows_per_band)).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")

    cand = _ordered_pairs(
        buckets.alias("l").join(
            buckets.alias("r"),
            on=[F.col("l.band") == F.col("r.band"), F.col("l.bucket") == F.col("r.bucket")],
        ).select(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b")),
        "doc_a",
        "doc_b",
    )

    shing = sigs.select("doc", "shingles")
    verified = (
        cand.join(shing.withColumnRenamed("doc", "doc_a").withColumnRenamed("shingles", "sh_a"), "doc_a")
        .join(shing.withColumnRenamed("doc", "doc_b").withColumnRenamed("shingles", "sh_b"), "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.when(F.col("uni") == 0, F.lit(0.0)).otherwise(
                F.col("inter").cast("double") / F.col("uni").cast("double")
            ),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return verified


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    num_chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs (id_a, id_b, hamming) via SimHash + pigeonhole LSH.

    Any two sketches within Hamming distance ``num_chunks - 1`` share at
    least one exact chunk, so the chunk equi-join is a lossless candidate
    generator for ``max_hamming <= num_chunks - 1``.
    """
    if max_hamming > num_chunks - 1:
        raise ValueError("pigeonhole LSH requires max_hamming <= num_chunks - 1")
    sk = df.select(
        F.col(id_col).alias("doc"),
        simhash64(word_tokens(F.col(text_col))).alias("sketch"),
    )
    chunks = sk.select(
        "doc", "sketch", F.explode(simhash_chunks(F.col("sketch"), num_chunks)).alias("c")
    ).select("doc", "sketch", "c.chunk", "c.value")

    cand = (
        chunks.alias("l")
        .join(
            chunks.alias("r"),
            on=[F.col("l.chunk") == F.col("r.chunk"), F.col("l.value") == F.col("r.value")],
        )
        .select(
            F.col("l.doc").alias("doc_a"),
            F.col("r.doc").alias("doc_b"),
            F.col("l.sketch").alias("sk_a"),
            F.col("r.sketch").alias("sk_b"),
        )
    )
    return (
        _ordered_pairs(cand, "doc_a", "doc_b")
        .withColumn("hamming", hamming64(F.col("sk_a"), F.col("sk_b")))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.5,
    max_posting_len: int | None = None,
) -> DataFrame:
    """Exact token-set Jaccard pairs via an inverted-index self-join.

    distinct (doc, token) → join on token → per-pair intersection count →
    jaccard with |A|+|B|-∩ union. ``max_posting_len`` drops tokens whose
    posting list exceeds the cap (skew guard at scale; None = exact).
    """
    toks = (
        df.select(F.col(id_col).alias("doc"), F.explode(F.array_distinct(word_tokens(F.col(text_col)))).alias("tok"))
    )
    if max_posting_len is not None:
        heavy = toks.groupBy("tok").count().where(F.col("count") > max_posting_len).select("tok")
        toks = toks.join(F.broadcast(heavy), "tok", "left_anti")

    sizes = toks.groupBy("doc").agg(F.count("*").alias("n_tok"))

    inter = (
        toks.alias("l")
        .join(toks.alias("r"), "tok")
        .where(F.col("l.doc") < F.col("r.doc"))
        .groupBy(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_tok", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_tok", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )
