"""Benchmark decontamination — n-gram overlap between train and eval sets.

Any serious training-data pipeline must detect documents that leak
benchmark/eval content into the training corpus (the contamination
problem). The standard detector: a document is contaminated to the
degree its distinct word n-grams appear in the benchmark set's n-gram
pool.

Scale shape: benchmarks are MEGABYTES while the training corpus is
TERABYTES — so the benchmark's distinct-shingle pool is built once and
BROADCAST under the single training-corpus scan. One wide scan, one
per-doc aggregate, no corpus self-join. The shingles here stay STRINGS
(not the 64-bit hashes operators/dedup.py uses) so the overlap counts
are exactly reproducible by any engine — the driver's DuckDB oracle
builds the same shingles with list_transform.

Shingling uses posexplode + lead() over a per-doc window — the same
O(n) formulation as operators/dedup.py::_shingle_rows and for the same
reason: array higher-order functions re-inline the tokenize subtree per
position (O(k·n²) per document, measured 10× slower).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import word_tokens


def _string_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Distinct (doc, sh) rows; sh is the space-joined n-token shingle."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(word_tokens(F.col(text_col))).alias("pos", "tok"),
    )
    if n == 1:
        return toks.select("doc", F.col("tok").alias("sh")).distinct()
    w = Window.partitionBy("doc").orderBy("pos")
    leads = toks.select(
        "doc",
        "tok",
        *[F.lead("tok", j).over(w).alias(f"_t{j}") for j in range(1, n)],
    )
    return (
        leads.where(F.col(f"_t{n-1}").isNotNull())
        .select(
            "doc",
            F.concat_ws(" ", "tok", *[f"_t{j}" for j in range(1, n)]).alias("sh"),
        )
        .distinct()
    )


def ngram_contamination(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    flag_threshold: float = 0.2,
) -> DataFrame:
    """(doc, n_shingles, n_hit, contamination, flagged) per train doc.

    ``contamination`` is the fraction of the doc's distinct n-gram
    shingles present anywhere in ``bench``; ``flagged`` marks docs at or
    above ``flag_threshold``. Train docs shorter than one shingle have
    nothing to match on and are excluded (same rule on the oracle side).
    """
    train_sh = _string_shingles(train, id_col, text_col, n)
    bench_sh = (
        _string_shingles(bench, id_col, text_col, n).select("sh").distinct()
    )
    hits = train_sh.join(
        F.broadcast(bench_sh.withColumn("_hit", F.lit(1))), "sh", "left_outer"
    )
    contamination = F.col("n_hit").cast("double") / F.col("n_shingles").cast(
        "double"
    )
    return (
        hits.groupBy("doc")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("_hit").alias("n_hit"),
        )
        .select(
            "doc",
            "n_shingles",
            "n_hit",
            F.round(contamination, 6).alias("contamination"),
            (contamination >= F.lit(flag_threshold)).alias("flagged"),
        )
    )
