"""Vector distance expressions over ``array<float|double>`` columns.

The reference relies on BigQuery's ``ML.DISTANCE(v1, v2, 'COSINE')``
(`/root/reference/definitions/game_neighbors.sqlx:59`,
`/root/reference/src/warehouse/readers/games.py:134,210`). Spark has no
array-distance builtin, so these compose ``zip_with`` + ``aggregate``
higher-order functions — pure Catalyst expressions that stay inside
whole-stage codegen (no Python UDF, no Arrow transfer), which is the
scale-safe path for a 100 TB embedding column.

All math is done in DOUBLE regardless of the storage type (embeddings are
commonly float32 on disk for size; compute in float64 for stable ranking),
with a left-to-right sequential sum — the same evaluation order DuckDB's
``list_dot_product`` uses, which keeps oracle comparisons bit-stable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def _sum_terms(terms: list[Column]) -> Column:
    # left-associated sum — the same IEEE association as a sequential fold
    # and as DuckDB's list_dot_product, so results are bit-identical
    return reduce(lambda x, y: x + y, terms)


def dot_product(a: Column, b: Column, dim: int | None = None) -> Column:
    """sum_i a_i * b_i  (sequential order, double precision).

    With ``dim`` given, the sum unrolls into fixed getItem products.
    MEASURED CAVEAT: at dim=64 the unrolled tree is SLOWER than the
    zip_with/aggregate fold (the generated method blows past JIT/codegen
    size limits); the fold is the right default. For genuinely hot
    pair-tables use ``cosine_pairs_udf`` (Arrow + per-dim sequential
    accumulation — bit-identical results, vectorized over rows).
    """
    if dim is None:
        return F.aggregate(
            F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    return _sum_terms(
        [a.getItem(i).cast("double") * b.getItem(i).cast("double") for i in range(dim)]
    )


def l2_norm(a: Column, dim: int | None = None) -> Column:
    if dim is None:
        return F.sqrt(
            F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
        )
    sq = [a.getItem(i).cast("double") for i in range(dim)]
    return F.sqrt(_sum_terms([x * x for x in sq]))


def cosine_similarity(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot_product(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


def cosine_distance(a: Column, b: Column, dim: int | None = None) -> Column:
    """1 - cosine similarity, matching BigQuery ML.DISTANCE(..., 'COSINE')."""
    return F.lit(1.0) - cosine_similarity(a, b, dim)


def euclidean_distance(a: Column, b: Column, dim: int | None = None) -> Column:
    if dim is None:
        return F.sqrt(
            F.aggregate(
                F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    diffs = [
        a.getItem(i).cast("double") - b.getItem(i).cast("double") for i in range(dim)
    ]
    return F.sqrt(_sum_terms([d * d for d in diffs]))


def cosine_pairs_udf():
    """Arrow-batched cosine over a pair table — bit-identical to the fold.

    For O(pairs) tables (band joins, LSH candidates) the per-row
    interpreted fold dominates runtime. This pandas UDF vectorizes over
    the BATCH while accumulating over DIMENSIONS sequentially::

        for i in range(dim): acc += a[:, i] * b[:, i]

    — the same left-associated IEEE summation as the aggregate fold and
    DuckDB's ``list_dot_product``, so oracle hash comparisons still agree
    to the last bit (a plain ``np.dot`` uses pairwise summation and
    would not).
    """
    import numpy as np
    import pandas as pd

    # no type hints: `from __future__ import annotations` stringifies them
    # and pandas_udf can't resolve pd.* imported function-locally
    @F.pandas_udf("double")
    def cos(a, b):
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        ma = np.stack([np.asarray(v, dtype=np.float64) for v in a])
        mb = np.stack([np.asarray(v, dtype=np.float64) for v in b])
        dot = np.zeros(len(a))
        na = np.zeros(len(a))
        nb = np.zeros(len(a))
        for i in range(ma.shape[1]):  # sequential over dims = fold order
            dot += ma[:, i] * mb[:, i]
            na += ma[:, i] * ma[:, i]
            nb += mb[:, i] * mb[:, i]
        return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))

    return cos


def infer_dim(df, vec_col: str) -> int | None:
    """Probe the embedding width from one row (tiny job, once per query)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    return None if row is None else row.d
