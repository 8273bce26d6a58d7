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

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """sum_i a_i * b_i  (sequential fold, double precision)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_distance(a: Column, b: Column) -> Column:
    """1 - cosine similarity, matching BigQuery ML.DISTANCE(..., 'COSINE')."""
    return F.lit(1.0) - cosine_similarity(a, b)


def euclidean_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
