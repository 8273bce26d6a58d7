"""Count–min sketch: fixed-size frequency summaries + heavy hitters.

A CMS (Cormode & Muthukrishnan 2005) summarizes key frequencies in a
``depth × width`` integer grid: each key increments one counter per
row (depth independent hash functions); the frequency estimate is the
MIN over its depth counters — never an underestimate, overestimates
only from collisions.

Why this matters at 100 TB: the sketch build shuffles AT MOST
``depth × width`` counters per task, regardless of key cardinality —
the explode to (d, bucket) is map-side and the groupBy's partial
aggregation (map-side combine) collapses each task's contribution to
the grid size before anything crosses the network. Estimating a
trillion-key stream's frequencies costs a fixed few-KB shuffle per
task. (Spark's own ``count_min_sketch`` SQL aggregate produces an
opaque binary; this DataFrame formulation keeps the grid queryable and
— because the hashes are md5-derived — bit-reproducible in any engine,
so the whole pipeline is oracle hash-gateable.)

Reference parity: no reference counterpart — LLM-pipeline extension
(frequency triage over corpus keys before exact follow-up).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .importance import md5_fold, md5_fold_sql


def _bucket(d: int, key, width: int):
    return md5_fold(
        F.concat_ws(":", F.lit(d).cast("string"), key.cast("string")), width
    )


def cms_bucket_sql(d: str, key_expr: str, width: int) -> str:
    """DuckDB rendering of the (depth, key) -> bucket hash."""
    return md5_fold_sql(
        f"concat(CAST({d} AS VARCHAR), ':', CAST({key_expr} AS VARCHAR))", width
    )


def cms_sketch(
    df: DataFrame, key_col: str, *, depth: int = 4, width: int = 64
) -> DataFrame:
    """(d, bkt, cnt) — the count-min grid for ``key_col``.

    The per-row explode emits ``depth`` (d, bkt) entries map-side; the
    single groupBy's map-side combine bounds the shuffle at the grid
    size per task.
    """
    key = F.col(key_col)
    entries = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("d"),
                _bucket(d, key, width).alias("bkt"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(entries).alias("e"))
        .select("e.d", "e.bkt")
        .groupBy("d", "bkt")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """(key, est) — CMS frequency estimate (min over depth counters) for
    each candidate key. The sketch is depth×width rows — bounded by
    construction, never data-sized — so the broadcast hint is safe.
    Keys hashing to an untouched counter would get no sketch row; that
    cannot happen for keys the sketch was built over, but a LEFT join +
    coalesce(0) keeps novel keys honest (estimate 0)."""
    key = F.col(key_col)
    probes = keys.select(
        key.alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("int").alias("d"),
                        _bucket(d, key, width).alias("bkt"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("e"),
    ).select("key", "e.d", "e.bkt")
    return (
        probes.join(F.broadcast(sketch), ["d", "bkt"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
