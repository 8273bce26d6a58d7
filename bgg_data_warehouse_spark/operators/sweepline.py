"""Interval sweep-line analytics: concurrency over [start, end) spans.

The classic event-boundary sweep: every interval contributes a +1 at
its start and a -1 at its end; the running sum of boundaries in time
order IS the number of concurrently-open intervals at each instant.
Peak concurrency, occupancy profiles and capacity planning all read
off that one scan.

Spark-first shape: the running sum uses the distributed two-pass
prefix scan (operators/prefix.py) bucketed by a calendar unit, so no
single-partition window ever sees the full boundary stream — the
decomposition that survives 100 TB of events where a bare
``Window.orderBy(ts)`` cannot. Half-open [s, e) semantics: an interval
ending at t closes BEFORE one starting at t opens (delta -1 sorts
ahead of +1 at equal timestamps), so back-to-back intervals never
double-count.

No reference counterpart (the reference's BigQuery DAG tracks snapshot
staleness, not interval overlap); this extends the engine's temporal
family (asof.py, range_join.py) with the missing interval-algebra
aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .prefix import running_sum

__all__ = ["interval_boundaries", "interval_concurrency"]


def interval_boundaries(
    df: DataFrame, start_col: str, end_col: str, id_col: str
) -> DataFrame:
    """Explode [start, end) intervals into (t, delta, id) boundary
    events: +1 at start, -1 at end — generated map-side (a 2-element
    array explode), no shuffle."""
    return df.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(start_col).alias("t"),
                    F.lit(1).cast("long").alias("delta"),
                    F.col(id_col).alias("id"),
                ),
                F.struct(
                    F.col(end_col).alias("t"),
                    F.lit(-1).cast("long").alias("delta"),
                    F.col(id_col).alias("id"),
                ),
            )
        ).alias("b")
    ).select("b.t", "b.delta", "b.id")


def interval_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    id_col: str,
    *,
    bucket: Column | None = None,
) -> DataFrame:
    """Per-boundary concurrency: (t, delta, id, concurrency) where
    ``concurrency`` counts intervals open at instant t (inclusive of a
    +1 boundary's own interval, after any same-instant closes).

    ``bucket`` is the prefix-scan bucket expression over ``t`` (must be
    order-aligned; default: calendar hour). The boundary order is
    (t, delta, id) — delta ascending puts -1 before +1 at equal t,
    which implements half-open intervals; id makes the scan
    deterministic row-for-row (peaks are tie-order-invariant, but the
    gate hashes every row).
    """
    b = interval_boundaries(df, start_col, end_col, id_col)
    bucket = F.date_trunc("hour", F.col("t")) if bucket is None else bucket
    return running_sum(
        b, "delta", bucket, ["t", "delta", "id"], out_col="concurrency"
    )
