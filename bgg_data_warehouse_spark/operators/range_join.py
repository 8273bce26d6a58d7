"""Time-range (interval) join — bucketized, not theta.

Attach every right row whose timestamp falls in
``[left_ts + lower, left_ts + upper)`` for the same key. The naive form
is a theta join (``ON key AND r.ts BETWEEN ...``) which Spark plans as a
per-key cross product filtered late — O(n·m) pairs per key, a
scale-killer when a hot key holds millions of rows.

The bucketized plan: quantize time into buckets of width
``upper - lower``; a left row's window then overlaps at most TWO
consecutive buckets, so exploding left to those bucket ids and
equi-joining on (key, bucket) bounds the candidate set to the rows in
the window's two buckets — the exact range predicate filters the
remainder. One hash shuffle, candidate volume proportional to the true
match volume, never to the key's row count.

Bucket ids come from ``unix_micros`` (integer floor-div) so boundary
behavior is exact; the final filter compares raw timestamps, so the
bucketing is purely a pruning device and never changes semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_micros: int,
    upper_micros: int,
) -> DataFrame:
    """Inner range join: all (left, right) pairs with
    ``left_ts + lower <= right_ts < left_ts + upper`` and equal ``on``.
    Output: every left column plus the right columns (callers alias
    collisions away beforehand). ``lower_micros``/``upper_micros`` are
    signed offsets in microseconds (e.g. -3_600_000_000 and 0 for "the
    preceding hour")."""
    if upper_micros <= lower_micros:
        raise ValueError("upper_micros must exceed lower_micros")
    width = upper_micros - lower_micros

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    # the window [l+lower, l+upper) spans bucket(l+lower) and at most the
    # next one; floor-div of negative longs in Spark truncates toward
    # negative infinity only for `floor(a/b)` on doubles — use explicit
    # floordiv on longs via shifting into non-negative space is overkill
    # here because unix_micros of real data is positive and lower/upper
    # offsets keep it positive.
    lo_bucket = F.floor((l_us + F.lit(lower_micros)) / F.lit(width))
    r_bucket = F.floor(r_us / F.lit(width))

    lb = left.withColumn(
        "_bucket", F.explode(F.array(lo_bucket, lo_bucket + 1))
    )
    rb = right.withColumn("_bucket", r_bucket)

    joined = lb.join(rb, on=[on, "_bucket"]).where(
        (F.unix_micros(F.col(right_ts)) >= F.unix_micros(F.col(left_ts)) + F.lit(lower_micros))
        & (F.unix_micros(F.col(right_ts)) < F.unix_micros(F.col(left_ts)) + F.lit(upper_micros))
    )
    return joined.drop("_bucket")
