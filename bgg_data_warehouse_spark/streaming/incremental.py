"""Incremental-model machinery (I1): watermark + MERGE-by-uniqueKey.

Dataform semantics being mirrored (`/root/reference/definitions/
games_features.sqlx:2-11,99`): on an incremental run the model body sees
only source rows past ``(SELECT MAX(ts) FROM self)`` and the output is
MERGEd into the existing table on ``uniqueKey``. The watermark lives IN
the target table (no side-store), exactly like the reference — and the
8 s-vs-4 h lesson (BASELINE.md item 3) is preserved: the source filter
happens before any join/aggregate.

The reference's documented failure mode — watermark column missing from
the target silently degrades to a full scan (`docs/dataform_operations.md:
7-16`) — is an explicit error here instead.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.latest import latest_per_key
from .. import io


def high_watermark(target: DataFrame, ts_col: str):
    """MAX(ts) of the existing target (None on empty)."""
    if ts_col not in target.columns:
        raise ValueError(
            f"watermark column {ts_col!r} missing from target — this is the "
            "silent full-refresh regression the reference documents; refusing"
        )
    row = target.agg(F.max(ts_col).alias("wm")).collect()[0]
    return row.wm


def watermark_filter(source: DataFrame, ts_col: str, wm) -> DataFrame:
    return source if wm is None else source.where(F.col(ts_col) > F.lit(wm))


def merge_by_unique_key(
    existing: DataFrame,
    fresh: DataFrame,
    unique_key: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Dataform incremental MERGE: fresh rows replace same-key rows.

    union + latest-per-key with fresh rows winning ties — equivalent to
    ``MERGE WHEN MATCHED UPDATE / NOT MATCHED INSERT`` for whole-row
    updates. ``order_by`` must rank fresher rows first.
    """
    tagged_old = existing.withColumn("_src", F.lit(0))
    tagged_new = fresh.select(*existing.columns).withColumn("_src", F.lit(1))
    merged = latest_per_key(
        tagged_old.unionByName(tagged_new),
        list(unique_key),
        [*order_by, F.col("_src").desc()],
    )
    return merged.drop("_src")


def incremental_refresh(
    spark: SparkSession,
    root: str,
    name: str,
    build: Callable[[DataFrame], DataFrame],
    source: DataFrame,
    source_ts_col: str,
    target_ts_col: str,
    unique_key: Sequence[str],
) -> DataFrame:
    """Run one incremental cycle against a persisted target table.

    build() receives the watermark-scoped source slice (I1 + the J6
    changed-keys discipline is the builder's concern) and returns rows to
    merge. First run = full refresh.
    """
    if not io.table_exists(root, name):
        out = build(source)
        io.write_table(out, root, name)
        return out
    target = io.read_table(spark, root, name)
    wm = high_watermark(target, target_ts_col)
    fresh = build(watermark_filter(source, source_ts_col, wm))
    merged = merge_by_unique_key(
        target, fresh, unique_key, [F.col(target_ts_col).desc()]
    )
    io._rewrite(merged, root, name)
    return io.read_table(spark, root, name)
