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


def changed_key_set(source: DataFrame, ts_col: str, wm, key_cols: Sequence[str]) -> DataFrame:
    """Distinct keys in the watermark slice — the reference's
    ``games_to_process`` CTE (`games_features.sqlx:8-12`). Feed this to
    ``ModelDag.run_persisted(changed_keys=...)`` to scope every keyed
    input of the incremental models (J6)."""
    return watermark_filter(source, ts_col, wm).select(*key_cols).distinct()


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


def incremental_dag_cycle(
    spark: SparkSession,
    dag,
    tables: dict[str, DataFrame],
    root: str,
    targets: Sequence[str] | None = None,
    *,
    source_name: str = "games",
    ts_col: str = "load_timestamp",
    key_cols: Sequence[str] = ("game_id",),
    wm_model: str = "games_active",
) -> dict[str, DataFrame]:
    """One end-to-end incremental Dataform run (I1 + J6): derive the
    changed-key set from the landing source past the persisted watermark,
    then run the DAG with every incremental model's keyed inputs scoped
    to it (`games_features.sqlx:8-18`). First run (no watermark table
    yet) falls back to a full build."""
    if not io.table_exists(root, wm_model):
        return dag.run_persisted(spark, tables, root, list(targets) if targets else None)
    wm = high_watermark(io.read_table(spark, root, wm_model), ts_col)
    changed = changed_key_set(tables[source_name], ts_col, wm, list(key_cols))
    return dag.run_persisted(
        spark, tables, root, list(targets) if targets else None, changed_keys=changed
    )


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

    build() receives the watermark-scoped source slice (I1) and returns
    rows to merge; for the DAG-wide J6 changed-keys scoping see
    ``ModelDag.run_persisted(changed_keys=...)`` + ``changed_key_set``.
    First run = full refresh.
    """
    io.recover_table(root, name)  # crashed swap must not read as "first run"
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
