"""MERGE / delete-insert write-strategy emulation on plain DataFrames.

Reference semantics:

- S6 insert-if-absent MERGE for dimension tables — ``MERGE T USING S ON
  T.id = S.id WHEN NOT MATCHED THEN INSERT``
  (`/root/reference/src/data_processor/loader.py:151-163`,
  `/root/reference/src/modules/id_fetcher.py:113-123`): dimensions keep
  the union of every entity ever seen.
- S7 delete+insert refresh for bridge/detail tables — ``DELETE FROM t
  WHERE game_id IN (...)`` then append
  (`/root/reference/src/data_processor/loader.py:57-84,166-176`).

On parquet (no transactional MERGE without Delta/Iceberg, which aren't in
this image) both reduce to an anti-join + union — one shuffle on the key,
broadcast when the incoming batch is small (the common case: ingest
batches are ~100 games vs a full dimension). The functions are pure
DataFrame → DataFrame so they compose in the DAG and are unit-testable;
`io.py` owns the actual write.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_insert_missing(
    existing: DataFrame, incoming: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Existing rows win; incoming rows are added only for unseen keys.

    Incoming batches are deduped on the key first (the reference dedups
    entities with a Python set — `processor.py:490-522`); existing is
    assumed key-unique.
    """
    fresh = incoming.dropDuplicates(list(keys)).join(
        existing.select(*keys), on=list(keys), how="left_anti"
    )
    return existing.unionByName(fresh.select(*existing.columns))


def delete_insert(
    existing: DataFrame, replacement: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Replace every row whose key tuple appears in ``replacement``.

    The delete set is derived from the replacement batch itself (matching
    the reference, which deletes exactly the refreshed game_ids then
    appends their new rows).
    """
    delete_keys = replacement.select(*keys).dropDuplicates()
    kept = existing.join(F.broadcast(delete_keys), on=list(keys), how="left_anti")
    return kept.unionByName(replacement.select(*existing.columns))
