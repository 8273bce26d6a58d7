"""Log-structured generational store — delta-sized writes for stored
indexes (r12 VERDICT #3).

The batch index maintainers (io.maintain_postings_table and kin) and the
streaming epoch appliers (streaming/index_maintenance.py) keep a stored
index fresh with delta-bounded COMPUTE, but every application ends in a
staged rewrite of the whole table — at 100 TB that write makes per-epoch
maintenance index-sized again, the honest floor those modules' docstrings
name. This module is the named alternative, for any relation keyed by a
replacement key (one column or a composite — postings by doc, sketches
by doc, CDC state by primary key): a BASE parquet table plus an ordered
chain of DELTA GENERATIONS, each holding the epoch's fresh rows and its
tombstoned keys. Appending an epoch writes ONLY the generation (delta-sized);
reading merges base + generations relationally; a COMPACTION op folds
the accumulated generations back into base on whatever cadence amortizes
the rewrite (the Delta/Iceberg/LSM discipline, re-expressed over plain
parquet directories with the same two-rename atomic-swap machinery io.py
already proves out).

Merge semantics (REPLACE-by-key, the contract all the index maintainers
share): a generation either re-ingests a key — its rows REPLACE every
older row for that key — or tombstones it; the NEWEST generation touching
a key wins, and within one generation deletion wins (enforced
structurally: ``append_log_delta`` anti-joins the rows against the
generation's own tombstones, so rows and tombstones are key-disjoint on
disk). The read path is therefore:

    touched(key, gen) = ∪ over generations of (rows' keys ∪ tombstones)
    winner(key)       = max gen per touched key          (delta-sized agg)
    result            = base ANTI touched-keys           (broadcast, map-side)
                        ∪ rows whose (key, gen) = winner (delta-sized semi)

Base rows are never shuffled: the touched-key set is delta-bounded and
broadcast, so the only corpus-sized work is the one base scan every
consumer pays anyway. Generation count is bounded by compaction cadence;
each uncompacted generation adds one delta-sized scan to reads, which is
the standard LSM read-amplification trade.

Crash matrix (single-runner-per-store model, same as io.py):

- torn append (generation dir without its ``_COMMITTED`` marker):
  invisible to readers, removed by :func:`recover_log_store`;
- compaction died between the base swap's two renames: no live base,
  healed by io.recover_table's newest-backup restore (the base subtable
  uses io._rewrite verbatim);
- compaction died after the swap, before folded generations were
  deleted: the leftover generations REPLAY IDEMPOTENTLY over the
  compacted base — a folded upsert's rows re-replace themselves, a
  folded tombstone re-deletes an already-absent key — so readers are
  correct immediately and the next compaction folds them away
  (pinned by tests/test_log_store.py).

Reference anchor: the reference rewrites its BigQuery tables wholesale on
every refresh (e.g. `/root/reference/definitions/game_neighbors.sqlx:16`)
because BigQuery owns storage internally; on Spark the engine owns the
files, so the write path must earn its own delta-sizing.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import _rewrite, _staged_swap, recover_table

_BASE = "base"
_DELTA_PREFIX = "delta_"
_COMMIT = "_COMMITTED"


def _as_cols(key_col) -> list[str]:
    """Keys are a single column name or a list (composite key — the CDC
    state shape); everything below works on the list form."""
    return [key_col] if isinstance(key_col, str) else list(key_col)


def _tomb_frame(rows, tombstones, key_cols: list[str]):
    """Normalize the tombstone input to a distinct key-column frame.
    Single-key tombstones may arrive under any column name (first
    column wins — the maintainers pass bare id frames); composite-key
    tombstones must carry the key columns by name."""
    if tombstones is None:
        return rows.select(*key_cols).limit(0)
    if len(key_cols) == 1:
        return tombstones.select(
            F.col(tombstones.columns[0]).alias(key_cols[0])
        ).distinct()
    return tombstones.select(*key_cols).distinct()


def _store_path(root: str, name: str) -> str:
    return os.path.join(root, name)


def _base_path(store: str) -> str:
    return os.path.join(store, _BASE)


def _delta_dirs(store: str, *, committed: bool) -> list[str]:
    """Generation dirs in commit order (zero-padded time_ns name prefix
    — same exact-ordering trick as io._rewrite's backup names)."""
    if not os.path.isdir(store):
        return []
    out = []
    for e in sorted(os.listdir(store)):
        if not e.startswith(_DELTA_PREFIX):
            continue
        d = os.path.join(store, e)
        has_marker = os.path.exists(os.path.join(d, _COMMIT))
        if has_marker == committed:
            out.append(d)
    return out


def init_log_store(df: DataFrame, root: str, name: str) -> None:
    """Create (or re-create) a store whose base is ``df``. Any existing
    generations are discarded — this is CREATE, not maintenance."""
    store = _store_path(root, name)
    shutil.rmtree(store, ignore_errors=True)
    df.write.mode("overwrite").parquet(_base_path(store))


def log_store_exists(root: str, name: str) -> bool:
    store = _store_path(root, name)
    return os.path.isdir(_base_path(store)) or bool(
        _delta_dirs(store, committed=True)
    )


def recover_log_store(root: str, name: str) -> bool:
    """Heal every crash window: restore a mid-swap base from its newest
    backup (io.recover_table machinery), drop torn (uncommitted)
    generation appends. Leftover COMMITTED generations that a crashed
    compaction already folded are deliberately kept — they replay
    idempotently (module docstring) and the next compaction folds them.
    Returns True if the base was restored from a backup."""
    store = _store_path(root, name)
    if not os.path.isdir(store):
        return False
    healed = recover_table(store, _BASE)
    for d in _delta_dirs(store, committed=False):
        shutil.rmtree(d, ignore_errors=True)
    return healed


def append_log_delta(
    root: str,
    name: str,
    rows: DataFrame,
    key_col: str,
    *,
    tombstones: DataFrame | None = None,
) -> str:
    """Write ONE generation: ``rows`` re-ingest their keys (replacing all
    older rows per key), ``tombstones``' first column lists deleted keys.
    The only bytes written are the generation's own — never base-sized.
    Commit protocol: rows dir, tombstones dir, then the ``_COMMITTED``
    marker last, so a crash mid-append leaves an invisible torn dir that
    :func:`recover_log_store` removes. Returns the generation dir name."""
    store = _store_path(root, name)
    gen = f"{_DELTA_PREFIX}{time.time_ns():020d}_{uuid.uuid4().hex[:6]}"
    gdir = os.path.join(store, gen)
    key_cols = _as_cols(key_col)
    tombs = _tomb_frame(rows, tombstones, key_cols)
    # deletion wins within a generation: rows and tombstones key-disjoint
    live_rows = rows.join(F.broadcast(tombs), key_cols, "left_anti")
    live_rows.write.mode("overwrite").parquet(os.path.join(gdir, "rows"))
    tombs.write.mode("overwrite").parquet(os.path.join(gdir, "tombstones"))
    with open(os.path.join(gdir, _COMMIT), "w"):
        pass
    return gen


def _merge(
    spark: SparkSession, base: DataFrame, gen_dirs: list[str], key_col
) -> DataFrame:
    """The generational merge (module docstring): newest touch per key
    wins; base rows leave via ONE broadcast anti on the delta-bounded
    touched-key set — no corpus shuffle."""
    key_cols = _as_cols(key_col)
    fresh_parts, touched_parts = [], []
    for i, g in enumerate(gen_dirs):
        r = spark.read.parquet(os.path.join(g, "rows")).withColumn(
            "_gen", F.lit(i)
        )
        t = (
            spark.read.parquet(os.path.join(g, "tombstones"))
            .select(*key_cols)
            .withColumn("_gen", F.lit(i))
        )
        fresh_parts.append(r)
        touched_parts.append(r.select(*key_cols, "_gen").unionByName(t))
    fresh = reduce(DataFrame.unionByName, fresh_parts)
    touched = reduce(DataFrame.unionByName, touched_parts)
    winner = touched.groupBy(*key_cols).agg(F.max("_gen").alias("_gen"))
    live_fresh = fresh.join(
        winner, [*key_cols, "_gen"], "left_semi"
    ).drop("_gen")
    kept = base.join(
        F.broadcast(winner.select(*key_cols)), key_cols, "left_anti"
    )
    return kept.unionByName(live_fresh)


def read_log_store(
    spark: SparkSession, root: str, name: str, key_col: str
) -> DataFrame:
    """The store's current contents — base if compacted, the generational
    merge otherwise. Heals crash windows first (cheap, idempotent under
    the single-runner model), exactly like the table read paths call
    io.recover_table, so 'base missing' can never silently read as an
    empty corpus mid-swap."""
    recover_log_store(root, name)
    store = _store_path(root, name)
    gens = _delta_dirs(store, committed=True)
    base_dir = _base_path(store)
    if os.path.isdir(base_dir):
        base = spark.read.parquet(base_dir)
    elif gens:
        # store created by a first delta-only epoch: empty base with the
        # generation's row schema
        base = spark.read.parquet(os.path.join(gens[0], "rows")).limit(0)
    else:
        raise FileNotFoundError(f"log store {store} has no base and no deltas")
    if not gens:
        return base
    return _merge(spark, base, gens, key_col)


def compact_if_needed(
    spark: SparkSession,
    root: str,
    name: str,
    key_col: str,
    *,
    max_generations: int = 16,
    max_delta_fraction: float = 0.2,
) -> int:
    """Compaction policy: fold when the generation COUNT exceeds
    ``max_generations`` (read amplification: each generation is one
    extra scan per read) or the generations' total BYTES exceed
    ``max_delta_fraction`` of base (merge-work amplification: the
    touched-key set must stay broadcast-small relative to base). Call
    after every N epochs — e.g. from the foreachBatch sink — and the
    index-sized rewrite amortizes to 1/N of epochs while per-epoch
    writes stay delta-sized. Returns generations folded (0 = below both
    thresholds)."""
    if not _needs_compaction(
        _store_path(root, name), max_generations, max_delta_fraction
    ):
        return 0
    return compact_log_store(spark, root, name, key_col)


def _needs_compaction(
    store: str, max_generations: int, max_delta_fraction: float
) -> bool:
    gens = _delta_dirs(store, committed=True)
    if not gens:
        return False

    def _bytes(d: str) -> int:
        total = 0
        for dirpath, _dirs, files in os.walk(d):
            total += sum(
                os.path.getsize(os.path.join(dirpath, f)) for f in files
            )
        return total

    base_bytes = _bytes(_base_path(store)) or 1
    return (
        len(gens) > max_generations
        or sum(_bytes(g) for g in gens) > max_delta_fraction * base_bytes
    )


def compact_pair_if_needed(
    spark: SparkSession,
    root: str,
    name: str,
    keys: dict[str, str],
    *,
    max_generations: int = 16,
    max_delta_fraction: float = 0.2,
) -> int:
    """:func:`compact_if_needed` for the paired store (same thresholds,
    measured over the whole base — the parts fold together or not at
    all)."""
    if not _needs_compaction(
        _store_path(root, name), max_generations, max_delta_fraction
    ):
        return 0
    return compact_pair_store(spark, root, name, keys)


def compact_log_store(
    spark: SparkSession, root: str, name: str, key_col: str
) -> int:
    """Fold every committed generation into base: compute the merge,
    stage-write it, atomically swap base (io._rewrite — concurrent
    readers of the old files are never corrupted, a mid-swap crash heals
    via recover_table), then delete the folded generations. A crash
    between swap and deletion leaves generations that replay
    idempotently over the new base (module docstring). Returns the
    number of generations folded."""
    recover_log_store(root, name)
    store = _store_path(root, name)
    gens = _delta_dirs(store, committed=True)  # snapshot: fold exactly these
    if not gens:
        return 0
    base_dir = _base_path(store)
    if os.path.isdir(base_dir):
        base = spark.read.parquet(base_dir)
    else:
        base = spark.read.parquet(os.path.join(gens[0], "rows")).limit(0)
    folded = _merge(spark, base, gens, key_col)
    # _rewrite stages the full write BEFORE the swap, so the plan's scan
    # of the old base + generation files completes while they still exist
    _rewrite(folded, store, _BASE)
    for g in gens:
        shutil.rmtree(g, ignore_errors=True)
    return len(gens)


# ---------------------------------------------------------------------------
# Paired store: N keyed relations sharing ONE generation commit and ONE
# base swap — the log-structured form of io.py's corpus+neighbors pair
# store. A generation dir holds one {rows, tombstones} pair PER PART
# under the part's subdirectory, committed by a single marker, so the
# r12 #4 pair-atomicity contract survives delta-sizing: no crash window
# can publish a vector corpus inconsistent with the neighbors built
# from it, because both parts become visible (or fold, or heal) as one
# unit at every stage.
# ---------------------------------------------------------------------------


def init_pair_store(
    root: str, name: str, parts: dict[str, DataFrame]
) -> None:
    """Create a paired store whose base holds one table per part name."""
    store = _store_path(root, name)
    shutil.rmtree(store, ignore_errors=True)
    for part, df in parts.items():
        df.write.mode("overwrite").parquet(
            os.path.join(_base_path(store), part)
        )


def append_pair_delta(
    root: str,
    name: str,
    parts: dict[str, tuple[DataFrame, DataFrame | None, str]],
) -> str:
    """Write ONE generation touching every part: ``parts`` maps part
    name -> (rows, tombstones_or_None, key_col). All parts' writes land
    before the single ``_COMMITTED`` marker, so a crash mid-append
    leaves a torn generation invisible to every part at once."""
    store = _store_path(root, name)
    gen = f"{_DELTA_PREFIX}{time.time_ns():020d}_{uuid.uuid4().hex[:6]}"
    gdir = os.path.join(store, gen)
    for part, (rows, tombstones, key_col) in parts.items():
        key_cols = _as_cols(key_col)
        tombs = _tomb_frame(rows, tombstones, key_cols)
        live_rows = rows.join(F.broadcast(tombs), key_cols, "left_anti")
        live_rows.write.mode("overwrite").parquet(
            os.path.join(gdir, part, "rows")
        )
        tombs.write.mode("overwrite").parquet(
            os.path.join(gdir, part, "tombstones")
        )
    with open(os.path.join(gdir, _COMMIT), "w"):
        pass
    return gen


def read_pair_store(
    spark: SparkSession, root: str, name: str, part: str, key_col: str
) -> DataFrame:
    """One part's current contents (generational merge over that part's
    slices of base + every committed generation)."""
    recover_log_store(root, name)
    store = _store_path(root, name)
    gens = [
        os.path.join(g, part) for g in _delta_dirs(store, committed=True)
    ]
    base_dir = os.path.join(_base_path(store), part)
    if os.path.isdir(base_dir):
        base = spark.read.parquet(base_dir)
    elif gens:
        base = spark.read.parquet(os.path.join(gens[0], "rows")).limit(0)
    else:
        raise FileNotFoundError(
            f"pair store {store} part {part} has no base and no deltas"
        )
    if not gens:
        return base
    return _merge(spark, base, gens, key_col)


def compact_pair_store(
    spark: SparkSession, root: str, name: str, keys: dict[str, str]
) -> int:
    """Fold every committed generation into base for ALL parts in ONE
    staged swap (``keys``: part -> key_col). Same crash matrix as the
    single store — and because the swap covers every part's base at
    once, a half-compacted pair can never exist."""
    recover_log_store(root, name)
    store = _store_path(root, name)
    gens = _delta_dirs(store, committed=True)
    if not gens:
        return 0
    folded = {}
    for part, key_col in keys.items():
        part_gens = [os.path.join(g, part) for g in gens]
        base_dir = os.path.join(_base_path(store), part)
        if os.path.isdir(base_dir):
            base = spark.read.parquet(base_dir)
        else:
            base = spark.read.parquet(
                os.path.join(part_gens[0], "rows")
            ).limit(0)
        folded[part] = _merge(spark, base, part_gens, key_col)

    def build(staging: str) -> None:
        for part, df in folded.items():
            df.write.mode("overwrite").parquet(os.path.join(staging, part))

    _staged_swap(store, _BASE, build)
    for g in gens:
        shutil.rmtree(g, ignore_errors=True)
    return len(gens)
