"""Distributed two-sample statistics: shared cumulative-count spine.

Classic two-sample tests (Kolmogorov–Smirnov, Mann–Whitney U) are
textbook single ``ORDER BY value`` window queries — the one shape that
cannot survive 100 TB on Spark (a bare ``Window.orderBy`` collapses to
one task). But both tests only need, per DISTINCT value, the cumulative
count of each sample at-or-below that value — an associative running
sum, which :mod:`operators.prefix` decomposes into the bucketed
two-pass scan that is bit-identical to the global window at any
partitioning.

This module builds that shared spine once:

    value | ca0 cb0 (counts AT the value) | ca cb (counts ≤ value)

from which

- KS:   D = max_v |ca·n_b − cb·n_a| / (n_a·n_b)   (exact rational)
- MWU:  2·U_A = Σ_v ca0·(2·(cb − cb0) + cb0)      (exact integer,
        average-rank tie handling folded into the ×2 scaling)

are plain map-side-combinable aggregates over the |distinct values|
rows. The workload gates (``ks_two_sample``, ``mannwhitney_u``) pair
this with DuckDB oracles that use the textbook global-window forms, so
the hash gate proves the distributed rewrite IS the textbook statistic.

No reference counterpart (the reference's warehouse leans on BigQuery's
internally-parallel analytic windows, e.g. the ranking patterns in
definitions/ games_features-style models); this is engine machinery for
the LLM-pipeline extensions, same family as operators/prefix.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .prefix import running_sums

__all__ = ["two_sample_cum_counts"]


def two_sample_cum_counts(
    df: DataFrame,
    value_col: str,
    a_flag: Column,
    b_flag: Column,
    bucket: Column,
    *,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Per distinct ``value_col``: both samples' at-value counts
    (``ca0``/``cb0``) and inclusive cumulative counts (``ca``/``cb``)
    over ascending value order — the sufficient statistic for every
    rank/ECDF-based two-sample test.

    ``a_flag``/``b_flag`` are 0/1 integer membership expressions (a row
    may belong to neither, e.g. an unrelated event type, and such rows
    contribute nothing). ``bucket`` must be order-aligned with
    ``value_col`` (see :mod:`operators.prefix`); ``partition_cols``
    restarts the scan per group for stratified variants.

    One shuffle groups rows to distinct values (map-side combinable);
    the two running sums ride the same (partition, bucket) layout —
    per-bucket windows plus a broadcast |buckets|-row exclusive prefix,
    never a single-task global sort. The grouped relation is pinned
    with a lazy localCheckpoint before the scans: each running sum
    consumes its input on TWO branches (per-bucket window + offset
    totals) and exchange reuse does not unify them, so an unpinned
    spine would re-read the raw table four times — the pin makes the
    whole spine exactly one source scan at any scale.
    """
    pc = partition_cols or []
    g = df.groupBy(*pc, value_col).agg(
        F.sum(a_flag).cast("long").alias("ca0"),
        F.sum(b_flag).cast("long").alias("cb0"),
    ).localCheckpoint(eager=False)
    return running_sums(
        g,
        ["ca0", "cb0"],
        bucket,
        [value_col],
        partition_cols=pc,
        out_cols=["ca", "cb"],
    )
