"""Single-pass column profiling — the data-quality companion to the
pre-write conformance checks (schemas.py ``conform`` /
``validate_no_all_null_columns``, reference
`/root/reference/src/data_processor/processor.py:619-710` family): null
counts, distinct cardinality, and value ranges for every requested
column, computed in ONE scan.

Plan shape: all per-column aggregates ride a single global aggregate
(Spark computes partial aggs map-side, so the corpus is read once
regardless of column count), then the 1-row wide result is unpivoted
to one row per column with ``stack`` — no per-column scans, no
shuffles beyond the one aggregate reduction. At 100 TB this is the
only profiler shape that works: a profile that re-scans per column is
a full-corpus multiplier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_v, max_v) per column.

    ``n_distinct`` is exact (count distinct ignores NULLs, matching
    SQL); ``min_v``/``max_v`` are rendered as strings so one schema
    serves every column type. Swap ``approx_count_distinct`` in for
    the exact count when profiling ultra-high-cardinality columns.
    """
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    stacked = wide.select(
        "__total",
        F.expr(
            f"stack({len(cols)}, {stack_args})"
            " AS (column, __nn, n_distinct, min_v, max_v)"
        ),
    )
    return stacked.select(
        "column",
        F.col("__total").alias("n_rows"),
        (F.col("__total") - F.col("__nn")).alias("n_null"),
        "n_distinct",
        "min_v",
        "max_v",
    )
