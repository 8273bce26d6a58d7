"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship latest-snapshot query (the reference's
core W1 pattern — games_active) at sf0.001. ``queries()`` exposes every
implemented operator from SURVEY.md §2 plus the LLM-pipeline extensions;
``oracle_sql()`` gives the DuckDB-equivalent SQL for everything
ANSI-expressible (sketch/ANN ops are rows-only by design).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bgg_data_warehouse_spark import tpch  # noqa: F401 — registers Q2/Q7-Q22
from bgg_data_warehouse_spark import workload


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workload.QUERIES["latest_snapshot"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(workload.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(workload.ORACLES)
