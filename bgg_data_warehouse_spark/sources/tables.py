"""Parquet table registry over the driver's TPC-H-ish testdata.

Reads are plain ``spark.read.parquet`` — Catalyst gives predicate pushdown
and column pruning for free as long as downstream code filters/selects
declaratively (verified in tests via ``PushedFilters`` in the formatted
plan). At 100 TB these become partitioned/bucketed catalog tables; the
registry keeps a single chokepoint to swap layout policy without touching
query code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read nanos as long and floor to microseconds —
        # the same truncation DuckDB applies, so oracle values agree.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F

        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events_after(spark: SparkSession, sf_dir: str, watermark_utc: str) -> DataFrame:
    """events with ``ts > watermark``, filtered in the RAW nanos domain.

    The public ``ts`` column is derived (nanos → micros), so a predicate
    on it cannot reach the parquet scan — Catalyst only pushes
    ``IsNotNull``. Translating the watermark into the storage domain and
    filtering BEFORE the conversion restores full pushdown (min/max
    row-group skipping on the nanos column). Threshold is
    ``wm_micros * 1000 + 999`` so the nanos comparison is exactly
    equivalent to ``micros(ts) > wm`` after floor-truncation.
    """
    from datetime import datetime, timezone

    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    wm = datetime.fromisoformat(watermark_utc).replace(tzinfo=timezone.utc)
    wm_micros = int(wm.timestamp()) * 1_000_000 + wm.microsecond
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.where(F.col("ts") > F.lit(wm_micros * 1000 + 999)).withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    use = names or TESTDATA_TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register testdata tables as temp views for the SQL API."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
