"""Every graded query runs at sf0.001 and matches its DuckDB oracle.

This is the same gate the driver applies at sf0.01 (tools/check_oracle.py
runs that locally); running it at the smallest SF keeps the suite fast
while still exercising every operator end-to-end.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMALL
from tools.check_oracle import TABLES, rowset

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    yield con


ALL_QUERIES = sorted(entrymod.queries())
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"user_id", "event_id", "event_type", "value", "ts"}


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    df = entrymod.queries()[name](spark, SF_SMALL)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    if name not in ORACLES:
        # rows-only contract: deterministic rerun must agree with itself
        again = [tuple(r) for r in entrymod.queries()[name](spark, SF_SMALL).collect()]
        assert sorted(map(str, spark_rows)) == sorted(map(str, again))
        return
    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert rowset(spark_cols, spark_rows) == rowset(duck_cols, duck_rows)
