"""Every graded query runs at sf0.001 and matches its DuckDB oracle.

This is the same gate the driver applies at sf0.01 (tools/check_oracle.py
runs that locally); running it at the smallest SF keeps the suite fast
while still exercising every operator end-to-end.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMALL
from tools.check_oracle import TABLES, canon_pdf

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


def test_approx_distinct_within_rsd_of_exact_twin(spark):
    """The HLL estimate can't hash-match an oracle; since r11 the GATE
    itself emits the accuracy contract (|est-exact| <= 3*rsd*exact as a
    within_tol boolean, exact side SQL-replayed). This pins the gate's
    own assertion against the exact twin's grouping: same groups, exact
    side identical, every contract row true."""
    rows = {
        r.event_type: r
        for r in entrymod.queries()["approx_distinct_users"](spark, SF_SMALL).collect()
    }
    exact = {
        r.event_type: r.n_users
        for r in entrymod.queries()["distinct_users_exact"](spark, SF_SMALL).collect()
    }
    assert set(rows) == set(exact)
    for et, n in exact.items():
        assert rows[et].n_users_exact == n, (et, rows[et], n)
        assert rows[et].within_tol, (et, rows[et])


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    pdf_s = entrymod.queries()[name](spark, SF_SMALL).toPandas()
    if name not in ORACLES:
        # rows-only contract: the driver still canonicalizes (list columns
        # would hard-err) and a deterministic rerun must agree with itself
        again = entrymod.queries()[name](spark, SF_SMALL).toPandas()
        assert canon_pdf(pdf_s) == canon_pdf(again)
        return
    pdf_d = duck.execute(ORACLES[name]).df()
    assert sorted(pdf_s.columns) == sorted(pdf_d.columns)
    assert len(pdf_s) == len(pdf_d)
    assert canon_pdf(pdf_s) == canon_pdf(pdf_d)
