"""The events loader must survive BOTH parquet ts encodings the driver's
testdata generator has shipped: TIMESTAMP(NANOS) (round 1/2) and
timestamp[us] (round 3+). Two tiny fixture files, one per encoding, so the
next testdata flip cannot red the repo again (VERDICT r02 item #1)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bgg_data_warehouse_spark.sources.tables import (
    _events_ts_encoding,
    load_events_after,
    load_table,
)

ROWS = [
    # (event_id, wall-clock ts, user_id, event_type, value)
    (1, dt.datetime(2024, 1, 1, 0, 0, 0, 100), 10, "view", 1.0),
    (2, dt.datetime(2024, 1, 1, 12, 0, 0, 0), 11, "click", 2.0),
    (3, dt.datetime(2024, 1, 2, 0, 0, 0, 999999), 12, "view", 3.0),
]


def _write_events(path, unit: str) -> None:
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in ROWS], pa.timestamp(unit)),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], pa.string()),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array(["{}"] * len(ROWS), pa.string()),
        }
    )
    pq.write_table(table, path)


@pytest.fixture(scope="module")
def sf_dirs(tmp_path_factory):
    dirs = {}
    for unit in ("us", "ns"):
        d = tmp_path_factory.mktemp(f"events_{unit}")
        _write_events(str(d / "events.parquet"), unit)
        dirs[unit] = str(d)
    return dirs


def test_all_testdata_tables_load(spark):
    """Generator-drift canary: every table at sf0.001 must load and have
    rows. When the driver's testdata changes shape again, this fails in
    one obvious place instead of 40 query gates."""
    from bgg_data_warehouse_spark.sources.tables import TESTDATA_TABLES, load_table

    for name in TESTDATA_TABLES:
        df = load_table(spark, "/root/testdata/sf0.001", name)
        assert df.count() > 0, name
        df.limit(1).collect()


def test_documents_corpus_is_ascii_and_non_empty(spark):
    """ASCII + non-empty canary for the multimodal exact gates (ADVICE
    r03 #2/#3): their oracles equate DuckDB length(text)/unicode(char)
    (codepoints) with Python len(text.encode('utf-8'))/byte values,
    which only holds while the corpus is pure ASCII; and the payload
    synthesizers require non-empty text. If a future testdata generation
    breaks either invariant, this fails in one obvious place instead of
    four oracle gates going silently red."""
    from pyspark.sql import functions as F

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = load_table(spark, sf_dir, "documents")
        bad = docs.where(
            (F.octet_length("text") != F.char_length("text"))
            | (F.char_length("text") == 0)
        ).count()
        assert bad == 0, f"{sf_dir}: non-ASCII or empty documents present"


def test_encoding_sniff(sf_dirs):
    assert _events_ts_encoding(f"{sf_dirs['us']}/events.parquet") == "native"
    assert _events_ts_encoding(f"{sf_dirs['ns']}/events.parquet") == "nanos"


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_load_table_both_encodings(spark, sf_dirs, unit):
    df = load_table(spark, sf_dirs[unit], "events")
    got = sorted((r.event_id, r.ts) for r in df.collect())
    want = sorted((r[0], r[1]) for r in ROWS)
    assert got == want, f"{unit}: wall-clock values must match exactly"


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_load_events_after_both_encodings(spark, sf_dirs, unit):
    # watermark exactly equal to row 2's ts: strict > keeps only row 3
    df = load_events_after(spark, sf_dirs[unit], "2024-01-01T12:00:00")
    assert [r.event_id for r in df.collect()] == [3]
    # watermark mid-microsecond boundary: row 1 at .000100 must survive a
    # .000099 watermark and be excluded by a .000100 one (floor-truncation
    # equivalence on the nanos path)
    assert [
        r.event_id
        for r in load_events_after(
            spark, sf_dirs[unit], "2024-01-01T00:00:00.000099"
        ).collect()
    ][:1] == [1]
    excl = load_events_after(spark, sf_dirs[unit], "2024-01-01T00:00:00.000100")
    assert 1 not in [r.event_id for r in excl.collect()]
