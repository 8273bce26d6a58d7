"""Flattener tests mirroring the reference's fixture suite
(`/root/reference/tests/test_processor.py` — SURVEY.md §5)."""

from __future__ import annotations

from datetime import datetime

import pytest

from bgg_data_warehouse_spark import schemas
from bgg_data_warehouse_spark.sources import bgg_xml

from tests.bgg_fixtures import payload_rows


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame(
        payload_rows(), "game_id long, response_data string, fetch_timestamp timestamp, record_id string"
    )


@pytest.fixture(scope="module")
def parsed(spark, raw):
    df = bgg_xml.parse_responses(raw)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def tables(spark, parsed):
    return bgg_xml.normalize(parsed, datetime(2026, 2, 1, 12, 0, 0))


def test_parse_survives_bad_payloads(parsed):
    # 6 payloads: 4 parseable (catan, edge, string-name, python-literal catan),
    # empty + garbage yield nothing
    assert sorted(r.game_id for r in parsed.select("game_id").collect()) == [7, 13, 13, 99]


def test_catan_scalars(parsed):
    row = parsed.where("game_id = 13").collect()[0]
    assert row.primary_name == "Catan"
    assert row.year_published == 1995
    assert row.min_players == 3 and row.max_players == 4
    assert row.users_rated == 1000
    assert row.average_weight == 2.5


def test_malformed_values_default(parsed):
    row = parsed.where("game_id = 99").collect()[0]
    assert row.year_published is None  # year "0" → null
    assert row.users_rated == 0  # "not-a-number" → 0 default
    assert row.average_rating == 0.0  # "" → 0.0 default
    assert row.primary_name == "Solo"  # single-dict name variant


def test_string_only_name(parsed):
    row = parsed.where("game_id = 7").collect()[0]
    assert row.primary_name == "Bare Name"
    assert row.type == "boardgameexpansion"


def test_not_ranked_is_null(tables):
    ranks = {r.game_id: r for r in tables["rankings"].collect()}
    assert ranks[13].value == 42
    assert ranks[99].value is None  # "Not Ranked"


def test_games_table_schema_and_load_ts(tables):
    games = tables["games"]
    assert [f.name for f in games.schema.fields] == [f.name for f in schemas.GAMES.fields]
    assert all(
        r.load_timestamp == datetime(2026, 2, 1, 12, 0, 0)
        for r in games.select("load_timestamp").collect()
    )


def test_inbound_implementations_excluded(tables):
    impl = tables["game_implementations"].collect()
    assert {(r.game_id, r.implementation_id) for r in impl} == {(13, 29316)}


def test_dimensions_and_bridges(tables):
    cats = {(r.category_id, r.name) for r in tables["categories"].collect()}
    assert cats == {(1026, "Negotiation")}
    assert {(r.game_id, r.category_id) for r in tables["game_categories"].collect()} == {
        (13, 1026)
    }
    designers = {(r.designer_id, r.name) for r in tables["designers"].collect()}
    assert designers == {(11, "Klaus Teuber")}


def test_player_counts_string_and_votes(tables):
    pc = {r.player_count: r for r in tables["player_counts"].where("game_id=13").collect()}
    assert set(pc) == {"3", "4+"}  # non-numeric player_count preserved
    assert pc["3"].best_votes == 10
    assert pc["4+"].not_recommended_votes == 7


def test_alternate_names_and_polls(tables):
    alts = tables["alternate_names"].collect()
    assert {(r.game_id, r.name, r.sort_index) for r in alts} == {
        (13, "Settlers of Catan", 1)
    }
    lang = tables["language_dependence"].where("game_id=13").collect()
    assert [(r.level, r.votes) for r in lang] == [(1, 7)]
    ages = tables["suggested_ages"].where("game_id=13").collect()
    assert [(r.age, r.votes) for r in ages] == [("10", 4)]


def test_pk_validation(tables):
    assert bgg_xml.validate_pk_unique(tables["games"], ["game_id", "load_timestamp"])
    assert bgg_xml.validate_pk_unique(tables["player_counts"], ["game_id", "player_count"])
    assert bgg_xml.validate_pk_unique(tables["categories"], ["category_id"])


def test_python_literal_payload_parses_like_json(parsed):
    # r-52 carried str(CATAN) (python dict literal) — both game 13 rows equal
    rows = parsed.where("game_id = 13").collect()
    assert len(rows) == 2
    assert rows[0].asDict() == rows[1].asDict()


def test_conform_additive_evolution_and_guards(spark):
    from pyspark.sql import types as T

    from bgg_data_warehouse_spark import schemas

    target = T.StructType(
        [
            T.StructField("game_id", T.LongType(), nullable=False),
            T.StructField("name", T.StringType()),
            T.StructField("year", T.LongType()),
        ]
    )
    # old-shape frame: missing the newly added nullable 'year', int-typed id
    df = spark.createDataFrame([(1, "go"), (2, "chess")], "game_id int, name string")
    out = schemas.conform(df, target)
    assert [f.name for f in out.schema.fields] == ["game_id", "name", "year"]
    assert dict(out.dtypes)["game_id"] == "bigint"
    assert all(r.year is None for r in out.collect())

    # missing REQUIRED column is a hard error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="required"):
        schemas.conform(
            spark.createDataFrame([("x",)], "name string"), target
        )
    # undeclared column: error by default, droppable explicitly
    extra = spark.createDataFrame(
        [(1, "go", "BAD")], "game_id long, name string, rogue string"
    )
    with _pytest.raises(ValueError, match="evolve the schema registry"):
        schemas.conform(extra, target)
    assert "rogue" not in schemas.conform(extra, target, extras="drop").columns

    # all-null guard flags fully-null columns only
    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "a long, b string"
    )
    assert schemas.validate_no_all_null_columns(nulls) == ["b"]


def test_additive_evolution_read_side_fills_nulls(spark, tmp_path):
    """Old parquet files never need rewriting: an explicit read schema
    fills absent columns with NULL (the free half of additive evolution
    conform() documents)."""
    from pyspark.sql import types as T

    old = spark.createDataFrame([(1, "go")], "game_id long, name string")
    old.write.parquet(f"{tmp_path}/t")
    evolved = T.StructType(
        [
            T.StructField("game_id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("year", T.LongType()),
        ]
    )
    got = spark.read.schema(evolved).parquet(f"{tmp_path}/t").collect()
    assert got[0].year is None and got[0].name == "go"
