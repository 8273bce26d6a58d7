"""End-to-end ingest pipeline: fetch stage → process stage → core tables,
idempotency on re-run, and failure accounting — the reference's
fetch_new_games lifecycle (§3.1)."""

from __future__ import annotations

import json
from datetime import datetime

import pytest

from bgg_data_warehouse_spark import io, pipeline, schemas
from bgg_data_warehouse_spark.sources.api_client import BGGApiClient, RateLimiter

from tests.bgg_fixtures import CATAN, EDGE_MINIMAL

T0 = datetime(2026, 4, 1, 12, 0, 0)


def _client(served: dict[int, dict | None]):
    """Fake transport: per-game canned items; None → omitted from response."""

    def transport(url):
        ids = url.split("id=")[1].split("&")[0].split(",")
        items = []
        for gid in ids:
            spec = served.get(int(gid))
            if spec is None:
                continue
            item = dict(spec["items"]["item"])
            item["@id"] = gid
            items.append(item)
        return 200, json.dumps({"items": {"item": items}})

    return BGGApiClient(
        transport=transport,
        rate_limiter=RateLimiter(clock=lambda: 0.0, sleep=lambda s: None),
        sleep=lambda s: None,
    )


@pytest.fixture()
def root(spark, tmp_path):
    root = str(tmp_path)
    thing_ids = spark.createDataFrame(
        [
            {"game_id": g, "type": "boardgame", "processed": False,
             "process_timestamp": None, "source": "test", "load_timestamp": T0}
            for g in (13, 99, 404)
        ],
        schemas.THING_IDS,
    )
    io.write_table(thing_ids, root, "thing_ids")
    return root


def test_fetch_and_process_end_to_end(spark, root):
    client = _client({13: CATAN, 99: EDGE_MINIMAL, 404: None})
    fetched, processed = pipeline.fetch_new_games(spark, root, client, now=T0)
    assert fetched == 3
    assert processed == 2  # 404 produced no payload → no raw row to process

    games = io.read_table(spark, root, "games")
    assert sorted(r.game_id for r in games.collect()) == [13, 99]
    cats = io.read_table(spark, root, "categories")
    assert {(r.category_id, r.name) for r in cats.collect()} == {(1026, "Negotiation")}
    pc = io.read_table(spark, root, "player_counts")
    assert {r.player_count for r in pc.where("game_id = 13").collect()} == {"3", "4+"}

    statuses = {
        r.game_id: r.fetch_status
        for r in io.read_table(spark, root, "fetched_responses").collect()
    }
    assert statuses[13] == "success" and statuses[404] == "no_response"
    # leases drained
    assert io.read_table(spark, root, "fetch_in_progress").count() == 0


def test_rerun_is_idempotent(spark, root):
    client = _client({13: CATAN, 99: EDGE_MINIMAL, 404: None})
    pipeline.fetch_new_games(spark, root, client, now=T0)
    games_before = io.read_table(spark, root, "games").count()

    fetched2, processed2 = pipeline.fetch_new_games(spark, root, client, now=T0)
    # 13/99 fetched OK → excluded; 404 has 1 failed attempt, inside the
    # 1h cool-down at the same `now` → nothing to fetch, nothing to process
    assert (fetched2, processed2) == (0, 0)
    assert io.read_table(spark, root, "games").count() == games_before


def test_refetch_replaces_bridges_appends_games(spark, root):
    client = _client({13: CATAN, 99: EDGE_MINIMAL, 404: None})
    pipeline.fetch_new_games(spark, root, client, now=T0)

    # simulate a refresh: clear tracking state for game 13 and serve a
    # changed payload (category renamed) at a later load time
    changed = json.loads(json.dumps(CATAN))
    changed["items"]["item"]["link"][0]["@value"] = "Trading"
    changed["items"]["item"]["link"][0]["@id"] = "2000"
    fetched = io.read_table(spark, root, "fetched_responses").where("game_id <> 13")
    io.rewrite_table(fetched, root, "fetched_responses")

    T1 = datetime(2026, 4, 2, 12, 0, 0)
    pipeline.fetch_new_games(spark, root, _client({13: changed}), now=T1)

    games = io.read_table(spark, root, "games").where("game_id = 13")
    assert games.count() == 2  # time-series append: both snapshots kept
    bridges = io.read_table(spark, root, "game_categories").where("game_id = 13")
    assert {r.category_id for r in bridges.collect()} == {2000}  # replaced, not appended
    cats = {r.category_id for r in io.read_table(spark, root, "categories").collect()}
    assert cats == {1026, 2000}  # dimension keeps union of all entities ever seen
