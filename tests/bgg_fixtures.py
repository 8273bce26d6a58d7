"""BGG-shaped synthetic fixtures (FIXTURES.md §A): XML-ish payloads for the
flattener and seeded core/landing tables for the analytics models."""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta

CATAN = {
    "items": {
        "item": {
            "@id": "13",
            "@type": "boardgame",
            "name": [
                {"@type": "primary", "@value": "Catan"},
                {"@type": "alternate", "@value": "Settlers of Catan", "@sortindex": "1"},
            ],
            "yearpublished": {"@value": "1995"},
            "minplayers": {"@value": "3"},
            "maxplayers": {"@value": "4"},
            "playingtime": {"@value": "120"},
            "minplaytime": {"@value": "60"},
            "maxplaytime": {"@value": "120"},
            "minage": {"@value": "10"},
            "description": "Trade, build, settle.",
            "thumbnail": "http://img/13_t.jpg",
            "image": "http://img/13.jpg",
            "link": [
                {"@type": "boardgamecategory", "@id": "1026", "@value": "Negotiation"},
                {"@type": "boardgamemechanic", "@id": "2072", "@value": "Dice Rolling"},
                {"@type": "boardgamedesigner", "@id": "11", "@value": "Klaus Teuber"},
                {"@type": "boardgamepublisher", "@id": "37", "@value": "KOSMOS"},
                {
                    "@type": "boardgameimplementation",
                    "@id": "29316",
                    "@value": "Catan: 25th Anniversary",
                },
                {
                    "@type": "boardgameimplementation",
                    "@id": "27710",
                    "@value": "Inbound Thing",
                    "@inbound": "true",
                },
            ],
            "poll": [
                {
                    "@name": "suggested_numplayers",
                    "results": [
                        {
                            "@numplayers": "3",
                            "result": [
                                {"@value": "Best", "@numvotes": "10"},
                                {"@value": "Recommended", "@numvotes": "5"},
                                {"@value": "Not Recommended", "@numvotes": "1"},
                            ],
                        },
                        {
                            "@numplayers": "4+",
                            "result": [
                                {"@value": "Best", "@numvotes": "2"},
                                {"@value": "Recommended", "@numvotes": "3"},
                                {"@value": "Not Recommended", "@numvotes": "7"},
                            ],
                        },
                    ],
                },
                {
                    "@name": "language_dependence",
                    "results": {
                        "result": [
                            {
                                "@level": "1",
                                "@value": "No necessary in-game text",
                                "@numvotes": "7",
                            }
                        ]
                    },
                },
                {
                    "@name": "suggested_playerage",
                    "results": {"result": [{"@value": "10", "@numvotes": "4"}]},
                },
            ],
            "statistics": {
                "ratings": {
                    "usersrated": {"@value": "1000"},
                    "average": {"@value": "7.5"},
                    "bayesaverage": {"@value": "7.1"},
                    "stddev": {"@value": "1.2"},
                    "median": {"@value": "0"},
                    "owned": {"@value": "500"},
                    "trading": {"@value": "10"},
                    "wanting": {"@value": "20"},
                    "wishing": {"@value": "30"},
                    "numcomments": {"@value": "40"},
                    "numweights": {"@value": "50"},
                    "averageweight": {"@value": "2.5"},
                    "ranks": {
                        "rank": [
                            {
                                "@type": "subtype",
                                "@name": "boardgame",
                                "@friendlyname": "Board Game Rank",
                                "@value": "42",
                                "@bayesaverage": "7.1",
                            }
                        ]
                    },
                }
            },
        }
    }
}

# single-dict name, string-only rank list, year "0", malformed stats
EDGE_MINIMAL = {
    "items": {
        "item": {
            "@id": "99",
            "@type": "boardgame",
            "name": {"@type": "primary", "@value": "Solo"},
            "yearpublished": {"@value": "0"},
            "statistics": {
                "ratings": {
                    "usersrated": {"@value": "not-a-number"},
                    "average": {"@value": ""},
                    "ranks": {
                        "rank": {
                            "@type": "subtype",
                            "@name": "boardgame",
                            "@friendlyname": "Board Game Rank",
                            "@value": "Not Ranked",
                            "@bayesaverage": "0",
                        }
                    },
                }
            },
        }
    }
}

STRING_NAME = {
    "items": {"item": {"@id": "7", "@type": "boardgameexpansion", "name": "Bare Name"}}
}


def payload_rows():
    """(game_id, response_data, fetch_timestamp, record_id) fixture rows."""
    base = datetime(2026, 1, 1)
    return [
        (13, json.dumps(CATAN), base, "r-13"),
        (99, json.dumps(EDGE_MINIMAL), base, "r-99"),
        (7, json.dumps(STRING_NAME), base, "r-7"),
        (50, "", base, "r-50"),  # empty payload
        (51, "{not valid json or literal", base, "r-51"),  # unparseable
        (52, str(CATAN), base, "r-52"),  # python-literal payload (F16)
    ]


def core_fixture_tables(spark, n_games: int = 60, seed: int = 7):
    """Seeded core + landing tables exercising every model predicate."""
    from bgg_data_warehouse_spark import schemas

    rng = random.Random(seed)
    base = datetime(2026, 1, 1)
    games_rows = []
    for gid in range(1, n_games + 1):
        for snap in range(rng.choice([1, 2, 3])):
            users = rng.choice([0, 5, 24, 25, 26, 99, 100, 101, 5000])
            bayes = rng.choice([None, 0.0, round(rng.uniform(5.5, 8.2), 3)])
            games_rows.append(
                {
                    "game_id": gid,
                    "type": "boardgame" if gid % 7 else "boardgameexpansion",
                    "primary_name": f"Game {gid}",
                    "year_published": None if gid % 11 == 0 else 1980 + (gid % 45),
                    "min_players": 1 + gid % 3,
                    "max_players": 2 + gid % 6,
                    "playing_time": 30 + (gid % 8) * 15,
                    "min_playtime": 30,
                    "max_playtime": 180,
                    "min_age": 8 + gid % 8,
                    "description": f"desc {gid} " * 5,
                    "thumbnail": f"http://img/{gid}_t.jpg",
                    "image": f"http://img/{gid}.jpg",
                    "users_rated": users,
                    "average_rating": round(rng.uniform(4, 9), 3),
                    "bayes_average": bayes,
                    "standard_deviation": round(rng.uniform(0.5, 2.0), 3),
                    "median_rating": 0.0,
                    "owned_count": users * 2,
                    "trading_count": 3,
                    "wanting_count": 4,
                    "wishing_count": 5,
                    "num_comments": 6,
                    "num_weights": 7,
                    "average_weight": round(rng.uniform(1.0, 5.0), 2),
                    "load_timestamp": base + timedelta(days=snap, hours=gid % 5),
                }
            )
    games = spark.createDataFrame(games_rows, schemas.GAMES)

    def dim(name, id_col, n=12):
        return spark.createDataFrame(
            [{id_col: i, "name": f"{name[:-1]} {i}"} for i in range(1, n + 1)],
            schemas.DIMENSIONS[name],
        )

    dims = {name: dim(name, idc) for name, idc in schemas.DIM_ID_COLS.items()}

    bridges = {}
    for bname, schema in schemas.BRIDGES.items():
        other = schema.fields[1].name
        rows = []
        for gid in range(1, n_games + 1):
            for k in range(rng.randint(0, 4)):
                rows.append({"game_id": gid, other: 1 + (gid * 3 + k) % 12})
        # some games intentionally linkless (empty-array LEFT JOIN case)
        bridges[bname] = spark.createDataFrame(
            [r for r in rows if r["game_id"] % 13 != 0], schema
        ).dropDuplicates(["game_id", other])

    pc_rows = []
    for gid in range(1, n_games + 1):
        for pc in ["1", "2", "3", "4", "4+", "9"][: 2 + gid % 4]:
            b, r, n = rng.randint(0, 20), rng.randint(0, 10), rng.randint(0, 10)
            if gid % 17 == 0:
                b = r = n = 0  # all-zero votes → ratio guard
            pc_rows.append(
                {
                    "game_id": gid,
                    "player_count": pc,
                    "best_votes": b,
                    "recommended_votes": r,
                    "not_recommended_votes": n,
                }
            )
    player_counts = spark.createDataFrame(pc_rows, schemas.PLAYER_COUNTS)

    pred_rows = []
    for gid in range(1, n_games + 1):
        for job in range(1, 3):  # two scores per game → latest-per-key
            pred_rows.append(
                {
                    "job_id": f"job-{job}",
                    "game_id": gid,
                    "name": f"Game {gid}",
                    "year_published": 2000,
                    "predicted_hurdle_prob": round(rng.random(), 4),
                    "predicted_complexity": round(rng.uniform(1, 5), 3),
                    "predicted_rating": round(rng.uniform(5, 9), 3),
                    "predicted_users_rated": float(rng.randint(10, 1000)),
                    "predicted_geek_rating": round(rng.uniform(5.5, 8), 3),
                    **{
                        f"{fam}_{part}": f"{fam}-{part}-v{job}"
                        for fam in (
                            "geek_rating", "hurdle", "complexity", "rating", "users_rated"
                        )
                        for part in ("model_name", "model_version", "experiment")
                    },
                    "score_ts": base + timedelta(days=job),
                    "source_environment": "prod",
                }
            )
    predictions_landing = spark.createDataFrame(pred_rows, schemas.ML_PREDICTIONS_LANDING)

    emb_rows = []
    for gid in range(1, n_games + 1):
        for version in (1, 2):  # two embedding versions → latest-version filter
            vec = [round(rng.uniform(-1, 1), 6) for _ in range(8)]
            emb_rows.append(
                {
                    "game_id": gid,
                    "name": f"Game {gid}",
                    "year_published": 2000,
                    "embedding": vec,
                    "embedding_8": vec,
                    "embedding_16": vec + vec,
                    "embedding_32": vec * 4,
                    "embedding_model": "m",
                    "embedding_version": version,
                    "embedding_dim": 8,
                    "algorithm": "alg",
                    "created_ts": base + timedelta(days=version),
                    "job_id": f"emb-{version}",
                }
            )
    game_embeddings = spark.createDataFrame(emb_rows, schemas.GAME_EMBEDDINGS_LANDING)

    coord_rows = [
        {
            "game_id": gid,
            "umap_1": round(rng.uniform(-5, 5), 4),
            "umap_2": round(rng.uniform(-5, 5), 4),
            "pca_1": round(rng.uniform(-2, 2), 4),
            "pca_2": round(rng.uniform(-2, 2), 4),
            "embedding_model": "m",
            "embedding_version": version,
            "created_ts": base + timedelta(days=version),
        }
        for gid in range(1, n_games + 1)
        for version in (1, 2)
        if gid % 13 != 0  # some games without coordinates → NULL-struct case
    ]
    game_coordinates = spark.createDataFrame(coord_rows, schemas.GAME_COORDINATES_LANDING)

    coll_rows = []
    for user in ("alice", "bob"):
        for gid in range(1, 20):
            for ver in ("v1", "v2"):
                coll_rows.append(
                    {
                        "username": user,
                        "game_id": gid,
                        "outcome": "own",
                        "predicted_prob": round(rng.random(), 4),
                        "predicted_label": rng.random() > 0.5,
                        "threshold": 0.5,
                        "model_name": "coll",
                        "model_version": ver,
                        "score_ts": base + timedelta(days=1 if ver == "v1" else 2),
                        "job_id": f"c-{ver}",
                    }
                )
    collection_predictions = spark.createDataFrame(
        coll_rows, schemas.COLLECTION_PREDICTIONS_LANDING
    )
    registry_rows = [
        {
            "username": "alice", "outcome": "own", "model_version": "v2",
            "finalize_through_year": 2026, "registered_at": base, "status": "active",
        },
        {
            "username": "alice", "outcome": "own", "model_version": "v1",
            "finalize_through_year": 2025, "registered_at": base, "status": "retired",
        },
        {
            "username": "bob", "outcome": "own", "model_version": "v1",
            "finalize_through_year": 2026, "registered_at": base, "status": "active",
        },
    ]
    models_registry = spark.createDataFrame(registry_rows, schemas.COLLECTION_MODELS_REGISTRY)

    return {
        "games": games,
        **dims,
        **bridges,
        "player_counts": player_counts,
        "ml_predictions_landing": predictions_landing,
        "game_embeddings": game_embeddings,
        "description_embeddings": game_embeddings,
        "game_coordinates": game_coordinates,
        "collection_predictions_landing": collection_predictions,
        "collection_models_registry": models_registry,
    }
