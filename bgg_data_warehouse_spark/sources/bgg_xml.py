"""BGG XML-response flattener: raw payload strings → 22 normalized tables.

Reference semantics: `/root/reference/src/data_processor/processor.py` —
`process_game` (`:300-398`) flattens one xmltodict payload to a typed flat
dict; `prepare_for_bigquery` (`:400-617`) fans out to per-table frames
with set-based dedup (`:490-522`); `validate_data` (`:619-710`) enforces
PK uniqueness. Value-parsing rules mirrored here:

- int/float attributes parse with 0 defaults on malformed input
  (`processor.py:13-57`);
- ``year_published`` keeps only digit-strings and treats ``"0"`` as null
  (`processor.py:102-164`, `tests/test_processor.py:162-190`);
- rank ``"Not Ranked"`` → null (`tests/test_processor.py`);
- ``name``/``link``/``poll``/``rank`` appear as dict OR list OR bare
  string — all variants accepted (`tests/test_processor.py:17-108`);
- implementations flagged ``@inbound="true"`` are excluded from
  ``game_implementations`` (`tests/test_processor.py:59-108`);
- payloads are JSON or python-literal dict strings; empty/unparseable
  payloads produce no rows (`response_processor.py:255-265`).

Spark shape: ONE ``mapInPandas`` pass normalizes the semi-structured
variants into a wide typed row per game (Python is unavoidable for
dict-vs-list variant handling; it crosses once, Arrow-batched). Every
downstream table is then a pure-Column explode/projection — the
multi-output fan-out (A9) stays declarative and shuffle-free, and the 22
extractions share the single parsed scan.
"""

from __future__ import annotations

import ast
import json
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LINK_TYPE_TO_BRIDGE = {
    "boardgamecategory": ("game_categories", "category_id", "categories"),
    "boardgamemechanic": ("game_mechanics", "mechanic_id", "mechanics"),
    "boardgamefamily": ("game_families", "family_id", "families"),
    "boardgamedesigner": ("game_designers", "designer_id", "designers"),
    "boardgameartist": ("game_artists", "artist_id", "artists"),
    "boardgamepublisher": ("game_publishers", "publisher_id", "publishers"),
    "boardgameimplementation": ("game_implementations", "implementation_id", None),
    "boardgameexpansion": ("game_expansions", "expansion_id", None),
}

PARSED_SCHEMA = """
    game_id long, type string, primary_name string, year_published long,
    min_players long, max_players long, playing_time long, min_playtime long,
    max_playtime long, min_age long, description string, thumbnail string,
    image string, users_rated long, average_rating double, bayes_average double,
    standard_deviation double, median_rating double, owned_count long,
    trading_count long, wanting_count long, wishing_count long,
    num_comments long, num_weights long, average_weight double,
    names array<struct<name_type: string, value: string, sort_index: long>>,
    links array<struct<link_type: string, link_id: long, value: string, inbound: boolean>>,
    player_counts array<struct<player_count: string, best_votes: long,
                               recommended_votes: long, not_recommended_votes: long>>,
    language_dependence array<struct<level: long, description: string, votes: long>>,
    suggested_ages array<struct<age: string, votes: long>>,
    ranks array<struct<ranking_type: string, ranking_name: string,
                       friendly_name: string, value: long, bayes_average: double>>
"""


def _as_list(v: Any) -> list:
    """BGG XML collapses single-element lists to dicts; re-expand."""
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def _safe_int(v: Any, default: int | None = 0) -> int | None:
    try:
        return int(float(v))
    except (TypeError, ValueError):
        return default


def _safe_float(v: Any, default: float | None = 0.0) -> float | None:
    try:
        return float(v)
    except (TypeError, ValueError):
        return default


def _attr_int(d: Any, default: int | None = 0) -> int | None:
    return _safe_int(d.get("@value") if isinstance(d, dict) else None, default)


def _attr_float(d: Any, default: float | None = 0.0) -> float | None:
    return _safe_float(d.get("@value") if isinstance(d, dict) else None, default)


def _parse_year(d: Any) -> int | None:
    # digits-only guard; year 0 means unknown (processor.py year edge cases)
    raw = d.get("@value") if isinstance(d, dict) else None
    if not isinstance(raw, str) or not raw.lstrip("-").isdigit():
        return None
    y = int(raw)
    return None if y == 0 else y


def parse_payload(payload: str) -> list[dict]:
    """One raw response string → list of parsed game dicts (usually one)."""
    if payload is None or not payload.strip():
        return []
    try:
        doc = json.loads(payload)
    except (ValueError, TypeError):
        try:  # legacy python-dict-literal payloads (F16)
            doc = ast.literal_eval(payload)
        except (ValueError, SyntaxError):
            return []
    if not isinstance(doc, dict):
        return []
    items = doc.get("items") or {}
    out = []
    for item in _as_list(items.get("item")):
        if not isinstance(item, dict) or "@id" not in item:
            continue
        out.append(_parse_item(item))
    return out


def _parse_item(item: dict) -> dict:
    names = []
    for n in _as_list(item.get("name")):
        if isinstance(n, str):
            names.append({"name_type": "primary", "value": n, "sort_index": None})
        elif isinstance(n, dict):
            names.append(
                {
                    "name_type": n.get("@type", "primary"),
                    "value": n.get("@value"),
                    "sort_index": _safe_int(n.get("@sortindex"), None),
                }
            )
    primary = next((n["value"] for n in names if n["name_type"] == "primary"), None)
    if primary is None and names:
        primary = names[0]["value"]

    links = [
        {
            "link_type": ln.get("@type"),
            "link_id": _safe_int(ln.get("@id"), None),
            "value": ln.get("@value"),
            "inbound": str(ln.get("@inbound", "")).lower() == "true",
        }
        for ln in _as_list(item.get("link"))
        if isinstance(ln, dict)
    ]

    player_counts, lang_dep, ages = [], [], []
    for poll in _as_list(item.get("poll")):
        if not isinstance(poll, dict):
            continue
        pname = poll.get("@name")
        results = poll.get("results")
        if pname == "suggested_numplayers":
            for res in _as_list(results):
                if not isinstance(res, dict):
                    continue
                votes = {"Best": 0, "Recommended": 0, "Not Recommended": 0}
                for r in _as_list(res.get("result")):
                    if isinstance(r, dict) and r.get("@value") in votes:
                        votes[r["@value"]] = _safe_int(r.get("@numvotes"), 0)
                player_counts.append(
                    {
                        "player_count": res.get("@numplayers"),
                        "best_votes": votes["Best"],
                        "recommended_votes": votes["Recommended"],
                        "not_recommended_votes": votes["Not Recommended"],
                    }
                )
        elif pname == "language_dependence":
            for res in _as_list(results):
                for r in _as_list(res.get("result") if isinstance(res, dict) else None):
                    if isinstance(r, dict):
                        lang_dep.append(
                            {
                                "level": _safe_int(r.get("@level"), None),
                                "description": r.get("@value"),
                                "votes": _safe_int(r.get("@numvotes"), 0),
                            }
                        )
        elif pname == "suggested_playerage":
            for res in _as_list(results):
                for r in _as_list(res.get("result") if isinstance(res, dict) else None):
                    if isinstance(r, dict) and r.get("@value") is not None:
                        ages.append(
                            {"age": str(r.get("@value")), "votes": _safe_int(r.get("@numvotes"), 0)}
                        )

    stats = item.get("statistics") or {}
    ratings = stats.get("ratings") if isinstance(stats, dict) else {}
    ratings = ratings if isinstance(ratings, dict) else {}
    ranks = []
    ranks_node = ratings.get("ranks") or {}
    for rk in _as_list(ranks_node.get("rank") if isinstance(ranks_node, dict) else None):
        if not isinstance(rk, dict):
            continue
        value = rk.get("@value")
        ranks.append(
            {
                "ranking_type": rk.get("@type"),
                "ranking_name": rk.get("@name"),
                "friendly_name": rk.get("@friendlyname"),
                # "Not Ranked" → null, never 0
                "value": _safe_int(value, None) if value != "Not Ranked" else None,
                "bayes_average": _safe_float(rk.get("@bayesaverage"), None),
            }
        )

    return {
        "game_id": _safe_int(item.get("@id"), None),
        "type": item.get("@type"),
        "primary_name": primary,
        "year_published": _parse_year(item.get("yearpublished")),
        "min_players": _attr_int(item.get("minplayers")),
        "max_players": _attr_int(item.get("maxplayers")),
        "playing_time": _attr_int(item.get("playingtime")),
        "min_playtime": _attr_int(item.get("minplaytime")),
        "max_playtime": _attr_int(item.get("maxplaytime")),
        "min_age": _attr_int(item.get("minage")),
        "description": item.get("description"),
        "thumbnail": item.get("thumbnail"),
        "image": item.get("image"),
        "users_rated": _attr_int(ratings.get("usersrated")),
        "average_rating": _attr_float(ratings.get("average")),
        "bayes_average": _attr_float(ratings.get("bayesaverage")),
        "standard_deviation": _attr_float(ratings.get("stddev")),
        "median_rating": _attr_float(ratings.get("median")),
        "owned_count": _attr_int(ratings.get("owned")),
        "trading_count": _attr_int(ratings.get("trading")),
        "wanting_count": _attr_int(ratings.get("wanting")),
        "wishing_count": _attr_int(ratings.get("wishing")),
        "num_comments": _attr_int(ratings.get("numcomments")),
        "num_weights": _attr_int(ratings.get("numweights")),
        "average_weight": _attr_float(ratings.get("averageweight")),
        "names": names,
        "links": links,
        "player_counts": player_counts,
        "language_dependence": lang_dep,
        "suggested_ages": ages,
        "ranks": ranks,
    }


def parse_responses(raw_responses: DataFrame) -> DataFrame:
    """raw_responses(response_data, ...) → one wide parsed row per game."""

    cols = [
        "game_id", "type", "primary_name", "year_published", "min_players",
        "max_players", "playing_time", "min_playtime", "max_playtime",
        "min_age", "description", "thumbnail", "image", "users_rated",
        "average_rating", "bayes_average", "standard_deviation",
        "median_rating", "owned_count", "trading_count", "wanting_count",
        "wishing_count", "num_comments", "num_weights", "average_weight",
        "names", "links", "player_counts", "language_dependence",
        "suggested_ages", "ranks",
    ]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for payload in pdf["response_data"]:
                rows.extend(parse_payload(payload))
            yield pd.DataFrame(rows, columns=cols)

    return raw_responses.select("response_data").mapInPandas(batches, PARSED_SCHEMA)


# --- multi-output fan-out (A9): parsed wide rows → normalized tables ------


def games_table(parsed: DataFrame, load_timestamp) -> DataFrame:
    scalar_cols = [
        "game_id", "type", "primary_name", "year_published", "min_players",
        "max_players", "playing_time", "min_playtime", "max_playtime",
        "min_age", "description", "thumbnail", "image", "users_rated",
        "average_rating", "bayes_average", "standard_deviation",
        "median_rating", "owned_count", "trading_count", "wanting_count",
        "wishing_count", "num_comments", "num_weights", "average_weight",
    ]
    return (
        parsed.select(*scalar_cols)
        # a batch may contain the same game twice (re-fetch); the PK is
        # (game_id, load_timestamp) and the batch shares one load ts, so
        # keep a single row per game per batch
        .dropDuplicates(["game_id"])
        .withColumn("load_timestamp", F.lit(load_timestamp).cast("timestamp"))
    )


def _links_of(parsed: DataFrame, link_type: str) -> DataFrame:
    return parsed.select(
        "game_id", F.explode("links").alias("ln")
    ).where(F.col("ln.link_type") == link_type)


def dimension_table(parsed: DataFrame, link_type: str, id_col: str) -> DataFrame:
    """Entity dedup across games (processor set-dedup `:490-522`)."""
    return (
        _links_of(parsed, link_type)
        .select(F.col("ln.link_id").alias(id_col), F.col("ln.value").alias("name"))
        .dropDuplicates([id_col])
    )


def bridge_table(parsed: DataFrame, link_type: str, other_id: str) -> DataFrame:
    df = _links_of(parsed, link_type)
    if link_type == "boardgameimplementation":
        df = df.where(~F.col("ln.inbound"))  # outbound only
    return df.select(
        "game_id", F.col("ln.link_id").alias(other_id)
    ).dropDuplicates(["game_id", other_id])


def _exploded(parsed: DataFrame, arr: str, fields: list[str]) -> DataFrame:
    return parsed.select("game_id", F.explode(arr).alias("x")).select(
        "game_id", *[F.col(f"x.{f}").alias(f) for f in fields]
    )


def normalize(parsed: DataFrame, load_timestamp) -> dict[str, DataFrame]:
    """The 22-table fan-out from one parsed scan."""
    out: dict[str, DataFrame] = {"games": games_table(parsed, load_timestamp)}
    for link_type, (bridge, other_id, dim) in LINK_TYPE_TO_BRIDGE.items():
        out[bridge] = bridge_table(parsed, link_type, other_id)
        if dim is not None:
            id_col = other_id
            out[dim] = dimension_table(parsed, link_type, id_col)
    out["player_counts"] = _exploded(
        parsed,
        "player_counts",
        ["player_count", "best_votes", "recommended_votes", "not_recommended_votes"],
    ).dropDuplicates(["game_id", "player_count"])
    out["language_dependence"] = _exploded(
        parsed, "language_dependence", ["level", "description", "votes"]
    ).dropDuplicates(["game_id", "level"])
    out["suggested_ages"] = _exploded(
        parsed, "suggested_ages", ["age", "votes"]
    ).dropDuplicates(["game_id", "age"])
    out["alternate_names"] = (
        parsed.select("game_id", F.explode("names").alias("n"))
        .where(F.col("n.name_type") == "alternate")
        .select(
            "game_id",
            F.col("n.value").alias("name"),
            F.col("n.sort_index").alias("sort_index"),
        )
        .dropDuplicates(["game_id", "name"])
    )
    out["rankings"] = (
        _exploded(
            parsed,
            "ranks",
            ["ranking_type", "ranking_name", "friendly_name", "value", "bayes_average"],
        )
        .withColumn("load_timestamp", F.lit(load_timestamp).cast("timestamp"))
        .dropDuplicates(["game_id", "ranking_type", "ranking_name"])
    )
    return out


def validate_pk_unique(df: DataFrame, keys: list[str]) -> bool:
    """A10 PK-uniqueness validation (processor.py:667-704)."""
    return df.groupBy(*keys).count().where(F.col("count") > 1).isEmpty()
