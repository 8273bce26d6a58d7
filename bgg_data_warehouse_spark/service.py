"""Read-service routing contract — the warehouse API without the web framework.

The reference serves its readers through a FastAPI shell
(`/root/reference/services/warehouse_api/main.py:18-25`,
`routers/games.py:22-86`). The HTTP transport is out of engine scope
(SURVEY §2), but the ROUTING CONTRACT is not: which endpoints 404 on a
missing game, which serve 200/null for an absent optional block, how
tuning params pass through, and how allow-list violations become caller
errors (400) instead of crashes (500). This module implements that
contract as a pure function — ``handle(reader, method, path, params) ->
(status, body)`` — so it is testable here and mountable under any HTTP
shell (FastAPI/Flask/etc.) unchanged.

Contract, mirroring `routers/games.py`:

- ``GET /health``                         → 200 ``{"status": "ok"}``
- ``GET /games/{id}``                     → 404 when no profile document
- ``GET /games/{id}/features``            → 404 when unknown game
- ``GET /games/{id}/players``             → 200 list (empty for unknown);
  reads player_count_recommendations ONLY — never a games_features scan
- ``GET /games/{id}/predictions``         → 200, null body allowed
- ``GET /games/{id}/embedding``           → 200, null body allowed
- ``GET /games/{id}/provenance``          → 200 list
- ``GET /games/{id}/similar``             → two-tier dispatch: no tuning
  params → precomputed; any of n/metric/dims/min_ratings → live; bad
  metric/dims → 400 (ValueError is a caller error, not a bug)
- unknown path                            → 404, non-integer id → 404,
  non-GET → 405
"""

from __future__ import annotations

import re

_GAME_ROUTE = re.compile(r"^/games/(?P<game_id>-?\d+)(?:/(?P<sub>[a-z]+))?$")

# query-param name -> parser; applied before dispatch so a malformed value
# (n=abc) is a 400, mirroring FastAPI's type-validation layer
_SIMILAR_PARAMS = {
    "n": int,
    "metric": str,
    "dims": int,
    "min_ratings": int,
    "profile": str,  # selects a precomputed profile; exclusive with tuning
}


def handle(reader, method: str, path: str, params: dict | None = None):
    """Route one request against a GameReader; returns (status, body)."""
    params = params or {}
    if method.upper() != "GET":
        return 405, {"detail": "method not allowed"}
    if path == "/health":
        return 200, {"status": "ok"}

    m = _GAME_ROUTE.match(path)
    if not m:
        return 404, {"detail": "not found"}
    game_id = int(m.group("game_id"))
    sub = m.group("sub")

    if sub is None:
        doc = reader.get_game(game_id)
        return (200, doc) if doc is not None else _missing(game_id)
    if sub == "features":
        doc = reader.get_features(game_id)
        return (200, doc) if doc is not None else _missing(game_id)
    if sub == "players":
        return 200, reader.get_player_counts(game_id)
    if sub == "predictions":
        return 200, reader.get_predictions(game_id)
    if sub == "embedding":
        return 200, reader.get_embedding(game_id)
    if sub == "provenance":
        return 200, reader.get_provenance(game_id)
    if sub == "similar":
        try:
            kwargs = {
                name: (cast(params[name]) if name in params else None)
                for name, cast in _SIMILAR_PARAMS.items()
            }
        except (TypeError, ValueError):
            return 400, {"detail": "malformed tuning parameter"}
        try:
            return 200, reader.get_similar(game_id, **kwargs)
        except ValueError as exc:  # allow-list violation — caller error
            return 400, {"detail": str(exc)}
    return 404, {"detail": "not found"}


def _missing(game_id: int):
    return 404, {"detail": f"game {game_id} not found"}
