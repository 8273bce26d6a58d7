"""Read-API composition (R1–R3): point documents + two-tier similarity.

Mirrors `/root/reference/src/warehouse/readers/games.py`:

- ``get_game`` (`:253-289`): profile row + precomputed neighbors composed
  into one document; None when no profile row (the router's 404).
- ``get_similar`` (`:134-225`): no tuning params → precomputed
  ``game_neighbors`` lookup; any param → live query with allow-listed
  metric/dims (R2 dispatch), filtered BEFORE distance+rank.
- block readers (`:55-131`) project explicit columns, never SELECT *.

Point lookups filter on both ``game_id_bucket`` and ``game_id`` so the
bucket-partitioned profile layout (io.py) prunes to one directory — the
reference's RANGE_BUCKET 273.5 MB → 1.9 MB result.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.vector import cosine_similarity, dot_product, euclidean_distance

ALLOWED_METRICS = ("cosine", "euclidean", "dot")
ALLOWED_DIMS = (8, 16, 32, 64)


@dataclass
class GameReader:
    """Readers over the built analytics tables (a dict name → DataFrame —
    parquet-backed via io.read_table or in-memory from the DAG runner)."""

    tables: dict[str, DataFrame]

    def _profile_row(self, game_id: int):
        prof = self.tables["game_profile"]
        rows = (
            prof.where(
                (F.col("game_id_bucket") == game_id // 1000)
                & (F.col("game_id") == game_id)
            )
            .limit(1)
            .collect()
        )
        return rows[0] if rows else None

    def get_game(self, game_id: int) -> dict | None:
        """R1 point document; None → caller's 404."""
        row = self._profile_row(game_id)
        if row is None:
            return None
        doc = row.asDict(recursive=True)
        similar = doc.pop("similar", []) or []
        doc["similar"] = similar
        return doc

    def get_features(self, game_id: int) -> dict | None:
        """R3 block reader — explicit columns only (no SELECT *); carries
        the per-player-count block like the reference's ``get_features``
        (`readers/games.py:83-91`)."""
        rows = (
            self.tables["games_features"]
            .select("game_id", "name", "categories", "mechanics", "complexity", "geek_rating")
            .where(F.col("game_id") == game_id)
            .limit(1)
            .collect()
        )
        if not rows:
            return None
        doc = rows[0].asDict(recursive=True)
        doc["player_counts"] = self.get_player_counts(game_id)
        return doc

    def get_player_counts(self, game_id: int) -> list[dict]:
        """Per-player-count rows, read from ``player_count_recommendations``
        ONLY (`readers/games.py:67-81`) — ``/players`` must never pay for a
        games_features scan. Empty list for an unknown game."""
        rows = (
            self.tables["player_count_recommendations"]
            .where(F.col("game_id") == game_id)
            .orderBy("player_count")
            .collect()
        )
        return [r.asDict() for r in rows]

    def get_predictions(self, game_id: int) -> dict | None:
        """Latest prediction row; None when the game has no prediction —
        a legitimate state, the router serves it as 200/null. This is the
        one reader that keeps SELECT * on purpose: the column set is owned
        by the ML pipeline (`readers/games.py:103-110`)."""
        rows = (
            self.tables["bgg_predictions"]
            .where(F.col("game_id") == game_id)
            .limit(1)
            .collect()
        )
        return rows[0].asDict(recursive=True) if rows else None

    def get_embedding(self, game_id: int) -> dict | None:
        """UMAP/PCA coordinates (`readers/games.py:120-131`); None if the
        game was never embedded."""
        rows = (
            self.tables["bgg_game_coordinates"]
            .select(
                "game_id", "umap_1", "umap_2", "pca_1", "pca_2",
                "embedding_model", "embedding_version", "created_ts",
            )
            .where(F.col("game_id") == game_id)
            .limit(1)
            .collect()
        )
        return rows[0].asDict(recursive=True) if rows else None

    def get_provenance(self, game_id: int) -> list[dict]:
        """Fetch-history provenance rows (`readers/games.py` PROVENANCE_COLUMNS),
        newest first."""
        rows = (
            self.tables["fetched_responses"]
            .select("record_id", "game_id", "fetch_timestamp", "fetch_status")
            .where(F.col("game_id") == game_id)
            .orderBy(F.col("fetch_timestamp").desc())
            .collect()
        )
        return [r.asDict() for r in rows]

    def get_similar(
        self,
        game_id: int,
        *,
        n: int | None = None,
        metric: str | None = None,
        dims: int | None = None,
        min_ratings: int | None = None,
        profile: str | None = None,
    ) -> list[dict]:
        """R2 two-tier dispatch: precomputed unless any tuning param set.

        The untuned path reads the ``game_neighbors`` table at the
        requested (or default) profile — the reference serves the common
        path from the ``(profile, game_id)``-clustered neighbors lookup
        (`definitions/game_neighbors.sqlx:4-8`, `readers/games.py:134-166`),
        so new profiles ship side-by-side and flip in by name without a
        rebuild of the serving document.

        DELIBERATE deviation from the reference: combining ``profile``
        with any tuning param raises ValueError (HTTP 400 at the
        service layer), where the reference's tuned path silently
        ignores ``profile`` (`src/warehouse/readers/games.py:144-174`).
        A request naming a precomputed list AND ad-hoc tuning knobs is
        contradictory — answering the tuned query under the profile's
        name would mislabel the result — so we reject it loudly. Pinned
        by tests/test_service.py (profile/tuning exclusivity) and
        listed in COVERAGE.md's deviation notes."""
        tuned = any(v is not None for v in (n, metric, dims, min_ratings))
        if not tuned:
            from .plans.models import DEFAULT_PROFILE

            nbrs = self.tables["game_neighbors"]
            # `is not None`, not truthiness: profile="" is an UNKNOWN
            # profile (empty result), not a request for the default
            wanted = profile if profile is not None else DEFAULT_PROFILE
            rows = (
                nbrs.where(
                    (F.col("profile") == wanted) & (F.col("game_id") == game_id)
                )
                .limit(1)
                .collect()
            )
            return [] if not rows else [s.asDict() for s in rows[0].similar]
        if profile is not None:
            raise ValueError("profile selects a precomputed list; it cannot combine with tuning params")
        if metric is not None and metric not in ALLOWED_METRICS:
            raise ValueError(f"metric must be one of {ALLOWED_METRICS}")
        if dims is not None and dims not in ALLOWED_DIMS:
            raise ValueError(f"dims must be one of {ALLOWED_DIMS}")
        return self._similar_live(
            game_id,
            n=n or 10,
            metric=metric or "cosine",
            dims=dims,
            min_ratings=min_ratings if min_ratings is not None else 100,
        )

    def _similar_live(self, game_id, *, n, metric, dims, min_ratings) -> list[dict]:
        """Live k-NN (J8 + O2): 1-row source broadcast-cross-joined to the
        pre-filtered corpus, distance, ORDER BY LIMIT n."""
        sim = self.tables["game_similarity_search"]
        vec_col = {8: "embedding_8", 16: "embedding_16", 32: "embedding_32"}.get(
            dims, "embedding"
        )
        if vec_col not in sim.columns:
            vec_col = "embedding"
        src = sim.where(F.col("game_id") == game_id).select(
            F.col(vec_col).alias("src_vec")
        )
        corpus = sim.where(
            (F.col("users_rated") >= min_ratings) & (F.col("game_id") != game_id)
        ).select("game_id", "name", F.col(vec_col).alias("vec"))
        joined = corpus.crossJoin(F.broadcast(src))
        if metric == "cosine":
            score = cosine_similarity(F.col("vec"), F.col("src_vec"))
            order = F.col("score").desc()
        elif metric == "dot":
            score = dot_product(F.col("vec"), F.col("src_vec"))
            order = F.col("score").desc()
        else:
            score = euclidean_distance(F.col("vec"), F.col("src_vec"))
            order = F.col("score").asc()
        rows = (
            joined.withColumn("score", score)
            .orderBy(order, F.col("game_id"))
            .limit(n)
            .select("game_id", "name", F.round("score", 6).alias("score"))
            .collect()
        )
        return [r.asDict() for r in rows]
