"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship latest-snapshot query (the reference's
core W1 pattern — games_active) at sf0.001. ``queries()`` exposes every
implemented operator from SURVEY.md §2 plus the LLM-pipeline extensions;
``oracle_sql()`` gives the DuckDB-equivalent SQL for everything
ANSI-expressible (sketch/ANN ops are rows-only by design).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bgg_data_warehouse_spark import tpch  # noqa: F401 — registers Q2/Q7-Q22
from bgg_data_warehouse_spark import workload


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workload.QUERIES["latest_snapshot"](spark, "/root/testdata/sf0.001")


# The driver's correctness harness grades the FIRST 50 queries in dict
# order. Round 2 left 43 of 93 unverified (VERDICT r02 "What's wrong" #2),
# so ordering is explicit: previously-red events queries first, then the
# r01 hash-red trio, then everything that has never had a driver check
# (analytic SQL, as-of/range joins, graph/IR ops, all 22 TPC-H), then
# three high-value green anchors; the long tail of r02-green gates last.
_PRIORITY = [
    # previously red (events ts encoding bug, fixed in sources/tables.py)
    "latest_snapshot",
    "semi_scoped_agg",
    "watermark_increment",
    "hourly_event_rollup",
    # r01 hash-red, fixes never driver-verified
    "request_stats",
    "sessionize",
    "pivot_status_counts",
    # analytic SQL, never driver-verified
    "rollup_returns",
    "cube_order_stats",
    "grouping_sets_stats",
    "value_percentiles",
    "distinct_users_exact",
    "trailing_window_sum",
    "ntile_value_buckets",
    "regexp_json_extract",
    # temporal joins, never driver-verified
    "asof_feature_join",
    "asof_feature_join_segmented",
    "range_join_recent_activity",
    # ANN / graph / IR, never driver-verified
    "knn_lsh_exact",
    "doc_vector_knn",
    "kmeans_embeddings",
    "pagerank_bipartite",
    "bm25_search",
    "top_ngrams",
    "multimodal_frame_sample",
    # all 22 TPC-H, never driver-verified
    *[f"tpch_q{i}" for i in range(1, 23)],
    # newly exact-gated this round (real PPM decode path)
    "multimodal_features",
    # green anchors (regression sentinels from r02)
    "dedup_minhash_verified",
    "knn_ivf_exact",
    # position 51+: next-up if the driver widens its window
    "dedup_simhash_verified",
    "embedding_near_dup_exact",
    "content_hash_portable",
    "multimodal_resize",
    "multimodal_audio_features",
    "curation_pipeline",
]


def _ordered(d: dict) -> dict:
    # Names missing from the registry are skipped rather than asserted:
    # a stale priority entry must degrade the ordering, never crash the
    # driver's import of this module.
    head = {n: d[n] for n in _PRIORITY if n in d}
    tail = {n: v for n, v in d.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(workload.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(workload.ORACLES))
