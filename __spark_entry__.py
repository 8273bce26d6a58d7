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
# order. Round 4 rotation (VERDICT r03 "Next round" #1): promote the five
# exact-gated queries that have never appeared in a CORRECTNESS artifact
# (dedup_simhash_verified, embedding_near_dup_exact, content_hash_portable,
# multimodal_resize, multimodal_audio_features) into the window, demoting
# five round-3-confirmed mid-list TPC-H entries (q8-q12) to positions 51+.
# The events-adapter sentinels (latest_snapshot, semi_scoped_agg,
# watermark_increment, hourly_event_rollup) and the sketch-twin anchors
# (dedup_minhash_verified, knn_ivf_exact) stay in-window as regression
# guards; the perf-work targets of this round (pagerank_bipartite,
# doc_vector_knn, dedup_cluster_collapse via its minhash anchor) also stay
# so their plan changes remain hash-gated by the driver.
_PRIORITY = [
    # events-adapter regression sentinels (r03-green, keep in-window)
    "latest_snapshot",
    "semi_scoped_agg",
    "watermark_increment",
    "hourly_event_rollup",
    # r01 hash-red trio, first driver-confirmed in r03 — keep as sentinels
    "request_stats",
    "sessionize",
    "pivot_status_counts",
    # analytic SQL (r03-green)
    "rollup_returns",
    "cube_order_stats",
    "grouping_sets_stats",
    "value_percentiles",
    "distinct_users_exact",
    "trailing_window_sum",
    "ntile_value_buckets",
    "regexp_json_extract",
    # temporal joins (r03-green)
    "asof_feature_join",
    "asof_feature_join_segmented",
    "range_join_recent_activity",
    # ANN / graph / IR (r03-green; pagerank + doc_vector under perf work
    # this round, so their hash gates must stay in the driver window)
    "knn_lsh_exact",
    "doc_vector_knn",
    "kmeans_embeddings",
    "pagerank_bipartite",
    "bm25_search",
    "top_ngrams",
    "multimodal_frame_sample",
    # never driver-verified exact gates — the round-4 promotion set
    "dedup_simhash_verified",
    "embedding_near_dup_exact",
    "content_hash_portable",
    "multimodal_resize",
    "multimodal_audio_features",
    # new this round: stdlib PNG decode + real Y4M video decode gates
    # (demote tpch_q6/q7)
    "multimodal_png_features",
    "multimodal_video_frames",
    # new this round: bigram-LM perplexity scoring, deterministic
    # weighted sampling, cluster-aware leakage-safe split, incremental
    # batch-vs-index dedup, vocab id-encoding (demote tpch_q13-q17)
    "bigram_perplexity",
    "weighted_sample",
    "leakage_safe_split",
    "dedup_minhash_incremental",
    "vocab_encode",
    # TPC-H minus the demoted q6-q17 (all 22 r03-green)
    *[f"tpch_q{i}" for i in range(1, 6)],
    *[f"tpch_q{i}" for i in range(18, 23)],
    # real-decode multimodal gate (r03-green)
    "multimodal_features",
    # sketch-twin anchors (regression sentinels)
    "dedup_minhash_verified",
    "knn_ivf_exact",
    # position 51+: double-confirmed or next-up if the driver widens
    *[f"tpch_q{i}" for i in range(6, 18)],
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
