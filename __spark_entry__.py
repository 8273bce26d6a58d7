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
# order. Round 5 rotation (VERDICT r04 "Next round" #6): keep the four
# events sentinels + the two sketch-twin anchors, keep the seven round-4
# newcomers for one confirmation round, promote the two NEW round-5
# capabilities (bpe_learn_encode, semantic_dedup), keep doc_vector_knn
# (still under perf work) hash-gated in-window, rotate TPC-H q1-q5/
# q18-q22 OUT for q6-q17, and fill the remaining 22 slots with
# r2-vintage greens whose gating code hasn't had a driver row since
# round 2 (refreshing the oldest lifetime evidence).
_PRIORITY = [
    # events-adapter regression sentinels (green r3+r4, keep in-window)
    "latest_snapshot",
    "semi_scoped_agg",
    "watermark_increment",
    "hourly_event_rollup",
    # sketch-twin anchors (regression sentinels)
    "dedup_minhash_verified",
    "knn_ivf_exact",
    # round-4 newcomers — one confirmation round (r4-green)
    "multimodal_png_features",
    "multimodal_video_frames",
    "bigram_perplexity",
    "weighted_sample",
    "leakage_safe_split",
    "dedup_minhash_incremental",
    "vocab_encode",
    # NEW round 5: BPE merge-learning tokenizer (model + encodings
    # hash-gated), SemDeDup (kmeans + within-cluster near-dup prune),
    # Naive Bayes language classification, α=0.5 temperature mixing
    "bpe_learn_encode",
    "semantic_dedup",
    "nb_lang_classify",
    "temperature_mix",
    "knn_quantized",
    "trigram_backoff_ppl",
    "inverted_index",
    "profile_documents",
    "weighted_sample_stratified",
    # perf-work target this round — plan changes must stay hash-gated
    "doc_vector_knn",
    # TPC-H rotation: q6-q17 back in (q1-q5/q18-q22 r4-confirmed, out)
    *[f"tpch_q{i}" for i in range(6, 18)],
    # r2-vintage refresh: last driver row was round 2; gating code
    # unchanged, but lifetime evidence is oldest here
    "curation_pipeline",
    "anti_join_pending",
    "latest_version_dedup",
    "staleness_bands",
    "dedup_exact",
    "point_lookup",
    "merge_insert_missing",
    "delete_insert_refresh",
    "band_self_join_knn",
    "knn_bruteforce",
    "ngram_jaccard",
    "fuzzy_match_parts",
    "substring_dedup",
    "dedup_cluster_collapse",
    "components_star_chains",
    # ---- position 51+: r3/r4-confirmed, next-up if the driver widens
    "doc_fingerprint",
    "nested_profile",
    "feature_arrays",
    "dual_rank_topk",
    "filter_topn",
    "ratio_guarded",
    "union_discriminated",
    *[f"tpch_q{i}" for i in range(1, 6)],
    *[f"tpch_q{i}" for i in range(18, 23)],
    "multimodal_features",
    "request_stats",
    "sessionize",
    "pivot_status_counts",
    "rollup_returns",
    "cube_order_stats",
    "grouping_sets_stats",
    "value_percentiles",
    "distinct_users_exact",
    "trailing_window_sum",
    "ntile_value_buckets",
    "regexp_json_extract",
    "asof_feature_join",
    "asof_feature_join_segmented",
    "range_join_recent_activity",
    "knn_lsh_exact",
    "kmeans_embeddings",
    "pagerank_bipartite",
    "bm25_search",
    "top_ngrams",
    "multimodal_frame_sample",
    "dedup_simhash_verified",
    "embedding_near_dup_exact",
    "content_hash_portable",
    "multimodal_resize",
    "multimodal_audio_features",
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
