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
# order. Round 6 rotation (no r5 VERDICT issued; follows the standing
# pattern): keep the four events sentinels + the two sketch-twin
# anchors; promote the TWELVE new round-6 capabilities; keep in-window
# the two queries whose gating code changed this round
# (temperature_mix — double-denominator overflow fix mirrored in its
# oracle; doc_vector_knn — forced norms broadcast dropped for AQE);
# give the remaining round-5 newcomers their one confirmation round;
# rotate TPC-H q1-q5/q18-q22 back in (q6-q17 r5-confirmed, out); and
# fill the last 12 slots with the stalest oracle-gated queries (no
# driver row since r2/r3).
_PRIORITY = [
    # events-adapter regression sentinels (green r3+r4+r5, keep)
    "latest_snapshot",
    "semi_scoped_agg",
    "watermark_increment",
    "hourly_event_rollup",
    # sketch-twin anchors (regression sentinels)
    "dedup_minhash_verified",
    "knn_ivf_exact",
    # NEW round 6: DSIR importance selection, count-min heavy hitters,
    # bloom-pruned join, Gopher rule verdicts, corpus KL drift,
    # z-order layout keys, priority-survivorship dedup, token budget,
    # one-shuffle funnel, exact centroids, checksum manifest, skew report
    "dsir_importance",
    "cms_heavy_hitters",
    "bloom_pruned_join",
    "gopher_quality_rules",
    "corpus_kl_shift",
    "zorder_layout",
    "dedup_keep_best",
    "token_budget_report",
    "funnel_steps",
    "label_centroids",
    "table_checksum_manifest",
    "join_skew_report",
    # NEW round 6 (second batch): CDC change-log replay, hypertable
    # gap-fill + interpolation, equi-depth optimizer stats,
    # entity-resolution golden records
    "cdc_upsert",
    "gapfill_interpolate",
    "equidepth_histogram",
    "entity_resolution",
    "sliding_window_distinct",
    "winsorize_robust",
    "mv_incremental_refresh",
    "holt_trend_forecast",
    "wordpiece_encode",
    "ann_recall_eval",
    "retention_cohorts",
    "ab_test_eval",
    "corr_matrix",
    # gating code CHANGED this round — must stay hash-gated in-window
    "temperature_mix",
    "doc_vector_knn",
    # round-5 newcomers — one confirmation round (r5-green)
    "bpe_learn_encode",
    "semantic_dedup",
    "nb_lang_classify",
    "knn_quantized",
    "trigram_backoff_ppl",
    "inverted_index",
    "profile_documents",
    # TPC-H rotation: q1-q5/q18-q22 back in (q6-q17 r5-confirmed, out)
    *[f"tpch_q{i}" for i in range(1, 6)],
    *[f"tpch_q{i}" for i in range(18, 23)],
    # ---- position 51+: next-up if the driver widens; the remaining
    # r2/r3-vintage entries lead so they rotate in next round
    # (weighted_sample_stratified r5-green and unchanged, yields its
    # confirmation slot to the round-6 additions)
    "weighted_sample_stratified",
    "benchmark_contamination",
    "chunk_documents",
    "doc_fingerprint",
    "dual_rank_topk",
    "except_intersect_keys",
    "feature_arrays",
    "filter_topn",
    "full_outer_reconcile",
    "lang_id",
    "mix_sources",
    "nested_profile",
    "pack_sequences",
    "pii_redact",
    "quality_score",
    "ratio_guarded",
    "repetition_stats",
    "salted_join_revenue",
    "scd2_intervals",
    "split_assign",
    "stratified_sample",
    "token_count",
    "union_discriminated",
    *[f"tpch_q{i}" for i in range(6, 18)],
    "multimodal_png_features",
    "multimodal_video_frames",
    "bigram_perplexity",
    "weighted_sample",
    "leakage_safe_split",
    "dedup_minhash_incremental",
    "vocab_encode",
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
