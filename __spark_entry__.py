"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship latest-snapshot query (the reference's
core W1 pattern — games_active) at sf0.001. ``queries()`` exposes every
implemented operator from SURVEY.md §2 plus the LLM-pipeline extensions;
``oracle_sql()`` covers ALL of them — exact gates replay the semantics
in ANSI SQL, and the sketch/ANN gates carry bounded-assert oracles
(recall floors / error contracts vs an SQL-replayed exact side), so
nothing in the registry is rows-only.
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
# order. Round 15 rotation (r14 VERDICT "Next round" #2; window and
# tail below emitted VERBATIM by tools/staleness.py from
# CORRECTNESS_r01-r14 plus the two gates registered this round):
#   - the 3 gates NEW this round, with no driver evidence yet:
#     loader_log_bridge / loader_log_dim (the S6/S7 loader write path
#     routed through the log-structured store, r14 VERDICT #1 — the
#     round's only weak mark) and mv_log_refresh (the logged
#     additive-MV maintainer, same delta-sized-write theme);
#   - tpch_q3, tpch_q4, tpch_q5, trigram_backoff_ppl, winsorize_robust,
#     zorder_layout — the ledger's only r10-evidence gates (displaced
#     from the r14 window by that round's two new gates, re-verified
#     green by the r14 judge, queued first here exactly as that verdict
#     directed);
#   - the first 41 of the 50 age-4 gates (last driver green: round 11,
#     acf_lags ... rolling_regression, alphabetical). The three new
#     gates push the window three past 50, so the LAST nine age-4
#     entries (set_similarity_join ... unigram_segment_compounds) head
#     the tail and refresh in round 16.
# With 209 registered gates and a 50-slot window the steady-state
# rotation cycle stays ~4 rounds; after this window every gate's
# latest driver-green row is round 11 or newer. The position-51+ queue
# is ordered by evidence age: the nine age-4 stragglers, then the
# age-3 block (refresh r16), then age-2, then age-1.
_PRIORITY = [
    "loader_log_bridge",
    "loader_log_dim",
    "mv_log_refresh",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "trigram_backoff_ppl",
    "winsorize_robust",
    "zorder_layout",
    "acf_lags",
    "ann_recall_eval",
    "approx_distinct_users",
    "aqp_sampled_agg",
    "association_rules",
    "attribution_last_touch",
    "bfs_reach",
    "bm25_search",
    "budget_allocation",
    "cc_incremental_delete",
    "cc_incremental_update",
    "cusum_drift",
    "decision_stump",
    "doc_vector_knn",
    "edge_support_topk",
    "embedding_near_dup_exact",
    "event_debounce",
    "event_transition_matrix",
    "feature_mi_ranking",
    "gini_concentration",
    "hits_scores",
    "holt_winters_seasonal",
    "hybrid_rrf_search",
    "inverted_index_incremental",
    "kcore_parts",
    "knn_bruteforce",
    "knn_ivf",
    "knn_lsh",
    "knn_lsh_exact",
    "mannwhitney_u",
    "merkle_table_root",
    "ols_trend",
    "pareto_frontier",
    "peak_concurrency",
    "pmi_collocations",
    "quantile_normalize",
    "quantile_sketch_merge",
    "quantile_sketch_query",
    "random_projection",
    "retrieval_pipeline",
    "rolling_regression",
    "set_similarity_join",
    "shard_manifest",
    "sorted_neighborhood_pairs",
    "survival_first_purchase",
    "target_encode_oof",
    "tfidf_keywords",
    "top_user_paths",
    "triangle_census",
    "unigram_segment_compounds",
    "approx_distinct_hll",
    "asof_feature_join",
    "asof_feature_join_segmented",
    "benchmark_contamination",
    "benford_digits",
    "chisq_independence",
    "chunk_documents",
    "cube_order_stats",
    "dedup_minhash_delete",
    "dedup_simhash_verified",
    "distinct_users_exact",
    "doc_fingerprint",
    "dual_rank_topk",
    "except_intersect_keys",
    "feature_arrays",
    "filter_topn",
    "fk_integrity_audit",
    "full_outer_reconcile",
    "grouping_sets_stats",
    "hll_set_ops",
    "ks_two_sample",
    "lang_id",
    "merkle_incremental_update",
    "mix_sources",
    "multimodal_audio_features",
    "multimodal_features",
    "multimodal_resize",
    "neighbors_incremental",
    "nested_profile",
    "ntile_value_buckets",
    "pack_sequences",
    "pagerank_bipartite",
    "pii_redact",
    "pivot_status_counts",
    "quality_score",
    "range_join_recent_activity",
    "ratio_guarded",
    "repetition_stats",
    "robust_outliers",
    "rollup_returns",
    "salted_join_revenue",
    "scd2_intervals",
    "sessionize",
    "split_assign",
    "stratified_sample",
    "token_count",
    "top_ngrams",
    "trailing_window_sum",
    "union_discriminated",
    "wordpiece_encode",
    "anti_join_pending",
    "band_self_join_knn",
    "bigram_perplexity",
    "cdc_upsert",
    "components_star_chains",
    "content_hash_change",
    "content_hash_portable",
    "curation_pipeline",
    "dedup_cluster_collapse",
    "dedup_exact",
    "dedup_minhash",
    "dedup_minhash_incremental",
    "dedup_minhash_verified",
    "dedup_simhash",
    "delete_insert_refresh",
    "fuzzy_match_parts",
    "hourly_event_rollup",
    "inverted_index_compaction",
    "knn_ivf_exact",
    "latest_snapshot",
    "latest_version_dedup",
    "leakage_safe_split",
    "merge_insert_missing",
    "multimodal_frame_sample",
    "multimodal_png_features",
    "multimodal_video_frames",
    "neighbors_profiles",
    "ngram_jaccard",
    "point_lookup",
    "regexp_json_extract",
    "request_stats",
    "semi_scoped_agg",
    "session_rollup_batch",
    "sitemap_thing_ids",
    "staleness_bands",
    "substring_dedup",
    "tpch_q10",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "value_percentiles",
    "weighted_sssp",
    "ab_test_eval",
    "bloom_pruned_join",
    "bpe_learn_encode",
    "cc_log_maintenance",
    "cdc_log_state",
    "cms_heavy_hitters",
    "collection_predictions_latest",
    "corpus_kl_shift",
    "corr_matrix",
    "dedup_keep_best",
    "deployed_models_union",
    "dsir_importance",
    "embedding_near_dup",
    "entity_resolution",
    "equidepth_histogram",
    "funnel_steps",
    "gapfill_interpolate",
    "gopher_quality_rules",
    "holt_trend_forecast",
    "interval_islands",
    "inverted_index",
    "item_item_recommender",
    "join_skew_report",
    "jsonl_quarantine_roundtrip",
    "kmeans_embeddings",
    "knn_quantized",
    "label_centroids",
    "label_propagation",
    "mv_incremental_refresh",
    "nb_lang_classify",
    "ols_two_feature",
    "predictions_freshness",
    "profile_documents",
    "retention_cohorts",
    "semantic_dedup",
    "sliding_window_distinct",
    "table_checksum_manifest",
    "temperature_mix",
    "token_budget_report",
    "tpch_q1",
    "tpch_q18",
    "tpch_q19",
    "tpch_q2",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "vocab_encode",
    "watermark_increment",
    "weighted_sample",
    "weighted_sample_stratified",
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
