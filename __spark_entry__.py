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
# order. Round 8 rotation (VERDICT r06 "Next round" #4 — round 7
# spent its whole window on new/changed gates, so the stale refresh
# lands here): evidence age computed from CORRECTNESS_r01-r07 — the
# window holds the 22 r2-vintage gates (6 rounds without a driver
# row, the oldest evidence in the ledger), 19 of the 23 r4-vintage
# gates (at the 4-round freshness bar), and the 5 gates whose gating code
# changed this round (round-7 ADVICE fixes: ks_two_sample —
# DECIMAL(38,0) permyriad on both engines; robust_outliers —
# base/dev lazy pins; approx_distinct_hll + hll_set_ops —
# hll_estimate's grouped pin went lazy; merkle_incremental_update —
# merkle_update cardinality guard), plus the 4 NEW round-8 gates
# (Benford first-digit audit, exact-decimal chi-square independence,
# 7-edge FK integrity audit, weighted Bellman-Ford SSSP), which
# displace the four most-stable pure-expression r4 gates
# (content_hash_portable, regexp_json_extract, request_stats,
# multimodal_frame_sample — single-expression gates with the lowest
# drift risk) to the front of the position-51+ queue. With 187
# registered gates and a 50-slot window the steady-state rotation
# cycle is ~4 rounds, so ~46 refresh slots per round is the
# sustainable regime.
_PRIORITY = [
    # r2-vintage stale block — last driver row round 2, the oldest
    # evidence in the ledger (projection/filter/join/agg/union core +
    # the LLM-pipeline text ops)
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
    # r4-vintage block — last driver row round 4, at the freshness bar
    # (analytic SQL tail, as-of/range joins, multimodal codecs,
    # kmeans/pagerank, sketch exact-twins)
    "sessionize",
    "pivot_status_counts",
    "rollup_returns",
    "cube_order_stats",
    "grouping_sets_stats",
    "value_percentiles",
    "distinct_users_exact",
    "trailing_window_sum",
    "ntile_value_buckets",
    "multimodal_features",
    "asof_feature_join",
    "asof_feature_join_segmented",
    "range_join_recent_activity",
    "kmeans_embeddings",
    "pagerank_bipartite",
    "top_ngrams",
    "dedup_simhash_verified",
    "multimodal_resize",
    "multimodal_audio_features",
    # gating code CHANGED this round (round-7 ADVICE fixes) — must
    # stay hash-gated in-window
    "ks_two_sample",
    "robust_outliers",
    "approx_distinct_hll",
    "hll_set_ops",
    "merkle_incremental_update",
    # NEW round 8: data-audit statistics + weighted graph distance
    "benford_digits",
    "chisq_independence",
    "fk_integrity_audit",
    "weighted_sssp",
    # ---- position 51+: next-up if the driver widens. The four
    # displaced r4 pure-expression gates lead, then the six
    # standing sentinels (r6-green, gating code unchanged,
    # latest_snapshot also smoke-runs every round as entry()) and the
    # r5-vintage block lead the round-9 refresh queue; TPC-H q1-q22
    # (r6/r7-green) and the round-7 additions queue behind them.
    "content_hash_portable",
    "regexp_json_extract",
    "request_stats",
    "multimodal_frame_sample",
    "latest_snapshot",
    "semi_scoped_agg",
    "watermark_increment",
    "hourly_event_rollup",
    "dedup_minhash_verified",
    "knn_ivf_exact",
    "cdc_upsert",
    "sliding_window_distinct",
    "corr_matrix",
    "weighted_sample_stratified",
    *[f"tpch_q{i}" for i in range(1, 23)],
    "mannwhitney_u",
    "set_similarity_join",
    "target_encode_oof",
    "decision_stump",
    "gini_concentration",
    "ann_recall_eval",
    "doc_vector_knn",
    "wordpiece_encode",
    "knn_bruteforce",
    "knn_lsh_exact",
    "embedding_near_dup_exact",
    "bm25_search",
    "quantile_sketch_merge",
    "quantile_sketch_query",
    "pmi_collocations",
    "tfidf_keywords",
    "hybrid_rrf_search",
    "ols_trend",
    "event_transition_matrix",
    "top_user_paths",
    "aqp_sampled_agg",
    "label_propagation",
    "kcore_parts",
    "triangle_census",
    "peak_concurrency",
    "pareto_frontier",
    "sorted_neighborhood_pairs",
    "quantile_normalize",
    "association_rules",
    "edge_support_topk",
    "unigram_segment_compounds",
    "merkle_table_root",
    "holt_winters_seasonal",
    "cusum_drift",
    "acf_lags",
    "budget_allocation",
    "bfs_reach",
    "shard_manifest",
    "survival_first_purchase",
    "attribution_last_touch",
    "rolling_regression",
    "event_debounce",
    "hits_scores",
    "random_projection",
    "feature_mi_ranking",
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
    "gapfill_interpolate",
    "equidepth_histogram",
    "entity_resolution",
    "winsorize_robust",
    "mv_incremental_refresh",
    "holt_trend_forecast",
    "retention_cohorts",
    "ab_test_eval",
    "temperature_mix",
    "bpe_learn_encode",
    "semantic_dedup",
    "nb_lang_classify",
    "knn_quantized",
    "trigram_backoff_ppl",
    "inverted_index",
    "profile_documents",
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
    "ngram_jaccard",
    "fuzzy_match_parts",
    "substring_dedup",
    "dedup_cluster_collapse",
    "components_star_chains",
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
