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
# order. Round 7 rotation (VERDICT r06 "Next round" #4, revised across
# four build sessions): the window holds exactly 50 round-7 gates —
# 7 whose gating code changed this round (ann_recall_eval — spine +
# pin fix; doc_vector_knn — window-norms plan; wordpiece_encode —
# vocab pin; knn_bruteforce / knn_lsh_exact / embedding_near_dup_exact
# — per-vector norm hoist in similarity.py; bm25_search — scored stage
# refactored out for RRF) and 43 brand-new operators from sessions
# 1-4. Session 4's six new gates displaced the six standing sentinels
# (four events-adapter + two sketch-twin anchors — all lifetime green,
# gating code unchanged, latest_snapshot still smoke-runs as entry()),
# which now lead the position-51+ round-8 refresh queue, followed by
# the r6-green confirmations (cdc_upsert / sliding_window_distinct /
# corr_matrix) and the r2-vintage stale block; TPC-H q1-q22 and the
# r4 analytic tail queue behind them.
_PRIORITY = [
    # NEW round 7 (session 4): distributed two-sample statistics over
    # the shared bucketed cumulative-count spine (exact-fraction KS D,
    # integer 2U Mann-Whitney with tie-corrected z), exact-recall
    # prefix-filter set-similarity join, out-of-fold target encoding,
    # exhaustive decision-stump split search, and Lorenz/Gini revenue
    # concentration
    "ks_two_sample",
    "mannwhitney_u",
    "set_similarity_join",
    "target_encode_oof",
    "decision_stump",
    "gini_concentration",
    # gating code CHANGED this round — must stay hash-gated in-window
    "ann_recall_eval",
    "doc_vector_knn",
    "wordpiece_encode",
    "knn_bruteforce",
    "knn_lsh_exact",
    "embedding_near_dup_exact",
    "bm25_search",
    # NEW round 7: portable HLL cardinality (register grid replayed in
    # the oracle), mergeable histogram-quantile sketch (build+merge,
    # query), PMI collocation mining, tf-idf keyword extraction,
    # reciprocal-rank-fusion hybrid retrieval, HLL set algebra,
    # grouped closed-form OLS trend regression, Markov transition
    # matrix, top onboarding paths
    "approx_distinct_hll",
    "quantile_sketch_merge",
    "quantile_sketch_query",
    "pmi_collocations",
    "tfidf_keywords",
    "hybrid_rrf_search",
    "hll_set_ops",
    "ols_trend",
    "event_transition_matrix",
    "top_user_paths",
    # NEW round 7 (cont.): AQP sampled aggregates with replayed HT
    # estimator + CI, deterministic label-propagation communities and
    # bounded k-core peeling (both iterative graph algorithms fully
    # replayed in the oracle), and a degree-oriented triangle census
    "aqp_sampled_agg",
    "label_propagation",
    "kcore_parts",
    "triangle_census",
    # NEW round 7 (cont.): distributed prefix-scan family (two-pass
    # bucketed running aggregates replacing single-partition windows)
    # + MAD robust outliers
    "peak_concurrency",
    "pareto_frontier",
    "sorted_neighborhood_pairs",
    "robust_outliers",
    # NEW round 7 (cont.): grouped quantile features, association-rule
    # mining, per-edge triangle support
    "quantile_normalize",
    "association_rules",
    "edge_support_topk",
    # NEW round 7 (cont.): unigram-LM Viterbi segmentation (tokenizer
    # family #3 — exact lattice DP, 16-level CTE-chain oracle)
    "unigram_segment_compounds",
    # NEW round 7 (cont.): Merkle table commitment + incremental path
    # update (integrity family) + Holt-Winters seasonal forecasting
    "merkle_table_root",
    "merkle_incremental_update",
    "holt_winters_seasonal",
    # NEW round 7 (session 3): sequential statistics — CUSUM drift via
    # the closed prefix-scan identity, integer-exact autocorrelation,
    # largest-remainder budget apportionment, multi-source BFS reach
    # (unrolled-CTE replay), and the corpus shard manifest
    "cusum_drift",
    "acf_lags",
    "budget_allocation",
    "bfs_reach",
    "shard_manifest",
    # NEW round 7 (session 3, cont.): Kaplan-Meier time-to-conversion
    # via integer micro-nat folds, last-touch attribution (as-of
    # union-window vs the quadratic correlated oracle), trailing
    # 28-day integer OLS slopes
    "survival_first_purchase",
    "attribution_last_touch",
    "rolling_regression",
    # NEW round 7 (session 3, cont.): burst debouncing (sessionize's
    # boundary trick as a filter) and integer HITS hub/authority
    # centrality (all six half-iterations replayed in the oracle)
    "event_debounce",
    "hits_scores",
    # NEW round 7 (session 3, cont.): embedding feature engineering —
    # md5-signed JL random projection over quantized vectors, and
    # N-scaled micro-nat mutual-information feature ranking
    "random_projection",
    "feature_mi_ranking",
    # ---- position 51+: next-up if the driver widens. The 50 round-7
    # gates (7 changed-gating + four sessions of new operators) fill
    # the window exactly, so the six standing sentinels (all lifetime
    # green, gating code unchanged — latest_snapshot also smoke-runs
    # every round as entry()) rotate out and lead the round-8 refresh
    # queue, followed by the r6-green confirmations and the r2-vintage
    # stale block (benchmark_contamination..lang_id), then
    # mix_sources..union_discriminated
    "latest_snapshot",
    "semi_scoped_agg",
    "watermark_increment",
    "hourly_event_rollup",
    "dedup_minhash_verified",
    "knn_ivf_exact",
    "cdc_upsert",
    "sliding_window_distinct",
    "corr_matrix",
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
    # analytic tail + TPC-H lead so they rotate in next round
    # (weighted_sample_stratified r5-green and sessionize r4-green were
    # displaced by the two new gates — still inside the 4-round
    # freshness bar at r7)
    "weighted_sample_stratified",
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
    *[f"tpch_q{i}" for i in range(1, 23)],
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
    "multimodal_features",
    "request_stats",
    "asof_feature_join",
    "asof_feature_join_segmented",
    "range_join_recent_activity",
    "kmeans_embeddings",
    "pagerank_bipartite",
    "top_ngrams",
    "multimodal_frame_sample",
    "dedup_simhash_verified",
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
