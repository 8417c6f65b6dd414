"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``etl_jlp_spark``; operators self-register in
``etl_jlp_spark.registry`` at import time.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Importing these modules populates the registry.
from etl_jlp_spark import registry  # noqa: E402
from etl_jlp_spark.ingest import loaders, maintenance  # noqa: E402, F401
from etl_jlp_spark.operators import (  # noqa: E402, F401
    audit,
    cdc,
    chunking,
    components,
    corpus_ml,
    corpus_stats,
    dedup,
    diff,
    embeddings,
    fusion,
    graph,
    ir,
    joins,
    keywords,
    kmv,
    layout,
    linkage,
    profiling,
    quality_rules,
    rollup,
    sampling,
    scd,
    sessionize,
    similarity,
    sketches,
    skew,
    spans,
    textstats,
    timewindow,
)
from etl_jlp_spark.plans import (  # noqa: E402, F401
    analytics,
    attribution,
    calendar,
    curate,
    enrich,
    experiment,
    inference,
    materialized,
    mlprep,
    ops_metrics,
    pipeline,
    regression,
    timeseries,
    tpch_extra,
)
from etl_jlp_spark.quality import drift, report  # noqa: E402, F401

# ---------------------------------------------------------------------------
# Correctness-window rotation (SURVEY.md §8): the driver records only the
# first ~50 queries() entries per round. Round-7 priority (per the round-5
# VERDICT §Next-round #1): the 12 operators that have NEVER had a driver row,
# then the 7 names whose newest row is round 2, then the four flagships
# (kept in-window every round), then the queries NEW this round, then names
# whose newest row is round 3 (refresh). Everything past ~50 is covered by
# the committed PARITY_r*.txt sf0.01 sweeps (tools/parity.py, the in-repo
# replica of the driver gate).
# ---------------------------------------------------------------------------
_R7_PRIORITY = [
    # never had a driver row (r5 additions that missed the r5 window)
    "scd2_build",
    "scd2_apply",
    "dedup_minhash_prebuilt",
    "fuzzy_join_editdist",
    "fuzzy_join_prebuilt",
    "rollup_incremental",
    "ann_quantized_topk",
    "timeseries_gapfill",
    "user_retention_cohorts",
    "key_skew_report",
    "psi_drift_report",
    "quality_percentile_gate",
    # newest driver row is round 2 — refresh
    "compare_with_source",
    "cdc_merge",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ingest_full_load_jsonl",
    "time_on_page_incremental",
    "dedup_embedding_cosine",
    # flagships — kept in-window every round
    "preprocess_pipeline",
    "curate_documents",
    "training_data_pipeline",
    "corpus_index_pipeline",
    # touched this round (ADVICE fixes changed their SQL/plan) — re-pin
    "cohort_ltv",
    "ab_test_report",
    # NEW in round 7 — first driver row
    "propagate_deletes_report",
    "semantic_dedup_scaled",
    "graph_pagerank",
    "graph_triangle_stats",
    "minhash_spark_native",
    "tokenizer_fertility_report",
    "contamination_ngram_overlap",
    "quality_isolation_outliers",
    "gdpr_erasure_audit",
    "session_conversion_attribution",
    "entity_resolution_blocking",
    "session_survival_km",
    "cusum_changepoint",
    "docs_length_histogram",
    "embedding_pca_power",
    "percentile_bucket_assign",
    "events_cube_report",
    # NEW this session — first row anywhere (not even a PARITY_r6 line)
    "ingest_full_load_csv",
    "ingest_full_load_orc",
    "theil_sen_trend",
    "spearman_corr_matrix",
    "hll_weekly_union",
    "nb_langid_confusion",
    "doc_similarity_tfidf_topk",
    "script_char_profile",
    "minhash_band_sweep",
    "cosine_threshold_sweep",
    "customer_order_concurrency",
    "contrastive_triplets",
    "term_freq_spectrum",
    "source_vocab_overlap",
    "session_gap_sweep",
    "cross_source_neardup_matrix",
    "event_count_dispersion",
    "hll_rolling_7d",
    "holt_winters_eval",
    "embedding_fisher_separation",
    "hour_of_day_profile",
    "order_lines_histogram",
    "topk_movers_wow",
    "new_vs_returning_daily",
    # NEW in round 7, third wave (regression/graph/profiling batch) —
    # first driver row; whatever falls past the ~50-row window is
    # covered by the committed PARITY sweep
    "ols_discount_elasticity",
    "acf_daily_revenue",
    "did_lift_report",
    "zipf_rank_slope",
    "graph_khop_reach",
    "graph_link_prediction",
    "calendar_dim",
    "ship_delay_profile",
    "knn_loo_accuracy",
    "user_event_entropy",
    "equidepth_histogram",
    "lineitem_corr_matrix",
    "bootstrap_ci_mean",
    "event_weekday_mi",
    "markov_next_event_eval",
    "dedup_prefix",
    "char_bigram_entropy",
    "part_copurchase_lift",
    "minhash_recall_report",
    "dup_cluster_size_histogram",
    "graph_modularity",
    "candidate_key_report",
    "langid_confusion_report",
    "revenue_concentration_curve",
    "orders_monthly_yoy",
    "events_dau_wau_mau",
    # NEW in round 7, second wave — first driver row (past-window names
    # are covered by the committed PARITY sweep)
    "hll_distinct_daily",
    "ks_drift_report",
    "mann_whitney_ab",
    "event_transition_matrix",
    "interarrival_burstiness",
    "pareto_frontier_docs",
    "weighted_sample_es",
    "dataset_card_report",
    "graph_label_propagation",
    "rfm_segmentation",
    "assoc_rules_events",
    "benford_digit_report",
    "holt_linear_eval",
    "weekday_seasonality_index",
    "anomaly_mad_daily",
    "neardup_rate_by_source",
    "window_funnel_steps",
    "source_logodds_terms",
    "kmeans_lloyd_assign",
    "zorder_layout_report",
    "mv_join_incremental",
    "stl_decompose_daily",
    "snapshot_diff",
    "bloom_join_prune_report",
    "session_paths_topk",
    "time_to_convert_stats",
    "skey_collision_audit",
    "revenue_gini_by_nation",
    "open_orders_timeline",
    "fd_profile_report",
    "column_entropy_report",
    # NEW in round 8 — first row anywhere (covered by the end-of-round
    # PARITY sweep; past the ~50-row driver window by construction)
    "readability_report",
    "partition_size_advisor",
    "value_mask_profile",
    "user_active_streaks",
    "priority_mix_chisq",
    "kmv_distinct_by_type",
    "kmv_type_overlap",
    "centroid_silhouette_report",
    "vocab_growth_curve",
    "quality_score_pr_curve",
    "ann_pq_topk",
    "hits_authorities",
    "hits_top_hubs",
    "ols_cv_eval",
    "bayesian_ab_conversion",
    "periodogram_daily_revenue",
    "conformal_forecast_interval",
    "robust_revenue_stats",
    "bottomk_sample_quantiles",
    "k_anonymity_report",
    "join_strategy_advisor",
    "revenue_rollup_shares",
    "mv_retraction_refresh",
    "ivf_nprobe_sweep",
    "embedding_drift_report",
    "customer_repeat_cohorts",
    "hilbert_layout_report",
    "char_coverage_report",
    "winnowing_fingerprint_stats",
    # newest driver row is round 3 — refresh with remaining slots
    "dedup_exact",
    "window_time",
    "session_window_stats",
    "keywords_extract",
    "keywords_ngrams",
    "exact_keywords_set",
    "ingest_jdbc_derby",
    "doc_chunk",
    "paragraph_dedup",
    "ann_ivf_topk_prebuilt",
    "semantic_dedup",
    "dedup_cluster_representative",
    "dataset_split",
    "approx_sketch_stats",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
]


def _rotated() -> None:
    registry.reorder([n for n in _R7_PRIORITY if n in registry.QUERIES])


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's full preprocessing chain (dedup →
    window-time → sessionize → time-on-page → audit) as one plan."""
    return pipeline.preprocess_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, with the
    round-6 correctness-window rotation applied (see above)."""
    _rotated()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-able query."""
    _rotated()
    return dict(registry.ORACLES)
