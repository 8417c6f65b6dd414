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
from etl_jlp_spark.ingest import loaders  # noqa: E402, F401
from etl_jlp_spark.operators import (  # noqa: E402, F401
    audit,
    cdc,
    chunking,
    components,
    corpus_stats,
    dedup,
    embeddings,
    ir,
    joins,
    keywords,
    linkage,
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
    curate,
    enrich,
    experiment,
    pipeline,
    timeseries,
    tpch_extra,
)
from etl_jlp_spark.quality import drift, report  # noqa: E402, F401

# ---------------------------------------------------------------------------
# Correctness-window rotation (SURVEY.md §8): the driver records only the
# first ~50 queries() entries per round. Round-6 priority: the 20 names that
# overflowed the round-5 window (newest driver row = round 3), then the four
# flagships (kept in-window every round), then the twenty queries NEW in
# round 6 (first driver row), then — a hedge, because no CORRECTNESS_r05.json ever
# landed in-repo, so the r5 window may not have been recorded — the round-5
# head in its r5 order (the 12 previously-r2-stale names, then the 12 r5
# additions). Everything past ~50 is covered by the committed PARITY_r6.txt
# sf0.01 sweep.
# ---------------------------------------------------------------------------
_R6_PRIORITY = [
    # overflowed the r5 window — newest driver row is round 3
    "range_band_join",
    "events_by_type_day_salted",
    "stratified_sample",
    "sequence_packing",
    "dedup_exact_docs",
    "dedup_connected_components",
    "ann_topk_cosine",
    "text_langid",
    "text_quality_score",
    "token_count",
    "doc_fingerprint",
    "text_repetition",
    "gopher_quality_filter",
    "pii_scrub",
    "domain_mix_report",
    "embedding_norm_stats",
    "embedding_label_centroids",
    "nearest_centroid_assign",
    "source_keep_rate",
    "audit_columns",
    # flagships — kept in-window every round
    "preprocess_pipeline",
    "curate_documents",
    "training_data_pipeline",
    "corpus_index_pipeline",
    # NEW in round 6 — need their first driver row
    "anomaly_zscore",
    "ewma_daily_revenue",
    "dsir_select",
    "bpe_encode",
    "split_leakage_check",
    "doc_containment",
    "dup_span_report",
    "pmi_collocations",
    "lexical_diversity",
    "source_mix_temperature",
    "softdedup_weights",
    "ann_recall_report",
    "embedding_random_projection",
    "per_source_sample_k",
    "heavy_hitters_cms",
    "referential_integrity_report",
    "dedup_cc_incremental",
    "bigram_lm_score",
    "ab_test_report",
    "seasonal_naive_eval",
    "cohort_ltv",
    # hedge: the r5-window head, in case round 5's driver gate never
    # recorded (no CORRECTNESS_r05.json in-repo) — first the 12 names
    # whose newest CONFIRMED driver row is round 2, then the 12 queries
    # first registered in round 5
    "decontaminate_docs",
    "balance_source_mix",
    "ingest_full_load",
    "ingest_incremental_watermark",
    "watermark_update",
    "compare_with_source",
    "cdc_merge",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ingest_full_load_jsonl",
    "time_on_page_incremental",
    "dedup_embedding_cosine",
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
]


def _rotated() -> None:
    registry.reorder([n for n in _R6_PRIORITY if n in registry.QUERIES])


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
