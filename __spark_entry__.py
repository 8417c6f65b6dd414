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
    skew,
    textstats,
    timewindow,
)
from etl_jlp_spark.plans import (  # noqa: E402, F401
    analytics,
    curate,
    enrich,
    pipeline,
    timeseries,
    tpch_extra,
)
from etl_jlp_spark.quality import drift, report  # noqa: E402, F401

# ---------------------------------------------------------------------------
# Correctness-window rotation (SURVEY.md §8): the driver records only the
# first ~50 queries() entries per round. Round-5 priority: the TRUE 12-name
# overflow whose newest driver row is round 2 (VERDICT r4 finding #3: the
# documented list of 11 was missing dedup_embedding_cosine), then the four
# flagships (kept in-window every round), then the eleven queries NEW in
# round 5 (first driver row), then the 42 names whose newest driver row is
# round 3, in their r3-window order. Positions past ~50 (the tail of the
# r3-stale block) overflow and lead round 6 — the full overflow list is in
# SURVEY.md §8; every overflow name is covered by the committed PARITY_r5.txt
# sf0.01 sweep.
# ---------------------------------------------------------------------------
_R5_PRIORITY = [
    # newest driver row = round 2 — all 12 MUST land in the r5 window
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
    # flagships — kept in-window every round
    "preprocess_pipeline",
    "curate_documents",
    "training_data_pipeline",
    "corpus_index_pipeline",
    # NEW in round 5 — need their first driver row
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
    # newest driver row = round 3 (r3-window order); tail past ~50 → r6
    "approx_sketch_stats",
    "ann_ivf_topk_prebuilt",
    "ingest_jdbc_derby",
    "doc_chunk",
    "paragraph_dedup",
    "semantic_dedup",
    "dedup_cluster_representative",
    "dataset_split",
    "dedup_exact",
    "window_time",
    "session_window_stats",
    "keywords_extract",
    "keywords_ngrams",
    "exact_keywords_set",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_revenue_change",
    "q7_nation_volume",
    "q10_returned_items",
    "q13_order_distribution",
    "q18_large_orders",
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
]


def _rotated() -> None:
    registry.reorder([n for n in _R5_PRIORITY if n in registry.QUERIES])


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's full preprocessing chain (dedup →
    window-time → sessionize → time-on-page → audit) as one plan."""
    return pipeline.preprocess_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, with the
    round-5 correctness-window rotation applied (see above)."""
    _rotated()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-able query."""
    _rotated()
    return dict(registry.ORACLES)
