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
    quality_rules,
    sampling,
    sessionize,
    similarity,
    skew,
    textstats,
    timewindow,
)
from etl_jlp_spark.plans import analytics, curate, enrich, pipeline, tpch_extra  # noqa: E402, F401
from etl_jlp_spark.quality import report  # noqa: E402, F401

# ---------------------------------------------------------------------------
# Correctness-window rotation (SURVEY.md §8): the driver records only the
# first ~50 queries() entries per round. Round-4 priority: flagships, then
# the 6 queries whose r3 row FAILED on the regenerated TIMESTAMP_NTZ
# testdata (fixed this round — epoch_us + catalog normalization), then the
# queries NEW in round 4 (IR/LM operators), then the 47 names whose newest
# driver row is round 2 (displaced by the r3 window). The overflow past
# the ~50-row window rotates to round 5.
# ---------------------------------------------------------------------------
_R4_PRIORITY = [
    # flagships — kept in-window every round
    "preprocess_pipeline",
    "curate_documents",
    "training_data_pipeline",
    "corpus_index_pipeline",
    # failed in round 3 (TIMESTAMP_NTZ regression, fixed this round)
    "sessionize",
    "session_stats",
    "session_merge_records",
    "time_on_page",
    "asof_join",
    # NEW in round 4
    "tfidf_top_terms",
    "bm25_search",
    "ngram_lm_score",
    "bpe_merge_candidates",
    "embedding_quantize",
    "bm25_search_prebuilt",
    # driver row stale since round 2 (displaced by the r3 window)
    "quality_report",
    "quality_clean_rate",
    "quality_format_check",
    "quality_report_lineitem",
    "quality_array_fields",
    "quality_report_flat",
    "events_by_type_day",
    "top_customers_by_revenue",
    "user_enrichment",
    "props_extract",
    "rolling_user_stats",
    "cumulative_daily_revenue",
    "pivot_event_counts",
    "percentile_stats",
    "sliding_weekly_revenue",
    "value_histogram",
    "session_funnel",
    "events_rollup_report",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q12_ship_speed",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_supplier_cnt",
    "q17_small_quantity",
    "q19_brand_discounts",
    "q20_excess_shippers",
    "q21_suppliers_waiting",
    "q22_global_sales_opportunity",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
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
]


def _rotated() -> None:
    registry.reorder([n for n in _R4_PRIORITY if n in registry.QUERIES])


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's full preprocessing chain (dedup →
    window-time → sessionize → time-on-page → audit) as one plan."""
    return pipeline.preprocess_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, with the
    round-4 correctness-window rotation applied (see above)."""
    _rotated()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-able query."""
    _rotated()
    return dict(registry.ORACLES)
