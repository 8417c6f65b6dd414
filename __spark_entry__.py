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
    components,
    dedup,
    embeddings,
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
# first ~50 queries() entries per round. Round 1 checked the 50 earliest-
# registered names (all green), leaving 34 without a driver row. This round
# those 34 — flagships first — plus the queries NEW in round 2 go to the
# front of the dict; the round-1-green names fill the remaining slots in
# their original order so any extra window capacity re-verifies them.
# ---------------------------------------------------------------------------
_R2_PRIORITY = [
    # flagships (round-1 driver-unchecked)
    "preprocess_pipeline",
    "curate_documents",
    # quality family (round-1 driver-unchecked)
    "quality_report",
    "quality_clean_rate",
    "quality_format_check",
    "quality_report_lineitem",
    "quality_array_fields",
    # enrichment / analytics (round-1 driver-unchecked)
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
    # TPC-H shapes (round-1 driver-unchecked)
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
    # previously rows-only, now oracle-backed (round 2)
    "ann_lsh_topk",
    "ann_ivf_topk",
    # NEW in round 2
    "ingest_full_load_jsonl",
    "time_on_page_incremental",
    "quality_report_flat",
    "decontaminate_docs",
    "balance_source_mix",
]


def _rotated() -> None:
    registry.reorder([n for n in _R2_PRIORITY if n in registry.QUERIES])


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's full preprocessing chain (dedup →
    window-time → sessionize → time-on-page → audit) as one plan."""
    return pipeline.preprocess_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, with the
    round-2 correctness-window rotation applied (see above)."""
    _rotated()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-able query."""
    _rotated()
    return dict(registry.ORACLES)
