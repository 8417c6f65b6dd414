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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's full preprocessing chain (dedup →
    window-time → sessionize → time-on-page → audit) as one plan."""
    return pipeline.preprocess_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-able query."""
    return dict(registry.ORACLES)
