"""Audit/lineage columns.

Reference: add_additional_columns / add_additional_columns_df
(dwh_lab/dwh/preprocessing_streaming_incremental_load.py:394-410,
446-457) — stamps source_name/source_id/is_update/is_delete and load
timestamps. A pure literal projection; the batch time is an explicit
parameter (never ``now()``) so runs are reproducible and the oracle is
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import query

DEFAULT_SOURCE_NAME = "clickhouse-streaming-data"
DEFAULT_SOURCE_ID = 1
DEFAULT_BATCH_TIME = "2024-02-01 00:00:00"


def with_audit_columns(
    df: DataFrame,
    source_name: str = DEFAULT_SOURCE_NAME,
    source_id: int = DEFAULT_SOURCE_ID,
    batch_time: str = DEFAULT_BATCH_TIME,
) -> DataFrame:
    ts = F.to_timestamp(F.lit(batch_time))
    return df.withColumns(
        {
            "source_name": F.lit(source_name),
            "source_id": F.lit(source_id).cast("long"),
            "is_update": F.lit(False),
            "is_delete": F.lit(False),
            "created_time": ts,
            "created_date": ts.cast("date"),
        }
    )


@query(
    "audit_columns",
    oracle=f"""
SELECT event_id, user_id, ts, event_type, value, props,
       '{DEFAULT_SOURCE_NAME}' AS source_name,
       CAST({DEFAULT_SOURCE_ID} AS BIGINT) AS source_id,
       FALSE AS is_update,
       FALSE AS is_delete,
       TIMESTAMP '{DEFAULT_BATCH_TIME}' AS created_time,
       DATE '2024-02-01' AS created_date
FROM events
""",
)
def audit_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value", "props"
    )
    return with_audit_columns(events)
