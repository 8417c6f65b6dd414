"""The flagship composed pipeline: the reference's full
``processing_browsing_history`` chain as ONE declarative plan.

Reference (dwh_lab/dwh/preprocessing_streaming_incremental_load.py:412-433)
runs: remove_duplicates → add_window_time → [keywords] →
assign_session_ids → merge → time_on_page → audit, each a separate
Python pass over a list of dicts. Here the whole chain is a single
DataFrame expression: Catalyst fuses the projections (window-time +
audit are free riders on the scan), and every window step shares ONE
hash partitioning on user_id — the plan has exactly two exchanges
(dedup keys, then user_id), no matter how many steps the chain grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.operators.audit import with_audit_columns
from etl_jlp_spark.operators.dedup import dedup_first
from etl_jlp_spark.operators.sessionize import (
    SESSION_GAP_S,
    with_session_id,
    with_time_on_page,
)
from etl_jlp_spark.operators.timewindow import with_window_time
from etl_jlp_spark.registry import query


def preprocess_events(events: DataFrame) -> DataFrame:
    """dedup → window_time → sessionize → time_on_page → audit."""
    deduped = dedup_first(
        events, key_cols=["user_id", "event_type", "props"], order_cols=["ts", "event_id"]
    )
    enriched = with_window_time(deduped)
    sessioned = with_session_id(enriched)
    timed = with_time_on_page(sessioned)
    return with_audit_columns(timed)


@query(
    "preprocess_pipeline",
    oracle=f"""
WITH deduped AS (
  SELECT event_id, user_id, ts, event_type, value, props FROM (
    SELECT e.*, row_number() OVER (PARTITION BY user_id, event_type, props ORDER BY ts, event_id) AS rn
    FROM events e
  ) WHERE rn = 1
), enriched AS (
  SELECT *,
         CAST(hour(ts) AS BIGINT) AS window_time_details,
         CAST((hour(ts) // 6) * 6 AS BIGINT) AS window_time_overall
  FROM deduped
), gapped AS (
  SELECT *, epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
         lead(epoch_us(ts)) OVER w AS next_us
  FROM enriched
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessioned AS (
  SELECT *, CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > {SESSION_GAP_S} * 1000000 THEN 1 ELSE 0 END)
        OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM gapped
)
SELECT event_id, user_id, ts, event_type, value, props,
       window_time_details, window_time_overall, session_id,
       coalesce((next_us - epoch_us(ts)) / 1000000.0, 1800.0) AS raw_time_on_page,
       least(coalesce((next_us - epoch_us(ts)) / 1000000.0, 1800.0), 3600.0) AS capped_time_on_page,
       'clickhouse-streaming-data' AS source_name,
       CAST(1 AS BIGINT) AS source_id,
       FALSE AS is_update, FALSE AS is_delete,
       TIMESTAMP '2024-02-01 00:00:00' AS created_time,
       DATE '2024-02-01' AS created_date
FROM sessioned
""",
)
def preprocess_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    out = preprocess_events(events)
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        "props",
        "window_time_details",
        "window_time_overall",
        "session_id",
        "raw_time_on_page",
        "capped_time_on_page",
        "source_name",
        "source_id",
        "is_update",
        "is_delete",
        "created_time",
        "created_date",
    )


# ---------------------------------------------------------------------------
# Zero-extra-pass pipeline instrumentation via the Observation API.
# ---------------------------------------------------------------------------


def observed_preprocess(spark: SparkSession, sf_dir: str):
    """Run preprocess_pipeline with pyspark Observations attached at
    the input and output boundaries: row counts, null-key counts and
    value totals are collected BY THE SAME JOB that materializes the
    result — the Spark-native replacement for the reference's separate
    count queries around each step
    (dwh_lab/dwh/general_lib.py logging counts before/after loads),
    which re-scan the data once per metric at 100 TB.

    Returns (result_rows, metrics dict). Tests pin that the observed
    input/output counts reconcile with the dedup drop count."""
    from pyspark.sql import Observation

    events = load_table(spark, sf_dir, "events")
    obs_in = Observation("input")
    events = events.observe(
        obs_in,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("null_user_ids"),
    )
    out = preprocess_events(events)
    obs_out = Observation("output")
    out = out.observe(
        obs_out,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    rows = out.collect()
    return rows, {"input": obs_in.get, "output": obs_out.get}
