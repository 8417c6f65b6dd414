"""Hour-of-day / 6-hour-bucket time-window columns.

Reference: add_window_time_columns
(dwh_lab/dwh/preprocessing_streaming_incremental_load.py:119-186) — a
Python per-row loop adding window_time_details (hour), a 6-hour bucket
and human-readable labels. Here it is a pure projection (CASE + concat)
that runs inside whole-stage codegen: no shuffle, no UDF, scales
linearly with the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import query


def with_window_time(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    hour = F.hour(ts_col).cast("long")
    overall = (F.floor(hour / 6) * 6).cast("long")
    return events.withColumns(
        {
            "window_time_details": hour,
            "window_time_details_meaning": F.concat(
                hour.cast("string"), F.lit("h"), F.when(hour < 12, "am").otherwise("pm")
            ),
            "window_time_overall": overall,
            "window_time_overall_meaning": F.concat(
                F.lit("("),
                overall.cast("string"),
                F.lit("h - "),
                (overall + 6).cast("string"),
                F.lit("h) "),
                F.when(hour < 12, "am").otherwise("pm"),
            ),
        }
    )


@query(
    "window_time",
    oracle="""
SELECT event_id, user_id, ts,
       CAST(hour(ts) AS BIGINT) AS window_time_details,
       CAST(hour(ts) AS VARCHAR) || 'h' || CASE WHEN hour(ts) < 12 THEN 'am' ELSE 'pm' END
         AS window_time_details_meaning,
       CAST((hour(ts) // 6) * 6 AS BIGINT) AS window_time_overall,
       '(' || CAST((hour(ts) // 6) * 6 AS VARCHAR) || 'h - '
           || CAST((hour(ts) // 6) * 6 + 6 AS VARCHAR) || 'h) '
           || CASE WHEN hour(ts) < 12 THEN 'am' ELSE 'pm' END
         AS window_time_overall_meaning
FROM events
""",
)
def window_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return with_window_time(events).select(
        "event_id",
        "user_id",
        "ts",
        "window_time_details",
        "window_time_details_meaning",
        "window_time_overall",
        "window_time_overall_meaning",
    )
