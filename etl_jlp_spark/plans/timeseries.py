"""Time-series analytics the reference computes by hand-rolled pandas
loops, re-expressed as Spark plans: dense resampling (gap-fill) and
cohort retention.

Reference tie-in: the preprocessing chain derives per-window activity
(add_window_time_columns, preprocessing_streaming_incremental_load.py)
but any report over it silently skips empty windows; BI layers need the
ZERO rows. ``timeseries_gapfill`` densifies (hour × event_type) with
explicit zeros. ``user_retention_cohorts`` is the standard
first-seen-cohort × week-offset active-user matrix.

Scale shapes:
- gap-fill: the dense grid is |hours| × |types| — bounded by the time
  span, not the event count; it is built from a 1-row span scalar
  (broadcast) crossed with the distinct type dimension, then LEFT
  joins the pre-reduced aggregate. Raw events are touched exactly once
  (one map-side-combinable agg).
- retention: two aggregates over (user, week) — both shuffle keys are
  high-cardinality (user_id), the output is cohorts × offsets rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import query


@query(
    "timeseries_gapfill",
    oracle="""
WITH agg AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         round(sum(value), 2) AS sum_value
  FROM events GROUP BY 1, 2
), span AS (SELECT min(hour) AS lo, max(hour) AS hi FROM agg),
hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM span
), types AS (SELECT DISTINCT event_type FROM events)
SELECT h.hour, t.event_type,
       coalesce(a.n_events, 0) AS n_events,
       coalesce(a.sum_value, 0.0) AS sum_value
FROM hours h CROSS JOIN types t
LEFT JOIN agg a ON a.hour = h.hour AND a.event_type = t.event_type
""",
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly activity per event type: every (hour, type) cell in
    the observed span, zero-filled where no events landed — the
    resample-to-dense step reporting and anomaly detection need."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    span = agg.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))  # 1 row
    hours = span.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hour")
    )
    types = events.select("event_type").distinct()
    # both grid factors are tiny (span-bounded / dimension-bounded);
    # broadcast keeps the cross product a local expansion
    grid = hours.crossJoin(F.broadcast(types))
    return grid.join(F.broadcast(agg), ["hour", "event_type"], "left").select(
        "hour",
        "event_type",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


@query(
    "user_retention_cohorts",
    oracle="""
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
firsts AS (
  SELECT user_id, CAST(date_trunc('week', min(day)) AS DATE) AS cohort_week
  FROM ev GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', day) AS DATE) AS wk FROM ev
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.wk) / 7 AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_active
FROM act a JOIN firsts f USING (user_id)
GROUP BY 1, 2
""",
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: users grouped by first-seen week
    (cohort), counted as active at each week offset. Week truncation is
    Monday-aligned in both engines, so offsets are exact multiples of
    7 days — the division is lossless."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("day")).cast("date").alias("cohort_week")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", "day").cast("date").alias("wk")
    ).distinct()
    return (
        act.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("wk", "cohort_week") / 7).cast("long").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
