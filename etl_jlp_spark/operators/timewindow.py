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


# ---------------------------------------------------------------------------
# Exact sliding-window distinct count — the delta-segment algorithm.
# ---------------------------------------------------------------------------

ROLL_W = 7  # trailing window, days


@query(
    "rolling_distinct_users_exact",
    oracle=f"""
WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM ud),
roll AS (
  SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS rolling_users
  FROM days d JOIN ud u ON u.day BETWEEN d.day - {ROLL_W - 1} AND d.day
  GROUP BY d.day
), today AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS active_today
  FROM ud GROUP BY day
)
SELECT r.day, t.active_today, r.rolling_users
FROM roll r JOIN today t USING (day)
""",
)
def rolling_distinct_users_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-{w}-day distinct users per day without the naive
    day×window fan-out, via the delta-segment algorithm: a user with
    active days d1<d2<… is inside the window ending at day e iff e lies
    in the union of intervals [di, di+{w}-1]; that union decomposes into
    DISJOINT segments [di, min(di+{w}, next_di)-1], so emitting +1 at di
    and -1 at min(di+{w}, next_di) and prefix-summing deltas over the
    calendar yields the exact rolling distinct at every day.

    Scale shape: one distinct (user, day) pass (∝ user-day incidence),
    one user-keyed lead() window, then ALL remaining work happens on a
    relation bounded by the CALENDAR (≤ span+{w} delta days — the
    single-partition prefix-sum window is over ~thousands of rows no
    matter how many users). The naive shape — re-counting distinct over
    {w} days of raw keys PER OUTPUT DAY, which is what the independent
    oracle does and what hll_rolling_7d's exact branch pays — shuffles
    {w}× the fact table. This is the exact twin of hll_rolling_7d:
    sketch when ±2% is fine, delta-segments when it must be exact."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    nxt = F.lead("day").over(Window.partitionBy("user_id").orderBy("day"))
    seg = ud.select(
        "day",
        F.least(
            F.date_add(F.col("day"), ROLL_W),
            F.coalesce(nxt, F.date_add(F.col("day"), ROLL_W)),
        ).alias("end_day"),
    )
    deltas = seg.select(F.col("day"), F.lit(1).alias("d")).unionAll(
        seg.select(F.col("end_day").alias("day"), F.lit(-1).alias("d"))
    )
    byday = deltas.groupBy("day").agg(F.sum("d").alias("d"))
    # calendar-bounded relation: the unpartitioned running sum is fine
    cum = byday.select(
        "day",
        F.sum("d")
        .over(Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("rolling_users"),
    )
    today = ud.groupBy("day").agg(
        F.count_distinct("user_id").cast("long").alias("active_today")
    )
    return today.join(cum, "day").select("day", "active_today", "rolling_users")


rolling_distinct_users_exact.__doc__ = (
    rolling_distinct_users_exact.__doc__ or ""
).format(w=ROLL_W)
