"""Conversion attribution over sessionized event streams.

The reference's preprocessing chain stops at per-session stats
(dwh_lab/dwh/preprocessing_streaming_incremental_load.py:300-380);
the question every growth team asks next is "which touch gets credit
for the purchase?". Last-touch attribution: each purchase is credited
to the most recent PRECEDING non-purchase event in the SAME session
(the channel the user converted from); a purchase with no preceding
touch in its session is 'direct'.

Plan shape: sessionization is the standard per-user window (one
shuffle on user_id); the attribution lookup is one more window over
the SAME (user, session) partition keys — Spark runs both in a single
sort/exchange (no second shuffle); the final rollup is a
map-side-combinable agg on the tiny channel dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.operators.sessionize import _SESSIONIZED_CTE, with_session_id
from etl_jlp_spark.registry import query

CONVERSION_TYPE = "purchase"


@query(
    "session_conversion_attribution",
    oracle=f"""
WITH sess AS ({_SESSIONIZED_CTE}), enriched AS (
  SELECT s.user_id, s.session_id, s.ts, s.event_id, e.event_type, e.value
  FROM sess s JOIN events e USING (event_id)
), attributed AS (
  SELECT event_type, value,
         last_value(CASE WHEN event_type <> '{CONVERSION_TYPE}' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
  FROM enriched
)
SELECT coalesce(channel, 'direct') AS channel,
       CAST(count(*) AS BIGINT) AS n_conversions,
       round(sum(value), 2) AS attributed_value
FROM attributed
WHERE event_type = '{CONVERSION_TYPE}'
GROUP BY 1
""",
)
def session_conversion_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: per channel (the non-purchase event type
    immediately preceding a purchase within its session), conversion
    count and attributed revenue; sourceless purchases roll up under
    'direct'."""
    events = load_table(spark, sf_dir, "events")
    sess = with_session_id(events.select("event_id", "user_id", "ts", "event_type", "value"))
    w = (
        Window.partitionBy("user_id", "session_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    channel = F.last(
        F.when(F.col("event_type") != CONVERSION_TYPE, F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    attributed = sess.withColumn("channel", channel).filter(
        F.col("event_type") == CONVERSION_TYPE
    )
    return attributed.groupBy(
        F.coalesce("channel", F.lit("direct")).alias("channel")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        F.round(F.sum("value"), 2).alias("attributed_value"),
    )
