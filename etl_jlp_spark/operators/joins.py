"""Temporal and range join operators Spark lacks as primitives.

Composed from existing DataFrame ops (SURVEY.md §2 custom-operator
rule (a)): the as-of join is a union + running ``max() over`` — one
shuffle on the partition key, bounded per-key state, no point-in-time
loop; the range join broadcasts the (tiny) band dimension so the fact
side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.functions.timeutil import epoch_us
from etl_jlp_spark.registry import query


def asof_join_latest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_val: str,
) -> DataFrame:
    """For each left row: the latest right row with right_ts <= left_ts
    within the same `on` key. Implemented as a union tagged by side +
    one running-max window — the scalable as-of pattern (vs. a
    non-equi join, which would be a per-key cross product)."""
    l_tag = left.withColumns(
        {"__ts": F.col(left_ts), "__is_left": F.lit(1)}
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.col(right_val).alias("__rv"),
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows sort before left rows at equal ts (asof is inclusive)
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("__asof", F.max(F.when(F.col("__is_left") == 0, F.col("__ts"))).over(w))
        .withColumn("__asof_val", F.last(F.col("__rv"), ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
        .drop("__is_left", "__rv")
    )


@query(
    "asof_join",
    oracle="""
WITH purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, p.ts,
       c.ts AS last_click_ts,
       CASE WHEN c.ts IS NULL THEN NULL
            ELSE (epoch_us(p.ts) - epoch_us(c.ts)) / 1000000.0 END AS since_click_s
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND c.ts <= p.ts
""",
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's most recent prior click —
    the canonical event-attribution as-of join."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join_latest(purchases, clicks, "user_id", "ts", "ts", "value")
    us = epoch_us
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("__asof").alias("last_click_ts"),
        F.when(
            F.col("__asof").isNotNull(),
            (us(F.col("ts")) - us(F.col("__asof"))) / F.lit(1_000_000.0),
        ).alias("since_click_s"),
    )


VALUE_BANDS = [
    ("tiny", 0.0, 10.0),
    ("small", 10.0, 50.0),
    ("medium", 50.0, 200.0),
    ("large", 200.0, 1e9),
]

_BANDS_SQL = ",".join(f"('{n}', {lo}, {hi})" for n, lo, hi in VALUE_BANDS)


@query(
    "range_band_join",
    oracle=f"""
WITH bands(band, lo, hi) AS (VALUES {_BANDS_SQL})
SELECT b.band,
       CAST(count(e.event_id) AS BIGINT) AS n_events,
       round(sum(e.value), 2) AS sum_value
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band
""",
)
def range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join of the fact stream against a banding
    dimension. The band table is broadcast, so the non-equi condition
    is evaluated stream-side with zero shuffle before the final small
    aggregation."""
    events = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(VALUE_BANDS, "band string, lo double, hi double")
    return (
        events.join(
            F.broadcast(bands), (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
        )
        .groupBy("band")
        .agg(
            F.count("event_id").cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
