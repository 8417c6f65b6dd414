"""Calendar dimension + order-to-ship latency profile.

Reference tie-in: the reference derives per-row time attributes inline
(add_window_time_columns, dwh_lab/dwh/
preprocessing_streaming_incremental_load.py:120-150 — hour buckets and
label strings recomputed per record). A warehouse does this ONCE: a
conformed date dimension generated from the observed span, joined by
date key everywhere else. ``calendar_dim`` is that dimension;
``ship_delay_profile`` is the first consumer-style report (per-priority
order→ship latency), built on the exact-percentile machinery
percentile_stats already verified cross-engine.

Scale shapes:
- calendar_dim: the grid is |days| rows (span-bounded — ~37k rows even
  for a century), generated from a 1-row min/max scalar; the fact scan
  reads ONE column. Every attribute is integer/date arithmetic —
  codegen projections, zero shuffles beyond the scalar agg.
- ship_delay_profile: lineitem⋈orders is the canonical big-fact ⋈
  big-dim equi-join (AQE/bucketing territory, see test_bucketing.py);
  the aggregate is 5 rows (one per priority) via partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import query


@query(
    "calendar_dim",
    oracle="""
WITH span AS (
  SELECT CAST(min(o_orderdate) AS DATE) AS lo, CAST(max(o_orderdate) AS DATE) AS hi
  FROM orders
), days AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM span
)
SELECT day,
       CAST(year(day) AS BIGINT) AS yr,
       CAST(quarter(day) AS BIGINT) AS qtr,
       CAST(month(day) AS BIGINT) AS mo,
       CAST(day(day) AS BIGINT) AS dom,
       CAST(isodow(day) AS BIGINT) AS iso_dow,
       CAST(week(day) AS BIGINT) AS iso_week,
       isodow(day) >= 6 AS is_weekend,
       CAST(day(last_day(day)) AS BIGINT) AS days_in_month
FROM days
""",
)
def calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conformed date dimension spanning the observed order dates: one
    row per day with the standard attributes (year/quarter/month,
    day-of-month, ISO weekday & week, weekend flag, month length).
    ISO conventions are used on BOTH engines so the columns agree
    (Spark ``weekday``+1 = DuckDB ``isodow``; ``weekofyear`` = ISO
    ``week``)."""
    span = load_table(spark, sf_dir, "orders").agg(
        F.min(F.to_date("o_orderdate")).alias("lo"),
        F.max(F.to_date("o_orderdate")).alias("hi"),
    )
    days = span.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    iso_dow = (F.weekday("day") + 1).cast("long")
    return days.select(
        "day",
        F.year("day").cast("long").alias("yr"),
        F.quarter("day").cast("long").alias("qtr"),
        F.month("day").cast("long").alias("mo"),
        F.dayofmonth("day").cast("long").alias("dom"),
        iso_dow.alias("iso_dow"),
        F.weekofyear("day").cast("long").alias("iso_week"),
        (iso_dow >= 6).alias("is_weekend"),
        F.dayofmonth(F.last_day("day")).cast("long").alias("days_in_month"),
    )


@query(
    "ship_delay_profile",
    oracle="""
WITH d AS (
  SELECT o.o_orderpriority,
         CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                        CAST(l.l_shipdate AS DATE)) AS BIGINT) AS delay_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(min(delay_days) AS BIGINT) AS min_delay,
       CAST(max(delay_days) AS BIGINT) AS max_delay,
       round(CAST(sum(delay_days) AS DOUBLE) / count(*), 4) AS avg_delay,
       quantile_cont(delay_days, 0.5) AS p50_delay,
       quantile_cont(delay_days, 0.9) AS p90_delay
FROM d
GROUP BY o_orderpriority
""",
)
def ship_delay_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency per order priority: count, min/max, mean
    (exact integer day-sum divided once), and exact interpolated
    p50/p90 (Spark ``percentile`` = DuckDB ``quantile_cont``, the
    pairing percentile_stats verified bit-exact). The join is the
    canonical lineitem⋈orders equi-join — broadcast is wrong here
    (both sides scale with the fact data), so it shuffles on orderkey
    and is the bucketing candidate test_bucketing.py covers."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    d = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("delay_days"),
    )
    return d.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.min("delay_days").alias("min_delay"),
        F.max("delay_days").alias("max_delay"),
        F.round(F.sum("delay_days").cast("double") / F.count(F.lit(1)), 4).alias("avg_delay"),
        F.expr("percentile(delay_days, 0.5D)").alias("p50_delay"),
        F.expr("percentile(delay_days, 0.9D)").alias("p90_delay"),
    )
