"""Business-operations metrics: revenue concentration and order backlog.

Two report shapes the reference's pandas marts can't reach at scale:

- ``revenue_gini_by_nation``: the Gini coefficient of customer revenue
  within each nation — the concentration number behind "top 1% of
  customers drive X%" dashboards. Computed by the rank formula
  G = 2·Σ(i·xᵢ)/(n·Σxᵢ) − (n+1)/n over revenue-ranked customers,
  in EXACT integer cents so the two engines' sum orders can't drift.

- ``open_orders_timeline``: how many orders are open (placed but not
  fully received) on each day — the interval-counting pattern: every
  order contributes a +1 delta at its start and a −1 after its end,
  and a running sum over the (bounded, ~|days|) delta relation yields
  the timeline without ever joining orders × days.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import query


@query(
    "revenue_gini_by_nation",
    oracle="""
WITH cr AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders GROUP BY 1
), ranked AS (
  SELECT c.c_nationkey, cr.rev_c,
         row_number() OVER (PARTITION BY c.c_nationkey
                            ORDER BY cr.rev_c, cr.o_custkey) AS i
  FROM cr JOIN customer c ON cr.o_custkey = c.c_custkey
), g AS (
  SELECT c_nationkey,
         CAST(count(*) AS BIGINT) AS n_customers,
         sum(rev_c) AS sum_rev,
         sum(i * rev_c) AS sum_irev
  FROM ranked GROUP BY 1
)
SELECT n.n_name,
       g.n_customers,
       sum_rev / 100.0 AS total_revenue,
       round((2.0 * sum_irev) / (n_customers * CAST(sum_rev AS DOUBLE))
             - (n_customers + 1.0) / n_customers, 4) + 0.0 AS gini
FROM g JOIN nation n ON g.c_nationkey = n.n_nationkey
""",
)
def revenue_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-nation customer-revenue concentration (Gini, 0 = equal,
    →1 = one customer is the book of business).

    Plan: orders reduce to per-customer cents (map-side combinable,
    EXACT longs — rank·revenue products and their sums never touch
    float association order); one shuffle join to customer for the
    nation key; the rank window and final agg ride the same
    nation-hash exchange; the 25-row nation name join broadcasts."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cr = orders.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("rev_c")
    )
    ranked = cr.join(cust, cr.o_custkey == cust.c_custkey).select(
        "c_nationkey",
        "rev_c",
        F.row_number()
        .over(Window.partitionBy("c_nationkey").orderBy("rev_c", "o_custkey"))
        .alias("i"),
    )
    g = ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("rev_c").alias("sum_rev"),
        F.sum(F.col("i") * F.col("rev_c")).alias("sum_irev"),
    )
    return g.join(F.broadcast(nation), g.c_nationkey == nation.n_nationkey).select(
        "n_name",
        "n_customers",
        (F.col("sum_rev") / 100.0).alias("total_revenue"),
        (
            F.round(
                (2.0 * F.col("sum_irev"))
                / (F.col("n_customers") * F.col("sum_rev").cast("double"))
                - (F.col("n_customers") + 1.0) / F.col("n_customers"),
                4,
            )
            + 0.0
        ).alias("gini"),
    )


@query(
    "open_orders_timeline",
    oracle="""
WITH spans AS (
  SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS start_d,
         max(CAST(l.l_shipdate AS DATE)) AS end_d
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
), deltas AS (
  SELECT start_d AS day, 1 AS d FROM spans
  UNION ALL
  SELECT end_d + 1 AS day, -1 AS d FROM spans
), daily AS (
  SELECT day, CAST(sum(d) AS BIGINT) AS delta FROM deltas GROUP BY day
)
SELECT day, delta,
       CAST(sum(delta) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_open
FROM daily
""",
)
def open_orders_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders in flight per day (placed, not yet fully shipped):
    interval counting by ±1 boundary deltas + running sum — never the
    orders × days blowup.

    Plan: one join to find each order's last shipment, then the delta
    relation is ≤ 2·|orders| rows that immediately collapse to
    ≤ |days| rows (map-side combinable) BEFORE the running sum — the
    only global-ordered window runs over the bounded day axis (same
    justification as ewma_daily_revenue). All-integer arithmetic:
    the driver hash can't drift."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (
        orders.select("o_orderkey", F.col("o_orderdate").cast("date").alias("start_d"))
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("o_orderkey", "start_d")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("end_d"))
    )
    deltas = spans.select(
        F.explode(
            F.array(
                F.struct(F.col("start_d").alias("day"), F.lit(1).alias("d")),
                F.struct(F.date_add("end_d", 1).alias("day"), F.lit(-1).alias("d")),
            )
        ).alias("x")
    ).select("x.day", "x.d")
    daily = deltas.groupBy("day").agg(F.sum("d").cast("long").alias("delta"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day", "delta", F.sum("delta").over(w).cast("long").alias("n_open")
    )


@query(
    "customer_order_concurrency",
    oracle="""
WITH spans AS (
  SELECT o.o_custkey, o.o_orderkey, CAST(o.o_orderdate AS DATE) AS start_d,
         max(CAST(l.l_shipdate AS DATE)) AS end_d
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2, 3
), deltas AS (
  SELECT o_custkey, start_d AS day, 1 AS d FROM spans
  UNION ALL
  SELECT o_custkey, end_d + 1 AS day, -1 AS d FROM spans
), daily AS (
  SELECT o_custkey, day, CAST(sum(d) AS BIGINT) AS delta
  FROM deltas GROUP BY o_custkey, day
), running AS (
  SELECT o_custkey,
         sum(delta) OVER (PARTITION BY o_custkey ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_open
  FROM daily
), per_cust AS (
  SELECT o_custkey, CAST(max(n_open) AS BIGINT) AS max_open FROM running
  GROUP BY o_custkey
)
SELECT max_open,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(count(*) * 1.0 / sum(count(*)) OVER (), 4) AS customer_share
FROM per_cust GROUP BY max_open
""",
)
def customer_order_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many orders a customer has in flight AT ONCE: per-customer
    sweep-line over order lifespans (placed → last shipment), reported
    as a histogram of each customer's peak concurrency — the
    interval-overlap analytics shape keyed per entity (the global twin
    is open_orders_timeline).

    Plan: ±1 boundary deltas collapse to ≤2 rows per (customer, day)
    BEFORE any window; the running sum partitions BY CUSTOMER — a
    key-partitioned window, never a global sort, so it scales with the
    per-customer order count (format-bounded) at any corpus size. The
    overlap pair join alternative is Σ per-customer orders² — the
    sweep line is linear. All-integer arithmetic end to end."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (
        orders.select(
            "o_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("start_d")
        )
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("o_custkey", "o_orderkey", "start_d")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("end_d"))
    )
    deltas = spans.select(
        "o_custkey",
        F.explode(
            F.array(
                F.struct(F.col("start_d").alias("day"), F.lit(1).alias("d")),
                F.struct(F.date_add("end_d", 1).alias("day"), F.lit(-1).alias("d")),
            )
        ).alias("x"),
    ).select("o_custkey", "x.day", "x.d")
    daily = deltas.groupBy("o_custkey", "day").agg(F.sum("d").cast("long").alias("delta"))
    wrun = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = daily.select("o_custkey", F.sum("delta").over(wrun).alias("n_open"))
    per_cust = running.groupBy("o_custkey").agg(F.max("n_open").cast("long").alias("max_open"))
    hist = per_cust.groupBy("max_open").agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    wall = Window.partitionBy()
    return hist.select(
        "max_open",
        "n_customers",
        F.round(F.col("n_customers") * 1.0 / F.sum("n_customers").over(wall), 4).alias(
            "customer_share"
        ),
    )


@query(
    "event_count_dispersion",
    oracle="""
WITH per_user AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, user_id
), s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(c) AS BIGINT) AS s1,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM per_user GROUP BY event_type
)
SELECT event_type, n_users,
       round(s1 / CAST(n_users AS DOUBLE), 4) AS mean_count,
       round((s2 - s1 * (s1 / CAST(n_users AS DOUBLE))) / (n_users - 1.0), 4) AS var_count,
       round(((s2 - s1 * (s1 / CAST(n_users AS DOUBLE))) / (n_users - 1.0))
             / (s1 / CAST(n_users AS DOUBLE)), 4) AS dispersion_index,
       CASE WHEN (s2 - s1 * (s1 / CAST(n_users AS DOUBLE))) / (n_users - 1.0)
                 > s1 / CAST(n_users AS DOUBLE)
            THEN round((s1 / CAST(n_users AS DOUBLE)) * (s1 / CAST(n_users AS DOUBLE))
                 / ((s2 - s1 * (s1 / CAST(n_users AS DOUBLE))) / (n_users - 1.0)
                    - s1 / CAST(n_users AS DOUBLE)), 4) END AS nb_r_moment
FROM s
""",
)
def event_count_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion report of per-user event counts by type: sample
    mean/variance, the index of dispersion (var/mean — 1 under Poisson,
    ≫1 for bursty/bot traffic), and the moment estimate of the negative
    binomial r (μ²/(σ²−μ), defined only when overdispersed) — the test
    that decides whether a Poisson rate model or an NB model belongs in
    an alerting threshold.

    Exactness: the only inputs are exact integer power sums (Σc, Σc²)
    from one map-side-combinable two-level agg; every derived statistic
    is the same closed-form double expression in both engines. Scale:
    per-(type, user) counts shrink map-side; the stats relation is
    |types| rows."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    s = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    mean = F.col("s1") / F.col("n_users").cast("double")
    var = (F.col("s2") - F.col("s1") * mean) / (F.col("n_users") - 1.0)
    return s.select(
        "event_type",
        "n_users",
        F.round(mean, 4).alias("mean_count"),
        F.round(var, 4).alias("var_count"),
        F.round(var / mean, 4).alias("dispersion_index"),
        F.when(var > mean, F.round(mean * mean / (var - mean), 4)).alias("nb_r_moment"),
    )


@query(
    "hour_of_day_profile",
    oracle="""
WITH hourly AS (
  SELECT event_type, CAST(extract(hour FROM ts) AS INTEGER) AS hour,
         CAST(count(*) AS BIGINT) AS n_events,
         round(sum(value), 2) AS sum_value
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour, n_events, sum_value,
       round(n_events * 1.0 / sum(n_events) OVER (PARTITION BY event_type), 4)
         AS hour_share
FROM hourly
""",
)
def hour_of_day_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diurnal activity profile: events and value by (type, hour of
    day) with each hour's share of its type — the 24-row-per-type
    seasonality table behind load forecasting and bot detection (human
    traffic has a day/night cycle; scripted traffic is flat).

    Plan: one combinable groupBy to ≤ types×24 cells; the share window
    runs over those cells only. The weekday twin is
    weekday_seasonality_index; this is the finer grain."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hour")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    w = Window.partitionBy("event_type")
    return hourly.select(
        "event_type",
        "hour",
        "n_events",
        "sum_value",
        F.round(F.col("n_events") * 1.0 / F.sum("n_events").over(w), 4).alias("hour_share"),
    )


@query(
    "order_lines_histogram",
    oracle="""
WITH per_order AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(round(sum(l_extendedprice * (1 - l_discount))) AS BIGINT) AS revenue
  FROM lineitem GROUP BY l_orderkey
)
SELECT n_lines,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(count(*) * 1.0 / sum(count(*)) OVER (), 4) AS order_share,
       CAST(sum(revenue) AS BIGINT) AS total_revenue,
       round(sum(revenue) * 1.0 / sum(sum(revenue)) OVER (), 4) AS revenue_share
FROM per_order GROUP BY n_lines
""",
)
def order_lines_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-width distribution: how many orders have k line items and
    how much revenue each width class carries — the shape that sizes
    the per-order pair joins (copurchase lift, within-order analytics
    are Σ width² work) and validates the order-format boundedness those
    operators' scale arguments lean on.

    Plan: one combinable groupBy(orderkey), one width-bounded
    histogram agg; shares via windows over the ≤max-width rows.
    Revenue stays in exact integer dollars until the share division."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("long")
        .alias("revenue"),
    )
    hist = per_order.groupBy("n_lines").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("revenue").cast("long").alias("total_revenue"),
    )
    w = Window.partitionBy()
    return hist.select(
        "n_lines",
        "n_orders",
        F.round(F.col("n_orders") * 1.0 / F.sum("n_orders").over(w), 4).alias("order_share"),
        "total_revenue",
        F.round(F.col("total_revenue") * 1.0 / F.sum("total_revenue").over(w), 4).alias(
            "revenue_share"
        ),
    )


WOW_TOP_K = 15


@query(
    "topk_movers_wow",
    oracle=f"""
WITH weekly AS (
  SELECT user_id, date_trunc('week', CAST(ts AS DATE)) AS week,
         CAST(round(sum(value) * 100) AS BIGINT) AS rev_c
  FROM events GROUP BY 1, 2
), with_prev AS (
  SELECT user_id, week, rev_c,
         lag(rev_c) OVER (PARTITION BY user_id ORDER BY week) AS prev_c,
         lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week
  FROM weekly
), deltas AS (
  SELECT user_id, CAST(week AS DATE) AS week,
         round(rev_c / 100.0, 2) AS revenue,
         round(prev_c / 100.0, 2) AS prev_revenue,
         rev_c - prev_c AS delta_c
  FROM with_prev
  WHERE prev_c IS NOT NULL AND week = prev_week + INTERVAL 7 DAY
)
SELECT user_id, week, revenue, prev_revenue,
       round(delta_c / 100.0, 2) AS delta,
       CAST(rk AS BIGINT) AS rk
FROM (SELECT *, row_number() OVER (ORDER BY abs(delta_c) DESC, user_id, week) AS rk
      FROM deltas)
WHERE rk <= {WOW_TOP_K}
""",
)
def topk_movers_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} week-over-week revenue movers by user — the digest table
    a weekly business review opens with: who swung hardest, up or
    down, between CONSECUTIVE weeks (gaps don't fabricate a delta).

    Plan: events collapse to (user, week) cents FIRST (combinable);
    the lag window is user-partitioned over that weekly grain (rows ∝
    users × weeks, never events); the only global operation is the
    TakeOrdered top-{K} on |delta| — a bounded heap per partition, not
    a sort. Cents arithmetic keeps the ranking key exact."""
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "user_id", F.date_trunc("week", F.col("ts").cast("date")).alias("week")
    ).agg(F.round(F.sum("value") * 100).cast("long").alias("rev_c"))
    w = Window.partitionBy("user_id").orderBy("week")
    deltas = (
        weekly.select(
            "user_id",
            "week",
            "rev_c",
            F.lag("rev_c").over(w).alias("prev_c"),
            F.lag("week").over(w).alias("prev_week"),
        )
        .filter(
            F.col("prev_c").isNotNull()
            & (F.col("week") == F.col("prev_week") + F.expr("INTERVAL 7 DAY"))
        )
        .select(
            "user_id",
            F.col("week").cast("date").alias("week"),
            F.round(F.col("rev_c") / 100.0, 2).alias("revenue"),
            F.round(F.col("prev_c") / 100.0, 2).alias("prev_revenue"),
            (F.col("rev_c") - F.col("prev_c")).alias("delta_c"),
        )
    )
    wr = Window.orderBy(F.abs("delta_c").desc(), "user_id", "week")
    return (
        deltas.withColumn("rk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rk") <= WOW_TOP_K)
        .select(
            "user_id",
            "week",
            "revenue",
            "prev_revenue",
            F.round(F.col("delta_c") / 100.0, 2).alias("delta"),
            "rk",
        )
    )


@query(
    "new_vs_returning_daily",
    oracle="""
WITH firsts AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
), user_days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT d.day,
       CAST(count(*) FILTER (WHERE d.day = f.first_day) AS BIGINT) AS new_users,
       CAST(count(*) FILTER (WHERE d.day > f.first_day) AS BIGINT) AS returning_users,
       round(count(*) FILTER (WHERE d.day > f.first_day) * 1.0 / count(*), 4)
         AS returning_share
FROM user_days d JOIN firsts f USING (user_id)
GROUP BY d.day
""",
)
def new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new vs returning active users — the growth-accounting
    split every product dashboard leads with (is activity growth
    acquisition or retention?).

    Plan: both the per-user first day and the distinct (user, day)
    relation reduce map-side before their user-keyed join; the daily
    rollup is days-bounded. No windows, no events-sized shuffle beyond
    the two combinable aggs."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    firsts = days.groupBy("user_id").agg(F.min("day").alias("first_day"))
    j = days.join(firsts, "user_id")
    return j.groupBy("day").agg(
        F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
        .cast("long")
        .alias("new_users"),
        F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
        .cast("long")
        .alias("returning_users"),
        F.round(
            F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            4,
        ).alias("returning_share"),
    )


# ---------------------------------------------------------------------------
# Data-freshness / landing-lag report — the staleness dashboard row.
# ---------------------------------------------------------------------------


@query(
    "data_freshness_report",
    oracle="""
WITH hw AS (SELECT max(ts) AS t FROM events),
per_type AS (
  SELECT event_type,
         max(ts) AS last_ts,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(*) FILTER (WHERE ts > (SELECT t FROM hw) - INTERVAL 24 HOUR)
              AS BIGINT) AS n_last_24h,
         CAST(count(*) FILTER (WHERE ts > (SELECT t FROM hw) - INTERVAL 168 HOUR)
              AS BIGINT) AS n_last_7d
  FROM events GROUP BY event_type
)
SELECT event_type, last_ts,
       CAST(date_diff('second', last_ts, (SELECT t FROM hw)) AS BIGINT)
         AS staleness_s,
       n_events, n_last_24h, n_last_7d,
       round(n_last_24h * 24.0 * 3600 / epoch(
         (SELECT t FROM hw) - (SELECT min(ts) FROM events)) /
         (n_events * 1.0 / 1), 6) + 0.0 AS rate_ratio_24h
FROM per_type
""",
)
def data_freshness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness: last event time, staleness versus the
    corpus high-watermark (the deterministic as-of — wall clock would
    break replays AND the oracle), trailing 24 h / 7 d volumes, and the
    24 h arrival rate as a fraction of the stream's lifetime average —
    the row an ingest on-call reads to tell "this source stopped" from
    "this source is just slow": staleness catches hard stops,
    rate_ratio_24h catches partial losses that never trip a staleness
    alert.

    Plan: ONE combinable aggregate over events (the window counts are
    conditional sums against the broadcast as-of scalar), so the report
    costs a single scan regardless of stream count."""
    ev = load_table(spark, sf_dir, "events")
    asof = ev.agg(
        F.max("ts").alias("t"), F.min("ts").alias("t0")
    )
    per = (
        ev.crossJoin(F.broadcast(asof))
        .groupBy("event_type")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count_if(
                F.col("ts") > F.col("t") - F.expr("INTERVAL 24 HOURS")
            )
            .cast("long")
            .alias("n_last_24h"),
            F.count_if(
                F.col("ts") > F.col("t") - F.expr("INTERVAL 168 HOURS")
            )
            .cast("long")
            .alias("n_last_7d"),
            F.any_value("t").alias("t"),
            F.any_value("t0").alias("t0"),
        )
    )
    lifetime_s = F.col("t").cast("double") - F.col("t0").cast("double")
    return per.select(
        "event_type",
        "last_ts",
        (F.col("t").cast("long") - F.col("last_ts").cast("long")).alias("staleness_s"),
        "n_events",
        "n_last_24h",
        "n_last_7d",
        (
            F.round(
                F.col("n_last_24h") * 24.0 * 3600 / lifetime_s / (F.col("n_events") * 1.0 / 1),
                6,
            )
            + 0.0
        ).alias("rate_ratio_24h"),
    )
