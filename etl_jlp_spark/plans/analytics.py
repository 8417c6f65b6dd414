"""Analytics layer: TPC-H-shaped queries over the star schema.

The reference's analytical surface is implicit (quality aggregates,
per-entity volume summaries); these queries make the engine's join/agg
capabilities explicit and are the bench headliners. Scale notes:

- q1: scan-heavy single groupBy — Catalyst does map-side partial agg;
  the only shuffle carries ≤ (#flags × #statuses) groups per partition.
- q3/q5: constant-size dims (nation/region) carry explicit broadcast
  hints; SF-scaling tables (customer/supplier/part) are left to AQE,
  which broadcasts them below the threshold and shuffle-joins above —
  the hint would be wrong at 100 TB where customer is multi-GB.
- top-N uses a deterministic tie-break (key asc) so results are stable
  under any partitioning.

All float aggregates are rounded (2 dp) in both engines; sums over
doubles differ only below that precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import query

Q1_CUTOFF = "1998-09-02 00:00:00"


@query(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    # orders is a fact table: shuffle-join on the orderkey; only the
    # filtered customer dimension is broadcast. AQE may still convert
    # the orders side to broadcast at small SF — that's its call.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "q5_local_supplier",
    oracle="""
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey AND c_nationkey = s_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q6_revenue_change",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
)
def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan-filter-agg: every predicate is pushdown-eligible; the
    result is a single row, so the shuffle is one partial-agg exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue")
        )
    )


@query(
    "q7_nation_volume",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                JOIN orders   ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-nation trade volume by year (TPC-H q7 shape): the nation
    filter is applied on both broadcast copies of the dim before the
    fact join, so the disjunction prunes early."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31 00:00:00")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


@query(
    "q13_order_distribution",
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority != '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
""",
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count histogram (TPC-H q13 shape): left join keeps
    zero-order customers; double aggregation, both map-side combined."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).cast("long").alias("custdist"))


@query(
    "q18_large_orders",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(sum_qty, 2) AS sum_qty
FROM (
  SELECT l_orderkey AS o_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 150
) big
JOIN orders USING (o_orderkey)
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-quantity orders (TPC-H q18 shape): the HAVING pre-filter
    reduces the fact side to a handful of keys before any join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


@query(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue ranking (TPC-H q10 shape adapted to the
    available columns): fact⋈fact shuffle join + two broadcast dims."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    oracle="""
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share (TPC-H q14 shape): date-pruned lineitem scan
    ⋈ broadcast part, single conditional aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)) / F.sum(rev),
                4,
            ).alias("promo_revenue_pct"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
    )


@query(
    "q19_brand_discounts",
    oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 5 AND 35)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 40 AND l_quantity BETWEEN 10 AND 50))
  AND l_discount BETWEEN 0.02 AND 0.08
""",
)
def q19_brand_discounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive brand/size/quantity predicate (TPC-H q19 shape):
    the OR-of-ANDs stays a single join+filter — Catalyst evaluates it
    post-join on the broadcast part side."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_discount").between(0.02, 0.08)
    )
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(5, 35))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 40) & F.col("l_quantity").between(10, 50))
    )
    return joined.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


@query(
    "events_by_type_day",
    oracle="""
SELECT event_type,
       CAST(date_trunc('day', ts) AS DATE) AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value,
       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
FROM events
GROUP BY event_type, date_trunc('day', ts)
""",
)
def events_by_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-compatible shape: identical logic runs under
    Structured Streaming with a watermark (see streaming/pipeline.py)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.countDistinct("user_id").cast("long").alias("distinct_users"),
    )


@query(
    "top_customers_by_revenue",
    oracle="""
SELECT c_custkey, c_name,
       round(sum(o_totalprice), 2) AS total_revenue,
       CAST(count(*) AS BIGINT) AS n_orders
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY total_revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
        .orderBy(F.col("total_revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "events_rollup_report",
    oracle="""
SELECT event_type,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value,
       CAST(grouping(event_type) + 2 * grouping(date_trunc('day', ts)) AS BIGINT)
         AS gid
FROM events
GROUP BY ROLLUP (event_type, date_trunc('day', ts))
""",
)
def events_rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity volume report in ONE pass: (type, day) →
    (type) → grand total via ROLLUP — the reference runs its volume
    summary per entity and per run separately (quality_report.py
    volume checks); rollup computes every level from a single scan
    with partial aggregation. gid disambiguates NULL-as-total from a
    genuine NULL group value."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "value"
    )
    return ev.rollup("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        (F.grouping("event_type") + 2 * F.grouping("day")).cast("long").alias("gid"),
    )


@query(
    "events_cube_report",
    oracle="""
SELECT event_type,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value,
       CAST(grouping(event_type) + 2 * grouping(date_trunc('day', ts)) AS BIGINT)
         AS gid
FROM events
GROUP BY CUBE (event_type, date_trunc('day', ts))
""",
)
def events_cube_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE completes the grouping-sets family next to
    ``events_rollup_report``: all FOUR granularities — (type, day),
    (type), (day), grand total — from one scan with partial
    aggregation (the per-day margin is the level ROLLUP cannot give).
    gid disambiguates NULL-as-total from a genuine NULL group value;
    the expansion factor is the fixed 2^k grouping-set count, never
    data-dependent."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "value"
    )
    return ev.cube("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        (F.grouping("event_type") + 2 * F.grouping("day")).cast("long").alias("gid"),
    )


@query(
    "revenue_rollup_shares",
    oracle="""
WITH joined AS (
  SELECT r.r_name, n.n_name,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
), rolled AS (
  SELECT coalesce(r_name, 'ALL') AS region,
         coalesce(n_name, 'ALL') AS nation,
         CASE WHEN GROUPING(r_name) = 1 THEN 'total'
              WHEN GROUPING(n_name) = 1 THEN 'region' ELSE 'nation' END AS lvl,
         CAST(sum(cents) AS BIGINT) AS rev_cents,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM joined GROUP BY ROLLUP (r_name, n_name)
)
SELECT c.region, c.nation, c.lvl,
       round(c.rev_cents / 100.0, 2) AS rev_usd, c.n_orders,
       round(c.rev_cents / CAST(p.rev_cents AS DOUBLE), 4) AS share_of_parent
FROM rolled c
JOIN rolled p
  ON (c.lvl = 'nation' AND p.lvl = 'region' AND p.region = c.region)
  OR (c.lvl = 'region' AND p.lvl = 'total')
  OR (c.lvl = 'total' AND p.lvl = 'total')
""",
)
def revenue_rollup_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical revenue contribution via ROLLUP (region → nation →
    grand total): every nation row carries its share of the region
    subtotal, every region row its share of the total — the one-pass
    grouping-sets answer to a drill-down dashboard (the naive version
    is three separate aggregations and two re-joins of the fact).

    Plan: dims broadcast onto orders, ONE rollup aggregate (Spark
    Expand: each fact row feeds all three grouping sets map-side),
    then the parent share is a self-join of the ≤(regions×nations)-row
    rollup relation — no second fact pass, exact integer cents until
    the share division."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "r_name",
            "n_name",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    rolled = (
        joined.rollup("r_name", "n_name")
        .agg(
            F.sum("cents").cast("long").alias("rev_cents"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.grouping("r_name").alias("g_r"),
            F.grouping("n_name").alias("g_n"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.when(F.col("g_r") == 1, "total")
            .when(F.col("g_n") == 1, "region")
            .otherwise("nation")
            .alias("lvl"),
            "rev_cents",
            "n_orders",
        )
        .localCheckpoint(eager=False)
    )
    c = rolled.alias("c")
    p = rolled.alias("p")
    cond = (
        ((F.col("c.lvl") == "nation") & (F.col("p.lvl") == "region") & (F.col("p.region") == F.col("c.region")))
        | ((F.col("c.lvl") == "region") & (F.col("p.lvl") == "total"))
        | ((F.col("c.lvl") == "total") & (F.col("p.lvl") == "total"))
    )
    return c.join(p, cond).select(
        F.col("c.region").alias("region"),
        F.col("c.nation").alias("nation"),
        F.col("c.lvl").alias("lvl"),
        F.round(F.col("c.rev_cents") / 100.0, 2).alias("rev_usd"),
        F.col("c.n_orders").alias("n_orders"),
        F.round(F.col("c.rev_cents") / F.col("p.rev_cents").cast("double"), 4).alias(
            "share_of_parent"
        ),
    )
