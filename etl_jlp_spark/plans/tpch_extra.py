"""TPC-H adaptations, second tranche: q4/q8/q9/q11/q15/q16/q17/q20/q21/q22.

The testdata schema is a reduced TPC-H (no partsupp, no
commit/receipt dates, no phone), so partsupp-shaped queries are
re-keyed onto lineitem-as-the-part-supplier-relation and "late" is
defined against o_orderdate. What each one exercises:

- q4:  EXISTS → left-semi join with a mixed equi + range condition.
- q8:  market share — 7-relation join, conditional-vs-total ratio agg.
- q9:  profit by (nation, year) — LIKE-filtered part join.
- q11: group-HAVING against a global scalar — computed as an
  unbounded-window total over the (already tiny) per-group aggregate,
  so the base relation is scanned ONCE (no self-join recompute).
- q15: top-revenue supplier via window max on the pre-reduced agg.
- q16: distinct-count with a NOT-IN anti-join supplier blacklist.
- q17: correlated per-part average — window avg over l_partkey, one
  shuffle, instead of the naive agg + self-join double scan.
- q20: semi-join against an agg-HAVING derived supplier list.
- q21: EXISTS + NOT-EXISTS self-joins collapsed into ONE per-order
  aggregate (distinct suppliers vs distinct late suppliers) — the
  100 TB shape: two window-free passes instead of two self-joins.
- q22: anti-join against orders + scalar-average gate.

Scale notes: constant-size dims (nation/region) get explicit
broadcast(); SF-scaling relations (part, supplier, filtered aggs) are
left to AQE so the plan stays valid when they are multi-GB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import query


@query(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with at least one lineitem shipped >90 days after order
    (the late-shipment EXISTS), counted by priority."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    # left-semi keeps each order once no matter how many late lines;
    # Catalyst extracts the equi part for the hash join and applies the
    # range predicate as a join filter.
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


@query(
    "q8_market_share",
    oracle="""
WITH all_sales AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY')
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
             / sum(volume), 4) AS mkt_share
FROM all_sales GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_5's share of ECONOMY-part revenue sold into ASIA, by
    order year."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nk = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            F.col("n_nationkey").alias("cust_nk")
        )
    )
    supp_nation = F.broadcast(
        nation.select(F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("supp_nation"))
    )
    cust = load_table(spark, sf_dir, "customer").join(
        asia_nk, F.col("c_nationkey") == F.col("cust_nk")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        supp_nation, F.col("s_nationkey") == F.col("supp_nk")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_profit",
    oracle="""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity), 2) AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on red parts by supplier nation and order year (retail
    price at 60% stands in for the missing ps_supplycost)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            profit.alias("p"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("p"), 2).alias("profit"))
    )


@query(
    "q11_important_stock",
    oracle="""
WITH per_part AS (
  SELECT l_partkey, sum(l_extendedprice) AS raw_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey)
SELECT l_partkey, round(raw_value, 2) AS value
FROM (SELECT l_partkey, raw_value,
             sum(raw_value) OVER () AS total FROM per_part)
WHERE raw_value > total * 0.001
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts representing >0.1% of NATION_3's total traded value.
    The global total is an unbounded window over the per-part
    aggregate: the fact table is scanned once, the window shuffles
    only #distinct-parts pre-reduced rows."""
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    per_part = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("raw_value"))
    )
    total = F.sum("raw_value").over(Window.partitionBy())
    return (
        per_part.withColumn("total", total)
        .filter(F.col("raw_value") > F.col("total") * 0.001)
        .select("l_partkey", F.round("raw_value", 2).alias("value"))
    )


@query(
    "q15_top_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the max quarterly revenue. Revenue is rounded
    BEFORE the max-equality so both engines compare identical values;
    the scalar max is a window over the tiny per-supplier aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    top = rev.withColumn("mx", F.max("total_revenue").over(Window.partitionBy())).filter(
        F.col("total_revenue") == F.col("mx")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return supp.join(top, supp.s_suppkey == top.l_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@query(
    "q16_part_supplier_cnt",
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
  AND p_size IN (5, 10, 15, 20)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q16_part_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, type, size), excluding
    negative-balance suppliers (the complaints stand-in) via
    anti-join. lineitem is the part↔supplier relation (no partsupp)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(5, 10, 15, 20)
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity",
    oracle="""
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost to small-quantity orders of Brand#23 parts. The
    correlated per-part average is a window over l_partkey: one
    shuffle of only the brand's lineitems, no agg+self-join double
    scan of the fact table."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_li = li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
    lim = 0.2 * F.avg("l_quantity").over(Window.partitionBy("l_partkey"))
    return (
        brand_li.withColumn("lim", lim)
        .filter(F.col("l_quantity") < F.col("lim"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q20_excess_shippers",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE '%blue%'
      AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > 300)
""",
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3 suppliers who moved >300 units of blue parts in 1998
    (q20's excess-stock semi-join, re-keyed onto shipped quantity)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    heavy = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_suppkey")
    )
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@query(
    "q21_suppliers_waiting",
    oracle="""
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND n_name = 'NATION_7'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sole-late suppliers on multi-supplier finished orders ("late" =
    shipped >60 days after order date). The EXISTS / NOT-EXISTS pair
    collapses into ONE per-order aggregate — distinct suppliers ≥ 2
    and distinct LATE suppliers == 1 — replacing two fact-table
    self-joins with a single pre-reduced join."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "late",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).cast("int"),
    )
    per_order = lo.groupBy("o_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        lo.filter(F.col("late") == 1)
        .join(per_order, "o_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
WITH pool AS (
  SELECT c_custkey, c_nationkey, c_acctbal
  FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
avg_bal AS (SELECT avg(c_acctbal) AS ab FROM pool WHERE c_acctbal > 0.0)
SELECT c_nationkey AS cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM pool, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
""",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-but-dormant customers per nation: above-average balance,
    no order since 2000 (every customer has SOME order in this data,
    so dormancy replaces never-ordered). Anti-join against the
    date-pruned orders scan; the scalar average rides in via a
    broadcast cross-join of a 1-row aggregate."""
    pool = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    avg_bal = pool.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        pool.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, pool.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
WITH offer AS (
  SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
         round(avg(l_extendedprice / l_quantity), 4) AS unit_cost
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_type = 'STANDARD' AND p_size = 15 AND r_name = 'EUROPE'
  GROUP BY p_partkey, s_suppkey, s_name, s_acctbal, n_name)
SELECT s_acctbal, s_name, n_name, p_partkey, unit_cost
FROM (SELECT *, min(unit_cost) OVER (PARTITION BY p_partkey) AS mn FROM offer)
WHERE unit_cost = mn
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest EUROPE supplier per STANDARD/size-15 part — q2's
    correlated min re-keyed onto observed unit sell price (no
    partsupp). unit_cost is rounded BEFORE the min-equality so both
    engines compare identical values; the min is a window over the
    tiny per-(part,supplier) aggregate."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") == 15)
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    offer = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias("unit_cost"))
    )
    mn = F.min("unit_cost").over(Window.partitionBy("p_partkey"))
    return (
        offer.withColumn("mn", mn)
        .filter(F.col("unit_cost") == F.col("mn"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "unit_cost")
    )


@query(
    "q12_ship_speed",
    oracle="""
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 30 THEN 'FAST'
            WHEN date_diff('day', o_orderdate, l_shipdate) < 90 THEN 'NORMAL'
            ELSE 'SLOW' END AS ship_speed,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY ship_speed
""",
)
def q12_ship_speed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q12's priority-by-shipmode conditional agg, re-keyed onto a
    derived ship-latency class (no l_shipmode column). Integer-day
    difference on micros-backed timestamps is exact in both engines."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    speed = (
        F.when(days < 30, "FAST").when(days < 90, "NORMAL").otherwise("SLOW")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(speed.alias("ship_speed"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


COPURCHASE_TOP_K = 40
COPURCHASE_MIN_N = 2


@query(
    "part_copurchase_lift",
    oracle=f"""
WITH pf AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM lineitem
), pk AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
), pcount AS (
  SELECT pk, CAST(count(*) AS BIGINT) AS c FROM pk GROUP BY pk
), pairs AS (
  SELECT a.pk AS part_a, b.pk AS part_b, CAST(count(*) AS BIGINT) AS n_co
  FROM pk a JOIN pk b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2
  HAVING count(*) >= {COPURCHASE_MIN_N}
), scored AS (
  SELECT p.part_a, p.part_b, p.n_co, ca.c AS n_a, cb.c AS n_b,
         round(CAST(p.n_co AS DOUBLE) * (SELECT n_orders FROM pf)
               / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)), 4) AS lift
  FROM pairs p
  JOIN pcount ca ON p.part_a = ca.pk
  JOIN pcount cb ON p.part_b = cb.pk
)
SELECT part_a, part_b, n_co, n_a, n_b, lift,
       CAST(row_number() OVER (ORDER BY n_co DESC, lift DESC, part_a, part_b)
            AS BIGINT) AS rk
FROM scored
QUALIFY rk <= {COPURCHASE_TOP_K}
""",
)
def part_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket analysis on order contents: the top part pairs
    bought in the same order, with co-occurrence count and lift
    n_co·N/(n_a·n_b) (>1 ⇒ bought together more than chance). The
    events-side association rules (assoc_rules_events) get their
    retail-side twin here.

    Plan: the pair self-join runs per order key, so its width is
    Σ lines(order)² — bounded by the ≤7-line order format, ∝ orders,
    never parts². Part marginals join the pair relation (part-count
    sized); final top-k is TakeOrdered with a fully deterministic
    (count, lift, pair) ordering."""
    li = load_table(spark, sf_dir, "lineitem")
    pk = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")).distinct()
    n_orders = pk.agg(F.countDistinct("ok").cast("long").alias("n_orders"))
    pcount = pk.groupBy("pk").agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = pk.select(F.col("ok"), F.col("pk").alias("part_a"))
    b = pk.select(F.col("ok"), F.col("pk").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_co"))
        .filter(F.col("n_co") >= COPURCHASE_MIN_N)
    )
    ca = pcount.select(F.col("pk").alias("part_a"), F.col("c").alias("n_a"))
    cb = pcount.select(F.col("pk").alias("part_b"), F.col("c").alias("n_b"))
    scored = (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_co",
            "n_a",
            "n_b",
            F.round(
                F.col("n_co").cast("double")
                * F.col("n_orders")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                4,
            ).alias("lift"),
        )
    )
    w = Window.orderBy(F.desc("n_co"), F.desc("lift"), "part_a", "part_b")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= COPURCHASE_TOP_K)
    )


@query(
    "customer_repeat_cohorts",
    oracle="""
WITH firsts AS (
  SELECT o_custkey, min(year(o_orderdate)) AS cohort
  FROM orders GROUP BY o_custkey
), activity AS (
  SELECT DISTINCT o.o_custkey, f.cohort,
         year(o.o_orderdate) - f.cohort AS k
  FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
  WHERE year(o.o_orderdate) - f.cohort BETWEEN 0 AND 2
), sizes AS (
  SELECT cohort, CAST(count(*) AS BIGINT) AS n_customers FROM firsts GROUP BY cohort
)
SELECT a.cohort AS cohort_year, CAST(a.k AS INT) AS years_since_first,
       s.n_customers,
       CAST(count(*) AS BIGINT) AS n_active,
       round(count(*) / CAST(s.n_customers AS DOUBLE), 4) AS retention
FROM activity a JOIN sizes s ON s.cohort = a.cohort
GROUP BY a.cohort, a.k, s.n_customers
""",
)
def customer_repeat_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-side acquisition cohorts: customers grouped by first-order
    year, with the share still ordering 0/1/2 years later — the
    repeat-purchase retention triangle (the TPC-H twin of the
    events-side user_retention_cohorts).

    Plan: first-order year is one customer-keyed aggregate; activity
    is a distinct (customer, offset) relation joined back on the
    customer key (same shuffle key — one exchange reused); the
    retention grid is cohorts×3 rows. Everything integer until the
    share division."""
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).alias("cohort")
    )
    activity = (
        orders.join(firsts, "o_custkey")
        .select(
            "o_custkey",
            "cohort",
            (F.year("o_orderdate") - F.col("cohort")).alias("k"),
        )
        .filter((F.col("k") >= 0) & (F.col("k") <= 2))
        .distinct()
    )
    sizes = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    return (
        activity.groupBy("cohort", "k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .join(F.broadcast(sizes), "cohort")
        .select(
            F.col("cohort").alias("cohort_year"),
            F.col("k").cast("int").alias("years_since_first"),
            "n_customers",
            "n_active",
            F.round(F.col("n_active") / F.col("n_customers").cast("double"), 4).alias(
                "retention"
            ),
        )
    )


# ---------------------------------------------------------------------------
# GROUPING SETS revenue report: the explicit-sets sibling of
# events_rollup_report (ROLLUP) and events_cube_report (CUBE) — only
# the subtotal combinations a dashboard actually renders, computed in
# one pass.
# ---------------------------------------------------------------------------


@query(
    "revenue_grouping_sets",
    oracle="""
SELECT COALESCE(n.n_name, 'ALL') AS nation,
       CAST(COALESCE(year(o.o_orderdate), -1) AS BIGINT) AS yr,
       CAST(grouping(n.n_name) AS BIGINT) AS is_nation_total,
       CAST(grouping(year(o.o_orderdate)) AS BIGINT) AS is_year_total,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice) AS BIGINT)) AS BIGINT) AS rev
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY GROUPING SETS ((n.n_name, year(o.o_orderdate)),
                        (n.n_name), (year(o.o_orderdate)), ())
""",
)
def revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order revenue by GROUPING SETS ((nation, year), (nation),
    (year), ()): exactly the four subtotal layers a drill-down
    dashboard renders, in ONE aggregation pass (Spark expands the sets
    map-side — the fact table is never re-scanned per layer, the same
    contract the ROLLUP/CUBE twins pin). GROUPING() flags disambiguate
    a real 'ALL' value from a subtotal row; whole-dollar revenue sums
    are exact integers.

    Plan: orders⋈customer (AQE decides the big join)⋈broadcast nation,
    then a single expand+agg."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation_v"),
            F.year("o_orderdate").alias("yr_v"),
            F.round("o_totalprice").cast("long").alias("price"),
        )
    )
    gs = joined.groupingSets(
        [["nation_v", "yr_v"], ["nation_v"], ["yr_v"], []],
        "nation_v",
        "yr_v",
    ).agg(
        F.grouping("nation_v").cast("long").alias("is_nation_total"),
        F.grouping("yr_v").cast("long").alias("is_year_total"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("price").cast("long").alias("rev"),
    )
    return gs.select(
        F.coalesce("nation_v", F.lit("ALL")).alias("nation"),
        F.coalesce(F.col("yr_v").cast("long"), F.lit(-1)).alias("yr"),
        "is_nation_total",
        "is_year_total",
        "n_orders",
        "rev",
    )


# ---------------------------------------------------------------------------
# ABC inventory classification: parts ranked by revenue, classified by
# cumulative-share thresholds (A ≤ 80 %, B ≤ 95 %, C rest) — the
# merchandising counterpart of pareto_frontier_docs (that op keeps
# non-dominated rows; this one cuts the cumulative revenue curve).
# ---------------------------------------------------------------------------

ABC_A_NUM, ABC_A_DEN = 4, 5  # A-class boundary: cum_share ≤ 4/5
ABC_B_NUM, ABC_B_DEN = 19, 20  # B-class boundary: cum_share ≤ 19/20


@query(
    "abc_inventory_class",
    oracle=f"""
WITH part_rev AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
              AS BIGINT) AS rev
  FROM lineitem GROUP BY 1
), ranked AS (
  SELECT l_partkey, rev,
         sum(rev) OVER (ORDER BY rev DESC, l_partkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(rev) OVER () AS total
  FROM part_rev
), classed AS (
  SELECT CASE WHEN cum * {ABC_A_DEN} <= total * {ABC_A_NUM} THEN 'A'
              WHEN cum * {ABC_B_DEN} <= total * {ABC_B_NUM} THEN 'B'
              ELSE 'C' END AS abc_class,
         rev, total
  FROM ranked
)
SELECT abc_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       round(sum(rev) / 100.0, 2) + 0.0 AS revenue,
       round(CAST(sum(rev) AS DOUBLE) / any_value(total), 6) + 0.0 AS rev_share
FROM classed GROUP BY 1
""",
)
def abc_inventory_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC analysis of parts by discounted revenue: rank parts by
    exact cents revenue (ties broken by partkey), cut the cumulative
    curve at 80 %/95 %, and report per class the part count, revenue
    and share. Class boundaries are decided by INTEGER cross-products
    (cum·5 ≤ total·4), so a part landing exactly on a boundary
    classifies identically in both engines — no float cumulative
    share is ever compared.

    Plan: one map-side-combinable groupBy(l_partkey) reduces the fact
    table to the PART grain before any window; the global rank window
    then runs over |parts| rows, not |lineitem|. That window is a
    single ordered partition — acceptable because parts ≪ facts at
    every scale (the two-phase partial-cumsum rewrite documented in
    SURVEY §6 is the 1000-executor fallback); the final agg is 3
    rows."""
    li = load_table(spark, sf_dir, "lineitem")
    part_rev = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long"))
        .cast("long")
        .alias("rev")
    )
    w_cum = (
        Window.orderBy(F.col("rev").desc(), "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    ranked = part_rev.select(
        "rev",
        F.sum("rev").over(w_cum).alias("cum"),
        F.sum("rev").over(w_all).alias("total"),
    )
    classed = ranked.select(
        F.when(F.col("cum") * ABC_A_DEN <= F.col("total") * ABC_A_NUM, "A")
        .when(F.col("cum") * ABC_B_DEN <= F.col("total") * ABC_B_NUM, "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev",
        "total",
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.round(F.sum("rev") / 100.0, 2).alias("revenue"),
        F.round(F.sum("rev").cast("double") / F.any_value("total"), 6).alias("rev_share"),
    )


# ---------------------------------------------------------------------------
# Price-index report: Laspeyres / Paasche / Fisher year-over-year for
# the parts traded in both years — the index-number economics the mix-
# shift decomposition (plans/inference.py) stops short of.
# ---------------------------------------------------------------------------

PRICE_IDX_Y0, PRICE_IDX_Y1 = 1996, 1997
PRICE_E4 = 10000  # e4-quantized unit prices (cents·1e-4 resolution)


@query(
    "price_index_report",
    oracle=f"""
WITH py AS (
  SELECT l_partkey, CAST(year(l_shipdate) AS INT) AS yr,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem
  WHERE year(l_shipdate) IN ({PRICE_IDX_Y0}, {PRICE_IDX_Y1})
  GROUP BY 1, 2
), priced AS (
  SELECT l_partkey, yr, qty,
         CAST(round(CAST(rev AS DOUBLE) * {PRICE_E4} / qty) AS BIGINT) AS p_e4
  FROM py
), paired AS (
  SELECT a.l_partkey,
         a.p_e4 AS p0, a.qty AS q0, b.p_e4 AS p1, b.qty AS q1
  FROM priced a JOIN priced b
    ON a.l_partkey = b.l_partkey AND a.yr = {PRICE_IDX_Y0} AND b.yr = {PRICE_IDX_Y1}
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_parts,
         CAST(sum(CAST(p1 AS DECIMAL(38,0)) * q0) AS DECIMAL(38,0)) AS l_num,
         CAST(sum(CAST(p0 AS DECIMAL(38,0)) * q0) AS DECIMAL(38,0)) AS l_den,
         CAST(sum(CAST(p1 AS DECIMAL(38,0)) * q1) AS DECIMAL(38,0)) AS p_num,
         CAST(sum(CAST(p0 AS DECIMAL(38,0)) * q1) AS DECIMAL(38,0)) AS p_den
  FROM paired
)
SELECT n_parts,
       round(CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE), 6) + 0.0 AS laspeyres,
       round(CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE), 6) + 0.0 AS paasche,
       round(sqrt(CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE)
                  * CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE)), 6) + 0.0 AS fisher
FROM agg
""",
)
def price_index_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres (base-year basket), Paasche (current basket) and
    Fisher (geometric mean) price indices {Y1} vs {Y0} over the parts
    shipped in both years. Unit prices are e4-quantized integers
    (round(rev·1e4/qty) — IEEE-deterministic from exact integer
    operands), basket sums accumulate in DECIMAL(38,0), and each
    index is one double division.

    Plan: one lineitem scan filtered to the two years (partition-
    prunable on l_shipdate), one (part, year) groupBy, a part-grain
    self-join pairing the two years, and a 1-row basket agg."""
    li = load_table(spark, sf_dir, "lineitem")
    py = (
        li.where(F.year("l_shipdate").isin(PRICE_IDX_Y0, PRICE_IDX_Y1))
        .groupBy("l_partkey", F.year("l_shipdate").cast("int").alias("yr"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("long").alias("rev"),
            F.sum(F.round("l_quantity").cast("long")).cast("long").alias("qty"),
        )
    )
    priced = py.select(
        "l_partkey",
        "yr",
        "qty",
        F.round(F.col("rev").cast("double") * PRICE_E4 / F.col("qty")).cast("long").alias("p_e4"),
        # part-grain (≤ |parts|·2 rows) and consumed by both year sides of
        # the pairing self-join — checkpoint so the fact scan runs once
    ).localCheckpoint(eager=True)
    a = priced.where(F.col("yr") == PRICE_IDX_Y0).select(
        "l_partkey", F.col("p_e4").alias("p0"), F.col("qty").alias("q0")
    )
    b = priced.where(F.col("yr") == PRICE_IDX_Y1).select(
        "l_partkey", F.col("p_e4").alias("p1"), F.col("qty").alias("q1")
    )
    paired = a.join(b, "l_partkey")
    agg = paired.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.col("p1").cast("decimal(38,0)") * F.col("q0")).cast("decimal(38,0)").alias("l_num"),
        F.sum(F.col("p0").cast("decimal(38,0)") * F.col("q0")).cast("decimal(38,0)").alias("l_den"),
        F.sum(F.col("p1").cast("decimal(38,0)") * F.col("q1")).cast("decimal(38,0)").alias("p_num"),
        F.sum(F.col("p0").cast("decimal(38,0)") * F.col("q1")).cast("decimal(38,0)").alias("p_den"),
    )
    lasp = F.col("l_num").cast("double") / F.col("l_den").cast("double")
    paas = F.col("p_num").cast("double") / F.col("p_den").cast("double")
    return agg.select(
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


price_index_report.__doc__ = (price_index_report.__doc__ or "").format(
    Y0=PRICE_IDX_Y0, Y1=PRICE_IDX_Y1
)


# ---------------------------------------------------------------------------
# Newsvendor stocking levels: the critical-fractile quantile of daily
# demand for the highest-volume parts — the inventory answer ABC
# classification (which parts matter) leads into (how much of them to
# hold).
# ---------------------------------------------------------------------------

NV_TOP_PARTS = 5
NV_CU, NV_CO = 4, 1  # underage:overage cost ratio → critical fractile 0.8


@query(
    "newsvendor_stock_level",
    oracle=f"""
WITH daily AS (
  SELECT l_partkey, CAST(l_shipdate AS DATE) AS day,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1, 2
), top AS (
  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS total_qty
  FROM daily GROUP BY 1
  ORDER BY sum(qty) DESC, l_partkey LIMIT {NV_TOP_PARTS}
)
SELECT t.l_partkey, t.total_qty,
       CAST(count(*) AS BIGINT) AS n_ship_days,
       round(avg(d.qty), 4) + 0.0 AS mean_daily_qty,
       round(quantile_cont(d.qty, {NV_CU} / ({NV_CU} + {NV_CO})), 4) + 0.0
         AS stock_level
FROM top t JOIN daily d ON t.l_partkey = d.l_partkey
GROUP BY 1, 2
""",
)
def newsvendor_stock_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor critical-fractile stocking level q* = F⁻¹(c_u/(c_u +
    c_o)) = the {Q} quantile of observed daily shipped quantity, for
    the top-{K} parts by volume (shipment days only — zero-demand days
    are a gap-fill policy choice documented here, not silently
    assumed). Daily quantities are integers, so the interpolated
    fractile and the mean are exact-operand doubles.

    Plan: one (part, day) agg (combinable), TakeOrdered top-k,
    broadcast semi-join back — percentile runs over k parts' day
    series only."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy("l_partkey", F.to_date("l_shipdate").alias("day")).agg(
        F.sum(F.round("l_quantity").cast("long")).cast("long").alias("qty")
    ).localCheckpoint(eager=True)  # part-day grain; consumed by top + quantiles
    top = (
        daily.groupBy("l_partkey")
        .agg(F.sum("qty").cast("long").alias("total_qty"))
        .orderBy(F.desc("total_qty"), "l_partkey")
        .limit(NV_TOP_PARTS)
    )
    frac = NV_CU / (NV_CU + NV_CO)
    return (
        F.broadcast(top)
        .join(daily, "l_partkey")
        .groupBy("l_partkey", "total_qty")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ship_days"),
            F.round(F.avg("qty"), 4).alias("mean_daily_qty"),
            F.round(F.expr(f"percentile(qty, {frac}D)"), 4).alias("stock_level"),
        )
    )


newsvendor_stock_level.__doc__ = (newsvendor_stock_level.__doc__ or "").format(
    K=NV_TOP_PARTS, Q=NV_CU / (NV_CU + NV_CO)
)
