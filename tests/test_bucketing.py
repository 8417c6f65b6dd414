"""Bucketed co-located join: the 100 TB strategy for repeated
fact⋈fact joins (orders⋈lineitem on orderkey). Writing both sides
bucketed by the join key lets the join run with ZERO exchanges —
asserted on the physical plan."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from etl_jlp_spark.catalog import load_table


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # warehouse.dir is a static conf — use the session default location
    # and clean the tables up afterwards
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketed")
    li = load_table(spark, SF_SMALL, "lineitem")
    orders = load_table(spark, SF_SMALL, "orders")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("bucketed.lineitem_b")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bucketed.orders_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS bucketed.lineitem_b")
    spark.sql("DROP TABLE IF EXISTS bucketed.orders_b")
    spark.sql("DROP DATABASE IF EXISTS bucketed")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    # disable broadcast so the join strategy is the bucket-aware
    # sort-merge join (at real scale neither side broadcasts anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bucketed.lineitem_b").join(
            spark.table("bucketed.orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan[:1500]
        # and it computes the right thing
        n = j.count()
        li = spark.table("bucketed.lineitem_b").count()
        assert n == li  # every lineitem has exactly one order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_agg_avoids_shuffle(spark, warehouse):
    agg = spark.table("bucketed.lineitem_b").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert agg.count() > 0
