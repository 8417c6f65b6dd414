"""Real JDBC execution against embedded Derby (the in-environment
stand-in for the reference's ClickHouse endpoint — general_lib.py:85-103).

Covers what the option-builder unit tests (test_jdbc_builder.py) can't:
the staged write, the partitioned parallel read, database-side watermark
evaluation, and type fidelity through the JDBC round trip.
"""

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

import __spark_entry__ as ent
from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.ingest.jdbc import (
    DERBY_EMBEDDED_DRIVER,
    derby_memory_url,
    incremental_query,
)
from etl_jlp_spark.ingest.loaders import (
    DEFAULT_WATERMARK,
    read_entity_jdbc,
    stage_entity_jdbc,
)

QS = ent.queries()


def test_partitioned_jdbc_read_roundtrip(spark):
    url = derby_memory_url("t_part")
    src = load_table(spark, SF_SMALL, "events").select("event_id", "user_id", "value")
    stage_entity_jdbc(spark, src, url, "ev_part", DERBY_EMBEDDED_DRIVER)
    lo, hi = src.agg(F.min("event_id"), F.max("event_id")).first()
    back = read_entity_jdbc(
        spark,
        url,
        "ev_part",
        DERBY_EMBEDDED_DRIVER,
        partition_column='"event_id"',
        num_partitions=4,
        lower_bound=int(lo),
        upper_bound=int(hi) + 1,
    )
    # the scan is genuinely partitioned: 4 parallel range-sliced queries
    assert back.rdd.getNumPartitions() == 4
    assert "numPartitions=4" in back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == src.count()
    # values survive the round trip exactly (bigint + IEEE double)
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.select("event_id", "user_id", "value").collect()))
    assert a == b


def test_watermark_predicate_evaluates_database_side(spark):
    """The incremental extract's predicate lives inside the pushdown
    subquery — Derby filters, Spark never sees pre-watermark rows."""
    url = derby_memory_url("t_wm")
    src = load_table(spark, SF_SMALL, "events").select("event_id", "ts")
    stage_entity_jdbc(spark, src, url, "ev_wm", DERBY_EMBEDDED_DRIVER)
    q = incremental_query("ev_wm", "ts", DEFAULT_WATERMARK, dialect="derby")
    got = read_entity_jdbc(spark, url, q, DERBY_EMBEDDED_DRIVER)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "JDBCRelation((SELECT * FROM ev_wm" in plan  # subquery IS the relation
    want = src.filter(F.col("ts") > F.lit(DEFAULT_WATERMARK).cast("timestamp"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_spark_filter_pushes_into_jdbc_scan(spark):
    """A Spark-side filter on a plain JDBC relation reaches the database
    (PushedFilters on the JDBC scan node)."""
    url = derby_memory_url("t_push")
    src = load_table(spark, SF_SMALL, "events").select("event_id", "user_id")
    stage_entity_jdbc(spark, src, url, "ev_push", DERBY_EMBEDDED_DRIVER)
    flt = read_entity_jdbc(spark, url, "ev_push", DERBY_EMBEDDED_DRIVER).filter(
        F.col("user_id") > 50
    )
    plan = flt._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "JDBCRelation" in l][0]
    assert "PushedFilters" in scan and "GreaterThan(user_id,50)" in scan, scan
    assert flt.count() == src.filter(F.col("user_id") > 50).count()


def test_registered_query_matches_parquet_incremental(spark):
    """ingest_jdbc_derby (parquet → Derby → partitioned JDBC read) must
    equal the pure-parquet incremental load row-for-row."""
    got = QS["ingest_jdbc_derby"](spark, SF_SMALL)
    want = QS["ingest_incremental_watermark"](spark, SF_SMALL)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
