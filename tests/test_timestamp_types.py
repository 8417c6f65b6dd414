"""Timestamp-type robustness: the engine must behave identically whether
the driver's session resolves the testdata parquet timestamps as
TIMESTAMP (LTZ) or TIMESTAMP_NTZ.

Regression for the round-3 driver failure: the regenerated testdata
stores plain micros with isAdjustedToUTC=false, which Spark 4's default
``inferTimestampNTZ`` reads as TIMESTAMP_NTZ — and ``F.unix_micros``
(LTZ-only) threw in sessionize / time_on_page / asof_join /
preprocess_pipeline, killing 6 correctness rows and the entire bench.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.functions.timeutil import epoch_us
from etl_jlp_spark.operators.joins import asof_join_latest
from etl_jlp_spark.operators.sessionize import with_session_id, with_time_on_page

from .conftest import SF_SMALL

ROWS = [
    (1, 101, "2024-02-01 10:00:00"),
    (2, 101, "2024-02-01 10:10:00"),
    (3, 101, "2024-02-01 11:30:00"),  # 80-min gap -> new session
    (4, 202, "2024-02-01 09:59:59"),
    (5, 202, "2024-02-02 00:00:00"),
]


def _frame(spark, ts_type: str):
    df = spark.createDataFrame(ROWS, "event_id long, user_id long, ts_s string")
    conv = F.to_timestamp_ntz if ts_type == "ntz" else F.to_timestamp
    return df.select("event_id", "user_id", conv("ts_s").alias("ts"))


def test_epoch_us_matches_across_timestamp_types(spark):
    ltz = _frame(spark, "ltz").select("event_id", epoch_us(F.col("ts")).alias("us"))
    ntz = _frame(spark, "ntz").select("event_id", epoch_us(F.col("ts")).alias("us"))
    assert sorted(map(tuple, ltz.collect())) == sorted(map(tuple, ntz.collect()))


@pytest.mark.parametrize("op", ["sessionize", "time_on_page"])
def test_session_ops_accept_ntz(spark, op):
    fn = with_session_id if op == "sessionize" else with_time_on_page
    ltz = fn(_frame(spark, "ltz"))
    ntz = fn(_frame(spark, "ntz"))
    out_cols = [c for c in ltz.columns if c != "ts"]
    assert sorted(map(tuple, ltz.select(out_cols).collect())) == sorted(
        map(tuple, ntz.select(out_cols).collect())
    )
    # sanity: the gap really split user 101 into two sessions
    if op == "sessionize":
        sess = {r["event_id"]: r["session_id"] for r in ntz.collect()}
        assert sess[1] == sess[2] == 1 and sess[3] == 2


def test_asof_join_accepts_ntz(spark):
    ev = _frame(spark, "ntz")
    left = ev.filter(F.col("event_id") >= 3).withColumn("value", F.lit(1.0))
    right = ev.filter(F.col("event_id") < 3).select(
        "user_id", "ts", F.lit(2.0).alias("value")
    )
    joined = asof_join_latest(left, right, "user_id", "ts", "ts", "value")
    got = {r["event_id"]: r["__asof"] for r in joined.collect()}
    assert got[3] is not None  # user 101 has a prior event
    assert got[4] is None and got[5] is None  # user 202 has none


def test_catalog_normalizes_parquet_timestamps_to_ltz(spark):
    """Whatever physical type the testdata carries, the catalog must hand
    operators the classic TIMESTAMP type (epoch functions available)."""
    for table, col in [("events", "ts"), ("orders", "o_orderdate"), ("lineitem", "l_shipdate")]:
        df = load_table(spark, SF_SMALL, table)
        assert dict(df.dtypes)[col] == "timestamp", (table, col, df.dtypes)


def test_queries_survive_ntz_default_timestamp_type(spark):
    """A driver session may set spark.sql.timestampType=TIMESTAMP_NTZ,
    making every `cast('timestamp')` literal NTZ. Comparisons against
    the catalog's LTZ columns must still resolve (Spark coerces), so
    the filter-heavy queries keep working under that drift."""
    import __spark_entry__ as ent

    prev = spark.conf.get("spark.sql.timestampType")
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    try:
        qs = ent.queries()
        for name in ("q1_pricing_summary", "ingest_incremental_watermark", "sessionize"):
            assert qs[name](spark, SF_SMALL).count() > 0, name
    finally:
        spark.conf.set("spark.sql.timestampType", prev)
