"""Date-partitioned lake layout: the 100 TB strategy for incremental /
time-range reads (complementing the bucketed-join layout in
test_bucketing.py). Events written `partitionBy(event_date)` give a
time-range query directory-level pruning — the scan must list ONLY the
matching partitions, asserted on the physical plan and on the scan's
partition-count metadata.

This is the cluster shape of the reference's watermark-incremental
load (dwh_lab/dwh/ingest_click_house_incremental_load_browsinghistory.py:25-60):
with time-partitioned data the `ts > watermark` predicate stops being
row-group skipping and becomes whole-directory pruning.
"""

import pytest
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def dated_events_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lake") / "events_by_day")
    ev = load_table(spark, SF_SMALL, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    ev.write.mode("overwrite").partitionBy("event_date").parquet(path)
    return path


def test_time_range_scan_prunes_partitions(spark, dated_events_dir):
    ev = spark.read.parquet(dated_events_dir)
    n_days = ev.select("event_date").distinct().count()
    assert n_days > 3  # layout actually split by day

    one_day = ev.filter(F.col("event_date") == "2024-01-15")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # the date predicate must land in PartitionFilters (directory
    # pruning), NOT in PushedFilters/Filter (row-level work)
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_date" in pf, plan[:1500]

    got = one_day.count()
    want = ev.where(F.to_date("ts") == "2024-01-15").count()
    assert got == want and got > 0


def test_watermark_incremental_prunes_to_new_days(spark, dated_events_dir):
    """ts > watermark on the partitioned layout reads only post-watermark
    directories — the incremental load touches new data only."""
    ev = spark.read.parquet(dated_events_dir)
    inc = ev.filter(F.col("event_date") > "2024-01-20")
    plan = inc._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_date" in pf and ">" in pf, pf
    # correctness of the pruned read vs an unpartitioned filter
    flat = load_table(spark, SF_SMALL, "events")
    want = flat.filter(F.to_date("ts") > "2024-01-20").count()
    assert inc.count() == want
