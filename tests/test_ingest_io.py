"""Sink layer tests: medallion write/readback round-trips, archive
step, bool-string normalization."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.ingest.writers import (
    archive_parquet,
    normalize_bool_strings,
    write_entity,
)


def test_medallion_roundtrip_parquet_partitioned(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events").withColumn("day", F.to_date("ts"))
    path = write_entity(
        ev, str(tmp_path / "01landzone"), "streaming-sources", "events", "parquet",
        "20240201", partition_cols=("day",),
    )
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    # partition pruning: reading one day touches one partition dir
    one_day = back.filter(F.col("day") == "2024-01-05")
    plan = one_day._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan


def test_csv_json_roundtrip(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events").select("event_id", "user_id", "event_type")
    for fmt in ("csv", "json"):
        p = write_entity(ev, str(tmp_path / "01landzone"), "b", "events", fmt, "20240201")
        back = spark.read.format(fmt).option("header", "true").option("inferSchema", "true").load(p)
        assert back.count() == ev.count()


def test_archive_step(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events")
    p = archive_parquet(ev, str(tmp_path / "00fs"), "streaming-sources", "events", "20240201")
    assert "archives" in p
    assert spark.read.parquet(p).count() == ev.count()


def test_normalize_bool_strings(spark):
    df = spark.createDataFrame(
        [("true", "yes", "1"), ("FALSE", "no", "2"), (None, "yes", "3")],
        "flag string, answer string, id string",
    )
    out = normalize_bool_strings(df)
    assert dict(out.dtypes)["flag"] == "boolean"
    assert dict(out.dtypes)["answer"] == "string"  # not a bool domain
    assert dict(out.dtypes)["id"] == "string"
    vals = [r["flag"] for r in out.orderBy("id").collect()]
    assert vals == [True, False, None]
