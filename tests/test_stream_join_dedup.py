"""Stream-stream interval join and watermarked streaming dedup, each
verified against its batch twin on the same source files."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.streaming.pipeline import (
    click_attribution_join,
    stream_events,
    streaming_dedup,
)


def _write_events(spark, path, dup_factor=1):
    ev = load_table(spark, SF_SMALL, "events")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(path)
    for _ in range(dup_factor):
        ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(path)
    return ev


def test_stream_stream_click_attribution_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    ev = _write_events(spark, src)
    out = click_attribution_join(spark, src, gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["view_id"], r["click_id"]) for r in spark.sql("select * from attrib").collect()
    }
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("user_id").alias("vu"), F.col("ts").alias("vt")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("cu"), F.col("ts").alias("ct")
    )
    want = {
        (r["view_id"], r["click_id"])
        for r in views.join(
            clicks,
            (F.col("vu") == F.col("cu"))
            & (F.col("ct") >= F.col("vt"))
            & (F.col("ct") < F.col("vt") + F.expr("INTERVAL 30 MINUTES")),
        ).collect()
    }
    assert len(want) > 0
    assert got == want


def test_streaming_dedup_bounds_to_distinct_keys(spark, tmp_path):
    src = str(tmp_path / "dup")
    # write the odd half twice: every odd event is an exact duplicate
    ev = _write_events(spark, src, dup_factor=2)
    out = streaming_dedup(
        stream_events(spark, src), keys=("event_id",), delay="10 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select count(*) c, count(distinct event_id) d from dedup_stream").head()
    # every key survives exactly once and nothing is lost
    assert got["c"] == got["d"] == ev.count()
