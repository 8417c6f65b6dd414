"""applyInPandasWithState sessionizer: streaming output must equal the
batch window-function sessionization on the same data."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.operators.sessionize import with_session_id
from etl_jlp_spark.streaming.pipeline import stream_events
from etl_jlp_spark.streaming.stateful import sessionize_stateful
import pytest
# Wall-clock-bound (streaming triggers / state timeouts): excluded from the
# default run so the driver test window completes (r11); run via -m slow.
pytestmark = pytest.mark.slow



def test_stateful_sessionize_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    ev = load_table(spark, SF_SMALL, "events")
    ev.coalesce(1).write.mode("overwrite").parquet(src)

    out = sessionize_stateful(stream_events(spark, src))
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["event_id"]: r["session_id"]
        for r in spark.sql("select * from stateful_sessions").collect()
    }
    want = {
        r["event_id"]: r["session_id"]
        for r in with_session_id(ev.select("event_id", "user_id", "ts")).collect()
    }
    assert len(got) == len(want)
    assert got == want


def test_stateful_time_on_page_matches_batch(spark, tmp_path):
    """One-shot run: every event with a successor gets the real gap —
    identical to the batch window lead; last-per-user events stay HELD
    in state (emitted only on timeout)."""
    from etl_jlp_spark.operators.sessionize import with_time_on_page
    from etl_jlp_spark.streaming.stateful import time_on_page_stateful

    src = str(tmp_path / "src")
    ev = load_table(spark, SF_SMALL, "events")
    ev.coalesce(1).write.mode("overwrite").parquet(src)

    q = (
        time_on_page_stateful(stream_events(spark, src))
        .writeStream.format("memory")
        .queryName("stateful_top")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["event_id"]: r["raw_time_on_page"]
        for r in spark.sql("select * from stateful_top").collect()
    }
    batch = with_time_on_page(ev.select("event_id", "user_id", "ts"))
    w = F.lead("ts").over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window
        .partitionBy("user_id").orderBy("ts", "event_id")
    )
    want = {
        r["event_id"]: r["raw_time_on_page"]
        for r in batch.withColumn("nxt", w).filter(F.col("nxt").isNotNull()).collect()
    }
    assert got == want


def test_stateful_time_on_page_cross_batch_boundary(spark, tmp_path):
    """Two micro-batches, one checkpoint: the event held at the end of
    batch N is finalized by its batch-N+1 successor with the REAL gap —
    the streaming equivalent of patch_time_on_page."""
    import datetime as dt

    from etl_jlp_spark.streaming.stateful import time_on_page_stateful

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def run_once():
        # memory sink cannot recover a checkpoint; the file sink is the
        # restartable shape a real deployment uses
        q = (
            time_on_page_stateful(stream_events(spark, str(src)))
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    batch1 = spark.createDataFrame(
        [(1, t0, 100, "view", 1.0, "{}"), (2, t0 + dt.timedelta(seconds=60), 100, "view", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    batch1.coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    got1 = {r["event_id"]: r["raw_time_on_page"]
            for r in spark.read.parquet(out).collect()}
    assert got1 == {1: 60.0}  # event 2 is held, not defaulted

    batch2 = spark.createDataFrame(
        [(3, t0 + dt.timedelta(seconds=90), 100, "view", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    batch2.coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    got2 = {r["event_id"]: r["raw_time_on_page"]
            for r in spark.read.parquet(out).collect()}
    assert got2[2] == 30.0  # boundary event finalized with the real gap
