"""applyInPandasWithState sessionizer: streaming output must equal the
batch window-function sessionization on the same data."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.operators.sessionize import with_session_id
from etl_jlp_spark.streaming.pipeline import stream_events
from etl_jlp_spark.streaming.stateful import sessionize_stateful


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
