"""Crash-injection proof of the exactly-once sink claim.

Every other streaming test pins CLEAN-restart replay; none kills the
job in the torn window BETWEEN the parquet write and the checkpoint
commit — exactly the window where a blind ``.mode("append")`` inside
``foreachBatch`` duplicates rows. ``write_batch_idempotent``
(streaming/pipeline.py) claims to make that window safe by
construction (per-batch_id overwrite → replay lands on the same path).
These tests prove it:

- tear the stream after the batch-1 write but before its commit,
  restart, and show the final sink equals the source exactly (no
  dupes, no gaps) AND that the restart replayed ONLY the uncommitted
  batch (checkpoint commit tracking, not blanket reprocessing);
- run the identical tear against a blind append writer and show the
  duplicates DO appear — the injection is real, and idempotent
  overwrite is what removes the failure mode, not test luck.

Reference parity: dwh_lab's polled loader
(preprocessing_streaming_incremental_load.py:39-101) advances its
watermark CSV only after a successful write, so a crash between the
two replays the window — the reference is at-least-once and relies on
downstream dedup. The Spark twin is exactly-once end-to-end.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import StreamingQueryException

from tests.conftest import SF_SMALL
from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.streaming.pipeline import stream_events, write_batch_idempotent


class _InjectedCrash(RuntimeError):
    pass


def _two_file_source(spark, tmp_path):
    """Split sf0.001 events into two parquet files so
    maxFilesPerTrigger=1 yields two micro-batches (batch 0 commits
    clean; batch 1 is the torn one)."""
    src = str(tmp_path / "src")
    ev = load_table(spark, SF_SMALL, "events")
    lo = ev.filter(F.col("event_id") % 2 == 0).coalesce(1)
    hi = ev.filter(F.col("event_id") % 2 == 1).coalesce(1)
    lo.write.mode("overwrite").parquet(os.path.join(src, "f0"))
    hi.write.mode("overwrite").parquet(os.path.join(src, "f1"))
    # file source lists files, not dirs: surface the part files flat
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, sub in enumerate(("f0", "f1")):
        (part,) = glob.glob(os.path.join(src, sub, "part-*.parquet"))
        os.link(part, os.path.join(flat, f"events_{i}.parquet"))
    return flat, ev


def _run(spark, src, ckpt, writer):
    q = (
        stream_events(spark, src, options={"maxFilesPerTrigger": "1"})
        .writeStream.foreachBatch(writer)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_torn_batch_replay_is_exactly_once(spark, tmp_path):
    src, ev = _two_file_source(spark, tmp_path)
    dest, ckpt = str(tmp_path / "dest"), str(tmp_path / "ckpt")

    def crashing(df, batch_id):
        write_batch_idempotent(df, dest, batch_id)
        if batch_id == 1:  # torn window: data on disk, commit never happens
            raise _InjectedCrash("injected crash after write, before commit")

    with pytest.raises(StreamingQueryException):
        _run(spark, src, ckpt, crashing)

    # the torn batch's parquet IS on disk — this is the dangerous state
    assert os.path.isdir(os.path.join(dest, "batch_id=1"))

    replayed = []

    def clean(df, batch_id):
        replayed.append(batch_id)
        write_batch_idempotent(df, dest, batch_id)

    _run(spark, src, ckpt, clean)

    # commit tracking: ONLY the uncommitted batch replays
    assert replayed == [1]

    got = spark.read.parquet(dest).drop("batch_id")
    n_src = ev.count()
    assert got.count() == n_src  # no dupes, no gaps
    assert got.select("event_id").distinct().count() == n_src
    assert (
        got.join(ev, "event_id", "full_outer")
        .filter(got["ts"].isNull() | ev["ts"].isNull())
        .count()
        == 0
    )


def test_blind_append_duplicates_under_same_tear(spark, tmp_path):
    """Control: the identical crash against ``.mode("append")``
    produces duplicate rows — proving the injection exercises the torn
    window and that per-batch_id overwrite (not chance) closes it."""
    src, ev = _two_file_source(spark, tmp_path)
    dest, ckpt = str(tmp_path / "dest"), str(tmp_path / "ckpt")

    def crashing_append(df, batch_id):
        df.write.mode("append").parquet(dest)
        if batch_id == 1:
            raise _InjectedCrash("injected crash after write, before commit")

    with pytest.raises(StreamingQueryException):
        _run(spark, src, ckpt, crashing_append)

    def clean_append(df, batch_id):
        df.write.mode("append").parquet(dest)

    _run(spark, src, ckpt, clean_append)

    got = spark.read.parquet(dest)
    n_src = ev.count()
    assert got.count() > n_src  # batch 1 landed twice
    dupes = got.groupBy("event_id").count().filter(F.col("count") > 1)
    assert dupes.count() > 0
