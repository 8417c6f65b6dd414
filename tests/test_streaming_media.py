"""Streaming media-metadata extraction: batch parity + replay
idempotence of the per-batch_id sink."""

import os

from etl_jlp_spark.multimodal.binary import MEDIA_SCHEMA
from etl_jlp_spark.multimodal.containers import (
    encode_flac_streaminfo,
    encode_mp4_skeleton,
    media_metadata_report,
)
from etl_jlp_spark.multimodal.id3 import encode_id3
import pytest
# Wall-clock-bound (streaming triggers / state timeouts): excluded from the
# default run so the driver test window completes (r11); run via -m slow.
pytestmark = pytest.mark.slow



def _media_rows(n=12):
    rows = []
    for i in range(n):
        kind = ["mp3", "flac", "mp4"][i % 3]
        payload = {
            "mp3": encode_id3(title=f"T{i}"),
            "flac": encode_flac_streaminfo(8000 + i, 1, 16, 100 + i),
            "mp4": encode_mp4_skeleton(1.0 + i, 1000, 1 + i % 3),
        }[kind]
        rows.append((i, kind, bytearray(payload), ("s", len(payload), 0, 0)))
    return rows


def test_streaming_media_metadata_matches_batch_and_replays(spark, tmp_path):
    from etl_jlp_spark.streaming.pipeline import run_media_metadata_stream

    src = str(tmp_path / "src")
    dest = str(tmp_path / "dest")
    ckpt = str(tmp_path / "ckpt")
    media = spark.createDataFrame(_media_rows(), MEDIA_SCHEMA)
    media.write.mode("overwrite").parquet(src)

    run_media_metadata_stream(spark, src, dest, ckpt, media.schema)
    got = {r["media_id"]: r for r in spark.read.parquet(dest).collect()}
    want = {r["media_id"]: r for r in media_metadata_report(media).collect()}
    assert len(got) == len(want) == 12
    for k in want:
        assert got[k]["summary"] == want[k]["summary"]
        assert got[k]["has_meta"] == want[k]["has_meta"]

    # replay with the same checkpoint: nothing reprocessed, no dupes
    n_files = len(os.listdir(dest))
    run_media_metadata_stream(spark, src, dest, ckpt, media.schema)
    assert len(spark.read.parquet(dest).collect()) == 12
    assert len(os.listdir(dest)) == n_files
