"""FLAC STREAMINFO + MP4 box parser tests and the kind-dispatching
media metadata report."""

import hashlib

import pytest

from etl_jlp_spark.multimodal.binary import MEDIA_SCHEMA
from etl_jlp_spark.multimodal.containers import (
    encode_flac_streaminfo,
    encode_mp4_skeleton,
    extract_flac_streaminfo,
    extract_mp4_meta,
    media_metadata_report,
)
from etl_jlp_spark.multimodal.exif import encode_exif_app1, insert_app1
from etl_jlp_spark.multimodal.id3 import encode_id3
from etl_jlp_spark.multimodal.jpeg import encode_jpeg


def test_flac_streaminfo_roundtrip():
    md5 = hashlib.md5(b"pcm").digest()
    si = extract_flac_streaminfo(
        encode_flac_streaminfo(96000, 8, 32, (1 << 35) + 7, md5, 1024, 8192)
    )
    assert si == {
        "sample_rate": 96000, "channels": 8, "bits": 32,
        "total_samples": (1 << 35) + 7, "audio_md5": md5.hex(),
    }
    assert extract_flac_streaminfo(b"not flac at all") is None
    broken = bytearray(encode_flac_streaminfo())
    broken[5:8] = (33).to_bytes(3, "big")  # STREAMINFO must be 34 bytes
    with pytest.raises(ValueError):
        extract_flac_streaminfo(bytes(broken))


def test_mp4_walker_roundtrip():
    m = extract_mp4_meta(encode_mp4_skeleton(601.5, 90000, 1))
    assert m["timescale"] == 90000 and m["n_tracks"] == 1
    assert abs(m["duration_s"] - 601.5) < 1e-9
    assert extract_mp4_meta(b"\xff" * 32) is None
    trunc = encode_mp4_skeleton()[:18]  # mid-ftyp: size says 20
    with pytest.raises(ValueError):
        extract_mp4_meta(trunc)


def test_media_metadata_report_dispatch(spark):
    jpeg = insert_app1(encode_jpeg(8, 8, lambda x, y: (0, 0, 0)), encode_exif_app1())
    rows = [
        (0, "jpeg", bytearray(jpeg), ("s", 1, 0, 0)),
        (1, "mp3", bytearray(encode_id3(title="X")), ("s", 1, 0, 0)),
        (2, "flac", bytearray(encode_flac_streaminfo(22050, 1, 16, 100)), ("s", 1, 0, 0)),
        (3, "mp4", bytearray(encode_mp4_skeleton(2.0, 1000, 2)), ("s", 1, 0, 0)),
        (4, "mp3", bytearray(b"\xff\xfbno tag"), ("s", 1, 0, 0)),
    ]
    out = {
        r["media_id"]: r
        for r in media_metadata_report(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()
    }
    assert all(out[i]["has_meta"] for i in range(4))
    assert not out[4]["has_meta"] and out[4]["summary"] is None
    assert "orientation=1" in out[0]["summary"]
    assert "title=X" in out[1]["summary"]
    assert "sample_rate=22050" in out[2]["summary"]
    assert "n_tracks=2" in out[3]["summary"]
    with pytest.raises(Exception, match="knows"):
        media_metadata_report(
            spark.createDataFrame([(9, "webm", bytearray(b"x"), ("s", 1, 0, 0))], MEDIA_SCHEMA)
        ).collect()


def test_mp3_frame_scan_roundtrip():
    import pytest

    from etl_jlp_spark.multimodal.containers import (
        encode_mp3_frames,
        extract_mp3_frames,
    )

    m = extract_mp3_frames(encode_mp3_frames(12, 160, 44100))
    assert m == {
        "n_frames": 12, "sample_rate": 44100, "bitrate_kbps": 160.0,
        "mode": "cbr", "duration_s": round(12 * 1152 / 44100, 3),
    }
    # ID3v2-prefixed stream: tag skipped, frames still indexed
    from etl_jlp_spark.multimodal.id3 import encode_id3

    tagged = encode_mp3_frames(4, 128, 48000, id3=encode_id3(title="T"))
    assert extract_mp3_frames(tagged)["n_frames"] == 4
    # VBR: mixed bitrates across frames
    vbr = encode_mp3_frames(2, 128, 44100) + encode_mp3_frames(2, 320, 44100)
    assert extract_mp3_frames(vbr)["mode"] == "vbr"
    assert extract_mp3_frames(b"not audio") is None
    with pytest.raises(ValueError):
        extract_mp3_frames(encode_mp3_frames(3, 128, 44100)[:-10])


def test_ogg_page_walk_roundtrip(spark):
    import pytest

    from etl_jlp_spark.multimodal.binary import MEDIA_SCHEMA
    from etl_jlp_spark.multimodal.containers import (
        encode_ogg_vorbis_skeleton,
        extract_ogg_meta,
        media_metadata_report,
    )

    o = encode_ogg_vorbis_skeleton(22050, 1, 66150, 4)
    m = extract_ogg_meta(o)
    assert m == {"n_pages": 5, "sample_rate": 22050, "channels": 1, "duration_s": 3.0}
    assert extract_ogg_meta(b"zzzz") is None
    corrupt = bytearray(o)
    corrupt[40] ^= 0x01  # flip a bit inside the first page body
    with pytest.raises(ValueError, match="CRC|capture|Vorbis|truncated"):
        extract_ogg_meta(bytes(corrupt))
    rows = [(0, "ogg", bytearray(o), ("s", 1, 0, 0))]
    out = media_metadata_report(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()
    assert out[0]["has_meta"] and "n_pages=5" in out[0]["summary"]
