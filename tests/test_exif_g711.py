"""G.711 codec + EXIF writer/parser/report tests (multimodal batch)."""

import numpy as np
import pytest

from etl_jlp_spark.multimodal.binary import (
    MEDIA_SCHEMA,
    _g711_alaw_decode,
    _g711_alaw_encode,
    _g711_ulaw_decode,
    _g711_ulaw_encode,
    decode_wav,
    encode_wav,
    encode_wav_g711,
)
from etl_jlp_spark.multimodal.exif import (
    encode_exif_app1,
    exif_report,
    extract_exif,
    insert_app1,
)
from etl_jlp_spark.multimodal.jpeg import encode_jpeg


def _signal(n=4000, seed=3):
    rng = np.random.RandomState(seed)
    return (rng.randn(n) * 9000).clip(-32768, 32767).astype(np.int16)


@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_g711_value_idempotent_and_bounded_error(law):
    enc = _g711_ulaw_encode if law == "ulaw" else _g711_alaw_encode
    dec = _g711_ulaw_decode if law == "ulaw" else _g711_alaw_decode
    x = _signal()
    y = dec(enc(x))
    # companding quantization: error bounded by the top-segment step
    # width (the clip region at full scale reconstructs ~643 low)
    assert np.abs(y.astype(int) - x.astype(int)).max() <= 1024
    # value-level idempotence: decoded values re-encode to themselves
    assert np.array_equal(dec(enc(y)), y)


def test_g711_reference_code_points():
    # ITU-T G.711 canonical points
    assert _g711_ulaw_encode(np.array([0]))[0] == 0xFF
    assert _g711_ulaw_encode(np.array([32767]))[0] == 0x80
    assert _g711_ulaw_encode(np.array([-32768]))[0] == 0x00
    assert _g711_alaw_encode(np.array([0]))[0] == 0xD5
    assert _g711_ulaw_decode(np.array([0xFF]))[0] == 0
    assert _g711_alaw_decode(np.array([0xD5]))[0] == 8  # A-law min positive step


@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_g711_wav_roundtrip_stats(law):
    x = _signal()
    rate, ch, n, dur, rms, peak = decode_wav(encode_wav_g711(8000, x, law))
    assert (rate, ch, n) == (8000, 1, len(x))
    ref_rms = decode_wav(encode_wav(8000, x))[4]
    assert abs(rms - ref_rms) / ref_rms < 0.02  # companding noise only
    # stereo interleave survives
    st = encode_wav_g711(8000, np.stack([x[:64], -x[:64]], axis=1), law)
    assert decode_wav(st)[:3] == (8000, 2, 64)


def _jpeg_with_exif(**kw):
    base = encode_jpeg(16, 16, lambda x, y: (x * 16, y * 16, 128))
    return insert_app1(base, encode_exif_app1(**kw))


@pytest.mark.parametrize("bo", ["<", ">"])
def test_exif_roundtrip_both_endians(bo):
    payload = _jpeg_with_exif(
        make="AcmeCam", model="Z9", orientation=6,
        datetime="2023:05:01 08:30:00", exposure=(1, 250), iso=400, byte_order=bo,
    )
    d = extract_exif(payload)
    assert d == {
        "make": "AcmeCam", "model": "Z9", "orientation": 6,
        "datetime": "2023:05:01 08:30:00", "exposure": (1, 250), "iso": 400,
    }


def test_exif_absent_is_none_and_corrupt_raises():
    plain = encode_jpeg(8, 8, lambda x, y: (0, 0, 0))
    assert extract_exif(plain) is None
    broken = bytearray(_jpeg_with_exif())
    broken[12:14] = b"XX"  # clobber the TIFF endian marker
    with pytest.raises(ValueError):
        extract_exif(bytes(broken))
    with pytest.raises(ValueError):
        extract_exif(b"\x00\x01not a jpeg")


def test_exif_report_mapinpandas(spark):
    rows = [
        (i, "jpeg", bytearray(_jpeg_with_exif(iso=100 + 10 * i)), ("s", 1, 0, 0))
        for i in range(3)
    ] + [(9, "jpeg", bytearray(encode_jpeg(8, 8, lambda x, y: (0, 0, 0))), ("s", 1, 0, 0))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in exif_report(media).collect()}
    assert len(out) == 4
    for i in range(3):
        assert out[i]["has_exif"] and out[i]["iso"] == 100 + 10 * i
        assert out[i]["exposure_num"] == 1 and out[i]["exposure_den"] == 125
    assert not out[9]["has_exif"] and out[9]["iso"] is None
    # non-jpeg kinds fail loudly in-batch
    bad = spark.createDataFrame(
        [(1, "png", bytearray(b"x"), ("s", 1, 0, 0))], MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="jpeg|JPEG"):
        exif_report(bad).collect()
