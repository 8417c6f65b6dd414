"""Multimodal binary-column plumbing: schema, Arrow batch shape,
determinism, and the explicit real-decode stub."""

import pytest
from pyspark.sql import functions as F

from etl_jlp_spark.multimodal.binary import (
    decode_image,
    extract_features,
    frame_sample,
    synth_media_df,
)


def test_decode_schema_and_determinism(spark):
    media = synth_media_df(spark, n=32)
    out = decode_image(media)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,width:int,height:int,n_bytes:bigint,"
        "checksum:string,mean_r:double,mean_g:double,mean_b:double>"
    )
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 32
    again = {r["media_id"]: r for r in decode_image(media).collect()}
    assert all(rows[i]["checksum"] == again[i]["checksum"] for i in rows)


def test_bmp_real_decode(spark):
    from etl_jlp_spark.multimodal.binary import decode_bmp, encode_bmp

    media = synth_media_df(spark, n=12, kind="bmp")
    out = {r["media_id"]: r for r in decode_image(media, fake_decode=False).collect()}
    assert len(out) == 12
    for i, r in out.items():
        # dimensions from the BMP header must match the synth params
        assert r["width"] == (i % 16) + 1 and r["height"] == (i % 9) + 1
        assert 0.0 <= r["mean_r"] <= 255.0
    # a constant-color image decodes to exactly that channel mean
    img = encode_bmp(5, 3, lambda x, y: (10, 20, 30))
    assert decode_bmp(img) == (5, 3, 10.0, 20.0, 30.0)


def test_real_decode_is_explicit_stub_for_undecodable_kinds(spark):
    from pyspark.errors import PythonException

    media = synth_media_df(spark, n=2)  # kind='image' (no codec)
    # the raise is IN-BATCH (inside the Arrow task, so no extra
    # pre-scan job over the media table) — it surfaces at action time
    # wrapped as PythonException carrying the NotImplementedError
    with pytest.raises(PythonException, match="NotImplementedError"):
        decode_image(media, fake_decode=False).collect()
    # and the lazy plan itself launches NO validation job
    decode_image(media, fake_decode=False)


def test_features_feed_vector_ops(spark):
    media = synth_media_df(spark, n=16)
    feats = extract_features(media, dim=8)
    r = feats.collect()
    assert all(len(row["feature"]) == 8 for row in r)
    assert all(abs(sum(row["feature"]) - 1.0) < 1e-9 for row in r)


def test_frame_sample_explodes_offsets(spark):
    media = synth_media_df(spark, n=8)
    frames = frame_sample(media, every_n_bytes=16)
    per = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("n_bytes").alias("b")
    )
    for r in per.collect():
        assert r["n"] == (r["b"] - 1) // 16 + 1


def test_png_real_decode_all_filters(spark):
    """PNG encode→decode round trip for each of the five scanline filter
    types, plus the Spark-side mapInPandas path."""
    import numpy as np

    from etl_jlp_spark.multimodal.binary import decode_png, encode_png

    def px(x, y):
        return ((x * 11 + y) % 256, (y * 29 + 3) % 256, (x * x + y * 5) % 256)

    w, h = 13, 7
    truth = np.array([[px(x, y) for x in range(w)] for y in range(h)], dtype=np.float64)
    tm = truth.reshape(-1, 3).mean(axis=0)
    for ft in range(5):
        gw, gh, mr, mg, mb = decode_png(encode_png(w, h, px, filter_type=ft))
        assert (gw, gh) == (w, h), f"filter {ft}"
        assert abs(mr - tm[0]) < 1e-9 and abs(mg - tm[1]) < 1e-9 and abs(mb - tm[2]) < 1e-9, ft

    media = synth_media_df(spark, n=10, kind="png")
    out = {r["media_id"]: r for r in decode_image(media, fake_decode=False).collect()}
    assert len(out) == 10
    for i, r in out.items():
        assert r["width"] == (i % 16) + 1 and r["height"] == (i % 9) + 1
        assert 0.0 <= r["mean_r"] <= 255.0


def test_png_rejects_garbage_and_unsupported():
    from etl_jlp_spark.multimodal.binary import decode_png

    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # valid signature but 16-bit depth → explicit unsupported error
    import struct
    import zlib

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr_data = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    ihdr = struct.pack(">I", len(ihdr_data)) + b"IHDR" + ihdr_data
    ihdr += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_data) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(sig + ihdr)


def test_real_decode_rows_survive_null_meta(spark):
    """A bmp/png row with null meta must decode from the codec, not
    TypeError on the metadata vectorization (ADVICE r2)."""
    from etl_jlp_spark.multimodal.binary import MEDIA_SCHEMA, encode_bmp, encode_png

    rows = [
        (0, "bmp", bytearray(encode_bmp(4, 2, lambda x, y: (1, 2, 3))), None),
        (1, "png", bytearray(encode_png(3, 3, lambda x, y: (9, 8, 7))), None),
        (2, "image", bytearray(b"\x00" * 16), None),  # fake path, null meta
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in decode_image(media).collect()}
    assert (out[0]["width"], out[0]["height"]) == (4, 2)
    assert (out[1]["width"], out[1]["height"]) == (3, 3)
    assert out[1]["mean_r"] == 9.0 and out[1]["mean_g"] == 8.0 and out[1]["mean_b"] == 7.0
    assert out[2]["width"] == 0 and out[2]["height"] == 0  # meta-less fake row


def test_wav_roundtrip_exact_stats():
    import numpy as np

    from etl_jlp_spark.multimodal.binary import decode_wav, encode_wav

    t = np.arange(800)
    wave = (1000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    rate, ch, n, dur, rms, peak = decode_wav(encode_wav(8000, wave))
    assert (rate, ch, n) == (8000, 1, 800)
    assert abs(dur - 0.1) < 1e-9
    xf = wave.astype(float)
    assert abs(rms - float(np.sqrt((xf * xf).mean()))) < 1e-9
    assert peak == int(np.abs(wave).max())
    # stereo roundtrip
    st = np.stack([wave, -wave], axis=1)
    rate2, ch2, n2, _, rms2, _ = decode_wav(encode_wav(8000, st))
    assert (rate2, ch2, n2) == (8000, 2, 800)
    assert abs(rms2 - rms) < 1e-9


def test_wav_rejects_non_pcm16():
    import pytest as _pytest

    from etl_jlp_spark.multimodal.binary import decode_wav

    with _pytest.raises(ValueError):
        decode_wav(b"not audio at all")


def test_decode_audio_real_wav_in_spark(spark):
    from etl_jlp_spark.multimodal.binary import decode_audio, decode_wav, synth_audio_df

    media = synth_audio_df(spark, n=16, kind="wav")
    out = {r["media_id"]: r for r in decode_audio(media).collect()}
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert len(out) == 16
    for mid, payload in src.items():
        rate, ch, n, dur, rms, peak = decode_wav(payload)
        r = out[mid]
        assert (r["sample_rate"], r["n_channels"], r["n_samples"]) == (rate, ch, n)
        assert abs(r["rms"] - rms) < 1e-9 and r["peak"] == peak


def test_decode_audio_stub_boundary(spark):
    import pytest as _pytest

    from etl_jlp_spark.multimodal.binary import decode_audio, synth_audio_df

    mp3 = synth_audio_df(spark, n=4, kind="mp3")
    # fake path: plumbing works, signal stats null
    rows = decode_audio(mp3, fake_decode=True).collect()
    assert len(rows) == 4 and all(r["rms"] is None or r["rms"] != r["rms"] for r in rows)
    from pyspark.errors import PythonException

    with _pytest.raises(PythonException, match="NotImplementedError"):
        decode_audio(mp3, fake_decode=False).collect()


def test_jpeg_roundtrip_means_within_tolerance():
    import numpy as np

    from etl_jlp_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    w0, h0 = 20, 13
    fn = lambda x, y: ((x * 12) % 256, (y * 19) % 256, (x + y) % 256)
    w, h, r, g, b = decode_jpeg(encode_jpeg(w0, h0, fn))
    assert (w, h) == (w0, h0)
    px = np.array([[fn(x, y) for x in range(w0)] for y in range(h0)], dtype=float)
    want = px.reshape(-1, 3).mean(axis=0)
    # lossy codec: fine flat quant tables keep channel means within ~1
    assert abs(r - want[0]) < 1.0 and abs(g - want[1]) < 1.0 and abs(b - want[2]) < 1.0


def test_jpeg_420_subsampled_roundtrip():
    """Chroma-subsampled (4:2:0) baseline JPEG: 2x2-downsampled chroma
    planes, interleaved MCU order, box upsampling on decode — channel
    means must stay close to the source (chroma averaging shifts them
    slightly more than 4:4:4)."""
    import numpy as np

    from etl_jlp_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    w0, h0 = 37, 23  # odd sizes exercise the MCU-grid crop
    fn = lambda x, y: ((x * 3) % 256, (y * 5) % 256, ((x + y) * 2) % 256)
    w, h, r, g, b = decode_jpeg(encode_jpeg(w0, h0, fn, subsampling="420"))
    assert (w, h) == (w0, h0)
    px = np.array([[fn(x, y) for x in range(w0)] for y in range(h0)], dtype=float)
    want = px.reshape(-1, 3).mean(axis=0)
    assert abs(r - want[0]) < 2.0 and abs(g - want[1]) < 2.0 and abs(b - want[2]) < 2.0
    # 444 and 420 decodes of the same image agree on the means
    _, _, r4, g4, b4 = decode_jpeg(encode_jpeg(w0, h0, fn))
    assert abs(r - r4) < 1.5 and abs(g - g4) < 1.5 and abs(b - b4) < 1.5


def test_jpeg_progressive_decodes_bit_identical_to_baseline():
    """SOF2 spectral selection is a lossless re-arrangement of the same
    quantized coefficients — the progressive stream must decode to
    EXACTLY the baseline stream's output."""
    from etl_jlp_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    fn = lambda x, y: ((x * 3) % 256, (y * 5) % 256, ((x + y) * 2) % 256)
    for w, h in ((37, 23), (8, 8), (16, 9)):
        base = decode_jpeg(encode_jpeg(w, h, fn))
        prog = decode_jpeg(encode_jpeg_progressive(w, h, fn))
        assert prog == base, (w, h)


def test_jpeg_progressive_per_scan_dht_uses_sos_time_tables():
    """libjpeg's default arrangement re-emits DHT before each AC scan,
    REDEFINING table ids: scan 3 switches AC table 0 to a different
    canonical ordering, scan 4 switches back. Decoding every scan with
    the final marker state would apply scan 4's table to scan 3 and
    produce garbage — the decoder must snapshot tables at each SOS."""
    from etl_jlp_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    fn = lambda x, y: ((x * 7) % 256, (y * 3) % 256, ((x * y) + 11) % 256)
    for w, h in ((37, 23), (16, 9)):
        base = decode_jpeg(encode_jpeg(w, h, fn))
        prog = decode_jpeg(encode_jpeg_progressive(w, h, fn, per_scan_dht=True))
        assert prog == base, (w, h)


def test_jpeg_progressive_successive_approximation_bit_identical():
    """Successive approximation (first pass at Al=1 + Ah=1 refinement
    for DC and every AC band — what real progressive encoders emit)
    is a lossless re-arrangement: the 8-scan SA stream must decode
    EXACTLY like the baseline stream, including with per-scan DHT
    redefinition layered on top."""
    from etl_jlp_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    fn = lambda x, y: ((x * 3) % 256, (y * 5) % 256, ((x + y) * 2) % 256)
    for w, h in ((37, 23), (8, 8), (16, 9)):
        base = decode_jpeg(encode_jpeg(w, h, fn))
        sa = decode_jpeg(encode_jpeg_progressive(w, h, fn, successive=True))
        assert sa == base, (w, h)
    both = decode_jpeg(
        encode_jpeg_progressive(37, 23, fn, per_scan_dht=True, successive=True)
    )
    assert both == decode_jpeg(encode_jpeg(37, 23, fn))


def test_jpeg_progressive_420_decodes_bit_identical_to_baseline_420():
    """4:2:0 progressive — the layout most real progressive JPEGs use:
    the interleaved DC scan walks the MCU grid (4 luma + 2 chroma
    blocks), each AC scan covers its component's NOMINAL block raster
    only (A.2.2 — MCU padding blocks are never AC-coded). The cropped
    decode must equal the baseline 4:2:0 stream exactly, including
    with successive approximation and per-scan DHTs on top. Sizes
    chosen so the luma MCU-padded raster EXCEEDS the nominal raster
    (w=37: 6 padded vs 5 nominal block columns)."""
    from etl_jlp_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    fn = lambda x, y: ((x * 3) % 256, (y * 5) % 256, ((x + y) * 2) % 256)
    for w, h in ((37, 23), (16, 16), (17, 9)):
        base420 = decode_jpeg(encode_jpeg(w, h, fn, subsampling="420"))
        prog = decode_jpeg(encode_jpeg_progressive(w, h, fn, subsampling="420"))
        assert prog == base420, (w, h)
        sa = decode_jpeg(
            encode_jpeg_progressive(w, h, fn, subsampling="420", successive=True)
        )
        assert sa == base420, (w, h, "successive")
    everything = decode_jpeg(
        encode_jpeg_progressive(
            37, 23, fn, subsampling="420", successive=True, per_scan_dht=True
        )
    )
    assert everything == decode_jpeg(encode_jpeg(37, 23, fn, subsampling="420"))


def test_jpeg_16bit_quant_tables_decode_identically():
    """DQT precision 1 (16-bit big-endian entries — what high-quality
    encoders emit): rewriting a stream's 8-bit tables as 16-bit with
    the same values must not change the decode at all."""
    import struct as _struct

    from etl_jlp_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    fn = lambda x, y: ((x * 3) % 256, (y * 5) % 256, ((x + y) * 2) % 256)
    p = bytes(encode_jpeg(37, 23, fn))
    out = bytearray()
    i = 0
    while i < len(p):
        if p[i] == 0xFF and i + 3 < len(p) and p[i + 1] == 0xDB:
            (seglen,) = _struct.unpack_from(">H", p, i + 2)
            body = p[i + 4 : i + 2 + seglen]
            tid, vals = body[0] & 0xF, body[1:65]
            wide = b"".join(_struct.pack(">H", v) for v in vals)
            out += b"\xff\xdb" + _struct.pack(">H", 131) + bytes([0x10 | tid]) + wide
            i += 2 + seglen
        else:
            out.append(p[i])
            i += 1
    assert decode_jpeg(bytes(out)) == decode_jpeg(p)


def test_jpeg_restart_intervals_roundtrip():
    """DRI + RSTn streams (the camera error-resilience layout) must
    decode to EXACTLY the same means as the restart-free stream — the
    only differences are byte alignment and DC-predictor resets, both
    lossless."""
    from etl_jlp_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    fn = lambda x, y: ((x * 3) % 256, (y * 5) % 256, ((x + y) * 2) % 256)
    base = decode_jpeg(encode_jpeg(37, 23, fn))
    for ri in (1, 2, 5):
        got = decode_jpeg(encode_jpeg(37, 23, fn, restart_interval=ri))
        assert got == base, (ri, got, base)
    # and combined with 4:2:0 subsampling
    base420 = decode_jpeg(encode_jpeg(37, 23, fn, subsampling="420"))
    got420 = decode_jpeg(encode_jpeg(37, 23, fn, subsampling="420", restart_interval=2))
    assert got420 == base420


def test_jpeg_rejects_out_of_scope_streams():
    import pytest as _pytest

    from etl_jlp_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    with _pytest.raises(ValueError):
        decode_jpeg(b"GIF89a not a jpeg")
    # flip SOF0 to SOF2: the baseline full-band scan is illegal as a
    # progressive first scan — loud error, not garbage
    p = bytearray(encode_jpeg(8, 8, lambda x, y: (1, 2, 3)))
    p[p.index(b"\xff\xc0") + 1] = 0xC2
    with _pytest.raises(ValueError):
        decode_jpeg(bytes(p))
    # a DQT that redefines a table id between scans would silently
    # dequantize earlier scans with the wrong table — explicit error
    from etl_jlp_spark.multimodal.jpeg import encode_jpeg_progressive

    q = bytearray(encode_jpeg_progressive(8, 8, lambda x, y: (1, 2, 3)))
    first = q.index(b"\xff\xda")
    second = q.index(b"\xff\xda", first + 2)
    import struct as _struct

    dqt = b"\xff\xdb" + _struct.pack(">H", 67) + bytes([0]) + bytes([9] * 64)
    q[second:second] = dqt  # redefine qtable 0 between scan 1 and scan 2
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(q))


def test_decode_image_real_jpeg_in_spark(spark):
    from etl_jlp_spark.multimodal.binary import decode_image, synth_media_df
    from etl_jlp_spark.multimodal.jpeg import decode_jpeg

    media = synth_media_df(spark, n=12, kind="jpeg")
    out = {r["media_id"]: r for r in decode_image(media, fake_decode=False).collect()}
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert len(out) == 12
    for mid, payload in src.items():
        w, h, mr, mg, mb = decode_jpeg(payload)
        r = out[mid]
        assert (r["width"], r["height"]) == (w, h)
        assert abs(r["mean_r"] - mr) < 1e-9


def test_avi_roundtrip_per_frame_stats():
    import numpy as np

    from etl_jlp_spark.multimodal.binary import decode_avi, encode_avi

    f0 = np.full((4, 6, 3), 50, dtype=np.uint8)
    f1 = np.zeros((4, 6, 3), dtype=np.uint8)
    f1[..., 0] = 200  # pure red frame
    payload = encode_avi(6, 4, [f0, f1], fps=5)
    w, h, nf, fps, means = decode_avi(payload)
    assert (w, h, nf) == (6, 4, 2) and abs(fps - 5.0) < 1e-6
    assert means[0] == (50.0, 50.0, 50.0)
    assert means[1] == (200.0, 0.0, 0.0)


def test_avi_rejects_compressed_codecs():
    import pytest as _pytest

    from etl_jlp_spark.multimodal.binary import decode_avi, encode_avi

    p = bytearray(encode_avi(2, 2, [lambda x, y: (1, 2, 3)]))
    i = p.index(b"DIB ")
    p[i : i + 4] = b"h264"
    with _pytest.raises(NotImplementedError):
        decode_avi(bytes(p))
    with _pytest.raises(ValueError):
        decode_avi(b"RIFFxxxxWAVE")


def test_decode_video_frames_in_spark(spark):
    from etl_jlp_spark.multimodal.binary import (
        decode_avi,
        decode_video_frames,
        synth_video_df,
    )

    media = synth_video_df(spark, n=6, kind="avi")
    rows = decode_video_frames(media).collect()
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == set(src)
    for mid, payload in src.items():
        w, h, nf, _fps, means = decode_avi(payload)
        got = sorted(by_media[mid], key=lambda r: r["frame_idx"])
        assert len(got) == nf  # real 1→N frame explosion
        for fi, r in enumerate(got):
            assert (r["width"], r["height"]) == (w, h)
            assert abs(r["mean_r"] - means[fi][0]) < 1e-9
    # stub boundary
    mp4 = synth_video_df(spark, n=3, kind="mp4")
    assert len(decode_video_frames(mp4).collect()) == 3
    import pytest as _pytest

    from pyspark.errors import PythonException

    with _pytest.raises(PythonException, match="NotImplementedError"):
        decode_video_frames(mp4, fake_decode=False).collect()


def test_avi_mjpeg_frames_decode_via_jpeg_codec():
    """Motion-JPEG AVI: every '00dc' chunk is a complete baseline JPEG.
    Per-frame means must equal decoding each frame's JPEG directly, and
    an inter-frame codec fourcc must still raise."""
    import struct as _struct

    import pytest as _pytest

    from etl_jlp_spark.multimodal.binary import decode_avi, encode_avi
    from etl_jlp_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    w, h = 18, 11
    fns = [
        (lambda x, y, f=f: (((x + f) * 11) % 256, (y * 17 + f) % 256, (x + y + f) % 256))
        for f in range(3)
    ]
    payload = encode_avi(w, h, fns, fps=5, codec="MJPG")
    gw, gh, n, fps, means = decode_avi(payload)
    assert (gw, gh, n, fps) == (w, h, 3, 5.0)
    for fn, got in zip(fns, means):
        _, _, mr, mg, mb = decode_jpeg(encode_jpeg(w, h, fn))
        assert got == (mr, mg, mb)
    # inter-frame codec: loud error, not garbage
    bad = bytearray(payload)
    i = bad.index(b"vidsMJPG")
    bad[i + 4 : i + 8] = b"H264"
    with _pytest.raises(NotImplementedError):
        decode_avi(bytes(bad))
    assert _struct  # silence unused-import lint in minimal envs


def test_wav_ima_adpcm_roundtrip_close_to_source():
    """IMA ADPCM (format 0x11): ~4x-compressed lossy audio must decode
    with exact sample count/rate and a waveform close to the source
    (relative RMS error < 8% — IMA ADPCM's typical ~22-25 dB SNR)."""
    import numpy as np

    from etl_jlp_spark.multimodal.binary import (
        ADPCM_BLOCK_ALIGN,
        _decode_adpcm_mono,
        decode_wav,
        encode_wav,
        encode_wav_adpcm,
    )

    rate = 8000
    t = np.arange(1300)  # > 2 blocks (505 samples/block)
    src = (6000 * np.sin(2 * np.pi * 220 * t / rate) + 1500 * np.sin(2 * np.pi * 55 * t / rate)).astype(np.int16)
    payload = encode_wav_adpcm(rate, src)
    assert len(payload) < len(encode_wav(rate, src)) / 3  # genuinely compressed
    grate, gch, gn, gdur, grms, gpeak = decode_wav(payload)
    assert (grate, gch, gn) == (rate, 1, len(src))
    ref_rms = float(np.sqrt(np.mean(src.astype(np.float64) ** 2)))
    assert abs(grms - ref_rms) / ref_rms < 0.05
    # waveform-level reconstruction error
    data = payload[payload.index(b"data") + 8 :]
    rec = _decode_adpcm_mono(data, ADPCM_BLOCK_ALIGN, len(src)).astype(np.float64)
    err = float(np.sqrt(np.mean((rec - src.astype(np.float64)) ** 2)))
    assert err / ref_rms < 0.08, err


def test_gif_roundtrip_exact_means_plain_and_interlaced():
    """GIF is lossless (indexed LZW): decoded channel means must equal
    the source means exactly, in both row orders."""
    from etl_jlp_spark.multimodal.gif import decode_gif, encode_gif

    for w, h, ncol, inter in ((16, 9, 5, False), (40, 33, 17, True), (7, 7, 1, True)):
        # GIF is indexed: derive all three channels from one palette slot
        px = lambda x, y: (
            (x * 31 + y * 7) % ncol * 9 % 256,
            (x * 31 + y * 7) % ncol * 3 % 256,
            (x * 31 + y * 7) % ncol * 5 % 256,
        )
        payload = encode_gif(w, h, px, interlace=inter)
        gw, gh, mr, mg, mb = decode_gif(payload)
        pix = [px(x, y) for y in range(h) for x in range(w)]
        n = len(pix)
        assert (gw, gh) == (w, h)
        assert mr == sum(p[0] for p in pix) / n
        assert mg == sum(p[1] for p in pix) / n
        assert mb == sum(p[2] for p in pix) / n


def test_gif_lzw_dictionary_reset_path():
    """A low-repetition 256-color frame drives the LZW dictionary past
    4096 codes — the encoder must emit a mid-stream clear and the
    decoder must follow it."""
    from etl_jlp_spark.multimodal.gif import decode_gif, encode_gif

    px = lambda x, y: (
        (x * 5 + y * 11) % 256,
        ((x * 5 + y * 11) * 3) % 256,
        ((x * 5 + y * 11) * 7) % 256,
    )
    w, h = 120, 90
    gw, gh, mr, _mg, _mb = decode_gif(encode_gif(w, h, px))
    pix = [px(x, y) for y in range(h) for x in range(w)]
    assert (gw, gh) == (w, h)
    assert mr == sum(p[0] for p in pix) / len(pix)


def test_gif_rejects_garbage_and_truncation():
    import pytest as _pytest

    from etl_jlp_spark.multimodal.gif import decode_gif, encode_gif

    good = encode_gif(8, 8, lambda x, y: (x * 20, y * 20, 0))
    for bad in (b"", b"GIF89a", b"NOPE" + b"\x00" * 30, good[:20]):
        with _pytest.raises(ValueError):
            decode_gif(bad)
    with _pytest.raises(ValueError):  # >256 distinct colors has no palette
        encode_gif(64, 64, lambda x, y: (x * 4, y * 4, (x + y) % 256))


def test_decode_image_real_gif_in_spark(spark):
    from pyspark.sql import functions as F

    from etl_jlp_spark.multimodal.binary import decode_image, synth_media_df

    media = synth_media_df(spark, n=12, kind="gif")
    out = decode_image(media, fake_decode=False).orderBy("media_id").collect()
    assert len(out) == 12
    for r in out:
        assert r["width"] >= 1 and r["height"] >= 1
        assert r["mean_r"] is not None and 0.0 <= r["mean_r"] <= 255.0


def test_tiff_roundtrip_exact_all_variants():
    """TIFF is lossless in every supported arrangement: both byte
    orders, uncompressed and LZW, predictor, multi-strip."""
    import itertools

    from etl_jlp_spark.multimodal.tiff import decode_tiff, encode_tiff

    px = lambda x, y: ((x * 7 + 3) % 256, (y * 13 + 1) % 256, (x + y) % 256)
    w, h = 17, 11
    pix = [px(x, y) for y in range(h) for x in range(w)]
    n = len(pix)
    exp = tuple(sum(p[i] for p in pix) / n for i in range(3))
    for be, comp, rps, pred in itertools.product(
        (False, True), (1, 5), (None, 4), (1, 2)
    ):
        if pred == 2 and comp != 5:
            continue
        payload = encode_tiff(
            w, h, px, big_endian=be, compression=comp, rows_per_strip=rps, predictor=pred
        )
        gw, gh, mr, mg, mb = decode_tiff(payload)
        assert (gw, gh) == (w, h)
        assert (mr, mg, mb) == exp


def test_tiff_lzw_early_change_and_reset():
    """A 200x120 frame drives LZW through every width bump (9→12) and
    the 4094 dictionary reset — the reader's shifted early-change rule
    must track the writer exactly."""
    from etl_jlp_spark.multimodal.tiff import decode_tiff, encode_tiff

    px = lambda x, y: ((x * 5 + y * 11) % 256, (x * 3 + y * 7) % 256, (x * 13 + y) % 256)
    w, h = 200, 120
    gw, gh, mr, _mg, _mb = decode_tiff(encode_tiff(w, h, px, compression=5))
    pix = [px(x, y) for y in range(h) for x in range(w)]
    assert (gw, gh) == (w, h)
    assert mr == sum(p[0] for p in pix) / len(pix)


def test_tiff_rejects_garbage_and_unsupported():
    import pytest as _pytest

    from etl_jlp_spark.multimodal.tiff import decode_tiff, encode_tiff

    good = encode_tiff(8, 8, lambda x, y: (x * 20, y * 20, 0))
    for bad in (b"", b"II\x2b\x00", b"MM" + b"\x00" * 30, good[:60]):
        with _pytest.raises(ValueError):
            decode_tiff(bad)
    with _pytest.raises(ValueError):
        encode_tiff(4, 4, lambda x, y: (0, 0, 0), compression=7)  # JPEG-in-TIFF


def test_decode_image_real_tiff_in_spark(spark):
    from etl_jlp_spark.multimodal.binary import decode_image, synth_media_df

    media = synth_media_df(spark, n=12, kind="tiff")
    out = decode_image(media, fake_decode=False).orderBy("media_id").collect()
    assert len(out) == 12
    for r in out:
        assert r["width"] >= 1 and r["height"] >= 1
        assert r["mean_r"] is not None and 0.0 <= r["mean_r"] <= 255.0


# ---------------------------------------------------------------------------
# Arithmetic-coded JPEG (SOF9): T.81 Annex D QM-coder + Annex F models —
# the round-5 verdict's last in-scope codec stub, now a real code path
# ---------------------------------------------------------------------------


def test_qm_coder_round_trips_random_bitstreams():
    """Property: the QM encoder/decoder pair round-trips arbitrary
    context-tagged bit sequences — including adaptive state transitions,
    conditional exchange, carry propagation and 0xFF00 stuffing."""
    import random

    from etl_jlp_spark.multimodal.jpeg_arith import (
        _ArithDecoder,
        _ArithEncoder,
        _new_stats,
    )

    rng = random.Random(99)
    for _ in range(200):
        n = rng.randint(1, 700)
        p = rng.random()
        bits = [1 if rng.random() < p else 0 for _ in range(n)]
        nctx = rng.randint(1, 6)
        ctxs = [rng.randrange(nctx) for _ in range(n)]
        enc = _ArithEncoder()
        st = _new_stats(nctx)
        for b, c in zip(bits, ctxs):
            enc.encode(b, st, c)
        dec = _ArithDecoder(enc.flush())
        st2 = _new_stats(nctx)
        assert [dec.decode(st2, c) for c in ctxs] == bits


def test_arith_jpeg_decodes_bit_identical_to_huffman_twin():
    """The arithmetic-coded fixture must decode BIT-IDENTICAL to its
    Huffman twin: both encoders share the DCT/quantization pipeline, so
    any divergence is an entropy-coder defect. Also pins the compression
    win arithmetic coding exists for."""
    from etl_jlp_spark.multimodal.jpeg import decode_jpeg, encode_jpeg
    from etl_jlp_spark.multimodal.jpeg_arith import encode_jpeg_arith

    def px(x, y):
        return ((x * 7 + y * 3) % 256, (x * 5 + y * 11) % 256, (x * 13 + y * 2) % 256)

    for w, h in [(8, 8), (24, 17), (33, 40), (64, 48)]:
        hp = encode_jpeg(w, h, px)
        ap = encode_jpeg_arith(w, h, px)
        assert decode_jpeg(ap) == decode_jpeg(hp), (w, h)
        assert len(ap) < len(hp), "arithmetic stream should be smaller"


def test_arith_jpeg_flows_through_spark_decode(spark):
    """synth_media_df mixes SOF9 frames among Huffman ones (every 3rd);
    the Spark mapInPandas decode path must handle both transparently."""
    import numpy as np

    from etl_jlp_spark.multimodal.binary import decode_image, synth_media_df
    from etl_jlp_spark.multimodal.jpeg import decode_jpeg

    media = synth_media_df(spark, n=9, kind="jpeg")
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert any(b"\xff\xc9" in p for p in src.values()), "no SOF9 fixture present"
    out = {r["media_id"]: r for r in decode_image(media, fake_decode=False).collect()}
    assert len(out) == 9
    for mid, payload in src.items():
        w, h, mr, mg, mb = decode_jpeg(payload)
        row = out[mid]
        assert (row["width"], row["height"]) == (w, h)
        assert np.isclose(row["mean_r"], mr) and np.isclose(row["mean_b"], mb)


def test_progressive_arith_jpeg_decodes_bit_identical_to_all_twins():
    """SOF10 must be a lossless re-arrangement of the same quantized
    coefficients: spectral-selection-only AND successive-approximation
    progressive arithmetic streams both decode bit-identical to the
    Huffman baseline and the sequential-arithmetic twin."""
    from etl_jlp_spark.multimodal.jpeg import decode_jpeg, encode_jpeg
    from etl_jlp_spark.multimodal.jpeg_arith import (
        encode_jpeg_arith,
        encode_jpeg_arith_progressive,
    )

    def px(x, y):
        return ((x * 7 + y * 3) % 256, (x * 5 + y * 11) % 256, (x * 13 + y * 2) % 256)

    for w, h in [(8, 8), (24, 17), (33, 40)]:
        want = decode_jpeg(encode_jpeg(w, h, px))
        assert decode_jpeg(encode_jpeg_arith(w, h, px)) == want, (w, h)
        assert decode_jpeg(encode_jpeg_arith_progressive(w, h, px)) == want, (w, h)
        assert (
            decode_jpeg(encode_jpeg_arith_progressive(w, h, px, successive=True))
            == want
        ), (w, h, "successive")


def test_progressive_arith_newly_nonzero_and_corrections_exercised():
    """A fixture with strong high-frequency content makes the AC
    refinement scan hit all three decision kinds (EOB-extends, newly
    nonzero, correction bits on previously-nonzero coefficients)."""
    from etl_jlp_spark.multimodal.jpeg import decode_jpeg, encode_jpeg
    from etl_jlp_spark.multimodal.jpeg_arith import encode_jpeg_arith_progressive

    def px(x, y):  # checkerboard + gradient: dense AC spectrum
        return (255 * ((x + y) % 2), (x * 31) % 256, (y * 17) % 256)

    want = decode_jpeg(encode_jpeg(40, 24, px))
    got = decode_jpeg(encode_jpeg_arith_progressive(40, 24, px, successive=True))
    assert got == want


def test_unsupported_sof_modes_still_raise():
    """Scope boundary: lossless (SOF3) and hierarchical modes stay loud
    stubs now that SOF10 is a real code path."""
    import pytest as _pytest

    from etl_jlp_spark.multimodal.jpeg import decode_jpeg
    from etl_jlp_spark.multimodal.jpeg_arith import encode_jpeg_arith

    payload = bytearray(encode_jpeg_arith(8, 8, lambda x, y: (x, y, 0)))
    i = payload.index(b"\xff\xc9")
    payload[i + 1] = 0xC3  # SOF9 -> SOF3 (lossless)
    with _pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(payload))


def test_flac_roundtrips_all_paths():
    """Every decoder path round-trips bit-exactly against in-repo
    encodes: fixed predictors, LPC, constant, mid-side, independent
    stereo, multi-frame, and the noise worst case."""
    import numpy as np

    from etl_jlp_spark.multimodal.flac import (
        decode_flac,
        decode_flac_samples,
        encode_flac,
    )

    t = np.arange(5000)
    mono = (10000 * np.sin(2 * np.pi * 440 * t / 44100)).astype(np.int16)
    stereo = np.stack([mono, (mono // 2).astype(np.int16)], axis=1)
    rng = np.random.RandomState(7)
    noise = rng.randint(-32768, 32767, 4097).astype(np.int16)
    cases = [
        (encode_flac(44100, mono, block_size=1024), mono[:, None]),
        (encode_flac(44100, stereo, block_size=512), stereo),
        (encode_flac(44100, stereo, block_size=512, mid_side=True), stereo),
        (encode_flac(22050, mono, block_size=2048, lpc_order=8), mono[:, None]),
        (encode_flac(8000, np.full(3000, -123, dtype=np.int16), block_size=1000),
         np.full((3000, 1), -123)),
        (encode_flac(16000, noise, block_size=1024), noise[:, None]),
    ]
    for payload, want in cases:
        _, _, _, got = decode_flac_samples(payload)
        assert np.array_equal(got, want.astype(np.int64))
    rate, ch, n, dur, rms, peak = decode_flac(cases[0][0])
    assert (rate, ch, n) == (44100, 1, 5000) and peak == 9999


def test_flac_crc_and_md5_guards():
    import numpy as np
    import pytest as _pytest

    from etl_jlp_spark.multimodal.flac import decode_flac_samples, encode_flac

    mono = (5000 * np.sin(np.arange(2000) / 5)).astype(np.int16)
    payload = bytearray(encode_flac(8000, mono, block_size=512))
    # flip one bit inside the first frame's residual bytes
    payload[80] ^= 0x10
    with _pytest.raises(ValueError):
        decode_flac_samples(bytes(payload))
    with _pytest.raises(ValueError):
        decode_flac_samples(b"fLaX" + bytes(payload[4:]))


def test_decode_audio_real_flac_in_spark(spark):
    """'flac' is a REAL audio kind now: the Spark decode matches the
    local codec on every row (mixed fixed/LPC/mid-side payloads)."""
    from etl_jlp_spark.multimodal.binary import decode_audio, synth_audio_df
    from etl_jlp_spark.multimodal.flac import decode_flac

    media = synth_audio_df(spark, n=12, kind="flac")
    out = {r["media_id"]: r for r in decode_audio(media, fake_decode=False).collect()}
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert len(out) == 12
    for mid, payload in src.items():
        rate, ch, n, dur, rms, peak = decode_flac(payload)
        r = out[mid]
        assert (r["sample_rate"], r["n_channels"], r["n_samples"]) == (rate, ch, n)
        assert abs(r["rms"] - rms) < 1e-9 and r["peak"] == peak


def test_flac_decoder_paths_encoder_never_emits():
    """Hand-built frames cover the decode paths the in-repo encoder
    does not produce: VERBATIM subframes, wasted-bits shifts, and
    escape-to-raw Rice partitions."""
    import struct

    import numpy as np

    from etl_jlp_spark.multimodal.flac import (
        _BitWriter,
        _crc8,
        _crc16,
        _utf8_coded_number,
        decode_flac_samples,
    )
    from etl_jlp_spark.multimodal.containers import encode_flac_streaminfo

    n = 64
    rng = np.random.RandomState(3)
    # even samples -> one wasted bit
    samples = (rng.randint(-2000, 2000, n) * 2).astype(np.int64)

    def frame(subframe_writer) -> bytes:
        hdr = bytearray([0xFF, 0xF8, 0x70, 0x04 << 1])
        hdr += _utf8_coded_number(0)
        hdr += struct.pack(">H", n - 1)
        hdr.append(_crc8(bytes(hdr)))
        bw = _BitWriter()
        subframe_writer(bw)
        bw.align()
        body = bytes(hdr) + bw.bytes()
        return body + struct.pack(">H", _crc16(body))

    # 1) VERBATIM subframe
    def verbatim(bw):
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)
        for s in samples:
            bw.write_signed(int(s), 16)

    # 2) wasted-bits CONSTANT: value 4 = (1 << 2) with 2 wasted bits
    def wasted_const(bw):
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(1, 1)          # wasted flag
        bw.write_unary(1)       # unary 1 -> wasted = 2
        bw.write_signed(1, 14)  # bps drops to 16-2
    # 3) FIXED order 0 with an escape partition (5-bit raw residuals)
    def escaped_fixed(bw):
        bw.write(0, 1)
        bw.write(8, 6)          # fixed order 0
        bw.write(0, 1)
        bw.write(0, 2)          # rice method 0
        bw.write(0, 4)          # partition order 0
        bw.write(0b1111, 4)     # escape
        bw.write(5, 5)          # raw bits
        for i in range(n):
            bw.write_signed((i % 16) - 8, 5)

    md5_zero = b"\x00" * 16
    head = encode_flac_streaminfo(
        sample_rate=8000, channels=1, bits=16, total_samples=n,
        audio_md5=md5_zero, min_block=n, max_block=n,
    )
    _, _, _, got = decode_flac_samples(head + frame(verbatim))
    assert np.array_equal(got[:, 0], samples)

    _, _, _, got2 = decode_flac_samples(head + frame(wasted_const))
    assert np.array_equal(got2[:, 0], np.full(n, 4))

    _, _, _, got3 = decode_flac_samples(head + frame(escaped_fixed))
    assert np.array_equal(got3[:, 0], np.array([(i % 16) - 8 for i in range(n)]))
