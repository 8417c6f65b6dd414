"""Property-based tests (hypothesis): the Spark operators must agree
with straightforward single-machine reference implementations on
arbitrary small inputs — the same oracle idea as the DuckDB gate, but
adversarial instead of fixed."""

import datetime as dt

from hypothesis import given, settings, strategies as st

from etl_jlp_spark.operators.sessionize import (
    SESSION_GAP_S,
    with_session_id,
    with_time_on_page,
)

BASE = dt.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user_id
        st.integers(min_value=0, max_value=10_000),  # offset seconds
    ),
    min_size=1,
    max_size=25,
)


def _ref_sessions(rows):
    """Reference: per user, sorted by (ts, event_id); gap > 1800s → new."""
    out = {}
    by_user = {}
    for eid, (u, s) in enumerate(rows):
        by_user.setdefault(u, []).append((s, eid))
    for u, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        for s, eid in evs:
            if prev is None or (s - prev) > SESSION_GAP_S:
                sid += 1
            out[eid] = sid
            prev = s
    return out


@settings(max_examples=15, deadline=None)
@given(events_strategy)
def test_sessionize_matches_reference(spark, rows):
    df = spark.createDataFrame(
        [(eid, u, BASE + dt.timedelta(seconds=s)) for eid, (u, s) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp",
    )
    got = {r["event_id"]: r["session_id"] for r in with_session_id(df).collect()}
    assert got == _ref_sessions(rows)


@settings(max_examples=15, deadline=None)
@given(events_strategy)
def test_time_on_page_invariants(spark, rows):
    df = spark.createDataFrame(
        [(eid, u, BASE + dt.timedelta(seconds=s)) for eid, (u, s) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp",
    )
    res = with_time_on_page(df).collect()
    assert len(res) == len(rows)
    by_user = {}
    for r in res:
        by_user.setdefault(r["user_id"], []).append(r)
    for user_rows in by_user.values():
        user_rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        # capped never exceeds cap; raw never negative; exactly the last
        # event per user carries the 1800s default-or-real rule
        for i, r in enumerate(user_rows):
            assert r["capped_time_on_page"] <= 3600.0
            assert r["raw_time_on_page"] >= 0.0
            if i < len(user_rows) - 1:
                nxt = user_rows[i + 1]
                want = (nxt["ts"] - r["ts"]).total_seconds()
                assert abs(r["raw_time_on_page"] - want) < 1e-6
            else:
                assert r["raw_time_on_page"] == 1800.0


# --- codec robustness: corrupt bytes always raise ValueError ---------------

import numpy as _np

from etl_jlp_spark.multimodal.binary import (
    decode_avi as _d_avi,
    decode_bmp as _d_bmp,
    decode_png as _d_png,
    decode_wav as _d_wav,
    encode_avi as _e_avi,
    encode_bmp as _e_bmp,
    encode_png as _e_png,
    encode_wav as _e_wav,
)
from etl_jlp_spark.multimodal.gif import decode_gif as _d_gif, encode_gif as _e_gif
from etl_jlp_spark.multimodal.jpeg import decode_jpeg as _d_jpeg, encode_jpeg as _e_jpeg
from etl_jlp_spark.multimodal.tiff import decode_tiff as _d_tiff, encode_tiff as _e_tiff

from etl_jlp_spark.multimodal.containers import (
    encode_flac_streaminfo as _e_fsi,
    encode_mp3_frames as _e_mp3,
    encode_mp4_skeleton as _e_mp4,
    encode_ogg_vorbis_skeleton as _e_ogg,
    extract_flac_streaminfo as _x_fsi,
    extract_mp3_frames as _x_mp3,
    extract_mp4_meta as _x_mp4,
    extract_ogg_meta as _x_ogg,
)
from etl_jlp_spark.multimodal.exif import (
    encode_exif_app1 as _e_exif,
    extract_exif as _x_exif,
    insert_app1 as _ins_app1,
)
from etl_jlp_spark.multimodal.id3 import encode_id3 as _e_id3, extract_id3 as _x_id3

_px = lambda x, y: (x * 20 % 256, y * 30 % 256, 5)  # noqa: E731
_CODEC_SEEDS = {
    _d_bmp: _e_bmp(9, 7, _px),
    _d_png: _e_png(9, 7, _px, filter_type=4),
    _d_jpeg: _e_jpeg(9, 7, _px),
    _d_gif: _e_gif(9, 7, _px, interlace=True),
    _d_tiff: _e_tiff(9, 7, _px, compression=5, predictor=2),
    _d_wav: _e_wav(8000, (1000 * _np.sin(_np.arange(200) / 5)).astype(_np.int16)),
    _d_avi: _e_avi(4, 6, [_np.full((6, 4, 3), i * 30, dtype=_np.uint8) for i in range(2)]),
    # container-metadata parsers: same loud-codec contract — they run
    # inside the driver-gated media_metadata_report dispatch
    _x_fsi: _e_fsi(22050, 1, 16, 44100),
    _x_mp4: _e_mp4(2.5, 1000, 2),
    _x_mp3: _e_mp3(4, 128, 44100),
    _x_ogg: _e_ogg(22050, 1, 66150, 4),
    _x_exif: _ins_app1(_e_jpeg(8, 8, _px), _e_exif()),
    _x_id3: _e_id3(title="T"),
}


@settings(max_examples=120, deadline=None)
@given(
    decoder=st.sampled_from(sorted(_CODEC_SEEDS, key=lambda f: f.__name__)),
    data=st.data(),
)
def test_corrupt_media_always_raises_valueerror(decoder, data):
    """A decoder inside a 1000-executor mapInPandas must fail corrupt
    payloads with ONE catchable type (quarantine the row, keep the
    batch); IndexError/struct.error/zlib.error would kill the task.
    Exercised three ways: random bytes, bit-flipped real streams,
    truncated real streams. Valid output is also allowed — a flip may
    land in pixel data."""
    seed = _CODEC_SEEDS[decoder]
    mode = data.draw(st.integers(0, 2))
    if mode == 0:
        payload = bytes(data.draw(st.binary(max_size=150)))
    else:
        buf = bytearray(seed)
        for pos in data.draw(
            st.lists(st.integers(0, len(seed) - 1), min_size=1, max_size=8)
        ):
            buf[pos] = data.draw(st.integers(0, 255))
        if mode == 2:
            buf = buf[: data.draw(st.integers(1, len(buf)))]
        payload = bytes(buf)
    try:
        decoder(payload)
    except (ValueError, NotImplementedError):
        pass  # the contract


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=200),
    st.sampled_from(["ulaw", "alaw"]),
)
def test_g711_companding_properties(samples, law):
    import numpy as np

    from etl_jlp_spark.multimodal.binary import (
        _g711_alaw_decode,
        _g711_alaw_encode,
        _g711_ulaw_decode,
        _g711_ulaw_encode,
    )

    enc = _g711_ulaw_encode if law == "ulaw" else _g711_alaw_encode
    dec = _g711_ulaw_decode if law == "ulaw" else _g711_alaw_decode
    x = np.array(samples, dtype=np.int16)
    y = dec(enc(x))
    # sign preserved (0 may decode to the minimum positive A-law step)
    assert ((y >= 0) == (x >= 0))[np.abs(x) > 8].all()
    # bounded relative error outside the tiny-signal region
    big = np.abs(x.astype(int)) > 256
    if big.any():
        rel = np.abs(y.astype(int) - x.astype(int))[big] / np.abs(x.astype(int))[big]
        assert rel.max() < 0.13
    # value-level idempotence
    assert np.array_equal(dec(enc(y)), y)


@settings(max_examples=40, deadline=None)
@given(
    st.text(alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
            min_size=0, max_size=60),
    st.sampled_from([3, 4]),
    st.sampled_from([1, 3]),
)
def test_id3_roundtrip_property(title, version, encoding):
    from etl_jlp_spark.multimodal.id3 import encode_id3, extract_id3

    d = extract_id3(encode_id3(title=title, version=version, encoding=encoding))
    assert d["version"] == version
    assert d["title"] == title


counts_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),  # cents value
        st.integers(min_value=1, max_value=5),  # count
    ),
    min_size=1,
    max_size=8,
)


def _ref_w1_dollars(ref_counts, cur_counts):
    """Exact 1-D Wasserstein between two cents-count samples via
    Fraction arithmetic: ∫|F_ref − F_cur| dv over the merged grid."""
    from fractions import Fraction

    agg_r, agg_c = {}, {}
    for v, c in ref_counts:
        agg_r[v] = agg_r.get(v, 0) + c
    for v, c in cur_counts:
        agg_c[v] = agg_c.get(v, 0) + c
    na, nb = sum(agg_r.values()), sum(agg_c.values())
    grid = sorted(set(agg_r) | set(agg_c))
    total, ca, cb = Fraction(0), 0, 0
    for v, nxt in zip(grid, grid[1:]):
        ca += agg_r.get(v, 0)
        cb += agg_c.get(v, 0)
        total += abs(Fraction(ca, na) - Fraction(cb, nb)) * (nxt - v)
    return float(total) / 100.0


@settings(max_examples=15, deadline=None)
@given(counts_strategy, counts_strategy)
def test_w1_helper_matches_exact_fraction_reference(spark, ref_counts, cur_counts):
    """w1_against_reference (the shared drift core, incl. the 100 TB
    decimal(38,0) pre-cast path) must equal an exact-arithmetic
    single-machine Wasserstein on arbitrary small inputs."""
    from pyspark.sql import functions as F

    from etl_jlp_spark.plans.nonparam import w1_against_reference

    schema = "event_type string, v long, c long"

    def counts_df(pairs):
        return (
            spark.createDataFrame([("a", v, c) for v, c in pairs], schema)
            .groupBy("event_type", "v")
            .agg(F.sum("c").alias("c"))
        )

    ref, cur = counts_df(ref_counts), counts_df(cur_counts)
    got = w1_against_reference(cur, ref).collect()[0]["w1_dollars"]
    want = _ref_w1_dollars(ref_counts, cur_counts)
    assert abs(got - want) <= 2e-6, (got, want)


def _half_away_e6(num: int, den: int, scale: int = 10**6) -> int:
    """Exact round-half-away-from-zero of scale·num/den (den > 0)."""
    from fractions import Fraction
    import math

    x = Fraction(num * scale, den)
    if x >= 0:
        return math.floor(x + Fraction(1, 2))
    return -math.floor(-x + Fraction(1, 2))


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-10**9, max_value=10**9),  # num (signed)
            st.integers(min_value=1, max_value=10**9),  # den
        ),
        min_size=1,
        max_size=12,
    )
)
def test_signed_integer_half_away_div_matches_fraction(spark, pairs):
    """The cliffs/W1 integer-rounding expression — CASE-split half-away
    floor division in DECIMAL(38,0) — must equal exact-Fraction
    half-away rounding, INCLUDING negative near-zero numerators (the
    round-8 driver-hash class: signed statistics rounding to ±0 at the
    decimal boundary). Exercises exact half ties explicitly."""
    from pyspark.sql import functions as F
    # salt in exact tie cases: num/den = ±1/(2e6) rounds half-away to ±1
    pairs = pairs + [(1, 2 * 10**6), (-1, 2 * 10**6), (3, 2 * 10**6), (-3, 2 * 10**6)]
    df = spark.createDataFrame(
        [(i, n, d) for i, (n, d) in enumerate(pairs)],
        "i long, num_l long, den_l long",
    ).select(
        "i",
        F.col("num_l").cast("decimal(38,0)").alias("num"),
        F.col("den_l").cast("decimal(38,0)").alias("den"),
    )
    got = {
        r["i"]: r["e6"]
        for r in df.select(
            "i",
            F.expr(
                "CASE WHEN num >= 0 THEN (2000000 * num + den) div (2 * den) "
                "ELSE -((2000000 * (-num) + den) div (2 * den)) END"
            ).alias("e6"),
        ).collect()
    }
    for i, (n, d) in enumerate(pairs):
        assert got[i] == _half_away_e6(n, d), (n, d, got[i])
