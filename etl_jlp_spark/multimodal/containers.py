"""Container-level metadata for codec-boundary formats: FLAC
STREAMINFO and MP4 box structure — plus the kind-dispatching
media_metadata_report.

The audio/video SAMPLE data of flac/mp4 stays behind the declared
codec-library boundary (decode_audio / decode_video raise for them);
their CONTAINER metadata does not: FLAC's STREAMINFO block
(xiph.org spec: 34 bytes after the ``fLaC`` marker — sample rate,
channels, bit depth, total samples, unencoded-audio MD5) and MP4's
box/atom tree (ISO 14496-12: length-prefixed fourcc boxes; mvhd
carries timescale + duration, trak count = stream count) are plain
byte structures. Writers exist so the parsers round-trip-test without
fixture files (the encode/decode pairing of every in-repo codec).

``media_metadata_report`` is the kind-dispatching inventory:
jpeg → EXIF, mp3 → ID3, flac → STREAMINFO, mp4 → boxes, all in ONE
Arrow mapInPandas pass with the in-batch validation contract. At
100 TB the report range-reads leading bytes per blob; no sample data
moves.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from etl_jlp_spark.multimodal.exif import extract_exif
from etl_jlp_spark.multimodal.id3 import extract_id3
from etl_jlp_spark.multimodal.robust import loud_codec

# ---------------------------------------------------------------------------
# FLAC STREAMINFO
# ---------------------------------------------------------------------------


def encode_flac_streaminfo(
    sample_rate: int = 44100,
    channels: int = 2,
    bits: int = 16,
    total_samples: int = 44100,
    audio_md5: bytes = b"\x00" * 16,
    min_block: int = 4096,
    max_block: int = 4096,
) -> bytes:
    """``fLaC`` marker + a last-metadata STREAMINFO block (no frames —
    the audio itself is the codec boundary)."""
    body = struct.pack(">HH", min_block, max_block)
    body += (0).to_bytes(3, "big") * 2  # min/max frame size (unknown)
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits - 1) << 36)
        | (total_samples & ((1 << 36) - 1))
    )
    body += packed.to_bytes(8, "big") + audio_md5
    header = bytes([0x80]) + len(body).to_bytes(3, "big")  # last-block | type 0
    return b"fLaC" + header + body


@loud_codec
def extract_flac_streaminfo(payload: bytes) -> dict | None:
    """Parse the STREAMINFO block; None for non-FLAC payloads, raises
    on a corrupt FLAC structure."""
    if len(payload) < 4 or payload[:4] != b"fLaC":
        return None
    pos = 4
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        btype, last = hdr & 0x7F, bool(hdr & 0x80)
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if len(body) != size:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            if size != 34:
                raise ValueError(f"STREAMINFO must be 34 bytes, got {size}")
            packed = int.from_bytes(body[10:18], "big")
            return {
                "sample_rate": packed >> 44,
                "channels": ((packed >> 41) & 0x7) + 1,
                "bits": ((packed >> 36) & 0x1F) + 1,
                "total_samples": packed & ((1 << 36) - 1),
                "audio_md5": body[18:34].hex(),
            }
        if last:
            break
        pos += 4 + size
    raise ValueError("FLAC payload without STREAMINFO")


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF box walker
# ---------------------------------------------------------------------------


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + fourcc + body


def encode_mp4_skeleton(
    duration_s: float = 12.5, timescale: int = 1000, n_tracks: int = 2, brand: bytes = b"isom"
) -> bytes:
    """ftyp + moov(mvhd + n_tracks empty trak boxes): the structural
    minimum a real player indexes before touching any sample data."""
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0
        + struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", timescale, int(round(duration_s * timescale)))
        + b"\x00" * 80,  # rate/volume/matrix/next-track boilerplate
    )
    traks = b"".join(_box(b"trak", b"") for _ in range(n_tracks))
    return ftyp + _box(b"moov", mvhd + traks)


@loud_codec
def extract_mp4_meta(payload: bytes) -> dict | None:
    """Walk top-level boxes; parse moov/mvhd + count trak children.
    None for non-MP4 payloads (no ftyp), raises on corrupt boxes."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    out = {"brand": payload[8:12].decode("latin-1"), "timescale": None,
           "duration_s": None, "n_tracks": 0, "boxes": []}

    def walk(lo: int, hi: int, depth: int) -> None:
        pos = lo
        while pos + 8 <= hi:
            (size,) = struct.unpack_from(">I", payload, pos)
            fourcc = payload[pos + 4 : pos + 8].decode("latin-1")
            if size < 8 or pos + size > hi:
                raise ValueError(f"corrupt MP4 box {fourcc!r} size {size}")
            if depth == 0:
                out["boxes"].append(fourcc)
            if fourcc == "moov":
                walk(pos + 8, pos + size, depth + 1)
            elif fourcc == "trak":
                out["n_tracks"] += 1
            elif fourcc == "mvhd":
                version = payload[pos + 8]
                if version != 0:
                    raise ValueError("mvhd version 1 (64-bit) not supported")
                ts, dur = struct.unpack_from(">II", payload, pos + 8 + 12)
                out["timescale"] = ts
                out["duration_s"] = round(dur / ts, 3) if ts else None
            pos += size

    walk(0, len(payload), 0)
    return out


# ---------------------------------------------------------------------------
# Kind-dispatching inventory report
# ---------------------------------------------------------------------------

MEDIA_META_SCHEMA = (
    "media_id long, kind string, has_meta boolean, summary string"
)

_DISPATCH = {
    "jpeg": lambda p: extract_exif(p),
    "mp3": lambda p: extract_id3(p),
    "flac": lambda p: extract_flac_streaminfo(p),
    "mp4": lambda p: extract_mp4_meta(p),
    "ogg": lambda p: extract_ogg_meta(p),
}


def media_metadata_report(media: DataFrame) -> DataFrame:
    """One-pass metadata inventory across mixed media kinds: each row
    dispatches to the format's REAL parser (EXIF / ID3 / STREAMINFO /
    box walker); ``summary`` is a stable ``k=v`` rendering of the
    parsed dict. Unknown kinds fail loudly in-batch (the decode_image
    contract)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            bad = sorted(set(pdf["kind"]) - set(_DISPATCH))
            if bad:
                raise NotImplementedError(
                    f"media_metadata_report knows {sorted(_DISPATCH)}, got {bad}"
                )
            rows = []
            for mid, kind, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                d = _DISPATCH[kind](bytes(p))
                if d is None:
                    rows.append((mid, kind, False, None))
                else:
                    summary = ";".join(
                        f"{k}={d[k]}" for k in sorted(d) if not isinstance(d[k], list)
                    )
                    rows.append((mid, kind, True, summary))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "has_meta", "summary"])

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, MEDIA_META_SCHEMA
    )


# ---------------------------------------------------------------------------
# MP3 frame-header scan — duration/bitrate WITHOUT decoding (the
# metadata layer of the perceptual-codec boundary, like STREAMINFO
# for FLAC). MPEG-1 Layer III header fields per ISO/IEC 11172-3 §2.4.
# ---------------------------------------------------------------------------

_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_RATES = (44100, 48000, 32000)
_MP3_SPF = 1152  # samples per MPEG-1 Layer III frame


def encode_mp3_frames(
    n_frames: int = 8, bitrate_kbps: int = 128, sample_rate: int = 44100,
    id3: bytes = b"",
) -> bytes:
    """Structurally-valid MPEG-1 Layer III stream: correct frame
    headers + zero main data (a header scanner indexes it exactly like
    a real encode; only the psychoacoustic sample data is fake)."""
    bi = _MP3_BITRATES.index(bitrate_kbps)
    si = _MP3_RATES.index(sample_rate)
    out = bytearray(id3)
    for i in range(n_frames):
        pad = (i % 2 == 1) if sample_rate == 44100 else False
        size = 144 * bitrate_kbps * 1000 // sample_rate + (1 if pad else 0)
        h = 0xFFE00000 | (0x3 << 19) | (0x1 << 17)  # sync | MPEG-1 | Layer III
        h |= 0x1 << 16  # no CRC
        h |= bi << 12 | si << 10 | (1 if pad else 0) << 9
        h |= 0x0 << 6  # stereo
        out += struct.pack(">I", h) + b"\x00" * (size - 4)
    return bytes(out)


@loud_codec
def extract_mp3_frames(payload: bytes) -> dict | None:
    """Walk MPEG-1 Layer III frame headers (skipping a leading ID3v2
    tag): frame count, bitrate mode (cbr/vbr), and the play duration
    every UI shows without any decoder. None when no sync is found at
    the expected position; raises on corrupt/truncated frames."""
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        sz = 0
        for b in payload[6:10]:
            sz = (sz << 7) | (b & 0x7F)
        pos = 10 + sz
    if pos + 4 > len(payload) or payload[pos] != 0xFF or (payload[pos + 1] & 0xE0) != 0xE0:
        return None
    n_frames, rates, brs = 0, set(), []
    while pos + 4 <= len(payload):
        (h,) = struct.unpack_from(">I", payload, pos)
        if (h >> 21) != 0x7FF:
            raise ValueError(f"lost MP3 sync at byte {pos}")
        if (h >> 19) & 0x3 != 0x3 or (h >> 17) & 0x3 != 0x1:
            raise ValueError("only MPEG-1 Layer III streams are scanned")
        bi, si = (h >> 12) & 0xF, (h >> 10) & 0x3
        if bi in (0, 15) or si == 3:
            raise ValueError("free-format/reserved bitrate or rate index")
        br, rate = _MP3_BITRATES[bi], _MP3_RATES[si]
        pad = (h >> 9) & 1
        size = 144 * br * 1000 // rate + pad
        if pos + size > len(payload):
            raise ValueError("truncated final MP3 frame")
        n_frames += 1
        rates.add(rate)
        brs.append(br)
        pos += size
    rate = rates.pop() if len(rates) == 1 else None
    if rate is None:
        raise ValueError("mixed sample rates in one stream")
    return {
        "n_frames": n_frames,
        "sample_rate": rate,
        "bitrate_kbps": round(sum(brs) / len(brs), 1),
        "mode": "cbr" if len(set(brs)) == 1 else "vbr",
        "duration_s": round(n_frames * _MP3_SPF / rate, 3),
    }


# ---------------------------------------------------------------------------
# Ogg page walker + Vorbis identification header (RFC 3533 pages,
# Vorbis I §4.2.2 ident packet) — CRC-verified like the FLAC frames.
# ---------------------------------------------------------------------------


def _ogg_crc(data: bytes) -> int:
    """Ogg CRC-32: poly 0x04C11DB7, init 0, no reflection, xorout 0."""
    crc = 0
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if crc & 0x80000000 else (crc << 1) & 0xFFFFFFFF
    return crc


def _ogg_page(serial: int, seq: int, granule: int, packet: bytes, htype: int) -> bytes:
    lacing = []
    rest = len(packet)
    while rest >= 255:
        lacing.append(255)
        rest -= 255
    lacing.append(rest)
    hdr = (
        b"OggS" + bytes([0, htype])
        + struct.pack("<q", granule)
        + struct.pack("<II", serial, seq)
        + b"\x00\x00\x00\x00"
        + bytes([len(lacing)]) + bytes(lacing)
    )
    page = bytearray(hdr + packet)
    crc = _ogg_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def encode_ogg_vorbis_skeleton(
    sample_rate: int = 44100, channels: int = 2, total_samples: int = 44100,
    n_audio_pages: int = 3, serial: int = 0x1234,
) -> bytes:
    """First page = the real Vorbis identification packet (BOS), then
    n_audio_pages of opaque 'audio' pages whose granule positions
    advance to total_samples (EOS on the last) — the structural layer a
    streaming server seeks/bisects on; only packet CONTENTS stay fake."""
    ident = (
        b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
        + struct.pack("<I", sample_rate) + struct.pack("<iii", 0, 128000, 0)
        + bytes([0xB8]) + bytes([1])
    )
    out = _ogg_page(serial, 0, 0, ident, htype=0x02)  # BOS
    for i in range(1, n_audio_pages + 1):
        gran = total_samples * i // n_audio_pages
        htype = 0x04 if i == n_audio_pages else 0x00  # EOS on last
        out += _ogg_page(serial, i, gran, b"\xde\xad" * 10, htype)
    return out


@loud_codec
def extract_ogg_meta(payload: bytes) -> dict | None:
    """Walk Ogg pages (capture pattern + CRC verified per page), parse
    the Vorbis identification header from the BOS packet, and derive
    duration from the final granule position. None for non-Ogg
    payloads; raises on corrupt pages or a bad page CRC."""
    if payload[:4] != b"OggS":
        return None
    pos, n_pages, last_granule = 0, 0, 0
    rate, channels = None, None
    while pos < len(payload):
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError(f"lost Ogg capture pattern at byte {pos}")
        if pos + 27 > len(payload):
            raise ValueError("truncated Ogg page header")
        (granule,) = struct.unpack_from("<q", payload, pos + 6)
        (crc_stored,) = struct.unpack_from("<I", payload, pos + 22)
        nseg = payload[pos + 26]
        seg_end = pos + 27 + nseg
        if seg_end > len(payload):
            raise ValueError("truncated Ogg lacing table")
        body_len = sum(payload[pos + 27 : seg_end])
        page_end = seg_end + body_len
        if page_end > len(payload):
            raise ValueError("truncated Ogg page body")
        zeroed = bytearray(payload[pos:page_end])
        zeroed[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(zeroed)) != crc_stored:
            raise ValueError(f"Ogg page CRC mismatch at byte {pos}")
        body = payload[seg_end:page_end]
        if n_pages == 0:
            if body[:7] != b"\x01vorbis":
                raise ValueError("BOS packet is not a Vorbis identification header")
            channels = body[11]
            (rate,) = struct.unpack_from("<I", body, 12)
            if rate == 0 or channels == 0:
                raise ValueError("zero rate/channels in Vorbis ident")
        n_pages += 1
        last_granule = max(last_granule, granule)
        pos = page_end
    return {
        "n_pages": n_pages,
        "sample_rate": rate,
        "channels": channels,
        "duration_s": round(last_granule / rate, 3),
    }
