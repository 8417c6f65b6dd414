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
