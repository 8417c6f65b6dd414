"""ID3v2 audio metadata: writer + parser + mapInPandas report — the
audio twin of multimodal/exif.py.

MP3 AUDIO is a codec-library boundary here (decode_audio raises for
it, by design); its METADATA is not — ID3v2 (id3.org, public spec) is
a plain byte structure prepended to the stream: a 10-byte header
(``ID3``, version, flags, syncsafe size) followed by frames
(4-char id, size — syncsafe in v2.4, plain big-endian in v2.3 —
flags, payload). Text frames carry an encoding byte: 0x00 ISO-8859-1,
0x01 UTF-16 with BOM, 0x03 UTF-8. This module writes and parses both
versions over the common frames (TIT2 title, TPE1 artist, TALB album,
TRCK track, TYER/TDRC year), so a curation pipeline can inventory an
audio corpus without decoding a single frame of audio.

``id3_report`` mirrors exif_report: Arrow mapInPandas over the binary
payload, metadata columns out, in-batch kind validation, fail-loudly
per multimodal/robust.py. Scale: the tag sits at the FRONT of the
payload — a production reader range-reads the first KBs only.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from etl_jlp_spark.multimodal.robust import loud_codec

_TEXT_FRAMES = {"TIT2", "TPE1", "TALB", "TRCK", "TYER", "TDRC"}

ID3_REPORT_SCHEMA = (
    "media_id long, has_id3 boolean, version int, title string, "
    "artist string, album string, track string, year string"
)


def _syncsafe(n: int) -> bytes:
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F])


def _unsyncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def encode_id3(
    title: str = "Track",
    artist: str = "Artist",
    album: str = "Album",
    track: str = "1/12",
    year: str = "2024",
    version: int = 4,
    encoding: int = 3,
) -> bytes:
    """Build an ID3v2.3 or v2.4 tag block. ``encoding``: 0 ISO-8859-1,
    1 UTF-16+BOM, 3 UTF-8 (v2.4 only per spec; the parser is lenient)."""
    if version not in (3, 4):
        raise ValueError("only ID3v2.3 / v2.4")
    year_frame = "TDRC" if version == 4 else "TYER"
    frames = b""
    for fid, text in (
        ("TIT2", title),
        ("TPE1", artist),
        ("TALB", album),
        ("TRCK", track),
        (year_frame, year),
    ):
        if encoding == 0:
            data = bytes([0]) + text.encode("latin-1")
        elif encoding == 1:
            data = bytes([1]) + b"\xff\xfe" + text.encode("utf-16-le")  # LE BOM
        else:
            data = bytes([3]) + text.encode("utf-8")
        size = _syncsafe(len(data)) if version == 4 else struct.pack(">I", len(data))
        frames += fid.encode("ascii") + size + b"\x00\x00" + data
    return b"ID3" + bytes([version, 0, 0]) + _syncsafe(len(frames)) + frames


def _decode_text(data: bytes) -> str:
    if not data:
        return ""
    enc, body = data[0], data[1:]
    if enc == 0:
        return body.split(b"\x00")[0].decode("latin-1")
    if enc == 1:
        if body[:2] in (b"\xff\xfe", b"\xfe\xff"):
            return body.decode("utf-16").split("\x00")[0]
        return body.decode("utf-16-le").split("\x00")[0]
    if enc == 3:
        return body.split(b"\x00")[0].decode("utf-8")
    raise ValueError(f"unsupported ID3 text encoding {enc}")


@loud_codec
def extract_id3(payload: bytes) -> dict | None:
    """Parse a leading ID3v2.3/2.4 tag; None when the payload simply
    has no tag (data, not corruption); raises on a malformed tag."""
    if len(payload) < 10 or payload[:3] != b"ID3":
        return None
    version = payload[3]
    if version not in (3, 4):
        raise ValueError(f"unsupported ID3v2.{version}")
    flags = payload[5]
    if flags & 0x80:
        raise ValueError("unsynchronised ID3 tags not supported")
    tag_size = _unsyncsafe(payload[6:10])
    pos, end = 10, 10 + tag_size
    if end > len(payload):
        raise ValueError("truncated ID3 tag")
    out: dict[str, str | int | None] = {
        "version": version,
        "title": None,
        "artist": None,
        "album": None,
        "track": None,
        "year": None,
    }
    names = {"TIT2": "title", "TPE1": "artist", "TALB": "album", "TRCK": "track",
             "TYER": "year", "TDRC": "year"}
    while pos + 10 <= end:
        fid = payload[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":  # padding
            break
        raw_size = payload[pos + 4 : pos + 8]
        fsize = _unsyncsafe(raw_size) if version == 4 else struct.unpack(">I", raw_size)[0]
        data = payload[pos + 10 : pos + 10 + fsize]
        if len(data) != fsize:
            raise ValueError(f"truncated ID3 frame {fid!r}")
        fid_s = fid.decode("ascii", "replace")
        if fid_s in _TEXT_FRAMES:
            out[names[fid_s]] = _decode_text(data)
        pos += 10 + fsize
    return out


def id3_report(media: DataFrame) -> DataFrame:
    """Arrow-batched ID3 inventory over a binary media column:
    (media_id, has_id3, version, title, artist, album, track, year).
    Kind validation is in-batch (the decode_image contract); accepts
    'mp3' — the format whose AUDIO stays behind the codec boundary."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            kinds = pdf["kind"].to_numpy()
            bad = sorted(set(kinds[~np.isin(kinds, ["mp3"])]))
            if bad:
                raise NotImplementedError(f"id3_report reads mp3 payloads only, got {bad}")
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                d = extract_id3(bytes(p))
                if d is None:
                    rows.append((mid, False, None, None, None, None, None, None))
                else:
                    rows.append(
                        (
                            mid,
                            True,
                            d["version"],
                            d["title"],
                            d["artist"],
                            d["album"],
                            d["track"],
                            d["year"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "has_id3",
                    "version",
                    "title",
                    "artist",
                    "album",
                    "track",
                    "year",
                ],
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, ID3_REPORT_SCHEMA
    )
