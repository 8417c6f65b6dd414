"""EXIF metadata: writer + parser for the APP1/TIFF-IFD structure
cameras embed in JPEG, and the Arrow mapInPandas extraction operator.

EXIF (CIPA DC-008 / JEITA, public spec) is a TIFF byte structure
wrapped in a JPEG APP1 segment tagged ``Exif\\0\\0``: IFD0 carries the
camera fields (Make, Model, Orientation, DateTime) plus a pointer tag
(0x8769) to the Exif sub-IFD (ExposureTime rational, ISO). This module
implements both directions over the core field types (BYTE, ASCII,
SHORT, LONG, RATIONAL) — the writer exists so the parser can be
round-trip fuzz-tested without camera fixtures (the encode/decode
pairing every other in-repo codec follows, multimodal/binary.py).

The Spark-side ``exif_report`` mirrors decode_image's shape: Arrow
mapInPandas over the binary payload column, metadata columns out, the
fail-loudly contract from multimodal/robust.py. Scale: pure
per-row byte parsing, zero shuffles; the APP1 segment sits in the
first KB of the payload, so a production reader touches only the
leading bytes of each blob (range reads), never the image data.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from etl_jlp_spark.multimodal.robust import loud_codec

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
_TAG_MAKE, _TAG_MODEL, _TAG_ORIENTATION, _TAG_DATETIME = 0x010F, 0x0110, 0x0112, 0x0132
_TAG_EXIF_IFD = 0x8769
_TAG_EXPOSURE, _TAG_ISO = 0x829A, 0x8827

EXIF_REPORT_SCHEMA = (
    "media_id long, has_exif boolean, make string, model string, "
    "orientation int, datetime string, exposure_num long, exposure_den long, "
    "iso int"
)


def _ifd_bytes(entries: list[tuple[int, int, int, bytes]], ifd_off: int, bo: str) -> bytes:
    """Serialize one IFD at absolute offset ``ifd_off``: the 12-byte
    entry table with >4-byte values spilled after the table."""
    spill_off = ifd_off + 2 + 12 * len(entries) + 4
    table, spill = b"", b""
    for tid, ttype, count, raw in sorted(entries):
        if len(raw) <= 4:
            val = raw.ljust(4, b"\x00")
        else:
            val = struct.pack(f"{bo}I", spill_off + len(spill))
            spill += raw
        table += struct.pack(f"{bo}HHI", tid, ttype, count) + val
    return struct.pack(f"{bo}H", len(entries)) + table + struct.pack(f"{bo}I", 0) + spill


def encode_exif_app1(
    make: str = "SparkCam",
    model: str = "Model-X",
    orientation: int = 1,
    datetime: str = "2024:01:15 12:00:00",
    exposure: tuple[int, int] = (1, 125),
    iso: int = 200,
    byte_order: str = "<",
) -> bytes:
    """Build the APP1 segment body (``Exif\\0\\0`` + TIFF structure):
    IFD0 with Make/Model/Orientation/DateTime and the 0x8769 pointer,
    then the Exif sub-IFD with ExposureTime (RATIONAL) and ISO."""
    bo = byte_order
    mk, md, dt = (s.encode() + b"\x00" for s in (make, model, datetime))
    # lay out IFD0 first to learn where the sub-IFD lands
    ifd0_entries = [
        (_TAG_MAKE, 2, len(mk), mk),
        (_TAG_MODEL, 2, len(md), md),
        (_TAG_ORIENTATION, 3, 1, struct.pack(f"{bo}H", orientation)),
        (_TAG_DATETIME, 2, len(dt), dt),
        (_TAG_EXIF_IFD, 4, 1, struct.pack(f"{bo}I", 0)),  # patched below
    ]
    ifd0 = _ifd_bytes(ifd0_entries, 8, bo)
    sub_off = 8 + len(ifd0)
    ifd0_entries[-1] = (_TAG_EXIF_IFD, 4, 1, struct.pack(f"{bo}I", sub_off))
    ifd0 = _ifd_bytes(ifd0_entries, 8, bo)
    sub = _ifd_bytes(
        [
            (_TAG_EXPOSURE, 5, 1, struct.pack(f"{bo}II", *exposure)),
            (_TAG_ISO, 3, 1, struct.pack(f"{bo}H", iso)),
        ],
        sub_off,
        bo,
    )
    endian = b"II" if bo == "<" else b"MM"
    tiff = endian + struct.pack(f"{bo}HI", 42, 8) + ifd0 + sub
    return b"Exif\x00\x00" + tiff


def insert_app1(jpeg: bytes, app1_body: bytes) -> bytes:
    """Insert an APP1 segment directly after SOI — where cameras put
    it (before JFIF's APP0 is also legal; parsers must not care)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    seg = b"\xff\xe1" + struct.pack(">H", len(app1_body) + 2) + app1_body
    return jpeg[:2] + seg + jpeg[2:]


def _read_ifd(tiff: bytes, bo: str, off: int) -> dict[int, tuple[int, list]]:
    if off + 2 > len(tiff):
        raise ValueError("truncated EXIF IFD")
    (n_tags,) = struct.unpack_from(f"{bo}H", tiff, off)
    tags: dict[int, tuple[int, list]] = {}
    for i in range(n_tags):
        base = off + 2 + i * 12
        tid, ttype, count = struct.unpack_from(f"{bo}HHI", tiff, base)
        size = _TYPE_SIZES.get(ttype)
        if size is None:
            continue  # unknown type: skippable per spec
        total = size * count
        if total <= 4:
            data = tiff[base + 8 : base + 8 + total]
        else:
            (voff,) = struct.unpack_from(f"{bo}I", tiff, base + 8)
            data = tiff[voff : voff + total]
        if len(data) != total:
            raise ValueError(f"truncated EXIF value for tag {tid:#x}")
        if ttype == 2:
            vals: list = [data.rstrip(b"\x00").decode("ascii", "replace")]
        elif ttype == 5:
            pairs = struct.unpack(f"{bo}{2 * count}I", data)
            vals = [(pairs[2 * j], pairs[2 * j + 1]) for j in range(count)]
        else:
            fmt = {1: "B", 3: "H", 4: "I"}[ttype]
            vals = list(struct.unpack(f"{bo}{count}{fmt}", data))
        tags[tid] = (ttype, vals)
    return tags


@loud_codec
def extract_exif(payload: bytes) -> dict | None:
    """Walk the JPEG segment list for APP1 ``Exif\\0\\0``; parse IFD0 +
    the Exif sub-IFD. Returns the named-field dict, or None when the
    JPEG simply has no EXIF (that is data, not corruption); raises on
    a malformed payload/EXIF structure."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos, app1 = 2, None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # SOS: entropy data follows; EXIF must precede
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            app1 = body[6:]
            break
        pos += 2 + seglen
    if app1 is None:
        return None
    if app1[:2] not in (b"II", b"MM"):
        raise ValueError("bad EXIF TIFF header")
    bo = "<" if app1[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(f"{bo}HI", app1, 2)
    if magic != 42:
        raise ValueError("bad EXIF TIFF magic")
    ifd0 = _read_ifd(app1, bo, ifd_off)
    out = {
        "make": ifd0.get(_TAG_MAKE, (2, [None]))[1][0],
        "model": ifd0.get(_TAG_MODEL, (2, [None]))[1][0],
        "orientation": ifd0.get(_TAG_ORIENTATION, (3, [None]))[1][0],
        "datetime": ifd0.get(_TAG_DATETIME, (2, [None]))[1][0],
        "exposure": None,
        "iso": None,
    }
    if _TAG_EXIF_IFD in ifd0:
        sub = _read_ifd(app1, bo, ifd0[_TAG_EXIF_IFD][1][0])
        if _TAG_EXPOSURE in sub:
            out["exposure"] = sub[_TAG_EXPOSURE][1][0]
        if _TAG_ISO in sub:
            out["iso"] = sub[_TAG_ISO][1][0]
    return out


def exif_report(media: DataFrame) -> DataFrame:
    """Arrow-batched EXIF extraction over a binary media column:
    (media_id, has_exif, make, model, orientation, datetime,
    exposure_num/den, iso). Kind validation happens IN-BATCH (the
    decode_image contract — no pre-scan job); non-JPEG kinds raise."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            kinds = pdf["kind"].to_numpy()
            bad = sorted(set(kinds[~np.isin(kinds, ["jpeg"])]))
            if bad:
                raise NotImplementedError(f"exif_report reads JPEG only, got {bad}")
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                d = extract_exif(bytes(p))
                if d is None:
                    rows.append((mid, False, None, None, None, None, None, None, None))
                else:
                    exp = d["exposure"] or (None, None)
                    rows.append(
                        (
                            mid,
                            True,
                            d["make"],
                            d["model"],
                            d["orientation"],
                            d["datetime"],
                            exp[0],
                            exp[1],
                            d["iso"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "has_exif",
                    "make",
                    "model",
                    "orientation",
                    "datetime",
                    "exposure_num",
                    "exposure_den",
                    "iso",
                ],
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, EXIF_REPORT_SCHEMA
    )
