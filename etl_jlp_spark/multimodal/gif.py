"""Pure-python GIF codec (GIF87a/89a): real LZW, palettes, interlace.

Fourth real image codec behind ``decode_image`` (after BMP/PNG/JPEG —
the reference has no codecs at all; binary.py:220 holds the registry).
Scope: the complete still-image core of the format —

- variable-width LZW (3..12-bit codes, LSB-first bit packing, clear /
  end codes, deferred-clear tolerated on decode, dictionary reset
  emitted by the encoder at 4096);
- global and local color tables;
- the four-pass interlace row order (decode reorders; the encoder can
  emit it for fixtures);
- extension blocks (graphic control, comment, application) are parsed
  and skipped.

Loud boundary: a multi-frame animation decodes its FIRST frame;
anything structurally invalid raises ValueError, never mis-decodes.
"""

from __future__ import annotations

import struct

import numpy as np

from etl_jlp_spark.multimodal.robust import check_dims, loud_codec

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> list[int]:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, height, step))
    return order


class _BitWriter:
    """LSB-first bit packer (GIF's sub-byte ordering)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.out)


def _lzw_encode(indices: list[int], mcs: int) -> bytes:
    clear, end = 1 << mcs, (1 << mcs) + 1
    bw = _BitWriter()
    bw.write(clear, mcs + 1)
    table: dict[bytes, int] = {bytes((i,)): i for i in range(1 << mcs)}
    next_code, width = end + 1, mcs + 1
    w = b""
    for sym in indices:
        wk = w + bytes((sym,))
        if wk in table:
            w = wk
            continue
        bw.write(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # dictionary full: reset, as real encoders do
            bw.write(clear, width)
            table = {bytes((i,)): i for i in range(1 << mcs)}
            next_code, width = end + 1, mcs + 1
        w = bytes((sym,))
    if w:
        bw.write(table[w], width)
    bw.write(end, width)
    return bw.flush()


def _lzw_decode(data: bytes, mcs: int, expected: int) -> bytes:
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    table: list[bytes] = []
    acc = nbits = pos = 0
    width = mcs + 1
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes((i,)) for i in range(1 << mcs)] + [b"", b""]
        width = mcs + 1
        prev = None

    reset()
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream ended without end code")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt GIF LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) > expected:
            raise ValueError("GIF LZW produced more pixels than the frame holds")
    if len(out) != expected:
        raise ValueError(f"GIF frame decoded {len(out)} of {expected} pixels")
    return bytes(out)


def encode_gif(width: int, height: int, pixel_fn, interlace: bool = False) -> bytes:
    """Single-frame GIF89a with a global color table built from the
    image's own distinct colors (≤256 — raises beyond; GIF is an
    indexed format, quantization is the caller's job)."""
    pixels = [pixel_fn(x, y) for y in range(height) for x in range(width)]
    palette: list[tuple[int, int, int]] = []
    index: dict[tuple[int, int, int], int] = {}
    for p in pixels:
        p = (p[0] & 0xFF, p[1] & 0xFF, p[2] & 0xFF)
        if p not in index:
            index[p] = len(palette)
            palette.append(p)
    if len(palette) > 256:
        raise ValueError(f"GIF needs ≤256 distinct colors, got {len(palette)}")
    size_bits = 0  # color table holds 2^(size_bits+1) entries
    while (2 << size_bits) < len(palette):
        size_bits += 1
    n_entries = 2 << size_bits
    mcs = max(2, size_bits + 1)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | 0x70 | size_bits, 0, 0)
    for r, g, b in palette:
        out += bytes((r, g, b))
    out += b"\x00\x00\x00" * (n_entries - len(palette))
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0x40 if interlace else 0)

    rows = range(height) if not interlace else _interlace_order(height)
    idx_stream = [
        index[(pixels[y * width + x][0] & 0xFF, pixels[y * width + x][1] & 0xFF, pixels[y * width + x][2] & 0xFF)]
        for y in rows
        for x in range(width)
    ]
    out.append(mcs)
    lzw = _lzw_encode(idx_stream, mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


@loud_codec
def decode_gif(payload: bytes) -> tuple[int, int, float, float, float]:
    """(width, height, mean_r, mean_g, mean_b) of the first frame.
    Handles 87a/89a, global/local color tables, interlace, extension
    blocks; raises ValueError for anything structurally off."""
    if len(payload) < 13 or payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=n * 3, offset=pos).reshape(n, 3)
        pos += n * 3

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF has no image data")
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        check_dims(w, h)
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(payload, dtype=np.uint8, count=n * 3, offset=pos).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise ValueError("GIF image without any color table")
        mcs = payload[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError(f"bad GIF LZW min code size {mcs}")
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(_lzw_decode(bytes(data), mcs, w * h), dtype=np.uint8)
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF pixel index beyond color table")
        if ipacked & 0x40:  # undo interlace
            order = np.asarray(_interlace_order(h), dtype=np.int64)
            deinter = np.empty((h, w), dtype=np.uint8)
            deinter[order] = idx.reshape(h, w)
            idx = deinter.reshape(-1)
        rgb = table[idx].astype(np.float64)
        means = rgb.mean(axis=0)
        return int(w or sw), int(h or sh), float(means[0]), float(means[1]), float(means[2])
    raise ValueError("truncated GIF")
