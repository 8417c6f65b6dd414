"""Pure-python baseline TIFF codec: both byte orders, strips, LZW.

Fifth real image codec behind ``decode_image`` (registry at
binary.py:220). Scope — the interchange core of TIFF 6.0 for 8-bit RGB:

- II (little-endian) and MM (big-endian) headers, IFD walking;
- chunky (PlanarConfiguration=1) RGB, 8 bits per sample;
- multiple strips (RowsPerStrip < height);
- Compression 1 (none) and 5 (LZW — TIFF's variant: MSB-first bit
  packing, 256=Clear / 257=EOI, EARLY code-width change at 2^w − 1,
  dictionary reset at 4094; distinct from GIF's LSB-first late-change
  LZW in gif.py);
- Predictor 2 (horizontal differencing) under LZW.

Anything else (palette/gray/planar/tiled/JPEG-in-TIFF/16-bit) raises
ValueError — loud boundary, never a mis-decode.
"""

from __future__ import annotations

import struct

import numpy as np

from etl_jlp_spark.multimodal.robust import check_dims, loud_codec

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


class _MSBWriter:
    """MSB-first bit packer (TIFF LZW's sub-byte ordering)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.out)


_CLEAR, _EOI = 256, 257


def _tiff_lzw_encode(data: bytes) -> bytes:
    bw = _MSBWriter()
    bw.write(_CLEAR, 9)
    table: dict[bytes, int] = {bytes((i,)): i for i in range(256)}
    next_code, width = _EOI + 1, 9
    w = b""
    for byte in data:
        wk = w + bytes((byte,))
        if wk in table:
            w = wk
            continue
        bw.write(table[w], width)
        table[wk] = next_code
        next_code += 1
        # EARLY change: the writer bumps width one code sooner than GIF
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:  # spec-mandated reset headroom
            bw.write(_CLEAR, width)
            table = {bytes((i,)): i for i in range(256)}
            next_code, width = _EOI + 1, 9
        w = bytes((byte,))
    if w:
        bw.write(table[w], width)
    bw.write(_EOI, width)
    return bw.flush()


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    acc = nbits = pos = 0

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes((i,)) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("TIFF LZW stream ended without EOI")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _CLEAR:
            reset()
            continue
        if code == _EOI:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt TIFF LZW code {code}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        # early change, shifted one entry vs the writer: the reader's
        # table lags the writer's by exactly one code, so it must grow
        # the width when its NEXT free slot hits 2^w - 2 (libtiff's
        # maxcode-1 check), not 2^w - 1
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        prev = entry
        if len(out) > expected:
            raise ValueError("TIFF LZW produced more bytes than the strip holds")
    return bytes(out)


def encode_tiff(
    width: int,
    height: int,
    pixel_fn,
    big_endian: bool = False,
    compression: int = 1,
    rows_per_strip: int | None = None,
    predictor: int = 1,
) -> bytes:
    """8-bit chunky RGB TIFF writer; LZW (compression=5) with optional
    horizontal-differencing predictor=2 for fixture realism."""
    if compression not in (1, 5):
        raise ValueError("encode_tiff supports compression 1 (none) and 5 (LZW)")
    if predictor == 2 and compression != 5:
        raise ValueError("predictor=2 only applies to LZW")
    bo = ">" if big_endian else "<"
    rps = rows_per_strip or height
    px = np.array(
        [[pixel_fn(x, y) for x in range(width)] for y in range(height)], dtype=np.uint8
    ).reshape(height, width * 3)

    strips = []
    for y0 in range(0, height, rps):
        block = px[y0 : y0 + rps]
        if predictor == 2:
            b3 = block.reshape(block.shape[0], -1, 3).astype(np.int16)
            b3[:, 1:, :] -= b3[:, :-1, :].copy()
            block = (b3 & 0xFF).astype(np.uint8).reshape(block.shape[0], -1)
        raw = block.tobytes()
        strips.append(_tiff_lzw_encode(raw) if compression == 5 else raw)

    n_tags = 11 if predictor == 2 else 10
    header = struct.pack(f"{bo}2sHI", b"MM" if big_endian else b"II", 42, 8)
    ifd_size = 2 + n_tags * 12 + 4
    bits_off = 8 + ifd_size
    n_strips = len(strips)
    arrays_off = bits_off + 6  # BitsPerSample [8,8,8]
    offsets_off = arrays_off
    counts_off = offsets_off + (4 * n_strips if n_strips > 1 else 0)
    data_off = counts_off + (4 * n_strips if n_strips > 1 else 0)

    strip_offsets, pos = [], data_off
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)

    def tag(tid: int, ttype: int, count: int, value: int) -> bytes:
        if ttype == 3 and count == 1:
            # SHORT values sit left-justified in the 4-byte field
            return struct.pack(f"{bo}HHIHH", tid, ttype, count, value, 0)
        return struct.pack(f"{bo}HHII", tid, ttype, count, value)

    tags = [
        tag(_TAG_WIDTH, 4, 1, width),
        tag(_TAG_HEIGHT, 4, 1, height),
        tag(_TAG_BITS, 3, 3, bits_off),
        tag(_TAG_COMPRESSION, 3, 1, compression),
        tag(_TAG_PHOTOMETRIC, 3, 1, 2),
        tag(
            _TAG_STRIP_OFFSETS,
            4,
            n_strips,
            strip_offsets[0] if n_strips == 1 else offsets_off,
        ),
        tag(_TAG_SPP, 3, 1, 3),
        tag(_TAG_ROWS_PER_STRIP, 4, 1, rps),
        tag(
            _TAG_STRIP_COUNTS,
            4,
            n_strips,
            len(strips[0]) if n_strips == 1 else counts_off,
        ),
        tag(_TAG_PLANAR, 3, 1, 1),
    ]
    if predictor == 2:
        tags.append(tag(_TAG_PREDICTOR, 3, 1, 2))
    tags.sort(key=lambda t: struct.unpack(f"{bo}H", t[:2])[0])

    out = bytearray(header)
    out += struct.pack(f"{bo}H", n_tags)
    out += b"".join(tags)
    out += struct.pack(f"{bo}I", 0)  # next IFD
    out += struct.pack(f"{bo}HHH", 8, 8, 8)
    if n_strips > 1:
        out += struct.pack(f"{bo}{n_strips}I", *strip_offsets)
        out += struct.pack(f"{bo}{n_strips}I", *[len(s) for s in strips])
    for s in strips:
        out += s
    return bytes(out)


def _read_values(payload: bytes, bo: str, ttype: int, count: int, raw: bytes) -> list[int]:
    size = _TYPE_SIZES.get(ttype)
    if size is None:
        raise ValueError(f"unsupported TIFF field type {ttype}")
    total = size * count
    if total <= 4:
        data = raw[:total]
    else:
        (off,) = struct.unpack(f"{bo}I", raw)
        data = payload[off : off + total]
    fmt = {1: "B", 3: "H", 4: "I"}.get(ttype)
    if fmt is None:
        raise ValueError(f"unsupported TIFF field type {ttype}")
    if len(data) != total:
        raise ValueError("truncated TIFF value array")
    return list(struct.unpack(f"{bo}{count}{fmt}", data))


@loud_codec
def decode_tiff(payload: bytes) -> tuple[int, int, float, float, float]:
    """(width, height, mean_r, mean_g, mean_b) of the first IFD.
    Raises ValueError on anything outside the supported core."""
    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF payload")
    bo = "<" if payload[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(f"{bo}HI", payload, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF IFD")
    (n_tags,) = struct.unpack_from(f"{bo}H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_tags):
        base = ifd_off + 2 + i * 12
        tid, ttype, count = struct.unpack_from(f"{bo}HHI", payload, base)
        tags[tid] = _read_values(payload, bo, ttype, count, payload[base + 8 : base + 12])

    def one(tid: int, default: int | None = None) -> int:
        if tid not in tags:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tid}")
            return default
        return tags[tid][0]

    w, h = one(_TAG_WIDTH), one(_TAG_HEIGHT)
    check_dims(w, h)
    comp = one(_TAG_COMPRESSION, 1)
    photo = one(_TAG_PHOTOMETRIC)
    spp = one(_TAG_SPP, 1)
    bits = tags.get(_TAG_BITS, [8])
    planar = one(_TAG_PLANAR, 1)
    predictor = one(_TAG_PREDICTOR, 1)
    if photo != 2 or spp != 3 or set(bits) != {8} or planar != 1:
        raise ValueError(
            f"unsupported TIFF (photometric={photo}, spp={spp}, bits={bits}, planar={planar})"
        )
    if comp not in (1, 5):
        raise ValueError(f"unsupported TIFF compression {comp}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    rps = one(_TAG_ROWS_PER_STRIP, h)
    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags[_TAG_STRIP_COUNTS]
    if len(offsets) != len(counts):
        raise ValueError("strip offset/count mismatch")

    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        n_rows = min(rps, h - si * rps)
        expected = n_rows * w * 3
        raw = payload[off : off + cnt]
        if comp == 5:
            raw = _tiff_lzw_decode(raw, expected)
        if len(raw) != expected:
            raise ValueError(f"strip {si}: got {len(raw)} bytes, want {expected}")
        block = np.frombuffer(raw, dtype=np.uint8).reshape(n_rows, w, 3)
        if predictor == 2:
            block = np.cumsum(block.astype(np.int64), axis=1).astype(np.uint8)
        rows.append(block)
    px = np.concatenate(rows, axis=0)
    if px.shape[0] != h:
        raise ValueError("TIFF strips do not cover the image height")
    means = px.reshape(-1, 3).mean(axis=0, dtype=np.float64)
    return int(w), int(h), float(means[0]), float(means[1]), float(means[2])
