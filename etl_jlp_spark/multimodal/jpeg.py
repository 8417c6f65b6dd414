"""Pure-python baseline JPEG codec (encoder + decoder), numpy-vectorized.

Completes the real-codec set next to the BMP and PNG parsers in
``binary.py``: sequential baseline DCT JPEG (SOF0), 8-bit, YCbCr,
4:4:4 or chroma-subsampled (4:2:0/4:2:2 — any 1-4 sampling factors,
interleaved MCU order with box upsampling) — enough to round-trip real
compressed images through the Spark multimodal path with zero external
libraries.

The decoder is fully table-driven (quantization and Huffman tables are
read from the stream's DQT/DHT segments), so it decodes any baseline
JPEG with interleaved scan order, not just this encoder's output.
Restart intervals (DRI + RSTn markers, DC-predictor resets) are
supported on both sides, and progressive (SOF2) streams decode via the
multi-scan path: spectral selection AND successive approximation
(first + refinement passes, T.81 G.1.2), interleaved-DC/non-interleaved
-AC addressing for SUBSAMPLED components (4:2:0 progressive — the
layout most real progressive JPEGs use), with Huffman tables and the
restart interval snapshotted at each scan's SOS so per-scan DHT
redefinition — libjpeg's default arrangement — decodes correctly (a
progressive encoder ships too, with ``per_scan_dht`` / ``successive``
/ ``subsampling`` modes; every arrangement of the same coefficients
decodes bit-identically).
8- and 16-bit quantization tables (DQT Pq=0/1) both parse.
Out-of-scope features fail loudly: mid-stream DQT redefinition and
arithmetic coding raise rather than mis-decode.

The encoder does NOT use the Annex-K example Huffman tables; it emits
its own canonical tables in DHT (12 four-bit DC codes, 162 eight-bit AC
codes) — any table set the stream declares is legal baseline JPEG.
"""

from __future__ import annotations

import struct

import numpy as np

from etl_jlp_spark.multimodal.robust import check_dims, loud_codec

# ---------------------------------------------------------------------------
# shared: DCT basis, zigzag order, quantization
# ---------------------------------------------------------------------------

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# flat fine-grained tables: small quantization error, exercised exactly
# like any other table since both sides read them from DQT
_QT_LUMA = np.full(64, 4, dtype=np.uint8)
_QT_CHROMA = np.full(64, 4, dtype=np.uint8)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255)


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical construction."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# encoder's own tables: all 12 DC size categories at 4 bits; all 162
# legal AC (run,size) symbols at 8 bits (canonical, all-ones unused)
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALUES = list(range(12))
_AC_VALUES = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALUES), 0, 0, 0, 0, 0, 0, 0, 0]
_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALUES)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALUES)


def _quantize_zz(block: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Zigzag-ordered quantized DCT coefficients of one 8×8 block."""
    coef = _C @ (block - 128.0) @ _C.T
    return np.round(coef.reshape(-1)[_ZIGZAG] / qt).astype(np.int64)


def _write_dc(bw: _BitWriter, diff: int) -> None:
    size = _size_cat(diff)
    code, length = _DC_CODES[size]
    bw.write(code, length)
    if size:
        amp = diff if diff > 0 else diff + (1 << size) - 1
        bw.write(amp, size)


def _write_ac_band(
    bw: _BitWriter, q: np.ndarray, ss: int, se: int, codes: dict | None = None
) -> None:
    """Encode AC coefficients q[ss..se] (zigzag order) with ZRL/EOB."""
    codes = _AC_CODES if codes is None else codes
    run = 0
    for v in q[ss : se + 1]:
        v = int(v)
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, ln = codes[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        size = _size_cat(v)
        c, ln = codes[(run << 4) | size]
        bw.write(c, ln)
        amp = v if v > 0 else v + (1 << size) - 1
        bw.write(amp, size)
        run = 0
    if run:
        c, ln = codes[0x00]  # EOB
        bw.write(c, ln)


def _write_ac_refine(bw: _BitWriter, q: np.ndarray, ss: int, se: int, al: int) -> None:
    """AC refinement scan for one block (T.81 G.1.2.3): newly-nonzero
    coefficients (|v|>>Al == 1) emit a (run,1) code + sign bit;
    history-nonzero ones (|v|>>Al > 1) contribute one buffered
    correction bit ((|v|>>Al) & 1), appended after the next emitted
    code in positional order; trailing state flushes as EOB + bits."""
    run = 0
    buffered: list[int] = []
    for v in q[ss : se + 1]:
        v = int(v)
        t = abs(v) >> al
        if t == 0:
            run += 1
        elif t == 1:
            while run > 15:
                c, ln = _AC_CODES[0xF0]  # ZRL
                bw.write(c, ln)
                for b in buffered:
                    bw.write(b, 1)
                buffered = []
                run -= 16
            c, ln = _AC_CODES[(run << 4) | 1]
            bw.write(c, ln)
            bw.write(1 if v > 0 else 0, 1)
            for b in buffered:
                bw.write(b, 1)
            buffered = []
            run = 0
        else:
            buffered.append(t & 1)
    if run or buffered:
        c, ln = _AC_CODES[0x00]  # EOB0
        bw.write(c, ln)
        for b in buffered:
            bw.write(b, 1)


def _encode_block(bw: _BitWriter, block: np.ndarray, qt: np.ndarray, pred: int) -> int:
    q = _quantize_zz(block, qt)
    dc = int(q[0])
    _write_dc(bw, dc - pred)
    _write_ac_band(bw, q, 1, 63)
    return dc


def _dht_segment(table_class: int, table_id: int, bits: list[int], values: list[int]) -> bytes:
    body = bytes([(table_class << 4) | table_id]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    width: int, height: int, pixel_fn, subsampling: str = "444", restart_interval: int = 0
) -> bytes:
    """Baseline JFIF-style JPEG. ``pixel_fn(x, y) -> (r, g, b)``.
    ``subsampling``: '444' (no chroma subsampling) or '420' (2×2 luma
    MCUs with box-downsampled chroma — the common real-world layout).
    ``restart_interval``: MCUs between RSTn markers (0 = none) — DRI
    segment + byte-aligned markers + DC-predictor resets, as cameras
    emit for error resilience."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    rgb = np.zeros((height, width, 3))
    for y in range(height):
        for x in range(width):
            rgb[y, x] = pixel_fn(x, y)
    ycc = _rgb_to_ycbcr(rgb)
    hs, vs = (1, 1) if subsampling == "444" else (2, 2)  # luma sampling factors
    mcu_w, mcu_h = 8 * hs, 8 * vs
    mcux, mcuy = -(-width // mcu_w), -(-height // mcu_h)
    padded = np.pad(
        ycc, ((0, mcuy * mcu_h - height), (0, mcux * mcu_w - width), (0, 0)), mode="edge"
    )
    luma = padded[..., 0]
    if subsampling == "420":  # 2×2 box downsample of the chroma planes
        ph, pw = padded.shape[:2]
        chroma = [
            padded[..., c].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)) for c in (1, 2)
        ]
    else:
        chroma = [padded[..., 1], padded[..., 2]]

    out = bytearray(b"\xff\xd8")  # SOI
    for tid, qt in ((0, _QT_LUMA), (1, _QT_CHROMA)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(qt)
    samp_y = (hs << 4) | vs
    out += (
        b"\xff\xc0"
        + struct.pack(">HBHHB", 17, 8, height, width, 3)
        + bytes([1, samp_y, 0, 2, 0x11, 1, 3, 0x11, 1])
    )  # SOF0
    out += _dht_segment(0, 0, _DC_BITS, _DC_VALUES)
    out += _dht_segment(1, 0, _AC_BITS, _AC_VALUES)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)  # DRI
    out += b"\xff\xda" + struct.pack(">HB", 12, 3) + bytes([1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])

    writer = _BitWriter()
    preds = [0, 0, 0]
    mcu_n = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                writer.flush()  # pad to byte boundary with 1-bits
                writer.out += bytes([0xFF, 0xD0 + rst])  # marker: no stuffing
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            mcu_n += 1
            for by in range(vs):  # luma blocks of this MCU, raster order
                for bx in range(hs):
                    y0, x0 = my * mcu_h + by * 8, mx * mcu_w + bx * 8
                    preds[0] = _encode_block(
                        writer, luma[y0 : y0 + 8, x0 : x0 + 8], _QT_LUMA, preds[0]
                    )
            for ci, plane in enumerate(chroma):  # one chroma block each
                y0, x0 = my * 8, mx * 8
                preds[1 + ci] = _encode_block(
                    writer, plane[y0 : y0 + 8, x0 : x0 + 8], _QT_CHROMA, preds[1 + ci]
                )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(
    width: int,
    height: int,
    pixel_fn,
    per_scan_dht: bool = False,
    successive: bool = False,
    subsampling: str = "444",
) -> bytes:
    """Progressive (SOF2) JPEG via spectral selection: scan 1 is the
    interleaved DC pass for all three components, later scans each
    carry one component's AC band (Ss=1..Se=63). A lossless
    re-arrangement of the same quantized coefficients the baseline
    encoder writes — decoders must produce bit-identical images for
    both.

    ``subsampling='420'`` emits 2×2-subsampled chroma: the DC scan
    interleaves 4 luma + 2 chroma blocks per MCU, and each AC scan
    covers its component's NOMINAL ceil(dim/8) block raster only
    (A.2.2 non-interleaved addressing — MCU padding blocks are never
    coded in AC scans).

    ``per_scan_dht=True`` mirrors libjpeg's default progressive
    arrangement: a fresh DHT precedes each AC scan, REDEFINING AC table
    id 0 (scan 3 switches to a differently-ordered canonical table,
    later AC scans switch back). A decoder that parses all markers
    first and decodes every scan with the final table state mis-decodes
    this — tests use it to pin the per-scan table-snapshot semantics.

    ``successive=True`` adds successive approximation (T.81 G.1.2),
    the arrangement most progressive encoders actually emit: DC and
    each AC band are sent as an Al=1 first pass (high bits) followed
    by an Ah=1/Al=0 refinement pass (low bits) — still a lossless
    re-arrangement of the same quantized coefficients."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    rgb = np.zeros((height, width, 3))
    for y in range(height):
        for x in range(width):
            rgb[y, x] = pixel_fn(x, y)
    ycc = _rgb_to_ycbcr(rgb)
    hs, vs = (1, 1) if subsampling == "444" else (2, 2)  # luma factors
    mcu_w, mcu_h = 8 * hs, 8 * vs
    mcux, mcuy = -(-width // mcu_w), -(-height // mcu_h)
    padded = np.pad(
        ycc, ((0, mcuy * mcu_h - height), (0, mcux * mcu_w - width), (0, 0)), mode="edge"
    )
    if subsampling == "420":
        ph, pw = padded.shape[:2]
        planes = [padded[..., 0]] + [
            padded[..., c].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            for c in (1, 2)
        ]
    else:
        planes = [padded[..., c] for c in range(3)]
    samplings = [(hs, vs), (1, 1), (1, 1)]

    # quantize every MCU-padded block of every component once
    qzz = []
    for ci, (plane, (hi, vi)) in enumerate(zip(planes, samplings)):
        qt = _QT_LUMA if ci == 0 else _QT_CHROMA
        bh, bw_ = mcuy * vi, mcux * hi
        blocks = np.zeros((bh, bw_, 64), dtype=np.int64)
        for yb in range(bh):
            for xb in range(bw_):
                blk = plane[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8]
                blocks[yb, xb] = _quantize_zz(blk, qt)
        qzz.append(blocks)
    # nominal rasters: what non-interleaved AC scans actually cover
    nom = []
    for hi, vi in samplings:
        ch = -(-height * vi // vs)
        cw = -(-width * hi // hs)
        nom.append((-(-ch // 8), -(-cw // 8)))

    out = bytearray(b"\xff\xd8")
    for tid, qt in ((0, _QT_LUMA), (1, _QT_CHROMA)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(qt)
    out += (
        b"\xff\xc2"  # SOF2: progressive
        + struct.pack(">HBHHB", 17, 8, height, width, 3)
        + bytes([1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    out += _dht_segment(0, 0, _DC_BITS, _DC_VALUES)
    if not per_scan_dht:
        out += _dht_segment(1, 0, _AC_BITS, _AC_VALUES)

    al1 = 1 if successive else 0  # first-pass point transform

    def dc_scan(ah: int, al: int) -> bytes:
        seg = b"\xff\xda" + struct.pack(">HB", 12, 3) + bytes(
            [1, 0x00, 2, 0x00, 3, 0x00, 0, 0, (ah << 4) | al]
        )
        bw = _BitWriter()
        preds = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (hi, vi) in enumerate(samplings):
                    for by in range(vi):
                        for bx in range(hi):
                            dc = int(qzz[ci][my * vi + by, mx * hi + bx, 0])
                            if ah == 0:
                                d = dc >> al  # arithmetic shift (A.4)
                                _write_dc(bw, d - preds[ci])
                                preds[ci] = d
                            else:
                                bw.write((dc >> al) & 1, 1)
        bw.flush()
        return seg + bw.out

    out += dc_scan(0, al1)

    # an alternative valid canonical AC table: same code lengths, values
    # in reverse order — every (run,size) symbol gets a DIFFERENT code
    alt_values = list(reversed(_AC_VALUES))
    alt_codes = _canonical_codes(_AC_BITS, alt_values)
    # AC first passes: one component's band each, NOMINAL raster only
    for ci in range(3):
        use_alt = per_scan_dht and ci == 1
        if per_scan_dht:
            out += _dht_segment(1, 0, _AC_BITS, alt_values if use_alt else _AC_VALUES)
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes(
            [ci + 1, 0x00, 1, 63, al1]
        )
        bw = _BitWriter()
        bh, bw_ = nom[ci]
        for yb in range(bh):
            for xb in range(bw_):
                band = qzz[ci][yb, xb]
                if al1:
                    # AC point transform: divide by 2^Al, truncate
                    # toward zero (A.4) — NOT an arithmetic shift
                    band = np.sign(band) * (np.abs(band) >> al1)
                _write_ac_band(bw, band, 1, 63, alt_codes if use_alt else None)
        bw.flush()
        out += bw.out

    if successive:
        out += dc_scan(1, 0)  # DC refinement: one raw LSB per block
        for ci in range(3):  # AC refinement per component (Ah=1, Al=0)
            out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes(
                [ci + 1, 0x00, 1, 63, (1 << 4) | 0]
            )
            bw = _BitWriter()
            bh, bw_ = nom[ci]
            for yb in range(bh):
                for xb in range(bw_):
                    _write_ac_refine(bw, qzz[ci][yb, xb], 1, 63, 0)
            bw.flush()
            out += bw.out

    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy-coded data")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated after 0xFF")
            marker = self.data[self.pos]
            if marker == 0x00:
                self.pos += 1  # stuffed byte
            elif 0xD0 <= marker <= 0xD7:
                raise ValueError("hit restart marker mid-symbol (corrupt stream)")
            else:
                raise ValueError(f"unexpected marker 0xFF{marker:02x} in scan")
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def restart(self) -> None:
        """Consume an expected RSTn marker: discard pad bits to the byte
        boundary, then the two marker bytes (B.2.1.2 restart semantics)."""
        self.acc = 0
        self.nbits = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("truncated at restart marker")
        if self.data[self.pos] != 0xFF or not (0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError(
                f"expected restart marker at {self.pos}, got "
                f"0x{self.data[self.pos]:02x}{self.data[self.pos + 1]:02x}"
            )
        self.pos += 2

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


class _HuffTable:
    def __init__(self, bits: list[int], values: list[int]) -> None:
        # (length, code) -> symbol lookup via the canonical construction
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1



def _entropy_end(data: bytes, start: int) -> int:
    """End of an entropy-coded segment: the first marker that is neither
    a stuffed 0xFF00 nor a restart marker. Both entropy coders here use
    the same 0xFF00 byte-stuffing convention, so one framing rule
    covers Huffman and arithmetic scans."""
    i = start
    n = len(data)
    while i < n - 1:
        if data[i] == 0xFF:
            nxt = data[i + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            return i
        i += 1
    return n


@loud_codec
def decode_jpeg(payload: bytes) -> tuple[int, int, float, float, float]:
    """Decode a baseline (SOF0 — 4:4:4 or chroma-subsampled,
    interleaved scan, optional restart intervals), progressive (SOF2 —
    spectral selection + successive approximation, incl. subsampled),
    arithmetic sequential (SOF9 — T.81 Annex D QM-coder + Annex F
    conditioning) or arithmetic progressive (SOF10 — the Annex G.2
    per-scan-kind models; both decoded in jpeg_arith.py) JPEG:
    (width, height, mean_r, mean_g, mean_b). Table-driven with per-scan
    SOS-time table/conditioning snapshots; the remaining SOF modes
    (extended-sequential, lossless, hierarchical) raise instead of
    mis-decoding."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _HuffTable] = {}
    ac_tables: dict[int, _HuffTable] = {}
    dc_cond: dict[int, tuple[int, int]] = {}  # DAC: DC table id -> (L, U)
    ac_cond: dict[int, int] = {}  # DAC: AC table id -> Kx
    frame = None  # (h, w, [(comp_id, hi, vi, qt_id)])
    progressive = False
    arithmetic = False
    restart_interval = 0
    # (scan comps, Ss, Se, Ah, Al, data, dc snapshot, ac snapshot, DRI snapshot)
    scans: list[tuple] = []

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec not in (0, 1):
                    raise ValueError(f"bad DQT precision {prec}")
                if prec:  # 16-bit entries (Pq=1): big-endian uint16
                    qt = np.frombuffer(
                        body[i + 1 : i + 129], dtype=">u2"
                    ).astype(np.float64)
                else:
                    qt = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8).astype(
                        np.float64
                    )
                # quant tables are applied at dequant time, AFTER all
                # scans — a mid-stream redefinition would silently apply
                # the wrong table to earlier scans' coefficients, so
                # fail loudly instead (Huffman tables, which ARE legal
                # to redefine per scan, are snapshotted at SOS below)
                if scans and tid in qtables and not np.array_equal(qtables[tid], qt):
                    raise NotImplementedError(
                        f"quant table {tid} redefined between scans"
                    )
                qtables[tid] = qt
                i += 129 if prec else 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                values = list(body[i + 17 : i + 17 + n])
                (dc_tables if cls == 0 else ac_tables)[tid] = _HuffTable(bits, values)
                i += 17 + n
        elif marker in (0xC0, 0xC2, 0xC9, 0xCA):  # SOF0/SOF2/SOF9/SOF10
            progressive = marker in (0xC2, 0xCA)
            arithmetic = marker in (0xC9, 0xCA)
            _prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            check_dims(w, h)
            comps = []
            for c in range(ncomp):
                cid, sampling, qid = body[6 + c * 3 : 9 + c * 3]
                hi, vi = sampling >> 4, sampling & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"invalid sampling factors {hi}x{vi}")
                comps.append((cid, hi, vi, qid))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xCB):
            raise NotImplementedError(
                f"only SOF0/SOF2/SOF9/SOF10 supported (got SOF 0x{marker:02x}; "
                "extended-sequential, lossless and hierarchical modes are out of scope)"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning (T.81 B.2.4.3)
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                cs = body[i + 1]
                if cls == 0:
                    dc_cond[tid] = (cs & 0xF, cs >> 4)  # (L, U)
                else:
                    ac_cond[tid] = cs  # Kx
                i += 2
        elif marker == 0xDD:  # DRI: MCUs between restart markers
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS: scan header + entropy-coded data
            ns = body[0]
            sc = [
                (body[1 + c * 2], body[2 + c * 2] >> 4, body[2 + c * 2] & 0xF)
                for c in range(ns)
            ]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0xF
            end = _entropy_end(payload, pos)
            # SNAPSHOT the Huffman tables + restart interval as of THIS
            # scan's SOS: real progressive encoders (libjpeg default)
            # emit a fresh DHT — often redefining table ids — before
            # each scan, so decoding every scan with the final marker
            # state would use later scans' tables on earlier scans
            scans.append(
                (
                    sc, ss, se, ah, al, payload[pos:end],
                    dict(dc_cond) if arithmetic else dict(dc_tables),
                    dict(ac_cond) if arithmetic else dict(ac_tables),
                    restart_interval,
                )
            )
            pos = end
        # APPn/COM/etc: skipped

    if frame is None or not scans:
        raise ValueError("missing SOF/SOS")
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    inv_zz = np.empty(64, dtype=np.int64)
    inv_zz[_ZIGZAG] = np.arange(64)

    if arithmetic and progressive:
        from etl_jlp_spark.multimodal.jpeg_arith import decode_arith_progressive

        planes = decode_arith_progressive(scans, comps, mcux, mcuy, qtables, inv_zz, w, h)
    elif arithmetic:
        from etl_jlp_spark.multimodal.jpeg_arith import decode_arith_sequential

        planes = decode_arith_sequential(scans[0], comps, mcux, mcuy, qtables, inv_zz)
    elif progressive:
        planes = _decode_progressive(scans, comps, mcux, mcuy, qtables, inv_zz, w, h)
    else:
        planes = _decode_sequential(scans[0], comps, mcux, mcuy, qtables, inv_zz)

    # upsample subsampled planes to full resolution, then crop
    full = []
    for (_cid, hi, vi, _q), plane in zip(comps, planes):
        if hi != hmax or vi != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(plane[:h, :w])
    if len(comps) == 1:
        m = float(np.clip(full[0], 0, 255).mean())
        return w, h, m, m, m
    rgb = _ycbcr_to_rgb(np.stack([full[0], full[1], full[2]], axis=-1))
    means = rgb.reshape(-1, 3).mean(axis=0)
    return w, h, float(means[0]), float(means[1]), float(means[2])


def _decode_sequential(scan0, comps, mcux, mcuy, qtables, inv_zz):
    """Baseline interleaved-MCU entropy decode (one scan, all comps).
    Huffman tables and the restart interval come from the scan's own
    SOS-time snapshot."""
    scan, _ss, _se, _ah, _al, data, dc_tables, ac_tables, restart_interval = scan0
    if len(comps) != len(scan):
        raise ValueError("scan/frame component mismatch")
    br = _BitReader(data)
    planes = [np.zeros((mcuy * 8 * vi, mcux * 8 * hi)) for (_cid, hi, vi, _q) in comps]
    preds = [0] * len(comps)

    def read_block(qt: np.ndarray, dct: int, act: int, ci: int) -> np.ndarray:
        size = dc_tables[dct].decode(br)
        diff = _extend(br.bits(size), size) if size else 0
        preds[ci] += diff
        zz = np.zeros(64)
        zz[0] = preds[ci]
        k = 1
        while k < 64:
            sym = ac_tables[act].decode(br)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            run, sz = sym >> 4, sym & 0xF
            k += run
            if k > 63:
                raise ValueError("AC run past end of block")
            zz[k] = _extend(br.bits(sz), sz)
            k += 1
        coef = (zz * qt)[inv_zz].reshape(8, 8)
        return (_C.T @ coef @ _C) + 128.0

    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                br.restart()  # byte-align + consume RSTn
                preds[:] = [0] * len(comps)  # DC predictors reset per B.2.1.2
            mcu_n += 1
            for ci, ((_cid, hi, vi, qid), (_sid, dct, act)) in enumerate(zip(comps, scan)):
                qt = qtables[qid]
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = read_block(qt, dct, act, ci)
    return planes


def _refine_nonzero(br: _BitReader, coef: np.ndarray, k: int, p1: int) -> None:
    """One AC correction bit (T.81 G.1.2.3): if set and bit Al of the
    magnitude is still clear, move the magnitude up by 1<<Al (toward
    the true value, away from zero)."""
    if br.bit() and not (int(coef[k]) & p1):
        coef[k] += p1 if coef[k] > 0 else -p1


def _decode_progressive(scans, comps, mcux, mcuy, qtables, inv_zz, w, h):
    """Progressive entropy decode: spectral selection AND successive
    approximation (first + refinement passes for both DC and AC bands,
    T.81 G.1.2), with subsampled components (e.g. 4:2:0 progressive —
    the layout most real progressive JPEGs use).
    Coefficients accumulate across scans at growing bit precision;
    IDCT runs once at the end. Each scan decodes with ITS OWN SOS-time
    Huffman-table / restart-interval snapshot — real progressive
    encoders (libjpeg default) redefine DHT ids between scans, so the
    final marker state is wrong for all but the last scan.
    Addressing (A.2): interleaved (multi-component DC) scans walk the
    MCU grid with hi×vi blocks per component per MCU — the MCU-PADDED
    raster; non-interleaved scans cover ONLY the component\'s nominal
    ceil(dim/8) block raster in row-major order, skipping MCU padding
    blocks entirely."""
    cid_to_ci = {c[0]: i for i, c in enumerate(comps)}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    # per-component rasters: MCU-padded (interleaved addressing) vs
    # nominal (non-interleaved scan coverage)
    pad_shape = [(mcuy * vi, mcux * hi) for (_c, hi, vi, _q) in comps]
    nom_shape = []
    for _cid, hi, vi, _q in comps:
        ch = -(-h * vi // vmax)  # component sample dims (A.1.1)
        cw = -(-w * hi // hmax)
        nom_shape.append((-(-ch // 8), -(-cw // 8)))
    # int64: successive approximation builds values bitwise (shifts /
    # ORs on two\'s-complement), which float buffers cannot express
    coefs = [np.zeros((bh, bw, 64), dtype=np.int64) for (bh, bw) in pad_shape]

    for scan, ss, se, ah, al, data, dc_tables, ac_tables, restart_interval in scans:
        br = _BitReader(data)
        if ss == 0:  # DC scan
            if se != 0:
                raise ValueError("DC scan must have Se=0")
            idxs = [cid_to_ci[sid] for (sid, _dct, _act) in scan]
            preds = {ci: 0 for ci in idxs}

            def dc_one(blk, dct, ci):
                if ah == 0:
                    # first DC pass: diffs of (DC >> Al), the point
                    # transform (arithmetic shift, A.4)
                    size = dc_tables[dct].decode(br)
                    diff = _extend(br.bits(size), size) if size else 0
                    preds[ci] += diff
                    blk[0] = preds[ci] << al
                elif br.bit():
                    # refinement: one raw bit per block sets bit Al of
                    # the two\'s-complement value (G.1.2.1)
                    blk[0] |= 1 << al

            if len(scan) > 1:  # interleaved: MCU grid, hi×vi blocks each
                mcu_n = 0
                for my in range(mcuy):
                    for mx in range(mcux):
                        if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                            br.restart()
                            preds = {ci: 0 for ci in idxs}
                        mcu_n += 1
                        for (sid, dct, _act), ci in zip(scan, idxs):
                            _cid, hi, vi, _q = comps[ci]
                            for by in range(vi):
                                for bx in range(hi):
                                    dc_one(coefs[ci][my * vi + by, mx * hi + bx], dct, ci)
            else:  # non-interleaved DC: the component\'s nominal raster
                (sid, dct, _act) = scan[0]
                ci = cid_to_ci[sid]
                bh, bw = nom_shape[ci]
                blk_n = 0
                for byy in range(bh):
                    for bxx in range(bw):
                        if restart_interval and blk_n and blk_n % restart_interval == 0:
                            br.restart()
                            preds = {ci: 0 for ci in idxs}
                        blk_n += 1
                        dc_one(coefs[ci][byy, bxx], dct, ci)
        else:  # AC scan: exactly one component, band ss..se
            if len(scan) != 1:
                raise ValueError("progressive AC scan must be non-interleaved")
            sid, _dct, act = scan[0]
            ci = cid_to_ci[sid]
            bh, bw = nom_shape[ci]
            p1 = 1 << al
            eobrun = 0
            blk_n = 0
            for byy in range(bh):
                for bxx in range(bw):
                    if restart_interval and blk_n and blk_n % restart_interval == 0:
                        br.restart()
                        eobrun = 0
                    blk_n += 1
                    coef = coefs[ci][byy, bxx]
                    if ah == 0:  # first pass for this band
                        if eobrun:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            sym = ac_tables[act].decode(br)
                            run, sz = sym >> 4, sym & 0xF
                            if sz == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                # EOBn: (1<<run)-1 + bits more blocks end
                                eobrun = (1 << run) - 1 + (br.bits(run) if run else 0)
                                break
                            k += run
                            if k > se:
                                raise ValueError("AC run past end of band")
                            coef[k] = _extend(br.bits(sz), sz) << al
                            k += 1
                    else:  # refinement pass (G.1.2.3)
                        k = ss
                        if not eobrun:
                            while k <= se:
                                sym = ac_tables[act].decode(br)
                                run, sz = sym >> 4, sym & 0xF
                                newval = 0
                                if sz == 0:
                                    if run != 15:  # EOBn
                                        eobrun = (1 << run) - 1 + (
                                            br.bits(run) if run else 0
                                        ) + 1  # +1: this block\'s remainder too
                                        break
                                    # ZRL: skip 16 zero-history coeffs
                                else:
                                    if sz != 1:
                                        raise ValueError(
                                            "refinement scan symbol must have size 1"
                                        )
                                    newval = p1 if br.bit() else -p1
                                # advance over `run` zero-history coeffs,
                                # reading correction bits for nonzero ones
                                while k <= se:
                                    if coef[k] != 0:
                                        _refine_nonzero(br, coef, k, p1)
                                    else:
                                        if run == 0:
                                            break
                                        run -= 1
                                    k += 1
                                if newval:
                                    if k > se:
                                        raise ValueError("AC run past end of band")
                                    coef[k] = newval
                                k += 1
                        if eobrun:
                            # rest of the block: correction bits only
                            while k <= se:
                                if coef[k] != 0:
                                    _refine_nonzero(br, coef, k, p1)
                                k += 1
                            eobrun -= 1

    planes = []
    for ci, (_cid, _hi, _vi, qid) in enumerate(comps):
        qt = qtables[qid]
        bh, bw = pad_shape[ci]
        plane = np.zeros((bh * 8, bw * 8))
        for byy in range(bh):
            for bxx in range(bw):
                coef = (coefs[ci][byy, bxx] * qt)[inv_zz].reshape(8, 8)
                plane[byy * 8 : byy * 8 + 8, bxx * 8 : bxx * 8 + 8] = (
                    _C.T @ coef @ _C
                ) + 128.0
        planes.append(plane)
    return planes
