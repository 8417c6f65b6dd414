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
supported on both sides. Out-of-scope features fail loudly:
progressive (SOF2) and arithmetic coding raise
ValueError/NotImplementedError rather than mis-decode.

The encoder does NOT use the Annex-K example Huffman tables; it emits
its own canonical tables in DHT (12 four-bit DC codes, 162 eight-bit AC
codes) — any table set the stream declares is legal baseline JPEG.
"""

from __future__ import annotations

import struct

import numpy as np

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


def _encode_block(bw: _BitWriter, block: np.ndarray, qt: np.ndarray, pred: int) -> int:
    coef = _C @ (block - 128.0) @ _C.T
    q = np.round(coef.reshape(-1)[_ZIGZAG] / qt).astype(np.int64)
    dc = int(q[0])
    diff = dc - pred
    size = _size_cat(diff)
    code, length = _DC_CODES[size]
    bw.write(code, length)
    if size:
        amp = diff if diff > 0 else diff + (1 << size) - 1
        bw.write(amp, size)
    run = 0
    for v in q[1:]:
        v = int(v)
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, ln = _AC_CODES[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        size = _size_cat(v)
        c, ln = _AC_CODES[(run << 4) | size]
        bw.write(c, ln)
        amp = v if v > 0 else v + (1 << size) - 1
        bw.write(amp, size)
        run = 0
    if run:
        c, ln = _AC_CODES[0x00]  # EOB
        bw.write(c, ln)
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


def decode_jpeg(payload: bytes) -> tuple[int, int, float, float, float]:
    """Decode a baseline JPEG (4:4:4 or chroma-subsampled, interleaved
    scan, optional restart intervals): (width, height, mean_r, mean_g,
    mean_b). Table-driven; raises on progressive streams instead of
    mis-decoding them."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _HuffTable] = {}
    ac_tables: dict[int, _HuffTable] = {}
    frame = None  # (h, w, [(comp_id, qt_id)])
    scan = None
    restart_interval = 0

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
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables not supported")
                qtables[tid] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8).astype(
                    np.float64
                )
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                values = list(body[i + 17 : i + 17 + n])
                (dc_tables if cls == 0 else ac_tables)[tid] = _HuffTable(bits, values)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for c in range(ncomp):
                cid, sampling, qid = body[6 + c * 3 : 9 + c * 3]
                hi, vi = sampling >> 4, sampling & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"invalid sampling factors {hi}x{vi}")
                comps.append((cid, hi, vi, qid))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(f"only baseline SOF0 supported (got SOF 0x{marker:02x})")
        elif marker == 0xDD:  # DRI: MCUs between restart markers
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = [(body[1 + c * 2], body[2 + c * 2] >> 4, body[2 + c * 2] & 0xF) for c in range(ns)]
            break
        # APPn/COM/etc: skipped

    if frame is None or scan is None:
        raise ValueError("missing SOF0/SOS")
    h, w, comps = frame
    if len(comps) != len(scan):
        raise ValueError("scan/frame component mismatch")

    br = _BitReader(payload[pos:])
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    planes = [np.zeros((mcuy * 8 * vi, mcux * 8 * hi)) for (_cid, hi, vi, _q) in comps]
    preds = [0] * len(comps)
    inv_zz = np.empty(64, dtype=np.int64)
    inv_zz[_ZIGZAG] = np.arange(64)

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

    # interleaved MCU order: each component contributes hi×vi blocks per MCU
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
