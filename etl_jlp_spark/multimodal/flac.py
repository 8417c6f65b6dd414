"""FLAC frame codec — real lossless audio decode, pure Python.

Scope (the whole losslessly-coded layer of the format, RFC 9639 /
xiph.org spec): frame headers (sync, UTF-8-style coded frame numbers,
all block-size encodings, CRC-8), subframes CONSTANT / VERBATIM /
FIXED(0-4) / LPC(any order), wasted-bits shifts, Rice residual
partitions (both 4- and 5-bit parameter widths, escape-to-raw
partitions, any partition order), stereo decorrelation (independent,
left-side, right-side, mid-side), frame CRC-16, and the STREAMINFO
MD5 check over the decoded PCM. The encoder emits fixed OR
Levinson-Durbin LPC predictors with quantized coefficients, chooses
per-subframe between constant/fixed/LPC, and supports mid-side — so
every decoder path round-trips against in-repo bytes, fixture-free
(the repo-wide codec pairing rule).

With this, the audio stub boundary is exactly the PERCEPTUAL codecs
(mp3/ogg frames — licensed DSP territory): PCM, ADPCM, G.711 and FLAC
all decode natively (multimodal/binary.py dispatch).

Reference tie-in: the reference has no media layer at all; this
extends the engine's opaque-binary-column story (SURVEY §2.C
multimodal) the same way jpeg.py/gif.py/tiff.py do for images.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from etl_jlp_spark.multimodal.containers import encode_flac_streaminfo
from etl_jlp_spark.multimodal.robust import loud_codec

FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

_SAMPLE_SIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _make_crc_table(poly: int, width: int) -> list[int]:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


# table-driven CRCs (one lookup per byte instead of 8 shift/xor python
# ops): the CRCs run over EVERY frame's bytes on both the encode and
# decode paths, and the per-bit loop was a top-3 profile entry of the
# audio corpus synthesis (driver-side, serialized — §4 per-task work)
_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    """CRC-8, poly 0x07, init 0 (FLAC frame-header CRC)."""
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 (FLAC frame CRC)."""
    crc = 0
    table = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ table[(crc >> 8) ^ b]
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        value &= (1 << bits) - 1
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def write_bits(self, bits: np.ndarray) -> None:
        """Bulk-append a 0/1 uint8 bit array (the vectorized Rice path):
        one np.packbits instead of a python write per bit."""
        nb = self.nbits
        if nb:
            head = np.empty(nb, dtype=np.uint8)
            for i in range(nb):  # ≤ 7 carried bits
                head[i] = (self.acc >> (nb - 1 - i)) & 1
            allb = np.concatenate([head, bits])
        else:
            allb = bits
        total = len(allb)
        keep = total % 8
        nbytes = total - keep
        if nbytes:
            self.buf += np.packbits(allb[:nbytes]).tobytes()
        acc = 0
        for b in allb[nbytes:]:  # ≤ 7 trailing bits back into the accumulator
            acc = (acc << 1) | int(b)
        self.acc = acc
        self.nbits = keep

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bytepos = pos
        self.bitpos = 0

    def read(self, bits: int) -> int:
        out = 0
        while bits:
            if self.bytepos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bitpos
            take = min(bits, avail)
            cur = self.data[self.bytepos]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bitpos += take
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
            bits -= take
        return out

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v & (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


def _utf8_coded_number(n: int) -> bytes:
    """FLAC's UTF-8-style frame/sample number coding (no 0x10FFFF cap)."""
    if n < 0x80:
        return bytes([n])
    for nbytes, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8), (6, 0xFC), (7, 0xFE)):
        if n < (1 << (nbytes * 5 + 1)) or nbytes == 7:
            out = bytearray(nbytes)
            for i in range(nbytes - 1, 0, -1):
                out[i] = 0x80 | (n & 0x3F)
                n >>= 6
            out[0] = lead | n
            return bytes(out)
    raise ValueError("frame number too large")


def _read_utf8_coded(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad coded number lead byte")
    val = first & (mask - 1)
    for _ in range(nbytes - 1):
        cont = br.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("bad coded number continuation")
        val = (val << 6) | (cont & 0x3F)
    return val


# ---------------------------------------------------------------------------
# Rice residual coding
# ---------------------------------------------------------------------------


def _rice_write(bw: _BitWriter, residual: np.ndarray, order: int, blocksize: int,
                partition_order: int = 0) -> None:
    bw.write(0, 2)  # coding method 0: 4-bit rice params
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    part_len = blocksize >> partition_order
    idx = 0
    for p in range(nparts):
        n = part_len - (order if p == 0 else 0)
        chunk = residual[idx : idx + n]
        idx += n
        u = np.where(chunk >= 0, chunk.astype(np.int64) << 1, ((-chunk.astype(np.int64)) << 1) - 1)
        # pick the cheapest k (0..14; 15 is the escape code)
        best_k, best_cost = 0, None
        for k in range(15):
            cost = int(np.sum(u >> k)) + n * (k + 1)
            if best_cost is None or cost < best_cost:
                best_k, best_cost = k, cost
        bw.write(best_k, 4)
        # vectorized code emission (was a python write per value per
        # bit): lay every code's bits into one array — q zeros, a one,
        # then the k low bits — and bulk-append it. Layout identical to
        # the per-value writer, so streams are byte-for-byte unchanged.
        k = best_k
        q = (u >> k).astype(np.int64)
        lens = q + 1 + k
        ends = np.cumsum(lens)
        offs = ends - lens
        bits = np.zeros(int(ends[-1]) if n else 0, dtype=np.uint8)
        bits[offs + q] = 1
        if k:
            pos = (offs + q + 1)[:, None] + np.arange(k)[None, :]
            vals = ((u[:, None] >> np.arange(k - 1, -1, -1)[None, :]) & 1).astype(
                np.uint8
            )
            bits[pos.ravel()] = vals.ravel()
        bw.write_bits(bits)


def _take_bits(bits: np.ndarray, pos: int, n: int) -> int:
    """Read an n-bit big-endian unsigned int from a 0/1 bit array."""
    if pos + n > len(bits):
        raise ValueError("FLAC bitstream truncated")
    v = 0
    for b in bits[pos : pos + n]:  # n ≤ 5 here (rice parameter widths)
        v = (v << 1) | int(b)
    return v


def _read_fixed_width(bits: np.ndarray, pos: int, n: int, width: int) -> np.ndarray:
    """n signed ``width``-bit big-endian ints from a bit array — the
    vectorized escape-partition / VERBATIM read (one reshape + matmul
    instead of a python read per value)."""
    if width == 0:
        return np.zeros(n, dtype=np.int64)
    end = pos + n * width
    if end > len(bits):
        raise ValueError("FLAC bitstream truncated")
    seg = bits[pos:end].reshape(n, width).astype(np.int64)
    v = seg @ (np.int64(1) << np.arange(width - 1, -1, -1, dtype=np.int64))
    return v - ((v >> (width - 1)) << width)  # sign-extend


def _rice_decode_block(
    bits: np.ndarray, nxt: np.ndarray, pos: int, n: int, k: int
) -> tuple[np.ndarray, int]:
    """Decode ``n`` Rice(k) codes from ``bits`` starting at ``pos``.

    Fully vectorized (§4: no per-sample python loop): ``nxt[j]`` is the
    position of the first set bit at/after j (the unary terminator), so
    "decode one code starting at j" is the jump j → nxt[j]+1+k. All n
    start positions come from pointer-doubling over that jump table
    (log2(n) vectorized gathers), then quotients and the k-bit suffixes
    are plain gathers. Layout identical to the per-value reader."""
    L = len(bits)
    f = np.minimum(nxt + 1 + k, L)  # one-code jump; L = truncation sentinel
    starts = np.empty(n, dtype=np.int64)
    starts[0] = pos
    have = 1
    tab = f
    while have < n:
        c = min(have, n - have)
        starts[have : have + c] = tab[starts[:c]]
        have += c
        if have < n:
            tab = tab[tab]  # double the jump length
    t = nxt[starts]  # terminator (set-bit) position of each code
    if int(t[-1]) + 1 + k > L:
        raise ValueError("FLAC bitstream truncated")
    u = (t - starts).astype(np.int64) << k
    if k:
        idx = (t + 1)[:, None] + np.arange(k)[None, :]
        lows = bits[idx].astype(np.int64)
        u |= lows @ (np.int64(1) << np.arange(k - 1, -1, -1, dtype=np.int64))
    vals = (u >> 1) ^ -(u & 1)
    return vals, int(t[-1]) + 1 + k


def _rice_read(br: _BitReader, order: int, blocksize: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    partition_order = br.read(4)
    nparts = 1 << partition_order
    if blocksize % nparts:
        raise ValueError("block size not divisible by partition count")
    part_len = blocksize >> partition_order
    if part_len <= order and nparts == 1:
        raise ValueError("first partition has no samples")
    out = np.empty(blocksize - order, dtype=np.int64)
    # unpack the remaining payload bits ONCE; every partition decodes
    # with vectorized gathers against this array (and the shared
    # next-set-bit table), then the reader position is written back
    byte0 = br.bytepos
    bits = np.unpackbits(np.frombuffer(br.data, dtype=np.uint8, offset=byte0))
    L = len(bits)
    # nxt[j] = first set bit at/after j (L when none — truncated stream)
    tmp = np.full(L + 1, L, dtype=np.int64)
    ones = np.flatnonzero(bits)
    tmp[ones] = ones
    nxt = np.minimum.accumulate(tmp[::-1])[::-1]
    pos = br.bitpos
    idx = 0
    for p in range(nparts):
        n = part_len - (order if p == 0 else 0)
        k = _take_bits(bits, pos, pbits)
        pos += pbits
        if k == escape:
            raw = _take_bits(bits, pos, 5)
            pos += 5
            out[idx : idx + n] = _read_fixed_width(bits, pos, n, raw)
            pos += n * raw
        else:
            out[idx : idx + n], pos = _rice_decode_block(bits, nxt, pos, n, k)
        idx += n
    br.bytepos = byte0 + (pos >> 3)
    br.bitpos = pos & 7
    return out


# ---------------------------------------------------------------------------
# Subframe encode/decode
# ---------------------------------------------------------------------------


def _levinson_lpc(x: np.ndarray, order: int, precision: int = 12):
    """(coefs, shift): quantized LPC coefficients via Levinson-Durbin."""
    x = x.astype(np.float64)
    n = len(x)
    auto = np.array([np.dot(x[: n - lag], x[lag:]) for lag in range(order + 1)])
    if auto[0] == 0:
        return [0] * order, 0
    err = auto[0]
    lpc = np.zeros(order)
    for i in range(order):
        acc = auto[i + 1] - np.dot(lpc[:i], auto[i::-1][: i])
        k = acc / err
        lpc[: i + 1] = np.concatenate([lpc[:i] - k * lpc[:i][::-1], [k]]) if i else np.array([k])
        err *= 1 - k * k
        if err <= 0:
            break
    cmax = np.max(np.abs(lpc)) if order else 0.0
    if cmax == 0:
        return [0] * order, 0
    shift = precision - 1 - max(0, int(np.floor(np.log2(cmax))) + 1)
    shift = max(0, min(15, shift))
    q = np.clip(np.round(lpc * (1 << shift)), -(1 << (precision - 1)),
                (1 << (precision - 1)) - 1).astype(np.int64)
    return [int(v) for v in q], shift


def _write_subframe(bw: _BitWriter, samples: np.ndarray, bps: int, lpc_order: int = 0) -> None:
    s = samples.astype(np.int64)
    n = len(s)
    if np.all(s == s[0]):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(int(s[0]), bps)
        return
    if lpc_order and n > lpc_order:
        coefs, shift = _levinson_lpc(s, lpc_order)
        if any(coefs):
            bw.write(0, 1)
            bw.write(32 + lpc_order - 1, 6)  # LPC
            bw.write(0, 1)
            for w in s[:lpc_order]:
                bw.write_signed(int(w), bps)
            bw.write(12 - 1, 4)  # precision-1
            bw.write_signed(shift, 5)
            for c in coefs:
                bw.write_signed(c, 12)
            pred = np.zeros(n - lpc_order, dtype=np.int64)
            for j, c in enumerate(coefs):
                pred += c * s[lpc_order - 1 - j : n - 1 - j]
            _rice_write(bw, s[lpc_order:] - (pred >> shift), lpc_order, n)
            return
    # fixed predictor: pick the order minimizing the residual magnitude
    best_order, best_res, best_cost = 0, s, None
    res = s
    for o in range(5):
        if o:
            res = np.diff(res)
        if len(s) <= o:
            break
        cost = int(np.sum(np.abs(res)))
        if best_cost is None or cost < best_cost:
            best_order, best_res, best_cost = o, res.copy(), cost
    bw.write(0, 1)
    bw.write(8 + best_order, 6)  # FIXED
    bw.write(0, 1)
    for w in s[:best_order]:
        bw.write_signed(int(w), bps)
    # diff-of-order residual: np.diff applied o times == fixed predictor
    _rice_write(bw, best_res[best_order - best_order :] if best_order == 0 else best_res,
                best_order, n, partition_order=2 if n % 4 == 0 and n // 4 > best_order else 0)


def _read_subframe(br: _BitReader, n: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("subframe header padding bit set")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
        bps -= wasted
    if ftype == 0:  # CONSTANT
        out = np.full(n, br.read_signed(bps), dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        out = np.array([br.read_signed(bps) for _ in range(n)], dtype=np.int64)
    elif 8 <= ftype <= 12:  # FIXED
        order = ftype - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _rice_read(br, order, n)
        # the order-o fixed predictor is EXACTLY the o-th finite
        # difference, so reconstruction is o chained cumsums seeded by
        # the warmup's difference pyramid — no per-sample python loop
        # (§4). Magnitude guard replaces the old python-int overflow
        # trap: any level whose values leave ±2^48 can only come from a
        # corrupt stream (legit bps ≤ 32 keeps every difference level
        # under ~2^37), and the bound guarantees the next cumsum cannot
        # wrap int64 (2^48 · 65536 < 2^63).
        _LIM = np.int64(1) << 48
        if res.size and int(np.abs(res).max()) >= _LIM:
            raise ValueError("fixed-predictor residual overflow (corrupt stream)")
        out = np.empty(n, dtype=np.int64)
        out[:order] = warm
        w_arr = np.asarray(warm, dtype=np.int64)
        level = res
        for lvl in range(order - 1, -1, -1):
            # D^lvl[order-1] from the warmup pyramid, then integrate
            seed = np.diff(w_arr, n=lvl)[-1]
            level = seed + np.cumsum(level)
            if level.size and int(np.abs(level).max()) >= _LIM:
                raise ValueError("fixed-predictor overflow (corrupt stream)")
        out[order:] = level
    elif ftype >= 32:  # LPC
        order = ftype - 32 + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision code 1111")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        res = _rice_read(br, order, n)
        out = np.empty(n, dtype=np.int64)
        out[:order] = warm
        for i in range(order, n):
            acc = sum(c * int(out[i - 1 - j]) for j, c in enumerate(coefs))
            out[i] = int(res[i - order]) + (acc >> shift)
    else:
        raise ValueError(f"reserved subframe type {ftype:06b}")
    return out << wasted


# ---------------------------------------------------------------------------
# Frame + stream encode/decode
# ---------------------------------------------------------------------------


def encode_flac(sample_rate: int, samples: np.ndarray, block_size: int = 1024,
                mid_side: bool = False, lpc_order: int = 0) -> bytes:
    """16-bit FLAC encoder. ``samples``: (n,) mono or (n, 2) stereo
    int16. ``mid_side`` uses the mid/side decorrelation for stereo;
    ``lpc_order`` > 0 fits Levinson-Durbin LPC per subframe (else
    best-fixed-order)."""
    s = np.asarray(samples, dtype=np.int64)
    stereo = s.ndim == 2
    channels = 2 if stereo else 1
    n_total = len(s)
    interleaved = s.reshape(-1) if not stereo else s.reshape(-1)
    md5 = hashlib.md5(
        np.asarray(interleaved, dtype="<i2").tobytes()
    ).digest()
    out = bytearray(
        encode_flac_streaminfo(
            sample_rate=sample_rate,
            channels=channels,
            bits=16,
            total_samples=n_total,
            audio_md5=md5,
            min_block=min(block_size, n_total),
            max_block=block_size,
        )
    )
    frame_no = 0
    for start in range(0, n_total, block_size):
        blk = s[start : start + block_size]
        n = len(blk)
        hdr = bytearray()
        hdr += bytes([0xFF, 0xF8])  # sync + fixed blocksize strategy
        chan_assign = (10 if mid_side else channels - 1) if stereo else 0
        hdr.append(0x70)  # blocksize 0b0111 (16-bit at end), sample rate 0b0000
        hdr.append((chan_assign << 4) | (0x04 << 1))  # sample size 0b100 (16 bit)
        hdr += _utf8_coded_number(frame_no)
        hdr += struct.pack(">H", n - 1)
        hdr.append(_crc8(bytes(hdr)))
        bw = _BitWriter()
        if stereo:
            left, right = blk[:, 0], blk[:, 1]
            if mid_side:
                mid = (left + right) >> 1
                side = left - right
                _write_subframe(bw, mid, 16, lpc_order)
                _write_subframe(bw, side, 17, lpc_order)
            else:
                _write_subframe(bw, left, 16, lpc_order)
                _write_subframe(bw, right, 16, lpc_order)
        else:
            _write_subframe(bw, blk, 16, lpc_order)
        bw.align()
        frame = bytes(hdr) + bw.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
        frame_no += 1
    return bytes(out)


@loud_codec
def decode_flac(payload: bytes) -> tuple[int, int, int, float, float, int]:
    """Decode a FLAC stream: (sample_rate, n_channels, n_samples,
    duration_s, rms, peak) — the decode_wav contract, from the real
    sample plane. Verifies every frame's CRC-8/CRC-16 and, when
    STREAMINFO carries one, the MD5 of the decoded PCM."""
    rate, channels, bits, samples = decode_flac_samples(payload)
    flat = samples.reshape(-1).astype(np.float64)
    rms = float(np.sqrt(np.mean(flat * flat))) if len(flat) else 0.0
    peak = int(np.max(np.abs(samples))) if samples.size else 0
    n = len(samples)
    return rate, channels, n, n / rate if rate else 0.0, rms, peak


def decode_flac_samples(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """(sample_rate, channels, bits, samples[n, channels]) — the full
    decode. Raises ValueError on corruption, NotImplementedError never
    (every lossless layer of the format is implemented)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        hdr = payload[pos]
        btype, last = hdr & 0x7F, bool(hdr & 0x80)
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if btype == 0:
            if size != 34:
                raise ValueError("STREAMINFO must be 34 bytes")
            info = body
        pos += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("FLAC payload without STREAMINFO")
    si_rate = (int.from_bytes(info[10:13], "big") >> 4) & 0xFFFFF
    si_channels = ((info[12] >> 1) & 0x7) + 1
    si_bits = (((info[12] & 1) << 4) | (info[13] >> 4)) + 1
    si_md5 = info[18:34]
    chunks: list[np.ndarray] = []
    while pos < len(payload):
        frame_start = pos
        br = _BitReader(payload, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad frame sync at byte {pos}")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan_assign = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_coded(br)
        if bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        elif bs_code in _BLOCKSIZE_TABLE:
            blocksize = _BLOCKSIZE_TABLE[bs_code]
        else:
            raise ValueError(f"reserved block size code {bs_code}")
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("invalid sample rate code")
        bps = si_bits if ss_code == 0 else _SAMPLE_SIZE_TABLE.get(ss_code)
        if bps is None:
            raise ValueError(f"reserved sample size code {ss_code}")
        hdr_end = br.bytepos
        if _crc8(payload[frame_start:hdr_end]) != br.read(8):
            raise ValueError("frame header CRC-8 mismatch")
        if chan_assign <= 7:
            nch = chan_assign + 1
            subs = [_read_subframe(br, blocksize, bps) for _ in range(nch)]
            frame = np.stack(subs, axis=1)
        elif chan_assign in (8, 9, 10):
            nch = 2
            bump_first = chan_assign == 9  # right-side: channel 0 is the side
            a = _read_subframe(br, blocksize, bps + (1 if bump_first else 0))
            b = _read_subframe(br, blocksize, bps + (0 if bump_first else 1))
            if chan_assign == 8:  # left-side: a = left, b = side
                left, right = a, a - b
            elif chan_assign == 9:  # right-side: a = side, b = right
                left, right = a + b, b
            else:  # mid-side
                side = b
                mid = (a << 1) | (side & 1)
                left, right = (mid + side) >> 1, (mid - side) >> 1
            frame = np.stack([left, right], axis=1)
        else:
            raise ValueError(f"reserved channel assignment {chan_assign}")
        if nch != si_channels:
            raise ValueError("frame channel count disagrees with STREAMINFO")
        br.align()
        if _crc16(payload[frame_start : br.bytepos]) != br.read(16):
            raise ValueError("frame CRC-16 mismatch")
        pos = br.bytepos
        chunks.append(frame)
    samples = np.concatenate(chunks, axis=0) if chunks else np.zeros((0, si_channels), np.int64)
    if si_md5 != b"\x00" * 16 and si_bits == 16:
        got = hashlib.md5(np.asarray(samples.reshape(-1), dtype="<i2").tobytes()).digest()
        if got != si_md5:
            raise ValueError("decoded PCM fails the STREAMINFO MD5 check")
    return si_rate, si_channels, si_bits, samples
