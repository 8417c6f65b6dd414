"""Repeatable codec fuzz harness (the deep version of the hypothesis
property in tests/test_properties.py).

For every media decoder, throws N cases of three corruption modes —
random bytes, bit-flipped real streams, truncated real streams — and
reports any exception class escaping the ValueError /
NotImplementedError contract (multimodal/robust.py). Exit 0 = clean.

Usage: python tools/fuzz_codecs.py [cases_per_codec=4000]
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

from etl_jlp_spark.multimodal.binary import (  # noqa: E402
    decode_avi,
    decode_bmp,
    decode_png,
    decode_wav,
    encode_avi,
    encode_bmp,
    encode_png,
    encode_wav,
)
from etl_jlp_spark.multimodal.flac import decode_flac, encode_flac  # noqa: E402
from etl_jlp_spark.multimodal.gif import decode_gif, encode_gif  # noqa: E402
from etl_jlp_spark.multimodal.jpeg import decode_jpeg, encode_jpeg  # noqa: E402
from etl_jlp_spark.multimodal.tiff import decode_tiff, encode_tiff  # noqa: E402


def _seeds():
    px = lambda x, y: (x * 20 % 256, y * 30 % 256, 5)  # noqa: E731
    wave = (1000 * np.sin(np.arange(400) / 5)).astype(np.int16)
    frames = [np.full((6, 4, 3), i * 30, dtype=np.uint8) for i in range(3)]
    return {
        decode_bmp: [encode_bmp(9, 7, px)],
        decode_png: [encode_png(9, 7, px, filter_type=f) for f in range(5)],
        decode_jpeg: [encode_jpeg(9, 7, px)],
        decode_gif: [encode_gif(9, 7, px, interlace=bool(i)) for i in range(2)],
        decode_tiff: [
            encode_tiff(9, 7, px, compression=c, predictor=p)
            for c, p in ((1, 1), (5, 1), (5, 2))
        ],
        decode_wav: [encode_wav(8000, wave)],
        decode_flac: [
            encode_flac(8000, wave, block_size=128),
            encode_flac(8000, np.stack([wave, -wave], axis=1), block_size=128,
                        mid_side=True, lpc_order=4),
        ],
        decode_avi: [encode_avi(4, 6, frames)],
    }


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    bad: dict[tuple[str, str], tuple[int, str]] = {}
    for fn, seeds in _seeds().items():
        for i in range(n):
            r = random.Random(i * 7 + 1)
            mode = i % 3
            if mode == 0:
                payload = bytes(r.randrange(256) for _ in range(r.randrange(0, 150)))
            else:
                buf = bytearray(seeds[i % len(seeds)])
                for _ in range(r.randrange(1, 10)):
                    buf[r.randrange(len(buf))] = r.randrange(256)
                if mode == 2:
                    buf = buf[: r.randrange(1, len(buf) + 1)]
                payload = bytes(buf)
            try:
                fn(payload)
            except (ValueError, NotImplementedError):
                pass
            except Exception as exc:  # noqa: BLE001 — the harness's whole point
                bad.setdefault(
                    (fn.__name__, type(exc).__name__), (i, str(exc)[:80])
                )
    for (name, etype), (case, msg) in sorted(bad.items()):
        print(f"ESCAPE {name}: {etype} at case {case}: {msg}")
    print(f"{'FAIL' if bad else 'OK'}: {len(bad)} escaping exception classes "
          f"({n} cases x 3 modes per codec)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
