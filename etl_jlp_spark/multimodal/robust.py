"""Codec robustness contract: corrupt bytes raise ValueError, period.

Parsers index, unpack, and inflate; random corruption therefore
surfaces as IndexError / KeyError / struct.error / zlib.error deep in
the walk. A decoder running inside a 1000-executor `mapInPandas` must
instead fail with ONE well-known exception type the pipeline can catch
per-row (quarantine the payload, keep the batch alive) — anything else
kills the task. ``loud_codec`` converts the mechanical corruption
errors at the codec boundary; genuine ValueError/NotImplementedError
pass through untouched. ``check_dims`` rejects zero/negative and
absurd header dimensions BEFORE any allocation — a corrupted header
claiming 65535×65535 must not 12-GB-allocate its way to an OOM kill.

Found by fuzzing (random bytes, bit-flipped and truncated real
streams); tests/test_multimodal.py pins the contract for every codec.
"""

from __future__ import annotations

import functools
import struct
import zlib

MAX_PIXELS = 1 << 26  # 67M px — far beyond any fixture, far below OOM


def check_dims(width: int, height: int) -> None:
    if width < 1 or height < 1:
        raise ValueError(f"bad image dimensions {width}x{height}")
    if width * height > MAX_PIXELS:
        raise ValueError(f"refusing {width}x{height} (> {MAX_PIXELS} px)")


def loud_codec(fn):
    """Decorator: mechanical corruption errors become ValueError."""

    @functools.wraps(fn)
    def wrapped(payload, *args, **kwargs):
        try:
            return fn(payload, *args, **kwargs)
        except (IndexError, KeyError, OverflowError, struct.error, zlib.error) as exc:
            raise ValueError(
                f"corrupt {fn.__name__.replace('decode_', '')} stream: "
                f"{type(exc).__name__}: {exc}"
            ) from exc

    return wrapped
