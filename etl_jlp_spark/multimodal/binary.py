"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for a 100 TB media pipeline:
- media rows = (media_id, kind, payload binary, meta struct) — the
  payload is NEVER interpreted by Catalyst; filters/pruning work on the
  typed metadata columns so scans skip payload bytes when possible
  (parquet column pruning).
- decode / feature-extract run as ``mapInPandas`` Arrow-batched UDFs:
  payload bytes cross to Python once per batch, vectorized, and the
  UDF's output schema is declared so downstream stays relational.

Codec support: uncompressed 24-bit BMP is decoded FOR REAL (pure
``struct`` parsing — no external libraries), covering the full
decode path: header validation, dimension extraction, pixel-plane
statistics. Formats that need real codecs (JPEG/PNG/ffmpeg/librosa —
not in this container) raise ``NotImplementedError`` explicitly;
``fake_decode=True`` (default for non-BMP) derives deterministic
pseudo-features so the Spark-side plumbing (schema, batching,
partitioning) is exercised identically either way.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<source:string, n_bytes:long, declared_w:int, declared_h:int>"
)

DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, n_bytes long, checksum string, "
    "mean_r double, mean_g double, mean_b double"
)

FEATURES_SCHEMA = "media_id long, feature array<double>"


def encode_bmp(width: int, height: int, pixel_fn) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (BITMAPINFOHEADER).
    ``pixel_fn(x, y) -> (r, g, b)``. Rows bottom-up, 4-byte padded."""
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    image_size = (row_bytes + pad) * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0)
    rows = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            rows += bytes((b & 0xFF, g & 0xFF, r & 0xFF))  # BGR order
        rows += b"\x00" * pad
    return header + bytes(rows)


def decode_bmp(payload: bytes) -> tuple[int, int, float, float, float]:
    """Parse an uncompressed 24-bit BMP: (width, height, mean_r, mean_g,
    mean_b). Raises ValueError on anything that isn't one."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    h = abs(height)
    stride = row_bytes + pad
    # whole pixel plane as one numpy view: (h, stride) → strip padding →
    # per-channel means without any python-level byte loop
    plane = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_offset)
    rows = plane.reshape(h, stride)[:, :row_bytes].reshape(h * width, 3)
    means = rows.mean(axis=0, dtype=np.float64)  # BGR order on disk
    return width, h, float(means[2]), float(means[1]), float(means[0])


def synth_media_df(spark: SparkSession, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake media: payload = repeated md5 bytes of the id.
    Stands in for a parquet/lakehouse media table in tests."""
    rows = []
    for i in range(n):
        if kind == "bmp":
            w, h = (i % 16) + 1, (i % 9) + 1
            payload = encode_bmp(w, h, lambda x, y, i=i: ((x * 7 + i) % 256, (y * 13) % 256, (x + y + i) % 256))
            rows.append((i, kind, bytearray(payload), (f"src{i % 3}", len(payload), w, h)))
        else:
            digest = hashlib.md5(f"{kind}:{i}".encode()).digest()
            payload = (digest * ((i % 7) + 1))[: 16 * ((i % 7) + 1)]
            rows.append(
                (i, kind, bytearray(payload), (f"src{i % 3}", len(payload), (i % 16) + 1, (i % 9) + 1))
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Decode payloads via an Arrow-batched ``mapInPandas``.

    ``kind == 'bmp'`` rows are REALLY decoded (pure-python BMP parser:
    dimensions from the header, per-channel means from the pixel
    plane). Other kinds need codecs this container lacks: with
    ``fake_decode`` they get deterministic metadata-derived pseudo
    dimensions and null channel means; without it, they raise."""
    if not fake_decode:
        kinds = [r["kind"] for r in media.select("kind").distinct().collect()]
        if any(k != "bmp" for k in kinds):
            raise NotImplementedError(
                f"real decode of {kinds} needs PIL/libjpeg/ffmpeg — not in "
                "this container; only 'bmp' decodes natively"
            )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [bytes(p) for p in pdf["payload"]]
            is_bmp = (pdf["kind"] == "bmp").to_numpy()
            # metadata-derived columns are vectorized over the whole
            # Arrow batch; only the codec itself runs per payload
            width = np.array([m["declared_w"] for m in pdf["meta"]], dtype=np.int32)
            height = np.array([m["declared_h"] for m in pdf["meta"]], dtype=np.int32)
            mean_r = np.full(len(pdf), np.nan)
            mean_g = np.full(len(pdf), np.nan)
            mean_b = np.full(len(pdf), np.nan)
            for i in np.flatnonzero(is_bmp):
                w, h, mr, mg, mb = decode_bmp(payloads[i])
                width[i], height[i] = w, h
                mean_r[i], mean_g[i], mean_b[i] = mr, mg, mb
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "width": width,
                    "height": height,
                    "n_bytes": np.fromiter(map(len, payloads), dtype=np.int64, count=len(payloads)),
                    "checksum": [hashlib.md5(p).hexdigest() for p in payloads],
                    "mean_r": mean_r,
                    "mean_g": mean_g,
                    "mean_b": mean_b,
                }
            )

    return media.mapInPandas(batches, DECODED_SCHEMA)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Byte-histogram 'embedding' per payload (deterministic fake for a
    real encoder). Arrow-batched; output is a dense array column that
    feeds the similarity operators unchanged."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for b in pdf["payload"]:
                raw = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(raw % dim, minlength=dim).astype(np.float64)
                total = hist.sum() or 1.0
                feats.append((hist / total).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 16) -> DataFrame:
    """'Frame sampling' shape: one output row per sampled offset —
    demonstrates the 1→N explode pattern for video/audio chunking while
    staying in the relational model."""
    return (
        media.select(
            "media_id",
            "kind",
            F.length("payload").alias("n_bytes"),
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.length("payload") - 1) / every_n_bytes, F.lit(0)
                    ).cast("int"),
                )
            ).alias("frame_idx"),
        )
        .withColumn("byte_offset", F.col("frame_idx") * every_n_bytes)
    )
