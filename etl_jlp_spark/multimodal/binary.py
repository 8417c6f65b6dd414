"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for a 100 TB media pipeline:
- media rows = (media_id, kind, payload binary, meta struct) — the
  payload is NEVER interpreted by Catalyst; filters/pruning work on the
  typed metadata columns so scans skip payload bytes when possible
  (parquet column pruning).
- decode / feature-extract run as ``mapInPandas`` Arrow-batched UDFs:
  payload bytes cross to Python once per batch, vectorized, and the
  UDF's output schema is declared so downstream stays relational.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
``decode_image`` raises ``NotImplementedError`` when asked for a real
decode; ``fake_decode=True`` (default) derives deterministic
pseudo-features from the bytes — the Spark-side plumbing (schema,
batching, partitioning) is identical either way and is what the tests
exercise.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<source:string, n_bytes:long, declared_w:int, declared_h:int>"
)

DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, n_bytes long, checksum string"
)

FEATURES_SCHEMA = "media_id long, feature array<double>"


def synth_media_df(spark: SparkSession, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake media: payload = repeated md5 bytes of the id.
    Stands in for a parquet/lakehouse media table in tests."""
    rows = []
    for i in range(n):
        digest = hashlib.md5(f"{kind}:{i}".encode()).digest()
        payload = (digest * ((i % 7) + 1))[: 16 * ((i % 7) + 1)]
        rows.append(
            (i, kind, bytearray(payload), (f"src{i % 3}", len(payload), (i % 16) + 1, (i % 9) + 1))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Decode payloads to (width, height, checksum) rows via an
    Arrow-batched ``mapInPandas``. Real decoding requires an image
    codec not present in this environment."""
    if not fake_decode:
        raise NotImplementedError(
            "real image decode needs PIL/libjpeg — not available in this "
            "container; run with fake_decode=True for the plumbing path"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    # deterministic pseudo-dimensions from metadata
                    "width": pdf["meta"].map(lambda m: m["declared_w"]).astype("int32"),
                    "height": pdf["meta"].map(lambda m: m["declared_h"]).astype("int32"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
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
                raw = bytes(b)
                hist = [0.0] * dim
                for byte in raw:
                    hist[byte % dim] += 1.0
                total = sum(hist) or 1.0
                feats.append([h / total for h in hist])
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
