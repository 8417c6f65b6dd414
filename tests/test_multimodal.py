"""Multimodal binary-column plumbing: schema, Arrow batch shape,
determinism, and the explicit real-decode stub."""

import pytest
from pyspark.sql import functions as F

from etl_jlp_spark.multimodal.binary import (
    decode_image,
    extract_features,
    frame_sample,
    synth_media_df,
)


def test_decode_schema_and_determinism(spark):
    media = synth_media_df(spark, n=32)
    out = decode_image(media)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,width:int,height:int,n_bytes:bigint,"
        "checksum:string,mean_r:double,mean_g:double,mean_b:double>"
    )
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 32
    again = {r["media_id"]: r for r in decode_image(media).collect()}
    assert all(rows[i]["checksum"] == again[i]["checksum"] for i in rows)


def test_bmp_real_decode(spark):
    from etl_jlp_spark.multimodal.binary import decode_bmp, encode_bmp

    media = synth_media_df(spark, n=12, kind="bmp")
    out = {r["media_id"]: r for r in decode_image(media, fake_decode=False).collect()}
    assert len(out) == 12
    for i, r in out.items():
        # dimensions from the BMP header must match the synth params
        assert r["width"] == (i % 16) + 1 and r["height"] == (i % 9) + 1
        assert 0.0 <= r["mean_r"] <= 255.0
    # a constant-color image decodes to exactly that channel mean
    img = encode_bmp(5, 3, lambda x, y: (10, 20, 30))
    assert decode_bmp(img) == (5, 3, 10.0, 20.0, 30.0)


def test_real_decode_is_explicit_stub_for_undecodable_kinds(spark):
    media = synth_media_df(spark, n=2)  # kind='image' (no codec)
    with pytest.raises(NotImplementedError):
        decode_image(media, fake_decode=False)


def test_features_feed_vector_ops(spark):
    media = synth_media_df(spark, n=16)
    feats = extract_features(media, dim=8)
    r = feats.collect()
    assert all(len(row["feature"]) == 8 for row in r)
    assert all(abs(sum(row["feature"]) - 1.0) < 1e-9 for row in r)


def test_frame_sample_explodes_offsets(spark):
    media = synth_media_df(spark, n=8)
    frames = frame_sample(media, every_n_bytes=16)
    per = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("n_bytes").alias("b")
    )
    for r in per.collect():
        assert r["n"] == (r["b"] - 1) // 16 + 1
