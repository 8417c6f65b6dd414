"""Oracle-gated audit of the multimodal DISPATCH layer.

The media codecs themselves (BMP/PNG/JPEG/GIF/TIFF, WAV/ADPCM/G.711/
FLAC, AVI) are pinned by 45 fixture-free round-trip tests — but until
now the Arrow-batched dispatch plumbing (`decode_audio` routing real
kinds to the in-repo codecs and declared-unsupported perceptual kinds
to deterministic stand-ins) had no driver-gate row. This module closes
that with TWO driver-gate rows: `audio_decode_report` runs the REAL
`mapInPandas` decode over the deterministic synthetic audio corpus and
a DuckDB oracle
re-derives every signal statistic FROM FIRST PRINCIPLES (re-synthesize
the integer PCM samples in SQL, integer sum-of-squares → RMS), so the
whole chain — python encoders → Arrow batches → chunk-walking parsers
→ FLAC frame decode — must agree with an independent reconstruction.

The perceptual boundary (mp3/ogg/h264 and friends) is DECLARED FINAL:
a correct-by-construction pure-python perceptual decoder would need
the ISO psychoacoustic filterbank tables verbatim, which cannot be
re-derived from a formula and cannot be validated in this container
(no reference decoder); those kinds keep the loud
``NotImplementedError`` contract (multimodal/robust.py) and their
fake-decode stand-ins are part of the oracle instead.
`media_metadata_report` gates the CONTAINER-metadata dispatch the same
way: EXIF / ID3 / STREAMINFO / MP4-box / Ogg-page parsers over a
writer-built corpus, with the expected summaries hand-derived from the
writer parameters.

Reference tie-in: the reference pipeline is text-only
(dwh_lab/dwh/preprocess.py) — multimodal columns are a beyond-reference
capability for the 100 TB training-data story (SURVEY §2.C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_jlp_spark.registry import query

# deterministic corpus shape (mirrors synth_audio_df's generator):
# rate 8000, payload i has 800+7i frames of trunc(3000·sin(2π(110+13i)t/8000)),
# stereo [wave, -wave] on odd i; wav + flac carry IDENTICAL samples
# (FLAC is lossless), mp3/ogg are 16 opaque md5 payloads each.
N_REAL = 32
N_FAKE = 16

_MEDIA_ORACLE = f"""
WITH idx AS (SELECT CAST(unnest(range({N_REAL})) AS BIGINT) AS i),
samp AS (
  SELECT i, CAST(unnest(range(800 + 7*i)) AS BIGINT) AS t FROM idx
), sig AS (
  SELECT i, CAST(trunc(3000 * sin(2 * pi() * (110 + 13*i) * t / 8000)) AS BIGINT) AS s
  FROM samp
), per AS (
  SELECT i,
         1 + (i % 2) AS channels,
         800 + 7*i AS n_samples,
         (800 + 7*i) / 8000.0 AS duration_s,
         sqrt(CAST(sum(s*s) AS DOUBLE) / count(*)) AS rms,
         max(abs(s)) AS peak
  FROM sig GROUP BY i
), kinds AS (SELECT unnest(['wav', 'flac']) AS kind),
realk AS (
  SELECT k.kind,
         CAST(count(*) AS BIGINT) AS n_media,
         CAST(count(*) AS BIGINT) AS n_real_decoded,
         CAST(sum(p.channels) AS BIGINT) AS sum_channels,
         CAST(sum(p.n_samples) AS BIGINT) AS total_samples,
         round(sum(p.duration_s), 4) + 0.0 AS total_duration_s,
         round(avg(p.rms), 2) + 0.0 AS avg_rms,
         CAST(max(p.peak) AS INT) AS max_peak,
         CAST(count(DISTINCT p.i) AS BIGINT) AS n_distinct_payloads
  FROM kinds k CROSS JOIN per p GROUP BY 1
), fakek AS (
  SELECT kind,
         CAST({N_FAKE} AS BIGINT) AS n_media,
         CAST(0 AS BIGINT) AS n_real_decoded,
         CAST(0 AS BIGINT) AS sum_channels,
         CAST(0 AS BIGINT) AS total_samples,
         CAST(NULL AS DOUBLE) AS total_duration_s,
         CAST(NULL AS DOUBLE) AS avg_rms,
         CAST(0 AS INT) AS max_peak,
         CAST({N_FAKE} AS BIGINT) AS n_distinct_payloads
  FROM (SELECT unnest(['mp3', 'ogg']) AS kind)
)
SELECT * FROM realk UNION ALL SELECT * FROM fakek
"""


@query("audio_decode_report", oracle=_MEDIA_ORACLE)
def audio_decode_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind audit of the audio decode dispatch over the synthetic
    corpus (sf-independent by design — the DISPATCH LAYER is the unit
    under test, not a scan): media count, how many took a REAL codec
    path, channel/sample/duration totals, mean RMS, max peak, distinct
    payloads. wav and flac rows must agree on every signal statistic
    (identical samples, lossless codec) and both must equal the
    oracle's from-first-principles SQL reconstruction of the PCM
    plane; mp3/ogg rows pin the declared-final perceptual boundary's
    fake-decode stand-ins (rate/samples 0, null signal stats).

    Plan: the decode is one Arrow-batched ``mapInPandas`` pass (the
    exact production shape for a 100 TB media table — per-batch codec
    work, vectorized metadata, no driver loop); the report is one
    |kinds|-cell aggregate."""
    from etl_jlp_spark.multimodal.binary import (
        MEDIA_SCHEMA,
        decode_audio,
        synth_audio_rows,
    )

    # ONE createDataFrame for all four kinds (same rows, same order as
    # the old per-kind frames + 3 unionByNames — r11: four driver py4j
    # conversions and three union nodes collapsed into one LocalRelation)
    media = spark.createDataFrame(
        synth_audio_rows(N_REAL, "wav")
        + synth_audio_rows(N_REAL, "flac")
        + synth_audio_rows(N_FAKE, "mp3")
        + synth_audio_rows(N_FAKE, "ogg"),
        MEDIA_SCHEMA,
        # right-size: 96 tiny rows would otherwise fan out to 4×32
        # near-empty tasks (pure scheduling overhead; measured best at
        # ~16); a real media table arrives already file-partitioned
    ).coalesce(16)
    dec = decode_audio(media, fake_decode=True)
    real = F.col("sample_rate") > 0
    return dec.groupBy("kind").agg(
        F.count(F.lit(1)).cast("long").alias("n_media"),
        F.sum(F.when(real, 1).otherwise(0)).cast("long").alias("n_real_decoded"),
        F.sum("n_channels").cast("long").alias("sum_channels"),
        F.sum("n_samples").cast("long").alias("total_samples"),
        F.round(F.sum(F.when(~F.isnan("duration_s"), F.col("duration_s"))), 4).alias(
            "total_duration_s"
        ),
        F.round(F.avg(F.when(~F.isnan("rms"), F.col("rms"))), 2).alias("avg_rms"),
        F.max("peak").cast("int").alias("max_peak"),
        F.countDistinct("checksum").cast("long").alias("n_distinct_payloads"),
    )


def _container_corpus(spark: SparkSession) -> DataFrame:
    """Deterministic mixed-kind corpus for the container-metadata
    dispatch, built with the in-repo WRITERS (fixture-free): EXIF'd
    JPEG, ID3v2.4 + ID3v2.3 mp3 tags, one tagless mp3, FLAC
    STREAMINFO, MP4 skeleton, Ogg Vorbis skeleton."""
    from etl_jlp_spark.multimodal.binary import MEDIA_SCHEMA, encode_jpeg
    from etl_jlp_spark.multimodal.containers import (
        encode_flac_streaminfo,
        encode_mp4_skeleton,
        encode_ogg_vorbis_skeleton,
    )
    from etl_jlp_spark.multimodal.exif import encode_exif_app1, insert_app1
    from etl_jlp_spark.multimodal.id3 import encode_id3

    jpeg = insert_app1(
        encode_jpeg(8, 8, lambda x, y: (x * 31 % 256, y * 17 % 256, 64)),
        encode_exif_app1(),
    )
    payloads = [
        (0, "jpeg", jpeg),
        (1, "mp3", encode_id3(title="Graft", artist="Spark", version=4)),
        (2, "mp3", encode_id3(title="Legacy", album="Tape", version=3, encoding=0)),
        (3, "mp3", b"\xff\xfbno tag"),
        (4, "flac", encode_flac_streaminfo(22050, 1, 16, 44100)),
        (5, "mp4", encode_mp4_skeleton(2.5, 1000, 2)),
        (6, "ogg", encode_ogg_vorbis_skeleton(22050, 1, 66150, 4)),
    ]
    rows = [
        (i, kind, bytearray(p), ("synth", len(p), 0, 0)) for i, kind, p in payloads
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# Expected rows derived BY HAND from _container_corpus's writer
# parameters (exif.py/id3.py/containers.py defaults + explicit args) —
# k=v pairs sorted by key, lists excluded, per containers.py's summary
# contract. ogg: 1 ident page + 4 audio pages of 66150/4 granules at
# 22050 Hz → n_pages=5, duration 3.0 s. mp4: duration 2500/1000.
_CONTAINER_ORACLE = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), 'jpeg', TRUE,
   'datetime=2024:01:15 12:00:00;exposure=(1, 125);iso=200;make=SparkCam;model=Model-X;orientation=1'),
  (CAST(1 AS BIGINT), 'mp3', TRUE,
   'album=Album;artist=Spark;title=Graft;track=1/12;version=4;year=2024'),
  (CAST(2 AS BIGINT), 'mp3', TRUE,
   'album=Tape;artist=Artist;title=Legacy;track=1/12;version=3;year=2024'),
  (CAST(3 AS BIGINT), 'mp3', FALSE, CAST(NULL AS VARCHAR)),
  (CAST(4 AS BIGINT), 'flac', TRUE,
   'audio_md5=00000000000000000000000000000000;bits=16;channels=1;sample_rate=22050;total_samples=44100'),
  (CAST(5 AS BIGINT), 'mp4', TRUE,
   'brand=isom;duration_s=2.5;n_tracks=2;timescale=1000'),
  (CAST(6 AS BIGINT), 'ogg', TRUE,
   'channels=1;duration_s=3.0;n_pages=5;sample_rate=22050')
) AS t(media_id, kind, has_meta, summary)
"""


@query("media_metadata_report", oracle=_CONTAINER_ORACLE)
def media_metadata_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate row for the container-metadata DISPATCH layer
    (containers.media_metadata_report): every payload routes to its
    format's REAL parser — EXIF segment walk, ID3v2.3/2.4 frames,
    FLAC STREAMINFO, MP4 box tree, Ogg page walk with CRC verify —
    in ONE Arrow mapInPandas pass. The oracle's expected summaries
    are derived from the WRITER parameters (not by running the
    parsers), so encoder and parser must independently agree on every
    field. A tagless mp3 pins the None-is-data (not corruption)
    convention.

    Plan: metadata-only range reads per blob at 100 TB — no sample
    data moves; output is row-per-media, corpus-bounded."""
    from etl_jlp_spark.multimodal.containers import media_metadata_report as report

    return report(_container_corpus(spark))
