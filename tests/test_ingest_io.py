"""Sink layer tests: medallion write/readback round-trips, archive
step, bool-string normalization."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.ingest.writers import (
    archive_parquet,
    normalize_bool_strings,
    normalize_uuid_binary,
    write_entity,
)


def test_medallion_roundtrip_parquet_partitioned(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events").withColumn("day", F.to_date("ts"))
    path = write_entity(
        ev, str(tmp_path / "01landzone"), "streaming-sources", "events", "parquet",
        "20240201", partition_cols=("day",),
    )
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    # partition pruning: reading one day touches one partition dir
    one_day = back.filter(F.col("day") == "2024-01-05")
    plan = one_day._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan


def test_csv_json_roundtrip(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events").select("event_id", "user_id", "event_type")
    for fmt in ("csv", "json"):
        p = write_entity(ev, str(tmp_path / "01landzone"), "b", "events", fmt, "20240201")
        back = spark.read.format(fmt).option("header", "true").option("inferSchema", "true").load(p)
        assert back.count() == ev.count()


def test_archive_step(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events")
    p = archive_parquet(ev, str(tmp_path / "00fs"), "streaming-sources", "events", "20240201")
    assert "archives" in p
    assert spark.read.parquet(p).count() == ev.count()


def test_normalize_bool_strings(spark):
    df = spark.createDataFrame(
        [("true", "yes", "1"), ("FALSE", "no", "2"), (None, "yes", "3")],
        "flag string, answer string, id string",
    )
    out = normalize_bool_strings(df)
    assert dict(out.dtypes)["flag"] == "boolean"
    assert dict(out.dtypes)["answer"] == "string"  # not a bool domain
    assert dict(out.dtypes)["id"] == "string"
    vals = [r["flag"] for r in out.orderBy("id").collect()]
    assert vals == [True, False, None]


def test_normalize_uuid_binary(spark):
    """Reference convert_uuid parity: BINARY(16) UUID columns land as
    canonical lowercase-hyphenated strings; non-16-byte binary columns
    and NULLs are untouched."""
    import uuid

    u1 = uuid.UUID("12345678-9abc-def0-1234-56789abcdef0")
    u2 = uuid.uuid5(uuid.NAMESPACE_DNS, "spark")
    df = spark.createDataFrame(
        [(u1.bytes, b"\x01\x02", "a"), (u2.bytes, b"\x03", "b"), (None, None, "c")],
        "uid binary, blob binary, id string",
    )
    out = normalize_uuid_binary(df)
    assert dict(out.dtypes)["uid"] == "string"
    assert dict(out.dtypes)["blob"] == "binary"  # not UUID-shaped
    vals = [r["uid"] for r in out.orderBy("id").collect()]
    assert vals == [str(u1), str(u2), None]
    # all-NULL binary column: no evidence of UUID shape → untouched
    df2 = spark.createDataFrame([(None,), (None,)], "uid binary")
    assert dict(normalize_uuid_binary(df2).dtypes)["uid"] == "binary"


def test_jsonline_roundtrip_sniffed(spark, tmp_path):
    """Landzone JSONL round trip: micros timestamps, dates, doubles and
    booleans survive; the read side sniffs the format from the layout."""
    from etl_jlp_spark.ingest.readers import read_entity, sniff_format
    from etl_jlp_spark.ingest.writers import medallion_path

    ev = (
        load_table(spark, SF_SMALL, "events")
        .select("event_id", "ts", "value")
        .withColumn("day", F.to_date("ts"))
        .withColumn("flag", F.col("event_id") % 2 == 0)
    )
    write_entity(ev, str(tmp_path / "01lz"), "b", "events", "jsonline", "20240201")
    path = medallion_path(str(tmp_path / "01lz"), "b", "events", "jsonline", "20240201")
    assert sniff_format(path) == "jsonline"
    back = read_entity(spark, str(tmp_path / "01lz"), "b", "events", "20240201", schema=ev.schema)
    assert back.dtypes == ev.dtypes
    a = sorted(map(tuple, ev.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b  # exact: no ms truncation, no double drift


def test_read_entity_sniffs_csv_and_parquet(spark, tmp_path):
    from etl_jlp_spark.ingest.readers import read_entity

    ev = load_table(spark, SF_SMALL, "events").select("event_id", "user_id", "event_type")
    for fmt in ("csv", "parquet"):
        write_entity(ev, str(tmp_path / fmt), "b", "events", fmt, "20240201")
        back = read_entity(spark, str(tmp_path / fmt), "b", "events", "20240201", schema=ev.schema)
        assert back.count() == ev.count()
        assert back.dtypes == ev.dtypes


def test_sniff_format_magic_bytes(tmp_path):
    from etl_jlp_spark.ingest.readers import sniff_format

    d = tmp_path / "mystery"
    d.mkdir()
    (d / "part-00000").write_text('{"a": 1}\n{"a": 2}\n')
    assert sniff_format(str(d)) == "jsonline"
    (d / "part-00000").write_bytes(b"PAR1xxxx")
    assert sniff_format(str(d)) == "parquet"
    (d / "part-00000").write_text("a,b\n1,2\n")
    assert sniff_format(str(d)) == "csv"


def test_transform_archive(spark, tmp_path):
    """read-transform-archive in one distributed pass (the reference
    chunks this through pandas manually)."""
    from etl_jlp_spark.ingest.writers import transform_archive

    ev = load_table(spark, SF_SMALL, "events").select("event_id", "user_id", "value")
    write_entity(ev, str(tmp_path), "lz", "events", "jsonline", "20240201")
    p = transform_archive(
        spark, str(tmp_path), "lz", "events", "20240201",
        lambda df: df.filter(F.col("value") > 0).withColumn("doubled", F.col("value") * 2),
    )
    back = spark.read.parquet(p)
    assert "archives" in p
    assert back.filter(F.col("doubled") != F.col("value") * 2).count() == 0
    assert back.count() == ev.filter(F.col("value") > 0).count()


def test_sniff_rejects_mixed_dir_and_ignores_entity_named_json(tmp_path):
    """ADVICE r2: a mixed-format dir must raise (not silently guess
    'csv'), and only the medallion {fmt} segment may name the format —
    an ENTITY named 'json' must fall through to content evidence."""
    import pytest as _pytest

    from etl_jlp_spark.ingest.readers import sniff_format

    mixed = tmp_path / "mixed"
    mixed.mkdir()
    (mixed / "a.csv").write_text("a,b\n1,2\n")
    (mixed / "b.json").write_text('{"a": 1}\n')
    with _pytest.raises(ValueError, match="mixed"):
        sniff_format(str(mixed))

    # dir named like an entity 'json' but NOT in the {fmt} position:
    # …/json/<job_date>/ would match; …/json alone (no job_date child
    # segment) must sniff the content instead
    ent = tmp_path / "landzone" / "json"
    ent.mkdir(parents=True)
    (ent / "part-000.csv").write_text("x,y\n3,4\n")
    assert sniff_format(str(ent)) == "csv"

    # magic-byte fallback with agreeing extension-less files
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "part-000").write_text('{"k": 1}\n')
    (raw / "part-001").write_text('{"k": 2}\n')
    assert sniff_format(str(raw)) == "jsonline"


def test_orc_csv_roundtrip_exact(spark, tmp_path):
    """ORC and CSV landzone round trips are value-exact for every
    column type in events (timestamps keep micros, doubles keep bits,
    quoted JSON in props survives CSV quoting); the ORC read side
    sniffs the format from the magic bytes when the layout hint is
    stripped."""
    from etl_jlp_spark.ingest.readers import read_entity, sniff_format

    ev = load_table(spark, SF_SMALL, "events").limit(200)
    src = {r["event_id"]: r for r in ev.collect()}
    for fmt in ("orc", "csv"):
        write_entity(ev, str(tmp_path / "lz"), "b", "events", fmt, "20240201")
        back = read_entity(
            spark, str(tmp_path / "lz"), "b", "events", "20240201",
            fmt=fmt, schema=ev.schema,
        )
        assert back.schema == ev.schema
        got = {r["event_id"]: r for r in back.collect()}
        assert got == src
    # magic-byte sniff: ORC files start with b"ORC"
    orc_dir = str(tmp_path / "lz" / "b" / "events" / "orc" / "20240201")
    import os
    import shutil

    flat = str(tmp_path / "flat_orc")
    os.makedirs(flat)
    for f in os.listdir(orc_dir):
        if not f.startswith(("_", ".")) and not f.endswith(".crc"):
            shutil.copy2(os.path.join(orc_dir, f), os.path.join(flat, f + ".data"))
    assert sniff_format(flat) == "orc"
