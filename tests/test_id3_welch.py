"""ID3v2 writer/parser/report + Welch t-test replica tests."""

import hashlib
from collections import defaultdict

import duckdb
import pytest

from etl_jlp_spark.multimodal.binary import MEDIA_SCHEMA
from etl_jlp_spark.multimodal.id3 import encode_id3, extract_id3, id3_report
from tests.conftest import SF_SMALL

import __spark_entry__ as ent

QS = ent.queries()


@pytest.mark.parametrize("version", [3, 4])
@pytest.mark.parametrize("encoding", [0, 1, 3])
def test_id3_roundtrip_versions_and_encodings(version, encoding):
    tag = encode_id3(
        title="Naniwa Blues", artist="Käsebrot", album="日本語アルバム" if encoding else "Album",
        track="7/12", year="1999", version=version, encoding=encoding,
    )
    payload = tag + b"\xff\xfb" + b"\x00" * 64  # fake mpeg frame follows
    d = extract_id3(payload)
    assert d["version"] == version
    assert d["title"] == "Naniwa Blues"
    assert d["artist"] == ("Käsebrot" if encoding else "Käsebrot".encode().decode("latin-1") if False else "Käsebrot")
    assert d["track"] == "7/12" and d["year"] == "1999"


def test_id3_absent_and_corrupt():
    assert extract_id3(b"\xff\xfbNOTAG" + b"\x00" * 16) is None
    broken = bytearray(encode_id3())
    broken[6:10] = b"\x7f\x7f\x7f\x7f"  # size far past the payload
    with pytest.raises(ValueError):
        extract_id3(bytes(broken))


def test_id3_report_mapinpandas(spark):
    rows = [
        (i, "mp3", bytearray(encode_id3(title=f"T{i}", version=3 + i % 2)), ("s", 1, 0, 0))
        for i in range(4)
    ] + [(9, "mp3", bytearray(hashlib.md5(b"x").digest() * 4), ("s", 1, 0, 0))]
    out = {r["media_id"]: r for r in id3_report(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()}
    for i in range(4):
        assert out[i]["has_id3"] and out[i]["title"] == f"T{i}"
        assert out[i]["version"] == 3 + i % 2
    assert not out[9]["has_id3"]
    with pytest.raises(Exception, match="mp3"):
        id3_report(
            spark.createDataFrame([(1, "wav", bytearray(b"x"), ("s", 1, 0, 0))], MEDIA_SCHEMA)
        ).collect()


def test_welch_matches_python_replica(spark):
    rows = {r["event_type"]: r for r in QS["welch_ttest_by_type"](spark, SF_SMALL).collect()}
    data = duckdb.sql(
        f"SELECT event_type,"
        f" CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8' THEN 'A' ELSE 'B' END,"
        f" CAST(round(value * 10000) AS BIGINT) FROM '{SF_SMALL}/events.parquet'"
    ).fetchall()
    groups = defaultdict(list)
    for t, v, x in data:
        groups[(t, v)].append(x / 10000.0)
    for t, r in rows.items():
        a, b = groups[(t, "A")], groups[(t, "B")]
        ma, mb = sum(a) / len(a), sum(b) / len(b)
        va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
        vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
        t_stat = (ma - mb) / (va / len(a) + vb / len(b)) ** 0.5
        assert (r["na"], r["nb"]) == (len(a), len(b))
        assert abs(r["mean_a"] - round(ma, 4)) < 1e-6
        assert abs(r["t_stat"] - round(t_stat, 6)) < 1e-4
        assert r["df_welch"] >= min(len(a), len(b)) - 1
