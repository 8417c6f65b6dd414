"""Semantic checks for the curation rules on known-dirty synthetic docs
(parity vs DuckDB is covered by test_parity; these pin the semantics)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_jlp_spark.operators.quality_rules import (
    gopher_quality_filter,
    pii_scrub,
    text_repetition,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t)) for i, t in enumerate(texts)]
    )


def test_repetition_flags_looping_text(spark, tmp_path, monkeypatch):
    clean = "the quick brown fox jumps over a lazy dog near the old red barn today"
    loopy = "spam ham " * 40 + "spam"
    df = _docs(spark, [clean, loopy.strip()])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in text_repetition(spark, str(tmp_path)).collect()}
    assert out[1]["top_bigram"] in ("spam ham", "ham spam")
    assert out[1]["top_word_frac"] > 0.4  # half the words are 'spam'
    assert out[1]["distinct_ratio"] < 0.1
    assert out[0]["distinct_ratio"] > 0.8
    assert out[0]["top_bigram_frac"] < out[1]["top_bigram_frac"]


def test_gopher_filter_reasons(spark, tmp_path):
    ok = ("the cat and a dog sat in of " + "plain words here again ") * 4
    short = "the a of tiny"
    nostop = " ".join(["zz"] * 50)
    df = _docs(spark, [ok.strip(), short, nostop])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in gopher_quality_filter(spark, str(tmp_path)).collect()}
    assert out[0]["keep"] and out[0]["reasons"] == ""
    assert not out[1]["keep"] and "too_short" in out[1]["reasons"]
    assert not out[2]["keep"] and "no_stopwords" in out[2]["reasons"]


def test_pii_scrub_redacts_digits(spark, tmp_path):
    rows = [
        Row(event_id=1, user_id=1, event_type="x", value=1.0,
            props='{"k": 42, "card": "4111111111111111"}'),
        Row(event_id=2, user_id=1, event_type="x", value=1.0,
            props='{"k": "none here"}'),
    ]
    spark.createDataFrame(rows).withColumn(
        "ts", F.lit("2020-01-01 00:00:00").cast("timestamp")
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r["event_id"]: r for r in pii_scrub(spark, str(tmp_path)).collect()}
    assert out[1]["n_digit_runs"] == 2
    assert out[2]["n_digit_runs"] == 0
    # same props modulo digits ⇒ same redaction hash
    assert out[1]["redacted_md5"] != out[2]["redacted_md5"]
