"""Training-data curation flagship: the full document-curation pass as
ONE composed plan — quality scoring → language ID → exact dedup →
fingerprinting → filter.

This is the canonical 100 TB pre-training data pipeline shape: every
per-doc signal (quality, language, fingerprint) is a narrow projection
fused by Catalyst into the same scan; the only shuffle is the dedup
hash-group. Output = the curated corpus manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.functions.text import LANG_MARKERS, STOPWORDS, sql_stopword_list
from etl_jlp_spark.operators.textstats import (
    FINGERPRINT_K,
    FINGERPRINT_STRIDE,
    _LANGID_CASE_SQL,
    _LANGID_HITS_SQL,
)
from etl_jlp_spark.registry import query

MIN_QUALITY = 0.5  # curation threshold on the composite quality score


@query(
    "curate_documents",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM documents WHERE length(trim(text)) > 0
), per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN tok IN {sql_stopword_list()} THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
  FROM toks GROUP BY doc_id
), scored AS (
  SELECT d.doc_id, d.text,
         round(0.5 * (length(regexp_replace(d.text, '[^a-zA-Z]', '', 'g')) * 1.0 / length(d.text))
             + 0.3 * least(p.n_stop * 1.0 / p.n_tokens, 0.5) / 0.5
             + 0.2 * least(p.n_tokens, 100) / 100.0, 4) AS quality_score
  FROM documents d JOIN per_doc p ON d.doc_id = p.doc_id
), langs AS (
  SELECT doc_id,
       {_LANGID_HITS_SQL.replace("FROM documents", "FROM documents")}
  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks FROM documents)
), deduped AS (
  SELECT doc_id, md5(lower(trim(text))) AS text_hash,
         row_number() OVER (PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
  FROM documents
), fp AS (
  SELECT doc_id, min(md5(substr(t, CAST(i AS INTEGER), {FINGERPRINT_K}))) AS fingerprint
  FROM (
    SELECT doc_id, lower(text) AS t,
           unnest(range(1, greatest(length(text) - {FINGERPRINT_K} + 1, 1) + 1, {FINGERPRINT_STRIDE})) AS i
    FROM documents
  ) GROUP BY doc_id
)
SELECT s.doc_id,
       s.quality_score,
       {_LANGID_CASE_SQL} AS lang_pred,
       dd.text_hash,
       f.fingerprint
FROM scored s
JOIN langs l ON s.doc_id = l.doc_id
JOIN deduped dd ON s.doc_id = dd.doc_id
JOIN fp f ON s.doc_id = f.doc_id
WHERE s.quality_score >= {MIN_QUALITY} AND dd.rn = 1
""",
)
def curate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .repartition("doc_id")
    )

    # quality score (one explode-agg, same definition as text_quality_score)
    toks = docs.select("doc_id", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"))
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("tok").isin(*STOPWORDS), 1).otherwise(0)).cast("long").alias("n_stop"),
    )
    alpha_ratio = F.length(F.regexp_replace("text", "[^a-zA-Z]", "")) * 1.0 / F.length("text")
    stop_ratio = F.col("n_stop") * 1.0 / F.col("n_tokens")
    quality = F.round(
        0.5 * alpha_ratio
        + 0.3 * F.least(stop_ratio, F.lit(0.5)) / 0.5
        + 0.2 * F.least(F.col("n_tokens"), F.lit(100)) / 100.0,
        4,
    )

    # language ID (zero-shuffle array expressions, same as text_langid)
    langs = sorted(LANG_MARKERS)
    lang_hits = [
        F.expr(
            "size(filter(split(trim(lower(text)), '\\\\s+'), t -> t IN ("
            + ",".join(f"'{w}'" for w in LANG_MARKERS[lang])
            + ")))"
        ).alias(f"h_{lang}")
        for lang in langs
    ]
    pred = None
    for i, lang in enumerate(langs):
        cond = F.col(f"h_{lang}") > 0
        for other in langs[i + 1 :]:
            cond = cond & (F.col(f"h_{lang}") >= F.col(f"h_{other}"))
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    pred = pred.otherwise("unknown")

    # fingerprint (zero-shuffle array expression, same as doc_fingerprint)
    fingerprint = F.expr(
        f"array_min(transform(sequence(1, greatest(length(text) - {FINGERPRINT_K - 1}, 1), "
        f"{FINGERPRINT_STRIDE}), i -> md5(substr(lower(text), i, {FINGERPRINT_K}))))"
    )

    enriched = (
        docs.join(per_doc, "doc_id")
        .select(
            "doc_id",
            "text",
            quality.alias("quality_score"),
            *lang_hits,
            F.md5(F.lower(F.trim("text"))).alias("text_hash"),
            fingerprint.alias("fingerprint"),
        )
    )
    w = Window.partitionBy("text_hash").orderBy("doc_id")
    return (
        enriched.withColumn("rn", F.row_number().over(w))
        .filter((F.col("quality_score") >= MIN_QUALITY) & (F.col("rn") == 1))
        .select("doc_id", "quality_score", pred.alias("lang_pred"), "text_hash", "fingerprint")
    )


# ---------------------------------------------------------------------------
# Flagship 2: the full LLM training-data preparation pass
# ---------------------------------------------------------------------------

from etl_jlp_spark.operators.quality_rules import _stop_hits_sql  # noqa: E402
from etl_jlp_spark.operators.similarity import (  # noqa: E402
    _SHINGLES_CTE,
    DECON_BENCH_HEX,
    DECON_MIN_SHARED,
    _word_shingles,
    bench_shingle_set,
)


@query(
    "training_data_pipeline",
    oracle=f"""
WITH {_SHINGLES_CTE},
bench AS (
  SELECT DISTINCT sh FROM shingles
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{DECON_BENCH_HEX}'
), corpus0 AS (
  SELECT doc_id, text, source FROM documents
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '{DECON_BENCH_HEX}'
    AND length(trim(text)) > 0
), gated AS (
  SELECT doc_id, text, source, n_words FROM (
    SELECT doc_id, text, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           round(length(replace(text, ' ', '')) * 1.0
                 / len(string_split(text, ' ')), 4) AS mwl,
           CAST({_stop_hits_sql()} AS BIGINT) AS n_stop
    FROM corpus0)
  WHERE n_words >= 30 AND n_words <= 10000
    AND mwl >= 2.0 AND mwl <= 8.0 AND n_stop >= 2
), contaminated AS (
  SELECT s.doc_id FROM shingles s JOIN bench b ON s.sh = b.sh
  GROUP BY s.doc_id HAVING count(*) >= {DECON_MIN_SHARED}
), surviving AS (
  SELECT g.doc_id, g.source, g.n_words,
         row_number() OVER (PARTITION BY md5(lower(trim(g.text)))
                            ORDER BY g.doc_id) AS rn
  FROM gated g LEFT JOIN contaminated x ON g.doc_id = x.doc_id
  WHERE x.doc_id IS NULL
)
SELECT doc_id, source,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
            ELSE 'test' END AS split,
       n_words
FROM surviving WHERE rn = 1
""",
)
def training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship 2 — the complete LLM training-data preparation pass as
    ONE composed plan: Gopher quality gate → benchmark decontamination
    → exact dedup → train/val/test split. The output is the training
    manifest (doc, source, split, length).

    100 TB shape, stage by stage: the quality gate is a zero-shuffle
    projection fused into the scan; decontamination joins the gated
    corpus against a BROADCAST benchmark shingle set (bounded by eval
    size) and anti-joins the ≥{DECON_MIN_SHARED}-shared hits;
    exact dedup is the single hash-partitioned window; the split is an
    md5-threshold projection. One broadcast + two hash exchanges total,
    independent of corpus size; every gate drops rows BEFORE the next
    stage pays for them."""
    docs = load_table(spark, sf_dir, "documents")
    is_bench = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < DECON_BENCH_HEX
    corpus = docs.filter(~is_bench & (F.length(F.trim("text")) > 0)).repartition("doc_id")

    # Gopher gate (same rules as gopher_quality_filter): pure projection
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    n_words = F.size(F.split(F.col("text"), " ")).cast("long")
    mean_wl = F.round(F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) / n_words, 4)
    n_stop = sum(
        F.when(padded.contains(f" {w} "), 1).otherwise(0) for w in STOPWORDS
    ).cast("long")
    gated = (
        corpus.select(
            "doc_id", "text", "source",
            n_words.alias("n_words"), mean_wl.alias("mwl"), n_stop.alias("n_stop"),
        )
        .filter(
            (F.col("n_words") >= 30) & (F.col("n_words") <= 10000)
            & (F.col("mwl") >= 2.0) & (F.col("mwl") <= 8.0) & (F.col("n_stop") >= 2)
        )
        .drop("mwl", "n_stop")
    )

    # decontamination: broadcast bench shingles, anti-join contaminated
    contaminated = (
        _word_shingles(gated.select("doc_id", "text"))
        .join(F.broadcast(bench_shingle_set(docs)), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= DECON_MIN_SHARED)
        .select("doc_id")
    )
    clean = gated.join(contaminated, "doc_id", "left_anti")

    # exact dedup: first doc per normalized-text digest
    w = Window.partitionBy(F.md5(F.lower(F.trim("text")))).orderBy("doc_id")
    deduped = clean.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)

    # deterministic split assignment (same thresholds as dataset_split)
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = F.when(h < "e6", "train").when(h < "f3", "val").otherwise("test")
    return deduped.select("doc_id", "source", split.alias("split"), "n_words")
