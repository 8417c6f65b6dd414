"""Exact deduplication operators.

Reference: remove_duplicates_browsing_history
(dwh_lab/dwh/preprocessing_streaming_incremental_load.py:103-116) — a
driver-side ``seen``-set loop keeping the first occurrence in file
order. Distributed "first" must be deterministic, so we define it as
the row with the smallest id within each key group, implemented with a
``row_number`` window over the key partition — one hash shuffle on the
key, bounded state, no driver-side set.

``dedup_exact_docs`` is the same operator family applied to the
``documents`` table keyed on an md5 of normalized text: at 100 TB you
group on a 32-byte digest instead of the full document body, which
keeps shuffle volume proportional to #docs, not corpus bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import query


def dedup_first(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """Keep the first row per key under a deterministic ordering."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


@query(
    "dedup_exact",
    oracle="""
SELECT event_id, user_id, event_type, value, props, ts FROM (
  SELECT e.*, row_number() OVER (PARTITION BY user_id, event_type, props ORDER BY ts, event_id) AS rn
  FROM events e
) WHERE rn = 1
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return dedup_first(
        events, key_cols=["user_id", "event_type", "props"], order_cols=["ts", "event_id"]
    ).select("event_id", "user_id", "event_type", "value", "props", "ts")


@query(
    "dedup_exact_docs",
    oracle="""
SELECT md5(lower(trim(text))) AS text_hash,
       CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY md5(lower(trim(text)))
""",
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.lower(F.trim("text"))).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").cast("long").alias("keep_doc_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
    )


PREFIX_LEN = 120  # chars of normalized text that define a prefix group


@query(
    "dedup_prefix",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id,
         md5(substr(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, {PREFIX_LEN}))
           AS prefix_hash
  FROM documents
)
SELECT prefix_hash,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(max(doc_id) AS BIGINT) AS max_doc_id
FROM keyed
GROUP BY prefix_hash
HAVING count(*) > 1
""",
)
def dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-prefix duplicate groups: documents whose first
    PREFIX_LEN (120) whitespace-normalized characters agree — the
    crawl-artifact case (boilerplate headers, mirrored pages with
    divergent tails) that whole-text exact dedup misses and MinHash
    only catches when the tail is short. Same keep-min survivorship
    convention as dedup_exact_docs.

    Plan: one projection (normalize → md5 prefix key) + one
    combinable groupBy — the cheapest member of the dedup family, ∝
    #docs at any scale with a PREFIX_LEN-char bounded key."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(
            F.substring(
                F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), 1, PREFIX_LEN
            )
        ).alias("prefix_hash"),
    )
    return (
        keyed.groupBy("prefix_hash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("keep_doc_id"),
            F.max("doc_id").cast("long").alias("max_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )
