"""Keyword extraction over the documents table.

Reference: add_exact_keywords_column + extract_keywords_from_visible_content
(dwh_lab/dwh/preprocessing_streaming_incremental_load.py:193-315) —
NLTK tokenize, stopword filter, n-grams, ``Counter`` top-10 per row, in
a Python loop. Spark-first form: split → explode → filter → groupBy
(doc, token) count → ranked window top-N. Everything JVM-side; the
shuffle is keyed on (doc_id, token) and partially aggregated map-side,
so at 100 TB the reduce stage carries only distinct (doc, token) pairs.

Tie-break is (count desc, token asc) — deterministic across engines and
partitionings (the reference's tie order was Counter insertion order, a
single-node artifact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.functions.text import filtered_tokens_df, sql_stopword_list
from etl_jlp_spark.registry import query

TOP_N = 5


def top_keywords(docs: DataFrame, n: int = TOP_N) -> DataFrame:
    toks = filtered_tokens_df(docs)
    counts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w = Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("tok").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= n)
        .select("doc_id", F.col("tok").alias("keyword"), "cnt", "rank")
    )


@query(
    "keywords_extract",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-zA-Z0-9_ -]', '', 'g')), '\\s+')) AS tok
  FROM documents
), filtered AS (
  SELECT doc_id, tok FROM toks
  WHERE length(tok) > 1 AND tok NOT IN {sql_stopword_list()}
), counts AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt
  FROM filtered GROUP BY doc_id, tok
)
SELECT doc_id, tok AS keyword, cnt,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, tok ASC) AS BIGINT) AS rank
FROM counts
QUALIFY rank <= {TOP_N}
""",
)
def keywords_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_keywords(load_table(spark, sf_dir, "documents"))
