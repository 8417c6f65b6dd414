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
from etl_jlp_spark.functions.text import STOPWORDS, filtered_tokens_df, sql_stopword_list
from etl_jlp_spark.registry import query

TOP_N = 5


def top_keywords(docs: DataFrame, n: int = TOP_N) -> DataFrame:
    # spread before the explode: a single-file source otherwise serializes
    # the tokenize+explode fan-out on one task
    toks = filtered_tokens_df(docs.repartition("doc_id"))
    counts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w = Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("tok").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= n)
        .select("doc_id", F.col("tok").alias("keyword"), "cnt", "rank")
    )


def ngram_col(n: int) -> str:
    """SQL fragment: word n-grams from the filtered token array."""
    return (
        f"transform(sequence(0, size(toks) - {n}), j -> concat_ws(' ', slice(toks, j + 1, {n})))"
    )


@query(
    "keywords_ngrams",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS pos
  FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-zA-Z0-9_ -]', '', 'g')), '\\s+')) AS tok,
           generate_subscripts(regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-zA-Z0-9_ -]', '', 'g')), '\\s+'), 1) AS pos
    FROM documents
  )
  WHERE length(tok) > 1 AND tok NOT IN {sql_stopword_list()}
), grams AS (
  SELECT doc_id, tok AS gram, 1 AS n FROM toks
  UNION ALL
  SELECT a.doc_id, a.tok || ' ' || b.tok, 2
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  UNION ALL
  SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok, 3
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
              JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
), counts AS (
  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cnt
  FROM grams GROUP BY doc_id, gram
)
SELECT doc_id, gram AS keyword, cnt,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, length(gram) DESC, gram ASC) AS BIGINT) AS rank
FROM counts
QUALIFY rank <= {TOP_N * 2}
""",
)
def keywords_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reference semantics: uni + bi + tri-gram keywords ranked by
    (freq desc, length desc) — reference
    extract_keywords_from_visible_content (preprocessing_streaming_
    incremental_load.py:193-222) including its n-gram Counter ranking,
    with a deterministic final tie-break (gram asc) replacing Counter
    insertion order. The n-gram generation happens inside one array
    expression per doc (filter → sequential-position slices): a narrow
    map, then one (doc, gram) count shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    # filtered token array per doc, order preserved (reference filters
    # stopwords BEFORE forming n-grams)
    toks_arr = F.expr(
        "filter(split(trim(regexp_replace(lower(text), '[^a-zA-Z0-9_ -]', '')), '\\\\s+'), "
        "t -> length(t) > 1 AND NOT array_contains(__stops, t))"
    )
    base = (
        docs.withColumn("__stops", F.lit(list(STOPWORDS)).cast("array<string>"))
        .select("doc_id", toks_arr.alias("toks"))
        # exchange = optimization barrier: the (expensive) token-filter
        # array is materialized ONCE per row before the gram expressions
        # reference it 5× (projection collapse would otherwise inline and
        # re-evaluate it); also balances the explode fan-out across the
        # cluster when the source is a single file/partition
        .repartition("doc_id")
    )
    # all three gram orders concatenated into ONE array → one scan, one
    # explode (a union of per-n branches would re-scan the table 3×)
    def guarded(n: int) -> str:
        return f"CASE WHEN size(toks) >= {n} THEN {ngram_col(n)} ELSE array() END"

    grams = base.select(
        "doc_id",
        F.explode(
            F.expr(f"concat(toks, {guarded(2)}, {guarded(3)})")
        ).alias("gram"),
    )
    counts = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("cnt").desc(), F.length("gram").desc(), F.col("gram").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_N * 2)
        .select("doc_id", F.col("gram").alias("keyword"), "cnt", "rank")
    )


@query(
    "exact_keywords_set",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-zA-Z0-9_ -]', '', 'g')), '\\s+')) AS tok
  FROM documents
), filtered AS (
  SELECT DISTINCT doc_id, tok FROM toks
  WHERE length(tok) > 1 AND tok NOT IN {sql_stopword_list()}
)
SELECT d.doc_id,
       coalesce(f.kw, '') AS exact_keywords,
       CAST(coalesce(f.n, 0) AS BIGINT) AS n_keywords
FROM documents d LEFT JOIN (
  SELECT doc_id, string_agg(tok, '|' ORDER BY tok) AS kw, count(*) AS n
  FROM filtered GROUP BY doc_id
) f ON d.doc_id = f.doc_id
""",
)
def exact_keywords_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference add_exact_keywords_column output shape
    (preprocessing_streaming_incremental_load.py:230-315): the DISTINCT
    keyword set per row. Serialized as a '|'-joined sorted string so the
    set compares engine-independently (array value formatting differs
    between engines)."""
    docs = load_table(spark, sf_dir, "documents")
    kw = (
        filtered_tokens_df(docs.repartition("doc_id"))
        .distinct()
        .groupBy("doc_id")
        .agg(
            F.concat_ws("|", F.sort_array(F.collect_set("tok"))).alias("kw"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    return docs.join(kw, "doc_id", "left").select(
        "doc_id",
        F.coalesce("kw", F.lit("")).alias("exact_keywords"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_keywords"),
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
