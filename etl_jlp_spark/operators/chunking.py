"""Document chunking and cross-document block-level deduplication.

Training pipelines slice documents into fixed-token windows before
packing (``sequence_packing``) and strip corpus-repeated boilerplate
blocks before training (the C4 "three-sentence span occurring more than
once" rule, Raffel et al. 2020, arXiv:1910.10683 §2.2). The reference
chunks at the IO layer only (``read_chunk_and_writle_dls``,
dwh_lab/dwh/general_lib.py:139-163 — row-count chunks for memory
bounds); these operators chunk on CONTENT.

Both operators are pure DataFrame plans: chunking is a zero-shuffle
narrow projection (array slice inside ``transform``); block dedup is
one explode + one hash-partitioned window + one re-agg — linear in
corpus tokens, two exchanges regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import query

CHUNK_W = 32  # words per chunk
CHUNK_STRIDE = 24  # chunk start stride (CHUNK_W - CHUNK_STRIDE words of overlap)
BLOCK_W = 16  # words per dedup block (non-overlapping)


@query(
    "doc_chunk",
    oracle=f"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents WHERE length(trim(text)) > 0
), s AS (
  SELECT doc_id, toks, unnest(range(1, len(toks) + 1, {CHUNK_STRIDE})) AS cs FROM d
)
SELECT doc_id,
       CAST((cs - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(cs AS BIGINT) AS chunk_start,
       CAST(len(toks[cs : cs + {CHUNK_W - 1}]) AS BIGINT) AS n_chunk_tokens,
       array_to_string(toks[cs : cs + {CHUNK_W - 1}], ' ') AS chunk_text
FROM s
""",
)
def doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: CHUNK_W-word windows every CHUNK_STRIDE
    words (trailing windows may be short). Entirely a narrow projection
    — the token array, the start sequence, and every slice are array
    expressions evaluated inside the scan stage; no shuffle at any
    corpus size. Chunk ids are derived from the start offset, so the
    operator is embarrassingly parallel and deterministic."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    out = (
        docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks"))
        .select("doc_id", "toks", F.explode(F.sequence(F.lit(1), F.size("toks"), F.lit(CHUNK_STRIDE))).alias("cs"))
        .select(
            "doc_id",
            ((F.col("cs") - 1) / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
            F.col("cs").cast("long").alias("chunk_start"),
            F.slice(F.col("toks"), F.col("cs"), F.lit(CHUNK_W)).alias("chunk"),
        )
    )
    return out.select(
        "doc_id",
        "chunk_idx",
        "chunk_start",
        F.size("chunk").cast("long").alias("n_chunk_tokens"),
        F.array_join("chunk", " ").alias("chunk_text"),
    )


@query(
    "paragraph_dedup",
    oracle=f"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents WHERE length(trim(text)) > 0
), b AS (
  SELECT doc_id, cs, array_to_string(toks[cs : cs + {BLOCK_W - 1}], ' ') AS block
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1, {BLOCK_W})) AS cs FROM d)
), r AS (
  SELECT doc_id, cs, block,
         row_number() OVER (PARTITION BY md5(lower(block)) ORDER BY doc_id, cs) AS rn
  FROM b
), reb AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(block, ' ' ORDER BY cs) AS clean_text
  FROM r WHERE rn = 1 GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(range(1, len(d.toks) + 1, {BLOCK_W})) AS BIGINT) AS n_blocks,
       coalesce(reb.n_kept, 0) AS n_kept,
       coalesce(reb.clean_text, '') AS clean_text
FROM d LEFT JOIN reb ON d.doc_id = reb.doc_id
""",
)
def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level repeated-block removal (the C4 rule re-expressed on
    word blocks, since this corpus has no sentence boundaries): split
    every doc into non-overlapping BLOCK_W-word blocks, keep only the
    FIRST occurrence (min (doc_id, start)) of each distinct block
    corpus-wide, and reassemble the surviving blocks in document order.

    100 TB shape: ONE table scan, one explode (corpus_tokens / BLOCK_W
    rows), one hash-partitioned window on the block digest (the dedup
    shuffle — carries md5 + block text once per block), one doc_id
    re-agg. No join: the re-agg sees every block (kept and dropped), so
    block totals, kept counts, and the reassembled text all come from
    the same pass, and fully-boilerplate documents naturally survive as
    empty rows (the downstream filter decides their fate, not this
    operator). Plan-asserted ≤3 exchanges (tests/test_plans.py)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    # repartition parallelizes the block fan-out off a 1-partition local
    # scan (a no-op on a many-split cluster scan)
    toks = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks")).repartition(
        "doc_id"
    )
    blocks = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("toks"), F.lit(BLOCK_W))).alias("cs"),
        F.col("toks"),
    ).select(
        "doc_id",
        "cs",
        F.array_join(F.slice(F.col("toks"), F.col("cs"), F.lit(BLOCK_W)), " ").alias("block"),
    )
    w = Window.partitionBy(F.md5(F.lower("block"))).orderBy("doc_id", "cs")
    marked = blocks.withColumn("rn", F.row_number().over(w))
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.array_join(
            F.expr(
                "transform(filter(array_sort(collect_list(struct(cs, block, rn))),"
                " x -> x.rn = 1), x -> x.block)"
            ),
            " ",
        ).alias("clean_text"),
    )
