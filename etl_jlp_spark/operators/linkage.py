"""Record linkage: edit-distance similarity join with prefix-filtered
candidate generation (Ed-Join style).

The reference platform deduplicates browsing history on EXACT column
equality (dwh_lab/dwh/preprocessing_streaming_incremental_load.py:60,
``remove_duplicates_browsing_history``); real crawled/user-entered keys
also need FUZZY matching — "the same title, give or take a few typos".
A naive edit-distance join is O(n²) levenshtein calls; at 100 TB that
is never an option. This module implements the published scalable
shape (Ed-Join, Xiao/Wang/Lin VLDB'08):

1. q-gram decomposition of each key (positional substrings, q=3);
2. a global document-frequency table over grams (groupBy — map-side
   partial agg, vocabulary-sized output);
3. **prefix filter**: each key probes the inverted index with only its
   ``K*Q + 1`` globally-rarest grams. Completeness: one edit operation
   destroys at most Q distinct grams of a key, so two keys within K
   edits still share at least one of the probe's ``K*Q + 1`` rarest
   grams with the other key's full gram set — every true pair survives
   candidate generation, which the DuckDB brute-force oracle verifies.
4. exact ``levenshtein`` verification on the candidates only, plus the
   free length filter (|len(a) − len(b)| ≤ K lower-bounds edit
   distance).

Scale shape: the probe side of the index join carries only rare grams
(bounded fan-out by construction — rarest-first ranking), the index
side is gram-keyed (high cardinality), and the verify step touches
candidate pairs only. No window over a skewed key, no cross join; the
per-doc rarest-gram ranking partitions by doc_id (high cardinality,
bounded per-doc state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table, widen
from etl_jlp_spark.registry import query

FUZZY_PFX_LEN = 40  # the linkage key: first chars of the document text
FUZZY_K = 3  # max edit distance
FUZZY_Q = 3  # q-gram width
FUZZY_SIG = FUZZY_K * FUZZY_Q + 1  # prefix-filter signature size


def _keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pfx): the fuzzy-match key. Keys shorter than Q have no
    grams and are excluded on BOTH sides (oracle mirrors this)."""
    docs = load_table(spark, sf_dir, "documents")
    keys = docs.select(
        "doc_id", F.substring("text", 1, FUZZY_PFX_LEN).alias("pfx")
    ).filter(F.length("pfx") >= FUZZY_Q)
    return widen(spark, keys, sf_dir, "documents", "doc_id")


def _doc_grams(keys: DataFrame) -> DataFrame:
    """(doc_id, g): the DISTINCT q-gram set of each key — set semantics
    keep the prefix-filter lemma tight and the oracle portable."""
    grams = F.array_distinct(
        F.expr(
            f"transform(sequence(1, length(pfx) - {FUZZY_Q - 1}),"
            f" i -> substring(pfx, i, {FUZZY_Q}))"
        )
    )
    return keys.select("doc_id", F.explode(grams).alias("g"))


@query(
    "fuzzy_join_editdist",
    oracle=f"""
WITH d AS (
  SELECT doc_id, substr(text, 1, {FUZZY_PFX_LEN}) AS pfx
  FROM documents
  WHERE length(substr(text, 1, {FUZZY_PFX_LEN})) >= {FUZZY_Q}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS dist
FROM d a JOIN d b
  ON a.doc_id < b.doc_id
 AND abs(length(a.pfx) - length(b.pfx)) <= {FUZZY_K}
 AND levenshtein(a.pfx, b.pfx) <= {FUZZY_K}
""",
)
def fuzzy_join_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs whose {FUZZY_PFX_LEN}-char text prefix is
    within edit distance K — typo-tolerant linkage of near-identical
    titles/keys. Candidates via the rare-gram prefix filter; exact
    levenshtein verifies (the oracle brute-forces the same join, so the
    hash match doubles as a completeness proof of the filter)."""
    keys = _keys(spark, sf_dir)
    dg = _doc_grams(keys)
    # gram document frequency: vocabulary-sized, map-side combinable
    df_tbl = dg.groupBy("g").agg(F.count(F.lit(1)).alias("gdf"))
    # per-key probe signature: its SIG globally-rarest grams
    w = Window.partitionBy("doc_id").orderBy("gdf", "g")
    sig = (
        dg.join(df_tbl, "g")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= FUZZY_SIG)
        .select(F.col("doc_id").alias("doc_a"), "g")
    )
    # probe (rare grams only) × full index; either direction suffices
    # for completeness, so canonicalize the pair after the join
    idx = dg.select(F.col("doc_id").alias("doc_b"), "g")
    cand = (
        sig.join(idx, "g")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
        )
        .distinct()
    )
    ka = keys.select(F.col("doc_id").alias("doc_a"), F.col("pfx").alias("pfx_a"))
    kb = keys.select(F.col("doc_id").alias("doc_b"), F.col("pfx").alias("pfx_b"))
    return (
        cand.join(ka, "doc_a")
        .join(kb, "doc_b")
        .filter(
            (F.abs(F.length("pfx_a") - F.length("pfx_b")) <= FUZZY_K)
            & (F.levenshtein("pfx_a", "pfx_b") <= FUZZY_K)
        )
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("pfx_a", "pfx_b").cast("bigint").alias("dist"),
        )
    )
