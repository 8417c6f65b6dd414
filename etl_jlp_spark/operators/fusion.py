"""Rank fusion and graded ranking evaluation for the retrieval layer.

The IR module (operators/ir.py) serves lexical BM25; the similarity
module serves embedding ANN; production retrieval stacks combine
rankers and must EVALUATE the combination. This module adds both
halves: reciprocal-rank fusion (the standard zero-tuning list merger,
Cormack et al. SIGIR'09) and nDCG@k (the graded complement to
ann_recall_report's binary recall — recall says "did the right ids
come back", nDCG says "in a useful order, weighted by how good each
neighbor actually is").

Exactness: every rank is an integer assigned with explicit
(rounded-score, id) tie-breaks, so RRF scores — sums of 1/(C+rank) —
are identical IEEE doubles in both engines; nDCG gains come from the
4-decimal cosine values both engines already agree on, and the ≤k-term
discounted sums round at 6 digits (the PageRank-oracle noise
contract).

Scale: both operators consume the ALREADY-BOUNDED outputs of their
constituent queries (top-k per query / top-k lists), so fusion and
evaluation cost is queries × k — never a corpus scan beyond what the
constituents themselves do. The oracles embed the constituent oracles
verbatim (the quality_score_pr_curve pattern), so the fused report can
never drift from what actually serves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.operators.ir import bm25_search
from etl_jlp_spark.operators.similarity import ann_lsh_topk, ann_topk_cosine
from etl_jlp_spark.operators.textstats import text_quality_score
from etl_jlp_spark.registry import ORACLES, query

RRF_C = 60  # the canonical reciprocal-rank-fusion constant
RRF_LIST_K = 20  # depth of each input list
RRF_TOP_K = 20
NDCG_ROUND = 6


def _rrf_oracle() -> str:
    bm25_sql = ORACLES["bm25_search"]
    score_sql = ORACLES["text_quality_score"]
    return f"""
WITH bm AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS r_bm25
  FROM ({bm25_sql})
), q AS (
  SELECT doc_id,
         CAST(row_number() OVER (
           ORDER BY CAST(round(quality_score * 10000) AS BIGINT) DESC, doc_id
         ) AS BIGINT) AS r_q
  FROM ({score_sql})
  ORDER BY CAST(round(quality_score * 10000) AS BIGINT) DESC, doc_id
  LIMIT {RRF_LIST_K}
), fused AS (
  SELECT COALESCE(bm.doc_id, q.doc_id) AS doc_id,
         COALESCE(bm.r_bm25, 0) AS bm25_rank,
         COALESCE(q.r_q, 0) AS quality_rank,
         (CASE WHEN bm.doc_id IS NULL THEN 0.0
               ELSE 1.0 / ({RRF_C} + bm.r_bm25) END
          + CASE WHEN q.doc_id IS NULL THEN 0.0
                 ELSE 1.0 / ({RRF_C} + q.r_q) END) AS rrf
  FROM bm FULL OUTER JOIN q ON bm.doc_id = q.doc_id
), top AS (
  SELECT * FROM fused ORDER BY rrf DESC, doc_id LIMIT {RRF_TOP_K}
)
SELECT doc_id, bm25_rank, quality_rank, round(rrf, 6) + 0.0 AS rrf_score,
       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rk
FROM top
"""


@query("rrf_fusion_topk", oracle=_rrf_oracle())
def rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the BM25 relevance list and the
    quality-score list: rrf(d) = Σ_lists 1/({c} + rank_list(d)), the
    untrained list merger that reliably beats either list alone —
    here fusing "matches the query" with "is a good document", the
    standard retrieve-then-prefer-quality serving shape. A doc absent
    from a list contributes nothing (rank reported as 0).

    Determinism: ranks are integers with (rounded-score, doc_id)
    tie-breaks, so rrf scores are exact-rational sums — both engines
    select the identical top-{k}. Cost: both inputs are already
    top-{lk} lists; fusion is a {lk}-vs-{lk} full outer join."""
    bm = bm25_search(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .cast("long")
        .alias("r_bm25"),
    )
    qlist = (
        text_quality_score(spark, sf_dir)
        .select("doc_id", F.round(F.col("quality_score") * 10000).cast("long").alias("s_e4"))
        .orderBy(F.desc("s_e4"), F.asc("doc_id"))
        .limit(RRF_LIST_K)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("s_e4"), F.asc("doc_id")))
            .cast("long")
            .alias("r_q"),
        )
    )
    fused = (
        bm.join(qlist, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("r_bm25", F.lit(0)).cast("long").alias("bm25_rank"),
            F.coalesce("r_q", F.lit(0)).cast("long").alias("quality_rank"),
            (
                F.when(F.col("r_bm25").isNull(), F.lit(0.0)).otherwise(
                    1.0 / (RRF_C + F.col("r_bm25"))
                )
                + F.when(F.col("r_q").isNull(), F.lit(0.0)).otherwise(
                    1.0 / (RRF_C + F.col("r_q"))
                )
            ).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(RRF_TOP_K)
    )
    return fused.select(
        "doc_id",
        "bm25_rank",
        "quality_rank",
        F.round("rrf", 6).alias("rrf_score"),
        F.row_number()
        .over(Window.orderBy(F.desc("rrf"), F.asc("doc_id")))
        .cast("long")
        .alias("rk"),
    )


rrf_fusion_topk.__doc__ = (rrf_fusion_topk.__doc__ or "").format(
    c=RRF_C, k=RRF_TOP_K, lk=RRF_LIST_K
)


def _ndcg_oracle() -> str:
    exact_sql = ORACLES["ann_topk_cosine"]
    approx_sql = ORACLES["ann_lsh_topk"]
    return f"""
WITH exact AS (
  SELECT query_id, (cos_sim + 1) / 2 AS rel, rank FROM ({exact_sql})
), approx AS (
  SELECT query_id, (cos_sim + 1) / 2 AS rel, rank FROM ({approx_sql})
), idcg AS (
  SELECT query_id, sum(rel / log2(rank + 1)) AS idcg,
         CAST(count(*) AS BIGINT) AS n_exact
  FROM exact GROUP BY 1
), dcg AS (
  SELECT query_id, sum(rel / log2(rank + 1)) AS dcg,
         CAST(count(*) AS BIGINT) AS n_approx
  FROM approx GROUP BY 1
)
SELECT i.query_id,
       COALESCE(d.n_approx, 0) AS n_approx,
       round(COALESCE(d.dcg, 0.0), {NDCG_ROUND}) + 0.0 AS dcg,
       round(i.idcg, {NDCG_ROUND}) + 0.0 AS idcg,
       round(COALESCE(d.dcg, 0.0) / i.idcg, {NDCG_ROUND}) + 0.0 AS ndcg
FROM idcg i LEFT JOIN dcg d ON i.query_id = d.query_id
"""


@query("ann_ndcg_eval", oracle=_ndcg_oracle())
def ann_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@k of the LSH ANN serving path against the exact
    brute-force ranking, per query: gain = (cosine+1)/2 of each
    retrieved neighbor, discount = 1/log2(rank+1); IDCG is the exact
    list's DCG (the best achievable at this k). Complements
    ann_recall_report: recall counts set overlap, nDCG penalizes the
    approximate index for returning the right neighbors in a worse
    order or trading a 0.95-cosine neighbor for a 0.60 one.

    Cost: both sides are the constituent top-k queries (oracles
    embedded verbatim); the eval itself is two queries×k aggs and one
    join — bounded by the query set, never the corpus."""
    rel = lambda df: (F.col("cos_sim") + 1) / 2  # noqa: E731
    exact = ann_topk_cosine(spark, sf_dir).select(
        "query_id", rel(None).alias("rel"), "rank"
    )
    approx = ann_lsh_topk(spark, sf_dir).select(
        "query_id", rel(None).alias("rel"), "rank"
    )
    disc = lambda: F.col("rel") / F.log2(F.col("rank") + 1)  # noqa: E731
    idcg = exact.groupBy("query_id").agg(
        F.sum(disc()).alias("idcg"), F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    dcg = approx.groupBy("query_id").agg(
        F.sum(disc()).alias("dcg"), F.count(F.lit(1)).cast("long").alias("n_approx")
    )
    return idcg.join(dcg, "query_id", "left").select(
        "query_id",
        F.coalesce("n_approx", F.lit(0)).cast("long").alias("n_approx"),
        F.round(F.coalesce("dcg", F.lit(0.0)), NDCG_ROUND).alias("dcg"),
        F.round("idcg", NDCG_ROUND).alias("idcg"),
        F.round(F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"), NDCG_ROUND).alias("ndcg"),
    )


# ---------------------------------------------------------------------------
# Pseudo-relevance-feedback query expansion (Rocchio-lite).
# ---------------------------------------------------------------------------

PRF_SEED_K = 10  # pseudo-relevant docs taken from the BM25 top
PRF_TOP_TERMS = 15
PRF_MIN_LEN = 3


def _prf_oracle() -> str:
    from etl_jlp_spark.operators.ir import BM25_QUERY_TERMS, WORD_PATTERN

    bm25_sql = ORACLES["bm25_search"]
    qterms = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    return f"""
WITH seed AS (
  SELECT doc_id FROM ({bm25_sql}) ORDER BY bm25 DESC, doc_id LIMIT {PRF_SEED_K}
), toks AS (
  SELECT d.doc_id, unnest(regexp_extract_all(lower(d.text), '{WORD_PATTERN}')) AS term
  FROM documents d
), nn AS (
  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM toks
), df AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY 1
), cand AS (
  SELECT t.term, CAST(count(*) AS BIGINT) AS tf_seed,
         CAST(count(DISTINCT t.doc_id) AS BIGINT) AS df_seed
  FROM toks t JOIN seed s ON t.doc_id = s.doc_id
  WHERE length(t.term) >= {PRF_MIN_LEN} AND t.term NOT IN ({qterms})
  GROUP BY 1
), scored AS (
  SELECT c.term, c.tf_seed, c.df_seed, d.df,
         CAST(c.tf_seed AS DOUBLE) * ln(CAST((SELECT n_docs FROM nn) AS DOUBLE) / d.df)
           AS score
  FROM cand c JOIN df d ON c.term = d.term
), top AS (
  SELECT * FROM scored ORDER BY round(score, 9) DESC, term LIMIT {PRF_TOP_TERMS}
)
SELECT term, tf_seed, df_seed, df, round(score, 6) + 0.0 AS prf_score,
       CAST(row_number() OVER (ORDER BY round(score, 9) DESC, term) AS BIGINT) AS rk
FROM top
"""


@query("prf_expansion_terms", oracle=_prf_oracle())
def prf_expansion_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback expansion: take the BM25 top-{k} docs
    as pseudo-relevant, score every candidate term by tf-in-seed ×
    ln(N/df) (the Rocchio positive-centroid weight on a tf-idf space),
    return the top {t} non-query terms — what a second-pass retrieval
    would OR into the query. High tf_seed + low corpus df = the
    topical vocabulary of the result set.

    Cost: the seed list is k rows; candidate tf comes from
    re-tokenizing ONLY the seed docs (semi-join pushes the doc filter
    before the explode), and df is the vocab-sized aggregate every IR
    op here shares. Selection orders by round(score, 9) with term
    tie-breaks — identical top set in both engines."""
    from etl_jlp_spark.operators.ir import BM25_QUERY_TERMS, WORD_PATTERN

    docs = load_table(spark, sf_dir, "documents")
    seed = (
        bm25_search(spark, sf_dir)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(PRF_SEED_K)
        .select("doc_id")
    )
    toks = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower("text"), F.lit(WORD_PATTERN), 0)).alias(
            "term"
        ),
    )
    # lazy scalar (the oracle's subquery): an eager distinct().count()
    # here would run the full corpus tokenize at plan-construction time
    nd = toks.select("doc_id").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    df_rel = toks.distinct().groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    cand = (
        toks.join(F.broadcast(seed), "doc_id")
        .filter(
            (F.length("term") >= PRF_MIN_LEN) & (~F.col("term").isin(*BM25_QUERY_TERMS))
        )
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf_seed"),
            F.countDistinct("doc_id").cast("long").alias("df_seed"),
        )
    )
    scored = cand.join(df_rel, "term").crossJoin(F.broadcast(nd)).select(
        "term",
        "tf_seed",
        "df_seed",
        "df",
        (F.col("tf_seed").cast("double") * F.log(F.col("n_docs") / F.col("df"))).alias(
            "score"
        ),
    )
    top = scored.orderBy(F.round("score", 9).desc(), "term").limit(PRF_TOP_TERMS)
    return top.select(
        "term",
        "tf_seed",
        "df_seed",
        "df",
        F.round("score", 6).alias("prf_score"),
        F.row_number()
        .over(Window.orderBy(F.round("score", 9).desc(), "term"))
        .cast("long")
        .alias("rk"),
    )


prf_expansion_terms.__doc__ = (prf_expansion_terms.__doc__ or "").format(
    k=PRF_SEED_K, t=PRF_TOP_TERMS
)


# ---------------------------------------------------------------------------
# KWIC (keyword-in-context) snippets for the BM25 result list.
# ---------------------------------------------------------------------------

KWIC_WINDOW = 40  # chars either side of the first occurrence


def _kwic_oracle() -> str:
    from etl_jlp_spark.operators.ir import BM25_QUERY_TERMS

    bm25_sql = ORACLES["bm25_search"]
    terms = ", ".join(f"('{t}')" for t in BM25_QUERY_TERMS)
    return f"""
WITH hits AS (
  SELECT doc_id FROM ({bm25_sql})
), t AS (SELECT term FROM (VALUES {terms}) v(term)),
located AS (
  SELECT h.doc_id, t.term,
         CAST(strpos(lower(d.text), t.term) AS BIGINT) AS pos,
         lower(d.text) AS lt
  FROM hits h JOIN documents d ON d.doc_id = h.doc_id CROSS JOIN t
)
SELECT doc_id, term, pos,
       substr(lt, CAST(greatest(1, pos - {KWIC_WINDOW}) AS BIGINT),
              CAST(pos - greatest(1, pos - {KWIC_WINDOW}) + length(term)
                   + {KWIC_WINDOW} AS BIGINT)) AS snippet
FROM located WHERE pos > 0
"""


@query("kwic_snippets", oracle=_kwic_oracle())
def kwic_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context: for every BM25 result doc and every query
    term, the first occurrence position and a ±{w}-char window around
    it — what a search UI renders under each hit, and the quickest
    human check that the ranker matched for the right reason.

    Plan: the hit list is the bounded BM25 top-k; snippet extraction
    is a pure string projection over ONLY those docs (semi-join pushes
    the id filter ahead of reading text) — zero shuffles beyond the
    constituent query."""
    from etl_jlp_spark.operators.ir import BM25_QUERY_TERMS

    docs = load_table(spark, sf_dir, "documents")
    hits = bm25_search(spark, sf_dir).select("doc_id")
    t = spark.createDataFrame([(x,) for x in BM25_QUERY_TERMS], "term string")
    located = (
        docs.join(F.broadcast(hits), "doc_id")
        .crossJoin(F.broadcast(t))
        .select(
            "doc_id",
            "term",
            F.instr(F.lower("text"), F.col("term")).cast("long").alias("pos"),
            F.lower("text").alias("lt"),
        )
        .filter(F.col("pos") > 0)
    )
    return located.select(
        "doc_id",
        "term",
        "pos",
        F.expr(
            f"substr(lt, cast(greatest(1, pos - {KWIC_WINDOW}) as int), "
            f"cast(pos - greatest(1, pos - {KWIC_WINDOW}) + length(term) + {KWIC_WINDOW} as int))"
        ).alias("snippet"),
    )


kwic_snippets.__doc__ = (kwic_snippets.__doc__ or "").format(w=KWIC_WINDOW)
