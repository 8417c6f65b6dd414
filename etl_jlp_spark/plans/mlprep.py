"""Feature-prep / model-triage analytics: decision-stump split search,
score lift deciles, and cross-signal correlation between the two
quality scorers.

Reference tie-in: the reference ends at aggregate reporting
(dwh_lab/dwh/quality_report.py); the first questions a modeling team
asks of the same warehouse — "which single feature split separates
converters", "how much does the top score decile capture", "do my two
quality signals even agree" — become these queries.

Exactness: all estimator inputs are exact integer counts / e4-scaled
scores; Gini, lift and Pearson r are closed-form double expressions
from identical operands (plans/regression.py contract).

Scale shapes:
- gini_split_finder: one fact scan → a ≤31-cell (feature, value) grid;
  the threshold sweep is window cumsums OVER THE GRID, so candidate
  splits cost nothing extra — the CART-root pattern that actually
  works at 100 TB (never a per-threshold re-scan).
- score_lift_deciles: decile boundaries come from the bounded e4
  histogram CDF (the quantile_normalize_scores trick) — no global
  sort; ties take their value's last-member decile, deterministically.
- lm_quality_correlation: both per-doc scorers are single-pass
  relations (oracles embedded verbatim); the correlation is one
  per-source agg of DECIMAL(38,0) cross-moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import ORACLES, query

GINI_LABEL = "purchase"
GINI_ROUND = 6
LIFT_DECILES = 10
CORR_ROUND = 6


@query(
    "gini_split_finder",
    oracle=f"""
WITH pts AS (
  SELECT CAST(hour(ts) AS BIGINT) AS hour,
         CAST(isodow(ts) - 1 AS BIGINT) AS weekday,
         CAST(event_type = '{GINI_LABEL}' AS INTEGER) AS y
  FROM events
), grid AS (
  SELECT 'hour' AS feature, hour AS fv,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
  FROM pts GROUP BY 2
  UNION ALL
  SELECT 'weekday', weekday, CAST(count(*) AS BIGINT), CAST(sum(y) AS BIGINT)
  FROM pts GROUP BY 2
), cum AS (
  SELECT feature, fv,
         CAST(sum(n) OVER w AS BIGINT) AS nl,
         CAST(sum(pos) OVER w AS BIGINT) AS posl,
         CAST(sum(n) OVER (PARTITION BY feature) AS BIGINT) AS nt,
         CAST(sum(pos) OVER (PARTITION BY feature) AS BIGINT) AS post,
         CAST(max(fv) OVER (PARTITION BY feature) AS BIGINT) AS fmax
  FROM grid
  WINDOW w AS (PARTITION BY feature ORDER BY fv)
), scored AS (
  SELECT feature, fv AS threshold, nl AS n_left, posl AS pos_left,
         (CAST(nl AS DOUBLE) / nt)
           * (1 - (CAST(posl AS DOUBLE) / nl) * (CAST(posl AS DOUBLE) / nl)
                - (CAST(nl - posl AS DOUBLE) / nl) * (CAST(nl - posl AS DOUBLE) / nl))
         + (CAST(nt - nl AS DOUBLE) / nt)
           * (1 - (CAST(post - posl AS DOUBLE) / (nt - nl))
                  * (CAST(post - posl AS DOUBLE) / (nt - nl))
                - (CAST((nt - nl) - (post - posl) AS DOUBLE) / (nt - nl))
                  * (CAST((nt - nl) - (post - posl) AS DOUBLE) / (nt - nl))) AS gini
  FROM cum WHERE fv < fmax
)
SELECT feature, threshold, n_left, pos_left,
       round(gini, {GINI_ROUND}) + 0.0 AS gini_split,
       CAST(row_number() OVER (ORDER BY round(gini, 9), feature, threshold) AS BIGINT)
         AS rk
FROM scored
""",
)
def gini_split_finder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump search: for every binary split "feature ≤ t"
    over hour-of-day and weekday, the weighted Gini impurity of the
    {label}-vs-rest labels; rk=1 is the CART root split. The whole
    threshold sweep runs as window cumsums over the ≤31-cell
    (feature, value) grid — ONE fact scan regardless of how many
    candidate splits exist (the grid-sweep shape shared with
    quality_score_pr_curve).

    Exact: left/right counts are integers; Gini is the same double
    expression in both engines; ranking orders by round(gini, 9) with
    (feature, threshold) tie-breaks so the order is identical."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        F.hour("ts").cast("long").alias("hour"),
        F.weekday("ts").cast("long").alias("weekday"),
        (F.col("event_type") == GINI_LABEL).cast("integer").alias("y"),
    )
    grids = []
    for feat in ("hour", "weekday"):
        grids.append(
            pts.groupBy(F.col(feat).alias("fv")).agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("y").cast("long").alias("pos"),
            ).select(F.lit(feat).alias("feature"), "fv", "n", "pos")
        )
    grid = grids[0].unionAll(grids[1])
    wf = Window.partitionBy("feature")
    w = wf.orderBy("fv")
    cum = grid.select(
        "feature",
        "fv",
        F.sum("n").over(w).cast("long").alias("nl"),
        F.sum("pos").over(w).cast("long").alias("posl"),
        F.sum("n").over(wf).cast("long").alias("nt"),
        F.sum("pos").over(wf).cast("long").alias("post"),
        F.max("fv").over(wf).cast("long").alias("fmax"),
    ).filter(F.col("fv") < F.col("fmax"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    pl, nl = d("posl"), d("nl")
    pr = (F.col("post") - F.col("posl")).cast("double")
    nr = (F.col("nt") - F.col("nl")).cast("double")
    gini = (nl / d("nt")) * (1 - (pl / nl) * (pl / nl) - ((nl - pl) / nl) * ((nl - pl) / nl)) + (
        nr / d("nt")
    ) * (1 - (pr / nr) * (pr / nr) - ((nr - pr) / nr) * ((nr - pr) / nr))
    scored = cum.select(
        "feature",
        F.col("fv").alias("threshold"),
        F.col("nl").alias("n_left"),
        F.col("posl").alias("pos_left"),
        gini.alias("gini"),
    )
    return scored.select(
        "feature",
        "threshold",
        "n_left",
        "pos_left",
        F.round("gini", GINI_ROUND).alias("gini_split"),
        F.row_number()
        .over(Window.orderBy(F.round("gini", 9), "feature", "threshold"))
        .cast("long")
        .alias("rk"),
    )


gini_split_finder.__doc__ = (gini_split_finder.__doc__ or "").format(label=GINI_LABEL)


def _lift_oracle() -> str:
    score_sql = ORACLES["text_quality_score"]
    gopher_sql = ORACLES["gopher_quality_filter"]
    return f"""
WITH score AS ({score_sql}), gopher AS ({gopher_sql}),
joined AS (
  SELECT CAST(round(s.quality_score * 10000) AS BIGINT) AS s_e4,
         CAST(g.keep AS INTEGER) AS kept
  FROM score s JOIN gopher g ON s.doc_id = g.doc_id
), hist AS (
  SELECT s_e4, CAST(count(*) AS BIGINT) AS n, CAST(sum(kept) AS BIGINT) AS k
  FROM joined GROUP BY 1
), cdf AS (
  SELECT s_e4, n, k,
         CAST(sum(n) OVER (ORDER BY s_e4 DESC) AS BIGINT) AS cum_n,
         CAST(sum(n) OVER () AS BIGINT) AS nt,
         CAST(sum(k) OVER () AS BIGINT) AS kt
  FROM hist
), binned AS (
  SELECT ((cum_n * {LIFT_DECILES} + nt - 1) // nt) AS decile,
         CAST(sum(n) AS BIGINT) AS n_docs, CAST(sum(k) AS BIGINT) AS n_keep,
         max(nt) AS nt, max(kt) AS kt
  FROM cdf GROUP BY 1
), cum2 AS (
  SELECT decile, n_docs, n_keep, nt, kt,
         CAST(sum(n_docs) OVER (ORDER BY decile) AS BIGINT) AS cum_docs,
         CAST(sum(n_keep) OVER (ORDER BY decile) AS BIGINT) AS cum_keep
  FROM binned
)
SELECT decile, n_docs, n_keep,
       round(CAST(cum_keep AS DOUBLE) / kt, 4) + 0.0 AS cum_capture,
       round((CAST(cum_keep AS DOUBLE) / cum_docs) / (CAST(kt AS DOUBLE) / nt), 4)
         + 0.0 AS lift
FROM cum2
"""


@query("score_lift_deciles", oracle=_lift_oracle())
def score_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains/lift table of text_quality_score against the gopher keep
    verdict: docs bucketed into score deciles FROM THE TOP (decile 1 =
    highest scores), per-decile keep counts, cumulative capture rate
    (what share of all keeps the top-k deciles hold) and lift vs the
    base rate — the "is the score worth ranking by" one-pager next to
    the PR curve (threshold view) and calibration (probability view).

    Scale: decile boundaries come from the bounded e4-score histogram
    CDF (ties inherit their value's last-member decile — deterministic
    without a global sort); everything else is integer sums."""
    from etl_jlp_spark.operators.quality_rules import gopher_quality_filter
    from etl_jlp_spark.operators.textstats import text_quality_score

    score = text_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    keep = gopher_quality_filter(spark, sf_dir).select("doc_id", "keep")
    joined = score.join(keep, "doc_id").select(
        F.round(F.col("quality_score") * 10000).cast("long").alias("s_e4"),
        F.col("keep").cast("integer").alias("kept"),
    )
    hist = joined.groupBy("s_e4").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("kept").cast("long").alias("k")
    )
    wdesc = Window.orderBy(F.desc("s_e4"))
    wall = Window.partitionBy()
    cdf = hist.select(
        "n",
        "k",
        F.sum("n").over(wdesc).cast("long").alias("cum_n"),
        F.sum("n").over(wall).cast("long").alias("nt"),
        F.sum("k").over(wall).cast("long").alias("kt"),
    )
    binned = (
        cdf.groupBy(F.expr(f"(cum_n * {LIFT_DECILES} + nt - 1) div nt").alias("decile"))
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.sum("k").cast("long").alias("n_keep"),
            F.max("nt").alias("nt"),
            F.max("kt").alias("kt"),
        )
    )
    wcum = Window.orderBy("decile")
    cum2 = binned.select(
        "decile",
        "n_docs",
        "n_keep",
        "nt",
        "kt",
        F.sum("n_docs").over(wcum).cast("long").alias("cum_docs"),
        F.sum("n_keep").over(wcum).cast("long").alias("cum_keep"),
    )
    return cum2.select(
        "decile",
        "n_docs",
        "n_keep",
        F.round(F.col("cum_keep").cast("double") / F.col("kt"), 4).alias("cum_capture"),
        F.round(
            (F.col("cum_keep").cast("double") / F.col("cum_docs"))
            / (F.col("kt").cast("double") / F.col("nt")),
            4,
        ).alias("lift"),
    )


def _corr_oracle() -> str:
    lm_sql = ORACLES["bigram_lm_score"]
    score_sql = ORACLES["text_quality_score"]
    return f"""
WITH lm AS ({lm_sql}), score AS ({score_sql}),
pts AS (
  SELECT d.source,
         CAST(round(l.avg_logprob * 10000) AS BIGINT) AS x,
         CAST(round(s.quality_score * 10000) AS BIGINT) AS y
  FROM lm l JOIN score s ON l.doc_id = s.doc_id
  JOIN documents d ON d.doc_id = l.doc_id
), s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
         CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy,
         CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy
  FROM pts GROUP BY 1
)
SELECT source, n AS n_docs,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
             {CORR_ROUND}) + 0.0 AS pearson_r
FROM s
"""


@query("lm_quality_correlation", oracle=_corr_oracle())
def lm_quality_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Pearson correlation between the bigram-LM fluency
    score (avg_logprob) and the heuristic quality score — the
    do-my-signals-agree diagnostic before combining them in a curation
    gate: a source where the two DISAGREE (r ≈ 0 or negative) needs a
    human look before any composite threshold is trusted.

    Exact: both scores are 4-decimal values, so the e4-scaled
    cross-moments are DECIMAL(38,0)-exact; r is one closed-form double
    expression per source. Both per-doc relations are single-pass
    (oracles embedded verbatim); the join key is doc_id."""
    from etl_jlp_spark.operators.ir import bigram_lm_score
    from etl_jlp_spark.operators.textstats import text_quality_score

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    pts = (
        bigram_lm_score(spark, sf_dir)
        .select("doc_id", F.round(F.col("avg_logprob") * 10000).cast("long").alias("x"))
        .join(
            text_quality_score(spark, sf_dir).select(
                "doc_id", F.round(F.col("quality_score") * 10000).cast("long").alias("y")
            ),
            "doc_id",
        )
        .join(docs, "doc_id")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = pts.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(dec("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(dec("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(dec("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return s.select(
        "source",
        F.col("n").alias("n_docs"),
        F.round(
            (d("n") * d("sxy") - d("sx") * d("sy"))
            / F.sqrt(
                (d("n") * d("sxx") - d("sx") * d("sx"))
                * (d("n") * d("syy") - d("sy") * d("sy"))
            ),
            CORR_ROUND,
        ).alias("pearson_r"),
    )


# ---------------------------------------------------------------------------
# Weight-of-evidence / information value — the credit-scoring feature
# screen for categorical features against a binary outcome.
# ---------------------------------------------------------------------------

WOE_ROUND = 6

# engine-shared scalar strings (plans/regression.py contract): smoothed
# class proportions, WoE = ln(p_bad / p_good), IV = Σ (p_bad−p_good)·WoE
_WOE_PBAD = "(n_bad + 0.5) / (bad_tot + 1.0)"
_WOE_PGOOD = "(n_good + 0.5) / (good_tot + 1.0)"


@query(
    "woe_iv_report",
    oracle=f"""
WITH bad_orders AS (
  SELECT DISTINCT l_orderkey AS o_orderkey FROM lineitem WHERE l_returnflag = 'R'
), base AS (
  SELECT o.o_orderkey,
         CAST(b.o_orderkey IS NOT NULL AS INTEGER) AS bad,
         o.o_orderpriority AS priority,
         c.c_mktsegment AS segment,
         lpad(CAST(month(o.o_orderdate) AS VARCHAR), 2, '0') AS order_month
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  LEFT JOIN bad_orders b ON b.o_orderkey = o.o_orderkey
), long_form AS (
  SELECT 'priority' AS feature, priority AS level, bad FROM base
  UNION ALL
  SELECT 'segment', segment, bad FROM base
  UNION ALL
  SELECT 'order_month', order_month, bad FROM base
), cells AS (
  SELECT feature, level,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(bad) AS BIGINT) AS n_bad,
         CAST(count(*) - sum(bad) AS BIGINT) AS n_good
  FROM long_form GROUP BY 1, 2
), tot AS (
  SELECT feature, level, n_orders, n_bad, n_good,
         CAST(sum(n_bad) OVER (PARTITION BY feature) AS DOUBLE) AS bad_tot,
         CAST(sum(n_good) OVER (PARTITION BY feature) AS DOUBLE) AS good_tot
  FROM cells
), scored AS (
  SELECT feature, level, n_orders, n_bad,
         ln(({_WOE_PBAD}) / ({_WOE_PGOOD})) AS woe,
         (({_WOE_PBAD}) - ({_WOE_PGOOD}))
           * ln(({_WOE_PBAD}) / ({_WOE_PGOOD})) AS iv_term
  FROM tot
)
SELECT feature, level, n_orders, n_bad,
       round(woe, {WOE_ROUND}) + 0.0 AS woe,
       round(sum(iv_term) OVER (PARTITION BY feature), {WOE_ROUND}) + 0.0
         AS iv_feature
FROM scored
""",
)
def woe_iv_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information value screen of categorical
    features (order priority, customer market segment, order month)
    against a binary outcome (order contains a returned line): per
    level the smoothed WoE = ln(p_bad/p_good), per feature the IV =
    Σ(p_bad−p_good)·WoE — the standard pre-model ranking of which
    features carry signal and which level encodings a scorecard should
    use (IV < 0.02 ⇒ drop; WoE itself is the encoded feature value).

    Scale shape: the outcome flag is a distinct-projection of returned
    orderkeys joined back on the orders key; customer is a broadcast
    dim join; the three features UNPIVOT into long form BEFORE the
    aggregate, so one shuffle computes every feature's cells (cells ∝
    Σ|levels|, ≤ 22 here) and the totals/IV are windows over that tiny
    grid. Laplace +0.5 smoothing keeps WoE finite for pure levels; ln()
    runs on identical doubles from exact counts in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    bad_keys = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
        .distinct()
        .withColumn("bad_flag", F.lit(1))
    )
    base = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(bad_keys, "o_orderkey", "left")
        .select(
            F.coalesce("bad_flag", F.lit(0)).alias("bad"),
            F.col("o_orderpriority").alias("priority"),
            F.col("c_mktsegment").alias("segment"),
            F.lpad(F.month("o_orderdate").cast("string"), 2, "0").alias("order_month"),
        )
    )
    long_form = base.select(
        F.explode(
            F.array(
                F.struct(F.lit("priority").alias("feature"), F.col("priority").alias("level")),
                F.struct(F.lit("segment").alias("feature"), F.col("segment").alias("level")),
                F.struct(
                    F.lit("order_month").alias("feature"), F.col("order_month").alias("level")
                ),
            )
        ).alias("fl"),
        "bad",
    ).select("fl.feature", "fl.level", "bad")
    cells = long_form.groupBy("feature", "level").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("bad").cast("long").alias("n_bad"),
        (F.count(F.lit(1)) - F.sum("bad")).cast("long").alias("n_good"),
    )
    wf = Window.partitionBy("feature")
    tot = cells.select(
        "feature",
        "level",
        "n_orders",
        "n_bad",
        "n_good",
        F.sum("n_bad").over(wf).cast("double").alias("bad_tot"),
        F.sum("n_good").over(wf).cast("double").alias("good_tot"),
    )
    scored = tot.select(
        "feature",
        "level",
        "n_orders",
        "n_bad",
        F.expr(f"ln(({_WOE_PBAD}) / ({_WOE_PGOOD}))").alias("woe"),
        F.expr(
            f"(({_WOE_PBAD}) - ({_WOE_PGOOD})) * ln(({_WOE_PBAD}) / ({_WOE_PGOOD}))"
        ).alias("iv_term"),
    )
    return scored.select(
        "feature",
        "level",
        "n_orders",
        "n_bad",
        (F.round("woe", WOE_ROUND) + 0.0).alias("woe"),
        (F.round(F.sum("iv_term").over(wf), WOE_ROUND) + 0.0).alias("iv_feature"),
    )
