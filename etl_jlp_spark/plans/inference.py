"""Inference-grade analytics: rank correlation, AR(1) forecast
evaluation, leakage-free target encoding, revenue mix-shift
decomposition, and score-calibration diagnostics.

Reference tie-in: the reference's analytics stop at groupby summaries
(dwh_lab/dwh/quality_report.py; the preprocessing chain in
dwh/preprocessing_streaming_incremental_load.py) — rank correlation,
forecast skill, encoding hygiene and calibration were all downstream
notebook work. These operators make them warehouse queries.

Cross-engine exactness strategy (same as plans/regression.py): every
aggregate that feeds an estimator is an EXACT integer (whole dollars,
e4-scaled scores, counts) or DECIMAL(38,0) sum, so the sufficient
statistics are bit-identical in Spark and DuckDB regardless of
partitioning; the estimator is then the same scalar double expression
evaluated from identical operands. Row-wise float accumulation (the
usual cross-engine hash killer) never happens: even the AR(1) held-out
SSE is EXPANDED algebraically into second-order integer sums (the
k-fold-CV-OLS trick in plans/experiment.py).

Scale shapes:
- kendall_tau_daily / ar1_forecast_eval: one groupBy(day) over orders
  (calendar-bounded ~2.4k rows at ANY scale factor), then pair joins /
  lag windows of the tiny daily series — broadcast, never a shuffle of
  the fact table.
- target_encoding_kfold: one map-side-combinable groupBy on
  (event_type, fold) — |types|×K cells; the leave-fold-out mean is
  computed from type totals by subtraction, NOT a second scan.
- mix_shift_decomposition: one lineitem scan filtered to two years,
  part dim broadcast, |brands| output rows.
- calibration_report: reuses the text_quality_score and
  gopher_quality_filter single-pass relations; bins are a 10-row agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import ORACLES, query

TAU_ROUND = 6
AR1_TRAIN_END = "2000-01-01"  # train < boundary, evaluate on >=
TE_FOLDS = 5
MIX_Y1, MIX_Y2 = 1996, 1997
CAL_BINS = 10

_DAILY_CTE = """
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS rev,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily (rev whole-dollar exact, order count) series — the shared
    calendar-bounded aggregate (mirror of the ``daily`` oracle CTE)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.round("o_totalprice").cast("long")).cast("long").alias("rev"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Kendall tau-b: rank correlation between daily revenue and daily order
# count. Spearman (spearman_corr_matrix) ranks values; tau counts
# concordant pairs — the robustness check reviewers ask for when a
# monotone association claim rides on a skewed series.
# ---------------------------------------------------------------------------


@query(
    "kendall_tau_daily",
    oracle=f"""
WITH daily AS ({_DAILY_CTE}),
pairs AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(count(*) FILTER (
           WHERE (b.rev - a.rev) * (b.n_orders - a.n_orders) > 0) AS BIGINT) AS concordant,
         CAST(count(*) FILTER (
           WHERE (b.rev - a.rev) * (b.n_orders - a.n_orders) < 0) AS BIGINT) AS discordant,
         CAST(count(*) FILTER (WHERE b.rev = a.rev) AS BIGINT) AS tied_rev,
         CAST(count(*) FILTER (WHERE b.n_orders = a.n_orders) AS BIGINT) AS tied_cnt
  FROM daily a JOIN daily b ON a.day < b.day
)
SELECT CAST(round((1 + sqrt(1 + 8 * CAST(p.n_pairs AS DOUBLE))) / 2) AS BIGINT) AS n_days,
       p.concordant, p.discordant, p.tied_rev, p.tied_cnt,
       round((CAST(p.concordant AS DOUBLE) - CAST(p.discordant AS DOUBLE))
             / sqrt(CAST(p.n_pairs - p.tied_rev AS DOUBLE)
                    * CAST(p.n_pairs - p.tied_cnt AS DOUBLE)),
             {TAU_ROUND}) + 0.0 AS tau_b
FROM pairs p
""",
)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between daily order revenue and daily order count:
    tau_b = (C − D) / √((n₀−T_rev)(n₀−T_cnt)) from exact pair counts
    over the day-pair join (concordant / discordant / tied on either
    margin).

    Plan: the pair join is the ~2.4k-row daily aggregate against
    itself (calendar-bounded at ANY scale factor — n² here is n² of
    the number of DAYS, not rows), broadcast. n_days is recovered
    algebraically from the pair count (n = (1+√(1+8·n₀))/2 — exact in
    doubles far past any calendar), so no third scan branch exists;
    the two remaining static scans of the daily agg collapse into one
    at runtime via AQE exchange reuse. Counts are integers so both
    engines agree bit-for-bit; tau is one double expression at the
    end."""
    daily = _daily(spark, sf_dir)
    a, b = daily.alias("a"), daily.alias("b")
    dx = F.col("b.rev") - F.col("a.rev")
    dy = F.col("b.n_orders") - F.col("a.n_orders")
    pairs = (
        a.join(F.broadcast(b), F.col("a.day") < F.col("b.day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.when(dx * dy > 0, 1).otherwise(0)).cast("long").alias("concordant"),
            F.sum(F.when(dx * dy < 0, 1).otherwise(0)).cast("long").alias("discordant"),
            F.sum(F.when(dx == 0, 1).otherwise(0)).cast("long").alias("tied_rev"),
            F.sum(F.when(dy == 0, 1).otherwise(0)).cast("long").alias("tied_cnt"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return pairs.select(
        F.round((1 + F.sqrt(1 + 8 * d("n_pairs"))) / 2).cast("long").alias("n_days"),
        "concordant",
        "discordant",
        "tied_rev",
        "tied_cnt",
        F.round(
            (d("concordant") - d("discordant"))
            / F.sqrt(
                (F.col("n_pairs") - F.col("tied_rev")).cast("double")
                * (F.col("n_pairs") - F.col("tied_cnt")).cast("double")
            ),
            TAU_ROUND,
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# AR(1) one-step forecast evaluation: fit y_t = c + φ·y_{t-1} on the
# training window by closed-form OLS, evaluate held-out SSE against
# the naive (y_t = y_{t-1}) forecast — the autoregressive baseline
# every fancier forecaster must beat (complements holt_linear_eval /
# holt_winters_eval / seasonal_naive_eval).
# ---------------------------------------------------------------------------


@query(
    "ar1_forecast_eval",
    oracle=f"""
WITH daily AS ({_DAILY_CTE}),
lagged AS (
  SELECT day, rev AS y,
         lag(rev) OVER (ORDER BY day) AS x
  FROM daily
), pts AS (
  SELECT CAST(day < DATE '{AR1_TRAIN_END}' AS BOOLEAN) AS is_train,
         CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
  FROM lagged WHERE x IS NOT NULL
), s AS (
  SELECT is_train,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
         CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy,
         CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy
  FROM pts GROUP BY 1
), fit AS (
  SELECT (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           AS phi,
         CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
         n AS n_train
  FROM s WHERE is_train
), ev AS (SELECT * FROM s WHERE NOT is_train)
SELECT f.n_train, e.n AS n_test,
       round(f.phi, {TAU_ROUND}) + 0.0 AS phi,
       round(f.my - f.phi * f.mx, 2) + 0.0 AS intercept_usd,
       round(sqrt((CAST(e.syy AS DOUBLE)
                   - 2 * (f.my - f.phi * f.mx) * CAST(e.sy AS DOUBLE)
                   - 2 * f.phi * CAST(e.sxy AS DOUBLE)
                   + (f.my - f.phi * f.mx) * (f.my - f.phi * f.mx) * CAST(e.n AS DOUBLE)
                   + 2 * (f.my - f.phi * f.mx) * f.phi * CAST(e.sx AS DOUBLE)
                   + f.phi * f.phi * CAST(e.sxx AS DOUBLE)) / CAST(e.n AS DOUBLE)), 2)
         + 0.0 AS rmse_ar1,
       round(sqrt(CAST(e.syy - 2 * e.sxy + e.sxx AS DOUBLE) / CAST(e.n AS DOUBLE)), 2)
         + 0.0 AS rmse_naive
FROM fit f CROSS JOIN ev e
""",
)
def ar1_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) daily-revenue forecaster: closed-form OLS of y_t on
    y_{t-1} over days < AR1_TRAIN_END, one-step held-out RMSE vs the
    naive last-value forecast. The held-out SSE is EXPANDED into
    second-order sums — Σ(y−c−φx)² = Σy² − 2cΣy − 2φΣxy + c²n + 2cφΣx
    + φ²Σx² — so no per-row float residual is ever accumulated (the
    algebraic-SSE trick of ols_cv_eval): both engines evaluate one
    double expression from exact DECIMAL(38,0)/int64 statistics.

    Plan: one groupBy(day) over orders, a lag window over the ~2.4k-row
    calendar-bounded series (single tiny partition by construction —
    this window never sees the fact table), one 2-group aggregate."""
    daily = _daily(spark, sf_dir)
    lagged = daily.select(
        "day", F.col("rev").alias("y"), F.lag("rev").over(Window.orderBy("day")).alias("x")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = (
        lagged.filter(F.col("x").isNotNull())
        .select(
            (F.col("day") < F.lit(AR1_TRAIN_END).cast("date")).alias("is_train"),
            F.col("x").cast("long"),
            F.col("y").cast("long"),
        )
        .groupBy("is_train")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(dec("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
            F.sum(dec("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
            F.sum(dec("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    fit = s.filter("is_train").select(
        ((d("n") * d("sxy") - d("sx") * d("sy")) / (d("n") * d("sxx") - d("sx") * d("sx"))).alias(
            "phi"
        ),
        (d("sy") / d("n")).alias("my"),
        (d("sx") / d("n")).alias("mx"),
        F.col("n").alias("n_train"),
    )
    ev = s.filter(~F.col("is_train"))
    c = F.col("my") - F.col("phi") * F.col("mx")
    phi = F.col("phi")
    ssr = (
        d("syy")
        - 2 * c * d("sy")
        - 2 * phi * d("sxy")
        + c * c * d("n")
        + 2 * c * phi * d("sx")
        + phi * phi * d("sxx")
    )
    naive = (F.col("syy") - 2 * F.col("sxy") + F.col("sxx")).cast("double")
    return fit.crossJoin(ev).select(
        "n_train",
        F.col("n").alias("n_test"),
        F.round(phi, TAU_ROUND).alias("phi"),
        F.round(c, 2).alias("intercept_usd"),
        F.round(F.sqrt(ssr / d("n")), 2).alias("rmse_ar1"),
        F.round(F.sqrt(naive / d("n")), 2).alias("rmse_naive"),
    )


# ---------------------------------------------------------------------------
# Leakage-free K-fold target encoding: the per-category mean of the
# target each row is ALLOWED to see (folds other than its own) — the
# standard anti-leak construction for feeding high-cardinality
# categoricals to a downstream model. Getting it wrong (using the full
# mean) is the classic silent train-eval leak.
# ---------------------------------------------------------------------------


@query(
    "target_encoding_kfold",
    oracle=f"""
WITH pts AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % {TE_FOLDS} AS fold,
         CAST(round(value * 10000) AS BIGINT) AS v_e4
  FROM events
), cells AS (
  SELECT event_type, fold,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(v_e4) AS BIGINT) AS s_e4
  FROM pts GROUP BY 1, 2
), tot AS (
  SELECT event_type,
         CAST(sum(n_rows) AS BIGINT) AS n_t,
         CAST(sum(s_e4) AS BIGINT) AS s_t
  FROM cells GROUP BY 1
)
SELECT c.event_type, c.fold, c.n_rows,
       round(CAST(t.s_t - c.s_e4 AS DOUBLE)
             / CAST(t.n_t - c.n_rows AS DOUBLE) / 10000.0, {TAU_ROUND}) + 0.0 AS enc_value
FROM cells c JOIN tot t USING (event_type)
""",
)
def target_encoding_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold (K=5, md5-deterministic fold assignment) target encoding
    of event_type → mean(value): each fold's encoding is the mean over
    the OTHER folds, computed by subtraction from the type totals —
    (S_type − S_fold) / (N_type − N_fold) — so the fact table is
    scanned ONCE and the leave-one-fold-out semantics cost a window
    over |types|×K cells, not a second pass. Values are e4-scaled
    integers, so both engines' sums are exact.

    At 100 TB: one map-side-combinable groupBy; the output is
    |types|×K rows — the encoded table a training job broadcast-joins
    back onto the raw rows."""
    ev = load_table(spark, sf_dir, "events")
    fold = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10).cast("long")
        % TE_FOLDS
    )
    cells = (
        ev.select(
            "event_type",
            fold.alias("fold"),
            F.round(F.col("value") * 10000).cast("long").alias("v_e4"),
        )
        .groupBy("event_type", "fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("v_e4").cast("long").alias("s_e4"),
        )
    )
    w = Window.partitionBy("event_type")
    return cells.select(
        "event_type",
        "fold",
        "n_rows",
        F.round(
            (F.sum("s_e4").over(w) - F.col("s_e4")).cast("double")
            / (F.sum("n_rows").over(w) - F.col("n_rows")).cast("double")
            / 10000.0,
            TAU_ROUND,
        ).alias("enc_value"),
    )


# ---------------------------------------------------------------------------
# Price/volume mix-shift decomposition: WHY did revenue move between
# two years — classic Laspeyres-volume + Paasche-price split per brand,
# the finance-review bridge chart as a warehouse query.
# ---------------------------------------------------------------------------


@query(
    "mix_shift_decomposition",
    oracle=f"""
WITH base AS (
  SELECT p.p_brand AS brand, CAST(year(l.l_shipdate) AS BIGINT) AS yr,
         CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS q,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rc
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE year(l.l_shipdate) IN ({MIX_Y1}, {MIX_Y2})
  GROUP BY 1, 2
), pv AS (
  SELECT brand,
         CAST(COALESCE(sum(q) FILTER (WHERE yr = {MIX_Y1}), 0) AS BIGINT) AS q1,
         CAST(COALESCE(sum(q) FILTER (WHERE yr = {MIX_Y2}), 0) AS BIGINT) AS q2,
         CAST(COALESCE(sum(rc) FILTER (WHERE yr = {MIX_Y1}), 0) AS BIGINT) AS rc1,
         CAST(COALESCE(sum(rc) FILTER (WHERE yr = {MIX_Y2}), 0) AS BIGINT) AS rc2
  FROM base GROUP BY 1
), eff AS (
  SELECT brand, q1, q2, rc1, rc2,
         CASE WHEN q1 > 0 THEN CAST(rc1 AS DOUBLE) / 100.0 / CAST(q1 AS DOUBLE)
              ELSE 0.0 END AS p1,
         CASE WHEN q2 > 0 THEN CAST(rc2 AS DOUBLE) / 100.0 / CAST(q2 AS DOUBLE)
              ELSE 0.0 END AS p2
  FROM pv
)
SELECT brand, q1, q2,
       round(rc1 / 100.0, 2) AS rev1, round(rc2 / 100.0, 2) AS rev2,
       round(CAST(q2 - q1 AS DOUBLE) * p1, 2) + 0.0 AS volume_effect,
       round(CAST(q2 AS DOUBLE) * (p2 - p1), 2) + 0.0 AS price_effect,
       round((rc2 - rc1) / 100.0, 2) AS delta_rev
FROM eff
""",
)
def mix_shift_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand revenue bridge {y1}→{y2}: Δrevenue split into a
    volume effect (Δqty at old average price, Laspeyres) and a price
    effect (new qty × Δaverage price, Paasche) — the two terms sum to
    Δrevenue identically (q2·p2 − q1·p1), with brands absent from one
    year handled by the p=0 convention (their whole delta lands on the
    side that exists). Quantities and cents are exact integer sums;
    the effects are the same double expressions in both engines.

    Plan: ONE lineitem scan with the year-IN filter pushed to the
    parquet scan, part dim broadcast (AQE confirms), conditional-agg
    pivot over the two years — never a self-join of the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    yr = F.year("l_shipdate")
    # the year-IN predicate as a shipdate RANGE so it pushes to the
    # parquet scan (year(cast(..)) is not a pushable filter; the range
    # is, and prunes row groups by min/max stats at 100 TB)
    # (string literals coerce to the column's timestamp flavor — LTZ or
    # NTZ depending on the reader — leaving the column un-cast)
    base = (
        li.filter(f"l_shipdate >= '{MIX_Y1}-01-01' AND l_shipdate < '{MIX_Y2 + 1}-01-01'")
        .join(F.broadcast(part.select("p_partkey", "p_brand")), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), yr.cast("long").alias("yr"))
        .agg(
            F.sum(F.round("l_quantity").cast("long")).cast("long").alias("q"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("long").alias("rc"),
        )
    )
    y1, y2 = F.col("yr") == MIX_Y1, F.col("yr") == MIX_Y2
    pv = base.groupBy("brand").agg(
        F.coalesce(F.sum(F.when(y1, F.col("q"))), F.lit(0)).cast("long").alias("q1"),
        F.coalesce(F.sum(F.when(y2, F.col("q"))), F.lit(0)).cast("long").alias("q2"),
        F.coalesce(F.sum(F.when(y1, F.col("rc"))), F.lit(0)).cast("long").alias("rc1"),
        F.coalesce(F.sum(F.when(y2, F.col("rc"))), F.lit(0)).cast("long").alias("rc2"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    p1 = F.when(F.col("q1") > 0, d("rc1") / 100.0 / d("q1")).otherwise(F.lit(0.0))
    p2 = F.when(F.col("q2") > 0, d("rc2") / 100.0 / d("q2")).otherwise(F.lit(0.0))
    return pv.select(
        "brand",
        "q1",
        "q2",
        F.round(F.col("rc1") / 100.0, 2).alias("rev1"),
        F.round(F.col("rc2") / 100.0, 2).alias("rev2"),
        F.round((F.col("q2") - F.col("q1")).cast("double") * p1, 2).alias("volume_effect"),
        F.round(d("q2") * (p2 - p1), 2).alias("price_effect"),
        F.round((F.col("rc2") - F.col("rc1")) / 100.0, 2).alias("delta_rev"),
    )


mix_shift_decomposition.__doc__ = (mix_shift_decomposition.__doc__ or "").format(
    y1=MIX_Y1, y2=MIX_Y2
)


# ---------------------------------------------------------------------------
# Calibration report: reliability bins + Brier score + ECE of the
# continuous quality score against the gopher rule verdict. The PR
# curve (quality_score_pr_curve) says where the two disagree; this
# says whether the score's VALUE is trustworthy as a probability —
# the gate before using it as a sampling weight (soft-filtering à la
# softdedup) instead of a hard threshold.
# ---------------------------------------------------------------------------


def _calibration_oracle() -> str:
    # register the gate oracles this composition embeds, so the module
    # imports standalone (tests / streaming import plans modules directly)
    from etl_jlp_spark.operators import quality_rules, textstats  # noqa: F401

    score_sql = ORACLES["text_quality_score"]
    gopher_sql = ORACLES["gopher_quality_filter"]
    return f"""
WITH score AS ({score_sql}),
gopher AS ({gopher_sql}),
joined AS (
  SELECT CAST(least(floor(s.quality_score * {CAL_BINS}), {CAL_BINS - 1}) AS BIGINT) AS bin,
         CAST(round(s.quality_score * 10000) AS BIGINT) AS s_e4,
         CAST(g.keep AS INTEGER) AS kept
  FROM score s JOIN gopher g ON s.doc_id = g.doc_id
), bins AS (
  SELECT bin,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(s_e4) AS BIGINT) AS ss_e4,
         CAST(sum(CAST(s_e4 AS DECIMAL(38,0)) * s_e4) AS DECIMAL(38,0)) AS ss2_e8,
         CAST(sum(kept) AS BIGINT) AS n_keep,
         CAST(sum(s_e4 * kept) AS BIGINT) AS sk_e4
  FROM joined GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS n,
         sum(abs(CAST(n_keep AS DOUBLE) / n_docs
                 - CAST(ss_e4 AS DOUBLE) / n_docs / 10000.0) * n_docs) AS ece_num,
         (CAST(sum(ss2_e8) AS DOUBLE) / 100000000.0
          - 2.0 * CAST(sum(sk_e4) AS DOUBLE) / 10000.0
          + CAST(sum(n_keep) AS DOUBLE)) AS brier_num
  FROM bins
)
SELECT b.bin, b.n_docs,
       round(CAST(b.ss_e4 AS DOUBLE) / b.n_docs / 10000.0, 4) + 0.0 AS avg_score,
       round(CAST(b.n_keep AS DOUBLE) / b.n_docs, 4) + 0.0 AS keep_rate,
       round(CAST(b.n_keep AS DOUBLE) / b.n_docs
             - CAST(b.ss_e4 AS DOUBLE) / b.n_docs / 10000.0, 4) + 0.0 AS gap,
       round(t.ece_num / t.n, 4) + 0.0 AS ece,
       round(t.brier_num / t.n, 4) + 0.0 AS brier
FROM bins b CROSS JOIN tot t
"""


@query("calibration_report", oracle=_calibration_oracle())
def calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of text_quality_score vs the
    gopher_quality_filter keep verdict: 10 equal-width score bins with
    per-bin mean score, empirical keep rate and their gap, plus the
    corpus-level ECE (bin-count-weighted |gap|) and Brier score
    (Σ(score−keep)², expanded into exact e4/e8 integer sums so no
    per-row float is accumulated). avg_score ≈ keep_rate per bin ⇒ the
    score is usable as a sampling probability.

    Plan: both per-doc relations are single passes (shared with the PR
    curve); one 10-row agg + a 1-row total. Oracle embeds the
    constituent oracles verbatim so the three queries cannot drift."""
    from etl_jlp_spark.operators.quality_rules import gopher_quality_filter
    from etl_jlp_spark.operators.textstats import text_quality_score

    score = text_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    keep = gopher_quality_filter(spark, sf_dir).select("doc_id", "keep")
    joined = score.join(keep, "doc_id").select(
        F.least(F.floor(F.col("quality_score") * CAL_BINS), F.lit(CAL_BINS - 1))
        .cast("long")
        .alias("bin"),
        F.round(F.col("quality_score") * 10000).cast("long").alias("s_e4"),
        F.col("keep").cast("integer").alias("kept"),
    )
    bins = joined.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("s_e4").cast("long").alias("ss_e4"),
        F.sum(F.col("s_e4").cast("decimal(38,0)") * F.col("s_e4"))
        .cast("decimal(38,0)")
        .alias("ss2_e8"),
        F.sum("kept").cast("long").alias("n_keep"),
        F.sum(F.col("s_e4") * F.col("kept")).cast("long").alias("sk_e4"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    gap = d("n_keep") / F.col("n_docs") - d("ss_e4") / F.col("n_docs") / 10000.0
    tot = bins.agg(
        F.sum("n_docs").cast("long").alias("n"),
        F.sum(F.abs(gap) * F.col("n_docs")).alias("ece_num"),
        (
            F.sum("ss2_e8").cast("double") / 100000000.0
            - 2.0 * F.sum("sk_e4").cast("double") / 10000.0
            + F.sum("n_keep").cast("double")
        ).alias("brier_num"),
    )
    return bins.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_docs",
        F.round(d("ss_e4") / F.col("n_docs") / 10000.0, 4).alias("avg_score"),
        F.round(d("n_keep") / F.col("n_docs"), 4).alias("keep_rate"),
        F.round(gap, 4).alias("gap"),
        F.round(F.col("ece_num") / F.col("n"), 4).alias("ece"),
        F.round(F.col("brier_num") / F.col("n"), 4).alias("brier"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA: does mean event value differ across groups — the
# continuous-response sibling of the chi-square mix tests.
# ---------------------------------------------------------------------------

ANOVA_ROUND = 6

_ANOVA_FACTOR_SQL = """
  SELECT '{name}' AS factor, {expr} AS grp,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v_e4) AS BIGINT) AS s,
         CAST(sum(CAST(v_e4 AS DECIMAL(38,0)) * v_e4) AS DECIMAL(38,0)) AS ss
  FROM pts GROUP BY 2
"""


@query(
    "anova_oneway_value",
    oracle=f"""
WITH pts AS (
  SELECT event_type, CAST(isodow(ts) - 1 AS VARCHAR) AS weekday,
         CAST(round(value * 10000) AS BIGINT) AS v_e4
  FROM events
), cells AS (
  {_ANOVA_FACTOR_SQL.format(name="event_type", expr="event_type")}
  UNION ALL
  {_ANOVA_FACTOR_SQL.format(name="weekday", expr="weekday")}
), agg AS (
  SELECT factor,
         CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) AS BIGINT) AS nt,
         CAST(sum(s) AS BIGINT) AS st,
         CAST(sum(ss) AS DECIMAL(38,0)) AS sst,
         sum(CAST(s AS DOUBLE) * s / n) AS sum_sq_means
  FROM cells GROUP BY 1
), dec AS (
  SELECT factor, k, nt,
         sum_sq_means - CAST(st AS DOUBLE) * st / nt AS ssb,
         CAST(sst AS DOUBLE) - sum_sq_means AS ssw
  FROM agg
)
SELECT factor, k AS n_groups, nt AS n_rows,
       round(ssb / 100000000.0, 2) + 0.0 AS ss_between,
       round(ssw / 100000000.0, 2) + 0.0 AS ss_within,
       round((ssb / (k - 1)) / (ssw / (nt - k)), {ANOVA_ROUND}) + 0.0 AS f_stat,
       round(ssb / (ssb + ssw), {ANOVA_ROUND}) + 0.0 AS eta_sq
FROM dec
""",
)
def anova_oneway_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value against each factor (event_type,
    weekday): between/within sum-of-squares, the F statistic and η²
    effect size — the continuous-response counterpart of
    priority_mix_chisq / cramers_v_matrix (those test counts; this
    tests MEANS). SS decomposition runs entirely on exact e4-scaled
    sums (SSB = Σ s_g²/n_g − S²/N, SSW = Σv² − Σ s_g²/n_g), so both
    engines see identical operands; only the final ratios are doubles.

    Plan: one fact scan stacked into two factor groupings
    (map-side-combinable; ≤ 12 cells total), one 2-row rollup."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.weekday("ts").cast("string").alias("weekday"),
        F.round(F.col("value") * 10000).cast("long").alias("v_e4"),
    )
    cells_parts = []
    for name, col in (("event_type", F.col("event_type")), ("weekday", F.col("weekday"))):
        cells_parts.append(
            pts.groupBy(col.alias("grp")).agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("v_e4").cast("long").alias("s"),
                F.sum(F.col("v_e4").cast("decimal(38,0)") * F.col("v_e4"))
                .cast("decimal(38,0)")
                .alias("ss"),
            ).select(F.lit(name).alias("factor"), "grp", "n", "s", "ss")
        )
    cells = cells_parts[0].unionAll(cells_parts[1])
    agg = cells.groupBy("factor").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nt"),
        F.sum("s").cast("long").alias("st"),
        F.sum("ss").cast("decimal(38,0)").alias("sst"),
        F.sum(F.col("s").cast("double") * F.col("s") / F.col("n")).alias("sum_sq_means"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    ssb = F.col("sum_sq_means") - d("st") * F.col("st") / F.col("nt")
    ssw = d("sst") - F.col("sum_sq_means")
    return agg.select(
        "factor",
        F.col("k").alias("n_groups"),
        F.col("nt").alias("n_rows"),
        F.round(ssb / 100000000.0, 2).alias("ss_between"),
        F.round(ssw / 100000000.0, 2).alias("ss_within"),
        F.round((ssb / (F.col("k") - 1)) / (ssw / (F.col("nt") - F.col("k"))), ANOVA_ROUND).alias(
            "f_stat"
        ),
        F.round(ssb / (ssb + ssw), ANOVA_ROUND).alias("eta_sq"),
    )


# ---------------------------------------------------------------------------
# Pettitt changepoint: rank-based (nonparametric) single changepoint on
# the daily revenue series — the distribution-free sibling of
# cusum_changepoint (CUSUM assumes a mean shift in level; Pettitt only
# assumes exchangeability under H0).
# ---------------------------------------------------------------------------


@query(
    "pettitt_changepoint",
    oracle=f"""
WITH daily AS ({_DAILY_CTE}),
pq AS (
  SELECT a.day,
         CAST(sum(CASE WHEN b.day > a.day THEN sign(b.rev - a.rev)
                       ELSE -sign(a.rev - b.rev) END) AS BIGINT) AS pq
  FROM daily a JOIN daily b ON a.day <> b.day
  GROUP BY 1
), u AS (
  SELECT day, CAST(sum(pq) OVER (ORDER BY day) AS BIGINT) AS u_t,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM pq
), best AS (
  SELECT n, abs(u_t) AS k_stat, day AS change_day
  FROM u ORDER BY abs(u_t) DESC, day LIMIT 1
)
SELECT n AS n_days, k_stat, change_day,
       round(least(1.0, 2 * exp(-6.0 * CAST(k_stat AS DOUBLE) * k_stat
             / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n))), 8) + 0.0
         AS p_approx
FROM best
""",
)
def pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt (1979) nonparametric changepoint test on daily revenue:
    U_t = Σ_(i≤t<j) sign(x_j − x_i), K = max|U_t|, split day = argmax,
    p ≈ 2·exp(−6K²/(n³+n²)). The telescoping identity U_t = U_(t−1) +
    P(t) − Q(t) turns the all-pairs definition into ONE per-day pair
    aggregate (P−Q = signed wins against later minus earlier days)
    plus a cumsum — the pair join is the calendar-bounded daily series
    against itself, broadcast, never the fact table. All sign sums are
    integers; only the p-value is a double."""
    daily = _daily(spark, sf_dir).select("day", "rev")
    a, b = daily.alias("a"), daily.alias("b")
    contrib = F.when(
        F.col("b.day") > F.col("a.day"), F.signum(F.col("b.rev") - F.col("a.rev"))
    ).otherwise(-F.signum(F.col("a.rev") - F.col("b.rev")))
    pq = (
        a.join(F.broadcast(b), F.col("a.day") != F.col("b.day"))
        .groupBy(F.col("a.day").alias("day"))
        .agg(F.sum(contrib).cast("long").alias("pq"))
    )
    u = pq.select(
        "day",
        F.sum("pq").over(Window.orderBy("day")).cast("long").alias("u_t"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("n"),
    )
    best = u.orderBy(F.abs(F.col("u_t")).desc(), F.asc("day")).limit(1)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return best.select(
        F.col("n").alias("n_days"),
        F.abs(F.col("u_t")).alias("k_stat"),
        F.col("day").alias("change_day"),
        F.round(
            F.least(
                F.lit(1.0),
                2
                * F.exp(
                    -6.0 * F.abs(d("u_t")) * F.abs(F.col("u_t"))
                    / (d("n") * F.col("n") * F.col("n") + d("n") * F.col("n"))
                ),
            ),
            8,
        ).alias("p_approx"),
    )


# ---------------------------------------------------------------------------
# Isotonic calibration (pool-adjacent-violators): calibration_report
# DIAGNOSES miscalibration; this fits the monotone calibrated keep
# probability a sampler would actually use. PAV over the 10 score bins
# via the exact minimax identity iso(i) = max_{j≤i} min_{k≥i}
# rate(j..k) — no sequential pooling loop, just segment sums over the
# bins relation, so the whole fit is relational and engine-portable.
# ---------------------------------------------------------------------------


def _isotonic_oracle() -> str:
    from etl_jlp_spark.operators import quality_rules, textstats  # noqa: F401

    score_sql = ORACLES["text_quality_score"]
    gopher_sql = ORACLES["gopher_quality_filter"]
    return f"""
WITH score AS ({score_sql}),
gopher AS ({gopher_sql}),
joined AS (
  SELECT CAST(least(floor(s.quality_score * {CAL_BINS}), {CAL_BINS - 1}) AS BIGINT) AS bin,
         CAST(g.keep AS INTEGER) AS kept
  FROM score s JOIN gopher g ON s.doc_id = g.doc_id
), bins AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(kept) AS BIGINT) AS n_keep
  FROM joined GROUP BY 1
), pre AS (
  SELECT bin, n_docs, n_keep,
         sum(n_docs) OVER (ORDER BY bin) AS cum_n,
         sum(n_keep) OVER (ORDER BY bin) AS cum_k
  FROM bins
), seg AS (
  SELECT j.bin AS bj, k.bin AS bk,
         CAST(k.cum_k - j.cum_k + j.n_keep AS DOUBLE)
           / (k.cum_n - j.cum_n + j.n_docs) AS rate
  FROM pre j JOIN pre k ON j.bin <= k.bin
), lower_env AS (
  SELECT b.bin, s.bj, min(s.rate) AS m
  FROM bins b JOIN seg s ON s.bj <= b.bin AND s.bk >= b.bin
  GROUP BY 1, 2
), iso AS (
  SELECT bin, max(m) AS iso_rate FROM lower_env GROUP BY bin
)
SELECT b.bin, b.n_docs,
       round(CAST(b.n_keep AS DOUBLE) / b.n_docs, 4) AS raw_rate,
       round(i.iso_rate, 4) AS iso_rate
FROM bins b JOIN iso i ON i.bin = b.bin
"""


@query("isotonic_calibration", oracle=_isotonic_oracle())
def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAV-calibrated keep probability per score bin: the isotonic
    regression of the gopher keep rate on the text-quality score bins,
    computed by the exact minimax identity iso(i) = max over j ≤ i of
    (min over k ≥ i of rate(j..k)) over contiguous bin segments
    (segment rates are one exact-integer division each, so min/max pick
    identical doubles in both engines; monotone non-decreasing by
    construction — pinned in tests).

    Plan: the per-doc passes collapse into a ≤B-row bins relation
    (B = CAL_BINS = 10); prefix sums, the B² segment grid and the ≤B³
    minimax joins are all broadcast-sized. At 100 TB only the two
    per-doc scans cost anything — the fit itself is free."""
    from etl_jlp_spark.operators.quality_rules import gopher_quality_filter
    from etl_jlp_spark.operators.textstats import text_quality_score

    score = text_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    keep = gopher_quality_filter(spark, sf_dir).select("doc_id", "keep")
    joined = score.join(keep, "doc_id").select(
        F.least(F.floor(F.col("quality_score") * CAL_BINS), F.lit(CAL_BINS - 1))
        .cast("long")
        .alias("bin"),
        F.col("keep").cast("integer").alias("kept"),
    )
    bins = (
        joined.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("kept").cast("long").alias("n_keep"),
        )
        .localCheckpoint(eager=True)  # ≤ CAL_BINS rows, consumed 3 ways
    )
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pre = bins.select(
        "bin",
        "n_docs",
        "n_keep",
        F.sum("n_docs").over(wcum).alias("cum_n"),
        F.sum("n_keep").over(wcum).alias("cum_k"),
    )
    j = pre.select(
        F.col("bin").alias("bj"),
        F.col("n_docs").alias("nj"),
        F.col("n_keep").alias("kj"),
        F.col("cum_n").alias("cnj"),
        F.col("cum_k").alias("ckj"),
    )
    k = pre.select(
        F.col("bin").alias("bk"), F.col("cum_n").alias("cnk"), F.col("cum_k").alias("ckk")
    )
    seg = j.join(F.broadcast(k), F.col("bj") <= F.col("bk")).select(
        "bj",
        "bk",
        (
            (F.col("ckk") - F.col("ckj") + F.col("kj")).cast("double")
            / (F.col("cnk") - F.col("cnj") + F.col("nj"))
        ).alias("rate"),
    )
    env = (
        bins.select("bin")
        .join(F.broadcast(seg), (F.col("bj") <= F.col("bin")) & (F.col("bk") >= F.col("bin")))
        .groupBy("bin", "bj")
        .agg(F.min("rate").alias("m"))
    )
    iso = env.groupBy("bin").agg(F.max("m").alias("iso_rate"))
    return (
        bins.join(F.broadcast(iso), "bin")
        .select(
            "bin",
            "n_docs",
            F.round(F.col("n_keep").cast("double") / F.col("n_docs"), 4).alias("raw_rate"),
            F.round("iso_rate", 4).alias("iso_rate"),
        )
    )


