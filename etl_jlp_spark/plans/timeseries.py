"""Time-series analytics the reference computes by hand-rolled pandas
loops, re-expressed as Spark plans: dense resampling (gap-fill),
cohort retention, trailing-window anomaly detection, and truncated-EWMA
smoothing.

Reference tie-in: the preprocessing chain derives per-window activity
(add_window_time_columns, preprocessing_streaming_incremental_load.py)
but any report over it silently skips empty windows; BI layers need the
ZERO rows. ``timeseries_gapfill`` densifies (hour × event_type) with
explicit zeros. ``user_retention_cohorts`` is the standard
first-seen-cohort × week-offset active-user matrix.

Scale shapes:
- gap-fill: the dense grid is |hours| × |types| — bounded by the time
  span, not the event count; it is built from a 1-row span scalar
  (broadcast) crossed with the distinct type dimension, then LEFT
  joins the pre-reduced aggregate. Raw events are touched exactly once
  (one map-side-combinable agg).
- retention: two aggregates over (user, week) — both shuffle keys are
  high-cardinality (user_id), the output is cohorts × offsets rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import query


@query(
    "timeseries_gapfill",
    oracle="""
WITH agg AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         round(sum(value), 2) AS sum_value
  FROM events GROUP BY 1, 2
), span AS (SELECT min(hour) AS lo, max(hour) AS hi FROM agg),
hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM span
), types AS (SELECT DISTINCT event_type FROM events)
SELECT h.hour, t.event_type,
       coalesce(a.n_events, 0) AS n_events,
       coalesce(a.sum_value, 0.0) AS sum_value
FROM hours h CROSS JOIN types t
LEFT JOIN agg a ON a.hour = h.hour AND a.event_type = t.event_type
""",
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly activity per event type: every (hour, type) cell in
    the observed span, zero-filled where no events landed — the
    resample-to-dense step reporting and anomaly detection need."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    span = agg.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))  # 1 row
    hours = span.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hour")
    )
    types = events.select("event_type").distinct()
    # both grid factors are tiny (span-bounded / dimension-bounded);
    # broadcast keeps the cross product a local expansion
    grid = hours.crossJoin(F.broadcast(types))
    return grid.join(F.broadcast(agg), ["hour", "event_type"], "left").select(
        "hour",
        "event_type",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


@query(
    "user_retention_cohorts",
    oracle="""
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
firsts AS (
  SELECT user_id, CAST(date_trunc('week', min(day)) AS DATE) AS cohort_week
  FROM ev GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', day) AS DATE) AS wk FROM ev
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.wk) / 7 AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_active
FROM act a JOIN firsts f USING (user_id)
GROUP BY 1, 2
""",
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: users grouped by first-seen week
    (cohort), counted as active at each week offset. Week truncation is
    Monday-aligned in both engines, so offsets are exact multiples of
    7 days — the division is lossless."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("day")).cast("date").alias("cohort_week")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", "day").cast("date").alias("wk")
    ).distinct()
    return (
        act.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("wk", "cohort_week") / 7).cast("long").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )


ZSCORE_LOOKBACK = 7  # trailing days in the anomaly baseline
ZSCORE_THRESHOLD = 2.0


def daily_counts(events: DataFrame) -> DataFrame:
    """(day, event_type, n_events) — the one map-side-combinable pass
    over raw events that both the batch anomaly query and the streaming
    monitor score from."""
    return events.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )


def anomaly_flag_cols() -> list:
    """The z-score/flag output columns over a row carrying (n_events,
    mean_t, std_t) — ONE definition of the flag algebra shared by the
    batch query (trailing-window baseline) and the streaming monitor
    (fixed reference baseline). A deviation from a CONSTANT baseline
    (std = 0, z undefined) is infinitely many sigmas out — flagged, not
    nulled away."""
    z = (F.col("n_events") - F.col("mean_t")) / F.col("std_t")
    return [
        F.round("mean_t", 4).alias("baseline_mean"),
        F.round("std_t", 4).alias("baseline_std"),
        F.when(F.col("std_t") > 0, F.round(z, 4)).alias("zscore"),
        F.when(F.col("std_t") > 0, F.abs(z) > ZSCORE_THRESHOLD)
        .otherwise(F.col("n_events") != F.col("mean_t"))
        .alias("is_anomaly"),
    ]


def baseline_stats(daily: DataFrame) -> DataFrame:
    """Per-type (mean_t, std_t) over a reference period's daily counts
    — the FIXED baseline the streaming monitor scores against (the
    batch query derives its baseline per-day from the trailing window
    instead). Type-count-sized: always broadcastable."""
    return daily.groupBy("event_type").agg(
        F.avg("n_events").alias("mean_t"),
        F.stddev_pop("n_events").alias("std_t"),
    )


def score_daily_anomaly(events: DataFrame, baseline: DataFrame) -> DataFrame:
    """Score a (micro-)batch of events against a fixed per-type
    baseline — shared by the streaming monitor; same flag algebra as
    the batch query."""
    daily = daily_counts(events)
    return daily.join(F.broadcast(baseline), "event_type").select(
        "day", "event_type", "n_events", *anomaly_flag_cols()
    )


@query(
    "anomaly_zscore",
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT day, event_type, n_events,
         avg(n_events) OVER w AS mean{ZSCORE_LOOKBACK},
         stddev_pop(n_events) OVER w AS std{ZSCORE_LOOKBACK},
         CAST(count(*) OVER w AS BIGINT) AS cnt
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {ZSCORE_LOOKBACK} PRECEDING AND 1 PRECEDING)
)
SELECT day, event_type, n_events,
       round(mean{ZSCORE_LOOKBACK}, 4) AS baseline_mean,
       round(std{ZSCORE_LOOKBACK}, 4) AS baseline_std,
       CASE WHEN std{ZSCORE_LOOKBACK} > 0
            THEN round((n_events - mean{ZSCORE_LOOKBACK}) / std{ZSCORE_LOOKBACK}, 4) END AS zscore,
       CASE WHEN std{ZSCORE_LOOKBACK} > 0
            THEN abs((n_events - mean{ZSCORE_LOOKBACK}) / std{ZSCORE_LOOKBACK}) > {ZSCORE_THRESHOLD}
            ELSE n_events <> mean{ZSCORE_LOOKBACK} END AS is_anomaly
FROM stats WHERE cnt = {ZSCORE_LOOKBACK}
""",
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window volume anomalies: each (day, event_type) daily
    event count is z-scored against the mean/stddev of the PRECEDING
    {lb} days (current day excluded — an outlier must not dilute its
    own baseline); |z| > {thr} flags the day, and any deviation from a
    CONSTANT baseline (std = 0, z undefined) is flagged too. Only days
    with a full {lb}-day baseline are emitted (a cold-start day has no
    defensible score).

    Scale shape: raw events collapse in ONE map-side-combinable daily
    agg; the window then runs over the PRE-REDUCED (day × type) table,
    so each event_type partition holds #days rows — bounded by the
    calendar, not the event count — and the skewed-raw-key concern that
    rules out windows over fact rows (ir.py `_with_df` note) does not
    apply. stddev_pop (not sample) so both engines share one formula.
    """
    events = load_table(spark, sf_dir, "events")
    daily = daily_counts(events)
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-ZSCORE_LOOKBACK, -1)
    )
    stats = daily.select(
        "day",
        "event_type",
        "n_events",
        F.avg("n_events").over(w).alias("mean_t"),
        F.stddev_pop("n_events").over(w).alias("std_t"),
        F.count(F.lit(1)).over(w).cast("long").alias("cnt"),
    ).filter(F.col("cnt") == ZSCORE_LOOKBACK)
    return stats.select("day", "event_type", "n_events", *anomaly_flag_cols())


anomaly_zscore.__doc__ = (anomaly_zscore.__doc__ or "").format(
    lb=ZSCORE_LOOKBACK, thr=ZSCORE_THRESHOLD
)


EWMA_ALPHA = 0.3
EWMA_LAGS = 10  # truncation horizon: (1-α)^10 ≈ 0.028 residual mass


def _ewma_terms():
    """(weight, lag) pairs for the truncated kernel, newest first."""
    return [((1.0 - EWMA_ALPHA) ** j, j) for j in range(EWMA_LAGS)]


@query(
    "ewma_daily_revenue",
    oracle=f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         round(sum(o_totalprice), 2) AS day_revenue
  FROM orders GROUP BY 1
), lagged AS (
  SELECT day, day_revenue,
         { " + ".join(f"coalesce(lag(day_revenue, {j}) OVER (ORDER BY day) * {(1.0 - EWMA_ALPHA) ** j!r}, 0)" for j in range(EWMA_LAGS)) } AS wsum,
         { " + ".join(f"CASE WHEN lag(day_revenue, {j}) OVER (ORDER BY day) IS NOT NULL THEN {(1.0 - EWMA_ALPHA) ** j!r} ELSE 0 END" for j in range(EWMA_LAGS)) } AS wtot
  FROM daily
)
SELECT day, day_revenue, round(wsum / wtot, 4) AS ewma_revenue
FROM lagged
""",
)
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily revenue,
    truncated at {k} lags (finite-impulse form: weight (1-α)^j on the
    j-days-ago value, renormalized over the lags actually present so
    the series has no cold-start bias). The truncation keeps the
    kernel expressible as a FIXED set of lag() terms — identical
    algebra in both engines, no recursive state — while retaining
    ≈97% of the infinite kernel's mass at α={a}.

    Scale shape: like `cumulative_daily_revenue`, the global-ordered
    window runs on the already-reduced daily relation (#days rows), so
    the single-partition sort is calendar-bounded and trivially cheap
    at any fact-table scale; raw orders are touched once by the
    map-side-combinable daily agg."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("day_revenue")
    )
    w = Window.orderBy("day")
    wsum = sum(
        F.coalesce(F.lag("day_revenue", j).over(w) * F.lit(wt), F.lit(0.0))
        for wt, j in _ewma_terms()
    )
    wtot = sum(
        F.when(F.lag("day_revenue", j).over(w).isNotNull(), F.lit(wt)).otherwise(0.0)
        for wt, j in _ewma_terms()
    )
    return daily.select(
        "day",
        "day_revenue",
        F.round(wsum / wtot, 4).alias("ewma_revenue"),
    )


ewma_daily_revenue.__doc__ = (ewma_daily_revenue.__doc__ or "").format(
    k=EWMA_LAGS, a=EWMA_ALPHA
)


from etl_jlp_spark.operators.sessionize import _SESSIONIZED_CTE as _SESS_CTE  # noqa: E402


@query(
    "session_survival_km",
    oracle=f"""
WITH sess AS ({_SESS_CTE}), per_sess AS (
  SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS duration
  FROM sess GROUP BY 1, 2
), lasts AS (
  SELECT user_id, max(session_id) AS last_sid FROM per_sess GROUP BY 1
), dur AS (
  SELECT p.duration,
         CASE WHEN p.session_id < l.last_sid THEN 1 ELSE 0 END AS completed
  FROM per_sess p JOIN lasts l USING (user_id)
), grid AS (
  SELECT duration,
         CAST(count(*) AS BIGINT) AS n_sessions,
         CAST(sum(completed) AS BIGINT) AS d
  FROM dur GROUP BY duration
), risk AS (
  SELECT duration, d,
         CAST(sum(n_sessions) OVER (ORDER BY duration DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n
  FROM grid
), factored AS (
  SELECT duration, d, n, 1.0 - d * 1.0 / n AS factor FROM risk
), surv AS (
  SELECT duration, d, n,
         sum(CASE WHEN factor = 0 THEN 1 ELSE 0 END) OVER w AS zf,
         sum(CASE WHEN factor > 0 THEN ln(factor) END) OVER w AS lnsum
  FROM factored
  WINDOW w AS (ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CAST(duration AS BIGINT) AS session_len_events,
       n AS n_at_risk,
       d AS n_completed,
       CASE WHEN zf > 0 THEN 0.0 ELSE round(exp(coalesce(lnsum, 0.0)), 6) END AS survival
FROM surv WHERE d > 0
""",
)
def session_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival over SESSION length (events per session):
    S(k) = probability a session reaches more than k events. Each
    user's FINAL session is right-censored — the corpus window cut it
    off mid-flight, so it bounds the at-risk set without counting as a
    completed length (the thing a naive length histogram gets wrong:
    truncated sessions bias it short). All earlier sessions completed
    by construction (a 30-min gap closed them).

    S(k) = prod over completed lengths <= k of (1 - d_k/n_k), computed
    as exp of a windowed ln-sum with an explicit zero-factor guard
    (ln(0) is null in Spark and -inf in DuckDB — the CASE keeps both
    engines on finite arithmetic).

    Scale shape: sessionization is the standard per-user window (one
    shuffle on the high-cardinality user key); everything after the
    per-session count runs on the #distinct-lengths grid — dozens of
    rows at any corpus size. No driver collect anywhere."""
    from etl_jlp_spark.operators.sessionize import with_session_id

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    per_sess = (
        with_session_id(events)
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).cast("long").alias("duration"))
    )
    lasts = per_sess.groupBy("user_id").agg(F.max("session_id").alias("last_sid"))
    dur = per_sess.join(lasts, "user_id").select(
        "duration",
        F.when(F.col("session_id") < F.col("last_sid"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("completed"),
    )
    grid = dur.groupBy("duration").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("completed").cast("long").alias("d"),
    )
    w_desc = Window.orderBy(F.desc("duration")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = grid.select(
        "duration", "d", F.sum("n_sessions").over(w_desc).cast("long").alias("n")
    )
    factored = risk.withColumn(
        "factor", F.lit(1.0) - F.col("d") * F.lit(1.0) / F.col("n")
    )
    w_asc = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    surv = factored.select(
        "duration",
        "d",
        "n",
        F.sum(F.when(F.col("factor") == 0, 1).otherwise(0)).over(w_asc).alias("zf"),
        F.sum(F.when(F.col("factor") > 0, F.log("factor"))).over(w_asc).alias("lnsum"),
    )
    return surv.filter(F.col("d") > 0).select(
        F.col("duration").cast("long").alias("session_len_events"),
        F.col("n").alias("n_at_risk"),
        F.col("d").alias("n_completed"),
        F.when(F.col("zf") > 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.coalesce("lnsum", F.lit(0.0))), 6))
        .alias("survival"),
    )


@query(
    "cusum_changepoint",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, round(sum(value), 2) AS day_value
  FROM events GROUP BY 1
), stats AS (
  SELECT avg(day_value) AS mu, stddev_pop(day_value) AS sd FROM daily
), scored AS (
  SELECT d.day, d.day_value,
         CASE WHEN s.sd > 0 THEN
           round(sum((d.day_value - s.mu) / s.sd)
                 OVER (ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
           + 0.0
         END AS cusum
  FROM daily d CROSS JOIN stats s
)
SELECT day, day_value, cusum,
       abs(cusum) = max(abs(cusum)) OVER () AS is_changepoint
FROM scored
""",
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over daily event value: the cumulative
    sum of standardized daily deviations peaks (in absolute value) at
    the most likely mean-shift point — the classic offline CUSUM
    statistic. Flags the argmax day(s); the comparison runs on the
    ROUNDED statistic so both engines agree bit-for-bit.

    Scale shape: raw events collapse in one map-side-combinable daily
    agg; mean/std are a 1-row broadcast over the #days series; the
    cumulative window and global max run on calendar-bounded rows."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value"), 2).alias("day_value")
    )
    stats = daily.agg(
        F.avg("day_value").alias("mu"), F.stddev_pop("day_value").alias("sd")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        "day_value",
        F.when(
            F.col("sd") > 0,
            # + 0.0 canonicalizes IEEE -0.0 (round can emit it and the
            # engines disagree on the sign of a zero)
            F.round(F.sum((F.col("day_value") - F.col("mu")) / F.col("sd")).over(w), 4)
            + F.lit(0.0),
        ).alias("cusum"),
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return scored.withColumn(
        "is_changepoint", F.abs("cusum") == F.max(F.abs("cusum")).over(wall)
    )


# ---------------------------------------------------------------------------
# Behavioral sequence analytics: first-order Markov transitions and
# inter-arrival burstiness. Both run their window over user-partitioned
# event order — the partition key IS the user, so at 100 TB the sort is
# per-user-history-sized, never global.
# ---------------------------------------------------------------------------


@query(
    "event_transition_matrix",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
  FROM ordered WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type), 4)
         AS p_next,
       round(CAST(n AS DOUBLE) / sum(n) OVER (), 4) AS p_joint
FROM pairs
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences: counts, row-conditional P(next|prev), and joint share —
    the navigation-flow fingerprint product analytics reads to find
    dominant loops and dead ends.

    Plan: one user-partitioned lag window (sort bounded by each user's
    history), a |types|²-bounded pair aggregate, then two windows over
    that ≤25-row relation. Only the lag stage sees raw events."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wrow = Window.partitionBy("prev_type")
    wall = Window.partitionBy()
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wrow), 4).alias("p_next"),
        F.round(F.col("n").cast("double") / F.sum("n").over(wall), 4).alias("p_joint"),
    )


@query(
    "interarrival_burstiness",
    oracle="""
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
), agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(CAST(gap_us AS DECIMAL(38, 0))) AS DOUBLE) AS s1,
         CAST(sum(CAST(gap_us AS DECIMAL(38, 0))
                  * CAST(gap_us AS DECIMAL(38, 0))) AS DOUBLE) AS s2
  FROM gaps WHERE gap_us IS NOT NULL
  GROUP BY user_id HAVING count(*) >= 2
), st AS (
  SELECT user_id, n_gaps, s1 / n_gaps AS mu,
         sqrt((s2 - s1 * s1 / n_gaps) / (n_gaps - 1)) AS sd
  FROM agg
)
SELECT user_id, n_gaps,
       round(mu / 1e6, 2) AS mean_gap_s,
       round(sd / 1e6, 2) AS std_gap_s,
       round((sd - mu) / (sd + mu), 4) + 0.0 AS burstiness,
       round(sd / mu, 4) AS cv
FROM st
""",
)
def interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival statistics: mean/std gap, the Goh–Barabási
    burstiness B = (σ−μ)/(σ+μ) (−1 periodic, 0 Poisson, →1 bursty) and
    the coefficient of variation — the signal that separates scripted
    bot cadence (B≈−1) from bursty human sessions.

    Plan: user-partitioned lag window over integer epoch-microseconds,
    then exact DECIMAL(38) power sums per user (sum order can't perturb
    integers, so both engines agree bit-for-bit before the final
    float division) — one shuffle on user_id, output user-count-sized."""
    from etl_jlp_spark.functions.timeutil import epoch_us

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = epoch_us(F.col("ts"))
    gaps = (
        ev.select("user_id", "ts", "event_id")
        .withColumn("gap_us", us - F.lag(us).over(w))
        .filter(F.col("gap_us").isNotNull())
    )
    d = F.col("gap_us").cast("decimal(38,0)")
    agg = (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum(d).cast("double").alias("s1"),
            F.sum(d * d).cast("double").alias("s2"),
        )
        .filter(F.col("n_gaps") >= 2)
    )
    mu = F.col("s1") / F.col("n_gaps")
    sd = F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_gaps")) / (F.col("n_gaps") - 1))
    return agg.select(
        "user_id",
        "n_gaps",
        F.round(mu / 1e6, 2).alias("mean_gap_s"),
        F.round(sd / 1e6, 2).alias("std_gap_s"),
        (F.round((sd - mu) / (sd + mu), 4) + 0.0).alias("burstiness"),
        F.round(sd / mu, 4).alias("cv"),
    )


# ---------------------------------------------------------------------------
# Holt linear-trend smoothing: the level+trend upgrade of
# ewma_daily_revenue, with one-step-ahead forecast evaluation. The
# recursion l_t = αy + (1−α)(l+b), b_t = β(l_t−l) + (1−β)b has no
# closed form, so Spark runs it as a sequential `aggregate` HOF fold
# over the day-ordered per-type series and the oracle runs the SAME
# recurrence as a WITH RECURSIVE step join — same init (l₀=y₀, b₀=0),
# same IEEE ops from the same pre-update state, same order ⇒
# bit-identical. (DuckDB's list_reduce is NOT usable here: its struct
# constructor updates accumulator fields sequentially, so later field
# expressions see already-updated values — a different recurrence.)
# The folded array is DAYS-sized (the daily pre-aggregate does the
# heavy reduction), so per-group state is bounded at any corpus scale.
# ---------------------------------------------------------------------------

HOLT_ALPHA = 0.5
HOLT_BETA = 0.3

_HOLT_A = f"CAST({HOLT_ALPHA} AS DOUBLE)"
_HOLT_1A = f"CAST({1 - HOLT_ALPHA} AS DOUBLE)"
_HOLT_B = f"CAST({HOLT_BETA} AS DOUBLE)"
_HOLT_1B = f"CAST({1 - HOLT_BETA} AS DOUBLE)"
_HOLT_L2 = f"{_HOLT_A} * x.y + {_HOLT_1A} * (a.l + a.b)"
_HOLT_ERR = "(x.y - (a.l + a.b))"
_HOLT_FIELDS = (
    f"'y', x.y, "
    f"'l', {_HOLT_L2}, "
    f"'b', {_HOLT_B} * (({_HOLT_L2}) - a.l) + {_HOLT_1B} * a.b, "
    f"'sae', a.sae + abs({_HOLT_ERR}), "
    f"'sse', a.sse + {_HOLT_ERR} * {_HOLT_ERR}, "
    f"'n', a.n + 1"
)


@query(
    "holt_linear_eval",
    oracle=f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         round(sum(value), 2) AS y
  FROM events GROUP BY 1, 2
), idx AS (
  SELECT event_type,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS i,
         CAST(y AS DOUBLE) AS y
  FROM daily
), spans AS (
  SELECT event_type, max(i) AS n_days FROM idx GROUP BY event_type
), rec AS (
  SELECT event_type, i, y AS l, CAST(0.0 AS DOUBLE) AS b,
         CAST(0.0 AS DOUBLE) AS sae, CAST(0.0 AS DOUBLE) AS sse,
         CAST(0 AS BIGINT) AS n
  FROM idx WHERE i = 1
  UNION ALL
  SELECT a.event_type, x.i,
         {_HOLT_L2},
         {_HOLT_B} * (({_HOLT_L2}) - a.l) + {_HOLT_1B} * a.b,
         a.sae + abs({_HOLT_ERR}),
         a.sse + {_HOLT_ERR} * {_HOLT_ERR},
         a.n + 1
  FROM rec a JOIN idx x ON x.event_type = a.event_type AND x.i = a.i + 1
)
SELECT r.event_type, s.n_days,
       round(r.sae / r.n, 4) AS mae_holt,
       round(sqrt(r.sse / r.n), 4) AS rmse_holt,
       round(r.l, 4) AS level,
       round(r.b, 4) + 0.0 AS trend,
       round(r.l + r.b, 4) AS forecast_next
FROM rec r JOIN spans s ON r.event_type = s.event_type AND r.i = s.n_days
WHERE s.n_days >= 2
""",
)
def holt_linear_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Holt linear smoothing of daily revenue with
    one-step-ahead error accounting: MAE/RMSE of the rolling forecast
    l+b, final level/trend, and tomorrow's forecast.

    Plan: events reduce to (type, day) FIRST (map-side combinable);
    the fold then runs over a ≤days-length array per type — constant
    memory per group at any event volume. The oracle replays the same
    recurrence as a recursive CTE, proving it cross-engine."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("y"))
    )
    ser = daily.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("day", F.col("y").cast("double").alias("y")))
        ).alias("dayseq")
    )
    elems = (
        "transform(dayseq, s -> named_struct("
        "'y', s.y, 'l', s.y, 'b', CAST(0.0 AS DOUBLE), "
        "'sae', CAST(0.0 AS DOUBLE), 'sse', CAST(0.0 AS DOUBLE), 'n', CAST(0 AS BIGINT)))"
    )
    folded = (
        ser.withColumn("seq", F.expr(elems))
        .filter(F.size("seq") >= 2)
        .withColumn(
            "st",
            F.expr(
                f"aggregate(slice(seq, 2, size(seq) - 1), seq[0], "
                f"(a, x) -> named_struct({_HOLT_FIELDS}))"
            ),
        )
    )
    return folded.select(
        "event_type",
        F.size("seq").cast("long").alias("n_days"),
        F.round(F.col("st.sae") / F.col("st.n"), 4).alias("mae_holt"),
        F.round(F.sqrt(F.col("st.sse") / F.col("st.n")), 4).alias("rmse_holt"),
        F.round("st.l", 4).alias("level"),
        (F.round("st.b", 4) + 0.0).alias("trend"),
        F.round(F.col("st.l") + F.col("st.b"), 4).alias("forecast_next"),
    )


@query(
    "weekday_seasonality_index",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, round(sum(value), 2) AS rev
  FROM events GROUP BY 1
), wk AS (
  SELECT CAST(isodow(day) - 1 AS INT) AS weekday,
         CAST(count(*) AS BIGINT) AS n_days,
         round(avg(rev), 4) AS avg_revenue
  FROM daily GROUP BY 1
), o AS (SELECT avg(rev) AS overall FROM daily)
SELECT weekday, n_days, avg_revenue,
       round(avg_revenue / overall, 4) AS seasonality_index
FROM wk CROSS JOIN o
""",
)
def weekday_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality profile: average daily revenue per weekday
    (0=Monday) over the mean day, the multiplicative index a seasonal
    forecaster (seasonal_naive_eval, holt_linear_eval) divides out.

    Plan: events reduce to ~30 daily rows first; everything after is
    7-row arithmetic with the overall mean on a broadcast 1-row side."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("rev"))
    )
    wk = daily.groupBy(F.weekday("day").alias("weekday")).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.avg("rev"), 4).alias("avg_revenue"),
    )
    o = daily.agg(F.avg("rev").alias("overall"))
    return wk.crossJoin(F.broadcast(o)).select(
        "weekday",
        "n_days",
        "avg_revenue",
        F.round(F.col("avg_revenue") / F.col("overall"), 4).alias("seasonality_index"),
    )


# Iglewicz–Hoberg modified z-score: 0.6745·(x−med)/MAD, |z| > 3.5 flags.
MAD_THRESHOLD = 3.5


@query(
    "anomaly_mad_daily",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), med AS (
  SELECT event_type, quantile_cont(CAST(n AS DOUBLE), 0.5) AS med FROM daily GROUP BY 1
), mad AS (
  SELECT d.event_type, any_value(m.med) AS med,
         quantile_cont(abs(d.n - m.med), 0.5) AS mad
  FROM daily d JOIN med m ON d.event_type = m.event_type
  GROUP BY d.event_type
)
SELECT d.event_type, d.day, d.n, round(a.med, 2) AS med, round(a.mad, 2) AS mad,
       CASE WHEN a.mad > 0 THEN round(0.6745 * (d.n - a.med) / a.mad, 4) + 0.0 END
         AS robust_z,
       CASE WHEN a.mad > 0 THEN abs(0.6745 * (d.n - a.med) / a.mad) > {MAD_THRESHOLD}
            ELSE d.n <> a.med END AS is_anomaly
FROM daily d JOIN mad a ON d.event_type = a.event_type
""",
)
def anomaly_mad_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-count outliers: the Iglewicz–Hoberg modified
    z-score (median/MAD instead of mean/std) — one spike day can't
    drag the baseline after it, the failure mode anomaly_zscore's
    trailing mean has; degenerate MAD=0 falls back to flagging any
    deviation from the median.

    Plan: the only full-data stage is the (type, day) count; both
    medians run over the ≤ types×days daily relation, joined back on
    the 5-row type key (broadcast). At 100 TB swap quantile_cont for
    approx_percentile — same relation sizes."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(CAST(n AS DOUBLE), 0.5D)").alias("med")
    )
    mad = (
        daily.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med").alias("med"),
            F.expr("percentile(abs(n - med), 0.5D)").alias("mad"),
        )
    )
    rz = 0.6745 * (F.col("n") - F.col("med")) / F.col("mad")
    return daily.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "day",
        "n",
        F.round("med", 2).alias("med"),
        F.round("mad", 2).alias("mad"),
        F.when(F.col("mad") > 0, F.round(rz, 4) + 0.0).alias("robust_z"),
        F.when(F.col("mad") > 0, F.abs(rz) > MAD_THRESHOLD)
        .otherwise(F.col("n") != F.col("med"))
        .alias("is_anomaly"),
    )


# STL-lite: 7-day centered moving-average trend + additive weekday
# seasonal + residual. Window length must cover one full season.
STL_HALF = 3  # centered window: 3 preceding + self + 3 following


@query(
    "stl_decompose_daily",
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, round(sum(value), 2) AS rev
  FROM events GROUP BY 1
), t AS (
  SELECT day, rev,
         CASE WHEN count(*) OVER w = {2 * STL_HALF + 1}
              THEN round(avg(rev) OVER w, 4) + 0.0 END AS trend
  FROM daily
  WINDOW w AS (ORDER BY day
               ROWS BETWEEN {STL_HALF} PRECEDING AND {STL_HALF} FOLLOWING)
), s AS (
  SELECT day, rev, trend, CAST(isodow(day) - 1 AS INT) AS weekday,
         rev - trend AS det
  FROM t
), w AS (
  SELECT day, weekday, rev, trend,
         round(avg(det) OVER (PARTITION BY weekday), 4) + 0.0 AS seasonal
  FROM s
)
SELECT day, weekday, rev AS revenue, trend, seasonal,
       CASE WHEN trend IS NOT NULL
            THEN round(rev - trend - seasonal, 4) + 0.0 END AS resid
FROM w
""",
)
def stl_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive STL-lite decomposition of daily revenue: trend = 7-day
    centered moving average (null at the series edges where the window
    is short), seasonal = per-weekday mean of the detrended values,
    residual = what neither explains — the decomposition behind
    weekday_seasonality_index's multiplicative cousin, and the input a
    forecaster residual-tests.

    Plan: events reduce to ~|days| rows first; the centered window and
    the weekday partition both run over that bounded daily relation
    (the global-ordered window is |days|-sized — same justification as
    ewma_daily_revenue). Rounding + the ``+ 0.0`` −0.0 guard applied
    identically in both engines."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("rev"))
    )
    span = 2 * STL_HALF + 1
    w = Window.orderBy("day").rowsBetween(-STL_HALF, STL_HALF)
    t = daily.select(
        "day",
        "rev",
        F.when(
            F.count(F.lit(1)).over(w) == span, F.round(F.avg("rev").over(w), 4) + 0.0
        ).alias("trend"),
    )
    s = t.select(
        "day",
        "rev",
        "trend",
        F.weekday("day").alias("weekday"),
        (F.col("rev") - F.col("trend")).alias("det"),
    )
    wk = Window.partitionBy("weekday")
    out = s.select(
        "day",
        "weekday",
        "rev",
        "trend",
        (F.round(F.avg("det").over(wk), 4) + 0.0).alias("seasonal"),
    )
    return out.select(
        "day",
        "weekday",
        F.col("rev").alias("revenue"),
        "trend",
        "seasonal",
        F.when(
            F.col("trend").isNotNull(),
            F.round(F.col("rev") - F.col("trend") - F.col("seasonal"), 4) + 0.0,
        ).alias("resid"),
    )


@query(
    "markov_next_event_eval",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
), trans AS (
  SELECT prev_type, event_type AS next_type FROM ordered WHERE prev_type IS NOT NULL
), counts AS (
  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
  FROM trans GROUP BY 1, 2
), best AS (
  SELECT prev_type, next_type AS predicted_next, n AS n_pred,
         row_number() OVER (PARTITION BY prev_type ORDER BY n DESC, next_type ASC) AS rk,
         sum(n) OVER (PARTITION BY prev_type) AS n_total
  FROM counts
)
SELECT prev_type, predicted_next,
       CAST(n_total AS BIGINT) AS n_transitions,
       n_pred AS n_correct,
       round(CAST(n_pred AS DOUBLE) / n_total, 4) AS accuracy
FROM best WHERE rk = 1
""",
)
def markov_next_event_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-class next-event baseline: for each current event type,
    predict the most frequent successor (deterministic count-then-name
    tie-break) and report its resubstitution accuracy — the floor any
    sequence model must beat, and the companion eval to
    event_transition_matrix (same lag window, same counts; accuracy =
    the row maximum of P(next|prev)).

    Plan: identical cost shape to the transition matrix — one
    user-partitioned lag, a |types|²-bounded aggregate, windows over
    that tiny relation."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    counts = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wbest = Window.partitionBy("prev_type").orderBy(F.desc("n"), F.asc("next_type"))
    wtot = Window.partitionBy("prev_type")
    best = counts.select(
        "prev_type",
        F.col("next_type").alias("predicted_next"),
        F.col("n").alias("n_pred"),
        F.row_number().over(wbest).alias("rk"),
        F.sum("n").over(wtot).alias("n_total"),
    ).filter(F.col("rk") == 1)
    return best.select(
        "prev_type",
        "predicted_next",
        F.col("n_total").cast("long").alias("n_transitions"),
        F.col("n_pred").alias("n_correct"),
        F.round(F.col("n_pred").cast("double") / F.col("n_total"), 4).alias("accuracy"),
    )


@query(
    "orders_monthly_yoy",
    oracle="""
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1
)
SELECT cur.month, cur.rev_cents,
       CAST(prev.rev_cents AS DOUBLE) AS prev_year_cents,
       CASE WHEN prev.rev_cents > 0
            THEN round((CAST(cur.rev_cents AS DOUBLE) - prev.rev_cents)
                       / prev.rev_cents, 6) END AS yoy_growth
FROM monthly cur
LEFT JOIN monthly prev ON prev.month = cur.month - INTERVAL 12 MONTH
""",
)
def orders_monthly_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with year-over-year growth: exact integer-cent
    monthly sums, matched to the same month a year earlier by an
    explicit add_months self-join (robust to missing months, unlike a
    lag-12 window). One combinable aggregate; the self-join operand is
    the months-sized relation."""
    monthly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("rev_cents")
        )
    )
    prev = monthly.select(
        F.add_months("month", 12).alias("month"), F.col("rev_cents").alias("prev_year_cents")
    )
    return monthly.join(F.broadcast(prev), "month", "left").select(
        "month",
        "rev_cents",
        # DOUBLE, not BIGINT: the first 12 months have no prior year, and a
        # NULL-bearing int64 column goes float64 through any pandas
        # materialization — as double in BOTH engines the column is
        # identical no matter how the driver fetches (exact to 2^53 cents).
        F.col("prev_year_cents").cast("double").alias("prev_year_cents"),
        F.when(
            F.col("prev_year_cents") > 0,
            F.round(
                (F.col("rev_cents").cast("double") - F.col("prev_year_cents"))
                / F.col("prev_year_cents"),
                6,
            ),
        ).alias("yoy_growth"),
    )


@query(
    "events_dau_wau_mau",
    oracle="""
WITH activity AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), days AS (SELECT DISTINCT day FROM activity),
contrib7 AS (
  SELECT DISTINCT d.obs_day, a.user_id
  FROM activity a, LATERAL (
    SELECT unnest(generate_series(a.day, a.day + INTERVAL 6 DAY, INTERVAL 1 DAY))::DATE
      AS obs_day
  ) d
), contrib30 AS (
  SELECT DISTINCT d.obs_day, a.user_id
  FROM activity a, LATERAL (
    SELECT unnest(generate_series(a.day, a.day + INTERVAL 29 DAY, INTERVAL 1 DAY))::DATE
      AS obs_day
  ) d
)
SELECT dy.day,
       (SELECT CAST(count(*) AS BIGINT) FROM activity a WHERE a.day = dy.day) AS dau,
       (SELECT CAST(count(*) AS BIGINT) FROM contrib7 c WHERE c.obs_day = dy.day) AS wau,
       (SELECT CAST(count(*) AS BIGINT) FROM contrib30 c WHERE c.obs_day = dy.day) AS mau
FROM days dy
""",
)
def events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact daily/weekly/monthly active users per observed day: each
    (day, user) activity row CONTRIBUTES itself forward to the 7/30
    trailing windows via a sequence explode, then one distinct count
    per observation day — linear fan-out (×7/×30), never a
    day×activity range join. The correctness anchor for the HLL
    streaming monitor (hll_distinct_daily); at 100 TB swap the
    distinct for per-day HLL register merges with identical output
    shape."""
    ev = load_table(spark, sf_dir, "events")
    activity = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = activity.select("day").distinct()

    def trailing(n_days: int, name: str) -> DataFrame:
        contrib = activity.select(
            F.explode(
                F.expr(f"sequence(day, date_add(day, {n_days - 1}), interval 1 day)")
            ).alias("obs_day"),
            "user_id",
        ).distinct()
        return contrib.groupBy(F.col("obs_day").alias("day")).agg(
            F.count(F.lit(1)).cast("long").alias(name)
        )

    dau = activity.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    return (
        days.join(dau, "day", "left")
        .join(trailing(7, "wau"), "day", "left")
        .join(trailing(30, "mau"), "day", "left")
        .select("day", "dau", "wau", "mau")
    )


# ---------------------------------------------------------------------------
# Holt-Winters additive seasonal (m = 7): level + trend + weekly
# seasonal state, one-step-ahead evaluated — the seasonal upgrade of
# holt_linear_eval, same fold ↔ WITH RECURSIVE proof pattern. State is
# 9 doubles + a 7-slot rotating seasonal array per series: bounded at
# any corpus size because the daily pre-aggregate does the reduction.
# ---------------------------------------------------------------------------

HW_ALPHA = 0.3
HW_BETA = 0.1
HW_GAMMA = 0.2
HW_M = 7  # weekly seasonality

_HW_A = f"CAST({HW_ALPHA} AS DOUBLE)"
_HW_1A = f"CAST({1 - HW_ALPHA} AS DOUBLE)"
_HW_B = f"CAST({HW_BETA} AS DOUBLE)"
_HW_1B = f"CAST({1 - HW_BETA} AS DOUBLE)"
_HW_G = f"CAST({HW_GAMMA} AS DOUBLE)"
_HW_1G = f"CAST({1 - HW_GAMMA} AS DOUBLE)"


def _hw_step(seas: str) -> dict[str, str]:
    """The five step expressions with IDENTICAL parenthesization in
    both engines; ``seas`` is how the engine spells s_(t-7)."""
    lnew = f"({_HW_A} * (x.y - {seas}) + {_HW_1A} * (a.l + a.b))"
    return {
        "err": f"(x.y - ((a.l + a.b) + {seas}))",
        "lnew": lnew,
        "bnew": f"({_HW_B} * ({lnew} - a.l) + {_HW_1B} * a.b)",
        "snew": f"({_HW_G} * (x.y - {lnew}) + {_HW_1G} * {seas})",
    }


def _hw_init_l0(y: str) -> str:
    """((((((0+y1)+y2)+…)+y7)/7) — left-associated, both engines."""
    acc = "CAST(0.0 AS DOUBLE)"
    for i in range(1, HW_M + 1):
        acc = f"({acc} + {y.format(i=i)})"
    return f"({acc} / CAST(7.0 AS DOUBLE))"


def _hw_oracle() -> str:
    st = _hw_step("a.s1")
    # rename fold spellings to the recursive-CTE spellings
    for k in st:
        st[k] = st[k].replace("x.y", "nx.y").replace("a.l", "r.l").replace(
            "a.b", "r.b"
        ).replace("a.s1", "r.s1")
    y = "max(CASE WHEN i = {i} THEN y END)"
    init_l0 = _hw_init_l0(y)
    init_s = ", ".join(
        f"{y.format(i=i)} - {init_l0} AS s{i}" for i in range(1, HW_M + 1)
    )
    rot = ", ".join(f"r.s{i + 1} AS s{i}" for i in range(1, HW_M))
    return f"""
WITH RECURSIVE daily AS (
  SELECT CAST(ts AS DATE) AS day, round(sum(value), 2) AS y
  FROM events GROUP BY 1
), idx AS (
  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
         CAST(y AS DOUBLE) AS y
  FROM daily
), init AS (
  SELECT CAST({HW_M} AS BIGINT) AS i, {init_l0} AS l, CAST(0.0 AS DOUBLE) AS b,
         {init_s},
         CAST(0.0 AS DOUBLE) AS sae, CAST(0.0 AS DOUBLE) AS sse,
         CAST(0 AS BIGINT) AS n
  FROM idx WHERE i <= {HW_M}
), rec AS (
  SELECT * FROM init
  UNION ALL
  SELECT nx.i, {st['lnew']} AS l, {st['bnew']} AS b,
         {rot}, {st['snew']} AS s{HW_M},
         r.sae + abs({st['err']}) AS sae,
         r.sse + {st['err']} * {st['err']} AS sse,
         r.n + 1 AS n
  FROM rec r JOIN idx nx ON nx.i = r.i + 1
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM idx) AS n_days,
       n AS n_eval,
       round(sae / n, 4) + 0.0 AS mae_hw,
       round(sqrt(sse / n), 4) + 0.0 AS rmse_hw,
       round(l, 4) + 0.0 AS level,
       round(b, 4) + 0.0 AS trend,
       round((l + b) + s1, 4) + 0.0 AS forecast_next
FROM rec WHERE i = (SELECT max(i) FROM idx)
"""


@query("holt_winters_eval", oracle=_hw_oracle())
def holt_winters_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (level + trend + weekly seasonal, m=7) on
    total daily event revenue, one-step-ahead evaluated: MAE/RMSE of
    the rolling forecast (l + b + s_(t-7)), final state, and
    tomorrow's seasonal forecast.

    Init is the textbook anchor: l₀ = mean of the first week, b₀ = 0,
    sᵢ = yᵢ − l₀. The Spark side folds a 9-field struct (level, trend,
    7-slot ROTATING seasonal array, error sums) over the day-ordered
    series via the aggregate HOF; the oracle replays the identical
    recurrence as a WITH RECURSIVE step join with the seasonal array
    unrolled into 7 columns — same init, same IEEE expression shapes,
    same order ⇒ bit-identical (the holt_linear_eval proof pattern).
    Per-series state is constant; the fold input is days-sized."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("y"))
    )
    ser = daily.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct("day", F.col("y").cast("double").alias("y")))
        ).alias("dayseq")
    )
    st = _hw_step("element_at(a.s, 1)")
    y = "element_at(seq, {i}).y"
    init_l0 = _hw_init_l0(y)
    init_s = ", ".join(f"{y.format(i=i)} - {init_l0}" for i in range(1, HW_M + 1))
    init = (
        f"named_struct('l', {init_l0}, 'b', CAST(0.0 AS DOUBLE), "
        f"'s', array({init_s}), "
        f"'sae', CAST(0.0 AS DOUBLE), 'sse', CAST(0.0 AS DOUBLE), "
        f"'n', CAST(0 AS BIGINT))"
    )
    step = (
        f"named_struct('l', {st['lnew']}, 'b', {st['bnew']}, "
        f"'s', concat(slice(a.s, 2, {HW_M - 1}), array({st['snew']})), "
        f"'sae', a.sae + abs({st['err']}), "
        f"'sse', a.sse + {st['err']} * {st['err']}, "
        f"'n', a.n + 1)"
    )
    folded = (
        ser.withColumn(
            "seq", F.expr("transform(dayseq, d -> named_struct('y', d.y))")
        )
        .filter(F.size("seq") > HW_M)
        .withColumn(
            "st",
            F.expr(
                f"aggregate(slice(seq, {HW_M + 1}, size(seq) - {HW_M}), {init}, "
                f"(a, x) -> {step})"
            ),
        )
    )
    return folded.select(
        F.size("seq").cast("long").alias("n_days"),
        F.col("st.n").cast("long").alias("n_eval"),
        (F.round(F.col("st.sae") / F.col("st.n"), 4) + 0.0).alias("mae_hw"),
        (F.round(F.sqrt(F.col("st.sse") / F.col("st.n")), 4) + 0.0).alias("rmse_hw"),
        (F.round("st.l", 4) + 0.0).alias("level"),
        (F.round("st.b", 4) + 0.0).alias("trend"),
        (F.round(F.col("st.l") + F.col("st.b") + F.element_at("st.s", 1), 4) + 0.0).alias(
            "forecast_next"
        ),
    )


@query(
    "user_active_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), numbered AS (
  SELECT user_id,
         date_diff('day', DATE '2024-01-01', day)
           - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days
), streaks AS (
  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS streak_len
  FROM numbered GROUP BY user_id, grp
), per_user_max AS (
  SELECT user_id, max(streak_len) AS max_len FROM streaks GROUP BY user_id
)
SELECT s.streak_len,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(count(DISTINCT s.user_id) AS BIGINT) AS n_users,
       CAST((SELECT count(*) FROM per_user_max m WHERE m.max_len = s.streak_len)
            AS BIGINT) AS n_users_peak
FROM streaks s GROUP BY s.streak_len
""",
)
def user_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-active-day streaks per user (gaps-and-islands via
    the day-index-minus-row-number group key), reported as a streak
    length histogram: how many streaks of each length exist, how many
    users ever hit that length, and for how many users it is their
    PEAK streak — the engagement-depth report behind DAU durability
    claims.

    Plan: distinct (user, day) → per-user row_number window (partition
    = user, already the shuffle key of the distinct) → two
    map-side-combinable aggregates. Everything after the first shuffle
    is keyed by user_id, so the window and the streak count reuse one
    exchange; the histogram is |max_streak|-bounded. At 100 TB the
    only wide relation is the distinct day table (∝ user-days)."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    wu = Window.partitionBy("user_id").orderBy("day")
    numbered = days.select(
        "user_id",
        (F.datediff("day", F.lit("2024-01-01")) - F.row_number().over(wu)).alias("grp"),
    )
    streaks = numbered.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("streak_len")
    )
    per_user_max = streaks.groupBy("user_id").agg(F.max("streak_len").alias("max_len"))
    peak = per_user_max.groupBy(F.col("max_len").alias("streak_len")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users_peak")
    )
    hist = streaks.groupBy("streak_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    return hist.join(F.broadcast(peak), "streak_len", "left").select(
        "streak_len",
        "n_streaks",
        "n_users",
        F.coalesce("n_users_peak", F.lit(0)).cast("long").alias("n_users_peak"),
    )


# ---------------------------------------------------------------------------
# Spectral + conformal forecast tooling over the daily-revenue series:
# the periodogram answers "WHICH cycle dominates" (the seasonality
# detectors above all ASSUME weekly), and the split-conformal interval
# turns any point forecaster into a calibrated interval with a finite-
# sample guarantee — the distribution-free eval modern forecast
# pipelines attach to every model.
# ---------------------------------------------------------------------------

PGRAM_PERIODS = list(range(2, 11))  # candidate cycles, days
TWO_PI = 6.283185307179586
CONF_SEASON = 7  # seasonal-naive lag for the conformal base forecaster
CONF_CAL_FRAC = 0.7  # leading fraction of days used for calibration
CONF_ALPHA = 0.9  # target coverage


_DAILY_CENTS_SQL = """
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1
), idx AS (
  SELECT day, rev_cents,
         CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS d
  FROM daily
)"""


@query(
    "periodogram_daily_revenue",
    oracle=f"""
WITH {_DAILY_CENTS_SQL},
m AS (SELECT sum(rev_cents) / CAST(count(*) AS DOUBLE) AS mu, count(*) AS n FROM idx),
terms AS (
  SELECT p.p, i.d, (i.rev_cents - m.mu) AS c,
         cos({TWO_PI} * i.d / p.p) AS co, sin({TWO_PI} * i.d / p.p) AS si
  FROM idx i CROSS JOIN m CROSS JOIN (
    SELECT unnest([{", ".join(str(p) for p in PGRAM_PERIODS)}]) AS p
  ) p
), pw AS (
  SELECT p,
         sum(c * co) * sum(c * co) + sum(c * si) * sum(c * si) AS power
  FROM terms GROUP BY p
)
SELECT CAST(p AS INT) AS period_days,
       round(power / sum(power) OVER (), 4) AS power_share,
       CAST(row_number() OVER (ORDER BY power DESC, p) AS INT) AS rank
FROM pw
""",
)
def periodogram_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete periodogram of mean-centered daily revenue at candidate
    periods {lo}–{hi} days: per period the share of spectral power
    (|Σ c_d·e^(−2πid/p)|², normalized across candidates) and the rank —
    the cycle DETECTOR that justifies (or refutes) the weekly
    seasonality every m=7 operator above assumes.

    Plan: the fact table collapses to the exact-cents daily series
    once; the period sweep is a broadcast cross join of that
    days-bounded relation with {np} period rows, reduced by one
    combinable (period) aggregate — never a second fact pass. Day
    index comes from a row_number over the daily relation.""".replace(
        "{lo}", str(PGRAM_PERIODS[0])
    ).replace("{hi}", str(PGRAM_PERIODS[-1])).replace("{np}", str(len(PGRAM_PERIODS)))
    orders = load_table(spark, sf_dir, "orders")
    # localCheckpoint: the mean branch and the term expansion prune
    # different column subsets of the daily rollup, which specializes
    # the subtree under each and defeats ReusedExchange — without the
    # cut the FACT table is scanned twice (caught by the plan
    # assertion; the checkpointed relation is days-bounded, ~2.4k rows)
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("rev_cents")
    ).localCheckpoint(eager=False)
    idx = daily.select(
        "rev_cents",
        (F.row_number().over(Window.orderBy("day")) - 1).cast("long").alias("d"),
    )
    m = idx.agg(
        (F.sum("rev_cents") / F.count(F.lit(1)).cast("double")).alias("mu")
    )
    periods = spark.createDataFrame([(p,) for p in PGRAM_PERIODS], "p int")
    terms = (
        idx.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(periods))
        .select(
            "p",
            (F.col("rev_cents") - F.col("mu")).alias("c"),
            F.cos(F.lit(TWO_PI) * F.col("d") / F.col("p")).alias("co"),
            F.sin(F.lit(TWO_PI) * F.col("d") / F.col("p")).alias("si"),
        )
    )
    pw = terms.groupBy("p").agg(
        (
            F.sum(F.col("c") * F.col("co")) * F.sum(F.col("c") * F.col("co"))
            + F.sum(F.col("c") * F.col("si")) * F.sum(F.col("c") * F.col("si"))
        ).alias("power")
    )
    w = Window.partitionBy()
    return pw.select(
        F.col("p").cast("int").alias("period_days"),
        F.round(F.col("power") / F.sum("power").over(w), 4).alias("power_share"),
        F.row_number().over(Window.orderBy(F.desc("power"), "p")).cast("int").alias("rank"),
    )


@query(
    "conformal_forecast_interval",
    oracle=f"""
WITH {_DAILY_CENTS_SQL},
resid AS (
  SELECT d, rev_cents,
         abs(rev_cents - lag(rev_cents, {CONF_SEASON}) OVER (ORDER BY d)) AS ar
  FROM idx
), split AS (
  SELECT r.*, (SELECT CAST(floor({CONF_CAL_FRAC} * count(*)) AS BIGINT) FROM resid
               WHERE ar IS NOT NULL) AS n_cal,
         row_number() OVER (ORDER BY d) AS rn
  FROM resid r WHERE ar IS NOT NULL
), q AS (
  SELECT quantile_cont(ar, {CONF_ALPHA}) AS qhat FROM split WHERE rn <= n_cal
)
SELECT (SELECT CAST(max(n_cal) AS BIGINT) FROM split) AS n_cal,
       (SELECT CAST(count(*) AS BIGINT) FROM split WHERE rn > n_cal) AS n_eval,
       round(q.qhat / 100.0, 2) AS q_usd,
       round((SELECT count(*) FILTER (WHERE s.ar <= q.qhat)
              FROM split s WHERE s.rn > s.n_cal)
             / CAST((SELECT count(*) FROM split WHERE rn > n_cal) AS DOUBLE), 4)
         AS coverage,
       CAST({CONF_ALPHA} AS DOUBLE) AS target
FROM q
""",
)
def conformal_forecast_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal interval for the seasonal-naive (lag-{m})
    forecaster on daily revenue: the {a}-quantile of absolute
    calibration residuals (leading {f:.0%} of days) becomes the
    interval half-width, and the report measures realized coverage on
    the held-out tail — the distribution-free calibration check that
    should come back ≈ target if the residuals are exchangeable.

    Plan: residuals are EXACT integer cents (rev − lag rev), so the
    quantile interpolates identical integers in both engines; the
    series relation is days-bounded, the quantile is one ordered agg
    over the calibration slice, coverage one conditional count. At
    100 TB only the daily rollup touches the fact table.""".format(
        m=CONF_SEASON, a=CONF_ALPHA, f=CONF_CAL_FRAC
    )
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("rev_cents")
    )
    wd = Window.orderBy("day")
    resid = daily.select(
        F.abs(
            F.col("rev_cents") - F.lag("rev_cents", CONF_SEASON).over(wd)
        ).alias("ar"),
        F.row_number().over(wd).alias("_all_rn"),
    ).filter(F.col("ar").isNotNull())
    # same single-fact-pass cut as periodogram: three consumers
    # (count, quantile, coverage) would each re-derive the rollup
    split = resid.select(
        "ar", F.row_number().over(Window.orderBy("_all_rn")).alias("rn")
    ).localCheckpoint(eager=False)
    counts = split.agg(
        F.floor(CONF_CAL_FRAC * F.count(F.lit(1))).cast("long").alias("n_cal"),
        F.count(F.lit(1)).alias("n_tot"),
    )
    with_cal = split.crossJoin(F.broadcast(counts))
    q = (
        with_cal.filter(F.col("rn") <= F.col("n_cal"))
        .agg(F.expr(f"percentile(ar, {CONF_ALPHA})").alias("qhat"))
    )
    ev = with_cal.filter(F.col("rn") > F.col("n_cal")).crossJoin(F.broadcast(q))
    return ev.agg(
        F.max("n_cal").cast("long").alias("n_cal"),
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.round(F.max("qhat") / 100.0, 2).alias("q_usd"),
        F.round(
            F.sum(F.when(F.col("ar") <= F.col("qhat"), 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("coverage"),
        F.lit(CONF_ALPHA).alias("target"),
    )


# ---------------------------------------------------------------------------
# Entropy rate of the event-type Markov chain — how predictable is the
# next event given the current one? (event_transition_matrix shows the
# probabilities; this collapses them into the information-theoretic
# summary, with the marginal entropy as the no-memory baseline.)
# ---------------------------------------------------------------------------


@query(
    "markov_entropy_rate",
    oracle="""
WITH ordered AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
), trans AS (
  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS c
  FROM ordered WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
), rows_tot AS (
  SELECT prev_type, CAST(sum(c) AS BIGINT) AS rc FROM trans GROUP BY 1
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n FROM trans
), h AS (
  SELECT sum(CAST(t.c AS DOUBLE) / tot.n
             * ln(CAST(r.rc AS DOUBLE) / t.c)) AS h_rate,
         CAST(count(DISTINCT t.prev_type) AS BIGINT) AS n_states,
         any_value(tot.n) AS n
  FROM trans t JOIN rows_tot r ON t.prev_type = r.prev_type CROSS JOIN tot
), hm AS (
  SELECT sum(CAST(rc AS DOUBLE) / tot.n * ln(CAST(tot.n AS DOUBLE) / rc)) AS h_marg
  FROM rows_tot CROSS JOIN tot
)
SELECT h.n AS n_transitions, h.n_states,
       round(h.h_rate, 6) + 0.0 AS entropy_rate_nats,
       round(hm.h_marg, 6) + 0.0 AS marginal_entropy_nats,
       round(1.0 - h.h_rate / hm.h_marg, 6) + 0.0 AS predictability_gain
FROM h CROSS JOIN hm
""",
)
def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate H = −Σ_ij p(i)·p(j|i)·ln p(j|i) of the per-user
    event-type transition chain (empirical stationary weights), next
    to the marginal entropy H(π) and the predictability gain
    1 − H_rate/H_marginal — how much knowing the current event type
    helps predict the next. Counts are integers; the ≤|types|² cell
    log-sum is the established cell-relation tolerance (round 6).

    Plan: the event_transition_matrix lag window (one user_id
    exchange), then constant-space algebra on ≤ 25 cells."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select("event_type", F.lag("event_type").over(w).alias("prev_type"))
    trans = (
        ordered.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)  # ≤ |types|² cells; consumed thrice
    )
    rows_tot = trans.groupBy("prev_type").agg(F.sum("c").cast("long").alias("rc"))
    tot = trans.agg(F.sum("c").cast("long").alias("n"))
    h = (
        trans.join(F.broadcast(rows_tot), "prev_type")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.col("c").cast("double")
                / F.col("n")
                * F.log(F.col("rc").cast("double") / F.col("c"))
            ).alias("h_rate"),
            F.countDistinct("prev_type").cast("long").alias("n_states"),
            F.any_value("n").alias("n"),
        )
    )
    hm = rows_tot.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.col("rc").cast("double") / F.col("n") * F.log(F.col("n").cast("double") / F.col("rc"))
        ).alias("h_marg")
    )
    return h.crossJoin(F.broadcast(hm)).select(
        F.col("n").alias("n_transitions"),
        "n_states",
        F.round("h_rate", 6).alias("entropy_rate_nats"),
        F.round("h_marg", 6).alias("marginal_entropy_nats"),
        F.round(1.0 - F.col("h_rate") / F.col("h_marg"), 6).alias("predictability_gain"),
    )


# ---------------------------------------------------------------------------
# Temporal variogram of daily revenue: γ(h) = ½·E[(x_{t+h} − x_t)²]
# for lags 1..7 — the geostatistics view of temporal structure
# (acf_daily_revenue normalizes by variance; the variogram keeps
# absolute dollar² units, so the sill/nugget read off directly).
# ---------------------------------------------------------------------------

VARIOGRAM_MAX_LAG = 7


@query(
    "variogram_daily",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1
), lags AS (
  SELECT unnest(generate_series(1, {VARIOGRAM_MAX_LAG})) AS h
), pairs AS (
  SELECT l.h, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CAST(b.rev - a.rev AS DECIMAL(38,0)) * (b.rev - a.rev))
              AS DECIMAL(38,0)) AS ssd
  FROM lags l
  JOIN daily a ON TRUE
  JOIN daily b ON b.day = a.day + CAST(l.h AS INTEGER)
  GROUP BY l.h
)
SELECT CAST(h AS BIGINT) AS lag_days, n_pairs,
       round(CAST(ssd AS DOUBLE) / (2.0 * n_pairs), 2) + 0.0 AS semivariance
FROM pairs
""",
)
def variogram_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical semivariogram of daily revenue at lags 1..{H} days:
    γ(h) = Σ(x_{{t+h}} − x_t)² / (2·n_pairs), with the squared
    differences of whole-dollar integers accumulated in DECIMAL(38,0)
    — exact until the single division.

    Plan: the acf_daily_revenue shape — calendar-bounded day series,
    lag self-join by date arithmetic, ≤ {H} output rows."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(F.round("o_totalprice").cast("long")).cast("long").alias("rev"))
        .localCheckpoint(eager=True)  # tiny; both join sides
    )
    lags = spark.range(1, VARIOGRAM_MAX_LAG + 1).select(F.col("id").cast("int").alias("h"))
    a = daily.select(F.col("day").alias("da"), F.col("rev").alias("ra"))
    b = daily.select(F.col("day").alias("db"), F.col("rev").alias("rb"))
    pairs = (
        F.broadcast(lags)
        .join(a, F.lit(True))
        .join(b, F.expr("db = date_add(da, h)"))
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum((F.col("rb") - F.col("ra")).cast("decimal(38,0)") * (F.col("rb") - F.col("ra")))
            .cast("decimal(38,0)")
            .alias("ssd"),
        )
    )
    return pairs.select(
        F.col("h").cast("long").alias("lag_days"),
        "n_pairs",
        F.round(F.col("ssd").cast("double") / (2.0 * F.col("n_pairs")), 2).alias(
            "semivariance"
        ),
    )


variogram_daily.__doc__ = (variogram_daily.__doc__ or "").format(H=VARIOGRAM_MAX_LAG)


# ---------------------------------------------------------------------------
# Taylor's power law: does demand variance scale as a power of mean
# demand across parts (Var ∝ μ^b)? The mean–variance scaling exponent
# that decides between Poisson (b = 1) and aggregation/clustering
# (b → 2) — the cross-sectional sibling of event_count_dispersion's
# per-type index.
# ---------------------------------------------------------------------------

TPL_MIN_DAYS = 10  # parts with fewer shipment days are too noisy to fit
TPL_LN_SCALE = 1_000_000  # e6-quantized ln(mean), ln(var)


@query(
    "taylor_power_law",
    oracle=f"""
WITH daily AS (
  SELECT l_partkey, CAST(l_shipdate AS DATE) AS day,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1, 2
), parts AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(qty) AS BIGINT) AS s,
         CAST(sum(CAST(qty AS DECIMAL(38,0)) * qty) AS DECIMAL(38,0)) AS ss
  FROM daily GROUP BY 1 HAVING count(*) >= {TPL_MIN_DAYS}
), lnpts AS (
  SELECT CAST(round(ln(CAST(s AS DOUBLE) / n) * {TPL_LN_SCALE}) AS BIGINT) AS x,
         CAST(round(ln((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s)
                       / (CAST(n AS DOUBLE) * (n - 1))) * {TPL_LN_SCALE}) AS BIGINT) AS y
  FROM parts
  WHERE CAST(n AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s > 0
), mom AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy,
         CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx
  FROM lnpts
)
SELECT m AS n_parts,
       round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
             / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx),
             6) + 0.0 AS taylor_b,
       round((CAST(sy AS DOUBLE) - (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                                    - CAST(sx AS DOUBLE) * sy)
                                   / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                                      - CAST(sx AS DOUBLE) * sx) * sx)
             / m / {TPL_LN_SCALE}, 6) + 0.0 AS ln_a
FROM mom
""",
)
def taylor_power_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Taylor's power-law exponent across parts: OLS of ln(var) on
    ln(mean) of daily shipped quantity (parts with ≥ {D} shipment
    days). The per-part ln points are e6-quantized to integers — so
    the regression moments are exact integer/DECIMAL(38,0) sums and
    both engines fit identical operands; slope b and intercept ln(a)
    are single double expressions.

    Plan: (part, day) agg → part-grain moment agg (both combinable) →
    1-row fit; nothing larger than the part relation shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy("l_partkey", F.to_date("l_shipdate").alias("day")).agg(
        F.sum(F.round("l_quantity").cast("long")).cast("long").alias("qty")
    )
    parts = (
        daily.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("qty").cast("long").alias("s"),
            F.sum(F.col("qty").cast("decimal(38,0)") * F.col("qty"))
            .cast("decimal(38,0)")
            .alias("ss"),
        )
        .where(F.col("n") >= TPL_MIN_DAYS)
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    var = (n.cast("double") * ss.cast("double") - s.cast("double") * s) / (
        n.cast("double") * (n - 1)
    )
    lnpts = parts.where(
        n.cast("double") * ss.cast("double") - s.cast("double") * s > 0
    ).select(
        F.round(F.log(s.cast("double") / n) * TPL_LN_SCALE).cast("long").alias("x"),
        F.round(F.log(var) * TPL_LN_SCALE).cast("long").alias("y"),
    )
    mom = lnpts.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
    )
    m = F.col("m").cast("double")
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    slope = (m * d("sxy") - d("sx") * F.col("sy")) / (m * d("sxx") - d("sx") * F.col("sx"))
    return mom.select(
        F.col("m").alias("n_parts"),
        F.round(slope, 6).alias("taylor_b"),
        F.round((d("sy") - slope * F.col("sx")) / m / TPL_LN_SCALE, 6).alias("ln_a"),
    )


taylor_power_law.__doc__ = (taylor_power_law.__doc__ or "").format(D=TPL_MIN_DAYS)
