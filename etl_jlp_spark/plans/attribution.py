"""Conversion attribution over sessionized event streams.

The reference's preprocessing chain stops at per-session stats
(dwh_lab/dwh/preprocessing_streaming_incremental_load.py:300-380);
the question every growth team asks next is "which touch gets credit
for the purchase?". Last-touch attribution: each purchase is credited
to the most recent PRECEDING non-purchase event in the SAME session
(the channel the user converted from); a purchase with no preceding
touch in its session is 'direct'.

Plan shape: sessionization is the standard per-user window (one
shuffle on user_id); the attribution lookup is one more window over
the SAME (user, session) partition keys — Spark runs both in a single
sort/exchange (no second shuffle); the final rollup is a
map-side-combinable agg on the tiny channel dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.operators.sessionize import _SESSIONIZED_CTE, with_session_id
from etl_jlp_spark.registry import query

CONVERSION_TYPE = "purchase"


@query(
    "session_conversion_attribution",
    oracle=f"""
WITH sess AS ({_SESSIONIZED_CTE}), enriched AS (
  SELECT s.user_id, s.session_id, s.ts, s.event_id, e.event_type, e.value
  FROM sess s JOIN events e USING (event_id)
), attributed AS (
  SELECT event_type, value,
         last_value(CASE WHEN event_type <> '{CONVERSION_TYPE}' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
  FROM enriched
)
SELECT coalesce(channel, 'direct') AS channel,
       CAST(count(*) AS BIGINT) AS n_conversions,
       round(sum(value), 2) AS attributed_value
FROM attributed
WHERE event_type = '{CONVERSION_TYPE}'
GROUP BY 1
""",
)
def session_conversion_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: per channel (the non-purchase event type
    immediately preceding a purchase within its session), conversion
    count and attributed revenue; sourceless purchases roll up under
    'direct'."""
    events = load_table(spark, sf_dir, "events")
    sess = with_session_id(events.select("event_id", "user_id", "ts", "event_type", "value"))
    w = (
        Window.partitionBy("user_id", "session_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    channel = F.last(
        F.when(F.col("event_type") != CONVERSION_TYPE, F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    attributed = sess.withColumn("channel", channel).filter(
        F.col("event_type") == CONVERSION_TYPE
    )
    return attributed.groupBy(
        F.coalesce("channel", F.lit("direct")).alias("channel")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        F.round(F.sum("value"), 2).alias("attributed_value"),
    )


PATH_DEPTH = 3  # leading events kept per session path
PATH_TOPK = 20


@query(
    "session_paths_topk",
    oracle=f"""
WITH sess AS ({_SESSIONIZED_CTE}), typed AS (
  SELECT s.user_id, s.session_id, s.ts, s.event_id, e.event_type,
         row_number() OVER (PARTITION BY s.user_id, s.session_id
                            ORDER BY s.ts, s.event_id) AS rn
  FROM sess s JOIN events e USING (event_id)
), paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM typed WHERE rn <= {PATH_DEPTH} GROUP BY user_id, session_id
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path LIMIT {PATH_TOPK}
""",
)
def session_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-travelled opening paths: the first PATH_DEPTH event types
    of every session joined with '>', counted, top PATH_TOPK — the
    entry-flow report a funnel designer reads before picking steps for
    window_funnel_steps.

    Plan: sessionize + rank ride ONE (user_id) sort/exchange; the path
    build is a per-session agg over ≤ PATH_DEPTH rows (array_sort of a
    bounded collect_list — never the whole session); the final top-k is
    TakeOrdered over the path dimension (≤ |event_types|^depth rows),
    no global sort of sessions."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    sess = with_session_id(events)
    w = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    paths = (
        sess.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PATH_DEPTH)
        .groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(PATH_TOPK)
    )


@query(
    "time_to_convert_stats",
    oracle=f"""
WITH per_user AS (
  SELECT user_id,
         min(epoch_us(ts)) AS first_us,
         min(CASE WHEN event_type = '{CONVERSION_TYPE}' THEN epoch_us(ts) END)
           AS conv_us
  FROM events GROUP BY user_id
), dt AS (
  SELECT (conv_us - first_us) / 1000000.0 AS dt_s
  FROM per_user WHERE conv_us IS NOT NULL AND conv_us > first_us
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       round(quantile_cont(dt_s, 0.5), 4) AS median_s,
       round(quantile_cont(dt_s, 0.9), 4) AS p90_s,
       round(avg(dt_s), 4) AS avg_s
FROM dt
""",
)
def time_to_convert_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How long from a user's first event to their first purchase:
    count, median, p90, mean (seconds) — the latency half of the
    funnel picture (window_funnel_steps counts WHO converts; this
    measures HOW FAST).

    Plan: one map-side-combinable (user_id) agg with the conversion
    timestamp as a conditional min — no self-join of events; the
    percentile runs over the converted-users relation (∝ users, not
    events). At 100 TB swap percentile → approx_percentile, same
    relation sizes (the exact form is kept here so the oracle can
    hash-match)."""
    from etl_jlp_spark.functions.timeutil import epoch_us

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(epoch_us(F.col("ts"))).alias("first_us"),
        F.min(
            F.when(F.col("event_type") == CONVERSION_TYPE, epoch_us(F.col("ts")))
        ).alias("conv_us"),
    )
    dt = per_user.filter(
        F.col("conv_us").isNotNull() & (F.col("conv_us") > F.col("first_us"))
    ).select(((F.col("conv_us") - F.col("first_us")) / 1_000_000.0).alias("dt_s"))
    return dt.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(F.expr("percentile(dt_s, 0.5D)"), 4).alias("median_s"),
        F.round(F.expr("percentile(dt_s, 0.9D)"), 4).alias("p90_s"),
        F.round(F.avg("dt_s"), 4).alias("avg_s"),
    )


# ---------------------------------------------------------------------------
# U-shaped (position-based) multi-touch attribution.
# ---------------------------------------------------------------------------


@query(
    "position_attribution_ushape",
    oracle=f"""
WITH sess AS ({_SESSIONIZED_CTE}), enriched AS (
  SELECT s.user_id, s.session_id, s.ts, s.event_id, e.event_type, e.value
  FROM sess s JOIN events e USING (event_id)
), pairs AS (
  SELECT t.event_type AS channel, p.value AS conv_value,
         CAST(row_number() OVER (PARTITION BY p.event_id
                                 ORDER BY t.ts, t.event_id) AS BIGINT) AS pos,
         CAST(count(*) OVER (PARTITION BY p.event_id) AS BIGINT) AS n_touch
  FROM enriched t JOIN enriched p
    ON t.user_id = p.user_id AND t.session_id = p.session_id
   AND p.event_type = '{CONVERSION_TYPE}' AND t.event_type <> '{CONVERSION_TYPE}'
   AND (t.ts < p.ts OR (t.ts = p.ts AND t.event_id < p.event_id))
), credits AS (
  -- weights e6-quantized, value in cents: the credit sum is then an
  -- EXACT integer (order-independent under any partial aggregation);
  -- a raw double sum rounds 262.215 either way depending on addition
  -- order (caught as a run-to-run parity flip at sf0.001)
  SELECT channel,
         CAST(round((CASE WHEN n_touch = 1 THEN 1.0
               WHEN n_touch = 2 THEN 0.5
               WHEN pos = 1 OR pos = n_touch THEN 0.4
               ELSE 0.2 / (n_touch - 2) END) * 1000000) AS BIGINT)
           * CAST(round(conv_value * 100) AS BIGINT) AS credit_e8
  FROM pairs
)
SELECT channel, CAST(count(*) AS BIGINT) AS n_credits,
       -- half-up to cents in INTEGER arithmetic: round(double, 2) at an
       -- exact .xx5 boundary disagrees between engines (shortest-repr
       -- HALF_UP vs multiply-floor), integer floor-div cannot
       CAST((CAST(sum(CAST(credit_e8 AS DECIMAL(38,0))) AS HUGEINT) + 500000)
            // 1000000 AS BIGINT) / 100.0 AS attributed_value
FROM credits GROUP BY 1
""",
)
def position_attribution_ushape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: each
    purchase's value splits 40% / 40% to the FIRST and LAST preceding
    touch in its session and 20% evenly across the middle touches
    (1 touch → 100%, 2 touches → 50/50) — the standard counterweight
    to last-touch's recency bias (session_conversion_attribution).
    Purchases with no preceding touch have nothing to attribute and
    are excluded (last-touch reports them as 'direct').

    Plan: sessionization is the shared per-user window (one shuffle on
    user_id); the touch×purchase pair join stays WITHIN (user, session)
    — pair volume is bounded by session length², i.e. ∝ events at any
    corpus size, not events² — and the position weights come from one
    window over the per-purchase partitions; the rollup is a
    map-side-combinable agg on the tiny channel dimension."""
    events = load_table(spark, sf_dir, "events")
    sess = with_session_id(
        events.select("event_id", "user_id", "ts", "event_type", "value")
    )
    t = sess.filter(F.col("event_type") != CONVERSION_TYPE).alias("t")
    p = sess.filter(F.col("event_type") == CONVERSION_TYPE).alias("p")
    pairs = t.join(
        p,
        (F.col("t.user_id") == F.col("p.user_id"))
        & (F.col("t.session_id") == F.col("p.session_id"))
        & (
            (F.col("t.ts") < F.col("p.ts"))
            | ((F.col("t.ts") == F.col("p.ts")) & (F.col("t.event_id") < F.col("p.event_id")))
        ),
    ).select(
        F.col("t.event_type").alias("channel"),
        F.col("p.event_id").alias("conv_id"),
        F.col("p.value").alias("conv_value"),
        F.col("t.ts").alias("t_ts"),
        F.col("t.event_id").alias("t_id"),
    )
    w = Window.partitionBy("conv_id")
    positioned = pairs.select(
        "channel",
        "conv_value",
        F.row_number().over(w.orderBy("t_ts", "t_id")).cast("long").alias("pos"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_touch"),
    )
    weight = (
        F.when(F.col("n_touch") == 1, F.lit(1.0))
        .when(F.col("n_touch") == 2, F.lit(0.5))
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n_touch")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n_touch") - 2))
    )
    # e6-quantized weight x cents: the credit sum is an EXACT integer,
    # so its value cannot depend on partial-aggregation order (a raw
    # double sum flipped round(x, 2) run-to-run at a .xx5 boundary)
    credit_e8 = F.round(weight * 1000000).cast("long") * F.round(
        F.col("conv_value") * 100
    ).cast("long")
    return (
        positioned.select("channel", credit_e8.alias("credit_e8"))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_credits"),
            (
                F.expr(
                    "CAST((sum(CAST(credit_e8 AS DECIMAL(38,0))) + 500000)"
                    " div 1000000 AS BIGINT)"
                )
                / 100.0
            ).alias("attributed_value"),
        )
    )


# ---------------------------------------------------------------------------
# Shapley-value channel attribution: exact cooperative-game credit over
# the 4 non-conversion channels (2⁴ = 16 coalitions) — the
# order-independent sibling of position_attribution_ushape (position
# rules credit a path shape; Shapley credits each channel its average
# marginal conversion contribution over every coalition).
# ---------------------------------------------------------------------------

SHAPLEY_CHANNELS = ["click", "error", "signup", "view"]  # bit i = channel i
# |S|!·(k−1−|S|)! numerators for k = 4 (denominator k! = 24):
SHAPLEY_W = {0: 6, 1: 2, 2: 2, 3: 6}
SHAPLEY_DEN = 24


def _shapley_oracle() -> str:
    k = len(SHAPLEY_CHANNELS)
    bits = " + ".join(
        f"max(CASE WHEN event_type = '{c}' THEN {1 << i} ELSE 0 END)"
        for i, c in enumerate(SHAPLEY_CHANNELS)
    )
    popcount = " + ".join(f"CASE WHEN (a.s & {1 << i}) > 0 THEN 1 ELSE 0 END" for i in range(k))
    wcase = (
        "CASE " + " ".join(f"WHEN ({popcount}) = {p} THEN {w}" for p, w in SHAPLEY_W.items()) + " END"
    )
    chan_rows = ", ".join(f"({i}, '{c}')" for i, c in enumerate(SHAPLEY_CHANNELS))
    return f"""
WITH ch AS (
  SELECT user_id, {bits} AS mask,
         max(CASE WHEN event_type = '{CONVERSION_TYPE}' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
), masks AS (
  SELECT mask, CAST(sum(conv) AS BIGINT) AS conv FROM ch GROUP BY 1
), coal AS (
  SELECT CAST(unnest(range({1 << k})) AS BIGINT) AS s
), v AS (
  SELECT c.s, CAST(coalesce(sum(m.conv), 0) AS BIGINT) AS v
  FROM coal c LEFT JOIN masks m ON (m.mask & c.s) = m.mask
  GROUP BY 1
), chan AS (
  SELECT * FROM (VALUES {chan_rows}) t(i, name)
), contrib AS (
  SELECT ch.name AS channel,
         CAST(sum(({wcase}) * (b.v - a.v)) AS BIGINT) AS phi_num
  FROM chan ch
  JOIN v a ON (a.s & (1 << ch.i)) = 0
  JOIN v b ON b.s = a.s + (1 << ch.i)
  GROUP BY 1
)
SELECT channel, phi_num,
       round(phi_num / {SHAPLEY_DEN}.0, 6) + 0.0 AS shapley_conversions,
       round(CAST(phi_num AS DOUBLE)
             / (SELECT sum(phi_num) FROM contrib), 6) + 0.0 AS credit_share
FROM contrib
"""


@query("shapley_channel_attribution", oracle=_shapley_oracle())
def shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value conversion attribution over the non-
    conversion channels: per user a 4-bit touch mask and a conversion
    flag; the coalition worth v(S) counts conversions of users whose
    entire touch set fits inside S; each channel's Shapley value is
    Σ_{{S∌i}} |S|!(k−1−|S|)!·(v(S∪i) − v(S)) / k!. With k = 4 the
    weights are the integers {{6,2,2,6}}/24, so every φ numerator is an
    exact integer — Σφ telescopes to v(full) − v(∅) by construction,
    which the credit_share column renormalizes.

    Plan: ONE fact-table aggregation (groupBy user_id, map-side
    combinable) reduces the corpus to ≤ 16 mask rows; coalitions are a
    generated 16-row relation, so the subset-sum join, the marginal
    join and the weight application all happen on coalition-sized
    data — at 100 TB the cost is the single user rollup."""
    k = len(SHAPLEY_CHANNELS)
    ev = load_table(spark, sf_dir, "events")
    ch = ev.groupBy("user_id").agg(
        sum(
            F.max(F.when(F.col("event_type") == c, 1 << i).otherwise(0))
            for i, c in enumerate(SHAPLEY_CHANNELS)
        ).alias("mask"),
        F.max(F.when(F.col("event_type") == CONVERSION_TYPE, 1).otherwise(0)).alias("conv"),
    )
    masks = ch.groupBy("mask").agg(F.sum("conv").cast("long").alias("conv"))
    coal = spark.range(1 << k).select(F.col("id").alias("s"))
    v = (
        coal.join(F.broadcast(masks), F.expr("(mask & s) = mask"), "left")
        .groupBy("s")
        .agg(F.coalesce(F.sum("conv"), F.lit(0)).cast("long").alias("v"))
        # 16-row coalition-worth relation joined against itself (a/b sides)
        # — checkpoint so the events rollup runs once
        .localCheckpoint(eager=True)
    )
    chan = spark.createDataFrame(
        list(enumerate(SHAPLEY_CHANNELS)), "i int, name string"
    )
    popcount = sum(
        F.when(F.expr(f"(s & {1 << i}) > 0"), 1).otherwise(0) for i in range(k)
    )
    wexpr = F.when(popcount == 0, SHAPLEY_W[0])
    for p, wgt in list(SHAPLEY_W.items())[1:]:
        wexpr = wexpr.when(popcount == p, wgt)
    a = v.alias("a")
    b = v.select(F.col("s").alias("sb"), F.col("v").alias("vb"))
    contrib = (
        F.broadcast(chan)
        .join(a, F.expr("(a.s & shiftleft(1, i)) = 0"))
        .join(F.broadcast(b), F.expr("sb = a.s + shiftleft(1, i)"))
        .groupBy(F.col("name").alias("channel"))
        .agg(F.sum(wexpr * (F.col("vb") - F.col("v"))).cast("long").alias("phi_num"))
    )
    tot = contrib.agg(F.sum("phi_num").alias("t"))
    return contrib.crossJoin(F.broadcast(tot)).select(
        "channel",
        "phi_num",
        F.round(F.col("phi_num") / float(SHAPLEY_DEN), 6).alias("shapley_conversions"),
        F.round(F.col("phi_num").cast("double") / F.col("t"), 6).alias("credit_share"),
    )
