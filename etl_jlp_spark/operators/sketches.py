"""Count-min-sketch heavy hitters: fixed-size mergeable frequency
state, evaluated against exact counts.

``plans/enrich.approx_sketch_stats`` covers Spark's built-in sketches
(HLL distinct, quantile digests); this adds the remaining classic —
Cormode-Muthukrishnan count-min (d hash rows × w buckets of counters) —
as pure relational ops. At 100 TB the exact per-key count table can be
larger than memory for high-cardinality keys, while the CMS is a
CONSTANT d×w counters per partition, merged by addition (map-side
combine does the merging for free) — the streaming/telemetry shape.
Point estimates overcount only (min over d rows bounds collision
inflation), never undercount; the report pairs each estimate with the
exact count so the overestimate is measured, not guessed.

Portability: bucket hashing is md5-hex → int (same bytes in both
engines), so the sketch — and therefore every estimate — is
bit-identical in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import query

CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 64  # counters per row
CMS_TOP = 10  # heavy hitters reported


def _bucket(row: int, key) -> F.Column:
    h = F.substring(F.md5(F.concat(F.lit(f"{row}:"), key.cast("string"))), 1, 4)
    return (F.conv(h, 16, 10).cast("long") % CMS_WIDTH).alias("bucket")


def _bucket_sql(row: int, key_expr: str) -> str:
    return (
        f"(('0x' || substr(md5('{row}:' || CAST({key_expr} AS VARCHAR)), 1, 4))::BIGINT"
        f" % {CMS_WIDTH})"
    )


_ROWS_SQL = " UNION ALL ".join(
    f"SELECT user_id, {r} AS r, {_bucket_sql(r, 'user_id')} AS bucket FROM events"
    for r in range(CMS_DEPTH)
)


def cms_counters(ev: DataFrame, key: str = "user_id") -> DataFrame:
    """(r, bucket, c) counter relation for a batch of rows — ≤ d×w rows
    after map-side combine regardless of key cardinality. ADDITIVE:
    counters of two batches merged by summing — the property the
    streaming monitor exploits (and the reason CMS survives 100 TB
    where exact per-key state can't)."""
    hashed = ev.select(
        key,
        F.posexplode(
            F.array(*[_bucket(r, F.col(key)) for r in range(CMS_DEPTH)])
        ).alias("r", "bucket"),
    )
    return hashed.groupBy("r", "bucket").agg(F.count(F.lit(1)).cast("long").alias("c"))


@query(
    "heavy_hitters_cms",
    oracle=f"""
WITH hashed AS ({_ROWS_SQL}),
cms AS (
  SELECT r, bucket, CAST(count(*) AS BIGINT) AS c
  FROM hashed GROUP BY r, bucket
), exact AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM events GROUP BY user_id
), top AS (
  SELECT user_id, exact_cnt FROM exact
  ORDER BY exact_cnt DESC, user_id LIMIT {CMS_TOP}
), probes AS (
  {" UNION ALL ".join(
    f"SELECT user_id, exact_cnt, {r} AS r, {_bucket_sql(r, 'user_id')} AS bucket FROM top"
    for r in range(CMS_DEPTH)
  )}
)
SELECT p.user_id, any_value(p.exact_cnt) AS exact_cnt,
       CAST(min(c.c) AS BIGINT) AS est_cnt,
       CAST(min(c.c) - any_value(p.exact_cnt) AS BIGINT) AS overcount
FROM probes p JOIN cms c ON p.r = c.r AND p.bucket = c.bucket
GROUP BY p.user_id
""",
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by exact count, each with its count-min estimate
    and measured overcount (est − exact ≥ 0 by construction).

    Plan: the sketch is ONE pass — 4 (row, bucket) labels per event
    via posexplode, collapsed map-side to ≤ 4×64 counter rows before
    a tiny shuffle; the exact side is the usual partial-agg count (here
    both sides exist so the estimate error is MEASURED — in the
    sketch-only production shape the exact branch is dropped and state
    stays 4×64 regardless of key cardinality). Probes are 10×4 rows
    joined against the counter relation."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    cms = cms_counters(ev)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), "user_id").limit(CMS_TOP)
    probes = top.select(
        "user_id",
        "exact_cnt",
        F.posexplode(
            F.array(*[_bucket(r, F.col("user_id")) for r in range(CMS_DEPTH)])
        ).alias("r", "bucket"),
    )
    return (
        probes.join(F.broadcast(cms), ["r", "bucket"])
        .groupBy("user_id")
        .agg(
            F.any_value("exact_cnt").alias("exact_cnt"),
            F.min("c").cast("long").alias("est_cnt"),
            (F.min("c") - F.any_value("exact_cnt")).cast("long").alias("overcount"),
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct counting (Flajolet et al. 2007), cross-engine
# deterministic: the hash is md5-hex → 60-bit int (identical bytes in
# Spark and DuckDB), so every register — and therefore the estimate —
# is bit-identical in the oracle. m=64 registers here so BOTH the
# raw-HLL branch (sf0.01: ~333 events/day > 2.5m) and the
# linear-counting branch (sf0.001: ~33/day) are exercised by the test
# matrix; production uses p=14 (16384 registers, ~0.8% error) — the
# register relation stays ≤ groups × m rows either way.
# ---------------------------------------------------------------------------

HLL_M = 64  # registers (p=6); production p=14 — same plan shape
_HLL_ALPHA = 0.7093409548395029  # 0.7213/(1+1.079/m), inlined to full precision
_HLL_REST_BITS = 60 - 6  # hash bits left after the bucket index


def hll_registers(df: DataFrame, key: str, grain: list[str]) -> DataFrame:
    """(grain…, bucket, m) register relation for HLL-estimating
    ``count(DISTINCT key)`` per grain group.

    MERGEABLE: registers of two batches/partitions combine by
    ``max(m)`` — Spark's partial aggregation does exactly that map-side,
    so the shuffle carries ≤ |groups|×64 rows no matter how many input
    rows, the property that makes HLL the 100 TB distinct-count shape
    (exact count(DISTINCT) shuffles every distinct key)."""
    h = F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 15), 16, 10).cast("long")
    rest = F.expr(f"h div {HLL_M}")
    rho = F.when(rest == 0, F.lit(_HLL_REST_BITS + 1)).otherwise(
        F.lit(_HLL_REST_BITS + 1) - F.length(F.bin(rest))
    )
    return (
        df.withColumn("h", h)
        .select(*grain, (F.col("h") % HLL_M).alias("bucket"), rho.alias("rho"))
        .groupBy(*grain, "bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_estimate(registers: DataFrame, grain: list[str]) -> DataFrame:
    """Collapse a register relation to one estimate row per group,
    with the standard small-range (linear counting) correction."""
    agg = registers.groupBy(*grain).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("z_used"),
        F.count(F.lit(1)).alias("n_used"),
    )
    v = F.lit(HLL_M) - F.col("n_used")  # empty registers (2^-0 each)
    raw = F.lit(_HLL_ALPHA * HLL_M * HLL_M) / (F.col("z_used") + v.cast("double"))
    est = F.when(
        (raw <= 2.5 * HLL_M) & (v > 0), F.lit(float(HLL_M)) * F.log(F.lit(HLL_M) / v)
    ).otherwise(raw)
    return agg.select(*grain, (F.round(est, 4) + 0.0).alias("est_distinct"))

_HLL_RAW = f"{_HLL_ALPHA * HLL_M * HLL_M} / (z_used + ({HLL_M} - n_used))"


@query(
    "hll_distinct_daily",
    oracle=f"""
WITH hashed AS (
  SELECT CAST(ts AS DATE) AS day,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
), reg_max AS (
  SELECT day, h % {HLL_M} AS bucket,
         max(CASE WHEN h // {HLL_M} = 0 THEN {_HLL_REST_BITS + 1}
             ELSE {_HLL_REST_BITS + 1} - length(bin(h // {HLL_M})) END) AS m
  FROM hashed GROUP BY day, bucket
), est AS (
  SELECT day, sum(power(2.0, -m)) AS z_used, count(*) AS n_used
  FROM reg_max GROUP BY day
), sm AS (
  SELECT day,
         round(CASE WHEN {_HLL_RAW} <= {2.5 * HLL_M} AND {HLL_M} - n_used > 0
               THEN {float(HLL_M)} * ln({HLL_M} / CAST({HLL_M} - n_used AS DOUBLE))
               ELSE {_HLL_RAW} END, 4) + 0.0 AS est_distinct
  FROM est
), exact AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(count(DISTINCT event_id) AS BIGINT) AS exact_distinct,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM events GROUP BY 1
)
SELECT exact.day AS day, est_distinct, exact_distinct, n_rows,
       round((est_distinct - exact_distinct) / exact_distinct, 6) + 0.0 AS rel_err
FROM sm JOIN exact ON sm.day = exact.day
""",
)
def hll_distinct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct event_ids per day, estimated by a 64-register
    HyperLogLog next to the exact count, with the measured relative
    error — the telemetry cardinality-monitor shape.

    Plan: ONE scan → register relation (≤ days×64 rows after map-side
    max-combine; exact count(DISTINCT) by contrast shuffles every
    distinct key) → per-day estimate, joined to the exact side on the
    ~30-row day key (broadcast). The estimate and the oracle's agree
    bit-for-bit because the register hash is md5-hex (same bytes in
    both engines) and 2^-m / the alpha constant are exact doubles.
    At 100 TB only the exact branch (kept here to MEASURE the error)
    grows; the sketch branch is the production shape and its merge is
    `max` — associative, so partial aggregation and multi-batch
    streaming merges are free."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(F.col("ts").cast("date").alias("day"), "event_id")
    est = hll_estimate(hll_registers(days, "event_id", ["day"]), ["day"])
    exact = days.groupBy("day").agg(
        F.count_distinct("event_id").cast("long").alias("exact_distinct"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    return est.join(F.broadcast(exact), "day").select(
        "day",
        "est_distinct",
        "exact_distinct",
        "n_rows",
        (F.round((F.col("est_distinct") - F.col("exact_distinct")) / F.col("exact_distinct"), 6) + 0.0).alias(
            "rel_err"
        ),
    )


# ---------------------------------------------------------------------------
# Bloom-filter join pruning: the runtime-filter primitive, measured.
# m bits / k md5-derived hash functions, sized so the report actually
# exhibits false positives at test scale.
# ---------------------------------------------------------------------------

BLOOM_M = 512  # bits
BLOOM_K = 3  # hash functions
BLOOM_BUILD_SIZE = 15  # build side: parts with p_size = 15


def _bloom_bit(i: int, key) -> F.Column:
    h = F.substring(F.md5(F.concat(F.lit(f"bloom{i}:"), key.cast("string"))), 1, 8)
    return (F.conv(h, 16, 10).cast("long") % BLOOM_M).alias("bit")


def _bloom_bit_sql(i: int, key_expr: str) -> str:
    return (
        f"(('0x' || substr(md5('bloom{i}:' || CAST({key_expr} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {BLOOM_M})"
    )


@query(
    "bloom_join_prune_report",
    oracle=f"""
WITH build AS (
  SELECT p_partkey FROM part WHERE p_size = {BLOOM_BUILD_SIZE}
), bits AS (
  SELECT DISTINCT bit FROM (
    {" UNION ALL ".join(f"SELECT {_bloom_bit_sql(i, 'p_partkey')} AS bit FROM build" for i in range(BLOOM_K))}
  )
), probe AS (
  SELECT DISTINCT l_partkey FROM lineitem
), probe_bits AS (
  {" UNION ALL ".join(f"SELECT l_partkey, {_bloom_bit_sql(i, 'l_partkey')} AS bit FROM probe" for i in range(BLOOM_K))}
), passed AS (
  SELECT l_partkey FROM probe_bits pb JOIN bits USING (bit)
  GROUP BY l_partkey HAVING count(*) = {BLOOM_K}
), exact AS (
  SELECT l_partkey FROM probe WHERE l_partkey IN (SELECT p_partkey FROM build)
)
SELECT CAST((SELECT count(*) FROM build) AS BIGINT) AS n_build_keys,
       CAST((SELECT count(*) FROM probe) AS BIGINT) AS n_probe_keys,
       CAST((SELECT count(*) FROM passed) AS BIGINT) AS n_bloom_pass,
       CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact_match,
       CAST((SELECT count(*) FROM passed) - (SELECT count(*) FROM exact) AS BIGINT)
         AS n_false_pos,
       round(((SELECT count(*) FROM passed) - (SELECT count(*) FROM exact))
             / CAST((SELECT count(*) FROM probe) - (SELECT count(*) FROM exact)
                    AS DOUBLE), 4) + 0.0 AS fpr
""",
)
def bloom_join_prune_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter effectiveness report: build a BLOOM_M-bit /
    BLOOM_K-hash Bloom filter over a selective dimension key set
    (p_size = {sz} parts) and measure, against the exact semi-join,
    how many probe-side lineitem keys it admits — the number that
    decides whether pushing the filter to the fact scan is worth it.

    Plan: the bit set is ≤ m distinct ints (broadcast); the probe side
    is ONE distinct-reduce of the fact keys, then k codegen md5 bits
    per key and a broadcast semi-match counted per key. At 100 TB the
    filter rides the scan (Spark's own runtime bloom does exactly
    this); the report costs one extra distinct. The md5-derived bits
    make the filter bit-identical in both engines, so the driver's
    hash match proves filter, pass set, and FPR."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    build = part.filter(F.col("p_size") == BLOOM_BUILD_SIZE).select("p_partkey")
    bits = (
        build.select(
            F.explode(
                F.array(*[_bloom_bit(i, F.col("p_partkey")) for i in range(BLOOM_K)])
            ).alias("bit")
        )
        .distinct()
    )
    probe = li.select("l_partkey").distinct()
    probe_bits = probe.select(
        "l_partkey",
        F.explode(
            F.array(*[_bloom_bit(i, F.col("l_partkey")) for i in range(BLOOM_K)])
        ).alias("bit"),
    )
    passed = (
        probe_bits.join(F.broadcast(bits), "bit")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") == BLOOM_K)
    )
    n_build = build.agg(F.count(F.lit(1)).cast("long").alias("n_build_keys"))
    n_probe = probe.agg(F.count(F.lit(1)).cast("long").alias("n_probe_keys"))
    n_pass = passed.agg(F.count(F.lit(1)).cast("long").alias("n_bloom_pass"))
    n_exact = (
        probe.join(F.broadcast(build), probe.l_partkey == build.p_partkey, "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact_match"))
    )
    return (
        n_build.crossJoin(n_probe)
        .crossJoin(n_pass)
        .crossJoin(n_exact)
        .select(
            "n_build_keys",
            "n_probe_keys",
            "n_bloom_pass",
            "n_exact_match",
            (F.col("n_bloom_pass") - F.col("n_exact_match")).cast("long").alias("n_false_pos"),
            (
                F.round(
                    (F.col("n_bloom_pass") - F.col("n_exact_match"))
                    / (F.col("n_probe_keys") - F.col("n_exact_match")).cast("double"),
                    4,
                )
                + 0.0
            ).alias("fpr"),
        )
    )


bloom_join_prune_report.__doc__ = (bloom_join_prune_report.__doc__ or "").format(
    sz=BLOOM_BUILD_SIZE
)


@query(
    "hll_weekly_union",
    oracle=f"""
WITH hashed AS (
  SELECT CAST(ts AS DATE) AS day,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
), daily_reg AS (
  SELECT day, h % {HLL_M} AS bucket,
         max(CASE WHEN h // {HLL_M} = 0 THEN {_HLL_REST_BITS + 1}
             ELSE {_HLL_REST_BITS + 1} - length(bin(h // {HLL_M})) END) AS m
  FROM hashed GROUP BY day, bucket
), weekly_reg AS (
  SELECT date_trunc('week', day) AS week, bucket, max(m) AS m
  FROM daily_reg GROUP BY 1, bucket
), est AS (
  SELECT week, sum(power(2.0, -m)) AS z_used, count(*) AS n_used
  FROM weekly_reg GROUP BY week
), sm AS (
  SELECT week,
         round(CASE WHEN {_HLL_RAW} <= {2.5 * HLL_M} AND {HLL_M} - n_used > 0
               THEN {float(HLL_M)} * ln({HLL_M} / CAST({HLL_M} - n_used AS DOUBLE))
               ELSE {_HLL_RAW} END, 4) + 0.0 AS est_distinct
  FROM est
), exact AS (
  SELECT date_trunc('week', CAST(ts AS DATE)) AS week,
         CAST(count(DISTINCT event_id) AS BIGINT) AS exact_distinct,
         CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
  FROM events GROUP BY 1
)
SELECT CAST(exact.week AS DATE) AS week, n_days, est_distinct, exact_distinct,
       round((est_distinct - exact_distinct) / exact_distinct, 6) + 0.0 AS rel_err
FROM sm JOIN exact ON sm.week = exact.week
""",
)
def hll_weekly_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly distinct event_ids estimated by UNIONING the daily HLL
    registers (bucket-wise max) — never re-reading raw events — next to
    the exact weekly distinct and the measured error.

    This is the property that makes sketches the 100 TB re-aggregation
    shape: a rollup tree (day → week → month → all-time) merges
    fixed-size register relations with `max`, so each coarser grain
    costs |groups|×64 rows of input instead of a fresh fact-table scan,
    and the SAME stored daily registers serve every grain. Contrast
    exact count(DISTINCT): not mergeable — every re-grain shuffles all
    distinct keys again. Plan: one scan builds the daily registers
    (shared subtree with hll_distinct_daily), one |days|×64-row max
    merge per week, and a broadcast join to the exact side (kept only
    to MEASURE the estimate's error)."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(F.col("ts").cast("date").alias("day"), "event_id")
    daily_reg = hll_registers(days, "event_id", ["day"])
    weekly_reg = (
        daily_reg.select(F.date_trunc("week", "day").alias("week"), "bucket", "m")
        .groupBy("week", "bucket")
        .agg(F.max("m").alias("m"))
    )
    est = hll_estimate(weekly_reg, ["week"])
    exact = days.groupBy(F.date_trunc("week", "day").alias("week")).agg(
        F.count_distinct("event_id").cast("long").alias("exact_distinct"),
        F.count_distinct("day").cast("long").alias("n_days"),
    )
    return est.join(F.broadcast(exact), "week").select(
        F.col("week").cast("date").alias("week"),
        "n_days",
        "est_distinct",
        "exact_distinct",
        (
            F.round(
                (F.col("est_distinct") - F.col("exact_distinct")) / F.col("exact_distinct"), 6
            )
            + 0.0
        ).alias("rel_err"),
    )


HLL_ROLL_DAYS = 7


@query(
    "hll_rolling_7d",
    oracle=f"""
WITH hashed AS (
  SELECT CAST(ts AS DATE) AS day,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
), daily_reg AS (
  SELECT day, h % {HLL_M} AS bucket,
         max(CASE WHEN h // {HLL_M} = 0 THEN {_HLL_REST_BITS + 1}
             ELSE {_HLL_REST_BITS + 1} - length(bin(h // {HLL_M})) END) AS m
  FROM hashed GROUP BY day, bucket
), days AS (SELECT DISTINCT day FROM daily_reg),
win_reg AS (
  SELECT d.day, r.bucket, max(r.m) AS m
  FROM days d
  JOIN daily_reg r ON r.day BETWEEN d.day - {HLL_ROLL_DAYS - 1} AND d.day
  GROUP BY d.day, r.bucket
), est AS (
  SELECT day, sum(power(2.0, -m)) AS z_used, count(*) AS n_used
  FROM win_reg GROUP BY day
), sm AS (
  SELECT day,
         round(CASE WHEN {_HLL_RAW} <= {2.5 * HLL_M} AND {HLL_M} - n_used > 0
               THEN {float(HLL_M)} * ln({HLL_M} / CAST({HLL_M} - n_used AS DOUBLE))
               ELSE {_HLL_RAW} END, 4) + 0.0 AS est_rolling_distinct
  FROM est
), exact AS (
  SELECT d.day, CAST(count(DISTINCT e.event_id) AS BIGINT) AS exact_rolling_distinct
  FROM days d
  JOIN (SELECT DISTINCT CAST(ts AS DATE) AS day, event_id FROM events) e
    ON e.day BETWEEN d.day - {HLL_ROLL_DAYS - 1} AND d.day
  GROUP BY d.day
)
SELECT sm.day AS day, est_rolling_distinct, exact_rolling_distinct,
       round((est_rolling_distinct - exact_rolling_distinct)
             / exact_rolling_distinct, 6) + 0.0 AS rel_err
FROM sm JOIN exact ON sm.day = exact.day
""",
)
def hll_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {W}-day distinct event_ids per day from the SAME stored
    daily HLL registers that serve the daily and weekly grains — the
    sliding-window variant of hll_weekly_union, next to the exact
    rolling distinct and the measured error.

    This is the sketch win at its sharpest: exact rolling distinct must
    re-shuffle {W} days of raw keys PER OUTPUT DAY (the exact side here
    does, to measure error — it is the expensive branch by far), while
    the register path joins ≤ days×64 register rows against a {W}-day
    range condition and max-merges. State per output day never exceeds
    64 registers at any corpus size. Plan: one scan builds daily
    registers; the range join is days × {W}×64 rows; the exact anchor
    is kept only for the error column and is dropped in production."""
    ev = load_table(spark, sf_dir, "events")
    days_ev = ev.select(F.col("ts").cast("date").alias("day"), "event_id")
    daily_reg = hll_registers(days_ev, "event_id", ["day"]).localCheckpoint(eager=True)
    days = daily_reg.select("day").distinct()
    win_reg = (
        days.alias("d")
        .join(
            daily_reg.alias("r"),
            F.expr(f"r.day BETWEEN d.day - {HLL_ROLL_DAYS - 1} AND d.day"),
        )
        .groupBy(F.col("d.day").alias("day"), F.col("r.bucket").alias("bucket"))
        .agg(F.max("r.m").alias("m"))
    )
    est = hll_estimate(win_reg, ["day"]).withColumnRenamed(
        "est_distinct", "est_rolling_distinct"
    )
    dedup_day = days_ev.distinct()
    exact = (
        days.alias("d")
        .join(
            dedup_day.alias("e"),
            F.expr(f"e.day BETWEEN d.day - {HLL_ROLL_DAYS - 1} AND d.day"),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.count_distinct("e.event_id").cast("long").alias("exact_rolling_distinct"))
    )
    return est.join(exact, "day").select(
        "day",
        "est_rolling_distinct",
        "exact_rolling_distinct",
        (
            F.round(
                (F.col("est_rolling_distinct") - F.col("exact_rolling_distinct"))
                / F.col("exact_rolling_distinct"),
                6,
            )
            + 0.0
        ).alias("rel_err"),
    )


hll_rolling_7d.__doc__ = (hll_rolling_7d.__doc__ or "").format(W=HLL_ROLL_DAYS)


# ---------------------------------------------------------------------------
# CMS inner-product join-size estimation — the optimizer-stats use of
# the sketch: "how big would this join blow up?" without running it.
# ---------------------------------------------------------------------------


@query(
    "cms_join_size_estimate",
    oracle=f"""
WITH rows_rel AS (
  {" UNION ALL ".join(
      f"SELECT l_partkey AS k, {r} AS r, {_bucket_sql(r, 'l_partkey')} AS bucket"
      " FROM lineitem"
      for r in range(CMS_DEPTH)
  )}
), counters AS (
  SELECT r, bucket, CAST(count(*) AS BIGINT) AS c
  FROM rows_rel GROUP BY r, bucket
), per_row AS (
  SELECT r, sum(c * c) AS ip FROM counters GROUP BY r
), est AS (SELECT CAST(min(ip) AS BIGINT) AS est_join_rows FROM per_row),
exact AS (
  SELECT CAST(sum(CAST(cnt AS DECIMAL(38,0)) * cnt) AS BIGINT) AS exact_join_rows,
         CAST(count(*) AS BIGINT) AS n_distinct_keys,
         CAST(sum(cnt) AS BIGINT) AS n_rows
  FROM (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1)
)
SELECT n_rows, n_distinct_keys, exact_join_rows, est_join_rows,
       round(est_join_rows / CAST(exact_join_rows AS DOUBLE), 4) + 0.0
         AS overestimate_ratio
FROM exact CROSS JOIN est
""",
)
def cms_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join cardinality of lineitem on l_partkey estimated from
    the COUNT-MIN SKETCH INNER PRODUCT — |A ⋈ B| = Σ_k f_A(k)·f_B(k)
    is upper-bounded by min_r Σ_b c_A[r,b]·c_B[r,b] (Cormode &
    Muthukrishnan §4.2; here A = B so it is the F₂ self-join moment) —
    next to the exact answer and the measured overestimate. This is
    the question a join planner asks BEFORE committing to a strategy
    ("will partkey ⋈ partkey explode?"), answered from d×w counters
    instead of a per-key count table; two DIFFERENT relations' sketches
    estimate their cross-join the same way because the hash family is
    shared.

    Plan: one fan-out projection (d buckets per row), one combinable
    counter agg (≤ d×w rows), O(d×w) scalar algebra after; the exact
    branch (one per-key count) exists only to measure the estimator."""
    li = load_table(spark, sf_dir, "lineitem")
    counters = cms_counters(li.select(F.col("l_partkey").alias("k")), key="k")
    per_row = counters.groupBy("r").agg(F.sum(F.col("c") * F.col("c")).alias("ip"))
    est = per_row.agg(F.min("ip").cast("long").alias("est_join_rows"))
    cnts = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    exact = cnts.agg(
        F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("cnt"))
        .cast("long")
        .alias("exact_join_rows"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "n_rows",
        "n_distinct_keys",
        "exact_join_rows",
        "est_join_rows",
        (
            F.round(
                F.col("est_join_rows") / F.col("exact_join_rows").cast("double"), 4
            )
            + 0.0
        ).alias("overestimate_ratio"),
    )
