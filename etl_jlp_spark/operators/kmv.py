"""KMV (k-minimum-values) / theta sketches: mergeable distinct-count
and set-operation estimation with bit-identical cross-engine results.

``plans/enrich.approx_sketch_stats`` exercises Spark's built-in HLL and
``ops HLL register ops`` store raw registers; this module adds the
OTHER classic distinct sketch — Bar-Yossef et al.'s k-minimum-values /
the Datasketches theta sketch — because it supports what HLL cannot:
SET ALGEBRA (intersection / Jaccard between sketches) with a known
estimator, which is how overlap between two 100 TB event streams is
measured without a distinct-join.

The sketch of a key set is its K smallest hash values under one fixed
hash. Estimators (h ranges over [0, M)):

- distinct:      (K-1) · M / h_(K)        (the classic KMV estimator)
- intersection:  |S_A ∩ S_B ∩ [0, θ)| · M / θ,  θ = min(θ_A, θ_B)
- Jaccard:       |S_A ∩ S_B ∩ [0, θ)| / |(S_A ∪ S_B) ∩ [0, θ)|

Hashing is md5-hex → 32-bit int (identical bytes in Spark and DuckDB),
so sketches — and therefore every estimate — hash-match the oracle
exactly; the registered reports pair each estimate with the exact
answer so the error is measured, not guessed.

Scale: a sketch is ≤ K rows per group no matter the key cardinality,
and merging two sketches is "union, keep K smallest" — associative,
commutative, map-side combinable. The Spark build is TWO-LEVEL (K
smallest per (group, salt) shard first, then K smallest of the ≤
salts×K survivors), so no single task ever ranks a whole group's
distinct-hash stream — the shape that survives one group having a
billion distinct keys.

Reference parity: the reference has no sketch layer at all (its
quality_report.py counts exactly, in pandas); this is engine-native
capability beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import query

KMV_K = 32  # sketch size
KMV_M = 1 << 32  # hash range
KMV_SALTS = 8  # first-level shards per group


def _hash_col(key) -> F.Column:
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")


_HASH_SQL = "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT"


def kmv_sketch(df: DataFrame, group: str, key: str) -> DataFrame:
    """(group, hv, rn) — the K smallest distinct key hashes per group,
    rank-numbered 1..≤K. Built two-level: per-(group, salt) top-K
    first (bounds every sort to the shard), then top-K of the ≤
    salts×K survivors. Merging two sketches = union + re-rank — the
    same second level, which is why this state is streaming/partition
    mergeable."""
    hashed = df.select(
        F.col(group).alias("g"), _hash_col(F.col(key)).alias("hv")
    ).distinct()
    w1 = Window.partitionBy("g", F.col("hv") % KMV_SALTS).orderBy("hv")
    pruned = hashed.withColumn("rn1", F.row_number().over(w1)).filter(
        F.col("rn1") <= KMV_K
    )
    w2 = Window.partitionBy("g").orderBy("hv")
    return (
        pruned.select("g", "hv")
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= KMV_K)
    )


# shared oracle CTE: ranked distinct user-hashes per event type
_SKETCH_CTE = f"""
hashed AS (
  SELECT DISTINCT event_type AS g, {_HASH_SQL} AS hv FROM events
), sk AS (
  SELECT g, hv, row_number() OVER (PARTITION BY g ORDER BY hv) AS rn
  FROM hashed QUALIFY rn <= {KMV_K}
)"""


@query(
    "kmv_distinct_by_type",
    oracle=f"""
WITH {_SKETCH_CTE},
kth AS (
  SELECT g, hv AS hk FROM sk WHERE rn = {KMV_K}
), exact AS (
  SELECT event_type AS g, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY 1
)
SELECT e.g AS event_type, e.n_exact,
       CAST(coalesce(round(({KMV_K} - 1) * {KMV_M}.0 / k.hk), e.n_exact)
            AS BIGINT) AS est_distinct,
       round(abs(coalesce(round(({KMV_K} - 1) * {KMV_M}.0 / k.hk), e.n_exact)
                 - e.n_exact) / CAST(e.n_exact AS DOUBLE), 4) AS rel_err
FROM exact e LEFT JOIN kth k ON e.g = k.g
""",
)
def kmv_distinct_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type: KMV estimate (K={k}) next to the
    exact count with the measured relative error — the calibration
    report run before trusting the sketch as the production counter.
    An unsaturated sketch (< K distinct keys) IS the exact distinct
    set, so the estimate falls back to it.

    Plan: one distinct (type, hash) pass, two bounded rank windows
    (per-(type, salt) shard then per type over ≤ salts×K rows), one
    exact-distinct aggregate for the comparison column. In the
    sketch-only production shape the exact branch is dropped and
    per-type state is ≤ K longs."""
    ev = load_table(spark, sf_dir, "events")
    sk = kmv_sketch(ev, "event_type", "user_id")
    kth = sk.filter(F.col("rn") == KMV_K).select("g", F.col("hv").alias("hk"))
    exact = ev.groupBy(F.col("event_type").alias("g")).agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    est = F.coalesce(
        F.round((KMV_K - 1) * F.lit(float(KMV_M)) / F.col("hk")),
        F.col("n_exact").cast("double"),
    )
    return exact.join(F.broadcast(kth), "g", "left").select(
        F.col("g").alias("event_type"),
        "n_exact",
        est.cast("long").alias("est_distinct"),
        F.round(
            F.abs(est - F.col("n_exact")) / F.col("n_exact").cast("double"), 4
        ).alias("rel_err"),
    )


kmv_distinct_by_type.__doc__ = (kmv_distinct_by_type.__doc__ or "").format(k=KMV_K)


@query(
    "kmv_type_overlap",
    oracle=f"""
WITH {_SKETCH_CTE},
theta AS (
  -- theta-sketch convention: an UNSATURATED sketch (< K rows) has seen
  -- every key, so its threshold is the full hash range M, not max(hv);
  -- max(hv) there would bias est_inter = c·M/θ upward for small types.
  SELECT g, CASE WHEN count(*) < {KMV_K} THEN {KMV_M} ELSE max(hv) END AS th
  FROM sk GROUP BY g
), pairs AS (
  SELECT a.g AS type_a, b.g AS type_b,
         least(a.th, b.th) AS theta
  FROM theta a JOIN theta b ON a.g < b.g
), dedup_inter AS (
  SELECT p.type_a, p.type_b,
         CAST(count(DISTINCT sa.hv) FILTER (WHERE sa.hv < p.theta) AS BIGINT)
           AS c_inter
  FROM pairs p
  JOIN sk sa ON sa.g = p.type_a
  JOIN sk sb ON sb.g = p.type_b AND sb.hv = sa.hv
  GROUP BY p.type_a, p.type_b
), uni AS (
  SELECT p.type_a, p.type_b,
         CAST(count(DISTINCT s.hv) FILTER (WHERE s.hv < p.theta) AS BIGINT)
           AS c_union
  FROM pairs p JOIN sk s ON s.g IN (p.type_a, p.type_b)
  GROUP BY p.type_a, p.type_b
), exact AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(DISTINCT a.user_id) AS BIGINT) AS exact_inter
  FROM (SELECT DISTINCT event_type, user_id FROM events) a
  JOIN (SELECT DISTINCT event_type, user_id FROM events) b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b,
       coalesce(e.exact_inter, 0) AS exact_inter,
       round(coalesce(d.c_inter, 0) * {KMV_M}.0 / p.theta, 2) AS est_inter,
       round(coalesce(d.c_inter, 0) / CAST(u.c_union AS DOUBLE), 4)
         AS jaccard_est
FROM pairs p
LEFT JOIN dedup_inter d ON d.type_a = p.type_a AND d.type_b = p.type_b
JOIN uni u ON u.type_a = p.type_a AND u.type_b = p.type_b
LEFT JOIN exact e ON e.type_a = p.type_a AND e.type_b = p.type_b
""",
)
def kmv_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between every event-type pair from theta-sketch
    set algebra: estimated intersection size and Jaccard below the
    combined threshold θ = min(θ_a, θ_b) (θ_g = M for an unsaturated
    sketch — it has seen every key), next to the exact distinct
    intersection — the "how many users do both X and Y" question
    answered from K-row sketches instead of a distinct-join of two
    full streams.

    Plan: the sketch relation is built ONCE (≤ types×K rows,
    localCheckpoint-ed so the pair joins don't re-derive it), thetas
    are a per-type max, and every pair computation joins K-row
    relations — at 100 TB only the sketch build touches the fact
    table; the exact column is the eval-only brute-force branch."""
    ev = load_table(spark, sf_dir, "events")
    sk = kmv_sketch(ev, "event_type", "user_id").localCheckpoint(eager=False)
    theta = sk.groupBy("g").agg(
        F.when(F.count(F.lit(1)) < KMV_K, F.lit(KMV_M))
        .otherwise(F.max("hv"))
        .alias("th")
    )
    pairs = (
        theta.alias("a")
        .join(theta.alias("b"), F.col("a.g") < F.col("b.g"))
        .select(
            F.col("a.g").alias("type_a"),
            F.col("b.g").alias("type_b"),
            F.least("a.th", "b.th").alias("theta"),
        )
    )
    sa = sk.select(F.col("g").alias("type_a"), "hv")
    sb = sk.select(F.col("g").alias("type_b"), "hv")
    d = (
        pairs.join(sa, "type_a")
        .join(sb, ["type_b", "hv"])
        .filter(F.col("hv") < F.col("theta"))
        .groupBy("type_a", "type_b")
        .agg(F.countDistinct("hv").cast("long").alias("c_inter"))
    )
    uni = (
        pairs.join(
            sk.select("g", "hv"),
            (F.col("g") == F.col("type_a")) | (F.col("g") == F.col("type_b")),
        )
        .filter(F.col("hv") < F.col("theta"))
        .groupBy("type_a", "type_b")
        .agg(F.countDistinct("hv").cast("long").alias("c_union"))
    )
    du = ev.select("event_type", "user_id").distinct()
    exact = (
        du.alias("a")
        .join(
            du.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.countDistinct("a.user_id").cast("long").alias("exact_inter"))
    )
    return (
        pairs.join(F.broadcast(d), ["type_a", "type_b"], "left")
        .join(F.broadcast(uni), ["type_a", "type_b"])
        .join(F.broadcast(exact), ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.coalesce("exact_inter", F.lit(0)).cast("long").alias("exact_inter"),
            F.round(
                F.coalesce("c_inter", F.lit(0)) * F.lit(float(KMV_M)) / F.col("theta"),
                2,
            ).alias("est_inter"),
            F.round(
                F.coalesce("c_inter", F.lit(0)) / F.col("c_union").cast("double"), 4
            ).alias("jaccard_est"),
        )
    )


# ---------------------------------------------------------------------------
# Bottom-k (hash-minimum) uniform sampling → quantile estimation: the
# same K-smallest-hash state as the KMV sketch, but keeping the row's
# VALUE next to the hash. Because md5 order is independent of the
# value, the K kept rows are a uniform without-replacement sample of
# the group — mergeable exactly like the sketch (union, keep K
# smallest) — and sample quantiles estimate the group's quantiles with
# a fixed-size state the exact sort can't match at 100 TB. The report
# pairs each estimate with the exact quantile so the error is
# measured, not guessed.
# ---------------------------------------------------------------------------

BK_K = 64  # sample size per group


@query(
    "bottomk_sample_quantiles",
    oracle=f"""
WITH h AS (
  SELECT event_type AS g, value,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT AS hv
  FROM events
), samp AS (
  SELECT g, value,
         row_number() OVER (PARTITION BY g ORDER BY hv, value) AS rn
  FROM h QUALIFY rn <= {BK_K}
), est AS (
  SELECT g, quantile_cont(value, 0.5) AS e50, quantile_cont(value, 0.9) AS e90,
         CAST(count(*) AS BIGINT) AS n_sample
  FROM samp GROUP BY g
), exact AS (
  SELECT event_type AS g, quantile_cont(value, 0.5) AS x50,
         quantile_cont(value, 0.9) AS x90,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM events GROUP BY 1
)
SELECT e.g AS event_type, x.n_rows, e.n_sample,
       round(e.e50, 4) AS est_p50, round(x.x50, 4) AS exact_p50,
       round(e.e90, 4) AS est_p90, round(x.x90, 4) AS exact_p90,
       round(abs(e.e50 - x.x50), 4) AS err_p50,
       round(abs(e.e90 - x.x90), 4) AS err_p90
FROM est e JOIN exact x ON e.g = x.g
""",
)
def bottomk_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type p50/p90 estimated from the K={k} bottom-hash
    uniform sample next to the exact quantiles and absolute errors —
    the calibration report for replacing a full within-group sort with
    fixed-size mergeable sample state.

    Plan: the sample is the same two-level-prunable K-smallest-hash
    window as kmv_sketch (here single-level: the tie-broken (hv,
    value) order makes the kept set deterministic); the exact branch
    is the eval-only full quantile. In the sample-only production
    shape per-group state is K (hash, value) pairs, merged by
    union + re-rank."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        F.col("event_type").alias("g"),
        "value",
        _hash_col(F.col("event_id")).alias("hv"),
    )
    w = Window.partitionBy("g").orderBy("hv", "value")
    samp = h.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= BK_K)
    est = samp.groupBy("g").agg(
        F.expr("percentile(value, 0.5)").alias("e50"),
        F.expr("percentile(value, 0.9)").alias("e90"),
        F.count(F.lit(1)).cast("long").alias("n_sample"),
    )
    exact = ev.groupBy(F.col("event_type").alias("g")).agg(
        F.expr("percentile(value, 0.5)").alias("x50"),
        F.expr("percentile(value, 0.9)").alias("x90"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    return est.join(exact, "g").select(
        F.col("g").alias("event_type"),
        "n_rows",
        "n_sample",
        F.round("e50", 4).alias("est_p50"),
        F.round("x50", 4).alias("exact_p50"),
        F.round("e90", 4).alias("est_p90"),
        F.round("x90", 4).alias("exact_p90"),
        F.round(F.abs(F.col("e50") - F.col("x50")), 4).alias("err_p50"),
        F.round(F.abs(F.col("e90") - F.col("x90")), 4).alias("err_p90"),
    )
