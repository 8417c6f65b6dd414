"""Distribution-drift monitoring: Population Stability Index.

The reference's QualityReport (dwh_lab/dwh/quality_report.py) checks
each batch in ISOLATION — nulls, formats, duplicates. Production
pipelines also need the cross-batch question: *has the data's
distribution moved since the reference window?* PSI is the standard
answer (credit-scoring lineage, now the default drift metric in ML
monitoring): bucket the feature, compare bucket shares p (current) vs
q (reference), PSI = Σ (p−q)·ln(p/q). Rule of thumb: <0.1 stable,
0.1–0.25 drifting, >0.25 action.

Implementation: ONE pass over events — every row is labeled
(bucket, is_reference) and counted in a single conditional aggregate;
the per-type totals join back on the (tiny) event_type key. Bucket
edges reuse ``operators.joins.VALUE_BANDS`` so the band vocabulary is
shared across the repo. Laplace smoothing (+0.5 per bucket) keeps
empty buckets finite AND deterministic — no epsilon tuning, identical
algebra in both engines. The reference window is the first 21 days of
the stream (scalar min-date, broadcast 1-row join); everything after
is "current"."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.operators.joins import VALUE_BANDS
from etl_jlp_spark.registry import query

PSI_REF_DAYS = 21  # reference window: first N days of the stream
_N_BUCKETS = len(VALUE_BANDS) + 1  # + 'other' fallback

_BUCKET_SQL = (
    "CASE "
    + " ".join(
        f"WHEN value >= {lo} AND value < {hi} THEN '{name}'"
        for name, lo, hi in VALUE_BANDS
    )
    + " ELSE 'other' END"
)


@query(
    "psi_drift_report",
    oracle=f"""
WITH span AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
lab AS (
  SELECT event_type,
         {_BUCKET_SQL} AS bucket,
         CAST(ts AS DATE) < d0 + {PSI_REF_DAYS} AS is_ref
  FROM events CROSS JOIN span
), c AS (
  SELECT event_type, bucket,
         CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS DOUBLE) AS n_ref,
         CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS DOUBLE) AS n_cur
  FROM lab GROUP BY 1, 2
), t AS (
  SELECT event_type, sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM c GROUP BY 1
)
SELECT c.event_type,
       round(sum(
         ((c.n_cur + 0.5) / (t.t_cur + {0.5 * _N_BUCKETS})
          - (c.n_ref + 0.5) / (t.t_ref + {0.5 * _N_BUCKETS}))
         * ln(((c.n_cur + 0.5) / (t.t_cur + {0.5 * _N_BUCKETS}))
              / ((c.n_ref + 0.5) / (t.t_ref + {0.5 * _N_BUCKETS})))
       ), 4) AS psi,
       CAST(sum(c.n_ref) AS BIGINT) AS n_ref,
       CAST(sum(c.n_cur) AS BIGINT) AS n_cur
FROM c JOIN t USING (event_type)
GROUP BY c.event_type
""",
)
def psi_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type PSI of the value distribution: reference = first
    {PSI_REF_DAYS} days, current = the rest. One combinable aggregate
    over raw events; everything downstream is bucket-vocabulary-sized."""
    events = load_table(spark, sf_dir, "events")
    d0 = events.agg(F.min(F.to_date("ts")).alias("d0"))  # 1 row → broadcast
    bucket = F.expr(_BUCKET_SQL)
    lab = events.crossJoin(F.broadcast(d0)).select(
        "event_type",
        bucket.alias("bucket"),
        (F.to_date("ts") < F.date_add("d0", PSI_REF_DAYS)).alias("is_ref"),
    )
    c = lab.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).cast("double").alias("n_ref"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).cast("double").alias("n_cur"),
    )
    t = c.groupBy("event_type").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    s = F.lit(0.5 * _N_BUCKETS)
    p_cur = (F.col("n_cur") + 0.5) / (F.col("t_cur") + s)
    p_ref = (F.col("n_ref") + 0.5) / (F.col("t_ref") + s)
    return (
        c.join(F.broadcast(t), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.sum((p_cur - p_ref) * F.log(p_cur / p_ref)), 4).alias("psi"),
            F.sum("n_ref").cast("long").alias("n_ref"),
            F.sum("n_cur").cast("long").alias("n_cur"),
        )
    )


def bucket_counts(events: DataFrame) -> DataFrame:
    """(event_type, bucket, n) — the sufficient statistic PSI needs;
    mergeable across batches (plain sums)."""
    return events.groupBy(
        "event_type", F.expr(_BUCKET_SQL).alias("bucket")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))


def psi_against_reference(batch_counts: DataFrame, ref_counts: DataFrame) -> DataFrame:
    """PSI of a batch's bucket counts vs a fixed reference — the
    serving-time half of ``psi_drift_report``. Full-outer on the bucket
    grid so buckets present on only one side still contribute their
    (smoothed) term; output one row per event_type."""
    b = batch_counts.withColumnsRenamed({"n": "n_cur"})
    r = ref_counts.withColumnsRenamed({"n": "n_ref"})
    c = (
        b.join(r, ["event_type", "bucket"], "full_outer")
        .fillna({"n_cur": 0.0, "n_ref": 0.0})
    )
    t = c.groupBy("event_type").agg(
        F.sum("n_cur").alias("t_cur"), F.sum("n_ref").alias("t_ref")
    )
    s = F.lit(0.5 * _N_BUCKETS)
    p_cur = (F.col("n_cur") + 0.5) / (F.col("t_cur") + s)
    p_ref = (F.col("n_ref") + 0.5) / (F.col("t_ref") + s)
    return (
        c.join(F.broadcast(t), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.sum((p_cur - p_ref) * F.log(p_cur / p_ref)), 4).alias("psi"),
            F.sum("n_cur").cast("long").alias("n_cur"),
        )
    )
