"""Audit/lineage columns.

Reference: add_additional_columns / add_additional_columns_df
(dwh_lab/dwh/preprocessing_streaming_incremental_load.py:394-410,
446-457) — stamps source_name/source_id/is_update/is_delete and load
timestamps. A pure literal projection; the batch time is an explicit
parameter (never ``now()``) so runs are reproducible and the oracle is
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import query

DEFAULT_SOURCE_NAME = "clickhouse-streaming-data"
DEFAULT_SOURCE_ID = 1
DEFAULT_BATCH_TIME = "2024-02-01 00:00:00"


def with_audit_columns(
    df: DataFrame,
    source_name: str = DEFAULT_SOURCE_NAME,
    source_id: int = DEFAULT_SOURCE_ID,
    batch_time: str = DEFAULT_BATCH_TIME,
) -> DataFrame:
    ts = F.to_timestamp(F.lit(batch_time))
    return df.withColumns(
        {
            "source_name": F.lit(source_name),
            "source_id": F.lit(source_id).cast("long"),
            "is_update": F.lit(False),
            "is_delete": F.lit(False),
            "created_time": ts,
            "created_date": ts.cast("date"),
        }
    )


@query(
    "audit_columns",
    oracle=f"""
SELECT event_id, user_id, ts, event_type, value, props,
       '{DEFAULT_SOURCE_NAME}' AS source_name,
       CAST({DEFAULT_SOURCE_ID} AS BIGINT) AS source_id,
       FALSE AS is_update,
       FALSE AS is_delete,
       TIMESTAMP '{DEFAULT_BATCH_TIME}' AS created_time,
       DATE '2024-02-01' AS created_date
FROM events
""",
)
def audit_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value", "props"
    )
    return with_audit_columns(events)


# ---------------------------------------------------------------------------
# Surrogate-key collision audit: hash-based surrogate keys are the only
# surrogate scheme that works distributed (no sequence bottleneck, no
# zipWithIndex re-shuffle) — IF collisions are audited. SKEY_HEX is
# deliberately small here so the audit exhibits real collisions at test
# scale; production uses the full 128-bit md5 (or 64-bit xxhash) where
# the same report proves zero.
# ---------------------------------------------------------------------------

SKEY_HEX = 4  # 16-bit surrogate space → collisions guaranteed at 10k keys


@query(
    "skey_collision_audit",
    oracle=f"""
WITH keys AS (
  SELECT DISTINCT event_id FROM events
), skeyed AS (
  SELECT event_id,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, {SKEY_HEX}))::BIGINT
           AS skey
  FROM keys
), buckets AS (
  SELECT skey, CAST(count(*) AS BIGINT) AS n FROM skeyed GROUP BY skey
)
SELECT CAST((SELECT count(*) FROM keys) AS BIGINT) AS n_keys,
       CAST(count(*) AS BIGINT) AS n_skeys,
       CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_colliding_keys,
       CAST(max(n) AS BIGINT) AS max_bucket,
       round(1.0 - count(*) / CAST((SELECT count(*) FROM keys) AS DOUBLE), 6) + 0.0
         AS collision_rate
FROM buckets
""",
)
def skey_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit a hash-based surrogate-key assignment: how many natural
    keys, how many distinct surrogates, how many keys share a
    surrogate, the worst bucket, and the collision rate — the check a
    dimension build runs before trusting hash surrogates as join keys.

    Plan: one distinct over the natural key, one codegen md5
    projection, one count-per-skey agg and a 1-row summary — every
    relation after the distinct is ≤ |keys|. The birthday bound says
    ~10k keys in a 2^16 space collide heavily — visible here by
    design; widening SKEY_HEX to 16+ hex digits is the production
    setting and drives the rate to ~0."""
    ev = load_table(spark, sf_dir, "events")
    keys = ev.select("event_id").distinct()
    skeyed = keys.select(
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, SKEY_HEX), 16, 10)
        .cast("long")
        .alias("skey")
    )
    buckets = skeyed.groupBy("skey").agg(F.count(F.lit(1)).cast("long").alias("n"))
    n_keys = keys.agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    return buckets.agg(
        F.count(F.lit(1)).cast("long").alias("n_skeys"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_colliding_keys"),
        F.max("n").cast("long").alias("max_bucket"),
    ).crossJoin(F.broadcast(n_keys)).select(
        "n_keys",
        "n_skeys",
        "n_colliding_keys",
        "max_bucket",
        (
            F.round(1.0 - F.col("n_skeys") / F.col("n_keys").cast("double"), 6) + 0.0
        ).alias("collision_rate"),
    )
