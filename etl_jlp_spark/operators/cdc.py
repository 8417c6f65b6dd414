"""CDC merge (upsert/delete application).

The reference stamps every bronze row with ``is_update`` /
``is_delete`` audit flags (preprocessing_streaming_incremental_load.py:
394-410) but leaves applying them to the warehouse as an exercise;
this operator is that application: given a base snapshot and a changes
feed, produce the next snapshot — the MERGE INTO of a lakehouse,
expressed engine-neutrally as a full-outer join + conditional coalesce.

Scale shape: one shuffle on the merge key for each side (or zero if
both are bucketed by key — see tests/test_bucketing.py); the
conditional projection is codegen. Works identically under
``foreachBatch`` for streaming CDC application.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import query


def merge_changes(
    base: DataFrame, changes: DataFrame, key: str, payload_cols: list[str]
) -> DataFrame:
    """next = (base \\ keys(changes)) ∪ (changes where ¬is_delete).

    ``changes`` must carry ``is_delete``; update-vs-insert needs no flag
    (a change row wins over the base row either way).
    """
    b = base.select(key, *payload_cols).alias("b")
    c = changes.select(key, *payload_cols, "is_delete").alias("c")
    joined = b.join(c, on=key, how="full_outer")
    keep = F.col("c.is_delete").isNull() | (~F.col("c.is_delete"))
    picked = [
        F.coalesce(F.col(f"c.{p}"), F.col(f"b.{p}")).alias(p) for p in payload_cols
    ]
    return joined.filter(keep).select(F.col(key), *picked)


@query(
    "cdc_merge",
    oracle="""
WITH base AS (
  SELECT event_id, user_id, event_type, value FROM events WHERE event_id % 3 != 0
), changes AS (
  SELECT event_id, user_id, event_type,
         round(value + 1.0, 2) AS value,
         (event_id % 10 = 0) AS is_delete
  FROM events WHERE event_id % 2 = 0
)
SELECT coalesce(c.event_id, b.event_id) AS event_id,
       coalesce(c.user_id, b.user_id) AS user_id,
       coalesce(c.event_type, b.event_type) AS event_type,
       coalesce(c.value, b.value) AS value
FROM base b FULL OUTER JOIN changes c ON b.event_id = c.event_id
WHERE c.is_delete IS NULL OR NOT c.is_delete
""",
)
def cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic demo instantiation: base = events ∌ id%3==0,
    changes = events with id%2==0 (value bumped; id%10==0 deleted)."""
    events = load_table(spark, sf_dir, "events")
    base = events.filter(F.col("event_id") % 3 != 0).select(
        "event_id", "user_id", "event_type", "value"
    )
    changes = events.filter(F.col("event_id") % 2 == 0).select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") + 1.0, 2).alias("value"),
        (F.col("event_id") % 10 == 0).alias("is_delete"),
    )
    return merge_changes(base, changes, "event_id", ["user_id", "event_type", "value"])
