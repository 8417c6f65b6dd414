"""Skew-resistant aggregation: two-phase salted groupBy.

At 100 TB a handful of hot keys (one event_type, one power user)
overwhelm single reducers. The salted pattern splits every key into
``n_salts`` partial groups (phase 1: groupBy(key, salt) with map-side
combine), then merges the partials (phase 2: groupBy(key) over
#keys × n_salts rows — tiny). Results are identical to a plain
groupBy, which is exactly what the oracle checks; AQE's skew handling
covers joins, this covers aggregations whose partials are algebraic.

``salted_agg`` is the reusable combinator; ``events_by_type_day_salted``
registers it over the same rollup as ``events_by_type_day`` so the
correctness gate proves result-equivalence.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import query

DEFAULT_SALTS = 16


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: dict[str, tuple[Column, object]],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase aggregation: ``partials`` maps output name →
    (phase-1 aggregate over rows, phase-2 merge fn over the partial
    column). Phase-2 fns must be algebraic merges (sum of counts, sum
    of sums, min of mins, …)."""
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[p1.alias(f"__p_{name}") for name, (p1, _) in partials.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[p2(F.col(f"__p_{name}")).alias(name) for name, (_, p2) in partials.items()]
    )


@query(
    "events_by_type_day_salted",
    oracle="""
SELECT event_type,
       CAST(date_trunc('day', ts) AS DATE) AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY event_type, date_trunc('day', ts)
""",
)
def events_by_type_day_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events_by_type_day rollup through the salted two-phase path —
    hash-identical output to the plain groupBy (the oracle is the plain
    SQL), demonstrating that salting changes the physical plan only.

    Note: sum(value) is re-summed from per-salt partials; double
    addition order differs from the plain agg, so the oracle-facing
    value is rounded to 2dp (differences live below 1e-9)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    out = salted_agg(
        events,
        keys=["event_type", "day"],
        partials={
            "n_events": (F.count(F.lit(1)), lambda c: F.sum(c).cast("long")),
            "sum_raw": (F.sum("value"), F.sum),
        },
    )
    return out.select(
        "event_type",
        "day",
        "n_events",
        F.round("sum_raw", 2).alias("sum_value"),
    )


SKEW_TOP_N = 10


@query(
    "key_skew_report",
    oracle=f"""
WITH c AS (
  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
), s AS (
  SELECT avg(n) AS avg_n, CAST(count(*) AS BIGINT) AS n_keys FROM c
)
SELECT c.key, c.n, s.n_keys,
       round(c.n / s.avg_n, 4) AS skew_factor
FROM c CROSS JOIN s
ORDER BY c.n DESC, c.key
LIMIT {SKEW_TOP_N}
""",
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter diagnosis for a join/agg key: the top-N keys by row
    count with their skew factor (count ÷ mean per-key count). This is
    the profiling step BEFORE choosing a mitigation (salting, AQE skew
    join, broadcast): a skew_factor near 1 says the key is safe; 100×
    says a single reducer would eat that key's partition. One map-side
    combinable groupBy (per-key counts), a 1-row broadcast scalar for
    the mean, and a TakeOrdered top-N — no global sort."""
    events = load_table(spark, sf_dir, "events")
    c = events.groupBy(F.col("user_id").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    s = c.agg(
        F.avg("n").alias("avg_n"), F.count(F.lit(1)).cast("long").alias("n_keys")
    )
    return (
        c.crossJoin(F.broadcast(s))
        .select(
            "key",
            "n",
            "n_keys",
            F.round(F.col("n") / F.col("avg_n"), 4).alias("skew_factor"),
        )
        .orderBy(F.col("n").desc(), "key")
        .limit(SKEW_TOP_N)
    )
