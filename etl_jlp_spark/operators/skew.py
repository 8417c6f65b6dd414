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


# ---------------------------------------------------------------------------
# Salting plan: key_skew_report diagnoses WHICH keys are hot; this op
# emits the actual per-key salt factors a salted aggregation/join uses
# (events_by_type_day_salted is the mitigation in action — this is the
# plan that parameterizes it). Factor = how many sub-keys the hot key
# splits into so no reducer sees more than ~1/P of the data.
# ---------------------------------------------------------------------------

SALT_PLAN_PARTITIONS = 32  # design shuffle width the plan salts for


@query(
    "skew_salting_plan",
    oracle=f"""
WITH c AS (
  SELECT event_type AS key, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
), t AS (
  SELECT CAST(sum(n) AS BIGINT) AS total,
         CAST((sum(n) + {SALT_PLAN_PARTITIONS} - 1) // {SALT_PLAN_PARTITIONS} AS BIGINT)
           AS target
  FROM c
), p AS (
  SELECT c.key, c.n, t.total, t.target,
         CASE WHEN c.n > t.target
              THEN (c.n + t.target - 1) // t.target ELSE CAST(1 AS BIGINT) END
           AS salt_factor
  FROM c CROSS JOIN t
)
SELECT key, n,
       round(CAST(n AS DOUBLE) / total, 4) AS share,
       CAST(salt_factor AS BIGINT) AS salt_factor,
       CAST((n + salt_factor - 1) // salt_factor AS BIGINT) AS rows_per_salt,
       n > target AS needs_salt
FROM p
""",
)
def skew_salting_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key salt factors for the event_type aggregation key: with a
    design shuffle width of P={P}, a key carrying more than ⌈total/P⌉
    rows is split into ⌈n/target⌉ salted sub-keys, capping any single
    reducer's share at ~1/P of the table. All-integer ceilings (`div`
    with +denominator−1 — no float ceil, exact at any count), one
    share division.

    Scale shape: one map-side-combinable per-key count; the total and
    target are a 1-row broadcast. At 100 TB this plan feeds the salt
    column expression (pmod(hash, salt_factor)) of the salted agg
    (operators/skew.py events_by_type_day_salted) and the two-phase
    re-agg width."""
    c = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    t = c.agg(
        F.sum("n").cast("long").alias("total"),
        F.expr(f"(sum(n) + {SALT_PLAN_PARTITIONS} - 1) div {SALT_PLAN_PARTITIONS}")
        .cast("long")
        .alias("target"),
    )
    p = c.crossJoin(F.broadcast(t)).withColumn(
        "salt_factor",
        F.when(
            F.col("n") > F.col("target"),
            F.expr("(n + target - 1) div target"),
        )
        .otherwise(F.lit(1))
        .cast("long"),
    )
    return p.select(
        "key",
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 4).alias("share"),
        "salt_factor",
        F.expr("(n + salt_factor - 1) div salt_factor").cast("long").alias("rows_per_salt"),
        (F.col("n") > F.col("target")).alias("needs_salt"),
    )


skew_salting_plan.__doc__ = (skew_salting_plan.__doc__ or "").format(P=SALT_PLAN_PARTITIONS)
