"""Slowly-changing-dimension (Type 2) operators: dimension history as
validity intervals.

Reference: the ETL's CDC merge (dwh_lab/dwh/
preprocessing_incremental_load.py — newest row per key wins) is SCD
Type 1: updates overwrite, history is lost. Type 2 is the other
standard warehouse dimension pattern — every attribute change CLOSES
the key's current interval and opens a new one, so any past state can
be reconstructed with an as-of predicate. The `events` stream is the
changelog here (user_id = the dimension key, event_type = the tracked
attribute), matching how the reference's event feed drives its
incremental loads.

Scale notes (100 TB):
- ``scd2_build`` is two windows partitioned by the DIMENSION KEY
  (user_id) — high-cardinality, so partitions stay tiny and parallel at
  any corpus size; no global window anywhere.
- ``scd2_apply`` is the production incremental path: only keys present
  in the new batch are re-derived. The untouched majority of the
  dimension — at 100 TB, almost all of it — passes through via an
  anti-join on the (batch-bounded, broadcastable) changed-key set, and
  CLOSED intervals of touched keys pass through untouched too: history
  rows are immutable, only each touched key's current row can close.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import query

# incremental-apply cutoff: events before are the "existing" dimension,
# events at/after are the arriving CDC batch (~ last third of the month)
SCD2_CUTOFF = "2024-01-21 00:00:00"

_SCD2_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type AS attr,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), changes AS (
  SELECT user_id, event_id, ts AS valid_from, attr
  FROM ordered WHERE prev IS NULL OR attr <> prev
), intervals AS (
  SELECT user_id, attr, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id)
           AS valid_to
  FROM changes
)
SELECT user_id, attr, valid_from, valid_to, (valid_to IS NULL) AS is_current
FROM intervals
"""


def _intervals_from_changelog(changelog: DataFrame, prev_default=None) -> DataFrame:
    """(user_id, event_id, ts, attr) changelog → SCD2 interval rows.
    Consecutive duplicate attribute values collapse (no-op updates
    create no interval); ``lead`` of the next change closes each
    interval; the last interval per key stays open (is_current).
    Both windows partition by the dimension key — never global."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        changelog.withColumn("prev", F.lag("attr").over(w))
        .filter(F.col("prev").isNull() | (F.col("attr") != F.col("prev")))
        .select("user_id", "event_id", F.col("ts").alias("valid_from"), "attr")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "attr",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


@query("scd2_build", oracle=_SCD2_ORACLE)
def scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full SCD2 rebuild from the complete changelog: one interval row
    per (key, attribute-change), valid_from/valid_to half-open, the
    newest row per key open-ended and flagged current."""
    events = load_table(spark, sf_dir, "events")
    return _intervals_from_changelog(
        events.select("user_id", "event_id", "ts", F.col("event_type").alias("attr"))
    )


@query("scd2_apply", oracle=_SCD2_ORACLE)
def scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 merge — the production shape: the dimension was
    built once from history (events before {cutoff}), and an arriving
    CDC batch (events at/after) must fold in WITHOUT re-deriving
    untouched keys. Touched keys re-derive from (their current row as a
    pseudo-change) + (their new events): the pseudo-change seeds the
    duplicate-collapse so a batch value equal to the key's current
    attribute creates no interval, and the current row's valid_to
    closes exactly when a real change arrives. Closed history rows and
    untouched keys pass through by construction. The result is
    row-identical to a full rebuild (same oracle), which is the
    correctness contract of any incremental dimension load."""
    events = load_table(spark, sf_dir, "events")
    cutoff = F.lit(SCD2_CUTOFF).cast("timestamp")
    changelog = events.select("user_id", "event_id", "ts", F.col("event_type").alias("attr"))
    existing = _intervals_from_changelog(changelog.filter(F.col("ts") < cutoff))
    batch = changelog.filter(F.col("ts") >= cutoff)

    changed_keys = batch.select("user_id").distinct()  # batch-bounded → broadcast
    untouched = existing.join(F.broadcast(changed_keys), "user_id", "left_anti")
    touched = existing.join(F.broadcast(changed_keys), "user_id")
    closed = touched.filter(~F.col("is_current"))  # history is immutable

    # each touched key's OPEN row becomes a pseudo-change seeding the
    # re-derivation; event_id −1 sorts it before any same-instant event
    pseudo = touched.filter(F.col("is_current")).select(
        "user_id",
        F.lit(-1).alias("event_id"),
        F.col("valid_from").alias("ts"),
        "attr",
    )
    rederived = _intervals_from_changelog(pseudo.unionByName(batch))

    return untouched.unionByName(closed).unionByName(rederived)


scd2_apply.__doc__ = (scd2_apply.__doc__ or "").format(cutoff=SCD2_CUTOFF)


def enrich_asof(rows: DataFrame, intervals: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Point-in-time dimension lookup: each row gains the ``attr`` that
    was valid AT its timestamp (``valid_from <= ts < valid_to``,
    open-ended current rows match everything after valid_from).

    By SCD2 construction each key's intervals partition time, so at
    most one dimension row matches — the join is an equi-join on the
    dimension key with a residual range filter, never a theta join.
    At 100 TB both sides are keyed on user_id (co-partitionable /
    bucketable); rows before a key's first interval, or for unknown
    keys, keep a NULL attr (left join)."""
    dim = intervals.select(
        "user_id",
        F.col("attr").alias("dim_attr"),
        "valid_from",
        "valid_to",
    )
    ts = F.col(ts_col)
    cond = (
        (rows["user_id"] == dim["user_id"])
        & (ts >= dim["valid_from"])
        & (dim["valid_to"].isNull() | (ts < dim["valid_to"]))
    )
    return rows.join(dim, cond, "left").select(
        *[rows[c] for c in rows.columns],
        dim["dim_attr"].alias("attr_asof"),
    )


# ---------------------------------------------------------------------------
# Point-in-time snapshot: the query SCD2 exists to answer — "what did
# the dimension look like AS OF timestamp T?" One interval predicate
# reconstructs the whole dimension state; compared against today, it
# also reports which keys have since changed.
# ---------------------------------------------------------------------------

SCD2_ASOF = "2024-01-16 00:00:00"  # snapshot instant (mid-changelog)


@query(
    "scd2_snapshot_asof",
    oracle=_SCD2_ORACLE.replace(
        "SELECT user_id, attr, valid_from, valid_to, (valid_to IS NULL) AS is_current\nFROM intervals",
        f""", snap AS (
  SELECT user_id, attr AS attr_asof, valid_from
  FROM intervals
  WHERE valid_from <= TIMESTAMP '{SCD2_ASOF}'
    AND (valid_to IS NULL OR valid_to > TIMESTAMP '{SCD2_ASOF}')
), cur AS (
  SELECT user_id, attr AS attr_now FROM intervals WHERE valid_to IS NULL
)
SELECT s.user_id, s.attr_asof, s.valid_from AS asof_valid_from,
       c.attr_now, (s.attr_asof <> c.attr_now) AS changed_since
FROM snap s JOIN cur c ON s.user_id = c.user_id""",
    ),
)
def scd2_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension state AS OF {T}: the half-open interval predicate
    valid_from ≤ T < valid_to over the scd2_build relation, one row
    per key that existed at T, joined to the key's CURRENT attribute
    with a changed-since flag — the time-travel read that justifies
    carrying Type-2 history at all.

    Plan: the interval relation's key-partitioned windows, then one
    key-keyed self-join (same partitioning, no extra exchange
    class); the snapshot predicate prunes before the join."""
    iv = scd2_build(spark, sf_dir).localCheckpoint(eager=True)  # built once, read twice
    t = F.lit(SCD2_ASOF).cast("timestamp")
    snap = iv.where(
        (F.col("valid_from") <= t) & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select("user_id", F.col("attr").alias("attr_asof"), F.col("valid_from").alias("asof_valid_from"))
    cur = iv.where(F.col("valid_to").isNull()).select(
        "user_id", F.col("attr").alias("attr_now")
    )
    return snap.join(cur, "user_id").select(
        "user_id",
        "attr_asof",
        "asof_valid_from",
        "attr_now",
        (F.col("attr_asof") != F.col("attr_now")).alias("changed_since"),
    )


scd2_snapshot_asof.__doc__ = (scd2_snapshot_asof.__doc__ or "").format(T=SCD2_ASOF)
