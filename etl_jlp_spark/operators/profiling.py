"""Data-profiling operators: functional-dependency discovery and
column information content — the Deequ/TANE-style checks a warehouse
runs before trusting keys, building dimensions, or choosing
clustering columns.

- ``fd_profile_report``: for candidate (determinant → dependent)
  pairs, the FD satisfaction rate = Σ_lhs max_rhs(count) / N — the
  fraction of rows consistent with the strongest RHS per LHS value
  (1.0 ⟺ the FD holds exactly; a primary key scores 1.0 against every
  column). All-integer arithmetic until one final division.

- ``column_entropy_report``: Shannon entropy (nats) + distinct count
  per column — the "is this worth indexing / is this column constant"
  number, and the input to choosing z-order dimensions
  (operators/layout.py wants high-entropy columns).

Scale shape: each candidate pair/column is ONE map-side-combinable
groupBy over a projected scan; everything downstream is
value-cardinality-sized. Reports are a UNION of per-candidate 1-row
relations — Spark evaluates them as independent jobs over shared
scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import query

# candidate FDs over events: a true key FD, a strong-but-inexact one,
# and a clearly-false one — the report must separate all three
FD_CANDIDATES = [
    ("event_id", "user_id"),  # PK → anything: exact
    ("user_id", "event_type"),  # users repeat types: inexact
    ("event_type", "user_id"),  # reverse: near-uniform, weak
]

ENTROPY_COLS = ["event_type", "user_id", "event_id"]


def fd_confidence(df: DataFrame, lhs: str, rhs: str) -> DataFrame:
    """1-row FD profile for lhs → rhs (see module docstring)."""
    pair = df.groupBy(lhs, rhs).agg(F.count(F.lit(1)).alias("c"))
    per_lhs = pair.groupBy(lhs).agg(
        F.max("c").alias("max_c"), F.sum("c").alias("n_c"), F.count(F.lit(1)).alias("n_rhs")
    )
    return per_lhs.agg(
        F.lit(lhs).alias("determinant"),
        F.lit(rhs).alias("dependent"),
        F.sum("n_c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_lhs"),
        F.sum("n_rhs").cast("long").alias("n_pairs"),
        (F.sum("max_c") == F.sum("n_c")).alias("exact_fd"),
        F.round(F.sum("max_c") / F.sum("n_c").cast("double"), 6).alias("fd_confidence"),
    )


def _fd_oracle() -> str:
    parts = []
    for lhs, rhs in FD_CANDIDATES:
        parts.append(f"""
SELECT '{lhs}' AS determinant, '{rhs}' AS dependent,
       CAST(sum(n_c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_lhs,
       CAST(sum(n_rhs) AS BIGINT) AS n_pairs,
       sum(max_c) = sum(n_c) AS exact_fd,
       round(sum(max_c) / CAST(sum(n_c) AS DOUBLE), 6) AS fd_confidence
FROM (
  SELECT {lhs}, max(c) AS max_c, sum(c) AS n_c, count(*) AS n_rhs
  FROM (SELECT {lhs}, {rhs}, count(*) AS c FROM events GROUP BY 1, 2)
  GROUP BY 1
)""")
    return " UNION ALL ".join(parts)


@query("fd_profile_report", oracle=_fd_oracle())
def fd_profile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FD satisfaction rate for each candidate determinant → dependent
    pair over events (TANE's g3-style error, reported as confidence).
    event_id → user_id must score exactly 1.0 (primary key); the other
    candidates quantify HOW functional the relationship is — the
    number that justifies a dimension split or a denormalization."""
    ev = load_table(spark, sf_dir, "events")
    out = None
    for lhs, rhs in FD_CANDIDATES:
        one = fd_confidence(ev, lhs, rhs)
        out = one if out is None else out.unionByName(one)
    return out


def _entropy_oracle() -> str:
    parts = []
    for c in ENTROPY_COLS:
        parts.append(f"""
SELECT '{c}' AS column_name,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round(-sum((c / CAST(total AS DOUBLE)) * ln(c / CAST(total AS DOUBLE))), 4)
         + 0.0 AS entropy_nats,
       round(count(*) / CAST(sum(c) AS DOUBLE), 6) AS distinct_ratio
FROM (
  SELECT c, sum(c) OVER () AS total
  FROM (SELECT {c}, count(*) AS c FROM events GROUP BY 1)
)""")
    return " UNION ALL ".join(parts)


@query("column_entropy_report", oracle=_entropy_oracle())
def column_entropy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) + distinct count + distinct ratio per
    profiled events column: 0 ⟺ constant column, ln(n_distinct) ⟺
    uniform key — the ranking signal for z-order dimension choice and
    dictionary-encoding decisions.

    Plan: one combinable groupBy per column; the p·ln p sum runs over
    the value-cardinality relation (≤ |distinct|), with the total as a
    1-row broadcast window. Entropy of a PK column costs a |rows|
    groupBy — same cost class as any distinct count."""
    ev = load_table(spark, sf_dir, "events")
    out = None
    for c in ENTROPY_COLS:
        counts = ev.groupBy(c).agg(F.count(F.lit(1)).alias("c"))
        tot = counts.agg(F.sum("c").alias("total"))
        p = F.col("c") / F.col("total").cast("double")
        one = counts.crossJoin(F.broadcast(tot)).agg(
            F.lit(c).alias("column_name"),
            F.sum("c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            (F.round(-F.sum(p * F.log(p)), 4) + 0.0).alias("entropy_nats"),
            F.round(
                F.count(F.lit(1)) / F.sum("c").cast("double"), 6
            ).alias("distinct_ratio"),
        )
        out = one if out is None else out.unionByName(one)
    return out
