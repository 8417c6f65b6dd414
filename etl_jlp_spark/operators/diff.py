"""Row-level snapshot diff: the reconciliation operator behind audits.

``compare_with_source`` (ingest/loaders.py) answers "how many rows
drifted"; an auditor needs WHICH rows and WHICH columns. ``snapshot_diff``
full-outer-joins two snapshots on the business key and classifies every
row as insert / delete / update, listing the changed columns — the
generic engine behind CDC backfills, migration sign-offs, and the
reference's source/target checks (dwh_lab/dwh/quality_report.py:116-131
compares only column PRESENCE; this compares values).

Scale shape: ONE full outer sort-merge/shuffle join on the key — the
minimum possible for a value-level diff — with every non-key compare a
codegen null-safe predicate on the joined row; output ∝ drift, not
table size. On bucketed snapshots the exchange disappears entirely
(see test_bucketing.py for the co-located join form).

The prior snapshot is simulated deterministically from the current one
(key-modulus deletes/updates), so the DuckDB oracle can rebuild the
identical pair and the driver's hash match proves the classification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import query

# deterministic simulated drift between the "old" and "new" snapshots
INS_MOD = 97  # keys missing from old → classified insert
DEL_MOD = 89  # keys missing from new → classified delete
UPD_MOD = 31  # keys whose c_acctbal/c_mktsegment differ → update

_COMPARE_COLS = ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


def diff_snapshots(new: DataFrame, old: DataFrame, key: str, cols: list[str]) -> DataFrame:
    """Generic snapshot diff: full outer join on ``key``, classify each
    row, list changed columns (comma-joined, deterministic order =
    ``cols`` order). Unchanged rows are dropped, so the output is
    drift-sized."""
    n, o = new.alias("n"), old.alias("o")
    joined = n.join(o, F.col(f"n.{key}") == F.col(f"o.{key}"), "full_outer")
    is_ins = F.col(f"o.{key}").isNull()
    is_del = F.col(f"n.{key}").isNull()
    col_diff = [
        F.when(
            ~F.col(f"n.{c}").eqNullSafe(F.col(f"o.{c}")), F.lit(c)
        )
        for c in cols
    ]
    any_diff = F.coalesce(*col_diff, F.lit(None)).isNotNull() if cols else F.lit(False)
    return (
        joined.select(
            F.coalesce(F.col(f"n.{key}"), F.col(f"o.{key}")).alias(key),
            F.when(is_ins, "insert")
            .when(is_del, "delete")
            .when(any_diff, "update")
            .otherwise("unchanged")
            .alias("change_type"),
            F.when(is_ins | is_del, F.lit(""))
            .otherwise(F.concat_ws(",", *col_diff))
            .alias("changed_cols"),
        )
        .filter(F.col("change_type") != "unchanged")
    )


def _oracle() -> str:
    upd_cols = ",\n         ".join(
        {
            "c_acctbal": f"CASE WHEN c_custkey % {UPD_MOD} = 0 THEN c_acctbal + 10.0 ELSE c_acctbal END AS c_acctbal",
            "c_mktsegment": f"CASE WHEN c_custkey % {UPD_MOD} = 0 THEN 'LEGACY' ELSE c_mktsegment END AS c_mktsegment",
        }.get(c, c)
        for c in _COMPARE_COLS
    )
    diff_cases = ", ".join(
        f"CASE WHEN o.{c} IS DISTINCT FROM n.{c} THEN '{c}' END" for c in _COMPARE_COLS
    )
    any_diff = " OR ".join(f"o.{c} IS DISTINCT FROM n.{c}" for c in _COMPARE_COLS)
    return f"""
WITH new_s AS (
  SELECT * FROM customer WHERE c_custkey % {DEL_MOD} <> 0
), old_s AS (
  SELECT c_custkey,
         {upd_cols}
  FROM customer WHERE c_custkey % {INS_MOD} <> 0
)
SELECT coalesce(n.c_custkey, o.c_custkey) AS c_custkey,
       CASE WHEN o.c_custkey IS NULL THEN 'insert'
            WHEN n.c_custkey IS NULL THEN 'delete'
            WHEN {any_diff} THEN 'update'
            ELSE 'unchanged' END AS change_type,
       CASE WHEN o.c_custkey IS NULL OR n.c_custkey IS NULL THEN ''
            ELSE concat_ws(',', {diff_cases}) END AS changed_cols
FROM new_s n FULL OUTER JOIN old_s o ON n.c_custkey = o.c_custkey
WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL OR {any_diff}
"""


@query("snapshot_diff", oracle=_oracle())
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff a simulated prior customer snapshot against the current one:
    row-level insert/delete/update classification with the changed
    column list — compare_with_source's count check upgraded to the
    audit-grade answer."""
    cust = load_table(spark, sf_dir, "customer")
    new = cust.filter(F.col("c_custkey") % DEL_MOD != 0)
    upd = F.col("c_custkey") % UPD_MOD == 0
    old = (
        cust.filter(F.col("c_custkey") % INS_MOD != 0)
        .withColumn("c_acctbal", F.when(upd, F.col("c_acctbal") + 10.0).otherwise(F.col("c_acctbal")))
        .withColumn("c_mktsegment", F.when(upd, F.lit("LEGACY")).otherwise(F.col("c_mktsegment")))
    )
    return diff_snapshots(new, old, "c_custkey", _COMPARE_COLS)
