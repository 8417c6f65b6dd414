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
