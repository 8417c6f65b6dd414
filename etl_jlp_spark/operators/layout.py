"""Z-order data layout: multi-dimensional clustering for file skipping.

At 100 TB the dominant cost of a selective query is the files it can
NOT skip. Range-partitioning clusters ONE column; predicates on any
other column read everything. Z-ordering interleaves the bits of
several normalized key columns into one sort key, so files cover small
hyper-rectangles of the combined key space and min/max footer stats
prune scans on EVERY interleaved column.

``zorder_value`` is the reusable scan-side primitive (pure integer
arithmetic — stays inside whole-stage codegen; in production you
``repartitionByRange`` on it and write). ``zorder_layout_report``
registers the effectiveness report: the same rows filed two ways
(z-order vs single-column ranges), with each file's min/max span per
dimension — exactly the quantity a min/max-stats pruner uses. The
DuckDB oracle re-derives the identical interleave, so the driver's
hash match proves the layout math cross-engine.

The reference ships data ordered however the extract produced it
(general_lib.py write paths); this is the layout layer it lacks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import query

Z_BITS = 8  # bits per dimension → z in [0, 2^(2*Z_BITS))
Z_FILES = 16  # simulated file count per layout


def _interleave_sql(bx: str, by: str) -> str:
    """Bit-interleave expression valid in BOTH Spark SQL and DuckDB
    (only ``>> << & |`` and ``+`` on integers)."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({bx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({by} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _bucket_sql(col: str, lo: str, hi: str) -> tuple[str, str]:
    """(spark_expr, duckdb_expr) mapping ``col`` into [0, 2^Z_BITS)
    by exact integer arithmetic — identical results in both engines
    because every operand is a non-negative integer."""
    n = 1 << Z_BITS
    spark = f"(({col} - {lo}) * {n}) div ({hi} - {lo} + 1)"
    duck = f"(({col} - {lo}) * {n}) // ({hi} - {lo} + 1)"
    return spark, duck


def zorder_value(df: DataFrame, x: str, y: str, bounds: DataFrame) -> Column:
    """Z-value column for (x, y) given a broadcast 1-row ``bounds``
    relation with columns lo_x/hi_x/lo_y/hi_y. Callers crossJoin the
    bounds first; the expression itself is codegen-only arithmetic."""
    bx, _ = _bucket_sql(x, "lo_x", "hi_x")
    by, _ = _bucket_sql(y, "lo_y", "hi_y")
    return F.expr(_interleave_sql(f"({bx})", f"({by})"))


def _oracle() -> str:
    bx_d = _bucket_sql("l_partkey", "lo_x", "hi_x")[1]
    by_d = _bucket_sql("l_suppkey", "lo_y", "hi_y")[1]
    z = _interleave_sql(f"({bx_d})", f"({by_d})")
    files_shift = 2 * Z_BITS  # z range bits
    z_div = (1 << files_shift) // Z_FILES
    p_div = (1 << Z_BITS) // Z_FILES
    return f"""
WITH b AS (
  SELECT min(l_partkey) AS lo_x, max(l_partkey) AS hi_x,
         min(l_suppkey) AS lo_y, max(l_suppkey) AS hi_y
  FROM lineitem
), keyed AS (
  SELECT l.l_partkey, l.l_suppkey,
         ({z}) // {z_div} AS zfile,
         ({bx_d}) // {p_div} AS pfile
  FROM lineitem l CROSS JOIN b
), stacked AS (
  SELECT 'zorder' AS layout, zfile AS file_id, l_partkey, l_suppkey FROM keyed
  UNION ALL
  SELECT 'partkey' AS layout, pfile AS file_id, l_partkey, l_suppkey FROM keyed
)
SELECT s.layout, CAST(s.file_id AS INT) AS file_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(l_partkey) AS BIGINT) AS min_part,
       CAST(max(l_partkey) AS BIGINT) AS max_part,
       CAST(min(l_suppkey) AS BIGINT) AS min_supp,
       CAST(max(l_suppkey) AS BIGINT) AS max_supp,
       round((max(l_partkey) - min(l_partkey) + 1)
             / CAST(any_value(b.hi_x) - any_value(b.lo_x) + 1 AS DOUBLE), 4)
         AS span_part,
       round((max(l_suppkey) - min(l_suppkey) + 1)
             / CAST(any_value(b.hi_y) - any_value(b.lo_y) + 1 AS DOUBLE), 4)
         AS span_supp
FROM stacked s CROSS JOIN b
GROUP BY s.layout, s.file_id
"""


@query("zorder_layout_report", oracle=_oracle())
def zorder_layout_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-skipping effectiveness of a z-order layout vs single-column
    range layout over lineitem (l_partkey × l_suppkey): per simulated
    file, the min/max span each dimension's footer stats would expose
    to a pruner (span ≈ 1/Z_FILES per dim for z-order on BOTH columns;
    the single-column layout leaves span_supp ≈ 1).

    Plan: bounds are one 1-row agg broadcast onto the scan; the
    z-value is pure integer codegen; the two layouts share one scan
    via an Expand (explode of two labeled assignments) and one
    hash aggregate. At 100 TB: compute z, repartitionByRange(z),
    write — the report itself stays file-count-sized."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bounds = li.agg(
        F.min("l_partkey").alias("lo_x"),
        F.max("l_partkey").alias("hi_x"),
        F.min("l_suppkey").alias("lo_y"),
        F.max("l_suppkey").alias("hi_y"),
    )
    bx = _bucket_sql("l_partkey", "lo_x", "hi_x")[0]
    by = _bucket_sql("l_suppkey", "lo_y", "hi_y")[0]
    z = _interleave_sql(f"({bx})", f"({by})")
    z_div = (1 << (2 * Z_BITS)) // Z_FILES
    p_div = (1 << Z_BITS) // Z_FILES
    keyed = li.crossJoin(F.broadcast(bounds)).select(
        "l_partkey",
        "l_suppkey",
        "lo_x",
        "hi_x",
        "lo_y",
        "hi_y",
        F.expr(f"({z}) div {z_div}").alias("zfile"),
        F.expr(f"({bx}) div {p_div}").alias("pfile"),
    )
    stacked = keyed.select(
        F.explode(
            F.array(
                F.struct(F.lit("zorder").alias("layout"), F.col("zfile").alias("file_id")),
                F.struct(F.lit("partkey").alias("layout"), F.col("pfile").alias("file_id")),
            )
        ).alias("a"),
        "l_partkey",
        "l_suppkey",
        "lo_x",
        "hi_x",
        "lo_y",
        "hi_y",
    )
    return (
        stacked.groupBy(
            F.col("a.layout").alias("layout"),
            F.col("a.file_id").cast("int").alias("file_id"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("l_partkey").cast("long").alias("min_part"),
            F.max("l_partkey").cast("long").alias("max_part"),
            F.min("l_suppkey").cast("long").alias("min_supp"),
            F.max("l_suppkey").cast("long").alias("max_supp"),
            F.round(
                (F.max("l_partkey") - F.min("l_partkey") + 1)
                / (F.first("hi_x") - F.first("lo_x") + 1).cast("double"),
                4,
            ).alias("span_part"),
            F.round(
                (F.max("l_suppkey") - F.min("l_suppkey") + 1)
                / (F.first("hi_y") - F.first("lo_y") + 1).cast("double"),
                4,
            ).alias("span_supp"),
        )
    )


# ---------------------------------------------------------------------------
# Partition/file-size advisor: the table-maintenance report that turns
# "how should this land in object storage" into numbers. Small files
# are the silent killer at 100 TB (every file is a task + an open/seek;
# a 10 KB-file day costs more scheduler time than scan time), and one
# oversized partition is the straggler. The advisor estimates the
# serialized bytes per natural partition (day) from column widths,
# recommends a file count at the target size, and flags skew vs the
# median day — exactly the inputs a compaction job needs.
# ---------------------------------------------------------------------------

TARGET_FILE_BYTES = 64 * 1024  # test-scaled; production: 128 << 20


_ADVISOR_ROW_BYTES_SQL = (
    "8 + 8 + 8 + 8 + length(event_type) + length(coalesce(props, ''))"
)


@query(
    "partition_size_advisor",
    oracle=f"""
WITH per_day AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum({_ADVISOR_ROW_BYTES_SQL}) AS BIGINT) AS est_bytes
  FROM events GROUP BY 1
), med AS (SELECT median(est_bytes) AS m FROM per_day)
SELECT day, n_rows, est_bytes,
       CAST(ceil(est_bytes / CAST({TARGET_FILE_BYTES} AS DOUBLE)) AS BIGINT)
         AS files_needed,
       round(est_bytes / m, 4) AS bytes_vs_median,
       est_bytes > 2 * m AS skewed
FROM per_day CROSS JOIN med
""",
)
def partition_size_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day (the natural ingest partition) row count, estimated
    serialized bytes from fixed+variable column widths, the file count
    that hits the target file size, and a skew flag vs the median day —
    the report a nightly compaction/right-sizing job consumes.

    Plan: one scan → one map-side-combinable per-day aggregate (the
    byte estimate is a codegen projection); the median is computed over
    the |days|-row aggregate and broadcast back as a scalar join — no
    second scan of the fact table. At 100 TB swap the estimate for file
    metadata if the table format exposes it; the report shape and the
    advisor thresholds stay the same."""
    ev = load_table(spark, sf_dir, "events")
    # localCheckpoint: the median branch would otherwise re-derive the
    # rollup from a SECOND fact scan (column pruning specializes the
    # subtree and defeats ReusedExchange); the checkpointed relation is
    # days-bounded. Plan-asserted in test_plans.py.
    per_day = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(
            F.lit(32) + F.length("event_type") + F.length(F.coalesce("props", F.lit("")))
        ).cast("long").alias("est_bytes"),
    ).localCheckpoint(eager=False)
    med = per_day.agg(F.expr("percentile(est_bytes, 0.5)").alias("m"))
    return per_day.crossJoin(F.broadcast(med)).select(
        "day",
        "n_rows",
        "est_bytes",
        F.ceil(F.col("est_bytes") / F.lit(float(TARGET_FILE_BYTES))).cast("long").alias("files_needed"),
        F.round(F.col("est_bytes") / F.col("m"), 4).alias("bytes_vs_median"),
        (F.col("est_bytes") > 2 * F.col("m")).alias("skewed"),
    )


# ---------------------------------------------------------------------------
# Join-strategy advisor: turns table statistics into the
# broadcast-vs-shuffle decision Catalyst makes from size estimates —
# materialized as a REPORT so a pipeline owner can pin hints, size
# `spark.sql.autoBroadcastJoinThreshold`, and pick bucket keys before
# the 100 TB run instead of discovering a sort-merge join in the night
# logs. Byte estimates use the same column-width model as
# partition_size_advisor.
# ---------------------------------------------------------------------------

BROADCAST_THRESHOLD = 10 << 20  # Spark's autoBroadcastJoinThreshold default

# full-row serialized-width expression per parent table (8 B per
# numeric/timestamp column + actual string lengths)
_ROW_BYTES = {
    "region": "8 + length(r_name)",
    "nation": "8 + length(n_name) + 8",
    "customer": "8 + length(c_name) + 8 + 8 + length(c_mktsegment)",
    "supplier": "8 + length(s_name) + 8 + 8",
    "part": "8 + length(p_name) + length(p_brand) + length(p_type) + 8 + 8",
    "orders": "8 + 8 + length(o_orderstatus) + 8 + 8 + length(o_orderpriority)",
}


def _advisor_edges():
    from etl_jlp_spark.quality.report import FK_PAIRS

    return FK_PAIRS


def _join_advisor_oracle() -> str:
    from etl_jlp_spark.quality.report import FK_PAIRS

    parts = []
    for child, fk, parent, pk in FK_PAIRS:
        parts.append(f"""
SELECT '{child}.{fk}' AS fk, '{parent}' AS parent,
       (SELECT CAST(count(*) AS BIGINT) FROM {child}) AS n_child_rows,
       (SELECT CAST(count(DISTINCT {pk}) AS BIGINT) FROM {parent}) AS n_parent_keys,
       (SELECT CAST(sum({_ROW_BYTES[parent]}) AS BIGINT) FROM {parent})
         AS est_parent_bytes,
       CASE WHEN (SELECT sum({_ROW_BYTES[parent]}) FROM {parent})
                 <= {BROADCAST_THRESHOLD}
            THEN 'broadcast' ELSE 'sort-merge-bucketed' END AS recommended""")
    return "\nUNION ALL\n".join(parts)


@query("join_strategy_advisor", oracle=_join_advisor_oracle())
def join_strategy_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-FK-edge join planning report: child cardinality, parent
    distinct-key count, the parent's full-row byte estimate, and the
    recommended physical strategy (broadcast when the build side fits
    Spark's default 10 MiB auto-broadcast threshold, else a sort-merge
    join with both sides bucketed on the key) — the decision table a
    100 TB pipeline pins as join hints + bucket specs instead of
    letting a stale-stats optimizer guess.

    Plan: one column-pruned aggregate per table (each scanned once,
    counts + byte sums map-side combinable); the report is #edges
    rows of scalar algebra. In production the byte model is swapped
    for catalog statistics when the table format maintains them; the
    decision column is unchanged."""
    out = None
    for child, fk, parent, pk in _advisor_edges():
        c = load_table(spark, sf_dir, child).agg(
            F.count(F.lit(1)).cast("long").alias("n_child_rows")
        )
        p = load_table(spark, sf_dir, parent).agg(
            F.countDistinct(pk).cast("long").alias("n_parent_keys"),
            F.sum(F.expr(_ROW_BYTES[parent])).cast("long").alias("est_parent_bytes"),
        )
        one = c.crossJoin(p).select(
            F.lit(f"{child}.{fk}").alias("fk"),
            F.lit(parent).alias("parent"),
            "n_child_rows",
            "n_parent_keys",
            "est_parent_bytes",
            F.when(
                F.col("est_parent_bytes") <= BROADCAST_THRESHOLD, "broadcast"
            )
            .otherwise("sort-merge-bucketed")
            .alias("recommended"),
        )
        out = one if out is None else out.unionByName(one)
    return out


# ---------------------------------------------------------------------------
# Hilbert-curve layout: the locality-preserving alternative to the
# Z-order above. Z-curves have long diagonal jumps at power-of-two
# boundaries (a file can span half the key space in one dimension);
# the Hilbert curve's recursive rotations keep every consecutive run
# spatially contiguous, which is why large lakehouse engines added
# hilbert clustering after shipping z-order. Same report shape:
# per-simulated-file min/max spans per dimension, hilbert vs z-order,
# from ONE scan. The curve index is the classic xy→d bit algorithm
# (8 unrolled rotation steps) in pure integer CASE/&/± arithmetic —
# identical text in Spark SQL and DuckDB, so the driver hash-match
# proves the curve math cross-engine ((3·rx) XOR ry is expanded to
# 3rx + ry − 2·rx·ry because ^ is POWER in DuckDB).
# ---------------------------------------------------------------------------


def _hilbert_steps() -> list[tuple[str, str, str]]:
    """(x_expr, y_expr, d_expr) per unrolled step, referencing columns
    x, y, d — portable SQL (CASE, &, arithmetic only)."""
    steps = []
    for i in range(Z_BITS):
        s = 1 << (Z_BITS - 1 - i)
        rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
        d = f"d + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry})"
        x = (
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s - 1} - y ELSE y END)"
            f" ELSE x END"
        )
        y = (
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s - 1} - x ELSE x END)"
            f" ELSE y END"
        )
        steps.append((x, y, d))
    return steps


def _hilbert_oracle() -> str:
    bx_d = _bucket_sql("l_partkey", "lo_x", "hi_x")[1]
    by_d = _bucket_sql("l_suppkey", "lo_y", "hi_y")[1]
    z = _interleave_sql(f"({bx_d})", f"({by_d})")
    sql = f"""
WITH b AS (
  SELECT min(l_partkey) AS lo_x, max(l_partkey) AS hi_x,
         min(l_suppkey) AS lo_y, max(l_suppkey) AS hi_y
  FROM lineitem
), h0 AS (
  SELECT l_partkey, l_suppkey,
         ({bx_d}) AS x, ({by_d}) AS y, CAST(0 AS BIGINT) AS d,
         ({z}) AS zval
  FROM lineitem CROSS JOIN b
)"""
    for i, (x, y, d) in enumerate(_hilbert_steps(), start=1):
        sql += f""",
h{i} AS (SELECT l_partkey, l_suppkey, {x} AS x, {y} AS y, {d} AS d, zval FROM h{i - 1})"""
    z_div = (1 << (2 * Z_BITS)) // Z_FILES
    sql += f""",
keyed AS (
  SELECT l_partkey, l_suppkey, d // {z_div} AS hfile, zval // {z_div} AS zfile
  FROM h{Z_BITS}
), stacked AS (
  SELECT 'hilbert' AS layout, hfile AS file_id, l_partkey, l_suppkey FROM keyed
  UNION ALL
  SELECT 'zorder' AS layout, zfile AS file_id, l_partkey, l_suppkey FROM keyed
)
SELECT s.layout, CAST(s.file_id AS INT) AS file_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       round((max(l_partkey) - min(l_partkey) + 1)
             / CAST(any_value(b.hi_x) - any_value(b.lo_x) + 1 AS DOUBLE), 4)
         AS span_part,
       round((max(l_suppkey) - min(l_suppkey) + 1)
             / CAST(any_value(b.hi_y) - any_value(b.lo_y) + 1 AS DOUBLE), 4)
         AS span_supp
FROM stacked s CROSS JOIN b
GROUP BY s.layout, s.file_id
"""
    return sql


@query("hilbert_layout_report", oracle=_hilbert_oracle())
def hilbert_layout_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert vs z-order file spans over the same (l_partkey,
    l_suppkey) bucketing: per simulated file, each dimension's min/max
    span as a fraction of the key range — the quantity a footer-stats
    pruner uses. Hilbert's rotations avoid the z-curve's
    power-of-two-boundary jumps, so its worst-file spans are tighter;
    this report MEASURES that instead of asserting it.

    Plan: bounds broadcast onto one scan, 8 unrolled integer rotation
    steps (all codegen — no UDF, no loop at runtime), both layouts
    share the scan through one union + hash aggregate. Production:
    repartitionByRange(hilbert_d) + write, identical to the z-order
    path."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bounds = li.agg(
        F.min("l_partkey").alias("lo_x"),
        F.max("l_partkey").alias("hi_x"),
        F.min("l_suppkey").alias("lo_y"),
        F.max("l_suppkey").alias("hi_y"),
    )
    bx = _bucket_sql("l_partkey", "lo_x", "hi_x")[0]
    by = _bucket_sql("l_suppkey", "lo_y", "hi_y")[0]
    z = _interleave_sql(f"({bx})", f"({by})")
    cur = li.crossJoin(F.broadcast(bounds)).selectExpr(
        "l_partkey",
        "l_suppkey",
        f"({bx}) AS x",
        f"({by}) AS y",
        "CAST(0 AS BIGINT) AS d",
        f"({z}) AS zval",
    )
    for x, y, d in _hilbert_steps():
        cur = cur.selectExpr(
            "l_partkey", "l_suppkey", f"{x} AS x", f"{y} AS y", f"{d} AS d", "zval"
        )
    z_div = (1 << (2 * Z_BITS)) // Z_FILES
    keyed = cur.selectExpr(
        "l_partkey",
        "l_suppkey",
        f"d div {z_div} AS hfile",
        f"zval div {z_div} AS zfile",
    )
    stacked = keyed.select(
        F.explode(
            F.array(
                F.struct(F.lit("hilbert").alias("layout"), F.col("hfile").alias("file_id")),
                F.struct(F.lit("zorder").alias("layout"), F.col("zfile").alias("file_id")),
            )
        ).alias("a"),
        "l_partkey",
        "l_suppkey",
    ).crossJoin(F.broadcast(bounds))
    return (
        stacked.groupBy(
            F.col("a.layout").alias("layout"),
            F.col("a.file_id").cast("int").alias("file_id"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(
                (F.max("l_partkey") - F.min("l_partkey") + 1)
                / (F.first("hi_x") - F.first("lo_x") + 1).cast("double"),
                4,
            ).alias("span_part"),
            F.round(
                (F.max("l_suppkey") - F.min("l_suppkey") + 1)
                / (F.first("hi_y") - F.first("lo_y") + 1).cast("double"),
                4,
            ).alias("span_supp"),
        )
    )


# ---------------------------------------------------------------------------
# Compaction packing plan: partition_size_advisor says which ingest
# partitions are mis-sized; this op produces the actual small-file
# compaction GROUPS a rewrite job executes — cumulative-volume packing
# (size-desc first-fit-by-volume) of the (day × event_type) file
# inventory into target-sized bins. Each bin is one output file of the
# compaction rewrite; fill_ratio shows how close the plan lands to the
# target, and oversized inventory entries isolate into their own bins.
# ---------------------------------------------------------------------------


@query(
    "compaction_packing_plan",
    oracle=f"""
WITH inv AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         CAST(sum(32 + length(event_type) + length(coalesce(props, ''))) AS BIGINT)
           AS est_bytes
  FROM events GROUP BY 1, 2
), ordered AS (
  SELECT day, event_type, est_bytes,
         sum(est_bytes) OVER (ORDER BY est_bytes DESC, day ASC, event_type ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM inv
), binned AS (
  SELECT day, event_type, est_bytes,
         CAST((cum - est_bytes) // {TARGET_FILE_BYTES} AS BIGINT) AS bin_id
  FROM ordered
)
SELECT bin_id,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(est_bytes) AS BIGINT) AS total_bytes,
       round(CAST(sum(est_bytes) AS DOUBLE) / {TARGET_FILE_BYTES}, 4) AS fill_ratio,
       CAST(max(est_bytes) AS BIGINT) AS max_file_bytes,
       CAST(min(est_bytes) AS BIGINT) AS min_file_bytes
FROM binned GROUP BY bin_id
""",
)
def compaction_packing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin-packed compaction groups over the (day × event_type) file
    inventory: order files by estimated bytes descending (ties by day,
    type — fully deterministic), take the running cumulative volume,
    and cut a bin every TARGET_FILE_BYTES of it (bin = pre-file cum //
    target). Size-desc ordering keeps each bin's contents homogeneous
    and lets an oversized partition occupy its bins alone.

    Scale shape: the inventory is ONE map-side-combinable aggregate of
    the fact table (the same width model as partition_size_advisor —
    swap in real file metadata when the table format exposes it); the
    packing window runs over the days×types-bounded inventory relation
    (a few thousand rows at any corpus size), so the single-partition
    cumulative window is domain-bounded by construction. All packing
    arithmetic is exact integers."""
    inv = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.sum(
                F.lit(32) + F.length("event_type") + F.length(F.coalesce("props", F.lit("")))
            )
            .cast("long")
            .alias("est_bytes")
        )
    )
    w = (
        Window.orderBy(F.col("est_bytes").desc(), F.col("day").asc(), F.col("event_type").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exact integer floor-div (`div`), mirroring the oracle's `//`: a
    # double division only floors identically while cum < 2^53 and the
    # target is a power of two — neither is a contract worth relying on.
    binned = inv.withColumn(
        "cum", F.sum("est_bytes").over(w)
    ).select(
        "day",
        "event_type",
        "est_bytes",
        F.expr(f"(cum - est_bytes) div {TARGET_FILE_BYTES}").cast("long").alias("bin_id"),
    )
    return binned.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("est_bytes").cast("long").alias("total_bytes"),
        F.round(F.sum("est_bytes").cast("double") / TARGET_FILE_BYTES, 4).alias("fill_ratio"),
        F.max("est_bytes").cast("long").alias("max_file_bytes"),
        F.min("est_bytes").cast("long").alias("min_file_bytes"),
    )
