"""Spark-native data-quality reporting.

Reference: QualityReport (dwh_lab/dwh/quality_report.py) — pandas
per-column loops (``df[col].isnull().sum()``, ``df.duplicated()``,
``df[col].apply(valid_fn)``). Re-expressed as *one* conditional
aggregation per table: every null-count / default-violation /
clean-rate predicate becomes a ``sum(CASE WHEN …)`` column in a single
``agg``, so the whole report is ONE scan + ONE map-side-combined
reduction regardless of how many checks you add. The duplicate check is
the only extra shuffle (distinct on the key subset).

``QualityReport`` is the programmatic API (mirrors the reference class
surface); the registered queries below are fixed instantiations used
for the correctness gate.
"""

from __future__ import annotations

import json
from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.registry import query


class QualityReport:
    """Accumulates checks, evaluates them in a single pass.

    Usage mirrors dwh_lab/dwh/quality_report.py:6-160::

        qr = QualityReport(df, "events")
        qr.check_nulls(["user_id", "ts"])
        qr.check_default_values({"source_id": 1})
        qr.track_clean_success_rate("value", F.col("value") >= 0)
        row = qr.generate()          # dict (collects the single agg)
    """

    def __init__(self, df: DataFrame, entity_name: str):
        self.df = df
        self.entity_name = entity_name
        self._aggs: list[Column] = [
            F.count(F.lit(1)).alias("num_rows"),
        ]
        self._dedup_cols: list[str] | None = None
        self._dedup_hash_cols: set[str] = set()
        self._notes: list[str] = []

    @staticmethod
    def _count_if(pred: Column, name: str) -> Column:
        return F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)

    def check_nulls(self, required_columns: list[str]) -> "QualityReport":
        for c in required_columns:
            if c in self.df.columns:
                self._aggs.append(self._count_if(F.col(c).isNull(), f"nulls_{c}"))
            else:
                self._notes.append(f"column missing: {c}")
        return self

    def check_default_values(self, defaults: Mapping[str, object]) -> "QualityReport":
        for c, v in defaults.items():
            if c in self.df.columns:
                self._aggs.append(
                    self._count_if(~F.col(c).eqNullSafe(F.lit(v)), f"bad_default_{c}")
                )
            else:
                self._notes.append(f"column missing: {c}")
        return self

    def track_clean_success_rate(self, col: str, valid: Column) -> "QualityReport":
        self._aggs.append(
            F.round(
                100.0
                * F.sum(F.when(valid, 1).otherwise(0))
                / F.sum(F.when(F.col(col).isNotNull(), 1).otherwise(0)),
                2,
            ).alias(f"clean_rate_{col}")
        )
        return self

    def check_duplicates(
        self, dedup_columns: list[str], hash_columns: list[str] | None = None
    ) -> "QualityReport":
        """``hash_columns`` names wide payload columns (e.g. a JSON blob)
        to pre-hash with md5 inside the distinct tuple: same duplicate
        count (md5(NULL) is NULL, so null semantics survive), but the
        distinct's exchange carries a 32-char digest instead of the full
        payload — at 100 TB that is ~10× fewer shuffle bytes. Only worth
        it for columns wider than the digest; key-like short columns
        should stay raw."""
        self._dedup_cols = list(dedup_columns)
        self._dedup_hash_cols = set(hash_columns or ())
        return self

    def check_formats(self, expected_dtypes: Mapping[str, str]) -> dict[str, dict]:
        """Schema check is metadata-only (no job)."""
        actual = dict(self.df.dtypes)
        return {
            c: {"expected": t, "actual": actual.get(c), "match": actual.get(c) == t}
            for c, t in expected_dtypes.items()
        }

    def check_column_mapping(self, mapping: Mapping[str, str]) -> dict[str, dict]:
        """Renamed-column verification (reference check_column_mapping,
        quality_report.py:105-107): for each ``source → target`` rename,
        the target must exist and the stale source name must be gone.
        Metadata-only — no job."""
        cols = set(self.df.columns)
        out = {}
        for src, dst in mapping.items():
            ok = dst in cols and (src == dst or src not in cols)
            out[src] = {"target": dst, "ok": ok}
            if not ok:
                self._notes.append(f"column mapping failed: {src} -> {dst}")
        return out

    def flatten_if_json(self, col: str, keys: list[str] | None = None) -> "QualityReport":
        """Reference flatten_if_json (quality_report.py:33-48): a JSON
        string column is flattened to ``{col}_{key}`` columns before
        checks run. Keys are sniffed from one non-null value (a bounded
        1-row driver action, like the reference's json_normalize probe);
        the flatten itself is a JVM-side projection (get_json_object) —
        the JSON never round-trips through Python."""
        if keys is None:
            head = self.df.select(col).filter(F.col(col).isNotNull()).head(1)
            if not head:
                self._notes.append(f"flatten_if_json: no non-null {col} values")
                return self
            try:
                parsed = json.loads(head[0][0])
            except (TypeError, ValueError):
                self._notes.append(f"flatten_if_json: {col} is not JSON")
                return self
            keys = sorted(parsed) if isinstance(parsed, dict) else []
        for k in keys:
            self.df = self.df.withColumn(
                f"{col}_{k}", F.get_json_object(F.col(col), f"$.{k}")
            )
        return self

    def add_metrics(self, *aggs: Column) -> "QualityReport":
        """Append caller-supplied aggregate columns to the single pass."""
        self._aggs.extend(aggs)
        return self

    def summary_df(self) -> DataFrame:
        """The whole report is ONE aggregation job: the duplicate check
        rides the same pass as ``count(DISTINCT struct(keys))`` (struct,
        not bare columns — SQL count-distinct drops null-containing
        tuples, the reference's ``df.duplicated()`` does not)."""
        aggs = list(self._aggs)
        if self._dedup_cols:
            key_cols = [
                F.md5(F.col(c)) if c in self._dedup_hash_cols else F.col(c)
                for c in self._dedup_cols
            ]
            aggs.append(
                (F.count(F.lit(1)) - F.countDistinct(F.struct(*key_cols)))
                .cast("long")
                .alias("duplicate_rows")
            )
        return self.df.agg(*aggs)

    def generate(self) -> dict:
        row = self.summary_df().collect()[0].asDict()
        row["entity"] = self.entity_name
        if self._notes:
            row["notes"] = list(self._notes)
        return row


@query(
    "quality_report",
    oracle="""
SELECT CAST(a.num_rows AS BIGINT) AS num_rows,
       CAST(a.nulls_user_id AS BIGINT) AS nulls_user_id,
       CAST(a.nulls_ts AS BIGINT) AS nulls_ts,
       CAST(a.nulls_event_type AS BIGINT) AS nulls_event_type,
       CAST(a.nulls_value AS BIGINT) AS nulls_value,
       CAST(a.nulls_props AS BIGINT) AS nulls_props,
       CAST(a.distinct_users AS BIGINT) AS distinct_users,
       a.min_ts, a.max_ts,
       CAST(a.num_rows - d.distinct_keys AS BIGINT) AS duplicate_rows
FROM (
  SELECT count(*) AS num_rows,
         sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS nulls_user_id,
         sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS nulls_ts,
         sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS nulls_event_type,
         sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nulls_value,
         sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS nulls_props,
         count(DISTINCT user_id) AS distinct_users,
         min(ts) AS min_ts, max(ts) AS max_ts
  FROM events
) a CROSS JOIN (
  SELECT count(*) AS distinct_keys
  FROM (SELECT DISTINCT user_id, event_type, md5(props) FROM events)
) d
""",
)
def quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    agg = events.agg(
        F.count(F.lit(1)).cast("long").alias("num_rows"),
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"nulls_{c}")
            for c in ("user_id", "ts", "event_type", "value", "props")
        ],
        F.countDistinct("user_id").cast("long").alias("distinct_users"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )
    # md5(props) BEFORE the distinct: the duplicate-check exchange moves a
    # 32-char digest, not the full JSON payload (~10× fewer shuffle bytes
    # at 100 TB; md5(NULL)=NULL so null rows still count as the reference's
    # df.duplicated() would).
    distinct_keys = (
        events.select("user_id", "event_type", F.md5("props").alias("props_h"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("distinct_keys"))
    )
    return agg.crossJoin(distinct_keys).select(
        "num_rows",
        *[f"nulls_{c}" for c in ("user_id", "ts", "event_type", "value", "props")],
        "distinct_users",
        "min_ts",
        "max_ts",
        (F.col("num_rows") - F.col("distinct_keys")).cast("long").alias("duplicate_rows"),
    )


@query(
    "quality_report_lineitem",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS num_rows,
       CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_quantity,
       CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
       CAST(sum(CASE WHEN l_tax < 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_tax,
       CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS bad_returnflag,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS distinct_orders,
       round(avg(l_extendedprice), 4) AS avg_price,
       min(l_shipdate) AS min_shipdate, max(l_shipdate) AS max_shipdate
FROM lineitem
""",
)
def quality_report_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-report shape on the biggest fact table — still ONE
    scan + one partial-agg reduction regardless of check count."""
    li = load_table(spark, sf_dir, "lineitem")

    def viol(pred: Column, name: str) -> Column:
        return F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)

    return li.agg(
        F.count(F.lit(1)).cast("long").alias("num_rows"),
        viol(F.col("l_quantity").isNull() | (F.col("l_quantity") <= 0), "bad_quantity"),
        viol((F.col("l_discount") < 0) | (F.col("l_discount") > 1), "bad_discount"),
        viol(F.col("l_tax") < 0, "bad_tax"),
        viol(~F.col("l_returnflag").isin("A", "N", "R"), "bad_returnflag"),
        F.countDistinct("l_orderkey").cast("long").alias("distinct_orders"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
    )


@query(
    "quality_array_fields",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS num_rows,
       CAST(sum(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_embeddings,
       CAST(sum(CASE WHEN embedding IS NOT NULL AND len(embedding) != 64 THEN 1 ELSE 0 END) AS BIGINT) AS wrong_dim,
       CAST(count(DISTINCT len(embedding)) AS BIGINT) AS distinct_dims,
       CAST(sum(CASE WHEN label IS NULL OR label < 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_labels
FROM embeddings
""",
)
def quality_array_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column validity (reference check_array_fields,
    quality_report.py:97-103): null / wrong-dimension / label checks on
    the embeddings table, one pass."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.agg(
        F.count(F.lit(1)).cast("long").alias("num_rows"),
        F.sum(F.when(F.col("embedding").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_embeddings"),
        F.sum(
            F.when(F.col("embedding").isNotNull() & (F.size("embedding") != 64), 1).otherwise(0)
        )
        .cast("long")
        .alias("wrong_dim"),
        F.countDistinct(F.size("embedding")).cast("long").alias("distinct_dims"),
        F.sum(F.when(F.col("label").isNull() | (F.col("label") < 0), 1).otherwise(0))
        .cast("long")
        .alias("bad_labels"),
    )


@query(
    "quality_report_flat",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS num_rows,
       CAST(sum(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_props_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_props_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_props_k,
       CAST(count(DISTINCT json_extract_string(props, '$.k')) AS BIGINT) AS distinct_props_k,
       CAST(count(*) - count(DISTINCT {'u': user_id, 'k': json_extract_string(props, '$.k')}) AS BIGINT) AS duplicate_rows
FROM events
""",
)
def quality_report_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's quality flow on a semi-structured column: the
    props JSON is auto-flattened (flatten_if_json) and the checks —
    nulls, range, cardinality, duplicate keys — run on the FLATTENED
    columns, all in the class's single aggregation pass."""
    events = load_table(spark, sf_dir, "events")
    qr = (
        QualityReport(events, "events")
        .flatten_if_json("props")
        .check_nulls(["props_k"])
        .add_metrics(
            F.min(F.col("props_k").cast("long")).cast("long").alias("min_props_k"),
            F.max(F.col("props_k").cast("long")).cast("long").alias("max_props_k"),
            F.countDistinct("props_k").cast("long").alias("distinct_props_k"),
        )
        .check_duplicates(["user_id", "props_k"])
    )
    return qr.summary_df()


@query(
    "quality_clean_rate",
    oracle="""
SELECT round(100.0 * sum(CASE WHEN text IS NOT NULL AND length(trim(text)) > 0 THEN 1 ELSE 0 END) / count(*), 2) AS rate_text_nonempty,
       round(100.0 * sum(CASE WHEN n_chars = length(text) THEN 1 ELSE 0 END) / count(*), 2) AS rate_nchars_consistent,
       round(100.0 * sum(CASE WHEN lang IN ('en','es','fr','de','zh','ja') THEN 1 ELSE 0 END) / count(*), 2) AS rate_lang_known,
       round(100.0 * sum(CASE WHEN source LIKE 'src%' THEN 1 ELSE 0 END) / count(*), 2) AS rate_source_valid
FROM documents
""",
)
def quality_clean_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    def rate(pred: Column, name: str) -> Column:
        return F.round(
            100.0 * F.sum(F.when(pred, 1).otherwise(0)) / F.count(F.lit(1)), 2
        ).alias(name)

    return docs.agg(
        rate(F.col("text").isNotNull() & (F.length(F.trim("text")) > 0), "rate_text_nonempty"),
        rate(F.col("n_chars") == F.length("text"), "rate_nchars_consistent"),
        rate(F.col("lang").isin("en", "es", "fr", "de", "zh", "ja"), "rate_lang_known"),
        rate(F.col("source").like("src%"), "rate_source_valid"),
    )


@query(
    "quality_format_check",
    oracle="""
SELECT CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS violations_value_negative,
       CAST(sum(CASE WHEN event_type NOT IN ('click','view','purchase','signup','error') THEN 1 ELSE 0 END) AS BIGINT) AS violations_event_type,
       CAST(sum(CASE WHEN props NOT LIKE '{%' THEN 1 ELSE 0 END) AS BIGINT) AS violations_props_json,
       CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-01 00:00:00' OR ts >= TIMESTAMP '2025-01-01 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS violations_ts_range
FROM events
""",
)
def quality_format_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    def viol(pred: Column, name: str) -> Column:
        return F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)

    return events.agg(
        viol(F.col("value") < 0, "violations_value_negative"),
        viol(
            ~F.col("event_type").isin("click", "view", "purchase", "signup", "error"),
            "violations_event_type",
        ),
        viol(~F.col("props").like("{%"), "violations_props_json"),
        viol(
            (F.col("ts") < F.lit("2024-01-01 00:00:00").cast("timestamp"))
            | (F.col("ts") >= F.lit("2025-01-01 00:00:00").cast("timestamp")),
            "violations_ts_range",
        ),
    )


# FK graph of the warehouse: (child table, fk column, parent table, pk)
FK_PAIRS = (
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


@query(
    "referential_integrity_report",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{child}.{fk}' AS fk,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN {fk} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(sum(CASE WHEN {fk} IS NOT NULL AND p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan
FROM {child} c LEFT JOIN {parent} p ON c.{fk} = p.{pk}"""
        for child, fk, parent, pk in FK_PAIRS
    ),
)
def referential_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse-wide FK integrity: for every foreign-key edge, the row
    count, NULL-key count, and ORPHAN count (non-null key with no
    parent) — the referential completion of the reference's
    ``compare_with_source`` reconciliation (dwh_lab/dwh/
    quality_report.py compare_with_source), which only ever checked one
    table against its own staging copy.

    Plan: one LEFT join + one 3-counter conditional agg per edge, the
    parent side reduced to its DISTINCT key column first. Dimension
    parents (region/nation/customer/part/supplier) broadcast; the one
    fact→fact edge (lineitem→orders) is an orderkey equi-join both
    sides pre-bucketable by that key (tests/test_bucketing.py shows the
    zero-exchange layout). Each edge's agg collapses map-side to one
    row; the report is #edges rows total."""
    parts: list[DataFrame] = []
    for child, fk, parent, pk in FK_PAIRS:
        c = load_table(spark, sf_dir, child).select(F.col(fk).alias("k"))
        p = load_table(spark, sf_dir, parent).select(F.col(pk).alias("pk")).distinct()
        joined = c.join(p, c["k"] == p["pk"], "left")
        agg = joined.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).cast("long").alias("n_null"),
            F.sum(F.when(F.col("k").isNotNull() & F.col("pk").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_orphan"),
        )
        parts.append(
            agg.select(F.lit(f"{child}.{fk}").alias("fk"), "n_rows", "n_null", "n_orphan")
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out


# ---------------------------------------------------------------------------
# Cross-table money reconciliation: does the order header total equal
# the lineitem-derived total — the classic finance-grade consistency
# audit between a fact and its rollup header.
# ---------------------------------------------------------------------------

RECON_TOL_CENTS = 1


@query(
    "order_reconciliation_report",
    oracle=f"""
WITH li AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)
                  AS BIGINT)) AS BIGINT) AS derived_c
  FROM lineitem GROUP BY 1
), j AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS header_c,
         li.derived_c
  FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey
)
SELECT yr,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(*) FILTER (WHERE abs(header_c - derived_c) <= {RECON_TOL_CENTS})
            AS BIGINT) AS n_reconciled,
       round(avg(abs(header_c - derived_c)) / 100.0, 4) + 0.0 AS mean_abs_diff,
       round(max(abs(header_c - derived_c)) / 100.0, 2) + 0.0 AS max_abs_diff
FROM j GROUP BY 1
""",
)
def order_reconciliation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail money reconciliation per order year: recompute
    each order's total from its line items (extendedprice ×
    (1−discount) × (1+tax), the TPC-H pricing identity), compare to
    the o_totalprice header in exact cents, and report the reconciled
    share and the error distribution — the audit every finance
    warehouse runs nightly between a fact table and its denormalized
    header (a mismatch means a load lost/duplicated lines or applied
    a different rounding).

    Plan: one lineitem scan → per-order cents agg (map-side
    combinable on the join key), one join to orders (AQE picks the
    strategy; both sides are keyed by orderkey so bucketed layouts
    co-locate it), one |years|-row rollup. All comparisons are exact
    integer cents."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    derived = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")) * 100
            ).cast("long")
        )
        .cast("long")
        .alias("derived_c")
    )
    j = o.join(derived, o.o_orderkey == derived.l_orderkey).select(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("header_c"),
        "derived_c",
    )
    diff = F.abs(F.col("header_c") - F.col("derived_c"))
    return j.groupBy("yr").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(diff <= RECON_TOL_CENTS, 1).otherwise(0))
        .cast("long")
        .alias("n_reconciled"),
        F.round(F.avg(diff) / 100.0, 4).alias("mean_abs_diff"),
        F.round(F.max(diff) / 100.0, 2).alias("max_abs_diff"),
    )
