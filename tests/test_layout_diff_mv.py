"""Structural invariants for the round-7 layout/maintenance operators:
z-order file skipping, incremental MV-join maintenance, STL-lite
decomposition, and the row-level snapshot diff — complementing their
DuckDB value-hash oracles."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

import __spark_entry__ as ent

QS = ent.queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# zorder_layout_report
# ---------------------------------------------------------------------------


def test_zorder_clusters_both_dimensions(spark):
    rows = QS["zorder_layout_report"](spark, SF_SMALL).collect()
    by_layout = {}
    for r in rows:
        by_layout.setdefault(r["layout"], []).append(r)
    z, p = by_layout["zorder"], by_layout["partkey"]
    # row conservation: both layouts file every row exactly once
    assert sum(r["n_rows"] for r in z) == sum(r["n_rows"] for r in p)

    def avg_span(rs, col):
        return sum(r[col] for r in rs) / len(rs)

    # the single-column layout leaves the OTHER dimension unclustered
    # (span ≈ 1); z-order bounds both dimensions well below that
    assert avg_span(p, "span_part") < 0.25
    assert avg_span(p, "span_supp") > 0.8
    assert avg_span(z, "span_part") < 0.6
    assert avg_span(z, "span_supp") < 0.6


def test_zorder_plan_single_scan_codegen(spark):
    plan = _plan(QS["zorder_layout_report"](spark, SF_SMALL))
    # bounds agg scans once, the keyed projection scans once — the two
    # simulated layouts must NOT add a third scan (shared via explode)
    assert plan.count("Scan parquet") == 2, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_zorder_value_is_a_space_filling_key(spark):
    from etl_jlp_spark.operators.layout import Z_BITS, _bucket_sql, _interleave_sql

    # pure-python replica of the interleave on a few points: the z-value
    # of (x, y) must recover bx/by by de-interleaving
    for bx, by in [(0, 0), (255, 255), (170, 85), (1, 2)]:
        z = 0
        for i in range(Z_BITS):
            z += ((bx >> i) & 1) << (2 * i)
            z += ((by >> i) & 1) << (2 * i + 1)
        rx = sum(((z >> (2 * i)) & 1) << i for i in range(Z_BITS))
        ry = sum(((z >> (2 * i + 1)) & 1) << i for i in range(Z_BITS))
        assert (rx, ry) == (bx, by)


# ---------------------------------------------------------------------------
# mv_join_incremental
# ---------------------------------------------------------------------------


def test_mv_incremental_matches_scratch_recompute(spark):
    from etl_jlp_spark.catalog import load_table

    out = {
        (str(r["month"]), r["o_orderpriority"]): (r["n_items"], round(r["revenue"], 2))
        for r in QS["mv_join_incremental"](spark, SF_SMALL).collect()
    }
    li = load_table(spark, SF_SMALL, "lineitem")
    orders = load_table(spark, SF_SMALL, "orders")
    scratch = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
            "o_orderpriority",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"))
        .collect()
    )
    assert len(scratch) == len(out)
    for r in scratch:
        assert out[(str(r["month"]), r["o_orderpriority"])][0] == r["n_items"]


def test_mv_delta_filter_reaches_the_scan(spark):
    from etl_jlp_spark.plans.materialized import MV_CUTOFF, ensure_mv_store

    ensure_mv_store(spark, SF_SMALL)  # so the query plan is store + delta
    df = QS["mv_join_incremental"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().toString()
    assert "GreaterThanOrEqual(l_shipdate" in plan, plan[-3000:]
    assert MV_CUTOFF[:4] in plan  # the cutoff literal made it into the filter


# ---------------------------------------------------------------------------
# stl_decompose_daily
# ---------------------------------------------------------------------------


def test_stl_components_reconstruct_revenue(spark):
    rows = QS["stl_decompose_daily"](spark, SF_SMALL).orderBy("day").collect()
    assert rows
    n_interior = 0
    for r in rows:
        if r["trend"] is None:
            assert r["resid"] is None  # edges carry no decomposition
            continue
        n_interior += 1
        # additive identity up to the two 4dp roundings
        assert abs(r["revenue"] - (r["trend"] + r["seasonal"] + r["resid"])) < 2e-4
        assert 0 <= r["weekday"] <= 6
    # a 30-day series has 30 − 2·3 interior days
    assert n_interior == len(rows) - 6


def test_stl_seasonal_means_sum_to_zero(spark):
    rows = QS["stl_decompose_daily"](spark, SF_SMALL).collect()
    # per-weekday seasonal is the mean of detrended values, so the
    # weighted (by interior-day count) sum of residulas per weekday ≈ 0
    by_wd: dict[int, list[float]] = {}
    for r in rows:
        if r["resid"] is not None:
            by_wd.setdefault(r["weekday"], []).append(r["resid"])
    for wd, resids in by_wd.items():
        assert abs(sum(resids)) < 1e-2 * len(resids), (wd, resids)


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------


def test_snapshot_diff_classification(spark):
    from etl_jlp_spark.operators.diff import DEL_MOD, INS_MOD, UPD_MOD
    from etl_jlp_spark.catalog import load_table

    rows = QS["snapshot_diff"](spark, SF_SMALL).collect()
    keys = [r["c_custkey"] for r in load_table(spark, SF_SMALL, "customer").select("c_custkey").collect()]
    exp_ins = {k for k in keys if k % INS_MOD == 0 and k % DEL_MOD != 0}
    exp_del = {k for k in keys if k % DEL_MOD == 0 and k % INS_MOD != 0}
    exp_upd = {k for k in keys if k % UPD_MOD == 0 and k % INS_MOD != 0 and k % DEL_MOD != 0}
    got = {t: {r["c_custkey"] for r in rows if r["change_type"] == t} for t in ("insert", "delete", "update")}
    assert got["insert"] == exp_ins
    assert got["delete"] == exp_del
    assert got["update"] == exp_upd
    for r in rows:
        if r["change_type"] == "update":
            assert r["changed_cols"] == "c_acctbal,c_mktsegment"
        else:
            assert r["changed_cols"] == ""


def test_snapshot_diff_generic_on_other_key(spark):
    """The reusable diff core works on any frame pair, not just the
    registered simulation."""
    from etl_jlp_spark.operators.diff import diff_snapshots

    new = spark.createDataFrame([(1, "a"), (2, "b"), (4, "d")], "k int, v string")
    old = spark.createDataFrame([(1, "a"), (2, "x"), (3, "c")], "k int, v string")
    got = {r["k"]: (r["change_type"], r["changed_cols"]) for r in diff_snapshots(new, old, "k", ["v"]).collect()}
    assert got == {4: ("insert", ""), 3: ("delete", ""), 2: ("update", "v")}
