"""Invariants for the warehouse-maintenance trio: join advisor,
rollup shares, retraction-refresh MV."""

from collections import defaultdict

import duckdb

from tests.conftest import SF_SMALL

import __spark_entry__ as ent

QS = ent.queries()


def test_join_advisor_recommends_sanely(spark):
    rows = {r["fk"]: r for r in QS["join_strategy_advisor"](spark, SF_SMALL).collect()}
    assert len(rows) == 7
    # tiny dims at sf0.001 all fit the 10 MiB broadcast threshold
    for name in ("customer.c_nationkey", "nation.n_regionkey", "lineitem.l_partkey"):
        assert rows[name]["recommended"] == "broadcast"
    for r in rows.values():
        assert r["n_parent_keys"] <= r["est_parent_bytes"]  # >=1 byte per key row
        assert r["recommended"] == (
            "broadcast" if r["est_parent_bytes"] <= (10 << 20) else "sort-merge-bucketed"
        )


def test_rollup_shares_consistent(spark):
    rows = QS["revenue_rollup_shares"](spark, SF_SMALL).collect()
    by_lvl = defaultdict(list)
    for r in rows:
        by_lvl[r["lvl"]].append(r)
    assert len(by_lvl["total"]) == 1
    assert abs(by_lvl["total"][0]["share_of_parent"] - 1.0) < 1e-9
    # region shares sum to 1 over the total
    assert abs(sum(r["share_of_parent"] for r in by_lvl["region"]) - 1.0) < 1e-2
    # nation shares sum to 1 within each region
    per_region = defaultdict(float)
    for r in by_lvl["nation"]:
        per_region[r["region"]] += r["share_of_parent"]
    for region, s in per_region.items():
        assert abs(s - 1.0) < 1e-2, (region, s)
    # revenue adds up the hierarchy
    tot = by_lvl["total"][0]["rev_usd"]
    assert abs(sum(r["rev_usd"] for r in by_lvl["region"]) - tot) < 0.05


def test_retraction_refresh_equals_rebuild(spark):
    rows = {r["day"]: r for r in QS["mv_retraction_refresh"](spark, SF_SMALL).collect()}
    want = {
        d: (n, round(v / 10000.0, 4))
        for d, n, v in duckdb.sql(
            f"SELECT CAST(ts AS DATE), count(*),"
            f" sum(CAST(round(value*10000) AS BIGINT))"
            f" FROM '{SF_SMALL}/events.parquet' WHERE event_id % 37 <> 0 GROUP BY 1"
        ).fetchall()
    }
    assert set(rows) == set(want)
    for d, (n, v) in want.items():
        assert rows[d]["n_events"] == n
        assert abs(rows[d]["sum_value"] - v) < 1e-9
