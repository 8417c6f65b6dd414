"""Structural invariants for the profiling operators (FD discovery,
column entropy)."""

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

import __spark_entry__ as ent

QS = ent.queries()


def test_fd_pk_is_exact_and_order_separates(spark):
    rows = {r["determinant"]: r for r in QS["fd_profile_report"](spark, SF_SMALL).collect()}
    pk = rows["event_id"]
    assert pk["exact_fd"] is True
    assert pk["fd_confidence"] == 1.0
    assert pk["n_lhs"] == pk["n_pairs"] == pk["n_rows"]
    weak = rows["event_type"]
    assert weak["exact_fd"] is False
    assert weak["fd_confidence"] < 1.0
    # confidence is a rate: bounded by (1/avg group breadth, 1]
    for r in rows.values():
        assert 0.0 < r["fd_confidence"] <= 1.0
        assert r["n_lhs"] <= r["n_pairs"] <= r["n_rows"]


def test_fd_confidence_matches_bruteforce(spark):
    from etl_jlp_spark.catalog import load_table
    from etl_jlp_spark.operators.profiling import fd_confidence

    ev = load_table(spark, SF_SMALL, "events").select("user_id", "event_type")
    got = fd_confidence(ev, "user_id", "event_type").first()
    data = [(r["user_id"], r["event_type"]) for r in ev.collect()]
    best: dict = {}
    for u, t in data:
        best.setdefault(u, {}).setdefault(t, 0)
        best[u][t] += 1
    expect = sum(max(d.values()) for d in best.values()) / len(data)
    assert abs(got["fd_confidence"] - round(expect, 6)) < 1e-9


def test_entropy_bounds_and_pk_extreme(spark):
    rows = {r["column_name"]: r for r in QS["column_entropy_report"](spark, SF_SMALL).collect()}
    for r in rows.values():
        # 4dp display rounding can nudge H above ln(n) by ≤ 5e-5
        assert 0.0 <= r["entropy_nats"] <= math.log(r["n_distinct"]) + 1e-4
        assert 0.0 < r["distinct_ratio"] <= 1.0
    # a primary key is maximally informative: H = ln(n), ratio = 1
    pk = rows["event_id"]
    assert pk["distinct_ratio"] == 1.0
    assert abs(pk["entropy_nats"] - round(math.log(pk["n_distinct"]), 4)) < 1e-6
    # event_type has few values: entropy far below the key's
    assert rows["event_type"]["entropy_nats"] < pk["entropy_nats"]
