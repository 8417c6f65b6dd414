"""Invariants for the IVF nprobe sweep, embedding drift report, and
order-side repeat cohorts."""

from collections import defaultdict

import duckdb

from tests.conftest import SF_SMALL

import __spark_entry__ as ent

QS = ent.queries()


def test_nprobe_recall_monotone_in_depth(spark):
    rows = sorted(QS["ivf_nprobe_sweep"](spark, SF_SMALL).collect(), key=lambda r: r["nprobe"])
    assert [r["nprobe"] for r in rows] == [1, 2, 4, 8]
    nq = rows[0]["n_queries"]
    assert nq > 0
    for lo, hi in zip(rows, rows[1:]):
        # probing more cells can only add candidates and recall
        assert hi["avg_candidates"] >= lo["avg_candidates"] - 1e-9
        assert hi["recall_at_5"] >= lo["recall_at_5"] - 1e-9
    for r in rows:
        assert 0.0 <= r["recall_at_5"] <= 1.0
    # probing ALL 16 cells would be exhaustive; 8 cells should already
    # recover most of the exact top-5
    assert rows[-1]["recall_at_5"] >= 0.5


def test_embedding_drift_parity_split_is_calm(spark):
    rows = QS["embedding_drift_report"](spark, SF_SMALL).collect()
    assert len(rows) == 10
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, 11))
    by_rank = sorted(rows, key=lambda r: r["rank"])
    for lo, hi in zip(by_rank, by_rank[1:]):
        assert lo["smd"] >= hi["smd"] - 1e-9
    # a random parity split of one corpus is NOT drifted: smd small
    for r in rows:
        assert r["smd"] < 0.5


def test_repeat_cohorts_match_python_replica(spark):
    rows = {
        (r["cohort_year"], r["years_since_first"]): r
        for r in QS["customer_repeat_cohorts"](spark, SF_SMALL).collect()
    }
    data = duckdb.sql(
        f"SELECT o_custkey, year(o_orderdate) FROM '{SF_SMALL}/orders.parquet'"
    ).fetchall()
    years = defaultdict(set)
    for c, y in data:
        years[c].add(y)
    cohorts = defaultdict(set)
    active = defaultdict(set)
    for c, ys in years.items():
        first = min(ys)
        cohorts[first].add(c)
        for y in ys:
            if 0 <= y - first <= 2:
                active[(first, y - first)].add(c)
    for (cy, k), custs in active.items():
        r = rows[(cy, k)]
        assert r["n_customers"] == len(cohorts[cy])
        assert r["n_active"] == len(custs)
        assert abs(r["retention"] - round(len(custs) / len(cohorts[cy]), 4)) < 1e-9
    # retention at k=0 is 1.0 by construction
    for (cy, k), r in rows.items():
        if k == 0:
            assert r["retention"] == 1.0
