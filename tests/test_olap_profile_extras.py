"""Invariants for the OOV curve, Cramér's V matrix, and GROUPING SETS
revenue report."""

import math
from collections import defaultdict

import duckdb

from tests.conftest import SF_SMALL

import __spark_entry__ as ent

QS = ent.queries()


def test_oov_curve_monotone_and_endpoint(spark):
    rows = sorted(QS["oov_rate_curve"](spark, SF_SMALL).collect(), key=lambda r: r["vocab_size"])
    assert [r["vocab_size"] for r in rows] == [100, 200, 400, 800, 1600, 3200]
    oov = [r["oov_rate"] for r in rows]
    assert oov == sorted(oov, reverse=True)  # larger vocab never hurts
    assert all(0.0 <= v <= 1.0 for v in oov)
    vocab = duckdb.sql(
        "SELECT count(DISTINCT term) FROM (SELECT unnest("
        f"regexp_extract_all(lower(text), '[a-z]+')) AS term FROM"
        f" '{SF_SMALL}/documents.parquet')"
    ).fetchone()[0]
    for r in rows:
        assert r["n_terms_used"] == min(r["vocab_size"], vocab)
        if r["vocab_size"] >= vocab:
            assert r["oov_rate"] == 0.0  # full vocab covers everything


def test_cramers_v_matches_python_replica(spark):
    rows = {r["pair"]: r for r in QS["cramers_v_matrix"](spark, SF_SMALL).collect()}
    data = duckdb.sql(
        f"SELECT o_orderpriority, o_orderstatus, year(o_orderdate)"
        f" FROM '{SF_SMALL}/orders.parquet'"
    ).fetchall()
    combos = {"priority~status": (0, 1), "priority~year": (0, 2), "status~year": (1, 2)}
    for pair, (ia, ib) in combos.items():
        cells = defaultdict(int)
        for t in data:
            cells[(t[ia], t[ib])] += 1
        avals = {a for a, _ in cells}
        bvals = {b for _, b in cells}
        na = defaultdict(int)
        nb = defaultdict(int)
        for (a, b), n in cells.items():
            na[a] += n
            nb[b] += n
        nt = sum(cells.values())
        chi2 = sum(
            (cells.get((a, b), 0) - na[a] * nb[b] / nt) ** 2 / (na[a] * nb[b] / nt)
            for a in avals
            for b in bvals
        )
        v = math.sqrt(chi2 / (nt * (min(len(avals), len(bvals)) - 1)))
        r = rows[pair]
        assert (r["n_rows_dim"], r["n_cols_dim"]) == (len(avals), len(bvals))
        assert abs(r["chi2"] - round(chi2, 4)) < 1e-6
        assert abs(r["cramers_v"] - round(v, 6)) < 1e-9
        assert 0.0 <= r["cramers_v"] <= 1.0


def test_grouping_sets_layers_consistent(spark):
    rows = QS["revenue_grouping_sets"](spark, SF_SMALL).collect()
    grand = [r for r in rows if r["is_nation_total"] == 1 and r["is_year_total"] == 1]
    assert len(grand) == 1 and grand[0]["nation"] == "ALL" and grand[0]["yr"] == -1
    nation_totals = {
        r["nation"]: r for r in rows if r["is_nation_total"] == 0 and r["is_year_total"] == 1
    }
    detail = [r for r in rows if r["is_nation_total"] == 0 and r["is_year_total"] == 0]
    by_nation = defaultdict(lambda: [0, 0])
    for r in detail:
        by_nation[r["nation"]][0] += r["n_orders"]
        by_nation[r["nation"]][1] += r["rev"]
    for nation, (n, rev) in by_nation.items():
        assert nation_totals[nation]["n_orders"] == n
        assert nation_totals[nation]["rev"] == rev
    assert grand[0]["n_orders"] == sum(v[0] for v in by_nation.values())
    assert grand[0]["rev"] == sum(v[1] for v in by_nation.values())


def test_reconciliation_exact_replica(spark):
    rows = {r["yr"]: r for r in QS["order_reconciliation_report"](spark, SF_SMALL).collect()}
    rep = duckdb.sql(f"""
        WITH li AS (
          SELECT l_orderkey, CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                 * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS d
          FROM '{SF_SMALL}/lineitem.parquet' GROUP BY 1)
        SELECT year(o.o_orderdate), count(*),
               count(*) FILTER (WHERE abs(CAST(round(o.o_totalprice*100) AS BIGINT) - li.d) <= 1)
        FROM '{SF_SMALL}/orders.parquet' o JOIN li ON o.o_orderkey = li.l_orderkey
        GROUP BY 1""").fetchall()
    for yr, n, rec in rep:
        assert rows[yr]["n_orders"] == n
        assert rows[yr]["n_reconciled"] == rec
        assert 0.0 <= rows[yr]["mean_abs_diff"] <= rows[yr]["max_abs_diff"] + 1e-9


def test_kwic_snippets_contain_term(spark):
    rows = QS["kwic_snippets"](spark, SF_SMALL).collect()
    assert rows
    hits = {r["doc_id"] for r in QS["bm25_search"](spark, SF_SMALL).collect()}
    for r in rows:
        assert r["doc_id"] in hits
        assert r["term"] in r["snippet"]
        assert r["pos"] >= 1
        assert len(r["snippet"]) <= 80 + len(r["term"])
