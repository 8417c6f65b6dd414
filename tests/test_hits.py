"""Python replica for the HITS hubs/authorities pair (graph.py)."""

from collections import defaultdict

import duckdb

from tests.conftest import SF_SMALL

import __spark_entry__ as ent
from etl_jlp_spark.operators.graph import HITS_ITERS, HITS_ROUND, HITS_TOP_HUBS

QS = ent.queries()


def _replica():
    rows = duckdb.sql(
        f"SELECT DISTINCT user_id, event_type FROM '{SF_SMALL}/events.parquet'"
    ).fetchall()
    by_user = defaultdict(set)
    by_type = defaultdict(set)
    for u, t in rows:
        by_user[u].add(t)
        by_type[t].add(u)
    h = {u: 1.0 for u in by_user}
    a = {}
    for _ in range(HITS_ITERS):
        ar = {t: sum(h[u] for u in us) for t, us in by_type.items()}
        s = sum(ar.values())
        a = {t: round(v / s, HITS_ROUND) for t, v in ar.items()}
        hr = {u: sum(a[t] for t in ts) for u, ts in by_user.items()}
        s = sum(hr.values())
        h = {u: round(v / s, HITS_ROUND) for u, v in hr.items()}
    return by_user, by_type, a, h


def test_hits_authorities_match_replica(spark):
    by_user, by_type, a, _h = _replica()
    rows = {r["event_type"]: r for r in QS["hits_authorities"](spark, SF_SMALL).collect()}
    assert set(rows) == set(by_type)
    for t, r in rows.items():
        assert r["n_users"] == len(by_type[t])
        assert abs(r["authority"] - a[t]) < 1e-9
    # scores L1-normalized (to rounding)
    assert abs(sum(r["authority"] for r in rows.values()) - 1.0) < 1e-4
    ranks = sorted(rows.values(), key=lambda r: r["rank"])
    for lo, hi in zip(ranks, ranks[1:]):
        assert lo["authority"] >= hi["authority"]


def test_hits_hubs_match_replica(spark):
    by_user, _by_type, _a, h = _replica()
    rows = sorted(QS["hits_top_hubs"](spark, SF_SMALL).collect(), key=lambda r: r["rank"])
    assert len(rows) == min(HITS_TOP_HUBS, len(by_user))
    expect = sorted(h.items(), key=lambda kv: (-kv[1], kv[0]))[: len(rows)]
    for r, (u, score) in zip(rows, expect):
        assert r["user_id"] == u
        assert abs(r["hub_score"] - score) < 1e-9
        assert r["n_types"] == len(by_user[u])
