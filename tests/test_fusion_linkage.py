"""Invariants + replicas for rank fusion, nDCG eval, U-shaped
attribution, and Fellegi-Sunter weights."""

from collections import defaultdict

import duckdb

from tests.conftest import SF_SMALL

import __spark_entry__ as ent

QS = ent.queries()


def test_rrf_scores_recompute_from_ranks(spark):
    rows = QS["rrf_fusion_topk"](spark, SF_SMALL).collect()
    assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
    scores = []
    for r in rows:
        expect = (1.0 / (60 + r["bm25_rank"]) if r["bm25_rank"] else 0.0) + (
            1.0 / (60 + r["quality_rank"]) if r["quality_rank"] else 0.0
        )
        assert abs(r["rrf_score"] - round(expect, 6)) < 1e-12
        assert r["bm25_rank"] or r["quality_rank"]  # in at least one list
        scores.append(r["rrf_score"])
    assert scores == sorted(scores, reverse=True)


def test_ndcg_bounded_and_consistent_with_recall(spark):
    ndcg = {r["query_id"]: r for r in QS["ann_ndcg_eval"](spark, SF_SMALL).collect()}
    recall = {r["query_id"]: r for r in QS["ann_recall_report"](spark, SF_SMALL).collect()}
    assert set(ndcg) == set(recall)
    for qid, r in ndcg.items():
        assert 0.0 <= r["ndcg"] <= 1.0 + 1e-9
        assert r["dcg"] <= r["idcg"] + 1e-9
        # perfect recall of the exact set implies the same items ranked
        # by the same cosine ordering -> nDCG == 1
        if recall[qid]["recall_at_k"] == 1.0 and r["n_approx"] == recall[qid]["n_exact"]:
            assert r["ndcg"] == 1.0


def test_ushape_conserves_nondirect_value(spark):
    ush = QS["position_attribution_ushape"](spark, SF_SMALL).collect()
    last = QS["session_conversion_attribution"](spark, SF_SMALL).collect()
    # both operators distribute exactly the value of purchases that
    # have >=1 preceding touch (last-touch books the rest as 'direct')
    u_total = sum(r["attributed_value"] for r in ush)
    l_total = sum(r["attributed_value"] for r in last if r["channel"] != "direct")
    assert abs(u_total - l_total) < 0.05 * max(len(ush), len(last))
    for r in ush:
        assert r["channel"] != "purchase"
        assert r["n_credits"] > 0


def test_fellegi_sunter_u_replica(spark):
    rows = {r["field"]: r for r in QS["fellegi_sunter_weights"](spark, SF_SMALL).collect()}
    vals = duckdb.sql(
        f"SELECT CAST(c_nationkey AS VARCHAR), c_mktsegment,"
        f" CAST(CAST(floor(c_acctbal / 1000) AS BIGINT) AS VARCHAR),"
        f" substr(c_name, length(c_name) - 1, 2)"
        f" FROM '{SF_SMALL}/customer.parquet'"
    ).fetchall()
    fields = ["nation", "mktsegment", "acctbal_band", "name_tail2"]
    for i, f in enumerate(fields):
        freq = defaultdict(int)
        for v in vals:
            freq[v[i]] += 1
        n = sum(freq.values())
        u = sum(c * (c - 1) for c in freq.values()) / (n * (n - 1))
        r = rows[f]
        assert r["n_distinct"] == len(freq)
        assert abs(r["u_prob"] - round(u, 6)) < 1e-12
        # rarer agreement -> larger agreement weight
    ws = sorted(rows.values(), key=lambda r: r["u_prob"])
    aws = [r["agree_weight"] for r in ws]
    assert aws == sorted(aws, reverse=True)


def test_pacf_lag1_equals_acf1_and_bounds(spark):
    acf = {r["lag"]: r["acf"] for r in QS["acf_daily_revenue"](spark, SF_SMALL).collect()}
    pacf = {r["lag"]: r["pacf"] for r in QS["pacf_daily_revenue"](spark, SF_SMALL).collect()}
    assert set(pacf) == {1, 2, 3, 4, 5}
    assert abs(pacf[1] - round(acf[1], 6)) < 1e-12  # PACF(1) == ACF(1)
    # Durbin-Levinson replica over the reported ACF values
    a = [None] + [acf[k] for k in range(1, 6)]
    phi = {(1, 1): a[1]}
    for k in range(2, 6):
        num = a[k] - sum(phi[(k - 1, j)] * a[k - j] for j in range(1, k))
        den = 1 - sum(phi[(k - 1, j)] * a[j] for j in range(1, k))
        phi[(k, k)] = num / den
        for j in range(1, k):
            phi[(k, j)] = phi[(k - 1, j)] - phi[(k, k)] * phi[(k - 1, k - j)]
    for k in range(1, 6):
        assert abs(pacf[k] - round(phi[(k, k)], 6)) < 1e-9


def test_prf_terms_exclude_query_and_rank_correctly(spark):
    rows = QS["prf_expansion_terms"](spark, SF_SMALL).collect()
    assert len(rows) == 15
    assert [r["rk"] for r in sorted(rows, key=lambda r: r["rk"])] == list(range(1, 16))
    for r in rows:
        assert r["term"] not in ("vector", "stream", "filter")
        assert len(r["term"]) >= 3
        assert 1 <= r["df_seed"] <= 10  # bounded by the seed size
        assert r["df"] >= r["df_seed"]
        assert r["prf_score"] > 0
