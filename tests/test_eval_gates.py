"""Python replicas for the eval-gate/concentration batch: MinHash
recall vs exact pairwise Jaccard, cluster-size histogram reconciliation,
revenue concentration, YoY join, and rolling active users."""

import math
from collections import defaultdict
from datetime import timedelta

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from etl_jlp_spark.catalog import load_table

import __spark_entry__ as ent

QS = ent.queries()


def _shingles(text: str, n: int = 3) -> set:
    toks = text.strip().lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_minhash_recall_matches_python(spark):
    import hashlib

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    sh = {r["doc_id"]: _shingles(r["text"]) for r in docs}
    sh = {d: s for d, s in sh.items() if s}
    samp = sorted(
        d for d in sh if hashlib.md5(str(d).encode()).hexdigest()[0] < "4"
    )
    true_pairs = set()
    for i, a in enumerate(samp):
        for b in samp[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            j = round(inter / (len(sh[a]) + len(sh[b]) - inter), 4)
            if j >= 0.5:
                true_pairs.add((a, b))
    pred = {
        (r["doc_a"], r["doc_b"])
        for r in QS["dedup_minhash_lsh"](spark, SF_SMALL).collect()
        if r["doc_a"] in set(samp) and r["doc_b"] in set(samp)
    }
    row = QS["minhash_recall_report"](spark, SF_SMALL).first()
    assert row["n_sample_docs"] == len(samp)
    assert row["n_true_pairs"] == len(true_pairs)
    assert row["n_pred_pairs"] == len(pred)
    assert row["n_hit"] == len(pred & true_pairs)
    # candidates are exact-verified, so every predicted pair is true
    assert pred <= true_pairs
    if pred:
        assert row["precision"] == 1.0
    if true_pairs:
        assert math.isclose(row["recall"], len(pred & true_pairs) / len(true_pairs), abs_tol=1e-4)


def test_cluster_histogram_reconciles_with_components(spark):
    comp = QS["dedup_connected_components"](spark, SF_SMALL).collect()
    sizes = defaultdict(int)
    for r in comp:
        sizes[r["component"]] += 1
    hist = defaultdict(lambda: [0, 0])
    for s in sizes.values():
        hist[s][0] += 1
        hist[s][1] += s
    rows = QS["dup_cluster_size_histogram"](spark, SF_SMALL).collect()
    got = {r["cluster_size"]: (r["n_clusters"], r["n_docs"]) for r in rows}
    assert got == {s: tuple(v) for s, v in hist.items()}
    assert all(s >= 2 for s in got)  # no singletons in the pair graph
    assert sum(v[1] for v in got.values()) == len(comp)


def test_revenue_concentration_monotone_and_complete(spark):
    rows = sorted(
        QS["revenue_concentration_curve"](spark, SF_SMALL).collect(), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    # deciles are balanced, shares sum to 1, curve is monotone concave-ish
    counts = [r["n_customers"] for r in rows]
    assert max(counts) - min(counts) <= 1
    assert math.isclose(sum(r["rev_share"] for r in rows), 1.0, abs_tol=1e-4)
    assert math.isclose(rows[-1]["cum_rev_share"], 1.0, abs_tol=1e-6)
    cums = [r["cum_rev_share"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(cums, cums[1:]))
    # decile 1 (top customers) holds the largest share
    shares = [r["rev_share"] for r in rows]
    assert shares[0] == max(shares)


def test_yoy_matches_python(spark):
    monthly = defaultdict(int)
    for r in load_table(spark, SF_SMALL, "orders").select("o_orderdate", "o_totalprice").collect():
        m = r["o_orderdate"].date().replace(day=1)
        monthly[m] += int(round(r["o_totalprice"] * 100))
    rows = QS["orders_monthly_yoy"](spark, SF_SMALL).collect()
    assert len(rows) == len(monthly)
    for r in rows:
        m = r["month"]
        assert r["rev_cents"] == monthly[m]
        prev = m.replace(year=m.year - 1)
        if prev in monthly:
            assert r["prev_year_cents"] == monthly[prev]
            assert math.isclose(
                r["yoy_growth"], (monthly[m] - monthly[prev]) / monthly[prev], abs_tol=1e-6
            )
        else:
            assert r["prev_year_cents"] is None and r["yoy_growth"] is None


def test_dau_wau_mau_matches_python(spark):
    act = defaultdict(set)
    for r in load_table(spark, SF_SMALL, "events").select("ts", "user_id").collect():
        act[r["ts"].date()].add(r["user_id"])
    days = sorted(act)
    rows = {r["day"]: r for r in QS["events_dau_wau_mau"](spark, SF_SMALL).collect()}
    assert set(rows) == set(days)
    for d in days:
        wau = set()
        mau = set()
        for k in range(7):
            wau |= act.get(d - timedelta(days=k), set())
        for k in range(30):
            mau |= act.get(d - timedelta(days=k), set())
        assert rows[d]["dau"] == len(act[d])
        assert rows[d]["wau"] == len(wau)
        assert rows[d]["mau"] == len(mau)
        assert rows[d]["dau"] <= rows[d]["wau"] <= rows[d]["mau"]


def test_modularity_reconciles_with_lpa_and_sums_to_Q(spark):
    """Per-community contributions must rebuild from the LPA labels and
    raw pairs, and their sum is the graph modularity (bounded by 1)."""
    labels = {
        r["node"]: r["community"]
        for r in QS["graph_label_propagation"](spark, SF_SMALL).collect()
    }
    pairs = [
        (r["doc_a"], r["doc_b"]) for r in QS["dedup_minhash_lsh"](spark, SF_SMALL).collect()
    ]
    m = len(pairs)
    deg = defaultdict(int)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    intra = defaultdict(int)
    dsum = defaultdict(int)
    nnodes = defaultdict(int)
    for a, b in pairs:
        if labels[a] == labels[b]:
            intra[labels[a]] += 1
    for n, c in labels.items():
        dsum[c] += deg[n]
        nnodes[c] += 1
    rows = QS["graph_modularity"](spark, SF_SMALL).collect()
    assert {r["community"] for r in rows} == set(dsum)
    q = 0.0
    for r in rows:
        c = r["community"]
        assert r["n_nodes"] == nnodes[c]
        assert r["intra_edges"] == intra.get(c, 0)
        assert r["degree_sum"] == dsum[c]
        want = (4 * m * intra.get(c, 0) - dsum[c] ** 2) / (4 * m * m)
        assert math.isclose(r["q_contrib"], want, abs_tol=1e-8)
        q += r["q_contrib"]
    assert q <= 1.0 + 1e-9


def test_candidate_key_report_verdicts(spark):
    rows = {r["candidate"]: r for r in QS["candidate_key_report"](spark, SF_SMALL).collect()}
    ev = load_table(spark, SF_SMALL, "events")
    n = ev.count()
    assert rows["event_id"]["is_key"] is True
    assert rows["event_id"]["n_distinct"] == n
    assert rows["event_id"]["uniqueness"] == 1.0
    # a combo's distinct count can never exceed a superset combo's
    assert (
        rows["event_type+ts"]["n_distinct"]
        <= rows["user_id+event_type+ts"]["n_distinct"]
        <= n
    )
    for r in rows.values():
        assert r["n_rows"] == n
        assert (r["n_distinct"] == n) == r["is_key"]


def test_langid_confusion_reconciles_with_text_langid(spark):
    pred = {r["doc_id"]: r["lang_pred"] for r in QS["text_langid"](spark, SF_SMALL).collect()}
    declared = {
        r["doc_id"]: r["lang"]
        for r in load_table(spark, SF_SMALL, "documents").select("doc_id", "lang").collect()
    }
    cells = defaultdict(int)
    for d, p in pred.items():
        cells[(declared[d], p)] += 1
    rows = QS["langid_confusion_report"](spark, SF_SMALL).collect()
    got = {(r["declared_lang"], r["predicted_lang"]): r["n_docs"] for r in rows}
    assert got == dict(cells)
    # row shares sum to 1 per declared language
    by_decl = defaultdict(float)
    for r in rows:
        by_decl[r["declared_lang"]] += r["row_share"]
    for v in by_decl.values():
        assert math.isclose(v, 1.0, abs_tol=5e-3)
