"""Replicas + invariants for the ML-prep batch: Gini stump search,
lift deciles, LM/quality correlation, k-core peel, embedding split
leakage."""

from collections import defaultdict

import duckdb

from tests.conftest import SF_SMALL

import __spark_entry__ as ent

QS = ent.queries()


def test_gini_split_matches_python_replica(spark):
    rows = QS["gini_split_finder"](spark, SF_SMALL).collect()
    assert len(rows) == 29  # 23 hour splits + 6 weekday splits
    pts = duckdb.sql(
        f"SELECT hour(ts), isodow(ts) - 1, event_type = 'purchase'"
        f" FROM '{SF_SMALL}/events.parquet'"
    ).fetchall()
    for feat_idx, feat in ((0, "hour"), (1, "weekday")):
        vals = defaultdict(lambda: [0, 0])
        for p in pts:
            vals[p[feat_idx]][0] += 1
            vals[p[feat_idx]][1] += int(p[2])
        nt = sum(v[0] for v in vals.values())
        post = sum(v[1] for v in vals.values())
        for r in rows:
            if r["feature"] != feat:
                continue
            nl = sum(v[0] for fv, v in vals.items() if fv <= r["threshold"])
            pl = sum(v[1] for fv, v in vals.items() if fv <= r["threshold"])
            nr, pr = nt - nl, post - pl
            gini = (nl / nt) * (1 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2) + (
                nr / nt
            ) * (1 - (pr / nr) ** 2 - ((nr - pr) / nr) ** 2)
            assert r["n_left"] == nl and r["pos_left"] == pl
            assert abs(r["gini_split"] - round(gini, 6)) < 1e-12
    assert [r["rk"] for r in sorted(rows, key=lambda r: r["rk"])] == list(range(1, 30))


def test_lift_deciles_monotone_capture(spark):
    rows = sorted(QS["score_lift_deciles"](spark, SF_SMALL).collect(), key=lambda r: r["decile"])
    assert rows[0]["decile"] >= 1 and rows[-1]["decile"] <= 10
    caps = [r["cum_capture"] for r in rows]
    assert caps == sorted(caps)  # cumulative capture is monotone
    assert abs(caps[-1] - 1.0) < 1e-9  # all keeps captured at decile 10
    # lift at the last decile is exactly 1 (cum over everything)
    assert abs(rows[-1]["lift"] - 1.0) < 1e-9
    total = sum(r["n_docs"] for r in rows)
    keeps = sum(r["n_keep"] for r in rows)
    assert total > 0 and 0 < keeps <= total


def test_lm_quality_correlation_bounds(spark):
    rows = QS["lm_quality_correlation"](spark, SF_SMALL).collect()
    assert len(rows) == 20
    for r in rows:
        assert -1.0 - 1e-9 <= r["pearson_r"] <= 1.0 + 1e-9
        assert r["n_docs"] > 1


def test_kcore_peel_monotone_and_converges_to_core(spark):
    rows = sorted(QS["graph_kcore_peel"](spark, SF_SMALL).collect(), key=lambda r: r["round"])
    assert [r["round"] for r in rows] == [1, 2, 3, 4]
    nodes = [r["n_nodes"] for r in rows]
    pairs = [r["n_pairs"] for r in rows]
    assert nodes == sorted(nodes, reverse=True)  # peeling only shrinks
    assert pairs == sorted(pairs, reverse=True)
    # python union replica of the final round
    edges = {
        (r["doc_a"], r["doc_b"])
        for r in QS["dedup_minhash_lsh"](spark, SF_SMALL).collect()
    }
    sym = edges | {(b, a) for a, b in edges}
    cur = set(sym)
    for i in range(4):
        deg = defaultdict(int)
        for s, _ in cur:
            deg[s] += 1
        keep = {v for v, c in deg.items() if c >= 3}
        cur = {(s, t) for s, t in cur if s in keep and t in keep}
        assert (rows[i]["n_nodes"], rows[i]["n_pairs"]) == (len(keep), len(cur) // 2)


def test_embedding_leakage_candidates_share_bucket(spark):
    rows = QS["embedding_split_leakage"](spark, SF_SMALL).collect()
    assert rows and all(r["vec_id"] % 5 == 0 for r in rows)
    flagged = [r for r in rows if r["leaked"]]
    for r in rows:
        if r["n_candidates"] == 0:
            assert r["max_train_cos"] is None and not r["leaked"]
        else:
            assert -1.0 <= r["max_train_cos"] <= 1.0
    for r in flagged:
        assert r["max_train_cos"] >= 0.4


def test_filter_cascade_funnel_consistency(spark):
    rows = sorted(
        QS["filter_cascade_report"](spark, SF_SMALL).collect(), key=lambda r: r["stage_no"]
    )
    assert [r["stage"] for r in rows] == [
        "langid", "gopher", "repetition", "exact_dedup", "neardup",
    ]
    total = duckdb.sql(f"SELECT count(*) FROM '{SF_SMALL}/documents.parquet'").fetchone()[0]
    assert rows[0]["n_in"] == total
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_in"] == prev["n_kept"]  # strict funnel chaining
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_in"]
        assert abs(r["cum_survival"] - round(r["n_kept"] / total, 4)) < 1e-9
    # cross-check final survivors against the constituent operators
    gopher_keep = {
        x["doc_id"] for x in QS["gopher_quality_filter"](spark, SF_SMALL).collect() if x["keep"]
    }
    assert rows[1]["n_kept"] <= len(gopher_keep)


def test_curriculum_phases_ordered_and_balanced(spark):
    rows = QS["curriculum_shard_plan"](spark, SF_SMALL).collect()
    assert len(rows) == 24  # 3 phases x 8 shards
    by_phase = defaultdict(list)
    for r in rows:
        by_phase[r["phase"]].append(r)
    assert set(by_phase) == {1, 2, 3}
    # phase 1 holds the HIGHEST quality (easy-first curriculum)
    means = {p: sum(r["avg_quality"] * r["n_docs"] for r in v) / sum(r["n_docs"] for r in v)
             for p, v in by_phase.items()}
    assert means[1] > means[2] > means[3]
    # md5 sharding is roughly balanced within each phase
    for p, v in by_phase.items():
        ns = [r["n_docs"] for r in v]
        assert max(ns) <= 4 * max(1, min(ns))
    total = sum(r["n_docs"] for r in rows)
    docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMALL}/documents.parquet'"
        f" WHERE length(trim(text)) > 0"
    ).fetchone()[0]
    assert total == docs
