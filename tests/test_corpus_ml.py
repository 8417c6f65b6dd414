"""Replicas + invariants for the corpus-ML batch: TextRank keywords,
JS source divergence, pooled quantile normalization, feature-hash
collision profile."""

import math
from collections import defaultdict

import duckdb

from tests.conftest import SF_SMALL

import __spark_entry__ as ent

QS = ent.queries()


def _tokens_by(col):
    return duckdb.sql(
        f"SELECT {col}, unnest(regexp_extract_all(lower(text), '[a-z]+'))"
        f" FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()


def test_textrank_matches_python_replica(spark):
    rows = QS["textrank_keywords"](spark, SF_SMALL).collect()
    assert len(rows) == 25
    assert [r["rk"] for r in rows] == list(range(1, 26))
    # replica: weighted pagerank over adjacency pairs of len>=3 terms
    toks = defaultdict(list)
    for doc, t in _tokens_by("doc_id"):
        toks[doc].append(t)
    w = defaultdict(int)
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            if a != b and len(a) >= 3 and len(b) >= 3:
                w[(min(a, b), max(a, b))] += 1
    nbrs = defaultdict(list)
    for (a, b), c in w.items():
        nbrs[a].append((b, c))
        nbrs[b].append((a, c))
    wdeg = {v: float(sum(c for _, c in outs)) for v, outs in nbrs.items()}
    n = float(len(nbrs))
    ranks = {v: 1.0 / n for v in nbrs}
    for _ in range(5):
        contrib = {v: 0.0 for v in nbrs}
        for src, outs in nbrs.items():
            for dst, c in outs:
                contrib[dst] += ranks[src] * c / wdeg[src]
        ranks = {v: 0.15 / n + 0.85 * contrib[v] for v in nbrs}
    top = sorted(ranks.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:25]
    assert [(r["term"], r["textrank"]) for r in rows] == [
        (t, round(r, 6)) for t, r in top
    ]


def test_js_divergence_bounds_and_replica(spark):
    rows = QS["js_divergence_sources"](spark, SF_SMALL).collect()
    assert len(rows) == 190  # C(20,2) source pairs
    cnt = defaultdict(lambda: defaultdict(int))
    for src, t in _tokens_by("source"):
        cnt[src][t] += 1
    tot = {s: sum(d.values()) for s, d in cnt.items()}
    for r in rows[:30]:
        a, b = r["src_a"], r["src_b"]
        assert a < b
        na, nb = tot[a], tot[b]
        js = 0.0
        for t in set(cnt[a]) | set(cnt[b]):
            p, q = cnt[a].get(t, 0) / na, cnt[b].get(t, 0) / nb
            m = (p + q) / 2
            if p:
                js += p * math.log(p / m) / 2
            if q:
                js += q * math.log(q / m) / 2
        assert abs(r["js_nats"] - js) < 1e-4
        assert -1e-9 <= r["js_nats"] <= math.log(2) + 1e-9


def test_quantile_normalization_invariants(spark):
    rows = QS["quantile_normalize_scores"](spark, SF_SMALL).collect()
    assert rows
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append((r["score"], r["doc_id"], r["norm_score"]))
    pooled = sorted(r["score"] for r in rows)
    for src, triples in by_src.items():
        triples.sort()
        norms = [n for _, _, n in triples]
        # monotone: higher raw rank never gets a lower normalized score
        assert norms == sorted(norms)
        # top-ranked doc of every source maps to the pooled maximum
        assert norms[-1] == pooled[-1]
        # normalized values are actual pooled score values
        assert set(norms) <= set(pooled)


def test_feature_hash_mass_conservation(spark):
    rows = QS["feature_hash_collisions"](spark, SF_SMALL).collect()
    vocab = duckdb.sql(
        "SELECT count(DISTINCT term), count(*) FROM (SELECT unnest("
        f"regexp_extract_all(lower(text), '[a-z]+')) AS term FROM"
        f" '{SF_SMALL}/documents.parquet')"
    ).fetchone()
    assert sum(r["terms_in_bucket"] * r["n_buckets"] for r in rows) == vocab[0]
    assert sum(r["token_mass"] for r in rows) == vocab[1]
