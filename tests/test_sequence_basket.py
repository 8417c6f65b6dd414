"""Python replicas for the sequence/basket/text batch: Markov
majority-baseline eval, prefix dedup groups, char-bigram entropy, and
co-purchase lift."""

import math
import re
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from etl_jlp_spark.catalog import load_table

import __spark_entry__ as ent

QS = ent.queries()


def test_markov_eval_matches_python(spark):
    ev = sorted(
        load_table(spark, SF_SMALL, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    trans = Counter()
    prev = {}
    for r in ev:
        u = r["user_id"]
        if u in prev:
            trans[(prev[u], r["event_type"])] += 1
        prev[u] = r["event_type"]
    got = {r["prev_type"]: r for r in QS["markov_next_event_eval"](spark, SF_SMALL).collect()}
    by_prev = defaultdict(dict)
    for (p, nx), c in trans.items():
        by_prev[p][nx] = c
    assert set(got) == set(by_prev)
    for p, nexts in by_prev.items():
        best = min(nexts, key=lambda nx: (-nexts[nx], nx))
        total = sum(nexts.values())
        r = got[p]
        assert r["predicted_next"] == best
        assert r["n_transitions"] == total
        assert r["n_correct"] == nexts[best]
        assert math.isclose(r["accuracy"], nexts[best] / total, abs_tol=1e-4)
        # the baseline accuracy is exactly max_row P(next|prev)
        assert r["accuracy"] >= 1.0 / len(nexts) - 1e-9


def test_dedup_prefix_matches_python(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    groups = defaultdict(list)
    for r in docs:
        # Spark/DuckDB trim() strips ASCII spaces only — match it, not
        # Python's all-whitespace .strip()
        key = re.sub(r"\s+", " ", r["text"].lower().strip(" "))[:120]
        groups[key].append(r["doc_id"])
    dups = {k: sorted(v) for k, v in groups.items() if len(v) > 1}
    rows = QS["dedup_prefix"](spark, SF_SMALL).collect()
    assert len(rows) == len(dups)
    got = {(r["n_docs"], r["keep_doc_id"], r["max_doc_id"]) for r in rows}
    want = {(len(v), v[0], v[-1]) for v in dups.values()}
    assert got == want


def test_char_bigram_entropy_matches_python(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    got = {r["doc_id"]: r for r in QS["char_bigram_entropy"](spark, SF_SMALL).collect()}
    checked = 0
    for r in docs[:60]:
        t = r["text"].strip(" ").lower()  # trim() = spaces only
        if len(t) < 2:
            assert r["doc_id"] not in got
            continue
        grams = Counter(t[i : i + 2] for i in range(len(t) - 1))
        n = sum(grams.values())
        h = -sum((c / n) * math.log(c / n) for c in grams.values())
        g = got[r["doc_id"]]
        assert g["n_bigrams"] == n
        assert g["n_distinct"] == len(grams)
        assert math.isclose(g["entropy_nats"], h, abs_tol=5e-5)
        checked += 1
    assert checked > 10


def test_copurchase_lift_matches_python(spark):
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_partkey").collect()
    orders = defaultdict(set)
    for r in li:
        orders[r["l_orderkey"]].add(r["l_partkey"])
    n_orders = len(orders)
    part_c = Counter()
    pair_c = Counter()
    for parts in orders.values():
        ps = sorted(parts)
        part_c.update(ps)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                pair_c[(a, b)] += 1
    scored = [
        (
            c,
            round(c * n_orders / (part_c[a] * part_c[b]), 4),
            a,
            b,
        )
        for (a, b), c in pair_c.items()
        if c >= 2
    ]
    scored.sort(key=lambda t: (-t[0], -t[1], t[2], t[3]))
    rows = sorted(QS["part_copurchase_lift"](spark, SF_SMALL).collect(), key=lambda r: r["rk"])
    assert len(rows) == min(40, len(scored))
    for r, (c, lift, a, b) in zip(rows, scored):
        assert (r["part_a"], r["part_b"], r["n_co"]) == (a, b, c)
        assert math.isclose(r["lift"], lift, abs_tol=1e-4)
        assert r["n_a"] == part_c[a] and r["n_b"] == part_c[b]
