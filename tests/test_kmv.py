"""Python replicas + estimator invariants for the KMV / theta sketch
family (kmv.py)."""

import hashlib
from collections import defaultdict

import duckdb

from tests.conftest import SF_SMALL

import __spark_entry__ as ent
from etl_jlp_spark.operators.kmv import KMV_K, KMV_M

QS = ent.queries()


def _h(u) -> int:
    return int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16)


def _type_users():
    rows = duckdb.sql(
        f"SELECT DISTINCT event_type, user_id FROM '{SF_SMALL}/events.parquet'"
    ).fetchall()
    by_type = defaultdict(set)
    for t, u in rows:
        by_type[t].add(u)
    return by_type


def test_kmv_distinct_matches_python_replica(spark):
    rows = {r["event_type"]: r for r in QS["kmv_distinct_by_type"](spark, SF_SMALL).collect()}
    by_type = _type_users()
    assert set(rows) == set(by_type)
    for t, users in by_type.items():
        hashes = sorted({_h(u) for u in users})
        r = rows[t]
        assert r["n_exact"] == len(users)
        if len(hashes) >= KMV_K:
            est = round((KMV_K - 1) * KMV_M / hashes[KMV_K - 1])
        else:
            est = len(users)
        assert r["est_distinct"] == est
        assert abs(r["rel_err"] - round(abs(est - len(users)) / len(users), 4)) < 1e-9


def test_kmv_overlap_matches_python_replica(spark):
    rows = {
        (r["type_a"], r["type_b"]): r
        for r in QS["kmv_type_overlap"](spark, SF_SMALL).collect()
    }
    by_type = _type_users()
    sk = {
        t: sorted({_h(u) for u in users})[:KMV_K] for t, users in by_type.items()
    }
    types = sorted(by_type)
    expected_pairs = {(a, b) for i, a in enumerate(types) for b in types[i + 1:]}
    assert set(rows) == expected_pairs
    for (a, b), r in rows.items():
        # theta convention: an unsaturated sketch (< K rows) has seen
        # every key, so its threshold is the full range M (kmv.py)
        th = {t: (KMV_M if len(sk[t]) < KMV_K else max(sk[t])) for t in (a, b)}
        theta = min(th[a], th[b])
        inter = {h for h in sk[a] if h in set(sk[b]) and h < theta}
        union = {h for h in sk[a] + sk[b] if h < theta}
        assert r["exact_inter"] == len(by_type[a] & by_type[b])
        assert abs(r["est_inter"] - round(len(inter) * KMV_M / theta, 2)) < 1e-9
        assert abs(r["jaccard_est"] - round(len(inter) / len(union), 4)) < 1e-9


def test_kmv_estimator_sane_on_saturated_sketch(spark):
    # sf0.001 has ~50 users per type — sketches saturate (>= K distinct),
    # and the KMV estimator should land within a loose 3/sqrt(K) band
    for r in QS["kmv_distinct_by_type"](spark, SF_SMALL).collect():
        if r["n_exact"] >= KMV_K:
            assert r["rel_err"] <= 3.0 / (KMV_K ** 0.5)


def test_kmv_sketch_is_mergeable(spark):
    # union-then-sketch == sketch-of-merged-sketches (the streaming /
    # map-side-combine property the module's scale story rests on)
    from etl_jlp_spark.catalog import load_table
    from etl_jlp_spark.operators.kmv import kmv_sketch

    ev = load_table(spark, SF_SMALL, "events")
    half1 = ev.filter("event_id % 2 = 0")
    half2 = ev.filter("event_id % 2 = 1")
    s1 = kmv_sketch(half1, "event_type", "user_id").select("g", "hv")
    s2 = kmv_sketch(half2, "event_type", "user_id").select("g", "hv")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    merged = (
        s1.unionByName(s2)
        .distinct()
        .withColumn("rn", F.row_number().over(Window.partitionBy("g").orderBy("hv")))
        .filter(F.col("rn") <= KMV_K)
    )
    full = kmv_sketch(ev, "event_type", "user_id")
    got = {(r["g"], r["hv"]) for r in merged.collect()}
    want = {(r["g"], r["hv"]) for r in full.collect()}
    assert got == want
