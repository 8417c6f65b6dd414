"""Structural invariants: Bloom join pruning, session opening paths,
time-to-convert latency — complements to their DuckDB hash oracles."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

import __spark_entry__ as ent

QS = ent.queries()


def test_bloom_never_misses_a_true_match(spark):
    r = QS["bloom_join_prune_report"](spark, SF_SMALL).first()
    # no false negatives, by construction — pass set ⊇ exact matches
    assert r["n_bloom_pass"] >= r["n_exact_match"]
    assert r["n_false_pos"] == r["n_bloom_pass"] - r["n_exact_match"]
    assert 0.0 <= r["fpr"] < 0.2  # m/k sized for a sub-20% FPR
    assert r["n_probe_keys"] >= r["n_bloom_pass"]


def test_bloom_bits_match_pure_python(spark):
    import hashlib

    from etl_jlp_spark.operators.sketches import BLOOM_M, _bloom_bit

    df = spark.createDataFrame([(12345,)], "k long").select(
        *[_bloom_bit(i, F.col("k")).alias(f"b{i}") for i in range(3)]
    )
    row = df.first()
    for i in range(3):
        expect = int(hashlib.md5(f"bloom{i}:12345".encode()).hexdigest()[:8], 16) % BLOOM_M
        assert row[f"b{i}"] == expect


def test_session_paths_are_truncated_prefixes(spark):
    from etl_jlp_spark.plans.attribution import PATH_DEPTH, PATH_TOPK

    rows = QS["session_paths_topk"](spark, SF_SMALL).collect()
    assert 0 < len(rows) <= PATH_TOPK
    prev = None
    for r in rows:
        assert 1 <= len(r["path"].split(">")) <= PATH_DEPTH
        if prev is not None:  # ordering: count desc, path asc
            assert (r["n_sessions"], r["path"]) <= (prev[0], "￿") and (
                r["n_sessions"] < prev[0] or r["path"] > prev[1]
            )
        prev = (r["n_sessions"], r["path"])


def test_session_paths_conserve_sessions(spark):
    from etl_jlp_spark.catalog import load_table
    from etl_jlp_spark.operators.sessionize import with_session_id

    ev = load_table(spark, SF_SMALL, "events").select("event_id", "user_id", "ts")
    n_sessions = (
        with_session_id(ev).select("user_id", "session_id").distinct().count()
    )
    # top-k sums to ≤ total sessions; with few event types the k=20
    # report usually covers everything at sf0.001
    total_reported = sum(
        r["n_sessions"] for r in QS["session_paths_topk"](spark, SF_SMALL).collect()
    )
    assert total_reported <= n_sessions


def test_time_to_convert_ordering(spark):
    r = QS["time_to_convert_stats"](spark, SF_SMALL).first()
    assert r["n_converted"] > 0
    assert 0 < r["median_s"] <= r["p90_s"]
    assert r["median_s"] <= r["avg_s"] * 10  # same order of magnitude sanity
