"""Structured Streaming pipeline tests: file-source incremental load
with audit stamping, windowed event-time aggregation, and session
windows — each checked against its batch twin."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.streaming.pipeline import (
    incremental_to_bronze,
    stream_events,
    streaming_sessionize,
    windowed_event_counts,
)

# Wall-clock-bound (streaming triggers / state timeouts): excluded from the
# default run so the driver test window completes (r11); run via -m slow.
pytestmark = pytest.mark.slow


@pytest.fixture()
def events_dir(spark, tmp_path):
    """Re-materialize sf0.001 events as a micro-batched source dir
    (two files = two 'incremental loads')."""
    src = str(tmp_path / "src")
    ev = load_table(spark, SF_SMALL, "events")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(src)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    return src


def test_incremental_to_bronze_exactly_once(spark, events_dir, tmp_path):
    dest = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")
    q = incremental_to_bronze(spark, events_dir, dest, ckpt)
    q.awaitTermination(120)
    out = spark.read.parquet(dest)
    n_src = spark.read.parquet(events_dir).count()
    assert out.count() == n_src
    assert out.filter(F.col("source_name") != "clickhouse-streaming-data").count() == 0
    # restart with same checkpoint: no reprocessing (exactly-once)
    q2 = incremental_to_bronze(spark, events_dir, dest, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(dest).count() == n_src


def test_windowed_counts_match_batch(spark, events_dir, tmp_path):
    stream = stream_events(spark, events_dir)
    agg = windowed_event_counts(stream, window="1 day")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from win_counts").collect()
    }
    batch = load_table(spark, SF_SMALL, "events").groupBy(
        F.date_trunc("day", "ts").alias("window_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["s"]) for r in batch.collect()
    }
    assert got == want


def test_streaming_sessionize_bounded_sessions(spark, events_dir):
    stream = stream_events(spark, events_dir)
    sess = streaming_sessionize(stream)
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from sessions").collect()
    assert rows
    # sessions are per-user and non-overlapping in time
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["session_start"], r["session_end"]))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert e1 <= s2, "overlapping sessions for one user"


@pytest.fixture()
def docs_dir(spark, tmp_path):
    """sf0.001 documents re-materialized as two corpus shards."""
    src = str(tmp_path / "docs_src")
    docs = load_table(spark, SF_SMALL, "documents")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(src)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    return src


def test_streaming_decontaminate_matches_batch(spark, docs_dir, tmp_path):
    """Per-doc overlap from the stream (static broadcast bench set,
    foreachBatch) must equal the batch decontaminate_docs rows."""
    from etl_jlp_spark.operators.similarity import (
        DECON_BENCH_HEX,
        bench_shingle_set,
        decontaminate_docs,
    )
    from etl_jlp_spark.streaming.pipeline import streaming_decontaminate

    docs = load_table(spark, SF_SMALL, "documents")
    bench = bench_shingle_set(docs)
    dest = str(tmp_path / "decon_out")
    ckpt = str(tmp_path / "decon_ckpt")
    # stream only the corpus side (production: eval set never streams)
    corpus_dir = str(tmp_path / "corpus_src")
    corpus = docs.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) >= DECON_BENCH_HEX
    )
    corpus.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(corpus_dir)
    corpus.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(corpus_dir)

    q = streaming_decontaminate(spark, corpus_dir, docs.schema, bench, dest, ckpt)
    q.awaitTermination(120)
    read_out = lambda: sorted(
        map(tuple, spark.read.parquet(dest).drop("batch_id").collect())
    )
    got = read_out()
    want = sorted(map(tuple, decontaminate_docs(spark, SF_SMALL).collect()))
    assert got == want
    # restart with the same checkpoint: exactly-once, no duplicate rows
    q2 = streaming_decontaminate(spark, corpus_dir, docs.schema, bench, dest, ckpt)
    q2.awaitTermination(120)
    assert read_out() == want


def test_streaming_balance_mix_matches_batch(spark, docs_dir):
    """The stateless stream-static keep-filter must keep EXACTLY the
    docs the batch operator keeps (same rate table)."""
    from etl_jlp_spark.operators.sampling import (
        apply_mix_filter,
        doc_token_counts,
        mix_rates,
    )
    from etl_jlp_spark.streaming.pipeline import stream_documents, streaming_balance_mix

    docs = load_table(spark, SF_SMALL, "documents")
    sized = doc_token_counts(docs)
    rates = mix_rates(sized)
    stream = stream_documents(spark, docs_dir, docs.schema)
    kept_stream = streaming_balance_mix(stream, rates)
    q = (
        kept_stream.writeStream.format("memory")
        .queryName("mix_kept")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("select doc_id, source, n_tokens from mix_kept").collect())
    )
    want = sorted(
        map(tuple, apply_mix_filter(sized, rates).select("doc_id", "source", "n_tokens").collect())
    )
    assert got == want and got


def test_streaming_quality_monitor_matches_batch(spark, events_dir):
    from etl_jlp_spark.streaming.pipeline import streaming_quality_monitor

    q = (
        streaming_quality_monitor(stream_events(spark, events_dir), window="1 day")
        .writeStream.format("memory")
        .queryName("q_monitor")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"]: (
            r["n_events"],
            r["rate_value_nonneg"],
            r["rate_event_type_known"],
            r["rate_props_json"],
        )
        for r in spark.sql("select * from q_monitor").collect()
    }

    def rate(pred, name):
        return F.round(100.0 * F.sum(F.when(pred, 1).otherwise(0)) / F.count(F.lit(1)), 2).alias(
            name
        )

    batch = (
        load_table(spark, SF_SMALL, "events")
        .groupBy(F.date_trunc("day", "ts").alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rate(F.col("value") >= 0, "r1"),
            rate(
                F.col("event_type").isin("click", "view", "purchase", "signup", "error"), "r2"
            ),
            rate(F.col("props").startswith("{"), "r3"),
        )
        .collect()
    )
    want = {r["window_start"]: (r["n_events"], r["r1"], r["r2"], r["r3"]) for r in batch}
    assert got == want and len(got) > 1


def test_streaming_lm_score_matches_batch(spark, docs_dir, tmp_path):
    """Per-doc LM scores from the stream (static broadcast LM,
    foreachBatch) must equal the batch ngram_lm_score rows, and a
    checkpoint restart must not duplicate them."""
    from etl_jlp_spark.operators.ir import ngram_lm_score, train_unigram_lm
    from etl_jlp_spark.streaming.pipeline import streaming_lm_score

    docs = load_table(spark, SF_SMALL, "documents")
    lm, lm_stats = train_unigram_lm(docs)
    dest = str(tmp_path / "lm_out")
    ckpt = str(tmp_path / "lm_ckpt")

    q = streaming_lm_score(spark, docs_dir, docs.schema, lm, lm_stats, dest, ckpt)
    q.awaitTermination(120)
    read_out = lambda: sorted(
        map(tuple, spark.read.parquet(dest).drop("batch_id").collect())
    )
    got = read_out()
    want = sorted(map(tuple, ngram_lm_score(spark, SF_SMALL).collect()))
    assert got == want
    q2 = streaming_lm_score(spark, docs_dir, docs.schema, lm, lm_stats, dest, ckpt)
    q2.awaitTermination(120)
    assert read_out() == want


def test_write_batch_idempotent_replay_no_duplicates(spark, tmp_path):
    """The crash-replay scenario the checkpoint cannot cover: the batch
    parquet write succeeded but the commit did not, so foreachBatch
    re-runs with the SAME batch_id. The per-batch_id overwrite must
    absorb the replay instead of appending duplicates."""
    from etl_jlp_spark.streaming.pipeline import write_batch_idempotent

    dest = str(tmp_path / "idem_out")
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    write_batch_idempotent(df, dest, 0)
    write_batch_idempotent(df, dest, 0)  # replay of batch 0
    write_batch_idempotent(df, dest, 1)
    out = spark.read.parquet(dest)
    assert out.count() == 20  # 10 per DISTINCT batch, replay absorbed
    assert out.select("batch_id").distinct().count() == 2


def test_streaming_bm25_matches_prebuilt_probe(spark, tmp_path):
    """A streamed query whose text tokenizes to exactly the batch
    probe's term list must return the batch probe's top-K (same docs,
    same scores, same order), and a checkpoint restart must not
    duplicate results. A second query in the same batch exercises the
    multi-query rank window."""
    from etl_jlp_spark.operators.ir import BM25_QUERY_TERMS, bm25_search_prebuilt
    from etl_jlp_spark.streaming.pipeline import streaming_bm25_search

    qdf = spark.createDataFrame(
        [(1, " ".join(BM25_QUERY_TERMS)), (2, "vector vector")],
        "query_id long, query_text string",
    )
    src = str(tmp_path / "bm25_q_src")
    qdf.coalesce(1).write.parquet(src)
    dest = str(tmp_path / "bm25_out")
    ckpt = str(tmp_path / "bm25_ckpt")

    q = streaming_bm25_search(spark, src, qdf.schema, SF_SMALL, dest, ckpt)
    q.awaitTermination(120)

    out = spark.read.parquet(dest).drop("batch_id")
    got1 = [
        (r["doc_id"], r["bm25"])
        for r in out.filter(F.col("query_id") == 1).orderBy("rank").collect()
    ]
    want = [
        (r["doc_id"], r["bm25"]) for r in bm25_search_prebuilt(spark, SF_SMALL).collect()
    ]
    assert got1 == want
    # the single-term query returns results too, capped at top-K
    n2 = out.filter(F.col("query_id") == 2).count()
    assert 0 < n2 <= len(want)

    q2 = streaming_bm25_search(spark, src, qdf.schema, SF_SMALL, dest, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(dest).drop("batch_id").count() == out.count()


def test_streaming_psi_monitor_matches_batch(spark, tmp_path):
    """Per-batch PSI vs a fixed reference must equal the batch-side
    computation on the same rows; a same-distribution batch scores ~0.
    Two separate availableNow runs on one checkpoint make the batch
    contents deterministic (run 2 sees only the file added after run 1)."""
    from etl_jlp_spark.quality.drift import bucket_counts, psi_against_reference
    from etl_jlp_spark.streaming.pipeline import streaming_psi_monitor
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")
    ref = bucket_counts(ev).persist()
    src = str(tmp_path / "src")
    dest, ckpt = str(tmp_path / "psi"), str(tmp_path / "ckpt")
    halves = [ev.filter(F.col("event_id") % 2 == i) for i in (0, 1)]
    halves[0].coalesce(1).write.mode("overwrite").parquet(src)
    streaming_psi_monitor(spark, src, ref, dest, ckpt).awaitTermination(120)
    halves[1].coalesce(1).write.mode("append").parquet(src)
    streaming_psi_monitor(spark, src, ref, dest, ckpt).awaitTermination(120)

    got = spark.read.parquet(dest)
    n_types = ev.select("event_type").distinct().count()
    assert got.count() == 2 * n_types
    # each half is a same-distribution sample of the reference stream
    assert got.agg(F.max("psi")).collect()[0][0] < 0.1
    for bid, half in enumerate(halves):
        want = {
            (r["event_type"], r["psi"], r["n_cur"])
            for r in psi_against_reference(bucket_counts(half), ref).collect()
        }
        have = {
            (r["event_type"], r["psi"], r["n_cur"])
            for r in got.filter(F.col("batch_id") == bid).drop("batch_id").collect()
        }
        assert want == have
    ref.unpersist()


def test_streaming_anomaly_monitor_matches_batch(spark, tmp_path):
    """Per-batch anomaly scores against a fixed baseline must equal the
    batch-side computation on the same rows, across two availableNow
    runs on one checkpoint (deterministic batch contents)."""
    from etl_jlp_spark.plans.timeseries import (
        baseline_stats,
        daily_counts,
        score_daily_anomaly,
    )
    from etl_jlp_spark.streaming.pipeline import streaming_anomaly_monitor
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")
    baseline = baseline_stats(daily_counts(ev)).persist()
    src = str(tmp_path / "src")
    dest, ckpt = str(tmp_path / "anom"), str(tmp_path / "ckpt")
    halves = [ev.filter(F.col("event_id") % 2 == i) for i in (0, 1)]
    halves[0].coalesce(1).write.mode("overwrite").parquet(src)
    streaming_anomaly_monitor(spark, src, baseline, dest, ckpt).awaitTermination(120)
    halves[1].coalesce(1).write.mode("append").parquet(src)
    streaming_anomaly_monitor(spark, src, baseline, dest, ckpt).awaitTermination(120)

    got = spark.read.parquet(dest)
    assert got.count() > 0
    for bid, half in enumerate(halves):
        want = {
            (r["day"], r["event_type"], r["n_events"], r["zscore"], r["is_anomaly"])
            for r in score_daily_anomaly(half, baseline).collect()
        }
        have = {
            (r["day"], r["event_type"], r["n_events"], r["zscore"], r["is_anomaly"])
            for r in got.filter(F.col("batch_id") == bid).collect()
        }
        assert want == have
    # half-volume days against a full-volume baseline: every day is far
    # below its type's mean, so the monitor must be alarming
    assert got.filter(F.col("is_anomaly")).count() > 0
    baseline.unpersist()


def test_streaming_span_check_matches_batch(spark, docs_dir, tmp_path):
    """Arriving shards checked against the static gram directory must
    reproduce the batch dup_span_report rows exactly (the (nd,
    only_doc) self-exclusion), and survive a checkpoint replay."""
    from etl_jlp_spark.operators.spans import dup_span_report, gram_directory
    from etl_jlp_spark.streaming.pipeline import streaming_span_check

    docs = load_table(spark, SF_SMALL, "documents")
    directory = gram_directory(docs)
    dest = str(tmp_path / "span_out")
    ckpt = str(tmp_path / "span_ckpt")
    q = streaming_span_check(spark, docs_dir, docs.schema, directory, dest, ckpt)
    q.awaitTermination(120)
    read_out = lambda: sorted(
        map(tuple, spark.read.parquet(dest).drop("batch_id").collect())
    )
    want = sorted(map(tuple, dup_span_report(spark, SF_SMALL).collect()))
    assert read_out() == want
    q2 = streaming_span_check(spark, docs_dir, docs.schema, directory, dest, ckpt)
    q2.awaitTermination(120)
    assert read_out() == want


def test_streaming_cms_merges_to_batch_sketch(spark, events_dir, tmp_path):
    """Per-batch counter deltas summed across batches must equal the
    batch-built sketch EXACTLY (counter additivity), so estimates from
    the streaming view match the batch operator's; replay must not
    double-count."""
    from etl_jlp_spark.operators.sketches import cms_counters
    from etl_jlp_spark.streaming.pipeline import cms_view, streaming_cms_monitor

    dest = str(tmp_path / "cms_out")
    ckpt = str(tmp_path / "cms_ckpt")
    q = streaming_cms_monitor(spark, events_dir, dest, ckpt)
    q.awaitTermination(120)
    want = {
        (r["r"], r["bucket"]): r["c"]
        for r in cms_counters(load_table(spark, SF_SMALL, "events")).collect()
    }
    got = {(r["r"], r["bucket"]): r["c"] for r in cms_view(spark, dest).collect()}
    assert got == want
    q2 = streaming_cms_monitor(spark, events_dir, dest, ckpt)  # replay
    q2.awaitTermination(120)
    assert {(r["r"], r["bucket"]): r["c"] for r in cms_view(spark, dest).collect()} == want


def test_streaming_hll_merges_to_batch_registers(spark, events_dir, tmp_path):
    """Per-batch HLL registers max-merged across batches must equal the
    batch-built estimate EXACTLY (max-merge property), and replay must
    not change the registers."""
    import pyspark.sql.functions as F

    from etl_jlp_spark.operators.sketches import hll_estimate, hll_registers
    from etl_jlp_spark.streaming.pipeline import hll_view, streaming_hll_monitor

    dest = str(tmp_path / "hll_out")
    ckpt = str(tmp_path / "hll_ckpt")
    q = streaming_hll_monitor(spark, events_dir, dest, ckpt)
    q.awaitTermination(120)
    days = load_table(spark, SF_SMALL, "events").select(
        F.col("ts").cast("date").alias("day"), "event_id"
    )
    want = {
        r["day"]: r["est_distinct"]
        for r in hll_estimate(hll_registers(days, "event_id", ["day"]), ["day"]).collect()
    }
    got = {r["day"]: r["est_distinct"] for r in hll_view(spark, dest).collect()}
    assert got == want
    q2 = streaming_hll_monitor(spark, events_dir, dest, ckpt)  # replay
    q2.awaitTermination(120)
    assert {r["day"]: r["est_distinct"] for r in hll_view(spark, dest).collect()} == want


def test_streaming_did_merges_to_batch_readout(spark, events_dir, tmp_path):
    """Per-batch DiD cell sums merged across batches must reproduce the
    batch did_lift_report EXACTLY (additivity of (n, Σv_e4)); replay
    must not double-count."""
    from etl_jlp_spark.plans.regression import did_lift_report
    from etl_jlp_spark.streaming.pipeline import did_view, streaming_did_monitor

    dest = str(tmp_path / "did_out")
    ckpt = str(tmp_path / "did_ckpt")
    q = streaming_did_monitor(spark, events_dir, dest, ckpt)
    q.awaitTermination(120)
    want = sorted(map(tuple, did_lift_report(spark, SF_SMALL).collect()))
    read_out = lambda: sorted(map(tuple, did_view(spark, dest).collect()))
    assert read_out() == want
    q2 = streaming_did_monitor(spark, events_dir, dest, ckpt)  # replay
    q2.awaitTermination(120)
    assert read_out() == want


def test_streaming_kmv_merges_to_batch_sketch(spark, events_dir, tmp_path):
    """Per-batch KMV sketches union-merged across batches must equal
    the batch-built sketch estimate EXACTLY (KMV merge property), and
    replay must not change the state."""
    from pyspark.sql import Window
    import pyspark.sql.functions as F

    from etl_jlp_spark.operators.kmv import KMV_K, KMV_M, kmv_sketch
    from etl_jlp_spark.streaming.pipeline import kmv_view, streaming_kmv_monitor

    dest = str(tmp_path / "kmv_out")
    ckpt = str(tmp_path / "kmv_ckpt")
    q = streaming_kmv_monitor(spark, events_dir, dest, ckpt)
    q.awaitTermination(120)
    full = kmv_sketch(load_table(spark, SF_SMALL, "events"), "event_type", "user_id")
    kth = {r["g"]: r["hv"] for r in full.collect() if r["rn"] == KMV_K}
    sizes = {}
    for r in full.collect():
        sizes[r["g"]] = max(sizes.get(r["g"], 0), r["rn"])
    want = {
        g: int(round((KMV_K - 1) * KMV_M / kth[g])) if g in kth else sizes[g]
        for g in sizes
    }
    got = {r["event_type"]: r["est_distinct"] for r in kmv_view(spark, dest).collect()}
    assert got == want
    q2 = streaming_kmv_monitor(spark, events_dir, dest, ckpt)  # replay
    q2.awaitTermination(120)
    assert {r["event_type"]: r["est_distinct"] for r in kmv_view(spark, dest).collect()} == want


def test_streaming_rolling_distinct_matches_batch(spark, tmp_path):
    """The stateful delta-segment stream, replayed over time-ordered
    micro-batches, must reproduce the batch operator's exact trailing-7d
    distinct timeline — including the retraction case (a user active on
    overlapping segments)."""
    from etl_jlp_spark.streaming.stateful import (
        rolling_distinct_deltas_stateful,
        rolling_view,
    )

    ev = load_table(spark, SF_SMALL, "events").select("user_id", "ts", "event_id")
    # three TIME-ordered chunks (the per-user cross-batch ordering the
    # operator contracts on), written as separate files
    src = str(tmp_path / "src")
    bounds = ev.agg(
        F.expr("timestamp_micros(CAST(percentile(unix_micros(ts), 0.33) AS BIGINT))").alias("t1"),
        F.expr("timestamp_micros(CAST(percentile(unix_micros(ts), 0.66) AS BIGINT))").alias("t2"),
    ).collect()[0]
    t1, t2 = bounds["t1"], bounds["t2"]
    ev.filter(F.col("ts") <= t1).coalesce(1).write.mode("overwrite").parquet(src)
    ev.filter((F.col("ts") > t1) & (F.col("ts") <= t2)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    ev.filter(F.col("ts") > t2).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.format("parquet")
        .schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    deltas = rolling_distinct_deltas_stateful(stream)
    dest = str(tmp_path / "deltas")
    ckpt = str(tmp_path / "ckpt")
    q = (
        deltas.writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got_df = spark.read.parquet(dest)
    batch = __import__("__spark_entry__").queries()["rolling_distinct_users_exact"](
        spark, SF_SMALL
    )
    days = batch.select("day")
    got = {
        (r["day"], r["rolling_users"])
        for r in rolling_view(got_df, days).collect()
    }
    want = {(r["day"], r["rolling_users"]) for r in batch.collect()}
    assert got == want


def test_streaming_w1_monitor_matches_batch(spark, tmp_path):
    """Per-batch W1 vs a fixed reference must equal the shared helper's
    batch-side numbers on the same rows; and when the reference is the
    first-15-days window and the stream carries the rest, the monitor
    reproduces wasserstein_value_drift's registered output exactly."""
    from etl_jlp_spark.plans.nonparam import (
        W1_REF_DAYS,
        cents_counts,
        w1_against_reference,
        wasserstein_value_drift,
    )
    from etl_jlp_spark.streaming.pipeline import streaming_w1_monitor
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")
    d0 = ev.agg(F.min(F.to_date("ts"))).collect()[0][0]
    ref_rows = ev.filter(F.to_date("ts") < F.date_add(F.lit(d0), W1_REF_DAYS))
    cur_rows = ev.filter(F.to_date("ts") >= F.date_add(F.lit(d0), W1_REF_DAYS))
    ref = cents_counts(ref_rows).persist()

    src = str(tmp_path / "src")
    dest, ckpt = str(tmp_path / "w1"), str(tmp_path / "ckpt")
    cur_rows.coalesce(1).write.mode("overwrite").parquet(src)
    streaming_w1_monitor(spark, src, ref, dest, ckpt).awaitTermination(120)

    got = {
        (r["event_type"], r["n_ref"], r["n_cur"], r["w1_dollars"])
        for r in spark.read.parquet(dest).drop("batch_id").collect()
    }
    want = {
        (r["event_type"], r["n_ref"], r["n_cur"], r["w1_dollars"])
        for r in wasserstein_value_drift(spark, SF_SMALL).collect()
    }
    assert got == want  # streaming monitor == registered batch op

    # a second batch (same-distribution sample: the reference rows
    # themselves) scores ~0 and lands idempotently under its batch_id
    ref_rows.coalesce(1).write.mode("append").parquet(src)
    streaming_w1_monitor(spark, src, ref, dest, ckpt).awaitTermination(120)
    out2 = spark.read.parquet(dest).filter(F.col("batch_id") == 1)
    assert out2.count() == ref_rows.select("event_type").distinct().count()
    assert out2.agg(F.max("w1_dollars")).collect()[0][0] == 0.0
    helper = {
        (r["event_type"], r["w1_dollars"])
        for r in w1_against_reference(cents_counts(ref_rows), ref).collect()
    }
    have = {(r["event_type"], r["w1_dollars"]) for r in out2.collect()}
    assert helper == have
    ref.unpersist()


def test_streaming_ad_monitor_matches_batch(spark, tmp_path):
    """Per-batch Anderson–Darling vs a fixed reference must reproduce
    the registered anderson_darling_drift exactly when the reference is
    the first-15-days window and the stream carries the rest (the
    streaming_w1_monitor contract, for the tail-weighted member); a
    same-distribution second batch scores exactly 0."""
    from etl_jlp_spark.plans.nonparam import (
        W1_REF_DAYS,
        ad_against_reference,
        anderson_darling_drift,
        cents_counts,
    )
    from etl_jlp_spark.streaming.pipeline import streaming_ad_monitor
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")
    d0 = ev.agg(F.min(F.to_date("ts"))).collect()[0][0]
    ref_rows = ev.filter(F.to_date("ts") < F.date_add(F.lit(d0), W1_REF_DAYS))
    cur_rows = ev.filter(F.to_date("ts") >= F.date_add(F.lit(d0), W1_REF_DAYS))
    ref = cents_counts(ref_rows).persist()

    src = str(tmp_path / "src")
    dest, ckpt = str(tmp_path / "ad"), str(tmp_path / "ckpt")
    cur_rows.coalesce(1).write.mode("overwrite").parquet(src)
    streaming_ad_monitor(spark, src, ref, dest, ckpt).awaitTermination(120)

    got = {
        (r["event_type"], r["n_ref"], r["n_cur"], r["ad_stat"])
        for r in spark.read.parquet(dest).drop("batch_id").collect()
    }
    want = {
        (r["event_type"], r["n_ref"], r["n_cur"], r["ad_stat"])
        for r in anderson_darling_drift(spark, SF_SMALL).collect()
    }
    assert got == want  # streaming monitor == registered batch op

    # same-distribution second batch: every CDF gap is identically 0,
    # so A² = 0 exactly (integer algebra, not approximately)
    ref_rows.coalesce(1).write.mode("append").parquet(src)
    streaming_ad_monitor(spark, src, ref, dest, ckpt).awaitTermination(120)
    out2 = spark.read.parquet(dest).filter(F.col("batch_id") == 1)
    helper = {
        (r["event_type"], r["ad_stat"])
        for r in ad_against_reference(cents_counts(ref_rows), ref).collect()
    }
    have = {(r["event_type"], r["ad_stat"]) for r in out2.collect()}
    assert helper == have and have  # non-empty, helper-consistent
    assert out2.agg(F.max("ad_stat")).collect()[0][0] == 0.0
    ref.unpersist()


def test_streaming_sprt_monitor_matches_batch(spark, tmp_path):
    """Cumulative SPRT over two micro-batches must land exactly on the
    registered batch query's final-day row per arm (same hypotheses),
    and a re-run with the same checkpoint must not move state or
    output (exactly-once)."""
    import os

    from etl_jlp_spark.plans.experiment import (
        AB_SPLIT_HEX,
        SPRT_P1_SCALE_E6,
        sprt_ab_monitor,
    )
    from etl_jlp_spark.streaming.pipeline import streaming_sprt_monitor
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")
    # the batch query's hypotheses: exact e6 rationals off arm A totals
    a = ev.where(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < AB_SPLIT_HEX
    )
    bn = a.count()
    bc = a.where(F.col("event_type") == "purchase").count()
    p0_e6 = (2 * 1000000 * bc + bn) // (2 * bn)
    p1_e6 = (2 * SPRT_P1_SCALE_E6 * bc + bn) // (2 * bn)

    d0 = ev.agg(F.min(F.to_date("ts"))).collect()[0][0]
    half1 = ev.filter(F.to_date("ts") < F.date_add(F.lit(d0), 15))
    half2 = ev.filter(F.to_date("ts") >= F.date_add(F.lit(d0), 15))

    src = str(tmp_path / "src")
    dest, state, ckpt = (
        str(tmp_path / "sprt"),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
    )
    half1.coalesce(1).write.mode("overwrite").parquet(src)
    streaming_sprt_monitor(spark, src, p0_e6, p1_e6, dest, state, ckpt).awaitTermination(120)
    half2.coalesce(1).write.mode("append").parquet(src)
    streaming_sprt_monitor(spark, src, p0_e6, p1_e6, dest, state, ckpt).awaitTermination(120)

    out = spark.read.parquet(dest)
    assert {r["batch_id"] for r in out.select("batch_id").distinct().collect()} == {0, 1}
    # batch-0 cumulative == half1 totals; batch-1 cumulative == full totals
    final = {r["arm"]: r for r in out.filter(F.col("batch_id") == 1).collect()}
    batch_rows = sprt_ab_monitor(spark, SF_SMALL).collect()
    # each arm's final cumulative row is at ITS OWN last active day
    last_day = {}
    for r in batch_rows:
        if r["arm"] not in last_day or r["day"] > last_day[r["arm"]]:
            last_day[r["arm"]] = r["day"]
    want = {r["arm"]: r for r in batch_rows if r["day"] == last_day[r["arm"]]}
    assert set(final) == set(want)
    for arm in want:
        assert final[arm]["cum_n"] == want[arm]["cum_n"]
        assert final[arm]["cum_conv"] == want[arm]["cum_conv"]
        assert final[arm]["llr"] == want[arm]["llr"]
        assert final[arm]["decision"] == want[arm]["decision"]
    # the null-calibrated control arm never rejects
    assert final["A"]["decision"] != "reject_h0"

    # exactly-once: a third run with no new files changes nothing
    before = sorted(map(tuple, out.collect()))
    streaming_sprt_monitor(spark, src, p0_e6, p1_e6, dest, state, ckpt).awaitTermination(120)
    after = sorted(map(tuple, spark.read.parquet(dest).collect()))
    assert after == before
    assert sorted(os.listdir(state)) == ["batch_id=0", "batch_id=1"]
