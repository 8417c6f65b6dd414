"""Scale rehearsal (SURVEY §6 method, now repeatable): replicate the
fact tables with id offsets into a scratch dir (events ×10, documents
×4, embeddings ×4 by default), then A/B-measure named queries against
the base sf dir with alternating sweeps and report medians.

Usage:
    python tools/rehearsal.py [query ...]          # default query set
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \\
    SPARK_GRAFT_REHEARSAL_DIR=/tmp/rehearsal \\
    python tools/rehearsal.py tfidf_top_terms scd2_build

The scaled build is idempotent (skipped when _SUCCESS exists) and the
dimension tables are symlinked unscaled — replication stresses the
fact-side shuffles, which is where 100× behavior shows."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_REHEARSAL_DIR", "/tmp/rehearsal_sf")
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

SCALED = {"events": ("event_id", 10), "documents": ("doc_id", 4), "embeddings": ("vec_id", 4)}
PASSTHROUGH = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

DEFAULT = [
    "ann_ivf_topk",
    "tfidf_top_terms",
    "corpus_index_pipeline",
    "ngram_lm_score",
    "scd2_build",
    "scd2_apply",
    # r5 additions — re-measure by default each round
    "fuzzy_join_editdist",
    "fuzzy_join_prebuilt",
    "rollup_incremental",
    "ann_quantized_topk",
    "timeseries_gapfill",
    "user_retention_cohorts",
    "key_skew_report",
    "psi_drift_report",
    # r6 additions — re-measure by default each round
    "anomaly_zscore",
    "ewma_daily_revenue",
    "dsir_select",
    "bpe_encode",
    "split_leakage_check",
    "doc_containment",
    "dup_span_report",
    "pmi_collocations",
    "lexical_diversity",
    "source_mix_temperature",
    "softdedup_weights",
    "ann_recall_report",
    "embedding_random_projection",
    "per_source_sample_k",
    "heavy_hitters_cms",
    "referential_integrity_report",
    "dedup_cc_incremental",
    "bigram_lm_score",
    "ab_test_report",
    "seasonal_naive_eval",
    "cohort_ltv",
    # r7 additions — re-measure by default each round
    "graph_pagerank",
    "graph_triangle_stats",
    "contamination_ngram_overlap",
    "minhash_spark_native",
    "embedding_pca_power",
    "quality_isolation_outliers",
    "session_conversion_attribution",
    "session_survival_km",
    "cusum_changepoint",
    "tokenizer_fertility_report",
    "entity_resolution_blocking",
    "semantic_dedup_scaled",
]


def build_scaled(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    for name, (idcol, k) in SCALED.items():
        out = os.path.join(DST, f"{name}.parquet")
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue
        df = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        off = int(df.agg(F.max(idcol)).collect()[0][0]) + 1
        parts = [df]
        for i in range(1, k):
            r = df.withColumn(idcol, F.col(idcol) + F.lit(i * off))
            if name == "events":  # keep per-user volume, grow #users
                r = r.withColumn("user_id", F.col("user_id") + F.lit(i * 1_000_000))
            parts.append(r)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(out)
        print(f"built {name} x{k}", file=sys.stderr)
    for name in PASSTHROUGH:
        out = os.path.join(DST, f"{name}.parquet")
        if not os.path.exists(out):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), out)


def main() -> None:
    import __spark_entry__ as ent
    from etl_jlp_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT
    spark = get_spark("rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark)
    qs = ent.queries()
    runs: dict[tuple[str, str], list[float]] = {}
    for name in names:  # warm both sides once (JVM/file-listing)
        for d in (SRC, DST):
            qs[name](spark, d).write.mode("overwrite").format("noop").save()
    for _ in range(REPS):
        for name in names:
            for tag, d in (("base", SRC), ("scaled", DST)):
                t0 = time.perf_counter()
                qs[name](spark, d).write.mode("overwrite").format("noop").save()
                runs.setdefault((name, tag), []).append(time.perf_counter() - t0)
    print("| operator | sf0.1 | scaled | ratio |")
    print("| --- | --- | --- | --- |")
    for name in names:
        a = statistics.median(runs[(name, "base")])
        b = statistics.median(runs[(name, "scaled")])
        print(f"| {name} | {a:.2f} s | {b:.2f} s | {b / a:.2f}x |")


if __name__ == "__main__":
    main()
