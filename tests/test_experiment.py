"""Experimentation analytics: CUPED must reduce variance on correlated
per-user metrics; seasonal-naive eval must compute exact errors on a
crafted series. Parity vs DuckDB is covered by test_parity."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_jlp_spark.plans.experiment import ab_test_report, seasonal_naive_eval
from tests.conftest import SF_SMALL


def test_ab_report_shape_and_cuped_reduces_variance(spark):
    r = ab_test_report(spark, SF_SMALL).collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_a"] > 0 and row["n_b"] > 0
    assert abs(row["diff"] - round(row["mean_a"] - row["mean_b"], 4)) < 1e-6
    # synthetic per-user activity is strongly auto-correlated between
    # halves of the month, so the covariate must actually help
    assert 0 < row["var_reduction"] < 1
    # no A/B effect exists in synthetic data — neither t should be huge
    assert abs(row["t_stat"]) < 5 and abs(row["adj_t_stat"]) < 5


def test_seasonal_naive_exact_on_crafted_series(spark, tmp_path):
    # 15 days, one type: counts 10,20,10,20,... (period-2 pattern).
    # lag-7 prediction misses by |c(d) - c(d-7)| = 10 every day (odd
    # lag flips the phase); lag-1 also misses by 10 → skill 0.
    rows = []
    eid = 0
    for d in range(1, 16):
        for _ in range(10 if d % 2 else 20):
            rows.append(
                Row(
                    event_id=eid,
                    user_id=1,
                    event_type="click",
                    value=1.0,
                    ts_s=f"2024-01-{d:02d} 12:00:00",
                )
            )
            eid += 1
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    df.withColumn("props", F.lit("{}")).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = seasonal_naive_eval(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days_eval"] == 8  # days 8..15
    assert r["mae_seasonal"] == 10.0
    assert r["mae_naive1"] == 10.0
    assert r["skill_vs_naive1"] == 0.0


def test_cohort_ltv_monotone_and_exact_on_crafted(spark, tmp_path):
    # 2 users, same cohort day, value 1.0/event: day0 2 events each,
    # day1 one user returns with 4 events → ltv 2.0 then 4.0
    rows = []
    eid = 0
    for u, d, k in ((1, 1, 2), (2, 1, 2), (1, 2, 4)):
        for _ in range(k):
            rows.append(
                Row(event_id=eid, user_id=u, event_type="click", value=1.0,
                    ts_s=f"2024-01-{d:02d} 10:00:00")
            )
            eid += 1
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    df.withColumn("props", F.lit("{}")).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    from etl_jlp_spark.plans.experiment import cohort_ltv

    out = sorted(cohort_ltv(spark, str(tmp_path)).collect(), key=lambda r: r["age"])
    assert [(r["age"], r["n_users"], r["ltv_per_user"]) for r in out] == [
        (0, 2, 2.0),
        (1, 2, 4.0),
    ]
    # monotone on real data
    from tests.conftest import SF_SMALL

    real = cohort_ltv(spark, SF_SMALL).collect()
    series = {}
    for r in real:
        series.setdefault(r["cohort"], []).append((r["age"], r["ltv_per_user"]))
    for pts in series.values():
        vals = [v for _, v in sorted(pts)]
        assert all(b >= a for a, b in zip(vals, vals[1:]))
