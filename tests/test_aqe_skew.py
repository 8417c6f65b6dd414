"""AQE skew-join: the 100 TB DEFAULT path for skewed fact⋈fact joins.

events_by_type_day_salted proves the MANUAL salting strategy; this
suite proves the automatic one — `spark.sql.adaptive.skewJoin` must
actually rewrite a crafted skewed sort-merge join (OptimizeSkewedJoin
marks the join `skew=true` in the final adaptive plan) and the split
must not change the result. Mirrors test_bucketing.py's
assert-on-the-physical-plan discipline.
"""

import pytest
from pyspark.sql import functions as F

# aggressive-but-realistic test-scale knobs: the skewed partition only
# has a few MB, so the production 256 MB threshold would never fire
_SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    # broadcast would dodge the sort-merge join entirely
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # coalescing can merge the probe-side splits back together
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@pytest.fixture()
def skew_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_sides(spark):
    """A fact side where ~90% of rows land on key 0 (one shuffle
    partition ≫ factor × median) and a wide side with every key once —
    too many rows to broadcast, so the join is a shuffled SMJ."""
    n = 400_000
    left = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    right = spark.range(n).select(F.col("id").alias("k"), (F.col("id") % 89).alias("w"))
    return left, right


def _checksum(df):
    # collect DF ITSELF (not a derived aggregate) so the join's own
    # adaptive query execution runs to its final plan
    rows = df.collect()
    return (
        len(rows),
        sum(r["v"] * r["w"] for r in rows),
        sum(r["k"] for r in rows),
    )


def test_aqe_splits_skewed_join_and_preserves_result(spark, skew_confs):
    left, right = _skewed_sides(spark)
    j = left.join(right, "k")

    # ground truth with the skew rewrite OFF (same join, same data)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    expected = _checksum(left.join(right, "k"))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    got = _checksum(j)
    assert got == expected

    # the FINAL adaptive plan must show OptimizeSkewedJoin fired:
    # the SortMergeJoin node is tagged skew=true once rewritten
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan[:800]
    assert "SortMergeJoin" in plan, plan[:800]
    assert "skew=true" in plan, plan[:1500]


def test_skew_rewrite_absent_on_uniform_join(spark, skew_confs):
    """Control: a uniform join under identical confs must NOT be
    rewritten — proves the skew=true assertion above detects the
    optimizer's decision, not a conf side effect."""
    n = 200_000
    left = spark.range(n).select(F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
    right = spark.range(n).select(F.col("id").alias("k"), (F.col("id") % 89).alias("w"))
    j = left.join(right, "k")
    assert _checksum(j) == (
        n,
        sum((i % 97) * (i % 89) for i in range(n)),
        sum(range(n)),
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" not in plan, plan[:1500]
