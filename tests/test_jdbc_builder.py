"""JDBC reader construction (no DB reachable — options only)."""

import pytest

from etl_jlp_spark.ingest.jdbc import incremental_query, jdbc_reader


def test_incremental_query_shape():
    q = incremental_query("browsinghistory", "timestamp", "2024-01-20 00:00:00")
    assert q.startswith("(SELECT * FROM browsinghistory WHERE timestamp > ")
    assert q.endswith(") AS incr")


def test_partitioned_reader_requires_bounds(spark):
    with pytest.raises(ValueError, match="lower_bound"):
        jdbc_reader(spark, "jdbc:postgresql://x/db", "t", "u", "p", partition_column="id")


def test_reader_builds(spark):
    r = jdbc_reader(
        spark,
        "jdbc:postgresql://example/db",
        incremental_query("events", "ts", "2024-01-20"),
        "user",
        "pw",
        partition_column="event_id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    # a DataFrameReader primed with the jdbc source; .load() would
    # connect, which we don't do here
    assert r is not None
