"""JDBC source plans (the ClickHouse-extract analog).

Reference: general_lib.get_click_house_client / read_click_house
(dwh_lab/dwh/general_lib.py:85-102) pulls full query results into a
pandas frame on the driver. The Spark equivalent is a JDBC relation
with predicate pushdown and partitioned parallel reads — the query
(including the watermark predicate) executes database-side, and the
result streams directly to executors, never through the driver.

No database is reachable in this environment, so these builders are
exercised by option-construction tests only; the returned reader is a
standard ``DataFrameReader`` ready for ``.load()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrameReader, SparkSession


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    user: str,
    password: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetch_size: int = 100_000,
) -> DataFrameReader:
    """Partitioned JDBC reader: with a numeric ``partition_column`` and
    bounds, Spark issues ``num_partitions`` range-sliced queries in
    parallel (vs the reference's single-cursor full pull)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table_or_query)
        .option("user", user)
        .option("password", password)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader


def incremental_query(table: str, update_column: str, watermark_value: str) -> str:
    """The watermark extract the reference builds by hand
    (ingest_click_house_incremental_load_browsinghistory.py:34-36),
    as a pushdown subquery: the database evaluates the predicate."""
    return (
        f"(SELECT * FROM {table} WHERE {update_column} > '{watermark_value}') AS incr"
    )
