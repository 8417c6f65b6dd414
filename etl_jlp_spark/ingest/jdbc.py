"""JDBC source plans (the ClickHouse-extract analog).

Reference: general_lib.get_click_house_client / read_click_house
(dwh_lab/dwh/general_lib.py:85-102) pulls full query results into a
pandas frame on the driver. The Spark equivalent is a JDBC relation
with predicate pushdown and partitioned parallel reads — the query
(including the watermark predicate) executes database-side, and the
result streams directly to executors, never through the driver.

No ClickHouse is reachable in this environment, but Spark bundles
Apache Derby: ``loaders.ingest_jdbc_derby`` stages data into an
embedded in-memory Derby database and executes the REAL
``spark.read.jdbc`` partitioned incremental path against it
(tests/test_jdbc_derby.py asserts the partitioning and pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrameReader, SparkSession

DERBY_EMBEDDED_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_memory_url(db_name: str, create: bool = True) -> str:
    """Embedded in-memory Derby URL — per-JVM, no network, no files.
    Derby ships with Spark (it backs the Hive metastore), so this is the
    in-environment stand-in for the reference's ClickHouse endpoint."""
    suffix = ";create=true" if create else ""
    return f"jdbc:derby:memory:{db_name}{suffix}"


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetch_size: int = 100_000,
    driver: str | None = None,
) -> DataFrameReader:
    """Partitioned JDBC reader: with a numeric ``partition_column`` and
    bounds, Spark issues ``num_partitions`` range-sliced queries in
    parallel (vs the reference's single-cursor full pull). ``user`` /
    ``password`` are optional for embedded engines (Derby)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table_or_query)
        .option("fetchsize", str(fetch_size))
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if driver is not None:
        reader = reader.option("driver", driver)
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


def incremental_query(
    table: str, update_column: str, watermark_value: str, dialect: str = "clickhouse"
) -> str:
    """The watermark extract the reference builds by hand
    (ingest_click_house_incremental_load_browsinghistory.py:34-36),
    as a pushdown subquery: the database evaluates the predicate.

    ``dialect='derby'`` emits quoted identifiers (Spark's JDBC writer
    creates case-sensitive lowercase columns) and a ``TIMESTAMP()``
    literal cast (Derby won't implicitly compare VARCHAR to TIMESTAMP).
    """
    if dialect == "derby":
        return (
            f'(SELECT * FROM {table} WHERE "{update_column}" > '
            f"TIMESTAMP('{watermark_value}')) incr"
        )
    return (
        f"(SELECT * FROM {table} WHERE {update_column} > '{watermark_value}') AS incr"
    )
