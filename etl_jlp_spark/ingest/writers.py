"""Medallion sink layer.

Reference: general_lib.write_dls (dwh_lab/dwh/general_lib.py:325-398)
hand-chunks pandas frames into ADLS files (csv/json/jsonline/parquet)
with manual offsets and flushes; read_chunk_and_writle_dls re-implements
chunking for big files. In Spark every sink below is the engine's own
distributed writer: partitioned, parallel, atomic via task commits —
chunking, offsets and retries disappear.

Path convention mirrors the reference's medallion layout
(``{container}/{base}/{entity}/{fmt}/{yyyymmdd}/``), with
``partitionBy`` date columns giving partition-pruned reads downstream —
the 100 TB replacement for "one folder per day of files".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FORMATS = ("parquet", "csv", "json")


def medallion_path(container: str, base: str, entity: str, fmt: str, job_date: str) -> str:
    """01landzone/streaming-sources/users/json/20240201 — reference
    write path scheme (ingest_*.py load steps)."""
    return os.path.join(container, base, entity, fmt, job_date)


def write_entity(
    df: DataFrame,
    container: str,
    base: str,
    entity: str,
    fmt: str,
    job_date: str,
    mode: str = "overwrite",
    partition_cols: tuple[str, ...] = (),
) -> str:
    """Write one entity snapshot/increment; returns the path written."""
    if fmt not in FORMATS:
        raise ValueError(f"format {fmt!r} not in {FORMATS}")
    path = medallion_path(container, base, entity, fmt, job_date)
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)
    return path


def archive_parquet(df: DataFrame, container: str, base: str, entity: str, job_date: str) -> str:
    """Reference ARCHIVE step (ingest_click_house_incremental_load_
    browsinghistory.py:57-62): parquet copy alongside the landzone
    write."""
    return write_entity(df, container, os.path.join("archives", base), entity, "parquet", job_date)


def normalize_bool_strings(df: DataFrame, sample_rows: int = 10_000) -> DataFrame:
    """Reference convert_str_bool_columns (general_lib.py:176-185):
    string columns whose non-null values are all 'true'/'false' become
    booleans. The scan to decide is a bounded sample + distinct on each
    candidate column (cheap); the cast itself is a projection."""
    out = df
    string_cols = [c for c, t in df.dtypes if t == "string"]
    if not string_cols:
        return out
    sample = df.select(string_cols).limit(sample_rows)
    for c in string_cols:
        distinct_vals = {
            r[0]
            for r in sample.select(F.lower(F.col(c)).alias("v"))
            .filter(F.col("v").isNotNull())
            .distinct()
            .collect()
        }
        if distinct_vals and distinct_vals <= {"true", "false"}:
            out = out.withColumn(c, F.lower(F.col(c)) == "true")
    return out
