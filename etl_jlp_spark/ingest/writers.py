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

FORMATS = ("parquet", "orc", "csv", "json", "jsonline", "xml")

# microsecond-precision timestamps for text formats (JSON/CSV default to
# millis, which silently truncates parquet-sourced micros)
TIMESTAMP_FORMAT_US = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


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
        # micros-precision timestamps on the WRITE side too — the
        # default CSV timestamp pattern is millisecond-only, which
        # would silently truncate parquet-sourced micros on the
        # landzone round trip (same fidelity bug the json branch
        # already guards against)
        writer = writer.option("header", "true").option(
            "timestampFormat", TIMESTAMP_FORMAT_US
        )
    if fmt in ("json", "jsonline"):
        # default JSON timestampFormat is millisecond-only — micros
        # would be silently truncated on the landzone round trip
        writer = writer.option("timestampFormat", TIMESTAMP_FORMAT_US)
    if fmt == "xml":
        # Spark 4's built-in XML source (the spark-xml lineage merged
        # into sql/core); rowTag is mandatory, micros pinned as in csv
        writer = writer.option("rowTag", "row").option(
            "timestampFormat", TIMESTAMP_FORMAT_US
        )
    # the reference's "jsonline" (one object per line, general_lib.py:
    # 361-379 write_dls jsonline branch) IS Spark's native json sink —
    # line-delimited, split-able, written in parallel per partition
    writer.format("json" if fmt == "jsonline" else fmt).save(path)
    return path


def transform_archive(
    spark,
    container: str,
    base: str,
    entity: str,
    job_date: str,
    transform,
    fmt: str | None = None,
) -> str:
    """Reference read_chunk_and_writle_dls (general_lib.py:224-323):
    read a landzone entity in chunks, apply a transform, write the
    archive copy. In Spark the "chunks" are partitions — one distributed
    read (format-sniffed), the transform as a lazy DataFrame→DataFrame
    function, one distributed parquet write; no driver-side buffering
    at any size."""
    from etl_jlp_spark.ingest.readers import read_entity

    df = read_entity(spark, container, base, entity, job_date, fmt=fmt)
    return archive_parquet(transform(df), container, base, entity, job_date)


def archive_parquet(df: DataFrame, container: str, base: str, entity: str, job_date: str) -> str:
    """Reference ARCHIVE step (ingest_click_house_incremental_load_
    browsinghistory.py:57-62): parquet copy alongside the landzone
    write."""
    return write_entity(df, container, os.path.join("archives", base), entity, "parquet", job_date)


def normalize_bool_strings(df: DataFrame) -> DataFrame:
    """Reference convert_str_bool_columns (general_lib.py:176-185):
    string columns whose non-null values are all 'true'/'false' become
    booleans.

    The decision scans the FULL column (one aggregate job covering every
    candidate column at once, map-side combined) — a sampled decision
    would silently coerce later non-boolean values and be partition-
    order dependent, i.e. nondeterministic across runs. The cast itself
    is a projection."""
    string_cols = [c for c, t in df.dtypes if t == "string"]
    if not string_cols:
        return df
    aggs = []
    for c in string_cols:
        low = F.lower(F.col(c))
        aggs.append(
            F.sum(
                (low.isNotNull() & ~low.isin("true", "false")).cast("long")
            ).alias(f"bad__{c}")
        )
        aggs.append(F.sum(low.isNotNull().cast("long")).alias(f"nonnull__{c}"))
    stats = df.agg(*aggs).first()
    out = df
    for c in string_cols:
        if stats[f"nonnull__{c}"] and not stats[f"bad__{c}"]:
            out = out.withColumn(c, F.lower(F.col(c)) == "true")
    return out


def normalize_uuid_binary(df: DataFrame) -> DataFrame:
    """Reference convert_uuid (general_lib.py:45-48): python UUID values
    are stringified before landing (applymap in the ClickHouse ingest
    scripts). Spark has no UUID type — UUIDs arrive from JDBC/Arrow
    sources as BINARY(16) — so the Spark-first counterpart converts any
    binary column whose non-null values are all 16 bytes to the
    canonical lowercase-hyphenated string form.

    Same discipline as normalize_bool_strings: the decision scans the
    FULL column (one aggregate job over all candidates, map-side
    combined) so later rows can't be silently mis-coerced; the convert
    itself is a pure projection (hex + substring, whole-stage codegen,
    no UDF)."""
    bin_cols = [c for c, t in df.dtypes if t == "binary"]
    if not bin_cols:
        return df
    aggs = []
    for c in bin_cols:
        aggs.append(
            F.sum(
                (F.col(c).isNotNull() & (F.length(c) != 16)).cast("long")
            ).alias(f"bad__{c}")
        )
        aggs.append(F.sum(F.col(c).isNotNull().cast("long")).alias(f"nonnull__{c}"))
    stats = df.agg(*aggs).first()
    out = df
    for c in bin_cols:
        if stats[f"nonnull__{c}"] and not stats[f"bad__{c}"]:
            h = F.lower(F.hex(F.col(c)))
            out = out.withColumn(
                c,
                F.when(
                    F.col(c).isNotNull(),
                    F.concat_ws(
                        "-",
                        F.substring(h, 1, 8),
                        F.substring(h, 9, 4),
                        F.substring(h, 13, 4),
                        F.substring(h, 17, 4),
                        F.substring(h, 21, 12),
                    ),
                ),
            )
    return out
