"""Format-dispatching readers/writers beyond the reference's CSV/TSV.

The reference loads only `,`/`\t` text files (Utilities.scala:85-114); a
standalone engine also needs the columnar/semi-structured formats Spark
ships: parquet, ORC, JSON (lines), CSV. Readers return plain DataFrames so
everything composes with the Datalog context and the operator library.

Scale notes: parquet/ORC readers get predicate pushdown + column pruning
from Catalyst for free (verify `PushedFilters`/`ReadSchema` in .explain);
JSON/CSV scans parse every byte — convert to parquet at the ingest edge
(`convert_to_parquet`) before repeated querying.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".csv": "csv",
    ".tsv": "csv",
    ".txt": "csv",
}


def detect_format(path: str) -> str:
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    return _EXT_FORMAT.get(ext, "parquet")


def read_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    fmt: str | None = None,
    **options,
) -> DataFrame:
    """Read `path` with the format implied by its extension (or `fmt`).

    CSV/TSV keep the reference's text conventions (separator by extension,
    `%` comments, trimmed fields) via sources.csv; parquet/ORC/JSON go
    through the native readers (schema optional — self-describing or
    inferred)."""
    fmt = fmt or detect_format(path)
    if fmt == "csv":
        from .csv import read_deal_table

        if schema is None:
            raise ValueError("CSV/TSV sources need a declared schema")
        return read_deal_table(spark, path, schema)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "parquet":
        return reader.options(**options).parquet(path)
    if fmt == "orc":
        return reader.options(**options).orc(path)
    if fmt == "json":
        return reader.options(**options).json(path)
    raise ValueError(f"unsupported source format {fmt!r}")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    partition_by: list | None = None,
    max_records_per_file: int | None = None,
    cluster_by: list | None = None,
    **options,
) -> None:
    """Write a result out (the reference's only sinks are collect/count,
    BigDatalogProgram.scala:30-41 — file sinks are pure extension).

    Scale controls:
    * ``partition_by`` — directory partitioning for partition-pruned scans.
    * ``max_records_per_file`` — caps file size so a skewed task can't
      emit a multi-GB file (the #1 operational failure of 100 TB writes);
      maps to the writer's maxRecordsPerFile option.
    * ``cluster_by`` — sortWithinPartitions before writing, so parquet
      row-group min/max stats make downstream range filters prune inside
      files (poor man's clustering; no extra shuffle).
    """
    fmt = fmt or detect_format(path)
    if cluster_by:
        df = df.sortWithinPartitions(*cluster_by)
    if max_records_per_file:
        options = {**options, "maxRecordsPerFile": str(max_records_per_file)}
    w = df.write.mode(mode).options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "csv":
        w.csv(path)
    elif fmt == "parquet":
        w.parquet(path)
    elif fmt == "orc":
        w.orc(path)
    elif fmt == "json":
        w.json(path)
    else:
        raise ValueError(f"unsupported sink format {fmt!r}")


def convert_to_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    schema: T.StructType | None = None,
    partition_by: list | None = None,
) -> DataFrame:
    """Ingest-edge conversion: read any supported format once, write
    parquet for pushdown-friendly repeated scans; returns the parquet-backed
    frame."""
    write_table(read_table(spark, src, schema), dest, "parquet",
                partition_by=partition_by)
    return spark.read.parquet(dest)
