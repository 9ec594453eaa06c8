"""Streaming file sources (S1-S3) + helpers to stage bounded tables as file
streams for equivalence testing.

The reference's pattern (S3ToParquetStreamJob.scala:54-60):

    readStream.format(fmt).schema(s).option("maxFilesPerTrigger", n)
              .option("header", true).load(path)

`maxFilesPerTrigger` is the ingest rate limiter; exactly-once bookkeeping is
Structured Streaming's built-in offset/commit log (SURVEY.md §1.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_file_stream(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
    header: bool = True,
    max_file_age: str | None = None,
) -> DataFrame:
    """S1 (csv) / S2 (json, incl. .gz) / S3 (parquet) streaming file source.

    ``max_file_age`` maps the SQS source's age-purge semantics
    (SqsSourceOptions.scala:33-44) onto the built-in source's maxFileAge.
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if fmt == "csv":
        reader = reader.option("header", str(header).lower())
    if max_file_age is not None:
        reader = reader.option("maxFileAge", max_file_age)
    return reader.load(path)


def stage_as_files(df: DataFrame, out_dir: str, n_files: int, fmt: str = "parquet") -> str:
    """Write a bounded DataFrame as ``n_files`` files so it can be replayed
    as a file stream (FIXTURES.md: 'chunk lineitem/events into N files and
    stream with maxFilesPerTrigger').  Round-robin repartition keeps the
    files evenly sized — same shape a 305-file S3 prefix would have."""
    staged = os.path.join(out_dir, "staged")
    writer = df.repartition(n_files).write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(staged)
    return staged
