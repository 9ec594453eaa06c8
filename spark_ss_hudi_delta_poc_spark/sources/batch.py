"""Batch readers (S5-S13) — thin, declarative, format-parameterized.

Mirrors the reference's batch readers (S3ParquetBatchReader.scala:39-41 and
Delta/Hudi/Iceberg siblings, DiskBasedTransformJob.scala:32-39,
FileReaderNullWriterTest.scala:31-37, StringTransformJob.scala:33-49).
Everything is `spark.read` — Catalyst owns pushdown/pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    sep: str = ",",
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """S5 CSV batch read (DiskBasedTransformJob.scala:32-39); ``sep`` covers
    the semicolon mutual-fund fixture (FIXTURES.md F6).  ``mode`` /
    ``corrupt_col`` give CSV the same malformed-record policy surface as
    :func:`read_json` (capture requires an explicit schema containing the
    corrupt string column)."""
    reader = spark.read.option("header", str(header).lower()).option("sep", sep).option("mode", mode)
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    merge_schema: bool = False,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """S6 fixed-schema / S7 inferred (+mergeSchema) JSON batch read.

    Malformed-record policy mirrors the reference's malformed-message
    handling in the notification source (SqsClient.scala's delete-on-
    unparseable path, §2.9): ``mode`` is Spark's PERMISSIVE (null out bad
    fields) / DROPMALFORMED (skip bad records) / FAILFAST; pass
    ``corrupt_col`` (with an explicit ``schema`` that includes that
    string column — Spark requires the column in the schema) to CAPTURE
    each unparseable raw record for a quarantine sink instead of
    silently nulling it.
    """
    reader = spark.read.option("mode", mode)
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_json_strings(spark: SparkSession, df: DataFrame, column: str = "value") -> DataFrame:
    """S7 dynamic schema inference from a string column
    (StringTransformJob.scala:49): infer over the strings, then the caller
    applies it with from_json.  Returns the inferred-schema DataFrame."""
    import pyspark.sql.functions as F

    strings = df.select(F.col(column).cast("string").alias("value"))
    return spark.read.json(strings.rdd.map(lambda r: r.value))


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """S8 text read (StringTransformJob.scala:33)."""
    return spark.read.text(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """S9-S12 self-describing table read; fmt in parquet/delta/hudi/iceberg."""
    return spark.read.format(fmt).load(path)


def format_available(spark: SparkSession, fmt: str) -> bool:
    """Probe whether a lakehouse format's jars are on the classpath."""
    if fmt == "parquet":
        return True
    probe = {"delta": "io.delta.sql.DeltaSparkSessionExtension",
             "hudi": "org.apache.hudi.DefaultSource",
             "iceberg": "org.apache.iceberg.spark.source.IcebergSource"}
    cls = probe.get(fmt)
    if cls is None:
        return False
    try:
        spark._jvm.java.lang.Class.forName(cls)  # noqa: SLF001
        return True
    except Exception:
        return False
