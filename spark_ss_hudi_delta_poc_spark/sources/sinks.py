"""Sink factory (K1-K11) — streaming + batch writers, format-parameterized.

The reference hard-codes one sink per job class; we expose one factory that
covers its full sink matrix (SURVEY.md §2.2):

- streaming partitioned Parquet (K1) / Delta (K2) / Hudi (K3/K4) / Iceberg
  (K5), Append mode, checkpointed;
- console sink in Update mode (K6);
- foreachBatch with persist/unpersist double-write (K7);
- batch writers: Delta overwrite (K8), JSON (K9), Hudi append (K10),
  CSV w/ header (K11).

Hudi/Delta/Iceberg need their runtime jars; this environment ships none, so
those paths raise a clear error unless the format is available (probed in
batch.format_available).  The OPTION MAPS are still faithfully encoded —
they're the reference's actual tuning surface (S3ToHudiOptStreamJob.scala:
78-101) and what you'd deploy on a real cluster.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter, StreamingQuery
from pyspark.sql.types import StructType

# K3 — the tuned bulk-insert option map (S3ToHudiOptStreamJob.scala:78-101).
# This is what makes Hudi writes only ~3-4x slower than plain parquet
# instead of ~7x (README.md:102-103): no sort, no combine, no meta fields,
# no metadata table, row-writer off, snappy, hive-style partition paths.
HUDI_BULK_INSERT_OPTS: dict[str, str] = {
    "hoodie.datasource.write.recordkey.field": "UUID",
    "hoodie.datasource.write.precombine.field": "NormalizedTimestamp",
    "hoodie.datasource.write.partitionpath.field": "Date,Country",
    "hoodie.datasource.write.keygenerator.class": "org.apache.hudi.keygen.ComplexKeyGenerator",
    "hoodie.datasource.write.operation": "bulk_insert",
    "hoodie.bulkinsert.sort.mode": "NONE",
    "hoodie.combine.before.insert": "false",
    "hoodie.datasource.write.row.writer.enable": "false",
    "hoodie.populate.meta.fields": "false",
    "hoodie.metadata.enable": "false",
    "hoodie.parquet.compression.codec": "snappy",
    "hoodie.datasource.write.hive_style_partitioning": "true",
    "hoodie.streamer.ingestion.ignore.failed.batch": "false",
}

# K4 — upsert copy-on-write variant (S3SQSToHudiStreamJob.scala:95-113).
HUDI_UPSERT_COW_OPTS: dict[str, str] = {
    "hoodie.datasource.write.recordkey.field": "UUID",
    "hoodie.datasource.write.precombine.field": "NormalizedTimestamp",
    "hoodie.datasource.write.partitionpath.field": "Date,Country",
    "hoodie.datasource.write.keygenerator.class": "org.apache.hudi.keygen.ComplexKeyGenerator",
    "hoodie.datasource.write.operation": "upsert",
    "hoodie.datasource.write.table.type": "COPY_ON_WRITE",
}


def write_stream(
    df: DataFrame,
    fmt: str,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
    output_mode: str = "append",
    trigger_available_now: bool = False,
    processing_time: str | None = None,
    extra_options: dict[str, str] | None = None,
) -> StreamingQuery:
    """K1/K2/K3/K4/K5 streaming sink.  `trigger_available_now=True` is the
    modern Trigger.Once (S3ToDeltaStreamJob.scala:80); `processing_time`
    maps Trigger.ProcessingTime (S3CloudTrailIcebergWriter.scala:105)."""
    writer: DataStreamWriter = (
        df.writeStream.format(fmt)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .option("path", path)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if extra_options:
        writer = writer.options(**extra_options)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def read_back(spark: SparkSession, path: str, written_schema: StructType) -> DataFrame:
    """Read a (possibly partitioned) parquet sink back with the WRITER's
    column types restored — the K1 round-trip contract
    (S3ToParquetStreamJob.scala:74-81: what lands in the sink must be
    queryable as what was written).

    Spark stores partition-column values in directory names and re-infers
    their types on read; the inference covers numerics and dates but NOT
    booleans, so a ``keep=true`` partition directory reads back as the
    STRING ``'true'``.  Any column whose read-back type differs from the
    written schema is cast back.  Non-partition columns keep their parquet
    types, so the casts are directory-name columns only.
    """
    df = spark.read.parquet(path)
    written = {f.name: f.dataType for f in written_schema.fields}
    drifted = [
        f.name
        for f in df.schema.fields
        if f.name in written and f.dataType != written[f.name]
    ]
    return df.withColumns(
        {c: F.col(c).cast(written[c]) for c in drifted}
    ) if drifted else df


def write_console_stream(
    df: DataFrame, output_mode: str = "update", truncate: bool = False
) -> StreamingQuery:
    """K6 console sink, Update mode (S3ParquetStreamReader.scala:68-74)."""
    return (
        df.writeStream.format("console")
        .outputMode(output_mode)
        .option("truncate", str(truncate).lower())
        .start()
    )


def foreach_batch_persist_writer(
    write_fn: Callable[[DataFrame, int], None],
) -> Callable[[DataFrame, int], None]:
    """K7 — the persist/write/unpersist micro-batch pattern
    (S3ToHudiStreamJob.scala:99-126): persist the batch so a double write
    (or write + metrics) scans the input once."""

    def _persist_df(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            write_fn(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    return _persist_df


def write_batch(
    df: DataFrame,
    fmt: str,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """K8 (delta overwrite) / K9 (json) / K10 (hudi append) / K11 (csv)."""
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if options:
        writer = writer.options(**options)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)
