"""CloudTrail-shaped nested-JSON pipeline — the reference's second job
family (S3CloudTrailDeltaWriterWithExplodeCT / ...NonExplodeCT /
...ExplodeInRawCT, SURVEY.md §1.4/#3), parameterized into one pipeline
with three output variants:

- "flatten":    explode(Records) → unix_timestamp(eventTime) → record.*
                flattened to top level (ExplodeCT, :148-158)
- "raw_string": explode → to_json(record) AS rawmsg (NonExplodeCT, :154)
- "raw_struct": explode → rawmsg = struct(record.*), record dropped
                (ExplodeInRawCT, :162-166)

All three variants share the reference's enrichment set
(S3CloudTrailDeltaWriterWithExplodeCT.scala:148-161):
  ddi_eventtimestamp      = record.eventTime (raw string)
  subtype                 = record.eventSource   ← PARTITION column
  ddi_awsreg              = record.awsRegion
  date                    = parsed timestamp cast to DATE
  ddi_normalizedTimestamp = current_timestamp() as string (audit col,
                            excluded from deterministic comparisons)
  index                   = lit('cloudtrail'),  bu = lit('falcon')
and the 4-column partitioned Append sink partitionBy(index, date,
subtype, bu) (:168-176).  Partitioning by eventSource means each AWS
service lands in its own partition — the reference's actual pruning key —
while bu is a constant tenant tag.  All transforms are built-ins: explode
is the only row-multiplying op, everything else is a codegen'd projection
— the whole pipeline is a shuffle-free map at any scale, and the 4-col
hive partitioning gives the sink partition pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import CLOUDTRAIL_SCHEMA

EVENT_TIME_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"
VARIANTS = ("flatten", "raw_string", "raw_struct")


def transform_cloudtrail(df: DataFrame, variant: str = "flatten") -> DataFrame:
    """Apply the CloudTrail transform chain to a DataFrame with a
    ``Records array<struct>`` column (batch or streaming — same plan)."""
    if variant not in VARIANTS:
        raise ValueError(f"variant must be one of {VARIANTS}")
    rec = df.select(F.explode("Records").alias("record"))
    ts = F.unix_timestamp(F.col("record.eventTime"), EVENT_TIME_FMT).cast("timestamp")
    # shared enrichment head (ExplodeCT.scala:148-154): raw event-time
    # string, eventSource as the subtype partition key, awsRegion
    head = [
        ts.alias("timestamp"),
        F.col("record.eventTime").alias("ddi_eventtimestamp"),
        F.col("record.eventSource").alias("subtype"),
        F.col("record.awsRegion").alias("ddi_awsreg"),
    ]
    if variant == "flatten":
        out = rec.select(*head, "record.*")
    elif variant == "raw_string":
        out = rec.select(*head, F.to_json("record").alias("rawmsg"))
    else:  # raw_struct: record re-packed whole (ExplodeInRawCT.scala:162)
        out = rec.select(*head, F.struct("record.*").alias("rawmsg"))
    # derived + constant partition columns, then drop the work column — the
    # reference's drop("timestamp") (ExplodeCT.scala:167-176)
    return (
        out.withColumn("date", F.col("timestamp").cast("date"))
        .withColumn("ddi_normalizedTimestamp", F.current_timestamp().cast("string"))
        .withColumn("index", F.lit("cloudtrail"))
        .withColumn("bu", F.lit("falcon"))
        .drop("timestamp")
    )


def stream_cloudtrail(
    spark: SparkSession,
    source_path: str,
    sink_path: str,
    checkpoint: str,
    variant: str = "flatten",
    max_files_per_trigger: int = 10,
):
    """Streaming form: JSON file stream (handles .json.gz transparently —
    S2) → transform → 4-col partitioned parquet sink, availableNow."""
    stream = (
        spark.readStream.schema(CLOUDTRAIL_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(source_path)
    )
    out = transform_cloudtrail(stream, variant)
    return (
        out.writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .option("path", sink_path)
        .partitionBy("index", "date", "subtype", "bu")
        .trigger(availableNow=True)
        .start()
    )
