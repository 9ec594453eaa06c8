"""CloudTrail-shaped nested-JSON pipeline — the reference's second job
family (S3CloudTrailDeltaWriterWithExplodeCT / ...NonExplodeCT /
...ExplodeInRawCT, SURVEY.md §1.4/#3), parameterized into one pipeline
with three output variants:

- "flatten":    explode(Records) → unix_timestamp(eventTime) → record.*
                flattened to top level (ExplodeCT, :148-158)
- "raw_string": explode → to_json(record) AS rawmsg (NonExplodeCT, :154)
- "raw_struct": explode → flatten → re-pack struct(record.*) AS rawmsg
                (ExplodeInRawCT, :162)

plus the constant/derived partition columns (index='cloudtrail',
subtype='falcon', date, bu) and the 4-column partitioned Append sink
(:168-176).  All transforms are built-ins: explode is the only
row-multiplying op, everything else is a codegen'd projection — the whole
pipeline is a shuffle-free map at any scale, and the 4-col hive partitioning
gives the sink partition pruning for free.
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
    base = rec.select(ts.alias("timestamp"), "record")
    if variant == "flatten":
        out = base.select("timestamp", "record.*")
    elif variant == "raw_string":
        out = base.select("timestamp", F.to_json("record").alias("rawmsg"))
    else:  # raw_struct: flatten then re-pack (ExplodeInRawCT.scala:162)
        flat = base.select("timestamp", "record.*")
        out = flat.select("timestamp", F.struct(*[c for c in flat.columns if c != "timestamp"]).alias("rawmsg"))
    # constant + derived partition columns, then drop the work column — the
    # reference's drop("timestamp") (ExplodeCT.scala:169, ExplodeInRawCT:170)
    return (
        out.withColumn("index", F.lit("cloudtrail"))
        .withColumn("subtype", F.lit("falcon"))
        .withColumn("date", F.col("timestamp").cast("date").cast("string"))
        .withColumn("bu", F.coalesce(F.col("timestamp").cast("date").cast("string"), F.lit("unknown")))
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
