"""Incremental (cross-run) deduplicated ingest.

`dropDuplicates` state lives inside one streaming query's checkpoint; a
training-data pipeline also needs dedup against ALL PREVIOUS RUNS — e.g. a
nightly crawl batch deduped against the entire historical corpus.  The
standard shape, implemented here:

  new batch → hash text (60-bit, 8-byte keys) → left-anti join against the
  persistent `seen` hash table → append survivors to corpus + their hashes
  to `seen`.

The anti-join shuffles only hashes; the `seen` table is an append-only
parquet prefix (at 100 TB you'd bucket it by hash so the anti-join is
co-located and incremental compaction keeps file counts bounded —
`operators/maintenance.compact`).  foreachBatch makes it streaming-native;
`ingest_increment` is the batch core, usable standalone.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_long


def ingest_increment(
    spark: SparkSession,
    batch: DataFrame,
    corpus_path: str,
    seen_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Dedup `batch` against history and itself, append survivors.
    Returns the number of newly ingested rows."""
    hashed = batch.withColumn("_h", md5_long(F.col(text_col)))
    # in-batch exact dedup first (keep min id per hash), then anti vs history
    keepers = (
        hashed.groupBy("_h")
        .agg(F.min(id_col).alias("_keep"))
        .select(F.col("_h").alias("_kh"), F.col("_keep"))
    )
    firsts = hashed.join(
        keepers, (F.col("_h") == F.col("_kh")) & (F.col(id_col) == F.col("_keep"))
    ).drop("_kh", "_keep")
    if os.path.isdir(seen_path):
        seen = spark.read.parquet(seen_path).select(F.col("h").alias("_seen_h"))
        fresh = firsts.join(seen, firsts["_h"] == seen["_seen_h"], "left_anti")
    else:
        fresh = firsts
    fresh = fresh.persist()
    n = fresh.count()
    if n:
        fresh.drop("_h").write.mode("append").parquet(corpus_path)
        fresh.select(F.col("_h").alias("h")).write.mode("append").parquet(seen_path)
    fresh.unpersist()
    return n


def incremental_dedup_ingest(
    spark: SparkSession,
    source_dir: str,
    corpus_path: str,
    seen_path: str,
    checkpoint: str,
    schema,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming wrapper: file stream → foreachBatch(ingest_increment).
    Restart-safe: a replayed batch re-runs the anti-join, so already-seen
    hashes are dropped and the corpus stays duplicate-free (idempotent by
    construction, not by sink transaction)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        ingest_increment(batch_df.sparkSession, batch_df, corpus_path, seen_path, text_col, id_col)

    return (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
