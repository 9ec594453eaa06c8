"""Cross-run incremental dedup ingest tests."""

from __future__ import annotations

import os

from pyspark.sql.types import LongType, StringType, StructField, StructType

from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
    incremental_dedup_ingest,
    ingest_increment,
)

DOC_SCHEMA = StructType([StructField("doc_id", LongType()), StructField("text", StringType())])


def test_ingest_increment_dedups_within_and_across_batches(spark, tmp_path):
    corpus = os.path.join(tmp_path, "corpus")
    seen = os.path.join(tmp_path, "seen")
    b1 = spark.createDataFrame([(1, "alpha"), (2, "beta"), (3, "alpha")], DOC_SCHEMA)
    n1 = ingest_increment(spark, b1, corpus, seen)
    assert n1 == 2  # in-batch dup (doc 3) dropped, min id kept
    b2 = spark.createDataFrame([(4, "beta"), (5, "gamma")], DOC_SCHEMA)
    n2 = ingest_increment(spark, b2, corpus, seen)
    assert n2 == 1  # beta already in history
    got = {r.doc_id: r.text for r in spark.read.parquet(corpus).collect()}
    assert got == {1: "alpha", 2: "beta", 5: "gamma"}


def test_incremental_streaming_ingest_two_runs(spark, tmp_path):
    """Two availableNow drains over a growing source directory: run 2 must
    ingest only genuinely new texts."""
    src = os.path.join(tmp_path, "src")
    corpus = os.path.join(tmp_path, "corpus")
    seen = os.path.join(tmp_path, "seen")
    ckpt = os.path.join(tmp_path, "ck")
    os.makedirs(src)
    spark.createDataFrame([(1, "a"), (2, "b")], DOC_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    q = incremental_dedup_ingest(spark, src, corpus, seen, ckpt, DOC_SCHEMA)
    q.awaitTermination()
    spark.createDataFrame([(3, "b"), (4, "c")], DOC_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    q = incremental_dedup_ingest(spark, src, corpus, seen, ckpt, DOC_SCHEMA)
    q.awaitTermination()
    got = sorted(r.text for r in spark.read.parquet(corpus).collect())
    assert got == ["a", "b", "c"]
