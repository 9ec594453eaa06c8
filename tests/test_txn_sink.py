"""Idempotent manifest-committed sink tests — the engineered fix for the
reference's replayed-batch duplication failure (README.md:115-122)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_ss_hudi_delta_poc_spark.schemas import EVENTS_SCHEMA
from spark_ss_hudi_delta_poc_spark.sources.stream import read_file_stream, stage_as_files
from spark_ss_hudi_delta_poc_spark.streaming.txn_sink import (
    committed_batches,
    idempotent_sink,
    read_committed,
    write_batch_idempotent,
)
from spark_ss_hudi_delta_poc_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_replayed_batch_is_skipped(spark, tmp_path):
    """Simulate the reference's failure: the same micro-batch delivered
    twice (with regenerated non-deterministic columns, like its UUIDs)
    must land exactly once."""
    table = os.path.join(tmp_path, "tbl")
    b = spark.range(10).selectExpr("id", "uuid() AS row_uuid")
    assert write_batch_idempotent(b, 0, table) is True
    # replay: same batch id, REGENERATED uuids — the Hudi-trap scenario
    b_replay = spark.range(10).selectExpr("id", "uuid() AS row_uuid")
    assert write_batch_idempotent(b_replay, 0, table) is False
    got = read_committed(spark, table)
    assert got.count() == 10
    assert got.select("id").distinct().count() == 10


def test_uncommitted_batch_invisible_to_readers(spark, tmp_path):
    """A data dir without its commit marker (crash between write and
    commit) is excluded from snapshots and safely overwritten on retry."""
    table = os.path.join(tmp_path, "tbl")
    write_batch_idempotent(spark.range(5).selectExpr("id", "'a' AS v"), 0, table)
    # crash simulation: batch 1 data written, marker never created
    spark.range(5, 9).selectExpr("id", "'b' AS v").write.parquet(os.path.join(table, "batch=1"))
    assert committed_batches(table) == {0}
    assert read_committed(spark, table).count() == 5
    # retry of batch 1 overwrites the orphan dir and commits
    assert write_batch_idempotent(spark.range(5, 9).selectExpr("id", "'b' AS v"), 1, table)
    assert read_committed(spark, table).count() == 9


def test_streaming_restart_with_idempotent_sink(spark, tmp_path):
    """End-to-end: file stream → foreachBatch idempotent sink, run twice
    from the same checkpoint → exactly the source rows."""
    staged = stage_as_files(load(spark, SF, "events"), str(tmp_path), n_files=4)
    table = os.path.join(tmp_path, "tbl")
    ckpt = os.path.join(tmp_path, "ck")
    for _ in range(2):
        stream = read_file_stream(spark, staged, "parquet", EVENTS_SCHEMA, max_files_per_trigger=2)
        q = (
            stream.writeStream.foreachBatch(idempotent_sink(table))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    want = load(spark, SF, "events").count()
    got = read_committed(spark, table)
    assert got.count() == want
    assert got.agg(F.countDistinct("event_id")).collect()[0][0] == want


def test_time_travel_as_of_batch(spark, tmp_path):
    table = os.path.join(tmp_path, "tt")
    write_batch_idempotent(spark.range(3).selectExpr("id"), 0, table)
    write_batch_idempotent(spark.range(3, 7).selectExpr("id"), 1, table)
    write_batch_idempotent(spark.range(7, 8).selectExpr("id"), 2, table)
    assert read_committed(spark, table).count() == 8
    assert read_committed(spark, table, as_of_batch=1).count() == 7
    assert read_committed(spark, table, as_of_batch=0).count() == 3


def test_optimistic_commit_single_winner(spark, tmp_path):
    """Delta-style optimistic concurrency: two writers race to commit the
    same batch id; the marker create is atomic (O_CREAT|O_EXCL), so
    exactly one wins and the loser sees False — never a double commit."""
    from spark_ss_hudi_delta_poc_spark.streaming.txn_sink import try_commit

    table = os.path.join(tmp_path, "occ")
    # both writers stage their data for batch 0 (identical batch, as in a
    # speculative/zombie-driver race)
    spark.range(4).selectExpr("id").write.mode("overwrite").parquet(os.path.join(table, "batch=0"))
    assert try_commit(table, 0) is True
    assert try_commit(table, 0) is False  # loser detects the conflict
    assert committed_batches(table) == {0}
    assert read_committed(spark, table).count() == 4
    # and through the full write path: a zombie writer replaying batch 0
    # after the winner committed is a no-op
    assert write_batch_idempotent(spark.range(4).selectExpr("id"), 0, table) is False


def test_read_committed_empty_raises(spark, tmp_path):
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_committed(spark, os.path.join(tmp_path, "nope"))
