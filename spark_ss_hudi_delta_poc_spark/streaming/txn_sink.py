"""Idempotent manifest-committed table sink — exactly-once foreachBatch
writes WITHOUT a lakehouse format.

The reference documents a real failure (README.md:115-122): Hudi
duplicates rows when a killed job replays a batch whose record keys were
regenerated.  Parquet/Delta stay clean because their sinks are
batch-id-transactional.  This module gives ANY foreachBatch pipeline the
same guarantee on plain parquet:

- data for micro-batch N lands under ``<table>/batch=N/``;
- a commit marker ``<table>/_commits/N`` is written AFTER the data
  (atomic create);
- a replayed batch N sees its marker and SKIPS the write;
- readers take only committed batch dirs → a consistent snapshot even
  mid-write.

This is the minimal transaction log (the core of what `_delta_log` does
for Delta), shuffle-free and scale-independent: commit state is one empty
marker file per micro-batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _commits_dir(table_path: str) -> str:
    return os.path.join(table_path, "_commits")


def committed_batches(table_path: str) -> set[int]:
    d = _commits_dir(table_path)
    if not os.path.isdir(d):
        return set()
    return {int(f) for f in os.listdir(d) if f.isdigit()}


def write_batch_idempotent(batch_df: DataFrame, batch_id: int, table_path: str) -> bool:
    """foreachBatch body: write batch ``batch_id`` exactly once.
    Returns True if written, False if skipped as already committed —
    including when another writer won the commit race (see below)."""
    if batch_id in committed_batches(table_path):
        return False
    target = os.path.join(table_path, f"batch={batch_id}")
    batch_df.write.mode("overwrite").parquet(target)  # overwrite: retry-safe
    return try_commit(table_path, batch_id)


def try_commit(table_path: str, batch_id: int) -> bool:
    """Optimistic concurrency control, Delta-style in miniature: the
    commit IS the atomic creation of the marker file (O_CREAT|O_EXCL —
    the same mutual exclusion `_delta_log` gets from atomic
    put-if-absent of the next log entry).  Exactly one of N racing
    writers of the same batch id succeeds; losers return False and must
    treat the winner's data as the committed truth (their staged data
    was for the same batch id, so the snapshot is equivalent)."""
    os.makedirs(_commits_dir(table_path), exist_ok=True)
    marker = os.path.join(_commits_dir(table_path), str(batch_id))
    try:
        fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False  # lost the optimistic-commit race
    os.close(fd)
    return True


def read_committed(spark: SparkSession, table_path: str, as_of_batch: int | None = None) -> DataFrame:
    """Consistent snapshot: only batch dirs with commit markers.

    ``as_of_batch`` gives time travel — the table as it stood after that
    micro-batch committed (markers are monotonic, so the prefix IS the
    historical snapshot)."""
    batches = sorted(committed_batches(table_path))
    if as_of_batch is not None:
        batches = [b for b in batches if b <= as_of_batch]
    if not batches:
        raise FileNotFoundError(f"no committed batches under {table_path}")
    paths = [os.path.join(table_path, f"batch={b}") for b in batches]
    return spark.read.parquet(*paths)


def idempotent_sink(table_path: str):
    """writeStream.foreachBatch(idempotent_sink(path))"""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        write_batch_idempotent(batch_df, batch_id, table_path)

    return _sink
