"""Table-maintenance operators — the lakehouse housekeeping a streaming
ingest pipeline needs (the reference gets these from Hudi/Delta services;
on plain parquet we implement them as explicit jobs):

- ``upsert_snapshot``: copy-on-write upsert (Hudi K4 semantics: latest
  record per key wins by a precombine ordering column) producing a new
  snapshot — full-outer-join-free: union + window rank keeps it to one
  shuffle on the key;
- ``compact``: small-file compaction of a (partitioned) table — streaming
  sinks produce one file per trigger per partition; at 100 TB file-count
  explosion kills scan planning, so compaction is a scheduled job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def upsert_snapshot(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    precombine_col: str,
) -> DataFrame:
    """Latest-wins upsert: rows from ``updates`` replace same-key rows in
    ``current``; among duplicates the highest ``precombine_col`` (then the
    update side) wins — exactly Hudi's recordkey/precombine contract
    (S3SQSToHudiStreamJob.scala:95-113).

    Plan: tag + union + row_number over (key ORDER BY precombine DESC,
    side DESC) → filter rank 1.  One shuffle on the key; no join.
    """
    cur = current.withColumn("_side", F.lit(0))
    upd = updates.withColumn("_side", F.lit(1))
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(precombine_col).desc(), F.col("_side").desc()
    )
    return (
        cur.unionByName(upd)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_side")
    )


def bulk_insert_snapshot(current: DataFrame, updates: DataFrame) -> DataFrame:
    """Hudi ``bulk_insert`` semantics (the reference's tuned fast path,
    S3ToHudiOptStreamJob.scala:78-101): a raw append with NO key
    deduplication and no precombine — same-key rows from both sides
    coexist in the result.  This is exactly why the reference documents
    replayed-batch duplication under Hudi (README.md:115-122): bulk_insert
    trades the upsert's key lookup for raw write throughput.  Contrast
    ``upsert_snapshot`` (operation=upsert: latest per key wins).

    Plan: unionByName — a pure metadata concat, zero shuffle."""
    return current.unionByName(updates)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data-capture between two snapshots: (key..., change) where
    change ∈ {added, removed, changed}.  Unchanged rows are not emitted.

    Plan: full outer join on the key comparing a 60-bit hash of the
    compared columns — one shuffle on the key, 8-byte comparison payload
    regardless of row width (never ships both full rows to the driver or
    compares column-by-column downstream)."""
    from ..functions.hashing import md5_long

    compare_cols = compare_cols or [c for c in new.columns if c not in key_cols]
    def hashed(df: DataFrame, alias: str) -> DataFrame:
        payload = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in compare_cols])
        return df.select(*key_cols, md5_long(payload).alias(alias))

    o = hashed(old, "h_old")
    n = hashed(new, "h_new")
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("h_old").isNull(), "added")
        .when(F.col("h_new").isNull(), "removed")
        .when(F.col("h_old") != F.col("h_new"), "changed")
    )
    return joined.select(*key_cols, change.alias("change")).where(F.col("change").isNotNull())


def compact(
    spark: SparkSession,
    table_path: str,
    target_files_per_partition: int = 1,
    partition_by: list[str] | None = None,
) -> None:
    """Rewrite a parquet table with ``target_files_per_partition`` files
    (per hive partition when partitioned).  Writes to a staging directory
    then swaps, so readers never see a half-compacted table.

    The swap is two renames (POSIX has no atomic directory exchange), so
    a crash between them leaves the table at ``._old`` — healed here on
    the next invocation before doing any work."""
    backup = table_path.rstrip("/") + "._old"
    if os.path.isdir(backup) and not os.path.isdir(table_path):
        os.rename(backup, table_path)  # crash between the two renames: heal
    df = spark.read.parquet(table_path)
    staging = table_path.rstrip("/") + "._compacting"
    writer = df.repartition(target_files_per_partition, *(partition_by or [])) if partition_by else df.coalesce(
        target_files_per_partition
    )
    w = writer.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)
    os.rename(table_path, backup)
    os.rename(staging, table_path)
    import shutil

    shutil.rmtree(backup)


def compact_seen_to_bucketed(
    spark: SparkSession,
    seen_path: str,
    table_name: str,
    table_path: str,
    n_buckets: int = 32,
    hash_col: str = "h",
) -> int:
    """Compact the incremental ingest's accumulated ``seen`` hash
    increments into ONE hash-bucketed metastore table — the scheduled
    maintenance job that keeps the cross-run dedup anti-join co-located
    at 100 TB.

    The ingest protocol (streaming/incremental.py) appends one
    ``inc=<token>`` dir of 8-byte hashes per increment; reading those
    paths directly gives Spark no layout information, so every nightly
    anti-join re-shuffles the ENTIRE history on the hash.  Bucketing the
    compacted base by the hash fixes the layout in the metastore: the
    anti-join then shuffles only the (small) nightly batch into the
    bucket layout while the corpus-sized seen side is read in place —
    zero exchange above its scan (plan-asserted in
    tests/test_scale_ops.py).  Production pattern: compacted bucketed
    BASE + recent uncompacted increments probed separately (base+delta);
    this job builds the base.

    Reads only COMMITTED increments (marker protocol).  Returns the
    number of distinct hashes compacted.
    """
    from ..streaming.incremental import _committed_paths, _committed_tokens

    dirs = _committed_paths(seen_path, _committed_tokens(seen_path))
    if not dirs:
        return 0
    seen = spark.read.parquet(*dirs).select(hash_col).distinct()
    (
        seen.write.mode("overwrite")
        .option("path", table_path)
        .bucketBy(n_buckets, hash_col)
        .sortBy(hash_col)
        .saveAsTable(table_name)
    )
    return spark.table(table_name).count()


def bucketed_anti_join_new(
    batch_hashed: DataFrame,
    spark: SparkSession,
    table_name: str,
    hash_col: str = "h",
) -> DataFrame:
    """The co-located history probe: rows of ``batch_hashed`` whose
    ``hash_col`` is NOT in the bucketed seen table.  The bucketed side's
    scan carries its layout, so the anti-join plans with an exchange on
    the BATCH side only — the seen table (the side that scales with the
    corpus) never shuffles."""
    seen = spark.table(table_name).withColumnRenamed(hash_col, "_seen_h")
    return batch_hashed.join(
        seen, batch_hashed[hash_col] == seen["_seen_h"], "left_anti"
    )


def compact_fuzzy_bands_to_bucketed(
    spark: SparkSession,
    index_path: str,
    table_name: str,
    table_path: str,
    n_buckets: int = 32,
) -> int:
    """Compact the incremental FUZZY ingest's accumulated band-index
    increments (``<index>/bands/inc=<token>`` — see
    streaming/incremental.ingest_increment_fuzzy) into ONE metastore
    table bucketed by ``(band_idx, band_val)`` — compact_seen_to_bucketed's pattern
    applied to the fuzzy probe surface.

    Reading the inc dirs directly gives Spark no layout information, so
    every increment's history probe re-shuffles the ENTIRE band history
    on the join key.  Bucketing the compacted base by the FULL join key
    (band_idx, band_val) fixes the layout: the probe then shuffles only
    the (small) batch key set into the bucket layout while the
    corpus-sized band side is read in place — zero exchange above its
    scan (plan-asserted in tests/test_scale_ops.py; bucketing by a
    key SUBSET would be rejected by the default
    requireAllClusterKeysForCoPartition co-partitioning rule and
    re-shuffle the base).  Production pattern: compacted bucketed BASE
    + recent uncompacted increments probed separately (base+delta);
    this job builds the base.

    Reads only COMMITTED increments (marker protocol).  Returns the row
    count of the compacted base."""
    from ..streaming.incremental import _committed_paths, _committed_tokens

    dirs = _committed_paths(
        os.path.join(index_path, "bands"), _committed_tokens(index_path)
    )
    if not dirs:
        return 0
    bands = spark.read.parquet(*dirs)
    # bucket-aligned repartition (same murmur3-pmod as the bucket-id
    # assignment): one task per bucket -> one file per bucket, instead
    # of one file per (task, bucket) — see incremental._write_fold_tier
    from pyspark.sql import functions as F

    (
        bands.repartition(n_buckets, F.col("band_idx"), F.col("band_val"))
        .write.mode("overwrite")
        .option("path", table_path)
        .bucketBy(n_buckets, "band_idx", "band_val")
        .sortBy("band_idx", "band_val")
        .saveAsTable(table_name)
    )
    return spark.table(table_name).count()


def bucketed_band_probe(
    batch_keys: DataFrame, spark: SparkSession, table_name: str
) -> DataFrame:
    """The co-located fuzzy-history probe: band rows of the bucketed
    base whose (band_idx, band_val) appears in the batch's key set.
    The bucketed side's scan carries its layout, so the semi-join plans
    with an exchange on the BATCH KEY side only — the band history (the
    side that scales with the corpus) never shuffles."""
    hist = spark.table(table_name)
    return hist.join(batch_keys, ["band_idx", "band_val"], "left_semi")


def vacuum_uncommitted(
    table_path: str,
    min_age_seconds: float = 3600.0,
    txn_root: str | None = None,
) -> list[str]:
    """Remove ORPHANED staged increments: ``inc=<token>`` dirs whose
    commit marker never appeared — the debris a crash between staging
    and marker-create leaves behind (the marker protocol already makes
    readers ignore them; this reclaims the storage, the engine-side
    equivalent of Delta VACUUM / Hudi cleaner for the ingest layout).

    ``txn_root`` is where the ``_commits`` markers live; it defaults to
    ``table_path`` (the single-table layout), but MUST be passed for
    multi-table increments whose tables commit under a shared root —
    e.g. the fuzzy ingest's ``corpus/``, ``bands/`` and ``retired/``
    all commit under ``index_path`` (ADVICE r11: vacuuming one of those
    roots with the default would find ZERO committed tokens and delete
    committed increments).  As a guard, a root with NO ``_commits`` dir
    raises instead of treating everything as uncommitted.

    Only dirs older than ``min_age_seconds`` are touched: an increment
    may legitimately be mid-stage RIGHT NOW, and its marker appears
    strictly after its dir, so any sufficiently old unmarked dir is
    garbage (age from the dir's mtime — parquet writers touch it last
    at write completion).  Returns the removed tokens.
    """
    import shutil
    import time

    from ..streaming.incremental import _commits_dir, _committed_tokens

    root = txn_root if txn_root is not None else table_path
    removed: list[str] = []
    if not os.path.isdir(table_path):
        return removed
    if not os.path.isdir(_commits_dir(root)):
        raise ValueError(
            f"refusing to vacuum {table_path}: no _commits dir under "
            f"{root} — wrong root (pass txn_root for multi-table "
            f"increments) or a never-committed table"
        )
    committed = set(_committed_tokens(root))
    from ..streaming.incremental import FOLD_DIR_PREFIX

    cutoff = time.time() - min_age_seconds
    for name in os.listdir(table_path):
        if not name.startswith("inc="):
            continue
        # fold outputs (inc=_foldv<V>) are committed by the FOLD
        # MANIFEST, not by a marker — their tokens are never in
        # _commits, so the orphan rule below would delete the entire
        # folded history (review r12).  Fold-dir debris is owned by
        # fold_committed_incs' own heal step, never by vacuum.
        if name.startswith(f"inc={FOLD_DIR_PREFIX}"):
            continue
        token = name[len("inc="):]
        p = os.path.join(table_path, name)
        if token in committed or not os.path.isdir(p):
            continue
        if os.path.getmtime(p) <= cutoff:
            shutil.rmtree(p, ignore_errors=True)
            removed.append(token)
    return removed


def scd2_history(events: DataFrame) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 history build from an event
    stream — the lakehouse MERGE pattern's batch equivalent (Delta/Hudi
    users materialize exactly this table with `MERGE ... WHEN MATCHED
    UPDATE valid_to`): for each user, collapse consecutive events with
    the SAME state (event_type) into one versioned validity interval
    [valid_from, valid_to), open-ended for the current state.

    Gaps-and-islands: lag() marks state changes, a running sum numbers
    the islands, one groupBy collapses each island, lead() closes each
    interval with the next island's start.  Total order inside a user is
    (ts, event_id) so same-timestamp events can never flip the history
    between runs.  ONE shuffle: the windows and the groupBy all key on
    user_id, so Catalyst reuses the exchange; at 100 TB this is a single
    user-partitioned pass, no global sort.

    Output: (user_id, version, event_type, valid_from, valid_to,
    n_events, is_current); valid_to is NULL on the current row.
    """
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    marked = events.select("user_id", "event_id", "event_type", "ts").withColumn(
        "is_new",
        (F.lag("event_type").over(w).isNull() | (F.lag("event_type").over(w) != F.col("event_type"))).cast(
            "int"
        ),
    )
    islands = marked.withColumn(
        "version", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    collapsed = islands.groupBy("user_id", "version").agg(
        F.first("event_type").alias("event_type"),  # constant within an island
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy(F.col("version").asc())
    return collapsed.select(
        "user_id",
        "version",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_events",
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )


def scd2_as_of(events: DataFrame, as_of_ep) -> DataFrame:
    """Point-in-time (time-travel) read over the SCD2 history — "what
    was every user's state AT time T": the version whose
    [valid_from, valid_to) interval contains T.  This is the query the
    lakehouse formats answer with snapshot time travel (Delta
    ``timestampAsOf`` / Hudi point-in-time); on the engine-side history
    it is a filter over :func:`scd2_history`'s intervals — no snapshot
    log needed, any T answerable from one table.

    ``as_of_ep`` is a Column of epoch SECONDS (integer); users whose
    first event is after T have no row, exactly like a snapshot read.

    Plan: scd2_history's single user-keyed shuffle, then a map-side
    interval filter — the scalar T (typically a 1-row aggregate)
    broadcasts via cross join.  Output: (user_id, version, state,
    since, n_events).
    """
    hist = scd2_history(events)
    # direct epoch->timestamp cast: to_timestamp(from_unixtime(ep)) is a
    # string round-trip through the SESSION timezone — correct only
    # because this repo pins UTC, and not injective under a DST zone
    # (fall-back overlap); timestamp_seconds is tz-independent and one
    # cast instead of two per-row string conversions
    t = F.timestamp_seconds(as_of_ep)
    return hist.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select(
        "user_id",
        "version",
        F.col("event_type").alias("state"),
        F.col("valid_from").alias("since"),
        "n_events",
    )
