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


def ingest_increment_neardup(
    spark: SparkSession,
    batch: DataFrame,
    corpus_path: str,
    index_path: str,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Incremental NEAR-duplicate ingest: drop batch docs that are
    near-dups (Jaccard >= threshold) of anything already ingested, then
    append survivors and extend the persistent LSH index.

    The index is two parquet tables under ``index_path`` — exactly what a
    production LSH index materializes:
      buckets/  (doc_id, band, band_hash)   candidate probe surface
      shingles/ (doc_id, shingle)           verification surface
    New-batch candidates probe history buckets (equi-join on 8-byte keys),
    exact Jaccard verifies against history shingles only for candidates.
    In-batch near-dups are resolved first (keep min doc_id per pair).
    Returns the number of ingested docs.
    """
    from pyspark.sql import functions as F

    from ..operators import dedup

    buckets_path = os.path.join(index_path, "buckets")
    shingles_path = os.path.join(index_path, "shingles")

    # resolve in-batch near-dups: drop the higher id of each pair
    in_batch_pairs = dedup.ngram_jaccard_pairs(batch, threshold=threshold)
    drop_in_batch = in_batch_pairs.select(F.col("doc_id_b").alias(id_col)).distinct()
    batch_kept = batch.join(drop_in_batch, id_col, "left_anti")

    sigs = dedup.minhash_signatures(batch_kept)
    new_buckets = dedup.minhash_band_buckets(sigs).persist()
    new_shingles = dedup.shingle_table(batch_kept).persist()

    if os.path.isdir(buckets_path):
        hist_buckets = spark.read.parquet(buckets_path)
        hist_shingles = spark.read.parquet(shingles_path)
        cand = (
            new_buckets.alias("n")
            .join(
                hist_buckets.alias("h"),
                (F.col("n.band") == F.col("h.band")) & (F.col("n.band_hash") == F.col("h.band_hash")),
            )
            .select(F.col("n.doc_id").alias("new_id"), F.col("h.doc_id").alias("hist_id"))
            .distinct()
        )
        n_sz = new_shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("na"))
        h_sz = hist_shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nb"))
        inter = (
            cand.join(new_shingles.alias("ns"), cand.new_id == F.col("ns.doc_id"))
            .join(
                hist_shingles.alias("hs"),
                (cand.hist_id == F.col("hs.doc_id")) & (F.col("ns.shingle") == F.col("hs.shingle")),
            )
            .groupBy("new_id", "hist_id")
            .agg(F.count(F.lit(1)).alias("i"))
        )
        dup_new = (
            inter.join(n_sz.withColumnRenamed("doc_id", "new_id"), "new_id")
            .join(h_sz.withColumnRenamed("doc_id", "hist_id"), "hist_id")
            .where(
                F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i")).cast("double")
                >= threshold
            )
            .select(F.col("new_id").alias(id_col))
            .distinct()
        )
        survivors = batch_kept.join(dup_new, id_col, "left_anti")
    else:
        survivors = batch_kept
    survivors = survivors.persist()
    n = survivors.count()
    if n:
        survivors.write.mode("append").parquet(corpus_path)
        surv_ids = survivors.select(id_col)
        new_buckets.join(surv_ids, "doc_id", "left_semi").write.mode("append").parquet(buckets_path)
        new_shingles.join(surv_ids, "doc_id", "left_semi").write.mode("append").parquet(shingles_path)
    survivors.unpersist()
    new_buckets.unpersist()
    new_shingles.unpersist()
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
