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

Atomicity (round-3 fix — the previous version did two independent
`mode("append")` writes, so a crash between the corpus append and the
seen append left rows whose hashes were unknown to history, and the
replayed batch re-ingested them as duplicates): every increment now uses
the txn_sink marker protocol across ALL its tables at once —

- each output stages under ``<table>/inc=<token>/`` (overwrite mode, so a
  replayed increment re-stages the same dirs instead of appending);
- ONE marker ``<seen|index>/_commits/<token>`` is created only after every
  table of the increment is fully written (atomic file create);
- a replayed increment whose marker exists returns 0 without writing;
- history reads (the anti-join / LSH-probe side) take only committed
  increments, so a half-staged crash can never leak into dedup decisions.

``<token>`` is the streaming micro-batch id when driven by foreachBatch,
else a content digest (row count + bit_xor of the 60-bit text hashes) —
deterministic across replays of the same batch.  The ``inc=<token>``
partition-style layout keeps plain ``spark.read.parquet(corpus)`` working
(the increment id surfaces as a partition column, the standard
ingest-increment partitioning of production corpora).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_long, seeded_md5_long


def _commits_dir(txn_root: str) -> str:
    return os.path.join(txn_root, "_commits")


def _committed_tokens(txn_root: str) -> list[str]:
    d = _commits_dir(txn_root)
    if not os.path.isdir(d):
        return []
    return sorted(os.listdir(d))


def _write_marker(txn_root: str, token: str) -> None:
    """Single atomic commit point for every table of one increment."""
    os.makedirs(_commits_dir(txn_root), exist_ok=True)
    with open(os.path.join(_commits_dir(txn_root), token), "w"):
        pass


def _committed_paths(table_path: str, tokens: list[str]) -> list[str]:
    """Existing staged dirs among committed tokens (an empty increment
    commits a marker but stages no dir)."""
    out = []
    for t in tokens:
        p = os.path.join(table_path, f"inc={t}")
        if os.path.isdir(p):
            out.append(p)
    return out


def _content_token(hashed: DataFrame, hash_col: str = "_h") -> str:
    """Deterministic increment id from batch content: row count + bit_xor
    of the 60-bit text hashes (order-independent).  Collision odds are the
    same ~2^-60 class as the exact-dedup hash itself."""
    row = hashed.agg(
        F.count(F.lit(1)).alias("c"), F.expr(f"bit_xor({hash_col})").alias("x")
    ).collect()[0]
    return f"{row.c}x{(row.x or 0) & 0xFFFFFFFFFFFFFFFF:016x}"


def ingest_increment(
    spark: SparkSession,
    batch: DataFrame,
    corpus_path: str,
    seen_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    increment_id: int | str | None = None,
) -> int:
    """Dedup `batch` against history and itself, append survivors
    atomically (marker-committed — see module docstring).  Returns the
    number of newly ingested rows; 0 for an already-committed replay."""
    hashed = batch.withColumn("_h", md5_long(F.col(text_col)))
    token = str(increment_id) if increment_id is not None else _content_token(hashed)
    committed = _committed_tokens(seen_path)
    if token in committed:
        return 0  # replayed increment: fully committed, nothing to do
    # in-batch exact dedup first (keep min id per hash), then anti vs history
    keepers = (
        hashed.groupBy("_h")
        .agg(F.min(id_col).alias("_keep"))
        .select(F.col("_h").alias("_kh"), F.col("_keep"))
    )
    firsts = hashed.join(
        keepers, (F.col("_h") == F.col("_kh")) & (F.col(id_col) == F.col("_keep"))
    ).drop("_kh", "_keep")
    seen_dirs = _committed_paths(seen_path, committed)
    if seen_dirs:
        seen = spark.read.parquet(*seen_dirs).select(F.col("h").alias("_seen_h"))
        fresh = firsts.join(seen, firsts["_h"] == seen["_seen_h"], "left_anti")
    else:
        fresh = firsts
    fresh = fresh.persist()
    try:
        n = fresh.count()
        if n:
            # stage both tables under the SAME token, overwrite-mode (replay-safe)
            fresh.drop("_h").write.mode("overwrite").parquet(
                os.path.join(corpus_path, f"inc={token}")
            )
            fresh.select(F.col("_h").alias("h")).write.mode("overwrite").parquet(
                os.path.join(seen_path, f"inc={token}")
            )
    finally:
        fresh.unpersist()
    _write_marker(seen_path, token)  # single commit point for the pair
    return n


def ingest_increment_neardup(
    spark: SparkSession,
    batch: DataFrame,
    corpus_path: str,
    index_path: str,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    increment_id: int | str | None = None,
) -> int:
    """Incremental NEAR-duplicate ingest: drop batch docs that are
    near-dups (Jaccard >= threshold) of anything already ingested, then
    append survivors and extend the persistent LSH index — all tables of
    the increment committed by one marker (see module docstring).

    The index is two parquet tables under ``index_path`` — exactly what a
    production LSH index materializes:
      buckets/  (doc_id, band, band_hash)   candidate probe surface
      shingles/ (doc_id, shingle)           verification surface
    New-batch candidates probe history buckets (equi-join on 8-byte keys),
    exact Jaccard verifies against history shingles only for candidates.
    In-batch near-dups are resolved first (keep min doc_id per pair).
    Returns the number of ingested docs; 0 for a committed replay.
    """
    from ..operators import dedup

    buckets_path = os.path.join(index_path, "buckets")
    shingles_path = os.path.join(index_path, "shingles")

    if increment_id is not None:
        token = str(increment_id)
    else:
        token = _content_token(batch.select(md5_long(F.col(text_col)).alias("_h")))
    committed = _committed_tokens(index_path)
    if token in committed:
        return 0

    # resolve in-batch near-dups: drop the higher id of each pair
    in_batch_pairs = dedup.ngram_jaccard_pairs(batch, threshold=threshold)
    drop_in_batch = in_batch_pairs.select(F.col("doc_id_b").alias(id_col)).distinct()
    batch_kept = batch.join(drop_in_batch, id_col, "left_anti")

    new_shingles = dedup.shingle_table(batch_kept).persist()
    sigs = dedup.signatures_from_shingles(new_shingles)
    new_buckets = dedup.minhash_band_buckets(sigs).persist()
    try:
        return _ingest_neardup_inner(
            spark, batch_kept, new_buckets, new_shingles, corpus_path, index_path,
            buckets_path, shingles_path, committed, token, threshold, id_col,
        )
    finally:
        new_buckets.unpersist()
        new_shingles.unpersist()


def _ingest_neardup_inner(
    spark: SparkSession,
    batch_kept: DataFrame,
    new_buckets: DataFrame,
    new_shingles: DataFrame,
    corpus_path: str,
    index_path: str,
    buckets_path: str,
    shingles_path: str,
    committed: set,
    token: str,
    threshold: float,
    id_col: str,
) -> int:
    hist_bucket_dirs = _committed_paths(buckets_path, committed)
    hist_shingle_dirs = _committed_paths(shingles_path, committed)
    if hist_bucket_dirs:
        hist_buckets = spark.read.parquet(*hist_bucket_dirs)
        hist_shingles = spark.read.parquet(*hist_shingle_dirs)
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
    try:
        n = survivors.count()
        if n:
            surv_ids = survivors.select(id_col)
            survivors.write.mode("overwrite").parquet(os.path.join(corpus_path, f"inc={token}"))
            new_buckets.join(surv_ids, "doc_id", "left_semi").write.mode("overwrite").parquet(
                os.path.join(buckets_path, f"inc={token}")
            )
            new_shingles.join(surv_ids, "doc_id", "left_semi").write.mode("overwrite").parquet(
                os.path.join(shingles_path, f"inc={token}")
            )
    finally:
        survivors.unpersist()
    _write_marker(index_path, token)  # single commit point for all three
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
    Restart-safe two ways: a replayed batch whose marker exists is a
    no-op, and a batch that crashed mid-stage re-stages the same
    ``inc=<batch_id>`` dirs (overwrite) before committing — so the corpus
    stays duplicate-free under any kill point."""
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        ingest_increment(
            batch_df.sparkSession,
            batch_df,
            corpus_path,
            seen_path,
            text_col,
            id_col,
            increment_id=batch_id,
        )

    return (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def ingest_increment_segments(
    spark: SparkSession,
    batch: DataFrame,
    corpus_path: str,
    segindex_path: str,
    seg_words: int = 10,
    max_df: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    increment_id: int | str | None = None,
) -> int:
    """Cross-run LINE-LEVEL dedup: clean each new batch against the
    accumulated segment history, not just against itself.

    :func:`~..operators.dedup.segment_dedup` drops boilerplate segments
    recurring WITHIN one corpus snapshot; a continuously-ingesting
    pipeline needs the same decision against every PREVIOUS run (the
    site template that appeared in last night's crawl must be dropped
    from tonight's too).  Shape:

      new batch → disjoint segments + 60-bit hashes (one shuffle) →
      df-count vs (history ∪ this batch) segment index → drop over-cap
      segments → reassemble clean_text → append cleaned docs to the
      corpus and this batch's (seg hash, doc count) rows to the index.

    The index carries only 8-byte hashes + counts (tiny vs the corpus);
    history reads take committed increments only, and the corpus/index
    pair commits under ONE marker — same atomicity protocol as
    :func:`ingest_increment`.  Returns ingested row count (0 for a
    committed replay).
    """
    # segment the batch once (operators/dedup.segment_dedup's split
    # algebra, inlined so the df decision can blend history counts);
    # hash per (doc, seg) for the history comparison
    from ..functions.hashing import md5_long as _md5

    w = batch.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"),
    )
    seg = (
        w.groupBy("doc_id", F.floor(F.col("pos") / seg_words).alias("seg"))
        .agg(F.collect_list(F.struct("pos", "word")).alias("pw"))
        .select(
            "doc_id",
            "seg",
            F.array_join(F.expr("transform(array_sort(pw), s -> s.word)"), " ").alias("segment"),
        )
        .select("doc_id", "seg", "segment", _md5(F.col("segment")).alias("seg_hash"))
    )
    token = str(increment_id) if increment_id is not None else _content_token(
        seg.select(F.col("seg_hash").alias("_h")), "_h"
    )
    committed = _committed_tokens(segindex_path)
    if token in committed:
        return 0
    batch_df = seg.groupBy("seg_hash").agg(F.count_distinct("doc_id").alias("df"))
    index_dirs = _committed_paths(segindex_path, committed)
    if index_dirs:
        hist = spark.read.parquet(*index_dirs).groupBy("seg_hash").agg(F.sum("df").alias("df"))
        total_df = (
            batch_df.unionByName(hist)
            .groupBy("seg_hash")
            .agg(F.sum("df").alias("df"))
        )
    else:
        total_df = batch_df
    boilerplate = total_df.where(F.col("df") > max_df).select("seg_hash")
    kept = seg.join(F.broadcast(boilerplate), "seg_hash", "left_anti")
    totals = seg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_segments"))
    rebuilt = (
        kept.groupBy("doc_id")
        .agg(F.collect_list(F.struct("seg", "segment")).alias("ss"))
        .select(
            "doc_id",
            F.size("ss").alias("n_kept"),
            F.array_join(F.expr("transform(array_sort(ss), s -> s.segment)"), " ").alias("clean_text"),
        )
    )
    cleaned = (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_segments",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
        .persist()
    )
    try:
        n = cleaned.count()
        if n:
            cleaned.write.mode("overwrite").parquet(os.path.join(corpus_path, f"inc={token}"))
            batch_df.write.mode("overwrite").parquet(os.path.join(segindex_path, f"inc={token}"))
    finally:
        cleaned.unpersist()
    _write_marker(segindex_path, token)
    return n


def ingest_increment_winnow(
    spark: SparkSession,
    batch: DataFrame,
    corpus_path: str,
    fpindex_path: str,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    increment_id: int | str | None = None,
) -> int:
    """Cross-run PARTIAL-OVERLAP dedup: reject a new document when most
    of its content already exists anywhere in ingestion history, even
    inside longer, otherwise-different documents.

    The exact-hash ingest misses re-posts with an added preamble; the
    LSH ingest misses low-Jaccard containment (a doc quoted whole inside
    a longer one).  Winnowing closes both: any shared substring of
    >= k+w-1 chars shares a fingerprint, so

      new batch → winnow fingerprints (one shuffle, ~len/w rows/doc) →
      per-doc overlap = |fps ∩ history| / |fps| via a fp-keyed join
      against the accumulated index → docs at/above ``threshold`` are
      dropped as already-known content → survivors append to the corpus,
      their DISTINCT fingerprints to the index.

    The index carries only 8-byte fingerprints (~|corpus chars|/w rows —
    w-fold smaller than a full substring index); history reads take
    committed increments only, and corpus+index commit under ONE marker
    (the :func:`ingest_increment` atomicity protocol: staged ``inc=<token>``
    dirs, marker create after both writes, replay short-circuit).
    Within-batch containment is the batch operator's job
    (operators/dedup.winnow_overlap_pairs); this gate is strictly
    batch-vs-history.  Returns ingested row count (0 for a replay).
    """
    from ..operators.text_analysis import winnow_fingerprints

    # replay token from the RAW text hashes (the sibling ingests' rule),
    # never from the fingerprint set: fingerprints are lossy — every
    # doc under k chars yields none, so two distinct all-short batches
    # would collide on the empty-set token and the second would be
    # silently skipped as a replay (round-6 review finding)
    token = str(increment_id) if increment_id is not None else _content_token(
        batch.select(md5_long(F.col(text_col)).alias("_h")), "_h"
    )
    committed = _committed_tokens(fpindex_path)
    if token in committed:
        return 0
    index_dirs = _committed_paths(fpindex_path, committed)
    # the fingerprint DAG (per-char hash + window shuffle) is the
    # increment's dominant cost and feeds three consumers (sizes,
    # history probe, index append) — persist for the call like the
    # sibling ingests persist their hash tables
    fp = winnow_fingerprints(batch, text_col=text_col, id_col=id_col).persist()
    try:
        sizes = fp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        if index_dirs:
            hist = spark.read.parquet(*index_dirs).select("fp").distinct()
            shared = (
                fp.join(hist, "fp", "left_semi")
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("shared"))
            )
        else:
            shared = sizes.select("doc_id", F.lit(0).cast("long").alias("shared"))
        overlap = (
            sizes.join(shared, "doc_id", "left")
            .select(
                "doc_id",
                (
                    F.coalesce("shared", F.lit(0)).cast("double") / F.col("n").cast("double")
                ).alias("overlap"),
            )
        )
        drop = overlap.where(F.col("overlap") >= threshold).select("doc_id").persist()
        survivors = batch.join(drop, batch[id_col] == drop["doc_id"], "left_anti").persist()
        try:
            n = survivors.count()
            if n:
                survivors.write.mode("overwrite").parquet(
                    os.path.join(corpus_path, f"inc={token}")
                )
                new_fps = fp.join(drop, "doc_id", "left_anti").select("fp").distinct()
                new_fps.write.mode("overwrite").parquet(
                    os.path.join(fpindex_path, f"inc={token}")
                )
        finally:
            survivors.unpersist()
            drop.unpersist()
    finally:
        fp.unpersist()
    _write_marker(fpindex_path, token)
    return n


def ingest_increment_embedding(
    spark: SparkSession,
    batch: DataFrame,
    corpus_path: str,
    sigindex_path: str,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    increment_id: int | str | None = None,
) -> int:
    """Cross-run SEMANTIC dedup for embedding streams: reject a new
    vector when ingestion history already holds a near-duplicate
    (cosine >= ``threshold``) — the incremental counterpart of
    :func:`operators.similarity.semantic_dedup`, for the pipeline where
    embeddings arrive run by run (nightly encodes of a rolling crawl)
    and paraphrased re-posts defeat every text-hash gate.

    The persistent index is ONE parquet table under ``sigindex_path``:
    (vec_id, bucket, qv) — the hyperplane-LSH signature surface
    (operators/similarity.lsh_bucket_table), 8-byte bucket keys for the
    candidate equi-join plus the quantized vector for exact in-bucket
    cosine verification.  Flow per increment:

      new batch → signatures (map-only sign matmul, no shuffle) →
      in-batch near-dups resolved first (min-id keeps, the
      semantic_dedup rule) → candidates = bucket equi-join vs committed
      history → exact quantized cosine >= threshold drops the new vector
      → survivors append to the corpus, their signatures to the index.

    Same marker-atomic commit protocol as the sibling ingests (staged
    ``inc=<token>`` dirs, ONE marker for both tables, replay
    short-circuit); recall < 1 by LSH design — the knob is n_planes
    (plan_planes), exactly as documented for lsh_neardup_pairs.
    Returns ingested row count (0 for a committed replay).
    """
    from ..functions.vector import cosine_q, quantize
    from ..operators.similarity import lsh_bucket_table

    # replay token from the full quantized content (id + components):
    # embeddings have no text to hash, and id alone would misread a
    # re-encode (same ids, new vectors) as a replay
    row_hash = md5_long(
        F.concat_ws(
            ",",
            F.col(id_col).cast("string"),
            F.concat_ws(",", F.transform(quantize(vec_col), lambda x: x.cast("string"))),
        )
    )
    token = str(increment_id) if increment_id is not None else _content_token(
        batch.select(row_hash.alias("_h")), "_h"
    )
    committed = _committed_tokens(sigindex_path)
    if token in committed:
        return 0
    index_dirs = _committed_paths(sigindex_path, committed)

    sig = lsh_bucket_table(batch, id_col=id_col, vec_col=vec_col).persist()
    try:
        # in-batch: min-id representative per near-dup neighborhood
        a, b = sig.alias("a"), sig.alias("b")
        in_batch = (
            a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
            .where(cosine_q(F.col("a.qv"), F.col("b.qv")) >= F.lit(threshold))
            .select(F.col("b.id").alias("id"))
            .distinct()
        )
        kept = sig.join(in_batch, "id", "left_anti")
        if index_dirs:
            hist = spark.read.parquet(*index_dirs).select(
                F.col("bucket").alias("h_bucket"), F.col("qv").alias("h_qv")
            )
            dup_new = (
                kept.join(hist, kept["bucket"] == hist["h_bucket"])
                .where(cosine_q(F.col("qv"), F.col("h_qv")) >= F.lit(threshold))
                .select("id")
                .distinct()
            )
            surv_sig = kept.join(dup_new, "id", "left_anti").persist()
        else:
            surv_sig = kept.persist()
        try:
            surv_ids = surv_sig.select(F.col("id").alias(id_col))
            survivors = batch.join(surv_ids, id_col, "left_semi")
            n = survivors.count()
            if n:
                survivors.write.mode("overwrite").parquet(
                    os.path.join(corpus_path, f"inc={token}")
                )
                surv_sig.select(F.col("id").alias(id_col), "bucket", "qv").write.mode(
                    "overwrite"
                ).parquet(os.path.join(sigindex_path, f"inc={token}"))
        finally:
            surv_sig.unpersist()
    finally:
        sig.unpersist()
    _write_marker(sigindex_path, token)
    return n


def incremental_embedding_ingest(
    spark: SparkSession,
    source_dir: str,
    corpus_path: str,
    sigindex_path: str,
    checkpoint: str,
    schema,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Streaming wrapper for :func:`ingest_increment_embedding`: embedding
    file stream → foreachBatch semantic gate → marker-atomic corpus +
    signature-index increments.  Same restart contract as
    :func:`incremental_dedup_ingest` — a replayed batch's marker makes it
    a no-op, a mid-stage crash re-stages the same ``inc=<batch_id>``
    dirs before committing."""
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        ingest_increment_embedding(
            batch_df.sparkSession,
            batch_df,
            corpus_path,
            sigindex_path,
            threshold=threshold,
            id_col=id_col,
            vec_col=vec_col,
            increment_id=batch_id,
        )

    return (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def ingest_increment_phash(
    spark: SparkSession,
    batch: DataFrame,
    corpus_path: str,
    phindex_path: str,
    max_hamming: int | None = None,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    increment_id: int | str | None = None,
) -> int:
    """Cross-run PERCEPTUAL dedup for media streams: reject a new media
    row whose perceptual hash is within ``max_hamming`` bits of anything
    already ingested — the media counterpart of the text and embedding
    ingest gates (re-encoded or lightly-edited copies of yesterday's
    images share most pHash nibbles; exact byte hashing sees none of
    that).

    The persistent index is ONE parquet table under ``phindex_path``:
    (doc_id, phash).  Per increment: Arrow-batched pHash of the payloads
    (operators/multimodal.phash_table) → in-batch near-dups resolved to
    the min id via the banded candidate join → history candidates from a
    band equi-join (each 60-bit hash explodes into 5 x 12-bit bands, so
    the batch never cross-joins history) → exact bit_count(xor) verify →
    survivors append to the corpus, their hashes to the index.  Same
    marker-atomic commit protocol as the sibling ingests; the replay
    token hashes the payload bytes, so a re-encode (same ids, new bytes)
    is a new increment.  Fixed-grid limitation documented at the
    operator: same-length edits land near, insertions need the winnow
    gate.

    Both band joins carry the LSH mega-bucket guard (``max_bucket``,
    minhash's mandatory cap): the in-batch pass reuses the capped
    grouped-bucket candidate plan, and the vs-history equi-join drops
    over-populated (band_idx, band_val) buckets on BOTH sides first —
    degenerate media (solid fills, black frames) otherwise concentrate
    one bucket and the join goes |batch-bucket|×|hist-bucket| quadratic.
    The heavy-bucket sets are broadcast anti-joins: zipfian media makes
    them tiny (heavy hitters only), same shape as the shingle df-cap.
    """
    from ..operators.multimodal import (
        PHASH_BANDS,
        PHASH_MAX_BUCKET,
        PHASH_MAX_HAMMING,
        _phash_candidates_from_hashes,
        phash_table,
    )

    if max_hamming is None:
        max_hamming = PHASH_MAX_HAMMING

    token = str(increment_id) if increment_id is not None else _content_token(
        batch.select(md5_long(F.hex(F.col(payload_col))).alias("_h")), "_h"
    )
    committed = _committed_tokens(phindex_path)
    if token in committed:
        return 0
    index_dirs = _committed_paths(phindex_path, committed)

    def bands_of(df: DataFrame, id_out: str, ph_out: str) -> DataFrame:
        return df.select(
            F.col("doc_id").alias(id_out),
            F.col("phash").alias(ph_out),
            F.explode(F.sequence(F.lit(0), F.lit(PHASH_BANDS - 1))).alias("band_idx"),
        ).withColumn("band_val", F.expr(f"shiftright({ph_out}, band_idx * 12) & 4095"))

    def cap_buckets(bands: DataFrame, max_bucket: int = PHASH_MAX_BUCKET) -> DataFrame:
        """Drop rows in over-populated (band_idx, band_val) buckets — the
        mega-bucket guard as a broadcast anti-join against the (tiny,
        heavy-hitters-only) over-cap set."""
        heavy = (
            bands.groupBy("band_idx", "band_val")
            .agg(F.count(F.lit(1)).alias("pop"))
            .where(F.col("pop") > max_bucket)
            .select("band_idx", "band_val")
        )
        return bands.join(F.broadcast(heavy), ["band_idx", "band_val"], "left_anti")

    media = batch.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    ph = phash_table(media).persist()
    try:
        in_batch = (
            _phash_candidates_from_hashes(ph)
            .where(F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))) <= F.lit(max_hamming))
            .select(F.col("doc_id_b").alias("doc_id"))
            .distinct()
        )
        kept = ph.join(in_batch, "doc_id", "left_anti")
        if index_dirs:
            hist = cap_buckets(
                bands_of(spark.read.parquet(*index_dirs), "hist_id", "ph_hist")
            )
            dup_new = (
                cap_buckets(bands_of(kept, "doc_id", "ph_new"))
                .join(hist, ["band_idx", "band_val"])
                .where(
                    F.bit_count(F.col("ph_new").bitwiseXOR(F.col("ph_hist")))
                    <= F.lit(max_hamming)
                )
                .select("doc_id")
                .distinct()
            )
            surv_ph = kept.join(dup_new, "doc_id", "left_anti").persist()
        else:
            surv_ph = kept.persist()
        try:
            surv_ids = surv_ph.select("doc_id")
            survivors = batch.join(
                surv_ids.withColumnRenamed("doc_id", id_col), id_col, "left_semi"
            )
            n = survivors.count()
            if n:
                survivors.write.mode("overwrite").parquet(
                    os.path.join(corpus_path, f"inc={token}")
                )
                surv_ph.write.mode("overwrite").parquet(
                    os.path.join(phindex_path, f"inc={token}")
                )
        finally:
            surv_ph.unpersist()
    finally:
        ph.unpersist()
    _write_marker(phindex_path, token)
    return n


def ingest_increment_contamination(
    spark: SparkSession,
    batch: DataFrame,
    corpus_path: str,
    eval_docs: DataFrame,
    n: int | None = None,
    threshold: float | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    increment_id: int | str | None = None,
) -> int:
    """Ingest-time DECONTAMINATION gate: reject any new document whose
    n-gram overlap with a FIXED eval benchmark reaches the contamination
    threshold, so leaked test content never enters the training corpus —
    the streaming complement of the batch pass (operators/curation.
    decontaminated_corpus), which can only scrub what already landed.

    Unlike the sibling ingests there is NO growing index: the reference
    set is the benchmark itself, fixed-size by construction, so the
    per-increment plan is exactly the batch contamination plan — batch
    docs explode to distinct n-grams once, the eval n-gram table
    broadcasts (bounded side), hits aggregate per (doc, eval_doc), and
    flagged ids anti-join out.  Survivors append under the same
    marker-atomic ``inc=<token>`` protocol as every other ingest
    (staged dir, marker after write, replay short-circuit on the
    content token).  Returns ingested row count (0 for a replay).
    """
    from ..operators.curation import (
        CONTAMINATION_NGRAM,
        CONTAMINATION_THRESHOLD,
        contamination_pairs,
    )

    if n is None:
        n = CONTAMINATION_NGRAM
    if threshold is None:
        threshold = CONTAMINATION_THRESHOLD

    token = str(increment_id) if increment_id is not None else _content_token(
        batch.select(md5_long(F.col(text_col)).alias("_h")), "_h"
    )
    committed = _committed_tokens(corpus_path)
    if token in committed:
        return 0
    contaminated = (
        contamination_pairs(
            batch, eval_docs, n=n, threshold=threshold, text_col=text_col, id_col=id_col
        )
        .select("doc_id")
        .distinct()
    )
    survivors = batch.join(
        contaminated.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    ).persist()
    try:
        cnt = survivors.count()
        if cnt:
            survivors.write.mode("overwrite").parquet(
                os.path.join(corpus_path, f"inc={token}")
            )
    finally:
        survivors.unpersist()
    _write_marker(corpus_path, token)
    return cnt


def incremental_contamination_ingest(
    spark: SparkSession,
    source_dir: str,
    corpus_path: str,
    eval_docs: DataFrame,
    checkpoint: str,
    schema,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files_per_trigger: int | None = None,
):
    """Streaming wrapper for :func:`ingest_increment_contamination`:
    document file stream → foreachBatch decontamination gate against the
    FIXED eval benchmark → marker-atomic corpus increments.  Same restart
    contract as :func:`incremental_dedup_ingest` — a replayed batch's
    marker makes it a no-op, a mid-stage crash re-stages the same
    ``inc=<batch_id>`` dir before committing."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        ingest_increment_contamination(
            batch_df.sparkSession,
            batch_df,
            corpus_path,
            eval_docs,
            text_col=text_col,
            id_col=id_col,
            increment_id=batch_id,
        )

    return (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def ingest_increment_hll(
    spark: SparkSession,
    batch: DataFrame,
    sketch_path: str,
    key_col: str,
    increment_id: int | str | None = None,
) -> int:
    """Cross-RUN HyperLogLog: persist this increment's 1024-register
    sketch under ``inc=<token>`` with the family's marker-atomic commit,
    so a corpus ingested over many runs keeps a running distinct-count
    sketch without ever re-scanning history.  Register max-merge is
    idempotent, so a replayed increment (marker present) is a no-op and
    a crash between stage and marker re-stages the same dir (overwrite)
    — the merged sketch can never double-count or tear.

    Returns the number of register rows staged (0 for a replay).
    """
    from ..operators.sketches import hll_register_updates

    hashed = batch.withColumn("_h", md5_long(F.col(key_col)))
    token = str(increment_id) if increment_id is not None else _content_token(hashed)
    committed = _committed_tokens(sketch_path)
    if token in committed:
        return 0
    regs = (
        hll_register_updates(batch.select(key_col), key_col)
        .groupBy("reg")
        .agg(F.max("rho").alias("m_j"))
    )
    regs.write.mode("overwrite").parquet(os.path.join(sketch_path, f"inc={token}"))
    _write_marker(sketch_path, token)
    return spark.read.parquet(os.path.join(sketch_path, f"inc={token}")).count()


def hll_merged_registers(spark: SparkSession, sketch_path: str) -> DataFrame:
    """Union committed increments' registers, max-merge — <= 1024 rows
    per increment in, <= 1024 rows out; uncommitted stage dirs are
    invisible (the family's read rule)."""
    paths = _committed_paths(sketch_path, _committed_tokens(sketch_path))
    return (
        spark.read.parquet(*paths).groupBy("reg").agg(F.max("m_j").alias("m_j"))
    )


def incremental_hll_ingest(
    spark: SparkSession,
    source_dir: str,
    sketch_path: str,
    checkpoint: str,
    schema,
    key_col: str,
    max_files_per_trigger: int = 1,
):
    """Streaming wrapper: file stream → foreachBatch(ingest_increment_hll)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        ingest_increment_hll(
            batch_df.sparkSession, batch_df, sketch_path, key_col, increment_id=batch_id
        )

    return (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def ingest_increment_bloom(
    spark: SparkSession,
    batch: DataFrame,
    corpus_path: str,
    seen_path: str,
    bloom_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    increment_id: int | str | None = None,
) -> int:
    """Bloom-PREFILTERED exact-dedup ingest — the production pattern for
    continuous dedup at scale: a bounded (<= BLOOM_M rows) set-bit table
    answers "definitely never seen" for most of each batch WITHOUT
    touching the ever-growing seen-hash history; only the bloom-claimed
    minority pays the exact anti-join.  Bloom false negatives are
    structurally impossible, so the ingested corpus is IDENTICAL to the
    plain ingest_increment result — the sketch buys speed, never
    correctness (the false-positive rate only moves rows onto the exact
    path).

    Three tables stage under one token — corpus rows, seen hashes, and
    the new hashes' bloom positions — and the single marker in
    ``seen_path`` commits all three atomically; replays are no-ops and a
    crash before the marker leaves every stage dir invisible.

    Returns the number of newly ingested rows (0 for a replay).
    """
    from ..operators.sketches import BLOOM_K, BLOOM_M

    hashed = batch.withColumn("_h", md5_long(F.col(text_col)))
    token = str(increment_id) if increment_id is not None else _content_token(hashed)
    committed = _committed_tokens(seen_path)
    if token in committed:
        return 0
    keepers = (
        hashed.groupBy("_h")
        .agg(F.min(id_col).alias("_keep"))
        .select(F.col("_h").alias("_kh"), F.col("_keep"))
    )
    firsts = hashed.join(
        keepers, (F.col("_h") == F.col("_kh")) & (F.col(id_col) == F.col("_keep"))
    ).drop("_kh", "_keep")

    def positions(df: DataFrame) -> DataFrame:
        return df.select(
            "_h",
            F.explode(
                F.array(
                    *[(seeded_md5_long(F.col("_h"), s) % F.lit(BLOOM_M)) for s in range(BLOOM_K)]
                )
            ).alias("pos"),
        )

    bloom_dirs = _committed_paths(bloom_path, committed)
    if bloom_dirs:
        bits = spark.read.parquet(*bloom_dirs).select("pos").distinct().withColumn(
            "_set", F.lit(1)
        )
        probe = (
            positions(firsts.select("_h").distinct())
            .join(bits, "pos", "left")
            .groupBy("_h")
            .agg(F.min(F.coalesce(F.col("_set"), F.lit(0))).alias("_all_set"))
        )
        firsts = firsts.join(probe, "_h")
        fast = firsts.where(F.col("_all_set") == 0).drop("_all_set")
        suspect = firsts.where(F.col("_all_set") == 1).drop("_all_set")
        seen = spark.read.parquet(*_committed_paths(seen_path, committed)).select(
            F.col("h").alias("_seen_h")
        )
        slow = suspect.join(seen, suspect["_h"] == seen["_seen_h"], "left_anti")
        fresh = fast.unionByName(slow)
    else:
        fresh = firsts
    fresh = fresh.persist()
    try:
        n = fresh.count()
        if n:
            fresh.drop("_h").write.mode("overwrite").parquet(
                os.path.join(corpus_path, f"inc={token}")
            )
            fresh.select(F.col("_h").alias("h")).write.mode("overwrite").parquet(
                os.path.join(seen_path, f"inc={token}")
            )
            positions(fresh.select("_h").distinct()).select("pos").distinct().write.mode(
                "overwrite"
            ).parquet(os.path.join(bloom_path, f"inc={token}"))
    finally:
        fresh.unpersist()
    _write_marker(seen_path, token)
    return n


def incremental_bloom_ingest(
    spark: SparkSession,
    source_dir: str,
    corpus_path: str,
    seen_path: str,
    bloom_path: str,
    checkpoint: str,
    schema,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files_per_trigger: int = 1,
):
    """Streaming wrapper: file stream → foreachBatch(ingest_increment_bloom)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        ingest_increment_bloom(
            batch_df.sparkSession,
            batch_df,
            corpus_path,
            seen_path,
            bloom_path,
            text_col,
            id_col,
            increment_id=batch_id,
        )

    return (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def ingest_increment_fuzzy(
    spark: SparkSession,
    batch: DataFrame,
    corpus_path: str,
    index_path: str,
    max_dist: int = 4,
    max_bucket: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    increment_id: int | str | None = None,
) -> int:
    """Incremental FUZZY-duplicate ingest (round-11; the fuzzy_edit
    family's cross-run variant): drop batch docs whose normalized
    36-char prefix is within Levenshtein ``max_dist`` of an
    EARLIER-SEEN doc, then append survivors and extend the persistent
    band index — all tables of the increment committed by one marker
    (see module docstring).

    The drop rule is "b is dropped iff some doc a with a smaller id was
    seen no later than b and (a, b) is a qualifying fuzzy pair" — b is
    checked against every earlier SEEN doc, kept or dropped, NOT only
    against kept ones (greedy-vs-kept is batch-boundary-dependent:
    in chain a~b, b~c, a!~c, greedy keeps c iff b was dropped first).
    With id-ordered arrival (stage_id_ordered), this equals the batch
    rule "drop every doc_id_b of fuzzy_edit_pairs" — which is exactly
    what the oracle of q104_stream_fuzzy_ingest checks.

    The index is two parquet tables under ``index_path``:
      bands/   (doc_id, pfx, band_idx, band_val)  — ALL seen long-prefix
               docs' positional band keys (the probe surface)
      retired/ (band_idx, band_val) — keys whose cumulative occupancy
               crossed FUZZY_MAX_BUCKET; they generate no candidates in
               any later increment (the forward work bound)
    Per-increment cost: history bands are touched ONLY via a semi-join
    on the batch's band keys, so the probe reads ~|batch| x occupancy,
    never O(|history|).  Candidate generation + levenshtein verify is
    the IDENTICAL plan as the batch operator
    (dedup.fuzzy_pairs_from_bands) over batch ∪ matching-history bands.
    At scale the accumulated inc dirs fold into a bucketed base via
    maintenance.compact_fuzzy_bands_to_bucketed (base+delta: the probe's
    history side is then read in place with zero exchange — plan-asserted
    in tests/test_scale_ops.py).

    Cap-semantics caveat (documented divergence, the fixed-grid class):
    the batch oracle's mega-bucket cap is evaluated on FINAL corpus
    occupancy, the ingest retires a key from the increment where its
    cumulative occupancy first crosses the cap — the two agree exactly
    whenever no key crosses the cap mid-stream (max observed occupancy
    in the test corpora is 13 vs the 1024 cap; both sides degrade only
    on pathological shared boilerplate, which is exact-dedup's job).

    Returns the number of ingested docs; 0 for a committed replay.
    """
    from ..operators import dedup

    bands_path = os.path.join(index_path, "bands")
    retired_path = os.path.join(index_path, "retired")

    if increment_id is not None:
        token = str(increment_id)
    else:
        token = _content_token(batch.select(md5_long(F.col(text_col)).alias("_h")))
    committed = _committed_tokens(index_path)
    if token in committed:
        return 0

    if max_bucket is None:
        max_bucket = dedup.FUZZY_MAX_BUCKET
    pfx = dedup.fuzzy_prefix_table(batch, text_col=text_col, id_col=id_col)
    new_bands = dedup.fuzzy_band_table(pfx).persist()
    try:
        hist_dirs = _committed_paths(bands_path, committed)
        retired_dirs = _committed_paths(retired_path, committed)
        # persist: retired feeds three anti-joins per increment (probe
        # keys, pair-gen buckets, newly_retired) — without it the
        # one-dir-per-increment listing + distinct re-runs each time
        retired = (
            spark.read.parquet(*retired_dirs)
            .select("band_idx", "band_val")
            .distinct()
            .persist()
            if retired_dirs
            else None
        )
        # retired keys leave the probe BEFORE the history semi-join —
        # this is where the forward work bound is realized: a mega-key's
        # ever-growing history rows are never read again (the cap filter
        # inside fuzzy_pairs_from_bands would discard its bucket anyway,
        # result-unchanged, but only AFTER shuffling + collecting it —
        # review r11)
        batch_keys = new_bands.select("band_idx", "band_val").distinct()
        if retired is not None:
            batch_keys = batch_keys.join(retired, ["band_idx", "band_val"], "left_anti")
        if hist_dirs:
            hist_bands = spark.read.parquet(*hist_dirs)
            # probe surface bounded by the BATCH's band keys — the only
            # history rows read are those sharing a key with the batch
            probe = hist_bands.join(batch_keys, ["band_idx", "band_val"], "left_semi")
            allb = new_bands.unionByName(probe)
        else:
            allb = new_bands
        pairs = dedup.fuzzy_pairs_from_bands(
            allb, max_dist=max_dist, max_bucket=max_bucket, retired=retired
        )
        # only batch docs can be dropped (history rows are committed);
        # a pair's doc_id_b is the larger id, which under id-ordered
        # arrival is always the batch side for cross-run pairs
        drop_ids = (
            pairs.select(F.col("doc_id_b").alias(id_col))
            .distinct()
            .join(batch.select(id_col), id_col, "left_semi")
        )
        survivors = batch.join(drop_ids, id_col, "left_anti").persist()
        try:
            n = survivors.count()
            if n:
                survivors.write.mode("overwrite").parquet(
                    os.path.join(corpus_path, f"inc={token}")
                )
            # index ALL seen band rows (kept AND dropped — the drop rule
            # references every earlier-seen doc)
            new_bands.write.mode("overwrite").parquet(
                os.path.join(bands_path, f"inc={token}")
            )
            # retire keys whose cumulative occupancy crossed the cap:
            # partial-agg'd count over batch ∪ matching-history rows only
            newly_retired = (
                allb.groupBy("band_idx", "band_val")
                .agg(F.count(F.lit(1)).alias("_n"))
                .where(F.col("_n") > max_bucket)
                .select("band_idx", "band_val")
            )
            if retired is not None:
                newly_retired = newly_retired.join(
                    retired, ["band_idx", "band_val"], "left_anti"
                )
            newly_retired.write.mode("overwrite").parquet(
                os.path.join(retired_path, f"inc={token}")
            )
        finally:
            survivors.unpersist()
        _write_marker(index_path, token)  # single commit point for all three
        return n
    finally:
        new_bands.unpersist()
        if retired is not None:
            retired.unpersist()


def incremental_fuzzy_ingest(
    spark: SparkSession,
    source_dir: str,
    corpus_path: str,
    index_path: str,
    checkpoint: str,
    schema,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming wrapper: file stream → foreachBatch(
    ingest_increment_fuzzy).  Restart-safe the same two ways as
    incremental_dedup_ingest: committed replays are no-ops, crashed
    increments re-stage their own ``inc=<batch_id>`` dirs."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        ingest_increment_fuzzy(
            batch_df.sparkSession,
            batch_df,
            corpus_path,
            index_path,
            text_col=text_col,
            id_col=id_col,
            increment_id=batch_id,
        )

    return (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def ingest_increment_bottomk(
    spark: SparkSession,
    batch: DataFrame,
    state_path: str,
    n: int,
    id_col: str = "doc_id",
    increment_id: int | str | None = None,
) -> int:
    """Incremental BOTTOM-K uniform sample over a growing corpus — the
    deterministic reservoir: keep the ``n`` rows with the smallest
    60-bit md5 priority of their id (hash-priority / bottom-k sketch).

    Because "global bottom-k == bottom-k of (previous bottom-k ∪ new
    batch)", the maintained sample is EXACTLY the sample a one-shot
    batch pass would draw, independent of micro-batch boundaries and
    arrival order — which is what the q105 oracle checks (ORDER BY
    hash LIMIT n).  Every row ever seen had the same inclusion
    probability, so the sample is uniform over the full corpus without
    ever rescanning history; per-increment state is n rows, the only
    exchange is a TakeOrdered merge of (n + |batch|) rows.

    Unlike the append-only ingests, each increment REPLACES the state:
    ``state_path/inc=<token>`` holds the complete n-row sample as of
    that increment, committed by the marker; readers take the NEWEST
    committed token (numeric-aware order), and superseded committed
    state dirs are pruned after each commit so on-disk state stays n
    rows (+ the in-flight increment) at any stream lifetime.  Because
    "newest" must be well-defined, tokens must be totally ordered by
    commit time: explicit ``increment_id``s must be non-decreasing
    decimal ints (foreachBatch batch ids are), and the default token is
    a zero-padded commit-sequence number — NOT a content digest, whose
    order is unrelated to commit order (review r11); don't mix the two
    modes on one state dir.  A replayed increment is a no-op; a crash
    before the marker leaves the previous state live.  Returns the
    sample size after the increment.
    """
    committed = _committed_tokens(state_path)
    if increment_id is not None:
        token = str(increment_id)
    else:
        # next in sequence after the newest surviving token (committed
        # markers are pruned with their superseded dirs, so a count
        # would reset and collide; both modes are decimal ints)
        newest = max(committed, key=lambda t: (len(t), t)) if committed else None
        token = f"{(int(newest) if newest is not None else -1) + 1:09d}"
    if token in committed:
        return 0
    prio = md5_long(F.col(id_col)).alias("_priority")
    cand = batch.select(*batch.columns, prio)
    latest = latest_bottomk_dir(state_path)
    if latest:
        cand = cand.unionByName(spark.read.parquet(latest))
    sample = cand.orderBy(F.col("_priority").asc(), F.col(id_col).asc()).limit(n)
    sample.write.mode("overwrite").parquet(os.path.join(state_path, f"inc={token}"))
    _write_marker(state_path, token)
    # prune superseded states AFTER the commit: the new sample subsumes
    # them (bottom-k merge identity), so only the newest dir is ever
    # read again; a crash mid-prune just defers the rest to next time
    import shutil as _shutil

    for t in committed:
        _shutil.rmtree(os.path.join(state_path, f"inc={t}"), ignore_errors=True)
        try:
            os.remove(os.path.join(_commits_dir(state_path), t))
        except FileNotFoundError:
            pass
    return spark.read.parquet(os.path.join(state_path, f"inc={token}")).count()


def latest_bottomk_dir(state_path: str) -> str | None:
    """Newest committed state dir (numeric-aware token order: batch ids
    are decimal strings, so '10' must outrank '9')."""
    tokens = _committed_tokens(state_path)
    if not tokens:
        return None
    newest = max(tokens, key=lambda t: (len(t), t))
    p = os.path.join(state_path, f"inc={newest}")
    return p if os.path.isdir(p) else None


def incremental_bottomk_ingest(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    checkpoint: str,
    schema,
    n: int,
    id_col: str = "doc_id",
):
    """Streaming wrapper: file stream → foreachBatch(
    ingest_increment_bottomk)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        ingest_increment_bottomk(
            batch_df.sparkSession,
            batch_df,
            state_path,
            n,
            id_col=id_col,
            increment_id=batch_id,
        )

    return (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
