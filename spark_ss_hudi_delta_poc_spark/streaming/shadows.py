"""Batch-plan SHADOWS of every streaming registry query — the gate that
closed the round-8 blind spot.

A streaming query executes its DataFrame graph inside micro-batches; its
registry fn returns a post-hoc read-back, so ``explain`` on that return
value shows only the sink scan — the interior that actually runs per
trigger was invisible to the global plan audits, and every audit skipped
``"streaming" in tags``.  Behind that exemption q44 broadcast a
row-per-user dim (streaming/jobs.py round-9 fix) — the exact
corpus-cardinality shape the batch gates ban.

Each shadow builds the SAME DataFrame graph the streaming query plans
per trigger — the same builder functions where the job exposes them
(static_join_agg, session_agg, dup_rate_window_agg, scd2_merge_frames,
…), the same operator primitives otherwise — applied to the batch
tables, with micro-batch sources swapped for table scans and sinks
dropped.  The four global plan gates (cartesian/BNLJ,
partitionless-window, broadcast-certificate, row-at-a-time Python) then
audit streaming interiors exactly like batch plans.

A shadow's contract is PLAN fidelity, not result fidelity: it must
contain every join / aggregate / window / broadcast / Python stage the
live query plans.  tests/test_plans.py::test_every_streaming_query_has_shadow
pins that every streaming-tagged registry query has a shadow.

Micro-batch boundedness: where a live stage consumes "one micro-batch"
(a trigger-bounded slice, e.g. q91's query batches), the shadow
expresses that operational bound as an explicit ``.limit`` so the plan
carries the certificate instead of asking the auditor to trust a
comment.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .jobs import (
    dup_rate_rollup,
    dup_rate_window_agg,
    interval_pair_join,
    late_window_agg,
    latest_incoming,
    roundtrip_battery,
    scd2_merge_frames,
    segment_dim,
    session_agg,
    static_join_agg,
    windowed_value_agg,
)

ShadowFn = Callable[[SparkSession, str], "dict[str, DataFrame]"]


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents")


def _q10(spark, sf_dir):
    return {"agg": _events(spark, sf_dir).groupBy().agg(F.count(F.lit(1)).alias("cnt"))}


def _q12(spark, sf_dir):
    # write side is a pass-through projection; the batch half is the
    # read-back battery
    return {"battery": roundtrip_battery(load(spark, sf_dir, "lineitem"))}


def _q19(spark, sf_dir):
    return {"agg": windowed_value_agg(_events(spark, sf_dir))}


def _q94(spark, sf_dir):
    agg = dup_rate_window_agg(_events(spark, sf_dir))
    return {"window_agg": agg, "rollup": dup_rate_rollup(agg)}


def _q21(spark, sf_dir):
    return {"agg": session_agg(_events(spark, sf_dir))}


def _q31(spark, sf_dir):
    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("cts")
    )
    return {"join": interval_pair_join(purchases, clicks)}


def _q44(spark, sf_dir):
    return {"agg": static_join_agg(_events(spark, sf_dir), segment_dim(spark))}


def _q60(spark, sf_dir):
    from ..operators.maintenance import upsert_snapshot

    incoming = latest_incoming(_events(spark, sf_dir))
    # the accumulated snapshot has the incoming payload's exact schema
    return {
        "incoming": incoming,
        "merge": upsert_snapshot(incoming, incoming, ["user_id"], "ver"),
    }


def _q22(spark, sf_dir):
    return {"dedup": _events(spark, sf_dir).dropDuplicates(["event_id"]).select("event_id")}


def _q66(spark, sf_dir):
    # dropDuplicatesWithinWatermark exists only on streams; its per-batch
    # plan is keyed dedup — the same single exchange on the key
    return {"dedup": _events(spark, sf_dir).dropDuplicates(["event_id"]).select("event_id")}


def _q67(spark, sf_dir):
    # running_topk_stream's prepared projection + salted grouping
    # (stateful.py:272-291); the stateful pandas kernel is replaced by a
    # stub with the live output schema — the plan keeps the
    # Arrow-batched FlatMapGroupsInPandas + single exchange on
    # (grp, salt), which is what the audits inspect
    prepared = (
        _events(spark, sf_dir)
        .select(
            F.col("event_type").cast("string").alias("grp"),
            F.col("user_id").cast("string").alias("item"),
        )
        .withColumn("salt", F.pmod(F.xxhash64("item"), F.lit(8)).cast("int"))
    )

    def stub(pdf):
        return pdf.head(0).assign(cnt=[], seq=[])[["grp", "salt", "item", "cnt", "seq"]]

    out = prepared.groupBy("grp", "salt").applyInPandas(
        stub, "grp string, salt int, item string, cnt long, seq long"
    )
    return {"stateful": out}


def _q90(spark, sf_dir):
    from ..operators.curation import gopher_rules

    flags = gopher_rules(_docs(spark, sf_dir))
    summary = flags.groupBy("keep").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("tot_words"),
        F.sum("n_stop_types").alias("tot_stop_types"),
    )
    return {"flags": flags, "summary": summary}


def _q91(spark, sf_dir):
    from ..operators.similarity import brute_force_topk

    corpus = load(spark, sf_dir, "embeddings")
    # one micro-batch of the query stream: trigger-bounded, expressed as
    # an explicit limit so the plan carries the certificate
    queries = corpus.where(F.col("vec_id") < 20).limit(20)
    return {"serve": brute_force_topk(corpus, queries, k=5)}


def _q92(spark, sf_dir):
    from ..operators.curation import (
        EVAL_MAX_DOCS,
        EVAL_MODULUS,
        contamination_pairs,
    )

    docs = _docs(spark, sf_dir)
    ev = (
        docs.where(F.col("doc_id") % EVAL_MODULUS == 0)
        .orderBy("doc_id")
        .limit(EVAL_MAX_DOCS)
    )
    contaminated = contamination_pairs(docs, ev).select("doc_id").distinct()
    survivors = docs.join(contaminated, "doc_id", "left_anti")
    summary = survivors.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("chars")
    )
    return {"gate": survivors, "summary": summary}


def _hll_regs(spark, sf_dir):
    from ..operators.sketches import hll_register_updates

    return (
        hll_register_updates(_events(spark, sf_dir).select("user_id"), "user_id")
        .groupBy("reg")
        .agg(F.max("rho").alias("m_j"))
    )


def _q95(spark, sf_dir):
    return {"registers": _hll_regs(spark, sf_dir)}


def _q96(spark, sf_dir):
    regs = _hll_regs(spark, sf_dir)
    # the cross-run merge is register-max over unioned increment sketches
    # (incremental.py hll_merged_registers) — constant 1024-key domain
    merged = regs.unionByName(regs).groupBy("reg").agg(F.max("m_j").alias("m_j"))
    return {"registers": regs, "merge": merged}


def _q97(spark, sf_dir):
    # ingest_increment_bloom's interior (incremental.py:936-1028):
    # keep-first-per-hash, bloom-position probe against the bounded
    # (<= BLOOM_M rows) set-bit table, exact anti-join for the claimed
    # minority only
    from ..functions.hashing import md5_long, seeded_md5_long
    from ..operators.sketches import BLOOM_K, BLOOM_M

    docs = _docs(spark, sf_dir)
    hashed = docs.withColumn("_h", md5_long(F.col("text")))
    keepers = (
        hashed.groupBy("_h")
        .agg(F.min("doc_id").alias("_keep"))
        .select(F.col("_h").alias("_kh"), F.col("_keep"))
    )
    firsts = hashed.join(
        keepers, (F.col("_h") == F.col("_kh")) & (F.col("doc_id") == F.col("_keep"))
    ).drop("_kh", "_keep")

    def positions(df):
        return df.select(
            "_h",
            F.explode(
                F.array(
                    *[
                        (seeded_md5_long(F.col("_h"), s) % F.lit(BLOOM_M))
                        for s in range(BLOOM_K)
                    ]
                )
            ).alias("pos"),
        )

    bits = (
        positions(firsts.select("_h").distinct())
        .select("pos")
        .distinct()
        .withColumn("_set", F.lit(1))
    )
    probe = (
        positions(firsts.select("_h").distinct())
        .join(bits, "pos", "left")
        .groupBy("_h")
        .agg(F.min(F.coalesce(F.col("_set"), F.lit(0))).alias("_all_set"))
    )
    joined = firsts.join(probe, "_h")
    seen = hashed.select(F.col("_h").alias("_seen_h")).distinct()
    slow = joined.where(F.col("_all_set") == 1).drop("_all_set").join(
        seen, F.col("_h") == F.col("_seen_h"), "left_anti"
    )
    fresh = joined.where(F.col("_all_set") == 0).drop("_all_set").unionByName(slow)
    return {"ingest": fresh}


def _q98(spark, sf_dir):
    return {"agg": late_window_agg(_events(spark, sf_dir))}


def _q100(spark, sf_dir):
    from ..operators.maintenance import scd2_history
    from .jobs import SCD2_N_BUCKETS

    log = _events(spark, sf_dir).select("event_id", "ts", "user_id", "event_type")
    touched = log.select("user_id").distinct()
    old = scd2_history(log).withColumn(
        "bkt", (F.col("user_id") % SCD2_N_BUCKETS).cast("int")
    )
    return {"merge": scd2_merge_frames(log, touched, old)}


def _q105(spark, sf_dir):
    from ..functions.hashing import md5_long

    docs = _docs(spark, sf_dir)
    # per-trigger interior: TakeOrdered over (n-row state ∪ batch)
    return {
        "sample": docs.select(
            "doc_id", "n_chars", md5_long(F.col("doc_id")).alias("_priority")
        )
        .orderBy(F.col("_priority").asc(), F.col("doc_id").asc())
        .limit(100)
    }


def _q104(spark, sf_dir):
    from ..operators import dedup

    docs = _docs(spark, sf_dir)
    bands = dedup.fuzzy_band_table(dedup.fuzzy_prefix_table(docs))
    # the live increment unions batch bands with the semi-join-probed
    # history bands and anti-joins retired keys — same classes here
    probe = bands.join(
        bands.select("band_idx", "band_val").distinct(), ["band_idx", "band_val"], "left_semi"
    )
    retired = bands.select("band_idx", "band_val").limit(0)
    pairs = dedup.fuzzy_pairs_from_bands(probe, max_dist=4, retired=retired)
    drop = (
        pairs.select(F.col("doc_id_b").alias("doc_id"))
        .distinct()
        .join(docs.select("doc_id"), "doc_id", "left_semi")
    )
    kept = docs.join(drop, "doc_id", "left_anti")
    return {"ingest": kept.select("doc_id", "n_chars")}


def _q106(spark, sf_dir):
    from ..operators.curation import unimax_allocation_from_counts
    from ..plans.llm_queries import UNIMAX_BUDGET

    docs = _docs(spark, sf_dir)
    # per-trigger interior: |batch|-sized per-source aggregate, merged
    # with the catalog-sized previous counts (union + re-sum), then the
    # waterfill over the counts alone (certified orderBy+limit windows)
    batch_counts = (
        docs.select(
            "source",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        )
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("source_tokens"))
    )
    # state side of the union: the live increment reads the PREVIOUS
    # counts from a catalog-sized parquet table, not a second
    # corpus-sized aggregate — model it as a scan-shaped, limit-bounded
    # frame of the same schema so the pinned interior matches the live
    # path's cost shape (ADVICE r12: unioning batch_counts with itself
    # overstated the per-trigger work as 2x corpus aggregates)
    state_counts = docs.select(
        "source", F.lit(0).cast("long").alias("source_tokens")
    ).limit(64)
    merged = (
        batch_counts.unionByName(state_counts)
        .groupBy("source")
        .agg(F.sum("source_tokens").alias("source_tokens"))
    )
    return {"ingest": unimax_allocation_from_counts(merged, UNIMAX_BUDGET)}


def _q108(spark, sf_dir):
    from ..operators.curation import temperature_mixture_from_counts
    from ..plans.llm_queries import UNIMAX_BUDGET

    docs = _docs(spark, sf_dir)
    # per-trigger interior identical to _q106 (same state layer); only
    # the counts-derived recipe differs
    batch_counts = (
        docs.select(
            "source",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        )
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("source_tokens"))
    )
    state_counts = docs.select(
        "source", F.lit(0).cast("long").alias("source_tokens")
    ).limit(64)
    merged = (
        batch_counts.unionByName(state_counts)
        .groupBy("source")
        .agg(F.sum("source_tokens").alias("source_tokens"))
    )
    return {"ingest": temperature_mixture_from_counts(merged, UNIMAX_BUDGET)}


def _q110(spark, sf_dir):
    from ..operators.partitioning import global_topk_with_rank
    from ..operators.text_analysis import (
        bm25_doc_projection,
        bm25_score_from_parts,
        bm25_stats_from_projection,
        bm25_tf_from_projection,
    )
    from ..plans.llm_queries import BM25_QUERY_TERMS

    docs = _docs(spark, sf_dir)
    # per-trigger interior (round-16 fused-tokenize shape, the plan the
    # live ingest runs): ONE tokenize projection feeds the |batch|-sized
    # postings aggregate AND the 1-row normalizer merge against the
    # scan-shaped previous state
    sel = bm25_doc_projection(docs, BM25_QUERY_TERMS)
    tf = bm25_tf_from_projection(sel, BM25_QUERY_TERMS)
    batch_stats = bm25_stats_from_projection(sel)
    state_stats = docs.select(
        F.lit(0).cast("long").alias("n_docs"),
        F.lit(0).cast("long").alias("total_words"),
    ).limit(1)
    merged = batch_stats.unionByName(state_stats).agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("total_words").alias("total_words"),
    )
    # read-side answer: broadcast df/stats joins over the query-term-
    # bounded postings, then the TakeOrdered top-k certificate
    scored = bm25_score_from_parts(tf, merged)
    answer = global_topk_with_rank(
        scored, [F.col("score_e9").desc(), F.col("doc_id").asc()], 10
    )
    return {"ingest": merged, "answer": answer}


def _q109(spark, sf_dir):
    from ..operators.profiling import category_drift_from_counts

    ev = _events(spark, sf_dir)
    # per-trigger interior: |batch|-sized per-(type, second) aggregate
    # merged with the scan-shaped previous state (q106's r13
    # convention), then the drift panel over the time-domain-bounded
    # counts alone
    batch_counts = (
        ev.select("event_type", F.unix_timestamp("ts").alias("ep"))
        .groupBy("event_type", "ep")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    state_counts = ev.select(
        "event_type",
        F.unix_timestamp("ts").alias("ep"),
        F.lit(0).cast("long").alias("n"),
    ).limit(4096)
    merged = (
        batch_counts.unionByName(state_counts)
        .groupBy("event_type", "ep")
        .agg(F.sum("n").alias("n"))
    )
    return {"ingest": category_drift_from_counts(merged)}


def _q111(spark, sf_dir):
    from ..operators.similarity import (
        _assign_clusters,
        _collect_centroids,
        ivf_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    # per-trigger interior: one |batch| map-side assignment against the
    # pinned-centroid closure broadcast (bounded: 16 rows) + the
    # <= n_centroids-row occupancy merge
    cent_ids, cent_mat = _collect_centroids(emb, 16, "vec_id", "embedding")
    assigned = _assign_clusters(
        emb, cent_ids, cent_mat, "neighbor_id", "vec_id", "embedding"
    )
    occ = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_vectors"))
    # read-side answer: probed-cluster lists scan + broadcast query join
    # + per-query rank window — ivf_topk composes the same cores
    # ann_from_state serves through (pp pruning adds no audited class)
    queries = emb.where(F.col("vec_id") < 20).orderBy("vec_id").limit(20)
    return {"ingest": occ, "answer": ivf_topk(emb, queries, k=5)}


def _q113(spark, sf_dir):
    from ..operators.similarity import ivf_kmeans_topk

    emb = load(spark, sf_dir, "embeddings")
    # retrain interior == the batch kmeans operator's whole graph: per-
    # iteration map-side assignment + the bounded (centroids x dim)
    # partial-sum shuffle, then the reassignment map stage and the
    # probe join — ivf_kmeans_topk plans every one of those classes
    queries = emb.where(F.col("vec_id") < 20).orderBy("vec_id").limit(20)
    return {"retrain": ivf_kmeans_topk(emb, queries, k=5)}


def _q114(spark, sf_dir):
    # per-trigger interior = q111's ingest (map-side assignment against
    # the bounded pinned-centroid closure + <= n_centroids occupancy
    # merge) PLUS the serving probe join answered inside the same
    # trigger — the identical plan classes _q111 builds, with the query
    # side trigger-bounded (one stage's <= 7-row slice)
    from ..operators.similarity import (
        _assign_clusters,
        _collect_centroids,
        ivf_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    cent_ids, cent_mat = _collect_centroids(emb, 16, "vec_id", "embedding")
    assigned = _assign_clusters(
        emb, cent_ids, cent_mat, "neighbor_id", "vec_id", "embedding"
    )
    occ = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_vectors"))
    queries = emb.where(F.col("vec_id") < 7).orderBy("vec_id").limit(7)
    return {"ingest": occ, "answer": ivf_topk(emb, queries, k=5)}


def _q115(spark, sf_dir):
    # auto-retrain trigger = q111's per-trigger ingest interior + q113's
    # retrain interior fired from the foreachBatch tail — the union of
    # both shadows' plan classes
    from ..operators.similarity import (
        _assign_clusters,
        _collect_centroids,
        ivf_kmeans_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    cent_ids, cent_mat = _collect_centroids(emb, 16, "vec_id", "embedding")
    assigned = _assign_clusters(
        emb, cent_ids, cent_mat, "neighbor_id", "vec_id", "embedding"
    )
    occ = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_vectors"))
    queries = emb.where(F.col("vec_id") < 20).orderBy("vec_id").limit(20)
    return {"ingest": occ, "retrain": ivf_kmeans_topk(emb, queries, k=5)}


def _q112(spark, sf_dir):
    from ..functions.text import words

    docs = _docs(spark, sf_dir)
    # per-trigger interior: one |batch| projection + the per-bucket
    # cumsum window (partitioned — never global) + the n_buckets-row
    # offsets broadcast + the per-(bucket, shard) delta aggregate
    off = (
        docs.groupBy((F.col("doc_id") % 8).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("next_offset"))
        .limit(8)  # replace-state: n_buckets rows, certificate explicit
    )
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("bucket"),
        F.size(words(F.col("text"))).cast("long").alias("n_tokens"),
    )
    from pyspark.sql import Window as _W

    w = (
        _W.partitionBy("bucket")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(_W.unboundedPreceding, _W.currentRow)
    )
    start = (
        F.coalesce(F.col("next_offset"), F.lit(0))
        + F.sum("n_tokens").over(w)
        - F.col("n_tokens")
    )
    sharded = t.join(F.broadcast(off), "bucket", "left").select(
        "bucket",
        "n_tokens",
        F.floor(start / F.lit(4096)).cast("long").alias("shard"),
    )
    delta = sharded.groupBy("bucket", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    )
    # read-side answer: groupBy-sum of the additive manifest deltas
    answer = delta.groupBy("bucket", "shard").agg(
        F.sum("n_docs").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    )
    return {"ingest": delta, "answer": answer}


def _q107(spark, sf_dir):
    from ..functions.hashing import md5_long
    from ..operators.curation import dsir_doc_feats, dsir_scores

    docs = _docs(spark, sf_dir)
    # per-trigger interior: |batch|-sized hashed-ngram feature aggregate
    # + <= n_buckets-row counts merge against the scan-shaped previous
    # state (q106's r13 convention) + the batch feature append (no
    # extra classes)
    feats = dsir_doc_feats(docs, F.col("lang") == "en")
    batch_counts = feats.groupBy("feat_bucket").agg(
        F.sum("c").alias("ct_r"),
        F.sum(F.when(F.col("_is_target"), F.col("c")).otherwise(F.lit(0))).alias(
            "ct_t"
        ),
    )
    state_counts = docs.select(
        F.pmod(md5_long(F.col("source")), F.lit(4096)).alias("feat_bucket"),
        F.lit(0).cast("long").alias("ct_r"),
        F.lit(0).cast("long").alias("ct_t"),
    ).limit(4096)
    merged = (
        batch_counts.unionByName(state_counts)
        .groupBy("feat_bucket")
        .agg(F.sum("ct_r").alias("ct_r"), F.sum("ct_t").alias("ct_t"))
    )
    # read-side recipe materialization: broadcast ratio join + doc_id
    # aggregate over the feature table, then the TakeOrdered boundary
    # probe the rank rule runs (limit literal = the certificate)
    totals = merged.agg(F.sum("ct_r").alias("n_r"), F.sum("ct_t").alias("n_t"))
    scored = dsir_scores(feats.select("doc_id", "feat_bucket", "c"), merged, totals)
    boundary = scored.orderBy(
        F.col("score_e9").desc(), F.col("doc_id").asc()
    ).limit(1024)
    return {"ingest": merged, "recipe": scored, "boundary": boundary}


STREAM_SHADOWS: dict[str, ShadowFn] = {
    "q10_stream_global_agg": _q10,
    "q12_stream_roundtrip": _q12,
    "q19_stream_windowed_agg": _q19,
    "q21_stream_session_window": _q21,
    "q22_stream_dedup": _q22,
    "q31_stream_stream_join": _q31,
    "q44_stream_static_join": _q44,
    "q60_stream_materialized_latest": _q60,
    "q66_stream_ttl_dedup": _q66,
    "q67_stream_topk": _q67,
    "q90_stream_curation": _q90,
    "q91_stream_ann_serving": _q91,
    "q92_stream_decontaminate": _q92,
    "q94_stream_dup_rate": _q94,
    "q95_stream_hll_distinct": _q95,
    "q96_stream_hll_ingest": _q96,
    "q97_stream_bloom_ingest": _q97,
    "q98_stream_late_data": _q98,
    "q100_stream_scd2": _q100,
    # same interior as q100 — compaction adds only scan+rewrite stages
    # (no join/python/window classes), which the fidelity audit confirms
    "q103_stream_scd2_compacting": _q100,
    "q104_stream_fuzzy_ingest": _q104,
    "q105_stream_bottomk_sample": _q105,
    "q106_stream_unimax": _q106,
    "q107_stream_dsir": _q107,
    "q108_stream_temperature": _q108,
    "q109_stream_drift": _q109,
    "q110_stream_bm25": _q110,
    "q111_stream_ann_index": _q111,
    "q112_stream_shard_export": _q112,
    "q113_stream_ann_retrain": _q113,
    "q114_stream_ann_query_serving": _q114,
    "q115_stream_ann_autoretrain": _q115,
}
