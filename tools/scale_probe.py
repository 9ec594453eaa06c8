"""Scale-stress probe: replicate the largest driver SF K× into /tmp and
measure how the LLM-pipeline AND relational-join operators scale with
data size.

A plan that is accidentally O(N^2) — a missed broadcast, an uncapped
self-join, driver-side state — shows up here as a time ratio far above K
long before a cluster run would.

Replicas must be content-distinct (see ``replicate``): text is
alphabet-rotated per replica, embeddings sign-flipped per replica, and
TPC-H/event keys are remapped as key*K+rep so every join stays
replica-local — K× data means K× join output, exactly like a K×-bigger
business, not K² cross-replica matches.  Dimension tables (region,
nation) are copied verbatim: dims don't grow with fact data.

    python tools/scale_probe.py [K] [base_sf_dir]

Prints one JSON line per op: {"op": ..., "base_s": ..., "scaled_s": ...,
"ratio": ...} plus a summary verdict line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_ss_hudi_delta_poc_spark.plans import all_queries  # noqa: E402
from spark_ss_hudi_delta_poc_spark.session import get_spark  # noqa: E402
from spark_ss_hudi_delta_poc_spark.tables import load  # noqa: E402

# ops whose scaling behavior carries 100 TB risk; exact all-pairs cosine
# (dedup_embedding_cosine) is excluded by design — its compute is
# inherently quadratic and its scale path is dedup_embedding_lsh
PROBE_OPS = [
    "dedup_exact",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_embedding_lsh",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "curation_contamination",
    "curation_pack_sequences",
    "curation_pretokens",
    "curation_sample_bernoulli",
    "curation_gopher_rules",
    "curation_c4_rules",
    "text_quality_score",
    "text_fingerprint",
    "corpus_pipeline",
    # round-5 additions: segment-level dedup (two corpus shuffles + one
    # broadcast anti-join), hashed linear scorer (map + one shuffle),
    # int8-quantized ANN (same broadcast/matmul shape as brute force)
    "dedup_segments",
    "dedup_repeated_spans",
    "curation_model_filter",
    "ann_quantized_topk",
    "embedding_knn_graph_lsh",
    # relational / join plans (replica-local keys: join output scales K×)
    "q13_join_revenue",
    "q14_broadcast_dims",
    "q23_pricing_summary",
    "q33_segment_topn",
    "q34_region_revenue",
    "q15_window_topn",
    "q20_sessionize",
    "q68_volume_shipping",
    "q70_waiting_suppliers",
    "q73_disjunctive_join",
    "q76_bit_aggregates",
    # round-5 additions: outer-join distribution, per-group-avg join-back,
    # multi-join profit, argmin join-back, corpus-relative token stats.
    # embedding_knn_graph is excluded by design like dedup_embedding_cosine:
    # exact all-pairs is inherently quadratic; its scale path is bucketing
    # first (lsh_neardup_pairs) and running the graph per bucket.
    "q79_custorder_distribution",
    "q81_small_qty_revenue",
    "q83_product_profit",
    "q87_min_price_supplier",
    "text_rare_token_stats",
    # round-6 additions: winnow-index pair join (df-capped fingerprint
    # equi-join — the fanout-bound argument under K-fold replication),
    # iterative Lloyd refinement (per-iteration shuffle is
    # partitions*centroids*dim rows, independent of corpus size)
    "dedup_winnow_pairs",
    "ann_ivf_kmeans_topk",
    # round-7 additions: epoch shuffle is hash map + one sharded ranking
    # window (linear); dedup_semantic is EXCLUDED by design like
    # dedup_embedding_cosine — its within-cluster pair scan is
    # deliberately quadratic per cluster at FIXED n_centroids, and the
    # scale knob is raising n_centroids with the corpus (SemDeDup runs
    # 11k clusters at web scale), which a fixed-params replay can't show
    "curation_epoch_shuffle",
    # round-7 addition: the winnow fingerprint index itself — its shuffle
    # is ~16 B per corpus CHAR (posexplode + per-(doc,chunk) window min),
    # the heaviest per-byte exchange in the repo; the max_doc_chars chunk
    # guard bounds any one window partition, and this probe pins the
    # corpus-size scaling ~linear
    "text_winnow_fingerprint",
    # banded Hamming candidates over 12-bit band keys: collision count
    # grows quadratically only WITHIN a band bucket; content-distinct
    # replicas keep buckets balanced, so the probe pins near-linear
    "multimodal_phash_pairs",
    # same (strata, word) partial-agg shape as text_rare_token_stats
    "corpus_vocab_stats",
    # the lazy global-top-k consumers (round-7 rework): TakeOrdered
    # interior + bounded rank window — time must track the scored
    # interior, with no single-partition sort appearing at any size
    "text_bm25_search",
    "corpus_ngram_stats",
    "text_tfidf_keywords",
    # round-8 additions: prefix dedup is exact_dedup's one-shuffle shape;
    # novelty is a df aggregate + join-back (shuffle-join growth band);
    # divergence is two word-keyed partial-agg'd shuffles; deciles is one
    # shuffle + a VALUE-DOMAIN-bounded histogram collect (the probe pins
    # that the collect does not grow with the corpus); cluster_balance is
    # kmeans assignment + one cluster-partitioned window; the phash
    # triage clusters run iterative CC over top-k pairs (bounded edges).
    "dedup_prefix",
    "text_ngram_novelty",
    "text_source_divergence",
    "curation_quality_deciles",
    "curation_cluster_balance",
    "multimodal_phash_clusters",
    # round-8 monitoring trio: map + bounded-key aggregates
    "text_langid_confusion",
    "curation_contamination_report",
    "embedding_norm_stats",
    # round-8: pair-vocabulary top-k (partial-agg'd shuffle + TakeOrdered)
    # and the exactly-n sampler (pure TakeOrdered)
    "corpus_bpe_pair_counts",
    "curation_sample_exact_n",
    # round-8: two <= n_zones-row stats aggregates over one scan
    "q93_zone_map_skipping",
    # round-8: watermark-bounded windowed composite-key counts (stream)
    "q94_stream_dup_rate",
    # round-8 sketch family: every sketch state is CONSTANT-size (1024
    # registers / k minima / <= m set bits / d*w counters), so probe time
    # must track the linear scan+partial-agg only; a super-linear ratio
    # here would mean sketch state leaked into a corpus-sized exchange.
    # CMS additionally pins its per-distinct-key estimate join (bounded
    # grid side); bloom pins the probe-side position join.
    "sketch_hll_distinct",
    "sketch_kmv_distinct",
    "sketch_bloom_filter",
    "sketch_cms_topk",
    # round-8: bigram-LM scoring — two vocab-keyed partial-agg'd shuffles
    # + two shuffle joins back onto doc bigrams, all linear in tokens
    "text_ngram_lm_score",
    # round-8: streaming HLL — fixed 1024-row state at any feed size
    "q95_stream_hll_distinct",
    # round-8: 3 unrolled O(|E|) shuffle-join iterations over the LSH kNN
    # edge set — edge count grows ~linearly under content-distinct
    # replication (bucket occupancy held by the n_planes sizing rule)
    "graph_pagerank",
    # round-8: per-batch d x d Gram partials — exchange is d(d+1)/2 rows
    # per task at ANY corpus size; only the Arrow scan grows
    "embedding_covariance",
    # round-8: per-(hash, source) aggregate then |sources|^2-bounded
    # self-join; cross-run HLL ingest = 3 bounded-state increments
    "dedup_source_matrix",
    "q96_stream_hll_ingest",
    # round-8: threshold-0 candidate histogram (bounded 10-key agg over
    # the capped candidate plan); bloom-prefiltered dedup ingest (the
    # prefilter keeps the anti-join side bloom-claimed-only)
    "dedup_minhash_histogram",
    "q97_stream_bloom_ingest",
    # round-8 final batch: PQ = map encode + codes-only scan with local
    # top-k (the exchange is partitions*|Q|*k rows at any size); rerank =
    # int8 coarse scan + candidate-sized exact join; power iteration =
    # three bounded d-row exchanges over a linear scan; KMV jaccard pins
    # the h-keyed exact self-join (content-distinct replicas collide only
    # within a replica) next to constant-size sketch stages; bloom join
    # pins the <= m-row bit-table probe; drift is a bounded-cell agg;
    # SCD2 is one user-keyed shuffle; PMI is two vocab-keyed shuffles +
    # lazy top-k
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_rerank_topk",
    "embedding_top_direction",
    "sketch_kmv_jaccard",
    "bloom_join_reduction",
    "monitor_category_drift",
    "scd2_history",
    "text_pmi_collocations",
    # round-8 final batch (cont.): q98 pins the two-run watermark
    # machinery's cost; triangles = degree-bounded wedge joins over the
    # k-bounded kNN edge set; MAD outliers = two q53-shape ranking
    # windows + bounded joins
    "q98_stream_late_data",
    "graph_triangles",
    "monitor_value_outliers",
    # round-8 final batch (cont. 2): grouped HLL state is |groups|x1024;
    # grouped MG candidates bounded by partitions*groups*capacity;
    # k-anonymity is one quasi-tuple shuffle
    "sketch_hll_by_type",
    "q99_group_heavy_hitters",
    "privacy_k_anonymity",
    # persisted PQ index: build (map encode + two bounded writes) +
    # codes-only serving scan
    "ann_pq_index_topk",
    # audio frame-fingerprint index: df-capped inverted join, winnow's
    # fanout-bound argument on the binary modality
    "multimodal_audio_pairs",
    # CCNet bucketing: the LM score's linear shuffles + one
    # lang-partitioned ranking window (bounded category)
    "curation_ccnet_buckets",
    # incremental SCD2: per-batch touched-user semi-join recompute +
    # anti-join swap — the MERGE pattern's cost under replication
    "q100_stream_scd2",
    # centroid classifier probe: grouped-map sums (bounded exchange) +
    # map-only argmax + |labels|^2-bounded matrix aggregate
    "embedding_centroid_confusion",
    # round-9 additions: time-travel read = scd2's one user-keyed shuffle
    # + a map-side interval filter; skew-salted join = left shuffle on
    # (key, _salt) with the right side replicated x8 (volume x8 at ANY
    # size — constant factor, so the ratio must stay ~K); l-diversity =
    # one quasi-tuple shuffle (count+count_distinct same pass);
    # freshness = one bounded-category shuffle + 1-row watermark; and the
    # round-9 FIXED streaming plans re-probed: q44's bounded 3-row dim
    # broadcast, q21's append-mode session eviction, q100's bucketed
    # merge (per-batch write ~ touched buckets, not |history|)
    "scd2_as_of",
    "q101_salted_skew_join",
    "privacy_l_diversity",
    "monitor_freshness",
    "q44_stream_static_join",
    "q21_stream_session_window",
    # late-round-9 additions: t-closeness = (quasi, band) shuffle +
    # bounded-array EMD fold (per-class work constant in corpus size);
    # schema drift = ONE group-less conditional aggregate (the distinct
    # Expand is the only volume term); salted distinct = two balanced
    # exchanges, hot group spread 1/16; fuzzy edit join = capped banded
    # buckets + in-bucket expansion (the phash fanout-bound argument)
    "privacy_t_closeness",
    "monitor_schema_drift",
    "q102_salted_distinct_agg",
    "dedup_fuzzy_edit",
    # seasonal anomaly: one bounded (category, hour, day) daily-ledger
    # shuffle; downstream work re-aggregates the bounded ledger
    "monitor_seasonal_anomaly",
    # fuzzy recall monitor: all-pairs truth over an orderBy+limit(1024)
    # sample — the pair work is constant by construction; only the
    # sample SCAN grows with the corpus (expect a low-single-digit
    # ratio; measured 1.4 at K=10, SCALE.md)
    "dedup_fuzzy_recall",
    # round-11: q100's MERGE with per-batch log compaction forced on —
    # the compaction read/rewrite is the live epoch set (bounded by the
    # tier thresholds), so the ratio must track q100's, not blow up
    "q103_stream_scd2_compacting",
    # round-11: incremental fuzzy ingest — per-increment probe is a
    # semi-join bounded by the batch's band keys, so the ratio must
    # track the fuzzy_edit pair plan, never O(|history|) per batch
    "q104_stream_fuzzy_ingest",
    # round-11: bottom-k sample maintenance — per-increment work is one
    # TakeOrdered over (n + |batch|) rows; only the batch scan grows
    "q105_stream_bottomk_sample",
    # round-12: DSIR importance filter — two corpus-linear aggregates,
    # a <=4096-row broadcast ratio table, two TakeOrdered boundary
    # probes; nothing quadratic, so the ratio must stay near-linear
    "curation_dsir",
    # round-12: UniMax waterfill — one corpus aggregate, then windows
    # over the bounded source catalog; must scale as a plain groupBy
    "curation_unimax",
    # round-12: streaming recipe maintenance — per-increment cost is one
    # batch aggregate + a catalog-sized merge; must track the batch op
    "q106_stream_unimax",
    # round-13: DSIR streaming twin — per-increment cost is one batch
    # gram aggregate + a <=4096-row counts merge + a batch-sized feature
    # append (fold-bounded dirs); the final recipe rematerialization is
    # corpus-linear like curation_dsir, so the ratio must track it
    "q107_stream_dsir",
    # round-13: temperature mixture — one corpus groupBy(source), then
    # the bounded-catalog window shape; must scale as a plain groupBy
    "curation_temperature",
    # round-13: its streaming twin over the q106 counts state — one
    # batch aggregate + catalog-sized merge per increment
    "q108_stream_temperature",
    # round-13: drift-monitor twin — per-increment cost is one batch
    # (type, second) aggregate + a time-domain-sized merge; the panel
    # recompute is counts-sized, so the ratio must track the batch
    # monitor's (bounded-agg) class, never the event rate
    "q109_stream_drift",
    # round-13: BM25 index twin — per-increment cost is one batch scan
    # + a query-term-bounded postings append + a 1-row stats merge; the
    # answer stage reads only the (tiny) postings, so the ratio must
    # track text_bm25_search's scan-dominated class
    "q110_stream_bm25",
    # round-14: maintained ANN index — per-increment cost is one
    # |batch| map-side centroid assignment (bounded closure broadcast)
    # + a <=n_centroids occupancy merge; serving partition-prunes to
    # the probed clusters, so the ratio must track ann_ivf_index_topk's
    # lists-scan class, never the corpus
    "q111_stream_ann_index",
    # round-14: incremental shard export — per-increment cost is one
    # |batch| projection + a per-bucket cumsum window + an n_buckets-row
    # offsets broadcast; the manifest answer is a groupBy over
    # fold-bounded additive deltas — linear, one shuffle class
    "q112_stream_shard_export",
    # round-14: index retrain — per-iteration map-side assignment + the
    # bounded (centroids x dim) partial-sum shuffle, then one corpus
    # reassignment rewrite (a rebuild rescans the corpus ONCE by
    # definition); must track ann_ivf_kmeans_topk's linear class
    "q113_stream_ann_retrain",
    # round-15: stream query serving against the maintained index —
    # per-trigger cost is one corpus-increment assignment (q111's
    # class) + one probed-cluster-pruned answer over the batch's
    # bounded query slice; must track q111's staging-dominated class
    "q114_stream_ann_query_serving",
    # round-15: auto-retrain — q113's rebuild fired from the
    # foreachBatch tail after EVERY increment (forced cadence), so the
    # probe bounds the worst case: increments x one-corpus-rescan
    # retrains; must stay within the linear band like q113
    "q115_stream_ann_autoretrain",
]


ALPHA = "abcdefghijklmnopqrstuvwxyz"


def replicate(spark, base: str, out: str, k: int) -> None:
    """Replicate K-fold with CONTENT-DISTINCT, statistically identical
    replicas.  Naive duplication is the wrong workload model for pair
    ops (near-dup pairs grow K² when every replica shares its shingles
    and vectors with K-1 twins — a first probe run measured 18-26×
    "superlinear" time at K=10 that was entirely this artifact).  A real
    10× corpus has 10× NEW content, so:

    - text: per-replica Caesar rotation of the alphabet (translate) —
      every shingle/hash changes, while lengths, word counts, and the
      within-replica near-dup structure are preserved;
    - embeddings: per-replica deterministic sign-flip pattern over
      dimensions — cross-replica cosines collapse to ~0, within-replica
      geometry (norms, pair cosines) is exactly preserved.
    """
    docs = load(spark, base, "documents")
    doc_reps = []
    for i in range(k):
        rot = ALPHA[i % 26 :] + ALPHA[: i % 26]
        doc_reps.append(
            docs.select(
                (F.col("doc_id") * k + F.lit(i)).alias("doc_id"),
                F.translate(F.col("text"), ALPHA, rot).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    union_docs = doc_reps[0]
    for d in doc_reps[1:]:
        union_docs = union_docs.unionByName(d)
    union_docs.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    emb = load(spark, base, "embeddings")
    emb_reps = []
    for i in range(k):
        rep = F.lit(i)
        flipped = F.zip_with(
            F.col("embedding"),
            F.transform(
                F.sequence(F.lit(0), F.size(F.col("embedding")) - 1),
                lambda d, r=rep: 1 - 2 * (F.xxhash64(r, d) % 2 != 0).cast("int"),
            ),
            lambda x, s: x * s.cast("float"),
        )
        emb_reps.append(
            emb.select(
                (F.col("vec_id") * k + F.lit(i)).alias("vec_id"),
                flipped.alias("embedding"),
                "label",
            )
        )
    union_emb = emb_reps[0]
    for e in emb_reps[1:]:
        union_emb = union_emb.unionByName(e)
    union_emb.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))

    # TPC-H facts + events: remap every fact key to key*k+rep so joins
    # stay replica-local (K× data → K× join output, never K² matches)
    fact_keys = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
    }
    reps = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("rep")
    for table, keys in fact_keys.items():
        df = load(spark, base, table)
        cols = [
            (F.col(c) * k + F.col("rep")).alias(c) if c in keys else F.col(c)
            for c in df.columns
        ]
        (
            df.select("*", reps)
            .select(*cols)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"{table}.parquet"))
        )
    # dimensions don't grow with fact data — copy verbatim
    for table in ("region", "nation"):
        load(spark, base, table).write.mode("overwrite").parquet(
            os.path.join(out, f"{table}.parquet")
        )


def time_op(qs, name: str, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t = time.time()
        qs[name].fn(SPARK, sf_dir).count()
        best = min(best, time.time() - t)
    return best


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = f"/tmp/spark_graft_scale/x{k}"
    SPARK = get_spark(app_name="scale-probe")
    SPARK.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(os.path.join(out, "documents.parquet")):
        shutil.rmtree(out, ignore_errors=True)
        replicate(SPARK, base, out, k)
    qs = all_queries()
    worst = 0.0
    ops = sys.argv[3:] or PROBE_OPS  # optional op subset for targeted re-probes
    for op in ops:
        b = time_op(qs, op, base)
        s = time_op(qs, op, out)
        ratio = s / b if b > 0 else float("inf")
        worst = max(worst, ratio)
        print(json.dumps({"op": op, "base_s": round(b, 2), "scaled_s": round(s, 2), "ratio": round(ratio, 1)}), flush=True)
    print(json.dumps({"k": k, "worst_ratio": round(worst, 1), "verdict": "linear-ish" if worst <= 3 * k else "CHECK"}))
