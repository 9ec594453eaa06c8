"""Query registry — single source of truth for the engine's query surface.

Every capability the engine claims is a ``Query``: a PySpark builder
``fn(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible, a DuckDB
oracle SQL string producing the identical result (same column NAMES, same
row set; the driver sorts columns by name and hashes values).

Determinism rules every query obeys (SURVEY.md §7 hard parts #3/#4):
- session timezone pinned UTC; no current_timestamp()/uuid() in output;
- money/double aggregations are scaled to exact integers per-row before
  summing, so float summation order can never flip a hash;
- any top-k / limit has a total tie-break order.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


# The external correctness driver verifies the FIRST 50 registry entries
# against their oracles; the rest ride on the in-repo gate
# (tools/verify_local.py, all SFs).
#
# Round-8 rotation.  Slots 1-6: FIRST rows for the six operators added
# this round (prefix dedup, source divergence, exact global deciles,
# cluster-balanced sample, n-gram novelty, pHash triage clusters).
# Slots 7-14: fresh rows for every plan fixed per the round-7 verdict —
# the three dedup verify stages whose row-per-document broadcasts were
# replaced by sizes folded through the pair aggregate (#1), the capped
# pHash band join (#4), their composites (corpus_dedup_report), and the
# de-hinted segment/contamination plans (#3), including the new
# EVAL_MAX_DOCS eval-split cap (oracle applies the identical cap).
# Slots 15-20 + 50: the ANN family after the query side gained its
# orderBy+limit certificate (values verified identical at 3 SFs; fresh
# external rows anyway since every plan changed).  Slots 21-32: the
# twelve TPC-H/analytics queries whose selectivity-proportional
# broadcast hints were dropped (#3 — plans changed, values identical).
# Slots 33-48: the sixteen rows displaced to r8 by the round-7 rotation
# (newest evidence r4 — the displacement queue the r7 registry comment
# names).  Slot 49: epoch_shuffle's column-order fix.
# After this round no registry query's newest external evidence is older
# than r5.
#
# Late-round-8 amendment: ten NEW operators landed after the window
# above was set (sketch_hll/kmv/bloom/cms, text_ngram_lm_score,
# q95_stream_hll_distinct, graph_pagerank, embedding_covariance,
# dedup_source_matrix, q96_stream_hll_ingest) — new operators need a
# first external row, so they take the slots of ten of the twelve
# de-hinted TPC-H queries (q51/q69/q70/q72/q73/q81/q83/q85/q86/q87):
# those plans changed only by DROPPING broadcast hints, values verified
# identical at 3 SFs, and the tightened broadcast gate + bench already
# evidence them; q33/q34 (named in the verdict) stay as the family's
# fresh external rows.
#
# Round-9 rotation queue (first-row candidates — added late in round 8
# with full in-repo 3-SF oracle evidence but no window slot left):
# text_langid_confusion, curation_contamination_report,
# embedding_norm_stats, corpus_bpe_pair_counts, curation_sample_exact_n,
# q93_zone_map_skipping, q94_stream_dup_rate, dedup_minhash_histogram,
# q97_stream_bloom_ingest, ann_pq_topk, ann_ivfpq_topk,
# ann_rerank_topk, embedding_top_direction, text_pmi_collocations,
# sketch_kmv_jaccard, bloom_join_reduction, monitor_category_drift,
# scd2_history, q98_stream_late_data, graph_triangles,
# monitor_value_outliers, ann_ivfpq_topk, sketch_hll_by_type,
# q99_group_heavy_hitters, privacy_k_anonymity, ann_pq_index_topk,
# multimodal_audio_pairs, curation_ccnet_buckets, q100_stream_scd2,
# embedding_centroid_confusion (everything from
# ann_pq_topk on is the final round-8 batch),
# plus a FRESH row for ann_recall_report (its output gained
# pq/ivfpq/rerank rows this round — it holds a window slot already, so
# r8 covers it).  Then the ten displaced
# de-hinted TPC-H rows (q51/q69/q70/q72/q73/q81/q83/q85/q86/q87), then
# the rows whose newest evidence is r5.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- first rows for this round's six new operators (6) --------------
    "dedup_prefix",
    "text_source_divergence",
    "curation_quality_deciles",
    "curation_cluster_balance",
    "text_ngram_novelty",
    "multimodal_phash_clusters",
    # --- plans fixed per VERDICT r7 #1/#3/#4 (8) -------------------------
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_minhash_lsh",
    "multimodal_phash_pairs",
    "corpus_dedup_report",
    "dedup_segments",
    "curation_contamination",
    "curation_decontaminated",
    # --- ANN family: bounded query-set certificate (6) -------------------
    "ann_ivf_topk",
    "ann_ivf_kmeans_topk",
    "ann_recall_report",
    "ann_bruteforce_topk",
    "ann_quantized_topk",
    "ann_ivf_q8_topk",
    # --- de-hinted TPC-H/analytics plans (2 of 12; see amendment note) ---
    "q33_segment_topn",
    "q34_region_revenue",
    # --- first rows for the late-round-8 operators (10) ------------------
    "sketch_hll_distinct",
    "sketch_kmv_distinct",
    "sketch_bloom_filter",
    "sketch_cms_topk",
    "text_ngram_lm_score",
    "q95_stream_hll_distinct",
    "graph_pagerank",
    "embedding_covariance",
    "dedup_source_matrix",
    "q96_stream_hll_ingest",
    # --- the r4-evidence displacement queue from round 7 (16) ------------
    "q05_ts_roundtrip",
    "q08_epoch_roundtrip",
    "q11_datetime_battery",
    "q35_moving_agg",
    "q36_resample_gapfill",
    "q37_rank_battery",
    "q38_lag_lead",
    "q43_collect_arrays",
    "q45_histogram",
    "q47_quality_rules",
    "q54_group_mode",
    "q61_date_arith",
    "q63_unpivot",
    "q74_zorder_values",
    "q76_bit_aggregates",
    "curation_c4_rules",
    # --- touched this round (2) ------------------------------------------
    "curation_epoch_shuffle",
    "q92_stream_decontaminate",
)


def all_queries() -> dict[str, Query]:
    """Assemble the full registry (import here to avoid cycles),
    DRIVER_PRIORITY entries first."""
    from . import (
        analytics_queries,
        function_queries,
        llm_queries,
        reference_queries,
        relational_queries,
        streaming_queries,
        tpch_queries,
    )

    out: dict[str, Query] = {}
    for mod in (
        reference_queries,
        relational_queries,
        tpch_queries,
        analytics_queries,
        function_queries,
        llm_queries,
        streaming_queries,
    ):
        for q in mod.QUERIES:
            if q.name in out:
                raise ValueError(f"duplicate query name {q.name}")
            out[q.name] = q
    missing = [n for n in DRIVER_PRIORITY if n not in out]
    if missing:
        raise ValueError(f"DRIVER_PRIORITY names not in registry: {missing}")
    ordered = {n: out[n] for n in DRIVER_PRIORITY}
    ordered.update((n, q) for n, q in out.items() if n not in ordered)
    return ordered
