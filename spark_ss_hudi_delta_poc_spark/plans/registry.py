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
# Round-14 rotation — VERDICT r13 #1, the committed round-14 queue
# (the 28 remaining r8-cohort rows, then r10 oldest-first to fill 50).
# Rotation rule unchanged: (a) first rows for operators with ZERO
# external evidence, (b) fresh rows for plans materially changed since
# their newest row, (c) then oldest-evidence-first (name order breaks
# ties inside a cohort, matching the committed queue listing).
#   Slots 1-28: the full remaining r8 cohort, name-ordered, exactly the
#     queue staged in round 13 (multimodal_phash_pairs ..
#     text_source_divergence).  Evidence histogram max age drops from
#     r8 to r10.
#   Slots 29-50: the name-ordered oldest-r10 rows that fill the window.
#     As STAGED this was ann_ivfpq_topk .. privacy_l_diversity (22
#     rows); the three round-14 operators then took the top slots
#     (rule (a)), displacing the three newest-evidence tail names
#     (multimodal_audio_pairs, privacy_k_anonymity,
#     privacy_l_diversity) into the round-15 queue — the committed
#     window below carries the 19 remaining r10 rows, ending at
#     monitor_value_outliers.  Same mechanics as rounds 11-13.
#
# Round-15 rotation queue (staged — VERDICT r13 pattern): the remaining
# r10-cohort rows (multimodal_audio_pairs, privacy_k_anonymity and
# privacy_l_diversity — displaced from this window by the
# q111/q112/q113 first rows —
# q01_count, q02_group_count, q03_distinct_count, q100_stream_scd2,
# q101_salted_skew_join, q21_stream_session_window, q44_stream_static_join,
# q51_returned_top_customers, q69_market_share, q70_waiting_suppliers,
# q72_promo_revenue, q73_disjunctive_join, q81_small_qty_revenue,
# q83_product_profit, q85_supplier_part_counts, q86_promo_part_suppliers,
# q87_min_price_supplier, q93_zone_map_skipping, q94_stream_dup_rate,
# q97_stream_bloom_ingest, q98_stream_late_data, q99_group_heavy_hitters,
# scd2_as_of, scd2_history, sketch_hll_by_type, sketch_kmv_jaccard,
# text_langid_confusion, text_pmi_collocations, plus any rows displaced
# from this window by round-14 operators), then r11 oldest-first (name
# order) to fill 50; any operator added in round 15 takes a first-row
# slot ahead of the refresh rows.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- FIRST rows for this round's new operators ---------------------------
    "q111_stream_ann_index",
    "q112_stream_shard_export",
    "q113_stream_ann_retrain",
    # --- r8 cohort refresh: the 28 remaining rows, committed queue (28) ----
    "multimodal_phash_pairs",
    "q05_ts_roundtrip",
    "q08_epoch_roundtrip",
    "q11_datetime_battery",
    "q33_segment_topn",
    "q34_region_revenue",
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
    "q92_stream_decontaminate",
    "q95_stream_hll_distinct",
    "q96_stream_hll_ingest",
    "sketch_bloom_filter",
    "sketch_cms_topk",
    "sketch_hll_distinct",
    "sketch_kmv_distinct",
    "text_ngram_lm_score",
    "text_ngram_novelty",
    "text_source_divergence",
    # --- r10 cohort, oldest-evidence-next, name-ordered (19) ---------------
    "ann_ivfpq_topk",
    "ann_pq_index_topk",
    "ann_pq_topk",
    "ann_rerank_topk",
    "bloom_join_reduction",
    "corpus_bpe_pair_counts",
    "corpus_dedup_report",
    "curation_ccnet_buckets",
    "curation_contamination_report",
    "curation_sample_exact_n",
    "dedup_minhash_histogram",
    "dedup_winnow_pairs",
    "embedding_centroid_confusion",
    "embedding_norm_stats",
    "embedding_top_direction",
    "graph_triangles",
    "monitor_category_drift",
    "monitor_freshness",
    "monitor_value_outliers",
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
