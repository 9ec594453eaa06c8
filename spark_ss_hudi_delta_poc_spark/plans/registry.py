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
# Round-15 rotation — VERDICT r14 #1, the committed round-15 queue
# (the full remaining r10 cohort, then r11 oldest-first to fill 50).
# Rotation rule unchanged: (a) first rows for operators with ZERO
# external evidence, (b) fresh rows for plans materially changed since
# their newest row, (c) then oldest-evidence-first (name order breaks
# ties inside a cohort, matching the committed queue listing).
#   Slots 1-31: the full remaining r10 cohort, name-ordered, exactly
#     the queue staged in round 14 (multimodal_audio_pairs ..
#     text_pmi_collocations, including the three rows the round-14
#     operators displaced).  Evidence histogram max age drops from
#     r10 to r11.
#   Slots 32-50 as STAGED: the name-ordered oldest-r11 rows that fill
#     the window (ann_lsh_topk .. q06_filter, 19 rows).  The two
#     round-15 operators (q114_stream_ann_query_serving,
#     q115_stream_ann_autoretrain) then took the top slots (rule (a)),
#     displacing the two newest-evidence tail names (q04_dup_having,
#     q06_filter) into the round-16 queue — the committed window below
#     carries the 17 remaining r11 rows, ending at privacy_t_closeness.
#     Same mechanics as rounds 11-14.
#
# Round-16 rotation queue (staged): the remaining r11-cohort rows
# (q04_dup_having and q06_filter — displaced from this window by the
# q114/q115 first rows — then q07_explode_flatten, q09_json_roundtrip,
# q102_salted_distinct_agg, q103_stream_scd2_compacting,
# q105_stream_bottomk_sample, q10_stream_global_agg, q12_stream_roundtrip,
# q19_stream_windowed_agg, q22_stream_dedup, q27_approx_distinct,
# q31_stream_stream_join, q32_upsert_snapshot, q39_conditional_battery,
# q40_array_battery, q41_hash_split, q42_profile_table, q46_edit_distance,
# q60_stream_materialized_latest, q64_conditional_distinct, q65_string_agg,
# q77_array_output, q79_custorder_distribution, q80_top_supplier,
# q82_large_volume_customers, q84_important_parts, q88_range_join,
# q89_heavy_hitters, q91_stream_ann_serving, text_quality_score,
# text_rare_token_stats), then r12 oldest-first (name order) to fill 50;
# any operator added in round 16 takes a first-row slot ahead of the
# refresh rows.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- FIRST rows for this round's new operators ---------------------------
    "q114_stream_ann_query_serving",
    "q115_stream_ann_autoretrain",
    # --- r10 cohort refresh: the 31 remaining rows, committed queue (31) ---
    "multimodal_audio_pairs",
    "privacy_k_anonymity",
    "privacy_l_diversity",
    "q01_count",
    "q02_group_count",
    "q03_distinct_count",
    "q100_stream_scd2",
    "q101_salted_skew_join",
    "q21_stream_session_window",
    "q44_stream_static_join",
    "q51_returned_top_customers",
    "q69_market_share",
    "q70_waiting_suppliers",
    "q72_promo_revenue",
    "q73_disjunctive_join",
    "q81_small_qty_revenue",
    "q83_product_profit",
    "q85_supplier_part_counts",
    "q86_promo_part_suppliers",
    "q87_min_price_supplier",
    "q93_zone_map_skipping",
    "q94_stream_dup_rate",
    "q97_stream_bloom_ingest",
    "q98_stream_late_data",
    "q99_group_heavy_hitters",
    "scd2_as_of",
    "scd2_history",
    "sketch_hll_by_type",
    "sketch_kmv_jaccard",
    "text_langid_confusion",
    "text_pmi_collocations",
    # --- r11 cohort, oldest-evidence-next, name-ordered (19) ---------------
    "ann_lsh_topk",
    "corpus_pipeline",
    "curation_repetition",
    "dedup_clusters",
    "dedup_exact",
    "dedup_fuzzy_edit",
    "dedup_fuzzy_recall",
    "dedup_keep_best",
    "dedup_kept_corpus",
    "dedup_minhash_recall",
    "dedup_normalized",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "embedding_knn_graph",
    "monitor_schema_drift",
    "monitor_seasonal_anomaly",
    "privacy_t_closeness",
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
