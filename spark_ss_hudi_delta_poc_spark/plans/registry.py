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
# Round-7 rotation.  Slot 1: q90_stream_curation — CORRECTNESS_r06's one
# red row (partition-column bool->string drift), fixed this round via
# read_back; its fresh green row is the round's top goal.  Slots 2-5: the
# only four queries whose newest green evidence is r3
# (displaced from the r6 window: text_fingerprint + the three multimodal
# plumbing rows).  Slots 6-9: fresh regression rows for code touched this
# round — the winnow family (max_doc_chars guard) and the
# global_topk_with_rank rework consumers (bm25 / corpus_ngram_stats).
# Slots 6-13 include FIRST rows for the four operators added this round
# (dedup_semantic, curation_epoch_shuffle, multimodal_phash_pairs,
# corpus_dedup_report).  Slots 14-50: the 48 rows whose newest green
# evidence is r4, minus the eleven cheapest to displace to r8
# (unchanged map-only/function batteries, each covered by unit tests
# AND the in-repo oracle gate: q05/q08/q11/q61 datetime, q45 histogram,
# q74 zorder, q76 bit-aggs, q43 collect-arrays, q63 unpivot, and the
# q47/c4 map-only rule batteries) — keeping every
# join/window/streaming/TPC-H-topology r4 row in-window.
# After this round no registry query's newest external evidence is older
# than r4.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- the r6 red row, fixed this round (1) -------------------------
    "q90_stream_curation",
    # --- newest green row r3 (4) ----------------------------------------
    "text_fingerprint",
    "multimodal_meta",
    "multimodal_frames",
    "multimodal_resize",
    # --- code touched/ADDED this round: fresh + first rows (13) ---------
    "text_winnow_fingerprint",
    "dedup_winnow_pairs",
    "text_bm25_search",
    "corpus_ngram_stats",
    "dedup_semantic",
    "curation_epoch_shuffle",
    "multimodal_phash_pairs",
    "corpus_dedup_report",
    "embedding_prototypicality",
    "corpus_vocab_stats",
    "dedup_semantic_diverse",
    "curation_length_trim",
    "ann_ivf_q8_topk",
    # --- newest green row r4 (32 of 48; 16 displaced to r8) -------------
    "curation_gopher_rules",
    "dedup_containment",
    "q13_join_revenue",
    "q14_broadcast_dims",
    "q15_window_topn",
    "q16_rollup",
    "q17_asof_join",
    "q18_semi_anti",
    "q20_sessionize",
    "q23_pricing_summary",
    "q33_segment_topn",
    "q34_region_revenue",
    "q48_snapshot_diff",
    "q49_exists_daterange",
    "q50_filter_revenue",
    "q51_returned_top_customers",
    "q52_priority_shipmode",
    "q53_exact_median",
    "q55_asof_tolerance",
    "q56_cube",
    "q57_funnel",
    "q58_hourly_retention",
    "q59_sliding_window",
    "q66_stream_ttl_dedup",
    "q67_stream_topk",
    "q68_volume_shipping",
    "q69_market_share",
    "q70_waiting_suppliers",
    "q71_global_sales_opp",
    "q72_promo_revenue",
    "q73_disjunctive_join",
    "q75_grouping_sets",
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
