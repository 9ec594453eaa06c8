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
# Round-13 rotation — VERDICT r12 #1, the committed round-13 queue
# (23 remaining r7-cohort rows, then r8 oldest-first to fill 50).
# Rotation rule unchanged: (a) first rows for operators with ZERO
# external evidence, (b) fresh rows for plans materially changed since
# their newest row, (c) then oldest-evidence-first (name order breaks
# ties inside a cohort, matching the committed queue listing).
#   Slots 1-5: FIRST rows for the round-13 operators (late-landing-
#     operator rule, same-round evidence): q107_stream_dsir (the DSIR
#     cross-run streaming twin, VERDICT r12 #5), curation_temperature
#     (T=2 temperature-scaled source sampling, the mT5/XLM-R rule),
#     q108_stream_temperature (its streaming twin over q106's counts
#     state), q109_stream_drift (the category-drift monitor's
#     streaming twin over per-second counts state) and
#     q110_stream_bm25 (the always-current BM25 keyword index).  They
#     displace q34_region_revenue, q11_datetime_battery,
#     q08_epoch_roundtrip, q05_ts_roundtrip and multimodal_phash_pairs
#     — the last r8 names in the window — into the round-14 queue.
#   Slot 6: fresh row for q104_stream_fuzzy_ingest — its plan changed
#     THIS round (VERDICT r12 #4: the band base + retired snapshot now
#     fold through the unified generic fold layer — one manifest, one
#     folded set — and the probe resolves tiers from the generic
#     manifest with per-tier pp moduli), so rule (b) gives it a fresh
#     row; displaces q33_segment_topn into the round-14 queue.
#   Slots 7-29: the 23 remaining r7-cohort rows, exactly the committed
#     queue (q17_asof_join, q18_semi_anti and q20_sessionize were
#     displaced from the round-12 window by the three round-12
#     operators).  Evidence histogram max age drops to r8.
#   Slots 30-50: the name-ordered oldest-r8 rows that fill the window.
# Further late-landing round-13 operators and rule-(b) fresh rows take
# slots at the TOP of this window when they land, displacing the
# newest-evidence tail rows (the last r8 names) into the round-14 queue
# — same mechanics as rounds 11/12.
#
# Round-14 rotation queue (staged — VERDICT r12 #6): the remaining
# r8-cohort rows (multimodal_phash_pairs, q05_ts_roundtrip,
# q08_epoch_roundtrip, q11_datetime_battery, q33_segment_topn and
# q34_region_revenue — displaced from this window by q104's fresh row
# and the five round-13 operators — q35_moving_agg, q36_resample_gapfill,
# q37_rank_battery, q38_lag_lead, q43_collect_arrays, q45_histogram,
# q47_quality_rules, q54_group_mode, q61_date_arith, q63_unpivot,
# q74_zorder_values, q76_bit_aggregates, q92_stream_decontaminate,
# q95_stream_hll_distinct, q96_stream_hll_ingest, sketch_bloom_filter,
# sketch_cms_topk, sketch_hll_distinct, sketch_kmv_distinct,
# text_ngram_lm_score, text_ngram_novelty, text_source_divergence,
# plus any rows displaced from this window by round-13 operators),
# then r10 oldest-first (name order) to fill 50; any operator added in
# round 14 takes a first-row slot ahead of the refresh rows.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- FIRST rows for this round's new operators (5) ----------------------
    "q107_stream_dsir",
    "curation_temperature",
    "q108_stream_temperature",
    "q109_stream_drift",
    "q110_stream_bm25",
    # --- rule-(b) fresh row: plan materially changed this round (1) ---------
    "q104_stream_fuzzy_ingest",
    # --- r7 cohort refresh: the 23 remaining rows, committed queue (23) ----
    "q17_asof_join",
    "q18_semi_anti",
    "q20_sessionize",
    "q23_pricing_summary",
    "q48_snapshot_diff",
    "q49_exists_daterange",
    "q50_filter_revenue",
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
    "q71_global_sales_opp",
    "q75_grouping_sets",
    "q90_stream_curation",
    "text_bm25_search",
    "text_fingerprint",
    "text_winnow_fingerprint",
    # --- r8 cohort, oldest-evidence-next, name-ordered (21) ----------------
    "ann_bruteforce_topk",
    "ann_ivf_kmeans_topk",
    "ann_ivf_q8_topk",
    "ann_ivf_topk",
    "ann_quantized_topk",
    "ann_recall_report",
    "curation_c4_rules",
    "curation_cluster_balance",
    "curation_contamination",
    "curation_decontaminated",
    "curation_epoch_shuffle",
    "curation_quality_deciles",
    "dedup_containment",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_prefix",
    "dedup_segments",
    "dedup_source_matrix",
    "embedding_covariance",
    "graph_pagerank",
    "multimodal_phash_clusters",
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
