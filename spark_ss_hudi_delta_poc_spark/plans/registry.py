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
# Round-12 rotation — VERDICT r11 #2, the committed round-12 queue
# (32 remaining r6-cohort rows, then r7 oldest-first).  Rotation rule
# unchanged: (a) first rows for operators with ZERO external evidence,
# (b) fresh rows for plans materially changed since their newest row,
# (c) then oldest-evidence-first (name order breaks ties inside a
# cohort, matching the committed queue listing).
#   Slot 1: fresh row for q104_stream_fuzzy_ingest — its plan changes
#     THIS round (VERDICT r11 #1: the live ingest now folds committed
#     band increments into the bucketed base and probes base + recent
#     deltas instead of re-unioning the whole band history), so the
#     rule-(b) precedent (q19/q60 in round 11) gives it a fresh row
#     ahead of the refresh cohort.
#   Slot 2: FIRST row for curation_dsir (round-12 operator: DSIR-style
#     importance resampling — same-round evidence per the late-landing-
#     operator rule; displaces q20_sessionize, the newest r7 row, into
#     the round-13 queue).
#   Slot 3: FIRST row for curation_unimax (round-12 operator: UniMax
#     epoch-capped token-budget waterfill — same rule; displaces
#     q18_semi_anti, the newest remaining r7 row, into the round-13
#     queue).
#   Slot 4: FIRST row for q106_stream_unimax (round-12 operator:
#     always-current UniMax recipe via replace-state per-source counts
#     — same rule; displaces q17_asof_join into the round-13 queue).
#   Slots 5-36: the 32 remaining r6-cohort rows, exactly the committed
#     queue (including curation_sample_stratified, q26_pivot and
#     dedup_embedding_cosine, displaced from the round-11 window by
#     the round-11 operators).  Evidence histogram max age drops to r7.
#   Slots 37-50: the 14 name-ordered oldest-r7 rows.
#
# Round-13 rotation queue: the remaining 23 r7-cohort rows
# (q17_asof_join, q18_semi_anti and q20_sessionize — displaced from
# this window by the three round-12 operators —
# q23_pricing_summary, q48_snapshot_diff, q49_exists_daterange,
# q50_filter_revenue, q52_priority_shipmode, q53_exact_median,
# q55_asof_tolerance, q56_cube, q57_funnel, q58_hourly_retention,
# q59_sliding_window, q66_stream_ttl_dedup, q67_stream_topk,
# q68_volume_shipping, q71_global_sales_opp, q75_grouping_sets,
# q90_stream_curation, text_bm25_search, text_fingerprint,
# text_winnow_fingerprint), then r8 oldest-first (name order); any
# operator added in round 13 takes a first-row slot ahead of the
# refresh rows.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- fresh row for the plan changed this round (1) ---------------------
    "q104_stream_fuzzy_ingest",
    # --- FIRST rows for this round's new operators (3) ---------------------
    "curation_dsir",
    "curation_unimax",
    "q106_stream_unimax",
    # --- r6 cohort refresh: the 32 remaining rows, committed queue (32) ----
    "ann_ivf_index_topk",
    "ann_lsh_multitable_topk",
    "curation_export_shards",
    "curation_filter_report",
    "curation_model_filter",
    "curation_pack_sequences",
    "curation_pretokens",
    "curation_rebalance",
    "curation_sample_bernoulli",
    "curation_sample_stratified",
    "curation_sample_weighted",
    "curation_source_mixture",
    "dedup_embedding_clusters",
    "dedup_embedding_clusters_lsh",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_repeated_spans",
    "embedding_knn_graph_lsh",
    "embedding_label_centroids",
    "multimodal_audio_meta",
    "q24_above_cust_avg",
    "q25_set_ops",
    "q26_pivot",
    "q29_string_battery",
    "q30_math_battery",
    "q62_regexp_extract_all",
    "q78_approx_quantiles",
    "text_chunking",
    "text_language_id",
    "text_scrub_pii",
    "text_tfidf_keywords",
    "text_token_counts",
    # --- r7 cohort, oldest-evidence-next, name-ordered (14) ----------------
    "corpus_ngram_stats",
    "corpus_vocab_stats",
    "curation_gopher_rules",
    "curation_length_trim",
    "dedup_semantic",
    "dedup_semantic_diverse",
    "embedding_prototypicality",
    "multimodal_frames",
    "multimodal_meta",
    "multimodal_resize",
    "q13_join_revenue",
    "q14_broadcast_dims",
    "q15_window_topn",
    "q16_rollup",
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
