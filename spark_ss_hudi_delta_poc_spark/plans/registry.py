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
# Round-9 rotation — VERDICT r8 #4: burn down the external-evidence
# backlog before the surface grows.  Slots 1-29: FIRST rows for the 29
# late-round-8 operators that never had a driver row (the full r8 queue,
# verbatim).  Slots 30-31: fresh rows for the two streaming plans fixed
# per VERDICT r8 #1/#2 that are NOT already in the backlog —
# q44_stream_static_join (row-per-user broadcast replaced by a bounded
# 3-row segment dim, bucket key derived map-side) and
# q21_stream_session_window (complete-mode memory sink replaced by
# append-mode eviction into a file sink); the other two fixed plans
# (q94 #2, q100 #3) are backlog members and get their first rows above.
# Slots 32-41: the ten de-hinted TPC-H/analytics rows displaced twice
# (r8 amendment): q51/q69/q70/q72/q73/q81/q85/q86/q87 + q83.
# Slots 42-43: fresh rows for the two plans changed by this round's
# winnow df-cap fix (broadcast anti-join of the FREQUENT fingerprint
# set): dedup_winnow_pairs and its composite corpus_dedup_report.
# Slots 44-47: first rows for the four operators added this round
# (scd2_as_of time travel, q101 skew-salted join, privacy_l_diversity,
# monitor_freshness) — held to four so the backlog clears first (r8
# verdict's explicit cap).  Slots 48-50: the oldest-evidence rows (r5).
# Queries whose only change was the round-9 ExistingRDD limit
# certificates (ann_ivf_index/q8, embedding_prototypicality,
# sketch_hll_distinct, q99, sketch_hll_by_type) keep their r8 rows —
# values verified identical at 3 SFs, the tightened gate pins the plans;
# sketch_hll_by_type and q99 get first rows here anyway as backlog
# members.
#
# Round-10 rotation queue: FIRST rows for the six late-round-9
# operators (privacy_t_closeness, monitor_schema_drift,
# q102_salted_distinct_agg, dedup_fuzzy_edit, monitor_seasonal_anomaly,
# dedup_fuzzy_recall — all 3-SF oracle-green
# in-repo, added after the 50-slot window was already committed to the
# 29-query backlog), then rows whose newest evidence after this round
# is r5 (q04_dup_having, q06_filter, q07_explode_flatten,
# q09_json_roundtrip, q10_stream_global_agg, q12_stream_roundtrip,
# q13_join_revenue, q14_broadcast_dims, q15_window_topn, ... — the
# remaining r5 cohort), then r6.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- first rows: the 29-query late-round-8 backlog (29) --------------
    "text_langid_confusion",
    "curation_contamination_report",
    "embedding_norm_stats",
    "corpus_bpe_pair_counts",
    "curation_sample_exact_n",
    "q93_zone_map_skipping",
    "q94_stream_dup_rate",
    "dedup_minhash_histogram",
    "q97_stream_bloom_ingest",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_rerank_topk",
    "embedding_top_direction",
    "text_pmi_collocations",
    "sketch_kmv_jaccard",
    "bloom_join_reduction",
    "monitor_category_drift",
    "scd2_history",
    "q98_stream_late_data",
    "graph_triangles",
    "monitor_value_outliers",
    "sketch_hll_by_type",
    "q99_group_heavy_hitters",
    "privacy_k_anonymity",
    "ann_pq_index_topk",
    "multimodal_audio_pairs",
    "curation_ccnet_buckets",
    "q100_stream_scd2",
    "embedding_centroid_confusion",
    # --- streaming plans fixed this round, VERDICT r8 #1/#2 (2) ----------
    "q44_stream_static_join",
    "q21_stream_session_window",
    # --- the twice-displaced de-hinted TPC-H rows (10) -------------------
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
    # --- winnow df-cap plans changed this round (2) ----------------------
    "dedup_winnow_pairs",
    "corpus_dedup_report",
    # --- first rows for this round's four new operators (4) --------------
    "scd2_as_of",
    "q101_salted_skew_join",
    "privacy_l_diversity",
    "monitor_freshness",
    # --- oldest-evidence rows, r5 (3) ------------------------------------
    "q01_count",
    "q02_group_count",
    "q03_distinct_count",
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
