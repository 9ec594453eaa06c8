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
# Round-9 rotation queue (first-row candidates — added late in round 8
# with full in-repo 3-SF oracle evidence but no window slot left):
# text_langid_confusion, curation_contamination_report,
# embedding_norm_stats, corpus_bpe_pair_counts, curation_sample_exact_n,
# q93_zone_map_skipping, q94_stream_dup_rate.  Then the rows whose
# newest evidence is r5.
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
    # --- de-hinted TPC-H/analytics plans (12) ----------------------------
    "q33_segment_topn",
    "q34_region_revenue",
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
