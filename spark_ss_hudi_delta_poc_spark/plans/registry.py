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
# (tools/verify_local.py, all SFs).  Round-5 rotation: bank first green rows
# for q27 (newly oracle-backed via the in-engine acceptance predicate), q77
# (newly '|'-joined), and the 11 queries ADDED this round (TPC-H q79-q87 +
# the kNN graph + rare-token stats — never driver-checked); refresh the 15
# queries whose newest green row is still r2 (the q01-q09 reference battery
# + q32 etc. — they predate the driver's events.ts/testdata regeneration),
# the r3-row streaming set, and the shingle-consuming operators whose code
# the round-5 n-gram rewrite touched (their fresh driver rows are that
# change's regression gate).  Displaced to the in-repo gate (keeping their
# r3-green driver rows): q24/q25/q26/q29/q30/q62 and the ops that do NOT
# consume the rewritten shingle builder (pretokens, sampling, mixture,
# packing, exact dedup, tfidf, fingerprint).
#
# ROUND-6 ROTATION QUEUE (never driver-checked; all green in the in-repo
# gate at sf0.001+sf0.01, several also at sf0.1): dedup_segments,
# dedup_repeated_spans, dedup_normalized, curation_model_filter,
# curation_rebalance, curation_decontaminated, curation_export_shards,
# ann_quantized_topk, ann_ivf_index_topk, ann_lsh_multitable_topk,
# ann_recall_report, dedup_minhash_recall, dedup_embedding_clusters_lsh,
# embedding_knn_graph_lsh, curation_filter_report,
# curation_sample_weighted, q90_stream_curation, q91_stream_ann_serving.
# Swap them in next round for entries that will
# then hold fresh r5 rows.
DRIVER_PRIORITY: tuple[str, ...] = (
    # never green: newly oracle-backed this round
    "q27_approx_distinct",
    "q77_array_output",
    # never checked: added this round
    "q79_custorder_distribution",
    "q80_top_supplier",
    "q81_small_qty_revenue",
    "q82_large_volume_customers",
    "q83_product_profit",
    "q84_important_parts",
    "q85_supplier_part_counts",
    "q86_promo_part_suppliers",
    "q87_min_price_supplier",
    "embedding_knn_graph",
    "text_rare_token_stats",
    "q88_range_join",
    "q89_heavy_hitters",
    # newest green row r2 (15): reference battery + oldest function queries
    "q01_count",
    "q02_group_count",
    "q03_distinct_count",
    "q04_dup_having",
    "q06_filter",
    "q07_explode_flatten",
    "q09_json_roundtrip",
    "q32_upsert_snapshot",
    "q39_conditional_battery",
    "q40_array_battery",
    "q41_hash_split",
    "q42_profile_table",
    "q46_edit_distance",
    "q64_conditional_distinct",
    "q65_string_agg",
    # r3-row streaming set (8)
    "q10_stream_global_agg",
    "q12_stream_roundtrip",
    "q19_stream_windowed_agg",
    "q21_stream_session_window",
    "q22_stream_dedup",
    "q31_stream_stream_join",
    "q44_stream_static_join",
    "q60_stream_materialized_latest",
    # shingle-consuming operators (regression gate for the n-gram rewrite)
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_clusters",
    "dedup_kept_corpus",
    "dedup_keep_best",
    "curation_contamination",
    "curation_repetition",
    "corpus_pipeline",
    "text_winnow_fingerprint",
    "corpus_ngram_stats",
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
