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
# Round-11 rotation — VERDICT r10 #1 (the committed round-10 queue,
# which round 10 wrote as a comment but never shipped).  Rotation rule:
# (a) first rows for operators with ZERO external evidence, (b) fresh
# rows for plans materially changed since their newest row, (c) then
# oldest-evidence-first.
#   Slots 1-6: FIRST rows for the six late-round-9 operators
#     (privacy_t_closeness, monitor_schema_drift,
#     q102_salted_distinct_agg, dedup_fuzzy_edit,
#     monitor_seasonal_anomaly, dedup_fuzzy_recall) — with these the
#     cumulative external evidence reaches 215/215.
#   Slots 7-8: the two plans materially changed in round 10 that the
#     stale window missed — q19_stream_windowed_agg (complete-mode
#     memory sink → append mode + watermark eviction + file sink) and
#     q60_stream_materialized_latest (version key long → DECIMAL(38,0)
#     2^64 packing, a schema-affecting change).
#   Slots 9-41: the rest of the r5 cohort (newest evidence 6 rounds
#     old): the reference kernels q04-q12 first, then the remaining r5
#     analytics/LLM rows.
#   Slots 42-47: oldest-evidence-next (r6 cohort), one per family:
#     core dedup kernels, recall monitor, streaming ANN serving, LSH
#     top-k, text quality.
#   Slots 48-50: FIRST rows for this round's three new operators
#     (q103_stream_scd2_compacting, q104_stream_fuzzy_ingest,
#     q105_stream_bottomk_sample — same-round evidence per the
#     late-landing-operator rule; q105 takes the sampling-family slot
#     curation_sample_stratified held).
#
# Round-12 rotation queue: the remaining 32 r6-cohort rows
# (ann_ivf_index_topk, ann_lsh_multitable_topk,
# curation_export_shards, curation_filter_report,
# curation_model_filter, curation_pack_sequences, curation_pretokens,
# curation_rebalance, curation_sample_bernoulli,
# curation_sample_stratified, curation_sample_weighted,
# curation_source_mixture, dedup_embedding_clusters,
# dedup_embedding_clusters_lsh, dedup_embedding_cosine,
# dedup_embedding_lsh, dedup_repeated_spans, embedding_knn_graph_lsh,
# embedding_label_centroids, multimodal_audio_meta, q24_above_cust_avg,
# q25_set_ops, q26_pivot, q29_string_battery, q30_math_battery,
# q62_regexp_extract_all, q78_approx_quantiles, text_chunking,
# text_language_id, text_scrub_pii, text_tfidf_keywords,
# text_token_counts — including the three displaced from this window
# by the round-11 operators), then r7 oldest-first; any operator added
# in round 12 takes a first-row slot ahead of the refresh rows.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- first rows: the six late-round-9 operators (6) ------------------
    "privacy_t_closeness",
    "monitor_schema_drift",
    "q102_salted_distinct_agg",
    "dedup_fuzzy_edit",
    "monitor_seasonal_anomaly",
    "dedup_fuzzy_recall",
    # --- fresh rows for the round-10-changed plans (2) --------------------
    "q19_stream_windowed_agg",
    "q60_stream_materialized_latest",
    # --- r5 cohort refresh: reference kernels first (33) ------------------
    "q04_dup_having",
    "q06_filter",
    "q07_explode_flatten",
    "q09_json_roundtrip",
    "q10_stream_global_agg",
    "q12_stream_roundtrip",
    "q22_stream_dedup",
    "q27_approx_distinct",
    "q31_stream_stream_join",
    "q32_upsert_snapshot",
    "q39_conditional_battery",
    "q40_array_battery",
    "q41_hash_split",
    "q42_profile_table",
    "q46_edit_distance",
    "q64_conditional_distinct",
    "q65_string_agg",
    "q77_array_output",
    "q79_custorder_distribution",
    "q80_top_supplier",
    "q82_large_volume_customers",
    "q84_important_parts",
    "q88_range_join",
    "q89_heavy_hitters",
    "corpus_pipeline",
    "curation_repetition",
    "dedup_clusters",
    "dedup_keep_best",
    "dedup_kept_corpus",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "embedding_knn_graph",
    "text_rare_token_stats",
    # --- r6 cohort, oldest-evidence-next, one per family (6) --------------
    "dedup_exact",
    "dedup_normalized",
    "dedup_minhash_recall",
    "q91_stream_ann_serving",
    "ann_lsh_topk",
    "text_quality_score",
    # --- first rows for this round's three new operators (3) --------------
    "q103_stream_scd2_compacting",
    "q104_stream_fuzzy_ingest",
    "q105_stream_bottomk_sample",
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
