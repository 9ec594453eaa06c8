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
# Round-16 window (optimization round 2 of 2) — no new operators, so
# rule (a) contributes nothing and rule (b) leads: FRESH rows for every
# plan the round-15/-16 optimizers materially changed (VERDICT r15 #8
# named q111, q113, curation_dsir, q107, ann_recall_report, q104, q110 —
# the r15-touched rows its sample missed; round 16 adds its own touched
# rows q103/q100/q60 (bucketed-write repartition pinning), q110 (fused
# tokenize), ann_recall_report (shared corpus materialization), q113/
# q115 (retrain corpus persist), q104 (probe persisted)).  Then rule
# (c): the r11 cohort (evidence-oldest, name-ordered; q103/q60 already
# seated by rule (b)), then r12 oldest-first (name order) to fill 50.
#
# Round-17 rotation queue (staged): the remaining r12-cohort rows in
# name order (corpus_ngram_stats onward minus those seated below), then
# r13 oldest-first; any operator added in round 17 takes a first-row
# slot ahead of the refresh rows.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- rule (b): materially-changed plans, fresh evidence (11) -----------
    "q103_stream_scd2_compacting",
    "q104_stream_fuzzy_ingest",
    "q110_stream_bm25",
    "ann_recall_report",
    "q111_stream_ann_index",
    "q113_stream_ann_retrain",
    "q115_stream_ann_autoretrain",
    "curation_dsir",
    "q107_stream_dsir",
    "q100_stream_scd2",
    "q60_stream_materialized_latest",
    # --- rule (c): r11 cohort remainder, name-ordered (30) -----------------
    "q04_dup_having",
    "q06_filter",
    "q07_explode_flatten",
    "q09_json_roundtrip",
    "q102_salted_distinct_agg",
    "q105_stream_bottomk_sample",
    "q10_stream_global_agg",
    "q12_stream_roundtrip",
    "q19_stream_windowed_agg",
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
    "q91_stream_ann_serving",
    "text_quality_score",
    "text_rare_token_stats",
    # --- rule (c): r12 cohort, oldest-next, name-ordered (9) ---------------
    "ann_ivf_index_topk",
    "ann_lsh_multitable_topk",
    "corpus_ngram_stats",
    "corpus_vocab_stats",
    "curation_export_shards",
    "curation_filter_report",
    "curation_gopher_rules",
    "curation_length_trim",
    "curation_model_filter",
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
