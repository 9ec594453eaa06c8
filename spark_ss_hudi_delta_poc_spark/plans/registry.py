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
# (tools/verify_local.py, all SFs).  Rounds 1-2 burned that budget on the
# relational/function set (now twice driver-green), while the novel half
# — dedup / similarity / text / multimodal / streaming and q24-q30 —
# never got a driver row.  Order the never-checked queries first, plus a
# guard set of the trickiest previously-green ones (q62's NULL-vs-empty
# fix stays under the driver; flagship join; datetime/asof/window
# batteries), so the driver's 50 now covers the highest-risk surface.
DRIVER_PRIORITY: tuple[str, ...] = (
    # never driver-checked: relational/function stragglers
    "q24_above_cust_avg",
    "q25_set_ops",
    "q26_pivot",
    # q27_approx_distinct is rows-only (no oracle) — a driver row adds
    # almost no signal, so it yields its window slot to oracle-backed ops
    "q29_string_battery",
    "q30_math_battery",
    # never driver-checked: LLM-pipeline dedup/similarity
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_embedding_clusters",
    "dedup_kept_corpus",
    "dedup_keep_best",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_label_centroids",
    # never driver-checked: text analysis / corpus ops
    "corpus_pipeline",
    "text_language_id",
    "text_quality_score",
    "text_token_counts",
    "text_fingerprint",
    "corpus_ngram_stats",
    "text_tfidf_keywords",
    "text_chunking",
    "text_scrub_pii",
    "text_winnow_fingerprint",
    # never driver-checked: corpus curation (round-3 additions)
    "curation_contamination",
    "curation_sample_bernoulli",
    "curation_sample_stratified",
    "curation_repetition",
    "curation_pretokens",
    "curation_source_mixture",
    "curation_pack_sequences",
    # never driver-checked: multimodal plumbing
    "multimodal_meta",
    "multimodal_resize",
    "multimodal_audio_meta",
    "multimodal_frames",
    # never driver-checked: streaming surface
    "q10_stream_global_agg",
    "q12_stream_roundtrip",
    "q19_stream_windowed_agg",
    "q21_stream_session_window",
    "q31_stream_stream_join",
    "q44_stream_static_join",
    "q60_stream_materialized_latest",
    "q22_stream_dedup",
    # guard: the one twice-green query with a this-round oracle fix (the
    # flagship q13 is separately smoke-checked by entry() every round)
    "q62_regexp_extract_all",
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
