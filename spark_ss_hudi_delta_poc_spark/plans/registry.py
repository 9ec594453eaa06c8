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
# Round-6 rotation (closes the evidence gap): slots 1-20 are the LAST 20
# never-driver-checked round-5 queries (the staged queue); with the two
# round-6 additions also in the window, after this round every one of
# the 150 registry entries has an external green row.  Slots 21-50:
# first, fresh regression rows for the operators
# whose CODE changed this round — the MinHash family rewrite
# (dedup_minhash_lsh; dedup_minhash_recall is in the queue), the
# global-top-k rework (corpus_ngram_stats; text_bm25_search queued), and
# the broadcast->shuffle rework (text_tfidf_keywords) — then the rows
# whose newest green evidence is oldest (r3).  Displaced to the in-repo
# gate (keeping green driver rows r4/r5): the reference battery
# (q01-q09, refreshed r5), the streaming set (r5), the TPC-H topology
# (r4/r5), and the cheapest r3 rows to displace — text_fingerprint,
# multimodal_meta/frames/resize (unchanged map-only/mapInPandas
# plumbing, triple-covered by tests) — making room for first rows for
# the two operators ADDED this round (ann_ivf_kmeans_topk,
# dedup_winnow_pairs).
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- never driver-checked (20): the staged round-5 queue ------------
    "dedup_segments",
    "dedup_repeated_spans",
    "dedup_normalized",
    "curation_model_filter",
    "curation_rebalance",
    "curation_decontaminated",
    "curation_export_shards",
    "curation_filter_report",
    "curation_sample_weighted",
    "ann_quantized_topk",
    "ann_ivf_index_topk",
    "ann_lsh_multitable_topk",
    "ann_recall_report",
    "dedup_minhash_recall",
    "dedup_embedding_clusters_lsh",
    "embedding_knn_graph_lsh",
    "q78_approx_quantiles",
    "text_bm25_search",
    "q90_stream_curation",
    "q91_stream_ann_serving",
    # --- code changed/ADDED this round: fresh regression rows (4) -------
    "dedup_minhash_lsh",
    "corpus_ngram_stats",
    "ann_ivf_kmeans_topk",
    "dedup_winnow_pairs",
    # --- newest green row r3 (26) ---------------------------------------
    "text_tfidf_keywords",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "curation_pack_sequences",
    "curation_pretokens",
    "curation_sample_bernoulli",
    "curation_sample_stratified",
    "curation_source_mixture",
    "dedup_embedding_clusters",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_exact",
    "embedding_label_centroids",
    "multimodal_audio_meta",
    "q24_above_cust_avg",
    "q25_set_ops",
    "q26_pivot",
    "q29_string_battery",
    "q30_math_battery",
    "q62_regexp_extract_all",
    "text_chunking",
    "text_language_id",
    "text_quality_score",
    "text_scrub_pii",
    "text_token_counts",
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
