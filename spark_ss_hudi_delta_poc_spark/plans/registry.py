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
# (tools/verify_local.py, all SFs).  Round-4 rotation: rounds 1-3 left 15
# registry queries with no driver row ever (q66-q76 streaming/TPC-H/agg
# additions, containment, gopher, c4, q27) — they go first, so after this
# round every query has external-oracle evidence.  Guards: q20/q55 (the
# round-3 NTZ crashers, fixed in tables.load) and the new live-array
# surface q77.  The remaining slots refresh the oldest driver rows —
# the ts-consuming battery (highest-risk after the driver's events.ts
# encoding change) and the flagship relational/window set, all r2-green.
DRIVER_PRIORITY: tuple[str, ...] = (
    # never driver-checked (15): round-3 additions + rows-only q27
    "q66_stream_ttl_dedup",
    "q67_stream_topk",
    "q68_volume_shipping",
    "q69_market_share",
    "q70_waiting_suppliers",
    "q71_global_sales_opp",
    "q72_promo_revenue",
    "q73_disjunctive_join",
    "q74_zorder_values",
    "q75_grouping_sets",
    "q76_bit_aggregates",
    "dedup_containment",
    "curation_gopher_rules",
    "curation_c4_rules",
    "q27_approx_distinct",
    # guards: round-3 regressions (NTZ) + new array surface
    "q20_sessionize",
    "q55_asof_tolerance",
    "q77_array_output",
    # ts-consuming battery refresh (r2 rows predate the ts encoding change)
    "q05_ts_roundtrip",
    "q08_epoch_roundtrip",
    "q11_datetime_battery",
    "q17_asof_join",
    "q35_moving_agg",
    "q36_resample_gapfill",
    "q37_rank_battery",
    "q38_lag_lead",
    "q57_funnel",
    "q58_hourly_retention",
    "q59_sliding_window",
    "q61_date_arith",
    # flagship relational/window/analytics refresh (r2-green)
    "q13_join_revenue",
    "q14_broadcast_dims",
    "q15_window_topn",
    "q16_rollup",
    "q18_semi_anti",
    "q23_pricing_summary",
    "q33_segment_topn",
    "q34_region_revenue",
    "q43_collect_arrays",
    "q45_histogram",
    "q47_quality_rules",
    "q48_snapshot_diff",
    "q49_exists_daterange",
    "q50_filter_revenue",
    "q51_returned_top_customers",
    "q52_priority_shipmode",
    "q53_exact_median",
    "q54_group_mode",
    "q56_cube",
    "q63_unpivot",
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
