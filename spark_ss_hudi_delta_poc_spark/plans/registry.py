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


def all_queries() -> dict[str, Query]:
    """Assemble the full registry (import here to avoid cycles)."""
    from . import (
        analytics_queries,
        function_queries,
        llm_queries,
        reference_queries,
        relational_queries,
        streaming_queries,
    )

    out: dict[str, Query] = {}
    for mod in (
        reference_queries,
        relational_queries,
        analytics_queries,
        function_queries,
        llm_queries,
        streaming_queries,
    ):
        for q in mod.QUERIES:
            if q.name in out:
                raise ValueError(f"duplicate query name {q.name}")
            out[q.name] = q
    return out
