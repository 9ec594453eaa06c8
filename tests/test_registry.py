"""Registry-shape invariants: the external correctness driver verifies
the FIRST 50 registry entries, so ordering is part of the contract."""

from __future__ import annotations

from spark_ss_hudi_delta_poc_spark.plans import all_queries
from spark_ss_hudi_delta_poc_spark.plans.registry import DRIVER_PRIORITY


def test_driver_priority_fills_the_checked_window():
    qs = all_queries()
    names = list(qs)
    assert len(DRIVER_PRIORITY) == 50, "priority list must exactly fill the driver's window"
    assert names[:50] == list(DRIVER_PRIORITY)
    assert len(set(DRIVER_PRIORITY)) == 50


def test_oracle_coverage_is_total():
    qs = all_queries()
    rows_only = [n for n, q in qs.items() if q.oracle is None]
    assert rows_only == [], (
        "every registry query needs a DuckDB oracle (q27 wraps its HLL estimate "
        "in an in-engine acceptance predicate; q77 '|'-joins its array column); "
        f"rows-only found: {rows_only}"
    )


def test_query_names_are_unique_and_callable():
    qs = all_queries()
    assert len(qs) >= 99
    for name, q in qs.items():
        assert callable(q.fn) and q.name == name
