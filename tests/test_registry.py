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


def test_oracle_coverage_is_total_except_hll():
    qs = all_queries()
    rows_only = [n for n, q in qs.items() if q.oracle is None]
    assert rows_only == ["q27_approx_distinct"], (
        "every query except the HLL estimate needs a DuckDB oracle; "
        f"rows-only found: {rows_only}"
    )


def test_query_names_are_unique_and_callable():
    qs = all_queries()
    assert len(qs) >= 99
    for name, q in qs.items():
        assert callable(q.fn) and q.name == name
