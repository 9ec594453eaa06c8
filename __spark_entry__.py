"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (broadcast-dim join + shuffle join + agg)
                on /root/testdata/sf0.001.
queries()     — every implemented query/operator from SURVEY.md §2 and the
                beyond-reference LLM-pipeline set (plans/registry.py).
oracle_sql()  — matching DuckDB SQL for every SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this file by path with an arbitrary cwd — make the
# package resolvable regardless
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from spark_ss_hudi_delta_poc_spark.plans import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    qs = all_queries()
    return qs["q13_join_revenue"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + extensions."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(q.fn) for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted → driver does rows-only check)."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
