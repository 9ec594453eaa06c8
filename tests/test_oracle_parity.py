"""Integration: every registry query hash-matches its DuckDB oracle at
sf0.001 — the in-repo version of the driver's correctness gate.

Round-2 lesson: this test MUST canonicalize through the same pandas path
as the driver (Spark ``toPandas()``, DuckDB ``.df()`` + ``canon_lines``
from tools/verify_local.py).  The previous ``collect()``/``fetchall()``
comparison coerced DuckDB HUGEINT to Python int and never exercised
``sort_values`` on list cells, silently passing 18 queries the driver
failed in round 1.
"""

from __future__ import annotations

import os
import sys

import pytest

from spark_ss_hudi_delta_poc_spark.plans import all_queries

from conftest import SF_SMOKE

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from verify_local import canon_lines  # noqa: E402

QS = all_queries()


@pytest.mark.parametrize("name", sorted(QS))
def test_query_matches_oracle(spark, duck, name):
    q = QS[name]
    spdf = q.fn(spark, SF_SMOKE).toPandas()
    if q.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        assert len(spdf) >= 0
        return
    dpdf = duck.sql(q.oracle).df()
    assert sorted(spdf.columns) == sorted(dpdf.columns)
    assert len(spdf) == len(dpdf)
    assert canon_lines(spdf) == canon_lines(dpdf)


def test_canon_val_is_dtype_sensitive():
    """Round-6 lesson (q90): the driver distinguishes a boolean True from
    the string 'true' (partition-directory read-back returns strings), so
    the local canonicalizer must too — the lax lowercase-bool form passed
    q90 locally at every SF while the driver failed it."""
    import numpy as np

    from verify_local import canon_val

    assert canon_val(True) != canon_val("true")
    assert canon_val(False) != canon_val("false")
    assert canon_val(np.bool_(True)) == canon_val(True)
    # the int/float and date/timestamp equivalences the driver DOES have
    # stay intact
    assert canon_val(np.int64(7)) == canon_val(7)
    assert canon_val(1.5) == canon_val(np.float64(1.5))
    assert canon_val(7) != canon_val(7.0)
