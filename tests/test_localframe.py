"""local_df (round-15 optimization): tiny driver-side frames must be
Arrow LOCAL RELATIONS — same rows/schema as the classic builder, but a
LocalTableScan plan with no Python-RDD scan (the per-task Python-runner
handshake that cost 5-7 s per 16-row metadata write in every cross-run
ingest trigger)."""

import datetime

import pytest

from spark_ss_hudi_delta_poc_spark.functions.localframe import local_df


CASES = [
    ([(1, [1, 2, 3]), (2, [4, 5, 6])], "cid long, qv array<long>"),
    ([(0, "a"), (1, "b")], "seg_idx long, segment string"),
    ([(1, 2.5, None), (2, None, "x")], "a long, x double, s string"),
    ([], "bucket long, next_offset long"),
    (
        [(datetime.datetime(2024, 1, 2, 3, 4, 5), True)],
        "t timestamp, f boolean",
    ),
]


@pytest.mark.parametrize("rows,schema", CASES)
def test_matches_classic_builder(spark, rows, schema):
    got = local_df(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_plans_local_table_scan_not_python_rdd(spark):
    df = local_df(spark, [(1, [1, 2])], "cid long, qv array<long>")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "ExistingRDD" not in plan


def test_struct_type_schema(spark):
    want = spark.createDataFrame([(1, "a")], "g long, k string")
    got = local_df(spark, [(1, "a")], want.schema)
    assert got.schema == want.schema
    assert got.collect() == want.collect()


def test_fallback_on_unconvertible_rows(spark):
    # a value Arrow cannot coerce to the declared type must still build
    # through the classic path, preserving pre-optimization behavior
    rows = [({"k": 1},)]
    got = local_df(spark, rows, "m map<string,long>")
    assert got.collect()[0][0] == {"k": 1}
