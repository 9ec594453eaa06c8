"""Tests for the capability queries that can't be oracle-hash-matched:
HLL approximate distinct (implementation-specific sketch) and
transcendental math (libm last-bit differences across engines)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ss_hudi_delta_poc_spark.plans import all_queries
from spark_ss_hudi_delta_poc_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_approx_distinct_error_bound(spark):
    """approx_count_distinct must land within 5% of the exact count
    (default rsd is 5%); q27 now computes that predicate in-engine."""
    row = all_queries()["q27_approx_distinct"].fn(spark, SF).collect()[0]
    exact = load(spark, SF, "lineitem").select("l_partkey").distinct().count()
    assert row.exact_partkeys == exact
    assert row.within_5pct is True


def test_q77_live_array_surface(spark):
    """The live array<string> aggregation surface behind q77: a real
    ArrayType column with sorted, distinct members (the registered q77
    '|'-joins it only because the external driver cannot hash list cells)."""
    from pyspark.sql.types import ArrayType, StringType

    from spark_ss_hudi_delta_poc_spark.plans.function_queries import q77_live

    df = q77_live(spark, SF)
    (typ,) = [f.dataType for f in df.schema.fields if f.name == "types_arr"]
    assert isinstance(typ, ArrayType) and isinstance(typ.elementType, StringType)
    rows = df.collect()
    assert rows, "user_id < 20 must match at sf0.001"
    for r in rows:
        assert r.types_arr == sorted(set(r.types_arr))


def test_transcendentals_close_to_duckdb(spark, duck):
    """ln/exp/pow are exercised with tolerance, not hash equality: libm
    implementations may differ in the final ulp across engines."""
    got = {
        r.event_id: (r.ln_v, r.exp_v, r.pow_v)
        for r in load(spark, SF, "events")
        .select(
            "event_id",
            F.log(F.col("value") + 1).alias("ln_v"),
            F.exp(F.col("value") / 1000).alias("exp_v"),
            F.pow(F.col("value"), 1.5).alias("pow_v"),
        )
        .collect()
    }
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.sql(
            "SELECT event_id, ln(value + 1), exp(value / 1000), pow(value, 1.5) FROM events"
        ).fetchall()
    }
    assert set(got) == set(want)
    for k in got:
        for g, w in zip(got[k], want[k]):
            assert abs(g - w) <= 1e-12 * max(1.0, abs(w)), (k, g, w)


def test_array_typed_results_match_duckdb(spark):
    """q43/q62 flatten arrays to '|'-joined strings for the driver's
    value hash (list cells can't be canonicalized there); this test keeps
    genuinely array-TYPED output covered end-to-end: Spark
    sort_array(collect_list(...)) per group must equal DuckDB
    list_sort(list(...)) element-for-element."""
    import duckdb

    got = {
        r.o_orderpriority: list(r.keys)
        for r in (
            load(spark, SF, "orders")
            .groupBy("o_orderpriority")
            .agg(F.sort_array(F.collect_list("o_orderkey")).alias("keys"))
            .collect()
        )
    }
    want = {
        prio: keys
        for prio, keys in duckdb.sql(
            f"""SELECT o_orderpriority, list_sort(list(o_orderkey))
                FROM '{SF}/orders.parquet' GROUP BY o_orderpriority"""
        ).fetchall()
    }
    assert got == want
