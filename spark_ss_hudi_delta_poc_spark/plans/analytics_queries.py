"""Analytics breadth: multi-way joins (TPC-H Q3/Q5 shapes), time-series
resampling with gap fill, moving averages, and the ranking-function
battery.  All money values integer-scaled (money_e4) for engine-exact
aggregation; every window has a total order (unique key tie-break).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.joins import dim_join, money_e4
from ..tables import load
from .registry import Query


# --- q33: TPC-H Q3 shape — segment revenue top-10 ----------------------------
def q33(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", money_e4(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("rev_e4")
    )
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum("rev_e4").alias("revenue_e4"))
    )
    return joined.orderBy(F.col("revenue_e4").desc(), F.col("o_orderkey").asc()).limit(10)


# --- q34: TPC-H Q5 shape — 5-way join, revenue per nation --------------------
def q34(spark: SparkSession, sf: str) -> DataFrame:
    region = load(spark, sf, "region").where(F.col("r_name") == "ASIA").select("r_regionkey")
    nation = load(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    cust = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    supp = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    li = load(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        money_e4(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("rev_e4"),
    )
    nations_in_region = dim_join(nation, region, nation.n_regionkey == region.r_regionkey)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, (orders.o_custkey == cust.c_custkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nations_in_region), cust.c_nationkey == nations_in_region.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("rev_e4").alias("revenue_e4"), F.count(F.lit(1)).alias("n_lines"))
    )


# --- q35: moving aggregates over event time ----------------------------------
def q35(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select(
        "event_id", "user_id", "ts", F.floor(F.col("value") * 10000).cast("long").alias("v_e4")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    wcum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.sum("v_e4").over(w).alias("moving_sum_e4"),
        F.count(F.lit(1)).over(w).cast("long").alias("moving_n"),
        F.sum("v_e4").over(wcum).alias("running_sum_e4"),
    )


# --- q36: hourly resample with gap fill --------------------------------------
def q36(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(F.floor(F.col("value") * 10000).cast("long")).alias("v_e4")
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"), F.date_trunc("hour", F.max("ts")).alias("hi")
    )
    # dense hour spine via sequence-explode (gap fill with zeros): the
    # spine is tiny (one row per hour) and broadcast to the join
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    return spine.join(hourly, "h", "left").select(
        "h",
        F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        F.coalesce(F.col("v_e4"), F.lit(0)).alias("v_e4"),
    )


# --- q37: ranking battery ----------------------------------------------------
def q37(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_orderpriority", money_e4(F.col("o_totalprice")).alias("p_e4")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("p_e4").asc(), F.col("o_orderkey").asc())
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).alias("quartile"),
    )


# --- q38: lag/lead/first/last battery ---------------------------------------
def q38(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select(
        "event_id", "user_id", "ts", F.floor(F.col("value") * 10000).cast("long").alias("v_e4")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.lag("v_e4", 1).over(w).alias("prev_v"),
        F.lead("v_e4", 1).over(w).alias("next_v"),
        F.first("v_e4").over(wf).alias("first_v"),
        F.last("v_e4").over(wf).alias("last_v"),
        (F.col("v_e4") - F.lag("v_e4", 1).over(w)).alias("delta_v"),
    )


# --- q49: TPC-H Q4 shape — EXISTS with date-range filter ---------------------
def q49(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load(spark, sf, "lineitem").where(F.col("l_shipdate") > F.lit("1996-03-01")).select("l_orderkey")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --- q50: TPC-H Q6 shape — pure-filter revenue forecast ----------------------
def q50(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return (
        li.where(
            (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(money_e4(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- q51: TPC-H Q10 shape — returned-item top customers ----------------------
def q51(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").where(F.col("l_returnflag") == "R").select(
        "l_orderkey", money_e4(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("rev_e4")
    )
    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf, "customer").select("c_custkey", "c_name")
    out = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum("rev_e4").alias("revenue_e4"))
    )
    return out.orderBy(F.col("revenue_e4").desc(), F.col("c_custkey").asc()).limit(20)


# --- q52: TPC-H Q12 shape — priority counts by category ----------------------
def q52(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_linestatus")
    orders = load(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    high = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).alias("high_priority"),
            F.sum(1 - high).alias("low_priority"),
        )
    )


# --- q59: sliding-window distinct users --------------------------------------
def q59(spark: SparkSession, sf: str) -> DataFrame:
    """2-hour windows sliding every hour: distinct active users per window.
    Each event lands in exactly 2 windows (window explode is built-in);
    COUNT(DISTINCT) then groups per window start."""
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.countDistinct("user_id").alias("active_users"), F.count(F.lit(1)).alias("events"))
        .select(F.col("w.start").alias("window_start"), "active_users", "events")
    )


# --- q57: funnel analysis (ordered-step conversion) --------------------------
def q57(spark: SparkSession, sf: str) -> DataFrame:
    """signup → click → purchase funnel: per user take the FIRST time of
    each step, count users completing each prefix in order.  One shuffle
    (groupBy user) + a broadcastable three-row summary."""
    ev = load(spark, sf, "events")
    firsts = (
        ev.where(F.col("event_type").isin("signup", "click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
        )
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & F.col("t_click").isNotNull() & (F.col("t_click") > F.col("t_signup"))
    s3 = s2 & F.col("t_purchase").isNotNull() & (F.col("t_purchase") > F.col("t_click"))
    return firsts.agg(
        F.sum(s1.cast("int")).alias("step1_signup"),
        F.sum(s2.cast("int")).alias("step2_click_after"),
        F.sum(s3.cast("int")).alias("step3_purchase_after"),
    )


# --- q58: hourly cohort retention --------------------------------------------
def q58(spark: SparkSession, sf: str) -> DataFrame:
    """Of users active in hour H, how many were also active in H+1 —
    the adjacent-period retention join on 8-byte (user, hour) keys."""
    ev = load(spark, sf, "events")
    active = ev.select(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).distinct()
    nxt = active.select("user_id", (F.col("h") - F.expr("INTERVAL 1 HOUR")).alias("h"))
    retained = active.join(nxt, ["user_id", "h"], "left_semi")
    return (
        active.groupBy("h").agg(F.count(F.lit(1)).alias("active_users"))
        .join(
            retained.groupBy("h").agg(F.count(F.lit(1)).alias("retained_next_hour")),
            "h",
            "left",
        )
        .select("h", "active_users", F.coalesce("retained_next_hour", F.lit(0)).alias("retained_next_hour"))
    )


# --- q53: exact per-group median (order statistics without approx) -----------
def q53(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders").select(
        "o_orderpriority", money_e4(F.col("o_totalprice")).alias("p_e4")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("p_e4").asc())
    ranked = orders.select(
        "o_orderpriority",
        "p_e4",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("o_orderpriority")).alias("n"),
    )
    # lower median: element at ceil(n/2) — exact, deterministic, one sort
    return ranked.where(F.col("rn") == F.ceil(F.col("n") / 2)).select(
        "o_orderpriority", F.col("p_e4").alias("median_e4"), "n"
    )


# --- q78: approx quantiles with in-engine acceptance check -------------------
def q78(spark: SparkSession, sf: str) -> DataFrame:
    """percentile_approx — THE at-scale quantile estimator (mergeable
    sketch, no global sort) — validated in-engine against exact rank
    statistics: the output carries the exact lower quartiles plus a
    boolean asserting every approx value landed within 1% relative.
    Sketch internals are implementation-specific (can't hash-match an
    oracle), but the predicate is deterministic at accuracy=10000 —
    same pattern as q27's HLL check.  The exact side is a single global
    sort, affordable at validation SFs; at 100 TB only the sketch runs.
    """
    li = load(spark, sf, "lineitem").select(money_e4(F.col("l_extendedprice")).alias("p_e4"))
    w = Window.orderBy(F.col("p_e4").asc())
    ranked = li.select(
        "p_e4",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )

    def at(q: float):
        rank = F.ceil(F.col("n").cast("double") * F.lit(q)).cast("long")
        return F.max(F.when(F.col("rn") == rank, F.col("p_e4")))

    exact = ranked.agg(
        at(0.25).alias("q25_e4"),
        at(0.5).alias("q50_e4"),
        at(0.75).alias("q75_e4"),
        F.max("n").alias("n_rows"),
    )
    approx = li.agg(
        F.percentile_approx("p_e4", [0.25, 0.5, 0.75], 10000).alias("ap")
    )
    within = None
    for i, col in enumerate(["q25_e4", "q50_e4", "q75_e4"]):
        c = (
            F.abs(F.element_at("ap", i + 1).cast("double") - F.col(col).cast("double"))
            / F.col(col).cast("double")
            <= F.lit(0.01)
        )
        within = c if within is None else (within & c)
    return exact.crossJoin(F.broadcast(approx)).select(
        "q25_e4", "q50_e4", "q75_e4", "n_rows", within.alias("within_1pct")
    )


# --- q54: per-group mode (most frequent value, deterministic tie-break) ------
def q54(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("user_id").orderBy(F.col("c").desc(), F.col("event_type").asc())
    return counts.select("user_id", "event_type", "c", F.row_number().over(w).alias("rn")).where(
        F.col("rn") == 1
    ).select("user_id", F.col("event_type").alias("mode_type"), F.col("c").alias("mode_count"))


# --- q74: z-order layout z-values -------------------------------------------
def q74(spark: SparkSession, sf: str) -> DataFrame:
    """Morton z-values for (l_partkey, l_suppkey) on a 1% orderkey slice
    — the clustering key zorder_layout range-partitions by.  The bit
    interleave runs entirely in whole-stage codegen; the layout op
    itself (one range exchange + local sort) is covered by plan/cluster
    tests in tests/test_scale_ops.py."""
    from ..operators.partitioning import zvalue

    li = load(spark, sf, "lineitem").where(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        zvalue(F.col("l_partkey"), F.col("l_suppkey")).alias("zvalue"),
    )


def _q74_sql() -> str:
    from ..operators.partitioning import zvalue_sql

    return f"""
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
               {zvalue_sql('l_partkey', 'l_suppkey')} AS zvalue
        FROM lineitem WHERE l_orderkey % 100 = 0
        """


# --- q93: zone-map data skipping, z-order vs scatter -------------------------
ZONE_PRED_LO, ZONE_PRED_HI = 50, 120  # l_partkey range predicate


def q93(spark: SparkSession, sf: str) -> DataFrame:
    """The measurable WHY of z-ordering: per-zone min/max stats (the
    engine-side zone map — what a lakehouse persists as per-file column
    stats) evaluated against a partkey range predicate, under the
    z-ordered layout vs a hash-scattered one.  Z-order zones are compact
    (a, b) rectangles, so most prune; scattered zones each span the full
    value range, so none do.  Two <= n_zones-row aggregates over one
    scan; the scan decision runs ON the zone map, exactly as a lakehouse
    reader evaluates file stats."""
    from ..operators.partitioning import zone_scan_summary

    li = load(spark, sf, "lineitem")
    return zone_scan_summary(
        li,
        "l_partkey",
        "l_suppkey",
        F.col("l_orderkey") * 10 + F.col("l_linenumber"),
        ZONE_PRED_LO,
        ZONE_PRED_HI,
    )


def _q93_sql() -> str:
    from ..functions.hashing import md5_long_sql_duckdb
    from ..operators.partitioning import zvalue_sql

    zexpr = zvalue_sql("l_partkey", "l_suppkey")
    zzone = (
        f"(({zexpr}) * 64) // ((SELECT MAX({zexpr}) FROM lineitem) + 1)"
    )
    scat = f"({md5_long_sql_duckdb('CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)')}) % 64"
    def layer(zone_expr: str, layout: str) -> str:
        return f"""
        SELECT '{layout}' AS layout,
               COUNT(*) AS zones_total,
               CAST(SUM(CASE WHEN NOT (max_a < {ZONE_PRED_LO} OR min_a > {ZONE_PRED_HI})
                             THEN 1 ELSE 0 END) AS BIGINT) AS zones_scanned,
               CAST(SUM(n_rows) AS BIGINT) AS rows_total,
               CAST(SUM(CASE WHEN NOT (max_a < {ZONE_PRED_LO} OR min_a > {ZONE_PRED_HI})
                             THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
        FROM (SELECT {zone_expr} AS zone, COUNT(*) AS n_rows,
                     MIN(l_partkey) AS min_a, MAX(l_partkey) AS max_a
              FROM lineitem GROUP BY 1)"""
    return layer(zzone, "zorder") + "\nUNION ALL\n" + layer(scat, "scatter")


# --- q75: explicit grouping sets --------------------------------------------
Q75_SQL = """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
               CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(FLOOR(o_totalprice * 10000) AS BIGINT)) AS BIGINT) AS price_e4
        FROM {table}
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        """


def q75(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS (subtotal lattice chosen by hand, not the
    rollup/cube closures of q16/q56) with grouping() null-vs-subtotal
    markers — one Expand + one hash aggregate, no extra shuffles."""
    load(spark, sf, "orders").createOrReplaceTempView("orders_q75")
    return spark.sql(Q75_SQL.format(table="orders_q75"))


# --- q76: bitwise aggregate battery -----------------------------------------
def q76(spark: SparkSession, sf: str) -> DataFrame:
    """bit_or / bit_and / bit_xor aggregates per event_type — set-union
    semantics over bitmask columns (feature flags, permission masks),
    fully codegen'd with map-side partials like any hash aggregate."""
    ev = load(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.bit_or("user_id").alias("mask_or"),
        F.bit_and("user_id").alias("mask_and"),
        F.bit_xor("user_id").alias("mask_xor"),
        F.count(F.lit(1)).alias("cnt"),
    )


# --- q89: Misra-Gries heavy hitters with exact verify -----------------------
def q89(spark: SparkSession, sf: str) -> DataFrame:
    """Event types with frequency > N/5 via the sketch-then-verify path:
    per-partition Misra-Gries candidates (map-side, no shuffle of cold
    keys), bounded candidate collect, exact count of candidates only,
    integer cross-multiplied threshold.  The distribution sits ~N/5 per
    type, so the φ boundary genuinely discriminates (some types pass,
    some fail, varying with SF) — exactness of the verify step is what
    the oracle checks."""
    from ..operators.profiling import heavy_hitters

    return heavy_hitters(load(spark, sf, "events"), "event_type", phi_num=1, phi_den=5)


Q89_SQL = """
SELECT event_type, COUNT(*) AS cnt
FROM events
GROUP BY event_type
HAVING COUNT(*) * 5 > (SELECT COUNT(*) FROM events)
"""


QUERIES = [
    Query(
        "q59_sliding_window",
        q59,
        """
        WITH contrib AS (
          SELECT user_id,
                 unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR])
                   AS window_start
          FROM events
        )
        SELECT window_start,
               COUNT(DISTINCT user_id) AS active_users,
               COUNT(*) AS events
        FROM contrib GROUP BY window_start
        """,
        doc="2h windows sliding 1h: distinct active users per window (each "
        "event contributes to exactly 2 windows)",
        tags=("analytics", "window", "timeseries"),
    ),
    Query(
        "q57_funnel",
        q57,
        """
        WITH firsts AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
                 MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                 MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
          FROM events WHERE event_type IN ('signup', 'click', 'purchase')
          GROUP BY user_id
        )
        SELECT
          CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step1_signup,
          CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click IS NOT NULL
                        AND t_click > t_signup THEN 1 ELSE 0 END) AS BIGINT) AS step2_click_after,
          CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click IS NOT NULL
                        AND t_click > t_signup AND t_purchase IS NOT NULL
                        AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT) AS step3_purchase_after
        FROM firsts
        """,
        doc="ordered-step funnel conversion (signup → click → purchase)",
        tags=("analytics", "funnel"),
    ),
    Query(
        "q58_hourly_retention",
        q58,
        """
        WITH active AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events),
        retained AS (
          SELECT a.h, COUNT(*) AS retained_next_hour
          FROM active a
          WHERE EXISTS (SELECT 1 FROM active n
                        WHERE n.user_id = a.user_id AND n.h = a.h + INTERVAL 1 HOUR)
          GROUP BY a.h
        )
        SELECT active.h, COUNT(*) AS active_users,
               COALESCE(ANY_VALUE(retained.retained_next_hour), 0) AS retained_next_hour
        FROM active LEFT JOIN retained ON active.h = retained.h
        GROUP BY active.h
        """,
        doc="adjacent-hour cohort retention (semi-join on user+hour keys)",
        tags=("analytics", "retention"),
    ),
    Query(
        "q53_exact_median",
        q53,
        """
        WITH r AS (
          SELECT o_orderpriority,
                 CAST(FLOOR(o_totalprice * 10000) AS BIGINT) AS p_e4,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                    ORDER BY CAST(FLOOR(o_totalprice * 10000) AS BIGINT) ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
          FROM orders
        )
        SELECT o_orderpriority, p_e4 AS median_e4, n
        FROM r WHERE rn = CAST(CEIL(CAST(n AS DOUBLE) / 2) AS BIGINT)
        """,
        doc="exact per-group lower median via one sort + row_number (no "
        "approximate sketch, engine-deterministic)",
        tags=("analytics", "orderstat"),
    ),
    Query(
        "q78_approx_quantiles",
        q78,
        """
        WITH v AS (SELECT CAST(FLOOR(l_extendedprice * 10000) AS BIGINT) AS p_e4
                   FROM lineitem),
        r AS (SELECT p_e4, ROW_NUMBER() OVER (ORDER BY p_e4 ASC) AS rn,
                     COUNT(*) OVER () AS n FROM v)
        SELECT
          MAX(CASE WHEN rn = CAST(CEIL(CAST(n AS DOUBLE) * 0.25) AS BIGINT)
                   THEN p_e4 END) AS q25_e4,
          MAX(CASE WHEN rn = CAST(CEIL(CAST(n AS DOUBLE) * 0.5) AS BIGINT)
                   THEN p_e4 END) AS q50_e4,
          MAX(CASE WHEN rn = CAST(CEIL(CAST(n AS DOUBLE) * 0.75) AS BIGINT)
                   THEN p_e4 END) AS q75_e4,
          MAX(n) AS n_rows,
          TRUE AS within_1pct
        FROM r
        """,
        doc="percentile_approx (mergeable quantile sketch) with in-engine 1% "
        "acceptance vs exact rank stats — the q27 pattern for quantiles",
        tags=("analytics", "orderstat", "approx"),
    ),
    Query(
        "q54_group_mode",
        q54,
        """
        WITH c AS (SELECT user_id, event_type, COUNT(*) AS c FROM events
                   GROUP BY user_id, event_type)
        SELECT user_id, event_type AS mode_type, c AS mode_count
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY c DESC, event_type ASC) AS rn FROM c)
        WHERE rn = 1
        """,
        doc="per-group mode with alphabetical tie-break",
        tags=("analytics", "orderstat"),
    ),
    Query(
        "q49_exists_daterange",
        q49,
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1996-03-01')
        GROUP BY o_orderpriority
        """,
        doc="TPC-H Q4 shape: EXISTS semi-join with date-range predicates",
        tags=("analytics", "join"),
    ),
    Query(
        "q50_filter_revenue",
        q50,
        """
        SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
        """,
        doc="TPC-H Q6 shape: pure-filter aggregate (pushdown-friendly scan)",
        tags=("analytics", "filter"),
    ),
    Query(
        "q51_returned_top_customers",
        q51,
        """
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name
        ORDER BY revenue_e4 DESC, c_custkey ASC
        LIMIT 20
        """,
        doc="TPC-H Q10 shape: returned-item revenue, total-ordered top-20",
        tags=("analytics", "join"),
    ),
    Query(
        "q52_priority_shipmode",
        q52,
        """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_priority,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_priority
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_linestatus
        """,
        doc="TPC-H Q12 shape: conditional counts per category over a join",
        tags=("analytics", "join"),
    ),
    Query(
        "q33_segment_topn",
        q33,
        """
        SELECT o_orderkey, o_orderdate,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue_e4 DESC, o_orderkey ASC
        LIMIT 10
        """,
        doc="TPC-H Q3 shape: 3-way join, grouped revenue, total-ordered top-10",
        tags=("analytics", "join"),
    ),
    Query(
        "q34_region_revenue",
        q34,
        """
        SELECT n_name,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4,
               COUNT(*) AS n_lines
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        """,
        doc="TPC-H Q5 shape: 5-way join with broadcast dims + local-supplier predicate",
        tags=("analytics", "join"),
    ),
    Query(
        "q35_moving_agg",
        q35,
        """
        SELECT event_id, user_id,
               CAST(SUM(v_e4) OVER w4 AS BIGINT) AS moving_sum_e4,
               CAST(COUNT(*) OVER w4 AS BIGINT) AS moving_n,
               CAST(SUM(v_e4) OVER wc AS BIGINT) AS running_sum_e4
        FROM (SELECT event_id, user_id, ts,
                     CAST(FLOOR(value * 10000) AS BIGINT) AS v_e4 FROM events)
        WINDOW w4 AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
               wc AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING)
        """,
        doc="moving window + running cumulative aggregates per user",
        tags=("analytics", "window", "timeseries"),
    ),
    Query(
        "q36_resample_gapfill",
        q36,
        """
        WITH hourly AS (
          SELECT date_trunc('hour', ts) AS h, COUNT(*) AS cnt,
                 CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS BIGINT) AS v_e4
          FROM events GROUP BY 1
        ),
        bounds AS (SELECT date_trunc('hour', MIN(ts)) AS lo,
                          date_trunc('hour', MAX(ts)) AS hi FROM events),
        spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds)
        SELECT spine.h, COALESCE(cnt, 0) AS cnt, COALESCE(v_e4, 0) AS v_e4
        FROM spine LEFT JOIN hourly ON spine.h = hourly.h
        """,
        doc="hourly resample with dense spine + zero gap-fill",
        tags=("analytics", "timeseries"),
    ),
    Query(
        "q37_rank_battery",
        q37,
        """
        SELECT o_orderkey, o_orderpriority,
               CAST(rank() OVER w AS INTEGER) AS rnk,
               CAST(dense_rank() OVER w AS INTEGER) AS drnk,
               percent_rank() OVER w AS prnk,
               cume_dist() OVER w AS cd,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile
        FROM (SELECT o_orderkey, o_orderpriority,
                     CAST(FLOOR(o_totalprice * 10000) AS BIGINT) AS p_e4 FROM orders)
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY p_e4 ASC, o_orderkey ASC)
        """,
        doc="rank/dense_rank/percent_rank/cume_dist/ntile battery (total order)",
        tags=("analytics", "window"),
    ),
    Query(
        "q38_lag_lead",
        q38,
        """
        SELECT event_id, user_id,
               lag(v_e4, 1) OVER w AS prev_v,
               lead(v_e4, 1) OVER w AS next_v,
               first_value(v_e4) OVER wf AS first_v,
               last_value(v_e4) OVER wf AS last_v,
               v_e4 - lag(v_e4, 1) OVER w AS delta_v
        FROM (SELECT event_id, user_id, ts,
                     CAST(FLOOR(value * 10000) AS BIGINT) AS v_e4 FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
               wf AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        """,
        doc="lag/lead/first/last/delta navigation battery per user",
        tags=("analytics", "window"),
    ),
    Query(
        "q74_zorder_values",
        q74,
        _q74_sql(),
        doc="Morton z-order interleave of (partkey, suppkey) — the "
        "clustering key for 2-D data skipping; pure codegen bit ops",
        tags=("analytics", "layout"),
    ),
    Query(
        "q93_zone_map_skipping",
        q93,
        _q93_sql(),
        doc="zone-map data skipping ledger: zones/rows a reader touches "
        "for a partkey range under the z-ordered layout vs hash scatter "
        "— z-order zones are compact 2-D rectangles so most prune; "
        "scattered zones all span the full range so none do (the "
        "engine-side statement of per-file-stats pruning)",
        tags=("analytics", "layout"),
    ),
    Query(
        "q75_grouping_sets",
        q75,
        Q75_SQL.format(table="orders"),
        doc="explicit GROUPING SETS with grouping() markers — hand-picked "
        "subtotal lattice, single Expand+HashAggregate",
        tags=("analytics", "agg"),
    ),
    Query(
        "q76_bit_aggregates",
        q76,
        """
        SELECT event_type,
               CAST(bit_or(user_id) AS BIGINT) AS mask_or,
               CAST(bit_and(user_id) AS BIGINT) AS mask_and,
               CAST(bit_xor(user_id) AS BIGINT) AS mask_xor,
               COUNT(*) AS cnt
        FROM events GROUP BY event_type
        """,
        doc="bitwise OR/AND/XOR aggregates per group (bitmask set "
        "semantics) — codegen hash aggregate with map-side partials",
        tags=("analytics", "agg"),
    ),
    Query(
        "q89_heavy_hitters",
        q89,
        Q89_SQL,
        doc="exact φ-heavy hitters via per-partition Misra-Gries "
        "candidates + exact verify — never shuffles cold keys",
        tags=("analytics", "sketch", "agg"),
    ),
]


# --- mergeable-sketch family (operators/sketches.py) -------------------------
# Approximate-query-processing primitives next to their exact answers; the
# oracle reproduces every sketch bit-for-bit (shared md5 hash family, exact
# scaled-integer register sums, shared Python double literals — no libm).

from ..functions.hashing import (  # noqa: E402
    md5_long_sql_duckdb,
    seeded_md5_long_sql_duckdb,
)
from ..operators import sketches  # noqa: E402


def sketch_hll_q(spark: SparkSession, sf: str) -> DataFrame:
    return sketches.hll_distinct(load(spark, sf, "orders"), "o_custkey")


def sketch_kmv_q(spark: SparkSession, sf: str) -> DataFrame:
    return sketches.kmv_distinct(load(spark, sf, "lineitem"), "l_partkey")


def sketch_bloom_q(spark: SparkSession, sf: str) -> DataFrame:
    return sketches.bloom_membership(
        load(spark, sf, "orders"), load(spark, sf, "customer"), "o_custkey", "c_custkey"
    )


def sketch_cms_q(spark: SparkSession, sf: str) -> DataFrame:
    return sketches.cms_topk(load(spark, sf, "lineitem"), "l_suppkey")


def _hll_sql() -> str:
    h = md5_long_sql_duckdb("o_custkey")
    m, wb = sketches.HLL_M, sketches.HLL_W_BITS
    # the linear-counting lookup ships the SAME Python double literals the
    # Spark side joins — neither engine evaluates ln (their libm differ)
    lc_values = ", ".join(f"({v}, {e!r})" for v, e in sketches.hll_linear_counting_table())
    return f"""
    WITH k AS (SELECT ({h}) % {m} AS reg, ({h}) >> {sketches.HLL_P} AS w FROM orders),
    r AS (SELECT reg,
                 MAX(LEAST(length(regexp_extract(bin(w), '0*$')) + 1, {wb})) AS m_j
          FROM k GROUP BY reg),
    s AS (SELECT COUNT(*) AS n_hit,
                 CAST(SUM(1::BIGINT << ({wb} - m_j)) AS BIGINT) AS sum_hit
          FROM r),
    e AS (SELECT COUNT(DISTINCT o_custkey) AS exact_distinct FROM orders),
    lc(v, lc_est) AS (VALUES {lc_values}),
    base AS (
      SELECT {m} AS m,
             CAST({m} - n_hit AS BIGINT) AS n_zero_registers,
             CAST(sum_hit + ({m} - n_hit) * (1::BIGINT << {wb}) AS BIGINT) AS sum_scaled,
             {sketches.HLL_NUMERATOR!r} / CAST(sum_hit + ({m} - n_hit) * (1::BIGINT << {wb}) AS BIGINT)
               AS hll_raw_estimate,
             exact_distinct
      FROM s, e)
    SELECT b.m, b.n_zero_registers, b.sum_scaled, b.hll_raw_estimate,
           CASE WHEN b.hll_raw_estimate <= {sketches.HLL_LC_THRESHOLD!r}
                     AND b.n_zero_registers > 0
                THEN lc.lc_est ELSE b.hll_raw_estimate END AS hll_estimate,
           b.exact_distinct
    FROM base b LEFT JOIN lc ON b.n_zero_registers = lc.v
    """


def _kmv_sql() -> str:
    h = md5_long_sql_duckdb("l_partkey")
    k = sketches.KMV_K
    return f"""
    WITH d AS (SELECT DISTINCT {h} AS h FROM lineitem),
    s AS (SELECT h FROM d ORDER BY h ASC LIMIT {k}),
    a AS (SELECT COUNT(*) AS n_in, MAX(h) AS kth_hash FROM s),
    e AS (SELECT COUNT(DISTINCT l_partkey) AS exact_distinct FROM lineitem)
    SELECT {k} AS k, a.n_in AS n_in_sketch, a.kth_hash,
           CASE WHEN a.n_in < {k} THEN CAST(e.exact_distinct AS DOUBLE)
                ELSE {sketches.KMV_NUMERATOR!r} / a.kth_hash END AS kmv_estimate,
           e.exact_distinct
    FROM a, e
    """


def _bloom_sql() -> str:
    m, kk = sketches.BLOOM_M, sketches.BLOOM_K
    bpos = " UNION ALL ".join(
        f"SELECT bk, ({seeded_md5_long_sql_duckdb('bk', s)}) % {m} AS pos FROM bk"
        for s in range(kk)
    )
    ppos = " UNION ALL ".join(
        f"SELECT pk, ({seeded_md5_long_sql_duckdb('pk', s)}) % {m} AS pos FROM pk"
        for s in range(kk)
    )
    return f"""
    WITH bk AS (SELECT DISTINCT o_custkey AS bk FROM orders),
    bits AS (SELECT DISTINCT pos FROM ({bpos})),
    pk AS (SELECT DISTINCT c_custkey AS pk FROM customer),
    ppos AS (SELECT DISTINCT pk, pos FROM ({ppos})),
    claimed AS (SELECT p.pk,
                       MIN(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS all_set
                FROM ppos p LEFT JOIN bits b ON p.pos = b.pos GROUP BY p.pk),
    verdict AS (SELECT c.pk,
                       CASE WHEN c.all_set = 1 THEN 1 ELSE 0 END AS claimed,
                       CASE WHEN bk.bk IS NOT NULL THEN 1 ELSE 0 END AS member
                FROM claimed c LEFT JOIN bk ON c.pk = bk.bk),
    nb AS (SELECT COUNT(*) AS n_set_bits FROM bits),
    nk AS (SELECT COUNT(*) AS n_build_keys FROM bk),
    sm AS (SELECT COUNT(*) AS n_probes,
                  CAST(SUM(member) AS BIGINT) AS n_members,
                  CAST(SUM(claimed) AS BIGINT) AS n_claimed,
                  CAST(SUM(CASE WHEN claimed = 1 AND member = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_false_positives
           FROM verdict)
    SELECT {m} AS m_bits, {kk} AS k_hashes, nb.n_set_bits, nk.n_build_keys,
           sm.n_probes, sm.n_members, sm.n_claimed, sm.n_false_positives
    FROM sm, nb, nk
    """


def _cms_sql() -> str:
    w, k = sketches.CMS_W, sketches.CMS_TOP_K
    cells = " UNION ALL ".join(
        f"SELECT {r} AS r, ({seeded_md5_long_sql_duckdb('key', r)}) % {w} AS c FROM src"
        for r in range(sketches.CMS_D)
    )
    kc = " UNION ALL ".join(
        f"SELECT key, {r} AS r, ({seeded_md5_long_sql_duckdb('key', r)}) % {w} AS c FROM exact"
        for r in range(sketches.CMS_D)
    )
    return f"""
    WITH src AS (SELECT l_suppkey AS key FROM lineitem),
    cells AS ({cells}),
    grid AS (SELECT r, c, COUNT(*) AS cnt FROM cells GROUP BY r, c),
    exact AS (SELECT key, COUNT(*) AS exact_count FROM src GROUP BY key),
    kc AS ({kc}),
    est AS (SELECT kc.key, MIN(g.cnt) AS est_count
            FROM kc JOIN grid g ON kc.r = g.r AND kc.c = g.c GROUP BY kc.key)
    SELECT e.key, e.est_count, x.exact_count
    FROM est e JOIN exact x ON e.key = x.key
    ORDER BY e.est_count DESC, e.key ASC LIMIT {k}
    """


QUERIES.extend(
    [
        Query(
            "sketch_hll_distinct",
            sketch_hll_q,
            _hll_sql(),
            doc="HyperLogLog distinct sketch (p=10) next to the exact "
            "count — 1024-register bounded aggregate, harmonic-mean sum "
            "kept as an EXACT 2^50-scaled bigint so the estimate is one "
            "shared-literal double division; the mergeable-state pattern "
            "(register max) that makes distinct counting a kilobyte "
            "problem at 100 TB",
            tags=("analytics", "sketch"),
        ),
        Query(
            "sketch_kmv_distinct",
            sketch_kmv_q,
            _kmv_sql(),
            doc="K-minimum-values distinct sketch (k=256): distinct "
            "8-byte hashes → TakeOrdered k-heap → (k-1)*2^60/h_(k); "
            "union+truncate mergeable state, exact-count fallback below k",
            tags=("analytics", "sketch"),
        ),
        Query(
            "sketch_bloom_filter",
            sketch_bloom_q,
            _bloom_sql(),
            doc="Bloom-filter membership accounting (m=16384, k=3): "
            "build-side set bits are a <= m-row bounded table (AQE "
            "broadcasts at runtime), probe claims need ALL k bits; "
            "reports set-bit load and false-positive count vs exact "
            "membership — false negatives structurally zero",
            tags=("analytics", "sketch", "join"),
        ),
        Query(
            "sketch_cms_topk",
            sketch_cms_q,
            _cms_sql(),
            doc="Count-Min frequency sketch (4x2048 grid): bounded "
            "counter aggregate, per-key estimate = min over d cells "
            "(always >= truth), top-20 next to exact counts so the "
            "collision overestimate is measurable",
            tags=("analytics", "sketch", "agg"),
        ),
    ]
)


# --- round-8 late additions: KMV set ops, Bloom join reduction, drift --------


def sketch_kmv_jaccard_q(spark: SparkSession, sf: str) -> DataFrame:
    return sketches.kmv_source_jaccard(load(spark, sf, "documents"))


def _kmv_jaccard_sql() -> str:
    k = sketches.KMV_PAIR_K
    h = md5_long_sql_duckdb("sg")
    return f"""
    WITH ws AS (SELECT source, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT source, ({h}) AS h FROM (
             SELECT source,
                    unnest(list_distinct(list_transform(range(1, len(w) - 1),
                           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS sg
             FROM ws WHERE len(w) >= 3)),
    n AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
    sk AS (SELECT source, h FROM
             (SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source
                     ORDER BY h ASC) AS rn FROM sh)
           WHERE rn <= {k}),
    pairs AS (SELECT a.source AS source_a, b.source AS source_b,
                     a.n AS n_a, b.n AS n_b
              FROM n a JOIN n b ON a.source < b.source),
    tagged AS (
      SELECT p.source_a, p.source_b, s.h, 1 AS in_a, 0 AS in_b
      FROM pairs p JOIN sk s ON s.source = p.source_a
      UNION ALL
      SELECT p.source_a, p.source_b, s.h, 0, 1
      FROM pairs p JOIN sk s ON s.source = p.source_b),
    mr AS (SELECT source_a, source_b, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b
           FROM tagged GROUP BY 1, 2, 3),
    mtop AS (SELECT * FROM
               (SELECT *, ROW_NUMBER() OVER (PARTITION BY source_a, source_b
                       ORDER BY h ASC) AS rn FROM mr)
             WHERE rn <= {k}),
    m AS (SELECT source_a, source_b, COUNT(*) AS n_merged, MAX(h) AS m_k,
                 CAST(SUM(in_a * in_b) AS BIGINT) AS inter_in_sketch
          FROM mtop GROUP BY 1, 2),
    inter AS (SELECT x.source AS source_a, y.source AS source_b,
                     COUNT(*) AS inter_exact
              FROM sh x JOIN sh y ON x.h = y.h AND x.source < y.source
              GROUP BY 1, 2)
    SELECT p.source_a, p.source_b, p.n_a, p.n_b,
           COALESCE(i.inter_exact, 0) AS inter_exact,
           p.n_a + p.n_b - COALESCE(i.inter_exact, 0) AS union_exact,
           CASE WHEN m.n_merged < {k} THEN CAST(m.n_merged AS DOUBLE)
                ELSE {sketches.KMV_PAIR_NUMERATOR!r} / m.m_k END AS union_est,
           CAST(COALESCE(i.inter_exact, 0) AS DOUBLE)
             / CAST(p.n_a + p.n_b - COALESCE(i.inter_exact, 0) AS DOUBLE) AS jacc_exact,
           CAST(m.inter_in_sketch AS DOUBLE) / CAST(m.n_merged AS DOUBLE) AS jacc_est
    FROM pairs p
    JOIN m ON m.source_a = p.source_a AND m.source_b = p.source_b
    LEFT JOIN inter i ON i.source_a = p.source_a AND i.source_b = p.source_b
    """


def bloom_join_q(spark: SparkSession, sf: str) -> DataFrame:
    return sketches.bloom_join_reduction(
        load(spark, sf, "lineitem"), load(spark, sf, "orders")
    )


def _bloom_join_sql() -> str:
    m, kk = sketches.BLOOM_M, sketches.BLOOM_K
    bpos = " UNION ALL ".join(
        f"SELECT bk, ({seeded_md5_long_sql_duckdb('bk', s)}) % {m} AS pos FROM bk"
        for s in range(kk)
    )
    ppos = " UNION ALL ".join(
        f"SELECT pk, ({seeded_md5_long_sql_duckdb('pk', s)}) % {m} AS pos FROM pkeys"
        for s in range(kk)
    )
    return f"""
    WITH bk AS (SELECT DISTINCT o_orderkey AS bk FROM orders
                WHERE o_orderpriority = '1-URGENT'),
    bits AS (SELECT DISTINCT pos FROM ({bpos})),
    fact AS (SELECT l_orderkey AS pk,
                    CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS rev_e4
             FROM lineitem),
    pkeys AS (SELECT DISTINCT pk FROM fact),
    ppos AS (SELECT DISTINCT pk, pos FROM ({ppos})),
    claimed AS (SELECT p.pk,
                       MIN(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS all_set
                FROM ppos p LEFT JOIN bits b ON p.pos = b.pos GROUP BY p.pk),
    passk AS (SELECT pk FROM claimed WHERE all_set = 1),
    passed AS (SELECT f.pk, f.rev_e4 FROM fact f JOIN passk USING (pk)),
    joined AS (SELECT f.pk, f.rev_e4 FROM passed f JOIN bk ON f.pk = bk.bk),
    a AS (SELECT COUNT(*) AS n_fact_rows, COUNT(DISTINCT pk) AS n_fact_keys FROM fact),
    b AS (SELECT COUNT(*) AS n_build_keys FROM bk),
    c AS (SELECT COUNT(DISTINCT pk) AS n_pass_keys, COUNT(*) AS n_pass_rows FROM passed),
    d AS (SELECT COUNT(*) AS n_joined_rows,
                 CAST(SUM(rev_e4) AS BIGINT) AS revenue_e4 FROM joined)
    SELECT a.n_fact_rows, a.n_fact_keys, b.n_build_keys,
           c.n_pass_keys, c.n_pass_rows, d.n_joined_rows, d.revenue_e4
    FROM a, b, c, d
    """


def monitor_drift_q(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.profiling import category_drift

    return category_drift(load(spark, sf, "events"))


QUERIES.extend(
    [
        Query(
            "sketch_kmv_jaccard",
            sketch_kmv_jaccard_q,
            _kmv_jaccard_sql(),
            doc="cross-source content overlap from MERGED KMV sketches "
            "(k=128 over word-3-gram hashes): union cardinality + Jaccard "
            "per source pair from two k-row sketches, shown next to the "
            "exact values — the set-operation face of KMV; pair stage "
            "runs on bounded sketch tables, exact side is an h-keyed "
            "shuffle self-join",
            tags=("analytics", "sketch", "llm"),
        ),
        Query(
            "bloom_join_reduction",
            bloom_join_q,
            _bloom_join_sql(),
            doc="Bloom-prefiltered fact-dim join (the runtime row-filter "
            "pattern): bounded <= m-row bit table tests every fact key "
            "map-side, exact join runs only on claimed rows — result "
            "provably identical (no false negatives), pass selectivity "
            "REPORTED so the shuffle reduction is measurable",
            tags=("analytics", "sketch", "join"),
        ),
        Query(
            "monitor_category_drift",
            monitor_drift_q,
            """
            WITH e AS (SELECT event_type,
                              CAST(FLOOR(epoch(ts)) AS BIGINT) AS ep FROM events),
            b AS (SELECT MIN(ep) AS mn, MAX(ep) AS mx FROM e),
            cells AS (
              SELECT event_type,
                     CASE WHEN ep * 2 <= b.mn + b.mx THEN 'ref' ELSE 'cur' END AS half,
                     COUNT(*) AS n_obs
              FROM e, b GROUP BY 1, 2
            ),
            tt AS (SELECT event_type, CAST(SUM(n_obs) AS BIGINT) AS n_type_total
                   FROM cells GROUP BY 1),
            ht AS (SELECT half, CAST(SUM(n_obs) AS BIGINT) AS n_half_total
                   FROM cells GROUP BY 1),
            tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM cells)
            SELECT c.event_type, c.half, c.n_obs,
                   tt.n_type_total, ht.n_half_total, tot.n_total,
                   (c.n_obs * 1000000000) // ht.n_half_total AS share_e9,
                   (CAST(tot.n_total * c.n_obs - tt.n_type_total * ht.n_half_total AS DOUBLE)
                    * CAST(tot.n_total * c.n_obs - tt.n_type_total * ht.n_half_total AS DOUBLE))
                   / CAST(tot.n_total * tt.n_type_total * ht.n_half_total AS DOUBLE) AS chi2_cell
            FROM cells c
            JOIN tt ON c.event_type = tt.event_type
            JOIN ht ON c.half = ht.half, tot
            """,
            doc="two-sample categorical drift panel: feed split at the "
            "integer epoch midpoint (2*ep <= mn+mx, no division), per-cell "
            "chi-square homogeneity contribution from EXACT integers (one "
            "deterministic IEEE square + division per cell, no float "
            "sums), e9 fixed-point shares — the retraining-cut health "
            "check",
            tags=("analytics", "monitoring"),
        ),
    ]
)


def monitor_outliers_q(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.profiling import mad_outliers

    return mad_outliers(load(spark, sf, "events"))


QUERIES.append(
    Query(
        "monitor_value_outliers",
        monitor_outliers_q,
        """
        WITH v AS (SELECT event_type,
                          CAST(FLOOR(value * 10000) AS BIGINT) AS v_e4
                   FROM events),
        r AS (SELECT event_type, v_e4,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY v_e4 ASC) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM v),
        med AS (SELECT event_type, v_e4 AS median_e4, n FROM r
                WHERE rn = CAST(CEIL(CAST(n AS DOUBLE) / 2) AS BIGINT)),
        dev AS (SELECT v.event_type, med.median_e4, med.n,
                       ABS(v.v_e4 - med.median_e4) AS ad_e4
                FROM v JOIN med ON v.event_type = med.event_type),
        rd AS (SELECT event_type, ad_e4,
                      ROW_NUMBER() OVER (PARTITION BY event_type
                                         ORDER BY ad_e4 ASC) AS rn, n
               FROM dev),
        mad AS (SELECT event_type, ad_e4 AS mad_e4 FROM rd
                WHERE rn = CAST(CEIL(CAST(n AS DOUBLE) / 2) AS BIGINT))
        SELECT d.event_type, MAX(d.n) AS n, MAX(d.median_e4) AS median_e4,
               MAX(m.mad_e4) AS mad_e4,
               CAST(SUM(CASE WHEN d.ad_e4 > 5 * m.mad_e4 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers,
               (CAST(SUM(CASE WHEN d.ad_e4 > 5 * m.mad_e4 THEN 1 ELSE 0 END)
                     AS BIGINT) * 1000000000) // MAX(d.n) AS outlier_share_e9
        FROM dev d JOIN mad m ON d.event_type = m.event_type
        GROUP BY d.event_type
        """,
        doc="robust per-category outlier panel: exact lower-median and "
        "MAD (two q53-shape ranking windows, e4 integers), outliers = "
        "|x - med| > 5*MAD as a pure integer test, e9 share — the "
        "broken-upstream monitor mean/stddev can't provide (the "
        "outliers would drag the threshold with them)",
        tags=("analytics", "monitoring", "orderstat"),
    )
)


def sketch_hll_by_type_q(spark: SparkSession, sf: str) -> DataFrame:
    return sketches.hll_distinct_by(load(spark, sf, "events"), "event_type", "user_id")


def _hll_by_type_sql() -> str:
    h = md5_long_sql_duckdb("user_id")
    m, wb = sketches.HLL_M, sketches.HLL_W_BITS
    lc_values = ", ".join(f"({v}, {e!r})" for v, e in sketches.hll_linear_counting_table())
    return f"""
    WITH src AS (SELECT event_type AS g, ({h}) AS h FROM events),
    k AS (SELECT g, h % {m} AS reg, h >> {sketches.HLL_P} AS w FROM src),
    r AS (SELECT g, reg,
                 MAX(LEAST(length(regexp_extract(bin(w), '0*$')) + 1, {wb})) AS m_j
          FROM k GROUP BY g, reg),
    s AS (SELECT g, COUNT(*) AS n_hit,
                 CAST(SUM(1::BIGINT << ({wb} - m_j)) AS BIGINT) AS sum_hit
          FROM r GROUP BY g),
    e AS (SELECT event_type AS g, COUNT(DISTINCT user_id) AS exact_distinct
          FROM events GROUP BY event_type),
    lc(v, lc_est) AS (VALUES {lc_values}),
    base AS (
      SELECT s.g, {m} AS m,
             CAST({m} - s.n_hit AS BIGINT) AS n_zero_registers,
             CAST(s.sum_hit + ({m} - s.n_hit) * (1::BIGINT << {wb}) AS BIGINT) AS sum_scaled,
             {sketches.HLL_NUMERATOR!r}
               / CAST(s.sum_hit + ({m} - s.n_hit) * (1::BIGINT << {wb}) AS BIGINT)
               AS hll_raw_estimate,
             e.exact_distinct
      FROM s JOIN e ON s.g = e.g)
    SELECT b.g AS event_type, b.m, b.n_zero_registers, b.sum_scaled,
           b.hll_raw_estimate,
           CASE WHEN b.hll_raw_estimate <= {sketches.HLL_LC_THRESHOLD!r}
                     AND b.n_zero_registers > 0
                THEN lc.lc_est ELSE b.hll_raw_estimate END AS hll_estimate,
           b.exact_distinct
    FROM base b LEFT JOIN lc ON b.n_zero_registers = lc.v
    """


def q99_group_hh_q(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.text import words
    from ..operators.profiling import grouped_heavy_hitters

    toks = (
        load(spark, sf, "documents")
        .select(F.col("source"), F.explode(words(F.col("text"))).alias("word"))
    )
    return grouped_heavy_hitters(toks, "source", "word", phi_num=1, phi_den=50, capacity=64)


def privacy_k_anon_q(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.profiling import k_anonymity

    return k_anonymity(load(spark, sf, "customer"), ["c_nationkey", "c_mktsegment"], k=5)


QUERIES.extend(
    [
        Query(
            "sketch_hll_by_type",
            sketch_hll_by_type_q,
            _hll_by_type_sql(),
            doc="GROUPED HyperLogLog: distinct users per event type, one "
            "1024-register sketch per group (state |groups|x1024 at any "
            "feed size) next to each group's exact count — the distinct-"
            "per-dimension production shape; same shared-literal linear "
            "counting, exact scaled-integer harmonic sums",
            tags=("analytics", "sketch", "agg"),
        ),
        Query(
            "q99_group_heavy_hitters",
            q99_group_hh_q,
            """
            WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS word
                       FROM documents),
            n AS (SELECT source, COUNT(*) AS n_group FROM t GROUP BY source),
            c AS (SELECT source, word, COUNT(*) AS cnt FROM t GROUP BY 1, 2)
            SELECT c.source, c.word, c.cnt, n.n_group
            FROM c JOIN n ON c.source = n.source
            WHERE c.cnt * 50 > n.n_group
            """,
            doc="exact per-GROUP φ-heavy hitters (top tokens per source, "
            "φ=1/50) via per-partition per-group Misra-Gries candidates + "
            "candidate-only exact verify — the top-talkers-per-tenant "
            "shape that never shuffles the (group x key) cold tail",
            tags=("analytics", "sketch", "llm", "monitoring"),
        ),
        Query(
            "privacy_k_anonymity",
            privacy_k_anon_q,
            """
            WITH c AS (SELECT c_nationkey, c_mktsegment,
                              COUNT(*) AS class_size
                       FROM customer GROUP BY 1, 2),
            t AS (SELECT CAST(SUM(class_size) AS BIGINT) AS n_rows,
                         CAST(SUM(CASE WHEN class_size < 5
                                       THEN class_size ELSE 0 END) AS BIGINT)
                           AS n_suppressed
                  FROM c)
            SELECT c.c_nationkey, c.c_mktsegment, c.class_size,
                   c.class_size >= 5 AS meets_k, 5 AS k,
                   CAST((CAST(t.n_suppressed AS HUGEINT) * 1000000000) // t.n_rows AS BIGINT)
                     AS suppressed_share_e9
            FROM c, t
            """,
            doc="k-anonymity audit (k=5) over the (nation, segment) quasi-"
            "identifier: one shuffle on the quasi tuple, per-equivalence-"
            "class verdict + the table's suppression share in e9 fixed "
            "point — the privacy-governance gate before training export",
            tags=("analytics", "monitoring", "privacy"),
        ),
    ]
)


def privacy_l_diversity_q(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.profiling import l_diversity

    cust = load(spark, sf, "customer")
    sensitive = F.floor(F.col("c_acctbal") / 1000.0).cast("long")
    return l_diversity(cust, ["c_nationkey", "c_mktsegment"], sensitive, l_min=3)


def monitor_freshness_q(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.profiling import freshness_panel

    return freshness_panel(load(spark, sf, "events"))


QUERIES.append(
    Query(
        "privacy_l_diversity",
        privacy_l_diversity_q,
        """
        WITH c AS (
          SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size,
                 COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT))
                   AS l_distinct
          FROM customer GROUP BY 1, 2),
        t AS (SELECT CAST(SUM(class_size) AS BIGINT) AS n_rows,
                     CAST(SUM(CASE WHEN l_distinct < 3
                                   THEN class_size ELSE 0 END) AS BIGINT)
                       AS n_below_l
              FROM c)
        SELECT c.c_nationkey, c.c_mktsegment, c.class_size, c.l_distinct,
               c.l_distinct >= 3 AS meets_l, 3 AS l_min,
               CAST((CAST(t.n_below_l AS HUGEINT) * 1000000000) // t.n_rows AS BIGINT) AS below_l_share_e9
        FROM c, t
        """,
        doc="distinct l-diversity audit (l=3) over the (nation, segment) "
        "quasi-identifier with banded account balance as the sensitive "
        "attribute — k-anonymity's homogeneity-attack sibling: one "
        "shuffle on the quasi tuple (count + count_distinct in the same "
        "pass), below-l row share in e9 fixed point",
        tags=("analytics", "monitoring", "privacy"),
    )
)


QUERIES.append(
    Query(
        "monitor_freshness",
        monitor_freshness_q,
        """
        WITH e AS (SELECT event_type,
                          CAST(FLOOR(epoch(ts)) AS BIGINT) AS ep FROM events),
        b AS (SELECT MAX(ep) AS mx FROM e),
        c AS (SELECT event_type AS category, COUNT(*) AS n_events,
                     MAX(ep) AS last_ep,
                     CAST(SUM(CASE WHEN ep >= mx - 86400 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_last_24h,
                     CAST(SUM(CASE WHEN ep >= mx - 604800 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_last_7d
              FROM e, b GROUP BY event_type, mx)
        SELECT category, n_events,
               make_timestamp(last_ep * 1000000) AS last_event,
               mx - last_ep AS lag_seconds, n_last_24h, n_last_7d,
               CAST((CAST(n_last_24h AS HUGEINT) * 1000000000) // n_events AS BIGINT) AS share_24h_e9,
               CAST((CAST(n_last_7d AS HUGEINT) * 1000000000) // n_events AS BIGINT) AS share_7d_e9
        FROM c, b
        """,
        doc="per-category ingest-freshness panel: lag of each category's "
        "last event behind the feed watermark plus trailing-24h/7d "
        "volume shares (e9 fixed point) — the stalled-producer monitor; "
        "one partial-agg'd shuffle on the bounded category column, "
        "watermark as a 1-row broadcast",
        tags=("analytics", "monitoring", "streaming-adjacent"),
    )
)


def privacy_t_closeness_q(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.profiling import t_closeness

    cust = load(spark, sf, "customer")
    band = F.expr("least(greatest(CAST(floor(c_acctbal / 1000.0) AS INT) + 1, 0), 10)")
    return t_closeness(
        cust, ["c_nationkey", "c_mktsegment"], band, n_bands=11, t_e9=100_000_000
    )


def monitor_schema_drift_q(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.profiling import schema_drift

    ev = load(spark, sf, "events")
    return schema_drift(
        ev,
        ["user_id", "event_type", "value", "props"],
        F.col("ts") < F.lit("2024-01-16").cast("timestamp"),
        split_desc="ts<2024-01-16",
    )


QUERIES.append(
    Query(
        "privacy_t_closeness",
        privacy_t_closeness_q,
        """
        WITH b AS (
          SELECT c_nationkey, c_mktsegment,
                 LEAST(GREATEST(CAST(FLOOR(c_acctbal / 1000.0) AS INTEGER) + 1,
                                0), 10) AS band
          FROM customer),
        cb AS (SELECT c_nationkey, c_mktsegment, band, COUNT(*) AS n_qb
               FROM b GROUP BY 1, 2, 3),
        cls AS (SELECT c_nationkey, c_mktsegment,
                       CAST(SUM(n_qb) AS BIGINT) AS class_size
                FROM cb GROUP BY 1, 2),
        gb AS (SELECT band, CAST(SUM(n_qb) AS BIGINT) AS n_b
               FROM cb GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n_rows FROM gb),
        grid AS (SELECT c.c_nationkey, c.c_mktsegment, c.class_size, t.i AS pos
                 FROM cls c, generate_series(0, 9) t(i)),
        cum AS (
          SELECT g.c_nationkey, g.c_mktsegment, g.class_size, g.pos,
                 (SELECT COALESCE(SUM(x.n_qb), 0) FROM cb x
                   WHERE x.c_nationkey = g.c_nationkey
                     AND x.c_mktsegment = g.c_mktsegment
                     AND x.band <= g.pos) AS cum_qb,
                 (SELECT COALESCE(SUM(y.n_b), 0) FROM gb y
                   WHERE y.band <= g.pos) AS cum_b
          FROM grid g),
        emd AS (
          SELECT c_nationkey, c_mktsegment, class_size,
                 CAST(SUM(ABS(CAST(cum_qb AS HUGEINT) * t.n_rows
                              - CAST(cum_b AS HUGEINT) * class_size))
                      * 1000000000
                      // (CAST(class_size AS HUGEINT) * t.n_rows * 10)
                      AS BIGINT) AS t_emd_e9
          FROM cum, tot t
          GROUP BY 1, 2, 3, t.n_rows),
        above AS (SELECT CAST(SUM(class_size) AS BIGINT) AS a_rows,
                         CAST(SUM(CASE WHEN t_emd_e9 > 100000000
                                       THEN class_size ELSE 0 END) AS BIGINT)
                           AS n_above
                  FROM emd)
        SELECT e.c_nationkey, e.c_mktsegment, e.class_size, e.t_emd_e9,
               e.t_emd_e9 <= 100000000 AS meets_t, 100000000 AS t_e9,
               CAST((CAST(a.n_above AS HUGEINT) * 1000000000) // a.a_rows AS BIGINT) AS above_t_share_e9
        FROM emd e, above a
        """,
        doc="t-closeness audit (t=0.1, EMD over 11 ordered balance bands) "
        "— the skewness-attack gate completing the k-anon/l-div/t-close "
        "privacy trio: per-class earth-mover's distance to the global "
        "sensitive distribution in exact DECIMAL(38,0)/HUGEINT integer "
        "arithmetic (products reach N^2, past int64 at 100 TB); one "
        "(quasi, band) shuffle, distributions as bounded 11-element "
        "arrays, O(bands^2) map-side fold — never a densified grid join",
        tags=("analytics", "monitoring", "privacy"),
    )
)


QUERIES.append(
    Query(
        "monitor_schema_drift",
        monitor_schema_drift_q,
        """
        WITH s AS (SELECT *, (ts < TIMESTAMP '2024-01-16') AS old
                   FROM events),
        m AS (
          SELECT 'user_id' AS column_name,
                 COUNT(*) FILTER (old) AS old_n,
                 COUNT(*) FILTER (NOT old) AS new_n,
                 COUNT(*) FILTER (old AND user_id IS NULL) AS old_nulls,
                 COUNT(*) FILTER (NOT old AND user_id IS NULL) AS new_nulls,
                 COUNT(DISTINCT CASE WHEN old THEN user_id END)
                   AS old_distinct,
                 COUNT(DISTINCT CASE WHEN NOT old THEN user_id END)
                   AS new_distinct
          FROM s
          UNION ALL
          SELECT 'event_type',
                 COUNT(*) FILTER (old), COUNT(*) FILTER (NOT old),
                 COUNT(*) FILTER (old AND event_type IS NULL),
                 COUNT(*) FILTER (NOT old AND event_type IS NULL),
                 COUNT(DISTINCT CASE WHEN old THEN event_type END),
                 COUNT(DISTINCT CASE WHEN NOT old THEN event_type END)
          FROM s
          UNION ALL
          SELECT 'value',
                 COUNT(*) FILTER (old), COUNT(*) FILTER (NOT old),
                 COUNT(*) FILTER (old AND value IS NULL),
                 COUNT(*) FILTER (NOT old AND value IS NULL),
                 COUNT(DISTINCT CASE WHEN old THEN value END),
                 COUNT(DISTINCT CASE WHEN NOT old THEN value END)
          FROM s
          UNION ALL
          SELECT 'props',
                 COUNT(*) FILTER (old), COUNT(*) FILTER (NOT old),
                 COUNT(*) FILTER (old AND props IS NULL),
                 COUNT(*) FILTER (NOT old AND props IS NULL),
                 COUNT(DISTINCT CASE WHEN old THEN props END),
                 COUNT(DISTINCT CASE WHEN NOT old THEN props END)
          FROM s
        )
        SELECT column_name, old_n, new_n,
               CAST((CAST(old_nulls AS HUGEINT) * 1000000000) // GREATEST(old_n, 1) AS BIGINT) AS old_null_e9,
               CAST((CAST(new_nulls AS HUGEINT) * 1000000000) // GREATEST(new_n, 1) AS BIGINT) AS new_null_e9,
               old_distinct, new_distinct,
               ABS(CAST((CAST(new_nulls AS HUGEINT) * 1000000000) // GREATEST(new_n, 1) AS BIGINT)
                   - CAST((CAST(old_nulls AS HUGEINT) * 1000000000) // GREATEST(old_n, 1) AS BIGINT)) AS null_drift_e9,
               CAST((CAST(new_distinct AS HUGEINT) * 1000000000) // GREATEST(old_distinct, 1) AS BIGINT)
                 AS distinct_ratio_e9,
               'ts<2024-01-16' AS split
        FROM m
        """,
        doc="schema/profile-drift panel between two snapshots of the feed "
        "(before/after a literal cutover): per-column row counts, null "
        "shares, exact distincts and the drift deltas — the silent-"
        "producer-change monitor; ONE group-less aggregate (partial-"
        "agg'd, a single row crosses the wire) unpivoted by a literal "
        "stack, zero joins",
        tags=("analytics", "monitoring"),
    )
)


def monitor_seasonal_anomaly_q(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.profiling import seasonal_anomaly

    return seasonal_anomaly(load(spark, sf, "events"))


QUERIES.append(
    Query(
        "monitor_seasonal_anomaly",
        monitor_seasonal_anomaly_q,
        """
        WITH d AS (
          SELECT event_type AS category,
                 CAST(date_part('hour', ts) AS INTEGER) AS hour,
                 CAST(ts AS DATE) AS day,
                 COUNT(*) AS cnt
          FROM events GROUP BY 1, 2, 3),
        b AS (SELECT MAX(day) AS final_day,
                     CAST(COUNT(DISTINCT day) - 1 AS BIGINT)
                       AS n_baseline_days
              FROM d),
        p AS (
          SELECT category, hour,
                 CAST(SUM(CASE WHEN day < b.final_day THEN cnt ELSE 0 END)
                      AS BIGINT) AS baseline_total,
                 CAST(SUM(CASE WHEN day = b.final_day THEN cnt ELSE 0 END)
                      AS BIGINT) AS actual,
                 MAX(b.n_baseline_days) AS n_baseline_days
          FROM d, b GROUP BY 1, 2),
        r AS (
          SELECT *, CAST((CAST(actual AS HUGEINT) * n_baseline_days
                          * 1000000000)
                         // GREATEST(baseline_total, 1) AS BIGINT)
                      AS ratio_e9
          FROM p)
        SELECT category, hour, baseline_total, n_baseline_days, actual,
               CASE WHEN n_baseline_days > 0 THEN ratio_e9 END AS ratio_e9,
               CASE WHEN n_baseline_days > 0
                    THEN (ratio_e9 < 500000000 OR ratio_e9 > 2000000000)
                    ELSE FALSE END AS is_anomaly
        FROM r
        """,
        doc="seasonal (hour-of-day) anomaly panel: final day's actual per "
        "(category, hour) cell vs the per-day baseline average from every "
        "prior day, ratio in exact DECIMAL/HUGEINT e9 fixed point, flag "
        "outside [0.5x, 2x] — the daily-shape monitor category_drift's "
        "two-halves chi-square and freshness' watermark lag don't cover; "
        "one bounded (category, hour, day) daily-ledger shuffle, "
        "everything downstream re-aggregates that ledger, 1-row bounds "
        "broadcast",
        tags=("analytics", "monitoring", "timeseries"),
    )
)
