"""Relational queries beyond the reference (which has no joins, windows, or
set ops — SURVEY.md §2.7).  These make the engine a usable analytics system
and exercise the plans that dominate at 100 TB: shuffle joins with AQE,
broadcast dimension joins, window functions, rollups, as-of joins.

Money columns are scaled to exact integers per-row (money_e4) before any
SUM so results are engine-exact (see operators/joins.py:money_e4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.joins import asof_join, dim_join, money_e4
from ..operators.sessionize import sessionize, sessionize_oracle_sql
from ..tables import load
from .registry import Query


# --- q13: fact-fact shuffle join + aggregation ------------------------------
def q13(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", money_e4(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("rev_e4")
    )
    orders = load(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("rev_e4").alias("revenue_e4"), F.count(F.lit(1)).alias("n_lines"))
    )


# --- q14: broadcast dimension join chain ------------------------------------
def q14(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer").select("c_nationkey", money_e4(F.col("c_acctbal")).alias("bal_e4"))
    nation = load(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = load(spark, sf, "region").select("r_regionkey", "r_name")
    dims = dim_join(nation, region, nation.n_regionkey == region.r_regionkey)
    return (
        dim_join(cust, dims, cust.c_nationkey == dims.n_nationkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"), F.sum("bal_e4").alias("acctbal_e4"))
    )


# --- q15: window function top-N per group -----------------------------------
def q15(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.select(
            "o_custkey", "o_orderkey", money_e4(F.col("o_totalprice")).alias("price_e4"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


# --- q16: rollup (grouping sets) --------------------------------------------
def q16(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(money_e4(F.col("l_quantity"))).alias("qty_e4"),
        )
    )


# --- q17: as-of join (purchases ← latest prior click per user) --------------
def q17(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, key="user_id", left_ts="ts", right_ts="ts")
    return joined.select("event_id", "user_id", F.col("asof_ts").alias("last_click_ts"))


# --- q56: CUBE grouping sets -------------------------------------------------
def q56(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(money_e4(F.col("l_extendedprice"))).alias("price_e4"),
    )


# --- q20: batch sessionization (gaps-and-islands) ---------------------------
def q20(spark: SparkSession, sf: str) -> DataFrame:
    return sessionize(load(spark, sf, "events"))


# --- q32: copy-on-write upsert (Hudi K4 semantics, engine-side) --------------
def q32(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.maintenance import upsert_snapshot

    ev = load(spark, sf, "events").select("event_id", "ts", "event_type", "value")
    updates = (
        ev.where(F.col("event_id") % 10 == 0)
        .select(
            "event_id",
            "ts",
            F.lit("updated").alias("event_type"),
            (F.col("value") * 2).alias("value"),
        )
    )
    out = upsert_snapshot(ev, updates, ["event_id"], "ts")
    return out.select("event_id", "event_type", money_e4(F.col("value")).alias("val_e4"))


# --- q55: as-of join with staleness tolerance --------------------------------
def q55(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(
        purchases, clicks, key="user_id", left_ts="ts", right_ts="ts", tolerance_seconds=2 * 3600
    )
    return joined.select("event_id", "user_id", F.col("asof_ts").alias("recent_click_ts"))


# --- q47: data-quality rule suite -------------------------------------------
def q47(spark: SparkSession, sf: str) -> DataFrame:
    """Referential-integrity + domain checks as one unioned report —
    the validation suite a pipeline runs before publishing a snapshot."""
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    orphan_lines = li.join(orders.select("o_orderkey"), li.l_orderkey == orders.o_orderkey, "left_anti")
    orphan_orders = orders.join(cust.select("c_custkey"), orders.o_custkey == cust.c_custkey, "left_anti")
    bad_qty = li.where((F.col("l_quantity") <= 0) | F.col("l_quantity").isNull())
    bad_disc = li.where((F.col("l_discount") < 0) | (F.col("l_discount") > 1))
    checks = [
        ("orphan_lineitems", orphan_lines),
        ("orphan_orders", orphan_orders),
        ("nonpositive_quantity", bad_qty),
        ("discount_out_of_range", bad_disc),
    ]
    out = None
    for rule, df in checks:
        row = df.agg(F.count(F.lit(1)).alias("violations")).select(F.lit(rule).alias("rule"), "violations")
        out = row if out is None else out.unionByName(row)
    return out


# --- q48: snapshot diff (CDC) -------------------------------------------------
def q48(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.maintenance import snapshot_diff, upsert_snapshot

    ev = load(spark, sf, "events").select("event_id", "ts", "event_type", "value")
    updates = ev.where(F.col("event_id") % 10 == 0).select(
        "event_id", "ts", F.lit("updated").alias("event_type"), (F.col("value") * 2).alias("value")
    )
    new = upsert_snapshot(ev, updates, ["event_id"], "ts")
    diff = snapshot_diff(ev, new, ["event_id"], ["event_type", "value"])
    return diff.groupBy("change").agg(F.count(F.lit(1)).alias("n"))


# --- q18: semi/anti set predicates ------------------------------------------
def q18(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem").select("l_orderkey")
    with_lines = orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
    without = orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
    return with_lines.agg(F.count(F.lit(1)).alias("n")).select(F.lit("with_lines").alias("kind"), "n").unionByName(
        without.agg(F.count(F.lit(1)).alias("n")).select(F.lit("without_lines").alias("kind"), "n")
    )


# --- q88: interval join via bin bucketing -----------------------------------
def q88(spark: SparkSession, sf: str) -> DataFrame:
    """Lineitems shipped inside each of 50 audit windows (order date + 3
    days of the first 50 orders) — a pure range predicate, no equi key.

    Catalyst would plan the bare BETWEEN join as BroadcastNestedLoopJoin;
    operators/joins.py:range_join turns it into a bin equi-join (weekly
    bins ~ window span) with the BETWEEN as residual — the banned shape
    never appears (tests/test_plans.py audits it).  Aggregated per window
    so output stays bounded while the join itself is exercised.
    """
    from ..operators.joins import range_join

    windows = (
        load(spark, sf, "orders")
        .where(F.col("o_orderkey") < 50)
        .select(
            F.col("o_orderkey").alias("window_id"),
            F.col("o_orderdate").alias("w_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS")).alias("w_end"),
        )
    )
    li = load(spark, sf, "lineitem").select(
        "l_shipdate", money_e4(F.col("l_quantity")).alias("qty_e4")
    )
    matched = range_join(li, windows, "l_shipdate", "w_start", "w_end")
    return matched.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_lines"), F.sum("qty_e4").alias("qty_sum_e4")
    )


Q88_SQL = """
SELECT o_orderkey AS window_id, COUNT(*) AS n_lines,
       CAST(SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT)) AS BIGINT) AS qty_sum_e4
FROM orders JOIN lineitem
  ON l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 3 DAY
WHERE o_orderkey < 50
GROUP BY o_orderkey
"""


QUERIES = [
    Query(
        "q13_join_revenue",
        q13,
        """
        SELECT o_orderpriority,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4,
               COUNT(*) AS n_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        """,
        doc="fact-fact equi-join + agg; shuffle join w/ AQE skew handling",
        tags=("relational", "join"),
    ),
    Query(
        "q14_broadcast_dims",
        q14,
        """
        SELECT r_name, n_name, COUNT(*) AS n_cust,
               CAST(SUM(CAST(FLOOR(c_acctbal * 10000) AS BIGINT)) AS BIGINT) AS acctbal_e4
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        """,
        doc="broadcast dimension join chain — fact side never shuffles",
        tags=("relational", "join", "broadcast"),
    ),
    Query(
        "q15_window_topn",
        q15,
        """
        SELECT o_custkey, o_orderkey,
               CAST(FLOOR(o_totalprice * 10000) AS BIGINT) AS price_e4,
               CAST(rn AS INTEGER) AS rn
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders
        ) WHERE rn <= 3
        """,
        doc="window row_number top-3 per customer with total tie-break",
        tags=("relational", "window"),
    ),
    Query(
        "q16_rollup",
        q16,
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               CAST(SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT)) AS BIGINT) AS qty_e4
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        doc="ROLLUP grouping sets over returnflag/linestatus",
        tags=("relational", "agg"),
    ),
    Query(
        "q17_asof_join",
        q17,
        """
        SELECT p.event_id, p.user_id, c.ts AS last_click_ts
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        doc="as-of join via union+window (single shuffle) vs DuckDB ASOF JOIN",
        tags=("relational", "asof"),
    ),
    Query(
        "q18_semi_anti",
        q18,
        """
        SELECT 'with_lines' AS kind, COUNT(*) AS n FROM orders
          WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem)
        UNION ALL
        SELECT 'without_lines' AS kind, COUNT(*) AS n FROM orders
          WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
        """,
        doc="left-semi / left-anti joins (EXISTS / NOT EXISTS)",
        tags=("relational", "join"),
    ),
    Query(
        "q55_asof_tolerance",
        q55,
        """
        SELECT p.event_id, p.user_id,
               CASE WHEN p.ts - c.ts <= INTERVAL 2 HOUR THEN c.ts END AS recent_click_ts
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        doc="as-of join with 2h staleness tolerance (stale match → null)",
        tags=("relational", "asof"),
    ),
    Query(
        "q47_quality_rules",
        q47,
        """
        SELECT 'orphan_lineitems' AS rule, COUNT(*) AS violations FROM lineitem
          WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        UNION ALL
        SELECT 'orphan_orders', COUNT(*) FROM orders
          WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        UNION ALL
        SELECT 'nonpositive_quantity', COUNT(*) FROM lineitem
          WHERE l_quantity <= 0 OR l_quantity IS NULL
        UNION ALL
        SELECT 'discount_out_of_range', COUNT(*) FROM lineitem
          WHERE l_discount < 0 OR l_discount > 1
        """,
        doc="data-quality rule suite: referential integrity + domain checks",
        tags=("relational", "quality"),
    ),
    Query(
        "q48_snapshot_diff",
        q48,
        """
        WITH cur AS (SELECT event_id, ts, event_type, value, 0 AS side FROM events),
        upd AS (SELECT event_id, ts, 'updated' AS event_type, value * 2 AS value, 1 AS side
                FROM events WHERE event_id % 10 = 0),
        newsnap AS (
          SELECT event_id, event_type, value FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
                        ORDER BY ts DESC, side DESC) AS rn
            FROM (SELECT * FROM cur UNION ALL SELECT * FROM upd)
          ) WHERE rn = 1
        ),
        diff AS (
          SELECT o.event_id,
                 CASE WHEN o.event_id IS NULL THEN 'added'
                      WHEN n.event_id IS NULL THEN 'removed'
                      WHEN o.event_type != n.event_type OR o.value != n.value THEN 'changed'
                 END AS change
          FROM events o FULL OUTER JOIN newsnap n ON o.event_id = n.event_id
        )
        SELECT change, COUNT(*) AS n FROM diff WHERE change IS NOT NULL GROUP BY change
        """,
        doc="snapshot diff (CDC): full-outer hash compare on 8-byte payloads "
        "→ added/removed/changed",
        tags=("relational", "cdc"),
    ),
    Query(
        "q32_upsert_snapshot",
        q32,
        """
        WITH cur AS (SELECT event_id, ts, event_type, value, 0 AS side FROM events),
        upd AS (SELECT event_id, ts, 'updated' AS event_type, value * 2 AS value, 1 AS side
                FROM events WHERE event_id % 10 = 0),
        u AS (SELECT * FROM cur UNION ALL SELECT * FROM upd),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
                          ORDER BY ts DESC, side DESC) AS rn FROM u)
        SELECT event_id, event_type,
               CAST(FLOOR(value * 10000) AS BIGINT) AS val_e4
        FROM r WHERE rn = 1
        """,
        doc="copy-on-write upsert (recordkey=event_id, precombine=ts, update "
        "wins ties) — Hudi K4 semantics as a one-shuffle engine op",
        tags=("relational", "upsert"),
    ),
    Query(
        "q56_cube",
        q56,
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 10000) AS BIGINT)) AS BIGINT) AS price_e4
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        doc="CUBE grouping sets (all subtotal combinations)",
        tags=("relational", "agg"),
    ),
    Query(
        "q20_sessionize",
        q20,
        sessionize_oracle_sql(),
        doc="gaps-and-islands sessionization (30-min gap): lag → running "
        "sum → group — one shuffle on user_id",
        tags=("relational", "window", "session"),
    ),
    Query(
        "q88_range_join",
        q88,
        Q88_SQL,
        doc="interval join without an equi key: bin-bucketed equi-join + "
        "residual BETWEEN (never a nested loop), aggregated per window",
        tags=("relational", "join", "range"),
    ),
]


def scd2_q(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.maintenance import scd2_history

    return scd2_history(load(spark, sf, "events"))


QUERIES.append(
    Query(
        "scd2_history",
        scd2_q,
        """
        WITH marked AS (
          SELECT user_id, event_id, event_type, ts,
                 CASE WHEN LAG(event_type) OVER w IS NULL
                       OR LAG(event_type) OVER w <> event_type
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        islands AS (
          SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id
                         ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS version
          FROM marked
        ),
        collapsed AS (
          SELECT user_id, version, MIN(event_type) AS event_type,
                 MIN(ts) AS valid_from, COUNT(*) AS n_events
          FROM islands GROUP BY user_id, version
        )
        SELECT user_id, version, event_type, valid_from,
               LEAD(valid_from) OVER wv AS valid_to,
               n_events,
               LEAD(valid_from) OVER wv IS NULL AS is_current
        FROM collapsed
        WINDOW wv AS (PARTITION BY user_id ORDER BY version ASC)
        """,
        doc="SCD Type 2 history from an event stream (the lakehouse MERGE "
        "pattern batch-side): consecutive same-state events collapse into "
        "versioned [valid_from, valid_to) intervals, open-ended current "
        "row; gaps-and-islands with (ts, event_id) total order — ONE "
        "user-keyed shuffle reused by both windows and the groupBy",
        tags=("relational", "window", "maintenance"),
    )
)


# SCD2 interval CTEs shared by scd2_history's oracle (above, inline) and
# the time-travel read below
_SCD2_CTES = """
        marked AS (
          SELECT user_id, event_id, event_type, ts,
                 CASE WHEN LAG(event_type) OVER w IS NULL
                       OR LAG(event_type) OVER w <> event_type
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        islands AS (
          SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id
                         ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS version
          FROM marked
        ),
        collapsed AS (
          SELECT user_id, version, MIN(event_type) AS event_type,
                 MIN(ts) AS valid_from, COUNT(*) AS n_events
          FROM islands GROUP BY user_id, version
        ),
        hist AS (
          SELECT user_id, version, event_type, valid_from,
                 LEAD(valid_from) OVER wv AS valid_to, n_events
          FROM collapsed
          WINDOW wv AS (PARTITION BY user_id ORDER BY version ASC)
        )
"""


def scd2_as_of_q(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.maintenance import scd2_as_of

    ev = load(spark, sf, "events")
    ep = F.unix_timestamp(F.col("ts"))
    # bounded driver collect: two ints fix T = the event-time midpoint
    b = ev.agg(F.min(ep).alias("mn"), F.max(ep).alias("mx")).collect()[0]
    return scd2_as_of(ev, F.lit((b.mn + b.mx) // 2))


def salted_skew_join_q(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.partitioning import salted_join

    ev = load(spark, sf, "events")
    totals = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 10000).cast("long")).alias("user_total_e4"),
        F.count(F.lit(1)).alias("user_n"),
    )
    joined = salted_join(
        ev.select("event_id", "user_id", "event_type"),
        totals,
        ["user_id"],
        salt_buckets=8,
        salt_source_col="event_id",
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("user_total_e4").alias("tot_e4"),
        F.sum("user_n").alias("tot_n"),
    )


QUERIES.append(
    Query(
        "scd2_as_of",
        scd2_as_of_q,
        f"""
        WITH b AS (SELECT (CAST(FLOOR(epoch(MIN(ts))) AS BIGINT)
                         + CAST(FLOOR(epoch(MAX(ts))) AS BIGINT)) // 2 AS t_ep
                   FROM events),
        {_SCD2_CTES}
        SELECT user_id, version, event_type AS state, valid_from AS since,
               n_events
        FROM hist, b
        WHERE valid_from <= make_timestamp(t_ep * 1000000)
          AND (valid_to IS NULL OR valid_to > make_timestamp(t_ep * 1000000))
        """,
        doc="point-in-time (time-travel) read over the SCD2 history: every "
        "user's state AS OF the event-time midpoint — the Delta "
        "timestampAsOf / Hudi point-in-time query answered engine-side "
        "from interval containment; scd2_history's single user-keyed "
        "shuffle plus a map-side filter",
        tags=("relational", "window", "maintenance"),
    )
)


QUERIES.append(
    Query(
        "q101_salted_skew_join",
        salted_skew_join_q,
        """
        WITH t AS (
          SELECT user_id,
                 CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS BIGINT)
                   AS user_total_e4,
                 COUNT(*) AS user_n
          FROM events GROUP BY user_id)
        SELECT e.event_type, COUNT(*) AS cnt,
               CAST(SUM(t.user_total_e4) AS BIGINT) AS tot_e4,
               CAST(SUM(t.user_n) AS BIGINT) AS tot_n
        FROM events e JOIN t USING (user_id)
        GROUP BY e.event_type
        """,
        doc="skew-salted equi-join (operators/partitioning.salted_join): "
        "the hot-key fix — left rows deterministically salted mod 8, the "
        "corpus-sized right side replicated once per salt (never "
        "broadcast), join on (user_id, _salt) == the plain join exactly; "
        "bounds any task's share of a hot key at 1/8 for 8x right-side "
        "shuffle volume, composing with AQE's adaptive skew split",
        tags=("relational", "join", "skew"),
    )
)


def salted_distinct_agg_q(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.partitioning import salted_distinct_agg

    return salted_distinct_agg(
        load(spark, sf, "events"), "event_type", "user_id", salt_buckets=16
    )


QUERIES.append(
    Query(
        "q102_salted_distinct_agg",
        salted_distinct_agg_q,
        """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS n_distinct,
               COUNT(*) AS n_rows
        FROM events GROUP BY event_type
        """,
        doc="skew-salted exact count-distinct (operators/partitioning."
        "salted_distinct_agg): q101's aggregation sibling — Spark's "
        "count_distinct final merge ships a hot group's ENTIRE distinct "
        "domain to one reducer; salting by hash(value) mod 16 splits "
        "that domain into disjoint, exactly-additive slices, so stage 1 "
        "spreads the hot group over 16 reducers and stage 2 sums <=16 "
        "partials per group == plain COUNT(DISTINCT) row-for-row (the "
        "oracle runs the plain form)",
        tags=("relational", "agg", "skew"),
    )
)
