"""TPC-H-shaped multi-join analytics adapted to the testdata schema —
the join topologies that dominate warehouse workloads at 100 TB (the
reference has no joins at all; SURVEY.md §2.7).

Adaptations (the testdata lacks partsupp, l_commitdate/receiptdate and
phone prefixes): Q7 and Q8 run verbatim-shaped; Q21's "late" predicate
becomes l_shipdate > o_orderdate + 60 days; Q22's phone prefix becomes a
nation-key set.  Every money aggregate is e4-scaled per-row before SUM
(operators/joins.py:money_e4) and every ratio is emitted as exact
numerator/denominator or compared by integer cross-multiplication, so
results hash-match DuckDB bit-for-bit.

Scale notes per query are in the docstrings; the common themes:
- dimension tables (nation, region, part at 1/5 lineitem scale) are
  broadcast — the fact table shuffles once on the join key, or not at
  all when every join is broadcast;
- AQE handles the skewed shuffle joins (orders x lineitem);
- self-semi/anti-joins on lineitem reuse one shuffle of the same keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import money_e4
from ..tables import load
from .registry import Query

REV_E4 = "CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT)"


# --- q68: TPC-H Q7 volume shipping ------------------------------------------
def q68(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue shipped between two nations, per direction and year.

    nation is broadcast twice (supplier side / customer side); lineitem
    shuffles once on l_orderkey for the orders join and once on
    l_suppkey; customer joins orders on the already-shuffled o_custkey.
    The nation filter is pushed below the joins by Catalyst, so only
    rows touching the two nations survive past the scans.
    """
    n1 = ("NATION_7", "NATION_8")
    nation = load(spark, sf, "nation").select("n_nationkey", "n_name")
    supp = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    supp_n = supp.join(
        F.broadcast(nation.where(F.col("n_name").isin(*n1))),
        supp.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    cust_n = cust.join(
        F.broadcast(nation.where(F.col("n_name").isin(*n1))),
        cust.c_nationkey == nation.n_nationkey,
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").alias("l_year"),
        money_e4(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("rev_e4"),
    )
    return (
        li.join(supp_n, li.l_suppkey == supp_n.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_n, orders.o_custkey == cust_n.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev_e4").alias("revenue_e4"), F.count(F.lit(1)).alias("n_lines"))
    )


Q68_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       {REV_E4} AS revenue_e4,
       COUNT(*) AS n_lines
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE ns.n_name IN ('NATION_7', 'NATION_8')
    AND nc.n_name IN ('NATION_7', 'NATION_8')
    AND ns.n_name != nc.n_name
)
GROUP BY supp_nation, cust_nation, l_year
"""


# --- q69: TPC-H Q8 market share ---------------------------------------------
def q69(spark: SparkSession, sf: str) -> DataFrame:
    """Market share of NATION_3's suppliers, per year, for PROMO-type
    parts sold to customers in NATION_0..11's region (r_regionkey of
    NATION_3) — emitted as exact (nation_rev_e4, total_rev_e4) pairs
    per year rather than a float ratio so the hash is engine-exact.

    nation/region dims broadcast (hinted — fixed-size); the PROMO part
    slice and customer carry no hint: their size is selectivity-
    proportional, so AQE decides at runtime.
    """
    nation = load(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region_key = (
        nation.where(F.col("n_name") == "NATION_3").select("n_regionkey").limit(1)
    )
    part = load(spark, sf, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    supp = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    supp_n = supp.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    cust_in_region = (
        load(spark, sf, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(nation.select("n_nationkey", "n_regionkey")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region_key.withColumnRenamed("n_regionkey", "target_rk")), F.col("n_regionkey") == F.col("target_rk"))
        .select("c_custkey")
    )
    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    li = load(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        money_e4(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("rev_e4"),
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp_n, li.l_suppkey == supp_n.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_in_region, orders.o_custkey == cust_in_region.c_custkey, "left_semi")
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("rev_e4")).otherwise(F.lit(0))).alias("nation_rev_e4"),
            F.sum("rev_e4").alias("total_rev_e4"),
        )
    )


Q69_SQL = """
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                     THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS nation_rev_e4,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS total_rev_e4
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         ns.n_name AS supp_nation,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_custkey IN (
    SELECT c_custkey FROM customer
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    WHERE nc.n_regionkey = (SELECT n_regionkey FROM nation WHERE n_name = 'NATION_3')
  )
)
GROUP BY o_year
"""


# --- q70: TPC-H Q21 waiting suppliers ---------------------------------------
def q70(spark: SparkSession, sf: str) -> DataFrame:
    """Suppliers who alone were late on a finished multi-supplier order
    ("late" = shipped > 60 days after the order date; the testdata has no
    commit/receipt dates).

    Plan shape: lineitem+orders define per-order supplier sets; the
    EXISTS (another supplier on the order) and NOT EXISTS (another LATE
    supplier) correlations are left-semi / left-anti self-joins on
    l_orderkey — three uses of ONE shuffle of lineitem by orderkey, no
    row explosion.  Top-100 by (n_waits desc, s_name) for bounded output.
    """
    orders_f = (
        load(spark, sf, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    li_o = li.join(orders_f, li.l_orderkey == orders_f.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)).alias("is_late"),
    )
    late = li_o.where(F.col("is_late")).select("l_orderkey", "l_suppkey").distinct()
    all_supps = li_o.select("l_orderkey", "l_suppkey").distinct()
    other_supp = all_supps.alias("a").join(
        all_supps.alias("b"),
        (F.col("a.l_orderkey") == F.col("b.l_orderkey")) & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        "left_semi",
    )
    other_late = late.alias("a").join(
        late.alias("b"),
        (F.col("a.l_orderkey") == F.col("b.l_orderkey")) & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        "left_anti",
    )
    waiting = late.join(
        other_supp.select("l_orderkey", "l_suppkey"), ["l_orderkey", "l_suppkey"], "left_semi"
    ).join(other_late.select("l_orderkey", "l_suppkey"), ["l_orderkey", "l_suppkey"], "left_semi")
    supp = load(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(supp, waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_waits"))
        .orderBy(F.col("n_waits").desc(), F.col("s_name").asc())
        .limit(100)
    )


Q70_SQL = """
WITH li_o AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 60 DAY AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
late AS (SELECT DISTINCT l_orderkey, l_suppkey FROM li_o WHERE is_late),
all_supps AS (SELECT DISTINCT l_orderkey, l_suppkey FROM li_o)
SELECT s_name, COUNT(*) AS n_waits
FROM late l
JOIN supplier ON l.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM all_supps a
              WHERE a.l_orderkey = l.l_orderkey AND a.l_suppkey != l.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late o
                  WHERE o.l_orderkey = l.l_orderkey AND o.l_suppkey != l.l_suppkey)
GROUP BY s_name
ORDER BY n_waits DESC, s_name ASC
LIMIT 100
"""


# --- q71: TPC-H Q22 global sales opportunity --------------------------------
def q71(spark: SparkSession, sf: str) -> DataFrame:
    """Customers from a 7-nation set with above-average positive account
    balance and no RECENT orders (none since 1999 — this testdata has no
    order-less customers, so "lapsed" replaces TPC-H's "never ordered").
    The average-balance comparison is done by integer cross-
    multiplication (bal_e4 * n_pos > sum_e4) so the boundary is engine-
    exact; the no-recent-orders predicate is a left-anti join; the
    scalar aggregate is a 1-row broadcast.
    """
    nations = [0, 3, 7, 11, 14, 17, 21]
    cust = (
        load(spark, sf, "customer")
        .where(F.col("c_nationkey").isin(*nations))
        .select("c_custkey", "c_nationkey", money_e4(F.col("c_acctbal")).alias("bal_e4"))
    )
    pos = cust.where(F.col("bal_e4") > 0).agg(
        F.sum("bal_e4").alias("sum_e4"), F.count(F.lit(1)).alias("n_pos")
    )
    orders = (
        load(spark, sf, "orders")
        .where(F.col("o_orderdate") >= F.lit("1999-01-01"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(pos))
        .where(F.col("bal_e4") * F.col("n_pos") > F.col("sum_e4"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"), F.sum("bal_e4").alias("bal_sum_e4"))
    )


Q71_SQL = """
WITH cust AS (
  SELECT c_custkey, c_nationkey,
         CAST(FLOOR(c_acctbal * 10000) AS BIGINT) AS bal_e4
  FROM customer WHERE c_nationkey IN (0, 3, 7, 11, 14, 17, 21)
),
pos AS (
  SELECT CAST(SUM(bal_e4) AS BIGINT) AS sum_e4, COUNT(*) AS n_pos
  FROM cust WHERE bal_e4 > 0
)
SELECT c_nationkey, COUNT(*) AS n_cust,
       CAST(SUM(bal_e4) AS BIGINT) AS bal_sum_e4
FROM cust, pos
WHERE bal_e4 * n_pos > sum_e4
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey
"""


# --- q72: TPC-H Q14 promo revenue -------------------------------------------
def q72(spark: SparkSession, sf: str) -> DataFrame:
    """Fraction of revenue from PROMO parts in one shipping month,
    emitted as exact (promo_rev_e4, total_rev_e4).  The part join is
    unhinted (part scales with the corpus; AQE broadcasts at runtime);
    the shipdate filter prunes at the parquet scan.
    """
    part = load(spark, sf, "part").select("p_partkey", "p_type")
    li = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01")) & (F.col("l_shipdate") < F.lit("1997-04-01"))
    ).select("l_partkey", money_e4(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("rev_e4"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev_e4")).otherwise(F.lit(0))).alias("promo_rev_e4"),
            F.sum("rev_e4").alias("total_rev_e4"),
        )
    )


Q72_SQL = """
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS promo_rev_e4,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS total_rev_e4
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
"""


# --- q73: TPC-H Q19 disjunctive predicates ----------------------------------
def q73(spark: SparkSession, sf: str) -> DataFrame:
    """OR-of-ANDs predicate join (brand x size x quantity bands).  The
    disjunction references both sides, so it cannot be pushed below the
    join — but the per-side prefilters (brand set, size range, quantity
    range) CAN be, and Catalyst extracts them; the join itself stays an
    equi-join on partkey with the residual disjunction as a filter.
    """
    part = load(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity",
        money_e4(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("rev_e4"),
    )
    j = li.join(part, li.l_partkey == part.p_partkey)
    band1 = (F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 10)) & (F.col("l_quantity").between(1, 15))
    band2 = (F.col("p_brand") == "Brand#7") & (F.col("p_size").between(5, 20)) & (F.col("l_quantity").between(10, 25))
    band3 = (F.col("p_brand") == "Brand#13") & (F.col("p_size").between(15, 40)) & (F.col("l_quantity").between(20, 35))
    return j.where(band1 | band2 | band3).agg(
        F.sum("rev_e4").alias("revenue_e4"), F.count(F.lit(1)).alias("n_lines")
    )


Q73_SQL = """
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1  AND 10 AND l_quantity BETWEEN 1  AND 15)
   OR (p_brand = 'Brand#7'  AND p_size BETWEEN 5  AND 20 AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 15 AND 40 AND l_quantity BETWEEN 20 AND 35)
"""


# --- q79: TPC-H Q13 customer order-count distribution ------------------------
def q79(spark: SparkSession, sf: str) -> DataFrame:
    """How many customers placed exactly k (non-priority) orders, including
    k = 0 — the LEFT OUTER JOIN + double-aggregation shape.

    Plan: orders is filtered BEFORE the join (the predicate belongs to the
    join's right side, so zero-order customers survive); both sides shuffle
    once on custkey; the second aggregation runs over one row per customer —
    cardinality already collapsed, its shuffle is trivial at any scale.
    """
    cust = load(spark, sf, "customer").select("c_custkey")
    orders = (
        load(spark, sf, "orders")
        .where(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_custkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q79_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey
   AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# --- q80: TPC-H Q15 top supplier ---------------------------------------------
def q80(spark: SparkSession, sf: str) -> DataFrame:
    """Supplier(s) with the maximum revenue in one quarter.

    The per-supplier revenue view is one partial+final aggregate; the MAX
    over it reduces to a single row that broadcasts back over the view (the
    scalar-subquery execution shape, constant work per probe row — exempted
    from the cross-join audit like q71/q78).  Exact e4 integers make the
    max comparison engine-identical even on revenue ties.
    """
    li = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1997-04-01"))
    ).select(
        "l_suppkey",
        money_e4(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("rev_e4"),
    )
    rev = li.groupBy("l_suppkey").agg(F.sum("rev_e4").alias("total_rev_e4"))
    mx = rev.agg(F.max("total_rev_e4").alias("max_rev_e4"))
    supp = load(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev_e4") == F.col("max_rev_e4"))
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev_e4")
    )


Q80_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT)
           AS total_rev_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev_e4
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev_e4 = (SELECT MAX(total_rev_e4) FROM rev)
"""


# --- q81: TPC-H Q17 small-quantity revenue -----------------------------------
def q81(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue from lineitems whose quantity is below 20% of the part's
    average quantity, for one brand — the per-group-average comparison
    shape (correlated scalar subquery per part).

    Plan: the brand filter semi-joins lineitem against the part subset
    first (no broadcast hint — a filtered part slice scales with the
    corpus; AQE broadcasts it at runtime when small), so the per-part aggregate and the join-back both run on
    the reduced set; the comparison is integer cross-multiplied
    (5 * qty * n < sum_qty in e4) so the 0.2x boundary is engine-exact.
    Both the aggregate and the join-back key on l_partkey — one shuffle,
    reused.
    """
    brand_parts = load(spark, sf, "part").where(F.col("p_brand") == "Brand#13").select("p_partkey")
    li = (
        load(spark, sf, "lineitem")
        .join(brand_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select(
            "l_partkey",
            money_e4(F.col("l_quantity")).alias("qty_e4"),
            money_e4(F.col("l_extendedprice")).alias("price_e4"),
        )
    )
    stats = li.groupBy("l_partkey").agg(
        F.sum("qty_e4").alias("sum_qty_e4"), F.count(F.lit(1)).alias("n_lines")
    )
    small = li.join(stats, "l_partkey").where(
        F.lit(5) * F.col("qty_e4") * F.col("n_lines") < F.col("sum_qty_e4")
    )
    return small.agg(
        F.coalesce(F.sum("price_e4"), F.lit(0)).cast("long").alias("small_rev_e4"),
        F.count(F.lit(1)).alias("n_small"),
    )


Q81_SQL = """
WITH li AS (
  SELECT l_partkey,
         CAST(FLOOR(l_quantity * 10000) AS BIGINT) AS qty_e4,
         CAST(FLOOR(l_extendedprice * 10000) AS BIGINT) AS price_e4
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13')
),
stats AS (
  SELECT l_partkey, CAST(SUM(qty_e4) AS BIGINT) AS sum_qty_e4, COUNT(*) AS n_lines
  FROM li GROUP BY l_partkey
)
SELECT CAST(COALESCE(SUM(li.price_e4), 0) AS BIGINT) AS small_rev_e4,
       COUNT(*) AS n_small
FROM li JOIN stats USING (l_partkey)
WHERE 5 * li.qty_e4 * stats.n_lines < stats.sum_qty_e4
"""


# --- q82: TPC-H Q18 large-volume customers -----------------------------------
def q82(spark: SparkSession, sf: str) -> DataFrame:
    """Customers whose single orders total more than 250 units — the
    HAVING-over-fact-then-enrich shape.

    Plan: the quantity rollup is one shuffle of (orderkey, qty) pairs with
    map-side partial sums; only qualifying orderkeys (a tiny fraction)
    continue into the orders/customer joins, so the expensive joins run on
    the filtered cardinality.  Top-100 by (totalprice desc, orderkey) is a
    TakeOrdered — no global sort.
    """
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", money_e4(F.col("l_quantity")).alias("qty_e4")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qty_e4").alias("sum_qty_e4"))
        .where(F.col("sum_qty_e4") > 250 * 10000)
    )
    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", money_e4(F.col("o_totalprice")).alias("totalprice_e4")
    )
    cust = load(spark, sf, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "totalprice_e4", "sum_qty_e4")
        .orderBy(F.col("totalprice_e4").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


Q82_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(FLOOR(o_totalprice * 10000) AS BIGINT) AS totalprice_e4,
       sum_qty_e4
FROM (
  SELECT l_orderkey, CAST(SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT)) AS BIGINT) AS sum_qty_e4
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT)) > 2500000
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice_e4 DESC, o_orderkey ASC
LIMIT 100
"""


# --- q83: TPC-H Q9 product-type profit ---------------------------------------
def q83(spark: SparkSession, sf: str) -> DataFrame:
    """Profit per supplier nation per year for parts matching a name token
    (cost proxy: p_retailprice x quantity — the testdata has no partsupp).

    Plan: nation broadcasts (hinted dim); the name-filtered part slice
    is unhinted (selectivity-proportional — AQE decides); supplier joins
    on suppkey and orders on orderkey — lineitem shuffles once per fact join
    key, dims never shuffle the fact side.  The profit expression is
    evaluated per-row in identical IEEE order in both engines, THEN
    e4-floored, so the hash is exact.
    """
    part_f = (
        load(spark, sf, "part")
        .where(F.col("p_name").contains("red"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf, "nation").select("n_nationkey", "n_name")
    orders = load(spark, sf, "orders").select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    amount_e4 = money_e4(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part_f, li.l_partkey == part_f.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("n_name", "o_year")
        .agg(F.sum(amount_e4).alias("profit_e4"), F.count(F.lit(1)).alias("n_lines"))
    )


Q83_SQL = """
SELECT n_name, o_year,
       CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity)
                           * 10000) AS BIGINT)) AS BIGINT) AS profit_e4,
       COUNT(*) AS n_lines
FROM (
  SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice, l_discount, p_retailprice, l_quantity
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
)
GROUP BY n_name, o_year
"""


# --- q84: TPC-H Q11 important parts ------------------------------------------
def q84(spark: SparkSession, sf: str) -> DataFrame:
    """Parts holding an outsized share of total revenue (> 1/1500 of the
    corpus total; the testdata has no partsupp, so revenue stands in for
    inventory value) — the HAVING-against-global-scalar shape.

    Plan: one shuffle on partkey for the per-part rollup; the global total
    re-aggregates THAT result (tiny), and the 1-row scalar broadcasts back
    over it — constant work per part at any scale (cross-join exempt).
    Integer cross-multiplication keeps the share boundary exact.
    """
    li = load(spark, sf, "lineitem").select(
        "l_partkey",
        money_e4(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("rev_e4"),
    )
    per_part = li.groupBy("l_partkey").agg(F.sum("rev_e4").alias("part_rev_e4"))
    total = per_part.agg(F.sum("part_rev_e4").alias("total_rev_e4"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("part_rev_e4") * 1500 > F.col("total_rev_e4"))
        .select(F.col("l_partkey").alias("p_partkey"), "part_rev_e4")
    )


Q84_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT)
           AS part_rev_e4
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, part_rev_e4
FROM per_part
WHERE part_rev_e4 * 1500 > (SELECT SUM(part_rev_e4) FROM per_part)
"""


# --- q85: TPC-H Q16 supplier counts per part attribute -----------------------
def q85(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct suppliers per (brand, type, size) for a size set, excluding
    one brand and suppliers in deficit (the complaints stand-in) — the
    COUNT(DISTINCT) over an anti-joined bridge shape.

    Plan: the (partkey, suppkey) bridge comes from lineitem de-duplicated
    in one shuffle; the excluded-supplier anti-join and the part join are
    unhinted (both sides are filtered slices of corpus-scaling tables —
    AQE broadcasts at runtime when small); the final distinct-count is a
    two-phase aggregate on the grouping key.
    """
    sizes = [1, 5, 9, 13, 17, 21, 25, 29, 33, 37]
    bridge = load(spark, sf, "lineitem").select("l_partkey", "l_suppkey").distinct()
    bad_supp = load(spark, sf, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    part_f = (
        load(spark, sf, "part")
        .where((F.col("p_brand") != "Brand#13") & F.col("p_size").isin(*sizes))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        bridge.join(bad_supp, bridge.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part_f, bridge.l_partkey == part_f.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q85_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) bridge
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29, 33, 37)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --- q86: TPC-H Q20 promo-part suppliers -------------------------------------
def q86(spark: SparkSession, sf: str) -> DataFrame:
    """Suppliers who shipped a large volume (> 45 units to one part) of
    PROMO parts in 1997 — the nested-IN / semi-join-chain shape.

    Plan: the year band prunes at the parquet scan; the PROMO-part
    semi-join is unhinted (selectivity-proportional side — AQE decides); the (suppkey, partkey) rollup is one shuffle; the
    qualifying supplier set (tiny) semi-joins supplier, nation broadcasts.
    No row ever flows backward — each stage strictly reduces cardinality.
    """
    promo = load(spark, sf, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    li97 = (
        load(spark, sf, "lineitem")
        .where((F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01")))
        .select("l_partkey", "l_suppkey", money_e4(F.col("l_quantity")).alias("qty_e4"))
    )
    qualified = (
        li97.join(promo, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("qty_e4").alias("sum_qty_e4"))
        .where(F.col("sum_qty_e4") > 45 * 10000)
        .select("l_suppkey")
        .distinct()
    )
    supp = load(spark, sf, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = load(spark, sf, "nation").select("n_nationkey", "n_name")
    return (
        supp.join(qualified, supp.s_suppkey == qualified.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name")
    )


Q86_SQL = """
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM (
    SELECT l_suppkey, l_partkey,
           SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT)) AS sum_qty_e4
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
    GROUP BY l_suppkey, l_partkey
  ) WHERE sum_qty_e4 > 450000
)
"""


# --- q87: TPC-H Q2 min-price supplier ----------------------------------------
def q87(spark: SparkSession, sf: str) -> DataFrame:
    """Cheapest observed supplier per mid-size part (unit price from
    lineitem — the testdata has no partsupp) — the argmin-join-back shape.

    Plan: the size filter semi-joins lineitem against the part slice
    (unhinted — AQE decides); min-per-part and the equality join-back
    both key on l_partkey — one shuffle reused; supplier ties collapse deterministically to the lowest
    suppkey.  Unit price is divided THEN e4-floored identically in both
    engines (same IEEE ops, same order).
    """
    pf = load(spark, sf, "part").where(F.col("p_size").between(10, 20)).select("p_partkey")
    unit_e4 = money_e4(F.col("l_extendedprice") / F.col("l_quantity"))
    offers = (
        load(spark, sf, "lineitem")
        .join(pf, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select("l_partkey", "l_suppkey", unit_e4.alias("unit_e4"))
    )
    mins = offers.groupBy("l_partkey").agg(F.min("unit_e4").alias("min_price_e4"))
    best = (
        offers.join(mins, "l_partkey")
        .where(F.col("unit_e4") == F.col("min_price_e4"))
        .groupBy("l_partkey", "min_price_e4")
        .agg(F.min("l_suppkey").alias("s_suppkey"))
    )
    supp = load(spark, sf, "supplier").select(F.col("s_suppkey").alias("sk"), "s_name")
    return best.join(supp, best.s_suppkey == supp.sk).select(
        F.col("l_partkey").alias("p_partkey"), "min_price_e4", "s_suppkey", "s_name"
    )


Q87_SQL = """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         CAST(FLOOR(l_extendedprice / l_quantity * 10000) AS BIGINT) AS unit_e4
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size BETWEEN 10 AND 20)
),
mins AS (SELECT l_partkey, MIN(unit_e4) AS min_price_e4 FROM offers GROUP BY l_partkey),
best AS (
  SELECT o.l_partkey, m.min_price_e4, MIN(o.l_suppkey) AS s_suppkey
  FROM offers o JOIN mins m ON o.l_partkey = m.l_partkey AND o.unit_e4 = m.min_price_e4
  GROUP BY o.l_partkey, m.min_price_e4
)
SELECT b.l_partkey AS p_partkey, b.min_price_e4, b.s_suppkey, s.s_name
FROM best b JOIN supplier s ON b.s_suppkey = s.s_suppkey
"""


QUERIES = [
    Query(
        "q68_volume_shipping",
        q68,
        Q68_SQL,
        doc="TPC-H Q7: revenue between two nations per direction/year; "
        "5-table join, nation broadcast both sides",
        tags=("relational", "tpch", "join"),
    ),
    Query(
        "q69_market_share",
        q69,
        Q69_SQL,
        doc="TPC-H Q8: supplier-nation market share per year as exact "
        "num/den pairs; scalar-subquery region anchor; semi-join customers",
        tags=("relational", "tpch", "join"),
    ),
    Query(
        "q70_waiting_suppliers",
        q70,
        Q70_SQL,
        doc="TPC-H Q21: sole-late supplier on finished multi-supplier "
        "orders; EXISTS/NOT-EXISTS as self semi/anti joins on one shuffle",
        tags=("relational", "tpch", "join", "anti"),
    ),
    Query(
        "q71_global_sales_opp",
        q71,
        Q71_SQL,
        doc="TPC-H Q22: above-average-balance customers with no recent "
        "orders; integer cross-multiplied average comparison, anti join",
        tags=("relational", "tpch", "anti"),
    ),
    Query(
        "q72_promo_revenue",
        q72,
        Q72_SQL,
        doc="TPC-H Q14: promo revenue share in a month as exact num/den; "
        "scan-pruned date band + broadcast part",
        tags=("relational", "tpch", "join"),
    ),
    Query(
        "q73_disjunctive_join",
        q73,
        Q73_SQL,
        doc="TPC-H Q19: OR-of-ANDs join predicate; per-side conjuncts "
        "extracted and pushed, residual disjunction post-join",
        tags=("relational", "tpch", "predicate"),
    ),
    Query(
        "q79_custorder_distribution",
        q79,
        Q79_SQL,
        doc="TPC-H Q13: order-count histogram incl. zero-order customers; "
        "left outer join with pre-filtered right side, double aggregation",
        tags=("relational", "tpch", "join", "outer"),
    ),
    Query(
        "q80_top_supplier",
        q80,
        Q80_SQL,
        doc="TPC-H Q15: max-revenue supplier in a quarter; scalar-max "
        "broadcast over the per-supplier revenue view, exact e4 ties",
        tags=("relational", "tpch", "join"),
    ),
    Query(
        "q81_small_qty_revenue",
        q81,
        Q81_SQL,
        doc="TPC-H Q17: below-20%-of-part-average quantity revenue; "
        "integer cross-multiplied per-group average comparison",
        tags=("relational", "tpch", "join", "subquery"),
    ),
    Query(
        "q82_large_volume_customers",
        q82,
        Q82_SQL,
        doc="TPC-H Q18: orders over 250 units; HAVING rollup first, "
        "enrich joins on the filtered set, TakeOrdered top-100",
        tags=("relational", "tpch", "join"),
    ),
    Query(
        "q83_product_profit",
        q83,
        Q83_SQL,
        doc="TPC-H Q9: profit per nation/year with retailprice cost proxy; "
        "4 joins, dims broadcast, per-row IEEE-exact profit then e4 floor",
        tags=("relational", "tpch", "join"),
    ),
    Query(
        "q84_important_parts",
        q84,
        Q84_SQL,
        doc="TPC-H Q11: parts above 1/1500 revenue share; HAVING against "
        "a 1-row global scalar broadcast (cross-join exempt)",
        tags=("relational", "tpch", "subquery"),
    ),
    Query(
        "q85_supplier_part_counts",
        q85,
        Q85_SQL,
        doc="TPC-H Q16: distinct suppliers per brand/type/size; lineitem "
        "bridge distinct + broadcast anti-join of excluded suppliers",
        tags=("relational", "tpch", "join", "anti"),
    ),
    Query(
        "q86_promo_part_suppliers",
        q86,
        Q86_SQL,
        doc="TPC-H Q20: high-volume PROMO-part suppliers in a year; "
        "semi-join chain, every stage strictly reduces cardinality",
        tags=("relational", "tpch", "join", "semi"),
    ),
    Query(
        "q87_min_price_supplier",
        q87,
        Q87_SQL,
        doc="TPC-H Q2: cheapest supplier per mid-size part; argmin "
        "join-back on one reused partkey shuffle, deterministic ties",
        tags=("relational", "tpch", "join", "subquery"),
    ),
]
