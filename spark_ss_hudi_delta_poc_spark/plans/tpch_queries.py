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

    part/nation/region/customer dims broadcast; lineitem shuffles on
    l_orderkey only.
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
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
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
        waiting.join(F.broadcast(supp), waiting.l_suppkey == supp.s_suppkey)
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
    emitted as exact (promo_rev_e4, total_rev_e4).  part broadcasts;
    the shipdate filter prunes at the parquet scan.
    """
    part = load(spark, sf, "part").select("p_partkey", "p_type")
    li = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01")) & (F.col("l_shipdate") < F.lit("1997-04-01"))
    ).select("l_partkey", money_e4(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("rev_e4"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
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
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
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
]
