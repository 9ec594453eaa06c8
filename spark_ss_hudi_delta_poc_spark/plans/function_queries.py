"""Scalar-function batteries and additional relational shapes: string
functions, safe math, pricing summary (TPC-H Q1 shape), correlated
subquery, set operations, pivot, approximate distinct.

Determinism notes:
- math battery sticks to correctly-rounded IEEE ops (abs, floor, ceil,
  sqrt, exact-int arithmetic) — transcendentals (ln/exp/pow) are libm-
  dependent and can differ in the last bit across engines, so they are
  exercised in pytest with tolerance instead of hash-matched here;
- averages are computed as single divisions of exact integer sums;
- approx_count_distinct is HLL-implementation-specific → no oracle
  (rows-only check), with a pytest asserting relative error vs exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import money_e4
from ..tables import load
from .registry import Query


# --- q23: pricing summary (TPC-H Q1 shape) ----------------------------------
def q23(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(money_e4(F.col("l_quantity"))).alias("sum_qty_e4"),
            F.sum(money_e4(F.col("l_extendedprice"))).alias("sum_base_e4"),
            F.sum(money_e4(disc_price)).alias("sum_disc_e4"),
            F.sum(money_e4(charge)).alias("sum_charge_e4"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn(
            "avg_qty",
            F.col("sum_qty_e4").cast("double") / F.col("count_order").cast("double"),
        )
    )


# --- q24: correlated subquery (orders above customer average) ---------------
def q24(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", money_e4(F.col("o_totalprice")).alias("price_e4")
    )
    cust_avg = orders.groupBy("o_custkey").agg(
        (F.sum("price_e4").cast("double") / F.count(F.lit(1)).cast("double")).alias("avg_e4")
    )
    return (
        orders.join(cust_avg, "o_custkey")
        .where(F.col("price_e4").cast("double") > F.col("avg_e4"))
        .select("o_orderkey", "o_custkey", "price_e4")
    )


# --- q25: set operations -----------------------------------------------------
def q25(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    buyers = ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
    clickers = ev.where(F.col("event_type") == "click").select("user_id").distinct()
    both = buyers.intersect(clickers).select(F.lit("both").alias("kind"), "user_id")
    only_buy = buyers.exceptAll(clickers).select(F.lit("buy_only").alias("kind"), "user_id")
    union_all = buyers.union(clickers).distinct().select(F.lit("either").alias("kind"), "user_id")
    return both.unionByName(only_buy).unionByName(union_all)


# --- q26: pivot (conditional aggregation) -----------------------------------
EVENT_TYPES = ["purchase", "click", "view", "signup", "error"]


def q26(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


# --- q27: approximate distinct (HLL) with in-engine acceptance check ---------
def q27(spark: SparkSession, sf: str) -> DataFrame:
    """HLL estimate wrapped in a deterministic acceptance predicate: the
    estimate itself is sketch-dependent so it can't hash-match an exact oracle,
    but `abs(approx-exact)/exact <= 0.05` is a stable boolean at the default
    rsd (0.05 ⇒ ~1.6σ; observed error at sf0.01/sf0.1 is <2%).  The oracle
    returns the exact distinct and a literal TRUE flag."""
    li = load(spark, sf, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_partkeys"),
        F.count_distinct("l_partkey").alias("exact_partkeys"),
        F.count(F.lit(1)).alias("n_rows"),
    ).select(
        "exact_partkeys",
        "n_rows",
        (
            F.abs(F.col("approx_partkeys") - F.col("exact_partkeys"))
            / F.col("exact_partkeys")
            <= F.lit(0.05)
        ).alias("within_5pct"),
    )


# --- q29: string-function battery -------------------------------------------
def q29(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 20)).alias("head_upper"),
        F.lower(F.substring("text", 1, 20)).alias("head_lower"),
        F.length("text").cast("long").alias("len"),
        F.trim(F.concat(F.lit("  "), F.substring("text", 1, 5), F.lit("  "))).alias("trimmed"),
        F.regexp_replace(F.substring("text", 1, 30), "a", "@").alias("replaced"),
        F.regexp_extract("text", "^(\\w+)", 1).alias("first_word"),
        F.lpad(F.col("lang"), 5, "_").alias("lang_pad"),
        F.reverse(F.col("lang")).alias("lang_rev"),
        F.concat_ws("|", "lang", "source").alias("joined"),
        F.instr(F.col("text"), "data").cast("long").alias("data_pos"),
        F.translate(F.col("lang"), "aeiou", "AEIOU").alias("lang_tr"),
        F.repeat(F.col("lang"), 2).alias("lang2"),
        F.split(F.col("source"), "c").getItem(1).alias("src_n"),
    )


# --- q30: math battery (correctly-rounded ops only) -------------------------
def q30(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    v_e4 = F.floor(F.col("value") * 10000).cast("long")
    return ev.select(
        "event_id",
        F.abs(v_e4 - 1000000).alias("abs_v"),
        F.floor(F.col("value")).cast("long").alias("floor_v"),
        F.ceil(F.col("value")).cast("long").alias("ceil_v"),
        F.sqrt(v_e4.cast("double")).alias("sqrt_v"),
        (v_e4 % 97).alias("mod_v"),
        F.signum(F.col("value") - 100).cast("int").alias("sign_v"),
        F.greatest(v_e4, F.lit(500000)).alias("gr_v"),
        F.least(v_e4, F.lit(500000)).alias("ls_v"),
        F.round(F.col("value")).cast("long").alias("round_v"),
    )


# --- q42: single-pass table profiling ----------------------------------------
def q42(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.profiling import profile

    return profile(load(spark, sf, "orders"), ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"])


# --- q65: ordered string aggregation -----------------------------------------
def q65(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    return (
        ev.where(F.col("user_id") < 15)
        .groupBy("user_id")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("types_csv"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- q64: conditional distinct aggregation -----------------------------------
def q64(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    return ev.agg(
        F.countDistinct(F.when(F.col("event_type") == "purchase", F.col("user_id"))).alias("buyers"),
        F.countDistinct(F.when(F.col("event_type") == "click", F.col("user_id"))).alias("clickers"),
        F.countDistinct("user_id").alias("all_users"),
        F.count(F.when(F.col("value") > 100, 1)).alias("high_value_events"),
    )


# --- q63: unpivot (wide → long) ----------------------------------------------
def q63(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_quantity") * 10000).cast("long").alias("quantity"),
        F.floor(F.col("l_extendedprice") * 10000).cast("long").alias("extendedprice"),
        F.floor(F.col("l_discount") * 10000).cast("long").alias("discount"),
        F.floor(F.col("l_tax") * 10000).cast("long").alias("tax"),
    )
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["quantity", "extendedprice", "discount", "tax"],
        variableColumnName="measure",
        valueColumnName="value_e4",
    )


# --- q62: regexp-extract-all battery -----------------------------------------
def q62(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        # flat string, not array: driver canonicalizer breaks on list cells
        # COALESCE on both sides: DuckDB array_to_string([]) yields NULL
        # while Spark array_join([]) yields '' (judge-found at sf0.01)
        F.coalesce(
            F.array_join(
                F.regexp_extract_all(F.col("text"), F.lit("\\b\\w{4}\\b"), 0), "|"
            ),
            F.lit(""),
        ).alias("four_letter_words"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("a\\w+"), 0)).cast("long").alias("n_a_words"),
        F.regexp_count(F.col("text"), F.lit(" ")).cast("long").alias("n_spaces"),
    )


# --- q61: date-arithmetic battery --------------------------------------------
def q61(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    d = F.to_date("ts")
    return ev.select(
        "event_id",
        F.date_add(d, 30).alias("plus30"),
        F.date_sub(d, 7).alias("minus7"),
        F.datediff(F.lit("2025-01-01").cast("date"), d).cast("int").alias("days_to_2025"),
        F.last_day(d).alias("month_end"),
        F.add_months(d, 2).alias("plus2mo"),
        F.dayofweek(d).cast("int").alias("dow"),
        F.weekofyear(d).cast("int").alias("woy"),
        F.quarter(d).cast("int").alias("qtr"),
    )


# --- q45: fixed-width histogram ----------------------------------------------
def q45(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    bucket = F.least(F.floor(F.col("value") / 20).cast("int"), F.lit(9))
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# --- q46: edit-distance battery ----------------------------------------------
def q46(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    head = F.substring("text", 1, 8)
    return d.select(
        "doc_id",
        F.levenshtein(head, F.col("lang")).alias("lev_head_lang"),
        F.levenshtein(F.col("lang"), F.col("source")).alias("lev_lang_src"),
        F.levenshtein(head, F.lit("the fast")).alias("lev_head_ref"),
    )


# --- q77: array aggregation surface ------------------------------------------
def q77_live(spark: SparkSession, sf: str) -> DataFrame:
    """Live array<string> form: sort_array(collect_set(...)) per user.  Kept as
    the engine-surface under test (tests/test_function_queries.py asserts the
    column is a real ArrayType); the registered q77 flattens it because the
    driver's pandas canonicalizer cannot sort/hash list cells (confirmed r1 on
    q43/q62, reconfirmed r4 on this query's err row)."""
    ev = load(spark, sf, "events")
    return (
        ev.where(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(
            F.sort_array(F.collect_set("event_type")).alias("types_arr"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def q77(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-facing form of q77_live: the array column is '|'-joined (the
    q43/q62 convention, COVERAGE.md) so the external value-hash oracle can
    canonicalize it."""
    live = q77_live(spark, sf)
    return live.select(
        "user_id", F.array_join("types_arr", "|").alias("types"), "n"
    )


# --- q43: deterministic collect/array aggregation ----------------------------
def q43(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    # array columns are joined to flat '|' strings: the driver's pandas
    # canonicalizer cannot sort/hash list-typed cells (round-1 ERR rows)
    return (
        ev.where(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list(F.col("event_id").cast("string"))), "|"
            ).alias("event_ids"),
            F.array_join(F.sort_array(F.collect_set("event_type")), "|").alias("types"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- q39: conditional-function battery --------------------------------------
def q39(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    v_e4 = F.floor(F.col("value") * 10000).cast("long")
    return ev.select(
        "event_id",
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("ok")).alias("cond_a"),
        F.when(v_e4 > 1000000, "high").when(v_e4 > 100000, "mid").otherwise("low").alias("band"),
        F.ifnull(F.nullif(v_e4, F.lit(0)), F.lit(-1)).alias("nz"),
        (F.col("event_type") == "purchase").alias("is_purchase"),
        F.isnull(F.nullif(F.col("event_type"), F.col("event_type"))).alias("always_true"),
    )


# --- q40: array-function battery ---------------------------------------------
def q40(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    w = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(w).cast("long").alias("n"),
        F.array_contains(w, "data").alias("has_data"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct"),
        F.element_at(F.sort_array(w), 1).alias("first_sorted"),
        F.element_at(F.sort_array(w, asc=False), 1).alias("last_sorted"),
        F.concat_ws(",", F.slice(F.sort_array(w), 1, 3)).alias("top3"),
        F.element_at(F.reverse(w), 1).alias("last_word"),
    )


# --- q41: deterministic hash sampling / split assignment ---------------------
def q41(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.hashing import md5_long

    d = load(spark, sf, "documents")
    bucket = md5_long(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return d.groupBy("source", split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("chars")
    )


QUERIES = [
    Query(
        "q65_string_agg",
        q65,
        """
        SELECT user_id,
               string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv,
               COUNT(*) AS n
        FROM events WHERE user_id < 15 GROUP BY user_id
        """,
        doc="ordered string aggregation (sorted distinct concat per group)",
        tags=("functions", "agg", "string"),
    ),
    Query(
        "q64_conditional_distinct",
        q64,
        """
        SELECT COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS buyers,
               COUNT(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS clickers,
               COUNT(DISTINCT user_id) AS all_users,
               COUNT(CASE WHEN value > 100 THEN 1 END) AS high_value_events
        FROM events
        """,
        doc="conditional distinct counts (segmented reach metrics)",
        tags=("functions", "agg"),
    ),
    Query(
        "q63_unpivot",
        q63,
        """
        SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
               CAST(FLOOR(l_quantity * 10000) AS BIGINT) AS value_e4 FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'extendedprice',
               CAST(FLOOR(l_extendedprice * 10000) AS BIGINT) FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount',
               CAST(FLOOR(l_discount * 10000) AS BIGINT) FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax',
               CAST(FLOOR(l_tax * 10000) AS BIGINT) FROM lineitem
        """,
        doc="unpivot/melt wide measures to long form (4 rows out per input)",
        tags=("functions", "reshape"),
    ),
    Query(
        "q62_regexp_extract_all",
        q62,
        r"""
        SELECT doc_id,
               COALESCE(array_to_string(regexp_extract_all(text, '\b\w{4}\b'), '|'), '') AS four_letter_words,
               CAST(len(regexp_extract_all(text, 'a\w+')) AS BIGINT) AS n_a_words,
               CAST(len(regexp_extract_all(text, ' ')) AS BIGINT) AS n_spaces
        FROM documents
        """,
        doc="regexp_extract_all / regexp_count battery (array results)",
        tags=("functions", "string", "regexp"),
    ),
    Query(
        "q61_date_arith",
        q61,
        """
        SELECT event_id,
               CAST(ts AS DATE) + 30 AS plus30,
               CAST(ts AS DATE) - 7 AS minus7,
               CAST(date_diff('day', CAST(ts AS DATE), DATE '2025-01-01') AS INTEGER) AS days_to_2025,
               last_day(CAST(ts AS DATE)) AS month_end,
               CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2mo,
               CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INTEGER) AS dow,
               CAST(weekofyear(CAST(ts AS DATE)) AS INTEGER) AS woy,
               CAST(quarter(CAST(ts AS DATE)) AS INTEGER) AS qtr
        FROM events
        """,
        doc="date arithmetic battery (add/sub/diff/last_day/add_months/"
        "dayofweek/weekofyear/quarter)",
        tags=("functions", "date"),
    ),
    Query(
        "q45_histogram",
        q45,
        """
        SELECT CAST(least(FLOOR(value / 20), 9) AS INTEGER) AS bucket, COUNT(*) AS cnt
        FROM events GROUP BY 1
        """,
        doc="fixed-width value histogram (10 clamped buckets)",
        tags=("functions", "histogram"),
    ),
    Query(
        "q46_edit_distance",
        q46,
        """
        SELECT doc_id,
               CAST(levenshtein(substr(text, 1, 8), lang) AS INTEGER) AS lev_head_lang,
               CAST(levenshtein(lang, source) AS INTEGER) AS lev_lang_src,
               CAST(levenshtein(substr(text, 1, 8), 'the fast') AS INTEGER) AS lev_head_ref
        FROM documents
        """,
        doc="levenshtein edit-distance battery (string similarity family)",
        tags=("functions", "string", "similarity"),
    ),
    Query(
        "q43_collect_arrays",
        q43,
        """
        SELECT user_id,
               array_to_string(list_sort(list(CAST(event_id AS VARCHAR))), '|') AS event_ids,
               array_to_string(list_sort(list(DISTINCT event_type)), '|') AS types,
               COUNT(*) AS n
        FROM events WHERE user_id < 20 GROUP BY user_id
        """,
        doc="deterministic collect_list/collect_set aggregation (sorted arrays)",
        tags=("functions", "array", "agg"),
    ),
    Query(
        "q42_profile_table",
        q42,
        """
        SELECT 'o_orderkey' AS "column", COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               COUNT(DISTINCT o_orderkey) AS n_distinct,
               CAST(MIN(CAST(FLOOR(o_orderkey * 10000) AS BIGINT)) AS VARCHAR) AS min_val,
               CAST(MAX(CAST(FLOOR(o_orderkey * 10000) AS BIGINT)) AS VARCHAR) AS max_val
        FROM orders
        UNION ALL
        SELECT 'o_custkey', COUNT(*),
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT o_custkey),
               CAST(MIN(CAST(FLOOR(o_custkey * 10000) AS BIGINT)) AS VARCHAR),
               CAST(MAX(CAST(FLOOR(o_custkey * 10000) AS BIGINT)) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', COUNT(*),
               CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT o_orderstatus),
               MIN(o_orderstatus), MAX(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', COUNT(*),
               CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT o_totalprice),
               CAST(MIN(CAST(FLOOR(o_totalprice * 10000) AS BIGINT)) AS VARCHAR),
               CAST(MAX(CAST(FLOOR(o_totalprice * 10000) AS BIGINT)) AS VARCHAR)
        FROM orders
        """,
        doc="single-pass per-column profiling (rows/nulls/distincts/min/max) "
        "— one scan for all columns, unpivoted",
        tags=("functions", "profiling"),
    ),
    Query(
        "q39_conditional_battery",
        q39,
        """
        SELECT event_id,
               COALESCE(NULLIF(event_type, 'error'), 'ok') AS cond_a,
               CASE WHEN CAST(FLOOR(value * 10000) AS BIGINT) > 1000000 THEN 'high'
                    WHEN CAST(FLOOR(value * 10000) AS BIGINT) > 100000 THEN 'mid'
                    ELSE 'low' END AS band,
               IFNULL(NULLIF(CAST(FLOOR(value * 10000) AS BIGINT), 0), -1) AS nz,
               event_type = 'purchase' AS is_purchase,
               NULLIF(event_type, event_type) IS NULL AS always_true
        FROM events
        """,
        doc="coalesce/nullif/ifnull/case/boolean conditional battery",
        tags=("functions", "conditional"),
    ),
    Query(
        "q40_array_battery",
        q40,
        """
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        SELECT doc_id,
               CAST(len(w) AS BIGINT) AS n,
               list_contains(w, 'data') AS has_data,
               CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
               list_sort(w)[1] AS first_sorted,
               list_reverse_sort(w)[1] AS last_sorted,
               array_to_string(list_slice(list_sort(w), 1, 3), ',') AS top3,
               list_reverse(w)[1] AS last_word
        FROM w
        """,
        doc="array battery: size/contains/distinct/sort/slice/reverse",
        tags=("functions", "array"),
    ),
    Query(
        "q41_hash_split",
        q41,
        """
        SELECT source,
               CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
               COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM (SELECT source, n_chars,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
              FROM documents)
        GROUP BY source, split
        """,
        doc="deterministic hash-bucket train/val/test split — reproducible "
        "sampling for corpus subsets",
        tags=("llm", "sampling"),
    ),
    Query(
        "q23_pricing_summary",
        q23,
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT)) AS BIGINT) AS sum_qty_e4,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 10000) AS BIGINT)) AS BIGINT) AS sum_base_e4,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_e4,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000) AS BIGINT)) AS BIGINT) AS sum_charge_e4,
               COUNT(*) AS count_order,
               CAST(CAST(SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT)) AS BIGINT) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS avg_qty
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        doc="TPC-H Q1-shaped pricing summary: multi-agg groupBy, exact scaling",
        tags=("relational", "agg"),
    ),
    Query(
        "q24_above_cust_avg",
        q24,
        """
        WITH o AS (SELECT o_orderkey, o_custkey,
                          CAST(FLOOR(o_totalprice * 10000) AS BIGINT) AS price_e4
                   FROM orders),
        avgs AS (SELECT o_custkey,
                        CAST(SUM(price_e4) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_e4
                 FROM o GROUP BY o_custkey)
        SELECT o.o_orderkey, o.o_custkey, o.price_e4
        FROM o JOIN avgs USING (o_custkey)
        WHERE CAST(o.price_e4 AS DOUBLE) > avgs.avg_e4
        """,
        doc="correlated-subquery shape: rows above their group average",
        tags=("relational", "subquery"),
    ),
    Query(
        "q25_set_ops",
        q25,
        """
        WITH b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
             c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
        SELECT 'both' AS kind, user_id FROM (SELECT user_id FROM b INTERSECT SELECT user_id FROM c)
        UNION ALL
        SELECT 'buy_only' AS kind, user_id FROM (SELECT user_id FROM b EXCEPT SELECT user_id FROM c)
        UNION ALL
        SELECT 'either' AS kind, user_id FROM (SELECT user_id FROM b UNION SELECT user_id FROM c)
        """,
        doc="INTERSECT / EXCEPT / UNION set operations",
        tags=("relational", "setop"),
    ),
    Query(
        "q26_pivot",
        q26,
        """
        SELECT user_id,
               COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT), 0) AS purchase,
               COALESCE(CAST(SUM(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT), 0) AS click,
               COALESCE(CAST(SUM(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT), 0) AS view,
               COALESCE(CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT), 0) AS signup,
               COALESCE(CAST(SUM(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT), 0) AS error
        FROM events GROUP BY user_id
        """,
        doc="pivot on event_type (explicit value list → stable schema)",
        tags=("relational", "pivot"),
    ),
    Query(
        "q27_approx_distinct",
        q27,
        """
        SELECT COUNT(DISTINCT l_partkey) AS exact_partkeys,
               COUNT(*) AS n_rows,
               TRUE AS within_5pct
        FROM lineitem
        """,
        doc="approx_count_distinct (HLL) with in-engine 5% acceptance predicate",
        tags=("relational", "approx"),
    ),
    Query(
        "q29_string_battery",
        q29,
        """
        SELECT doc_id,
               upper(substr(text, 1, 20)) AS head_upper,
               lower(substr(text, 1, 20)) AS head_lower,
               CAST(length(text) AS BIGINT) AS len,
               trim('  ' || substr(text, 1, 5) || '  ') AS trimmed,
               regexp_replace(substr(text, 1, 30), 'a', '@', 'g') AS replaced,
               COALESCE(regexp_extract(text, '^(\\w+)', 1), '') AS first_word,
               lpad(lang, 5, '_') AS lang_pad,
               reverse(lang) AS lang_rev,
               translate(lang, 'aeiou', 'AEIOU') AS lang_tr,
               concat_ws('|', lang, source) AS joined,
               CAST(COALESCE(strpos(text, 'data'), 0) AS BIGINT) AS data_pos,
               repeat(lang, 2) AS lang2,
               string_split(source, 'c')[2] AS src_n
        FROM documents
        """,
        doc="string-function battery (upper/lower/trim/regexp/pad/translate/...)",
        tags=("functions", "string"),
    ),
    Query(
        "q30_math_battery",
        q30,
        """
        SELECT event_id,
               abs(CAST(FLOOR(value * 10000) AS BIGINT) - 1000000) AS abs_v,
               CAST(FLOOR(value) AS BIGINT) AS floor_v,
               CAST(CEIL(value) AS BIGINT) AS ceil_v,
               sqrt(CAST(CAST(FLOOR(value * 10000) AS BIGINT) AS DOUBLE)) AS sqrt_v,
               CAST(FLOOR(value * 10000) AS BIGINT) % 97 AS mod_v,
               CAST(sign(value - 100) AS INTEGER) AS sign_v,
               greatest(CAST(FLOOR(value * 10000) AS BIGINT), 500000) AS gr_v,
               least(CAST(FLOOR(value * 10000) AS BIGINT), 500000) AS ls_v,
               CAST(round(value) AS BIGINT) AS round_v
        FROM events
        """,
        doc="math battery restricted to correctly-rounded IEEE ops",
        tags=("functions", "math"),
    ),
    Query(
        "q77_array_output",
        q77,
        """
        SELECT user_id,
               array_to_string(list_sort(list(DISTINCT event_type)), '|') AS types,
               COUNT(*) AS n
        FROM events WHERE user_id < 20 GROUP BY user_id
        """,
        doc="array aggregation surface (live array tested in-repo; '|'-joined for the driver)",
        tags=("functions", "array"),
    ),
]
