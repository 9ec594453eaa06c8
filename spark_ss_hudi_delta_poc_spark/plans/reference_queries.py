"""Reference-parity kernels Q1–Q9, Q11 (SURVEY.md §2.8).

Each kernel re-expresses a reference behavior over the driver's synthetic
tables.  Citations point into /root/reference.  Streaming kernels Q10/Q12
live in streaming_queries.py.

Scale notes (100 TB stance):
- Q1–Q4 are scan + partial/final HashAggregate plans: one shuffle on the
  grouping key, map-side combine free from Catalyst (SURVEY.md §4).  Column
  pruning reaches the parquet scan — each reads exactly one column.
- Q5–Q9/Q11 are pure map stages (no shuffle at all): whole-stage codegen'd
  projections that scale linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .registry import Query

ISO_Z = "yyyy-MM-dd'T'HH:mm:ss'Z'"


# --- Q1: full count (A1; S3ParquetBatchReader.scala:46) ---------------------
def q01(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


# --- Q2: group-count-count (A2; S3ParquetBatchReader.scala:51) --------------
def q02(spark: SparkSession, sf: str) -> DataFrame:
    groups = load(spark, sf, "lineitem").groupBy("l_partkey").count()
    return groups.agg(F.count(F.lit(1)).alias("n_groups"))


# --- Q3: distinct count (A3; S3ParquetBatchReader.scala:57) -----------------
def q03(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return li.select("l_partkey").distinct().agg(F.count(F.lit(1)).alias("n_distinct"))


# --- Q4: dup detection, group+HAVING (A4; S3ParquetBatchReader.scala:63-65) -
def q04(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 1)
    )


# --- Q5: enrichment round-trip (P1/F1/F2; S3ToParquetStreamJob.scala:65-69) -
def q05(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    ).select(
        "event_id",
        "ts_str",
        F.to_timestamp("ts_str", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
        F.to_date(F.to_timestamp("ts_str", "yyyy-MM-dd HH:mm:ss")).alias("event_date"),
    )


# --- Q6: string-predicate filter (P9; S3ToParquetStreamJob.scala:64) --------
def q06(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    return ev.filter("event_type = 'purchase'").agg(F.count(F.lit(1)).alias("cnt"))


# --- Q7: explode + struct flatten (P7/P3/P6;
#     S3CloudTrailDeltaWriterWithExplodeCT.scala:148-154) --------------------
def q07(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    rec = F.array(
        F.struct(F.col("event_type").alias("t"), F.col("value").alias("v")),
        F.struct(F.col("event_type").alias("t"), (F.col("value") * 2).alias("v")),
    )
    return ev.select("event_id", F.explode(rec).alias("x")).select("event_id", "x.*")


# --- Q8: epoch parse round-trip (F4/F5;
#     S3CloudTrailDeltaWriterWithExplodeCT.scala:150) ------------------------
def q08(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    iso = F.date_format("ts", ISO_Z)
    return ev.select(
        "event_id",
        F.unix_timestamp(iso, ISO_Z).alias("epoch_rt"),
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("epoch_direct"),
    )


# --- Q9: JSON parse / serialize round-trip (F6/F7;
#     StringTransformJob.scala:49-51) ----------------------------------------
def q09(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    parsed = F.from_json("props", "k INT")
    rt = F.from_json(
        F.to_json(F.struct(F.col("event_type"), F.col("value"))),
        "event_type STRING, value DOUBLE",
    )
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k"),
        rt.getField("event_type").alias("rt_event_type"),
        rt.getField("value").alias("rt_value"),
    )


# --- Q11: datetime battery (F8-F14; TestDate.scala:21-26,
#     DiskBasedTransformJob.scala:47-67) -------------------------------------
def q11(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    return ev.select(
        "event_id",
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.second("ts").alias("s"),
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("dom"),
        F.date_trunc("hour", F.col("ts")).alias("ts_hour"),
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("ts_fmt"),
        F.from_unixtime(F.unix_timestamp(F.date_trunc("second", F.col("ts")))).alias("ts_sec_str"),
        F.to_utc_timestamp(F.col("ts"), "MST").alias("ts_from_mst"),
        F.expr("ts - INTERVAL 1 DAY").alias("day_before"),
    )


QUERIES = [
    Query(
        "q01_count",
        q01,
        "SELECT COUNT(*) AS cnt FROM lineitem",
        doc="A1 full-table count (S3ParquetBatchReader.scala:46)",
        tags=("reference", "agg"),
    ),
    Query(
        "q02_group_count",
        q02,
        "SELECT COUNT(*) AS n_groups FROM (SELECT l_partkey FROM lineitem GROUP BY l_partkey)",
        doc="A2 groupBy(StockCode).count().count() analog",
        tags=("reference", "agg"),
    ),
    Query(
        "q03_distinct_count",
        q03,
        "SELECT COUNT(*) AS n_distinct FROM (SELECT DISTINCT l_partkey FROM lineitem)",
        doc="A3 select(StockCode).distinct.count analog",
        tags=("reference", "agg"),
    ),
    Query(
        "q04_dup_having",
        q04,
        "SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 1",
        doc="A4 duplicate detector groupBy(srno).count().where(>1)",
        tags=("reference", "agg"),
    ),
    Query(
        "q05_ts_roundtrip",
        q05,
        """
        SELECT event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
               strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS event_ts,
               CAST(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS DATE) AS event_date
        FROM events
        """,
        doc="Q5 enrichment chain: format → to_timestamp → to_date round-trip",
        tags=("reference", "map"),
    ),
    Query(
        "q06_filter",
        q06,
        "SELECT COUNT(*) AS cnt FROM events WHERE event_type = 'purchase'",
        doc="P9 string-predicate filter (Country='United Kingdom' analog)",
        tags=("reference", "filter"),
    ),
    Query(
        "q07_explode_flatten",
        q07,
        """
        SELECT event_id, event_type AS t, value AS v FROM events
        UNION ALL
        SELECT event_id, event_type AS t, value * 2 AS v FROM events
        """,
        doc="P7/P3/P6 explode(array(struct)) + record.* flatten (CloudTrail shape)",
        tags=("reference", "map"),
    ),
    Query(
        "q08_epoch_roundtrip",
        q08,
        """
        SELECT event_id,
               CAST(epoch(strptime(strftime(ts, '%Y-%m-%dT%H:%M:%SZ'), '%Y-%m-%dT%H:%M:%SZ')) AS BIGINT) AS epoch_rt,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_direct
        FROM events
        """,
        doc="F4/F5 unix_timestamp pattern parse round-trip at second precision",
        tags=("reference", "map"),
    ),
    Query(
        "q09_json_roundtrip",
        q09,
        """
        SELECT event_id,
               CAST(props->>'$.k' AS INTEGER) AS k,
               event_type AS rt_event_type,
               value AS rt_value
        FROM events
        """,
        doc="F6/F7 from_json(props) + from_json(to_json(struct)) identity",
        tags=("reference", "map"),
    ),
    Query(
        "q11_datetime_battery",
        q11,
        """
        SELECT event_id,
               CAST(hour(ts) AS INTEGER) AS h,
               CAST(minute(ts) AS INTEGER) AS mi,
               CAST(EXTRACT(second FROM date_trunc('second', ts)) AS INTEGER) AS s,
               CAST(year(ts) AS INTEGER) AS y,
               CAST(month(ts) AS INTEGER) AS mo,
               CAST(day(ts) AS INTEGER) AS dom,
               date_trunc('hour', ts) AS ts_hour,
               strftime(ts, '%Y-%m-%d %H:%M') AS ts_fmt,
               strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_sec_str,
               ts + INTERVAL 7 HOUR AS ts_from_mst,
               ts - INTERVAL 1 DAY AS day_before
        FROM events
        """,
        doc="F8-F14 hour/minute/second/year/month/day/date_trunc/date_format/"
        "from_unixtime/to_utc_timestamp(MST=UTC-7)/interval battery",
        tags=("reference", "map"),
    ),
]
