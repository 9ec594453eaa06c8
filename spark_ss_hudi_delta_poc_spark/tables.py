"""Loaders for the driver's synthetic testdata (TESTDATA.md).

Parquet is self-describing, so batch reads infer the schema exactly as the
reference's parquet/delta/hudi/iceberg readers do
(S3ParquetBatchReader.scala:39-41).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Batch-read one testdata table (column pruning / predicate pushdown
    come free from the parquet scan — callers just select/filter).

    events.parquet has shipped with two ts encodings so far: TIMESTAMP(NANOS)
    (read nanos-as-long via the legacy conf, truncate to micros — the same
    truncation DuckDB applies) and micros TIMESTAMP_NTZ (normalize to session
    TIMESTAMP: the session is pinned UTC, so the instant is unchanged, and
    downstream unix_micros/window math — which rejects NTZ — works).
    """
    if name not in TESTDATA_TABLES:
        raise ValueError(f"unknown table {name!r}; known: {TESTDATA_TABLES}")
    if name == "events":
        # the NTZ->TIMESTAMP normalization below is instant-preserving ONLY
        # under a UTC session; enforce the precondition instead of assuming
        # it (a non-get_spark session would silently shift every instant)
        if spark.conf.get("spark.sql.session.timeZone") != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.to_timestamp("ts"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql(...) queries mirror
    the DuckDB oracle's pre-registered views."""
    for name in TESTDATA_TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
