"""Partitioning helpers shared by CPU-bound operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Rebalance a narrow input before a CPU-bound (hashing / Python) map
    stage.

    A small or unsplittable parquet file arrives as ONE partition, which
    serializes all per-row work onto a single core.  Round-robin
    repartition to the cluster's default parallelism costs one tiny
    shuffle and buys full fan-out.  At 100 TB inputs already have
    thousands of splits and this is a cheap rebalance, never a coalesce.
    """
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)
