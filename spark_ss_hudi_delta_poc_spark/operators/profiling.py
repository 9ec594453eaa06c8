"""Data profiling — per-column statistics in ONE pass over the table.

Profiling a 100 TB table one column at a time is N full scans; this
computes every column's stats (rows, nulls, distincts, min/max where
ordered) in a single aggregation, then unpivots to one row per column.
Numeric min/max are emitted integer-scaled so the result stays
engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_val, max_val) per column.

    min/max rendered as strings (numerics via exact e4 scaling) so the
    unpivoted schema is uniform.
    """
    columns = columns or df.columns
    aggs = []
    for c in columns:
        dt = df.schema[c].dataType
        aggs.append(F.count(F.lit(1)).alias(f"{c}__n"))
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"{c}__distinct"))
        if isinstance(dt, NumericType):
            aggs.append(F.min(F.floor(F.col(c) * 10000).cast("long")).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(F.floor(F.col(c) * 10000).cast("long")).cast("string").alias(f"{c}__max"))
        elif isinstance(dt, StringType):
            aggs.append(F.min(F.col(c)).alias(f"{c}__min"))
            aggs.append(F.max(F.col(c)).alias(f"{c}__max"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"{c}__min"))
            aggs.append(F.lit(None).cast("string").alias(f"{c}__max"))
    wide = df.agg(*aggs)
    rows = []
    for c in columns:
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_val"),
                F.col(f"{c}__max").alias("max_val"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")
