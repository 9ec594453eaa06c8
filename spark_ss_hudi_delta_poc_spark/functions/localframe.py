"""Tiny driver-side DataFrames as Arrow LOCAL RELATIONS.

``spark.createDataFrame(list_of_tuples)`` parallelizes the rows into a
``defaultParallelism``-partition Python RDD: every downstream task pays a
JVM->Python runner handshake per parent partition, and a ``coalesce(1)``
(the natural layout for the 16-row metadata artifacts the cross-run
ingests persist — centroids, occupancy, offsets, normalizers) evaluates
ALL of those partitions SEQUENTIALLY inside one task.  Measured on this
box: 5-7 s per tiny metadata write, pure wait (executor cpu ~0.1 s) —
the single largest fixed cost in every streaming ingest trigger
(round-15 optimization, guide §4/§5: the Python boundary does not belong
in a 16-row metadata write).

``local_df`` builds the same rows as a pyarrow Table instead, which
PySpark turns into a LocalTableScan (driver-embedded literal data, no
Python stage at all): the identical rows, schema and nullability, with
the write now a pure-JVM single task (~0.2 s).  Any conversion surprise
falls back to the classic path, so behavior is never worse than before.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def _as_struct(spark: SparkSession, schema: str | StructType) -> StructType:
    if isinstance(schema, StructType):
        return schema
    from pyspark.sql.types import _parse_datatype_string

    parsed = _parse_datatype_string(schema)
    if not isinstance(parsed, StructType):
        raise ValueError(f"local_df needs a struct schema, got {parsed}")
    return parsed


def local_df(
    spark: SparkSession, rows: list, schema: str | StructType
) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for SMALL driver-side row
    lists, built through Arrow so the result is a LocalTableScan (no
    Python-RDD scan, no per-task Python handshake).  Intended for
    bounded metadata frames (centroids, occupancy, offsets, sketches);
    falls back to the classic builder on any Arrow conversion failure.

    Timezone caveat (ADVICE r15): the fallback only catches HARD Arrow
    conversion errors — naive datetime values would convert on BOTH
    paths but under different timezone interpretations (Arrow: session
    timezone; classic: OS-local), so they could silently differ on a
    box whose OS tz is not the session's UTC.  This helper is therefore
    for TZ-INSENSITIVE metadata schemas only (ints/strings/arrays/
    bools); no call site passes timestamps, and new ones must either
    keep that rule or normalize datetimes to UTC explicitly first."""
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        struct = _as_struct(spark, schema)
        arrow_schema = to_arrow_schema(struct)
        cols = list(zip(*rows)) if rows else [[] for _ in struct.fields]
        arrays = [
            pa.array(list(col), type=f.type)
            for col, f in zip(cols, arrow_schema)
        ]
        table = pa.Table.from_arrays(arrays, schema=arrow_schema)
        return spark.createDataFrame(table, schema=struct)
    except Exception:  # pragma: no cover - safety net, behavior-preserving
        return spark.createDataFrame(rows, schema)
