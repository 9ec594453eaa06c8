"""Row-enrichment chain — the reference's core transformation.

Every streaming job appends the same four derived columns
(S3ToParquetStreamJob.scala:65-69):

  EventTimestamp      = to_timestamp(InvoiceTimestamp, fmt)
  Date                = to_date(EventTimestamp)
  NormalizedTimestamp = current_timestamp()          (ingestion time)
  UUID                = uuid()                        (row id)

Notes vs the reference:
- The reference's pattern ``yyyy-MM-dd HH24:mm:ss`` is an invalid java.time
  token (SURVEY.md §2.5 F1); we use the corrected ``yyyy-MM-dd HH:mm:ss``.
- The reference generates UUIDs with a registered Scala UDF
  (S3ToParquetStreamJob.scala:85).  Spark has a native ``uuid()`` expression
  — JVM-side, codegen'd — so no Python UDF is ever involved.

All five expressions are built-ins → whole-stage codegen, no shuffle: this
enrichment is a pure map stage that scales linearly to any input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def enrich(
    df: DataFrame,
    ts_col: str = "InvoiceTimestamp",
    fmt: str = TS_FMT,
    deterministic_only: bool = False,
) -> DataFrame:
    """Append the 4-column enrichment chain.

    ``deterministic_only=True`` skips NormalizedTimestamp/UUID so the result
    is oracle-hashable (SURVEY.md §7 hard-part #4: non-deterministic columns
    are excluded from correctness hashing).
    """
    out = df.withColumn("EventTimestamp", F.to_timestamp(F.col(ts_col).cast("string"), fmt)).withColumn(
        "Date", F.to_date(F.col("EventTimestamp"))
    )
    if not deterministic_only:
        out = out.withColumn("NormalizedTimestamp", F.current_timestamp()).withColumn(
            "UUID", F.expr("uuid()")
        )
    return out


def uuid_column() -> Column:
    """Native uuid() — parity with the reference's registered UDF (U1)."""
    return F.expr("uuid()")


def register_uuid_udf(spark) -> None:
    """API-fidelity demo of ``sqlContext.udf.register("uuid", ...)``
    (S3ToParquetStreamJob.scala:39).  Registered under a distinct name so it
    never shadows the faster native uuid(); kept out of all hot paths."""
    import uuid as _uuid

    spark.udf.register("py_uuid", lambda: str(_uuid.uuid4()))
