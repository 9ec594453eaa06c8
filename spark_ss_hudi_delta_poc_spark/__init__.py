"""PySpark-native analytics engine with the capabilities of
bktechmission/spark-ss-hudi-delta-poc ("NormV2"), rebuilt Spark-first.

The reference (see /root/reference, SURVEY.md) is a Structured-Streaming
lakehouse-ingestion POC: file streams (CSV retail, nested CloudTrail JSON)
enriched and written to partitioned Parquet/Delta/Hudi/Iceberg tables, with
batch validation queries on the way back out.  This package re-expresses all
of that on the PySpark DataFrame/SQL API plus Structured Streaming, and
extends it with the LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) a 100 TB training-data pipeline needs.

Layout
------
- ``session``    SparkSession factory (local / cluster profiles)
- ``schemas``    declared schemas (retail, CloudTrail, employees, testdata)
- ``tables``     loaders for the driver's synthetic testdata tables
- ``functions``  column-level helpers (cross-engine hashing, datetime, text,
                 vectors) — all built on pyspark.sql.functions, JVM-side
- ``operators``  composed DataFrame operators (enrichment, explode/flatten,
                 dedup family, similarity search, text analysis, multimodal)
- ``sources``    batch + streaming readers, sink factory, notification-driven
                 file source (Python DataSource; SQS-source parity)
- ``plans``      the query registry: every query the engine claims, each with
                 a DuckDB oracle SQL where SQL-expressible
- ``streaming``  streaming jobs (stream->sink->read-back round trips,
                 watermarked windowed aggregation, stateful ops)
"""

__version__ = "0.1.0"
