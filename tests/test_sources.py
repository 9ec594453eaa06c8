"""Source/sink tests over FIXTURES.md-style fixtures (F1 retail CSV, F3
employee JSON, F4 zipcode JSON strings) — the reference's ingestion surface."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from spark_ss_hudi_delta_poc_spark.operators.enrich import enrich
from spark_ss_hudi_delta_poc_spark.schemas import EMPLOYEE_SCHEMA, RETAIL_SCHEMA
from spark_ss_hudi_delta_poc_spark.sources.batch import read_csv, read_json, read_json_strings
from spark_ss_hudi_delta_poc_spark.sources.sinks import write_batch

RETAIL_ROWS = [
    "1,536365,85123A,WHITE HANGING HEART,6,2010-12-01,2.55,17850.0,United Kingdom,2010-12-01 08:26:00",
    "2,536365,71053,WHITE METAL LANTERN,6,2010-12-01,3.39,17850.0,United Kingdom,2010-12-01 08:26:00",
    "3,536367,84406B,CREAM CUPID,8,2010-12-01,2.75,,France,2010-12-01 08:34:00",
]
RETAIL_HEADER = "srno,InvoiceNo,StockCode,Description,Quantity,InvoiceDate,UnitPrice,CustomerID,Country,InvoiceTimestamp"


def test_retail_csv_roundtrip(spark, tmp_path):
    """S5 CSV read with the retail schema (StockCode stays string —
    '85123A' must NOT become null) + P1/F1-F5 enrichment + K1-style
    partitioned parquet write + read-back."""
    p = os.path.join(tmp_path, "retail.csv")
    with open(p, "w") as f:
        f.write(RETAIL_HEADER + "\n" + "\n".join(RETAIL_ROWS) + "\n")
    df = read_csv(spark, p, schema=RETAIL_SCHEMA)
    assert df.count() == 3
    rows = {r.srno: r for r in df.collect()}
    assert rows[1].StockCode == "85123A"
    assert rows[3].CustomerID is None
    enriched = enrich(df)
    sink = os.path.join(tmp_path, "sink")
    write_batch(enriched, "parquet", sink, mode="overwrite", partition_by=["Date", "Country"])
    back = spark.read.parquet(sink)
    assert back.count() == 3
    assert back.where(F.col("Country") == "France").count() == 1
    # partition pruning: only hive dirs for the two countries exist
    assert any("Country=France" in d for d, _, _ in os.walk(sink) for d in [d])


def test_employee_json_partitioned_write(spark, tmp_path):
    """S6 + K8 (FileReaderNullWriterTest): JSON read w/ explicit all-string
    schema, repartition(dept), partitioned overwrite, nulls preserved."""
    p = os.path.join(tmp_path, "emp.json")
    recs = [
        {"fname": "a", "lname": "b", "dept": "eng", "phone": None, "city": "x", "state": "y"},
        {"fname": "c", "lname": "d", "dept": "ops", "phone": "123", "city": "z", "state": None},
    ]
    with open(p, "w") as f:
        f.write("\n".join(json.dumps(r) for r in recs))
    df = read_json(spark, p, schema=EMPLOYEE_SCHEMA).repartition(F.col("dept"))
    sink = os.path.join(tmp_path, "delta_sink")  # parquet stand-in (no delta jars)
    write_batch(df, "parquet", sink, mode="overwrite", partition_by=["dept"])
    back = spark.read.parquet(sink)
    assert back.count() == 2
    assert back.where(F.col("phone").isNull()).count() == 1


def test_json_string_schema_inference(spark):
    """S7/F7 (StringTransformJob): infer schema from heterogeneous JSON
    strings, apply with from_json, flatten value.* and drop."""
    data = [
        (1, '{"Zipcode":704,"ZipCodeType":"STANDARD1","City":"PARC PARQUE1","State":"PR1"}'),
        (2, '{"Zipcode":705,"ZipCodeType":"STANDARD2","City":"PARC PARQUE2","StateMap":{"State":"PR2"}}'),
        (3, '{"Zipcode":707,"ZipCodeType":"STANDARD4","CityArr":["PARC PARQUE4","PARQUE4"],"StateMap":{"State":"PR4"}}'),
    ]
    df = spark.createDataFrame(data, ["id", "value"])
    inferred = read_json_strings(spark, df, "value")
    schema = inferred.schema
    names = set(schema.fieldNames())
    assert {"Zipcode", "ZipCodeType", "City", "StateMap", "CityArr"} <= names
    applied = df.withColumn("parsed", F.from_json("value", schema)).select("id", "parsed.*")
    got = {r.id: r.Zipcode for r in applied.collect()}
    assert got == {1: 704, 2: 705, 3: 707}


def test_csv_sep_variant(spark, tmp_path):
    """F6 semicolon-delimited CSV (mutual funds)."""
    p = os.path.join(tmp_path, "mf.csv")
    with open(p, "w") as f:
        f.write("scheme_code;scheme_name;nav\n1;Fund A;10.5\n2;Fund B;11.0\n")
    df = read_csv(spark, p, sep=";")
    assert df.count() == 2 and "scheme_name" in df.columns


def test_foreach_batch_persist_writer(spark, tmp_path):
    """K7 (S3ToHudiStreamJob.persist_DF): persist → double write → unpersist
    in a foreachBatch sink; both sinks see every row exactly once."""
    import os

    from spark_ss_hudi_delta_poc_spark.sources.sinks import foreach_batch_persist_writer
    from spark_ss_hudi_delta_poc_spark.sources.stream import read_file_stream, stage_as_files
    from spark_ss_hudi_delta_poc_spark.schemas import EVENTS_SCHEMA
    from spark_ss_hudi_delta_poc_spark.tables import load

    staged = stage_as_files(load(spark, "/root/testdata/sf0.001", "events"), str(tmp_path), 2)
    sink_a = os.path.join(tmp_path, "a")
    sink_b = os.path.join(tmp_path, "b")

    def double_write(batch_df, batch_id):
        assert batch_df.storageLevel.useMemory  # persisted by the wrapper
        batch_df.write.mode("append").parquet(sink_a)
        batch_df.write.mode("append").parquet(sink_b)

    stream = read_file_stream(spark, staged, "parquet", EVENTS_SCHEMA, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(foreach_batch_persist_writer(double_write))
        .option("checkpointLocation", os.path.join(tmp_path, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    want = load(spark, "/root/testdata/sf0.001", "events").count()
    assert spark.read.parquet(sink_a).count() == want
    assert spark.read.parquet(sink_b).count() == want


def test_lakehouse_format_probe(spark):
    """Delta/Hudi/Iceberg jars are not shipped in this environment: the
    probe must report them unavailable (and parquet available), so sink
    selection degrades explicitly instead of failing mid-write."""
    from spark_ss_hudi_delta_poc_spark.sources.batch import format_available

    assert format_available(spark, "parquet")
    for fmt in ["delta", "hudi", "iceberg"]:
        assert format_available(spark, fmt) is False


def test_csv_file_stream(spark, tmp_path):
    """S1 — the reference's canonical source: CSV file stream with schema,
    header, and maxFilesPerTrigger (S3ToParquetStreamJob.scala:54-60)."""
    from spark_ss_hudi_delta_poc_spark.sources.stream import read_file_stream

    src = os.path.join(tmp_path, "csv_src")
    os.makedirs(src)
    for i in range(3):
        with open(os.path.join(src, f"f{i}.csv"), "w") as f:
            f.write(RETAIL_HEADER + "\n" + RETAIL_ROWS[i] + "\n")
    stream = read_file_stream(
        spark, src, "csv", RETAIL_SCHEMA, max_files_per_trigger=1, header=True
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("csv_stream_mem")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("csv_stream_mem").collect()
    assert len(rows) == 3
    assert {r.StockCode for r in rows} == {"85123A", "71053", "84406B"}


def test_gzipped_json_stream(spark, tmp_path):
    """S2 — .json.gz streaming read (the CloudTrail batches are gzipped:
    application.conf:11); Spark decompresses transparently."""
    import gzip

    from spark_ss_hudi_delta_poc_spark.schemas import EMPLOYEE_SCHEMA
    from spark_ss_hudi_delta_poc_spark.sources.stream import read_file_stream

    src = os.path.join(tmp_path, "gz_src")
    os.makedirs(src)
    recs = [{"fname": f"n{i}", "lname": "l", "dept": "d", "phone": None, "city": "c", "state": "s"} for i in range(4)]
    with gzip.open(os.path.join(src, "a.json.gz"), "wt") as f:
        f.write("\n".join(json.dumps(r) for r in recs))
    stream = read_file_stream(spark, src, "json", EMPLOYEE_SCHEMA)
    q = stream.writeStream.format("memory").queryName("gz_mem").trigger(availableNow=True).start()
    q.awaitTermination()
    assert spark.table("gz_mem").count() == 4


def test_text_read_and_json_write(spark, tmp_path):
    """S8 text read (StringTransformJob.scala:33) + K9 batch JSON write
    (StringTransformJob.scala:57) round-trip."""
    from spark_ss_hudi_delta_poc_spark.sources.batch import read_text

    p = os.path.join(tmp_path, "lines.txt")
    with open(p, "w") as f:
        f.write("alpha\nbeta\ngamma\n")
    df = read_text(spark, p)
    assert df.count() == 3 and df.columns == ["value"]
    out = os.path.join(tmp_path, "json_out")
    write_batch(df, "json", out, mode="overwrite")
    back = spark.read.json(out)
    assert sorted(r.value for r in back.collect()) == ["alpha", "beta", "gamma"]


def test_registered_python_uuid_udf(spark):
    """U1 API fidelity: spark.udf.register a Python uuid UDF
    (S3ToParquetStreamJob.scala:39,85) — native uuid() stays the hot path."""
    from spark_ss_hudi_delta_poc_spark.operators.enrich import register_uuid_udf

    register_uuid_udf(spark)
    row = spark.sql("SELECT py_uuid() AS u, uuid() AS native").collect()[0]
    assert len(row.u) == 36 and len(row.native) == 36 and row.u != row.native


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC batch write + read-back (ships with Spark, no extra jar): rows
    survive exactly, and a filter over the read pushes into the ORC scan
    (PushedFilters) just like parquet — the format is a first-class
    columnar alternative, not a blind passthrough."""
    import contextlib
    import io
    import os

    from pyspark.sql import functions as F

    from spark_ss_hudi_delta_poc_spark.sources.batch import read_table
    from spark_ss_hudi_delta_poc_spark.sources.sinks import write_batch

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("grp"), (F.col("id") * 2).alias("v")
    )
    path = os.path.join(tmp_path, "orc_sink")
    write_batch(df, "orc", path, mode="overwrite", partition_by=["grp"])
    back = read_table(spark, path, fmt="orc")
    assert back.count() == 100
    assert back.where(F.col("grp") == 3).count() == df.where(F.col("id") % 7 == 3).count()
    assert {r.id for r in back.collect()} == set(range(100))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.where(F.col("v") > 100).explain("formatted")
    p = buf.getvalue()
    assert "PushedFilters: [" in p and "GreaterThan(v,100)" in p


def test_json_malformed_record_policies(spark, tmp_path):
    """PERMISSIVE captures the raw bad record in the corrupt column;
    DROPMALFORMED silently skips it; good rows parse either way."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from spark_ss_hudi_delta_poc_spark.sources.batch import read_json

    p = tmp_path / "mixed.jsonl"
    p.write_text('{"id": 1, "name": "ok"}\n{"id": oops not json\n{"id": 2, "name": "fine"}\n')
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("_bad", StringType()),
        ]
    )
    cap = read_json(spark, str(p), schema=schema, corrupt_col="_bad").cache()
    try:
        good = cap.where("_bad IS NULL")
        bad = cap.where("_bad IS NOT NULL")
        assert sorted(r.id for r in good.collect()) == [1, 2]
        assert bad.count() == 1 and "oops" in bad.collect()[0]._bad
    finally:
        cap.unpersist()
    dropped = read_json(spark, str(p), schema=schema, mode="DROPMALFORMED")
    assert sorted(r.id for r in dropped.select("id").collect()) == [1, 2]


def test_csv_malformed_record_policies(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from spark_ss_hudi_delta_poc_spark.sources.batch import read_csv

    p = tmp_path / "mixed.csv"
    p.write_text("id,qty\n1,10\n2,notanumber\n3,30\n")
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("qty", LongType()),
            StructField("_bad", StringType()),
        ]
    )
    cap = read_csv(spark, str(p), schema=schema, corrupt_col="_bad").cache()
    try:
        assert sorted(r.id for r in cap.where("_bad IS NULL").collect()) == [1, 3]
        bad = cap.where("_bad IS NOT NULL").collect()
        assert len(bad) == 1 and "notanumber" in bad[0]._bad
    finally:
        cap.unpersist()
    # DROPMALFORMED needs a schema WITHOUT the corrupt column: a schema
    # that includes it re-legitimizes bad rows (they parse "successfully"
    # into the capture column), a documented Spark CSV subtlety
    bare = StructType([StructField("id", LongType()), StructField("qty", LongType())])
    dropped = read_csv(spark, str(p), schema=bare, mode="DROPMALFORMED")
    assert sorted(r.id for r in dropped.collect()) == [1, 3]
    # ...and CSV column pruning interacts with it: selecting only `id`
    # means `qty` is never parsed, so its malformation is never DETECTED
    # and the bad row comes back — the quirk that makes quarantine-by-
    # capture (above) the reliable policy for audited pipelines
    assert sorted(r.id for r in dropped.select("id").collect()) == [1, 2, 3]
