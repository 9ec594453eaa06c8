"""CloudTrail nested-JSON pipeline tests (reference job family EP2/Phase 3:
explode+flatten, raw-string, raw-struct variants, 4-col partitioned sink)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from spark_ss_hudi_delta_poc_spark.schemas import CLOUDTRAIL_SCHEMA
from spark_ss_hudi_delta_poc_spark.streaming.cloudtrail import (
    VARIANTS,
    stream_cloudtrail,
    transform_cloudtrail,
)


def _record(i: int, day: int = 1) -> dict:
    return {
        "eventTime": f"2024-03-{day:02d}T10:0{i % 10}:00Z",
        "eventVersion": "1.08",
        "eventSource": "s3.amazonaws.com",
        "eventName": "PutObject",
        "eventType": "AwsApiCall",
        "eventID": f"ev-{i}",
        "awsRegion": "us-east-1",
        "sourceIPAddress": "1.2.3.4",
        "readOnly": i % 2 == 0,
        "managementEvent": False,
        "requestParameters": {"bucketName": f"b{i}"},
        "resources": [{"ARN": f"arn:{i}"}],
        "userIdentity": {
            "type": "IAMUser",
            "principalId": f"p{i}",
            "sessionContext": {
                "attributes": {"creationDate": "2024-03-01", "mfaAuthenticated": "false"},
                "sessionIssuer": {"type": "Role", "userName": "u"},
            },
        },
        "tlsDetails": {"tlsVersion": "TLSv1.2"},
    }


def _write_files(tmp_path, n_files: int = 2, recs_per_file: int = 5) -> str:
    src = os.path.join(tmp_path, "ct_src")
    os.makedirs(src, exist_ok=True)
    for f_idx in range(n_files):
        recs = [_record(f_idx * recs_per_file + i, day=f_idx + 1) for i in range(recs_per_file)]
        with open(os.path.join(src, f"ct_{f_idx}.json"), "w") as f:
            f.write(json.dumps({"Records": recs}))
    return src


def test_transform_flatten_batch(spark, tmp_path):
    import datetime

    src = _write_files(tmp_path)
    df = spark.read.schema(CLOUDTRAIL_SCHEMA).json(src)
    out = transform_cloudtrail(df, "flatten")
    rows = out.collect()
    assert len(rows) == 10  # explode: 1 row per record
    cols = set(out.columns)
    assert {"eventTime", "eventID", "userIdentity", "index", "subtype", "date", "bu"} <= cols
    # reference semantics (ExplodeCT.scala:148-161): subtype is the
    # record's eventSource, bu is the constant tenant tag 'falcon'
    assert all(r["index"] == "cloudtrail" and r.bu == "falcon" for r in rows)
    assert all(r.subtype == "s3.amazonaws.com" for r in rows)
    assert {r.date for r in rows} == {datetime.date(2024, 3, 1), datetime.date(2024, 3, 2)}
    # nested access survived the flatten
    assert rows[0].userIdentity.sessionContext.attributes.mfaAuthenticated == "false"


def test_flatten_layout_matches_reference_column_set(spark, tmp_path):
    """Layout parity with S3CloudTrailDeltaWriterWithExplodeCT.scala: the
    enrichment columns (ddi_*, subtype=eventSource), the flattened record
    fields, the derived/constant partition columns, and NO timestamp work
    column."""
    src = _write_files(tmp_path)
    df = spark.read.schema(CLOUDTRAIL_SCHEMA).json(src)
    out = transform_cloudtrail(df, "flatten")
    record_fields = [f.name for f in CLOUDTRAIL_SCHEMA["Records"].dataType.elementType.fields]
    expected = (
        ["ddi_eventtimestamp", "subtype", "ddi_awsreg"]
        + record_fields
        + ["date", "ddi_normalizedTimestamp", "index", "bu"]
    )
    assert out.columns == expected  # exact order, exact set
    assert "timestamp" not in out.columns  # dropped like the reference
    types = dict(out.dtypes)
    assert types["date"] == "date"
    assert types["ddi_eventtimestamp"] == "string"
    assert types["ddi_normalizedTimestamp"] == "string"
    r = out.select("ddi_awsreg", "ddi_eventtimestamp", "eventSource", "subtype").first()
    assert r.ddi_awsreg == "us-east-1"
    assert r.subtype == r.eventSource  # alias of the same record field
    assert r.ddi_eventtimestamp.endswith("Z")  # raw string, unparsed


def test_transform_raw_variants_roundtrip(spark, tmp_path):
    src = _write_files(tmp_path)
    df = spark.read.schema(CLOUDTRAIL_SCHEMA).json(src)
    raw_s = transform_cloudtrail(df, "raw_string")
    assert dict(raw_s.dtypes)["rawmsg"] == "string"
    parsed = raw_s.select(F.from_json("rawmsg", CLOUDTRAIL_SCHEMA["Records"].dataType.elementType).alias("r"))
    assert parsed.select("r.eventID").distinct().count() == 10
    raw_t = transform_cloudtrail(df, "raw_struct")
    assert dict(raw_t.dtypes)["rawmsg"].startswith("struct")
    assert raw_t.select("rawmsg.eventID").distinct().count() == 10


def test_stream_cloudtrail_partitioned_sink(spark, tmp_path):
    src = _write_files(tmp_path)
    sink = os.path.join(tmp_path, "sink")
    q = stream_cloudtrail(
        spark, src, sink, checkpoint=os.path.join(tmp_path, "ckpt"), variant="flatten",
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    back = spark.read.parquet(sink)
    assert back.count() == 10
    # 4-col hive partitioning exists on disk → partition pruning works;
    # subtype level is the eventSource, bu level the constant tag
    assert os.path.isdir(os.path.join(sink, "index=cloudtrail"))
    assert os.path.isdir(
        os.path.join(
            sink, "index=cloudtrail", "date=2024-03-01", "subtype=s3.amazonaws.com", "bu=falcon"
        )
    )
    pruned = back.where((F.col("date") == "2024-03-01") & (F.col("index") == "cloudtrail"))
    assert pruned.count() == 5


def test_all_variants_stream(spark, tmp_path):
    src = _write_files(tmp_path, n_files=1)
    for v in VARIANTS:
        sink = os.path.join(tmp_path, f"sink_{v}")
        q = stream_cloudtrail(spark, src, sink, checkpoint=os.path.join(tmp_path, f"ck_{v}"), variant=v)
        q.awaitTermination()
        assert spark.read.parquet(sink).count() == 5, v
