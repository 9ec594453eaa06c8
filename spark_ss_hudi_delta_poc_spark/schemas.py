"""Declared schemas.

The reference declares every streaming schema explicitly (streaming file
sources require it; the SQS source enforces it at
SqsSourceProvider.scala:20).  We keep the same canonical schemas:

- retail invoices   (S3ToParquetStreamJob.scala:41-51)
- retail + UUID     (data/withuuid variant)
- CloudTrail nested (S3CloudTrailDeltaWriterWithExplodeCT.scala:72-131)
- CloudTrail flat   (S3CloudTrailIcebergWriter.scala:49-70)
- employees         (FileReaderNullWriterTest.scala:22-28)
- driver testdata   (TESTDATA.md / FIXTURES.md)
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- retail invoices (S3ToParquetStreamJob.scala:41-51) --------------------
# NB: StockCode stays StringType (codes like "85123A"); the DiskBasedTransform
# IntegerType variant is a reference bug (SURVEY.md §1.4 note).
RETAIL_SCHEMA = StructType(
    [
        StructField("srno", IntegerType()),
        StructField("InvoiceNo", IntegerType()),
        StructField("StockCode", StringType()),
        StructField("Description", StringType()),
        StructField("Quantity", IntegerType()),
        StructField("InvoiceDate", TimestampType()),
        StructField("UnitPrice", DoubleType()),
        StructField("CustomerID", DoubleType()),
        StructField("Country", StringType()),
        StructField("InvoiceTimestamp", TimestampType()),
    ]
)

RETAIL_WITH_UUID_SCHEMA = StructType(RETAIL_SCHEMA.fields + [StructField("UUID", StringType())])

# --- CloudTrail nested (S3CloudTrailDeltaWriterWithExplodeCT.scala:72-131) --
_SESSION_ISSUER = StructType(
    [
        StructField("type", StringType()),
        StructField("principalId", StringType()),
        StructField("arn", StringType()),
        StructField("accountId", StringType()),
        StructField("userName", StringType()),
    ]
)
_WEB_ID_FEDERATION = StructType(
    [
        StructField("federatedProvider", StringType()),
        StructField("attributes", MapType(StringType(), StringType())),
    ]
)
_SESSION_CONTEXT = StructType(
    [
        StructField(
            "attributes",
            StructType(
                [
                    StructField("creationDate", StringType()),
                    StructField("mfaAuthenticated", StringType()),
                ]
            ),
        ),
        StructField("sessionIssuer", _SESSION_ISSUER),
        StructField("webIdFederationData", _WEB_ID_FEDERATION),
    ]
)
_USER_IDENTITY = StructType(
    [
        StructField("type", StringType()),
        StructField("principalId", StringType()),
        StructField("arn", StringType()),
        StructField("accountId", StringType()),
        StructField("accessKeyId", StringType()),
        StructField("userName", StringType()),
        StructField("invokedBy", StringType()),
        StructField("identityProvider", StringType()),
        StructField("credentialId", StringType()),
        StructField("sessionContext", _SESSION_CONTEXT),
    ]
)
CLOUDTRAIL_RECORD_SCHEMA = StructType(
    [
        StructField("eventTime", StringType()),
        StructField("eventVersion", StringType()),
        StructField("userIdentity", _USER_IDENTITY),
        StructField("eventSource", StringType()),
        StructField("eventName", StringType()),
        StructField("eventType", StringType()),
        StructField("eventID", StringType()),
        StructField("eventCategory", StringType()),
        StructField("awsRegion", StringType()),
        StructField("sourceIPAddress", StringType()),
        StructField("userAgent", StringType()),
        StructField("errorCode", StringType()),
        StructField("errorMessage", StringType()),
        StructField("requestID", StringType()),
        StructField("apiVersion", StringType()),
        StructField("recipientAccountId", StringType()),
        StructField("vpcEndpointId", StringType()),
        StructField("sharedEventID", StringType()),
        StructField("sessionCredentialFromConsole", StringType()),
        StructField("edgeDeviceDetails", StringType()),
        StructField("readOnly", BooleanType()),
        StructField("managementEvent", BooleanType()),
        StructField("requestParameters", MapType(StringType(), StringType())),
        StructField("responseElements", MapType(StringType(), StringType())),
        StructField("additionalEventData", MapType(StringType(), StringType())),
        StructField("serviceEventDetails", MapType(StringType(), StringType())),
        StructField("resources", ArrayType(MapType(StringType(), StringType()))),
        StructField(
            "tlsDetails",
            StructType(
                [
                    StructField("tlsVersion", StringType()),
                    StructField("cipherSuite", StringType()),
                    StructField("clientProvidedHostHeader", StringType()),
                ]
            ),
        ),
        StructField(
            "addendum",
            StructType(
                [
                    StructField("reason", StringType()),
                    StructField("updatedFields", StringType()),
                    StructField("originalRequestID", StringType()),
                    StructField("originalEventID", StringType()),
                ]
            ),
        ),
    ]
)
CLOUDTRAIL_SCHEMA = StructType([StructField("Records", ArrayType(CLOUDTRAIL_RECORD_SCHEMA))])

# --- employees (FileReaderNullWriterTest.scala:22-28) -----------------------
EMPLOYEE_SCHEMA = StructType(
    [StructField(n, StringType()) for n in ["fname", "lname", "dept", "phone", "city", "state"]]
)

# --- driver testdata tables (TESTDATA.md) -----------------------------------
LINEITEM_SCHEMA = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampType()),
    ]
)
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)
EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
