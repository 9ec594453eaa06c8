"""Property-based tests (hypothesis) for the pure-Python kernels whose
determinism the oracles depend on, plus CSV malformed-record handling."""

from __future__ import annotations

import hashlib
import json

from hypothesis import given, settings
from hypothesis import strategies as st

from spark_ss_hudi_delta_poc_spark.operators.multimodal import fake_decode
from spark_ss_hudi_delta_poc_spark.operators.similarity import hyperplane
from spark_ss_hudi_delta_poc_spark.sources.notification import _parse_message


@given(st.binary(min_size=0, max_size=200))
def test_fake_decode_deterministic_and_bounded(payload):
    a = fake_decode(payload)
    b = fake_decode(payload)
    assert a == b
    byte_len, width, height, mean_px = a
    assert byte_len == len(payload)
    assert 32 <= width <= 1024 and 32 <= height <= 1024
    assert 0.0 <= mean_px < 256.0


@given(st.text(min_size=0, max_size=100), st.integers(min_value=0, max_value=2**40))
def test_parse_message_plain_roundtrip(path, ts):
    msg = json.dumps({"path": path, "eventTime": ts})
    assert _parse_message(msg) == (path, ts)


@given(st.text(max_size=200))
def test_parse_message_never_raises(garbage):
    # malformed queue messages must parse to None, never throw
    assert _parse_message(garbage) is None or isinstance(_parse_message(garbage), tuple)


@given(st.integers(min_value=0, max_value=63))
@settings(max_examples=20)
def test_hyperplane_components_bounded_and_stable(plane):
    hp = hyperplane(plane)
    assert len(hp) == 64
    assert all(-1000 <= v <= 1000 for v in hp)
    assert hp == hyperplane(plane)  # pure function of the seed
    # matches the documented md5 derivation (what the SQL oracle embeds)
    h0 = int(hashlib.md5(f"{plane}:0".encode()).hexdigest()[:15], 16)
    assert hp[0] == h0 % 2001 - 1000


def test_csv_malformed_records_permissive_and_drop(spark, tmp_path):
    """Ingestion robustness: PERMISSIVE keeps bad rows as nulls + corrupt
    column; DROPMALFORMED silently drops them — both must be available for
    dirty 100 TB corpora."""
    import os

    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    p = os.path.join(tmp_path, "dirty.csv")
    with open(p, "w") as f:
        f.write("id,qty\n1,10\nbad_row_no_comma\n3,notanumber\n4,40\n")
    schema = StructType(
        [
            StructField("id", IntegerType()),
            StructField("qty", IntegerType()),
            StructField("_corrupt", StringType()),
        ]
    )
    perm = (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema(schema)
        .csv(p)
    )
    rows = perm.collect()
    assert len(rows) == 4
    corrupt = [r for r in rows if r._corrupt is not None]
    assert len(corrupt) == 2  # bad_row and notanumber
    dropped = (
        spark.read.option("header", "true")
        .option("mode", "DROPMALFORMED")
        .schema(StructType(schema.fields[:2]))
        .csv(p)
    )
    # NB: count() alone would prune all columns and parse nothing — rows
    # must be materialized for malformed detection to apply
    assert len(dropped.collect()) == 2  # only clean rows survive
