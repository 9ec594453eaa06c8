"""Unit tests: cross-engine hashing, shingles, vector math."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from spark_ss_hudi_delta_poc_spark.functions.hashing import md5_long
from spark_ss_hudi_delta_poc_spark.functions.text import shingles
from spark_ss_hudi_delta_poc_spark.functions.vector import cosine_q, dot_q, quantize


def ref_md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_md5_long_matches_hashlib(spark):
    vals = ["", "a", "hello world", "naïve ünicode"]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = {r.s: r.h for r in df.select("s", md5_long(F.col("s")).alias("h")).collect()}
    for v in vals:
        assert got[v] == ref_md5_long(v), v


def test_md5_long_matches_duckdb(spark, duck):
    vals = ["abc", "0:the fast key", "xyz 123"]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = {r.s: r.h for r in df.select("s", md5_long(F.col("s")).alias("h")).collect()}
    for v in vals:
        d = duck.sql(f"SELECT ('0x' || substr(md5('{v}'), 1, 15))::BIGINT AS h").fetchone()[0]
        assert got[v] == d, v


def test_shingles_basic(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("x x x x",)], ["text"])
    rows = df.select(shingles("text").alias("sh")).collect()
    assert rows[0].sh == ["a b c", "b c d"]
    assert rows[1].sh == []  # shorter than n → empty, never a descending range
    assert rows[2].sh == ["x x x"]  # distinct


def test_quantized_cosine_identity(spark):
    df = spark.createDataFrame([([0.5, 0.5, 0.0], [0.5, 0.5, 0.0])], ["a", "b"])
    q = df.select(
        dot_q(quantize("a"), quantize("b")).alias("dot"),
        cosine_q(quantize("a"), quantize("b")).alias("cos"),
    ).collect()[0]
    assert q.dot == 500 * 500 * 2
    assert q.cos == 1.0
