"""Custom batch JSONL DataSource tests (per-shard partitions, gz support,
dirty-line tolerance, strict mode)."""

from __future__ import annotations

import gzip
import json
import os

import pytest

from spark_ss_hudi_delta_poc_spark.sources.jsonl_source import JsonlDocsSource


def _write_shards(tmp_path) -> str:
    root = os.path.join(tmp_path, "shards")
    os.makedirs(root)
    with open(os.path.join(root, "a.jsonl"), "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "alpha"}) + "\n")
        f.write("NOT JSON\n")  # dirty line
        f.write(json.dumps({"doc_id": 2, "text": "beta"}) + "\n")
    with gzip.open(os.path.join(root, "b.jsonl.gz"), "wt") as f:
        f.write(json.dumps({"doc_id": 3, "text": "gamma"}) + "\n")
        f.write(json.dumps({"missing": "doc_id"}) + "\n")  # schema-bad line
    return root


def test_jsonl_source_reads_shards(spark, tmp_path):
    root = _write_shards(tmp_path)
    spark.dataSource.register(JsonlDocsSource)
    df = spark.read.format("jsonl_docs").option("path", root).load()
    rows = {r.doc_id: (r.text, r.source) for r in df.collect()}
    assert rows == {1: ("alpha", "a.jsonl"), 2: ("beta", "a.jsonl"), 3: ("gamma", "b.jsonl.gz")}
    # one partition per shard — the parallelism contract
    assert df.rdd.getNumPartitions() == 2


def test_jsonl_source_strict_mode_raises(spark, tmp_path):
    root = _write_shards(tmp_path)
    spark.dataSource.register(JsonlDocsSource)
    df = spark.read.format("jsonl_docs").option("path", root).option("strict", "true").load()
    with pytest.raises(Exception):
        df.collect()


def test_jsonl_source_composes_with_engine_ops(spark, tmp_path):
    """The custom source feeds ordinary engine operators unchanged."""
    from spark_ss_hudi_delta_poc_spark.operators.text_analysis import token_counts

    root = _write_shards(tmp_path)
    spark.dataSource.register(JsonlDocsSource)
    df = spark.read.format("jsonl_docs").option("path", root).load()
    toks = {r.doc_id: r.ws_tokens for r in token_counts(df).collect()}
    assert toks == {1: 1, 2: 1, 3: 1}
