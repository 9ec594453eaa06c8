"""Config resolution + end-to-end job-runner tests (the reference's
spark-submit --class workflow, README.md:54-84, as one CLI)."""

from __future__ import annotations

import json
import os

from spark_ss_hudi_delta_poc_spark.config import resolve
from spark_ss_hudi_delta_poc_spark.runner import JOBS, job_batch_reader, job_stream_retail

from test_sources import RETAIL_HEADER, RETAIL_ROWS


def test_config_layering(monkeypatch):
    cfg = resolve("local")
    assert cfg["profile"] == "local" and cfg["source_format"] == "csv"
    monkeypatch.setenv("NORMV2_MAX_FILES_PER_TRIGGER", "7")
    monkeypatch.setenv("NORMV2_PARTITION_BY", "a,b")
    cfg = resolve("local", sink_format="delta")
    assert cfg["max_files_per_trigger"] == 7  # env var layer
    assert cfg["partition_by"] == ["a", "b"]
    assert cfg["sink_format"] == "delta"  # explicit override wins
    cfg2 = resolve("cloud")
    assert cfg2["profile"] == "cluster"


def test_runner_stream_retail_then_batch_reader(spark, tmp_path, capsys):
    """EP1 end-to-end through the runner: CSV stream → enrich → partitioned
    sink, then the EP3 validation battery over the written table."""
    src = os.path.join(tmp_path, "in")
    os.makedirs(src)
    for i, row in enumerate(RETAIL_ROWS):
        with open(os.path.join(src, f"f{i}.csv"), "w") as f:
            f.write(RETAIL_HEADER + "\n" + row + "\n")
    cfg = resolve(
        "local",
        source=src,
        sink=os.path.join(tmp_path, "out"),
        checkpoint=os.path.join(tmp_path, "ck"),
    )
    job_stream_retail(spark, cfg)
    back = spark.read.parquet(cfg["sink"])
    assert back.count() == 3
    assert "Date=2010-12-01" in "".join(d for d, _, _ in os.walk(cfg["sink"]))
    reader_cfg = dict(cfg, source=cfg["sink"], group_key="StockCode", dup_key="srno")
    out = job_batch_reader(spark, reader_cfg)
    assert out["count"] == 3 and out["duplicates"] == 0
    assert out["group_count"] == out["distinct_count"] == 3
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["count"] == 3


def test_all_jobs_registered():
    assert set(JOBS) == {
        "stream_retail",
        "stream_cloudtrail",
        "notification_ingest",
        "batch_reader",
        "query",
        "corpus_build",
    }


def test_spark_sql_entry_point(spark):
    """spark.sql over registered views must agree with the DataFrame API —
    the SQL surface of the engine (tables.register_temp_views)."""
    from pyspark.sql import functions as F

    from spark_ss_hudi_delta_poc_spark.tables import load, register_temp_views

    register_temp_views(spark, "/root/testdata/sf0.001")
    sql_out = spark.sql(
        """
        SELECT o_orderpriority,
               SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS revenue_e4
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        """
    ).collect()
    li = load(spark, "/root/testdata/sf0.001", "lineitem")
    orders = load(spark, "/root/testdata/sf0.001", "orders")
    df_out = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum(F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")).alias("revenue_e4"))
        .collect()
    )
    assert sorted(map(tuple, sql_out)) == sorted(map(tuple, df_out))


def test_runner_query_job(spark, capsys):
    from spark_ss_hudi_delta_poc_spark.runner import job_query

    job_query(spark, {"query_name": "q01_count", "sf_dir": "/root/testdata/sf0.001"})
    out = capsys.readouterr().out.strip()
    assert '"cnt"' in out


def test_reference_class_aliases():
    from spark_ss_hudi_delta_poc_spark.runner import REFERENCE_CLASS_ALIASES, resolve_job

    job, over = resolve_job("S3ToParquetStreamJob")
    assert job == "stream_retail" and over["sink_format"] == "parquet"
    job, over = resolve_job("S3CloudTrailDeltaWriterWithNonExplodeCT")
    assert job == "stream_cloudtrail" and over["variant"] == "raw_string"
    job, over = resolve_job("S3ToHudiOptStreamJob")
    assert over["hudi_mode"] == "bulk_insert"
    assert resolve_job("batch_reader") == ("batch_reader", {})
    assert len(REFERENCE_CLASS_ALIASES) == 16


def test_corpus_build_job(spark, tmp_path, capsys):
    """End-to-end corpus build over sf0.001: every pipeline stage reduces
    or preserves doc count; chunk output is partitioned by language."""
    import os as _os

    from spark_ss_hudi_delta_poc_spark.runner import job_corpus_build

    sink = _os.path.join(tmp_path, "corpus")
    out = job_corpus_build(spark, {"sf_dir": "/root/testdata/sf0.001", "sink": sink})
    assert out["input_docs"] == 500
    assert 0 < out["after_near_dedup"] <= out["after_exact_dedup"] <= out["after_quality"] <= 500
    assert out["chunks"] > out["after_near_dedup"]  # multiple chunks per doc
    assert any(d.startswith("lang=") for d in _os.listdir(sink) if not d.startswith("_"))
    back = spark.read.parquet(sink)
    assert {"doc_id", "chunk_idx", "chunk_text", "n_tokens", "lang"} <= set(back.columns)
