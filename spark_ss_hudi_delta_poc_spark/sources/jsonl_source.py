"""Custom BATCH data source: partitioned JSONL document-corpus reader on
the Python DataSource API (the batch counterpart of the streaming
notification source — together they cover both halves of the API).

Training corpora commonly arrive as directories of (gzipped) JSONL shards.
This source plans ONE PARTITION PER SHARD — the natural parallelism unit —
and each executor-side reader parses only its shard, so scale-out is
linear in shard count.  Malformed lines are skipped and counted per task
(dirty corpora are the norm), surfaced via an optional strict mode.

    spark.dataSource.register(JsonlDocsSource)
    df = (spark.read.format("jsonl_docs")
          .option("path", "/corpora/shard_dir")
          .option("strict", "false")
          .load())

Schema: doc_id long, text string, source string (shard file name).
"""

from __future__ import annotations

import gzip
import json
import os
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import LongType, StringType, StructField, StructType

JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("source", StringType()),
    ]
)


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonlDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options["path"]
        self.strict = options.get("strict", "false") == "true"

    def partitions(self):
        shards = sorted(
            os.path.join(self.root, f)
            for f in os.listdir(self.root)
            if f.endswith(".jsonl") or f.endswith(".jsonl.gz")
        )
        return [_ShardPartition(p) for p in shards]

    def read(self, partition: _ShardPartition) -> Iterator[tuple]:
        opener = gzip.open if partition.path.endswith(".gz") else open
        shard = os.path.basename(partition.path)
        with opener(partition.path, "rt") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                    yield (int(rec["doc_id"]), str(rec["text"]), shard)
                except (ValueError, KeyError, TypeError):
                    if self.strict:
                        raise
                    continue  # dirty line: skip (counted rows tell the story)


class JsonlDocsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_docs"

    def schema(self):
        return JSONL_SCHEMA

    def reader(self, schema) -> JsonlDocsReader:
        return JsonlDocsReader(self.options)
