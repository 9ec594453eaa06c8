"""Streaming observability: a StreamingQueryListener that collects
per-batch metrics (rows, rates, watermark, state size, duration) into
memory and optionally a JSONL file — the production replacement for the
reference's console prints (S3ParquetStreamReader.scala:68-74).
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class ProgressCollector(StreamingQueryListener):
    """Attach with spark.streams.addListener(collector); read .progress
    (list of dicts, one per micro-batch across all queries)."""

    def __init__(self, jsonl_path: str | None = None):
        self.progress: list[dict] = []
        self._lock = threading.Lock()
        self._jsonl_path = jsonl_path

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        row = {
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_sec": p.inputRowsPerSecond,
            "processed_rows_per_sec": p.processedRowsPerSecond,
            "batch_duration_ms": p.batchDuration,
            "watermark": (p.eventTime or {}).get("watermark"),
            "state_rows": sum(s.numRowsTotal for s in (p.stateOperators or [])),
        }
        with self._lock:
            self.progress.append(row)
            if self._jsonl_path:
                with open(self._jsonl_path, "a") as f:
                    f.write(json.dumps(row) + "\n")

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def total_rows(self) -> int:
        with self._lock:
            return sum(r["num_input_rows"] for r in self.progress)
