"""Custom stateful streaming operators via applyInPandasWithState — the
arbitrary-stateful-processing surface the reference lacks entirely
(SURVEY.md §2.7: no flatMapGroupsWithState anywhere).

``sessionize_stream`` keeps one small state row per user (session start,
last ts, count) — constant state per key, Arrow-batched user groups, the
shape that scales to millions of keys.  Sessions are emitted when CLOSED:
by a gap-exceeding event in a later batch, or by state timeout after the
stream idles past the gap.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
    ]
)
# state: (session_start_us, last_ts_us, n_events)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", IntegerType()),
    ]
)


def _session_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            if state.exists:
                s, l, n = state.get
                closed.append((s, l, n))
                state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
            ts_us.sort()
            if state.exists:
                s, l, n = state.get
            else:
                s, l, n = None, None, 0
            for t in ts_us:
                if s is None:
                    s, l, n = t, t, 1
                elif t - l > gap_us:
                    closed.append((s, l, n))
                    s, l, n = t, t, 1
                else:
                    l, n = t, n + 1
            if s is not None:
                state.update((s, l, n))
                state.setTimeoutTimestamp(l // 1000 + gap_minutes * 60 * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(l, unit="us") for _, l, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """events (streaming, with event-time column ts) → closed sessions.

    Requires a watermark on ts (drives EventTimeTimeout).  One state row
    per user; emitted rows are final (append semantics).
    """
    return (
        events.withWatermark("ts", f"{gap_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
