"""Custom stateful streaming operators via applyInPandasWithState — the
arbitrary-stateful-processing surface the reference lacks entirely
(SURVEY.md §2.7: no flatMapGroupsWithState anywhere).

``sessionize_stream`` keeps one small state row per user (session start,
last ts, count) — constant state per key, Arrow-batched user groups, the
shape that scales to millions of keys.  Sessions are emitted when CLOSED:
by a gap-exceeding event in a later batch, or by state timeout after the
stream idles past the gap.

``ttl_dedup_stream`` is exact streaming dedup whose per-key state EXPIRES
after a processing-time TTL — the "remember seen hashes for N days" crawl
-ingest contract.  Plain ``dropDuplicates`` state grows forever and its
watermark variant needs event time; TTL bounds state by wall clock, which
is what an always-on corpus ingest actually wants.

``running_topk_stream`` maintains per-group running top-k item counts
(streaming heavy hitters).  Exact by default (state = one (item, count)
pair per distinct item per group); pass ``capacity`` to switch to the
SpaceSaving sketch [Metwally et al., ICDT 2005]: state is capped at
``capacity`` counters per group and any item's count error is bounded by
N/capacity — the 100 TB mode, where exact per-item state would be its own
shuffle-sized table.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
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


def _ttl_dedup_fn(ttl_ms: int):
    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL elapsed with no new sighting: forget the key.  A later
            # re-occurrence is treated as first-seen again (re-emitted) —
            # the bounded-memory trade-off this operator exists to make.
            state.remove()
            return
        for _ in pdfs:  # drain; only presence matters
            pass
        first_seen = not state.exists
        if first_seen:
            state.update((1,))
        # refresh the clock on every sighting (sliding TTL)
        state.setTimeoutDuration(ttl_ms)
        if first_seen:
            yield pd.DataFrame({"k": [key[0]]})

    return fn


def ttl_dedup_stream(
    stream: DataFrame, key_col: str = "event_id", ttl_minutes: float = 7 * 24 * 60
) -> DataFrame:
    """Streaming exact dedup with TTL-bounded state: emit each key the
    first time it is seen; remember it for ``ttl_minutes`` of processing
    time (refreshed on every sighting); forget it afterwards.

    State is one marker row per live key, partitioned by key hash — at
    cluster scale each executor holds only its shard of the seen-set and
    expired keys are physically dropped by the state store, so memory is
    bounded by the key arrival rate times the TTL, not by corpus size.

    Run this under a processingTime trigger on an always-on stream.  It
    CANNOT run under trigger(availableNow=True): ProcessingTimeTimeout
    makes FlatMapGroupsWithState report shouldRunAnotherBatch=true
    forever (pending wall-clock timers), so the run never drains.  For a
    finite replay with the equivalent event-time contract, use the
    built-in dropDuplicatesWithinWatermark (jobs.stream_ttl_dedup).
    """
    key_field = stream.schema[key_col]
    out_schema = StructType([StructField(key_col, key_field.dataType)])
    state_schema = StructType([StructField("seen", IntegerType())])

    def fn(key, pdfs, state):
        for out in _ttl_dedup_fn(int(ttl_minutes * 60 * 1000))(key, pdfs, state):
            yield out.rename(columns={"k": key_col})

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def spacesaving_merge(
    counters: dict[str, int], batch_counts: dict[str, int], capacity: int | None
) -> dict[str, int]:
    """Merge a batch's item counts into the running counter table.

    With ``capacity=None`` this is exact.  Otherwise the table never
    exceeds ``capacity`` entries: a new item arriving at a full table
    evicts the current minimum counter m and starts at m + its batch
    count (SpaceSaving's overestimate-by-at-most-m guarantee, so any
    item's true count is within N/capacity of its counter).
    """
    for item, c in batch_counts.items():
        c = int(c)
        if item in counters:
            counters[item] += c
        elif capacity is None or len(counters) < capacity:
            counters[item] = c
        else:
            victim = min(counters, key=lambda x: (counters[x], x))
            floor_count = counters.pop(victim)
            counters[item] = floor_count + c
    return counters


def _topk_fn(k: int, capacity: int | None):
    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            items, counts, seq = state.get
            counters = dict(zip(items, counts))
        else:
            counters, seq = {}, 0
        n_new = 0
        for pdf in pdfs:
            vc = pdf["item"].value_counts()
            n_new += int(vc.sum())
            counters = spacesaving_merge(
                counters, {str(i): int(c) for i, c in vc.items()}, capacity
            )
        seq += n_new
        state.update((list(counters.keys()), [int(v) for v in counters.values()], seq))
        top = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        yield pd.DataFrame(
            {
                "grp": [key[0]] * len(top),
                "salt": [key[1]] * len(top),
                "item": [t[0] for t in top],
                "cnt": [t[1] for t in top],
                "seq": [seq] * len(top),
            }
        )

    return fn


def running_topk_stream(
    stream: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 10,
    capacity: int | None = None,
    salt_buckets: int = 8,
) -> DataFrame:
    """Streaming heavy hitters: per ``group_col``, the running top-``k``
    most frequent ``item_col`` values, re-emitted after every micro-batch
    that touches the group.

    The state key is (group, item-hash % salt_buckets), NOT the bare
    group: business groups are often few (q67 has 5 event types), which
    would cap the stateful stage's parallelism at the group count no
    matter how many executors exist.  Salting by item hash keeps each
    item's counts in exactly ONE state row, so per-bucket counts are
    exact, and any globally-top-k item is top-k within its bucket —
    ``finalize_topk`` merges buckets and re-ranks without approximation.

    Each emission carries ``seq`` = items processed so far for that
    (group, bucket); the LAST emission per bucket (max seq) is current.
    Exact when ``capacity`` is None; SpaceSaving-approximate per bucket
    (error ≤ N_bucket/capacity) when capped.
    """
    prepared = stream.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(item_col).cast("string").alias("item"),
    ).withColumn("salt", F.pmod(F.xxhash64("item"), F.lit(salt_buckets)).cast("int"))
    out_schema = StructType(
        [
            StructField("grp", StringType()),
            StructField("salt", IntegerType()),
            StructField("item", StringType()),
            StructField("cnt", LongType()),
            StructField("seq", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("items", ArrayType(StringType())),
            StructField("counts", ArrayType(LongType())),
            StructField("seq", LongType()),
        ]
    )
    return prepared.groupBy("grp", "salt").applyInPandasWithState(
        _topk_fn(k, capacity),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def finalize_topk(emissions: DataFrame, group_col: str, k: int = 10) -> DataFrame:
    """Reduce a run's accumulated emissions to the current top-k per
    group: latest emission per (group, salt bucket), buckets unioned,
    re-ranked by (count desc, item asc)."""
    from pyspark.sql import Window

    w = Window.partitionBy("grp", "salt")
    latest = (
        emissions.withColumn("_max_seq", F.max("seq").over(w))
        .where(F.col("seq") == F.col("_max_seq"))
    )
    rank_w = Window.partitionBy("grp").orderBy(F.col("cnt").desc(), F.col("item").asc())
    return (
        latest.withColumn("_rn", F.row_number().over(rank_w))
        .where(F.col("_rn") <= k)
        .select(F.col("grp").alias(group_col), "item", "cnt")
    )


# --- transformWithState (Spark 4 native stateful API) -------------------------
#
# user_profile_stream demonstrates the modern replacement for
# applyInPandasWithState: a StatefulProcessor with a typed, named
# ValueState slot managed by the state-store handle (the API that adds
# per-state TTL, timers, and multiple independent state variables per
# key — none of which GroupState offers).  Semantics here: a running
# per-user ingest profile (first/last event micros, event count,
# exact-integer value sum) re-emitted per touched user per micro-batch
# with a monotone per-key seq, so the LAST emission per user equals the
# whole-corpus GROUP BY regardless of how files were batched — the same
# replay-stable contract as running_topk_stream.
PROFILE_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("value_e4", LongType()),
        StructField("seq", LongType()),
    ]
)
PROFILE_STATE_SCHEMA = StructType(
    [
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("value_e4", LongType()),
        StructField("seq", LongType()),
    ]
)


def _profile_processor():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserProfileProcessor(StatefulProcessor):
        """State per user: (first_us, last_us, n_events, value_e4, seq).
        All fields are order-independent reductions (min/max/sum over
        exact integers), so the final state — and therefore the final
        emission — is identical under ANY partitioning of events into
        micro-batches."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("profile", PROFILE_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            first_us = last_us = None
            n = val = 0
            for pdf in rows:
                us = pdf["ts_us"]
                f, l = int(us.min()), int(us.max())
                first_us = f if first_us is None else min(first_us, f)
                last_us = l if last_us is None else max(last_us, l)
                n += int(len(pdf))
                val += int(pdf["value_e4"].sum())
            prev = self._state.get() if self._state.exists() else None
            if prev is not None:
                first_us = min(first_us, int(prev[0]))
                last_us = max(last_us, int(prev[1]))
                n += int(prev[2])
                val += int(prev[3])
                seq = int(prev[4]) + 1
            else:
                seq = 1
            self._state.update((first_us, last_us, n, val, seq))
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])],
                    "first_us": [first_us],
                    "last_us": [last_us],
                    "n_events": [n],
                    "value_e4": [val],
                    "seq": [seq],
                }
            )

        def close(self) -> None:
            pass

    return UserProfileProcessor()


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Running per-user ingest profile via ``transformWithStateInPandas``
    — Spark 4's native arbitrary-stateful operator (StatefulProcessor +
    named ValueState), the successor API to applyInPandasWithState.

    Plan shape: one exchange on user_id into the Arrow-batched
    TransformWithStateInPandas stage; state is ONE fixed-width row per
    user (5 longs — state size = |users| x 40 bytes at any corpus
    size), emissions are one row per TOUCHED user per micro-batch
    (append mode, file-sink safe)."""
    prepared = events.select(
        F.col("user_id"),
        (F.unix_micros(F.col("ts"))).alias("ts_us"),
        F.floor(F.col("value") * 10000).cast("long").alias("value_e4"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_profile_processor(),
        outputStructType=PROFILE_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def finalize_profiles(emissions: DataFrame) -> DataFrame:
    """Latest emission per user == the whole-run profile (monotone seq)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    return (
        emissions.withColumn("_max_seq", F.max("seq").over(w))
        .where(F.col("seq") == F.col("_max_seq"))
        .select("user_id", "first_us", "last_us", "n_events", "value_e4")
    )
