"""Tests for the TTL-dedup and running-top-k stateful streaming operators
(streaming/stateful.py) — the custom arbitrary-stateful surface beyond the
reference (SURVEY.md §2.7 has no flatMapGroupsWithState at all).

The TTL test runs the processing-time-TTL operator the only way it can
run — an always-on processingTime trigger, stopped manually — because
ProcessingTimeTimeout keeps shouldRunAnotherBatch true forever, which
makes trigger(availableNow=True) never terminate (found the hard way;
the registry's q66 uses dropDuplicatesWithinWatermark for that reason).
"""

from __future__ import annotations

import time
import uuid

import pytest

from spark_ss_hudi_delta_poc_spark.streaming.stateful import (
    finalize_topk,
    running_topk_stream,
    spacesaving_merge,
    ttl_dedup_stream,
)


def test_spacesaving_merge_exact_when_uncapped():
    c = {}
    c = spacesaving_merge(c, {"a": 3, "b": 1}, None)
    c = spacesaving_merge(c, {"a": 2, "c": 5}, None)
    assert c == {"a": 5, "b": 1, "c": 5}


def test_spacesaving_merge_capacity_and_error_bound():
    """Counter table never exceeds capacity; the heavy hitter survives a
    long tail of singletons and its counter error is ≤ N/capacity."""
    capacity = 16
    true_hot = 1000
    n_tail = 200
    c = {}
    c = spacesaving_merge(c, {"hot": true_hot}, capacity)
    for i in range(n_tail):
        c = spacesaving_merge(c, {f"tail{i}": 1}, capacity)
    n_total = true_hot + n_tail
    assert len(c) <= capacity
    assert "hot" in c
    # SpaceSaving: counts only overestimate, by at most min-counter ≤ N/m
    assert true_hot <= c["hot"] <= true_hot + n_total // capacity


def test_spacesaving_eviction_inherits_min_count():
    c = {"a": 5, "b": 2}
    c = spacesaving_merge(c, {"z": 1}, 2)
    # z evicts min counter b (2) and starts at 2 + 1
    assert c == {"a": 5, "z": 3}


def _drain_to(spark, table: str, want_rows: int, deadline_s: float = 60.0) -> int:
    t0 = time.time()
    n = -1
    while time.time() - t0 < deadline_s:
        n = spark.table(table).count()
        if n >= want_rows:
            return n
        time.sleep(0.25)
    return n


def test_ttl_dedup_stream_suppresses_then_reemits_after_expiry(spark, tmp_path):
    """Within the TTL a repeated key is emitted once; after the TTL
    elapses (timer fired by a later batch) the key is forgotten and a
    re-occurrence is emitted again."""
    src = str(tmp_path / "src")

    def feed(*keys: int) -> None:
        spark.createDataFrame([(k,) for k in keys], "k long").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    feed(1, 2)  # batch: emit 1, 2
    stream = spark.readStream.schema("k long").parquet(src)
    # 8s TTL: wide enough that the feed→batch→poll latency (~1-2s per
    # step) cannot expire a key mid-suppression-phase, short enough that
    # the expiry phase stays quick.  Empty batches run every trigger
    # interval under ProcessingTimeTimeout, so timers fire promptly.
    deduped = ttl_dedup_stream(stream, key_col="k", ttl_minutes=8 / 60)
    table = f"ttl_mem_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        assert _drain_to(spark, table, 2) == 2
        feed(1, 3)  # duplicate 1 suppressed (TTL refreshed), 3 emitted
        assert _drain_to(spark, table, 3) == 3
        time.sleep(10)  # let every key's 8s TTL lapse
        feed(4)  # this batch fires the expired timers → 1/2/3 forgotten
        assert _drain_to(spark, table, 4) == 4
        feed(1)  # forgotten key re-emitted
        assert _drain_to(spark, table, 5) == 5
    finally:
        q.stop()
        q.awaitTermination(30)
    got = sorted(r.k for r in spark.table(table).collect())
    assert got == [1, 1, 2, 3, 4]


def test_running_topk_stream_exact_equals_batch(spark, tmp_path):
    """Two micro-batches whose per-group counts only become correct when
    state merges across them; the finalized view equals the batch top-k
    with the (count desc, item asc) tie-break."""
    src = str(tmp_path / "src")
    rows_b1 = [("g1", "x")] * 3 + [("g1", "y")] * 2 + [("g2", "p")] * 1
    rows_b2 = [("g1", "y")] * 4 + [("g1", "z")] * 1 + [("g2", "q")] * 1
    spark.createDataFrame(rows_b1, "grp string, item string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(rows_b2, "grp string, item string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema("grp string, item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    emissions = running_topk_stream(stream, group_col="grp", item_col="item", k=2)
    table = f"topk_mem_{uuid.uuid4().hex[:8]}"
    q = (
        emissions.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = finalize_topk(spark.table(table), group_col="grp", k=2)
    got = sorted((r.grp, r.item, r.cnt) for r in final.collect())
    # g1 totals: y=6, x=3, z=1 → top-2 y,x ; g2 totals: p=1, q=1 → tie → item asc
    assert got == [("g1", "x", 3), ("g1", "y", 6), ("g2", "p", 1), ("g2", "q", 1)]


def test_running_topk_spacesaving_mode_keeps_heavy_hitter(spark, tmp_path):
    """Capacity-capped mode: with skewed input the true heavy hitter is
    still ranked first and its counter respects the N/capacity bound."""
    src = str(tmp_path / "src")
    rows = [("g", "hot")] * 300 + [("g", f"t{i}") for i in range(100)]
    spark.createDataFrame(rows, "grp string, item string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema("grp string, item string").parquet(src)
    emissions = running_topk_stream(stream, group_col="grp", item_col="item", k=1, capacity=16)
    table = f"topk_ss_mem_{uuid.uuid4().hex[:8]}"
    q = (
        emissions.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = finalize_topk(spark.table(table), group_col="grp", k=1).collect()
    assert len(final) == 1
    row = final[0]
    assert row.item == "hot"
    assert 300 <= row.cnt <= 300 + 400 // 16


@pytest.mark.parametrize("module", ["google.protobuf"])
def test_transform_with_state_env_gate(module):
    """transformWithStateInPandas (Spark 4's arbitrary-stateful API) needs
    the protobuf runtime for its state-server protocol; this sandbox has
    no protobuf and no pip route, so the API is environment-blocked the
    same way the lakehouse jars are (VERDICT r2).  This test documents the
    gate: it only runs where the dependency exists."""
    pytest.importorskip(module)


def test_user_profile_processor_fold_logic_without_spark():
    """The transformWithState StatefulProcessor's per-key fold is pure
    Python over Arrow batches — testable against a fake handle without
    the (env-blocked) state-server protocol: state merges across calls
    exactly like min/max/sum, and seq is monotone per key."""
    import pandas as pd

    from spark_ss_hudi_delta_poc_spark.streaming.stateful import _profile_processor

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def clear(self):
            self._v = None

    class FakeHandle:
        def __init__(self):
            self.state = FakeValueState()

        def getValueState(self, name, schema, ttlDurationMs=None):
            return self.state

    proc = _profile_processor()
    handle = FakeHandle()
    proc.init(handle)
    b1 = pd.DataFrame({"ts_us": [100, 50], "value_e4": [10, 20]})
    b2 = pd.DataFrame({"ts_us": [200], "value_e4": [5]})
    out1 = list(proc.handleInputRows((7,), iter([b1]), None))[0]
    assert out1.iloc[0].to_dict() == {
        "user_id": 7, "first_us": 50, "last_us": 100,
        "n_events": 2, "value_e4": 30, "seq": 1,
    }
    out2 = list(proc.handleInputRows((7,), iter([b2]), None))[0]
    assert out2.iloc[0].to_dict() == {
        "user_id": 7, "first_us": 50, "last_us": 200,
        "n_events": 3, "value_e4": 35, "seq": 2,
    }
    proc.close()


def test_stream_user_profile_end_to_end_when_protobuf_present(spark):
    """Full transformWithStateInPandas run — activates the moment the
    protobuf dependency exists (same env-gate ruling as the lakehouse
    jars); until then the fold logic above and the finalize window are
    the tested surface."""
    pytest.importorskip("google.protobuf")
    from pyspark.sql import functions as F

    from spark_ss_hudi_delta_poc_spark.streaming.jobs import stream_user_profile

    got = stream_user_profile(spark, "/root/testdata/sf0.001").toPandas()
    from spark_ss_hudi_delta_poc_spark.tables import load

    exp = (
        load(spark, "/root/testdata/sf0.001", "events")
        .groupBy("user_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("first_us"),
            F.max(F.unix_micros("ts")).alias("last_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 10000).cast("long")).alias("value_e4"),
        )
        .toPandas()
    )
    key = lambda df: df.sort_values("user_id").reset_index(drop=True)  # noqa: E731
    pd_got, pd_exp = key(got), key(exp)
    assert pd_got.equals(pd_exp[pd_got.columns])
