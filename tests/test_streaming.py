"""Streaming tests: stream-vs-batch equivalence, watermark late-row
dropping, restart-from-checkpoint exactly-once (the automated version of the
reference's manual kill/restart methodology — README.md:106-122)."""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F

from spark_ss_hudi_delta_poc_spark.schemas import EVENTS_SCHEMA
from spark_ss_hudi_delta_poc_spark.sources.sinks import write_stream
from spark_ss_hudi_delta_poc_spark.sources.stream import read_file_stream, stage_as_files
from spark_ss_hudi_delta_poc_spark.streaming.jobs import stream_global_count
from spark_ss_hudi_delta_poc_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_stream_global_count_equals_batch(spark):
    got = stream_global_count(spark, SF).collect()[0].cnt
    want = load(spark, SF, "events").count()
    assert got == want


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode windowed agg with watermark: a row far behind the
    watermark is dropped — the semantics the reference approximates with
    SQS maxFileAge purging (SqsSourceOptions.scala:33-44)."""
    on_time = [(i, datetime(2024, 1, 1, 10, i), 1, "a", 1.0, "{}") for i in range(10)]
    late = [(99, datetime(2024, 1, 1, 1, 0), 1, "a", 1.0, "{}")]  # 9h late
    d1 = os.path.join(tmp_path, "f1")
    d2 = os.path.join(tmp_path, "f2")
    src = os.path.join(tmp_path, "src")
    os.makedirs(src)
    spark.createDataFrame(on_time, EVENTS_SCHEMA).coalesce(1).write.parquet(d1)
    spark.createDataFrame(late, EVENTS_SCHEMA).coalesce(1).write.parquet(d2)
    # stage files so the late file arrives in a LATER micro-batch
    f1 = os.path.join(src, "a_batch1.parquet")
    f2 = os.path.join(src, "b_batch2.parquet")
    os.rename(next(os.path.join(d1, f) for f in os.listdir(d1) if f.endswith(".parquet")), f1)
    os.rename(next(os.path.join(d2, f) for f in os.listdir(d2) if f.endswith(".parquet")), f2)
    # the file source orders by modification time — pin it so the on-time
    # file is strictly first and the late file arrives in a later batch
    import time as _time

    now = _time.time()
    os.utime(f1, (now - 120, now - 120))
    os.utime(f2, (now, now))
    stream = read_file_stream(spark, src, "parquet", EVENTS_SCHEMA, max_files_per_trigger=1)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("wm_test").collect()
    # Append-mode watermark mechanics (pinned to observed Spark 4.1
    # behavior): the late row's window is already past the watermark, so it
    # closes and emits immediately; the on-time 10:00 window stays OPEN
    # (watermark never passes its end) and is withheld from append output.
    hours = {r.window.start.hour for r in rows}
    assert 10 not in hours  # open window withheld
    assert rows and all(r.cnt == 1 for r in rows if r.window.start.hour == 1)
    # watermark advanced past batch 1
    assert any(
        p["eventTime"].get("watermark", "").startswith("2024-01-01T09:59")
        for p in q.recentProgress
        if p.get("eventTime")
    )


def test_restart_from_checkpoint_exactly_once(spark, tmp_path):
    """Run a file-stream → parquet sink to completion, then restart with the
    same checkpoint: no duplicate rows may appear (Parquet/Delta semantics
    the reference validates by hand — README.md:122,137)."""
    staged = stage_as_files(load(spark, SF, "events"), str(tmp_path), n_files=4)
    sink = os.path.join(tmp_path, "sink")
    ckpt = os.path.join(tmp_path, "ckpt")
    for _ in range(2):  # second run = restart; must be a no-op
        stream = read_file_stream(spark, staged, "parquet", EVENTS_SCHEMA, max_files_per_trigger=2)
        q = write_stream(stream, "parquet", path=sink, checkpoint=ckpt, trigger_available_now=True)
        q.awaitTermination()
    got = spark.read.parquet(sink).count()
    want = load(spark, SF, "events").count()
    assert got == want


def test_console_sink_runs(spark):
    """K6 console sink smoke (S3ParquetStreamReader.scala:68-74)."""
    from spark_ss_hudi_delta_poc_spark.sources.sinks import write_console_stream

    df = load(spark, SF, "events")
    stream = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    q = write_console_stream(stream.groupBy().count(), output_mode="update")
    q.stop()
    assert df is not None


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState sessionization: a session is emitted when a
    later batch's event exceeds the gap (custom stateful operator — the
    arbitrary-state surface the reference lacks)."""
    import time as _time

    from spark_ss_hudi_delta_poc_spark.streaming.stateful import sessionize_stream

    b1 = [
        (1, datetime(2024, 1, 1, 10, 0), 1, "a", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 10, 5), 1, "a", 1.0, "{}"),
        (3, datetime(2024, 1, 1, 10, 0), 2, "a", 1.0, "{}"),
    ]
    b2 = [(4, datetime(2024, 1, 1, 12, 0), 1, "a", 1.0, "{}")]  # >30min gap → closes user1 session
    src = os.path.join(tmp_path, "sess_src")
    os.makedirs(src)
    for i, batch in enumerate([b1, b2]):
        d = os.path.join(tmp_path, f"sess_b{i}")
        spark.createDataFrame(batch, EVENTS_SCHEMA).coalesce(1).write.parquet(d)
        f = next(os.path.join(d, x) for x in os.listdir(d) if x.endswith(".parquet"))
        dst = os.path.join(src, f"{chr(97 + i)}_batch.parquet")
        os.rename(f, dst)
        t = _time.time() - 120 + i * 60
        os.utime(dst, (t, t))
    stream = read_file_stream(spark, src, "parquet", EVENTS_SCHEMA, max_files_per_trigger=1)
    out = sessionize_stream(stream, gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("sess_mem").collect()
    closed = {(r.user_id, r.session_start, r.session_end, r.n_events) for r in rows}
    assert (1, datetime(2024, 1, 1, 10, 0), datetime(2024, 1, 1, 10, 5), 2) in closed


def test_kill_mid_stream_then_restart_exactly_once(spark, tmp_path):
    """The reference's fault methodology (README.md:106-122): interrupt the
    query after PARTIAL progress, restart from the same checkpoint, verify
    the sink holds exactly the source rows — no loss, no duplication."""
    staged = stage_as_files(load(spark, SF, "events"), str(tmp_path), n_files=6)
    sink = os.path.join(tmp_path, "sink")
    ckpt = os.path.join(tmp_path, "ckpt")
    stream = read_file_stream(spark, staged, "parquet", EVENTS_SCHEMA, max_files_per_trigger=1)
    q = write_stream(stream, "parquet", path=sink, checkpoint=ckpt, processing_time="0 seconds")
    import time as _time

    deadline = _time.time() + 60
    while _time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in q.recentProgress):
            break
        _time.sleep(0.2)
    q.stop()  # kill mid-stream: some batches committed, some not
    partial = spark.read.parquet(sink).count()
    want = load(spark, SF, "events").count()
    assert 0 < partial  # progress happened before the kill
    stream2 = read_file_stream(spark, staged, "parquet", EVENTS_SCHEMA, max_files_per_trigger=1)
    q2 = write_stream(stream2, "parquet", path=sink, checkpoint=ckpt, trigger_available_now=True)
    q2.awaitTermination()
    got = spark.read.parquet(sink)
    assert got.count() == want
    assert got.select("event_id").distinct().count() == want  # no dups


def test_sink_schema_evolution_merge(spark, tmp_path):
    """Sink-side schema evolution: a later writer adds a column; readers
    with mergeSchema see the union schema, old rows null-filled."""
    sink = os.path.join(tmp_path, "tbl")
    spark.range(5).selectExpr("id", "id * 2 AS v").write.parquet(sink)
    spark.range(5, 8).selectExpr("id", "id * 2 AS v", "'new' AS tag").write.mode("append").parquet(sink)
    merged = spark.read.option("mergeSchema", "true").parquet(sink)
    assert set(merged.columns) == {"id", "v", "tag"}
    assert merged.count() == 8
    assert merged.where(F.col("tag").isNull()).count() == 5


def test_progress_collector_listener(spark, tmp_path):
    """StreamingQueryListener metrics: per-batch rows and durations are
    collected for a 4-batch availableNow run."""
    import json as _json

    from spark_ss_hudi_delta_poc_spark.streaming.monitor import ProgressCollector

    jsonl = os.path.join(tmp_path, "progress.jsonl")
    collector = ProgressCollector(jsonl_path=jsonl)
    spark.streams.addListener(collector)
    try:
        staged = stage_as_files(load(spark, SF, "events"), str(tmp_path), n_files=4)
        stream = read_file_stream(spark, staged, "parquet", EVENTS_SCHEMA, max_files_per_trigger=1)
        q = write_stream(
            stream, "parquet",
            path=os.path.join(tmp_path, "sink"),
            checkpoint=os.path.join(tmp_path, "ck"),
            trigger_available_now=True,
        )
        q.awaitTermination()
        import time as _time

        deadline = _time.time() + 20  # listener delivery is async
        want = load(spark, SF, "events").count()
        while _time.time() < deadline and collector.total_rows() < want:
            _time.sleep(0.2)
        assert collector.total_rows() == want
        batches = [r for r in collector.progress if r["num_input_rows"] > 0]
        assert len(batches) == 4  # maxFilesPerTrigger=1 over 4 files
        with open(jsonl) as f:
            lines = [_json.loads(line) for line in f]
        assert sum(r["num_input_rows"] for r in lines) == want
    finally:
        spark.streams.removeListener(collector)


def test_progress_collector_empty():
    from spark_ss_hudi_delta_poc_spark.streaming.monitor import ProgressCollector

    assert ProgressCollector().total_rows() == 0


def test_read_back_restores_partition_types(spark, tmp_path):
    """Partition-column round-trip types (q90's bug class): Spark stores
    partition values as directory NAMES and re-infers types on read — the
    inference covers ints and dates but not booleans, so a boolean
    partition column silently reads back as string.  read_back must
    restore every drifted column to the written schema."""
    from datetime import date

    from spark_ss_hudi_delta_poc_spark.sources.sinks import read_back

    df = spark.createDataFrame(
        [(1, True, date(2024, 1, 1), "x"), (2, False, date(2024, 1, 2), "y")],
        "id int, keep boolean, d date, payload string",
    )
    sink = os.path.join(tmp_path, "sink")
    df.write.partitionBy("keep", "d", "id").parquet(sink)
    # document the inference hole this helper exists for: a plain read
    # returns the boolean partition column as string
    naive = {f.name: f.dataType.simpleString() for f in spark.read.parquet(sink).schema}
    assert naive["keep"] == "string"
    restored = read_back(spark, sink, df.schema)
    assert {f.name: f.dataType for f in restored.schema} == {
        f.name: f.dataType for f in df.schema
    }
    got = {(r.id, r.keep, r.d, r.payload) for r in restored.collect()}
    assert got == {(1, True, date(2024, 1, 1), "x"), (2, False, date(2024, 1, 2), "y")}


def test_stream_curation_roundtrip_dtypes_match_batch(spark):
    """q90 regression (CORRECTNESS_r06's one red row): the streamed
    keep-partitioned sink round-trip must return the SAME schema as the
    equivalent batch aggregate — in particular `keep` stays boolean
    through the partition-directory round trip."""
    from spark_ss_hudi_delta_poc_spark.operators.curation import gopher_rules
    from spark_ss_hudi_delta_poc_spark.streaming.jobs import stream_curation_roundtrip

    batch = (
        gopher_rules(load(spark, SF, "documents"))
        .groupBy("keep")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("tot_words"),
            F.sum("n_stop_types").alias("tot_stop_types"),
        )
    )
    streamed = stream_curation_roundtrip(spark, SF)
    assert {f.name: f.dataType for f in streamed.schema} == {
        f.name: f.dataType for f in batch.schema
    }
    skey = {tuple(sorted(r.asDict().items())) for r in streamed.collect()}
    bkey = {tuple(sorted(r.asDict().items())) for r in batch.collect()}
    assert skey == bkey


def test_stream_hll_equals_batch_sketch(spark):
    """The streaming HLL must reproduce the batch sketch EXACTLY — same
    registers, same scaled sum, same estimate — because register
    max-merge is associative/commutative/idempotent, so micro-batch
    boundaries cannot be observable in the final state."""
    from spark_ss_hudi_delta_poc_spark.operators.sketches import hll_distinct
    from spark_ss_hudi_delta_poc_spark.streaming.jobs import stream_hll_distinct
    from spark_ss_hudi_delta_poc_spark.tables import load

    sf = "/root/testdata/sf0.001"
    streamed = stream_hll_distinct(spark, sf).collect()
    batch = hll_distinct(load(spark, sf, "events").select("user_id"), "user_id").collect()
    assert streamed == batch


def test_stream_late_data_drops_all_late_rows(spark):
    """q98 contract: the old half arrives a run late and must be fully
    dropped — no emitted window may start before the split boundary, and
    open windows near the stream head must be withheld (end > final
    watermark)."""
    from pyspark.sql import functions as F

    from spark_ss_hudi_delta_poc_spark.streaming.jobs import stream_late_data
    from spark_ss_hudi_delta_poc_spark.tables import load

    sf = "/root/testdata/sf0.001"
    out = stream_late_data(spark, sf).collect()
    assert out
    ev = load(spark, sf, "events")
    ep = F.unix_timestamp(F.col("ts"))
    b = ev.agg(F.min(ep).alias("mn"), F.max(ep).alias("mx")).collect()[0]
    boundary = (b.mn + b.mx) / 2.0
    import datetime as _dt

    for r in out:
        assert r.window_start.timestamp() * 2 > b.mn + b.mx  # no old-half window
        # emitted only when the final watermark passed the window end
        assert r.window_start.timestamp() + 7200 <= b.mx
    # and the head-of-stream windows were withheld: the max emitted start
    # is at least one full window before the max event time
    assert max(r.window_start.timestamp() for r in out) + 3600 <= b.mx - 3600 + 3600


def test_stream_scd2_equals_batch_and_is_incremental(spark):
    """q100 contract: the streamed history equals the one-shot batch
    scd2_history row-for-row; versions stay 1..n per user after the
    touched-user swaps (no duplicate or phantom versions from the
    anti-join/union merge)."""
    from spark_ss_hudi_delta_poc_spark.operators.maintenance import scd2_history
    from spark_ss_hudi_delta_poc_spark.streaming.jobs import stream_scd2_history
    from spark_ss_hudi_delta_poc_spark.tables import load

    sf = "/root/testdata/sf0.001"
    stats: list = []
    got = {tuple(r) for r in stream_scd2_history(spark, sf, stats=stats).collect()}
    want = {tuple(r) for r in scd2_history(load(spark, sf, "events")).collect()}
    assert got == want
    per_user: dict = {}
    for r in got:
        per_user.setdefault(r[0], []).append(r[1])
    for u, versions in per_user.items():
        assert sorted(versions) == list(range(1, len(versions) + 1))
    # the write footprint is per-bucket: every batch rewrote only the
    # buckets its users hash into (batch 1 finds no existing buckets)
    assert stats and stats[0]["existing_buckets"] == []
    from spark_ss_hudi_delta_poc_spark.streaming.jobs import SCD2_N_BUCKETS

    for s in stats:
        assert set(s["existing_buckets"]) <= set(s["touched_buckets"])
        assert len(s["touched_buckets"]) <= SCD2_N_BUCKETS


def test_scd2_apply_batch_rewrites_only_touched_buckets(spark, tmp_path):
    """The q100 write-amplification contract, asserted directly: a
    follow-up batch touching ONE user must rewrite exactly that user's
    bucket — every other bucket dir's files are bit-identical untouched
    (same paths, same mtimes), so per-batch bytes written scale with the
    batch's user footprint, not with |history|."""
    import os

    from spark_ss_hudi_delta_poc_spark.streaming.jobs import (
        SCD2_N_BUCKETS,
        read_scd2_history,
        scd2_apply_batch,
    )

    log_dir, hist_dir = str(tmp_path / "log"), str(tmp_path / "hist")
    base = spark.createDataFrame(
        [(i, f"2024-01-01 00:{i % 60:02d}:00", i % 40, "click") for i in range(200)],
        "event_id long, tss string, user_id long, event_type string",
    ).selectExpr("event_id", "to_timestamp(tss) AS ts", "user_id", "event_type")
    scd2_apply_batch(spark, base, log_dir, hist_dir, epoch_id=0)

    def snapshot(root):
        out = {}
        for dp, _, fns in os.walk(root):
            for fn in fns:
                if fn.startswith("_"):  # manifest pointer rewrites per swap
                    continue
                p = os.path.join(dp, fn)
                out[p] = os.stat(p).st_mtime_ns
        return out

    before = snapshot(hist_dir)
    one_user = spark.createDataFrame(
        [(10_000, "2024-01-02 00:00:00", 7, "purchase")],
        "event_id long, tss string, user_id long, event_type string",
    ).selectExpr("event_id", "to_timestamp(tss) AS ts", "user_id", "event_type")
    stats: list = []
    scd2_apply_batch(spark, one_user, log_dir, hist_dir, stats=stats, epoch_id=1)
    assert stats[0]["touched_buckets"] == [7 % SCD2_N_BUCKETS]
    after = snapshot(hist_dir)
    touched_prefix = os.path.join(hist_dir, f"bkt={7 % SCD2_N_BUCKETS}") + os.sep
    for p, mt in before.items():
        if not p.startswith(touched_prefix):
            assert after.get(p) == mt, f"untouched bucket file rewritten: {p}"
    # and the merge is still correct: user 7 gained a purchase version
    hist = read_scd2_history(spark, hist_dir)
    u7 = sorted(
        (r.version, r.event_type, r.is_current) for r in hist.where("user_id = 7").collect()
    )
    assert u7[-1][1] == "purchase" and u7[-1][2] is True


def test_complete_mode_and_memory_sinks_are_pinned_bounded():
    """VERDICT r8 #2's gate: complete output mode never evicts state and
    a memory sink materializes its table on the driver — both are safe
    ONLY when the aggregation key domain is bounded by construction.
    Pin exactly which jobs may use each, with the bound that justifies
    them; a new complete-mode/memory-sink job (or an id-keyed groupBy
    sneaking into a pinned one) fails here and must either switch to the
    append-mode + file-sink pattern (q94/q21/q98) or justify its bound.
    """
    import inspect

    from spark_ss_hudi_delta_poc_spark.streaming import jobs

    # fn name -> the bounded key domain that justifies complete mode
    complete_ok = {
        "stream_global_count": "keyless global aggregate (1 row)",
        "stream_static_join": "|SEGMENT_LABELS| = 3 groups",
        "stream_hll_distinct": "fixed 1024 HLL registers",
    }
    memory_ok = set(complete_ok) | {
        # emissions <= groups x salt_buckets x k per batch — state-capped
        "stream_running_topk",
    }
    id_cols = ("user_id", "doc_id", "event_id", "vec_id")
    complete_found, memory_found = set(), set()
    for name, fn in inspect.getmembers(jobs, inspect.isfunction):
        if fn.__module__ != jobs.__name__:
            continue
        src = inspect.getsource(fn)
        if 'outputMode("complete")' in src:
            complete_found.add(name)
            for c in id_cols:
                # an id column may appear in projections, but never as a
                # complete-mode aggregation key
                assert f'groupBy("{c}"' not in src and f"groupBy(F.col(\"{c}\"" not in src, (
                    f"{name}: complete-mode aggregate keyed on {c}"
                )
        if 'format("memory")' in src:
            memory_found.add(name)
    assert complete_found == set(complete_ok), complete_found
    assert memory_found == memory_ok, memory_found


def test_matview_apply_batch_rewrites_only_touched_buckets(spark, tmp_path):
    """q60's write-amplification contract (the q100 fix applied to the
    materialized view): a follow-up batch touching one user rewrites
    exactly that user's bucket; every other bucket dir is bit-identical
    untouched."""
    import os

    from spark_ss_hudi_delta_poc_spark.streaming.jobs import (
        MATVIEW_N_BUCKETS,
        matview_apply_batch,
    )

    state_dir = str(tmp_path / "state")
    base = spark.createDataFrame(
        [(i, f"2024-01-01 00:{i % 60:02d}:00", i % 40, "click", 1.0, "{}") for i in range(200)],
        "event_id long, tss string, user_id long, event_type string, value double, payload string",
    ).selectExpr(
        "event_id", "to_timestamp(tss) AS ts", "user_id", "event_type", "value", "payload"
    )
    matview_apply_batch(spark, base, state_dir)

    def snapshot(root):
        out = {}
        for dp, _, fns in os.walk(root):
            for fn in fns:
                if fn.startswith("_"):  # manifest pointer rewrites per swap
                    continue
                p = os.path.join(dp, fn)
                out[p] = os.stat(p).st_mtime_ns
        return out

    before = snapshot(state_dir)
    one = spark.createDataFrame(
        [(10_000, "2024-01-02 00:00:00", 7, "purchase", 2.0, "{}")],
        "event_id long, tss string, user_id long, event_type string, value double, payload string",
    ).selectExpr(
        "event_id", "to_timestamp(tss) AS ts", "user_id", "event_type", "value", "payload"
    )
    stats: list = []
    matview_apply_batch(spark, one, state_dir, stats=stats)
    assert stats[0]["touched_buckets"] == [7 % MATVIEW_N_BUCKETS]
    touched_prefix = os.path.join(state_dir, f"bkt={7 % MATVIEW_N_BUCKETS}") + os.sep
    after = snapshot(state_dir)
    for p, mt in before.items():
        if not p.startswith(touched_prefix):
            assert after.get(p) == mt, f"untouched bucket file rewritten: {p}"
    from spark_ss_hudi_delta_poc_spark.streaming.jobs import read_matview_state

    latest = read_matview_state(spark, state_dir)
    u7 = latest.where("user_id = 7").collect()
    assert len(u7) == 1 and u7[0].last_type == "purchase"


def test_swap_heals_stale_staging_from_a_crashed_batch(spark, tmp_path):
    """Crash-heal for the shared bucketed-swap (_swap_touched_buckets):
    a batch that died AFTER writing staging but BEFORE the bucket
    renames leaves a stale `<dir>.staging` behind — the next batch must
    clear it, complete its own swap, and leave no staging residue, with
    the merged history still exactly right."""
    import os

    from spark_ss_hudi_delta_poc_spark.streaming.jobs import (
        read_scd2_history,
        scd2_apply_batch,
    )

    log_dir, hist_dir = str(tmp_path / "log"), str(tmp_path / "hist")
    base = spark.createDataFrame(
        [(i, f"2024-01-01 00:{i % 60:02d}:00", i % 10, "click") for i in range(50)],
        "event_id long, tss string, user_id long, event_type string",
    ).selectExpr("event_id", "to_timestamp(tss) AS ts", "user_id", "event_type")
    scd2_apply_batch(spark, base, log_dir, hist_dir, epoch_id=0)
    # simulate the crash: junk staging left by a dead batch
    stale = hist_dir + ".staging"
    os.makedirs(os.path.join(stale, "bkt=3"), exist_ok=True)
    with open(os.path.join(stale, "bkt=3", "junk.parquet"), "w") as f:
        f.write("not parquet")
    nxt = spark.createDataFrame(
        [(9_000, "2024-01-02 00:00:00", 3, "purchase")],
        "event_id long, tss string, user_id long, event_type string",
    ).selectExpr("event_id", "to_timestamp(tss) AS ts", "user_id", "event_type")
    scd2_apply_batch(spark, nxt, log_dir, hist_dir, epoch_id=1)
    assert not os.path.exists(stale)
    hist = read_scd2_history(spark, hist_dir)
    u3 = sorted((r.version, r.event_type) for r in hist.where("user_id = 3").collect())
    assert u3[-1][1] == "purchase"
    # junk never leaked into the history
    assert hist.where("event_type = 'not parquet'").count() == 0

def test_swap_keeps_previous_version_for_one_batch(spark, tmp_path):
    """The snapshot-lifetime contract (ADVICE r11): a lazy frame
    resolved from the pre-swap manifest stays executable after ONE more
    swap of its bucket (GC keeps current + previous version), and a
    second swap retires the oldest version — bounded at two versions
    per bucket, not unbounded growth."""
    import os

    from spark_ss_hudi_delta_poc_spark.streaming.jobs import (
        MATVIEW_N_BUCKETS,
        matview_apply_batch,
        read_matview_state,
    )

    state_dir = str(tmp_path / "state")

    def batch(eid, etype):
        return spark.createDataFrame(
            [(eid, "2024-01-01 00:00:00", 7, etype, 1.0, "{}")],
            "event_id long, tss string, user_id long, event_type string, "
            "value double, payload string",
        ).selectExpr(
            "event_id", "to_timestamp(tss) AS ts", "user_id", "event_type",
            "value", "payload",
        )

    matview_apply_batch(spark, batch(1, "click"), state_dir)
    snap = read_matview_state(spark, state_dir)  # lazy, pinned to v=1
    matview_apply_batch(spark, batch(2, "view"), state_dir)
    # one swap later: the pinned snapshot still executes (grace kept v=1)
    assert [r.last_type for r in snap.where("user_id = 7").collect()] == ["click"]
    bdir = os.path.join(state_dir, f"bkt={7 % MATVIEW_N_BUCKETS}")
    assert sorted(os.listdir(bdir)) == ["v=1", "v=2"]
    matview_apply_batch(spark, batch(3, "purchase"), state_dir)
    # a second swap retires the oldest version — two versions, always
    assert sorted(os.listdir(bdir)) == ["v=2", "v=3"]
    assert [
        r.last_type
        for r in read_matview_state(spark, state_dir).where("user_id = 7").collect()
    ] == ["purchase"]


def test_scd2_apply_batch_reads_only_touched_log_buckets(spark, tmp_path):
    """The q100 READ-amplification contract (VERDICT r9 #1), symmetric
    to the write-footprint test above: a follow-up batch touching ONE
    user must open exactly that user's LOG bucket — every file the
    merge's log read lists lives under bkt=<user % N>, while plenty of
    other log buckets exist on disk with real files."""
    import os

    from spark_ss_hudi_delta_poc_spark.streaming.jobs import (
        SCD2_N_BUCKETS,
        scd2_apply_batch,
    )

    log_dir, hist_dir = str(tmp_path / "log"), str(tmp_path / "hist")
    base = spark.createDataFrame(
        [(i, f"2024-01-01 00:{i % 60:02d}:00", i % 40, "click") for i in range(200)],
        "event_id long, tss string, user_id long, event_type string",
    ).selectExpr("event_id", "to_timestamp(tss) AS ts", "user_id", "event_type")
    scd2_apply_batch(spark, base, log_dir, hist_dir, epoch_id=0)
    # 40 users % 16 buckets -> every bucket dir exists in the log
    on_disk = {d for d in os.listdir(log_dir) if d.startswith("bkt=")}
    assert len(on_disk) == SCD2_N_BUCKETS

    one_user = spark.createDataFrame(
        [(10_000, "2024-01-02 00:00:00", 7, "purchase")],
        "event_id long, tss string, user_id long, event_type string",
    ).selectExpr("event_id", "to_timestamp(tss) AS ts", "user_id", "event_type")
    stats: list = []
    scd2_apply_batch(spark, one_user, log_dir, hist_dir, stats=stats, epoch_id=1)
    bk = 7 % SCD2_N_BUCKETS
    files = stats[-1]["log_files_read"]
    assert files, "log read listed no files"
    for f in files:
        assert f"/bkt={bk}/" in f, f"untouched log bucket opened: {f}"


def test_scd2_replayed_epoch_does_not_inflate_history(spark, tmp_path):
    """Epoch fencing (review r10): foreachBatch re-delivers the SAME
    frame with the SAME epoch_id after a crash-restart — the replay
    must overwrite its own log epoch, not double-append; the history
    (n_events included) must be byte-identical to the single-delivery
    run, and the log must hold each event exactly once."""
    from spark_ss_hudi_delta_poc_spark.streaming.jobs import (
        read_scd2_history,
        scd2_apply_batch,
    )

    log_dir, hist_dir = str(tmp_path / "log"), str(tmp_path / "hist")
    base = spark.createDataFrame(
        [(i, f"2024-01-01 00:{i % 60:02d}:00", i % 10, "click") for i in range(50)],
        "event_id long, tss string, user_id long, event_type string",
    ).selectExpr("event_id", "to_timestamp(tss) AS ts", "user_id", "event_type")
    nxt = spark.createDataFrame(
        [(9_000, "2024-01-02 00:00:00", 3, "purchase")],
        "event_id long, tss string, user_id long, event_type string",
    ).selectExpr("event_id", "to_timestamp(tss) AS ts", "user_id", "event_type")
    scd2_apply_batch(spark, base, log_dir, hist_dir, epoch_id=0)
    scd2_apply_batch(spark, nxt, log_dir, hist_dir, epoch_id=1)
    want = sorted(tuple(r) for r in read_scd2_history(spark, hist_dir).collect())
    # crash-replay of epoch 1
    scd2_apply_batch(spark, nxt, log_dir, hist_dir, epoch_id=1)
    got = sorted(tuple(r) for r in read_scd2_history(spark, hist_dir).collect())
    assert got == want
    log = spark.read.parquet(log_dir)
    assert log.count() == 51
    assert log.select("event_id").distinct().count() == 51


def test_scd2_apply_batch_empty_batch_is_noop(spark, tmp_path):
    """ADVICE r10: an EMPTY micro-batch has no touched buckets, and the
    pruned log read would otherwise call spark.read.parquet(*[]) with
    zero paths (raises).  Unreachable under the availableNow file driver
    but scd2_apply_batch is a library function — an empty frame must be
    a no-op that leaves the history bit-identical."""
    import os

    from spark_ss_hudi_delta_poc_spark.streaming.jobs import (
        read_scd2_history,
        scd2_apply_batch,
    )

    log_dir, hist_dir = str(tmp_path / "log"), str(tmp_path / "hist")
    base = spark.createDataFrame(
        [(i, f"2024-01-01 00:{i:02d}:00", i % 5, "click") for i in range(20)],
        "event_id long, tss string, user_id long, event_type string",
    ).selectExpr("event_id", "to_timestamp(tss) AS ts", "user_id", "event_type")
    scd2_apply_batch(spark, base, log_dir, hist_dir, epoch_id=0)
    want = sorted(tuple(r) for r in read_scd2_history(spark, hist_dir).collect())

    empty = base.where("event_id < 0")
    stats: list = []
    scd2_apply_batch(spark, empty, log_dir, hist_dir, stats=stats, epoch_id=1)
    assert stats[-1]["touched_buckets"] == []
    got = sorted(tuple(r) for r in read_scd2_history(spark, hist_dir).collect())
    assert got == want


def test_swap_crash_before_manifest_flip_keeps_old_snapshot(spark, tmp_path, monkeypatch):
    """VERDICT r10 #5 (kill-between-renames): the bucketed swap's commit
    point is the atomic manifest flip.  A crash AFTER the new version
    dirs are renamed in but BEFORE the flip must leave every reader on
    the complete OLD snapshot (the old in-place rename could expose a
    mixed old/new-bucket read here); the replayed batch must then heal —
    complete its swap, flip the manifest, and GC the orphan version
    dirs."""
    import os

    from spark_ss_hudi_delta_poc_spark.streaming import jobs
    from spark_ss_hudi_delta_poc_spark.streaming.jobs import (
        _read_bucket_manifest,
        read_scd2_history,
        scd2_apply_batch,
    )

    log_dir, hist_dir = str(tmp_path / "log"), str(tmp_path / "hist")
    base = spark.createDataFrame(
        [(i, f"2024-01-01 00:{i % 60:02d}:00", i % 10, "click") for i in range(50)],
        "event_id long, tss string, user_id long, event_type string",
    ).selectExpr("event_id", "to_timestamp(tss) AS ts", "user_id", "event_type")
    scd2_apply_batch(spark, base, log_dir, hist_dir, epoch_id=0)
    want = sorted(tuple(r) for r in read_scd2_history(spark, hist_dir).collect())

    nxt = spark.createDataFrame(
        [(9_000, "2024-01-02 00:00:00", 3, "purchase")],
        "event_id long, tss string, user_id long, event_type string",
    ).selectExpr("event_id", "to_timestamp(tss) AS ts", "user_id", "event_type")

    # kill the batch at the exact commit point: version dirs are already
    # renamed into place, the manifest flip never happens
    real_commit = jobs._commit_bucket_manifest

    def die(*a, **kw):
        raise RuntimeError("killed before manifest flip")

    monkeypatch.setattr(jobs, "_commit_bucket_manifest", die)
    try:
        scd2_apply_batch(spark, nxt, log_dir, hist_dir, epoch_id=1)
        raise AssertionError("expected the injected kill")
    except RuntimeError:
        pass
    monkeypatch.setattr(jobs, "_commit_bucket_manifest", real_commit)

    # consistent OLD snapshot: the orphan v dir exists but is invisible
    bkt3 = os.path.join(hist_dir, "bkt=3")
    assert len([d for d in os.listdir(bkt3) if d.startswith("v=")]) == 2
    got = sorted(tuple(r) for r in read_scd2_history(spark, hist_dir).collect())
    assert got == want

    # replay of epoch 1 heals: swap completes, orphan GC'd, merge right
    # (the PREVIOUS committed version v=1 survives by the one-swap
    # snapshot grace; the crash orphan v=2 does not)
    scd2_apply_batch(spark, nxt, log_dir, hist_dir, epoch_id=1)
    manifest = _read_bucket_manifest(hist_dir)
    live = sorted(d for d in os.listdir(bkt3) if d.startswith("v="))
    assert live == sorted({"v=1", f"v={manifest[3]}"}) and manifest[3] == 3
    hist = read_scd2_history(spark, hist_dir)
    u3 = sorted((r.version, r.event_type) for r in hist.where("user_id = 3").collect())
    assert u3[-1][1] == "purchase"


def test_scd2_log_compaction_bounds_dirs_and_preserves_history(spark, tmp_path):
    """VERDICT r10 #4: after N triggers with compaction enabled, the
    per-bucket live epoch-dir count is BOUNDED (threshold + bases + the
    in-flight epoch), and the maintained history still equals the
    one-shot batch scd2_history over all events."""
    import os

    from spark_ss_hudi_delta_poc_spark.operators.maintenance import scd2_history
    from spark_ss_hudi_delta_poc_spark.streaming.jobs import (
        _scd2_live_epoch_dirs,
        read_scd2_history,
        scd2_apply_batch,
    )

    log_dir, hist_dir = str(tmp_path / "log"), str(tmp_path / "hist")
    all_rows = []
    for e in range(10):
        rows = [
            (e * 100 + i, f"2024-01-{e + 1:02d} 00:{i:02d}:00", (e + i) % 6, "click")
            for i in range(12)
        ]
        all_rows += rows
        batch = spark.createDataFrame(
            rows, "event_id long, tss string, user_id long, event_type string"
        ).selectExpr("event_id", "to_timestamp(tss) AS ts", "user_id", "event_type")
        scd2_apply_batch(
            spark, batch, log_dir, hist_dir, epoch_id=e, compact_threshold=3
        )
        bkts = [int(d.split("=")[1]) for d in os.listdir(log_dir) if d.startswith("bkt=")]
        for bk in bkts:
            n_live = len(_scd2_live_epoch_dirs(log_dir, [bk]))
            assert n_live <= 3 + 8 + 1, f"bucket {bk}: {n_live} live epoch dirs"
    # 10 batches at threshold 3 must have folded at least twice: far
    # fewer live dirs than the 10 the uncompacted layout would hold
    assert len(_scd2_live_epoch_dirs(log_dir, bkts)) < 6 * len(bkts)
    want_df = scd2_history(
        spark.createDataFrame(
            all_rows, "event_id long, tss string, user_id long, event_type string"
        ).selectExpr("event_id", "to_timestamp(tss) AS ts", "user_id", "event_type")
    )
    want = sorted(tuple(r) for r in want_df.collect())
    got = sorted(tuple(r) for r in read_scd2_history(spark, hist_dir).collect())
    assert got == want


def test_scd2_log_compaction_crash_windows_are_invisible(spark, tmp_path):
    """The marker protocol's two crash windows: (a) compacted epoch dirs
    written but marker never committed -> readers ignore the orphan
    output; (b) marker committed but source-dir GC incomplete -> readers
    ignore the folded dirs, and the next compaction heals the GC."""
    import json
    import os

    from spark_ss_hudi_delta_poc_spark.streaming.jobs import (
        _scd2_live_epoch_dirs,
        compact_scd2_log,
        read_scd2_history,
        scd2_apply_batch,
    )

    log_dir, hist_dir = str(tmp_path / "log"), str(tmp_path / "hist")
    for e in range(3):
        batch = spark.createDataFrame(
            [(e * 10 + i, f"2024-01-0{e + 1} 00:{i:02d}:00", i % 4, "click") for i in range(8)],
            "event_id long, tss string, user_id long, event_type string",
        ).selectExpr("event_id", "to_timestamp(tss) AS ts", "user_id", "event_type")
        scd2_apply_batch(spark, batch, log_dir, hist_dir, epoch_id=e)
    want = sorted(tuple(r) for r in read_scd2_history(spark, hist_dir).collect())
    live_before = _scd2_live_epoch_dirs(log_dir, [0, 1, 2, 3])

    # (a) orphan compacted output, no marker: a crashed fold's half-write
    orphan = os.path.join(log_dir, "bkt=0", "epoch=-99")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk.parquet"), "w") as fh:
        fh.write("not parquet")
    assert _scd2_live_epoch_dirs(log_dir, [0, 1, 2, 3]) == live_before

    # (b) committed marker, GC incomplete: epoch 0 folded on paper only
    cdir = os.path.join(log_dir, "_compactions")
    os.makedirs(cdir, exist_ok=True)
    with open(os.path.join(cdir, "-99.json"), "w") as fh:
        json.dump({"folded": [0]}, fh)
    live = _scd2_live_epoch_dirs(log_dir, [0, 1, 2, 3])
    assert all("epoch=0" != p.rsplit("/", 1)[1] for p in live)
    assert any(p.endswith("epoch=-99") for p in live)  # committed output IS live

    # undo the paper fold (its fake output holds no real rows), then a
    # REAL fold at threshold 1: must commit, GC the folded dirs, and
    # leave the history recomputable from the compacted log
    os.remove(os.path.join(cdir, "-99.json"))
    import shutil

    shutil.rmtree(orphan)
    assert compact_scd2_log(spark, log_dir, current_epoch=3, threshold=1)
    live = _scd2_live_epoch_dirs(log_dir, [0, 1, 2, 3])
    assert live and all("epoch=-4" in p for p in live)
    # a follow-up merge reads the compacted base correctly
    nxt = spark.createDataFrame(
        [(900, "2024-01-05 00:00:00", 1, "purchase")],
        "event_id long, tss string, user_id long, event_type string",
    ).selectExpr("event_id", "to_timestamp(tss) AS ts", "user_id", "event_type")
    scd2_apply_batch(spark, nxt, log_dir, hist_dir, epoch_id=4)
    hist = read_scd2_history(spark, hist_dir)
    u1 = sorted((r.version, r.event_type) for r in hist.where("user_id = 1").collect())
    assert u1[-1][1] == "purchase"
    others = sorted(
        tuple(r) for r in read_scd2_history(spark, hist_dir).where("user_id <> 1").collect()
    )
    assert others == [t for t in want if t[0] != 1]


def test_read_matview_state_empty_is_empty_frame(spark, tmp_path):
    """A never-committed state dir is an EMPTY snapshot, not a zero-path
    read error (review r11 — the guard read_scd2_history already had)."""
    from spark_ss_hudi_delta_poc_spark.streaming.jobs import read_matview_state

    got = read_matview_state(spark, str(tmp_path / "nostate"))
    assert got.count() == 0
    assert got.columns == ["user_id", "last_event_id", "last_type", "v_e4", "ver"]


def test_scd2_log_major_fold_merges_bases_and_gcs_markers(spark, tmp_path):
    """The MAJOR compaction tier (review r11: previously untested): with
    threshold=2 and base_threshold=2, bases themselves get folded — the
    fold marker lists negative epochs, the folded bases' dirs AND
    markers are GC'd, each event stays in the live log exactly once,
    and a follow-up merge over the multiply-compacted log still yields
    the batch-exact history."""
    import os

    from spark_ss_hudi_delta_poc_spark.operators.maintenance import scd2_history
    from spark_ss_hudi_delta_poc_spark.streaming.jobs import (
        SCD2_LOG_SCHEMA,
        _scd2_committed_compactions,
        _scd2_live_epoch_dirs,
        compact_scd2_log,
        read_scd2_history,
        scd2_apply_batch,
    )

    log_dir, hist_dir = str(tmp_path / "log"), str(tmp_path / "hist")
    all_rows = []
    majors = 0
    for e in range(8):
        rows = [
            (e * 100 + i, f"2024-01-{e + 1:02d} 00:{i:02d}:00", (e + i) % 5, "click")
            for i in range(6)
        ]
        all_rows += rows
        batch = spark.createDataFrame(
            rows, "event_id long, tss string, user_id long, event_type string"
        ).selectExpr("event_id", "to_timestamp(tss) AS ts", "user_id", "event_type")
        # compaction driven explicitly so the tiny tiers are exercised
        scd2_apply_batch(
            spark, batch, log_dir, hist_dir, epoch_id=e, compact_threshold=10**9
        )
        did = compact_scd2_log(
            spark, log_dir, current_epoch=e, threshold=2, base_threshold=2
        )
        if did:
            comp = _scd2_committed_compactions(log_dir)
            if any(x < 0 for folded in comp.values() for x in folded):
                majors += 1
    assert majors >= 1, "base_threshold=2 over 8 batches must major-fold"
    comp = _scd2_committed_compactions(log_dir)
    # folded bases' markers are GC'd: every committed marker's epoch is live
    bkts = [int(d.split("=")[1]) for d in os.listdir(log_dir) if d.startswith("bkt=")]
    live_paths = _scd2_live_epoch_dirs(log_dir, bkts)
    live_epochs = {int(p.rsplit("epoch=", 1)[1]) for p in live_paths}
    assert set(comp) <= live_epochs
    # bounded live dirs per bucket: threshold + base_threshold + 1
    for bk in bkts:
        assert len(_scd2_live_epoch_dirs(log_dir, [bk])) <= 2 + 2 + 1
    # every event exactly once across the live log
    live = (
        spark.read.option("basePath", log_dir)
        .schema(SCD2_LOG_SCHEMA)
        .parquet(*live_paths)
    )
    assert live.count() == len(all_rows)
    assert live.select("event_id").distinct().count() == len(all_rows)
    # a merge over the multiply-compacted log is still batch-exact
    nxt = spark.createDataFrame(
        [(9_000, "2024-02-01 00:00:00", 1, "purchase")],
        "event_id long, tss string, user_id long, event_type string",
    ).selectExpr("event_id", "to_timestamp(tss) AS ts", "user_id", "event_type")
    all_rows.append((9_000, "2024-02-01 00:00:00", 1, "purchase"))
    scd2_apply_batch(
        spark, nxt, log_dir, hist_dir, epoch_id=8, compact_threshold=10**9
    )
    want_df = scd2_history(
        spark.createDataFrame(
            all_rows, "event_id long, tss string, user_id long, event_type string"
        ).selectExpr("event_id", "to_timestamp(tss) AS ts", "user_id", "event_type")
    )
    want = sorted(tuple(r) for r in want_df.collect())
    got = sorted(tuple(r) for r in read_scd2_history(spark, hist_dir).collect())
    assert got == want
