"""Scale-strategy operators: salted join equivalence, bucketed co-located
join (shuffle-free), upsert snapshot, small-file compaction."""

from __future__ import annotations

import contextlib
import io
import os
import time

from pyspark.sql import functions as F

from spark_ss_hudi_delta_poc_spark.operators.joins import salted_join
from spark_ss_hudi_delta_poc_spark.operators.maintenance import compact, upsert_snapshot
from spark_ss_hudi_delta_poc_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    """Salting redistributes hot keys but must not change the result."""
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(orders, "l_orderkey").groupBy("o_orderpriority").count()
    salted = salted_join(li, orders, "l_orderkey", salt_buckets=8).groupBy("o_orderpriority").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Tables bucketed on the join key join WITHOUT an exchange — the
    co-located join strategy for repeated large-table joins at scale."""
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    (
        li.write.mode("overwrite")
        .option("path", os.path.join(tmp_path, "li_b"))
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_b")
    )
    (
        orders.write.mode("overwrite")
        .option("path", os.path.join(tmp_path, "ord_b"))
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("ord_b")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        joined = spark.table("li_b").join(
            spark.table("ord_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "+- Exchange" not in plan  # bucketing co-locates both sides
        assert joined.count() == load(spark, SF, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_upsert_snapshot_latest_wins(spark):
    cur = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], ["id", "val", "ver"]
    )
    upd = spark.createDataFrame(
        [(2, "b2", 20), (4, "d", 20), (5, "e", 5)], ["id", "val", "ver"]
    )
    out = {r.id: (r.val, r.ver) for r in upsert_snapshot(cur, upd, ["id"], "ver").collect()}
    assert out == {1: ("a", 10), 2: ("b2", 20), 3: ("c", 10), 4: ("d", 20), 5: ("e", 5)}


def test_upsert_precombine_on_tie(spark):
    """Same key in both sides with equal precombine → the update wins
    (Hudi combine-before-upsert contract)."""
    cur = spark.createDataFrame([(1, "old", 10)], ["id", "val", "ver"])
    upd = spark.createDataFrame([(1, "new", 10)], ["id", "val", "ver"])
    out = upsert_snapshot(cur, upd, ["id"], "ver").collect()
    assert [(r.id, r.val) for r in out] == [(1, "new")]


def test_bulk_insert_vs_upsert_semantics(spark):
    """The Hudi operation-type contract the reference tunes between
    (S3ToHudiOptStreamJob.scala:78-101 bulk_insert vs upsert): bulk_insert
    is a raw append — same-key rows coexist, which is exactly the
    replayed-batch duplication the reference documents (README.md:
    115-122); upsert dedups by key with latest-precombine-wins."""
    from spark_ss_hudi_delta_poc_spark.operators.maintenance import bulk_insert_snapshot

    cur = spark.createDataFrame([(1, "a", 10), (2, "b", 10)], ["id", "val", "ver"])
    upd = spark.createDataFrame([(2, "b2", 20), (3, "c", 20)], ["id", "val", "ver"])
    bulk = bulk_insert_snapshot(cur, upd)
    assert bulk.count() == 4  # key 2 duplicated — bulk_insert does not dedup
    assert bulk.where(F.col("id") == 2).count() == 2
    ups = upsert_snapshot(cur, upd, ["id"], "ver")
    assert ups.count() == 3  # key 2 resolved latest-wins
    assert [(r.val, r.ver) for r in ups.where(F.col("id") == 2).collect()] == [("b2", 20)]


def test_compact_heals_interrupted_swap(spark, tmp_path):
    """Crash between compact's two renames leaves the table at ._old; the
    next compact must heal (restore) before compacting."""
    path = os.path.join(tmp_path, "heal")
    spark.range(100).repartition(8).write.parquet(path)
    want = spark.read.parquet(path).count()
    # simulate the crash window: table renamed away, staging never moved in
    os.rename(path, path + "._old")
    compact(spark, path, target_files_per_partition=1)
    assert spark.read.parquet(path).count() == want
    n_files = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_files == 1
    assert not os.path.isdir(path + "._old")


def test_compact_reduces_files(spark, tmp_path):
    path = os.path.join(tmp_path, "tbl")
    df = load(spark, SF, "events")
    df.repartition(16).write.parquet(path)
    n_before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_before == 16
    want = spark.read.parquet(path).count()
    compact(spark, path, target_files_per_partition=2)
    n_after = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_after == 2
    assert spark.read.parquet(path).count() == want


def test_dynamic_partition_overwrite(spark, tmp_path):
    """Incremental backfill: overwrite ONLY the partitions present in the
    new data (partitionOverwriteMode=dynamic), other partitions untouched."""
    path = os.path.join(tmp_path, "dpo")
    base = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-01"), (3, "2024-01-02")], ["id", "day"]
    )
    base.write.partitionBy("day").parquet(path)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fix = spark.createDataFrame([(9, "2024-01-01")], ["id", "day"])
        fix.write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    back = spark.read.parquet(path)
    # partition values are type-inferred (string → date) on read-back
    got = {(r.id, str(r.day)) for r in back.collect()}
    assert got == {(9, "2024-01-01"), (3, "2024-01-02")}  # day-02 survived


def test_snapshot_diff_detects_all_change_types(spark):
    from spark_ss_hudi_delta_poc_spark.operators.maintenance import snapshot_diff

    old = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "v"])
    new = spark.createDataFrame([(1, "a"), (2, "B"), (4, "d")], ["id", "v"])
    got = {r.id: r.change for r in snapshot_diff(old, new, ["id"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}  # id 1 unchanged → absent


def test_compact_partitioned_table(spark, tmp_path):
    """Compaction preserves hive partitioning and reduces files per
    partition to the target."""
    path = os.path.join(tmp_path, "ptbl")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(100)], ["id", "part"]
    )
    df.repartition(8).write.partitionBy("part").parquet(path)
    want = spark.read.parquet(path).count()
    compact(spark, path, target_files_per_partition=1, partition_by=["part"])
    for p in ["part=a", "part=b"]:
        files = [f for f in os.listdir(os.path.join(path, p)) if f.endswith(".parquet")]
        assert len(files) == 1, p
    assert spark.read.parquet(path).count() == want


def test_salted_left_join_preserves_unmatched(spark):
    """Left salted join keeps unmatched left rows exactly once."""
    left = spark.createDataFrame([(1, "x"), (2, "y"), (99, "z")], ["k", "lv"])
    right = spark.createDataFrame([(1, "r1"), (2, "r2")], ["k", "rv"])
    out = salted_join(left, right, "k", salt_buckets=4, how="left").collect()
    got = {(r.k, r.lv, r.rv) for r in out}
    assert got == {(1, "x", "r1"), (2, "y", "r2"), (99, "z", None)}


def test_profile_operator_values(spark):
    from spark_ss_hudi_delta_poc_spark.operators.profiling import profile

    df = spark.createDataFrame(
        [(1, None, 2.5), (2, "b", 3.5), (3, "b", None)], ["id", "s", "v"]
    )
    rows = {r.column: r for r in profile(df).collect()}
    assert rows["s"].n_nulls == 1 and rows["s"].n_distinct == 1
    assert rows["v"].n_nulls == 1
    assert rows["v"].min_val == "25000" and rows["v"].max_val == "35000"  # e4-scaled
    assert rows["id"].n_rows == 3


def test_zvalue_matches_python_reference(spark):
    from spark_ss_hudi_delta_poc_spark.operators.partitioning import zvalue

    def z_ref(a: int, b: int, bits: int = 16) -> int:
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    rows = [(0, 0), (1, 0), (0, 1), (7, 3), (255, 255), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", zvalue(F.col("a"), F.col("b")).alias("z")).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == z_ref(a, b), (a, b)


def test_zorder_layout_partitions_cover_disjoint_z_ranges(spark):
    """After zorder_layout, partition z-ranges are disjoint (range
    exchange) — each output file covers a compact rectangle in (a, b),
    which is what makes min/max skipping effective on both columns."""
    from spark_ss_hudi_delta_poc_spark.operators.partitioning import zorder_layout, zvalue

    df = spark.range(4096).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b")
    )
    laid = zorder_layout(df, "a", "b", n_files=8)
    ranges = (
        laid.withColumn("z", zvalue(F.col("a"), F.col("b")))
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in ranges if r.n > 0)
    assert len(spans) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # disjoint, ordered ranges


def test_bucketed_seen_compaction_colocates_history_probe(spark, tmp_path):
    """The 100 TB shape of the cross-run dedup anti-join: after
    compacting the marker-committed seen increments into a hash-bucketed
    table, the history probe plans with an Exchange on the BATCH side
    only — the corpus-sized seen side is read in place (no exchange
    above its scan) — and the probe result matches the plain-parquet
    anti-join exactly."""
    from spark_ss_hudi_delta_poc_spark.functions.hashing import md5_long
    from spark_ss_hudi_delta_poc_spark.operators.maintenance import (
        bucketed_anti_join_new,
        compact_seen_to_bucketed,
    )
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import ingest_increment

    corpus = os.path.join(tmp_path, "corpus")
    seen = os.path.join(tmp_path, "seen")
    b1 = spark.createDataFrame(
        [(i, f"doc number {i} body") for i in range(40)], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(100 + i, f"second run doc {i}") for i in range(30)], "doc_id long, text string"
    )
    assert ingest_increment(spark, b1, corpus, seen) == 40
    assert ingest_increment(spark, b2, corpus, seen) == 30

    n = compact_seen_to_bucketed(
        spark, seen, "seen_b", os.path.join(tmp_path, "seen_b"), n_buckets=8
    )
    try:
        assert n == 70
        batch = spark.createDataFrame(
            # 2 known (one from each run) + 3 new
            [(1, "doc number 1 body"), (101, "second run doc 1")]
            + [(500 + i, f"fresh content {i}") for i in range(3)],
            "doc_id long, text string",
        )
        hashed = batch.withColumn("h", md5_long(F.col("text")))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            fresh = bucketed_anti_join_new(hashed, spark, "seen_b")
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fresh.explain("formatted")
            plan = buf.getvalue()
            # exactly one exchange: the batch side repartitioning into the
            # bucket layout; nothing sits between the join and the bucketed scan
            import re

            assert len(re.findall(r"\bExchange \(", plan)) <= 1
            assert sorted(r.doc_id for r in fresh.collect()) == [500, 501, 502]
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    finally:
        spark.sql("DROP TABLE IF EXISTS seen_b")


def test_aqe_skew_join_splits_hot_partition(spark):
    """The runtime backstop deploy/submit_100tb.sh relies on when salting
    is not applied: with AQE skew-join enabled, a join whose key
    distribution concentrates on one value gets its hot partition SPLIT
    at runtime — the executed plan's SortMergeJoin carries skew=true.
    (Thresholds are lowered so the tiny fixture registers as skewed; on
    a cluster the defaults fire at real sizes.)  Manual salting
    (operators/joins.salted_join) remains the deterministic-layout
    alternative; this pins that the zero-code path works too."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = (
            spark.range(0, 200000)
            .select((F.col("id") * 0).alias("k"), F.col("id").alias("v"))
            .union(spark.range(1, 200).select(F.col("id").alias("k"), F.col("id").alias("v")))
        )
        right = spark.range(0, 200).select(F.col("id").alias("k"), (F.col("id") + 1).alias("w"))
        j = left.join(right, "k")
        assert len(j.collect()) == 200199  # hot key joins + 199 singletons
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        p = buf.getvalue()
        assert "isFinalPlan=true" in p
        assert "skew=true" in p  # the hot partition was split at runtime
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_vacuum_removes_only_old_uncommitted_increments(spark, tmp_path):
    """A crash between staging and marker-create leaves an unmarked
    inc= dir; vacuum reclaims it once old enough, never touches
    committed increments or fresh in-flight stages, and readers see the
    same committed data before and after."""
    from spark_ss_hudi_delta_poc_spark.operators.maintenance import vacuum_uncommitted
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _committed_paths,
        _committed_tokens,
        ingest_increment,
    )

    corpus = os.path.join(tmp_path, "corpus")
    seen = os.path.join(tmp_path, "seen")
    b1 = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
    )
    assert ingest_increment(spark, b1, corpus, seen) == 10
    # simulate a crash: stage a dir, never write its marker
    orphan = os.path.join(seen, "inc=deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "w") as f:
        f.write("junk")
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    fresh_orphan = os.path.join(seen, "inc=cafe")  # in-flight: too young
    os.makedirs(fresh_orphan)

    before = _committed_paths(seen, _committed_tokens(seen))
    removed = vacuum_uncommitted(seen, min_age_seconds=3600)
    assert removed == ["deadbeef"]
    assert not os.path.isdir(orphan)
    assert os.path.isdir(fresh_orphan)  # young in-flight stage untouched
    assert _committed_paths(seen, _committed_tokens(seen)) == before

    # multi-table layout guard (ADVICE r11): the corpus commits under
    # `seen`, so vacuuming it with the default root would see ZERO
    # committed tokens and delete committed increments — it must refuse;
    # with the explicit txn_root it sees the markers and removes nothing
    import pytest

    with pytest.raises(ValueError, match="no _commits"):
        vacuum_uncommitted(corpus, min_age_seconds=0.0)
    assert vacuum_uncommitted(corpus, min_age_seconds=3600, txn_root=seen) == []
    assert _committed_paths(corpus, _committed_tokens(seen)) != []

    # fold outputs are manifest-committed, not marker-committed: their
    # tokens are never in _commits, so vacuum MUST skip them (review
    # r12 — the old rule would have deleted the entire folded history)
    foldv = os.path.join(seen, "inc=_foldv1")
    os.makedirs(foldv)
    with open(os.path.join(foldv, "part-0.parquet"), "w") as f:
        f.write("folded data")
    os.utime(foldv, (old, old))
    assert vacuum_uncommitted(seen, min_age_seconds=3600) == []
    assert os.path.isdir(foldv)


def test_compact_fuzzy_bands_bucketed_probe_is_colocated(spark, tmp_path):
    """compact_seen_to_bucketed's co-location argument, applied to the
    fuzzy ingest's band index: after compaction the history probe plans
    with at most ONE exchange (the batch key set repartitioning into the
    bucket layout) — the corpus-sized band side is read in place — and
    returns exactly the same candidate rows as the raw inc-dir read."""
    import contextlib
    import io
    import os
    import re

    from pyspark.sql import functions as F

    from spark_ss_hudi_delta_poc_spark.operators.maintenance import (
        bucketed_band_probe,
        compact_fuzzy_bands_to_bucketed,
    )
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_fuzzy,
    )

    corpus = os.path.join(tmp_path, "corpus")
    index = os.path.join(tmp_path, "index")
    mk = lambda head, a, b: head + a * 12 + b * 12  # 12+12+12 = 36-char prefix
    b1 = spark.createDataFrame(
        [(i, mk("aaaa bbb ccc", chr(100 + i), chr(110 + i))) for i in range(6)],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(100 + i, mk("qqqq rrr sss", chr(100 + i), chr(110 + i))) for i in range(4)],
        "doc_id long, text string",
    )
    assert ingest_increment_fuzzy(spark, b1, corpus, index, increment_id="r1") == 6
    assert ingest_increment_fuzzy(spark, b2, corpus, index, increment_id="r2") == 4

    n = compact_fuzzy_bands_to_bucketed(
        spark, index, "bands_b", os.path.join(tmp_path, "bands_b"), n_buckets=8
    )
    try:
        assert n == 30  # 10 docs x 3 bands
        keys = spark.createDataFrame(
            [(0, "aaaa bbb ccc"), (0, "qqqq rrr sss"), (1, "zzzzzzzzzzzz")],
            "band_idx int, band_val string",
        )
        old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            probed = bucketed_band_probe(keys, spark, "bands_b")
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                probed.explain("formatted")
            plan = buf.getvalue()
            assert len(re.findall(r"\bExchange \(", plan)) <= 1, plan
            got = sorted(
                (r.doc_id, r.band_idx) for r in probed.select("doc_id", "band_idx").collect()
            )
            raw = spark.read.parquet(
                os.path.join(index, "bands", "inc=r1"),
                os.path.join(index, "bands", "inc=r2"),
            ).join(keys, ["band_idx", "band_val"], "left_semi")
            want = sorted(
                (r.doc_id, r.band_idx) for r in raw.select("doc_id", "band_idx").collect()
            )
            assert got == want and len(got) == 10  # every doc's band 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    finally:
        spark.sql("DROP TABLE IF EXISTS bands_b")
