"""Cross-run incremental dedup ingest tests."""

from __future__ import annotations

import os

from pyspark.sql.types import LongType, StringType, StructField, StructType

from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
    incremental_dedup_ingest,
    ingest_increment,
)

DOC_SCHEMA = StructType([StructField("doc_id", LongType()), StructField("text", StringType())])


def test_ingest_increment_dedups_within_and_across_batches(spark, tmp_path):
    corpus = os.path.join(tmp_path, "corpus")
    seen = os.path.join(tmp_path, "seen")
    b1 = spark.createDataFrame([(1, "alpha"), (2, "beta"), (3, "alpha")], DOC_SCHEMA)
    n1 = ingest_increment(spark, b1, corpus, seen)
    assert n1 == 2  # in-batch dup (doc 3) dropped, min id kept
    b2 = spark.createDataFrame([(4, "beta"), (5, "gamma")], DOC_SCHEMA)
    n2 = ingest_increment(spark, b2, corpus, seen)
    assert n2 == 1  # beta already in history
    got = {r.doc_id: r.text for r in spark.read.parquet(corpus).collect()}
    assert got == {1: "alpha", 2: "beta", 5: "gamma"}


def test_incremental_streaming_ingest_two_runs(spark, tmp_path):
    """Two availableNow drains over a growing source directory: run 2 must
    ingest only genuinely new texts."""
    src = os.path.join(tmp_path, "src")
    corpus = os.path.join(tmp_path, "corpus")
    seen = os.path.join(tmp_path, "seen")
    ckpt = os.path.join(tmp_path, "ck")
    os.makedirs(src)
    spark.createDataFrame([(1, "a"), (2, "b")], DOC_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    q = incremental_dedup_ingest(spark, src, corpus, seen, ckpt, DOC_SCHEMA)
    q.awaitTermination()
    spark.createDataFrame([(3, "b"), (4, "c")], DOC_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    q = incremental_dedup_ingest(spark, src, corpus, seen, ckpt, DOC_SCHEMA)
    q.awaitTermination()
    got = sorted(r.text for r in spark.read.parquet(corpus).collect())
    assert got == ["a", "b", "c"]


def test_crash_between_appends_no_duplicates(spark, tmp_path, monkeypatch):
    """The round-2 atomicity hole: a crash between the corpus append and
    the seen-hash append must not duplicate rows when the batch replays.
    Inject the crash by failing the seen-table write; the increment has
    no commit marker, so the replay re-stages the SAME inc dir
    (overwrite) and commits — corpus stays duplicate-free."""
    import pytest

    import pyspark.sql.readwriter as rw

    corpus = os.path.join(tmp_path, "corpus")
    seen = os.path.join(tmp_path, "seen")
    b1 = spark.createDataFrame([(1, "alpha"), (2, "beta")], DOC_SCHEMA)

    orig = rw.DataFrameWriter.parquet

    def boom(self, path, *a, **kw):
        if str(path).startswith(seen):
            raise RuntimeError("injected crash between the two appends")
        return orig(self, path, *a, **kw)

    monkeypatch.setattr(rw.DataFrameWriter, "parquet", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest_increment(spark, b1, corpus, seen)
    monkeypatch.setattr(rw.DataFrameWriter, "parquet", orig)
    # corpus data was staged but the increment never committed
    assert not os.path.isdir(os.path.join(seen, "_commits")) or not os.listdir(
        os.path.join(seen, "_commits")
    )
    # replay the same batch: must ingest exactly once, no duplicates
    assert ingest_increment(spark, b1, corpus, seen) == 2
    got = sorted((r.doc_id, r.text) for r in spark.read.parquet(corpus).select("doc_id", "text").collect())
    assert got == [(1, "alpha"), (2, "beta")]
    # and a second full replay after commit is a marker-hit no-op
    assert ingest_increment(spark, b1, corpus, seen) == 0
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got == [1, 2]


def test_crash_before_marker_no_duplicates(spark, tmp_path, monkeypatch):
    """Kill window 2: both tables staged, marker never written.  Replay
    overwrites the same staged dirs and commits — still exactly once."""
    import pytest

    from spark_ss_hudi_delta_poc_spark.streaming import incremental

    corpus = os.path.join(tmp_path, "corpus")
    seen = os.path.join(tmp_path, "seen")
    b1 = spark.createDataFrame([(1, "alpha"), (2, "beta")], DOC_SCHEMA)

    def boom(txn_root, token):
        raise RuntimeError("injected crash before marker")

    monkeypatch.setattr(incremental, "_write_marker", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest_increment(spark, b1, corpus, seen)
    monkeypatch.undo()
    assert ingest_increment(spark, b1, corpus, seen) == 2
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got == [1, 2]


def test_ingest_increment_neardup(spark, tmp_path):
    """Near-dup incremental ingest: batch 2 docs that are near-dups of
    batch 1 survivors (or of each other) are dropped; novel docs land and
    extend the persistent LSH index."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import ingest_increment_neardup

    corpus = os.path.join(tmp_path, "c2")
    index = os.path.join(tmp_path, "idx")
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")  # jaccard ~0.8 vs base
    far = "completely different words with no overlap at all in this sentence here"
    other = "spark engines shuffle partitions across executors while planning adaptive queries"

    b1 = spark.createDataFrame([(1, base), (2, far)], DOC_SCHEMA)
    assert ingest_increment_neardup(spark, b1, corpus, index) == 2
    # batch 2: near-dup of history (near), exact-new (other), in-batch
    # near-dup pair (5/6: keep min id 5)
    b2 = spark.createDataFrame(
        [(4, near), (5, other), (6, other.replace("queries", "plans"))], DOC_SCHEMA
    )
    n = ingest_increment_neardup(spark, b2, corpus, index)
    assert n == 1
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got == [1, 2, 5]


def test_incremental_segment_dedup_across_runs(spark, tmp_path):
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_segments,
    )

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "segindex")
    boiler = " ".join(f"b{i}" for i in range(10))
    tail1 = " ".join(f"x{i}" for i in range(10))
    tail2 = " ".join(f"y{i}" for i in range(10))

    b1 = spark.createDataFrame([(1, f"{boiler} {tail1}")], ["doc_id", "text"])
    n1 = ingest_increment_segments(spark, b1, corpus, index, increment_id="r1")
    assert n1 == 1
    run1 = spark.read.parquet(corpus).collect()[0]
    assert run1.n_kept == 2  # nothing recurs yet: batch 1 keeps everything

    # run 2 re-ships the same boilerplate segment with a new tail: the
    # cross-run index must drop it while the fresh tail survives
    b2 = spark.createDataFrame([(2, f"{boiler} {tail2}")], ["doc_id", "text"])
    n2 = ingest_increment_segments(spark, b2, corpus, index, increment_id="r2")
    assert n2 == 1
    rows = {r.doc_id: r for r in spark.read.parquet(corpus).collect()}
    assert rows[2].n_kept == 1 and rows[2].clean_text == tail2
    assert rows[1].n_kept == 2  # history is immutable: run 1 keeps its copy

    # replayed increment: marker short-circuits, nothing double-ingested
    assert ingest_increment_segments(spark, b2, corpus, index, increment_id="r2") == 0
    assert spark.read.parquet(corpus).count() == 2


def test_incremental_winnow_rejects_cross_run_partial_copies(spark, tmp_path):
    """Run 2 must reject a doc whose content is substantially a copy of
    run-1 material (even with a new preamble — the case the exact-hash
    ingest misses), ingest genuinely new docs, and replay to 0."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import ingest_increment_winnow

    corpus = os.path.join(tmp_path, "wcorpus")
    index = os.path.join(tmp_path, "windex")
    body = "the quick brown fox jumps over the lazy dog " * 4
    other = " ".join(f"fresh{i} material{i}" for i in range(30))
    b1 = spark.createDataFrame([(1, body), (2, other)], DOC_SCHEMA)
    n1 = ingest_increment_winnow(spark, b1, corpus, index)
    assert n1 == 2  # empty history: everything ingests
    repost = "breaking news update " + body  # added preamble, same body
    novel = " ".join(f"novel{i} text{i}" for i in range(30))
    b2 = spark.createDataFrame([(3, repost), (4, novel)], DOC_SCHEMA)
    n2 = ingest_increment_winnow(spark, b2, corpus, index)
    assert n2 == 1  # repost rejected by overlap-vs-history, novel kept
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got == [1, 2, 4]
    # replay short-circuit: same batch content commits nothing new
    assert ingest_increment_winnow(spark, b2, corpus, index) == 0
    assert sorted(r.doc_id for r in spark.read.parquet(corpus).collect()) == [1, 2, 4]


def test_incremental_winnow_short_doc_batches_are_distinct_increments(spark, tmp_path):
    """Docs under k chars yield ZERO fingerprints — two distinct
    all-short batches must still be distinct increments (the replay
    token comes from raw text hashes, never the lossy fingerprint set),
    and short docs ingest un-gated."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import ingest_increment_winnow

    corpus = os.path.join(tmp_path, "scorpus")
    index = os.path.join(tmp_path, "sindex")
    assert ingest_increment_winnow(
        spark, spark.createDataFrame([(1, "hi")], DOC_SCHEMA), corpus, index
    ) == 1
    assert ingest_increment_winnow(
        spark, spark.createDataFrame([(2, "yo")], DOC_SCHEMA), corpus, index
    ) == 1  # different content: must NOT be treated as a replay
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got == [1, 2]


def test_incremental_winnow_crash_between_writes_heals_on_replay(spark, tmp_path, monkeypatch):
    """Crash injected between the corpus write and the fingerprint-index
    write: no marker commits, so the replayed increment re-stages the
    SAME inc dir (overwrite) and commits exactly once — and history
    decisions made after the heal still see the increment's
    fingerprints."""
    import pytest

    import pyspark.sql.readwriter as rw

    from spark_ss_hudi_delta_poc_spark.streaming.incremental import ingest_increment_winnow

    corpus = os.path.join(tmp_path, "ccorpus")
    index = os.path.join(tmp_path, "cindex")
    body = "the quick brown fox jumps over the lazy dog " * 4
    b1 = spark.createDataFrame([(1, body)], DOC_SCHEMA)

    orig = rw.DataFrameWriter.parquet

    def boom(self, path, *a, **kw):
        if str(path).startswith(index):
            raise RuntimeError("injected crash between the two writes")
        return orig(self, path, *a, **kw)

    monkeypatch.setattr(rw.DataFrameWriter, "parquet", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest_increment_winnow(spark, b1, corpus, index)
    monkeypatch.setattr(rw.DataFrameWriter, "parquet", orig)
    assert not os.path.isdir(os.path.join(index, "_commits")) or not os.listdir(
        os.path.join(index, "_commits")
    )
    assert ingest_increment_winnow(spark, b1, corpus, index) == 1  # heal, once
    assert [r.doc_id for r in spark.read.parquet(corpus).collect()] == [1]
    # post-heal history is live: a preamble-repost of the healed doc is rejected
    b2 = spark.createDataFrame([(2, "update " + body)], DOC_SCHEMA)
    assert ingest_increment_winnow(spark, b2, corpus, index) == 0


EMB_SCHEMA = "vec_id long, embedding array<float>"


def _unit(vs, dim=64):
    """Normalize and zero-pad to the corpus embedding dim (the LSH
    hyperplanes are fixed 64-dim, matching testdata embeddings)."""
    import math

    n = math.sqrt(sum(v * v for v in vs))
    return [v / n for v in vs] + [0.0] * (dim - len(vs))


def test_incremental_embedding_rejects_cross_run_semantic_dups(spark, tmp_path):
    """Run 2 must reject a vector that is a near-duplicate (cosine ~1) of
    run-1 material — the paraphrase-re-encode case no text-hash gate
    sees — ingest genuinely new directions, resolve in-batch dups to the
    min id, and replay to 0."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_embedding,
    )

    corpus = os.path.join(tmp_path, "ecorpus")
    index = os.path.join(tmp_path, "eindex")
    e1 = _unit([1.0, 0.2, 0.1, 0.0])
    e2 = _unit([0.0, 1.0, 0.0, 0.3])
    b1 = spark.createDataFrame([(1, e1), (2, e2)], EMB_SCHEMA)
    assert ingest_increment_embedding(spark, b1, corpus, index) == 2

    near_e1 = _unit([1.0, 0.21, 0.1, 0.0])     # cosine ~0.9997 with e1
    novel = _unit([0.0, 0.0, 0.1, -1.0])       # new direction
    novel_dup = _unit([0.0, 0.001, 0.1, -1.0])  # in-batch dup of `novel`
    b2 = spark.createDataFrame([(3, near_e1), (4, novel), (5, novel_dup)], EMB_SCHEMA)
    n2 = ingest_increment_embedding(spark, b2, corpus, index)
    assert n2 == 1  # 3 rejected vs history, 5 rejected in-batch (min-id 4 kept)
    got = sorted(r.vec_id for r in spark.read.parquet(corpus).collect())
    assert got == [1, 2, 4]
    # replay short-circuit
    assert ingest_increment_embedding(spark, b2, corpus, index) == 0
    assert sorted(r.vec_id for r in spark.read.parquet(corpus).collect()) == [1, 2, 4]


def test_incremental_embedding_reencode_is_not_a_replay(spark, tmp_path):
    """Same vec_ids with NEW vectors must be a distinct increment (the
    token hashes the quantized components, not just ids)."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_embedding,
    )

    corpus = os.path.join(tmp_path, "rcorpus")
    index = os.path.join(tmp_path, "rindex")
    assert ingest_increment_embedding(
        spark, spark.createDataFrame([(1, _unit([1.0, 0.0, 0.0, 0.0]))], EMB_SCHEMA),
        corpus, index,
    ) == 1
    # re-encode: same id, orthogonal vector — not a replay, and not a dup
    assert ingest_increment_embedding(
        spark, spark.createDataFrame([(1, _unit([0.0, 1.0, 0.0, 0.0]))], EMB_SCHEMA),
        corpus, index,
    ) == 1
    assert spark.read.parquet(corpus).count() == 2


def test_incremental_embedding_streaming_two_runs(spark, tmp_path):
    """Streaming wrapper e2e: two availableNow drains over a growing
    embedding source; run 2 must reject the near-duplicate of run-1
    material and ingest only the new direction."""
    from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        incremental_embedding_ingest,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    src = os.path.join(tmp_path, "esrc")
    corpus = os.path.join(tmp_path, "ecorp")
    index = os.path.join(tmp_path, "eidx")
    ckpt = os.path.join(tmp_path, "eck")
    os.makedirs(src)
    b1 = [(1, _unit([1.0, 0.1, 0.0, 0.0])), (2, _unit([0.0, 1.0, 0.2, 0.0]))]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    incremental_embedding_ingest(spark, src, corpus, index, ckpt, schema).awaitTermination()
    b2 = [(3, _unit([1.0, 0.11, 0.0, 0.0])), (4, _unit([0.0, 0.0, 0.0, 1.0]))]
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
    incremental_embedding_ingest(spark, src, corpus, index, ckpt, schema).awaitTermination()
    got = sorted(r.vec_id for r in spark.read.parquet(corpus).collect())
    assert got == [1, 2, 4]  # 3 rejected: near-dup of run-1 vec 1


def test_incremental_phash_rejects_cross_run_perceptual_dups(spark, tmp_path):
    """Run 2 must reject a media payload that is a same-length edit of
    run-1 material (small pHash Hamming — the re-encode case exact byte
    hashing misses), ingest unrelated payloads, resolve in-batch dups to
    the min id, and replay to 0."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_phash,
    )

    MEDIA = "doc_id long, payload binary"
    corpus = os.path.join(tmp_path, "pcorpus")
    index = os.path.join(tmp_path, "pindex")
    base = ("the quick brown fox jumps over the lazy dog and keeps running far " * 3).encode()
    other = (" ".join(f"fresh{i} material{i}" for i in range(30))).encode()
    b1 = spark.createDataFrame([(1, base), (2, other)], MEDIA)
    assert ingest_increment_phash(spark, b1, corpus, index) == 2

    edited = base.replace(b"lazy", b"hazy")      # same length, local edit
    novel = (" ".join(f"novel{i} text{i}" for i in range(30))).encode()
    novel_dup = novel.replace(b"novel3", b"nove13")  # same-length in-batch dup
    b2 = spark.createDataFrame([(3, edited), (4, novel), (5, novel_dup)], MEDIA)
    n2 = ingest_increment_phash(spark, b2, corpus, index)
    assert n2 == 1  # 3 rejected vs history, 5 rejected in-batch (4 kept)
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got == [1, 2, 4]
    # replay short-circuit
    assert ingest_increment_phash(spark, b2, corpus, index) == 0
    assert sorted(r.doc_id for r in spark.read.parquet(corpus).collect()) == [1, 2, 4]


def test_incremental_contamination_gate_blocks_eval_leaks(spark, tmp_path):
    """The ingest-time decontamination gate: a batch doc overlapping the
    fixed eval benchmark at/above the contamination threshold never
    lands in the corpus; clean docs do; a replayed batch short-circuits
    to 0; a second increment appends under its own token."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_contamination,
    )

    DOCS = "doc_id long, text string"
    corpus = os.path.join(tmp_path, "ccorpus")
    eval_text = "secret benchmark question about spark joins and shuffles here"
    ev = spark.createDataFrame([(9001, eval_text)], DOCS)

    leaked = "preamble text then " + eval_text + " plus a short suffix"
    clean = " ".join(f"original{i} content{i}" for i in range(20))
    b1 = spark.createDataFrame([(1, leaked), (2, clean)], DOCS)
    assert ingest_increment_contamination(spark, b1, corpus, ev) == 1
    assert sorted(r.doc_id for r in spark.read.parquet(corpus).collect()) == [2]
    # replay short-circuit
    assert ingest_increment_contamination(spark, b1, corpus, ev) == 0
    # second increment, clean content
    b2 = spark.createDataFrame([(3, " ".join(f"more{i} text{i}" for i in range(20)))], DOCS)
    assert ingest_increment_contamination(spark, b2, corpus, ev) == 1
    assert sorted(r.doc_id for r in spark.read.parquet(corpus).collect()) == [2, 3]


def test_incremental_contamination_crash_heal(spark, tmp_path):
    """A crash between staging and marker-create must heal on replay:
    the re-invoked increment re-stages the same inc=<token> dir
    (overwrite) and THEN commits — no duplicates, no lost rows."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _commits_dir,
        ingest_increment_contamination,
    )

    DOCS = "doc_id long, text string"
    corpus = os.path.join(tmp_path, "hcorpus")
    ev = spark.createDataFrame([(9001, "benchmark sentinel text here")], DOCS)
    b = spark.createDataFrame(
        [(1, " ".join(f"alpha{i} beta{i}" for i in range(15)))], DOCS
    )
    assert ingest_increment_contamination(spark, b, corpus, ev, increment_id="t0") == 1
    # simulate the crash: delete the marker, leave the staged dir (the
    # state a kill between write and marker-create produces)
    os.remove(os.path.join(_commits_dir(corpus), "t0"))
    # replay heals: re-stages the same dir, commits, still exactly once
    assert ingest_increment_contamination(spark, b, corpus, ev, increment_id="t0") == 1
    rows = spark.read.parquet(os.path.join(corpus, "inc=t0")).collect()
    assert [r.doc_id for r in rows] == [1]
    assert os.path.exists(os.path.join(_commits_dir(corpus), "t0"))


def test_incremental_hll_merge_replay_and_crash_heal(spark, tmp_path):
    """Cross-run HLL: (1) two increments' merged registers equal the
    single-pass batch sketch exactly; (2) a replayed increment is a
    no-op; (3) a crash after staging but BEFORE the marker leaves the
    stage dir invisible, and the healed re-run converges to the same
    sketch."""
    import os

    from pyspark.sql import functions as F

    from spark_ss_hudi_delta_poc_spark.operators.sketches import (
        hll_distinct,
        hll_from_registers,
    )
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        hll_merged_registers,
        ingest_increment_hll,
    )

    sketch = str(tmp_path / "sketch")
    b1 = spark.range(0, 3000).select(F.col("id").alias("k"))
    b2 = spark.range(2000, 6000).select(F.col("id").alias("k"))  # overlaps b1
    assert ingest_increment_hll(spark, b1, sketch, "k", increment_id=0) > 0
    assert ingest_increment_hll(spark, b2, sketch, "k", increment_id=1) > 0
    # replay of increment 1 is a committed no-op
    assert ingest_increment_hll(spark, b2, sketch, "k", increment_id=1) == 0

    both = b1.union(b2)
    exact = both.agg(F.count_distinct("k").alias("exact_distinct"))
    merged = hll_from_registers(hll_merged_registers(spark, sketch), exact).collect()
    batch = hll_distinct(both, "k").collect()
    assert merged == batch

    # crash: a third increment staged without its marker must be invisible
    b3 = spark.range(50_000, 60_000).select(F.col("id").alias("k"))
    from spark_ss_hudi_delta_poc_spark.operators.sketches import hll_register_updates

    (
        hll_register_updates(b3.select("k"), "k")
        .groupBy("reg")
        .agg(F.max("rho").alias("m_j"))
        .write.mode("overwrite")
        .parquet(os.path.join(sketch, "inc=2"))
    )
    merged2 = hll_from_registers(hll_merged_registers(spark, sketch), exact).collect()
    assert merged2 == batch  # uncommitted stage invisible
    # healed re-run of increment 2 commits and extends the sketch
    assert ingest_increment_hll(spark, b3, sketch, "k", increment_id=2) > 0
    exact3 = both.union(b3).agg(F.count_distinct("k").alias("exact_distinct"))
    merged3 = hll_from_registers(hll_merged_registers(spark, sketch), exact3).collect()
    batch3 = hll_distinct(both.union(b3), "k").collect()
    assert merged3 == batch3


def test_bloom_ingest_equals_plain_ingest(spark, tmp_path):
    """The bloom prefilter must be pure acceleration: the committed
    corpus after overlapping increments equals plain ingest_increment's
    corpus exactly, replays are no-ops, and the bloom bits stay bounded
    by BLOOM_M."""
    import os

    from pyspark.sql import functions as F

    from spark_ss_hudi_delta_poc_spark.operators.sketches import BLOOM_M
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _committed_paths,
        _committed_tokens,
        ingest_increment,
        ingest_increment_bloom,
    )

    def mk(lo, hi, tag):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit(f"text {tag} "), (F.col("id") % 400).cast("string")).alias("text"),
        )

    b1 = mk(0, 500, "x")          # 400 distinct texts (id%400 wraps)
    b2 = mk(500, 1000, "x")       # same 400 texts → all dups vs history
    b3 = mk(1000, 1200, "y")      # 200 brand-new texts

    bw, pw = str(tmp_path / "bloom_v"), str(tmp_path / "plain_v")
    for root, fn in ((bw, "bloom"), (pw, "plain")):
        corpus, seen = os.path.join(root, "c"), os.path.join(root, "s")
        for i, b in enumerate((b1, b2, b3)):
            if fn == "bloom":
                ingest_increment_bloom(
                    spark, b, corpus, seen, os.path.join(root, "bl"), increment_id=i
                )
            else:
                ingest_increment(spark, b, corpus, seen, increment_id=i)

    def corpus_rows(root):
        c, s = os.path.join(root, "c"), os.path.join(root, "s")
        df = spark.read.parquet(*_committed_paths(c, _committed_tokens(s)))
        return sorted((r.doc_id, r.text) for r in df.collect())

    assert corpus_rows(bw) == corpus_rows(pw)
    assert len(corpus_rows(bw)) == 600  # 400 + 0 + 200

    # replay no-op
    corpus, seen = os.path.join(bw, "c"), os.path.join(bw, "s")
    assert (
        ingest_increment_bloom(spark, b2, corpus, seen, os.path.join(bw, "bl"), increment_id=1)
        == 0
    )
    # bits bounded
    bits = spark.read.parquet(
        *_committed_paths(os.path.join(bw, "bl"), _committed_tokens(seen))
    )
    assert bits.select("pos").distinct().count() <= BLOOM_M


def _p36(head12: str, tail: str = "mmmm nnnn oo pppp qqqq rr sstt uu vv ww") -> str:
    """A doc whose normalized prefix is exactly head12 + a fixed 24-char
    continuation — edits confined to head12 leave bands 2 and 3 exact,
    so the pair is guaranteed a banding candidate (pigeonhole)."""
    assert len(head12) == 12
    return head12 + "zzzz yyy xxx www vvv uuu" + " " + tail


def test_ingest_increment_fuzzy_across_runs(spark, tmp_path):
    """Cross-run fuzzy ingest: batch-2 docs within Levenshtein 4 of
    anything EARLIER-SEEN are dropped — including matches against a doc
    that was itself DROPPED in batch 1 (kept-only indexing would be
    batch-boundary-dependent); novel and short-prefix docs survive."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_fuzzy,
    )

    corpus = os.path.join(tmp_path, "fcorpus")
    index = os.path.join(tmp_path, "findex")
    base = _p36("aaaa bbb ccc")
    near = _p36("aaXa bbb ccX")  # 2 substitutions in band 1: dist 2
    near2 = _p36("aaXa bXb ccX")  # dist 1 from NEAR (dropped doc), 3 from base
    far = _p36("qqqq rrr sss").replace("zzzz yyy", "kkkk jjj")  # different everywhere
    short = "tiny doc"

    b1 = spark.createDataFrame([(1, base), (2, near), (3, far)], DOC_SCHEMA)
    assert ingest_increment_fuzzy(spark, b1, corpus, index, increment_id="r1") == 2
    got1 = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got1 == [1, 3]  # in-batch: 2 is doc_id_b of (1,2)

    # batch 2: near2 matches the DROPPED doc 2 (and base at dist 3) ->
    # dropped; short has no 36-char prefix -> always kept
    b2 = spark.createDataFrame([(4, near2), (5, short)], DOC_SCHEMA)
    assert ingest_increment_fuzzy(spark, b2, corpus, index, increment_id="r2") == 1
    got2 = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got2 == [1, 3, 5]

    # replayed increment: marker short-circuits
    assert ingest_increment_fuzzy(spark, b2, corpus, index, increment_id="r2") == 0
    assert spark.read.parquet(corpus).count() == 3


def test_ingest_increment_fuzzy_crash_heals_on_replay(spark, tmp_path, monkeypatch):
    """A crash after staging but before the marker leaves no committed
    trace; the replayed increment re-stages the same dirs and commits —
    and later increments still drop against ITS docs."""
    import pytest

    from spark_ss_hudi_delta_poc_spark.streaming import incremental
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_fuzzy,
    )

    corpus = os.path.join(tmp_path, "fc")
    index = os.path.join(tmp_path, "fi")
    base = _p36("aaaa bbb ccc")
    near = _p36("aaXa bbb ccX")

    b1 = spark.createDataFrame([(1, base)], DOC_SCHEMA)
    real = incremental._write_marker

    def boom(*a, **kw):
        raise RuntimeError("injected crash before marker")

    monkeypatch.setattr(incremental, "_write_marker", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest_increment_fuzzy(spark, b1, corpus, index, increment_id="r1")
    monkeypatch.setattr(incremental, "_write_marker", real)
    # uncommitted staging is invisible: nothing counts as ingested yet
    assert ingest_increment_fuzzy(spark, b1, corpus, index, increment_id="r1") == 1
    b2 = spark.createDataFrame([(2, near)], DOC_SCHEMA)
    assert ingest_increment_fuzzy(spark, b2, corpus, index, increment_id="r2") == 0
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got == [1]


def test_ingest_increment_fuzzy_retires_mega_bucket_keys(spark, tmp_path):
    """The retire work bound, forced by a tiny cap (review r11 — the
    default 1024 cap never binds at test scale): a band key whose
    cumulative occupancy crosses max_bucket generates no candidates in
    any later increment, so a later doc matching ONLY through that key
    is kept; the key is recorded once; pairs through non-retired keys
    still drop."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_fuzzy,
    )

    corpus = os.path.join(tmp_path, "rc")
    index = os.path.join(tmp_path, "ri")
    h = "aaaa bbb ccc"  # shared band 0 for every doc
    # bands 1-2 pairwise disjoint: band 0 is the ONLY shared key
    d1 = h + "111111111111" + "222222222222"
    d2 = h + "333333333333" + "444444444444"
    d3 = h + "555555555555" + "666666666666"
    b1 = spark.createDataFrame([(1, d1), (2, d2), (3, d3)], DOC_SCHEMA)
    # cap 2 < occupancy 3: the shared band-0 bucket is mega from the
    # start — no pairs, all three kept, the key retired
    assert (
        ingest_increment_fuzzy(spark, b1, corpus, index, max_bucket=2, increment_id="r1")
        == 3
    )
    retired = spark.read.parquet(os.path.join(index, "retired", "inc=r1"))
    assert [(r.band_idx, r.band_val) for r in retired.collect()] == [(0, h)]

    # d4 is edit distance 4 from d1, sharing ONLY the retired band 0
    # (two subs in band 1, two in band 2) -> no candidates -> KEPT
    d4 = h + "1111X111111X" + "2222X222222X"
    # d5 is edit distance 2 from d2 sharing band 2 (non-retired) -> drop
    d5 = h + "3X33333333X3" + "444444444444"
    b2 = spark.createDataFrame([(4, d4), (5, d5)], DOC_SCHEMA)
    assert (
        ingest_increment_fuzzy(spark, b2, corpus, index, max_bucket=2, increment_id="r2")
        == 1
    )
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got == [1, 2, 3, 4]
    # the already-retired key is not re-recorded
    retired2 = spark.read.parquet(os.path.join(index, "retired", "inc=r2"))
    assert (0, h) not in {(r.band_idx, r.band_val) for r in retired2.collect()}


def test_fuzzy_ingest_folds_base_and_probe_footprint_bounded(spark, tmp_path):
    """VERDICT r11 #1 wired, round-12 tiering: with fold_threshold=2,
    six increments MINOR-fold the band index three times (each fold
    writes only its fresh deltas — never the full history); at EVERY
    point the on-disk delta-dir count stays < threshold+1, the final
    history probe's inputFiles all live under the live base TIERS (no
    folded inc dir is ever listed), and a doc fuzzy-matching
    increment-1 content through a base tier (not any delta) is still
    dropped."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _committed_tokens,
        _entry_tiers,
        _fold_manifest,
        _fuzzy_history_probe,
        ingest_increment_fuzzy,
    )

    corpus = os.path.join(tmp_path, "bc")
    index = os.path.join(tmp_path, "bi")
    mk = lambda head: _p36(head)
    a1 = mk("a001 bbb ccc")
    c1 = mk("c001 fff ggg")
    incs = [
        [(1, a1), (2, mk("b001 ddd eee"))],
        [(11, c1), (12, mk("d001 hhh iii"))],
        # near-dup of a1 (2 subs in band 1): must drop via BASE v1
        [(21, a1.replace("a001", "aXX1")), (22, mk("e001 jjj kkk"))],
        [(31, mk("f001 lll mmm")), (32, mk("g001 nnn ooo"))],
        [(41, mk("h001 ppp qqq"))],
        # near-dup of c1: must drop via a BASE tier (c1's inc dir folded)
        [(51, c1.replace("c001", "cXX1")), (52, mk("i001 rrr sss"))],
    ]
    bands_dir = os.path.join(index, "bands")
    kept = []
    for i, rows in enumerate(incs, start=1):
        b = spark.createDataFrame(rows, DOC_SCHEMA)
        kept.append(
            ingest_increment_fuzzy(
                spark, b, corpus, index, increment_id=f"r{i}", fold_threshold=2
            )
        )
        n_delta = (
            len(
                [
                    d
                    for d in os.listdir(bands_dir)
                    if d.startswith("inc=") and not d.startswith("inc=_foldv")
                ]
            )
            if os.path.isdir(bands_dir)
            else 0
        )
        assert n_delta < 3, f"delta dirs not bounded after inc {i}: {n_delta}"
    assert kept == [2, 2, 1, 2, 1, 1]
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got == [1, 2, 11, 12, 22, 31, 32, 41, 52]

    man = _fold_manifest(index)
    assert man is not None and man["version"] == 3
    assert sorted(man["folded"]) == [f"r{i}" for i in range(1, 7)]
    # three MINOR tiers live (below base_threshold=4, no major yet)
    tiers = _entry_tiers(man["tables"][os.path.abspath(bands_dir)])
    vdirs = sorted(
        d for d in os.listdir(bands_dir) if d.startswith("inc=_foldv")
    )
    assert vdirs == ["inc=_foldv1", "inc=_foldv2", "inc=_foldv3"]
    assert [os.path.basename(e["path"]) for e in tiers] == vdirs
    # the probe for a hypothetical next batch reads ONLY live base tiers
    keys = spark.createDataFrame(
        [(0, a1[:12]), (1, "zzzzzzzzzzzz")], "band_idx int, band_val string"
    )
    committed = _committed_tokens(index)
    delta = [t for t in committed if t not in set(man["folded"])]
    assert delta == []
    probe = _fuzzy_history_probe(spark, index, delta, man, keys)
    files = probe.inputFiles()
    assert files, "probe listed no files"
    for f in files:
        assert "/inc=_foldv" in f and "/inc=r" not in f, (
            f"probe read outside the base tiers: {f}"
        )
    # tiers together hold every seen doc's bands (kept AND dropped):
    # 11 docs x 3
    n = sum(
        spark.read.parquet(os.path.join(bands_dir, v)).count() for v in vdirs
    )
    assert n == 33


def test_fuzzy_major_fold_collapses_tiers(spark, tmp_path):
    """Once base_threshold tiers are live, the next fold is MAJOR: all
    tiers + fresh deltas collapse into ONE base, reference-based GC
    removes tiers neither the new nor the previous manifest references,
    and dedup behavior through the collapsed base is unchanged."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _entry_tiers,
        _fold_manifest,
        _fuzzy_history_probe,
        ingest_increment_fuzzy,
    )

    corpus = os.path.join(tmp_path, "mc")
    index = os.path.join(tmp_path, "mi")
    a1 = _p36("a001 bbb ccc")
    heads = [a1, _p36("b001 ddd eee"), _p36("c001 fff ggg"), _p36("d001 hhh iii")]
    # fold_threshold=1: every increment folds; base_threshold=2: the
    # third fold (and every other one after) is major
    for i, h in enumerate(heads, start=1):
        b = spark.createDataFrame([(i, h)], DOC_SCHEMA)
        ingest_increment_fuzzy(
            spark, b, corpus, index,
            increment_id=f"r{i}", fold_threshold=1, base_threshold=2,
        )
    man = _fold_manifest(index)
    assert man is not None and sorted(man["folded"]) == ["r1", "r2", "r3", "r4"]
    bands_dir = os.path.join(index, "bands")
    tiers = _entry_tiers(man["tables"][os.path.abspath(bands_dir)])
    # folds: r1->v1(minor), r2->v2(minor), r3-> major(v3 = v1+v2+r3),
    # r4->v4(minor) => live tiers [v3, v4]
    assert [os.path.basename(e["path"]) for e in tiers] == [
        "inc=_foldv3",
        "inc=_foldv4",
    ]
    vdirs = sorted(
        (d for d in os.listdir(bands_dir) if d.startswith("inc=_foldv")),
        key=lambda d: int(d.split("v")[-1]),
    )
    # gc_grace (the one-cycle snapshot-lifetime contract): the major
    # fold (v3) kept v1+v2 in its manifest's grace set; the next fold
    # (v4) rotated them out (neither live nor graced) — live dirs are
    # exactly the current manifest's tiers plus nothing stale
    assert vdirs == ["inc=_foldv3", "inc=_foldv4"]
    # all 4 docs' bands live across tiers; a near-dup of doc 1 (folded
    # through the MAJOR tier) is still dropped
    b5 = spark.createDataFrame([(5, a1.replace("a001", "aXX1"))], DOC_SCHEMA)
    assert (
        ingest_increment_fuzzy(
            spark, b5, corpus, index, increment_id="r5", fold_threshold=None
        )
        == 0
    )
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got == [1, 2, 3, 4]


def test_fuzzy_pp_modulus_migration(spark, tmp_path, monkeypatch):
    """ADVICE r12: a persisted index folded under an OLD pp modulus must
    keep finding duplicates after FUZZY_PP_MOD changes — the probe
    prunes each tier with its STORED per-tier modulus, never the
    current global — and the first fold after the change is MAJOR,
    rewriting the whole base under the current modulus."""
    import spark_ss_hudi_delta_poc_spark.streaming.incremental as inc

    corpus = os.path.join(tmp_path, "pc")
    index = os.path.join(tmp_path, "pi")
    a1 = _p36("a001 bbb ccc")
    c1 = _p36("c001 fff ggg")
    # two increments under modulus 64, each folding into its own tier
    monkeypatch.setattr(inc, "FUZZY_PP_MOD", 64)
    for i, h in enumerate([a1, c1], start=1):
        b = spark.createDataFrame([(i, h)], DOC_SCHEMA)
        inc.ingest_increment_fuzzy(
            spark, b, corpus, index, increment_id=f"r{i}", fold_threshold=1
        )
    bands_key = os.path.abspath(os.path.join(index, "bands"))
    man = inc._fold_manifest(index)
    assert [
        t["pp_mod"] for t in inc._entry_tiers(man["tables"][bands_key])
    ] == [64, 64]
    # the deployment bumps the modulus (the r12 64->16 change, replayed)
    monkeypatch.setattr(inc, "FUZZY_PP_MOD", 16)
    # a near-dup of a1 (2 subs in band 1) must be dropped THROUGH the
    # 64-modulus tiers — pruning them with %16 would miss it
    b3 = spark.createDataFrame(
        [(21, a1.replace("a001", "aXX1")), (22, _p36("e001 jjj kkk"))],
        DOC_SCHEMA,
    )
    kept = inc.ingest_increment_fuzzy(
        spark, b3, corpus, index, increment_id="r3", fold_threshold=1
    )
    assert kept == 1
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got == [1, 2, 22]
    # the fold inside that increment was forced MAJOR by the modulus
    # change: one collapsed tier, laid out under the current modulus,
    # holding every seen doc's bands (4 docs x 3 bands)
    man = inc._fold_manifest(index)
    tiers = inc._entry_tiers(man["tables"][bands_key])
    assert [t["pp_mod"] for t in tiers] == [16]
    assert spark.read.parquet(tiers[0]["path"]).count() == 12
    # and a near-dup of c1 still resolves through the rewritten base
    b4 = spark.createDataFrame(
        [(31, c1.replace("c001", "cXX1"))], DOC_SCHEMA
    )
    assert (
        inc.ingest_increment_fuzzy(
            spark, b4, corpus, index, increment_id="r4", fold_threshold=None
        )
        == 0
    )


def test_fuzzy_base_probe_prunes_pp_partition_dirs(spark, tmp_path):
    """VERDICT r11 watch-item: bucketing removes the base probe's
    exchange, the pp=md5(band_val)%FUZZY_PP_MOD hash-prefix partitioning removes
    its I/O — a probe whose batch touches one band value must list
    input files ONLY under that value's pp dir, while other pp dirs
    exist on disk with real files."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _entry_tiers,
        _fold_manifest,
        _fuzzy_history_probe,
        _fuzzy_pp_col,
        ingest_increment_fuzzy,
    )

    corpus = os.path.join(tmp_path, "pc")
    index = os.path.join(tmp_path, "pi")
    heads = ["a001 bbb ccc", "b001 ddd eee", "c001 fff ggg", "d001 hhh iii"]
    b1 = spark.createDataFrame(
        [(i, _p36(h)) for i, h in enumerate(heads[:2], start=1)], DOC_SCHEMA
    )
    b2 = spark.createDataFrame(
        [(10 + i, _p36(h)) for i, h in enumerate(heads[2:], start=1)], DOC_SCHEMA
    )
    assert ingest_increment_fuzzy(spark, b1, corpus, index, increment_id="r1", fold_threshold=2) == 2
    assert ingest_increment_fuzzy(spark, b2, corpus, index, increment_id="r2", fold_threshold=2) == 2
    man = _fold_manifest(index)
    bands_key = os.path.abspath(os.path.join(index, "bands"))
    tiers = _entry_tiers(man["tables"][bands_key]) if man else []
    assert tiers and tiers[-1].get("pp_mod")
    # several distinct pp dirs exist (4 docs x 3 band values each)
    vdir = tiers[-1]["path"]
    pp_dirs = {d for d in os.listdir(vdir) if d.startswith("pp=")}
    assert len(pp_dirs) > 1, f"need multiple pp dirs to prove pruning: {pp_dirs}"

    probe_val = heads[0]  # band 0 value of doc 1
    keys = spark.createDataFrame([(0, probe_val)], "band_idx int, band_val string")
    want_pp = (
        spark.createDataFrame([(probe_val,)], "band_val string")
        .select(_fuzzy_pp_col().alias("pp"))
        .collect()[0]
        .pp
    )
    probe = _fuzzy_history_probe(spark, index, [], man, keys)
    files = probe.inputFiles()
    assert files, "probe listed no files"
    for f in files:
        assert f"/pp={want_pp}/" in f, f"unpruned pp dir read: {f}"
    assert sorted(r.doc_id for r in probe.select("doc_id").collect()) == [1]


def test_fuzzy_fold_crash_heals_at_next_increment(spark, tmp_path, monkeypatch):
    """A crash DURING the base fold (before the manifest flip) cannot
    lose the already-committed increment: the replayed batch is a no-op,
    the next increment probes the un-folded deltas correctly, and its
    own fold re-runs the crashed one's work (DROP + rewrite of the
    never-referenced version) — dedup decisions identical throughout."""
    import pytest

    from spark_ss_hudi_delta_poc_spark.streaming import incremental
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _fold_manifest,
        ingest_increment_fuzzy,
    )

    corpus = os.path.join(tmp_path, "hc")
    index = os.path.join(tmp_path, "hi")
    a1 = _p36("a001 bbb ccc")
    b1 = spark.createDataFrame([(1, a1)], DOC_SCHEMA)
    assert (
        ingest_increment_fuzzy(spark, b1, corpus, index, increment_id="r1", fold_threshold=2)
        == 1
    )

    real_replace = os.replace

    def boom(src, dst):
        if dst.endswith("_manifest.json"):
            raise RuntimeError("injected crash before manifest flip")
        return real_replace(src, dst)

    monkeypatch.setattr(incremental.os, "replace", boom)
    b2 = spark.createDataFrame([(2, _p36("b001 ddd eee"))], DOC_SCHEMA)
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest_increment_fuzzy(spark, b2, corpus, index, increment_id="r2", fold_threshold=2)
    monkeypatch.setattr(incremental.os, "replace", real_replace)
    # the increment itself committed BEFORE the fold crashed
    assert _fold_manifest(index) is None
    assert (
        ingest_increment_fuzzy(spark, b2, corpus, index, increment_id="r2", fold_threshold=2)
        == 0
    )
    # next increment: probes the (still-delta) history, drops a near-dup
    # of r1's doc, and its fold heals the crashed one's debris
    b3 = spark.createDataFrame(
        [(3, a1.replace("a001", "aXX1")), (4, _p36("c001 fff ggg"))], DOC_SCHEMA
    )
    assert (
        ingest_increment_fuzzy(spark, b3, corpus, index, increment_id="r3", fold_threshold=2)
        == 1
    )
    man = _fold_manifest(index)
    assert man is not None and sorted(man["folded"]) == ["r1", "r2", "r3"]
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got == [1, 2, 4]


def test_fuzzy_ingest_rejects_out_of_order_ids(spark, tmp_path):
    """ADVICE r11: the drop rule's batch-oracle equivalence requires
    id-ordered arrival — a batch whose min id does not exceed every
    committed increment's high-watermark raises instead of silently
    diverging; a replayed committed increment still short-circuits
    BEFORE the guard."""
    import pytest

    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_fuzzy,
    )

    corpus = os.path.join(tmp_path, "oc")
    index = os.path.join(tmp_path, "oi")
    b1 = spark.createDataFrame([(5, _p36("a001 bbb ccc"))], DOC_SCHEMA)
    assert ingest_increment_fuzzy(spark, b1, corpus, index, increment_id="r1") == 1
    # replay of the SAME increment: marker short-circuit, no guard trip
    assert ingest_increment_fuzzy(spark, b1, corpus, index, increment_id="r1") == 0
    late = spark.createDataFrame([(5, _p36("b001 ddd eee"))], DOC_SCHEMA)
    with pytest.raises(ValueError, match="id-ordered"):
        ingest_increment_fuzzy(spark, late, corpus, index, increment_id="r2")
    ok = spark.createDataFrame([(6, _p36("b001 ddd eee"))], DOC_SCHEMA)
    assert ingest_increment_fuzzy(spark, ok, corpus, index, increment_id="r2") == 1


def test_exact_ingest_folds_bound_dirs_and_stay_exact(spark, tmp_path):
    """VERDICT r11 #3 (exact ingest): with fold_threshold=2, the seen
    and corpus inc-dir counts stay bounded across 5 increments (deltas
    fold into a hash-bucketed seen base + one compacted corpus dir), a
    doc exactly matching FOLDED history is still dropped, whole-dir
    corpus reads and the manifest-resolved listing agree, and a
    replayed increment is still a no-op."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _fold_manifest,
        _live_table_dirs,
        ingest_increment,
    )

    corpus = os.path.join(tmp_path, "xc")
    seen = os.path.join(tmp_path, "xs")
    incs = [
        [(1, "alpha"), (2, "beta")],
        [(11, "gamma")],
        [(21, "alpha"), (22, "delta")],  # 'alpha' lives in the folded base
        [(31, "epsilon")],
        [(41, "gamma"), (42, "zeta")],  # 'gamma' folded by now
    ]
    got_n = []
    for i, rows in enumerate(incs, start=1):
        b = spark.createDataFrame(rows, DOC_SCHEMA)
        got_n.append(
            ingest_increment(
                spark, b, corpus, seen, increment_id=f"r{i}", fold_threshold=2
            )
        )
        for root in (corpus, seen):
            n_delta = len(
                [
                    d
                    for d in os.listdir(root)
                    if d.startswith("inc=") and not d.startswith("inc=_foldv")
                ]
            )
            assert n_delta < 3, f"{root} delta dirs not bounded: {n_delta}"
    assert got_n == [2, 1, 1, 1, 1]
    man = _fold_manifest(seen)
    assert man is not None and man["version"] == 2
    assert sorted(man["folded"]) == ["r1", "r2", "r3", "r4"]
    whole = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert whole == [1, 2, 11, 22, 31, 42]
    via_manifest = sorted(
        r.doc_id
        for r in spark.read.parquet(*_live_table_dirs(seen, corpus)).collect()
    )
    assert via_manifest == whole
    # replay after folding: marker short-circuit unaffected
    b5 = spark.createDataFrame(incs[4], DOC_SCHEMA)
    assert ingest_increment(spark, b5, corpus, seen, increment_id="r5", fold_threshold=2) == 0


def test_neardup_ingest_folds_bound_dirs_and_stay_exact(spark, tmp_path):
    """VERDICT r11 #3 (minhash-LSH ingest): with fold_threshold=2 the
    buckets/shingles/corpus dir counts stay bounded across 5
    increments, near-dups of FOLDED history are still dropped (the
    probe reads the bucketed base ∪ deltas), and dedup decisions equal
    the unfolded run's."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _fold_manifest,
        ingest_increment_neardup,
    )

    corpus = os.path.join(tmp_path, "nc")
    index = os.path.join(tmp_path, "ni")
    base = "the quick brown fox jumps over the lazy dog again and again today"
    other = "spark engines shuffle partitions across executors while planning adaptive queries"
    s4 = "completely different words with no overlap at all in this sentence here"
    s5 = "seven bright lanterns float quietly above the harbor during the autumn festival"
    s6 = "metrics dashboards aggregate latency percentiles for every service tier nightly"
    incs = [
        [(1, base), (2, s4)],
        [(11, other)],
        # near-dup of base (folded into the v1 base by now) -> dropped
        [(21, base.replace("today", "tomorrow")), (22, s5)],
        # near-dup of other (folded) -> dropped
        [(31, other.replace("queries", "plans")), (32, s6)],
        # near-dup of s5 (folded in v2) -> dropped
        [(41, s5.replace("autumn", "spring"))],
    ]
    got_n = []
    for i, rows in enumerate(incs, start=1):
        b = spark.createDataFrame(rows, DOC_SCHEMA)
        got_n.append(
            ingest_increment_neardup(
                spark, b, corpus, index, increment_id=f"r{i}", fold_threshold=2
            )
        )
        for sub in ("buckets", "shingles"):
            root = os.path.join(index, sub)
            n_delta = len(
                [
                    d
                    for d in os.listdir(root)
                    if d.startswith("inc=") and not d.startswith("inc=_foldv")
                ]
            )
            assert n_delta < 3, f"{sub} delta dirs not bounded: {n_delta}"
    assert got_n == [2, 1, 1, 1, 0]
    man = _fold_manifest(index)
    assert man is not None and man["version"] == 2
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got == [1, 2, 11, 22, 32]
    # replay after folding is still a no-op
    b3 = spark.createDataFrame(incs[2], DOC_SCHEMA)
    assert (
        ingest_increment_neardup(spark, b3, corpus, index, increment_id="r3", fold_threshold=2)
        == 0
    )


def test_fold_heals_interrupted_delta_gc(spark, tmp_path):
    """Review r12: a crash mid-way through the post-flip delta GC
    leaves inc=<token> dirs whose tokens the manifest marks folded —
    without the ingest-time heal they would be double-counted by
    whole-dir parquet reads FOREVER (vacuum skips committed tokens, the
    next fold's fresh-list excludes them).  Simulate the debris and pin
    that the next increment removes it and the whole-dir read is
    duplicate-free."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _fold_manifest,
        ingest_increment,
    )

    corpus = os.path.join(tmp_path, "gc")
    seen = os.path.join(tmp_path, "gs")
    b1 = spark.createDataFrame([(1, "alpha")], DOC_SCHEMA)
    b2 = spark.createDataFrame([(2, "beta")], DOC_SCHEMA)
    assert ingest_increment(spark, b1, corpus, seen, increment_id="r1", fold_threshold=2) == 1
    assert ingest_increment(spark, b2, corpus, seen, increment_id="r2", fold_threshold=2) == 1
    man = _fold_manifest(seen)
    assert man is not None and sorted(man["folded"]) == ["r1", "r2"]
    # resurrect a folded increment's dir (crash-mid-GC debris): its rows
    # now exist BOTH here and in inc=_foldv1
    debris = os.path.join(corpus, "inc=r1")
    spark.createDataFrame([(1, "alpha")], DOC_SCHEMA).write.mode("overwrite").parquet(debris)
    assert spark.read.parquet(corpus).count() == 3  # double-counted!
    # the next increment's heal step removes the debris before probing
    b3 = spark.createDataFrame([(3, "gamma")], DOC_SCHEMA)
    assert ingest_increment(spark, b3, corpus, seen, increment_id="r3", fold_threshold=2) == 1
    assert not os.path.isdir(debris)
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got == [1, 2, 3]


def test_fold_crash_before_manifest_flip_heals(spark, tmp_path, monkeypatch):
    """A crash during fold_committed_incs BEFORE the manifest flip
    cannot affect readers (previous manifest + live deltas intact); the
    next increment's fold re-runs the work and the folded state matches
    the crash-free run."""
    import pytest

    from spark_ss_hudi_delta_poc_spark.streaming import incremental
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _fold_manifest,
        ingest_increment,
    )

    corpus = os.path.join(tmp_path, "cc")
    seen = os.path.join(tmp_path, "cs")
    b1 = spark.createDataFrame([(1, "alpha")], DOC_SCHEMA)
    assert ingest_increment(spark, b1, corpus, seen, increment_id="r1", fold_threshold=2) == 1

    real_replace = os.replace

    def boom(src, dst):
        if dst.endswith("_fold_manifest.json"):
            raise RuntimeError("injected crash before fold flip")
        return real_replace(src, dst)

    monkeypatch.setattr(incremental.os, "replace", boom)
    b2 = spark.createDataFrame([(2, "beta")], DOC_SCHEMA)
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest_increment(spark, b2, corpus, seen, increment_id="r2", fold_threshold=2)
    monkeypatch.setattr(incremental.os, "replace", real_replace)
    # the increment committed before the fold crashed; no fold visible
    assert _fold_manifest(seen) is None
    assert ingest_increment(spark, b2, corpus, seen, increment_id="r2", fold_threshold=2) == 0
    # next increment dedups against the (still-delta) history, then its
    # fold heals the crashed one's debris
    b3 = spark.createDataFrame([(3, "alpha"), (4, "gamma")], DOC_SCHEMA)
    assert ingest_increment(spark, b3, corpus, seen, increment_id="r3", fold_threshold=2) == 1
    man = _fold_manifest(seen)
    assert man is not None and sorted(man["folded"]) == ["r1", "r2", "r3"]
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got == [1, 2, 4]


def test_every_cross_run_ingest_folds_bound_dirs_and_stay_exact(spark, tmp_path):
    """VERDICT r11 #3, full family sweep: for EVERY cross-run ingest the
    concat-fold (fold_threshold=2) must (a) keep every table's delta-dir
    count < threshold+1 after every increment, (b) produce a final
    corpus identical to the fold-disabled run's, and (c) keep the
    replay short-circuit intact after folding."""
    from spark_ss_hudi_delta_poc_spark.streaming import incremental as inc

    body = "the quick brown fox jumps over the lazy dog " * 4
    docs = [
        (1, body),
        (2, " ".join(f"fresh{i} material{i}" for i in range(30))),
        (3, "breaking news update " + body),  # winnow: partial copy of 1
        (4, " ".join(f"novel{i} text{i}" for i in range(30))),
        (5, " ".join(f"other{i} words{i}" for i in range(30))),
        (6, body),  # exact/segment repeat of 1
    ]
    batches = [docs[0:2], docs[2:4], docs[4:5], docs[5:6]]

    def run(name, ingest, fold_threshold, tables_of):
        root = os.path.join(tmp_path, f"{name}-{fold_threshold}")
        corpus = os.path.join(root, "corpus")
        aux = os.path.join(root, "aux")
        for i, rows in enumerate(batches, start=1):
            b = spark.createDataFrame(rows, DOC_SCHEMA)
            ingest(b, corpus, aux, f"r{i}", fold_threshold)
            if fold_threshold is not None:
                for t in tables_of(corpus, aux):
                    if not os.path.isdir(t):
                        continue
                    n_delta = len(
                        [
                            d
                            for d in os.listdir(t)
                            if d.startswith("inc=") and not d.startswith("inc=_foldv")
                        ]
                    )
                    assert n_delta < 3, f"{name}:{t} delta dirs not bounded: {n_delta}"
        # replay of the last increment is still a no-op after folding
        b_last = spark.createDataFrame(batches[-1], DOC_SCHEMA)
        assert ingest(b_last, corpus, aux, f"r{len(batches)}", fold_threshold) == 0
        return sorted(
            tuple(r) for r in spark.read.parquet(corpus).select("doc_id").collect()
        )

    cases = {
        "segments": (
            lambda b, c, a, t, f: inc.ingest_increment_segments(
                spark, b, c, a, increment_id=t, fold_threshold=f
            ),
            lambda c, a: [c, a],
        ),
        "winnow": (
            lambda b, c, a, t, f: inc.ingest_increment_winnow(
                spark, b, c, a, increment_id=t, fold_threshold=f
            ),
            lambda c, a: [c, a],
        ),
        "contamination": (
            lambda b, c, a, t, f: inc.ingest_increment_contamination(
                spark,
                b,
                c,
                spark.createDataFrame([(999, "held out benchmark text")], DOC_SCHEMA),
                increment_id=t,
                fold_threshold=f,
            ),
            lambda c, a: [c],
        ),
        "bloom": (
            lambda b, c, a, t, f: inc.ingest_increment_bloom(
                spark, b, c, a, a + "_bits", increment_id=t, fold_threshold=f
            ),
            lambda c, a: [c, a, a + "_bits"],
        ),
    }
    for name, (ingest, tables_of) in cases.items():
        folded = run(name, ingest, 2, tables_of)
        plain = run(name, ingest, None, tables_of)
        assert folded == plain, f"{name}: folded run diverged from plain run"


def test_embedding_phash_hll_ingests_fold_and_stay_exact(spark, tmp_path):
    """Same family sweep for the non-text ingests (embedding vectors,
    media payloads, HLL registers) — fold run == plain run, dirs
    bounded, replay intact."""
    from spark_ss_hudi_delta_poc_spark.streaming import incremental as inc

    def check_dirs(ts):
        for t in ts:
            if not os.path.isdir(t):
                continue
            n_delta = len(
                [
                    d
                    for d in os.listdir(t)
                    if d.startswith("inc=") and not d.startswith("inc=_foldv")
                ]
            )
            assert n_delta < 3, f"{t} delta dirs not bounded: {n_delta}"

    # embedding (the module-level _unit zero-pads to the fixed 64-dim
    # hyperplane space)
    EMB = EMB_SCHEMA
    ebatches = [
        [(1, _unit([1.0, 0.2, 0.1, 0.0])), (2, _unit([0.0, 1.0, 0.0, 0.3]))],
        [(3, _unit([1.0, 0.21, 0.1, 0.0])), (4, _unit([0.0, 0.0, 0.1, -1.0]))],
        [(5, _unit([0.3, -1.0, 0.2, 0.0]))],
        [(6, _unit([0.0, 1.0, 0.01, 0.3]))],
    ]

    def run_emb(f):
        root = os.path.join(tmp_path, f"emb-{f}")
        c, a = os.path.join(root, "c"), os.path.join(root, "i")
        for i, rows in enumerate(ebatches, start=1):
            inc.ingest_increment_embedding(
                spark, spark.createDataFrame(rows, EMB), c, a,
                increment_id=f"r{i}", fold_threshold=f,
            )
            if f is not None:
                check_dirs([c, a])
        return sorted(r.vec_id for r in spark.read.parquet(c).collect())

    assert run_emb(2) == run_emb(None)

    # phash
    MEDIA = "doc_id long, payload binary"
    base = ("the quick brown fox jumps over the lazy dog and keeps running far " * 3).encode()
    pbatches = [
        [(1, base), (2, (" ".join(f"fresh{i} material{i}" for i in range(30))).encode())],
        [(3, base.replace(b"lazy", b"hazy")), (4, (" ".join(f"novel{i} text{i}" for i in range(30))).encode())],
        [(5, (" ".join(f"other{i} words{i}" for i in range(30))).encode())],
    ]

    def run_ph(f):
        root = os.path.join(tmp_path, f"ph-{f}")
        c, a = os.path.join(root, "c"), os.path.join(root, "i")
        for i, rows in enumerate(pbatches, start=1):
            inc.ingest_increment_phash(
                spark, spark.createDataFrame(rows, MEDIA), c, a,
                increment_id=f"r{i}", fold_threshold=f,
            )
            if f is not None:
                check_dirs([c, a])
        return sorted(r.doc_id for r in spark.read.parquet(c).collect())

    assert run_ph(2) == run_ph(None)

    # hll: compare the merged registers (the sketch IS the state)
    def run_hll(f):
        root = os.path.join(tmp_path, f"hll-{f}")
        s = os.path.join(root, "sk")
        for i in range(1, 5):
            b = spark.createDataFrame(
                [(j, f"key{j % 40}") for j in range(i * 10, i * 10 + 10)],
                "doc_id long, text string",
            )
            inc.ingest_increment_hll(spark, b, s, "text", increment_id=f"r{i}", fold_threshold=f)
            if f is not None:
                check_dirs([s])
        return sorted(
            tuple(r) for r in inc.hll_merged_registers(spark, s).collect()
        )

    assert run_hll(2) == run_hll(None)


def test_ingest_increment_bottomk_equals_batch_at_any_split(spark, tmp_path):
    """The bottom-k merge identity: the maintained sample equals the
    one-shot batch bottom-k regardless of how rows split into
    increments, and ELEVEN increments pin the numeric-aware newest-token
    rule (lexicographic max would pick '9' over '10')."""
    from pyspark.sql import functions as F

    from spark_ss_hudi_delta_poc_spark.functions.hashing import md5_long
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_bottomk,
        latest_bottomk_dir,
    )

    rows = [(i, f"doc {i}") for i in range(220)]
    want = sorted(
        (r.doc_id for r in (
            spark.createDataFrame(rows, DOC_SCHEMA)
            .select("doc_id", md5_long(F.col("doc_id")).alias("p"))
            .orderBy("p", "doc_id").limit(10).collect()
        ))
    )

    for tag, chunks in (
        ("even", [rows[i::2] for i in range(2)]),
        ("eleven", [rows[i * 20:(i + 1) * 20] for i in range(11)]),
    ):
        state = os.path.join(tmp_path, f"bk_{tag}")
        for e, chunk in enumerate(chunks):
            batch = spark.createDataFrame(chunk, DOC_SCHEMA)
            ingest_increment_bottomk(spark, batch, state, 10, increment_id=e)
        got = sorted(
            r.doc_id for r in spark.read.parquet(latest_bottomk_dir(state)).collect()
        )
        assert got == want, tag


def test_ingest_increment_bottomk_replay_and_crash_heal(spark, tmp_path, monkeypatch):
    """A committed replay is a no-op; a crash before the marker leaves
    the PREVIOUS state live, and the replayed increment completes."""
    import pytest

    from spark_ss_hudi_delta_poc_spark.streaming import incremental
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_bottomk,
        latest_bottomk_dir,
    )

    state = os.path.join(tmp_path, "bk")
    b1 = spark.createDataFrame([(i, f"d{i}") for i in range(50)], DOC_SCHEMA)
    b2 = spark.createDataFrame([(100 + i, f"e{i}") for i in range(50)], DOC_SCHEMA)
    assert ingest_increment_bottomk(spark, b1, state, 5, increment_id=0) == 5
    s1 = sorted(r.doc_id for r in spark.read.parquet(latest_bottomk_dir(state)).collect())

    real = incremental._write_marker

    def boom(*a, **kw):
        raise RuntimeError("injected crash before marker")

    monkeypatch.setattr(incremental, "_write_marker", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest_increment_bottomk(spark, b2, state, 5, increment_id=1)
    # previous state still live (the half-written inc=1 is uncommitted)
    assert latest_bottomk_dir(state).endswith("inc=0")
    assert sorted(
        r.doc_id for r in spark.read.parquet(latest_bottomk_dir(state)).collect()
    ) == s1
    monkeypatch.setattr(incremental, "_write_marker", real)
    assert ingest_increment_bottomk(spark, b2, state, 5, increment_id=1) == 5
    assert latest_bottomk_dir(state).endswith("inc=1")
    # replay: no-op
    assert ingest_increment_bottomk(spark, b2, state, 5, increment_id=1) == 0


def test_ingest_increment_bottomk_default_tokens_and_pruning(spark, tmp_path):
    """Default (no increment_id) tokens are zero-padded commit-sequence
    numbers — content digests order arbitrarily and the replace-style
    state would resolve 'newest' to a stale sample (review r11) — and
    superseded committed state dirs are pruned, so disk state after N
    increments is exactly ONE n-row dir."""
    import os

    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_bottomk,
        latest_bottomk_dir,
    )

    state = os.path.join(tmp_path, "bk_seq")
    # deliberately varying batch sizes: content tokens would order by
    # (len, lex) = row count, not commit order
    sizes = [200, 90, 40]
    seen = []
    for base, size in zip((0, 1000, 2000), sizes):
        rows = [(base + i, f"d{base + i}") for i in range(size)]
        seen += rows
        batch = spark.createDataFrame(rows, DOC_SCHEMA)
        ingest_increment_bottomk(spark, batch, state, 8)
    assert latest_bottomk_dir(state).endswith("inc=000000002")
    incs = [d for d in os.listdir(state) if d.startswith("inc=")]
    assert incs == ["inc=000000002"], incs  # superseded states pruned
    # and the sample is the global bottom-k over everything seen
    from pyspark.sql import functions as F

    from spark_ss_hudi_delta_poc_spark.functions.hashing import md5_long

    want = sorted(
        r.doc_id
        for r in spark.createDataFrame(seen, DOC_SCHEMA)
        .select("doc_id", md5_long(F.col("doc_id")).alias("p"))
        .orderBy("p", "doc_id")
        .limit(8)
        .collect()
    )
    got = sorted(r.doc_id for r in spark.read.parquet(latest_bottomk_dir(state)).collect())
    assert got == want


SRC_DOC_SCHEMA = "doc_id long, text string, source string"


def test_ingest_increment_source_counts_equals_batch_at_any_split(spark, tmp_path):
    """Per-source sums are merge-associative: the maintained count table
    equals a one-shot batch aggregate regardless of how rows split into
    increments (q106's invariance)."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_source_counts,
        latest_bottomk_dir,
    )

    rows = [(i, " ".join(["w"] * (1 + i % 7)), f"s{i % 3}") for i in range(90)]
    want = {
        (r.source, r.source_tokens)
        for r in (
            spark.createDataFrame(rows, SRC_DOC_SCHEMA)
            .selectExpr("source", "CAST(size(split(text, ' ')) AS LONG) AS t")
            .groupBy("source")
            .agg({"t": "sum"})
            .withColumnRenamed("sum(t)", "source_tokens")
            .collect()
        )
    }
    for tag, chunks in (
        ("thirds", [rows[i::3] for i in range(3)]),
        ("uneven", [rows[:70], rows[70:71], rows[71:]]),
    ):
        state = os.path.join(tmp_path, f"sc_{tag}")
        for e, chunk in enumerate(chunks):
            ingest_increment_source_counts(
                spark,
                spark.createDataFrame(chunk, SRC_DOC_SCHEMA),
                state,
                increment_id=e,
            )
        got = {
            (r.source, r.source_tokens)
            for r in spark.read.parquet(latest_bottomk_dir(state)).collect()
        }
        assert got == want, tag


def test_ingest_increment_source_counts_replay_crash_and_pruning(
    spark, tmp_path, monkeypatch
):
    """Committed replay is a no-op; a crash before the marker leaves the
    previous counts live; superseded committed states are pruned so disk
    state stays one catalog-sized dir."""
    import pytest

    from spark_ss_hudi_delta_poc_spark.streaming import incremental
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_source_counts,
        latest_bottomk_dir,
    )

    state = os.path.join(tmp_path, "sc")
    b1 = spark.createDataFrame([(1, "a b", "x"), (2, "c", "y")], SRC_DOC_SCHEMA)
    b2 = spark.createDataFrame([(3, "d e f", "x")], SRC_DOC_SCHEMA)
    assert ingest_increment_source_counts(spark, b1, state, increment_id=0) == 2
    s1 = {
        (r.source, r.source_tokens)
        for r in spark.read.parquet(latest_bottomk_dir(state)).collect()
    }
    assert s1 == {("x", 2), ("y", 1)}

    real = incremental._write_marker

    def boom(*a, **kw):
        raise RuntimeError("injected crash before marker")

    monkeypatch.setattr(incremental, "_write_marker", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest_increment_source_counts(spark, b2, state, increment_id=1)
    assert latest_bottomk_dir(state).endswith("inc=0")
    monkeypatch.setattr(incremental, "_write_marker", real)
    assert ingest_increment_source_counts(spark, b2, state, increment_id=1) == 2
    got = {
        (r.source, r.source_tokens)
        for r in spark.read.parquet(latest_bottomk_dir(state)).collect()
    }
    assert got == {("x", 5), ("y", 1)}
    # replay no-op + superseded pruning
    assert ingest_increment_source_counts(spark, b2, state, increment_id=1) == 0
    incs = [d for d in os.listdir(state) if d.startswith("inc=")]
    assert incs == ["inc=1"], incs


def test_fuzzy_ingest_crash_sweep_every_commit_point(spark, tmp_path, monkeypatch):
    """Systematic durability sweep: EVERY marker/manifest commit in a
    4-increment fuzzy run (increment markers, fuzzy-base manifest
    flips, generic fold-manifest flips — all funnel through
    _atomic_write_json's os.replace) gets a crash injected at exactly
    that point in its own fresh run; the crashed increment is then
    replayed once (the foreachBatch restart model) and the stream runs
    to completion.  The final manifest-resolved corpus must equal the
    crash-free run's at every injection point — no decision may depend
    on WHERE between two commit points the process died."""
    from spark_ss_hudi_delta_poc_spark.streaming import incremental
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _live_table_dirs,
        ingest_increment_fuzzy,
    )

    a1 = _p36("a001 bbb ccc")
    c1 = _p36("c001 fff ggg")
    incs = [
        [(1, a1), (2, _p36("b001 ddd eee"))],
        [(11, c1)],  # fold #1 fires here (threshold 2)
        # near-dup of a1 — must drop through the folded tier
        [(21, a1.replace("a001", "aXX1")), (22, _p36("d001 hhh iii"))],
        # near-dup of c1 — ditto; fold #2 fires here
        [(31, c1.replace("c001", "cXX1")), (32, _p36("e001 jjj kkk"))],
    ]

    real_replace = os.replace

    def run(tag: str, inject_at: int | None):
        corpus = os.path.join(tmp_path, f"{tag}_c")
        index = os.path.join(tmp_path, f"{tag}_i")
        calls = {"n": 0}
        armed = {"on": inject_at is not None}

        def wrapped(src, dst):
            k = calls["n"]
            calls["n"] += 1
            if armed["on"] and k == inject_at:
                armed["on"] = False  # single-shot: the process "died" once
                raise RuntimeError("injected crash")
            return real_replace(src, dst)

        monkeypatch.setattr(incremental.os, "replace", wrapped)
        try:
            for i, rows in enumerate(incs, start=1):
                b = spark.createDataFrame(rows, DOC_SCHEMA)
                try:
                    ingest_increment_fuzzy(
                        spark, b, corpus, index,
                        increment_id=f"r{i}", fold_threshold=2,
                    )
                except RuntimeError as e:
                    assert "injected crash" in str(e)
                    # restart: replay the SAME batch id once
                    ingest_increment_fuzzy(
                        spark, b, corpus, index,
                        increment_id=f"r{i}", fold_threshold=2,
                    )
        finally:
            monkeypatch.setattr(incremental.os, "replace", real_replace)
        got = sorted(
            r.doc_id
            for r in spark.read.parquet(*_live_table_dirs(index, corpus)).collect()
        )
        return got, calls["n"]

    want, n_points = run("ref", None)
    assert want == [1, 2, 11, 22, 32]
    assert n_points >= 6, f"expected every commit instrumented, saw {n_points}"
    for k in range(n_points):
        got, _ = run(f"k{k}", k)
        assert got == want, f"crash at commit point {k} changed the corpus: {got}"


DSIR_DOC_SCHEMA = "doc_id long, text string, lang string"


def test_ingest_increment_dsir_equals_batch_at_any_split(spark, tmp_path):
    """q107's invariance: per-bucket gram counts are merge-associative,
    so the recipe rematerialized from the maintained state equals the
    one-shot batch dsir_importance_filter EXACTLY (ids, n_grams,
    score_e9 and keep), regardless of how rows split into increments;
    and the generic fold keeps the feature-table delta dirs bounded."""
    from spark_ss_hudi_delta_poc_spark.operators.curation import (
        dsir_importance_filter,
    )
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        dsir_recipe_from_state,
        ingest_increment_dsir,
    )

    rows = [
        (
            i,
            f"alpha beta w{i % 11} gamma w{(i * 7) % 13} delta",
            "en" if i % 3 else "de",
        )
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, DSIR_DOC_SCHEMA)
    want = {tuple(r) for r in dsir_importance_filter(docs).collect()}
    assert len(want) == 60 and any(r[3] for r in want)
    for tag, chunks in (
        ("thirds", [rows[i::3] for i in range(3)]),
        ("uneven", [rows[:40], rows[40:41], rows[41:]]),
    ):
        state = os.path.join(tmp_path, f"ds_{tag}")
        for e, chunk in enumerate(chunks):
            ingest_increment_dsir(
                spark,
                spark.createDataFrame(chunk, DSIR_DOC_SCHEMA),
                state,
                increment_id=e,
                fold_threshold=2,
            )
        got = {tuple(r) for r in dsir_recipe_from_state(spark, state).collect()}
        assert got == want, tag
        fd = os.path.join(state, "doc_feats")
        n_delta = len(
            [
                d
                for d in os.listdir(fd)
                if d.startswith("inc=") and not d.startswith("inc=_foldv")
            ]
        )
        assert n_delta < 3, f"{tag}: feature delta dirs not bounded: {n_delta}"


def test_ingest_increment_dsir_crash_replay_and_pruning(spark, tmp_path, monkeypatch):
    """The single marker is the commit point for BOTH state tables: a
    crash before it leaves the previous recipe live (counts AND
    features), the deterministic replay heals, a committed replay is a
    no-op, and superseded counts dirs are pruned while their markers
    persist for the feature-fold protocol."""
    import pytest

    from spark_ss_hudi_delta_poc_spark.operators.curation import (
        dsir_importance_filter,
    )
    from spark_ss_hudi_delta_poc_spark.streaming import incremental
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _commits_dir,
        dsir_recipe_from_state,
        ingest_increment_dsir,
    )

    rows = [
        (i, f"tok{i % 5} common tok{(i * 3) % 7}", "en" if i % 2 else "fr")
        for i in range(20)
    ]
    b1 = spark.createDataFrame(rows[:12], DSIR_DOC_SCHEMA)
    b2 = spark.createDataFrame(rows[12:], DSIR_DOC_SCHEMA)
    state = os.path.join(tmp_path, "ds")
    assert ingest_increment_dsir(spark, b1, state, increment_id=0) > 0
    recipe1 = {tuple(r) for r in dsir_recipe_from_state(spark, state).collect()}
    assert recipe1 == {
        tuple(r) for r in dsir_importance_filter(b1).collect()
    }

    real = incremental._write_marker

    def boom(*a, **kw):
        raise RuntimeError("injected crash before marker")

    monkeypatch.setattr(incremental, "_write_marker", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest_increment_dsir(spark, b2, state, increment_id=1)
    # both tables still resolve to the pre-crash increment
    assert {
        tuple(r) for r in dsir_recipe_from_state(spark, state).collect()
    } == recipe1
    monkeypatch.setattr(incremental, "_write_marker", real)

    assert ingest_increment_dsir(spark, b2, state, increment_id=1) > 0
    want = {
        tuple(r)
        for r in dsir_importance_filter(
            spark.createDataFrame(rows, DSIR_DOC_SCHEMA)
        ).collect()
    }
    assert {
        tuple(r) for r in dsir_recipe_from_state(spark, state).collect()
    } == want
    # committed replay is a no-op
    assert ingest_increment_dsir(spark, b2, state, increment_id=1) == 0
    # superseded counts dirs pruned; markers persist for the fold layer
    counts_incs = sorted(os.listdir(os.path.join(state, "counts")))
    assert counts_incs == ["inc=1"], counts_incs
    assert sorted(os.listdir(_commits_dir(state))) == ["0", "1"]


def test_fuzzy_legacy_base_adoption(spark, tmp_path):
    """A pre-r13 index (band base under band_base/v=N with its own
    manifest protocol) is adopted onto the unified fold layer by the
    first increment that touches it: the legacy tiers are rewritten as
    ordinary inc=_foldv tiers under the CURRENT spec, the legacy folded
    set joins the generic manifest, dedup through the adopted base
    still works, and the band_base dir (incl. its metastore tables) is
    cleaned up."""
    import hashlib
    import shutil

    from pyspark.sql import functions as F

    import spark_ss_hudi_delta_poc_spark.streaming.incremental as inc

    corpus = os.path.join(tmp_path, "lc")
    index = os.path.join(tmp_path, "li")
    a1 = _p36("a001 bbb ccc")
    # 1) a real committed increment, hand-folded into the LEGACY
    # band_base layout exactly as pre-r13 code laid it out (pp_mod 64,
    # the pre-r12 modulus, to exercise the stored-modulus handling too)
    b1 = spark.createDataFrame([(1, a1)], DOC_SCHEMA)
    assert (
        inc.ingest_increment_fuzzy(
            spark, b1, corpus, index, increment_id="r1", fold_threshold=None
        )
        == 1
    )
    bands_dir = os.path.join(index, "bands")
    src = spark.read.parquet(os.path.join(bands_dir, "inc=r1"))
    base_dir = os.path.join(index, "band_base")
    vdir = os.path.join(base_dir, "v=1")
    digest = hashlib.md5(os.path.abspath(index).encode()).hexdigest()[:12]
    table = f"fzb_{digest}_v1"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        src.withColumn("pp", inc._fuzzy_pp_col(64))
        .repartition(16, F.col("band_idx"), F.col("band_val"))
        .write.mode("overwrite")
        .option("path", vdir)
        .partitionBy("pp")
        .bucketBy(16, "band_idx", "band_val")
        .sortBy("band_idx", "band_val")
        .saveAsTable(table)
    )
    legacy = {
        "version": 1,
        "folded": ["r1"],
        "table": table,
        "path": vdir,
        "bases": [{"table": table, "path": vdir, "pp_mod": 64}],
        "n_buckets": 16,
        "schema": [
            [f.name, f.dataType.simpleString()]
            for f in spark.table(table).schema.fields
        ],
        "pp_mod": 64,
        "retired": None,
    }
    inc._atomic_write_json(os.path.join(base_dir, "_manifest.json"), legacy)
    shutil.rmtree(os.path.join(bands_dir, "inc=r1"))
    # 2) the next increment adopts the legacy base: a near-dup of the
    # legacy-folded doc must still be dropped (through the rewritten
    # tier), and the legacy protocol's artifacts are gone
    b2 = spark.createDataFrame(
        [(2, a1.replace("a001", "aXX1")), (3, _p36("b001 ddd eee"))],
        DOC_SCHEMA,
    )
    assert (
        inc.ingest_increment_fuzzy(
            spark, b2, corpus, index, increment_id="r2", fold_threshold=None
        )
        == 1
    )
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got == [1, 3]
    man = inc._fold_manifest(index)
    tiers = inc._entry_tiers(man["tables"][os.path.abspath(bands_dir)])
    # adoption rewrites onto the CURRENT layout (modulus 16), so no
    # later modulus-triggered major fold is pending
    assert len(tiers) == 1 and tiers[0]["pp_mod"] == inc.FUZZY_PP_MOD
    assert "r1" in man["folded"]
    assert not os.path.isdir(base_dir)
    assert not spark.catalog.tableExists(table)


def test_ingest_increment_drift_counts_equals_batch_at_any_split(
    spark, tmp_path, monkeypatch
):
    """q109's invariance: per-(type, second) counts are the drift
    panel's minimal sufficient statistic and merge-associative, so the
    panel recomputed from maintained state equals the one-shot batch
    category_drift at any micro-batch split; plus the replace-state
    replay/crash/pruning contract."""
    import datetime as dt

    import pytest

    from spark_ss_hudi_delta_poc_spark.operators.profiling import (
        category_drift,
        category_drift_from_counts,
    )
    from spark_ss_hudi_delta_poc_spark.streaming import incremental
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_drift_counts,
        latest_bottomk_dir,
    )

    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        (("click", "view", "purchase")[i % 3], t0 + dt.timedelta(seconds=7 * i))
        for i in range(90)
    ]
    schema = "event_type string, ts timestamp"
    events = spark.createDataFrame(rows, schema)
    want = {tuple(r) for r in category_drift(events).collect()}
    assert len(want) == 6  # 3 types x 2 halves
    for tag, chunks in (
        ("thirds", [rows[i::3] for i in range(3)]),
        ("uneven", [rows[:70], rows[70:71], rows[71:]]),
    ):
        state = os.path.join(tmp_path, f"dc_{tag}")
        for e, chunk in enumerate(chunks):
            ingest_increment_drift_counts(
                spark,
                spark.createDataFrame(chunk, schema),
                state,
                increment_id=e,
            )
        counts = spark.read.parquet(latest_bottomk_dir(state))
        got = {tuple(r) for r in category_drift_from_counts(counts).collect()}
        assert got == want, tag

    # crash before marker leaves the previous state live; replay heals;
    # committed replay is a no-op; superseded states pruned
    state = os.path.join(tmp_path, "dc_crash")
    ingest_increment_drift_counts(
        spark, spark.createDataFrame(rows[:45], schema), state, increment_id=0
    )
    real = incremental._write_marker

    def boom(*a, **kw):
        raise RuntimeError("injected crash before marker")

    monkeypatch.setattr(incremental, "_write_marker", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest_increment_drift_counts(
            spark, spark.createDataFrame(rows[45:], schema), state, increment_id=1
        )
    assert latest_bottomk_dir(state).endswith("inc=0")
    monkeypatch.setattr(incremental, "_write_marker", real)
    ingest_increment_drift_counts(
        spark, spark.createDataFrame(rows[45:], schema), state, increment_id=1
    )
    counts = spark.read.parquet(latest_bottomk_dir(state))
    assert {tuple(r) for r in category_drift_from_counts(counts).collect()} == want
    assert (
        ingest_increment_drift_counts(
            spark, spark.createDataFrame(rows[45:], schema), state, increment_id=1
        )
        == 0
    )
    incs = [d for d in os.listdir(state) if d.startswith("inc=")]
    assert incs == ["inc=1"], incs


def test_dsir_ingest_crash_sweep_every_commit_point(spark, tmp_path, monkeypatch):
    """q107 durability at the fuzzy sweep's standard: EVERY os.replace
    commit in a 4-increment DSIR run (increment markers + generic
    fold-manifest flips — the counts/features writes themselves are
    pre-commit) gets a crash injected at exactly that point in its own
    fresh run; the crashed increment replays once and the stream runs
    to completion.  The final recipe must equal the crash-free run's at
    every injection point."""
    from spark_ss_hudi_delta_poc_spark.streaming import incremental
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        dsir_recipe_from_state,
        ingest_increment_dsir,
    )

    rows = [
        (i, f"tok{i % 5} common tok{(i * 3) % 7} extra{i % 2}", "en" if i % 2 else "fr")
        for i in range(24)
    ]
    incs = [rows[:8], rows[8:14], rows[14:20], rows[20:]]

    real_replace = os.replace

    def run(tag: str, inject_at: int | None):
        state = os.path.join(tmp_path, f"{tag}_s")
        calls = {"n": 0}
        armed = {"on": inject_at is not None}

        def wrapped(src, dst):
            k = calls["n"]
            calls["n"] += 1
            if armed["on"] and k == inject_at:
                armed["on"] = False  # single-shot: the process "died" once
                raise RuntimeError("injected crash")
            return real_replace(src, dst)

        monkeypatch.setattr(incremental.os, "replace", wrapped)
        try:
            for i, chunk in enumerate(incs):
                b = spark.createDataFrame(chunk, DSIR_DOC_SCHEMA)
                try:
                    ingest_increment_dsir(
                        spark, b, state, increment_id=i, fold_threshold=2
                    )
                except RuntimeError as e:
                    assert "injected crash" in str(e)
                    ingest_increment_dsir(
                        spark, b, state, increment_id=i, fold_threshold=2
                    )
        finally:
            monkeypatch.setattr(incremental.os, "replace", real_replace)
        got = sorted(
            tuple(r) for r in dsir_recipe_from_state(spark, state).collect()
        )
        return got, calls["n"]

    want, n_points = run("ref", None)
    assert len(want) == 24
    assert n_points >= 6, f"expected every commit instrumented, saw {n_points}"
    for k in range(n_points):
        got, _ = run(f"k{k}", k)
        assert got == want, f"crash at commit point {k} changed the recipe"


def test_ingest_increment_bm25_equals_batch_at_any_split(spark, tmp_path, monkeypatch):
    """q110's invariance: tf/dl are per-doc facts and the normalizer is
    merge-associative, so the index's answer equals a one-shot batch
    bm25_search at any micro-batch split (ids, e9 scores and ranks);
    plus the two-table marker crash/replay contract and the fold bound
    on postings dirs."""
    import pytest

    from spark_ss_hudi_delta_poc_spark.operators.text_analysis import bm25_search
    from spark_ss_hudi_delta_poc_spark.streaming import incremental
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        bm25_from_state,
        ingest_increment_bm25,
    )

    terms = ["spark", "join"]
    rows = [
        (i, f"w{i % 9} {'spark' if i % 2 else 'filler'} "
            f"{'join ' * (i % 4)}tail{i % 5}")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    want = sorted(tuple(r) for r in bm25_search(docs, terms, top_k=10).collect())
    assert len(want) == 10
    for tag, chunks in (
        ("thirds", [rows[i::3] for i in range(3)]),
        ("uneven", [rows[:30], rows[30:31], rows[31:]]),
    ):
        state = os.path.join(tmp_path, f"bm_{tag}")
        for e, chunk in enumerate(chunks):
            ingest_increment_bm25(
                spark,
                spark.createDataFrame(chunk, DOC_SCHEMA),
                state,
                terms,
                increment_id=e,
                fold_threshold=2,
            )
        got = sorted(tuple(r) for r in bm25_from_state(spark, state).collect())
        assert got == want, tag
        pd_ = os.path.join(state, "postings")
        n_delta = len(
            [
                d
                for d in os.listdir(pd_)
                if d.startswith("inc=") and not d.startswith("inc=_foldv")
            ]
        )
        assert n_delta < 3, f"{tag}: postings delta dirs not bounded: {n_delta}"

    # crash before the marker leaves the previous answer live for BOTH
    # tables; replay heals; committed replay is a no-op
    state = os.path.join(tmp_path, "bm_crash")
    ingest_increment_bm25(
        spark, spark.createDataFrame(rows[:25], DOC_SCHEMA), state, terms,
        increment_id=0,
    )
    ans1 = sorted(tuple(r) for r in bm25_from_state(spark, state).collect())
    real = incremental._write_marker

    def boom(*a, **kw):
        raise RuntimeError("injected crash before marker")

    monkeypatch.setattr(incremental, "_write_marker", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest_increment_bm25(
            spark, spark.createDataFrame(rows[25:], DOC_SCHEMA), state, terms,
            increment_id=1,
        )
    assert sorted(tuple(r) for r in bm25_from_state(spark, state).collect()) == ans1
    monkeypatch.setattr(incremental, "_write_marker", real)
    assert (
        ingest_increment_bm25(
            spark, spark.createDataFrame(rows[25:], DOC_SCHEMA), state, terms,
            increment_id=1,
        )
        > 0
    )
    assert sorted(tuple(r) for r in bm25_from_state(spark, state).collect()) == want
    assert (
        ingest_increment_bm25(
            spark, spark.createDataFrame(rows[25:], DOC_SCHEMA), state, terms,
            increment_id=1,
        )
        == 0
    )


def test_bm25_ingest_rejects_term_set_change(spark, tmp_path):
    """Review r13: an index is valid only for the term set it was built
    with — a later increment under different terms raises instead of
    silently merging incomparable postings; same-set replays (any term
    order) still work."""
    import pytest

    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_bm25,
    )

    state = os.path.join(tmp_path, "bmts")
    b1 = spark.createDataFrame([(1, "spark join spark")], DOC_SCHEMA)
    assert ingest_increment_bm25(spark, b1, state, ["spark", "join"], increment_id=0) == 2
    b2 = spark.createDataFrame([(2, "vector join")], DOC_SCHEMA)
    # same set, different order: fine
    assert ingest_increment_bm25(spark, b2, state, ["join", "spark"], increment_id=1) == 1
    with pytest.raises(ValueError, match="one index per term set"):
        ingest_increment_bm25(
            spark, spark.createDataFrame([(3, "x")], DOC_SCHEMA), state,
            ["vector"], increment_id=2,
        )


def test_partial_spec_fold_rejects_missing_sibling_tables(spark, tmp_path):
    """ADVICE r13 (medium) + round-14 re-review: a multi-table root
    folded with a PARTIAL spec map must be rejected, not papered over —
    carrying sibling tiers forward is still lossy because "folded" is a
    GLOBAL token set (a sibling's committed-but-unfolded delta would be
    marked folded without ever being folded: readers exclude it, heal
    deletes it).  Pin the raise, pin that nothing was damaged, and pin
    the safe full-spec shape where one table simply has no fresh
    deltas."""
    import pytest

    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _fold_manifest,
        _write_marker,
        fold_committed_incs,
        heal_fold_debris,
    )

    root = os.path.join(tmp_path, "proot")
    ta = os.path.join(root, "ta")
    tb = os.path.join(root, "tb")
    spark.createDataFrame([(1, "a")], DOC_SCHEMA).write.parquet(
        os.path.join(ta, "inc=t1")
    )
    spark.createDataFrame([(10, "b")], DOC_SCHEMA).write.parquet(
        os.path.join(tb, "inc=t1")
    )
    _write_marker(root, "t1")
    assert fold_committed_incs(spark, root, {ta: None, tb: None})
    man = _fold_manifest(root)
    assert set(man["tables"]) == {os.path.abspath(ta), os.path.abspath(tb)}
    tb_tier = man["tables"][os.path.abspath(tb)][0]["path"]
    # second increment stages deltas under BOTH tables; a partial-spec
    # fold must raise BEFORE committing anything
    spark.createDataFrame([(2, "c")], DOC_SCHEMA).write.parquet(
        os.path.join(ta, "inc=t2")
    )
    spark.createDataFrame([(20, "d")], DOC_SCHEMA).write.parquet(
        os.path.join(tb, "inc=t2")
    )
    _write_marker(root, "t2")
    with pytest.raises(ValueError, match="every table the"):
        fold_committed_incs(spark, root, {ta: None})
    # nothing was damaged: manifest unchanged, tb's delta still live
    man2 = _fold_manifest(root)
    assert man2["version"] == man["version"]
    assert os.path.isdir(os.path.join(tb, "inc=t2"))
    heal_fold_debris(root, [ta, tb], spark)
    assert os.path.isdir(os.path.join(tb, "inc=t2"))
    # the FULL-spec fold commits both deltas; all rows intact
    assert fold_committed_incs(spark, root, {ta: None, tb: None})
    assert sorted(r.doc_id for r in spark.read.parquet(tb).collect()) == [10, 20]
    assert sorted(r.doc_id for r in spark.read.parquet(ta).collect()) == [1, 2]
    # safe shape: a THIRD fold where only ta has fresh deltas still
    # passes full specs; tb's tier survives untouched
    spark.createDataFrame([(3, "e")], DOC_SCHEMA).write.parquet(
        os.path.join(ta, "inc=t3")
    )
    _write_marker(root, "t3")
    assert fold_committed_incs(spark, root, {ta: None, tb: None})
    assert os.path.isdir(tb_tier) or spark.read.parquet(tb).count() == 2
    assert sorted(r.doc_id for r in spark.read.parquet(tb).collect()) == [10, 20]



# --- q111: cross-run maintained ANN index -----------------------------------

EMB_SCHEMA = "vec_id long, embedding array<float>"


def _emb_rows(lo, hi, dim=8):
    """Deterministic synthetic embeddings (no RNG — replayable)."""
    return [
        (i, [float(((i * 7 + j * 13) % 23) - 11) / 7.0 for j in range(dim)])
        for i in range(lo, hi)
    ]


def _batch_ivf_answer(spark, rows, queries_df, tmp_path, tag):
    from spark_ss_hudi_delta_poc_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_topk,
    )

    emb = spark.createDataFrame(rows, EMB_SCHEMA)
    path = os.path.join(tmp_path, f"ivf_{tag}")
    build_ivf_index(emb, path)
    return ivf_index_topk(spark, path, queries_df, k=5, nprobe=2)


def test_ingest_increment_ann_equals_batch_at_any_split(spark, tmp_path):
    """The maintained index answers exactly like a batch-built IVF index
    over the union corpus, at ANY id-ordered micro-batch split — the
    q111 oracle contract (same pinned-centroid rule, same assignment and
    scoring cores)."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ann_from_state,
        ingest_increment_ann,
    )

    rows = _emb_rows(0, 100)
    queries = spark.createDataFrame(rows[:20], EMB_SCHEMA)
    want = sorted(
        map(tuple, _batch_ivf_answer(spark, rows, queries, tmp_path, "b").collect())
    )
    for tag, cuts in (("one", [100]), ("three", [40, 70, 100])):
        state = os.path.join(tmp_path, f"st_{tag}")
        lo = 0
        for i, hi in enumerate(cuts):
            n = ingest_increment_ann(
                spark,
                spark.createDataFrame(rows[lo:hi], EMB_SCHEMA),
                state,
                increment_id=i,
                fold_threshold=2,
            )
            assert n == hi - lo
            lo = hi
        got = sorted(map(tuple, ann_from_state(spark, state, queries).collect()))
        assert got == want, f"split {tag} diverged from the batch-built index"


def test_ingest_increment_ann_crash_replay_and_guards(spark, tmp_path, monkeypatch):
    """Crash before the marker leaves the previous state live and the
    replay completes; a committed replay is a no-op; the seed increment
    must carry every centroid id; a centroid-set change raises (q110's
    guard class) instead of mixing geometries."""
    import pytest

    from spark_ss_hudi_delta_poc_spark.streaming import incremental
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ann_from_state,
        ingest_increment_ann,
    )

    rows = _emb_rows(0, 60)
    queries = spark.createDataFrame(rows[:5], EMB_SCHEMA)
    state = os.path.join(tmp_path, "crash")
    # seed increment lacking id 15 -> raises, nothing committed
    bad_seed = [r for r in rows[:40] if r[0] != 15]
    with pytest.raises(ValueError, match="seed increment must contain"):
        ingest_increment_ann(
            spark, spark.createDataFrame(bad_seed, EMB_SCHEMA), state, increment_id=0
        )
    assert ingest_increment_ann(
        spark, spark.createDataFrame(rows[:40], EMB_SCHEMA), state, increment_id=0
    ) == 40
    s1 = sorted(map(tuple, ann_from_state(spark, state, queries).collect()))
    real = incremental._write_marker

    def boom(*a, **kw):
        raise RuntimeError("injected crash before marker")

    monkeypatch.setattr(incremental, "_write_marker", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest_increment_ann(
            spark, spark.createDataFrame(rows[40:], EMB_SCHEMA), state, increment_id=1
        )
    # uncommitted inc=1 is invisible: serving still answers from inc=0
    assert sorted(map(tuple, ann_from_state(spark, state, queries).collect())) == s1
    monkeypatch.setattr(incremental, "_write_marker", real)
    assert ingest_increment_ann(
        spark, spark.createDataFrame(rows[40:], EMB_SCHEMA), state, increment_id=1
    ) == 20
    # committed replay: no-op
    assert ingest_increment_ann(
        spark, spark.createDataFrame(rows[40:], EMB_SCHEMA), state, increment_id=1
    ) == 0
    # centroid-set guard: tamper the persisted centroids -> next raises
    import shutil as _sh

    cent = os.path.join(state, "centroids")
    _sh.rmtree(cent)
    spark.createDataFrame(
        [(i, [int(1000 + i)] * 8) for i in range(16)], "cid long, qv_cent array<long>"
    ).coalesce(1).write.parquet(cent)
    with pytest.raises(ValueError, match="different centroid set"):
        ingest_increment_ann(
            spark,
            spark.createDataFrame(_emb_rows(100, 110), EMB_SCHEMA),
            state,
            increment_id=2,
        )


def test_ingest_increment_ann_occupancy_and_retrain_flag(spark, tmp_path):
    """Every marker records merged occupancy (exact totals) and the
    retrain_due skew flag: an increment that piles onto one cluster
    (max occupancy > ANN_RETRAIN_SKEW x the even share) trips it."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _marker_payload,
        ingest_increment_ann,
    )

    rows = _emb_rows(0, 20)
    state = os.path.join(tmp_path, "occ")
    ingest_increment_ann(
        spark, spark.createDataFrame(rows, EMB_SCHEMA), state, increment_id=0
    )
    p0 = _marker_payload(state, "0")
    assert p0["occ_total"] == 20 and p0["occ_max"] >= 2
    # batch 2: 80 copies of vector 0's direction -> one cluster swallows
    # them all, max > total/4 -> retrain_due
    clones = [
        (100 + i, [v * (1.0 + 0.001 * (i % 3)) for v in rows[0][1]])
        for i in range(80)
    ]
    ingest_increment_ann(
        spark, spark.createDataFrame(clones, EMB_SCHEMA), state, increment_id=1
    )
    p1 = _marker_payload(state, "1")
    assert p1["occ_total"] == 100
    assert p1["retrain_due"] is True
    assert p1["centroids"] == p0["centroids"]


def test_ann_serving_reads_only_probed_partitions(spark, tmp_path):
    """Scale certificate: once the lists are folded into a ppc-
    partitioned bucketed tier, serving one query at nprobe=1 reads ONLY
    the probed cluster's ppc dirs — partition pruning does the
    'inverted' part of IVF at the storage layer (ivf_index_topk's
    discipline, maintained across increments)."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _ann_pp_of,
        ann_from_state,
        ingest_increment_ann,
    )

    rows = _emb_rows(0, 100)
    state = os.path.join(tmp_path, "prune")
    for i, (lo, hi) in enumerate(((0, 50), (50, 100))):
        ingest_increment_ann(
            spark,
            spark.createDataFrame(rows[lo:hi], EMB_SCHEMA),
            state,
            increment_id=i,
            fold_threshold=1,  # fold every increment: serving reads tiers only
        )
    queries = spark.createDataFrame(rows[:1], EMB_SCHEMA)
    served = ann_from_state(spark, state, queries, k=5, nprobe=1)
    files = served.inputFiles()
    list_files = [f for f in files if "/lists/" in f]
    assert list_files, "serving must read the folded lists tiers"
    pps = {
        int(seg.split("=", 1)[1])
        for f in list_files
        for seg in f.split("/")
        if seg.startswith("ppc=")
    }
    # nprobe=1 -> exactly one probed cluster -> exactly one ppc value
    assert len(pps) == 1
    # and the tier actually HAS other ppc dirs that were pruned away
    import glob as _glob

    all_pps = {
        os.path.basename(d)
        for d in _glob.glob(os.path.join(state, "lists", "inc=_foldv*", "ppc=*"))
    }
    assert len(all_pps) > 1
    (only,) = pps
    assert f"ppc={only}" in all_pps
    # the pruned pp value is the driver-side twin of some probed cluster
    assert only in {_ann_pp_of(c, 16) for c in range(16)}


# --- q112: cross-run incremental shard export --------------------------------


def _doc_rows(lo, hi):
    return [(i, "w " * (3 + (i * 7) % 40) + f"doc{i}") for i in range(lo, hi)]


def _batch_shard_manifest(spark, rows, tmp_path, tag):
    from spark_ss_hudi_delta_poc_spark.operators.curation import export_shards

    return export_shards(
        spark.createDataFrame(rows, DOC_SCHEMA),
        os.path.join(tmp_path, f"exp_{tag}"),
        shard_tokens=64,
        order="id",
    )


def test_ingest_increment_shards_equals_batch_at_any_split(spark, tmp_path):
    """The maintained manifest equals a one-shot id-ordered batch
    packing (export_shards(order='id')) of the union corpus at ANY
    id-ordered split — the q112 oracle contract (the per-bucket token
    cumsum is merge-associative under id order)."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_shards,
        shards_manifest_from_state,
    )

    rows = _doc_rows(0, 90)
    want = sorted(
        map(tuple, _batch_shard_manifest(spark, rows, tmp_path, "b").collect())
    )
    for tag, cuts in (("one", [90]), ("three", [30, 60, 90])):
        state = os.path.join(tmp_path, f"sh_{tag}")
        lo = 0
        for i, hi in enumerate(cuts):
            n = ingest_increment_shards(
                spark,
                spark.createDataFrame(rows[lo:hi], DOC_SCHEMA),
                state,
                shard_tokens=64,
                increment_id=i,
                fold_threshold=2,
            )
            assert n == hi - lo
            lo = hi
        got = sorted(
            map(tuple, shards_manifest_from_state(spark, state).collect())
        )
        assert got == want, f"split {tag} diverged from the batch packing"


def test_ingest_increment_shards_seals_previous_shards(spark, tmp_path):
    """Sealed-shard invariance: a (bucket, shard) dir written by an
    earlier increment receives NEW files under a later token only if it
    was the bucket's OPEN (last) shard — a trainer's cached sealed
    shard is byte-stable (its files live under the earlier inc= token
    and are never touched again)."""
    import glob as _glob

    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_shards,
    )

    rows = _doc_rows(0, 120)
    state = os.path.join(tmp_path, "seal")
    ingest_increment_shards(
        spark,
        spark.createDataFrame(rows[:60], DOC_SCHEMA),
        state,
        shard_tokens=64,
        increment_id=0,
    )
    data = os.path.join(state, "data")

    def shard_dirs(token):
        out = {}
        for p in _glob.glob(os.path.join(data, f"inc={token}", "bucket=*", "shard=*")):
            parts = p.split(os.sep)
            b = int(parts[-2].split("=")[1])
            s = int(parts[-1].split("=")[1])
            out.setdefault(b, set()).add(s)
        return out

    first = shard_dirs(0)
    open_shards = {(b, max(ss)) for b, ss in first.items()}
    sealed = {(b, s) for b, ss in first.items() for s in ss} - open_shards
    assert sealed, "test needs at least one sealed shard after inc 0"
    # snapshot every file of increment 0 (path, size, mtime)
    snap = {
        f: (os.path.getsize(f), os.path.getmtime(f))
        for f in _glob.glob(os.path.join(data, "inc=0", "**", "*.parquet"), recursive=True)
    }
    ingest_increment_shards(
        spark,
        spark.createDataFrame(rows[60:], DOC_SCHEMA),
        state,
        shard_tokens=64,
        increment_id=1,
    )
    second = shard_dirs(1)
    touched = {(b, s) for b, ss in second.items() for s in ss}
    assert not (touched & sealed), f"later increment wrote into sealed shards: {touched & sealed}"
    # and increment 0's files are bit-stable
    for f, (sz, mt) in snap.items():
        assert os.path.getsize(f) == sz and os.path.getmtime(f) == mt, f


def test_ingest_increment_shards_crash_replay_and_guards(spark, tmp_path, monkeypatch):
    """Crash before the marker leaves the previous manifest live and the
    replay completes; a committed replay is a no-op; out-of-id-order
    arrival raises (sealed shards would move); a geometry change
    (n_buckets / shard_tokens) raises (one geometry per export)."""
    import pytest

    from spark_ss_hudi_delta_poc_spark.streaming import incremental
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_shards,
        shards_manifest_from_state,
    )

    rows = _doc_rows(0, 60)
    state = os.path.join(tmp_path, "shcrash")
    assert ingest_increment_shards(
        spark, spark.createDataFrame(rows[:30], DOC_SCHEMA), state,
        shard_tokens=64, increment_id=0,
    ) == 30
    m1 = sorted(map(tuple, shards_manifest_from_state(spark, state).collect()))
    real = incremental._write_marker

    def boom(*a, **kw):
        raise RuntimeError("injected crash before marker")

    monkeypatch.setattr(incremental, "_write_marker", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest_increment_shards(
            spark, spark.createDataFrame(rows[30:], DOC_SCHEMA), state,
            shard_tokens=64, increment_id=1,
        )
    assert sorted(
        map(tuple, shards_manifest_from_state(spark, state).collect())
    ) == m1
    monkeypatch.setattr(incremental, "_write_marker", real)
    assert ingest_increment_shards(
        spark, spark.createDataFrame(rows[30:], DOC_SCHEMA), state,
        shard_tokens=64, increment_id=1,
    ) == 30
    assert ingest_increment_shards(
        spark, spark.createDataFrame(rows[30:], DOC_SCHEMA), state,
        shard_tokens=64, increment_id=1,
    ) == 0
    with pytest.raises(ValueError, match="id-ordered arrival"):
        ingest_increment_shards(
            spark, spark.createDataFrame(_doc_rows(10, 20), DOC_SCHEMA), state,
            shard_tokens=64, increment_id=2,
        )
    with pytest.raises(ValueError, match="one geometry per export"):
        ingest_increment_shards(
            spark, spark.createDataFrame(_doc_rows(100, 110), DOC_SCHEMA), state,
            shard_tokens=128, increment_id=2,
        )


# --- q113: ANN index retrain --------------------------------------------------


def test_retrain_ann_index_equals_batch_kmeans(spark, tmp_path):
    """After retrain, serving (nprobe=1) equals batch ivf_kmeans_topk
    over the union corpus — kmeans_refine_centroids_q over the index's
    own qv state is the identical quantized-space kernel, so the
    rebuild hash-matches the batch operator (the q113 oracle)."""
    from spark_ss_hudi_delta_poc_spark.operators.similarity import ivf_kmeans_topk
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ann_from_state,
        ingest_increment_ann,
        retrain_ann_index,
    )

    rows = _emb_rows(0, 100)
    emb = spark.createDataFrame(rows, EMB_SCHEMA)
    queries = spark.createDataFrame(rows[:20], EMB_SCHEMA)
    want = sorted(map(tuple, ivf_kmeans_topk(emb, queries, k=5).collect()))
    state = os.path.join(tmp_path, "rt")
    for i, (lo, hi) in enumerate(((0, 40), (40, 70), (70, 100))):
        ingest_increment_ann(
            spark, spark.createDataFrame(rows[lo:hi], EMB_SCHEMA), state,
            increment_id=i, fold_threshold=2,
        )
    new_root = retrain_ann_index(spark, state)
    assert os.path.basename(new_root) == "gen=1"
    got = sorted(
        map(tuple, ann_from_state(spark, state, queries, k=5, nprobe=1).collect())
    )
    assert got == want
    # superseded generation GC'd: the pre-retrain root-level tables die
    assert not os.path.isdir(os.path.join(state, "lists"))
    assert not os.path.isdir(os.path.join(state, "centroids"))


def test_retrain_ann_index_crash_leaves_old_index_serving(spark, tmp_path, monkeypatch):
    """The generation-pointer flip is THE commit: a crash anywhere in
    the rebuild (simulated at the post-marker fold) leaves the pointer
    unflipped and the OLD index serving; the replayed retrain
    overwrites the half-built generation and completes."""
    import pytest

    from spark_ss_hudi_delta_poc_spark.operators.similarity import ivf_kmeans_topk
    from spark_ss_hudi_delta_poc_spark.streaming import incremental
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ann_from_state,
        ingest_increment_ann,
        retrain_ann_index,
    )

    rows = _emb_rows(0, 60)
    queries = spark.createDataFrame(rows[:5], EMB_SCHEMA)
    state = os.path.join(tmp_path, "rtc")
    for i, (lo, hi) in enumerate(((0, 30), (30, 60))):
        ingest_increment_ann(
            spark, spark.createDataFrame(rows[lo:hi], EMB_SCHEMA), state,
            increment_id=i,
        )
    before = sorted(map(tuple, ann_from_state(spark, state, queries).collect()))
    real = incremental.fold_committed_incs

    def boom(*a, **kw):
        raise RuntimeError("injected crash mid-rebuild")

    monkeypatch.setattr(incremental, "fold_committed_incs", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        retrain_ann_index(spark, state)
    # pointer unflipped: the old generation still serves, unchanged
    assert not os.path.exists(os.path.join(state, "_generation"))
    assert sorted(map(tuple, ann_from_state(spark, state, queries).collect())) == before
    monkeypatch.setattr(incremental, "fold_committed_incs", real)
    retrain_ann_index(spark, state)
    emb = spark.createDataFrame(rows, EMB_SCHEMA)
    want = sorted(
        map(tuple, ivf_kmeans_topk(emb, queries, k=5).collect())
    )
    assert sorted(
        map(tuple, ann_from_state(spark, state, queries, k=5, nprobe=1).collect())
    ) == want


def test_retrain_ann_index_then_ingest_continues(spark, tmp_path):
    """Post-retrain increments assign against the REFINED centroid set
    (train-once serving): the maintained answer equals the shared probe
    kernel run with the retrain-time centroids over the union corpus,
    and the new increments' markers pin the new digest."""
    import numpy as np

    from spark_ss_hudi_delta_poc_spark.operators.similarity import (
        _ivf_probe,
        kmeans_refine_centroids,
    )
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _ann_root,
        _marker_payload,
        ann_from_state,
        ingest_increment_ann,
        retrain_ann_index,
    )

    rows = _emb_rows(0, 80)
    later = _emb_rows(80, 120)
    queries = spark.createDataFrame(rows[:10], EMB_SCHEMA)
    state = os.path.join(tmp_path, "rti")
    ingest_increment_ann(
        spark, spark.createDataFrame(rows, EMB_SCHEMA), state, increment_id=0
    )
    retrain_ann_index(spark, state)
    root = _ann_root(state)
    digest = _marker_payload(root, "000000000")["centroids"]
    ingest_increment_ann(
        spark, spark.createDataFrame(later, EMB_SCHEMA), state, increment_id=1
    )
    assert _marker_payload(root, "1")["centroids"] == digest
    # expected: the shared probe kernel with the retrain-time centroids
    # (trained on the pre-retrain corpus) over the UNION corpus
    cent_ids, cent_mat = kmeans_refine_centroids(
        spark.createDataFrame(rows, EMB_SCHEMA)
    )
    union = spark.createDataFrame(rows + later, EMB_SCHEMA)
    want = sorted(
        map(tuple, _ivf_probe(union, queries, cent_ids, cent_mat, 5, "vec_id", "embedding").collect())
    )
    got = sorted(
        map(tuple, ann_from_state(spark, state, queries, k=5, nprobe=1).collect())
    )
    assert got == want


def test_read_shard_matches_manifest_and_is_stable(spark, tmp_path):
    """read_shard returns exactly the manifest's (n_docs, n_tokens) for
    every shard, and a sealed shard's content is IDENTICAL before and
    after a later increment (the trainer-cache contract, read-path
    view of the sealed-shard invariance)."""
    from pyspark.sql import functions as F

    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_shards,
        read_shard,
        shards_manifest_from_state,
    )

    rows = _doc_rows(0, 120)
    state = os.path.join(tmp_path, "rs")
    ingest_increment_shards(
        spark, spark.createDataFrame(rows[:60], DOC_SCHEMA), state,
        shard_tokens=64, increment_id=0,
    )
    man1 = {(r.bucket, r.shard): (r.n_docs, r.n_tokens)
            for r in shards_manifest_from_state(spark, state).collect()}
    sealed = [(b, s) for (b, s) in man1
              if s < max(s2 for (b2, s2) in man1 if b2 == b)]
    assert sealed
    b0, s0 = sealed[0]
    snap = sorted(map(tuple, read_shard(spark, state, b0, s0).collect()))
    ingest_increment_shards(
        spark, spark.createDataFrame(rows[60:], DOC_SCHEMA), state,
        shard_tokens=64, increment_id=1,
    )
    # sealed shard: byte-identical read-back after the later increment
    assert sorted(map(tuple, read_shard(spark, state, b0, s0).collect())) == snap
    # every manifest row is exactly its shard's read-back aggregate
    man2 = {(r.bucket, r.shard): (r.n_docs, r.n_tokens)
            for r in shards_manifest_from_state(spark, state).collect()}
    assert man2[(b0, s0)] == man1[(b0, s0)]
    for (b, s), (nd, nt) in man2.items():
        df = read_shard(spark, state, b, s)
        agg = df.agg(F.count(F.lit(1)), F.sum("n_tokens")).collect()[0]
        assert (agg[0], agg[1]) == (nd, nt), (b, s)


def test_ann_ingest_id_order_guard_and_strict_marker(spark, tmp_path):
    """Round-14 re-review fixes: (a) a batch whose ids overlap the
    already-indexed range raises (duplicate vectors would silently
    corrupt the inverted lists — the shards guard class); (b) a
    corrupted NEWEST marker disables no guard — the strict read
    raises instead of treating garble as 'no payload'."""
    import pytest

    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _commits_dir,
        ingest_increment_ann,
    )

    rows = _emb_rows(0, 40)
    state = os.path.join(tmp_path, "iog")
    assert ingest_increment_ann(
        spark, spark.createDataFrame(rows, EMB_SCHEMA), state, increment_id=0
    ) == 40
    with pytest.raises(ValueError, match="id-ordered arrival"):
        ingest_increment_ann(
            spark, spark.createDataFrame(_emb_rows(30, 50), EMB_SCHEMA), state,
            increment_id=1,
        )
    # corrupt the newest marker: the guard read must fail loud
    with open(os.path.join(_commits_dir(state), "0"), "w") as fh:
        fh.write("{not json")
    with pytest.raises(ValueError, match="unreadable commit marker"):
        ingest_increment_ann(
            spark, spark.createDataFrame(_emb_rows(40, 50), EMB_SCHEMA), state,
            increment_id=1,
        )


def test_retrain_heals_interrupted_generation_gc(spark, tmp_path):
    """Round-14 re-review: a crash between the pointer flip and the
    old-generation GC leaves the superseded generation's dirs (and its
    fold tables) on disk — the NEXT retrain's heal-at-top must remove
    them.  Simulate the debris by re-creating gen-0 root-level tables
    after a completed retrain, then retrain again and pin the heal."""
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ann_from_state,
        ingest_increment_ann,
        retrain_ann_index,
    )

    rows = _emb_rows(0, 60)
    queries = spark.createDataFrame(rows[:5], EMB_SCHEMA)
    state = os.path.join(tmp_path, "ggc")
    ingest_increment_ann(
        spark, spark.createDataFrame(rows, EMB_SCHEMA), state, increment_id=0
    )
    retrain_ann_index(spark, state)
    # simulate interrupted old-gen GC: resurrect root-level debris and
    # a half-built next generation
    os.makedirs(os.path.join(state, "_commits"), exist_ok=True)
    with open(os.path.join(state, "_commits", "zz"), "w") as fh:
        fh.write("{}")
    os.makedirs(os.path.join(state, "lists", "inc=zz"), exist_ok=True)
    os.makedirs(os.path.join(state, "gen=99"), exist_ok=True)
    before = sorted(
        map(tuple, ann_from_state(spark, state, queries, k=5, nprobe=1).collect())
    )
    new_root = retrain_ann_index(spark, state)
    assert os.path.basename(new_root) == "gen=2"
    assert not os.path.isdir(os.path.join(state, "lists"))
    assert not os.path.isdir(os.path.join(state, "_commits"))
    assert not os.path.isdir(os.path.join(state, "gen=99"))
    assert not os.path.isdir(os.path.join(state, "gen=1"))
    # the rebuilt index serves the same answer (same corpus, same rule)
    assert sorted(
        map(tuple, ann_from_state(spark, state, queries, k=5, nprobe=1).collect())
    ) == before


def test_ann_post_retrain_guard_advances_across_increments(spark, tmp_path):
    """ADVICE r14 (medium): newest-marker selection must order the
    retrain generation's 9-digit padded token ('000000000') BELOW later
    unpadded stream batch-id tokens NUMERICALLY — under the old
    (len, lex) order the guard kept reading the retrain marker after the
    first post-retrain increment, max_id never advanced, and a replayed
    or overlapping batch (fresh checkpoint re-delivering already-indexed
    ids above the retrain-time high-water mark) silently double-inserted.
    Two post-retrain increments, then an overlapping batch under a fresh
    token must RAISE."""
    import pytest

    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _ann_root,
        _marker_payload,
        ingest_increment_ann,
        retrain_ann_index,
    )

    state = os.path.join(tmp_path, "prg")
    ingest_increment_ann(
        spark, spark.createDataFrame(_emb_rows(0, 60), EMB_SCHEMA), state,
        increment_id=0,
    )
    retrain_ann_index(spark, state)
    root = _ann_root(state)
    ingest_increment_ann(
        spark, spark.createDataFrame(_emb_rows(60, 80), EMB_SCHEMA), state,
        increment_id=1,
    )
    # SECOND post-retrain increment — the case the old ordering broke
    ingest_increment_ann(
        spark, spark.createDataFrame(_emb_rows(80, 100), EMB_SCHEMA), state,
        increment_id=2,
    )
    assert _marker_payload(root, "2")["max_id"] == 99
    with pytest.raises(ValueError, match="id-ordered arrival"):
        ingest_increment_ann(
            spark, spark.createDataFrame(_emb_rows(80, 100), EMB_SCHEMA),
            state, increment_id=3,
        )


def test_ann_and_shards_reject_within_batch_duplicate_ids(spark, tmp_path):
    """ADVICE r14 (low): the min-vs-high-water guard is blind to
    duplicate ids WITHIN one increment — the same 1-row aggregate now
    compares count vs count-distinct and raises before anything is
    staged."""
    import pytest

    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        ingest_increment_ann,
        ingest_increment_shards,
    )

    dup_emb = spark.createDataFrame(
        _emb_rows(0, 40) + _emb_rows(30, 35), EMB_SCHEMA
    )
    with pytest.raises(ValueError, match="duplicate vec_id"):
        ingest_increment_ann(
            spark, dup_emb, os.path.join(tmp_path, "da"), increment_id=0
        )
    dup_doc = spark.createDataFrame(
        _doc_rows(0, 20) + _doc_rows(10, 12), DOC_SCHEMA
    )
    with pytest.raises(ValueError, match="duplicate doc_id"):
        ingest_increment_shards(
            spark, dup_doc, os.path.join(tmp_path, "ds"),
            shard_tokens=64, increment_id=0,
        )


def test_ivf_probe_pairs_zero_norm_query_is_deterministic():
    """ADVICE r14 (low): a zero-norm query vector's cosines are
    undefined (0/0) — the probe must degrade to the cid-ascending
    tie-break (the oracle's ORDER BY cos DESC, cid ASC with every
    cosine tied), never a NaN-order lottery."""
    from types import SimpleNamespace

    import numpy as np

    from spark_ss_hudi_delta_poc_spark.operators.similarity import (
        ivf_probe_pairs,
    )

    cent_ids = np.array([3, 1, 7, 5], dtype=np.int64)
    cent_mat = np.array(
        [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0], [-1.0, 0.0]], dtype=np.float64
    )
    q = [SimpleNamespace(id=42, qv=[0, 0])]
    pairs = ivf_probe_pairs(cent_ids, cent_mat, q, nprobe=2)
    assert [(p[0], p[1]) for p in pairs] == [(42, 1), (42, 3)]
    # and a normal query is unaffected
    qn = [SimpleNamespace(id=7, qv=[2, 0])]
    pairs_n = ivf_probe_pairs(cent_ids, cent_mat, qn, nprobe=1)
    assert [(p[0], p[1]) for p in pairs_n] == [(7, 3)]


def test_fuzzy_guard_carries_watermark_through_empty_increment(spark, tmp_path):
    """VERDICT r14 #2 (newest-marker backport): the fuzzy guard now
    reads ONLY the newest committed marker, so the marker payload must
    carry the RUNNING high-water mark — an empty increment inherits its
    predecessor's mark instead of erasing it, and an out-of-order batch
    after the empty increment still raises.  A legacy chain whose
    newest marker predates the watermark payload falls back to the
    one-time full scan."""
    import json

    import pytest

    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _commits_dir,
        _marker_payload,
        ingest_increment_fuzzy,
    )

    corpus = os.path.join(tmp_path, "wc")
    index = os.path.join(tmp_path, "wi")
    b1 = spark.createDataFrame([(5, _p36("a001 bbb ccc"))], DOC_SCHEMA)
    assert ingest_increment_fuzzy(spark, b1, corpus, index, increment_id="r1") == 1
    empty = spark.createDataFrame([], DOC_SCHEMA)
    assert ingest_increment_fuzzy(spark, empty, corpus, index, increment_id="r2") == 0
    assert _marker_payload(index, "r2")["max_id"] == 5
    late = spark.createDataFrame([(4, _p36("b001 ddd eee"))], DOC_SCHEMA)
    with pytest.raises(ValueError, match="id-ordered"):
        ingest_increment_fuzzy(spark, late, corpus, index, increment_id="r3")
    # legacy fallback: blank the newest marker's payload (pre-watermark
    # era) — the guard must still find the older mark via the full scan
    with open(os.path.join(_commits_dir(index), "r2"), "w") as fh:
        json.dump({}, fh)
    with pytest.raises(ValueError, match="id-ordered"):
        ingest_increment_fuzzy(spark, late, corpus, index, increment_id="r3")


def test_maintain_ann_index_fires_and_survives_every_crash_point(
    spark, tmp_path, monkeypatch
):
    """VERDICT r14 #3: the recorded retrain_due trigger is actually
    CONSUMED — maintain_ann_index retrains when the newest marker says
    so — and the auto-flip is crash-safe at each point: (a) crash
    between the ingest's marker and the hook → the replayed trigger
    no-ops the ingest and still fires the retrain; (b) crash inside the
    rebuild → the old generation keeps serving, the re-run completes;
    (c) crash after the pointer flip, before the stream's checkpoint
    commit → the replayed batch is a token NO-OP against the new
    generation's absorbed markers (NOT an id-order ValueError), and a
    re-fired maintain is idempotent."""
    import pytest

    from spark_ss_hudi_delta_poc_spark.operators.similarity import ivf_kmeans_topk
    from spark_ss_hudi_delta_poc_spark.streaming import incremental
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _ann_root,
        ann_from_state,
        ingest_increment_ann,
        maintain_ann_index,
    )

    rows = _emb_rows(0, 90)
    queries = spark.createDataFrame(rows[:5], EMB_SCHEMA)
    state = os.path.join(tmp_path, "mnt")

    def kmeans_want(upto):
        emb = spark.createDataFrame(rows[:upto], EMB_SCHEMA)
        return sorted(
            map(tuple, ivf_kmeans_topk(emb, queries, k=5).collect())
        )

    def serve():
        return sorted(
            map(
                tuple,
                ann_from_state(spark, state, queries, k=5, nprobe=1).collect(),
            )
        )

    # trigger recorded (retrain_skew=0 forces it) and consumed
    ingest_increment_ann(
        spark, spark.createDataFrame(rows[:30], EMB_SCHEMA), state,
        increment_id=0, retrain_skew=0.0,
    )
    assert maintain_ann_index(spark, state, retrain_skew=0.0) is not None
    assert os.path.basename(_ann_root(state)) == "gen=1"
    assert serve() == kmeans_want(30)
    # no trigger -> no retrain (flag honestly read, not assumed): a
    # default-skew state on the even synthetic corpus is never due
    calm = os.path.join(tmp_path, "calm")
    ingest_increment_ann(
        spark, spark.createDataFrame(rows[:30], EMB_SCHEMA), calm,
        increment_id=0,
    )
    assert maintain_ann_index(spark, calm) is None

    # (a) ingest committed, hook never ran: replay no-ops, hook fires
    ingest_increment_ann(
        spark, spark.createDataFrame(rows[30:60], EMB_SCHEMA), state,
        increment_id=1, retrain_skew=0.0,
    )
    assert ingest_increment_ann(
        spark, spark.createDataFrame(rows[30:60], EMB_SCHEMA), state,
        increment_id=1, retrain_skew=0.0,
    ) == 0
    # (b) crash inside the rebuild: old generation keeps serving
    before = serve()
    real = incremental.fold_committed_incs
    monkeypatch.setattr(
        incremental, "fold_committed_incs",
        lambda *a, **kw: (_ for _ in ()).throw(RuntimeError("injected")),
    )
    with pytest.raises(RuntimeError, match="injected"):
        maintain_ann_index(spark, state, retrain_skew=0.0)
    assert os.path.basename(_ann_root(state)) == "gen=1"
    assert serve() == before
    monkeypatch.setattr(incremental, "fold_committed_incs", real)
    assert maintain_ann_index(spark, state, retrain_skew=0.0) is not None
    assert os.path.basename(_ann_root(state)) == "gen=2"
    assert serve() == kmeans_want(60)

    # (c) flip happened, stream checkpoint didn't: the replayed batch is
    # a no-op against the absorbed markers, then maintain is idempotent
    assert ingest_increment_ann(
        spark, spark.createDataFrame(rows[30:60], EMB_SCHEMA), state,
        increment_id=1, retrain_skew=0.0,
    ) == 0
    maintain_ann_index(spark, state, retrain_skew=0.0)  # re-fire: idempotent
    assert serve() == kmeans_want(60)

    # stream continues: new vectors land in the retrained generation
    ingest_increment_ann(
        spark, spark.createDataFrame(rows[60:90], EMB_SCHEMA), state,
        increment_id=2, retrain_skew=0.0,
    )
    assert maintain_ann_index(spark, state, retrain_skew=0.0) is not None
    assert serve() == kmeans_want(90)


def test_auto_retrain_streaming_wrapper(spark, tmp_path):
    """incremental_ann_ingest(auto_retrain=True): the foreachBatch tail
    consumes retrain_due mid-stream (forced cadence retrain_skew=0), and
    final serving equals batch ivf_kmeans_topk over the union corpus —
    the intermediate generations are oracle-invisible because every
    retrain re-seeds from the id < n_centroids rule over the full
    preserved qv state."""
    from spark_ss_hudi_delta_poc_spark.operators.similarity import ivf_kmeans_topk
    from spark_ss_hudi_delta_poc_spark.streaming.incremental import (
        _ann_root,
        ann_from_state,
        incremental_ann_ingest,
    )

    rows = _emb_rows(0, 90)
    src = os.path.join(tmp_path, "src")
    os.makedirs(src)
    for i, (lo, hi) in enumerate(((0, 30), (30, 60), (60, 90))):
        spark.createDataFrame(rows[lo:hi], EMB_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(tmp_path, f"tmp{i}"))
        import glob as _glob
        import shutil as _shutil

        for f in _glob.glob(os.path.join(tmp_path, f"tmp{i}", "part-*.parquet")):
            dst = os.path.join(src, f"f{i}.parquet")
            _shutil.move(f, dst)
            os.utime(dst, (1_000_000_000.0 + i, 1_000_000_000.0 + i))
    state = os.path.join(tmp_path, "state")
    q = incremental_ann_ingest(
        spark,
        src,
        state,
        os.path.join(tmp_path, "ckpt"),
        "vec_id long, embedding array<float>",
        auto_retrain=True,
        retrain_skew=0.0,
    )
    q.awaitTermination()
    # one retrain per increment at the forced cadence
    assert os.path.basename(_ann_root(state)) == "gen=3"
    emb = spark.createDataFrame(rows, EMB_SCHEMA)
    queries = spark.createDataFrame(rows[:10], EMB_SCHEMA)
    want = sorted(map(tuple, ivf_kmeans_topk(emb, queries, k=5).collect()))
    got = sorted(
        map(
            tuple,
            ann_from_state(spark, state, queries, k=5, nprobe=1).collect(),
        )
    )
    assert got == want
