"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set = the reference's 4-query battery (BASELINE.md) + the join /
window / streaming round-trip + the LLM-pipeline operators — the queries
whose plans we tune for scale.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_ss_hudi_delta_poc_spark.plans import all_queries
from spark_ss_hudi_delta_poc_spark.session import get_spark

HEADLINE = [
    # reference battery (BASELINE.md 4-query battery)
    "q01_count",
    "q02_group_count",
    "q03_distinct_count",
    "q04_dup_having",
    # map-stage kernels
    "q05_ts_roundtrip",
    "q09_json_roundtrip",
    # relational
    "q13_join_revenue",
    "q14_broadcast_dims",
    "q23_pricing_summary",
    "q33_segment_topn",
    "q34_region_revenue",
    "q51_returned_top_customers",
    "q78_approx_quantiles",
    "q15_window_topn",
    "q17_asof_join",
    "q20_sessionize",
    # TPC-H-shaped multi-join analytics
    "q68_volume_shipping",
    "q70_waiting_suppliers",
    "q79_custorder_distribution",
    "q83_product_profit",
    # streaming ingest round-trip (the reference's core loop)
    "q10_stream_global_agg",
    "q12_stream_roundtrip",
    "q19_stream_windowed_agg",
    "q67_stream_topk",
    "q90_stream_curation",
    "q91_stream_ann_serving",
    # LLM-pipeline
    "dedup_exact",
    "dedup_normalized",
    "dedup_segments",
    "dedup_repeated_spans",
    "dedup_minhash_lsh",
    # round-11 (VERDICT r9 #7 / r10 #2): the fuzzy edit-distance pair —
    # the quadratic-adjacent operators whose cost drift matters most —
    # two NEW rows, so BENCH_r11's total is 59 queries vs r10's 57
    # (compare shared rows / bench_ab, never raw totals)
    "dedup_fuzzy_edit",
    "dedup_fuzzy_recall",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_quantized_topk",
    "ann_ivf_index_topk",
    "ann_lsh_multitable_topk",
    # round-9 (VERDICT r8 #7): the PQ family joins the headline so its
    # serving cost is tracked per round — three NEW rows, so BENCH_r9's
    # total is 57 queries vs r8's 54 (compare shared rows / bench_ab,
    # never raw totals across the boundary)
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_rerank_topk",
    "ann_recall_report",
    "corpus_pipeline",
    "curation_contamination",
    "curation_decontaminated",
    "curation_gopher_rules",
    "curation_model_filter",
    "curation_rebalance",
    "curation_export_shards",
    "text_quality_score",
    "text_fingerprint",
    "text_bm25_search",
    "text_rare_token_stats",
    "embedding_knn_graph",
    "embedding_knn_graph_lsh",
    "multimodal_meta",
    # round-12 (VERDICT r11 #5): the round-11 cross-run streaming
    # ingests join the headline so the cost of the stateful maintenance
    # paths (SCD2 log compaction, fuzzy base+delta folding, bottom-k
    # state) is tracked per round — three NEW rows, so BENCH_r12's
    # total is 62 queries vs r11's 59 (compare shared rows / bench_ab,
    # never raw totals across the boundary)
    "q103_stream_scd2_compacting",
    "q104_stream_fuzzy_ingest",
    "q105_stream_bottomk_sample",
    # round-12 operators: DSIR's gram-explode aggregates, UniMax's
    # corpus groupBy and the streaming recipe's replace-state
    # maintenance are the new rows whose cost drift matters — three
    # MORE rows on top of the three above, so BENCH_r12's total is 65
    # queries vs r11's 59 (compare shared rows / bench_ab, never raw
    # totals across the boundary)
    "curation_dsir",
    "curation_unimax",
    "q106_stream_unimax",
    # round-13 operators: the DSIR cross-run streaming twin (VERDICT
    # r12 #5 — per-trigger gram aggregate + counts merge + forced
    # mid-stream feature fold + full recipe rematerialization), the
    # T=2 temperature mixture and its streaming twin over q106's counts
    # state, and the drift monitor's streaming twin over per-second
    # counts state, and the always-current BM25 index — FIVE new rows,
    # so BENCH_r13's total is 70 queries vs r12's 65 (compare shared
    # rows / bench_ab, never raw totals across the boundary)
    "q107_stream_dsir",
    "curation_temperature",
    "q108_stream_temperature",
    "q109_stream_drift",
    "q110_stream_bm25",
    # round-14 operators: the maintained ANN index (seed-pinned
    # centroids, map-side assignment, cluster-pruned serving), the
    # incremental shard export (id-order packing, sealed shards
    # immutable) and the index retrain path (kmeans rebuild +
    # generation flip) — THREE new rows, so BENCH_r14's total is 73
    # queries vs r13's 70 (compare shared rows / bench_ab, never raw
    # totals across the boundary)
    "q111_stream_ann_index",
    "q112_stream_shard_export",
    "q113_stream_ann_retrain",
    # round-15: stream query serving against the maintained index and
    # the auto-retrain path — TWO new rows, so BENCH_r15's total is 75
    # queries vs r14's 73 (compare shared rows / bench_ab, never raw
    # totals across the boundary)
    "q114_stream_ann_query_serving",
    "q115_stream_ann_autoretrain",
]


def calibration_sec(spark) -> float:
    """Fixed-work box-speed probe (VERDICT r12 #3): a constant-size,
    in-memory, CPU-bound aggregate that NO repo change can affect — its
    round-over-round ratio measures machine-load drift, making bench
    deltas legible (a loaded box inflates this row by the same factor
    it inflates untouched queries).  min-of-3 after one warmup, same
    discipline as the query rows."""
    job = lambda: (
        spark.range(0, 800_000_000, 1, 32)
        .selectExpr("sum(pmod(id * 2654435761, 1000003)) as s")
        .collect()
    )
    job()  # untimed warmup (JIT)
    best = None
    for _ in range(3):
        t0 = time.time()
        job()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def io_calibration_sec(spark) -> float:
    """Fixed-work I/O-BOUND box-speed probe (VERDICT r14 #5): the CPU
    calibration row over-corrects I/O-bound queries when box drift is
    CPU contention (r14's raw 0.887 vs normalized 1.424 straddle), so
    the bracket needs a second, I/O-side instrument.  A pinned synthetic
    parquet set (64 files, deterministic content, written UNTIMED into
    the bench scratch root each run) is scanned and aggregated — file
    listing + footer reads + parquet decode, the cost class the
    streaming/staging rows are dominated by.  No repo change can affect
    it; min-of-3 after one warmup, the same discipline as the CPU row."""
    from spark_ss_hudi_delta_poc_spark.streaming.jobs import stream_scratch_root

    root = os.path.join(stream_scratch_root(), "io_calibration")
    shutil.rmtree(root, ignore_errors=True)
    (
        spark.range(0, 20_000_000, 1, 64)
        .selectExpr(
            "id",
            "pmod(id * 2654435761, 1000003) as v",
            "cast(id % 97 as string) as s",
        )
        .write.mode("overwrite")
        .parquet(root)
    )
    job = lambda: (
        spark.read.parquet(root)
        .selectExpr("sum(v) as sv", "count(distinct s) as cs")
        .collect()
    )
    job()  # untimed warmup
    best = None
    for _ in range(3):
        t0 = time.time()
        job()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # clear the repo's own streaming scratch area first: staging/checkpoint
    # debris accumulated across many prior runs measurably inflates the
    # streaming rows' file-listing cost (round-13: 1.2 GB / 632 dirs of
    # leftovers added ~20 s to the streaming subtotal).  Resolve the root
    # through the SAME helper the jobs use — a hardcoded /tmp literal is a
    # silent no-op under a non-default TMPDIR (ADVICE r13)
    from spark_ss_hudi_delta_poc_spark.streaming.jobs import stream_scratch_root

    shutil.rmtree(stream_scratch_root(), ignore_errors=True)
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    # Warm the JVM/codegen/scheduler once so the first timed query measures
    # the query, not session startup (the reference's timed battery likewise
    # runs inside an already-warm session — S3ParquetBatchReader.scala:38).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    calib = calibration_sec(spark)
    print(f"# __calibration__: {calib}s (fixed work, box-speed probe)", file=sys.stderr)
    io_calib = io_calibration_sec(spark)
    print(
        f"# __io_calibration__: {io_calib}s (fixed parquet scan, I/O-side probe)",
        file=sys.stderr,
    )
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        q = qs[name]
        best = None
        n = 0
        # min-of-N after ONE UNTIMED WARMUP: the warmup pays the cold path
        # (first-touch parquet footer reads, codegen compilation, executor
        # page-cache fill) so the timed runs measure the query's true warm
        # cost — round-4 lesson: without it, persist-heavy queries paid the
        # cold path on every run and min-of-N recorded an 11x artifact.
        # Per-query fault isolation: one broken query must never erase the
        # perf signal of the healthy ones (round-3 lesson — q20's
        # AnalysisException aborted the whole run).
        try:
            q.fn(spark, sf_dir).count()  # untimed warmup execution
            for _ in range(runs):
                t0 = time.time()
                df = q.fn(spark, sf_dir)
                n = df.count()  # force full execution
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_total",
        # a partial total is silently incomparable against a fully-passing
        # run (a crash would read as a speedup) — null it out on any failure
        "value": total if not errors else None,
        "valid": not errors,
        "unit": "sec",
        "queries": timings,
        "runs_per_query": runs,
        "aggregation": "min_after_warmup",
        # NOT part of value/queries: fixed-work box-speed probe — divide
        # round-over-round totals by the calibration ratio to separate
        # machine-load drift from plan regressions (VERDICT r12 #3)
        "calibration_sec": calib,
        # the I/O-side twin (VERDICT r14 #5): CPU + I/O calibration
        # ratios BRACKET box drift — when raw and normalized shared
        # ratios straddle 1.0, attribute per-query with plans, citing
        # whichever instrument matches the row's cost class
        "io_calibration_sec": io_calib,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        result["errors"] = errors
        result["queries_failed"] = len(errors)
        result["partial_total"] = total
    # Truncation-proofing (VERDICT r13 #2): the driver records only a tail
    # window of stdout, and BENCH_r13's tail lost the q01-q05 rows.  Two
    # defenses: (a) persist the FULL report to an in-repo bench_full.json
    # (the way bench_ab.json already is), (b) print the JSON compactly as
    # the LAST line so the one line that matters is the one least likely
    # to scroll out of the window.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_full.json"
    )
    with open(full_path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(result, separators=(",", ":")))


if __name__ == "__main__":
    main()
