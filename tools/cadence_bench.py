"""Production-vs-audit cadence companion (VERDICT r12 #7).

The bench's q103/q104/q107 rows force their maintenance at the most
hostile cadence BY DESIGN (per-batch SCD2 log compaction, band/feature
folds every ~2 increments) — they are audit ceilings and regression
canaries, not the numbers a real deployment would see.  This tool
times each maintenance query at BOTH cadences back to back (min-of-2
after an untimed warmup, bench.py's discipline) and prints one JSON
line per (query, cadence); the measured pairs are recorded in
SCALE.md.

    python tools/cadence_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_ss_hudi_delta_poc_spark.session import get_spark  # noqa: E402
from spark_ss_hudi_delta_poc_spark.streaming import incremental  # noqa: E402
from spark_ss_hudi_delta_poc_spark.streaming import jobs  # noqa: E402


def timed(fn) -> float:
    fn().count()  # untimed warmup
    best = None
    for _ in range(2):
        t0 = time.time()
        fn().count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="cadence-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    rows = [
        ("q103_stream_scd2", "audit_compact_every_batch",
         lambda: jobs.stream_scd2_history(spark, sf, compact_threshold=1)),
        ("q103_stream_scd2", "production_compact_threshold_16",
         lambda: jobs.stream_scd2_history(spark, sf, compact_threshold=16)),
        ("q104_stream_fuzzy", "audit_fold_threshold_2",
         lambda: jobs.stream_fuzzy_dedup_ingest(spark, sf, fold_threshold=2)),
        ("q104_stream_fuzzy", "production_fold_threshold_16",
         lambda: jobs.stream_fuzzy_dedup_ingest(spark, sf, fold_threshold=16)),
        ("q107_stream_dsir", "audit_fold_threshold_2",
         lambda: jobs.stream_dsir_recipe(spark, sf, fold_threshold=2)),
        ("q107_stream_dsir", "production_fold_threshold_16",
         lambda: jobs.stream_dsir_recipe(spark, sf, fold_threshold=16)),
        ("q110_stream_bm25", "audit_fold_threshold_2",
         lambda: jobs.stream_bm25_index(spark, sf, fold_threshold=2)),
        ("q110_stream_bm25", "production_fold_threshold_16",
         lambda: jobs.stream_bm25_index(spark, sf, fold_threshold=16)),
        ("q111_stream_ann_index", "audit_fold_threshold_2",
         lambda: jobs.stream_ann_index(spark, sf, fold_threshold=2)),
        ("q111_stream_ann_index", "production_fold_threshold_16",
         lambda: jobs.stream_ann_index(spark, sf, fold_threshold=16)),
        ("q112_stream_shard_export", "audit_fold_threshold_2",
         lambda: jobs.stream_shard_export(spark, sf, fold_threshold=2)),
        ("q112_stream_shard_export", "production_fold_threshold_16",
         lambda: jobs.stream_shard_export(spark, sf, fold_threshold=16)),
        ("q114_stream_ann_query_serving", "audit_fold_threshold_2",
         lambda: jobs.stream_ann_query_serving(spark, sf, fold_threshold=2)),
        ("q114_stream_ann_query_serving", "production_fold_threshold_16",
         lambda: jobs.stream_ann_query_serving(spark, sf, fold_threshold=16)),
        # q115's cadence knob is the retrain-skew threshold, not the
        # fold: audit = retrain after EVERY increment (skew 0); the
        # production threshold never fires on the even synthetic corpus,
        # so that row records the retrain-free ingest floor
        ("q115_stream_ann_autoretrain", "audit_retrain_every_increment",
         lambda: jobs.stream_ann_autoretrain(spark, sf, retrain_skew=0.0)),
        ("q115_stream_ann_autoretrain", "production_skew_retrain_free",
         lambda: jobs.stream_ann_autoretrain(
             spark, sf, retrain_skew=incremental.ANN_RETRAIN_SKEW)),
        # q108/q109 maintain pure replace-state (no append table, no
        # fold knob): one cadence IS the production cadence — recorded
        # once each so SCALE.md's table covers every streaming twin
        ("q108_stream_temperature", "replace_state_single_cadence",
         lambda: jobs.stream_temperature_recipe(spark, sf)),
        ("q109_stream_drift", "replace_state_single_cadence",
         lambda: jobs.stream_drift_monitor(spark, sf)),
    ]
    only = set(sys.argv[2:])  # optional query-name subset for new rows
    for name, cadence, fn in rows:
        if only and name not in only:
            continue
        print(json.dumps({"query": name, "cadence": cadence, "sec": timed(fn)}), flush=True)
