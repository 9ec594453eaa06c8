#!/usr/bin/env bash
# Cluster-submit template for this engine at ~100 TB input on ~1000
# executors — the concrete form of SCALE.md's "local[32] knobs ->
# 1000-executor knobs" mapping.  Every plan in the registry is
# size-agnostic; THIS file is what changes between the test box and a
# real cluster.  Values assume 4-core/24 GB executors; nothing in the
# repo hard-codes parallelism outside session.py and the
# state-partition contexts (which size by key cardinality and transfer
# unchanged).
#
# Usage: deploy/submit_100tb.sh <job.py> [job args...]
set -euo pipefail

JOB="$1"; shift

ARGS=(
  --deploy-mode cluster
  --num-executors 1000
  --executor-cores 4
  --executor-memory 20g
  # Arrow/pandas UDF stages (the mapInPandas kernels) live in overhead
  --conf spark.executor.memoryOverhead=4g
  # driver state is bounded by design: top-k rows, centroids, query sets
  --conf spark.driver.memory=16g

  # shuffle sizing: ~2-3x total cores; AQE coalesces DOWN, never splits UP
  --conf spark.sql.shuffle.partitions=10000
  --conf spark.sql.adaptive.enabled=true
  --conf spark.sql.adaptive.coalescePartitions.enabled=true
  # runtime skew backstop; hot keys can also be salted in-plan
  # (operators/partitioning.py salted_join — the q101 operator), and the
  # two compose: salting bounds any task's hot-key share at 1/salt_buckets
  # by construction, AQE splits whatever residual skew remains
  --conf spark.sql.adaptive.skewJoin.enabled=true
  --conf spark.sql.files.maxPartitionBytes=134217728

  # broadcasts: every broadcast in this repo is an explicit F.broadcast of
  # a semantically-small side (dims / query sets / 1-row aggregates),
  # certified by the plan gates — the threshold only governs accidental
  # ones, keep it modest
  --conf spark.sql.autoBroadcastJoinThreshold=33554432

  # streaming state: RocksDB instead of the in-memory default; state per
  # key is bounded (TTL markers, SpaceSaving caps, session gaps) so size
  # is arrival-rate-bound either way
  --conf spark.sql.streaming.stateStore.providerClass=org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider

  # Python stages are Arrow-batched by contract (plan-gate enforced)
  --conf spark.sql.execution.arrow.pyspark.enabled=true
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=10000

  # resilience on preemptible fleets
  --conf spark.speculation=true
  --conf spark.decommission.enabled=true
  --conf spark.storage.decommission.shuffleBlocks.enabled=true

  # timezone is load-bearing: every timestamp oracle assumes UTC (session.py)
  --conf spark.sql.session.timeZone=UTC
)

# lakehouse formats: the env-gated paths activate with the jars present —
# uncomment to enable (versions per your distro):
# ARGS+=(--packages io.delta:delta-spark_2.13:4.0.0,org.apache.hudi:hudi-spark3.5-bundle_2.13:1.0.0,org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:1.7.0)

spark-submit "${ARGS[@]}" "$JOB" "$@"

# Notes per operator family (details + measurements in SCALE.md):
# - dedup (minhash/simhash/winnow/segments): candidate joins are 8-byte
#   hash equi-joins; bucket the persistent `seen`/index tables by hash so
#   incremental anti-joins co-locate (operators/joins.bucketed_join).
# - ANN / semantic dedup: raise n_planes with log2(N) (plan_planes) and
#   n_centroids with N (SemDeDup knob — SCALE.md's measured 1/k curve);
#   per-task memory is block x cluster, never cluster^2.
# - winnow fingerprints: max_doc_chars (64 KiB default) caps any single
#   doc's window partition; the exchange is ~16 B/char and parallelizes
#   per chunk.
# - checkpoint()/localCheckpoint(): the iterative operators flag the
#   trade in their docstrings — on a cluster prefer checkpoint() to
#   durable storage for executor-loss resilience.
# - PQ / IVFPQ: codebooks are bounded driver collects (PQ_CODES rows);
#   the codes table is ~4 B/vector — persist it bucketed by cluster id
#   (build_ivf_index pattern) so serving scans only probed lists.
# - power iteration (embedding_top_direction): s_i = q_i.v peaks at
#   n*QUANT^2*d*QUANT — beyond ~10^7 rows rescale s_i by a constant
#   power of two per iteration (exactness survives: both engines shift
#   identically) before the d-row aggregate.
# - grouped sketches/monitors (hll_by_type, grouped heavy hitters,
#   drift, MAD): state is |groups| x constant — size executors by the
#   CATEGORY domain, not the feed; MAD's ranking windows are per-type
#   sorts (q53 trade) — swap to percentile_approx (q78) when a category
#   exceeds one task's sort budget.
