"""Mergeable-sketch operators: HyperLogLog, KMV, Bloom filter, Count-Min.

The approximate-query-processing primitives a 100 TB engine publishes as
first-class operators (beyond-reference surface; the reference engine's
only cardinality tooling is exact COUNT(DISTINCT) — SURVEY.md §2 A3).
Sketches matter at scale precisely because they are MERGEABLE: every
sketch here reduces to a bounded-size state (registers / k minima /
bit positions / counters) built with one partial-agg'd shuffle whose
group-key domain is a CONSTANT (2^p registers, k minima, m bits, d*w
cells) — so executor-side combine makes the exchanged state tiny no
matter the input row count, and the same max/min/or/sum merge works
across micro-batches in a stream (see streaming q95).

Cross-engine determinism: hashing is functions/hashing.py's md5-based
family (identical in DuckDB), and every floating-point output is either
a single IEEE division of exact integers or a Python-computed double
literal shared with the oracle SQL — no libm transcendentals, no
order-dependent double sums (HLL's 2^-M register sum is scaled by 2^50
into an EXACT bigint sum; see hll_distinct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long, seeded_md5_long
from ..functions.localframe import local_df

# --- HyperLogLog --------------------------------------------------------------
HLL_P = 10  # 2^10 = 1024 registers → ~3.25% standard error
HLL_M = 1 << HLL_P
HLL_W_BITS = 60 - HLL_P  # md5_long is 60-bit: 10 index bits + 50 suffix bits
# alpha_m * m^2 for m=1024 (Flajolet et al. 2007), times 2^50 to cancel the
# register-sum scaling.  Computed HERE once; the oracle embeds repr() of the
# same Python double, so both engines divide the identical literal.
HLL_ALPHA_M2 = (0.7213 / (1 + 1.079 / HLL_M)) * HLL_M * HLL_M
HLL_NUMERATOR = HLL_ALPHA_M2 * float(1 << HLL_W_BITS)
HLL_LC_THRESHOLD = 2.5 * HLL_M  # raw estimate below this + zero registers → LC


def hll_linear_counting_table() -> list[tuple[int, float]]:
    """Low-range linear-counting lookup: (V, m*ln(m/V)) for every possible
    zero-register count V in [1, m].  ln lives HERE, in Python, once —
    measured fact (round 8): Spark's and DuckDB's libm ln disagree in the
    last bit on 82 of these 1024 inputs, so neither engine may evaluate
    it.  Both sides consume the identical Python double literals: Spark
    as a LocalTableScan literal frame, the oracle as a generated VALUES
    list."""
    import math

    return [(v, HLL_M * math.log(HLL_M / v)) for v in range(1, HLL_M + 1)]


def hll_distinct(df: DataFrame, key_col: str) -> DataFrame:
    """HyperLogLog distinct-count sketch next to the exact answer.

    Register index = h mod 2^p, suffix w = h div 2^p, and the register
    update is rho(w) = (trailing zero count of w) + 1, clamped to the
    suffix width — trailing rather than leading zeros (equivalent for a
    uniform hash) because both engines express it exactly as
    ``length(regexp_extract(bin(w), '0*$'))`` with no log2 call.  The
    harmonic mean sum(2^-M_j) is rescaled by 2^50 so every term
    2^(50-M_j) is an exact integer: the sum is a BIGINT (<= 2^60),
    immune to double summation order, and the estimate is ONE double
    division of two shared-literal operands — bit-identical in DuckDB.

    The low-range correction IS applied (without it the raw estimate ran
    5x high at n << m): when raw <= 2.5m and zero registers exist,
    estimate = m*ln(m/V) — but ln is NEVER evaluated engine-side (the
    two engines' libm ln differ on 82 of the 1024 possible inputs);
    both consume the same Python-computed literal via
    :func:`hll_linear_counting_table`, joined on V, a 1024-row
    driver-literal lookup.  Remaining documented divergence: w == 0
    (probability 2^-50 per key) yields rho = 2 via bin(0) = '0'.

    Plan: map-side hash → groupBy on a 1024-value key (partial agg makes
    the exchange <= 1024 rows per task) → 1-row final agg; the exact
    count_distinct rides a separate aggregate cross-joined (1-row
    broadcast).  At 100 TB the sketch side moves KILOBYTES per executor;
    the exact side is the expensive one — which is the operator's point.

    Output (1 row): m, n_zero_registers, sum_scaled, hll_raw_estimate,
    hll_estimate, exact_distinct.
    """
    regs = hll_register_updates(df, key_col).groupBy("reg").agg(F.max("rho").alias("m_j"))
    exact = df.agg(F.count_distinct(F.col(key_col)).alias("exact_distinct"))
    return hll_from_registers(regs, exact)


def hll_register_updates(df: DataFrame, key_col: str) -> DataFrame:
    """(reg, rho) update rows — the map-side half of the sketch, shared
    by the batch operator and the streaming register-max aggregate (a
    groupBy('reg').max('rho') over these rows is HLL state in EITHER
    execution model; max-merge makes micro-batch order irrelevant)."""
    h = md5_long(F.col(key_col))
    keyed = df.select(h.alias("h")).select(
        (F.col("h") % F.lit(HLL_M)).alias("reg"),
        # h div 2^p via a right shift — NEVER the double `/` (a 60-bit h
        # exceeds double's 53-bit mantissa, so floor(h/1024.0) can be off)
        F.shiftright(F.col("h"), HLL_P).alias("w"),
    )
    tz = F.length(F.regexp_extract(F.bin(F.col("w")), "0*$", 0))
    rho = F.least(tz + F.lit(1), F.lit(HLL_W_BITS))
    return keyed.select("reg", rho.alias("rho"))


def hll_from_registers(regs: DataFrame, exact: DataFrame) -> DataFrame:
    """Assemble the 1-row summary from a (reg, m_j) register table and a
    1-row (exact_distinct) aggregate — the merge-then-finalize step."""
    sketch = regs.agg(
        F.count(F.lit(1)).alias("n_hit"),
        # SQL-expr shift: pyspark's F.shiftleft only takes a literal numBits
        F.sum(F.expr(f"shiftleft(1L, {HLL_W_BITS} - m_j)")).alias("sum_hit"),
    )
    lc_rows = hll_linear_counting_table()
    lc = F.broadcast(
        local_df(regs.sparkSession, lc_rows, "v long, lc_est double").limit(len(lc_rows))
    )
    base = (
        sketch.crossJoin(F.broadcast(exact))
        .select(
            F.lit(HLL_M).alias("m"),
            (F.lit(HLL_M) - F.col("n_hit")).cast("long").alias("n_zero_registers"),
            (
                F.col("sum_hit")
                + (F.lit(HLL_M) - F.col("n_hit")) * F.shiftleft(F.lit(1).cast("long"), HLL_W_BITS)
            ).alias("sum_scaled"),
            F.col("exact_distinct"),
        )
        .withColumn("hll_raw_estimate", F.lit(HLL_NUMERATOR) / F.col("sum_scaled"))
    )
    return base.join(lc, base.n_zero_registers == lc.v, "left").select(
        "m",
        "n_zero_registers",
        "sum_scaled",
        "hll_raw_estimate",
        F.when(
            (F.col("hll_raw_estimate") <= F.lit(HLL_LC_THRESHOLD)) & (F.col("n_zero_registers") > 0),
            F.col("lc_est"),
        )
        .otherwise(F.col("hll_raw_estimate"))
        .alias("hll_estimate"),
        "exact_distinct",
    )


# --- KMV (k minimum values) ---------------------------------------------------
KMV_K = 256
# (k-1) * 2^60 as an exact double (255 * 2^60 needs 8 mantissa bits)
KMV_NUMERATOR = float((KMV_K - 1) * (1 << 60))


def kmv_distinct(df: DataFrame, key_col: str) -> DataFrame:
    """K-minimum-values distinct sketch: keep the k smallest distinct
    60-bit hashes; estimate = (k-1) * 2^60 / h_(k) (hashes uniform on
    [0, 2^60)).  Degenerates to the exact count when fewer than k
    distinct keys exist.

    Plan: distinct on the 8-byte hash (partial agg) → global k smallest
    via orderBy+limit (TakeOrderedAndProject: per-partition k-heaps, k
    rows to the driver stage — never a full sort) → 1-row agg.  The
    mergeable state is "k smallest hashes", union+truncate across
    partitions, which TakeOrdered IS.

    Output (1 row): k, n_in_sketch, kth_hash, kmv_estimate,
    exact_distinct.
    """
    hashes = df.select(md5_long(F.col(key_col)).alias("h")).distinct()
    smallest = hashes.orderBy(F.col("h").asc()).limit(KMV_K)
    sk = smallest.agg(F.count(F.lit(1)).alias("n_in"), F.max("h").alias("kth_hash"))
    exact = df.agg(F.count_distinct(F.col(key_col)).alias("exact_distinct"))
    return sk.crossJoin(F.broadcast(exact)).select(
        F.lit(KMV_K).alias("k"),
        F.col("n_in").alias("n_in_sketch"),
        "kth_hash",
        F.when(F.col("n_in") < KMV_K, F.col("exact_distinct").cast("double"))
        .otherwise(F.lit(KMV_NUMERATOR) / F.col("kth_hash"))
        .alias("kmv_estimate"),
        "exact_distinct",
    )


# --- Bloom filter -------------------------------------------------------------
BLOOM_M = 1 << 14  # 16384 bits
BLOOM_K = 3  # hash functions


def bloom_membership(build: DataFrame, probe: DataFrame, build_key: str, probe_key: str) -> DataFrame:
    """Build an m-bit / k-hash Bloom filter from ``build`` keys, probe it
    with ``probe`` keys, and report the confusion summary against exact
    membership — the bit-level accounting behind join pre-filtering and
    Parquet bloom row-group skipping.

    The filter state is the DISTINCT set-bit positions — at most m =
    16384 rows regardless of input size (the group-key domain is the
    modulus, a constant), so at 100 TB the "filter" side of the probe
    join is a bounded table AQE broadcasts at runtime; no hint needed.
    A probe key is claimed present iff ALL of its k positions are set
    (duplicate positions from colliding hash members collapse first, so
    the test is over its distinct positions).  False negatives are
    structurally impossible — the test asserts n_member_claimed ==
    n_members.

    Plan: build positions = explode k seeded hashes → distinct (bounded
    <= m) [1 shuffle]; probe positions left-join the bit set on pos
    [bounded-side join]; per-key all-bits-set via min(indicator)
    [1 shuffle on probe key]; exact membership = distinct-build-key join
    [1 shuffle]; 1-row summary.

    Output (1 row): m_bits, k_hashes, n_set_bits, n_build_keys,
    n_probes, n_members, n_claimed, n_false_positives.
    """
    bkeys = build.select(F.col(build_key).alias("bk")).distinct()
    bits = (
        bkeys.select(
            F.explode(
                F.array(*[(seeded_md5_long(F.col("bk"), s) % F.lit(BLOOM_M)) for s in range(BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
        .withColumn("is_set", F.lit(1))
    )
    pkeys = probe.select(F.col(probe_key).alias("pk")).distinct()
    ppos = pkeys.select(
        "pk",
        F.explode(
            F.array(*[(seeded_md5_long(F.col("pk"), s) % F.lit(BLOOM_M)) for s in range(BLOOM_K)])
        ).alias("pos"),
    ).distinct()
    claimed = (
        ppos.join(bits, "pos", "left")
        .groupBy("pk")
        .agg(F.min(F.coalesce(F.col("is_set"), F.lit(0))).alias("all_set"))
    )
    member = bkeys.withColumn("is_member", F.lit(1))
    verdict = claimed.join(member, claimed.pk == member.bk, "left").select(
        "pk",
        (F.col("all_set") == 1).cast("int").alias("claimed"),
        F.coalesce(F.col("is_member"), F.lit(0)).alias("member"),
    )
    n_bits = bits.agg(F.count(F.lit(1)).alias("n_set_bits"))
    n_build = bkeys.agg(F.count(F.lit(1)).alias("n_build_keys"))
    summary = verdict.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum("member").cast("long").alias("n_members"),
        F.sum("claimed").cast("long").alias("n_claimed"),
        F.sum(((F.col("claimed") == 1) & (F.col("member") == 0)).cast("int"))
        .cast("long")
        .alias("n_false_positives"),
    )
    return (
        summary.crossJoin(F.broadcast(n_bits))
        .crossJoin(F.broadcast(n_build))
        .select(
            F.lit(BLOOM_M).alias("m_bits"),
            F.lit(BLOOM_K).alias("k_hashes"),
            "n_set_bits",
            "n_build_keys",
            "n_probes",
            "n_members",
            "n_claimed",
            "n_false_positives",
        )
    )


# --- Count-Min sketch ---------------------------------------------------------
CMS_D = 4  # rows (independent hash functions)
CMS_W = 2048  # counters per row
CMS_TOP_K = 20


def cms_topk(df: DataFrame, key_col: str, top_k: int = CMS_TOP_K) -> DataFrame:
    """Count-Min frequency sketch: d x w counter grid, per-key estimate =
    min over the d counters the key hashes into (Cormode & Muthukrishnan
    2005; always >= the true count), reported for the top-k estimated
    keys NEXT TO the exact count so the overestimate is visible.

    Plan: the counter grid is one groupBy on (row, cell) — a d*w = 8192
    value domain, so partial agg bounds the exchange at 8192 rows per
    task and the grid is a CONSTANT-size table (the mergeable state:
    cell-wise +).  Estimates: distinct keys explode their d cells, join
    the bounded grid on (row, cell) — AQE broadcasts it at runtime —
    then min per key [1 shuffle on key].  Exact counts reuse the same
    key shuffle; top-k is orderBy+limit (TakeOrdered).

    Output (top_k rows): key, est_count, exact_count — ordered
    (est desc, key asc).
    """
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (seeded_md5_long(F.col(key_col), r) % F.lit(CMS_W)).alias("c"),
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("rc")
    ).select("rc.r", "rc.c")
    grid = cells.groupBy("r", "c").agg(F.count(F.lit(1)).alias("cnt"))
    exact = df.groupBy(F.col(key_col).alias("key")).agg(F.count(F.lit(1)).alias("exact_count"))
    key_cells = exact.select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (seeded_md5_long(F.col("key"), r) % F.lit(CMS_W)).alias("c"),
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("rc"),
    ).select("key", "rc.r", "rc.c")
    est = key_cells.join(grid, ["r", "c"]).groupBy("key").agg(F.min("cnt").alias("est_count"))
    return (
        est.join(exact, "key")
        .orderBy(F.col("est_count").desc(), F.col("key").asc())
        .limit(top_k)
        .select("key", "est_count", "exact_count")
    )


# --- KMV set operations (cross-source overlap) --------------------------------

KMV_PAIR_K = 128
KMV_PAIR_NUMERATOR = float((KMV_PAIR_K - 1) * (1 << 60))


def kmv_source_jaccard(docs: DataFrame, k: int = KMV_PAIR_K) -> DataFrame:
    """Cross-source content-overlap panel from MERGED KMV sketches — the
    set-operation face of the KMV family: union cardinality and Jaccard
    similarity for every source pair, estimated from two k-row sketches
    (the standard KMV estimators: merged = k smallest of the union;
    D_union ≈ (k-1)·2^60/h_(k); J ≈ |{h ∈ merged: h in BOTH sketches}|/
    |merged|), shown NEXT TO the exact values so the sketch error is
    measurable — the monitor pattern every sketch in this module follows.

    Item domain: distinct word-3-gram hashes per source (the same
    shingles the dedup family indexes), so "overlap" here means shared
    CONTENT, not shared doc ids — the statistic mixture planners read
    before merging two crawls.

    Plan: distinct (source, h) [1 shuffle] → per-source k-smallest via a
    PARTITIONED ranking window [1 shuffle, output ≤ |sources|·k rows —
    a bounded sketch table from then on]; the pair stage runs entirely
    on sketches (≤ |sources|²·k rows); the EXACT side is a shingle-hash
    keyed self-join (a.source < b.source) — the scale-correct shape, the
    per-hash join never broadcasts a corpus-sized table.  When the
    merged sketch holds fewer than k hashes it IS the union, and the
    estimators return the exact values (asserted by the in-repo test).

    Output per (source_a < source_b): n_a, n_b, inter_exact,
    union_exact, union_est, jacc_exact, jacc_est.
    """
    from pyspark.sql import Window

    from ..functions.text import shingles

    hashes = (
        docs.where(F.size(F.split(F.col("text"), " ")) >= 3)
        .select(F.col("source"), F.explode(shingles(F.col("text"))).alias("sh"))
        .select("source", md5_long(F.col("sh")).alias("h"))
        .distinct()
    )
    n_exact = hashes.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("source").orderBy(F.col("h").asc())
    sketch = (
        hashes.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k).drop("rn")
    )

    pairs = (
        n_exact.alias("a")
        .crossJoin(n_exact.alias("b"))
        .where(F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
    )
    sk_a = sketch.select(F.col("source").alias("source_a"), "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    sk_b = sketch.select(F.col("source").alias("source_b"), "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    tagged = pairs.select("source_a", "source_b").join(sk_a, "source_a").unionByName(
        pairs.select("source_a", "source_b").join(sk_b, "source_b").select(
            "source_a", "source_b", "h", "in_a", "in_b"
        )
    )
    merged_rows = tagged.groupBy("source_a", "source_b", "h").agg(
        F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
    )
    wm = Window.partitionBy("source_a", "source_b").orderBy(F.col("h").asc())
    merged = (
        merged_rows.withColumn("rn", F.row_number().over(wm))
        .where(F.col("rn") <= k)
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_merged"),
            F.max("h").alias("m_k"),
            F.sum(F.col("in_a") * F.col("in_b")).alias("inter_in_sketch"),
        )
    )
    inter = (
        hashes.alias("x")
        .join(hashes.alias("y"), "h")
        .where(F.col("x.source") < F.col("y.source"))
        .groupBy(F.col("x.source").alias("source_a"), F.col("y.source").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("inter_exact"))
    )
    return (
        pairs.join(merged, ["source_a", "source_b"])
        .join(inter, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            F.coalesce(F.col("inter_exact"), F.lit(0)).alias("inter_exact"),
            (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("inter_exact"), F.lit(0))).alias(
                "union_exact"
            ),
            F.when(F.col("n_merged") < k, F.col("n_merged").cast("double"))
            .otherwise(F.lit(KMV_PAIR_NUMERATOR) / F.col("m_k").cast("double"))
            .alias("union_est"),
            (
                F.coalesce(F.col("inter_exact"), F.lit(0)).cast("double")
                / (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("inter_exact"), F.lit(0))).cast(
                    "double"
                )
            ).alias("jacc_exact"),
            (F.col("inter_in_sketch").cast("double") / F.col("n_merged").cast("double")).alias(
                "jacc_est"
            ),
        )
    )


# --- Bloom semi-join reduction -------------------------------------------------

def bloom_join_reduction(
    lineitem: DataFrame, orders: DataFrame, priority: str = "1-URGENT"
) -> DataFrame:
    """Bloom-prefiltered fact-dim join — the batch face of the runtime
    row-level filter (Spark's own InjectRuntimeFilter / Parquet bloom
    skipping do exactly this): build an m-bit Bloom filter over the
    FILTERED dim keys (urgent orders), test every fact key against the
    BOUNDED (≤ m-row) bit table map-side, and run the exact join only on
    the claimed rows.  No false negatives ⇒ the join result is provably
    identical to the unfiltered join; the payoff at 100 TB is that the
    fact shuffle carries only the claimed fraction (here the bloom-pass
    selectivity is REPORTED, so the reduction is measurable, not
    asserted).

    Plan: bit table = distinct positions of k seeded hashes [bounded
    ≤ m rows — AQE broadcasts at runtime, no hint needed]; fact keys
    deduped once, verdict joined back on the key [the fact never crosses
    the wire un-reduced]; exact semi-join only on survivors.

    Output (1 row): n_fact_rows, n_fact_keys, n_build_keys,
    n_pass_keys, n_pass_rows, n_joined_rows, revenue_e4 (exact integer
    money over the truly-joined rows).
    """
    from ..operators.joins import money_e4

    build = (
        orders.where(F.col("o_orderpriority") == priority)
        .select(F.col("o_orderkey").alias("bk"))
        .distinct()
    )
    bits = (
        build.select(
            F.explode(
                F.array(*[(seeded_md5_long(F.col("bk"), s) % F.lit(BLOOM_M)) for s in range(BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
        .withColumn("is_set", F.lit(1))
    )
    fact = lineitem.select(
        F.col("l_orderkey").alias("pk"),
        money_e4(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("rev_e4"),
    )
    pkeys = fact.select("pk").distinct()
    ppos = pkeys.select(
        "pk",
        F.explode(
            F.array(*[(seeded_md5_long(F.col("pk"), s) % F.lit(BLOOM_M)) for s in range(BLOOM_K)])
        ).alias("pos"),
    ).distinct()
    verdict = (
        ppos.join(bits, "pos", "left")
        .groupBy("pk")
        .agg(F.min(F.coalesce(F.col("is_set"), F.lit(0))).alias("all_set"))
        .where(F.col("all_set") == 1)
        .select("pk")
    )
    passed = fact.join(verdict, "pk")
    joined = passed.join(build, passed.pk == build.bk)

    n_fact = fact.agg(
        F.count(F.lit(1)).alias("n_fact_rows"),
        F.count_distinct(F.col("pk")).alias("n_fact_keys"),
    )
    n_build = build.agg(F.count(F.lit(1)).alias("n_build_keys"))
    n_pass = passed.agg(
        F.count_distinct(F.col("pk")).alias("n_pass_keys"),
        F.count(F.lit(1)).alias("n_pass_rows"),
    )
    n_join = joined.agg(
        F.count(F.lit(1)).alias("n_joined_rows"),
        F.sum("rev_e4").cast("long").alias("revenue_e4"),
    )
    return (
        n_fact.crossJoin(F.broadcast(n_build))
        .crossJoin(F.broadcast(n_pass))
        .crossJoin(F.broadcast(n_join))
        .select(
            "n_fact_rows",
            "n_fact_keys",
            "n_build_keys",
            "n_pass_keys",
            "n_pass_rows",
            "n_joined_rows",
            "revenue_e4",
        )
    )


def hll_distinct_by(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """GROUPED HyperLogLog — distinct ``key_col`` per ``group_col``, one
    sketch per group next to each group's exact count: the "distinct per
    dimension" production shape (distinct users per event type / per
    tenant / per day) where state must stay |groups| × 1024 registers no
    matter how many rows flow through.

    Same register math as :func:`hll_distinct` (shared literal
    linear-counting table, exact 2^50-scaled harmonic sums — ln never
    evaluated engine-side); the only change is the register key becomes
    (group, reg), so the exchange is ≤ |groups|·1024 rows per task.

    Output per group: m, n_zero_registers, sum_scaled, hll_raw_estimate,
    hll_estimate, exact_distinct.
    """
    h = md5_long(F.col(key_col))
    keyed = df.select(F.col(group_col).alias("g"), h.alias("h")).select(
        "g",
        (F.col("h") % F.lit(HLL_M)).alias("reg"),
        F.shiftright(F.col("h"), HLL_P).alias("w"),
    )
    tz = F.length(F.regexp_extract(F.bin(F.col("w")), "0*$", 0))
    rho = F.least(tz + F.lit(1), F.lit(HLL_W_BITS))
    regs = keyed.select("g", "reg", rho.alias("rho")).groupBy("g", "reg").agg(
        F.max("rho").alias("m_j")
    )
    sketch = regs.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.sum(F.expr(f"shiftleft(1L, {HLL_W_BITS} - m_j)")).alias("sum_hit"),
    )
    exact = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count_distinct(F.col(key_col)).alias("exact_distinct")
    )
    lc_rows = hll_linear_counting_table()
    lc = F.broadcast(
        local_df(df.sparkSession, lc_rows, "v long, lc_est double").limit(len(lc_rows))
    )
    base = (
        sketch.join(exact, "g")
        .select(
            F.col("g").alias(group_col),
            F.lit(HLL_M).alias("m"),
            (F.lit(HLL_M) - F.col("n_hit")).cast("long").alias("n_zero_registers"),
            (
                F.col("sum_hit")
                + (F.lit(HLL_M) - F.col("n_hit")) * F.shiftleft(F.lit(1).cast("long"), HLL_W_BITS)
            ).alias("sum_scaled"),
            F.col("exact_distinct"),
        )
        .withColumn("hll_raw_estimate", F.lit(HLL_NUMERATOR) / F.col("sum_scaled"))
    )
    return base.join(lc, base.n_zero_registers == lc.v, "left").select(
        group_col,
        "m",
        "n_zero_registers",
        "sum_scaled",
        "hll_raw_estimate",
        F.when(
            (F.col("hll_raw_estimate") <= F.lit(HLL_LC_THRESHOLD)) & (F.col("n_zero_registers") > 0),
            F.col("lc_est"),
        )
        .otherwise(F.col("hll_raw_estimate"))
        .alias("hll_estimate"),
        "exact_distinct",
    )
