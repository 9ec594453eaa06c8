"""Mergeable-sketch operators: estimator quality bounds, structural sketch
guarantees (CMS never underestimates, Bloom never false-negatives), and the
duplication-invariance that IS the mergeability property (a distinct sketch
built from df ∪ df must equal the sketch of df — register max / k-min /
bit-or merges absorb duplicates by construction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ss_hudi_delta_poc_spark.operators import sketches
from spark_ss_hudi_delta_poc_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_hll_estimate_within_error_bound(spark):
    """p=10 → ~3.25% standard error; assert within 4 sigma at both a
    low-range (linear-counting branch) and a synthetic larger input."""
    r = sketches.hll_distinct(load(spark, SF, "orders"), "o_custkey").collect()[0]
    assert r.exact_distinct > 0
    assert abs(r.hll_estimate - r.exact_distinct) / r.exact_distinct < 0.13
    big = spark.range(50_000).select(F.col("id").alias("k"))
    r2 = sketches.hll_distinct(big, "k").collect()[0]
    assert abs(r2.hll_estimate - 50_000) / 50_000 < 0.13
    # raw (uncorrected) estimate is also reported
    assert r2.hll_raw_estimate > 0


def test_hll_low_range_uses_linear_counting(spark):
    """At n << m the raw harmonic estimate runs several-x high (measured
    5.4x at n=150); the linear-counting branch must engage and fix it."""
    r = sketches.hll_distinct(load(spark, SF, "orders"), "o_custkey").collect()[0]
    assert r.n_zero_registers > 0
    assert r.hll_raw_estimate > 2 * r.exact_distinct  # raw is way off...
    assert abs(r.hll_estimate - r.exact_distinct) / r.exact_distinct < 0.1  # ...LC is not


def test_hll_duplication_invariant(spark):
    """sketch(df ∪ df) == sketch(df): register max absorbs duplicates —
    the merge property that makes HLL a one-pass distributed distinct."""
    df = load(spark, SF, "orders").select("o_custkey")
    a = sketches.hll_distinct(df, "o_custkey").collect()[0]
    b = sketches.hll_distinct(df.union(df), "o_custkey").collect()[0]
    assert a == b


def test_kmv_estimate_and_duplication_invariant(spark):
    df = load(spark, SF, "lineitem")
    r = sketches.kmv_distinct(df, "l_partkey").collect()[0]
    # 200 distinct parts < k=256 → exact fallback
    assert r.n_in_sketch == r.exact_distinct
    assert r.kmv_estimate == float(r.exact_distinct)
    # above-k path: synthetic 20k distinct, se ~ 1/sqrt(255) ≈ 6.3%
    big = spark.range(20_000).select(F.col("id").cast("string").alias("k"))
    r2 = sketches.kmv_distinct(big, "k").collect()[0]
    assert r2.n_in_sketch == sketches.KMV_K
    assert abs(r2.kmv_estimate - 20_000) / 20_000 < 0.25
    a = sketches.kmv_distinct(df, "l_partkey").collect()[0]
    b = sketches.kmv_distinct(df.union(df), "l_partkey").collect()[0]
    assert a == b


def test_bloom_no_false_negatives(spark):
    """Every true member must be claimed: n_claimed = n_members + n_fp
    exactly, because false negatives are structurally impossible."""
    r = sketches.bloom_membership(
        load(spark, SF, "orders"), load(spark, SF, "customer"), "o_custkey", "c_custkey"
    ).collect()[0]
    assert r.n_claimed == r.n_members + r.n_false_positives
    assert 0 < r.n_set_bits <= min(sketches.BLOOM_M, sketches.BLOOM_K * r.n_build_keys)


def test_bloom_disjoint_probe_only_false_positives(spark):
    """Probing keys disjoint from the build set: any claim is a false
    positive, and with a lightly-loaded filter most probes miss."""
    build = spark.range(0, 1000).select(F.concat(F.lit("b"), F.col("id")).alias("k"))
    probe = spark.range(0, 1000).select(F.concat(F.lit("p"), F.col("id")).alias("k"))
    r = sketches.bloom_membership(build, probe, "k", "k").collect()[0]
    assert r.n_members == 0
    assert r.n_claimed == r.n_false_positives
    # load factor 3000/16384 → fp rate ~ 0.18^3 ≈ 0.6% → <5% with slack
    assert r.n_false_positives < 50


def test_cms_never_underestimates_and_finds_heavy_keys(spark):
    rows = sketches.cms_topk(load(spark, SF, "lineitem"), "l_suppkey").collect()
    assert rows
    for r in rows:
        assert r.est_count >= r.exact_count
    # the estimated top key must be a genuinely heavy key: its exact count
    # must be within the true top-5 (collision noise can reorder, not
    # fabricate a cold key at sf0.001's 10-supplier key space)
    exact_top = [
        r["l_suppkey"]
        for r in load(spark, SF, "lineitem")
        .groupBy("l_suppkey")
        .count()
        .orderBy(F.col("count").desc(), F.col("l_suppkey").asc())
        .limit(5)
        .collect()
    ]
    assert rows[0].key in exact_top


def test_cms_grid_is_bounded(spark):
    """The counter grid the estimates join is at most d*w rows — the
    constant-size mergeable state (cell-wise +) that makes CMS stream-
    and scale-safe."""
    df = load(spark, SF, "lineitem")
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (
                            sketches.seeded_md5_long(F.col("l_suppkey"), r) % F.lit(sketches.CMS_W)
                        ).alias("c"),
                    )
                    for r in range(sketches.CMS_D)
                ]
            )
        ).alias("rc")
    ).select("rc.r", "rc.c")
    n = cells.groupBy("r", "c").count().count()
    assert n <= sketches.CMS_D * sketches.CMS_W


def test_hll_lc_table_covers_full_domain():
    tab = sketches.hll_linear_counting_table()
    assert len(tab) == sketches.HLL_M
    assert tab[0][0] == 1 and tab[-1][0] == sketches.HLL_M
    assert tab[-1][1] == 0.0  # V == m → ln(1) == 0


def test_kmv_jaccard_exact_when_under_k(spark):
    """Sources with fewer than k distinct shingles per pair-union must
    return the EXACT union and Jaccard (merged sketch IS the union)."""
    docs = load(spark, SF, "documents")
    rows = sketches.kmv_source_jaccard(docs).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.union_exact == r.n_a + r.n_b - r.inter_exact
        assert 0.0 <= r.jacc_est <= 1.0
        if r.union_exact < sketches.KMV_PAIR_K:
            # under-k: estimators must be exact, not approximate
            assert r.union_est == float(r.union_exact)
            assert r.jacc_est == r.jacc_exact


def test_kmv_jaccard_estimator_quality(spark):
    """Above-k pairs: union estimate within KMV error (se ~ 1/sqrt(k-1)
    ≈ 8.9% at k=128; assert 4 sigma), Jaccard estimate within 0.25
    absolute (binomial on k draws)."""
    docs = load(spark, SF, "documents")
    rows = [r for r in sketches.kmv_source_jaccard(docs).collect()
            if r.union_exact >= sketches.KMV_PAIR_K]
    for r in rows:
        assert abs(r.union_est - r.union_exact) / r.union_exact < 0.36
        assert abs(r.jacc_est - r.jacc_exact) < 0.25


def test_bloom_join_reduction_identical_to_plain_join(spark):
    """No false negatives ⇒ the bloom-prefiltered join result must equal
    the plain join, row count and revenue both."""
    li, orders = load(spark, SF, "lineitem"), load(spark, SF, "orders")
    r = sketches.bloom_join_reduction(li, orders).collect()[0]
    from spark_ss_hudi_delta_poc_spark.operators.joins import money_e4

    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey").distinct()
    plain = (
        li.join(urgent, li.l_orderkey == urgent.o_orderkey)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money_e4(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))).alias("rev"),
        )
        .collect()[0]
    )
    assert r.n_joined_rows == plain.n
    assert r.revenue_e4 == plain.rev
    # the filter may pass extra keys (false positives) but never fewer
    assert r.n_pass_rows >= r.n_joined_rows
    assert r.n_pass_keys >= r.n_build_keys - (r.n_fact_keys - r.n_pass_keys)  # sanity
    # and it must actually reduce the fact side on this selective build
    assert r.n_pass_rows < r.n_fact_rows


def test_hll_by_group_matches_global_hll_math(spark):
    """Per-group estimates must obey the same error bound as the global
    sketch, and a single-group input must equal hll_distinct exactly."""
    ev = load(spark, SF, "events")
    rows = sketches.hll_distinct_by(ev, "event_type", "user_id").collect()
    assert rows
    for r in rows:
        assert abs(r.hll_estimate - r.exact_distinct) / r.exact_distinct < 0.13
    one = ev.where(F.col("event_type") == rows[0].event_type)
    g = sketches.hll_distinct_by(one, "event_type", "user_id").collect()[0]
    base = sketches.hll_distinct(one, "user_id").collect()[0]
    assert (g.sum_scaled, g.hll_estimate, g.exact_distinct) == (
        base.sum_scaled,
        base.hll_estimate,
        base.exact_distinct,
    )
