"""Property-based tests (hypothesis) for the pure algorithmic kernels —
no SparkSession needed, so hundreds of random cases run in milliseconds.
These pin the mathematical invariants the distributed operators build on;
the Spark-level equivalence tests live in test_operators.py.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_ss_hudi_delta_poc_spark.operators.partitioning import zvalue_sql
from spark_ss_hudi_delta_poc_spark.operators.profiling import _mg_update


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=300),
       st.integers(min_value=2, max_value=10))
def test_misra_gries_never_loses_a_heavy_hitter(stream, capacity):
    """The MG guarantee heavy_hitters relies on: any item with frequency
    > n/capacity MUST survive in the counter set (the false-positive side
    is allowed and handled by the exact verify pass)."""
    counters = _mg_update({}, stream, capacity)
    assert len(counters) <= capacity
    n = len(stream)
    for v in set(stream):
        if stream.count(v) * capacity > n:
            assert v in counters, f"heavy item {v} evicted"


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=200),
       st.integers(min_value=2, max_value=8),
       st.integers(min_value=1, max_value=5))
def test_misra_gries_split_streams_union_covers(stream, capacity, n_parts):
    """The distributed argument: splitting the stream over partitions and
    unioning per-partition MG survivors still covers every global heavy
    hitter (pigeonhole: an item <= n_i/capacity in EVERY partition sums
    to <= n/capacity globally)."""
    n = len(stream)
    chunk = max(1, n // n_parts)
    parts = [stream[i : i + chunk] for i in range(0, n, chunk)]
    union = set()
    for p in parts:
        union |= set(_mg_update({}, p, capacity))
    for v in set(stream):
        if stream.count(v) * capacity > n:
            assert v in union


def _morton_ref(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**16 - 1),
       st.integers(min_value=0, max_value=2**16 - 1))
def test_zvalue_sql_matches_reference_interleave(a, b):
    """The ANSI-SQL Morton interleave (the oracle side of q74) must equal
    the bit-twiddling reference for any 16-bit pair."""
    got = duckdb.sql(f"SELECT {zvalue_sql(str(a), str(b), 16)} AS z").fetchone()[0]
    assert got == _morton_ref(a, b, 16)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=5),
       st.integers(min_value=1, max_value=4))
def test_shingle_semantics_match_oracle_ctes(texts, n):
    """The pandas-UDF shingle builder's per-row closure semantics (split on
    single spaces keeping empties, n-gram join by one space, distinct,
    <n words -> empty) must equal the DuckDB CTE formulation the oracles
    embed — checked WITHOUT Spark via the same DuckDB expression.

    Compared as SETS: DuckDB's list_distinct does not preserve first-seen
    order, and every shingle consumer (minhash min-agg, jaccard set ops,
    exploded contamination grams) is order-free by construction — no
    oracle emits the raw array."""
    for t in texts:
        # the documented reference semantics (functions/text.py:shingles)
        w = t.split(" ")
        m = len(w) - n + 1
        want = list(dict.fromkeys(" ".join(w[i : i + n]) for i in range(m))) if m > 0 else []
        got = duckdb.sql(
            """
            WITH d AS (SELECT ? AS text),
            w AS (SELECT string_split(text, ' ') AS w FROM d)
            SELECT CASE WHEN len(w) - ? + 1 <= 0 THEN []
                   ELSE list_distinct(list_transform(range(1, len(w) - ? + 2),
                        i -> array_to_string(w[i : i + ? - 1], ' ')))
                   END AS sh FROM w
            """,
            params=[t, n, n, n],
        ).fetchone()[0]
        assert set(got) == set(want) and len(got) == len(want), (t, n)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 48) - 1))
def test_affine_family_stays_in_bigint_and_separates(h):
    """The MinHash affine family's overflow-safety contract: for any
    48-bit base hash, every intermediate of (a*(h mod p) + b) stays inside
    signed 64-bit BEFORE the final mod (what the Spark/DuckDB expressions
    actually compute), and the 12 family members of one input are not all
    equal (the family genuinely perturbs)."""
    from spark_ss_hudi_delta_poc_spark.functions.hashing import (
        AFFINE_PRIME,
        affine_constants,
    )

    vals = []
    for a, b in affine_constants(12):
        raw = a * (h % AFFINE_PRIME) + b
        assert raw < (1 << 63)
        vals.append(raw % AFFINE_PRIME)
    # the family genuinely perturbs: 12 distinct (a, b) pairs can only
    # all collide if the constants themselves coincided
    assert len(set(vals)) >= 2


def test_affine_family_members_have_distinct_argmin_shingles():
    """The degeneracy regression gate (ADVICE r5, high): a MinHash family
    whose members are monotone in the base hash picks the SAME argmin
    shingle for every member, collapsing the K signatures to one.  With
    full-range multipliers mod p, independent members of a 200-shingle
    set each pick a ~uniform argmin — require a healthy spread of
    DISTINCT argmins (12 uniform draws from 200 give ~11.7 distinct in
    expectation; monotone members all give 1)."""
    import hashlib

    from spark_ss_hudi_delta_poc_spark.functions.hashing import (
        AFFINE_PRIME,
        affine_constants,
    )

    shingles = [f"tok{i} tok{i + 1} tok{i + 2}" for i in range(200)]
    base = [int(hashlib.md5(s.encode()).hexdigest()[:12], 16) for s in shingles]
    argmins = []
    for a, b in affine_constants(12):
        vals = [(a * (h % AFFINE_PRIME) + b) % AFFINE_PRIME for h in base]
        argmins.append(min(range(len(vals)), key=vals.__getitem__))
    assert len(set(argmins)) >= 8, argmins


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=3), min_size=1, max_size=40
    )
)
def test_segment_reassembly_is_identity_without_duplicates(words):
    """Pure-python model of segment_dedup's split/rebuild algebra: joining
    disjoint 10-word segments with single spaces reconstructs the exact
    original text (the Spark operator relies on this to return unmodified
    clean_text for boilerplate-free docs)."""
    text = " ".join(words)
    w = text.split(" ")
    segs = [" ".join(w[i : i + 10]) for i in range(0, len(w), 10)]
    assert " ".join(segs) == text


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="aB 1!.x-", max_size=60))
def test_normalization_is_idempotent(text):
    """dedup_normalized's canonical form is a fixpoint: canonicalizing an
    already-canonical string changes nothing (so re-running the pass over
    a cleaned corpus is a no-op, and the DuckDB mirror agrees by
    construction)."""
    import re

    def canon(t):
        return re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", t.lower())).strip()

    assert canon(canon(text)) == canon(text)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=10**7),  # budget
    st.lists(st.integers(min_value=1, max_value=10**9), min_size=1, max_size=12),
)
def test_rebalance_rate_algebra(budget, source_sizes):
    """curation_rebalance's integer rate math: every rate is in (0, 1e6],
    and the expected kept tokens per source never exceed its equal share
    of the budget (small sources saturate at rate 1.0 instead)."""
    import math

    n = len(source_sizes)
    for st_tokens in source_sizes:
        rate = min(1_000_000, math.floor((budget * 1_000_000) / (n * st_tokens)))
        assert 0 <= rate <= 1_000_000
        expected_kept = st_tokens * rate / 1_000_000
        assert expected_kept <= budget / n + 1e-6 or rate == 1_000_000
        if rate == 1_000_000:
            assert st_tokens * n <= budget or (budget * 1_000_000) // (n * st_tokens) >= 1_000_000


def test_minhash_band_collision_tracks_lsh_s_curve():
    """End-to-end family quality gate: with k=12, b=4 (r=3), the banded
    collision probability must track 1-(1-J^r)^b.  The degenerate r5
    family behaved like ~J instead: ~28x the theoretical candidate rate
    at J=0.1 (candidate blowup at scale) and ~10% of true near-dups
    missed at J=0.9.  Measured over deterministic synthetic pairs with
    exact Jaccard: at J=0.1 collisions must stay rare (<= 0.05; the
    degenerate family gave ~0.11) and at J=0.9 near-certain (>= 0.95;
    degenerate ~0.90)."""
    import hashlib
    import random

    from spark_ss_hudi_delta_poc_spark.functions.hashing import (
        AFFINE_PRIME,
        affine_constants,
    )

    fam = affine_constants(12)

    def base(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    def signature(hashes):
        return [
            min((a * (h % AFFINE_PRIME) + b) % AFFINE_PRIME for h in hashes)
            for a, b in fam
        ]

    def collide(j, rng, u=150):
        shared = int(round(j * u))
        uniq = (u - shared) // 2
        pool = [f"s{rng.random()}" for _ in range(shared + 2 * uniq)]
        ha = [base(x) for x in pool[: shared + uniq]]
        hb = [base(x) for x in pool[:shared] + pool[shared + uniq :]]
        sa, sb = signature(ha), signature(hb)
        return any(sa[i * 3 : i * 3 + 3] == sb[i * 3 : i * 3 + 3] for i in range(4))

    rng = random.Random(42)
    low = sum(collide(0.1, rng) for _ in range(200)) / 200
    high = sum(collide(0.9, rng) for _ in range(200)) / 200
    assert low <= 0.05, low   # theory 0.004; degenerate family ~0.11
    assert high >= 0.95, high  # theory 0.995; degenerate family ~0.90


@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet="abcdefgh", min_size=11, max_size=24),
    st.text(alphabet="qrstuvwx", min_size=0, max_size=30),
    st.text(alphabet="qrstuvwx", min_size=0, max_size=30),
)
def test_winnowing_guarantee_shared_substring_shares_fingerprint(common, pre, post):
    """Winnowing's defining theorem (Schleimer et al.): any substring of
    length >= k+w-1 shared by two documents yields at least one shared
    fingerprint.  Pure-python mirror of the operator/oracle definition
    (k=8 char-grams, w=4 window, min-hash per window) over a planted
    common substring with disjoint-alphabet context."""
    import hashlib

    K, W = 8, 4

    def fps(text):
        t = text.lower()
        if len(t) < K:
            return set()
        hs = [
            int(hashlib.md5(t[i : i + K].encode()).hexdigest()[:15], 16)
            for i in range(len(t) - K + 1)
        ]
        return {min(hs[i : i + W]) for i in range(len(hs))}

    a = pre + common + post
    b = "yz" + common + "zy"
    assert len(common) >= K + W - 1
    assert fps(a) & fps(b), (a, b)


def _one_hop_drops(ids, near):
    """Reference implementation of the semantic_dedup keep rule: drop i
    iff some j < i (by id) with near(i, j)."""
    dropped = set()
    for i in ids:
        if any(j < i and near(i, j) for j in ids):
            dropped.add(i)
    return dropped


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=20, unique=True),
    st.sets(st.tuples(st.integers(0, 30), st.integers(0, 30))),
)
def test_semantic_one_hop_rule_invariants(ids, near_pairs):
    """The one-hop drop rule semantic_dedup implements (per cluster):
    (1) the min id is always kept; (2) the rule is order-free — any
    evaluation order produces the same drop set (unlike sequential
    greedy, whose result depends on processing order); (3) every
    dropped item has a KEPT-or-dropped smaller near neighbor, and in
    particular at least one smaller near neighbor exists."""
    sym = {(a, b) for a, b in near_pairs} | {(b, a) for a, b in near_pairs}

    def near(i, j):
        return i != j and (i, j) in sym

    dropped = _one_hop_drops(ids, near)
    assert min(ids) not in dropped
    # order-free: recomputing over any permutation is identical by
    # construction (the rule quantifies over the SET) — recheck reversed
    assert _one_hop_drops(list(reversed(ids)), near) == dropped
    for i in dropped:
        assert any(j < i and near(i, j) for j in ids)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=2**60), min_size=1, max_size=50))
def test_epoch_shuffle_rank_is_total_and_dense(keys):
    """The (shuffle_key, id) order epoch_shuffle ranks by is total even
    under key collisions (id is unique), so positions are dense 1..n in
    every shard — the property the training reader relies on."""
    rows = [(k, i) for i, k in enumerate(keys)]  # unique ids
    n_shards = 4
    shards: dict[int, list] = {}
    for k, i in rows:
        shards.setdefault(k % n_shards, []).append((k, i))
    seen = set()
    for shard, members in shards.items():
        members.sort()
        assert len(set(members)) == len(members)  # total order
        seen.update(i for _, i in members)
    assert seen == {i for _, i in rows}  # partition of the input


@settings(max_examples=100, deadline=None)
@given(
    st.text(alphabet="abcdef gh", min_size=30, max_size=120),
    st.sets(st.integers(min_value=0, max_value=14), max_size=4),
)
def test_phash_band_pigeonhole_recall(base, edit_segments):
    """The banding guarantee multimodal_phash_pairs relies on: a pair
    differing in <= 4 of the 15 nibbles ALWAYS shares at least one of
    the 5 bands (3 nibbles each) — so candidate recall is 1.0 for edits
    confined to <= 4 segments, before any verify step."""
    from spark_ss_hudi_delta_poc_spark.operators.multimodal import (
        PHASH_BANDS,
        fake_phash,
    )

    payload = base.encode()
    ph = fake_phash(payload)
    # flip the chosen nibbles arbitrarily (simulates <= 4 modified segments)
    ph2 = ph
    for seg in edit_segments:
        ph2 ^= 0b1010 << (4 * seg)
    bands = [(ph >> (12 * b)) & 4095 for b in range(PHASH_BANDS)]
    bands2 = [(ph2 >> (12 * b)) & 4095 for b in range(PHASH_BANDS)]
    assert any(a == b for a, b in zip(bands, bands2))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=300),
    st.integers(min_value=2, max_value=10),
)
def test_quantile_boundaries_rank_guarantees(scores, q):
    """The exact order-statistic contract quality_deciles builds on: for
    every k, at least ceil(k·N/q) of the mass sits at or below b_k, and
    strictly less than that sits below it (b_k is MINIMAL); the induced
    bucket 1 + |{k : x > b_k}| is monotone in x and within [1, q]."""
    from collections import Counter

    from spark_ss_hudi_delta_poc_spark.operators.curation import quantile_boundaries

    hist = sorted(Counter(scores).items())
    n = len(scores)
    bs = quantile_boundaries(hist, q)
    assert len(bs) == min(q - 1, len(bs))  # may stop early only if mass exhausted
    s_sorted = sorted(scores)
    for k, b in enumerate(bs, start=1):
        need = (k * n + q - 1) // q
        assert sum(1 for x in s_sorted if x <= b) >= need
        assert sum(1 for x in s_sorted if x < b) < need  # minimal boundary
    bucket = lambda x: 1 + sum(1 for b in bs if x > b)
    bks = [bucket(x) for x in s_sorted]
    assert bks == sorted(bks) and 1 <= bks[0] and bks[-1] <= q


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2000),
            st.integers(min_value=0, max_value=2000),
        ),
        min_size=1,
        max_size=150,
    ),
    st.integers(min_value=2, max_value=64),
)
def test_zone_assignment_is_bounded_and_sound(points, n_zones):
    """The zone-map rule q93 relies on, via the SAME SQL fragment the
    oracle uses: zone ids land in [0, n_zones), every point's column
    value lies within its own zone's [min, max] (so range pruning can
    never skip a matching row), and zones split the occupied z-range."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", points)
    z = zvalue_sql("a", "b")
    rows = con.sql(
        f"SELECT a, b, (({z}) * {n_zones}) // ((SELECT MAX({z}) FROM t) + 1) AS zone FROM t"
    ).fetchall()
    assert all(0 <= zn < n_zones for _, _, zn in rows)
    from collections import defaultdict

    mins, maxs = defaultdict(lambda: 1 << 62), defaultdict(lambda: -1)
    for a, _, zn in rows:
        mins[zn] = min(mins[zn], a)
        maxs[zn] = max(maxs[zn], a)
    for a, _, zn in rows:
        assert mins[zn] <= a <= maxs[zn]


def _emd_e9_model(class_counts: dict[int, int], all_counts: dict[int, int], n_bands: int) -> int:
    """Pure-Python replica of t_closeness's integer EMD (profiling.py):
    num = sum_{i=0}^{B-2} |cum_qb(i)*N - cum_b(i)*n_q|, then
    emd_e9 = num * 1e9 // (n_q * N * (B-1)) — all floor divisions on
    positive integers, so Python // == Spark `div` == DuckDB //."""
    n_q = sum(class_counts.values())
    n_rows = sum(all_counts.values())
    num = 0
    cq = cb = 0
    for i in range(n_bands - 1):
        cq += class_counts.get(i, 0)
        cb += all_counts.get(i, 0)
        num += abs(cq * n_rows - cb * n_q)
    return num * 10**9 // (n_q * n_rows * (n_bands - 1))


@given(
    st.lists(st.integers(min_value=0, max_value=7), min_size=1, max_size=200),
    st.lists(st.integers(min_value=0, max_value=7), min_size=0, max_size=200),
)
@settings(max_examples=200, deadline=None)
def test_t_closeness_integer_emd_properties(bands_a, bands_b):
    """The integer EMD is (1) zero when the class IS the whole table,
    (2) bounded in [0, 1e9], and (3) within truncation error of the
    float earth-mover's distance between the normalized cumulative
    distributions."""
    B = 8
    ca = {b: bands_a.count(b) for b in set(bands_a)}
    call = {b: bands_a.count(b) + bands_b.count(b) for b in range(B)}
    # (1) class == global -> exactly 0
    assert _emd_e9_model(ca, ca, B) == 0
    got = _emd_e9_model(ca, call, B)
    # (2) bounds
    assert 0 <= got <= 10**9
    # (3) float reference: mean |P_cum - Q_cum| over positions 0..B-2
    n_q, n_rows = sum(ca.values()), sum(call.values())
    cq = cb = 0
    terms = []
    for i in range(B - 1):
        cq += ca.get(i, 0)
        cb += call.get(i, 0)
        terms.append(abs(cq / n_q - cb / n_rows))
    ref = sum(terms) / (B - 1)
    assert abs(got / 1e9 - ref) < 1e-9 + 1.0 / (n_q * n_rows)


@given(
    st.text(alphabet="abcdefgh", min_size=36, max_size=36),
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=35), st.sampled_from("xyz")),
        min_size=0,
        max_size=2,
    ),
)
@settings(max_examples=200, deadline=None)
def test_fuzzy_banding_pigeonhole_for_substitutions(prefix, subs):
    """dedup_fuzzy_edit's recall guarantee: <=2 substitutions over a
    36-char prefix leave at least one of the 3 fixed 12-char bands
    EXACTLY equal (3 bands, 2 edits — pigeonhole), so the banded
    blocking always surfaces the pair as a candidate."""
    edited = list(prefix)
    for pos, ch in subs:
        edited[pos] = ch
    edited = "".join(edited)
    bands_a = [prefix[i * 12 : (i + 1) * 12] for i in range(3)]
    bands_b = [edited[i * 12 : (i + 1) * 12] for i in range(3)]
    assert any(a == b for a, b in zip(bands_a, bands_b))
