"""Cross-engine deterministic hashing.

The dedup/fingerprint operators (MinHash, SimHash, document fingerprints)
need a hash function that produces IDENTICAL values in Spark and in the
DuckDB oracle, or the correctness gate can never hash-match.  Spark's
``hash``/``xxhash64`` and DuckDB's ``hash`` are different algorithms, so we
standardize on MD5 — identical everywhere — and fold the first 15 hex chars
(60 bits, safely inside a signed 64-bit range even under ANSI mode) into a
BIGINT:

  Spark :  conv(substr(md5(x), 1, 15), 16, 10) :: long
  DuckDB:  ('0x' || substr(md5(x), 1, 15)) :: BIGINT

MD5 is ~GB/s per core JVM-side; for dedup hashing of shingles this is I/O
dominated, not hash dominated, at 100 TB.  Seeded variants prefix the input
with "<seed>:" to derive independent hash families for MinHash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_CHARS = 15  # 60 bits < 63 → never overflows signed BIGINT


def md5_long(col: Column | str) -> Column:
    """60-bit non-negative BIGINT hash of a string column (cross-engine)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, HEX_CHARS), 16, 10).cast("long")


def seeded_md5_long(col: Column | str, seed: int) -> Column:
    """Hash family member ``seed`` — prefix-perturbed md5_long."""
    c = F.col(col) if isinstance(col, str) else col
    return md5_long(F.concat(F.lit(f"{seed}:"), c.cast("string")))


def md5_long_sql_duckdb(expr: str) -> str:
    """DuckDB SQL text computing the same value as ``md5_long``."""
    return f"(('0x' || substr(md5(CAST(({expr}) AS VARCHAR)), 1, {HEX_CHARS}))::BIGINT)"


def seeded_md5_long_sql_duckdb(expr: str, seed: int) -> str:
    return md5_long_sql_duckdb(f"'{seed}:' || CAST(({expr}) AS VARCHAR)")


# --- affine universal-hash family over one base hash -------------------------
#
# MinHash needs K independent-ish hash functions per shingle.  K md5 calls per
# shingle row made the signature stage the measured hot spot (~2.3 s of
# dedup_minhash_lsh at sf0.1 = 260k shingles x 12 md5).  The standard fix is
# one base hash + the universal affine family h_i(x) = (a_i*h(x) + b_i) mod p
# — every h_i is then a handful of codegen-friendly integer ops instead of an
# MD5, and DuckDB reproduces the identical values from the same (a_i, b_i)
# literals.
#
# The family is only universal when a_i is drawn from the FULL range [1, p-1]
# so that a_i*h wraps the modulus many times.  (A round-5 variant drew
# a_i < 2^14 against p = 2^61-1 to keep a_i*h inside 64 bits; with h < 2^48
# most members then never wrapped, making h_i MONOTONE in h — every member's
# min-hash was attained by the same argmin shingle and the K signatures
# degenerated to deterministic functions of one hash, flattening the LSH
# S-curve to ~J.  ADVICE r5, high.)  To keep full-range multipliers inside
# signed 64-bit on BOTH engines (DuckDB errors on BIGINT overflow; Spark
# silently wraps), the base hash is first reduced mod p:
#   modulus    p  = 2^31 - 1 (Mersenne prime)
#   reduced    h' = h mod p          (< 2^31)
#   member     h_i = (a_i*h' + b_i) mod p,  a_i in [1, p-1], b_i in [0, p-1]
#   bound      a_i*h' + b_i < 2^62 + 2^31 < 2^63 — exact in 64-bit longs.
# 31-bit min-hash values are standard for MinHash (within-doc base-hash
# collisions at ~|shingles|^2 / 2^32 are noise); band bucketing re-hashes
# the signature through md5 anyway.

HEX_CHARS_BASE = 12  # 48-bit base hash
AFFINE_PRIME = (1 << 31) - 1


def md5_long48(col: Column | str) -> Column:
    """48-bit non-negative BIGINT hash (affine-family base; cross-engine)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, HEX_CHARS_BASE), 16, 10).cast("long")


def md5_long48_sql_duckdb(expr: str) -> str:
    return f"(('0x' || substr(md5(CAST(({expr}) AS VARCHAR)), 1, {HEX_CHARS_BASE}))::BIGINT)"


def affine_constants(k: int) -> list[tuple[int, int]]:
    """K deterministic (a, b) pairs shared by the Spark plan and the oracle.

    a is uniform on [1, p-1] (never 0 — a degenerate constant member), b on
    [0, p-1]; the PRNG seed is fixed so the Spark literals and the oracle's
    VALUES list are generated from the same sequence."""
    import random

    rnd = random.Random(0x5EED)
    return [(rnd.randrange(1, AFFINE_PRIME), rnd.randrange(0, AFFINE_PRIME)) for _ in range(k)]


def affine_hash(h: Column, a: int, b: int) -> Column:
    """(a*(h mod p) + b) mod p as a BIGINT column (codegen integer ops)."""
    return ((h % F.lit(AFFINE_PRIME)) * F.lit(a) + F.lit(b)) % F.lit(AFFINE_PRIME)


def affine_hash_sql_duckdb(h_expr: str, a: int | str, b: int | str) -> str:
    """DuckDB SQL computing the identical family member (BIGINT-safe).

    ``a``/``b`` may be integer literals or SQL column references (the
    minhash oracle passes columns of its seeds VALUES list) — the single
    source of the expression shape shared with :func:`affine_hash`."""
    return f"((({h_expr}) % {AFFINE_PRIME}) * {a} + {b}) % {AFFINE_PRIME}"
