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
