"""Vector (embedding) column helpers.

Embeddings arrive as array<float>.  Float arithmetic is summation-order
dependent, so every similarity here is computed over QUANTIZED integer
components (floor(x*1000) as BIGINT): integer dot products and norms are
exact in any order, and cosine = dot / sqrt(na*nb) is then a single
correctly-rounded IEEE op — bit-identical in Spark and DuckDB.  That is
what lets approximate-dedup results hash-match an oracle at all.

All ops are built-in higher-order functions (zip_with/aggregate) — JVM
codegen, no Python, no UDF.  At 100 TB the brute-force variant is a
map-only stage per (query, block) pair; the LSH variant in
operators/similarity.py cuts the candidate space first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT = 1000


def quantize(vec: Column | str) -> Column:
    """array<float> → array<bigint>, floor(double(x) * 1000)."""
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(c, lambda x: F.floor(x.cast("double") * QUANT).cast("long"))


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def norm_sq_q(a: Column) -> Column:
    return dot_q(a, a)


def cosine_q(a: Column, b: Column) -> Column:
    """Cosine over quantized components — engine-exact double."""
    return (dot_q(a, b).cast("double") / F.sqrt((norm_sq_q(a) * norm_sq_q(b)).cast("double")))
