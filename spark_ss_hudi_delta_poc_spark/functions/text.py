"""Text column helpers — all built-in higher-order functions (JVM-side,
codegen'd; no Python in the hot path).

The shingle builder is the shared front end of the dedup family (exact /
MinHash / SimHash / n-gram Jaccard).  Shingling is a pure map stage: at
100 TB it parallelizes per input split with zero shuffle.  The DuckDB
oracle mirrors it with ``string_split`` + ``list_transform`` CTEs (see
plans/llm_queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words(text: Column | str) -> Column:
    """Whitespace tokenization (matches the oracle's string_split)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams as an array<string>.

    1-indexed element_at mirrors DuckDB list indexing; guarded so docs with
    fewer than n words yield an empty array (Spark's sequence() would
    otherwise produce a DESCENDING range — a silent correctness trap).
    """
    w = words(text)
    idx = F.sequence(F.lit(1), F.size(w) - (n - 1))  # [1 .. L-n+1]
    arr = F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + k) for k in range(n)]))
    return F.when(F.size(w) >= n, F.array_distinct(arr)).otherwise(F.array().cast("array<string>"))
