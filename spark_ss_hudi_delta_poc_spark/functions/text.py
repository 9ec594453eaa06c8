"""Text column helpers.

The shingle builder is the shared front end of the dedup family (exact /
MinHash / SimHash / n-gram Jaccard) plus contamination and fingerprints.
Shingling is a pure map stage: at 100 TB it parallelizes per input split
with zero shuffle.  The DuckDB oracle mirrors it with ``string_split`` +
``list_transform`` CTEs (see plans/llm_queries.py).

Implementation note (round-5 rewrite): the original formulation was
``transform(sequence(1, L-n+1), i -> concat_ws(' ', element_at(w, i)...))``
— Spark evaluates higher-order-function lambdas in the INTERPRETED
expression path (no whole-stage codegen), and that interpreted inner loop
was the measured hot constant of every shingle consumer (~6.5 s of
curation_contamination's cost at sf0.1).  An Arrow-batched Pandas UDF
moves the same per-row loop into compact Python over whole record batches
— still a zero-shuffle map stage, ~10x faster wall-clock, and the only
Python stage is Arrow-vectorized (the repo rule: no row-at-a-time Python
UDFs; Arrow batch transfer only).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words(text: Column | str) -> Column:
    """Whitespace tokenization (matches the oracle's string_split)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


_SHINGLE_UDFS: dict[int, object] = {}


def _shingle_udf(n: int):
    """One cached pandas_udf per n (the UDF closure must capture n)."""
    try:
        return _SHINGLE_UDFS[n]
    except KeyError:
        pass

    import pandas as pd  # deferred: keep module import light
    from pyspark.sql.functions import pandas_udf

    def sh(text):
        def one(t):
            if t is None:
                return []
            w = t.split(" ")  # single-space split, empties kept == F.split(c, " ")
            m = len(w) - n + 1
            if m <= 0:
                return []  # <n words -> empty, matching the guarded builtin
            # dict.fromkeys dedups preserving first-seen order == array_distinct
            return list(dict.fromkeys(" ".join(w[i : i + n]) for i in range(m)))

        return text.map(one)

    # real type objects (PEP 563 string hints defeat pandas_udf inference)
    sh.__annotations__ = {"text": pd.Series, "return": pd.Series}
    udf = pandas_udf(sh, "array<string>")
    _SHINGLE_UDFS[n] = udf
    return udf


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams as an array<string>.

    Exact semantics of the DuckDB oracle CTEs: split on single spaces
    (empty tokens kept), n-gram = the n tokens joined by one space,
    distinct with first-occurrence order, fewer than n words (or NULL
    text) yields an empty array.
    """
    c = F.col(text) if isinstance(text, str) else text
    return _shingle_udf(n)(c)
