"""Join operators beyond the reference (which has zero joins — SURVEY.md
§2.7).  These are the building blocks a real analytics engine needs, each
written for the plan we'd want at 100 TB.

- fact-fact equi-join: shuffle hash/sort-merge on the key, AQE handles skew;
- dimension joins: explicit ``F.broadcast`` so a 25-row nation table never
  causes a shuffle of the 100 TB fact side;
- as-of join: the union + window trick — ONE shuffle of both inputs by
  (key, time) instead of a quadratic range join or per-key collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dim_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Join a (large) fact table to a (small) dimension, broadcasting the
    dimension: no shuffle of the fact side, plan survives any fact scale."""
    return fact.join(F.broadcast(dim), on, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with the same
    ``key`` and right_ts <= left_ts (inclusive).

    Implementation: tag both sides, union, then ``last(..., ignorenulls)``
    over a window partitioned by key and ordered by (ts, side) — right rows
    sort before left rows at equal timestamps so "<=" holds.  This is the
    scale-correct as-of plan: a single shuffle on the key, linear scan per
    partition, no range-join blowup.  (DuckDB expresses the same thing as
    ASOF JOIN; see the oracle in relational_queries.py.)
    """
    value_cols = value_cols or []
    lcols = [F.col(c) for c in left.columns]
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_lrow"),
        F.lit(None).cast("timestamp").alias("_rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l.schema["_lrow"].dataType).alias("_lrow"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l.unionByName(r).select(
        "_k",
        "_ts",
        "_side",
        "_lrow",
        F.last("_rts", ignorenulls=True).over(w).alias("asof_ts"),
        *[F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in value_cols],
    )
    out = merged.where(F.col("_side") == 1).select(
        "_lrow.*", F.col("asof_ts"), *[F.col(f"asof_{c}") for c in value_cols]
    )
    if tolerance_seconds is not None:
        # staleness bound (market-data style): a match older than the
        # tolerance is as good as no match — null it out, one projection
        fresh = (
            F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col("asof_ts"))
        ) <= tolerance_seconds * 1_000_000
        out = out.select(
            *[c for c in out.columns if c != "asof_ts" and not c.startswith("asof_")],
            F.when(fresh, F.col("asof_ts")).alias("asof_ts"),
            *[F.when(fresh, F.col(f"asof_{c}")).alias(f"asof_{c}") for c in value_cols],
        )
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Thin delegate to :func:`~.partitioning.salted_join` — the ONE
    salted-join implementation in this codebase (deterministic hash
    salt, never ``rand()``).

    History: this used to carry its own seeded-rand salt.  A
    rand() salt re-draws on task RETRY, so a recomputed left-side map
    task can land rows under different salts than the copies completed
    reducers already fetched — duplicating or dropping join rows,
    exactly the nondeterminism the surviving implementation's docstring
    bans.  Kept as a delegate (not deleted) for the narrower
    single-string-key signature; a plan gate
    (tests/test_plans.py::test_no_rand_based_salting) greps the package
    so a rand()-based salt can never be reintroduced.
    """
    from .partitioning import salted_join as _deterministic_salted_join

    return _deterministic_salted_join(
        left, right, [key], salt_buckets=salt_buckets, how=how
    )


def range_join(
    probe: DataFrame,
    intervals: DataFrame,
    probe_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 7 * 86400,
    equi_keys: list[str] | None = None,
) -> DataFrame:
    """Interval join: probe rows matched to every interval containing
    their timestamp (inclusive bounds) — WITHOUT a nested-loop plan.

    Catalyst plans a bare ``probe.join(intervals, ts.between(s, e))`` as
    BroadcastNestedLoopJoin (every probe row against every interval — the
    shape this repo bans).  Bin bucketing restores an equi-join: each
    interval is exploded to the time bins it overlaps, each probe row
    maps to its single bin, the join keys on (bin + any equi keys), and
    the BETWEEN survives only as a residual filter.  A (probe, interval)
    pair meets in exactly one bin — the probe's — so no dedup is needed.

    Scale math: interval replication = ceil(span / bin_seconds) + 1, so
    pick ``bin_seconds`` near the typical interval span; candidates per
    probe row = intervals overlapping its bin, the 2-bin neighborhood a
    sort-merge interval algorithm would scan.  Skewed bins (a hot week)
    split further under AQE; with ``equi_keys`` the bin compounds the
    key, so per-key-per-bin hotspots need both to collide.
    """
    bin_of = lambda c: F.floor(F.unix_timestamp(F.col(c)) / F.lit(bin_seconds))  # noqa: E731
    keys = list(equi_keys or [])
    iv = intervals.withColumn(
        "_bin", F.explode(F.sequence(bin_of(start_col), bin_of(end_col)))
    )
    pr = probe.withColumn("_bin", bin_of(probe_ts))
    cond = (F.col(probe_ts) >= F.col(start_col)) & (F.col(probe_ts) <= F.col(end_col))
    return pr.join(iv, ["_bin", *keys]).where(cond).drop("_bin")


def money_e4(col: Column) -> Column:
    """Scale a money-ish double to an exact BIGINT (×10^4, floored).

    Summing doubles is order-dependent; summing BIGINTs is exact.  Both
    Spark and DuckDB evaluate the identical per-row IEEE expression, so the
    floored integer is engine-identical and every aggregate hash-matches.
    """
    return F.floor(col * F.lit(10000)).cast("long")
