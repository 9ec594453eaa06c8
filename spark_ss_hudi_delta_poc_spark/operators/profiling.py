"""Data profiling — per-column statistics in ONE pass over the table.

Profiling a 100 TB table one column at a time is N full scans; this
computes every column's stats (rows, nulls, distincts, min/max where
ordered) in a single aggregation, then unpivots to one row per column.
Numeric min/max are emitted integer-scaled so the result stays
engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType
from ..functions.localframe import local_df


def _mg_update(counters: dict, values, capacity: int) -> dict:
    """One Misra-Gries pass over ``values`` into ``counters`` (mutated and
    returned).  Invariant: any item with frequency > n/capacity within the
    processed stream survives in the counter set — property-tested in
    tests/test_properties.py, independent of Spark."""
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < capacity:
            counters[v] = 1
        else:
            # decrement-all; drop zeros (classic Misra-Gries step)
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]
    return counters


def heavy_hitters(
    df: DataFrame,
    col: str,
    phi_num: int = 1,
    phi_den: int = 5,
    capacity: int = 16,
) -> DataFrame:
    """Exact φ-heavy hitters (items with frequency > φ·N, φ = num/den)
    WITHOUT shuffling the full key cardinality.

    A plain ``groupBy(col).count()`` shuffles one row per DISTINCT key —
    ruinous when keys are near-unique (URLs, user ids) at 100 TB.  The
    sketch path: each partition runs a Misra-Gries summary of ``capacity``
    counters over its rows (Arrow-batched ``mapInPandas``, no shuffle);
    pigeonhole guarantees every global heavy hitter survives in at least
    one partition's summary (if an item is ≤ φ·Nᵢ in EVERY partition, its
    total is ≤ φ·N — so capacity ≥ den/num suffices; we default higher
    for slack).  The bounded candidate set (≤ partitions × capacity) is
    collected (broadcast-variable pattern), exactly counted in a second
    scan filtered to candidates — a shuffle of candidate rows only — and
    thresholded by integer cross-multiplication (cnt·den > num·N), so the
    result is EXACT, engine-identical, and never shuffles cold keys.

    Trade-off: two scans instead of one full-cardinality shuffle — the
    right trade exactly when distinct(col) is large; for tiny key spaces
    use the plain aggregate.
    """
    if capacity * phi_num < phi_den:
        raise ValueError("capacity must be >= phi_den/phi_num for the MG guarantee")
    import pandas as pd

    def mg_partition(batches):
        counters: dict = {}
        for pdf in batches:
            _mg_update(counters, pdf[col], capacity)
        yield pd.DataFrame({col: list(counters.keys())})

    cand_rows = df.select(col).mapInPandas(
        mg_partition, schema=df.select(col).schema
    ).collect()  # bounded: <= partitions x capacity rows
    candidates = list({r[0] for r in cand_rows})
    n_total = df.count()
    return (
        df.where(F.col(col).isin(candidates))
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * phi_den > phi_num * F.lit(n_total))
    )


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_val, max_val) per column.

    min/max rendered as strings (numerics via exact e4 scaling) so the
    unpivoted schema is uniform.
    """
    columns = columns or df.columns
    aggs = []
    for c in columns:
        dt = df.schema[c].dataType
        aggs.append(F.count(F.lit(1)).alias(f"{c}__n"))
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"{c}__distinct"))
        if isinstance(dt, NumericType):
            aggs.append(F.min(F.floor(F.col(c) * 10000).cast("long")).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(F.floor(F.col(c) * 10000).cast("long")).cast("string").alias(f"{c}__max"))
        elif isinstance(dt, StringType):
            aggs.append(F.min(F.col(c)).alias(f"{c}__min"))
            aggs.append(F.max(F.col(c)).alias(f"{c}__max"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"{c}__min"))
            aggs.append(F.lit(None).cast("string").alias(f"{c}__max"))
    wide = df.agg(*aggs)
    rows = []
    for c in columns:
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_val"),
                F.col(f"{c}__max").alias("max_val"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


def category_drift(events: DataFrame, type_col: str = "event_type", ts_col: str = "ts") -> DataFrame:
    """Two-sample categorical drift panel — the feed-health monitor run
    before every retraining cut: split the feed at the midpoint of its
    event-time range (reference = first half, current = second half) and
    compare the category distribution across the halves, per-cell.

    Exact arithmetic end-to-end: the split boundary is an integer
    comparison on floor-epoch seconds (2·epoch ≤ min+max — no division,
    no timezone), shares are e9 fixed-point integer divisions, and the
    chi-square cell contribution ((N·O − r·c)² / (N·r·c), the homogeneity
    test's summand) divides two EXACT integers with deterministic IEEE
    ops, so every row hash-matches the oracle.  The statistic is
    published PER CELL rather than as one float total — cell
    contributions are what drift dashboards plot, and a float sum would
    be summation-order dependent.

    Plan: one 2-row bounded agg for the time bounds (runtime-broadcast),
    one partial-agg'd groupBy on (category, half) — cells are bounded by
    the category domain; margins derive from the cells themselves
    (a second tiny agg), never from a re-scan.

    Output per (event_type, half): n_obs, n_type_total, n_half_total,
    n_total, share_e9, chi2_cell.
    """
    ep = F.unix_timestamp(F.col(ts_col))
    typed = events.select(F.col(type_col).alias("event_type"), ep.alias("ep"))
    return _drift_panel(_drift_cells(typed, F.lit(1)))


def category_drift_from_counts(counts: DataFrame) -> DataFrame:
    """The SAME drift panel over an already-rolled-up (event_type, ep,
    n) frame — the shared back of :func:`category_drift` and its
    cross-run streaming twin (q109), whose maintained state is the
    per-(type, floor-epoch-second) count table: that rollup is the
    minimal sufficient statistic of the panel (the split boundary,
    cells and margins are all functions of it), per-second counts are
    merge-associative, and the state is bounded by the TIME domain
    (types x distinct seconds) rather than the event rate."""
    return _drift_panel(
        _drift_cells(counts.select("event_type", "ep", "n"), F.col("n"))
    )


def _drift_cells(typed: DataFrame, weight) -> DataFrame:
    """(event_type, half, n_obs) cells from a (event_type, ep[, n])
    frame: split at the integer midpoint of the ep range (2·ep ≤ mn+mx),
    weight each row by ``weight`` (1 for raw events, the rollup count
    for maintained state — identical cells either way)."""
    bounds = typed.agg(F.min("ep").alias("mn"), F.max("ep").alias("mx"))
    tagged = typed.crossJoin(F.broadcast(bounds))
    return (
        tagged.select(
            "event_type",
            F.when(F.col("ep") * 2 <= F.col("mn") + F.col("mx"), F.lit("ref"))
            .otherwise(F.lit("cur"))
            .alias("half"),
            weight.alias("w"),
        )
        .groupBy("event_type", "half")
        .agg(F.sum("w").cast("long").alias("n_obs"))
    )


def _drift_panel(cells: DataFrame) -> DataFrame:
    """Margins + e9 shares + per-cell chi-square from the (event_type,
    half, n_obs) cells — margins derive from the cells themselves,
    never from a re-scan."""
    type_tot = cells.groupBy("event_type").agg(F.sum("n_obs").alias("n_type_total"))
    half_tot = cells.groupBy("half").agg(F.sum("n_obs").alias("n_half_total"))
    total = cells.agg(F.sum("n_obs").alias("n_total"))
    diff = F.col("n_total") * F.col("n_obs") - F.col("n_type_total") * F.col("n_half_total")
    return (
        cells.join(type_tot, "event_type")
        .join(half_tot, "half")
        .crossJoin(F.broadcast(total))
        .select(
            "event_type",
            "half",
            "n_obs",
            "n_type_total",
            "n_half_total",
            "n_total",
            F.expr("n_obs * 1000000000 div n_half_total").alias("share_e9"),
            (
                (diff.cast("double") * diff.cast("double"))
                / (F.col("n_total") * F.col("n_type_total") * F.col("n_half_total")).cast("double")
            ).alias("chi2_cell"),
        )
    )


def mad_outliers(events: DataFrame, k_mad: int = 5) -> DataFrame:
    """Robust per-category outlier panel: exact median and MAD (median
    absolute deviation) of the value column per event_type, and how much
    of the feed sits more than ``k_mad`` MADs from its median — the
    monitor that catches a broken upstream emitting 100× values without
    being fooled by the outliers themselves (mean/stddev would be).

    Exact arithmetic: values scale to e4 integers (money_e4 convention),
    both medians are lower-median order statistics (q53's shape: one
    ranking window + ceil(n/2)), and the outlier test |x − med| > k·mad
    is an integer comparison — no float anywhere.

    Plan: two ranking-window passes partitioned by event_type (the
    documented exact-order-statistic trade: a per-category sort, q53
    precedent — the sketch path for 100 TB is q78's percentile_approx),
    one |category|-bounded median table joined back [AQE runtime
    broadcast], one final bounded aggregate.

    Output per event_type: n, median_e4, mad_e4, n_outliers,
    outlier_share_e9.
    """
    vals = events.select(
        "event_type", F.floor(F.col("value") * 10000).cast("long").alias("v_e4")
    )
    wv = Window.partitionBy("event_type").orderBy(F.col("v_e4").asc())
    ranked = vals.select(
        "event_type",
        "v_e4",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    med = ranked.where(F.col("rn") == F.ceil(F.col("n") / 2)).select(
        "event_type", F.col("v_e4").alias("median_e4"), "n"
    )
    dev = vals.join(med, "event_type").select(
        "event_type",
        "median_e4",
        "n",
        F.abs(F.col("v_e4") - F.col("median_e4")).alias("ad_e4"),
    )
    wd = Window.partitionBy("event_type").orderBy(F.col("ad_e4").asc())
    mad = (
        dev.select("event_type", "ad_e4", F.row_number().over(wd).alias("rn"), "n")
        .where(F.col("rn") == F.ceil(F.col("n") / 2))
        .select("event_type", F.col("ad_e4").alias("mad_e4"))
    )
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("median_e4").alias("median_e4"),
            F.max("mad_e4").alias("mad_e4"),
            F.sum((F.col("ad_e4") > k_mad * F.col("mad_e4")).cast("int"))
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            "median_e4",
            "mad_e4",
            "n_outliers",
            F.expr("n_outliers * 1000000000 div n").alias("outlier_share_e9"),
        )
    )


def grouped_heavy_hitters(
    df: DataFrame,
    group_col: str,
    col: str,
    phi_num: int = 1,
    phi_den: int = 10,
    capacity: int = 24,
) -> DataFrame:
    """Exact φ-heavy hitters PER GROUP — :func:`heavy_hitters` extended
    with a group key, the shape production monitoring actually runs
    ("top talkers per event type / per tenant") where a plain
    groupBy(group, key).count() would shuffle the full (group × key)
    cardinality.

    Same two-scan sketch-then-verify plan: each partition keeps an
    independent Misra-Gries summary PER GROUP seen in that partition
    (state ≤ groups-per-partition × capacity — bounded when the group
    domain is a category column); the pigeonhole guarantee applies per
    group unchanged.  Candidates (≤ partitions × groups × capacity) are
    exactly counted in a candidate-filtered second scan and thresholded
    against the GROUP's total by integer cross-multiplication.

    Output: (group, key, cnt, n_group) rows where cnt·den > num·n_group.
    """
    if capacity * phi_num < phi_den:
        raise ValueError("capacity must be >= phi_den/phi_num for the MG guarantee")
    import pandas as pd

    def mg_partition(batches):
        per_group: dict = {}
        for pdf in batches:
            for g, sub in pdf.groupby("g", sort=False):
                counters = per_group.setdefault(g, {})
                _mg_update(counters, sub["k"], capacity)
        rows = {"g": [], "k": []}
        for g, counters in per_group.items():
            for key in counters:
                rows["g"].append(g)
                rows["k"].append(key)
        yield pd.DataFrame(rows)

    proj = df.select(F.col(group_col).alias("g"), F.col(col).alias("k"))
    cand = proj.mapInPandas(mg_partition, schema=proj.schema).collect()
    candidates = list({(r.g, r.k) for r in cand})
    totals = df.groupBy(F.col(group_col).alias("g")).agg(F.count(F.lit(1)).alias("n_group"))
    cand_df = local_df(df.sparkSession, candidates, proj.schema).limit(
        len(candidates)
    )  # plan-level bound: <= partitions x capacity driver-local rows
    counted = (
        proj.join(F.broadcast(cand_df), ["g", "k"])  # bounded candidate set
        .groupBy("g", "k")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.join(totals, "g")
        .where(F.col("cnt") * phi_den > phi_num * F.col("n_group"))
        .select(
            F.col("g").alias(group_col),
            F.col("k").alias(col),
            "cnt",
            "n_group",
        )
    )


def k_anonymity(df: DataFrame, quasi_cols: list[str], k: int = 5) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination — the
    privacy-governance gate run before a table ships to a training
    pipeline: every row must share its quasi-identifier tuple with at
    least k-1 others, else the tuple is re-identifiable and must be
    suppressed or generalized.

    Pure exact aggregates: one partial-agg'd groupBy on the quasi
    columns, then a bounded per-equivalence-class verdict.  Output one
    row per equivalence class: the quasi values, class size, meets_k,
    plus the suppression share the table would pay (rows in sub-k
    classes, e9 fixed-point) — constant across rows, so the panel is
    self-contained.

    Plan: ONE shuffle on the quasi tuple; the global suppression scalar
    is a 1-row bounded aggregate joined back by a literal cross join.
    """
    classes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("class_size"))
    tot = classes.agg(
        F.sum("class_size").alias("n_rows"),
        F.sum(F.when(F.col("class_size") < k, F.col("class_size")).otherwise(F.lit(0))).alias(
            "n_suppressed"
        ),
    )
    return classes.crossJoin(F.broadcast(tot)).select(
        *quasi_cols,
        "class_size",
        (F.col("class_size") >= k).alias("meets_k"),
        F.lit(k).alias("k"),
        # DECIMAL(38,0): n_suppressed * 1e9 passes int64 near 9.2e9 rows
        F.expr(
            "CAST(CAST(n_suppressed AS DECIMAL(38,0)) * 1000000000 div n_rows AS BIGINT)"
        ).alias("suppressed_share_e9"),
    )


def l_diversity(
    df: DataFrame, quasi_cols: list[str], sensitive_col, l_min: int = 3
) -> DataFrame:
    """Distinct l-diversity audit — k-anonymity's sibling gate: a class
    of k identical quasi-identifier tuples still leaks the sensitive
    attribute when all k rows SHARE it (the homogeneity attack), so
    every equivalence class must carry at least ``l_min`` DISTINCT
    sensitive values before the table ships to training.

    Output one row per equivalence class: the quasi values, class size,
    distinct sensitive count, meets_l, plus the share of rows sitting in
    below-l classes (e9 fixed point, constant across rows — the number
    the governance dashboard tracks).  ``sensitive_col`` may be any
    Column expression (bucket continuous sensitives first — raw
    near-unique values make l-diversity trivially pass while still
    leaking).

    Plan: ONE shuffle on the quasi tuple (count + count_distinct in the
    same partial-agg'd pass); the global scalar is a 1-row aggregate
    joined back by a broadcast cross join.
    """
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.count_distinct(sensitive_col).alias("l_distinct"),
    )
    tot = classes.agg(
        F.sum("class_size").alias("n_rows"),
        F.sum(
            F.when(F.col("l_distinct") < l_min, F.col("class_size")).otherwise(F.lit(0))
        ).alias("n_below_l"),
    )
    return classes.crossJoin(F.broadcast(tot)).select(
        *quasi_cols,
        "class_size",
        "l_distinct",
        (F.col("l_distinct") >= l_min).alias("meets_l"),
        F.lit(l_min).alias("l_min"),
        # DECIMAL(38,0): n_below_l * 1e9 passes int64 near 9.2e9 rows
        F.expr(
            "CAST(CAST(n_below_l AS DECIMAL(38,0)) * 1000000000 div n_rows AS BIGINT)"
        ).alias("below_l_share_e9"),
    )


def freshness_panel(
    events: DataFrame, type_col: str = "event_type", ts_col: str = "ts"
) -> DataFrame:
    """Ingest-FRESHNESS panel per category — the feed-health monitor that
    catches a stalled producer: for each category, when did its last
    event land relative to the feed's watermark (the global max event
    time), and how much of its volume arrived in the trailing 24 h /
    7 d of the feed.

    A producer that died yesterday shows lag_seconds ~ 86400 and a
    trailing-24h count of 0 while the global feed looks healthy — the
    per-category panel is what surfaces it.

    Exact integer arithmetic throughout: floor-epoch seconds for lags,
    e9 fixed-point for trailing shares.  Plan: ONE partial-agg'd shuffle
    on the (bounded) category column; the feed watermark is a 1-row
    aggregate broadcast back by a cross join.
    """
    ep = F.unix_timestamp(F.col(ts_col))
    wm = events.agg(F.max(ep).alias("feed_max_ep"))
    # the watermark scalar rides the rows into ONE partial-agg'd groupBy
    # (second scan avoided; the broadcast side is a 1-row aggregate)
    per_cat = (
        events.crossJoin(F.broadcast(wm))
        .groupBy(F.col(type_col).alias("category"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(ep).alias("last_ep"),
            F.max("feed_max_ep").alias("feed_max_ep"),
            F.sum(
                F.when(ep >= F.col("feed_max_ep") - F.lit(86400), 1).otherwise(0)
            ).alias("n_last_24h"),
            F.sum(
                F.when(ep >= F.col("feed_max_ep") - F.lit(7 * 86400), 1).otherwise(0)
            ).alias("n_last_7d"),
        )
    )
    # timestamp_seconds, not to_timestamp(from_unixtime(...)): the latter
    # is a session-tz string round-trip (safe only under pinned UTC).
    # Shares in DECIMAL(38,0): count * 1e9 passes int64 near 9.2e9 rows
    # per category — a real number at 100 TB (the t_closeness rule).
    return per_cat.select(
        "category",
        "n_events",
        F.timestamp_seconds(F.col("last_ep")).alias("last_event"),
        (F.col("feed_max_ep") - F.col("last_ep")).alias("lag_seconds"),
        "n_last_24h",
        "n_last_7d",
        F.expr(
            "CAST(CAST(n_last_24h AS DECIMAL(38,0)) * 1000000000 div n_events AS BIGINT)"
        ).alias("share_24h_e9"),
        F.expr(
            "CAST(CAST(n_last_7d AS DECIMAL(38,0)) * 1000000000 div n_events AS BIGINT)"
        ).alias("share_7d_e9"),
    )


def t_closeness(
    df: DataFrame,
    quasi_cols: list[str],
    band_col,
    n_bands: int,
    t_e9: int = 250_000_000,
) -> DataFrame:
    """t-closeness audit — the third member of the privacy-gate trio
    (k-anonymity → l-diversity → t-closeness): an equivalence class can
    be k-anonymous AND l-diverse yet still leak when its sensitive-value
    DISTRIBUTION is skewed relative to the table (the skewness attack:
    "everyone in this class is in the top balance band").  The class
    passes only when the earth-mover's distance between its distribution
    and the global one stays below t.

    ``band_col`` must be an ordinal bucket expression clamped to
    [0, n_bands) by construction (``least(greatest(...))``) — EMD over
    ordered bands is the standard numeric-attribute formulation, and the
    bounded band domain is what keeps every distribution a ≤n_bands
    array regardless of corpus size.

    Exact cross-engine arithmetic: EMD is computed as
        sum_i |cum_qb(i)·N − cum_b(i)·n_q|  ·  1e9
        div  (n_q · N · (n_bands−1))
    entirely in DECIMAL(38,0) (products reach N² ≈ 2e20 at 100 TB —
    past int64 — and decimal/HUGEINT keep both engines exact; `div`
    truncation is identical for the all-positive operands).

    Plan: ONE shuffle keyed (quasi, band), re-aggregated to (quasi) —
    per-class distributions are ≤n_bands-element collected arrays, never
    a densified grid join; the global distribution and the above-t
    totals are 1-row scalar aggregates broadcast back (the two pinned
    BNLJs).  Per-row EMD is a bounded O(n_bands²) higher-order-function
    fold — map-side, no extra exchange.
    """
    if n_bands < 2:
        raise ValueError("t_closeness needs n_bands >= 2 (EMD over one band is 0/0)")
    banded = df.select(*quasi_cols, band_col.cast("int").alias("band"))
    cls_band = banded.groupBy(*quasi_cols, "band").agg(F.count(F.lit(1)).alias("n_qb"))
    classes = cls_band.groupBy(*quasi_cols).agg(
        F.sum("n_qb").alias("class_size"),
        F.array_sort(F.collect_list(F.struct("band", "n_qb"))).alias("dist"),
    )
    glob = (
        cls_band.groupBy("band")
        .agg(F.sum("n_qb").alias("n_qb"))
        .agg(
            F.sum("n_qb").alias("n_rows"),
            F.array_sort(F.collect_list(F.struct("band", "n_qb"))).alias("gdist"),
        )
    )
    cum = (
        "CAST(aggregate(filter({arr}, p -> p.band <= i), 0L, (s, p) -> s + p.n_qb)"
        " AS DECIMAL(38,0))"
    )
    num = (
        f"aggregate(sequence(0, {n_bands - 2}), CAST(0 AS DECIMAL(38,0)),"
        f" (acc, i) -> acc + abs({cum.format(arr='dist')} * n_rows"
        f" - {cum.format(arr='gdist')} * class_size))"
    )
    emd = (
        f"CAST(({num}) * 1000000000 div (CAST(class_size AS DECIMAL(38,0))"
        f" * n_rows * {n_bands - 1}) AS BIGINT)"
    )
    scored = classes.crossJoin(F.broadcast(glob)).select(
        *quasi_cols, "class_size", F.expr(emd).alias("t_emd_e9")
    )
    tot = scored.agg(
        F.sum("class_size").alias("n_rows"),
        F.sum(
            F.when(F.col("t_emd_e9") > t_e9, F.col("class_size")).otherwise(F.lit(0))
        ).alias("n_above_t"),
    )
    return scored.crossJoin(F.broadcast(tot)).select(
        *quasi_cols,
        "class_size",
        "t_emd_e9",
        (F.col("t_emd_e9") <= t_e9).alias("meets_t"),
        F.lit(t_e9).alias("t_e9"),
        # DECIMAL(38,0): n_above_t * 1e9 passes int64 near 9.2e9 rows
        F.expr(
            "CAST(CAST(n_above_t AS DECIMAL(38,0)) * 1000000000 div n_rows AS BIGINT)"
        ).alias("above_t_share_e9"),
    )


# schema-drift panel: (column kind, old-half expr, new-half expr) stats are
# all conditional aggregates, so the WHOLE panel is one global (group-less)
# aggregation pass — partial-agg'd on every executor, 1 row exchanged.
def schema_drift(
    df: DataFrame, columns: list[str], split_predicate, split_desc: str = "split"
) -> DataFrame:
    """Schema/profile-drift panel between two snapshots of one table —
    the monitor that catches a producer silently changing semantics: a
    column whose null rate jumps, whose distinct cardinality collapses
    (an enum replaced by a constant), or whose volume share moves.

    ``split_predicate`` is a boolean Column: True rows are the OLD
    snapshot, False the NEW (e.g. ``ts < lit(cutover)``).  For each
    column: row count, null count + e9 null share, and exact distinct
    count per side, plus the drift deltas the dashboard alerts on.

    Plan: ONE global aggregate (no group keys — partial-agg'd map-side,
    a single ~4·|columns|-cell row crosses the wire; the per-column
    DISTINCTs plan as Spark's Expand over the distinct columns, still
    keyed on values, never collected); the 1-row result is unpivoted to
    |columns| panel rows with a literal stack — no joins at all.
    """
    old = split_predicate

    def _s(cond):
        # coalesce: SUM over a ZERO-ROW table is NULL — the oracle's
        # COUNT(*) FILTER is 0, and the shares below must stay 0, not
        # NULL, on an empty input (same depth as the greatest() guard)
        return F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))

    aggs = []
    for c in columns:
        aggs.extend(
            [
                _s(old).alias(f"{c}__old_n"),
                _s(~old).alias(f"{c}__new_n"),
                _s(old & F.col(c).isNull()).alias(f"{c}__old_nulls"),
                _s(~old & F.col(c).isNull()).alias(f"{c}__new_nulls"),
                F.count_distinct(F.when(old, F.col(c))).alias(f"{c}__old_distinct"),
                F.count_distinct(F.when(~old, F.col(c))).alias(f"{c}__new_distinct"),
            ]
        )
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__old_n, {c}__new_n, {c}__old_nulls, {c}__new_nulls,"
        f" {c}__old_distinct, {c}__new_distinct"
        for c in columns
    )
    panel = one.select(
        F.expr(
            f"stack({len(columns)}, {stack_args}) AS "
            "(column_name, old_n, new_n, old_nulls, new_nulls,"
            " old_distinct, new_distinct)"
        )
    )
    # all e9 shares in DECIMAL(38,0): count * 1e9 passes int64 near
    # 9.2e9 rows per side — a real number at 100 TB (the t_closeness
    # rule); `div` truncation identical to DuckDB HUGEINT //.
    # greatest(n, 1): an EMPTY snapshot side (cutover outside the data
    # range) reports share 0 instead of a silent NULL from div-by-zero
    d9 = "CAST(CAST({n} AS DECIMAL(38,0)) * 1000000000 div greatest({d}, 1) AS BIGINT)"
    old9 = d9.format(n="old_nulls", d="old_n")
    new9 = d9.format(n="new_nulls", d="new_n")
    return panel.select(
        "column_name",
        "old_n",
        "new_n",
        F.expr(old9).alias("old_null_e9"),
        F.expr(new9).alias("new_null_e9"),
        "old_distinct",
        "new_distinct",
        F.expr(f"abs({new9} - {old9})").alias("null_drift_e9"),
        F.expr(d9.format(n="new_distinct", d="old_distinct")).alias(
            "distinct_ratio_e9"
        ),
        F.lit(split_desc).alias("split"),
    )


def seasonal_anomaly(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    low_e9: int = 500_000_000,
    high_e9: int = 2_000_000_000,
) -> DataFrame:
    """SEASONAL anomaly panel — the monitor category_drift (two-halves
    chi²) and freshness (watermark lag) don't cover: traffic with a
    daily shape.  For each (category, hour-of-day) cell, compare the
    FINAL day's actual count against the per-day baseline built from
    every prior day, flagging cells whose actual falls outside
    [low, high] × the baseline average — the "checkout events at 3 am
    doubled" alert, where a global daily total would still look normal.

    Exact integer arithmetic: ratio_e9 = actual · n_baseline_days · 1e9
    div max(baseline_total, 1) compares the actual against the per-day
    average without ever forming a fractional average; a cell with NO
    baseline traffic reports ratio against the max(·,1) floor (loud, as
    an unprecedented cell should be).  Hours with baseline traffic but
    no final-day events report actual=0 — silence is also an anomaly.

    Plan: one partial-agg'd shuffle to the (category, hour, date) daily
    ledger (bounded: |categories| × 24 × days), everything downstream
    re-aggregates that ledger — the final-day/baseline-day bounds are a
    1-row scalar aggregate broadcast back (the pinned BNLJ), and the
    panel is a second bounded-key aggregate.  No corpus-sized side ever
    ships.
    """
    daily = events.groupBy(
        F.col(type_col).alias("category"),
        F.hour(F.col(ts_col)).alias("hour"),
        F.to_date(F.col(ts_col)).alias("day"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    bounds = daily.agg(
        F.max("day").alias("final_day"),
        (F.count_distinct("day") - 1).alias("n_baseline_days"),
    )
    panel = (
        daily.crossJoin(F.broadcast(bounds))
        .groupBy("category", "hour")
        .agg(
            F.sum(F.when(F.col("day") < F.col("final_day"), F.col("cnt")).otherwise(0)).alias(
                "baseline_total"
            ),
            F.sum(F.when(F.col("day") == F.col("final_day"), F.col("cnt")).otherwise(0)).alias(
                "actual"
            ),
            F.max("n_baseline_days").alias("n_baseline_days"),
        )
    )
    # DECIMAL(38,0): actual * n_days * 1e9 passes int64 around 1e9
    # events/cell (a real number at 100 TB); `div` truncation identical
    # to DuckDB HUGEINT // for the all-positive operands
    ratio = F.expr(
        "CAST(CAST(actual AS DECIMAL(38,0)) * n_baseline_days * 1000000000"
        " div greatest(baseline_total, 1) AS BIGINT)"
    )
    # zero-baseline guard (review r9): a single-day feed has
    # n_baseline_days = 0, which would zero ratio_e9 for EVERY cell and
    # flag the whole panel anomalous — all noise, no signal.  With no
    # baseline there is nothing to compare against: ratio is NULL and
    # is_anomaly false (the oracle mirrors the same CASE).
    has_baseline = F.col("n_baseline_days") > 0
    return panel.select(
        "category",
        "hour",
        "baseline_total",
        "n_baseline_days",
        "actual",
        F.when(has_baseline, ratio).alias("ratio_e9"),
        F.when(has_baseline, (ratio < low_e9) | (ratio > high_e9))
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    )
