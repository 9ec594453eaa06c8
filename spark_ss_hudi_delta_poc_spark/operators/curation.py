"""Corpus-curation operators for training-data pipelines: benchmark
contamination detection, deterministic sampling, and repetition-based
quality filtering.

Beyond-reference surface (the reference stops at ingest/enrich; these are
the ops a 100 TB pretraining pipeline runs right after it).  Design rules
shared with the dedup family:

- deterministic cross-engine hashing (functions/hashing.md5_long) so every
  sample / score hash-matches the DuckDB oracle at any SF;
- contamination is the classic inverted-index shape: shingle-explode both
  corpora, equi-join on the n-gram, aggregate per (train, eval) pair.  The
  eval side of a contamination check is always tiny relative to the
  training corpus (benchmarks are MBs, corpora are TBs), so the eval
  n-gram table is broadcast — the train side never shuffles at all;
- sampling is map-only (hash-threshold Bernoulli) or single-shuffle
  (exact-k per stratum via one window) — never a driver-side RNG, so the
  sample is reproducible run-to-run and engine-to-engine;
- repetition scoring is a pure map stage over per-row arrays: zero
  shuffle, linear at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long
from ..functions.text import shingles, words
from .partitioning import spread as _spread

CONTAMINATION_NGRAM = 3
CONTAMINATION_THRESHOLD = 0.05
# doc_id % EVAL_MODULUS == 0 plays the held-out benchmark set in the
# registry query — any (train, eval) DataFrame pair works in the API
EVAL_MODULUS = 97
# Benchmark eval sets are FIXED-size (they do not grow with the training
# corpus); the registry queries make that explicit with an orderBy+limit
# cap on the eval side, which is also what lets the plan audit certify
# the broadcast eval n-gram index as bounded.
EVAL_MAX_DOCS = 500


def contamination_pairs(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = CONTAMINATION_NGRAM,
    threshold: float = CONTAMINATION_THRESHOLD,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Test-set contamination: for each training doc, the fraction of its
    distinct word ``n``-grams that also occur in an eval doc.

    Returns (doc_id, eval_doc_id, overlap, train_ngrams, contamination)
    for every pair at or above ``threshold``.  Plan: both sides explode to
    distinct n-grams; the eval n-gram table is broadcast (eval sets are
    small by construction), so the training corpus is scanned once with no
    shuffle on the raw text — the per-(train, eval) count aggregation
    shuffles only (doc_id, eval_doc_id, 1) rows that actually overlap.
    """
    # spread: single-file inputs plan as one partition, serializing the
    # CPU-heavy shingle stage on one core (operators/partitioning.py).
    # The shingle array is built ONCE per train doc: its size (the per-doc
    # distinct-gram count) rides along through the explode as a constant
    # column, so no second shingle pass and no sizes join — pairs with
    # zero overlap can't reach the threshold filter anyway, so the inner
    # gram join loses nothing.
    grams = _spread(train_docs).select(
        F.col(id_col).alias("doc_id"),
        shingles(F.col(text_col), n).alias("grams"),
    )
    tr = grams.select(
        "doc_id",
        F.size("grams").cast("long").alias("train_ngrams"),
        F.explode("grams").alias("gram"),
    )
    ev = _spread(eval_docs).select(
        F.col(id_col).alias("eval_doc_id"),
        F.explode(shingles(F.col(text_col), n)).alias("gram"),
    )
    overlap = (
        tr.join(F.broadcast(ev), "gram")
        .groupBy("doc_id", "train_ngrams", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    score = F.col("overlap").cast("double") / F.col("train_ngrams").cast("double")
    return overlap.select(
        "doc_id",
        "eval_doc_id",
        "overlap",
        "train_ngrams",
        score.alias("contamination"),
    ).where(F.col("contamination") >= threshold)


def sample_bernoulli(
    docs: DataFrame,
    fraction: float,
    salt: str = "s0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose salted 60-bit id
    hash falls under ``fraction`` of the hash space.  Map-only (no
    shuffle, no RNG state) — the only reproducible way to sample a corpus
    that is re-sharded between runs.  Change ``salt`` to draw an
    independent sample."""
    h = md5_long(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    return docs.where(h % 1_000_000 < int(fraction * 1_000_000))


def sample_stratified_k(
    docs: DataFrame,
    k: int,
    strata_col: str = "source",
    salt: str = "s0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``k`` docs per stratum, chosen by salted-hash order — the
    distributed, deterministic stand-in for per-group reservoir sampling.
    One shuffle (the window partition on the stratum); rank by (hash, id)
    so ties are impossible and the pick is engine-independent."""
    h = md5_long(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


# GPT-2-style pre-tokenizer, RE2-safe subset (no lookahead — DuckDB's RE2
# can't do it): a word, a number run, or a punctuation run, each with an
# optional leading space.  What BPE merges operate on.
PRETOKEN_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def pretoken_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_pretokens, n_distinct_pretokens): counts over the real
    BPE pre-tokenization regex — the accurate token budget, vs
    text_analysis.token_counts' chars/4 estimate.  Map-only."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_RE), 0)
    return docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_pretokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_pretokens"),
    )


def source_mixture(docs: DataFrame, strata_col: str = "source") -> DataFrame:
    """Temperature-based sampling mixture over sources (alpha = 0.5, the
    sqrt-smoothed weighting used to upsample rare sources in pretraining
    mixes): w_s = sqrt(n_s) / sum(sqrt(n_s)).

    Returns (source, n_docs, weight, expected_epoch_docs).  The sqrt is
    quantized to an integer (floor(sqrt(n)*1e6)) before the global sum so
    the normalizer is an exact BIGINT — float summation order can never
    flip the hash; each output double is then a single IEEE division or
    multiplication.  The global window runs on the already-aggregated
    per-source table (|sources| rows), so it is free at any corpus size.
    """
    c = docs.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_docs"))
    q = F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1_000_000).cast("long")
    w = Window.partitionBy(F.lit(1))
    c = (
        c.withColumn("_q", q)
        .withColumn("_tq", F.sum("_q").over(w))
        .withColumn("_tn", F.sum("n_docs").over(w))
    )
    weight = F.col("_q").cast("double") / F.col("_tq").cast("double")
    return c.select(
        F.col(strata_col),
        "n_docs",
        weight.alias("weight"),
        F.floor(weight * F.col("_tn").cast("double")).cast("long").alias("expected_epoch_docs"),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 1024,
    n_buckets: int = 8,
    salt: str = "p0",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-then-chunk context packing: lay documents end-to-end in a
    deterministic mixed order and cut fixed ``budget``-token training
    sequences — the standard pretraining packing step.  A document is
    assigned to the sequence containing its start offset (documents may
    straddle a chunk boundary; that straddle fraction is the usual
    packing loss).

    Returns (doc_id, bucket, seq_idx, start_offset, n_tokens).
    ``n_buckets`` independent packing streams (keyed by doc_id) bound the
    window-state per partition, so the only shuffle is the bucket window
    and each stream packs in parallel; within a stream the order is
    (salted hash, doc_id) — deterministic shuffling of the corpus, which
    is also what makes the result engine-independent.
    """
    tok = F.size(words(F.col(text_col))).cast("long")
    h = md5_long(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_buckets).alias("bucket"),
        tok.alias("n_tokens"),
        h.alias("_ok"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("_ok").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return t.select(
        "doc_id",
        "bucket",
        F.floor(start / F.lit(budget)).cast("long").alias("seq_idx"),
        start.alias("start_offset"),
        "n_tokens",
    )


def repetition_scores(
    docs: DataFrame,
    n: int = 3,
    max_dup_ngram_ratio: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Within-document repetition features + keep/drop flag (the standard
    boilerplate/spam filter): fraction of repeated words and fraction of
    repeated word ``n``-grams.  All counts are exact integers computed
    per-row with built-in array functions — no shuffle, and each double is
    a single IEEE division so it hash-matches the oracle."""
    w = words(F.col(text_col))
    n_words = F.size(w)
    n_uniq_words = F.size(F.array_distinct(w))
    # total (non-distinct) n-gram count vs distinct: the duplicated mass
    total_grams = F.greatest(n_words - (n - 1), F.lit(0))
    uniq_grams = F.size(shingles(F.col(text_col), n))
    dup_word_ratio = (n_words - n_uniq_words).cast("double") / n_words.cast("double")
    dup_gram_ratio = F.when(
        total_grams > 0,
        (total_grams - uniq_grams).cast("double") / total_grams.cast("double"),
    ).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        dup_word_ratio.alias("dup_word_ratio"),
        dup_gram_ratio.alias("dup_ngram_ratio"),
        (dup_gram_ratio <= max_dup_ngram_ratio).alias("keep"),
    )


# Gopher quality-filter constants [Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", app. A1.1]
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000


def gopher_rules(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style document quality filter: per-doc counts plus one
    boolean per rule and the final keep flag.

    Every ratio rule is evaluated by INTEGER cross-multiplication
    (10 * n_bullet_lines < 9 * n_lines, not n_bullet/n_lines < 0.9) so
    no IEEE division can flip a boundary row between engines.  Map-only:
    no shuffle, linear at 100 TB; the line/word scans are per-row array
    ops (interpreter-evaluated HOFs — acceptable here because each is a
    single pass over the doc, the same work a codegen'd kernel would do).

    Rules (thresholds per the paper): word count in [50, 100k]; mean
    word length in [3, 10]; symbol-to-word ratio ('#' or '...') < 0.1;
    <90% of lines starting with a bullet; <30% of lines ending in an
    ellipsis; >80% of words containing an alphabetic char; at least 2
    distinct stopwords from an 8-word set.
    """
    t = F.col(text_col)
    words_arr = F.split(F.trim(t), r"\s+")
    lines_arr = F.split(t, "\n")
    n_words = F.size(words_arr).cast("long")
    n_lines = F.size(lines_arr).cast("long")
    nonspace = F.length(F.regexp_replace(t, r"\s+", "")).cast("long")
    n_hash = (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))).cast("long")
    n_ellipsis = F.floor(
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / F.lit(3)
    ).cast("long")
    n_bullet_lines = F.size(
        F.filter(lines_arr, lambda x: x.rlike(r"^\s*([-*•]|\d+\.)\s"))
    ).cast("long")
    n_ellipsis_lines = F.size(
        F.filter(lines_arr, lambda x: x.rlike(r"\.\.\.\s*$"))
    ).cast("long")
    n_alpha_words = F.size(
        F.filter(words_arr, lambda w: w.rlike("[A-Za-z]"))
    ).cast("long")
    n_stop_types = sum(
        F.when(F.lower(t).rlike(rf"\b{w}\b"), F.lit(1)).otherwise(F.lit(0))
        for w in GOPHER_STOPWORDS
    ).cast("long")

    feats = docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_lines.alias("n_lines"),
        nonspace.alias("n_nonspace_chars"),
        (n_hash + n_ellipsis).alias("n_symbols"),
        n_bullet_lines.alias("n_bullet_lines"),
        n_ellipsis_lines.alias("n_ellipsis_lines"),
        n_alpha_words.alias("n_alpha_words"),
        n_stop_types.alias("n_stop_types"),
    )
    r_word_count = (F.col("n_words") >= GOPHER_MIN_WORDS) & (F.col("n_words") <= GOPHER_MAX_WORDS)
    r_mean_word_len = (F.col("n_nonspace_chars") >= 3 * F.col("n_words")) & (
        F.col("n_nonspace_chars") <= 10 * F.col("n_words")
    )
    r_symbol_ratio = 10 * F.col("n_symbols") < F.col("n_words")
    r_bullet_ratio = 10 * F.col("n_bullet_lines") < 9 * F.col("n_lines")
    r_ellipsis_ratio = 10 * F.col("n_ellipsis_lines") < 3 * F.col("n_lines")
    r_alpha_ratio = 10 * F.col("n_alpha_words") > 8 * F.col("n_words")
    r_stopwords = F.col("n_stop_types") >= 2
    return feats.select(
        "*",
        r_word_count.alias("r_word_count"),
        r_mean_word_len.alias("r_mean_word_len"),
        r_symbol_ratio.alias("r_symbol_ratio"),
        r_bullet_ratio.alias("r_bullet_ratio"),
        r_ellipsis_ratio.alias("r_ellipsis_ratio"),
        r_alpha_ratio.alias("r_alpha_ratio"),
        r_stopwords.alias("r_stopwords"),
        (
            r_word_count
            & r_mean_word_len
            & r_symbol_ratio
            & r_bullet_ratio
            & r_ellipsis_ratio
            & r_alpha_ratio
            & r_stopwords
        ).alias("keep"),
    )


def c4_rules(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """C4-style cleaning heuristics [Raffel et al. 2020, §2.2], adapted to
    document-level integer rules (C4 filters line-by-line; here lines are
    counted and the doc is judged, which is the batch-friendly form —
    per-line filtering is ``text_chunking``'s job):

    - r_sentences: at least 3 sentence terminators ([.!?]);
    - r_terminal_lines: at least half the lines end in terminal
      punctuation (., !, ?, or a closing quote);
    - r_short_lines: at most half the lines have fewer than 5 words;
    - r_blocklist: no "lorem ipsum" / "javascript" (case-insensitive)
      and no '{' (code fragment tell).

    All ratios are integer cross-multiplied; map-only, zero shuffle.
    """
    t = F.col(text_col)
    lines_arr = F.split(t, "\n")
    n_lines = F.size(lines_arr).cast("long")
    n_sentences = F.size(F.regexp_extract_all(t, F.lit(r"[.!?]"), 0)).cast("long")
    n_terminal_lines = F.size(
        F.filter(lines_arr, lambda x: x.rlike(r'[.!?"]\s*$'))
    ).cast("long")
    n_short_lines = F.size(
        F.filter(lines_arr, lambda x: F.size(F.split(F.trim(x), r"\s+")) < 5)
    ).cast("long")
    lower = F.lower(t)
    has_block = (
        lower.contains("lorem ipsum") | lower.contains("javascript") | t.contains("{")
    )
    feats = docs.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        n_sentences.alias("n_sentences"),
        n_terminal_lines.alias("n_terminal_lines"),
        n_short_lines.alias("n_short_lines"),
        has_block.alias("has_blocklisted"),
    )
    r_sentences = F.col("n_sentences") >= 3
    r_terminal = 2 * F.col("n_terminal_lines") >= F.col("n_lines")
    r_short = 2 * F.col("n_short_lines") <= F.col("n_lines")
    r_block = ~F.col("has_blocklisted")
    return feats.select(
        "*",
        r_sentences.alias("r_sentences"),
        r_terminal.alias("r_terminal_lines"),
        r_short.alias("r_short_lines"),
        r_block.alias("r_blocklist"),
        (r_sentences & r_terminal & r_short & r_block).alias("keep"),
    )


def model_quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: DataFrame | None = None,
) -> DataFrame:
    """Model-based quality scoring with the hashing trick (the fastText-
    classifier pass every large pretraining pipeline runs; CCNet/RefinedWeb
    score documents with a linear model over hashed token features).

    The model here is a linear scorer whose per-token weight is DERIVED
    from the token's 60-bit hash — w(t) = (h(t) mod 2001) - 1000, i.e. a
    deterministic stand-in weight in [-1000, 1000] standing for a trained
    embedding row (a real deployment broadcasts a trained weight table and
    joins/maps it; the Spark plumbing — map-side feature hashing, integer
    partial aggregation, no Python in the loop — is identical).

    Determinism by the registry's house rule: the per-document SUM runs
    over exact integers (never floats), so aggregation order can't flip a
    hash; the only float op is one final division.  Map-side: explode
    tokens → hash → weight; one shuffle: groupBy doc with partial sums.

    Returns (doc_id, n_tokens, raw_score, quality, keep) where
    quality = raw_score / (1000 * n_tokens) in [-1, 1].

    Pass ``weights`` — a (token, weight_e3 BIGINT) DataFrame — to score
    with TRAINED weights instead of the hash-derived stand-ins: the
    weight table broadcasts (vocabularies are ~10^5-10^6 rows — small
    side by definition), tokens left-join it map-side, and out-of-vocab
    tokens fall back to the hash-derived weight.  Identical plan shape:
    still zero extra shuffles.
    """
    from ..functions.hashing import md5_long

    toks = _spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    )
    hash_wt = (md5_long(F.col("token")) % 2001) - 1000
    if weights is not None:
        toks = toks.join(F.broadcast(weights), "token", "left")
        weighted = toks.select("doc_id", F.coalesce("weight_e3", hash_wt).alias("wt"))
    else:
        weighted = toks.select("doc_id", hash_wt.alias("wt"))
    agg = weighted.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"), F.sum("wt").alias("raw_score")
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "raw_score",
        (F.col("raw_score").cast("double") / (F.col("n_tokens") * 1000).cast("double")).alias("quality"),
        (F.col("raw_score") > 0).alias("keep"),
    )


def rebalance_to_budget(
    docs: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str = "source",
) -> DataFrame:
    """Token-budget mixture rebalancing: given a total training-token
    budget, derive a per-source Bernoulli keep-rate that gives every
    source an EQUAL share of the budget (upweighting small sources to
    rate 1.0, downsampling large ones), and apply it deterministically.

    This is the pass that turns "we have 9 sources of wildly different
    sizes" into "the training mix is balanced at N tokens": the standard
    follow-up to :func:`source_mixture`'s diagnostic weights.

    All rate math is exact integers (rate_e6 = floor(budget·1e6 /
    (n_sources·source_tokens)), capped at 1e6) and the keep decision is
    a 60-bit hash threshold on the document id — reproducible across
    engines, runs, and partitionings, like sample_bernoulli.  Plan: one
    map for token counts, one tiny per-source aggregate joined back as a
    broadcast, zero shuffles of the corpus itself.

    Returns (doc_id, source, n_tokens, rate_e6, keep).
    """
    from ..functions.hashing import md5_long

    sized = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(strata_col).alias("source"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    per_source = sized.groupBy("source").agg(F.sum("n_tokens").alias("source_tokens"))
    # n_sources via a global window over the already-aggregated per-source
    # table (|sources| rows — free at any corpus size); a scalar
    # cross-join would plan as BroadcastNestedLoopJoin, which the global
    # plan audit bans outright
    n_sources = F.count(F.lit(1)).over(Window.partitionBy(F.lit(1)))
    # budget*1e6 is computed in PYTHON (arbitrary precision) and enters the
    # plan as a DECIMAL(38,0) literal with an integral `div`: a BIGINT
    # product wraps silently past budget ~9.2e12 tokens (frontier-scale
    # mixes are 10T+) while DuckDB errors — both engines are exact up to
    # budget ~1e31 this way (ADVICE r5).  denom stays BIGINT: even at
    # 100 TB, n_sources * per-source tokens is ~1e16.
    budget_e6 = int(budget_tokens) * 1_000_000
    rates = per_source.select(
        "source", (n_sources * F.col("source_tokens")).alias("denom")
    ).select(
        "source",
        F.least(
            F.lit(1_000_000).cast("long"),
            F.expr(f"CAST('{budget_e6}' AS DECIMAL(38,0)) div denom"),
        ).alias("rate_e6"),
    )
    return sized.join(F.broadcast(rates), "source").select(
        "doc_id",
        "source",
        "n_tokens",
        "rate_e6",
        ((md5_long(F.col("doc_id")) % 1_000_000) < F.col("rate_e6")).alias("keep"),
    )


def decontaminated_corpus(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = CONTAMINATION_NGRAM,
    threshold: float = CONTAMINATION_THRESHOLD,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The removal step that completes :func:`contamination_pairs`:
    return the training corpus with every doc at-or-above the
    contamination threshold against ANY eval doc removed.

    The removal is a plain ANTI-join on doc_id with NO broadcast hint:
    the contaminated set is usually tiny, but "docs that hit the
    benchmark" has no structural size bound (one viral eval passage can
    match millions of training docs), so the plan must stay valid when
    it is large — AQE picks a broadcast at runtime exactly when the set
    really is small.  Returns the kept docs (doc_id + passthrough
    columns minus the text payload: id, lang, source).
    """
    contaminated = (
        contamination_pairs(train_docs, eval_docs, n=n, threshold=threshold, text_col=text_col, id_col=id_col)
        .select(F.col("doc_id"))
        .distinct()
    )
    keep_cols = [c for c in train_docs.columns if c != text_col]
    return train_docs.join(contaminated, "doc_id", "left_anti").select(*keep_cols)


def export_shards(
    docs: DataFrame,
    path: str,
    shard_tokens: int = 4096,
    n_buckets: int = 8,
    salt: str = "e0",
    text_col: str = "text",
    id_col: str = "doc_id",
    order: str = "hash",
) -> DataFrame:
    """The terminal pipeline step: write the curated corpus as
    size-balanced training shards + return the manifest.

    Shard assignment reuses :func:`pack_sequences`' bucketed-cumsum
    shape (n_buckets parallel packing streams in deterministic salted-
    hash order; one window shuffle, state bounded per bucket), with the
    budget at shard granularity: a doc belongs to the shard containing
    its start offset.  The corpus lands under ``path``/data partitioned
    by (bucket, shard) — a trainer reads one directory per shard — and
    the returned manifest (bucket, shard, n_docs, n_tokens) is what a
    data loader uses to plan epochs without listing files.

    ``order`` picks the within-bucket packing order: ``"hash"``
    (default, salted-hash — decorrelates shard content from crawl
    order, right for a static corpus) or ``"id"`` (doc-id order — the
    merge-associative order the INCREMENTAL exporter needs so sealed
    shards never move; streaming/incremental.ingest_increment_shards
    is its cross-run twin and must match this batch packing).
    """
    tok = F.size(words(F.col(text_col))).cast("long")
    h = md5_long(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        (F.col(id_col) % n_buckets).alias("bucket"),
        tok.alias("n_tokens"),
        h.alias("_ok"),
    )
    order_keys = (
        [F.col("doc_id").asc()]
        if order == "id"
        else [F.col("_ok").asc(), F.col("doc_id").asc()]
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    sharded = t.select(
        "doc_id",
        "text",
        "bucket",
        "n_tokens",
        F.floor(start / F.lit(shard_tokens)).cast("long").alias("shard"),
    )
    import os

    sharded.write.mode("overwrite").partitionBy("bucket", "shard").parquet(
        os.path.join(path, "data")
    )
    manifest = (
        sharded.groupBy("bucket", "shard")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
    )
    manifest.write.mode("overwrite").parquet(os.path.join(path, "manifest"))
    return manifest


def filter_report(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document verdict matrix across the whole quality-filter
    ensemble — the QA artifact every pipeline run publishes (what
    fraction failed which filter; which docs fail multiple): one row per
    doc with each filter's keep flag and the conjunction.

    Composition of the four existing filters.  Gopher/C4/repetition are
    map-only, the model scorer is one aggregation; the report joins on
    doc_id (at production scale the three map-only rule sets fuse into a
    single projection — kept separate here so each filter's oracle-
    checked implementation is the single source of truth).
    """
    g = gopher_rules(docs, text_col, id_col).select(
        F.col("doc_id"), F.col("keep").alias("gopher_keep")
    )
    c = c4_rules(docs, text_col, id_col).select(F.col("doc_id"), F.col("keep").alias("c4_keep"))
    m = model_quality_filter(docs, text_col, id_col).select(
        F.col("doc_id"), F.col("keep").alias("model_keep")
    )
    r = repetition_scores(docs, text_col=text_col, id_col=id_col).select(
        F.col("doc_id"), F.col("keep").alias("repetition_keep")
    )
    return (
        g.join(c, "doc_id")
        .join(m, "doc_id")
        .join(r, "doc_id")
        .select(
            "doc_id",
            "gopher_keep",
            "c4_keep",
            "model_keep",
            "repetition_keep",
            (
                F.col("gopher_keep")
                & F.col("c4_keep")
                & F.col("model_keep")
                & F.col("repetition_keep")
            ).alias("keep_all"),
        )
    )


def sample_weighted(
    docs: DataFrame,
    weight_col: str,
    salt: str = "w0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-row weighted Bernoulli sample: keep each row with
    probability equal to its own ``weight_col`` (a [0, 1] column — e.g. a
    quality score used to upsample good text, the standard quality-
    weighted mixing step after model scoring).

    Same hash-threshold mechanism as :func:`sample_bernoulli` with the
    threshold per-row instead of global: keep iff
    hash(salt:id) mod 1e6 < floor(weight * 1e6).  Map-only, no RNG
    state, reproducible across runs/engines/partitionings; weights
    outside [0, 1] clamp (w <= 0 never keeps, w >= 1 always keeps).
    """
    h = md5_long(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    thr = F.least(
        F.lit(1_000_000).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            F.floor(F.col(weight_col).cast("double") * 1_000_000).cast("long"),
        ),
    )
    return docs.where((h % 1_000_000) < thr)


def epoch_shuffle(
    docs: DataFrame,
    n_shards: int = 8,
    epoch: str = "epoch0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle: the pass that turns a
    curated corpus into the randomized read order a training run
    consumes, reproducibly (same epoch salt → same order on any engine,
    any partitioning, any run — the property RNG-based shuffles lack).

    Each doc gets a 60-bit keyed hash of (epoch, id); shard =
    hash mod n_shards, and the within-shard position ranks by
    (hash, id).  Training readers stream shard files in shard order,
    rows in position order — a uniform random permutation as long as the
    hash mixes (md5 does), with a different permutation per epoch salt.

    Scale shape: one hash map stage + ONE shuffle on shard for the
    ranking window, whose partitions are corpus/n_shards — n_shards is
    the knob that bounds per-task sort size: each window task sorts
    corpus/n_shards rows, so on a cluster set it to ~2-3x total cores
    (e.g. ~8-12k shards for 1000 executors x 4 cores; the default 8 is
    a local-test value — deploy/submit_100tb.sh carries the cluster
    setting, exactly like spark.sql.shuffle.partitions).  No global sort
    barrier, no single-partition window: the permutation is sharded by
    construction.  Output: (doc_id, shard, pos, shuffle_key).
    """
    key = md5_long(F.concat(F.lit(epoch + ":"), F.col(id_col).cast("string")))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        key.alias("shuffle_key"),
        (key % F.lit(n_shards)).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return base.withColumn("pos", F.row_number().over(w).cast("long")).select(
        "doc_id", "shard", "pos", "shuffle_key"
    )


def length_trim(
    docs: DataFrame,
    q: float = 0.99,
    len_col: str = "n_chars",
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source EXACT length-quantile trim: flag documents longer than
    their own source's q-quantile length — the tail-trimming pass that
    drops concatenation artifacts and runaway boilerplate before
    tokenization (a global threshold over-trims long-form sources and
    under-trims chat logs; per-source is the standard practice, and it
    keeps the ranking window PARTITIONED — a global exact quantile would
    need the single-partition sort this repo bans).

    The threshold is the exact order statistic at rank ceil(q*n) per
    source (q53's engine-deterministic rule, no approximate sketch);
    the |sources|-row threshold table joins back in one shuffle.
    Output: (doc_id, source, n_chars, p99_chars, keep).
    """
    w = Window.partitionBy(strata_col).orderBy(F.col(len_col).asc(), F.col(id_col).asc())
    cw = Window.partitionBy(strata_col)
    r = docs.select(
        F.col(strata_col).alias("source"),
        F.col(len_col).alias("n_chars"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("n"),
    )
    thr = r.where(
        F.col("rn") == F.ceil(F.col("n").cast("double") * F.lit(q)).cast("long")
    ).select("source", F.col("n_chars").alias("p99_chars"))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col(strata_col).alias("source"), F.col(len_col).alias("n_chars"))
        .join(thr, "source")
        .select(
            "doc_id",
            "source",
            "n_chars",
            "p99_chars",
            (F.col("n_chars") <= F.col("p99_chars")).alias("keep"),
        )
    )


def quantile_boundaries(sorted_hist: list[tuple[int, int]], q: int) -> list[int]:
    """The pure boundary rule of :func:`quality_deciles`, shared with its
    property tests: given the sorted (score, count) histogram, emit the
    q-1 boundary order statistics b_k = min{s : cum(s) >= ceil(k·N/q)}
    (integer ceil, duplicates kept when mass concentrates)."""
    total = sum(c for _, c in sorted_hist)
    boundaries: list[int] = []
    cum, k = 0, 1
    for s, c in sorted_hist:
        cum += c
        while k < q and cum >= (k * total + q - 1) // q:
            boundaries.append(s)
            k += 1
    return boundaries


def quality_deciles(
    docs: DataFrame,
    score_col: str = "n_chars",
    id_col: str = "doc_id",
    q: int = 10,
) -> DataFrame:
    """EXACT global quantile-bucket assignment (deciles by default) with
    no global sort: the curriculum/stratification pass that tags every
    document with its corpus-wide score bucket (shortest 10% ... longest
    10%), used for curriculum ordering, per-bucket sampling rates, and
    before/after distribution reports.

    The scale trick: a global row_number window is banned (single
    partition), and percentile_approx is not exact — but an INTEGER
    score's histogram is bounded by the VALUE DOMAIN, not the corpus
    (char lengths: ~10^6 distinct values at any corpus size).  So:
    ONE map-side-combined shuffle builds (score, count); the ~domain-row
    histogram is a bounded collect (the rare_token_stats broadcast-
    variable pattern, megabytes at 100 TB); the q-1 boundary order
    statistics fold from its running sum on the driver; and the
    assignment is a MAP-ONLY expression over the corpus — the corpus is
    scanned once and never sorted, shuffled once as 8-byte (score, 1)
    pairs.

    Boundary rule (engine-exact, q53's convention): b_k = min{s :
    cum(s) >= ceil(k·N/q)} — the last score value of bucket k — and
    bucket(x) = 1 + |{k : x > b_k}|, so boundary ties stay together in
    the lower bucket (ties are indistinguishable by score; splitting
    them would need an arbitrary id order).  With repeated boundaries
    (mass concentrated on one value) the numbering skips, which is the
    honest answer for a degenerate distribution.  The oracle replays
    the identical integer rule.

    Returns (doc_id, <score_col>, decile 1..q).
    """
    hist = docs.groupBy(score_col).agg(F.count(F.lit(1)).alias("cnt"))
    # bounded by the score's value domain (NOT corpus size) — see above
    rows = sorted((r[0], r[1]) for r in hist.collect())
    boundaries = quantile_boundaries(rows, q)
    bucket = F.lit(1)
    for b in boundaries:
        bucket = bucket + (F.col(score_col) > F.lit(b)).cast("int")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(score_col),
        bucket.cast("int").alias("decile"),
    )


def contamination_report(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = CONTAMINATION_NGRAM,
    threshold: float = CONTAMINATION_THRESHOLD,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-EVAL-DOC contamination summary — the report eval owners
    consume: which benchmark items leak into the training corpus, how
    many training docs carry each, and how badly (the per-training-doc
    view is :func:`contamination_pairs`; this is its transpose).  A
    benchmark item with many high-contamination hits is compromised and
    must be dropped from reported scores even after decontamination.

    Output: (eval_doc_id, n_contaminated_docs, max_contamination,
    total_overlap_ngrams).  Plan: the contamination_pairs plan + ONE
    |hits|-keyed aggregate on eval_doc_id — output bounded by the
    (fixed-size) benchmark, never by the corpus.
    """
    pairs = contamination_pairs(
        train_docs, eval_docs, n=n, threshold=threshold, text_col=text_col, id_col=id_col
    )
    return pairs.groupBy("eval_doc_id").agg(
        F.count(F.lit(1)).alias("n_contaminated_docs"),
        F.max("contamination").alias("max_contamination"),
        F.sum("overlap").alias("total_overlap_ngrams"),
    )


def bpe_pair_counts(
    docs: DataFrame, top_k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Adjacent-pretoken pair frequencies — the inner statistic of BPE
    tokenizer TRAINING (each merge round promotes the most frequent
    adjacent pair; corpus-side, this count is the whole distributed
    step, the merge-table update is driver-side bookkeeping over the
    top rows).  Run over the same GPT-2-style pre-tokenizer as
    :func:`pretoken_counts`, so the pairs are exactly what a BPE trainer
    would see before its first merge.

    Returns the ``top_k`` pairs as (left, right, n_pairs, rank) with a
    total order (count desc, pair asc).  Plan: map-only pretokenize +
    pair explode, ONE partial-agg'd shuffle on the 2-string pair key,
    lazy global top-k (TakeOrderedAndProject + bounded rank window —
    never a single-partition sort over the pair vocabulary, which at
    100 TB has billions of distinct pairs).
    """
    from .partitioning import global_topk_with_rank

    toks = F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_RE), 0)
    pairs = (
        docs.select(toks.alias("t"))  # tokenize ONCE per row
        .select(
            F.explode(
                F.expr(
                    "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                    " (x, i) -> struct(x AS left, t[i + 1] AS right))"
                )
            ).alias("p")
        )
        .select(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
    )
    counts = pairs.groupBy("left", "right").agg(F.count(F.lit(1)).alias("n_pairs"))
    return global_topk_with_rank(
        counts,
        [F.col("n_pairs").desc(), F.col("left").asc(), F.col("right").asc()],
        top_k,
    )


def sample_exact_n(
    docs: DataFrame, n: int, salt: str = "sn0", id_col: str = "doc_id"
) -> DataFrame:
    """EXACTLY-n deterministic global sample: the n documents with the
    smallest salted 60-bit id hashes — the fixed-budget counterpart of
    :func:`sample_bernoulli` (which hits a FRACTION only in expectation;
    ablation and eval-subset builds need an exact row budget that is
    stable across engines, runs, and re-sharding).

    One TakeOrderedAndProject (per-partition heaps of n, single merge) —
    no global sort, no RNG state; change ``salt`` for an independent
    draw.  Returns the sampled rows with their sample_rank (1..n).
    """
    from .partitioning import global_topk_with_rank

    h = md5_long(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    ranked = global_topk_with_rank(
        docs.withColumn("_h", h),
        [F.col("_h").asc(), F.col(id_col).asc()],
        n,
    )
    return ranked.drop("_h").withColumnRenamed("rank", "sample_rank")


def ccnet_buckets(docs: DataFrame) -> DataFrame:
    """CCNet's head/middle/tail quality bucketing (Wenzek et al. 2020):
    per LANGUAGE, rank documents by their LM fluency score and split
    into exact terciles — "head" feeds high-quality training mixes,
    "tail" gets dropped or down-weighted, "middle" is the knob.  Scores
    come from the repo's log-free bigram LM (text_analysis.
    ngram_lm_score — same ranking as perplexity, bit-exact cross-engine).

    Exact terciles, no floats: rank rn over (lang, score desc, doc_id)
    with the language's doc count n riding the same window partition —
    bucket = head iff 3·rn ≤ n, middle iff 3·rn ≤ 2n, else tail (pure
    integer comparisons; every engine splits identically, ties broken
    by doc_id so reruns never flip a bucket).

    Plan: the LM score's ~4 linear shuffles, then ONE lang-partitioned
    ranking window (per-language sort — languages are a bounded
    category; within-language size is the q53 trade, documented there).

    Output: (doc_id, lang, mean_p_e9, bucket) for docs with ≥ 2 tokens.
    """
    from pyspark.sql import Window

    from .text_analysis import ngram_lm_score

    scored = ngram_lm_score(docs).select("doc_id", "mean_p_e9")
    langs = docs.select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(F.col("mean_p_e9").desc(), F.col("doc_id").asc())
    ranked = (
        scored.join(langs, "doc_id")
        .select(
            "doc_id",
            "lang",
            "mean_p_e9",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
        )
    )
    return ranked.select(
        "doc_id",
        "lang",
        "mean_p_e9",
        F.when(3 * F.col("rn") <= F.col("n"), F.lit("head"))
        .when(3 * F.col("rn") <= 2 * F.col("n"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


DSIR_BUCKETS = 4096
DSIR_KEEP_NUM, DSIR_KEEP_DEN = 1, 4  # keep the top quarter by importance


def dsir_importance_filter(
    docs: DataFrame,
    target_pred=None,
    n_buckets: int = DSIR_BUCKETS,
    keep_num: int = DSIR_KEEP_NUM,
    keep_den: int = DSIR_KEEP_DEN,
    threshold_e9: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style data selection via importance resampling (Xie et al.
    2023, "Data Selection for Language Models via Importance Resampling"
    — public): score every document by how much more likely its hashed
    n-gram features are under a TARGET distribution than under the raw
    corpus, and keep the documents whose importance ratio clears a
    deterministic threshold.

    Model (the paper's bag-of-hashed-ngrams estimator): features are
    unigrams + adjacent bigrams hashed into ``n_buckets`` buckets
    (``feat_bucket = md5_long(gram) % n_buckets`` — a corpus-independent
    <= n_buckets domain); bucket probabilities are add-one smoothed
    counts under the target sample vs the whole corpus.  The per-bucket
    importance ratio is e9 fixed-point scaled,

        r_e9 = floor(1e9 * (ct_t+1)*(N_r+B) / ((ct_r+1)*(N_t+B))),

    one double expression with a pinned operation order, identical in
    the DuckDB oracle (cross-engine IEEE determinism; ratio <= the
    raw/target size ratio because ct_r >= ct_t, so r_e9 never
    approaches int64).  A document's score is the count-weighted mean
    ratio over its buckets — summed in DECIMAL(38,0)/HUGEINT per the
    registry's exact-arithmetic rule, one truncating integer division
    at the end.

    Keep rule: the paper resamples the top-k by Gumbel-perturbed
    importance to hit an exact output size; the registry's no-rand rule
    replaces the perturbation with the deterministic total order
    (score_e9 DESC, doc_id ASC) and keeps the top
    ``keep_num/keep_den`` fraction (k = (N*num + den - 1) // den,
    integer arithmetic both engines).  The k-th row's (score, id) pair
    is found with two orderBy+limit passes — the TakeOrdered
    certificate, never a single-partition row_number window — and the
    keep decision is a map-only literal comparison.  Pass
    ``threshold_e9`` to use an absolute importance cutoff
    (score_e9 >= threshold_e9) instead of the rank rule.

    ``target_pred`` selects the in-corpus target sample (a stand-in for
    the paper's out-of-corpus target set — the plumbing is identical:
    any target DataFrame's counts can be substituted); defaults to
    ``lang = 'en'``.

    Scale: ONE corpus-sized aggregate builds (doc_id, feat_bucket, c);
    the target counts reuse it (semi-join on the target ids); the
    bucket-ratio table is <= n_buckets rows by construction and
    BROADCASTS back onto the doc features (the certificate-friendly
    bounded-group-key broadcast, plan-gated); the final per-doc sum is
    one doc_id-keyed shuffle with integer partial aggregation.  No
    Python in the loop, ~3 shuffles, survives 100x corpus growth.

    Output: (doc_id, n_grams, score_e9, keep).
    """
    if target_pred is None:
        target_pred = F.col("lang") == "en"
    doc_feats = dsir_doc_feats(
        docs, target_pred, n_buckets=n_buckets, text_col=text_col, id_col=id_col
    )
    # ONE bucket aggregate yields both count columns (ct_t null on
    # raw-only buckets, exactly like the old ct_r left-join ct_t — the
    # ratio's coalesce(ct_t, 0) + 1 is unchanged), and the totals come
    # from the <= n_buckets-row counts table instead of a third
    # corpus-sized pass: sum-of-partial-sums is the same integer.
    # (Round-15 optimization, guide §2.4: the old shape ran the
    # corpus-sized gram aggregate in FOUR plan branches with zero
    # exchange reuse in the static plan.)
    counts = doc_feats.groupBy("feat_bucket").agg(
        F.sum("c").alias("ct_r"),
        F.sum(F.when(F.col("_is_target"), F.col("c"))).alias("ct_t"),
    )
    totals = counts.agg(
        F.sum("ct_r").alias("n_r"),
        F.coalesce(F.sum("ct_t"), F.lit(0)).alias("n_t"),
    )
    scored = dsir_scores(doc_feats, counts, totals, n_buckets)
    if threshold_e9 is not None:
        return scored.select(
            "doc_id",
            "n_grams",
            "score_e9",
            (F.col("score_e9") >= F.lit(threshold_e9)).alias("keep"),
        )
    return dsir_rank_keep(scored, keep_num=keep_num, keep_den=keep_den)


def dsir_doc_feats(
    docs: DataFrame,
    target_pred,
    n_buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document hashed-ngram feature counts — the shared front of
    :func:`dsir_importance_filter` and the cross-run streaming twin
    (streaming/incremental.ingest_increment_dsir): unigrams + adjacent
    bigrams hashed to ``feat_bucket = md5_long(gram) % n_buckets``,
    counted per (doc, bucket).  Returns (doc_id, _is_target,
    feat_bucket, c)."""
    w = words(F.col(text_col))
    ws = _spread(docs).select(
        F.col(id_col).alias("doc_id"), target_pred.alias("_is_target"), w.alias("w")
    )
    uni = ws.select("doc_id", "_is_target", F.explode("w").alias("gram"))
    bi = ws.where(F.size("w") >= 2).select(
        "doc_id",
        "_is_target",
        F.explode(
            F.zip_with(
                F.slice(F.col("w"), 1, F.size("w") - 1),
                F.slice(F.col("w"), 2, F.size("w") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("gram"),
    )
    grams = uni.unionByName(bi).select(
        "doc_id",
        "_is_target",
        F.pmod(md5_long(F.col("gram")), F.lit(n_buckets)).alias("feat_bucket"),
    )
    return grams.groupBy("doc_id", "_is_target", "feat_bucket").agg(
        F.count(F.lit(1)).alias("c")
    )


def dsir_scores(
    doc_feats: DataFrame,
    counts: DataFrame,
    totals: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Score documents against a bucket-count table — the shared back of
    :func:`dsir_importance_filter` and the streaming twin.  ``counts``
    is (feat_bucket, ct_r, ct_t-nullable), <= n_buckets rows; ``totals``
    is the 1-row (n_r, n_t) frame; ``doc_feats`` needs (doc_id,
    feat_bucket, c).  The ratio is ONE pinned-order double expression so
    the oracle reproduces it bit-identically; the per-doc sum is exact
    DECIMAL(38,0) arithmetic.  Returns (doc_id, n_grams, score_e9)."""
    ratios = counts.crossJoin(F.broadcast(totals)).select(
        "feat_bucket",
        F.floor(
            (F.coalesce(F.col("ct_t"), F.lit(0)) + F.lit(1)).cast("double")
            * (F.col("n_r") + F.lit(n_buckets)).cast("double")
            * F.lit(1_000_000_000.0)
            / (
                (F.col("ct_r") + F.lit(1)).cast("double")
                * (F.col("n_t") + F.lit(n_buckets)).cast("double")
            )
        )
        .cast("long")
        .alias("r_e9"),
    )
    return (
        doc_feats.join(F.broadcast(ratios), "feat_bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(
                F.col("c").cast("decimal(38,0)") * F.col("r_e9").cast("decimal(38,0)")
            ).alias("_wsum"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.expr("CAST(_wsum div n_grams AS BIGINT)").alias("score_e9"),
        )
    )


def dsir_rank_keep(
    scored: DataFrame,
    keep_num: int = DSIR_KEEP_NUM,
    keep_den: int = DSIR_KEEP_DEN,
) -> DataFrame:
    """The deterministic top-fraction keep rule (score_e9 DESC, doc_id
    ASC; k = ceil(N*num/den)) — boundary found with two TakeOrdered
    passes, keep decision a map-only literal comparison.  Shared by the
    batch filter and the streaming twin's final materialization.

    Cluster caveat (ADVICE r15): the returned frame is backed by
    ``localCheckpoint`` blocks — UNREPLICATED executor storage.  On a
    real cluster an executor loss after return makes the frame
    unrecoverable (the checkpoint truncates lineage), and the blocks
    stay pinned while the frame is referenced.  This is the repo's
    deliberate local-mode trade-off (fuzzy_recall_report /
    minhash-recall precedent); a cluster deployment that must survive
    executor loss should swap the localCheckpoint for reliable
    checkpointing or persist-with-lineage at the cost of one extra
    pipeline execution."""
    # rank rule: materialize the doc-level scores ONCE via
    # localCheckpoint(eager=True) and derive the boundary probe AND the
    # returned frame from the checkpoint (round-15 optimization, guide
    # §1.2): the former persist/unpersist hygiene released the cache
    # before the caller evaluated the returned frame, so the whole
    # corpus-sized gram pipeline ran TWICE — once for the boundary
    # probe, once for the caller's materialization.  The checkpointed
    # rows are narrow doc-level metadata (doc_id, n_grams, score_e9 —
    # the §8 lightweight-proxy shape, never the corpus), and the
    # checkpoint is owned by the returned DataFrame: the ContextCleaner
    # reclaims it when the frame goes out of scope, so nothing strands
    # in executor storage (the minhash_lsh_pairs precedent, review r12).
    cached = scored.localCheckpoint(eager=True)
    n = cached.count()
    if n == 0:
        return cached.withColumn("keep", F.lit(False))
    k = max(1, (n * keep_num + keep_den - 1) // keep_den)
    boundary = (
        cached.orderBy(F.col("score_e9").desc(), F.col("doc_id").asc())
        .limit(k)
        .orderBy(F.col("score_e9").asc(), F.col("doc_id").desc())
        .limit(1)
        .collect()[0]
    )
    return cached.select(
        "doc_id",
        "n_grams",
        "score_e9",
        (
            (F.col("score_e9") > F.lit(boundary.score_e9))
            | (
                (F.col("score_e9") == F.lit(boundary.score_e9))
                & (F.col("doc_id") <= F.lit(boundary.doc_id))
            )
        ).alias("keep"),
    )


UNIMAX_MAX_EPOCHS = 4
# Sources are a bounded catalog domain (crawl/corpus provenance labels,
# not data-sized): the per-source aggregate is capped so the global
# waterfill windows run over a certified orderBy+limit input (the
# global_topk_with_rank shape the plan audit requires for ordered
# constant-partition windows).  65536 is far above any real mixture
# recipe (FineWeb/Pile/Dolma-class mixes are 10-10^3 sources); the cap
# is asserted, never silently truncating (review r12).
UNIMAX_MAX_SOURCES = 65_536


def unimax_allocation(
    docs: DataFrame,
    budget_tokens: int,
    max_epochs: int = UNIMAX_MAX_EPOCHS,
    text_col: str = "text",
    strata_col: str = "source",
    max_sources: int = UNIMAX_MAX_SOURCES,
) -> DataFrame:
    """UniMax-style per-source token-budget allocation (Chung et al.
    2023, "UniMax: Fairer and More Effective Language Sampling for
    Large-Scale Multilingual Pretraining" — public): split a total
    training-token budget across sources as EQUALLY as possible, subject
    to an epoch cap — no source is repeated more than ``max_epochs``
    times, and budget a small source cannot absorb flows to the larger
    ones (the waterfill).  This is the epoch-capped complement to
    :func:`rebalance_to_budget`, whose equal-share rate caps at 1.0 and
    silently UNDER-spends the budget whenever a source is smaller than
    its share.

    Semantics (deterministic closed form, exact integers end-to-end):
    with per-source token counts ``c_s`` and caps ``cap_s = c_s *
    max_epochs``, sort ascending by ``(cap_s, source)``.  Source at rank
    ``rn`` (1-based, ``n`` sources, ``cum_prev`` = sum of caps before
    it) is CAPPED iff ``cap_s * (n - rn + 1) <= B - cum_prev`` — the
    classic waterfill prefix test, a pure-integer predicate, and
    provably prefix-monotone (once it fails it fails for every later
    source).  Capped sources get ``cap_s`` (all ``max_epochs`` epochs);
    the ``m = n - k`` uncapped sources share the leftover ``L = B -
    sum(capped caps)`` as ``L div m`` each, with the ``L mod m``
    remainder tokens going one each to the first ``L mod m`` uncapped
    sources in sort order.  The allocation spends exactly
    ``min(B, sum(caps))`` and is within 1 token per source of the
    paper's sequential waterfill (property-checked in tests); the
    remainder rule replaces its floor-dust loss with a deterministic
    total order, per the registry's no-rand rule.

    Scale: ONE corpus-sized aggregate (groupBy source — partial-agg'd,
    the only shuffle that sees data); everything after runs on the
    <= ``max_sources`` per-source rows through an orderBy+limit
    (TakeOrderedAndProject) feeding the ordered windows — the
    plan-audit-certified bounded-window shape.  No join touches the
    corpus again; the output IS the per-source recipe a trainer feeds
    its sampler.  Products are computed in DECIMAL(38,0) (HUGEINT in
    the oracle) so the math is exact past BIGINT at frontier budgets
    (10T+ tokens x 10^3 sources), per the registry's exact-arithmetic
    rule.

    Output: (source, source_tokens, cap_tokens, alloc_tokens, capped,
    epochs_e6) — epochs_e6 = floor(1e6 * alloc / c_s), the per-source
    repeat factor the sampler applies (1e6 == exactly one epoch).
    """
    per = (
        docs.select(
            F.col(strata_col).alias("source"),
            F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
        )
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("source_tokens"))
    )
    return unimax_allocation_from_counts(
        per, budget_tokens, max_epochs=max_epochs, max_sources=max_sources
    )


def unimax_allocation_from_counts(
    per: DataFrame,
    budget_tokens: int,
    max_epochs: int = UNIMAX_MAX_EPOCHS,
    max_sources: int = UNIMAX_MAX_SOURCES,
) -> DataFrame:
    """The waterfill itself, over an already-aggregated ``(source,
    source_tokens)`` frame — the shared core of :func:`unimax_allocation`
    (which derives the counts from a corpus) and the streaming recipe
    maintenance (which keeps the counts as merge-associative state and
    recomputes the allocation per increment).  Semantics and output
    schema exactly as documented on :func:`unimax_allocation`."""
    budget = f"CAST('{int(budget_tokens)}' AS DECIMAL(38,0))"
    per = per.select(
        "source",
        "source_tokens",
        (F.col("source_tokens") * F.lit(int(max_epochs))).alias("cap_tokens"),
    )
    # certified bounded-window input: sources are a catalog domain, so
    # the limit is a documented bound, not a truncation.  Limit to
    # max_sources + 1 so truncation stays DETECTABLE post-limit: n ==
    # max_sources + 1 can only mean the catalog is genuinely larger
    # than the bound, while an exactly-at-cap catalog (n == max_sources)
    # passes (ADVICE r12: the previous strict n < max_sources guard
    # rejected legitimate exactly-at-cap catalogs).  In the failure
    # case the guard fires before any allocation is emitted, so the
    # sentinel row never reaches output; in the pass case the extra
    # limit slot is simply unused.
    top = per.orderBy(F.col("cap_tokens").asc(), F.col("source").asc()).limit(
        int(max_sources) + 1
    )
    w = Window.partitionBy(F.lit(1)).orderBy(
        F.col("cap_tokens").asc(), F.col("source").asc()
    )
    # rn / cum_prev / n share ONE ordered-spec Window node (frames are
    # per-expression), so the plan keeps that node directly above the
    # TakeOrderedAndProject — the certified bounded shape.  k / cum_k
    # depend on `capped` and live in a SECOND Window node above it;
    # they use the UNORDERED spec, which the partitionless gate exempts
    # regardless of position.
    ranked = top.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.coalesce(
            F.sum("cap_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        ).alias("cum_prev"),
        F.count(F.lit(1))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("n"),
    )
    # loud-failure guard (executed distributed, no collect): with the
    # limit at max_sources + 1, n > max_sources is reachable ONLY when
    # the catalog genuinely exceeds the bound — fail instead of
    # silently under-reporting the truncated tail
    ranked = ranked.where(
        F.assert_true(
            F.col("n") <= F.lit(int(max_sources)),
            F.lit(
                f"unimax_allocation: source catalog exceeds max_sources="
                f"{int(max_sources)}; raise the bound explicitly"
            ),
        ).isNull()
    )
    wall = Window.partitionBy(F.lit(1))
    flagged = ranked.select(
        "*",
        F.expr(
            f"CAST(cap_tokens AS DECIMAL(38,0)) * (n - rn + 1) <= {budget} - cum_prev"
        ).alias("capped"),
    ).withColumn("k", F.sum(F.when(F.col("capped"), 1).otherwise(0)).over(wall))
    flagged = flagged.withColumn(
        "cum_k",
        F.sum(F.when(F.col("capped"), F.col("cap_tokens")).otherwise(F.lit(0))).over(
            wall
        ),
    )
    alloc = flagged.select(
        "source",
        "source_tokens",
        "cap_tokens",
        "capped",
        F.expr(
            f"""CAST(CASE WHEN capped THEN cap_tokens ELSE
                  ({budget} - cum_k) div (n - k)
                  + (CASE WHEN rn - k <=
                       ({budget} - cum_k)
                       - (({budget} - cum_k) div (n - k)) * (n - k)
                     THEN 1 ELSE 0 END)
                END AS BIGINT)"""
        ).alias("alloc_tokens"),
    )
    return alloc.select(
        "source",
        "source_tokens",
        "cap_tokens",
        "alloc_tokens",
        "capped",
        F.expr(
            "CAST(CAST(alloc_tokens AS DECIMAL(38,0)) * 1000000"
            " div source_tokens AS BIGINT)"
        ).alias("epochs_e6"),
    )


def temperature_mixture(
    docs: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    strata_col: str = "source",
    max_sources: int = UNIMAX_MAX_SOURCES,
) -> DataFrame:
    """Temperature-scaled source sampling (the mT5 / XLM-R multilingual
    mixing rule — Xue et al. 2021, Conneau et al. 2020, public): sample
    source ``s`` proportionally to ``p_s^(1/T)``, flattening the natural
    size distribution so low-resource sources are seen more than their
    share.  The UNCAPPED complement to :func:`unimax_allocation`: where
    UniMax equalizes under an epoch cap, temperature sampling reshapes
    by a power law and freely repeats small sources.

    The registered recipe pins **T = 2** — exponent 1/2 — because
    ``sqrt`` is the one power that is a correctly-rounded IEEE-754
    primitive in BOTH engines (java.lang.Math.sqrt and C std::sqrt), so
    the weight table is bit-identical to the DuckDB oracle; a general
    ``pow(x, 1/T)`` is transcendental and NOT correctly rounded, which
    the registry's determinism rules disallow in a hashed column.
    Normalization needs no total-count pass: ``(n_s/N)^(1/2)`` shares
    the ``N^(1/2)`` factor across sources, so weights reduce to
    ``sqrt(n_s) / sum(sqrt(n_i))``.

    Exact-arithmetic pipeline (the registry rule — no float ever sums):
    ``pe9_s = floor(1e9 * sqrt(double(n_s)))`` is one deterministic
    double expression per row, immediately floored to BIGINT; every sum
    and division after is integer (DECIMAL(38,0) / HUGEINT).  The
    budget splits as ``base_s = B * pe9_s div S`` with the ``B - sum
    base`` remainder tokens going one each to the first sources in
    (source_tokens ASC, source ASC) order — spends exactly B.

    Scale: ONE corpus aggregate (groupBy source); everything after runs
    on the <= max_sources catalog rows through the certified
    orderBy+limit -> ordered-window shape (unimax_allocation's plan
    class, including the truncation-detectable max_sources+1 guard).

    Output: (source, source_tokens, weight_e9, alloc_tokens, epochs_e6).
    """
    per = (
        docs.select(
            F.col(strata_col).alias("source"),
            F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
        )
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("source_tokens"))
    )
    return temperature_mixture_from_counts(
        per, budget_tokens, max_sources=max_sources
    )


def temperature_mixture_from_counts(
    per: DataFrame,
    budget_tokens: int,
    max_sources: int = UNIMAX_MAX_SOURCES,
) -> DataFrame:
    """The T=2 allocation over an already-aggregated ``(source,
    source_tokens)`` frame — shared by :func:`temperature_mixture` and
    the streaming recipe (q108), which maintains the counts as
    merge-associative state and recomputes the allocation per
    increment.  Semantics and output exactly as documented there."""
    budget = f"CAST('{int(budget_tokens)}' AS DECIMAL(38,0))"
    # certified bounded-window input + truncation-detectable guard
    # (unimax_allocation's max_sources+1 pattern)
    top = per.orderBy(
        F.col("source_tokens").asc(), F.col("source").asc()
    ).limit(int(max_sources) + 1)
    w = Window.partitionBy(F.lit(1)).orderBy(
        F.col("source_tokens").asc(), F.col("source").asc()
    )
    ranked = top.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("n"),
        # the ONLY float step: one pinned-order double expression,
        # floored to BIGINT per row (sqrt and the 1e9 multiply are both
        # correctly-rounded IEEE ops — bit-identical in the oracle)
        F.expr(
            "CAST(FLOOR(1e9 * SQRT(CAST(source_tokens AS DOUBLE))) AS BIGINT)"
        ).alias("pe9"),
    )
    ranked = ranked.where(
        F.assert_true(
            F.col("n") <= F.lit(int(max_sources)),
            F.lit(
                f"temperature_mixture: source catalog exceeds max_sources="
                f"{int(max_sources)}; raise the bound explicitly"
            ),
        ).isNull()
    )
    wall = Window.partitionBy(F.lit(1))
    sized = ranked.withColumn("s_pe9", F.sum("pe9").over(wall)).withColumn(
        "base",
        F.expr(f"CAST({budget} * pe9 div s_pe9 AS BIGINT)"),
    )
    sized = sized.withColumn("dist", F.sum("base").over(wall))
    return sized.select(
        "source",
        "source_tokens",
        F.expr(
            "CAST(CAST(pe9 AS DECIMAL(38,0)) * 1000000000 div s_pe9 AS BIGINT)"
        ).alias("weight_e9"),
        F.expr(
            f"CAST(base + (CASE WHEN rn <= {budget} - dist THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("alloc_tokens"),
        F.expr(
            f"CAST(CAST(base + (CASE WHEN rn <= {budget} - dist THEN 1 ELSE 0"
            " END) AS DECIMAL(38,0)) * 1000000 div source_tokens AS BIGINT)"
        ).alias("epochs_e6"),
    )
