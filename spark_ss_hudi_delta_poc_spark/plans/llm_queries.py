"""LLM-training-data-pipeline queries: dedup family, similarity search,
text analysis, multimodal plumbing — each with a DuckDB oracle that
reproduces the Spark result EXACTLY (shared md5-based hashing, quantized
integer vector math; see functions/hashing.py and functions/vector.py).

Oracle SQL mirrors the Spark plans via CTEs; the hyperplane / simhash
literals are generated from the same Python code both sides, so there is
one source of truth for the constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import curation, dedup, multimodal, similarity, text_analysis
from ..operators.dedup import SIMHASH_BITS
from ..operators.text_analysis import LANG_MARKERS, LANG_PRIORITY
from ..tables import load
from .registry import Query

JACCARD_THRESHOLD = 0.5
COSINE_THRESHOLD = 0.4
ANN_K = 5
ANN_QUERY_MAX_ID = 20  # query set = vec_id < 20

# --- shared DuckDB fragments -------------------------------------------------

H = "('0x' || substr(md5({x}), 1, 15))::BIGINT"  # == functions.hashing.md5_long

WS_SH_CTE = """
ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(w) - 1),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
  FROM ws WHERE len(w) >= 3
)"""

# ngram-jaccard shared fragments: shingles filtered by the SAME df cap the
# Spark operator applies by default (dedup.MAX_SHINGLE_DF), then sizes and
# intersections over the capped table — keep the three embedding oracles
# (pairs / clusters / kept-corpus) in lockstep
NGRAM_PAIR_CTES = f"""
shf AS (
  SELECT doc_id, shingle FROM sh
  WHERE shingle IN (SELECT shingle FROM sh GROUP BY shingle
                    HAVING COUNT(*) <= {dedup.MAX_SHINGLE_DF})
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS i
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)"""

# full near-dup clustering chain (shingles → capped pairs → undirected
# edges → transitive closure → min-label components); shared by the
# cluster / kept-corpus / keep-best oracles.  Callers prepend
# `WITH RECURSIVE ` and append their own final CTEs/SELECT.
CLUSTER_CTES = """{},
{},
pairs AS (
  SELECT doc_id_a, doc_id_b FROM inter
  JOIN sizes sa ON sa.doc_id = doc_id_a
  JOIN sizes sb ON sb.doc_id = doc_id_b
  WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= {}
),
edges AS (
  SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
  UNION SELECT doc_id_b, doc_id_a FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
clusters AS (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
  FROM reach GROUP BY src
)"""


def _cluster_ctes() -> str:
    return CLUSTER_CTES.format(WS_SH_CTE, NGRAM_PAIR_CTES, JACCARD_THRESHOLD)


QVEC = "list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
COS = (
    "list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
    "sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[]) * "
    "list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))"
)


# --- dedup -------------------------------------------------------------------
def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.exact_dedup(load(spark, sf, "documents"))


def dedup_ngram(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(load(spark, sf, "documents"), threshold=JACCARD_THRESHOLD)


def dedup_containment_q(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.ngram_containment_pairs(load(spark, sf, "documents"), threshold=0.8)


def dedup_minhash(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(load(spark, sf, "documents"), threshold=JACCARD_THRESHOLD)


def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.simhash_fingerprints(load(spark, sf, "documents"))


def dedup_cosine(spark: SparkSession, sf: str) -> DataFrame:
    return similarity.cosine_neardup_pairs(load(spark, sf, "embeddings"), threshold=COSINE_THRESHOLD)


def dedup_cosine_lsh(spark: SparkSession, sf: str) -> DataFrame:
    return similarity.lsh_neardup_pairs(load(spark, sf, "embeddings"), threshold=COSINE_THRESHOLD)


def dedup_embedding_clusters_q(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-space near-dup clustering: exact cosine pairs → connected
    components (vec_id, cluster_id) — the same keep-list step the text
    side gets from dedup_clusters, over the modality-agnostic pair graph."""
    pairs = similarity.cosine_neardup_pairs(
        load(spark, sf, "embeddings"), threshold=COSINE_THRESHOLD
    ).select(F.col("id_a").alias("doc_id_a"), F.col("id_b").alias("doc_id_b"))
    return dedup.dedup_clusters(pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


def dedup_embedding_clusters_lsh_q(spark: SparkSession, sf: str) -> DataFrame:
    """Sub-quadratic semantic dedup (the SemDeDup shape at corpus scale):
    LSH-bucketed cosine pairs -> connected components -> cluster ids.
    Same keep-list contract as dedup_embedding_clusters with the exact
    pair graph swapped for the bucket equi-join one (recall < 1, the
    documented LSH trade)."""
    pairs = similarity.lsh_neardup_pairs(
        load(spark, sf, "embeddings"), threshold=COSINE_THRESHOLD
    ).select(F.col("id_a").alias("doc_id_a"), F.col("id_b").alias("doc_id_b"))
    return dedup.dedup_clusters(pairs).select(F.col("doc_id").alias("vec_id"), "cluster_id")


def dedup_minhash_recall_q(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.minhash_recall_report(load(spark, sf, "documents"), threshold=JACCARD_THRESHOLD)


def dedup_simhash_pairs_q(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.simhash_neardup_pairs(load(spark, sf, "documents"))


def dedup_clusters_q(spark: SparkSession, sf: str) -> DataFrame:
    pairs = dedup.ngram_jaccard_pairs(load(spark, sf, "documents"), threshold=JACCARD_THRESHOLD)
    return dedup.dedup_clusters(pairs)


def dedup_keep_best_q(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-aware canonical selection: cluster near-dups, keep the
    highest-quality doc per cluster (n_words desc, doc_id tie-break) —
    the production dedup policy (min-id keeps an arbitrary copy; this
    keeps the best one)."""
    from pyspark.sql import Window

    from ..functions.text import words

    docs = load(spark, sf, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=JACCARD_THRESHOLD)
    clusters = dedup.dedup_clusters(pairs)
    quality = docs.select("doc_id", F.size(words(F.col("text"))).cast("long").alias("n_words"))
    w = Window.partitionBy("cluster_id").orderBy(F.col("n_words").desc(), F.col("doc_id").asc())
    cw = Window.partitionBy("cluster_id")
    return (
        clusters.join(quality, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(cw).cast("long"))
        .where(F.col("rk") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("keep_doc_id"),
            "n_words",
            "cluster_size",
        )
    )


# --- similarity search -------------------------------------------------------
def _ann_queries(emb: DataFrame) -> DataFrame:
    """The ANN query set: the fixed (<= ANN_QUERY_MAX_ID)-row slice, with
    an explicit top-k certificate (orderBy+limit -> TakeOrderedAndProject)
    so every downstream plan PROVES the broadcast query side is bounded —
    a filter alone leaves the side selectivity-proportional as far as the
    plan audit (tests/test_plans.py) can tell.  Same rows either way."""
    return (
        emb.where(F.col("vec_id") < ANN_QUERY_MAX_ID)
        .orderBy("vec_id")
        .limit(ANN_QUERY_MAX_ID)
    )


def ann_brute(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    return similarity.brute_force_topk(emb, _ann_queries(emb), k=ANN_K)


def ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    return similarity.lsh_topk(emb, _ann_queries(emb), k=ANN_K)


# --- text analysis -----------------------------------------------------------
def text_lang(spark: SparkSession, sf: str) -> DataFrame:
    return text_analysis.language_id(load(spark, sf, "documents"))


def text_quality(spark: SparkSession, sf: str) -> DataFrame:
    return text_analysis.quality_score(load(spark, sf, "documents"))


def text_tokens(spark: SparkSession, sf: str) -> DataFrame:
    return text_analysis.token_counts(load(spark, sf, "documents"))


def text_fp(spark: SparkSession, sf: str) -> DataFrame:
    return text_analysis.fingerprints(load(spark, sf, "documents"))


def text_winnow(spark: SparkSession, sf: str) -> DataFrame:
    return text_analysis.winnow_fingerprints(load(spark, sf, "documents"))


def emb_centroids(spark: SparkSession, sf: str) -> DataFrame:
    return similarity.label_centroid_sums(load(spark, sf, "embeddings"))


def text_chunks(spark: SparkSession, sf: str) -> DataFrame:
    return text_analysis.chunk_documents(load(spark, sf, "documents"))


def text_keywords(spark: SparkSession, sf: str) -> DataFrame:
    return text_analysis.tfidf_keywords(load(spark, sf, "documents"))


# fixed bag-of-words query over the synthetic vocabulary (TESTDATA.md)
BM25_QUERY_TERMS = ["spark", "join", "vector"]


def text_bm25(spark: SparkSession, sf: str) -> DataFrame:
    return text_analysis.bm25_search(load(spark, sf, "documents"), BM25_QUERY_TERMS)


def corpus_ngram_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 trigrams by document frequency — the corpus n-gram frequency
    table used for stop-shingle caps and contamination checks.

    Top-k via orderBy+limit (TakeOrderedAndProject: per-partition heaps,
    20 rows per partition merged) — a no-partition ranking window would
    funnel every distinct trigram (billions at 100 TB) through ONE
    partition (VERDICT r5); rank is a window over only the 20 surviving
    rows (bounded input), the whole plan lazy."""
    from ..operators.partitioning import global_topk_with_rank

    sh = dedup.shingle_table(load(spark, sf, "documents"))
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return global_topk_with_rank(
        df_counts, [F.col("df").desc(), F.col("shingle").asc()], 20
    )


def text_scrub(spark: SparkSession, sf: str) -> DataFrame:
    return text_analysis.scrub_pii(load(spark, sf, "documents"))


def corpus_vocab_stats_q(spark: SparkSession, sf: str) -> DataFrame:
    return text_analysis.corpus_vocab_stats(load(spark, sf, "documents"))


def ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    return similarity.ivf_topk(emb, _ann_queries(emb), k=ANN_K)


def ann_ivf_index(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    emb = load(spark, sf, "embeddings")
    path = tempfile.mkdtemp(prefix="ivf_index_")
    similarity.build_ivf_index(emb, path)
    return similarity.ivf_index_topk(
        spark, path, _ann_queries(emb), k=ANN_K, nprobe=2
    )


def ann_lsh_multi(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    return similarity.lsh_topk(
        emb, _ann_queries(emb), k=ANN_K, n_tables=4
    )


def ann_recall_q(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    return similarity.ann_recall_report(
        emb, _ann_queries(emb), k=ANN_K
    )


def ann_quantized(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    return similarity.quantized_topk(emb, _ann_queries(emb), k=ANN_K)


KNN_K = 3


def knn_graph_q(spark: SparkSession, sf: str) -> DataFrame:
    return similarity.knn_graph(load(spark, sf, "embeddings"), k=KNN_K)


def knn_graph_lsh_q(spark: SparkSession, sf: str) -> DataFrame:
    return similarity.knn_graph_bucketed(load(spark, sf, "embeddings"), k=KNN_K)


def text_rare_tokens(spark: SparkSession, sf: str) -> DataFrame:
    return text_analysis.rare_token_stats(load(spark, sf, "documents"))


# --- composed corpus pipeline ------------------------------------------------
def corpus_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The end-to-end training-data shape: quality filter → exact-dedup
    representative selection → per-source token budget."""
    docs = load(spark, sf, "documents")
    keep = text_analysis.quality_score(docs).where(F.col("keep")).select("doc_id")
    reps = dedup.exact_dedup(docs).select(F.col("keep_doc_id").alias("doc_id"))
    toks = text_analysis.token_counts(docs)
    kept = docs.join(keep, "doc_id", "left_semi").join(reps, "doc_id", "left_semi")
    return (
        kept.join(toks, "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("ws_tokens").alias("tokens"))
    )


# --- corpus curation ---------------------------------------------------------
SAMPLE_FRACTION = 0.25
SAMPLE_K_PER_STRATUM = 10


def _eval_split(docs: DataFrame) -> DataFrame:
    """The stand-in benchmark set: the modulus slice CAPPED at
    EVAL_MAX_DOCS via orderBy+limit.  Real eval benchmarks are fixed-size
    — they do not grow with the training corpus — and the explicit limit
    is what proves that to the plan audit (the broadcast eval n-gram
    index inside contamination_pairs carries a TakeOrdered certificate
    instead of a selectivity-proportional filter)."""
    return (
        docs.where(F.col("doc_id") % curation.EVAL_MODULUS == 0)
        .orderBy("doc_id")
        .limit(curation.EVAL_MAX_DOCS)
    )


def curation_contamination_q(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    train = docs.where(F.col("doc_id") % curation.EVAL_MODULUS != 0)
    return curation.contamination_pairs(train, _eval_split(docs))


def curation_decontaminated_q(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    train = docs.where(F.col("doc_id") % curation.EVAL_MODULUS != 0)
    return curation.decontaminated_corpus(train, _eval_split(docs))


def curation_sample_bernoulli_q(spark: SparkSession, sf: str) -> DataFrame:
    return curation.sample_bernoulli(load(spark, sf, "documents"), SAMPLE_FRACTION)


def curation_sample_stratified_q(spark: SparkSession, sf: str) -> DataFrame:
    return curation.sample_stratified_k(load(spark, sf, "documents"), SAMPLE_K_PER_STRATUM)


def curation_repetition_q(spark: SparkSession, sf: str) -> DataFrame:
    return curation.repetition_scores(load(spark, sf, "documents"))


def curation_pretokens_q(spark: SparkSession, sf: str) -> DataFrame:
    return curation.pretoken_counts(load(spark, sf, "documents"))


def curation_source_mixture_q(spark: SparkSession, sf: str) -> DataFrame:
    return curation.source_mixture(load(spark, sf, "documents"))


def curation_pack_q(spark: SparkSession, sf: str) -> DataFrame:
    return curation.pack_sequences(load(spark, sf, "documents"))


def curation_gopher_q(spark: SparkSession, sf: str) -> DataFrame:
    return curation.gopher_rules(load(spark, sf, "documents"))


def curation_c4_q(spark: SparkSession, sf: str) -> DataFrame:
    return curation.c4_rules(load(spark, sf, "documents"))


def curation_model_filter_q(spark: SparkSession, sf: str) -> DataFrame:
    return curation.model_quality_filter(load(spark, sf, "documents"))


def curation_dsir_q(spark: SparkSession, sf: str) -> DataFrame:
    return curation.dsir_importance_filter(load(spark, sf, "documents"))


REBALANCE_BUDGET = 10_000  # tokens — the shared literal for query and oracle
# UniMax budget: between sum-of-min-caps and sum-of-all-caps at
# sf0.001/sf0.01 (mixed capped/uncapped waterfill, k=2 capped sources)
# and far below every cap at sf0.1 (all-uncapped equal-share path); the
# odd literal forces a nonzero remainder so the deterministic dust rule
# is externally exercised too
UNIMAX_BUDGET = 100_003  # tokens


def curation_sample_weighted_q(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-weighted sample: weight = n_chars / max(n_chars) — a
    deterministic stand-in for a model quality score, so longer docs are
    proportionally more likely to be kept."""
    docs = load(spark, sf, "documents")
    mx = docs.agg(F.max("n_chars").alias("m")).collect()[0].m  # bounded scalar
    weighted = docs.withColumn("w", F.col("n_chars").cast("double") / F.lit(float(mx)))
    return curation.sample_weighted(weighted, "w").select(
        "doc_id", "lang", "source", "n_chars"
    )


def curation_filter_report_q(spark: SparkSession, sf: str) -> DataFrame:
    return curation.filter_report(load(spark, sf, "documents"))


def curation_export_q(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    return curation.export_shards(
        load(spark, sf, "documents"), tempfile.mkdtemp(prefix="shards_")
    )


def curation_rebalance_q(spark: SparkSession, sf: str) -> DataFrame:
    return curation.rebalance_to_budget(load(spark, sf, "documents"), budget_tokens=REBALANCE_BUDGET)


def curation_unimax_q(spark: SparkSession, sf: str) -> DataFrame:
    return curation.unimax_allocation(
        load(spark, sf, "documents"), budget_tokens=UNIMAX_BUDGET
    )


def curation_temperature_q(spark: SparkSession, sf: str) -> DataFrame:
    return curation.temperature_mixture(
        load(spark, sf, "documents"), budget_tokens=UNIMAX_BUDGET
    )


def dedup_segments_q(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.segment_dedup(load(spark, sf, "documents"))


def dedup_spans_q(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.repeated_span_dedup(load(spark, sf, "documents"))


def dedup_normalized_q(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.normalized_exact_dedup(load(spark, sf, "documents"))


# --- multimodal --------------------------------------------------------------
def mm_meta(spark: SparkSession, sf: str) -> DataFrame:
    media = multimodal.media_table(load(spark, sf, "documents"))
    return multimodal.extract_media_meta(media)


def mm_frames(spark: SparkSession, sf: str) -> DataFrame:
    media = multimodal.media_table(load(spark, sf, "documents"))
    return multimodal.frame_sample_plan(media, every_n=10)


def mm_resize(spark: SparkSession, sf: str) -> DataFrame:
    media = multimodal.media_table(load(spark, sf, "documents"))
    return multimodal.resize_plan(media)


def mm_audio(spark: SparkSession, sf: str) -> DataFrame:
    media = multimodal.media_table(load(spark, sf, "documents"))
    return multimodal.extract_audio_meta(media)


def dedup_kept_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end near-dup removal: cluster ngram-Jaccard pairs, keep only
    cluster representatives (min id) + all unclustered docs; report the
    kept corpus per language."""
    docs = load(spark, sf, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=JACCARD_THRESHOLD)
    clusters = dedup.dedup_clusters(pairs)
    drop = clusters.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    kept = docs.join(drop, "doc_id", "left_anti")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("chars")
    )


# --- oracle builders ---------------------------------------------------------
def _minhash_oracle(k: int, bands: int, thr: float) -> str:
    from ..functions.hashing import affine_constants, affine_hash_sql_duckdb

    r = k // bands
    seed_rows = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(affine_constants(k)))
    return f"""
WITH {WS_SH_CTE},
base AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS h FROM sh),
seeds AS (SELECT * FROM (VALUES {seed_rows}) t(seed, a, b)),
hashes AS (
  SELECT doc_id, seed, {affine_hash_sql_duckdb("h", "a", "b")} AS h
  FROM base CROSS JOIN seeds
),
sigs AS (SELECT doc_id, seed, MIN(h) AS minhash FROM hashes GROUP BY doc_id, seed),
bands AS (
  SELECT doc_id, CAST(seed // {r} AS INTEGER) AS band,
         {H.format(x="string_agg(minhash::VARCHAR, ':' ORDER BY seed)")} AS band_hash
  FROM sigs GROUP BY doc_id, CAST(seed // {r} AS INTEGER)
),
ok_buckets AS (
  SELECT band, band_hash FROM bands
  GROUP BY band, band_hash HAVING COUNT(*) BETWEEN 2 AND 1024
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
  JOIN ok_buckets ob ON ob.band = a.band AND ob.band_hash = a.band_hash
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM base GROUP BY doc_id),
inter AS (
  SELECT c.doc_id_a, c.doc_id_b, COUNT(*) AS i
  FROM cand c
  JOIN base a ON a.doc_id = c.doc_id_a
  JOIN base b ON b.doc_id = c.doc_id_b AND a.h = b.h
  GROUP BY c.doc_id_a, c.doc_id_b
)
SELECT doc_id_a, doc_id_b,
       CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_id_a
JOIN sizes sb ON sb.doc_id = doc_id_b
WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= {thr}
"""


def _simhash_cte(bits: int = SIMHASH_BITS) -> str:
    """Shared CTE chain ending in fp(doc_id, simhash)."""
    sums = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}" for j in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN s{j} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END)" for j in range(bits))
    return f"""
WITH {WS_SH_CTE},
hashed AS (SELECT doc_id, {H.format(x="shingle")} AS h FROM sh),
sums AS (SELECT doc_id,
         {sums}
         FROM hashed GROUP BY doc_id),
fp AS (SELECT doc_id, {fp} AS simhash FROM sums)
"""


def _simhash_oracle(bits: int = SIMHASH_BITS) -> str:
    return _simhash_cte(bits) + "SELECT doc_id, simhash FROM fp"


def _simhash_pairs_oracle(max_hamming: int = 3, bits: int = SIMHASH_BITS) -> str:
    n_bands = max_hamming + 1
    width = bits // n_bands
    mask = (1 << width) - 1
    return (
        _simhash_cte(bits)
        + f""",
banded AS (
  SELECT doc_id, simhash, band,
         (simhash >> (band * {width})) & {mask} AS band_val
  FROM fp, (SELECT unnest(range({n_bands})) AS band) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                  a.simhash AS sa, b.simhash AS sb
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT doc_id_a, doc_id_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""
    )


def _lang_oracle() -> str:
    score_cols = []
    for lang in LANG_PRIORITY:
        lst = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        score_cols.append(f"len(list_filter(w, x -> list_contains([{lst}], x))) AS s_{lang}")
    best = "greatest(" + ", ".join(f"s_{l}" for l in LANG_PRIORITY) + ")"
    case = f"CASE WHEN {best} = 0 THEN 'und' "
    for lang in LANG_PRIORITY:
        case += f"WHEN s_{lang} = {best} THEN '{lang}' "
    case += "ELSE 'und' END"
    return f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
scores AS (SELECT doc_id, {", ".join(score_cols)} FROM ws)
SELECT doc_id, {case} AS pred_lang, CAST({best} AS INTEGER) AS score FROM scores
"""


def _lsh_bucket_sql(qv: str, table: int = 0) -> str:
    terms = []
    for p in range(similarity.LSH_PLANES):
        plane = similarity.hyperplane(table * similarity.LSH_PLANES + p)
        lit = "[" + ", ".join(str(v) for v in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({qv}::DOUBLE[], {lit}::DOUBLE[]) > 0 "
            f"THEN CAST({2**p} AS BIGINT) ELSE 0 END)"
        )
    return " + ".join(terms)


EN_LIST = ", ".join(f"'{m}'" for m in LANG_MARKERS["en"])

GOPHER_ORACLE = r"""
        WITH feat AS (
          SELECT doc_id,
                 CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words,
                 CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
                 CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS n_nonspace_chars,
                 CAST(length(text) - length(replace(text, '#', ''))
                      + (length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS n_symbols,
                 CAST(len(list_filter(string_split(text, chr(10)),
                      x -> regexp_matches(x, '^\s*([-*•]|\d+\.)\s'))) AS BIGINT) AS n_bullet_lines,
                 CAST(len(list_filter(string_split(text, chr(10)),
                      x -> regexp_matches(x, '\.\.\.\s*$'))) AS BIGINT) AS n_ellipsis_lines,
                 CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                      x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
                 CAST((CASE WHEN regexp_matches(lower(text), '\bthe\b') THEN 1 ELSE 0 END)
                    + (CASE WHEN regexp_matches(lower(text), '\bbe\b') THEN 1 ELSE 0 END)
                    + (CASE WHEN regexp_matches(lower(text), '\bto\b') THEN 1 ELSE 0 END)
                    + (CASE WHEN regexp_matches(lower(text), '\bof\b') THEN 1 ELSE 0 END)
                    + (CASE WHEN regexp_matches(lower(text), '\band\b') THEN 1 ELSE 0 END)
                    + (CASE WHEN regexp_matches(lower(text), '\bthat\b') THEN 1 ELSE 0 END)
                    + (CASE WHEN regexp_matches(lower(text), '\bhave\b') THEN 1 ELSE 0 END)
                    + (CASE WHEN regexp_matches(lower(text), '\bwith\b') THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_stop_types
          FROM documents
        )
        SELECT *,
               n_words >= 50 AND n_words <= 100000 AS r_word_count,
               n_nonspace_chars >= 3 * n_words AND n_nonspace_chars <= 10 * n_words AS r_mean_word_len,
               10 * n_symbols < n_words AS r_symbol_ratio,
               10 * n_bullet_lines < 9 * n_lines AS r_bullet_ratio,
               10 * n_ellipsis_lines < 3 * n_lines AS r_ellipsis_ratio,
               10 * n_alpha_words > 8 * n_words AS r_alpha_ratio,
               n_stop_types >= 2 AS r_stopwords,
               (n_words >= 50 AND n_words <= 100000)
               AND (n_nonspace_chars >= 3 * n_words AND n_nonspace_chars <= 10 * n_words)
               AND (10 * n_symbols < n_words)
               AND (10 * n_bullet_lines < 9 * n_lines)
               AND (10 * n_ellipsis_lines < 3 * n_lines)
               AND (10 * n_alpha_words > 8 * n_words)
               AND (n_stop_types >= 2) AS keep
        FROM feat
        """

QUERIES = [
    Query(
        "dedup_exact",
        dedup_exact,
        f"""
        SELECT text_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
        FROM (SELECT {H.format(x="text")} AS text_hash, doc_id FROM documents)
        GROUP BY text_hash
        """,
        doc="exact dedup on 60-bit text hash; 8-byte group keys at any scale",
        tags=("llm", "dedup"),
    ),
    Query(
        "dedup_ngram_jaccard",
        dedup_ngram,
        f"""
        WITH {WS_SH_CTE},
        {NGRAM_PAIR_CTES}
        SELECT doc_id_a, doc_id_b, i AS inter, sa.n + sb.n - i AS uni,
               CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_id_a
        JOIN sizes sb ON sb.doc_id = doc_id_b
        WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= {JACCARD_THRESHOLD}
        """,
        doc="exact word-3-gram Jaccard pairs via shingle inverted-index join",
        tags=("llm", "dedup"),
    ),
    Query(
        "dedup_containment",
        dedup_containment_q,
        f"""
        WITH {WS_SH_CTE},
        {NGRAM_PAIR_CTES}
        SELECT doc_id_a, doc_id_b, i AS inter, sa.n AS na, sb.n AS nb,
               CAST(i AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE) AS containment
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_id_a
        JOIN sizes sb ON sb.doc_id = doc_id_b
        WHERE CAST(i AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE) >= 0.8
        """,
        doc="asymmetric containment pairs |A∩B|/min(|A|,|B|) — catches "
        "doc-inside-doc boilerplate that Jaccard misses; same single "
        "inverted-index join",
        tags=("llm", "dedup"),
    ),
    Query(
        "dedup_minhash_lsh",
        dedup_minhash,
        _minhash_oracle(dedup.MINHASH_K, dedup.MINHASH_BANDS, JACCARD_THRESHOLD),
        doc="MinHash(12)+LSH(4 bands) candidates, exact-Jaccard verified",
        tags=("llm", "dedup"),
    ),
    Query(
        "dedup_simhash",
        dedup_simhash,
        _simhash_oracle(),
        doc="60-bit SimHash fingerprints (sign-sum of shingle hash bits)",
        tags=("llm", "dedup"),
    ),
    Query(
        "dedup_simhash_pairs",
        dedup_simhash_pairs_q,
        _simhash_pairs_oracle(),
        doc="SimHash Hamming-ball pairs (<=3 bits): pigeonhole band join "
        "candidates + bit_count(xor) verify",
        tags=("llm", "dedup"),
    ),
    Query(
        "dedup_clusters",
        dedup_clusters_q,
        f"""
        WITH RECURSIVE {_cluster_ctes()}
        SELECT doc_id, cluster_id FROM clusters
        """,
        doc="connected-components clustering of near-dup pairs (iterative "
        "min-label propagation) → keep-list cluster ids",
        tags=("llm", "dedup", "graph"),
    ),
    Query(
        "dedup_embedding_cosine",
        dedup_cosine,
        f"""
        WITH q AS (SELECT vec_id, {QVEC} AS qv FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {COS.format(a="a.qv", b="b.qv")} AS cosine
        FROM q a JOIN q b ON a.vec_id < b.vec_id
        WHERE {COS.format(a="a.qv", b="b.qv")} >= {COSINE_THRESHOLD}
        """,
        doc="embedding-cosine near-dup pairs (quantized exact arithmetic)",
        tags=("llm", "dedup", "embedding"),
    ),
    Query(
        "dedup_embedding_clusters",
        dedup_embedding_clusters_q,
        f"""
        WITH RECURSIVE q AS (SELECT vec_id, {QVEC} AS qv FROM embeddings),
        cp AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM q a JOIN q b ON a.vec_id < b.vec_id
          WHERE {COS.format(a="a.qv", b="b.qv")} >= {COSINE_THRESHOLD}
        ),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM cp
          UNION SELECT id_b, id_a FROM cp
        ),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT src AS vec_id, LEAST(src, MIN(dst)) AS cluster_id
        FROM reach GROUP BY src
        """,
        doc="embedding-space near-dup clustering: exact cosine pair graph "
        "→ connected components keep-list",
        tags=("llm", "dedup", "embedding", "graph"),
    ),
    Query(
        "dedup_embedding_lsh",
        dedup_cosine_lsh,
        f"""
        WITH c AS (SELECT vec_id, {QVEC} AS qv FROM embeddings),
        cb AS (SELECT vec_id, qv, {_lsh_bucket_sql("qv")} AS bucket FROM c)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {COS.format(a="a.qv", b="b.qv")} AS cosine
        FROM cb a JOIN cb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE {COS.format(a="a.qv", b="b.qv")} >= {COSINE_THRESHOLD}
        """,
        doc="embedding near-dup via hyperplane-LSH bucket equi-join + exact "
        "in-bucket cosine — the sub-quadratic scale path (recall < 1)",
        tags=("llm", "dedup", "embedding", "lsh"),
    ),
    Query(
        "embedding_knn_graph_lsh",
        knn_graph_lsh_q,
        f"""
        WITH c AS (SELECT vec_id, {QVEC} AS qv FROM embeddings),
        cb AS (SELECT vec_id, qv, {_lsh_bucket_sql("qv")} AS bucket FROM c),
        scored AS (
          SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
                 {COS.format(a="a.qv", b="b.qv")} AS cosine
          FROM cb a JOIN cb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        )
        SELECT src_id, dst_id, cosine, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
                        ORDER BY cosine DESC, dst_id ASC) AS rn FROM scored)
        WHERE rn <= {KNN_K}
        """,
        doc="approximate corpus kNN graph: LSH-bucket first, exact cosine "
        "graph per bucket (the documented sub-quadratic path of "
        "embedding_knn_graph; SemDedup at 10^9 vectors runs this shape)",
        tags=("llm", "similarity", "embedding", "graph", "lsh"),
    ),
    Query(
        "ann_bruteforce_topk",
        ann_brute,
        f"""
        WITH c AS (SELECT vec_id, {QVEC} AS qv FROM embeddings),
        q AS (SELECT vec_id, qv FROM c WHERE vec_id < {ANN_QUERY_MAX_ID}),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 {COS.format(a="q.qv", b="c.qv")} AS cosine
          FROM q CROSS JOIN c WHERE q.vec_id <> c.vec_id
        )
        SELECT query_id, neighbor_id, cosine, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS rn FROM scored)
        WHERE rn <= {ANN_K}
        """,
        doc="exact cosine top-5 per query vector (broadcast queries, map-only)",
        tags=("llm", "ann"),
    ),
    Query(
        "ann_lsh_topk",
        ann_lsh,
        f"""
        WITH c AS (SELECT vec_id, {QVEC} AS qv FROM embeddings),
        cb AS (SELECT vec_id, qv, {_lsh_bucket_sql("qv")} AS bucket FROM c),
        q AS (SELECT vec_id, qv, bucket FROM cb WHERE vec_id < {ANN_QUERY_MAX_ID}),
        scored AS (
          SELECT q.vec_id AS query_id, cb.vec_id AS neighbor_id,
                 {COS.format(a="q.qv", b="cb.qv")} AS cosine
          FROM q JOIN cb ON q.bucket = cb.bucket AND q.vec_id <> cb.vec_id
        )
        SELECT query_id, neighbor_id, cosine, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS rn FROM scored)
        WHERE rn <= {ANN_K}
        """,
        doc="random-hyperplane LSH bucketed top-5 — the both-sides-large scale path",
        tags=("llm", "ann"),
    ),
    Query(
        "ann_ivf_topk",
        ann_ivf,
        f"""
        WITH c AS (SELECT vec_id, {QVEC} AS qv FROM embeddings),
        cents AS (SELECT vec_id AS cid, qv AS qvc FROM c WHERE vec_id < 16),
        assigned AS (
          SELECT vec_id, qv, cid AS cluster FROM (
            SELECT c.vec_id, c.qv, cents.cid,
                   ROW_NUMBER() OVER (PARTITION BY c.vec_id
                        ORDER BY {COS.format(a="c.qv", b="cents.qvc")} DESC, cents.cid ASC) AS rn
            FROM c CROSS JOIN cents
          ) WHERE rn = 1
        ),
        q AS (SELECT vec_id AS query_id, qv AS qv_q, cluster
              FROM assigned WHERE vec_id < {ANN_QUERY_MAX_ID}),
        scored AS (
          SELECT q.query_id, a.vec_id AS neighbor_id,
                 {COS.format(a="q.qv_q", b="a.qv")} AS cosine
          FROM q JOIN assigned a ON q.cluster = a.cluster AND q.query_id <> a.vec_id
        )
        SELECT query_id, neighbor_id, cosine, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS rn FROM scored)
        WHERE rn <= {ANN_K}
        """,
        doc="IVF ANN (nprobe=1, deterministic centroids): inverted-list probe "
        "— the partitioned-index scale path",
        tags=("llm", "ann"),
    ),
    Query(
        "embedding_knn_graph",
        knn_graph_q,
        f"""
        WITH c AS (SELECT vec_id, {QVEC} AS qv FROM embeddings),
        scored AS (
          SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
                 {COS.format(a="a.qv", b="b.qv")} AS cosine
          FROM c a JOIN c b ON a.vec_id <> b.vec_id
        )
        SELECT vec_id, neighbor_id, cosine, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS rn FROM scored)
        WHERE rn <= {KNN_K}
        """,
        doc="exact cosine k-NN graph over the whole corpus: block-tiled "
        "matmuls with per-tile local top-k (SemDedup / graph-index front end)",
        tags=("llm", "ann", "embedding", "graph"),
    ),
    Query(
        "text_rare_token_stats",
        text_rare_tokens,
        """
        WITH tf AS (
          SELECT doc_id, word, COUNT(*) AS tf
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
          GROUP BY doc_id, word
        ),
        cf AS (SELECT word, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY word),
        tot AS (SELECT COUNT(*) AS vocab, CAST(SUM(cf) AS BIGINT) AS total FROM cf)
        SELECT doc_id,
               CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN cf.cf * 2 * tot.vocab < tot.total THEN tf.tf ELSE 0 END) AS BIGINT)
                 AS n_rare_tokens,
               CAST(SUM(CASE WHEN cf.cf * 2 * tot.vocab < tot.total THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_rare_kinds
        FROM tf JOIN cf USING (word), tot
        GROUP BY doc_id
        """,
        doc="corpus-relative rare-token stats per doc (OOV/noise quality "
        "heuristic); exact-integer rarity predicate, no absolute threshold",
        tags=("llm", "text", "quality"),
    ),
    Query(
        "corpus_pipeline",
        corpus_pipeline,
        f"""
        WITH keep AS (
          SELECT doc_id FROM documents
          WHERE len(string_split(text, ' ')) BETWEEN 10 AND 1000
        ),
        reps AS (
          SELECT MIN(doc_id) AS doc_id
          FROM (SELECT {H.format(x="text")} AS text_hash, doc_id FROM documents)
          GROUP BY text_hash
        )
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS tokens
        FROM documents
        WHERE doc_id IN (SELECT doc_id FROM keep)
          AND doc_id IN (SELECT doc_id FROM reps)
        GROUP BY source
        """,
        doc="composed pipeline: quality filter → dedup representatives → "
        "per-source token budget",
        tags=("llm", "pipeline"),
    ),
    Query(
        "text_language_id",
        text_lang,
        _lang_oracle(),
        doc="marker-word language heuristic with fixed-priority argmax",
        tags=("llm", "text"),
    ),
    Query(
        "text_quality_score",
        text_quality,
        f"""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_m,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               CAST(length(text) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len,
               CAST(len(list_filter(string_split(text, ' '), x -> list_contains([{EN_LIST}], x))) AS DOUBLE)
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
               len(string_split(text, ' ')) BETWEEN 10 AND 1000 AS keep
        FROM documents
        """,
        doc="length/stopword quality features + keep flag",
        tags=("llm", "text"),
    ),
    Query(
        "text_token_counts",
        text_tokens,
        """
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
               CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS bpe_est
        FROM documents
        """,
        doc="whitespace token count + ~4-chars/token BPE budget estimate",
        tags=("llm", "text"),
    ),
    Query(
        "text_fingerprint",
        text_fp,
        f"""
        SELECT doc_id,
               {H.format(x="regexp_replace(trim(lower(text)), ' +', ' ', 'g')")} AS fingerprint
        FROM documents
        """,
        doc="normalized-text 60-bit content fingerprint",
        tags=("llm", "text"),
    ),
    Query(
        "corpus_ngram_stats",
        corpus_ngram_stats,
        f"""
        WITH {WS_SH_CTE},
        dfs AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle)
        SELECT shingle, df, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY df DESC, shingle ASC) AS rn FROM dfs)
        WHERE rn <= 20
        """,
        doc="top-20 trigram document frequencies (stop-shingle / "
        "contamination analysis table)",
        tags=("llm", "text", "stats"),
    ),
    Query(
        "text_tfidf_keywords",
        text_keywords,
        """
        WITH terms AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        ),
        tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM terms GROUP BY doc_id, word),
        dl AS (SELECT doc_id, COUNT(*) AS len FROM terms GROUP BY doc_id),
        dfc AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.word,
                 (CAST(tf AS DOUBLE) / CAST(len AS DOUBLE))
                   * (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS score
          FROM tf JOIN dl USING (doc_id) JOIN dfc USING (word) CROSS JOIN n
        )
        SELECT doc_id, word, score, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                        ORDER BY score DESC, word ASC) AS rn FROM scored)
        WHERE rn <= 5
        """,
        doc="tf-idf keyword extraction (rational idf — engine-exact, no log)",
        tags=("llm", "text", "keywords"),
    ),
    Query(
        "text_bm25_search",
        text_bm25,
        """
        WITH terms AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        ),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM terms GROUP BY doc_id),
        stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_words FROM dl),
        tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM terms
               WHERE word IN ('spark', 'join', 'vector') GROUP BY doc_id, word),
        dfc AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
        partials AS (
          SELECT tf.doc_id,
                 CAST(FLOOR(
                   ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                      / (CAST(df AS DOUBLE) + 0.5))
                   * ((CAST(tf AS DOUBLE) * (1.2 + 1.0))
                      / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 *
                         (CAST(dl AS DOUBLE)
                            / (CAST(total_words AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
                   * 1000000000.0) AS BIGINT) AS p_e9
          FROM tf JOIN dl USING (doc_id) JOIN dfc USING (word) CROSS JOIN stats
        ),
        scored AS (SELECT doc_id, CAST(SUM(p_e9) AS BIGINT) AS score_e9
                   FROM partials GROUP BY doc_id)
        SELECT doc_id, score_e9, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY score_e9 DESC, doc_id ASC) AS rn
              FROM scored)
        WHERE rn <= 10
        """,
        doc="BM25 keyword retrieval, top-10 (rational idf, e9 fixed-point "
        "partials so double summation order can't flip the hash)",
        tags=("llm", "text", "search"),
    ),
    Query(
        "text_chunking",
        text_chunks,
        """
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS w,
                          len(string_split(text, ' ')) AS n FROM documents),
        st AS (SELECT doc_id, w,
                      unnest(range(1, greatest(n - 1, 1) + 1, 24)) AS start FROM w)
        SELECT doc_id,
               CAST((start - 1) // 24 AS INTEGER) AS chunk_idx,
               array_to_string(list_slice(w, start, start + 31), ' ') AS chunk_text,
               CAST(len(list_slice(w, start, start + 31)) AS BIGINT) AS n_tokens
        FROM st
        """,
        doc="context-window chunking: 32-token windows, stride 24 (overlap 8) "
        "— map-only training-window prep",
        tags=("llm", "text", "chunking"),
    ),
    Query(
        "text_scrub_pii",
        text_scrub,
        r"""
        WITH c AS (
          SELECT doc_id,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                     'https?://[^\s]+', '<URL>', 'g'),
                   '\b\d{7,}\b', '<NUM>', 'g') AS clean_text
          FROM documents
        )
        SELECT doc_id, clean_text,
               CAST(len(string_split_regex(clean_text, '<EMAIL>|<URL>|<NUM>')) - 1 AS INTEGER)
                 AS n_redactions
        FROM c
        """,
        doc="PII scrub: email/URL/long-number regex redaction + count",
        tags=("llm", "text", "pii"),
    ),
    Query(
        "text_winnow_fingerprint",
        text_winnow,
        f"""
        WITH grams AS (
          SELECT doc_id, CAST(pos AS INTEGER) AS pos,
                 {H.format(x="substr(lower(text), pos, 8)")} AS h
          FROM documents, unnest(range(1, length(lower(text)) - 6)) AS t(pos)
          WHERE length(text) >= 8
        ),
        winnowed AS (
          SELECT doc_id,
                 MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
          FROM grams
        )
        SELECT DISTINCT doc_id, fp FROM winnowed
        """,
        doc="winnowing rolling-hash fingerprints (k=8 char-grams, w=4): any "
        "shared substring >= k+w-1 chars yields a shared fingerprint",
        tags=("llm", "text", "dedup"),
    ),
    Query(
        "embedding_label_centroids",
        emb_centroids,
        f"""
        SELECT CAST(label AS INTEGER) AS label,
               CAST(i - 1 AS INTEGER) AS dim,
               CAST(SUM(qv[i]) AS BIGINT) AS comp_sum,
               COUNT(*) AS n_vecs
        FROM (SELECT label, {QVEC} AS qv FROM embeddings), unnest(range(1, 65)) AS t(i)
        GROUP BY label, i
        """,
        doc="per-label centroid sums via applyInPandas (grouped-map Arrow "
        "kernel) — the custom per-group numeric-kernel pattern",
        tags=("llm", "embedding", "pandas"),
    ),
    Query(
        "multimodal_meta",
        mm_meta,
        """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               CAST(32 + h % 993 AS BIGINT) AS width,
               CAST(32 + (h // 1024) % 993 AS BIGINT) AS height,
               CAST(h % 256000 AS DOUBLE) / 1000.0 AS mean_px
        FROM (SELECT doc_id, text, ('0x' || substr(md5(text), 1, 15))::BIGINT AS h FROM documents)
        """,
        doc="binary payload + mapInPandas (Arrow) feature extraction; decode "
        "stubbed deterministically (multimodal.fake_decode)",
        tags=("llm", "multimodal"),
    ),
    Query(
        "multimodal_resize",
        mm_resize,
        """
        WITH d AS (
          SELECT doc_id,
                 CAST(32 + h % 993 AS BIGINT) AS width,
                 CAST(32 + (h // 1024) % 993 AS BIGINT) AS height
          FROM (SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS h FROM documents)
        )
        SELECT doc_id, width, height,
               CAST(FLOOR(width * (224.0 / greatest(width, height))) AS BIGINT) AS new_width,
               CAST(FLOOR(height * (224.0 / greatest(width, height))) AS BIGINT) AS new_height,
               224.0 / greatest(width, height) AS scale
        FROM d
        """,
        doc="aspect-preserving resize plumbing (mapInPandas; resample stubbed, "
        "scale arithmetic real)",
        tags=("llm", "multimodal"),
    ),
    Query(
        "multimodal_audio_meta",
        mm_audio,
        """
        SELECT doc_id,
               CAST(CASE h % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                               WHEN 2 THEN 22050 ELSE 44100 END AS BIGINT) AS sample_rate,
               CAST(octet_length(encode(text)) * 256 + h % 256 AS BIGINT) AS n_samples,
               CAST(octet_length(encode(text)) * 256 + h % 256 AS DOUBLE)
                 / CASE h % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                              WHEN 2 THEN 22050 ELSE 44100 END AS duration_sec
        FROM (SELECT doc_id, text, ('0x' || substr(md5(text), 1, 15))::BIGINT AS h FROM documents)
        """,
        doc="audio-modality metadata via mapInPandas (sample rate / samples / "
        "duration; codec stubbed deterministically)",
        tags=("llm", "multimodal", "audio"),
    ),
    Query(
        "multimodal_phash_pairs",
        lambda spark, sf: multimodal.phash_closest_pairs(
            multimodal.media_table(load(spark, sf, "documents"))
        ),
        """
        WITH m AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
                          octet_length(encode(text)) AS L FROM documents),
        n AS (SELECT doc_id,
                CAST((('0x' || substr(md5('ph:' ||
                    substr(hx, 2 * ((i.g * L) // 15) + 1,
                           2 * (((i.g + 1) * L) // 15) - 2 * ((i.g * L) // 15))),
                  1, 15))::BIGINT % 16) AS BIGINT) << (4 * i.g) AS nibshift
              FROM m, UNNEST(generate_series(0, 14)) AS i(g)),
        p AS (SELECT doc_id, CAST(SUM(nibshift) AS BIGINT) AS phash
              FROM n GROUP BY doc_id),
        b AS (SELECT doc_id, phash, t.g AS band_idx,
                     (phash >> (12 * t.g)) & 4095 AS band_val
              FROM p, UNNEST(generate_series(0, 4)) AS t(g)),
        b2 AS (SELECT doc_id, phash, band_idx, band_val,
                      COUNT(*) OVER (PARTITION BY band_idx, band_val) AS bpop
               FROM b),
        c AS (SELECT DISTINCT a.doc_id AS doc_id_a, bb.doc_id AS doc_id_b,
                     a.phash AS pa, bb.phash AS pb
              FROM b2 a JOIN b2 bb
                ON a.band_idx = bb.band_idx AND a.band_val = bb.band_val
               AND a.doc_id < bb.doc_id
              WHERE a.bpop <= 1024)
        SELECT doc_id_a, doc_id_b, hamming, CAST(rn AS INTEGER) AS rank
        FROM (SELECT doc_id_a, doc_id_b,
                     CAST(bit_count(xor(pa, pb)) AS INTEGER) AS hamming,
                     ROW_NUMBER() OVER (ORDER BY bit_count(xor(pa, pb)) ASC,
                                        doc_id_a ASC, doc_id_b ASC) AS rn
              FROM c)
        WHERE rn <= 20
        """,
        doc="top-20 closest perceptual-hash media pairs: 60-bit "
        "segment-nibble pHash (Arrow-batched over binary payloads; codec "
        "stubbed deterministically, every nibble SQL-reproducible), "
        "5x12-bit banded candidates, exact Hamming ranking — the "
        "multimodal dedup triage list; the thresholded dup filter is "
        "multimodal.phash_neardup_pairs (unit-tested: same-length edits "
        "land at small Hamming; insertions need the winnow family, "
        "documented)",
        tags=("llm", "multimodal", "dedup"),
    ),
    Query(
        "dedup_kept_corpus",
        dedup_kept_corpus,
        f"""
        WITH RECURSIVE {_cluster_ctes()},
        dropped AS (SELECT doc_id FROM clusters WHERE doc_id != cluster_id)
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
        GROUP BY lang
        """,
        doc="end-to-end near-dup removal: clusters → keep representatives → "
        "kept corpus stats per language",
        tags=("llm", "dedup", "pipeline"),
    ),
    Query(
        "dedup_keep_best",
        dedup_keep_best_q,
        f"""
        WITH RECURSIVE {_cluster_ctes()},
        quality AS (
          SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
          FROM documents
        ),
        ranked AS (
          SELECT c.cluster_id, c.doc_id, q.n_words,
                 ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                    ORDER BY q.n_words DESC, c.doc_id ASC) AS rk,
                 COUNT(*) OVER (PARTITION BY c.cluster_id) AS csize
          FROM clusters c JOIN quality q USING (doc_id)
        )
        SELECT cluster_id, doc_id AS keep_doc_id, n_words,
               CAST(csize AS BIGINT) AS cluster_size
        FROM ranked WHERE rk = 1
        """,
        doc="quality-aware canonical selection: per near-dup cluster keep "
        "the longest doc (n_words desc, id tie-break), not the min id",
        tags=("llm", "dedup", "pipeline"),
    ),
    Query(
        "curation_contamination",
        curation_contamination_q,
        f"""
        WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        g AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(range(1, len(w) - 1),
                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS gram
          FROM ws WHERE len(w) >= 3
        ),
        tr AS (SELECT doc_id, gram FROM g WHERE doc_id % {curation.EVAL_MODULUS} <> 0),
        evdocs AS (SELECT doc_id FROM documents
                   WHERE doc_id % {curation.EVAL_MODULUS} = 0
                   ORDER BY doc_id LIMIT {curation.EVAL_MAX_DOCS}),
        ev AS (SELECT g.doc_id AS eval_doc_id, gram FROM g
               JOIN evdocs ON g.doc_id = evdocs.doc_id),
        sizes AS (SELECT doc_id, COUNT(*) AS train_ngrams FROM tr GROUP BY doc_id),
        ov AS (
          SELECT tr.doc_id, ev.eval_doc_id, COUNT(*) AS overlap
          FROM tr JOIN ev USING (gram) GROUP BY tr.doc_id, ev.eval_doc_id
        )
        SELECT ov.doc_id, ov.eval_doc_id, ov.overlap, s.train_ngrams,
               CAST(ov.overlap AS DOUBLE) / CAST(s.train_ngrams AS DOUBLE) AS contamination
        FROM ov JOIN sizes s ON s.doc_id = ov.doc_id
        WHERE CAST(ov.overlap AS DOUBLE) / CAST(s.train_ngrams AS DOUBLE)
              >= {curation.CONTAMINATION_THRESHOLD}
        """,
        doc="benchmark-contamination check: 3-gram overlap of training docs "
        "vs the held-out eval split (doc_id % 97 == 0, capped at "
        "EVAL_MAX_DOCS — benchmark sets are fixed-size), broadcast eval index",
        tags=("llm", "curation"),
    ),
    Query(
        "curation_decontaminated",
        curation_decontaminated_q,
        f"""
        WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        g AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(range(1, len(w) - 1),
                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS gram
          FROM ws WHERE len(w) >= 3
        ),
        tr AS (SELECT doc_id, gram FROM g WHERE doc_id % {curation.EVAL_MODULUS} <> 0),
        evdocs AS (SELECT doc_id FROM documents
                   WHERE doc_id % {curation.EVAL_MODULUS} = 0
                   ORDER BY doc_id LIMIT {curation.EVAL_MAX_DOCS}),
        ev AS (SELECT g.doc_id AS eval_doc_id, gram FROM g
               JOIN evdocs ON g.doc_id = evdocs.doc_id),
        sizes AS (SELECT doc_id, COUNT(*) AS train_ngrams FROM tr GROUP BY doc_id),
        ov AS (
          SELECT tr.doc_id, ev.eval_doc_id, COUNT(*) AS overlap
          FROM tr JOIN ev USING (gram) GROUP BY tr.doc_id, ev.eval_doc_id
        ),
        bad AS (
          SELECT DISTINCT ov.doc_id FROM ov JOIN sizes s ON s.doc_id = ov.doc_id
          WHERE CAST(ov.overlap AS DOUBLE) / CAST(s.train_ngrams AS DOUBLE)
                >= {curation.CONTAMINATION_THRESHOLD}
        )
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE doc_id % {curation.EVAL_MODULUS} <> 0
          AND doc_id NOT IN (SELECT doc_id FROM bad)
        """,
        doc="the removal step after contamination detection: anti-join of "
        "the contaminated-id set against the training corpus (no broadcast "
        "hint — the hit set has no size proof; AQE broadcasts at runtime "
        "when it is small)",
        tags=("llm", "curation"),
    ),
    Query(
        "curation_sample_bernoulli",
        curation_sample_bernoulli_q,
        f"""
        SELECT doc_id, text, lang, source, n_chars FROM documents
        WHERE ('0x' || substr(md5('s0:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 1000000 < {int(SAMPLE_FRACTION * 1000000)}
        """,
        doc="deterministic hash-threshold Bernoulli sample (map-only, "
        "reproducible across runs/engines; salt selects the draw)",
        tags=("llm", "curation"),
    ),
    Query(
        "curation_sample_stratified",
        curation_sample_stratified_q,
        f"""
        WITH ranked AS (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY source
            ORDER BY ('0x' || substr(md5('s0:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                     doc_id) AS rk
          FROM documents
        )
        SELECT doc_id, text, lang, source, n_chars
        FROM ranked WHERE rk <= {SAMPLE_K_PER_STRATUM}
        """,
        doc="exact-k-per-stratum deterministic sample (salted-hash order, "
        "one window shuffle — the distributed reservoir stand-in)",
        tags=("llm", "curation"),
    ),
    Query(
        "curation_repetition",
        curation_repetition_q,
        """
        WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        feat AS (
          SELECT doc_id,
                 len(w) AS n_words,
                 len(list_distinct(w)) AS n_uniq,
                 CASE WHEN len(w) - 2 > 0 THEN len(w) - 2 ELSE 0 END AS total_grams,
                 CASE WHEN len(w) >= 3
                      THEN len(list_distinct(list_transform(range(1, len(w) - 1),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])))
                      ELSE 0 END AS uniq_grams
          FROM ws
        )
        SELECT doc_id,
               CAST(n_words AS BIGINT) AS n_words,
               CAST(n_words - n_uniq AS DOUBLE) / CAST(n_words AS DOUBLE) AS dup_word_ratio,
               CASE WHEN total_grams > 0
                    THEN CAST(total_grams - uniq_grams AS DOUBLE) / CAST(total_grams AS DOUBLE)
                    ELSE 0.0 END AS dup_ngram_ratio,
               (CASE WHEN total_grams > 0
                     THEN CAST(total_grams - uniq_grams AS DOUBLE) / CAST(total_grams AS DOUBLE)
                     ELSE 0.0 END) <= 0.3 AS keep
        FROM feat
        """,
        doc="within-document repetition features (dup word / dup 3-gram "
        "ratios) + keep flag — map-only boilerplate filter",
        tags=("llm", "curation"),
    ),
    Query(
        "curation_pretokens",
        curation_pretokens_q,
        """
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS BIGINT) AS n_pretokens,
               CAST(len(list_distinct(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))) AS BIGINT) AS n_distinct_pretokens
        FROM documents
        """,
        doc="BPE pre-tokenizer (RE2-safe GPT-2-style regex) token counts — "
        "the accurate token budget per document, map-only",
        tags=("llm", "curation"),
    ),
    Query(
        "curation_source_mixture",
        curation_source_mixture_q,
        """
        WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
        q AS (SELECT source, n_docs,
                     CAST(FLOOR(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT) AS qs
              FROM c)
        SELECT source, n_docs,
               CAST(qs AS DOUBLE) / CAST(SUM(qs) OVER () AS DOUBLE) AS weight,
               CAST(FLOOR(CAST(qs AS DOUBLE) / CAST(SUM(qs) OVER () AS DOUBLE)
                    * CAST(SUM(n_docs) OVER () AS DOUBLE)) AS BIGINT) AS expected_epoch_docs
        FROM q
        """,
        doc="temperature (alpha=0.5) source-mixture weights: quantized-sqrt "
        "upsampling of rare sources, exact-integer normalizer",
        tags=("llm", "curation"),
    ),
    Query(
        "curation_pack_sequences",
        curation_pack_q,
        """
        WITH t AS (
          SELECT doc_id, doc_id % 8 AS bucket,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 ('0x' || substr(md5('p0:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS ok
          FROM documents
        ),
        c AS (
          SELECT doc_id, bucket, n_tokens,
                 CAST(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY ok, doc_id
                      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_offset
          FROM t
        )
        SELECT doc_id, bucket, start_offset // 1024 AS seq_idx, start_offset, n_tokens
        FROM c
        """,
        doc="concat-then-chunk context packing into 1024-token sequences: "
        "deterministic salted-hash order, 8 parallel packing streams",
        tags=("llm", "curation"),
    ),
    Query(
        "curation_gopher_rules",
        curation_gopher_q,
        GOPHER_ORACLE,
        doc="Gopher quality-filter battery (word count, mean word length, "
        "symbol/bullet/ellipsis ratios, alpha fraction, stopword types) — "
        "every ratio compared by integer cross-multiplication; map-only",
        tags=("llm", "curation"),
    ),
    Query(
        "curation_c4_rules",
        curation_c4_q,
        r"""
        WITH feat AS (
          SELECT doc_id,
                 CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
                 CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT) AS n_sentences,
                 CAST(len(list_filter(string_split(text, chr(10)),
                      x -> regexp_matches(x, '[.!?"]\s*$'))) AS BIGINT) AS n_terminal_lines,
                 CAST(len(list_filter(string_split(text, chr(10)),
                      x -> len(string_split_regex(trim(x), '\s+')) < 5)) AS BIGINT) AS n_short_lines,
                 (contains(lower(text), 'lorem ipsum')
                   OR contains(lower(text), 'javascript')
                   OR contains(text, '{')) AS has_blocklisted
          FROM documents
        )
        SELECT *,
               n_sentences >= 3 AS r_sentences,
               2 * n_terminal_lines >= n_lines AS r_terminal_lines,
               2 * n_short_lines <= n_lines AS r_short_lines,
               NOT has_blocklisted AS r_blocklist,
               (n_sentences >= 3) AND (2 * n_terminal_lines >= n_lines)
               AND (2 * n_short_lines <= n_lines) AND NOT has_blocklisted AS keep
        FROM feat
        """,
        doc="C4 cleaning heuristics at doc level (sentence count, terminal-"
        "punctuation and short-line ratios, lorem/js/brace blocklist) — "
        "integer cross-multiplied thresholds; map-only",
        tags=("llm", "curation"),
    ),
    Query(
        "multimodal_frames",
        mm_frames,
        """
        SELECT doc_id, CAST(unnest(range(0,
                 CASE WHEN octet_length(encode(text)) // 32 - 1 > 0
                      THEN octet_length(encode(text)) // 32 - 1 ELSE 0 END + 1,
                 10)) AS BIGINT) AS frame_idx
        FROM documents
        """,
        doc="video frame-sampling plumbing: explode per sampled frame index",
        tags=("llm", "multimodal"),
    ),
    Query(
        "dedup_segments",
        dedup_segments_q,
        f"""
        WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        segl AS (
          SELECT doc_id,
                 list_transform(range(0, CAST(ceil(len(w) / 10.0) AS BIGINT)),
                   j -> array_to_string(w[j*10+1 : least((j+1)*10, len(w))], ' ')) AS segs
          FROM ws
        ),
        seg AS (
          SELECT doc_id, unnest(range(0, len(segs))) AS seg, unnest(segs) AS segment
          FROM segl
        ),
        hashed AS (SELECT doc_id, seg, segment, {H.format(x="segment")} AS sh FROM seg),
        boilerplate AS (
          SELECT sh FROM hashed GROUP BY sh HAVING COUNT(DISTINCT doc_id) > 1
        ),
        kept AS (
          SELECT doc_id, seg, segment FROM hashed
          WHERE sh NOT IN (SELECT sh FROM boilerplate)
        ),
        totals AS (SELECT doc_id, COUNT(*) AS n_segments FROM hashed GROUP BY doc_id),
        rebuilt AS (
          SELECT doc_id, COUNT(*) AS n_kept,
                 string_agg(segment, ' ' ORDER BY seg) AS clean_text
          FROM kept GROUP BY doc_id
        )
        SELECT t.doc_id, t.n_segments,
               COALESCE(r.n_kept, 0) AS n_kept,
               COALESCE(r.clean_text, '') AS clean_text
        FROM totals t LEFT JOIN rebuilt r ON r.doc_id = t.doc_id
        """,
        doc="line-level exact dedup (RefinedWeb/CCNet boilerplate pass): drop "
        "10-word segments recurring across docs, keep the documents; "
        "broadcast anti-join against the small over-cap segment set",
        tags=("llm", "dedup", "curation"),
    ),
    Query(
        "curation_model_filter",
        curation_model_filter_q,
        f"""
        SELECT doc_id, COUNT(*) AS n_tokens,
               CAST(SUM(({H.format(x="token")} % 2001) - 1000) AS BIGINT) AS raw_score,
               CAST(SUM(({H.format(x="token")} % 2001) - 1000) AS DOUBLE)
                 / CAST(COUNT(*) * 1000 AS DOUBLE) AS quality,
               SUM(({H.format(x="token")} % 2001) - 1000) > 0 AS keep
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY doc_id
        """,
        doc="model-based quality scoring with the hashing trick (fastText-"
        "style linear scorer, hash-derived stand-in weights): map-side "
        "feature hash, exact-integer partial sums, one final division",
        tags=("llm", "curation"),
    ),
    Query(
        "curation_dsir",
        curation_dsir_q,
        f"""
        WITH ws AS (SELECT doc_id, lang = 'en' AS is_t,
                           string_split(text, ' ') AS w FROM documents),
        uni AS (SELECT doc_id, is_t, unnest(w) AS gram FROM ws),
        bi AS (SELECT doc_id, is_t,
                      unnest(list_transform(range(1, len(w)),
                             i -> w[i] || ' ' || w[i+1])) AS gram
               FROM ws WHERE len(w) >= 2),
        grams AS (SELECT doc_id, is_t, ({H.format(x="gram")} % 4096) AS fb FROM uni
                  UNION ALL
                  SELECT doc_id, is_t, ({H.format(x="gram")} % 4096) FROM bi),
        df AS (SELECT doc_id, is_t, fb, COUNT(*) AS c FROM grams GROUP BY 1, 2, 3),
        ctr AS (SELECT fb, SUM(c) AS ct_r FROM df GROUP BY fb),
        ctt AS (SELECT fb, SUM(c) AS ct_t FROM df WHERE is_t GROUP BY fb),
        tot AS (SELECT SUM(c) AS n_r,
                       SUM(CASE WHEN is_t THEN c ELSE 0 END) AS n_t FROM df),
        ratios AS (
          SELECT fb,
                 CAST(FLOOR(CAST(COALESCE(ct_t, 0) + 1 AS DOUBLE)
                            * CAST(n_r + 4096 AS DOUBLE)
                            * 1000000000.0
                            / (CAST(ct_r + 1 AS DOUBLE)
                               * CAST(n_t + 4096 AS DOUBLE))) AS BIGINT) AS r_e9
          FROM ctr LEFT JOIN ctt USING (fb) CROSS JOIN tot
        ),
        scored AS (
          SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
                 CAST(SUM(CAST(c AS HUGEINT) * r_e9) // SUM(c) AS BIGINT) AS score_e9
          FROM df JOIN ratios USING (fb) GROUP BY doc_id
        ),
        ranked AS (SELECT *, ROW_NUMBER() OVER (ORDER BY score_e9 DESC, doc_id ASC) AS rn,
                          COUNT(*) OVER () AS n FROM scored)
        SELECT doc_id, n_grams, score_e9, rn <= (n + 3) // 4 AS keep FROM ranked
        """,
        doc="DSIR-style importance resampling (Xie et al. 2023): hashed "
        "unigram+bigram bucket models, e9 fixed-point target-vs-raw "
        "importance ratios (one pinned-order IEEE expression), "
        "DECIMAL(38,0)/HUGEINT count-weighted sums, deterministic "
        "top-quarter keep via the (score, id) total order — the no-rand "
        "stand-in for the paper's Gumbel top-k",
        tags=("llm", "curation"),
    ),
    Query(
        "ann_quantized_topk",
        ann_quantized,
        f"""
        WITH raw AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                 list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale
          FROM embeddings
        ),
        c AS (
          SELECT vec_id,
                 list_transform(v, x -> floor((x * 127.0) / scale)) AS qv
          FROM raw WHERE scale > 0
        ),
        q AS (SELECT vec_id, qv FROM c WHERE vec_id < {ANN_QUERY_MAX_ID}),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 {COS.format(a="q.qv", b="c.qv")} AS cosine_q8
          FROM q CROSS JOIN c WHERE q.vec_id <> c.vec_id
        )
        SELECT query_id, neighbor_id, cosine_q8, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine_q8 DESC, neighbor_id ASC) AS rn FROM scored)
        WHERE rn <= {ANN_K}
        """,
        doc="int8 scalar-quantized cosine top-k (4x smaller corpus bytes — "
        "the memory-bound ANN scale path); same broadcast-queries/"
        "per-partition-matmul plan as the exact baseline",
        tags=("llm", "similarity"),
    ),
    Query(
        "ann_ivf_index_topk",
        ann_ivf_index,
        f"""
        WITH c AS (SELECT vec_id, {QVEC} AS qv FROM embeddings),
        cent AS (SELECT vec_id AS cid, qv AS cqv FROM c WHERE vec_id < 16),
        ca AS (
          SELECT vec_id, qv, cid AS cluster FROM (
            SELECT c.vec_id, c.qv, cent.cid,
                   ROW_NUMBER() OVER (PARTITION BY c.vec_id
                     ORDER BY {COS.format(a="c.qv", b="cent.cqv")} DESC, cent.cid ASC) AS rn
            FROM c CROSS JOIN cent
          ) WHERE rn = 1
        ),
        q AS (SELECT vec_id AS query_id, qv FROM c WHERE vec_id < {ANN_QUERY_MAX_ID}),
        qa AS (
          SELECT query_id, qv, cid AS cluster FROM (
            SELECT q.query_id, q.qv, cent.cid,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                     ORDER BY {COS.format(a="q.qv", b="cent.cqv")} DESC, cent.cid ASC) AS rn
            FROM q CROSS JOIN cent
          ) WHERE rn <= 2
        ),
        scored AS (
          SELECT qa.query_id, ca.vec_id AS neighbor_id,
                 {COS.format(a="qa.qv", b="ca.qv")} AS cosine
          FROM qa JOIN ca ON ca.cluster = qa.cluster AND ca.vec_id <> qa.query_id
        )
        SELECT query_id, neighbor_id, cosine, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS rn FROM scored)
        WHERE rn <= {ANN_K}
        """,
        doc="persisted IVF index: build once (centroids + cluster-"
        "partitioned inverted lists), query many with nprobe=2 — the "
        "lists scan prunes to exactly the probed partitions",
        tags=("llm", "similarity", "index"),
    ),
    Query(
        "dedup_repeated_spans",
        dedup_spans_q,
        f"""
        WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sll AS (
          SELECT doc_id,
                 list_transform(range(1, len(w) - 8),
                   i -> array_to_string(w[i : i + 9], ' ')) AS shingles_pos
          FROM ws WHERE len(w) >= 10
        ),
        sl AS (
          SELECT doc_id,
                 unnest(range(0, len(shingles_pos))) AS pos,
                 {H.format(x="unnest(shingles_pos)")} AS h
          FROM sll
        ),
        repeated AS (SELECT h FROM sl GROUP BY h HAVING COUNT(*) >= 2),
        occ AS (SELECT doc_id, pos FROM sl WHERE h IN (SELECT h FROM repeated)),
        offs AS (SELECT unnest(range(0, 10)) AS d),
        covered AS (SELECT DISTINCT doc_id, pos + d AS pos FROM occ CROSS JOIN offs),
        wrd AS (
          SELECT doc_id, unnest(range(0, len(w))) AS pos, unnest(w) AS word FROM ws
        ),
        kept AS (
          SELECT wrd.doc_id, wrd.pos, wrd.word FROM wrd
          LEFT JOIN covered c ON c.doc_id = wrd.doc_id AND c.pos = wrd.pos
          WHERE c.doc_id IS NULL
        ),
        totals AS (SELECT doc_id, COUNT(*) AS n_words FROM wrd GROUP BY doc_id),
        rebuilt AS (
          SELECT doc_id, COUNT(*) AS n_kept,
                 string_agg(word, ' ' ORDER BY pos) AS clean_text
          FROM kept GROUP BY doc_id
        )
        SELECT t.doc_id, t.n_words,
               COALESCE(r.n_kept, 0) AS n_kept,
               COALESCE(r.clean_text, '') AS clean_text
        FROM totals t LEFT JOIN rebuilt r ON r.doc_id = t.doc_id
        """,
        doc="exact repeated-substring dedup (Lee et al. 2022): remove every "
        "word position covered by a 10-word sequence occurring 2+ times "
        "anywhere in the corpus; sliding shingles via lead() window, "
        "hash-keyed repeat detection, covered-position anti-join",
        tags=("llm", "dedup"),
    ),
    Query(
        "dedup_normalized",
        dedup_normalized_q,
        f"""
        SELECT norm_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
        FROM (
          SELECT {H.format(x="regexp_replace(trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')), ' +', ' ', 'g')")} AS norm_hash,
                 doc_id
          FROM documents
        )
        GROUP BY norm_hash
        """,
        doc="near-exact dedup after canonicalization (lowercase, strip "
        "punctuation, collapse whitespace — the Dolma/Gopher pass); still "
        "map + one 8-byte-key shuffle",
        tags=("llm", "dedup"),
    ),
    Query(
        "curation_rebalance",
        curation_rebalance_q,
        f"""
        WITH sized AS (
          SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents
        ),
        per_source AS (
          SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS source_tokens
          FROM sized GROUP BY source
        ),
        n AS (SELECT COUNT(*) AS n_sources FROM per_source),
        rates AS (
          SELECT source,
                 least(CAST(1000000 AS BIGINT),
                       CAST(CAST({REBALANCE_BUDGET * 1_000_000} AS HUGEINT)
                            // (n.n_sources * source_tokens) AS BIGINT)) AS rate_e6
          FROM per_source CROSS JOIN n
        )
        SELECT s.doc_id, s.source, s.n_tokens, r.rate_e6,
               ({H.format(x="CAST(s.doc_id AS VARCHAR)")} % 1000000) < r.rate_e6 AS keep
        FROM sized s JOIN rates r ON r.source = s.source
        """,
        doc="token-budget mixture rebalancing: equal-share per-source "
        "Bernoulli keep-rates from exact-integer rate math, hash-threshold "
        "keep decision; corpus never shuffles (rates broadcast back)",
        tags=("llm", "curation"),
    ),
    Query(
        "curation_unimax",
        curation_unimax_q,
        f"""
        WITH per AS (
          SELECT source,
                 CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS source_tokens,
                 CAST(SUM(len(string_split(text, ' '))) * 4 AS BIGINT) AS cap_tokens
          FROM documents GROUP BY source
        ),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER w AS rn,
                 COUNT(*) OVER w_full AS n,
                 COALESCE(SUM(cap_tokens) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND 1 PRECEDING), 0) AS cum_prev
          FROM per
          WINDOW w AS (ORDER BY cap_tokens ASC, source ASC),
                 w_full AS (ORDER BY cap_tokens ASC, source ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
        ),
        flagged AS (
          SELECT *, CAST(cap_tokens AS HUGEINT) * (n - rn + 1)
                      <= {UNIMAX_BUDGET} - cum_prev AS capped
          FROM ranked
        ),
        stats AS (
          SELECT *, SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS k,
                 SUM(CASE WHEN capped THEN cap_tokens ELSE 0 END) OVER () AS cum_k
          FROM flagged
        ),
        alloc AS (
          SELECT source, source_tokens, cap_tokens, capped,
                 CAST(CASE WHEN capped THEN cap_tokens
                      ELSE ({UNIMAX_BUDGET} - cum_k) // (n - k)
                           + (CASE WHEN rn - k <= ({UNIMAX_BUDGET} - cum_k)
                                     - (({UNIMAX_BUDGET} - cum_k) // (n - k))
                                       * (n - k)
                               THEN 1 ELSE 0 END)
                      END AS BIGINT) AS alloc_tokens
          FROM stats
        )
        SELECT source, source_tokens, cap_tokens, alloc_tokens, capped,
               CAST(CAST(alloc_tokens AS HUGEINT) * 1000000 // source_tokens
                    AS BIGINT) AS epochs_e6
        FROM alloc
        """,
        doc="UniMax-style epoch-capped token-budget waterfill (Chung et "
        "al. 2023): per-source caps = tokens x max_epochs, ascending "
        "closed-form prefix test (pure-integer, provably prefix-"
        "monotone), capped sources take their cap, the rest split the "
        "leftover with a deterministic remainder rule — exact integers "
        "end-to-end, spends exactly min(budget, sum caps); one corpus "
        "aggregate, then windows over the bounded source catalog via "
        "the certified orderBy+limit shape",
        tags=("llm", "curation"),
    ),
    Query(
        "curation_temperature",
        curation_temperature_q,
        f"""
        WITH per AS (
          SELECT source,
                 CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS source_tokens
          FROM documents GROUP BY source
        ),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER w AS rn,
                 CAST(FLOOR(1e9 * SQRT(CAST(source_tokens AS DOUBLE)))
                      AS BIGINT) AS pe9
          FROM per
          WINDOW w AS (ORDER BY source_tokens ASC, source ASC)
        ),
        sized AS (SELECT *, SUM(pe9) OVER () AS s_pe9 FROM ranked),
        based AS (
          SELECT *, CAST(CAST({UNIMAX_BUDGET} AS HUGEINT) * pe9 // s_pe9
                         AS BIGINT) AS base
          FROM sized
        ),
        d AS (SELECT *, SUM(base) OVER () AS dist FROM based)
        SELECT source, source_tokens,
               CAST(CAST(pe9 AS HUGEINT) * 1000000000 // s_pe9 AS BIGINT)
                 AS weight_e9,
               CAST(base + (CASE WHEN rn <= {UNIMAX_BUDGET} - dist
                            THEN 1 ELSE 0 END) AS BIGINT) AS alloc_tokens,
               CAST(CAST(base + (CASE WHEN rn <= {UNIMAX_BUDGET} - dist
                                 THEN 1 ELSE 0 END) AS HUGEINT) * 1000000
                    // source_tokens AS BIGINT) AS epochs_e6
        FROM d
        """,
        doc="temperature-scaled source sampling (mT5/XLM-R mixing rule, "
        "T=2): weights proportional to sqrt(source tokens) — the one "
        "power that is a correctly-rounded IEEE primitive in both "
        "engines, so the e9 fixed-point weight table hash-matches the "
        "oracle; exact-integer budget split with a deterministic "
        "remainder rule spends exactly B; one corpus aggregate, then "
        "the certified orderBy+limit bounded-catalog window shape",
        tags=("llm", "curation"),
    ),
    Query(
        "curation_export_shards",
        curation_export_q,
        f"""
        WITH t AS (
          SELECT doc_id, doc_id % 8 AS bucket,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 {H.format(x="'e0:' || CAST(doc_id AS VARCHAR)")} AS ok
          FROM documents
        ),
        s AS (
          SELECT bucket,
                 CAST((SUM(n_tokens) OVER (PARTITION BY bucket
                        ORDER BY ok ASC, doc_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens) // 4096 AS BIGINT) AS shard,
                 n_tokens
          FROM t
        )
        SELECT bucket, shard, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        FROM s GROUP BY bucket, shard
        """,
        doc="terminal export step: size-balanced training shards via the "
        "bucketed-cumsum packing shape, corpus written partitioned by "
        "(bucket, shard), manifest returned for epoch planning",
        tags=("llm", "curation", "export"),
    ),
]


_MULTI_BUCKETS = ",\n       ".join(
    f"{_lsh_bucket_sql('qv', t)} AS b{t}" for t in range(4)
)
_MULTI_CAND = "\n    UNION ALL ".join(
    f"SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id "
    f"FROM qb q JOIN cb c ON q.b{t} = c.b{t} AND c.vec_id <> q.vec_id"
    for t in range(4)
)

QUERIES.append(
    Query(
        "ann_lsh_multitable_topk",
        ann_lsh_multi,
        f"""
        WITH c0 AS (SELECT vec_id, {QVEC} AS qv FROM embeddings),
        cb AS (SELECT vec_id, qv,
               {_MULTI_BUCKETS}
               FROM c0),
        qb AS (SELECT * FROM cb WHERE vec_id < {ANN_QUERY_MAX_ID}),
        cand AS (SELECT DISTINCT query_id, neighbor_id FROM ({_MULTI_CAND})),
        scored AS (
          SELECT cand.query_id, cand.neighbor_id,
                 {COS.format(a="q.qv", b="c.qv")} AS cosine
          FROM cand
          JOIN cb q ON q.vec_id = cand.query_id
          JOIN cb c ON c.vec_id = cand.neighbor_id
        )
        SELECT query_id, neighbor_id, cosine, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS rn FROM scored)
        WHERE rn <= {ANN_K}
        """,
        doc="multi-table LSH top-k (OR-amplification, 4 tables): the "
        "standard recall lever the recall monitor motivates — candidates "
        "collide in ANY table, scored once",
        tags=("llm", "similarity", "lsh"),
    )
)


def _oracle_of(name: str, queries=None) -> str:
    """Oracle SQL of a registered query — defaults to THIS module's
    QUERIES; pass another module's list to reuse a cross-module oracle
    (streaming twins share their batch operator's oracle verbatim)."""
    for q in QUERIES if queries is None else queries:
        if q.name == name:
            return q.oracle
    raise KeyError(name)


# ann_recall_report's oracle composes the four ANN oracles verbatim — the
# methods' own parity rows pin each subquery; this row pins the recall
# arithmetic over them
_ANN_RECALL_ORACLE = f"""
WITH exact AS ({_oracle_of("ann_bruteforce_topk")}),
lsh AS ({_oracle_of("ann_lsh_topk")}),
lshx4 AS ({_oracle_of("ann_lsh_multitable_topk")}),
ivf AS ({_oracle_of("ann_ivf_topk")}),
quant AS ({_oracle_of("ann_quantized_topk")}),
u AS (
  SELECT 'lsh' AS method, query_id, neighbor_id FROM lsh
  UNION ALL SELECT 'lsh_x4', query_id, neighbor_id FROM lshx4
  UNION ALL SELECT 'ivf', query_id, neighbor_id FROM ivf
  UNION ALL SELECT 'quantized', query_id, neighbor_id FROM quant
),
m AS (
  SELECT method, CAST(COUNT(*) AS BIGINT) AS matched FROM u
  JOIN exact e ON e.query_id = u.query_id AND e.neighbor_id = u.neighbor_id
  GROUP BY method
),
names AS (SELECT * FROM (VALUES ('lsh'), ('lsh_x4'), ('ivf'), ('quantized')) t(method))
SELECT names.method, CAST(COALESCE(m.matched, 0) AS BIGINT) AS matched,
       CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS total,
       CAST(COALESCE(m.matched, 0) AS DOUBLE)
         / CAST(NULLIF((SELECT COUNT(*) FROM exact), 0) AS DOUBLE) AS recall
FROM names LEFT JOIN m ON m.method = names.method
"""

QUERIES.append(
    Query(
        "ann_recall_report",
        ann_recall_q,
        _ANN_RECALL_ORACLE,
        doc="recall@k of every approximate ANN method (LSH / IVF / int8) "
        "vs the exact baseline — the index-drift monitoring job; "
        "intersections are broadcast joins against the bounded exact set",
        tags=("llm", "similarity", "monitoring"),
    )
)


QUERIES.append(
    Query(
        "curation_filter_report",
        curation_filter_report_q,
        f"""
        WITH g AS (SELECT doc_id, keep AS gopher_keep FROM ({_oracle_of("curation_gopher_rules")})),
        c AS (SELECT doc_id, keep AS c4_keep FROM ({_oracle_of("curation_c4_rules")})),
        m AS (SELECT doc_id, keep AS model_keep FROM ({_oracle_of("curation_model_filter")})),
        r AS (SELECT doc_id, keep AS repetition_keep FROM ({_oracle_of("curation_repetition")}))
        SELECT g.doc_id, gopher_keep, c4_keep, model_keep, repetition_keep,
               gopher_keep AND c4_keep AND model_keep AND repetition_keep AS keep_all
        FROM g JOIN c ON c.doc_id = g.doc_id
        JOIN m ON m.doc_id = g.doc_id
        JOIN r ON r.doc_id = g.doc_id
        """,
        doc="per-doc verdict matrix across the quality-filter ensemble "
        "(gopher x C4 x model x repetition + conjunction) — the pipeline "
        "QA artifact; oracle composes the four filter oracles verbatim",
        tags=("llm", "curation", "monitoring"),
    )
)


QUERIES.append(
    Query(
        "dedup_embedding_clusters_lsh",
        dedup_embedding_clusters_lsh_q,
        f"""
        WITH RECURSIVE c AS (SELECT vec_id, {QVEC} AS qv FROM embeddings),
        cb AS (SELECT vec_id, qv, {_lsh_bucket_sql("qv")} AS bucket FROM c),
        cp AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM cb a JOIN cb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
          WHERE {COS.format(a="a.qv", b="b.qv")} >= {COSINE_THRESHOLD}
        ),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM cp
          UNION SELECT id_b, id_a FROM cp
        ),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT src AS vec_id, LEAST(src, MIN(dst)) AS cluster_id
        FROM reach GROUP BY src
        """,
        doc="sub-quadratic semantic dedup (SemDeDup shape): LSH-bucketed "
        "cosine pairs -> connected components -> cluster keep-list; the "
        "scale path of dedup_embedding_clusters",
        tags=("llm", "dedup", "embedding", "graph", "lsh"),
    )
)


QUERIES.append(
    Query(
        "dedup_minhash_recall",
        dedup_minhash_recall_q,
        f"""
        WITH exact AS (SELECT doc_id_a, doc_id_b FROM ({_oracle_of("dedup_ngram_jaccard")})),
        lsh AS (SELECT doc_id_a, doc_id_b FROM ({_oracle_of("dedup_minhash_lsh")})),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS matched
          FROM lsh JOIN exact USING (doc_id_a, doc_id_b)
        )
        SELECT matched,
               CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS total,
               CAST(matched AS DOUBLE)
                 / CAST(NULLIF((SELECT COUNT(*) FROM exact), 0) AS DOUBLE) AS recall
        FROM m
        """,
        doc="pair recall of MinHash-LSH vs exact n-gram Jaccard ground "
        "truth at the same threshold — the dedup-family drift monitor "
        "(band/row tuning vs document length distribution)",
        tags=("llm", "dedup", "monitoring"),
    )
)


QUERIES.append(
    Query(
        "curation_sample_weighted",
        curation_sample_weighted_q,
        f"""
        WITH mx AS (SELECT MAX(n_chars) AS m FROM documents)
        SELECT doc_id, lang, source, n_chars FROM documents, mx
        WHERE ({H.format(x="'w0:' || CAST(doc_id AS VARCHAR)")} % 1000000)
              < least(CAST(1000000 AS BIGINT),
                      greatest(CAST(0 AS BIGINT),
                        CAST(floor((CAST(n_chars AS DOUBLE) / CAST(m AS DOUBLE)) * 1000000) AS BIGINT)))
        """,
        doc="deterministic per-row WEIGHTED Bernoulli sample (keep prob = "
        "own quality weight; hash threshold per row) — the quality-"
        "weighted mixing step; map-only, reproducible across engines",
        tags=("llm", "curation", "sampling"),
    )
)


def ann_ivf_kmeans(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    return similarity.ivf_kmeans_topk(
        emb, _ann_queries(emb), k=ANN_K
    )


def _kmeans_assigned_cte(iters: int = 2, n_centroids: int = 16) -> str:
    """WITH-clause prefix ending in af(vec_id, qv, cluster): unrolled
    Lloyd iterations — each round an assignment CTE (argmax cosine vs the
    previous centroid set) + an element-wise truncated integer mean
    (DuckDB // and Spark div both truncate toward zero, so the centroids
    are bit-identical across engines).  Shared by ann_ivf_kmeans_topk and
    dedup_semantic."""

    def assign(cents: str, out: str) -> str:
        cos = COS.format(a="c.qv", b=f"{cents}.qvc")
        return f"""{out} AS (SELECT vec_id, qv, cid AS cluster FROM (
          SELECT c.vec_id, c.qv, {cents}.cid,
                 ROW_NUMBER() OVER (PARTITION BY c.vec_id
                      ORDER BY {cos} DESC, {cents}.cid ASC) AS rn
          FROM c CROSS JOIN {cents}) WHERE rn = 1)"""

    parts = [
        f"WITH c AS (SELECT vec_id, {QVEC} AS qv FROM embeddings)",
        f"cents0 AS (SELECT vec_id AS cid, qv AS qvc FROM c WHERE vec_id < {n_centroids})",
    ]
    cur = "cents0"
    for i in range(1, iters + 1):
        parts.append(assign(cur, f"a{i}"))
        parts.append(
            f"""m{i} AS (SELECT cluster, u.pos,
              CAST(SUM(qv[u.pos]) // COUNT(*) AS BIGINT) AS cv
              FROM a{i}, UNNEST(generate_series(1, len(qv))) AS u(pos)
              GROUP BY cluster, u.pos)"""
        )
        parts.append(
            f"cents{i} AS (SELECT cluster AS cid, list(cv ORDER BY pos) AS qvc "
            f"FROM m{i} GROUP BY cluster)"
        )
        cur = f"cents{i}"
    parts.append(assign(cur, "af"))
    return ",\n".join(parts)


def _ivf_kmeans_oracle(iters: int = 2, n_centroids: int = 16) -> str:
    return f"""
        {_kmeans_assigned_cte(iters, n_centroids)},
        q AS (SELECT vec_id AS query_id, qv AS qv_q, cluster
              FROM af WHERE vec_id < {ANN_QUERY_MAX_ID}),
        scored AS (
          SELECT q.query_id, af.vec_id AS neighbor_id,
                 {COS.format(a="q.qv_q", b="af.qv")} AS cosine
          FROM q JOIN af ON q.cluster = af.cluster AND q.query_id <> af.vec_id
        )
        SELECT query_id, neighbor_id, cosine, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS rn FROM scored)
        WHERE rn <= {ANN_K}
        """


QUERIES.append(
    Query(
        "ann_ivf_kmeans_topk",
        ann_ivf_kmeans,
        _ivf_kmeans_oracle(),
        doc="IVF with Lloyd-refined centroids (2 unrolled iterations, "
        "truncated integer means — bit-identical centroids in the "
        "oracle): the standard inverted-file build step; on the "
        "structureless synthetic corpus recall@nprobe=1 is flat vs "
        "first-N centroids (0.85 vs 0.81 at sf0.1 — noise), its value "
        "on real clustered embeddings is tighter lists at equal probe "
        "cost; here it pins the iterative-refinement shape end-to-end",
        tags=("llm", "ann", "kmeans", "iterative"),
    )
)


def dedup_semantic_q(spark: SparkSession, sf: str) -> DataFrame:
    return similarity.semantic_dedup(load(spark, sf, "embeddings"))


def embedding_prototypicality_q(spark: SparkSession, sf: str) -> DataFrame:
    return similarity.embedding_prototypicality(load(spark, sf, "embeddings"))


def semantic_dedup_diverse_q(spark: SparkSession, sf: str) -> DataFrame:
    return similarity.semantic_dedup_diverse(load(spark, sf, "embeddings"))


def ann_ivf_q8_q(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    return similarity.ivf_quantized_topk(
        emb, _ann_queries(emb), k=ANN_K
    )


QUERIES.append(
    Query(
        "ann_ivf_q8_topk",
        ann_ivf_q8_q,
        f"""
        WITH c AS (SELECT vec_id, {QVEC} AS qv FROM embeddings),
        cents AS (SELECT vec_id AS cid, qv AS qvc FROM c WHERE vec_id < 16),
        af AS (SELECT vec_id, cid AS cluster FROM (
          SELECT c.vec_id, cents.cid,
                 ROW_NUMBER() OVER (PARTITION BY c.vec_id
                      ORDER BY {COS.format(a="c.qv", b="cents.qvc")} DESC,
                               cents.cid ASC) AS rn
          FROM c CROSS JOIN cents) WHERE rn = 1),
        raw AS (SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                       list_max(list_transform(embedding,
                                x -> abs(CAST(x AS DOUBLE)))) AS scale
                FROM embeddings),
        q8 AS (SELECT vec_id,
                      list_transform(v, x -> floor((x * 127.0) / scale)) AS qv8
               FROM raw WHERE scale > 0),
        cc AS (SELECT q8.vec_id, q8.qv8, af.cluster
               FROM q8 JOIN af ON q8.vec_id = af.vec_id),
        qq AS (SELECT vec_id, qv8, cluster FROM cc
               WHERE vec_id < {ANN_QUERY_MAX_ID}),
        scored AS (
          SELECT qq.vec_id AS query_id, cc.vec_id AS neighbor_id,
                 {COS.format(a="qq.qv8", b="cc.qv8")} AS cosine_q8
          FROM qq JOIN cc
            ON qq.cluster = cc.cluster AND qq.vec_id <> cc.vec_id
        )
        SELECT query_id, neighbor_id, cosine_q8, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine_q8 DESC, neighbor_id ASC) AS rn
              FROM scored)
        WHERE rn <= {ANN_K}
        """,
        doc="IVF-pruned int8 ANN — the production combination: inverted "
        "file bounds WHICH vectors are scored (corpus/n_centroids per "
        "probe), int8 scalar quantization bounds the BYTES each costs "
        "(4x vs float32); one Arrow map stage computes both "
        "representations, broadcast cluster join scores only probed "
        "lists",
        tags=("llm", "ann", "similarity"),
    )
)


QUERIES.append(
    Query(
        "dedup_semantic_diverse",
        semantic_dedup_diverse_q,
        f"""
        {_kmeans_assigned_cte()},
        pr AS (SELECT af.vec_id, af.cluster, af.qv,
                      {COS.format(a="af.qv", b="c.qvc")} AS proto
               FROM af JOIN cents2 c ON af.cluster = c.cid),
        p AS (SELECT DISTINCT b.vec_id AS vid
              FROM pr a JOIN pr b
                ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
              WHERE {COS.format(a="a.qv", b="b.qv")} >= {COSINE_THRESHOLD}
                AND (a.proto < b.proto
                     OR (a.proto = b.proto AND a.vec_id < b.vec_id)))
        SELECT pr.vec_id AS vec_id, pr.cluster AS cluster, pr.proto AS proto,
               (p.vid IS NULL) AS is_kept
        FROM pr LEFT JOIN p ON pr.vec_id = p.vid
        """,
        doc="SemDeDup with the PAPER's keep rule (Abbas et al. 2023): "
        "within each near-dup neighborhood keep the LOWEST-centroid-"
        "cosine (most atypical) member — the diversity-maximizing "
        "variant of dedup_semantic; same grouped-matmul plan with the "
        "centroid cosine computed in-kernel, centroids unrolled "
        "bit-exactly in the oracle",
        tags=("llm", "dedup", "embedding", "kmeans"),
    )
)


QUERIES.append(
    Query(
        "embedding_prototypicality",
        embedding_prototypicality_q,
        f"""
        {_kmeans_assigned_cte()}
        SELECT af.vec_id AS vec_id, af.cluster AS cluster,
               {COS.format(a="af.qv", b="c.qvc")} AS proto,
               ({COS.format(a="af.qv", b="c.qvc")} < 0.2) AS is_outlier
        FROM af JOIN cents2 c ON af.cluster = c.cid
        """,
        doc="D4-style prototypicality (Tirumala et al. 2023): cosine of "
        "each vector to its own Lloyd-refined cluster centroid — low "
        "scores flag embedding-space outliers (OCR junk, encoder "
        "failures); map-only after assignment + one n_centroids-row "
        "broadcast, the cheap filter run BEFORE the quadratic "
        "semantic_dedup pass; centroids unrolled bit-exactly in the "
        "oracle",
        tags=("llm", "embedding", "kmeans", "curation"),
    )
)


QUERIES.append(
    Query(
        "dedup_semantic",
        dedup_semantic_q,
        f"""
        {_kmeans_assigned_cte()},
        p AS (SELECT DISTINCT b.vec_id AS vid
              FROM af a JOIN af b
                ON a.cluster = b.cluster AND a.vec_id < b.vec_id
              WHERE {COS.format(a="a.qv", b="b.qv")} >= {COSINE_THRESHOLD})
        SELECT af.vec_id AS vec_id, af.cluster AS cluster,
               (p.vid IS NULL) AS is_kept
        FROM af LEFT JOIN p ON af.vec_id = p.vid
        """,
        doc="SemDeDup-style semantic dedup (Abbas et al. 2023): k-means "
        "cluster (Lloyd-refined, unrolled in the oracle), then drop any "
        "vector with a smaller-id in-cluster neighbor at cosine >= 0.4 — "
        "quadratic work bounded per CLUSTER (n_centroids is the knob), "
        "never per corpus; full annotated output (vec_id, cluster, "
        "is_kept)",
        tags=("llm", "dedup", "embedding", "kmeans"),
    )
)


def curation_epoch_shuffle_q(spark: SparkSession, sf: str) -> DataFrame:
    return curation.epoch_shuffle(load(spark, sf, "documents"))


def curation_length_trim_q(spark: SparkSession, sf: str) -> DataFrame:
    return curation.length_trim(load(spark, sf, "documents"))


QUERIES.append(
    Query(
        "curation_length_trim",
        curation_length_trim_q,
        """
        WITH r AS (
          SELECT source, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY n_chars ASC, doc_id ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY source) AS n
          FROM documents),
        t AS (SELECT source, n_chars AS p99_chars FROM r
              WHERE rn = CAST(CEIL(CAST(n AS DOUBLE) * 0.99) AS BIGINT))
        SELECT d.doc_id, d.source, d.n_chars, t.p99_chars,
               (d.n_chars <= t.p99_chars) AS keep
        FROM documents d JOIN t ON d.source = t.source
        """,
        doc="per-source exact p99 length trim: flag docs longer than their "
        "own source's 99th-percentile length (exact order statistic, "
        "q53's engine-deterministic rule; per-source keeps the ranking "
        "window partitioned) — the tail-trim pass before tokenization",
        tags=("llm", "curation", "orderstat"),
    )
)


QUERIES.append(
    Query(
        "curation_epoch_shuffle",
        curation_epoch_shuffle_q,
        f"""
        WITH s AS (
          SELECT doc_id,
                 {H.format(x="'epoch0:' || CAST(doc_id AS VARCHAR)")} AS shuffle_key
          FROM documents)
        SELECT doc_id,
               CAST(shuffle_key % 8 AS INTEGER) AS shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY shuffle_key % 8
                    ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos,
               shuffle_key
        FROM s
        """,
        doc="deterministic epoch shuffle: keyed 60-bit hash -> shard + "
        "within-shard rank = a reproducible random training order, "
        "sharded by construction (no global sort barrier; n_shards "
        "bounds per-task sort size) — the corpus-to-training-reader "
        "handoff step",
        tags=("llm", "curation", "shuffle"),
    )
)


def dedup_winnow_pairs_q(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.winnow_overlap_pairs(load(spark, sf, "documents"))


QUERIES.append(
    Query(
        "dedup_winnow_pairs",
        dedup_winnow_pairs_q,
        f"""
        WITH grams AS (
          SELECT doc_id, CAST(pos AS INTEGER) AS pos,
                 {H.format(x="substr(lower(text), pos, 8)")} AS h
          FROM documents, unnest(range(1, length(lower(text)) - 6)) AS t(pos)
          WHERE length(text) >= 8
        ),
        winnowed AS (
          SELECT doc_id,
                 MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
          FROM grams
        ),
        fp AS (SELECT DISTINCT doc_id, fp FROM winnowed),
        rare AS (
          SELECT fp FROM (SELECT fp, COUNT(*) AS df FROM fp GROUP BY fp)
          WHERE df <= {dedup.MAX_WINNOW_FP_DF}
        ),
        fpr AS (SELECT f.doc_id, f.fp FROM fp f JOIN rare USING (fp)),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM fpr GROUP BY doc_id),
        shared AS (
          SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                 CAST(COUNT(*) AS BIGINT) AS shared
          FROM fpr a JOIN fpr b ON a.fp = b.fp AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_id_a, doc_id_b, shared,
               CAST(shared AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE) AS overlap
        FROM shared
        JOIN sizes sa ON sa.doc_id = doc_id_a
        JOIN sizes sb ON sb.doc_id = doc_id_b
        WHERE CAST(shared AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE)
              >= {dedup.WINNOW_OVERLAP_THRESHOLD}
        """,
        doc="partial-overlap pairs via the winnowing fingerprint index "
        "(shared-substring >= k+w-1 guarantee): catches quote chains and "
        "partial copies whole-doc Jaccard misses, with an index w-fold "
        "smaller than the full shingle inverted index; df-capped "
        "equi-join, containment-style overlap ratio",
        tags=("llm", "dedup", "winnow"),
    )
)


def corpus_dedup_report_q(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.corpus_dedup_report(
        load(spark, sf, "documents"), jaccard_threshold=JACCARD_THRESHOLD
    )


# like filter_report and ann_recall_report, the oracle COMPOSES the three
# method oracles verbatim — each method's own parity row pins its
# subquery; this row pins the per-doc flag/disagreement arithmetic
QUERIES.append(
    Query(
        "corpus_dedup_report",
        corpus_dedup_report_q,
        f"""
        WITH ex AS ({{ex}}),
        hashed AS (SELECT doc_id, {H.format(x="text")} AS text_hash FROM documents),
        exf AS (SELECT h.doc_id,
                       (ex.n_copies > 1 AND h.doc_id != ex.keep_doc_id) AS exact_dup
                FROM hashed h JOIN ex ON h.text_hash = ex.text_hash),
        jd AS (SELECT DISTINCT doc_id_b AS doc_id FROM ({{jp}})),
        wd AS (SELECT DISTINCT doc_id_b AS doc_id FROM ({{wp}}))
        SELECT e.doc_id, e.exact_dup,
               (jd.doc_id IS NOT NULL) AS jaccard_dup,
               (wd.doc_id IS NOT NULL) AS winnow_dup,
               CAST((CASE WHEN e.exact_dup THEN 1 ELSE 0 END)
                  + (CASE WHEN jd.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  + (CASE WHEN wd.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS INTEGER)
                 AS n_methods
        FROM exf e
        LEFT JOIN jd ON e.doc_id = jd.doc_id
        LEFT JOIN wd ON e.doc_id = wd.doc_id
        """.format(
            ex=_oracle_of("dedup_exact"),
            jp=_oracle_of("dedup_ngram_jaccard"),
            wp=_oracle_of("dedup_winnow_pairs"),
        ),
        doc="per-doc verdict matrix across the dedup family (exact x "
        "Jaccard x winnow would-remove flags + method count) — the "
        "duplication QA artifact a pipeline run publishes; detector "
        "DISAGREEMENT is the threshold-tuning signal; oracle composed "
        "from the three method oracles",
        tags=("llm", "dedup", "monitoring"),
    )
)


QUERIES.append(
    Query(
        "corpus_vocab_stats",
        corpus_vocab_stats_q,
        """
        WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS word
                   FROM documents),
        wf AS (SELECT source, word, COUNT(*) AS f FROM t GROUP BY source, word)
        SELECT source,
               CAST(SUM(f) AS BIGINT) AS n_tokens,
               COUNT(*) AS n_word_types,
               CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
               CAST(COUNT(*) AS DOUBLE) / CAST(SUM(f) AS DOUBLE)
                 AS type_token_ratio,
               CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS hapax_share
        FROM wf GROUP BY source
        """,
        doc="per-source vocabulary panel (tokens, word types, hapax count, "
        "type-token ratio, hapax share) — the Heaps'-law sanity stats a "
        "corpus build publishes: collapsed TTR flags boilerplate-heavy "
        "slices, inflated hapax share flags OCR noise; two "
        "partial-agg'd shuffles, exact integers + single divisions",
        tags=("llm", "text", "monitoring"),
    )
)


def dedup_prefix_q(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.prefix_dedup(load(spark, sf, "documents"))


QUERIES.append(
    Query(
        "dedup_prefix",
        dedup_prefix_q,
        f"""
        WITH e AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len
                   FROM documents WHERE length(text) >= {dedup.PREFIX_DEDUP_CHARS}),
        h AS (SELECT {H.format(x=f"substr(text, 1, {dedup.PREFIX_DEDUP_CHARS})")} AS prefix_hash,
                     doc_id, len
              FROM e),
        g AS (SELECT prefix_hash, COUNT(*) AS n_copies,
                     CAST(MAX(len) AS BIGINT) AS max_len,
                     COUNT(DISTINCT len) AS n_lengths
              FROM h GROUP BY prefix_hash HAVING COUNT(*) >= 2),
        k AS (SELECT prefix_hash, doc_id AS keep_doc_id FROM (
                SELECT prefix_hash, doc_id,
                       ROW_NUMBER() OVER (PARTITION BY prefix_hash
                                          ORDER BY len DESC, doc_id ASC) AS rn
                FROM h) WHERE rn = 1)
        SELECT g.prefix_hash, g.n_copies, k.keep_doc_id, g.max_len, g.n_lengths
        FROM g JOIN k USING (prefix_hash)
        """,
        doc="prefix-duplicate groups (identical first-64-chars hash) — the "
        "truncation-artifact detector whole-doc exact dedup misses "
        "(same page cut at different lengths); keep = longest member; "
        "n_lengths > 1 marks a truncation chain vs a plain copy pile; "
        "exact_dedup's one-shuffle shape on an 8-byte prefix hash",
        tags=("llm", "dedup"),
    )
)


def text_source_divergence_q(spark: SparkSession, sf: str) -> DataFrame:
    return text_analysis.source_divergence(load(spark, sf, "documents"))


QUERIES.append(
    Query(
        "text_source_divergence",
        text_source_divergence_q,
        """
        WITH terms AS (SELECT source, unnest(string_split(text, ' ')) AS word
                       FROM documents),
        sw AS (SELECT source, word, COUNT(*) AS f_sw FROM terms GROUP BY 1, 2),
        cw AS (SELECT word, CAST(SUM(f_sw) AS BIGINT) AS f_w FROM sw GROUP BY 1),
        tot AS (SELECT source, CAST(SUM(f_sw) AS BIGINT) AS n_tokens
                FROM sw GROUP BY 1),
        n AS (SELECT CAST(SUM(f_w) AS BIGINT) AS nc FROM cw),
        j AS (SELECT sw.source, sw.f_sw, cw.f_w, tot.n_tokens, n.nc
              FROM sw JOIN cw USING (word) JOIN tot USING (source), n),
        p AS (SELECT source,
                     MAX(n_tokens) AS n_tokens,
                     MAX(nc) AS nc,
                     CAST(SUM(ABS(f_sw * nc - f_w * n_tokens)) AS BIGINT)
                       AS present_term,
                     CAST(SUM(f_w) AS BIGINT) AS present_corpus_mass
              FROM j GROUP BY source)
        SELECT source,
               n_tokens,
               CAST(present_term + n_tokens * (nc - present_corpus_mass)
                    AS DOUBLE)
                 / (2.0 * CAST(n_tokens AS DOUBLE) * CAST(nc AS DOUBLE))
                 AS tv_distance
        FROM p
        """,
        doc="per-source unigram total-variation distance from the pooled "
        "corpus — the mixture-health monitor next to corpus_vocab_stats "
        "(far = different register or contamination, near-zero = "
        "redundant slice); exact-integer cross-multiplied terms, "
        "absent-word mass folded in closed form so the vocabulary never "
        "cross-joins the source list, one IEEE division per source",
        tags=("llm", "text", "monitoring"),
    )
)


def curation_quality_deciles_q(spark: SparkSession, sf: str) -> DataFrame:
    return curation.quality_deciles(load(spark, sf, "documents"))


QUERIES.append(
    Query(
        "curation_quality_deciles",
        curation_quality_deciles_q,
        """
        WITH h AS (SELECT n_chars AS s, COUNT(*) AS c FROM documents GROUP BY 1),
        t AS (SELECT s, SUM(c) OVER (ORDER BY s ASC) AS cum FROM h),
        n AS (SELECT COUNT(*) AS total FROM documents),
        b AS (SELECT k.g AS k, MIN(t.s) AS b
              FROM t, n, UNNEST(generate_series(1, 9)) AS k(g)
              WHERE t.cum >= (k.g * n.total + 9) // 10
              GROUP BY k.g)
        SELECT d.doc_id, d.n_chars,
               CAST(1 + (SELECT COUNT(*) FROM b WHERE d.n_chars > b.b) AS INTEGER)
                 AS decile
        FROM documents d
        """,
        doc="exact global decile tag per document with NO global sort: the "
        "integer score's histogram is bounded by the VALUE DOMAIN (not "
        "the corpus), so one map-side-combined shuffle + a bounded "
        "histogram collect yields exact boundary order statistics and a "
        "map-only assignment — the curriculum/stratification pass "
        "(percentile_approx is inexact, a global ranking window is the "
        "banned single-partition sort)",
        tags=("llm", "curation"),
    )
)


def curation_cluster_balance_q(spark: SparkSession, sf: str) -> DataFrame:
    return similarity.cluster_balanced_sample(load(spark, sf, "embeddings"))


QUERIES.append(
    Query(
        "curation_cluster_balance",
        curation_cluster_balance_q,
        f"""
        {_kmeans_assigned_cte()},
        r AS (SELECT vec_id, cluster,
                ROW_NUMBER() OVER (PARTITION BY cluster
                  ORDER BY {H.format(x="'cb0:' || CAST(vec_id AS VARCHAR)")} ASC,
                           vec_id ASC) AS pick_rank
              FROM af)
        SELECT vec_id, cluster, CAST(pick_rank AS INTEGER) AS pick_rank,
               pick_rank <= 20 AS is_sampled
        FROM r
        """,
        doc="topic-balanced subsample: exactly min(20, |cluster|) vectors "
        "per Lloyd-refined k-means cluster by salted-hash order — "
        "diversity-preserving downsampling over LEARNED strata (uniform "
        "sampling keeps mode imbalance; per-cluster quotas flatten it); "
        "map-only assignment + one cluster-partitioned ranking window, "
        "centroids unrolled bit-exactly in the oracle",
        tags=("llm", "curation", "embedding", "kmeans"),
    )
)


def text_ngram_novelty_q(spark: SparkSession, sf: str) -> DataFrame:
    return text_analysis.ngram_novelty(load(spark, sf, "documents"))


QUERIES.append(
    Query(
        "text_ngram_novelty",
        text_ngram_novelty_q,
        f"""
        WITH {WS_SH_CTE},
        d AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1),
        p AS (SELECT doc_id, COUNT(*) AS n_grams,
                     CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS novel_grams
              FROM sh JOIN d USING (shingle) GROUP BY doc_id)
        SELECT doc_id, n_grams, novel_grams,
               CAST(novel_grams AS DOUBLE) / CAST(n_grams AS DOUBLE) AS novelty
        FROM p
        """,
        doc="per-doc n-gram novelty: fraction of a doc's distinct 3-grams "
        "occurring in NO other document — the inverse-boilerplate signal "
        "(near-zero = assembled from text that exists elsewhere); one df "
        "aggregate + join-back reusing its partitioning, no pair join",
        tags=("llm", "text", "dedup"),
    )
)


def multimodal_phash_clusters_q(spark: SparkSession, sf: str) -> DataFrame:
    # registry variant: CC over the top-20 CLOSEST candidate pairs (the
    # triage clusters a reviewer tunes thresholds from) — the thresholded
    # production keep-list is multimodal.phash_clusters, which correctly
    # returns EMPTY on this corpus (min candidate Hamming is ~15 at the
    # test SFs, above the 12-bit dup threshold; unit-tested separately)
    media = multimodal.media_table(load(spark, sf, "documents"))
    pairs = multimodal.phash_closest_pairs(media, k=20).select("doc_id_a", "doc_id_b")
    return dedup.dedup_clusters(pairs)


QUERIES.append(
    Query(
        "multimodal_phash_clusters",
        multimodal_phash_clusters_q,
        """
        WITH RECURSIVE
        m AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
                     octet_length(encode(text)) AS L FROM documents),
        nib AS (SELECT doc_id,
                CAST((('0x' || substr(md5('ph:' ||
                    substr(hx, 2 * ((i.g * L) // 15) + 1,
                           2 * (((i.g + 1) * L) // 15) - 2 * ((i.g * L) // 15))),
                  1, 15))::BIGINT % 16) AS BIGINT) << (4 * i.g) AS nibshift
              FROM m, UNNEST(generate_series(0, 14)) AS i(g)),
        p AS (SELECT doc_id, CAST(SUM(nibshift) AS BIGINT) AS phash
              FROM nib GROUP BY doc_id),
        b AS (SELECT doc_id, phash, t.g AS band_idx,
                     (phash >> (12 * t.g)) & 4095 AS band_val
              FROM p, UNNEST(generate_series(0, 4)) AS t(g)),
        b2 AS (SELECT doc_id, phash, band_idx, band_val,
                      COUNT(*) OVER (PARTITION BY band_idx, band_val) AS bpop
               FROM b),
        c AS (SELECT DISTINCT a.doc_id AS doc_id_a, bb.doc_id AS doc_id_b,
                     a.phash AS pa, bb.phash AS pb
              FROM b2 a JOIN b2 bb
                ON a.band_idx = bb.band_idx AND a.band_val = bb.band_val
               AND a.doc_id < bb.doc_id
              WHERE a.bpop <= 1024),
        pairs AS (SELECT doc_id_a, doc_id_b
                  FROM (SELECT doc_id_a, doc_id_b,
                               ROW_NUMBER() OVER (ORDER BY
                                   bit_count(xor(pa, pb)) ASC,
                                   doc_id_a ASC, doc_id_b ASC) AS rn
                        FROM c)
                  WHERE rn <= 20),
        edges AS (
          SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
          UNION SELECT doc_id_b, doc_id_a FROM pairs
        ),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
        FROM reach GROUP BY src
        """,
        doc="connected components over the top-20 closest perceptual-hash "
        "pairs (capped banded candidates -> Hamming rank -> min-label CC) "
        "— the triage clusters a multimodal dedup reviewer tunes "
        "thresholds from; the thresholded production keep-list is "
        "multimodal.phash_clusters (unit-tested; correctly empty on this "
        "corpus, min candidate Hamming ~15); oracle closes the same graph "
        "with a recursive CTE",
        tags=("llm", "multimodal", "dedup"),
    )
)


def text_langid_confusion_q(spark: SparkSession, sf: str) -> DataFrame:
    return text_analysis.langid_confusion(load(spark, sf, "documents"))


QUERIES.append(
    Query(
        "text_langid_confusion",
        text_langid_confusion_q,
        f"""
        WITH cell AS (
          SELECT d.lang, p.pred_lang, COUNT(*) AS n_docs
          FROM documents d JOIN ({_lang_oracle()}) p ON d.doc_id = p.doc_id
          GROUP BY 1, 2)
        SELECT lang, pred_lang, n_docs,
               CAST(n_docs AS DOUBLE)
                 / CAST(SUM(n_docs) OVER (PARTITION BY lang) AS DOUBLE) AS share
        FROM cell
        """,
        doc="confusion matrix of the marker-word language heuristic vs the "
        "corpus' own lang labels — the classifier-drift QA panel before "
        "trusting language-based filtering; map-only scoring + one "
        "(lang, pred_lang) aggregate, share window on the |langs|² table",
        tags=("llm", "text", "monitoring"),
    )
)


def curation_contamination_report_q(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    train = docs.where(F.col("doc_id") % curation.EVAL_MODULUS != 0)
    return curation.contamination_report(train, _eval_split(docs))


QUERIES.append(
    Query(
        "curation_contamination_report",
        curation_contamination_report_q,
        f"""
        WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        g AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(range(1, len(w) - 1),
                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS gram
          FROM ws WHERE len(w) >= 3
        ),
        tr AS (SELECT doc_id, gram FROM g WHERE doc_id % {curation.EVAL_MODULUS} <> 0),
        evdocs AS (SELECT doc_id FROM documents
                   WHERE doc_id % {curation.EVAL_MODULUS} = 0
                   ORDER BY doc_id LIMIT {curation.EVAL_MAX_DOCS}),
        ev AS (SELECT g.doc_id AS eval_doc_id, gram FROM g
               JOIN evdocs ON g.doc_id = evdocs.doc_id),
        sizes AS (SELECT doc_id, COUNT(*) AS train_ngrams FROM tr GROUP BY doc_id),
        ov AS (
          SELECT tr.doc_id, ev.eval_doc_id, COUNT(*) AS overlap
          FROM tr JOIN ev USING (gram) GROUP BY tr.doc_id, ev.eval_doc_id
        ),
        hits AS (
          SELECT ov.eval_doc_id, ov.overlap,
                 CAST(ov.overlap AS DOUBLE) / CAST(s.train_ngrams AS DOUBLE)
                   AS contamination
          FROM ov JOIN sizes s ON s.doc_id = ov.doc_id
          WHERE CAST(ov.overlap AS DOUBLE) / CAST(s.train_ngrams AS DOUBLE)
                >= {curation.CONTAMINATION_THRESHOLD}
        )
        SELECT eval_doc_id, COUNT(*) AS n_contaminated_docs,
               MAX(contamination) AS max_contamination,
               CAST(SUM(overlap) AS BIGINT) AS total_overlap_ngrams
        FROM hits GROUP BY eval_doc_id
        """,
        doc="per-eval-doc contamination summary (the transpose of "
        "curation_contamination): which benchmark items leak, into how "
        "many training docs, and how badly — output bounded by the "
        "fixed-size benchmark, never the corpus",
        tags=("llm", "curation", "monitoring"),
    )
)


def embedding_norm_stats_q(spark: SparkSession, sf: str) -> DataFrame:
    return similarity.embedding_norm_stats(load(spark, sf, "embeddings"))


QUERIES.append(
    Query(
        "embedding_norm_stats",
        embedding_norm_stats_q,
        f"""
        WITH q AS (SELECT label, {QVEC} AS qv FROM embeddings),
        n AS (SELECT label,
                     CAST(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS BIGINT)
                       AS nsq
              FROM q)
        SELECT label, COUNT(*) AS n_vectors,
               CAST(SUM(CASE WHEN nsq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
               CAST(MIN(nsq) AS BIGINT) AS min_nsq,
               CAST(MAX(nsq) AS BIGINT) AS max_nsq,
               CAST(SUM(nsq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_nsq
        FROM n GROUP BY label
        """,
        doc="per-label embedding health panel (counts, zero-norm count, "
        "exact quantized-norm² min/max/mean) — the encoder-monitoring "
        "pass on every embedding refresh; map-only quantize+dot, one "
        "partial-agg'd shuffle on the bounded label column",
        tags=("llm", "embedding", "monitoring"),
    )
)


def corpus_bpe_pair_counts_q(spark: SparkSession, sf: str) -> DataFrame:
    return curation.bpe_pair_counts(load(spark, sf, "documents"))


QUERIES.append(
    Query(
        "corpus_bpe_pair_counts",
        corpus_bpe_pair_counts_q,
        """
        WITH t AS (SELECT regexp_extract_all(text,
                     ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+') AS tk
                   FROM documents),
        p AS (SELECT tk[i.g] AS l, tk[i.g + 1] AS r
              FROM t, UNNEST(generate_series(1, len(tk) - 1)) AS i(g)
              WHERE len(tk) >= 2),
        c AS (SELECT l, r, COUNT(*) AS n_pairs FROM p GROUP BY 1, 2)
        SELECT l AS "left", r AS "right", n_pairs, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY n_pairs DESC,
                                           l ASC, r ASC) AS rn FROM c)
        WHERE rn <= 20
        """,
        doc="top-20 adjacent-pretoken pairs — the distributed inner "
        "statistic of BPE tokenizer training (each merge round promotes "
        "the most frequent pair); GPT-2-style pre-tokenizer, one "
        "partial-agg'd pair shuffle, lazy global top-k (billions of "
        "distinct pairs at 100 TB — never a single-partition sort)",
        tags=("llm", "curation", "tokenizer"),
    )
)


def curation_sample_exact_n_q(spark: SparkSession, sf: str) -> DataFrame:
    return curation.sample_exact_n(load(spark, sf, "documents"), 100)


QUERIES.append(
    Query(
        "curation_sample_exact_n",
        curation_sample_exact_n_q,
        f"""
        SELECT doc_id, text, lang, source, n_chars,
               CAST(rn AS INTEGER) AS sample_rank
        FROM (SELECT *, ROW_NUMBER() OVER (
                ORDER BY {H.format(x="'sn0:' || CAST(doc_id AS VARCHAR)")} ASC,
                         doc_id ASC) AS rn
              FROM documents)
        WHERE rn <= 100
        """,
        doc="exactly-n deterministic global sample: the n smallest salted "
        "id hashes (fixed row budget — Bernoulli only hits a fraction in "
        "expectation); one TakeOrderedAndProject, no RNG state, stable "
        "across engines/runs/re-sharding",
        tags=("llm", "curation"),
    )
)


def text_ngram_lm_q(spark: SparkSession, sf: str) -> DataFrame:
    return text_analysis.ngram_lm_score(load(spark, sf, "documents"))


QUERIES.append(
    Query(
        "text_ngram_lm_score",
        text_ngram_lm_q,
        """
        WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        bi AS (SELECT doc_id,
                      unnest(list_transform(range(1, len(w)),
                             i -> w[i] || ' ' || w[i+1])) AS bigram
               FROM ws WHERE len(w) >= 2),
        uni AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        c2 AS (SELECT bigram, COUNT(*) AS c2 FROM bi GROUP BY bigram),
        c1 AS (SELECT word, COUNT(*) AS c1 FROM uni GROUP BY word),
        v AS (SELECT COUNT(DISTINCT word) AS v FROM uni),
        sc AS (SELECT b.doc_id,
                      CAST(FLOOR(CAST((c2.c2 + 1) * 1000000000 AS DOUBLE)
                                 / CAST(c1.c1 + v.v AS DOUBLE)) AS BIGINT) AS p_e9
               FROM bi b
               JOIN c2 ON b.bigram = c2.bigram
               JOIN c1 ON string_split(b.bigram, ' ')[1] = c1.word
               CROSS JOIN v)
        SELECT doc_id, COUNT(*) AS n_bigrams,
               CAST(SUM(p_e9) AS BIGINT) AS sum_p_e9,
               CAST(SUM(p_e9) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_p_e9
        FROM sc GROUP BY doc_id
        """,
        doc="corpus-trained bigram-LM fluency score per document "
        "(add-one smoothing, log-free rational form, e9 fixed-point "
        "partials) — the perplexity-filter stage of CCNet-style "
        "pipelines; count tables shuffle-joined (never broadcast), "
        "1-row vocab broadcast only",
        tags=("llm", "text", "curation"),
    )
)


def graph_pagerank_q(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.graph import pagerank

    edges = similarity.knn_graph_bucketed(load(spark, sf, "embeddings"), k=KNN_K)
    return pagerank(edges)


def _pagerank_sql() -> str:
    from ..operators.graph import PAGERANK_DAMPING_E2, PAGERANK_ITERS

    d = PAGERANK_DAMPING_E2
    ctes = [
        f"e AS (SELECT src_id AS src, dst_id AS dst FROM ({_oracle_of('embedding_knn_graph_lsh')}))",
        "od AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "n AS (SELECT COUNT(*) AS n_nodes FROM nodes)",
        "nb AS (SELECT node, 1000000000 // n_nodes AS p0_e9,"
        " 150000000 // n_nodes AS base_e9 FROM nodes, n)",
        "p0 AS (SELECT node, p0_e9 AS pr_e9 FROM nb)",
    ]
    for t in range(PAGERANK_ITERS):
        ctes.append(
            f"c{t + 1} AS (SELECT e.dst AS node,"
            f" CAST(SUM(p.pr_e9 // o.outdeg) AS BIGINT) AS s"
            f" FROM e JOIN p{t} p ON e.src = p.node"
            f" JOIN od o ON e.src = o.src GROUP BY e.dst)"
        )
        ctes.append(
            f"p{t + 1} AS (SELECT nb.node,"
            f" CAST(nb.base_e9 + (({d} * COALESCE(c.s, 0)) // 100) AS BIGINT) AS pr_e9"
            f" FROM nb LEFT JOIN c{t + 1} c ON nb.node = c.node)"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT node, pr_e9 FROM p{PAGERANK_ITERS}"
    )


QUERIES.append(
    Query(
        "graph_pagerank",
        graph_pagerank_q,
        _pagerank_sql(),
        doc="fixed-3-iteration PageRank over the LSH kNN graph, e9 "
        "integer fixed-point (floor divisions only — bit-exact, no "
        "float drift): neighborhood centrality as a prototypicality / "
        "coreset-selection signal; per-iteration work is O(|E|) "
        "shuffle-join + dst-keyed partial agg, rank table never "
        "broadcast, iterations unrolled into one AQE-optimized DAG",
        tags=("llm", "graph", "embedding"),
    )
)


def embedding_covariance_q(spark: SparkSession, sf: str) -> DataFrame:
    return similarity.embedding_covariance(load(spark, sf, "embeddings"))


QUERIES.append(
    Query(
        "embedding_covariance",
        embedding_covariance_q,
        f"""
        WITH q AS (SELECT vec_id, {QVEC} AS qv FROM embeddings),
        x AS (SELECT vec_id, u.i AS i, u.v AS v FROM
              (SELECT vec_id,
                      unnest(list_transform(range(1, len(qv) + 1),
                             i -> {{'i': i, 'v': qv[i]}})) AS u
               FROM q)),
        g AS (SELECT a.i AS i, b.i AS j, CAST(SUM(a.v * b.v) AS BIGINT) AS s_ij
              FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
              GROUP BY a.i, b.i),
        s AS (SELECT i, CAST(SUM(v) AS BIGINT) AS s_i FROM x GROUP BY i),
        n AS (SELECT COUNT(*) AS n FROM q)
        SELECT g.i, g.j, g.s_ij,
               CAST(n.n * g.s_ij - sa.s_i * sb.s_i AS DOUBLE)
                 / CAST(n.n * n.n AS DOUBLE) AS cov
        FROM g JOIN s sa ON g.i = sa.i JOIN s sb ON g.j = sb.i CROSS JOIN n
        """,
        doc="exact upper-triangular covariance of the embedding space "
        "(quantized-integer Gram + per-dim sums, one IEEE division per "
        "cell) — the PCA/whitening/anisotropy statistic; per-batch "
        "numpy Q^T Q partials emit d(d+1)/2 rows per task, so the "
        "exchange is KB-sized at any corpus size",
        tags=("llm", "embedding", "monitoring"),
    )
)


def dedup_source_matrix_q(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.source_dup_matrix(load(spark, sf, "documents"))


QUERIES.append(
    Query(
        "dedup_source_matrix",
        dedup_source_matrix_q,
        f"""
        WITH per AS (
          SELECT {H.format(x=f"substr(text, 1, {dedup.PREFIX_DEDUP_CHARS})")} AS th,
                 source, COUNT(*) AS cnt
          FROM documents WHERE length(text) >= {dedup.PREFIX_DEDUP_CHARS}
          GROUP BY 1, 2),
        pairs AS (
          SELECT a.source AS source_a, b.source AS source_b,
                 CASE WHEN a.source = b.source
                      THEN (a.cnt * (a.cnt - 1)) // 2
                      ELSE a.cnt * b.cnt END AS dp
          FROM per a JOIN per b ON a.th = b.th AND a.source <= b.source)
        SELECT source_a, source_b,
               CAST(SUM(CASE WHEN dp > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_groups,
               CAST(SUM(dp) AS BIGINT) AS n_doc_pairs
        FROM pairs GROUP BY 1, 2 HAVING SUM(dp) > 0
        """,
        doc="cross-source duplicate-leakage matrix over prefix-dup families "
        "(spanning-family count + exact duplicate-pair count per "
        "unordered source pair) — the provenance view mixture decisions "
        "read; within-hash self-join over per-source AGGREGATED rows, "
        "fanout bounded by |sources|^2 per hash",
        tags=("llm", "dedup", "monitoring"),
    )
)


def dedup_minhash_histogram_q(spark: SparkSession, sf: str) -> DataFrame:
    """Candidate-pair Jaccard distribution at threshold 0 — every
    LSH-surfaced candidate with its EXACT verified similarity, bucketed
    into width-0.1 bins.  This is the artifact that TUNES the dedup
    threshold: a bimodal histogram (noise hump near 0, dup hump near 1)
    says where to cut; mass piling against the current threshold says
    the S-curve is mis-sized.  Same capped-bucket candidate plan as
    dedup_minhash_lsh; the histogram itself is one 10-key aggregate."""
    pairs = dedup.minhash_lsh_pairs(load(spark, sf, "documents"), threshold=0.0)
    bin_col = F.least(F.floor(F.col("jaccard") * 10), F.lit(9)).cast("int")
    return pairs.groupBy(bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("jaccard").alias("min_jaccard"),
        F.max("jaccard").alias("max_jaccard"),
    )


QUERIES.append(
    Query(
        "dedup_minhash_histogram",
        dedup_minhash_histogram_q,
        f"""
        WITH p AS ({_minhash_oracle(dedup.MINHASH_K, dedup.MINHASH_BANDS, 0.0)})
        SELECT CAST(LEAST(FLOOR(jaccard * 10), 9) AS INTEGER) AS bin,
               COUNT(*) AS n_pairs,
               MIN(jaccard) AS min_jaccard,
               MAX(jaccard) AS max_jaccard
        FROM p GROUP BY 1
        """,
        doc="threshold-tuning histogram: exact Jaccard of EVERY LSH "
        "candidate pair (threshold 0) in width-0.1 bins with per-bin "
        "min/max — bimodality locates the cut, mass at the threshold "
        "flags a mis-sized S-curve; bounded 10-key aggregate over the "
        "capped candidate plan",
        tags=("llm", "dedup", "monitoring"),
    )
)


# --- Product-quantization ANN, two-stage rerank, power iteration (round 8) ----


def ann_pq_q(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    return similarity.pq_topk(emb, _ann_queries(emb), k=ANN_K)


def _pq_oracle() -> str:
    m, sd, codes = similarity.PQ_M, similarity.PQ_SUBDIM, similarity.PQ_CODES
    return f"""
    WITH c AS (SELECT vec_id, {QVEC} AS qv FROM embeddings),
    ss AS (SELECT unnest(range({m})) AS s),
    sub AS (SELECT c.vec_id, ss.s, c.qv[ss.s*{sd}+1 : (ss.s+1)*{sd}] AS sv FROM c, ss),
    cb AS (SELECT s, vec_id AS code, sv AS cv,
                  list_dot_product(sv::DOUBLE[], sv::DOUBLE[]) AS cvn
           FROM sub WHERE vec_id < {codes}),
    enc AS (
      SELECT vec_id, s, cv, cvn FROM (
        SELECT sub.vec_id, sub.s, cb.cv, cb.cvn,
               ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s ORDER BY
                 list_dot_product(sub.sv::DOUBLE[], sub.sv::DOUBLE[])
                 - 2 * list_dot_product(sub.sv::DOUBLE[], cb.cv::DOUBLE[])
                 + cb.cvn ASC, cb.code ASC) AS rn
        FROM sub JOIN cb ON sub.s = cb.s
      ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, qv,
                 list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS qn
          FROM c WHERE vec_id < {ANN_QUERY_MAX_ID}
            AND list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) > 0),
    qsub AS (SELECT q.query_id, ss.s,
                    q.qv[ss.s*{sd}+1 : (ss.s+1)*{sd}] AS qsv, q.qn
             FROM q, ss),
    scored AS (
      SELECT qs.query_id, e.vec_id AS neighbor_id,
             SUM(list_dot_product(qs.qsv::DOUBLE[], e.cv::DOUBLE[])) AS num,
             SUM(e.cvn) AS rec_nsq, qs.qn AS qn
      FROM qsub qs JOIN enc e ON qs.s = e.s AND qs.query_id <> e.vec_id
      GROUP BY qs.query_id, e.vec_id, qs.qn
    ),
    fin AS (SELECT query_id, neighbor_id, num / sqrt(qn * rec_nsq) AS cosine_pq
            FROM scored WHERE rec_nsq > 0)
    SELECT query_id, neighbor_id, cosine_pq, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cosine_pq DESC, neighbor_id ASC) AS rn FROM fin)
    WHERE rn <= {ANN_K}
    """


QUERIES.append(
    Query(
        "ann_pq_topk",
        ann_pq_q,
        _pq_oracle(),
        doc="product-quantization ANN top-k (8 subspaces x 16 codes, "
        "4 bytes/vector vs 256 — the 64x compression axis next to int8): "
        "codebooks bounded-collected, corpus encoded in one map stage, "
        "ADC scoring reads ONLY the codes table (per-query lookup "
        "tables, FAISS IVFPQ's scoring kernel) with local top-k before "
        "the one bounded exchange; exact-integer LUTs, one sqrt + one "
        "division — bit-identical to the oracle",
        tags=("llm", "ann", "similarity"),
    )
)


def ann_rerank_q(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    return similarity.rerank_topk(emb, _ann_queries(emb), k=ANN_K, n_candidates=25)


QUERIES.append(
    Query(
        "ann_rerank_topk",
        ann_rerank_q,
        f"""
        WITH raw AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                 list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale
          FROM embeddings
        ),
        c8 AS (
          SELECT vec_id,
                 list_transform(v, x -> floor((x * 127.0) / scale)) AS qv
          FROM raw WHERE scale > 0
        ),
        q8 AS (SELECT vec_id, qv FROM c8 WHERE vec_id < {ANN_QUERY_MAX_ID}),
        s1 AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 {COS.format(a="q.qv", b="c.qv")} AS cq8
          FROM q8 q CROSS JOIN c8 c WHERE q.vec_id <> c.vec_id
        ),
        cand AS (
          SELECT query_id, neighbor_id FROM
            (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cq8 DESC, neighbor_id ASC) AS rn FROM s1)
          WHERE rn <= 25
        ),
        ex AS (SELECT vec_id, {QVEC} AS qv FROM embeddings),
        scored AS (
          SELECT cand.query_id, cand.neighbor_id,
                 {COS.format(a="qq.qv", b="cc.qv")} AS cosine
          FROM cand JOIN ex cc ON cand.neighbor_id = cc.vec_id
                    JOIN ex qq ON cand.query_id = qq.vec_id
        )
        SELECT query_id, neighbor_id, cosine, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS rn FROM scored)
        WHERE rn <= {ANN_K}
        """,
        doc="two-stage retrieval (the production serving topology): int8 "
        "coarse scan nominates 25 candidates/query, full-precision exact "
        "cosine reranks ONLY those — the rerank join touches a "
        "candidate-sized corpus slice, never a scan; candidate side "
        "un-hinted (AQE runtime-broadcasts)",
        tags=("llm", "ann", "similarity"),
    )
)


def embedding_top_direction_q(spark: SparkSession, sf: str) -> DataFrame:
    return similarity.embedding_top_direction(load(spark, sf, "embeddings"))


def _power_iter_oracle(iters: int = 3) -> str:
    dim = similarity.DIM
    ctes = [f"c AS (SELECT vec_id, {QVEC} AS qv FROM embeddings)"]
    ctes.append(f"p AS (SELECT unnest(range({dim})) AS pos)")
    ctes.append("v0 AS (SELECT pos, 1 AS component FROM p)")
    for t in range(1, iters + 1):
        ctes.append(
            f"r{t} AS (SELECT c.vec_id, CAST(SUM(c.qv[v.pos+1] * v.component) AS BIGINT) AS s"
            f" FROM c CROSS JOIN v{t-1} v GROUP BY c.vec_id)"
        )
        ctes.append(
            f"y{t} AS (SELECT p.pos, CAST(SUM(c.qv[p.pos+1] * r.s) AS BIGINT) AS y"
            f" FROM c JOIN r{t} r USING (vec_id) CROSS JOIN p GROUP BY p.pos)"
        )
        ctes.append(f"m{t} AS (SELECT MAX(ABS(y)) AS m FROM y{t})")
        ctes.append(
            f"v{t} AS (SELECT pos, CASE WHEN y >= 0 THEN (y*1000)//m"
            f" ELSE -((-y*1000)//m) END AS component FROM y{t}, m{t})"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    sgn AS (SELECT CASE WHEN (SELECT component FROM v{iters} WHERE pos = 0) < 0
                        THEN -1 ELSE 1 END AS s)
    SELECT CAST(v.pos AS INTEGER) AS pos,
           CAST(v.component * sgn.s AS BIGINT) AS component
    FROM v{iters} v, sgn
    """
    )


QUERIES.append(
    Query(
        "embedding_top_direction",
        embedding_top_direction_q,
        _power_iter_oracle(),
        doc="dominant corpus direction by distributed power iteration "
        "(3 iterations, e9-free integer renormalization — trunc toward "
        "zero on both engines): y = Q'(Qv) without forming Q'Q, one "
        "bounded d-row exchange + collect per iteration (the broadcast-"
        "variable pattern); the anisotropy axis all-but-the-top "
        "post-processing removes",
        tags=("llm", "embedding", "similarity"),
    )
)


def text_pmi_q(spark: SparkSession, sf: str) -> DataFrame:
    return text_analysis.pmi_collocations(load(spark, sf, "documents"))


QUERIES.append(
    Query(
        "text_pmi_collocations",
        text_pmi_q,
        f"""
        WITH ws AS (SELECT string_split(text, ' ') AS w FROM documents
                    WHERE len(string_split(text, ' ')) >= 2),
        bg AS (SELECT w[i] AS x, w[i+1] AS y
               FROM ws, unnest(range(1, len(w))) AS t(i)),
        pc AS (SELECT x, y, COUNT(*) AS n_xy FROM bg GROUP BY 1, 2
               HAVING COUNT(*) >= 5),
        uni AS (SELECT t, COUNT(*) AS n_t FROM
                  (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
                GROUP BY 1),
        np AS (SELECT COUNT(*) AS n_pairs FROM bg)
        SELECT pc.x, pc.y, pc.n_xy,
               ux.n_t AS n_x, uy.n_t AS n_y, np.n_pairs,
               CAST(np.n_pairs * pc.n_xy AS DOUBLE)
                 / CAST(ux.n_t * uy.n_t AS DOUBLE) AS pmi_ratio
        FROM pc JOIN uni ux ON pc.x = ux.t
                JOIN uni uy ON pc.y = uy.t, np
        ORDER BY pmi_ratio DESC, pc.x ASC, pc.y ASC LIMIT 20
        """,
        doc="top-20 adjacent-word collocations by PMI in the log-free "
        "rational form (N*c(xy)/(c(x)*c(y)) ranks identically to PMI — "
        "exact BIGINT products, ONE division): two partial-agg'd count "
        "shuffles, vocab-sized unigram joins stay shuffle joins (never "
        "broadcast), lazy orderBy+limit top-k",
        tags=("llm", "text"),
    )
)




def ann_ivfpq_q(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    return similarity.ivfpq_topk(emb, _ann_queries(emb), k=ANN_K)


def _ivfpq_oracle() -> str:
    m, sd, codes = similarity.PQ_M, similarity.PQ_SUBDIM, similarity.PQ_CODES
    return f"""
    WITH c AS (SELECT vec_id, {QVEC} AS qv FROM embeddings),
    cents AS (SELECT vec_id AS cid, qv AS qvc FROM c WHERE vec_id < 16),
    af AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT c.vec_id, cents.cid,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id
                    ORDER BY {COS.format(a="c.qv", b="cents.qvc")} DESC, cents.cid ASC) AS rn
        FROM c CROSS JOIN cents
      ) WHERE rn = 1
    ),
    ss AS (SELECT unnest(range({m})) AS s),
    sub AS (SELECT c.vec_id, ss.s, c.qv[ss.s*{sd}+1 : (ss.s+1)*{sd}] AS sv FROM c, ss),
    cb AS (SELECT s, vec_id AS code, sv AS cv,
                  list_dot_product(sv::DOUBLE[], sv::DOUBLE[]) AS cvn
           FROM sub WHERE vec_id < {codes}),
    enc AS (
      SELECT vec_id, s, cv, cvn FROM (
        SELECT sub.vec_id, sub.s, cb.cv, cb.cvn,
               ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s ORDER BY
                 list_dot_product(sub.sv::DOUBLE[], sub.sv::DOUBLE[])
                 - 2 * list_dot_product(sub.sv::DOUBLE[], cb.cv::DOUBLE[])
                 + cb.cvn ASC, cb.code ASC) AS rn
        FROM sub JOIN cb ON sub.s = cb.s
      ) WHERE rn = 1
    ),
    q AS (SELECT c.vec_id AS query_id, c.qv,
                 list_dot_product(c.qv::DOUBLE[], c.qv::DOUBLE[]) AS qn,
                 af.cluster
          FROM c JOIN af ON af.vec_id = c.vec_id
          WHERE c.vec_id < {ANN_QUERY_MAX_ID}
            AND list_dot_product(c.qv::DOUBLE[], c.qv::DOUBLE[]) > 0),
    qsub AS (SELECT q.query_id, ss.s,
                    q.qv[ss.s*{sd}+1 : (ss.s+1)*{sd}] AS qsv, q.qn, q.cluster
             FROM q, ss),
    scored AS (
      SELECT qs.query_id, e.vec_id AS neighbor_id,
             SUM(list_dot_product(qs.qsv::DOUBLE[], e.cv::DOUBLE[])) AS num,
             SUM(e.cvn) AS rec_nsq, qs.qn AS qn
      FROM qsub qs
      JOIN enc e ON qs.s = e.s AND qs.query_id <> e.vec_id
      JOIN af a ON a.vec_id = e.vec_id AND a.cluster = qs.cluster
      GROUP BY qs.query_id, e.vec_id, qs.qn
    ),
    fin AS (SELECT query_id, neighbor_id, num / sqrt(qn * rec_nsq) AS cosine_pq
            FROM scored WHERE rec_nsq > 0)
    SELECT query_id, neighbor_id, cosine_pq, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cosine_pq DESC, neighbor_id ASC) AS rn FROM fin)
    WHERE rn <= {ANN_K}
    """


QUERIES.append(
    Query(
        "ann_ivfpq_topk",
        ann_ivfpq_q,
        _ivfpq_oracle(),
        doc="IVF x PQ — the full FAISS-IVFPQ topology: inverted file "
        "bounds WHICH vectors are scored (nprobe=1), PQ codes bound the "
        "BYTES each costs (ADC lookup tables); one Arrow map stage "
        "computes assignment + codes + probed-cluster scores, no corpus "
        "shuffle, bounded local-top-k exchange",
        tags=("llm", "ann", "similarity"),
    )
)


# The PQ and rerank paths are approximate too — fold them into the recall
# monitor (every approximate path reports next to the exact baseline).
# Rebuilt HERE because their component oracles are defined above, after the
# original monitor entry.
_ANN_RECALL_ORACLE_V2 = f"""
WITH exact AS ({_oracle_of("ann_bruteforce_topk")}),
lsh AS ({_oracle_of("ann_lsh_topk")}),
lshx4 AS ({_oracle_of("ann_lsh_multitable_topk")}),
ivf AS ({_oracle_of("ann_ivf_topk")}),
quant AS ({_oracle_of("ann_quantized_topk")}),
pq AS ({_oracle_of("ann_pq_topk")}),
ivfpq AS ({_oracle_of("ann_ivfpq_topk")}),
rr AS ({_oracle_of("ann_rerank_topk")}),
u AS (
  SELECT 'lsh' AS method, query_id, neighbor_id FROM lsh
  UNION ALL SELECT 'lsh_x4', query_id, neighbor_id FROM lshx4
  UNION ALL SELECT 'ivf', query_id, neighbor_id FROM ivf
  UNION ALL SELECT 'quantized', query_id, neighbor_id FROM quant
  UNION ALL SELECT 'pq', query_id, neighbor_id FROM pq
  UNION ALL SELECT 'ivfpq', query_id, neighbor_id FROM ivfpq
  UNION ALL SELECT 'rerank', query_id, neighbor_id FROM rr
),
m AS (
  SELECT method, CAST(COUNT(*) AS BIGINT) AS matched FROM u
  JOIN exact e ON e.query_id = u.query_id AND e.neighbor_id = u.neighbor_id
  GROUP BY method
),
names AS (SELECT * FROM (VALUES ('lsh'), ('lsh_x4'), ('ivf'), ('quantized'),
                                ('pq'), ('ivfpq'), ('rerank')) t(method))
SELECT names.method, CAST(COALESCE(m.matched, 0) AS BIGINT) AS matched,
       CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS total,
       CAST(COALESCE(m.matched, 0) AS DOUBLE)
         / CAST(NULLIF((SELECT COUNT(*) FROM exact), 0) AS DOUBLE) AS recall
FROM names LEFT JOIN m ON m.method = names.method
"""

for _i, _q in enumerate(QUERIES):
    if _q.name == "ann_recall_report":
        QUERIES[_i] = Query(
            _q.name,
            _q.fn,
            _ANN_RECALL_ORACLE_V2,
            doc="recall@k of every approximate ANN method (LSH / IVF / "
            "int8 / PQ / IVFPQ / two-stage rerank) vs the exact baseline — the "
            "index-drift monitoring job; intersections are broadcast "
            "joins against the bounded exact set",
            tags=_q.tags,
        )
        break


def graph_triangles_q(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.graph import triangle_stats

    edges = similarity.knn_graph_bucketed(load(spark, sf, "embeddings"), k=KNN_K)
    return triangle_stats(edges)


QUERIES.append(
    Query(
        "graph_triangles",
        graph_triangles_q,
        f"""
        WITH e0 AS (SELECT src_id AS s, dst_id AS d
                    FROM ({_oracle_of('embedding_knn_graph_lsh')})),
        und AS (SELECT DISTINCT LEAST(s, d) AS a, GREATEST(s, d) AS b
                FROM e0 WHERE s <> d),
        deg AS (SELECT node, COUNT(*) AS degree FROM
                  (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
                GROUP BY node),
        w AS (SELECT e1.a AS ctr, e1.b AS x, e2.b AS y
              FROM und e1 JOIN und e2 ON e1.a = e2.a AND e1.b < e2.b),
        t AS (SELECT ctr, x, y FROM w JOIN und u ON w.x = u.a AND w.y = u.b),
        pn AS (SELECT node, COUNT(*) AS n_triangles FROM
                 (SELECT ctr AS node FROM t UNION ALL SELECT x FROM t
                  UNION ALL SELECT y FROM t)
               GROUP BY node)
        SELECT deg.node, deg.degree,
               COALESCE(pn.n_triangles, 0) AS n_triangles,
               CASE WHEN deg.degree >= 2
                    THEN CAST(2 * COALESCE(pn.n_triangles, 0) AS DOUBLE)
                         / CAST(deg.degree * (deg.degree - 1) AS DOUBLE)
                    ELSE 0.0 END AS clustering
        FROM deg LEFT JOIN pn ON deg.node = pn.node
        """,
        doc="per-node triangle count + local clustering coefficient over "
        "the LSH kNN graph (canonical a<b<c orientation, exact integers, "
        "one division): dense-clump vs hubness-artifact diagnostic; "
        "wedge fanout bounded by the k-bounded degree, all joins keyed "
        "on node ids, nothing broadcast",
        tags=("llm", "graph", "embedding", "monitoring"),
    )
)


def ann_pq_index_q(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    emb = load(spark, sf, "embeddings")
    path = tempfile.mkdtemp(prefix="pq_index_")
    similarity.build_pq_index(emb, path)
    return similarity.pq_index_topk(spark, path, _ann_queries(emb), k=ANN_K)


QUERIES.append(
    Query(
        "ann_pq_index_topk",
        ann_pq_index_q,
        _pq_oracle(),
        doc="persisted PQ index: build once (codebooks + codes-only "
        "parquet, ~4 B payload/vector), serve many — every query's scan "
        "cost is the 64x-smaller codes table, the embeddings are never "
        "reread; identical results to the inline ann_pq_topk (shared "
        "ADC scorer, same oracle)",
        tags=("llm", "ann", "similarity"),
    )
)


def mm_audio_fp_q(spark: SparkSession, sf: str) -> DataFrame:
    media = multimodal.media_table(load(spark, sf, "documents"))
    return multimodal.audio_fingerprint_pairs(media)


QUERIES.append(
    Query(
        "multimodal_audio_pairs",
        mm_audio_fp_q,
        f"""
        WITH m AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
                          octet_length(encode(text)) AS L FROM documents),
        fr AS (SELECT doc_id,
                      ('0x' || substr(md5('af:' ||
                          substr(hx, 2 * j.g * {multimodal.AUDIO_FRAME_STRIDE} + 1,
                                 2 * {multimodal.AUDIO_FRAME_BYTES})),
                        1, 15))::BIGINT % {1 << multimodal.AUDIO_FP_BITS} AS fh
               FROM m, UNNEST(generate_series(0,
                      (L - {multimodal.AUDIO_FRAME_BYTES}) // {multimodal.AUDIO_FRAME_STRIDE})) AS j(g)
               WHERE L >= {multimodal.AUDIO_FRAME_BYTES}),
        fp AS (SELECT DISTINCT doc_id, fh FROM fr),
        capped AS (SELECT doc_id, fh FROM fp
                   WHERE fh IN (SELECT fh FROM fp GROUP BY fh
                                HAVING COUNT(*) <= {multimodal.AUDIO_MAX_FRAME_DF}))
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               COUNT(*) AS n_shared
        FROM capped a JOIN capped b ON a.fh = b.fh AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING COUNT(*) >= {multimodal.AUDIO_MIN_SHARED}
        """,
        doc="audio near-dup pairs from a Shazam-style frame-fingerprint "
        "inverted index (64-byte windows, stride 32, 20-bit frame "
        "hashes; codec stubbed deterministically — a real spectral "
        "fingerprint swaps in per-frame): df-capped index join + ONE "
        "pair-keyed aggregate, the winnow scale discipline on the "
        "audio modality",
        tags=("llm", "multimodal", "dedup"),
    )
)


def curation_ccnet_q(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.curation import ccnet_buckets

    return ccnet_buckets(load(spark, sf, "documents"))


QUERIES.append(
    Query(
        "curation_ccnet_buckets",
        curation_ccnet_q,
        f"""
        WITH lm AS ({_oracle_of("text_ngram_lm_score")}),
        r AS (
          SELECT lm.doc_id, d.lang, lm.mean_p_e9,
                 ROW_NUMBER() OVER (PARTITION BY d.lang
                      ORDER BY lm.mean_p_e9 DESC, lm.doc_id ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY d.lang) AS n
          FROM lm JOIN documents d ON lm.doc_id = d.doc_id
        )
        SELECT doc_id, lang, mean_p_e9,
               CASE WHEN 3 * rn <= n THEN 'head'
                    WHEN 3 * rn <= 2 * n THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM r
        """,
        doc="CCNet head/middle/tail bucketing (Wenzek et al. 2020): per-"
        "language exact terciles of the log-free bigram-LM fluency score "
        "(3*rn <= n integer splits, doc_id tie-break) — the quality-"
        "stratified mixture stage; one lang-partitioned ranking window "
        "over the LM score's linear shuffles",
        tags=("llm", "curation", "text"),
    )
)


def centroid_confusion_q(spark: SparkSession, sf: str) -> DataFrame:
    return similarity.centroid_classifier_confusion(load(spark, sf, "embeddings"))


QUERIES.append(
    Query(
        "embedding_centroid_confusion",
        centroid_confusion_q,
        f"""
        WITH q AS (SELECT vec_id, CAST(label AS INTEGER) AS label,
                          {QVEC} AS qv FROM embeddings),
        x AS (SELECT label, u.i AS dim, u.v AS comp FROM
              (SELECT label,
                      unnest(list_transform(range(1, len(qv) + 1),
                             i -> {{'i': i, 'v': qv[i]}})) AS u
               FROM q)),
        cent AS (SELECT label, dim, SUM(comp) // COUNT(*) AS cv
                 FROM x GROUP BY label, dim),
        cl AS (SELECT label AS clab,
                      list(cv ORDER BY dim ASC) AS cvec
               FROM cent GROUP BY label),
        scored AS (
          SELECT q.vec_id, q.label, cl.clab,
                 list_dot_product(q.qv::DOUBLE[], cl.cvec::DOUBLE[])
                   / sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])
                          * list_dot_product(cl.cvec::DOUBLE[], cl.cvec::DOUBLE[]))
                   AS cos
          FROM q CROSS JOIN cl
        ),
        pred AS (
          SELECT vec_id, label, clab AS predicted FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                      ORDER BY cos DESC, clab ASC) AS rn FROM scored
          ) WHERE rn = 1
        )
        SELECT label, CAST(predicted AS BIGINT) AS predicted,
               COUNT(*) AS n_vecs
        FROM pred GROUP BY 1, 2
        """,
        doc="nearest-label-centroid classifier probe + confusion matrix "
        "(the cheapest label/encoder-quality eval): truncated-integer "
        "label centroids (grouped-map Arrow sums, bounded collect), "
        "map-only argmax prediction, |labels|^2-bounded matrix aggregate",
        tags=("llm", "embedding", "monitoring"),
    )
)


def dedup_fuzzy_edit_q(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.fuzzy_edit_pairs(load(spark, sf, "documents"))


QUERIES.append(
    Query(
        "dedup_fuzzy_edit",
        dedup_fuzzy_edit_q,
        """
        WITH p AS (
          SELECT doc_id,
                 substr(regexp_replace(trim(regexp_replace(lower(text),
                          '[^a-z0-9 ]', ' ', 'g')), ' +', ' ', 'g'),
                        1, 36) AS pfx
          FROM documents),
        q AS (SELECT * FROM p WHERE length(pfx) >= 36),
        b AS (SELECT doc_id, pfx, t.i AS band_idx,
                     substr(pfx, t.i * 12 + 1, 12) AS band_val
              FROM q, generate_series(0, 2) t(i)),
        g AS (SELECT band_idx, band_val FROM b
              GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND 1024),
        c AS (SELECT DISTINCT a.doc_id AS doc_id_a, b2.doc_id AS doc_id_b,
                     a.pfx AS pa, b2.pfx AS pb
              FROM b a
              JOIN b b2 USING (band_idx, band_val)
              JOIN g USING (band_idx, band_val)
              WHERE a.doc_id < b2.doc_id)
        SELECT doc_id_a, doc_id_b,
               CAST(levenshtein(pa, pb) AS INTEGER) AS edit_distance
        FROM c WHERE levenshtein(pa, pb) <= 4
        """,
        doc="entity-resolution fuzzy join: doc pairs within Levenshtein 4 "
        "over normalized 36-char prefixes — banded positional blocking "
        "(3 x 12-char segments; substitution-only edits <=2 guaranteed "
        "by pigeonhole, indel shift documented as the fixed-grid "
        "limitation) + exact JVM-side levenshtein verify on candidates; "
        "one (band_idx, band_val) shuffle with the minhash/phash "
        "mega-bucket cap, in-bucket expansion on post-agg rows only",
        tags=("llm", "dedup", "similarity"),
    )
)


def dedup_fuzzy_recall_q(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.fuzzy_recall_report(load(spark, sf, "documents"))


QUERIES.append(
    Query(
        "dedup_fuzzy_recall",
        dedup_fuzzy_recall_q,
        """
        WITH p AS (
          SELECT doc_id,
                 substr(regexp_replace(trim(regexp_replace(lower(text),
                          '[^a-z0-9 ]', ' ', 'g')), ' +', ' ', 'g'),
                        1, 36) AS pfx
          FROM documents),
        q AS (SELECT * FROM p WHERE length(pfx) >= 36),
        s AS (SELECT * FROM q ORDER BY doc_id LIMIT 1024),
        exact AS (SELECT a.doc_id AS da, b.doc_id AS db
                  FROM s a JOIN s b ON a.doc_id < b.doc_id
                  WHERE levenshtein(a.pfx, b.pfx) <= 4),
        bnd AS (SELECT doc_id, pfx, t.i AS band_idx,
                       substr(pfx, t.i * 12 + 1, 12) AS band_val
                FROM s, generate_series(0, 2) t(i)),
        g AS (SELECT band_idx, band_val FROM bnd
              GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND 1024),
        c AS (SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db,
                     a.pfx AS pa, b2.pfx AS pb
              FROM bnd a
              JOIN bnd b2 USING (band_idx, band_val)
              JOIN g USING (band_idx, band_val)
              WHERE a.doc_id < b2.doc_id),
        banded AS (SELECT da, db FROM c WHERE levenshtein(pa, pb) <= 4),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS matched
              FROM banded JOIN exact USING (da, db))
        SELECT matched,
               CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS total,
               CAST(matched AS DOUBLE)
                 / CAST(NULLIF((SELECT COUNT(*) FROM exact), 0) AS DOUBLE)
                 AS recall
        FROM m
        """,
        doc="pair recall of the banded fuzzy edit-distance join vs exact "
        "all-pairs levenshtein ground truth on a bounded orderBy+limit "
        "sample (1024 docs — all-pairs truth is quadratic by definition, "
        "so it runs ONLY on a by-construction-bounded slice) — the "
        "honest-recall policy every approximate candidate path in this "
        "repo follows (minhash_recall_report, ann_recall_report); "
        "isolates the blocking losses the fuzzy join documents (indel "
        "alignment shift, capped mega-buckets)",
        tags=("llm", "dedup", "monitoring"),
    )
)
