"""Training-data pipeline queries — dedup, similarity search, text
analysis, multimodal (SURVEY.md §7 M5; BASELINE.json north-star
extras). Oracle-backed where ANSI-SQL-expressible; MinHash/SimHash/
LSH/multimodal are rows-only (hash seeds and Arrow UDFs aren't
portable SQL) and are instead verified by unit tests against exact
formulations.

Float determinism: cosine math uses double-cast arrays with
sequential folds — bit-identical between Spark's ``aggregate`` and
DuckDB's ``list_inner_product`` (verified), so raw doubles compare
exactly with no rounding. Ratios (ttr, jaccard) are single IEEE
divisions of exact integers — also bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pg2kafka_spark.catalog import load_table
from pg2kafka_spark.operators import dedup as D
from pg2kafka_spark.operators import multimodal as M
from pg2kafka_spark.operators import similarity as S
from pg2kafka_spark.operators import text as X
from pg2kafka_spark.qreg import query


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "exact_dedup_documents",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: normalized-text md5 → one representative per
    group. Single uniform-key shuffle with map-side partial agg —
    the 100 TB-safe formulation (no skew: md5 keys)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.groupBy(X.fingerprint(F.col("text")).alias("fp")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@query(
    "bow_dedup_documents",
    oracle="""
    SELECT md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS bow_fp,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_docs
    FROM documents
    GROUP BY 1
    HAVING count(*) > 1
    """,
)
def bow_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words dedup: md5 of the sorted token list — catches
    pure reorderings that exact dedup misses. Groups with >1 member
    are the near-dup clusters."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.groupBy(X.bag_of_words_fingerprint(F.col("text")).alias("bow_fp"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


@query(
    "shingle_jaccard_pairs",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, length(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
      FROM t
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, common, sa.n AS na, sb.n AS nb,
           common * 1.0 / (sa.n + sb.n - common) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.1
    """,
)
def shingle_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-3-gram Jaccard near-dup pairs (threshold 0.1).
    This is the *verification* formulation; at 100 TB the candidate
    set comes from MinHash LSH (``minhash_lsh_pairs``) and only
    candidates pay the quadratic step."""
    docs = load_table(spark, "documents", sf_dir)
    return D.jaccard_pairs(docs, threshold=0.1)


@query("minhash_lsh_pairs")  # rows-only: hash-seed math is not portable SQL
def minhash_lsh_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH(16 bands × 4 rows) candidate pairs with
    signature-estimated Jaccard — the linear-cost discovery path for
    near-dup at scale. Verified against exact shingle Jaccard in
    tests/test_pipeline_ops.py."""
    docs = load_table(spark, "documents", sf_dir)
    return D.minhash_lsh_pairs(docs)


@query("simhash_near_pairs")  # rows-only: hash math not portable SQL
def simhash_near_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs at hamming ≤ 3 with 16-bit prefix
    blocking — constant-size sketch per document, cheapest near-dup
    signal at scale."""
    docs = load_table(spark, "documents", sf_dir)
    return D.simhash_near_pairs(docs)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "doc_token_stats",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           sum(length(string_split(text, ' '))) AS total_tokens,
           avg(length(string_split(text, ' '))) AS avg_tokens,
           sum(n_chars) AS total_chars
    FROM documents
    GROUP BY lang
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting rolled up by language (whitespace tokenizer —
    the BPE-ish regex variant is ``doc_quality``'s mean_token_len)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(X.token_count(F.col("text"))).alias("total_tokens"),
        F.avg(X.token_count(F.col("text"))).alias("avg_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


@query(
    "doc_quality",
    oracle="""
    SELECT doc_id,
           length(string_split(text, ' ')) AS n_tokens,
           length(list_distinct(string_split(text, ' '))) AS n_uniq_tokens,
           length(list_distinct(string_split(text, ' '))) * 1.0
             / length(string_split(text, ' ')) AS ttr,
           (length(string_split(text, ' ')) >= 30
            AND length(list_distinct(string_split(text, ' '))) * 1.0
                / length(string_split(text, ' ')) >= 0.3) AS high_quality
    FROM documents
    """,
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring: token count, vocabulary size,
    type-token ratio, and a boolean gate — the standard cheap filters
    before expensive pipeline stages. Map-only."""
    docs = load_table(spark, "documents", sf_dir)
    t = F.col("text")
    n_tok = X.token_count(t)
    n_uniq = X.unique_token_count(t)
    ttr = n_uniq * 1.0 / n_tok
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_uniq_tokens"),
        ttr.alias("ttr"),
        ((n_tok >= 30) & (ttr >= 0.3)).alias("high_quality"),
    )


@query(
    "lang_id_heuristic",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
        length(list_filter(string_split(text,' '),
               x -> list_contains(['the','a','and','scan','table'], x))) AS hits_en,
        length(list_filter(string_split(text,' '),
               x -> list_contains(['data','row','query','filter'], x))) AS hits_es,
        length(list_filter(string_split(text,' '),
               x -> list_contains(['join','merge','stream','window'], x))) AS hits_de
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN hits_en >= hits_es AND hits_en >= hits_de AND hits_en > 0 THEN 'en'
                WHEN hits_es >= hits_de AND hits_es > 0 THEN 'es'
                WHEN hits_de > 0 THEN 'de'
                ELSE 'und' END AS pred_lang
    FROM scored
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic (argmax of per-language hit
    counts, fixed tie order). The heuristic *shape* — n-gram/stopword
    profiles → scores → argmax — is the real pipeline's; profiles
    here are tiny fixed lists (X.LANG_MARKERS)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id", "lang", X.predict_language(F.col("text")).alias("pred_lang")
    )


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS bow_fp
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both fingerprint families per document (order-sensitive md5 of
    normalized text + order-insensitive bag-of-words md5)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        X.fingerprint(F.col("text")).alias("fp"),
        X.bag_of_words_fingerprint(F.col("text")).alias("bow_fp"),
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_COSINE_ORACLE = """
    WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
"""


@query(
    "embedding_topk",
    oracle=_COSINE_ORACLE
    + """
    , scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             list_inner_product(q.e, c.e)
               / sqrt(list_inner_product(q.e, q.e) * list_inner_product(c.e, c.e))
               AS cos_sim
      FROM d q JOIN d c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
    )
    SELECT query_id, vec_id, cos_sim, rank FROM (
      SELECT query_id, vec_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-3 for query vectors (vec_id < 5) — the
    exactness baseline for ANN. Queries broadcast; corpus streams
    map-only; bounded-heap top-k per query."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.brute_force_topk(emb, queries, k=3).select(
        "query_id", "vec_id", "cos_sim", "rank"
    )


@query(
    "embedding_near_dup_pairs",
    oracle=_COSINE_ORACLE
    + """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_inner_product(a.e, b.e)
             / sqrt(list_inner_product(a.e, a.e) * list_inner_product(b.e, b.e))
             AS cos_sim
    FROM d a JOIN d b ON a.vec_id < b.vec_id
    WHERE list_inner_product(a.e, b.e)
            / sqrt(list_inner_product(a.e, a.e) * list_inner_product(b.e, b.e)) >= 0.4
    """,
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: all pairs ≥ 0.4 (exact half-matrix;
    the LSH-bucketed scale path is ``embedding_ann_lsh``)."""
    emb = load_table(spark, "embeddings", sf_dir)
    return S.embedding_near_dup_pairs(emb, threshold=0.4)


@query("embedding_ann_lsh")  # rows-only: hyperplane seeds not portable SQL
def embedding_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 via 8-bit random-hyperplane LSH with 1-bit
    multiprobe — the corpus-bucketing scale path (equality join on
    bucket, never a cross join). Recall vs brute force asserted in
    tests/test_pipeline_ops.py."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.lsh_bucket_topk(emb, queries, k=3).select(
        "query_id", "vec_id", "cos_sim", "rank"
    )


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------


@query("multimodal_features")  # rows-only: mapInPandas stage, no SQL analog
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns → Arrow-batched decode/feature-extract
    (deterministic stub) → typed-metadata rollup by media type. The
    Spark plumbing (schema, partition-preserving mapInPandas, pruned
    metadata consumers) is the real 100 TB path; only the codec call
    is faked."""
    docs = load_table(spark, "documents", sf_dir)
    media = M.synth_media(docs)
    features = M.decode_media(media, mode="fake")
    return M.media_stats(features).orderBy("media_type")
