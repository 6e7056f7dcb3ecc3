"""Similarity search over embedding columns (``array<float>``):
brute-force cosine top-k as the exactness baseline, random-hyperplane
LSH bucketing as the scale path. (SURVEY.md §7 M5 extras.)

All distance math runs JVM-side through higher-order functions on
double-cast arrays — sequential fold, bit-identical to DuckDB's
``list_inner_product`` on double lists (verified empirically), which is
what makes the oracle comparison exact with no rounding.

Scale notes:
* brute force is O(Q×N) — correct tool when Q (queries) is small and
  broadcastable; the big side streams map-only, top-k via bounded-heap
  window per query.
* LSH buckets on an m-bit hyperplane signature: one uniform-key
  shuffle; multi-probe (1-bit flips) trades b× candidate growth for
  recall without re-shuffling the corpus.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product over double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def as_double(a: Column) -> Column:
    """Cast array<float> → array<double> once, up front: float32
    accumulation is neither associative-stable nor engine-portable."""
    return a.cast("array<double>")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    ``queries`` (small) broadcasts; the corpus streams through map-side
    cosine + per-query bounded top-k (window row_number → Spark's
    WindowGroupLimit keeps k rows per partition before the sort).
    Self-matches (same id) are excluded.
    """
    q = queries.select(
        F.col(query_id_col), as_double(F.col(vec_col)).alias("__qv")
    )
    c = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            cosine(F.col("__qv"), F.col("__cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(num_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]


def hyperplane_signature(
    vec: Column, num_planes: int, dim: int, seed: int = 42
) -> Column:
    """m-bit random-hyperplane signature as a BIGINT bucket id: bit j
    set iff dot(vec, plane_j) ≥ 0. Cosine-similar vectors collide with
    probability 1 − θ/π per bit."""
    planes = _hyperplanes(num_planes, dim, seed)
    v = as_double(vec)
    bucket = F.lit(0).cast("bigint")
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(dot(v, p) >= 0, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return bucket


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    multiprobe: bool = True,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: exact cosine, but only among corpus vectors
    whose hyperplane bucket matches the query's (or differs in one bit
    with ``multiprobe``) — the candidate set is ~N/2^m (+ m probes).

    The corpus is bucketed once (reusable across query batches); the
    join is an equality join on the bucket id, so at 100 TB the plan is
    one uniform shuffle of the small signature projection, never a
    cross join.
    """
    c = corpus.select(
        F.col(id_col),
        as_double(F.col(vec_col)).alias("__cv"),
        hyperplane_signature(F.col(vec_col), num_planes, dim, seed).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col),
        as_double(F.col(vec_col)).alias("__qv"),
        hyperplane_signature(F.col(vec_col), num_planes, dim, seed).alias("qbucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("qbucket"), *[
                F.col("qbucket").bitwiseXOR(F.lit(1 << j).cast("bigint"))
                for j in range(num_planes)
            ]
        )
        q = q.select(query_id_col, "__qv", F.explode(probes).alias("qbucket"))
    cand = (
        c.join(F.broadcast(q), c.bucket == q.qbucket)
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            cosine(F.col("__qv"), F.col("__cv")).alias("cos_sim"),
        )
        .groupBy(query_id_col, id_col)
        .agg(F.first("cos_sim").alias("cos_sim"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (brute-force half-matrix).
    The 100 TB path replaces the cross join with ``lsh_bucket_topk``
    bucketing; this exact form is the oracle/verification surface."""
    a = df.select(F.col(id_col).alias("id_a"), as_double(F.col(vec_col)).alias("__a"))
    b = df.select(F.col(id_col).alias("id_b"), as_double(F.col(vec_col)).alias("__b"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("__a"), F.col("__b")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
