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

import logging
import math
import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

_log = logging.getLogger(__name__)


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
    from pg2kafka_spark.operators.scale import spread_small_input

    q = queries.select(
        F.col(query_id_col), as_double(F.col(vec_col)).alias("__qv")
    )
    # spread: |queries| cosines per corpus row on a 1-split local scan
    # otherwise run on one core (r14); no-op at scale
    c = spread_small_input(
        corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("__cv")),
        key=id_col,
    )
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
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
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
    probability 1 − θ/π per bit.

    Arrow-batched kernel: one (batch × dim) @ (dim × m) BLAS matmul
    plus a bit-weight matvec per batch. The first formulation unrolled
    m interpreted higher-order-function dot folds into the projection
    — ~m·dim interpreted ops per ROW, which stops being tolerable
    exactly when :func:`scaled_keyspace_bits` raises m at large N. A
    BLAS dot can disagree with a sequential fold only when |dot| is
    within summation-order noise of 0 (a vector essentially ON a
    random hyperplane) — for LSH bucketing that bit was already a coin
    flip; no consumer is oracle-checked on bucket values."""
    planes_t = np.asarray(_hyperplanes(num_planes, dim, seed), dtype=np.float64).T
    weights = (np.int64(1) << np.arange(num_planes, dtype=np.int64))

    @F.pandas_udf("bigint")
    def sig(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series(np.empty(0, dtype=np.int64))
        A = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        return pd.Series(((A @ planes_t) >= 0.0) @ weights)

    return sig(as_double(vec))


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
    portable: bool = False,
) -> DataFrame:
    """Approximate top-k: exact cosine, but only among corpus vectors
    whose hyperplane bucket matches the query's (or differs in one bit
    with ``multiprobe``) — the candidate set is ~N/2^m (+ m probes).

    The corpus is bucketed once (reusable across query batches); the
    join is an equality join on the bucket id, so at 100 TB the plan is
    one uniform shuffle of the small signature projection, never a
    cross join.

    ``portable=True`` swaps the Gaussian BLAS signature for the
    Rademacher ±1 sequential-fold signature
    (:func:`portable_lsh_signature`) whose SIGNS are bit-exact
    cross-engine — the oracle-checkable mode (the
    ``embedding_near_dup_lsh_portable`` contract); the default BLAS
    path stays the discovery hot path.
    """
    sig = (
        (lambda v: portable_lsh_signature(v, num_planes, dim, seed))
        if portable
        else (lambda v: hyperplane_signature(v, num_planes, dim, seed))
    )
    c = corpus.select(
        F.col(id_col),
        as_double(F.col(vec_col)).alias("__cv"),
        sig(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col),
        as_double(F.col(vec_col)).alias("__qv"),
        sig(F.col(vec_col)).alias("qbucket"),
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
    return cand.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


#: Knuth multiplicative constants for the portable pseudo-random
#: sample ordering (same family as the portable MinHash in dedup.py).
PORTABLE_SAMPLE_SALT = 2654435761
PORTABLE_SAMPLE_MOD = (1 << 31) - 1
#: Additive pre-salt applied before the multiply where a fixed point
#: at 0 would be semantically wrong (``id ≡ 0 (mod M)`` maps to hash 0
#: — e.g. an always-sampled key in weighted sampling). Any nonzero
#: constant breaks the fixed point; a prime keeps the map bijective
#: on residues.
PORTABLE_SAMPLE_OFFSET = 1_000_003


def centroid_rows_to_array(cents: DataFrame, *key_cols: str) -> DataFrame:
    """Collapse a ``(cid, __ce)`` centroid table to ONE row (or one
    row per ``key_cols`` group) holding ``array<struct<cid,__ce>>`` —
    the broadcast-attachable form the map-only argmax consumes.

    r19 (guide §2.4/§8): the old assignment shape cross-joined every
    corpus row against the centroid rows and collapsed the candidates
    with a ``max_by`` hash-aggregate — correct, but the aggregate's
    exchange re-shuffled the FULL corpus (id + 64-double vector per
    row) once per Lloyd pass and once per assignment. With the
    candidate set riding along as one broadcast array column, the
    argmax is a pure projection: the corpus never shuffles at all.
    ``collect_list`` order is nondeterministic, but every consumer
    (argmax / sort-and-slice) is order-independent with a total
    tiebreak, so results are bit-identical."""
    agg = F.collect_list(F.struct("cid", "__ce")).alias("__ca")
    if key_cols:
        return cents.groupBy(*key_cols).agg(agg)
    return cents.agg(agg)


def _best_cell(vec: Column, cents_arr: Column) -> Column:
    """``struct(sim, ncid)`` of the argmax centroid for ``vec``:
    ``array_max`` over ``struct(6-dp-rounded cosine, -cid)`` — the
    identical (sim desc, cid asc) tie semantics as the previous
    ``max_by(cid, struct(sim, -cid))`` / row_number formulations
    (struct comparison is field-lexicographic with the same NaN-
    greatest double ordering), evaluated per row with zero shuffle.
    ``cid = -ncid``; ``sim`` is the winning cell similarity."""
    return F.array_max(
        F.transform(
            cents_arr,
            lambda c: F.struct(
                F.round(cosine(vec, c["__ce"]), 6).alias("sim"),
                (-c["cid"]).alias("ncid"),
            ),
        )
    )


def probe_cells(
    queries_prepared: DataFrame,
    cents: DataFrame,
    n_probe: int,
    query_id_col: str = "query_id",
    vec_col: str = "__qv",
) -> DataFrame:
    """``(query_id, vec, cid)`` of each query's ``n_probe`` nearest
    centroids — map-only (r19): the centroid table rides along as a
    broadcast one-row array, each query's candidates are ranked per ROW
    via ``reverse(array_sort(struct(sim, -cid)))`` (= sim desc, cid
    asc, incl. the NaN-first edge of the old ``row_number`` window's
    desc order) and the top ``n_probe`` slice explodes. Replaces the
    per-query row_number window — an exchange + sort over
    queries × centroids rows — with zero exchanges."""
    carr = centroid_rows_to_array(cents)
    cand = F.transform(
        F.col("__ca"),
        lambda c: F.struct(
            F.round(cosine(F.col(vec_col), c["__ce"]), 6).alias("sim"),
            (-c["cid"]).alias("ncid"),
        ),
    )
    top = F.slice(F.reverse(F.array_sort(cand)), 1, int(n_probe))
    return (
        queries_prepared.crossJoin(F.broadcast(carr))
        .select(query_id_col, vec_col, F.explode(top).alias("__p"))
        .select(
            query_id_col, vec_col, (-F.col("__p")["ncid"]).alias("cid")
        )
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int | None = None,
) -> DataFrame:
    """Deterministic, engine-portable spherical k-means: ``iters``
    Lloyd iterations with max-cosine assignment and element-wise mean
    update, entirely as DataFrame ops — returns ``(cid, __ce)``.

    Determinism/portability contract (the same discipline as the
    portable sketches): seeding picks the ``n_centroids`` vectors with
    the smallest ``(id·salt) mod (2³¹−1)`` — a fixed pseudo-random
    permutation both engines can express — every assignment argmax
    runs on 6-dp-rounded cosine with cid as tiebreak, and centroid
    means are 6-dp-rounded per component, so DuckDB reproduces the
    centroids bit-for-bit and the whole IVF operator stays
    oracle-checkable.

    Scale shape: the seed scan is top-n (TakeOrderedAndProject — per-
    partition heads, no global sort); each iteration is one map-only
    assignment pass against broadcast centroids plus an
    O(n_centroids·dim) aggregate. Pass ``train_sample`` at real scale
    to train on the smallest-hash ``train_sample`` rows (same
    portable ordering) instead of the full corpus — the standard
    IVF practice; the assignment/probe plan is unchanged.
    Cells that go empty keep their previous centroid.
    """
    c = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("__cv"))
    # reduce the id mod 2³¹−1 BEFORE the salt multiply: the product
    # then stays < 2³¹·salt ≈ 5.7e18 < 2⁶³, so the ordering is
    # overflow-free for ANY bigint id (id·salt directly would throw
    # under ANSI mode for ids ≥ ~3.5e9 — both engines). Values are
    # unchanged for ids < 2³¹−1 (pmod is the identity there).
    ordered = c.withColumn(
        "__h",
        F.pmod(
            F.pmod(F.col(id_col).cast("bigint"), F.lit(PORTABLE_SAMPLE_MOD))
            * F.lit(PORTABLE_SAMPLE_SALT),
            F.lit(PORTABLE_SAMPLE_MOD),
        ),
    ).orderBy("__h", id_col)
    cents = ordered.limit(n_centroids).select(
        F.col(id_col).alias("cid"), F.col("__cv").alias("__ce")
    )
    from pg2kafka_spark.operators.scale import spread_small_input

    # spread the TRAIN relation: every Lloyd pass is n_centroids
    # rounded cosines per row, and a 1-split local scan would run all
    # ``iters`` passes on one core (r14); no-op at scale, and
    # order-free by construction (max_by tiebreaks + fixed-point sums)
    train = spread_small_input(
        ordered.limit(train_sample).select(id_col, "__cv")
        if train_sample is not None
        else c,
        key=id_col,
    )
    # r20: the iteration state is the broadcast ARRAY itself, not a
    # (cid, __ce) table. The old tail of every Lloyd pass — means
    # projection → BroadcastExchange(means) → LeftOuter join with the
    # prior table → collect_list re-aggregate → BroadcastExchange —
    # cost one extra broadcast-build job per iteration under AQE plus
    # a join subtree in every replan. Folding the means into the
    # prior array with a transform expression keeps the identical
    # per-component arithmetic and the identical empty-cell fallback
    # (a cell with no assigned rows keeps its previous centroid), in
    # one broadcast build per pass.
    carr = centroid_rows_to_array(cents)
    for _ in range(iters):
        # Assignment argmax as a map-only projection (r19; previously
        # a max_by hash-aggregate, r8, which still exchanged one
        # full-vector row per id per pass): the centroid table rides
        # along as a broadcast one-row array and `_best_cell` picks
        # the (sim desc, cid asc) winner per row — the training
        # relation never shuffles (guide §2.4).
        asg = train.crossJoin(F.broadcast(carr)).select(
            id_col,
            "__cv",
            (-_best_cell(F.col("__cv"), F.col("__ca"))["ncid"]).alias(
                "cid"
            ),
        )
        # Per-component means via EXACT fixed-point bigint sums, not
        # avg(double): a double partial-sum order depends on partition
        # layout, so a sum near a 5e-7 rounding boundary could flip
        # the 6th decimal across core counts or vs the oracle (the
        # same discipline as the salted-agg DECIMAL caveat). Each
        # component is rounded once to 1e-9 (3 decades below the 6-dp
        # output rounding) and summed as a LONG — order-independent,
        # and ~25% cheaper per training pass than the decimal(27,15)
        # formulation this replaces (the r6→r5 `embedding_ann_ivf`
        # regression, A/B'd in BASELINE.md: decimal sums pay a
        # BigDecimal conversion per component per row; long sums stay
        # in whole-stage codegen primitives). Overflow bound:
        # Σ|x_i|·1e9 per cell < 2⁶³ ⇒ safe while
        # cell_rows · max|component| < 9.2e9 — embeddings are
        # unit-scale, and at real corpus size training runs on
        # ``train_sample`` rows anyway (pass it; the bound then holds
        # by construction). ONE double division + round(6) at the end
        # is deterministic IEEE on any engine.
        sums = asg.groupBy("cid").agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(
                    F.round(F.col("__cv").getItem(i) * F.lit(1.0e9)).cast("bigint")
                ).alias(f"__s{i}")
                for i in range(dim)
            ],
        )
        # Collapse the per-cell means to ONE row without a new
        # exchange (coalesce(1) over the ≤n_centroids-partition agg
        # output), attach the prior array via the SAME broadcast the
        # assignment already built (exchange-reused — no extra
        # broadcast-build job per pass), and fold: per element, the
        # matching mean if the cell received rows, else the previous
        # centroid — the exact semantics of the old LeftOuter +
        # coalesce, with the identical round(sum/(n·1e9), 6)
        # per-component arithmetic. (A fully EMPTY training relation
        # now yields an empty table rather than the seeds — only
        # reachable via train_sample=0, which no consumer uses; any
        # real index build trains on ≥ n_centroids rows.)
        carr = (
            sums.coalesce(1)
            .crossJoin(F.broadcast(carr))
            .agg(
                F.first("__ca").alias("__pa"),
                F.collect_list(
                    F.struct(
                        F.col("cid"),
                        F.array(
                            *[
                                F.round(
                                    F.col(f"__s{i}").cast("double")
                                    / (F.col("__n").cast("double") * F.lit(1.0e9)),
                                    6,
                                )
                                for i in range(dim)
                            ]
                        ).alias("__me"),
                    )
                ).alias("__ma"),
            )
            .select(
                F.transform(
                    "__pa",
                    lambda c: F.struct(
                        c["cid"].alias("cid"),
                        F.coalesce(
                            F.get(
                                F.filter(
                                    "__ma", lambda m: m["cid"] == c["cid"]
                                ),
                                0,
                            )["__me"],
                            c["__ce"],
                        ).alias("__ce"),
                    ),
                ).alias("__ca")
            )
        )
    cents = carr.select(F.explode("__ca").alias("__c")).select(
        F.col("__c")["cid"].alias("cid"), F.col("__c")["__ce"].alias("__ce")
    )
    # persist the trained table (n_centroids rows): its lineage holds
    # `iters` full assignment passes over the corpus, and IVF consumes
    # it from two places (cell assignment + query probes) — uncached,
    # every consumer re-trains. Tracked by the shared cache registry
    # so suite runners release it like any sketch intermediate.
    from pg2kafka_spark.operators.dedup import _persist

    return _persist(cents)


def quantization_stats(
    corpus: DataFrame, dim: int = 64, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension ``(mns, steps)`` arrays for asymmetric int8
    scalar quantization: ``step_i = (max_i − min_i) / 255``. One
    aggregate pass with map-side partials (2·dim min/max columns —
    never an explode); the result is ONE row, broadcast to every
    consumer. min/max of input floats are exact; the step is a single
    IEEE division — deterministic on any engine."""
    c = corpus.select(as_double(F.col(vec_col)).alias("__cv"))
    agg = c.agg(
        *[F.min(F.col("__cv").getItem(i)).alias(f"__mn{i}") for i in range(dim)],
        *[F.max(F.col("__cv").getItem(i)).alias(f"__mx{i}") for i in range(dim)],
    )
    return agg.select(
        F.array(*[F.col(f"__mn{i}") for i in range(dim)]).alias("mns"),
        F.array(
            *[
                ((F.col(f"__mx{i}") - F.col(f"__mn{i}")) / F.lit(255.0))
                for i in range(dim)
            ]
        ).alias("steps"),
    )


def _quantize_expr(vec: str, dim: int) -> Column:
    """``array<tinyint>`` int8 codes for double-array column ``vec``
    against broadcast ``mns``/``steps``: ``round((v−mn)/step) − 128``.
    Constant dimensions (step 0) code to −128."""
    return F.array(
        *[
            F.when(F.col("steps").getItem(i) == 0.0, F.lit(-128))
            .otherwise(
                F.round(
                    (F.col(vec).getItem(i) - F.col("mns").getItem(i))
                    / F.col("steps").getItem(i)
                ).cast("int")
                - F.lit(128)
            )
            .cast("tinyint")
            for i in range(dim)
        ]
    )


def _dequantize_expr(qcol: str, dim: int) -> Column:
    """Reconstruct doubles from int8 codes: ``mn + (q+128)·step`` —
    exact IEEE multiply-add per element, engine-portable."""
    return F.array(
        *[
            F.col("mns").getItem(i)
            + (F.col(qcol).getItem(i).cast("double") + F.lit(128.0))
            * F.col("steps").getItem(i)
            for i in range(dim)
        ]
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force cosine top-k over an int8 scalar-quantized index —
    the 4×-smaller-index ANN variant (Jégou et al.'s SQ baseline;
    what FAISS calls ``SQ8``). The corpus is coded to
    ``array<tinyint>`` against per-dimension min/max (codes are what
    a real index stores and scans — 1 byte/dim instead of 4);
    scoring dequantizes on the fly and ranks by cosine over the
    reconstructed vectors, so the result is exactly what the
    compressed index can know.

    Engine-portable end-to-end: codes are exact integers, dequant is
    ``mn + (q+128)·step`` (exact IEEE ops on deterministic stats),
    cosine is the sequential fold — so unlike LSH/IVF this ANN
    variant is fully hash-checkable with no seeds at all.

    Scale shape: one stats aggregate (map-side partials, 1-row
    result broadcast), one map-only encode pass, then the
    brute-force-topk plan (queries broadcast, WindowGroupLimit).
    Compose with IVF cells for the standard IVF+SQ8 index when N
    demands it.

    Cost note: encode/dequant/stats are UNROLLED 64-wide expressions
    on purpose — unrolled arrays run inside whole-stage codegen while
    ``zip_with``/``transform`` lambdas are interpreted-only, so per
    ROW the unrolled form is ~10× cheaper. BUT the encode and scoring
    stages must stay SEPARATE codegen units: collapsing
    quantize∘dequantize∘cosine into one fused projection generates a
    ``processNext()`` past the JVM's 64 KB method limit — Janino then
    fails on EVERY execution (no negative cache), wasting ~1 s per
    run before the interpreted fallback (root-caused in round 7,
    BASELINE.md "64 KB" section). Persisting the coded table severs
    the composition — which is also the honest index semantics: the
    int8 codes ARE the stored index; scoring reads codes, not the
    raw corpus.
    """
    from pg2kafka_spark.operators.dedup import _persist

    from pg2kafka_spark.operators.scale import spread_small_input

    stats = _persist(quantization_stats(corpus, dim, vec_col))
    # spread: the 64-wide unrolled encode and the downstream
    # dequant+cosine scoring both inherit the coded table's layout —
    # on a 1-split local scan the whole SQ8 path ran on one core
    # (r14); no-op at scale
    coded = _persist(
        spread_small_input(
            corpus.select(
                F.col(id_col), as_double(F.col(vec_col)).alias("__cv")
            ),
            key=id_col,
        )
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), _quantize_expr("__cv", dim).alias("__q"))
    )
    c = coded.crossJoin(F.broadcast(stats)).select(
        F.col(id_col), _dequantize_expr("__q", dim).alias("__cv")
    )
    qcoded = _persist(
        queries.select(
            F.col(query_id_col), as_double(F.col(vec_col)).alias("__qv")
        )
        .crossJoin(F.broadcast(stats))
        .select(F.col(query_id_col), _quantize_expr("__qv", dim).alias("__q"))
    )
    q = qcoded.crossJoin(F.broadcast(stats)).select(
        F.col(query_id_col), _dequantize_expr("__q", dim).alias("__qv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("qcos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("qcos_sim").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def assign_cells(
    prepared: DataFrame, cents: DataFrame, id_col: str = "vec_id",
    keep_sim: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment for a ``(id, __cv)`` frame against a
    ``(cid, __ce)`` centroid table: argmax on 6-dp-rounded cosine with
    cid as tiebreak (the engine-portable discipline shared with
    :func:`kmeans_centroids`), computed as a MAP-ONLY projection
    against the broadcast centroid array (r19; the r8 max_by
    hash-aggregate still exchanged one full-vector row per id — now
    the corpus never shuffles for assignment at all, guide §2.4).
    Returns ``(id, __cv, cid)``; ``keep_sim`` adds the winning
    ``cell_sim`` (the max candidate sim, as before)."""
    from pg2kafka_spark.operators.scale import spread_small_input

    # spread: n_centroids rounded cosines per row is the corpus-sized
    # heavy stage, and a small local scan plans 1 split (r14 labeled
    # event-log capture: single-straggler-task ANN rows); no-op at
    # scale
    prepared = spread_small_input(prepared, key=id_col)
    carr = centroid_rows_to_array(cents)
    # stage __best once: it is non-cheap and (with keep_sim) multiply
    # referenced, so CollapseProject keeps the staging projection
    staged = prepared.crossJoin(F.broadcast(carr)).withColumn(
        "__best", _best_cell(F.col("__cv"), F.col("__ca"))
    )
    return staged.select(
        id_col,
        "__cv",
        (-F.col("__best")["ncid"]).alias("cid"),
        *(
            [F.col("__best")["sim"].alias("cell_sim")]
            if keep_sim
            else []
        ),
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.4,
    n_centroids: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with k-means, then
    prune WITHIN each cluster — a vector is dropped when some
    smaller-id vector in the same cluster has cosine ≥ ``threshold``.
    Clustering bounds the quadratic pair scan to one cluster at a
    time, which is exactly what makes semantic dedup tractable at
    corpus scale (the published recipe; near-identical vectors landing
    in different clusters are the method's documented recall loss).

    Returns ``(id, cid, max_prior_sim, kept)`` for every corpus row.
    ``max_prior_sim`` is the max 6-dp-rounded cosine against any
    smaller-id vector in the vector's cluster, with ``-2.0`` as the
    no-prior sentinel (a real cosine is ≥ −1; NULL would round-trip
    as NaN through the Arrow kernel) — so the operator stays fully
    oracle-checkable against the unrolled-k-means SQL twin.

    Scale shape: training/assignment are the IVF plan (broadcast
    centroids, map-only). The per-cluster prune is ONE grouped-map
    BLAS task per cluster — O(m²) in cluster size m, so pick
    ``n_centroids ≈ N / target_cluster_size`` to bound task memory;
    at 100 TB that means n_centroids in the 10⁴–10⁵ range (the paper
    uses 11k clusters for LAION), NOT this demo default of 8.

    Design-note refs: the reference relays rows (blendle/pg2kafka
    main.go:68-120) and has no embedding stage; this is M5 pipeline
    surface (SURVEY.md §7).
    """
    thr = float(threshold)
    cents = kmeans_centroids(
        corpus, n_centroids, iters, dim, id_col, vec_col, train_sample
    )
    c = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("__cv"))
    cells = assign_cells(c, cents, id_col)

    def kernel(key, pdf):
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        V = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["__cv"].iloc[order]]
        )
        g = V @ V.T
        n = np.einsum("ij,ij->i", V, V)
        cos = np.round(g / np.sqrt(np.outer(n, n)), 6)
        # ids are sorted ascending: "prior" = strictly lower triangle
        prior = np.tril(np.ones_like(cos, dtype=bool), k=-1)
        masked = np.where(prior, cos, -2.0)
        mx = masked.max(axis=1, initial=-2.0)
        return pd.DataFrame(
            {
                id_col: ids,
                "cid": np.full(len(ids), key[0], dtype=np.int64),
                "max_prior_sim": mx,
                "kept": mx < thr,
            }
        )

    return cells.groupBy("cid").applyInPandas(
        kernel, f"{id_col} bigint, cid bigint, max_prior_sim double, kept boolean"
    )


def cluster_balanced_sample(
    corpus: DataFrame,
    per_cluster: int = 20,
    n_centroids: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int | None = None,
) -> DataFrame:
    """Cluster-balanced (diversity) subsampling: k-means-cluster the
    embedding space, then take an EQUAL quota from every cluster —
    the standard counterweight to raw sampling's mode bias when
    assembling a training subset (big dense modes stop dominating;
    rare regions keep representation). Same family as SemDeDup's
    cluster pass (:func:`semantic_dedup` — prune near-twins) but the
    selection here is per-cluster quota, not similarity.

    Returns ``(id, cid, srank)`` for the kept rows, ``srank`` ≤
    ``per_cluster``. The within-cluster order is the md5 of the id —
    a deterministic engine-portable shuffle (both engines hex-encode
    identically), so the sample is reproducible and the whole
    operator — training, assignment, quota — is hash-checked against
    the unrolled-k-means SQL twin.

    Scale shape: training is the sample-bounded portable k-means;
    assignment the broadcast map-only pass; the quota is a
    rank-over-cid window on a 3-narrow-column frame — one cid-keyed
    exchange, and the ``srank <= n`` filter plans as WindowGroupLimit
    (per-partition bounded heaps before the exchange). At 100 TB,
    size ``n_centroids`` for target cluster mass exactly as the
    SemDeDup note describes.

    Design-note refs: the reference relays rows (blendle/pg2kafka
    main.go:68-120) and has no embedding stage; this is M5 pipeline
    surface (SURVEY.md §7).
    """
    cents = kmeans_centroids(
        corpus, n_centroids, iters, dim, id_col, vec_col, train_sample
    )
    c = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("__cv"))
    cells = assign_cells(c, cents, id_col)
    w = Window.partitionBy("cid").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        cells.select(id_col, "cid")
        .withColumn("srank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("srank") <= int(per_cluster))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    train: str = "kmeans",
    train_iters: int = 2,
    dim: int = 64,
    train_sample: int | None = None,
    train_corpus: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: partition the corpus into inverted lists by
    nearest centroid, probe only the ``n_probe`` nearest lists per
    query, exact cosine within the probed lists, top-k.

    ``train_corpus`` (default: the corpus itself) trains the coarse
    quantizer on a DIFFERENT frame — the incremental-ingest mode:
    train on yesterday's store, assign today's batch to the existing
    cells without retraining (retraining re-shuffles every stored
    code; assignment is one broadcast map pass), search the union.

    Centroids come from :func:`kmeans_centroids` (deterministic
    portable spherical k-means, ``train="kmeans"``) or the legacy
    first-N stub (``train="first_n"``, kept for comparison tests).
    Every similarity that drives an argmax/ranking is rounded to 6
    decimals first so assignment is engine-portable (ulp-level cosine
    differences cannot flip a cell assignment), making the whole
    operator — training included — ANSI-SQL-expressible, unlike
    hash-seeded LSH.

    Scale shape: centroids broadcast (tiny); assignment is one
    map-only pass over the corpus; the probe join is an equality join
    on cid. The corpus never self-joins and never shuffles beyond the
    one cid-partitioned exchange — at 1B vectors, cost is
    O(N·C) assignment + O(N·P/C) candidate scoring per query batch
    (+ train_iters assignment passes once per corpus, amortized
    across query batches; use ``train_sample`` to bound them).
    """
    if train == "kmeans":
        cents = kmeans_centroids(
            train_corpus if train_corpus is not None else corpus,
            n_centroids,
            train_iters,
            dim,
            id_col,
            vec_col,
            train_sample,
        )
    elif train == "first_n":
        cents = corpus.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cid"), as_double(F.col(vec_col)).alias("__ce")
        )
    else:
        raise ValueError(f"unknown train mode {train!r}")
    c = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("__cv"))
    cells = assign_cells(c, cents, id_col)
    q = queries.select(F.col(query_id_col), as_double(F.col(vec_col)).alias("__qv"))
    # map-only probe ranking (r19): see probe_cells — no exchange, no
    # sort over the queries × centroids candidates
    probes = probe_cells(q, cents, n_probe, query_id_col)
    rank_w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        cells.join(F.broadcast(probes), "cid")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(rank_w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_blocks: int = 8,
) -> DataFrame:
    """All pairs with cosine ≥ threshold, as a block-partitioned
    matrix product.

    The corpus is hashed into ``num_blocks`` blocks and every block
    pair (upper triangle incl. diagonal) becomes one grouped-map task
    that runs a BLAS matmul over its two blocks. Each row is
    replicated to the ``num_blocks`` block pairs it participates in —
    one shuffle, the standard dense-similarity tradeoff.

    A block-pair group arrives in the kernel as Arrow-batched ROWS
    (``applyInPandas``), never as a single ``collect_list`` row: the
    round-2 formulation packed a whole block into one row, which put
    block size under Spark's ~2 GiB single-value ceiling and funneled
    it through one off-heap copy. Here a block is bounded only by
    task memory: pick ``num_blocks ≈ 2·N·d·8 B / task-memory-budget``
    at scale (tests/test_plans.py pins the no-collect_list shape).

    ``cos_sim`` is rounded to 6 decimals — a numpy blocked-sum dot
    is not bit-identical to a sequential fold, so parity with any
    exact-pair oracle is at rounded precision.
    """
    nb = int(num_blocks)
    thr = float(threshold)
    bid = F.pmod(F.xxhash64(F.col(id_col).cast("bigint")), F.lit(nb))
    # replicate: row in block b joins pair (min(b,j), max(b,j)) ∀j;
    # on the diagonal pair it serves both sides (is_a, kernel reuses)
    rep = (
        df.select(
            bid.alias("bid"),
            F.col(id_col).cast("bigint").alias("id"),
            as_double(F.col(vec_col)).alias("e"),
        )
        .withColumn(
            "pk",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(nb - 1)),
                    lambda j: F.struct(
                        F.least(F.col("bid"), j).alias("blo"),
                        F.greatest(F.col("bid"), j).alias("bhi"),
                    ),
                )
            ),
        )
        .select(
            F.col("pk.blo").alias("blo"),
            F.col("pk.bhi").alias("bhi"),
            (F.col("bid") == F.col("pk.blo")).alias("is_a"),
            "id",
            "e",
        )
    )

    def kernel(key, pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "cos_sim": pd.Series(dtype="float64"),
            }
        )
        diag = key[0] == key[1]
        a_rows = pdf if diag else pdf[pdf["is_a"]]
        if len(a_rows) == 0:
            return empty
        ia = a_rows["id"].to_numpy(dtype=np.int64)
        A = np.stack([np.asarray(v, dtype=np.float64) for v in a_rows["e"]])
        if diag:
            ib, B = ia, A
        else:
            b_rows = pdf[~pdf["is_a"]]
            if len(b_rows) == 0:
                return empty
            ib = b_rows["id"].to_numpy(dtype=np.int64)
            B = np.stack([np.asarray(v, dtype=np.float64) for v in b_rows["e"]])
        g = A @ B.T
        na = np.einsum("ij,ij->i", A, A)
        nbn = na if diag else np.einsum("ij,ij->i", B, B)
        cos = np.round(g / np.sqrt(np.outer(na, nbn)), 6)
        mask = cos >= thr
        # each unordered pair lives in exactly one block pair; orient
        # by id (and upper triangle on the diagonal)
        if diag:
            mask &= ia[:, None] < ib[None, :]
        ii, jj = np.nonzero(mask)
        if len(ii) == 0:
            return empty
        left, right = ia[ii], ib[jj]
        return pd.DataFrame(
            {
                "id_a": np.minimum(left, right),
                "id_b": np.maximum(left, right),
                "cos_sim": cos[ii, jj],
            }
        )

    return rep.groupBy("blo", "bhi").applyInPandas(
        kernel, "id_a bigint, id_b bigint, cos_sim double"
    )


def rademacher_planes(num_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """±1 hyperplanes from a seeded PRNG — the PORTABLE sibling of
    :func:`_hyperplanes`. With ±1 coefficients the projection
    ``dot(v, plane)`` is a sequential fold of ``±v_i`` — exact IEEE
    additions in a fixed order, which DuckDB's ``list_inner_product``
    reproduces bit-for-bit (the same property the cosine oracles rely
    on) — so the SIGN of the projection, hence the bucket id, is
    engine-portable with no tolerance. Gaussian planes don't have
    this: their BLAS matmul can flip a sign within summation-order
    noise of zero. Sign quality: Rademacher projections are a
    standard sparse replacement for Gaussian ones (Achlioptas'01) —
    per-bit collision probability is still monotone in the angle."""
    rng = random.Random(seed)
    return [
        [1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)]
        for _ in range(num_planes)
    ]


def portable_lsh_signature(
    vec: Column, num_planes: int, dim: int, seed: int = 42
) -> Column:
    """m-bit Rademacher-hyperplane signature as a BIGINT bucket id,
    computed JVM-side as ``num_planes`` sequential zip_with/aggregate
    folds — interpreted HOFs, so this is the ORACLE-CHECKABLE twin of
    the BLAS :func:`hyperplane_signature`, not its replacement on the
    discovery hot path (m folds × dim per row vs one matmul)."""
    v = as_double(vec)
    bucket = F.lit(0).cast("bigint")
    for j, plane in enumerate(rademacher_planes(num_planes, dim, seed)):
        p = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(
            dot(v, p) >= 0, F.lit(1 << j).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return bucket


def embedding_near_dup_lsh_portable(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Single-table hyperplane-LSH near-dup discovery under the
    portable-signature contract: bucket on the Rademacher signature
    (one uniform-key shuffle), expand pairs only within a bucket,
    verify with exact 6-dp cosine ≥ ``threshold``. Emits
    ``(id_a, id_b, bucket, cos_sim)`` — bucket included so the oracle
    hash-checks the SIGNATURE math, not just the surviving pairs.

    This is the hash-checkable twin of the production
    :func:`embedding_near_dup_lsh` (multi-table, BLAS signatures,
    capped buckets): same plan shape — signature projection, equality
    self-join on the bucket key, verify-on-candidates — with every
    stage SQL-expressible. Single-table recall is 1−θ/π per bit; the
    production path stacks tables for recall, this one exists to pin
    the per-table semantics."""
    from pg2kafka_spark.operators.scale import spread_small_input

    thr = float(threshold)
    # spread: the per-row signature (num_planes rounded dot folds) on
    # a 1-split local scan otherwise runs on one core (r14); no-op at
    # scale
    sig = spread_small_input(df, key=id_col).select(
        F.col(id_col).cast("bigint").alias("id"),
        as_double(F.col(vec_col)).alias("e"),
        portable_lsh_signature(F.col(vec_col), num_planes, dim, seed).alias(
            "bucket"
        ),
    )
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.bucket").alias("bucket"),
            F.round(cosine(F.col("a.e"), F.col("b.e")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= thr)
    )


def scaled_keyspace_bits(
    n_rows: int,
    max_bucket_size: int,
    floor_bits: int,
    cap_bits: int,
    target_fill: float = 8.0,
) -> int:
    """Bits for an LSH keyspace sized to the corpus: smallest ``m``
    with expected bucket size ``n/2^m ≤ max_bucket_size/target_fill``,
    clamped to ``[floor_bits, cap_bits]``.

    Why this exists (round-5 advice): the hot-bucket cap's rationale —
    "over-cap buckets are exact-dup clusters, drop them" — only holds
    when the keyspace is large relative to N. With a FIXED keyspace of
    ``2^floor_bits`` buckets, once ``N > max_bucket_size·2^bits`` the
    AVERAGE bucket of unrelated vectors exceeds the cap and the
    anti-join silently drops everything — recall collapses to 0 with
    no error. Scaling bits with N keeps expected buckets ``target_fill``×
    under the cap so only genuine duplicate pile-ups get dropped.
    Raises if even ``cap_bits`` cannot keep the expected bucket under
    the cap (the caller must raise the cap or pre-dedup).
    """
    if n_rows <= 0:
        return floor_bits
    need = math.ceil(math.log2(max(1.0, target_fill * n_rows / max_bucket_size)))
    bits = max(floor_bits, need)
    if bits > cap_bits:
        if n_rows / float(1 << cap_bits) > max_bucket_size:
            raise ValueError(
                f"corpus of {n_rows} rows needs >{cap_bits} keyspace bits to "
                f"keep expected LSH buckets under max_bucket_size="
                f"{max_bucket_size}; raise the cap or exact-dedup first"
            )
        bits = cap_bits
    if bits > floor_bits:
        _log.warning(
            "LSH keyspace auto-scaled to %d bits for %d rows "
            "(expected bucket %.0f ≤ cap %d)",
            bits, n_rows, n_rows / float(1 << bits), max_bucket_size,
        )
    return bits


def embedding_near_dup_lsh(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int | None = None,
    dim: int = 64,
    num_tables: int = 4,
    seed: int = 42,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """All pairs with cosine ≥ ``threshold`` via hyperplane-LSH
    bucketing — the DISCOVERY-path sibling of
    :func:`embedding_near_dup_pairs`.

    The block-matmul formulation is exact but replicates every row
    ``num_blocks``× (all-pairs by construction) — right at 10⁴-10⁶
    vectors, impossible at 10⁹. This one buckets the corpus in
    ``num_tables`` independent hyperplane tables (different seeds)
    and scores pairs only within a bucket: per table one uniform-key
    shuffle of (id, vector), expected bucket size N/2^num_planes,
    candidate recall 1−(1−p^m)^L for per-bit agreement p = 1−θ/π.
    Within-bucket scoring is a grouped-map BLAS kernel
    (``applyInPandas`` per bucket, same kernel shape as the block
    matmul) — a first formulation computed each candidate's cosine as
    an interpreted JVM array fold, which measured 11× slower than the
    matmul it was supposed to beat; candidates must never materialize
    as rows. Identical-vector clusters collapse into one bucket in
    every table (the boilerplate problem again) — ``max_bucket_size``
    drops them via the same broadcast anti-join cap as the text-LSH
    paths; exact dups belong to the cheaper exact pass.

    ``num_planes=None`` (default) sizes the keyspace to the corpus
    via :func:`scaled_keyspace_bits` (one count on the persisted
    vector projection): a FIXED 2^8-bucket keyspace would make the
    cap drop *average* buckets once N > cap·256 (~2.5M vectors) —
    silent 0-recall. The floor of 8 keeps small-corpus behavior (and
    every existing test/query) byte-identical.

    ``cos_sim`` is 6-dp rounded (portability discipline, numpy round
    like the matmul path); pairs caught by several tables are emitted
    once.
    """
    import numpy as np
    import pandas as pd

    from pg2kafka_spark.operators.dedup import _cap_buckets, _persist

    thr = float(threshold)

    def bucket_pairs(ids: "np.ndarray", A: "np.ndarray"):
        # per-bucket math, IDENTICAL to the historical per-group
        # kernel: exact cosine, 6-dp round, id_a < id_b orientation
        n = np.einsum("ij,ij->i", A, A)
        cos = np.round((A @ A.T) / np.sqrt(np.outer(n, n)), 6)
        mask = (cos >= thr) & (ids[:, None] < ids[None, :])
        ii, jj = np.nonzero(mask)
        return ids[ii], ids[jj], cos[ii, jj]

    def kernel(key, pdf):
        # One call per SUPER-GROUP of whole buckets (see the grouping
        # note below); buckets are scored independently inside it.
        out_a: list = []
        out_b: list = []
        out_c: list = []
        for _, sub in pdf.groupby("bucket", sort=False):
            if len(sub) < 2:
                continue
            ids = sub["id"].to_numpy(dtype=np.int64)
            A = np.stack(
                [np.asarray(v, dtype=np.float64) for v in sub["e"]]
            )
            ia, ib, cs = bucket_pairs(ids, A)
            if len(ia):
                out_a.append(ia)
                out_b.append(ib)
                out_c.append(cs)
        if not out_a:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64"),
                    "cos_sim": pd.Series(dtype="float64"),
                }
            )
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cos_sim": np.concatenate(out_c),
            }
        )

    v = _persist(
        df.select(
            F.col(id_col).cast("bigint").alias("id"),
            as_double(F.col(vec_col)).alias("e"),
        )
    )
    if num_planes is None:
        num_planes = (
            scaled_keyspace_bits(v.count(), max_bucket_size, 8, 24)
            if max_bucket_size is not None
            else 8
        )
    # Grouped-map ships ONE Arrow batch and one Python UDF call PER
    # GROUP; with the keyspace sized so buckets stay small (expected
    # N/2^num_planes rows), per-bucket grouping made the Arrow
    # round-trip + pandas materialization the dominant cost (~3 ms per
    # ~8-row bucket measured at sf0.1 — the kernel's matmul is
    # microseconds there; the ratio only worsens as the keyspace
    # scales with N). Group instead by a HASH SUPER-GROUP of whole
    # buckets (guide §4.2: keep batches large): the shuffle is the
    # same one exchange per table, each super-group amortizes the
    # crossing over ~32 MB of vectors, and the kernel scores each
    # contained bucket independently — bucket membership, pair set,
    # and cosines are unchanged. Group count derives from the
    # OPTIMIZER SIZE ESTIMATE (no extra job, like spread_small_input),
    # clamped to the session's parallelism so small corpora keep every
    # core busy; a capped bucket (≤ max_bucket_size rows) cannot blow
    # up a 32 MB-target group.
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        vbytes = int(
            str(v._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
        n_groups = max(par, vbytes >> 25)
    except Exception:
        n_groups = par
    out = None
    for t in range(num_tables):
        b = v.select(
            "id",
            "e",
            hyperplane_signature(
                F.col("e"), num_planes, dim, seed + 101 * t
            ).alias("bucket"),
        )
        b = _cap_buckets(b, max_bucket_size, "bucket")
        pairs = (
            b.withColumn(
                "__sg", F.pmod(F.xxhash64("bucket"), F.lit(n_groups))
            )
            .groupBy("__sg")
            .applyInPandas(
                kernel, "id_a bigint, id_b bigint, cos_sim double"
            )
        )
        out = pairs if out is None else out.unionByName(pairs)
    # a pair found by several tables has the same rounded cosine in
    # each — one aggregate dedups exactly
    return out.groupBy("id_a", "id_b").agg(F.first("cos_sim").alias("cos_sim"))


def ivf_sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    n_probe: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    train_iters: int = 2,
) -> DataFrame:
    """IVF + SQ8 — the composed index every large-vector deployment
    actually runs (FAISS ``IVFx,SQ8``): the coarse quantizer (portable
    k-means) routes queries to ``n_probe`` inverted lists, and within
    the probed lists the corpus is scored from its int8 codes
    (asymmetric ADC: the QUERY stays full-precision, the corpus side
    is dequantized — the standard accuracy/memory trade). This closes
    the composition :func:`quantized_topk` promises: at 10⁹ vectors
    the index holds 1 byte/dim per vector in cid-partitioned lists
    and scans ``n_probe/n_centroids`` of them per query.

    Every stage is the already-oracle-checked formulation — k-means
    training, 6-dp-rounded assignment, min/max quantization stats,
    exact-integer codes, exact-IEEE dequantization — so the COMPOSED
    index is fully hash-checkable too (no seeds anywhere).

    Scale shape: centroid table and 1-row quant stats broadcast; the
    encode and the assignment are one fused map-only pass over the
    corpus; the probe join is an equality join on cid. Same single
    cid exchange as :func:`ivf_topk`, plus zero extra shuffles for
    the quantization.
    """
    from pg2kafka_spark.operators.dedup import _persist

    cents = kmeans_centroids(
        corpus, n_centroids, train_iters, dim, id_col, vec_col
    )
    stats = _persist(quantization_stats(corpus, dim, vec_col))
    c = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("__cv"))
    cells = assign_cells(c, cents, id_col)
    # The persisted (id, cid, codes) table IS the IVF+SQ8 index (1
    # byte/dim + a cell id per vector); materializing it also keeps
    # the encode and dequantize+score stages separate codegen units —
    # fused, the projection overflows Janino's 64 KB method limit and
    # every execution pays a failed compile (see quantized_topk).
    coded = _persist(
        cells.crossJoin(F.broadcast(stats)).select(
            F.col(id_col), "cid", _quantize_expr("__cv", dim).alias("__q")
        )
    )
    coded = coded.crossJoin(F.broadcast(stats)).select(
        F.col(id_col), "cid", _dequantize_expr("__q", dim).alias("__de")
    )
    q = queries.select(
        F.col(query_id_col), as_double(F.col(vec_col)).alias("__qv")
    )
    # map-only probe ranking (r19): see probe_cells
    probes = probe_cells(q, cents, n_probe, query_id_col)
    rank_w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_sim").desc(), F.col(id_col).asc()
    )
    return (
        coded.join(F.broadcast(probes), "cid")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col("__qv"), F.col("__de")), 6).alias("adc_sim"),
        )
        .withColumn("rank", F.row_number().over(rank_w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def kmeans_centroids_keyed(
    keyed: DataFrame,
    key_col: str,
    n_centroids: int = 8,
    iters: int = 1,
    dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "__sv",
    train_sample: int | None = None,
) -> DataFrame:
    """Grouped portable spherical k-means: one plan trains an
    INDEPENDENT codebook per ``key_col`` group over ``(key, id,
    vector)`` rows — identical math to :func:`kmeans_centroids` run
    per group (same seeded sample order via a per-key window instead
    of a global TakeOrdered, same 6-dp assignment cosine, same
    fixed-point LONG means), so consumers and oracles see the exact
    same centroid values. Exists because PQ's first formulation
    trained its ``m`` subspace codebooks as ``m`` SEQUENTIAL
    kmeans_centroids chains — m× the stages, m× the fixed per-plan
    cost, zero cross-subspace parallelism; here every per-round step
    is ONE shuffle keyed by (key, …) and the m trainings ride the
    same exchanges. Returns ``(key, cid, __ce)``."""
    c = keyed.select(
        F.col(key_col).alias("__k"),
        F.col(id_col),
        as_double(F.col(vec_col)).alias("__cv"),
    )
    seed_w = Window.partitionBy("__k").orderBy("__h", id_col)
    ranked = c.withColumn(
        "__h",
        F.pmod(
            F.pmod(F.col(id_col).cast("bigint"), F.lit(PORTABLE_SAMPLE_MOD))
            * F.lit(PORTABLE_SAMPLE_SALT),
            F.lit(PORTABLE_SAMPLE_MOD),
        ),
    ).withColumn("__srn", F.row_number().over(seed_w))
    cents = ranked.filter(F.col("__srn") <= n_centroids).select(
        "__k", F.col(id_col).alias("cid"), F.col("__cv").alias("__ce")
    )
    # Sampled training (the kmeans_centroids contract, per key): train
    # on the smallest-hash ``train_sample`` rows of EACH key group —
    # the seeds are a prefix of the same ordering, so seed ⊂ train by
    # construction. At real corpus size this bounds every Lloyd pass
    # (and the fixed-point LONG overflow argument) by a constant-size
    # sample per subspace instead of full passes over 10⁹ vectors.
    from pg2kafka_spark.operators.scale import spread_small_input

    # spread (same rationale as kmeans_centroids): the m-keyed Lloyd
    # passes otherwise run on the input's 1-split layout locally
    train = spread_small_input(
        ranked.filter(F.col("__srn") <= int(train_sample)).select(
            "__k", id_col, "__cv"
        )
        if train_sample is not None
        else c,
        key=id_col,
    )
    # r20: keyed analog of the array-state iteration in
    # kmeans_centroids — the per-key codebook array is the state, the
    # per-(key,cell) means collapse to ONE row (coalesce(1), no new
    # exchange) and fold into the prior arrays by expression, with
    # the identical empty-cell fallback and per-component arithmetic.
    carr = centroid_rows_to_array(cents, "__k")
    for _ in range(iters):
        # map-only argmax per key (r19; see kmeans_centroids): the
        # per-key codebook rides along as a broadcast array keyed by
        # __k, so the keyed training rows never shuffle for
        # assignment — previously the max_by aggregate exchanged one
        # full-slice row per (key, id) per pass.
        asg = train.join(F.broadcast(carr), "__k").select(
            "__k",
            id_col,
            "__cv",
            (-_best_cell(F.col("__cv"), F.col("__ca"))["ncid"]).alias(
                "cid"
            ),
        )
        sums = asg.groupBy("__k", "cid").agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(
                    F.round(F.col("__cv").getItem(i) * F.lit(1.0e9)).cast("bigint")
                ).alias(f"__s{i}")
                for i in range(dim)
            ],
        )
        # Attach each key's prior array via the SAME broadcast the
        # assignment already built (exchange-reused), collapse to one
        # partition (a single partition satisfies the per-key
        # clustering, so the groupBy adds NO exchange), and fold the
        # means into the prior arrays — identical arithmetic and
        # empty-cell fallback, one broadcast build per pass instead
        # of two. (Same empty-training-relation note as
        # kmeans_centroids.)
        carr = (
            sums.join(F.broadcast(carr), "__k")
            .coalesce(1)
            .groupBy("__k")
            .agg(
                F.first("__ca").alias("__pa"),
                F.collect_list(
                    F.struct(
                        F.col("cid"),
                        F.array(
                            *[
                                F.round(
                                    F.col(f"__s{i}").cast("double")
                                    / (F.col("__n").cast("double") * F.lit(1.0e9)),
                                    6,
                                )
                                for i in range(dim)
                            ]
                        ).alias("__me"),
                    )
                ).alias("__ma"),
            )
            .select(
                "__k",
                F.transform(
                    "__pa",
                    lambda c: F.struct(
                        c["cid"].alias("cid"),
                        F.coalesce(
                            F.get(
                                F.filter(
                                    "__ma", lambda m: m["cid"] == c["cid"]
                                ),
                                0,
                            )["__me"],
                            c["__ce"],
                        ).alias("__ce"),
                    ),
                ).alias("__ca"),
            )
        )
    cents = carr.select("__k", F.explode("__ca").alias("__c")).select(
        "__k",
        F.col("__c")["cid"].alias("cid"),
        F.col("__c")["__ce"].alias("__ce"),
    )
    return cents.withColumnRenamed("__k", key_col)


def pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    n_codes: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int | None = None,
) -> DataFrame:
    """Product-quantization codebooks: the vector space is split into
    ``m`` contiguous ``sub_dim``-dim subspaces and each gets its own
    :func:`kmeans_centroids` codebook (portable spherical k-means —
    same seeding, rounding, and fixed-point-mean discipline, so the
    training is oracle-checkable per subspace). Returns
    ``(m, cid, __ce)`` — ``m * n_codes`` rows, broadcastable at any
    corpus size (the whole point of PQ: the index stores
    ``m * log2(n_codes)`` bits per vector). ``train_sample`` bounds
    every subspace's Lloyd passes to the per-key smallest-hash prefix
    (same ids in all ``m`` subspaces) — pass it at real N so codebook
    training never full-scans.
    """
    # ONE posexplode pass emits every (subspace, id, slice) row, and
    # ONE keyed training plan fits all m codebooks together — the
    # r7 rewrite of m sequential kmeans_centroids chains (identical
    # values; see kmeans_centroids_keyed).
    subs = corpus.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.slice(
                        as_double(F.col(vec_col)), mi * sub_dim + 1, sub_dim
                    )
                    for mi in range(m)
                ]
            )
        ).alias("m", "__sv"),
    )
    cents = kmeans_centroids_keyed(
        subs, "m", n_codes, iters, sub_dim, id_col, "__sv", train_sample
    ).select(F.col("m").cast("int"), "cid", "__ce")
    from pg2kafka_spark.operators.dedup import _persist

    return _persist(cents)


def pq_reconstruct(
    corpus: DataFrame,
    cents: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ coding + reconstruction: every vector's ``m`` subspace
    slices argmax-coded against the broadcast codebooks, then the
    per-subspace centroids concatenated back — ``(id, __de)``, what
    the compressed index can know about each vector.

    r19 (guide §2.4): ONE map-only pass. The full codebook table
    (``m·n_codes`` rows) rides along as a broadcast one-row array;
    each row codes its ``m`` slices by per-subspace ``array_max`` on
    ``struct(rounded cosine, -cid, __ce)`` (identical (sim desc, cid
    asc) semantics as the old max_by) and concatenates in subspace
    order. The previous shape posexploded the corpus ×m and paid TWO
    full-corpus exchanges (the (id, m) coding aggregate and the id
    regroup); now the corpus never shuffles — and at 10⁹ vectors the
    removed exchanges carried the chosen centroid vectors, i.e. the
    whole reconstruction payload, twice. Shared by :func:`pq_topk`
    and :func:`ivf_pq_topk`."""
    from pg2kafka_spark.operators.scale import spread_small_input

    # spread: the m × n_codes coding cosines per row are the
    # full-corpus heavy stage (r14); no-op at scale
    return (
        spread_small_input(
            corpus.select(
                F.col(id_col), as_double(F.col(vec_col)).alias("__dv")
            ),
            key=id_col,
        )
        .crossJoin(F.broadcast(codebook_array(cents)))
        .select(
            F.col(id_col),
            pq_reconstruct_expr(m, sub_dim).alias("__de"),
        )
    )


def codebook_array(cents: DataFrame) -> DataFrame:
    """Collapse an ``(m, cid, __ce)`` codebook table to ONE row
    holding ``array<struct<m,cid,__ce>>`` (column ``__cb``) — the
    broadcast-attachable form :func:`pq_reconstruct_expr` consumes."""
    return cents.agg(
        F.collect_list(F.struct("m", "cid", "__ce")).alias("__cb")
    )


def pq_reconstruct_expr(m: int, sub_dim: int) -> Column:
    """Per-row PQ reconstruction over a staged ``__dv`` double-array
    column and an attached ``__cb`` codebook array: per subspace,
    argmax on struct(rounded cosine, -cid) keeps the winning centroid
    vector; the m winners concatenate in subspace order."""

    def best_sub(mi: int) -> Column:
        sub = F.slice(F.col("__dv"), mi * sub_dim + 1, sub_dim)
        cand = F.transform(
            F.filter(F.col("__cb"), lambda e: e["m"] == F.lit(mi)),
            lambda e: F.struct(
                F.round(cosine(sub, e["__ce"]), 6).alias("sim"),
                (-e["cid"]).alias("ncid"),
                e["__ce"].alias("ce"),
            ),
        )
        return F.array_max(cand)["ce"]

    return F.flatten(F.array(*[best_sub(mi) for mi in range(m)]))


def pq_codes_expr(m: int, sub_dim: int) -> Column:
    """Per-row PQ code WORDS over a staged ``__dv`` + attached
    ``__cb``: same per-subspace argmax as
    :func:`pq_reconstruct_expr` but keeps the winning code id —
    ``array<bigint>[m]`` in subspace order."""

    def best_code(mi: int) -> Column:
        sub = F.slice(F.col("__dv"), mi * sub_dim + 1, sub_dim)
        cand = F.transform(
            F.filter(F.col("__cb"), lambda e: e["m"] == F.lit(mi)),
            lambda e: F.struct(
                F.round(cosine(sub, e["__ce"]), 6).alias("sim"),
                (-e["cid"]).alias("ncid"),
            ),
        )
        return -F.array_max(cand)["ncid"]

    return F.array(*[best_code(mi) for mi in range(m)])


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    m: int = 8,
    sub_dim: int = 8,
    n_codes: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    train_sample: int | None = None,
) -> DataFrame:
    """Product-quantization top-k (Jégou et al., TPAMI'11; FAISS
    ``PQ8`` shape): each vector is coded as ``m`` codebook ids (here
    8×3 bits — a real deployment uses 8 bits/subspace; the shape is
    identical), reconstructed as the concatenation of its per-subspace
    centroids, and scored by asymmetric ADC — the query stays
    full-precision against the reconstruction the compressed index
    can know. Completes the ANN family: brute force (exact), LSH
    (seeded buckets), IVF (routing), SQ8 (scalar codes), IVF+SQ8, and
    now PQ (trained vector codes) — and like SQ8/IVF it is seedless,
    so the ENTIRE index, per-subspace training included, hash-checks
    against SQL.

    Scale shape: training touches the corpus ``m * iters`` times on
    ``sub_dim``-wide slices (column-pruned; use kmeans'
    ``train_sample`` discipline at real N); coding is ONE window
    argmax keyed by the unique ``(id, subspace)`` pair (uniform — a
    union-explode over subspaces, never ``m`` separate id-joins);
    reconstruction is one groupBy on the unique id; scoring is the
    brute-force plan (queries broadcast, WindowGroupLimit). The
    codebook table (``m * n_codes`` rows) broadcasts everywhere.
    """
    cents = pq_codebooks(
        corpus, m, sub_dim, n_codes, iters, id_col, vec_col, train_sample
    )
    recon = pq_reconstruct(corpus, cents, m, sub_dim, id_col, vec_col)
    q = queries.select(
        F.col(query_id_col), as_double(F.col(vec_col)).alias("__qv")
    )
    rank_w = Window.partitionBy(query_id_col).orderBy(
        F.col("pq_sim").desc(), F.col(id_col).asc()
    )
    return (
        recon.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col("__qv"), F.col("__de")), 6).alias("pq_sim"),
        )
        .withColumn("rank", F.row_number().over(rank_w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def knn_graph(
    corpus: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int | None = None,
) -> DataFrame:
    """Cell-restricted k-NN GRAPH over the whole corpus — every
    vector's top-``k`` cosine neighbours within its k-means cell:
    the primitive SemDeDup-style pruning, kNN-graph clustering, and
    diversity sampling all build on. Per-vector queries through
    :func:`brute_force_topk` would broadcast the entire corpus; the
    cell restriction bounds the quadratic to one cluster at a time
    (the same tractability argument as :func:`semantic_dedup`, and
    the same documented recall loss at cluster borders).

    Emits ``(vec_id, nbr_id, cos_sim, rank)``; vectors alone in their
    cell emit nothing. Deterministic and oracle-checkable: portable
    k-means cells, 6-dp-rounded cosine, ``(cos desc, nbr_id asc)``
    rank order — the grouped Arrow BLAS kernel hash-matches the SQL
    self-join twin exactly (the semantic_dedup precedent).

    Scale shape: one grouped-map task per cell, O(m²·dim) BLAS in
    cluster size m — size ``n_centroids ≈ N / target_cluster_size``
    and pass ``train_sample`` at real N.
    """
    cents = kmeans_centroids(
        corpus, n_centroids, iters, dim, id_col, vec_col, train_sample
    )
    c = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("__cv"))
    cells = assign_cells(c, cents, id_col)
    kk = int(k)

    def kernel(key, pdf):
        empty = pd.DataFrame(
            {
                "vec_id": pd.Series(dtype="int64"),
                "nbr_id": pd.Series(dtype="int64"),
                "cos_sim": pd.Series(dtype="float64"),
                "rank": pd.Series(dtype="int64"),
            }
        )
        m = len(pdf)
        if m < 2:
            return empty
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["__cv"]])
        # Sort rows/columns by id ascending once, so a STABLE row-wise
        # argsort on -cos breaks rounded-cosine ties by nbr_id asc —
        # the same (cos desc, id asc) order the old per-row lexsort
        # produced, but as ONE vectorized argsort over the cell matrix
        # instead of m Python-level lexsorts (r7 verdict nit).
        ord0 = np.argsort(ids, kind="stable")
        ids = ids[ord0]
        V = V[ord0]
        n = np.einsum("ij,ij->i", V, V)
        cos = np.round((V @ V.T) / np.sqrt(np.outer(n, n)), 6)
        np.fill_diagonal(cos, -np.inf)
        top = min(kk, m - 1)
        order = np.argsort(-cos, axis=1, kind="stable")[:, :top]
        return pd.DataFrame(
            {
                "vec_id": np.repeat(ids, top),
                "nbr_id": ids[order].ravel(),
                "cos_sim": np.take_along_axis(cos, order, axis=1).ravel(),
                "rank": np.tile(np.arange(1, top + 1, dtype=np.int64), m),
            }
        )

    return cells.groupBy("cid").applyInPandas(
        kernel, "vec_id bigint, nbr_id bigint, cos_sim double, rank bigint"
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    n_probe: int = 2,
    m: int = 8,
    sub_dim: int = 8,
    n_codes: int = 8,
    iters: int = 1,
    train_iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    train_sample: int | None = None,
) -> DataFrame:
    """IVF + PQ — the composed billion-vector index (FAISS
    ``IVFx,PQy`` routing shape): the coarse quantizer (portable
    k-means over the full vectors) routes each query to ``n_probe``
    inverted lists, and within the probed lists the corpus is scored
    by asymmetric ADC against its PQ reconstruction — the index
    stores ``m·log2(n_codes)`` bits + a cell id per vector. (PQ codes
    the raw vectors, not coarse residuals — both are standard; raw
    keeps every stage the already-hash-checked formulation, so the
    COMPOSED index stays fully oracle-checkable with no seeds.)

    Completes the family matrix: quantized_topk (SQ8 flat),
    ivf_sq8_topk (routed SQ8), pq_topk (PQ flat), and now routed PQ.

    Scale shape: coarse centroids AND codebooks broadcast (tiny);
    coding is the pq_reconstruct posexplode window; routing is the
    ivf probe join on cid — one cid-keyed exchange, zero extra
    shuffles over flat PQ. ``train_sample`` bounds BOTH trainers —
    the coarse quantizer and all ``m`` subspace codebooks — by the
    same smallest-hash sample, so at real corpus size no training
    stage makes a full pass (r7 verdict: previously the PQ side was
    the one remaining full-scan trainer in the index family).
    """
    from pg2kafka_spark.operators.dedup import _persist
    from pg2kafka_spark.operators.scale import spread_small_input

    coarse = kmeans_centroids(
        corpus, n_centroids, train_iters, dim, id_col, vec_col, train_sample
    )
    cents = pq_codebooks(
        corpus, m, sub_dim, n_codes, iters, id_col, vec_col, train_sample
    )
    # (id, cid, reconstruction) — the materialized IVF-PQ index.
    # r19: cell assignment and PQ reconstruction are BOTH per-row
    # functions of the broadcast models now, so the index builds in
    # ONE map pass over the corpus — previously recon ⋈ cells was an
    # id-keyed join, i.e. an exchange carrying every reconstruction.
    indexed = _persist(
        spread_small_input(
            corpus.select(
                F.col(id_col), as_double(F.col(vec_col)).alias("__dv")
            ),
            key=id_col,
        )
        .crossJoin(F.broadcast(centroid_rows_to_array(coarse)))
        .crossJoin(F.broadcast(codebook_array(cents)))
        .select(
            F.col(id_col),
            pq_reconstruct_expr(m, sub_dim).alias("__de"),
            (-_best_cell(F.col("__dv"), F.col("__ca"))["ncid"]).alias(
                "cid"
            ),
        )
    )
    q = queries.select(
        F.col(query_id_col), as_double(F.col(vec_col)).alias("__qv")
    )
    # map-only probe ranking (r19): see probe_cells
    probes = probe_cells(q, coarse, n_probe, query_id_col)
    rank_w = Window.partitionBy(query_id_col).orderBy(
        F.col("pq_sim").desc(), F.col(id_col).asc()
    )
    return (
        indexed.join(F.broadcast(probes), "cid")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col("__qv"), F.col("__de")), 6).alias("pq_sim"),
        )
        .withColumn("rank", F.row_number().over(rank_w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def prototypicality_prune(
    corpus: DataFrame,
    drop_frac_ppm: int = 250_000,
    n_centroids: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SSL-prototypes data pruning (Sorscher et al. 2022, "Beyond
    neural scaling laws", arXiv:2206.14486): rank every vector by its
    cosine to its cluster centroid and DROP the most prototypical
    ``drop_frac_ppm`` fraction per cluster — the easy, redundant core
    that contributes least to training, keeping the informative
    boundary examples. The complement of SemDeDup (which drops
    near-duplicate pairs); together they are the published two-step
    embedding-pruning recipe.

    Fully deterministic and oracle-checkable: clustering is the
    portable k-means, prototypicality is the 6-dp-rounded assignment
    cosine itself (no second scoring pass), the per-cluster rank
    breaks ties on id, and the integer cutoff is
    ``n_dropped = cluster_size * ppm div 1e6`` — pure integer math.

    Returns ``(id, cid, proto_sim, proto_rank, kept)`` for every row.

    Scale shape: the IVF assignment plan (broadcast centroids,
    map-only scoring) plus ONE window rank per cluster. Cluster
    counts come from a broadcast side-aggregate, so the window is the
    only cluster-keyed shuffle; with n_centroids sized for the corpus
    (10⁴–10⁵ at 100 TB) cluster partitions stay bounded.
    """
    cents = kmeans_centroids(
        corpus, n_centroids, iters, dim, id_col, vec_col
    )
    c = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("__cv"))
    cells = assign_cells(c, cents, id_col, keep_sim=True)
    w = Window.partitionBy("cid").orderBy(
        F.col("cell_sim").desc(), F.col(id_col).asc()
    )
    sizes = cells.groupBy("cid").agg(F.count(F.lit(1)).alias("__n"))
    ranked = (
        cells.withColumn("proto_rank", F.row_number().over(w))
        .join(F.broadcast(sizes), "cid")
        .withColumn(
            "__cut", F.expr(f"(__n * {int(drop_frac_ppm)}) div 1000000")
        )
    )
    return ranked.select(
        F.col(id_col),
        "cid",
        F.col("cell_sim").alias("proto_sim"),
        F.col("proto_rank").cast("long").alias("proto_rank"),
        (F.col("proto_rank") > F.col("__cut")).alias("kept"),
    )
