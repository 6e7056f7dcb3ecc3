"""Training-set assembly operators: deterministic stratified sampling
and sequence packing.

Nothing here exists in the reference (pg2kafka moves rows, it doesn't
curate corpora) — these are the north-star pipeline extras
(BASELINE.json; SURVEY.md §7 M5) that sit downstream of dedup/quality
in an LLM data pipeline. Both are pure column/window compositions: no
UDFs, no collect, deterministic under retries (a hash decides
sampling, not ``rand()`` — re-running a failed task keeps the same
rows, which matters when a 100 TB job loses executors)."""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    hash_col: Column,
    rates: Mapping[str, int],
    default_rate: int,
    mod: int = 100,
) -> DataFrame:
    """Keep rows where ``hash % mod`` falls under the stratum's rate
    (percent when ``mod=100``). Content-hash-driven: the sample is a
    pure function of the data, reproducible across runs/engines, and
    map-only (no shuffle — the filter runs inside the scan stage).

    ``rates`` maps stratum value → kept buckets; unlisted strata get
    ``default_rate``. Downsampling dominant strata (e.g. English) while
    keeping the tail is the standard corpus-balancing move.

    ``pmod`` (not ``%``): Spark's ``%`` keeps the dividend's sign, so
    a raw (signed) ``xxhash64`` would land half the rows in negative
    buckets that satisfy ``bucket < rate`` for EVERY stratum — a
    silent ~50% keep-everything bug. ``pmod`` keeps buckets in
    ``[0, mod)`` for any hash column.
    """
    rate: Column = F.lit(default_rate)
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(r)).otherwise(rate)
    return df.withColumn("bucket", F.pmod(hash_col, F.lit(mod))).filter(
        F.col("bucket") < rate
    )


def assign_packs(
    df: DataFrame,
    token_col: str,
    order_col: str,
    partition_cols: Sequence[str],
    budget: int,
) -> DataFrame:
    """Continuous-fill sequence packing: within each partition (e.g.
    source shard), documents in ``order_col`` order are laid end to
    end and ``pack_id = exclusive-prefix-sum(tokens) div budget`` —
    each pack holds ~``budget`` tokens (the last doc may straddle the
    boundary; a strict packer would split it at token level).

    One window sum per partition — the same shuffle shape as
    sessionization, so it scales as long as a single shard's docs fit
    a partition; shard wider upstream if not. Integer math throughout
    (no float prefix sums at 10^12-token scale).
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn(
            "__cum_before", F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("bigint")
        )
        .withColumn("pack_id", F.expr(f"__cum_before div {int(budget)}"))
        .drop("__cum_before")
    )


#: Knuth multiplicative salt for the portable keep/drop ordering —
#: same family as similarity.PORTABLE_SAMPLE_SALT; reduced mod 2^31-1
#: BEFORE multiplying so the product stays < 2^62 for any bigint id
#: (ANSI-mode overflow-safe, same fix as the k-means seeding).
MIX_SALT = 2654435761
MIX_MOD = (1 << 31) - 1


def mix_rebalance(
    df: DataFrame,
    strata_col: str,
    id_col: str = "doc_id",
    ppm: int = 1_000_000,
) -> DataFrame:
    """Data-dependent corpus mixing: compute per-stratum keep rates
    that rebalance the OBSERVED stratum counts toward a uniform
    target mix, then keep/drop each row by a deterministic portable
    hash of its id. Unlike ``stratified_hash_sample`` (caller-fixed
    rates), the rates here are derived from the data: each stratum's
    quota is ``total div n_strata`` rows and its keep rate is
    ``min(1, quota/count)`` in parts-per-million — over-represented
    sources are downsampled to the quota, under-represented ones kept
    whole (the standard mixing move before weighting epochs).

    All integer arithmetic (quota, ppm rate, hash bucket) so the
    decision is bit-identical on any engine — no float rates, no
    ``rand()`` (retry-safe on a 1000-executor job).

    Scale shape: stratum counts are one map-side-partial count on a
    tiny keyspace; the per-stratum rate table is a few rows and
    BROADCASTS back onto the corpus, so the keep/drop pass is
    map-only. Adding a rows-per-stratum floor/ceiling or non-uniform
    target weights changes only the rate expression.

    Returns the input plus ``rate_ppm`` and ``kept``.
    """
    rates = (  # the counts table is |strata| rows — global window is fine

        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "rate_ppm",
            F.least(
                F.lit(ppm),
                F.expr(f"((sum(__n) OVER () div count(__n) OVER ()) * {ppm}) div __n"),
            ),
        )
        .drop("__n")
    )
    bucket = (
        F.pmod(F.pmod(F.col(id_col), F.lit(MIX_MOD)) * F.lit(MIX_SALT), F.lit(MIX_MOD))
        % F.lit(ppm)
    )
    return df.join(F.broadcast(rates), strata_col).withColumn(
        "kept", bucket < F.col("rate_ppm")
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_ppk: int = 900,
    val_ppk: int = 50,
    mod: int = 1000,
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket =
    ``portable_int_hash(id) mod 1000``, then contiguous per-mille
    bands (default 900/50/50). Hash-driven for the same reasons as
    :func:`stratified_hash_sample` — reproducible across runs,
    engines, and executor retries (never ``rand()``), with the mixer
    (not an affine hash) guaranteeing bands are independent of id
    lattice structure so every stratum converges to the target
    proportions without per-stratum bookkeeping. Map-only: the
    assignment runs inside the scan stage at any scale."""
    from pg2kafka_spark.operators.sketch import portable_int_hash

    bucket = F.pmod(portable_int_hash(F.col(id_col)), F.lit(mod))
    split = (
        F.when(bucket < F.lit(train_ppk), F.lit("train"))
        .when(bucket < F.lit(train_ppk + val_ppk), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split_bucket", bucket).withColumn("split", split)


def per_key_cap(
    df: DataFrame,
    key_col: str,
    id_col: str,
    cap: int,
    n_salts: int = 32,
) -> DataFrame:
    """Keep at most ``cap`` rows per key, chosen by a deterministic
    content-hash order — the per-domain document cap every web-scale
    ingestion pipeline applies (a handful of template-heavy domains
    otherwise dominate the corpus; RefinedWeb/C4 cap them instead of
    trusting dedup to catch every variant).

    Exact salted two-phase top-``cap`` (the naive single window
    partitions by the KEY — domains are few and huge, so one task
    would sort an entire hot domain):

    1. rank inside (key, salt) where salt = mixer(id) mod
       ``n_salts``, keep rank <= cap — spreads a hot key over
       ``n_salts`` tasks; map-side the window input stays the raw
       scan, nothing is pre-aggregated;
    2. re-rank survivors inside key, keep rank <= cap — per key at
       most ``cap * n_salts`` rows reach this stage, so the hot
       partition is bounded by the CAP, not the corpus.

    Exactness: any row in a key's true top-``cap`` (by the global
    order) ranks <= cap within its salt bucket too, so phase 1 never
    drops it, and phase 2's rank over survivors equals the global
    rank for every emitted row (all globally-better rows also
    survived phase 1). The order is ``(mixer(id), id)`` — a total,
    engine-portable order, so the kept set is an unbiased fixed-size
    sample that is stable across runs, retries, and engines.
    """
    from pg2kafka_spark.operators.sketch import portable_int_hash

    h = portable_int_hash(F.col(id_col))
    salt = F.pmod(h, F.lit(int(n_salts)))
    w1 = Window.partitionBy(F.col(key_col), salt).orderBy(h, F.col(id_col))
    w2 = Window.partitionBy(key_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("__rk1", F.row_number().over(w1))
        .filter(F.col("__rk1") <= F.lit(int(cap)))
        .withColumn("key_rank", F.row_number().over(w2))
        .filter(F.col("key_rank") <= F.lit(int(cap)))
        .drop("__rk1")
    )


def strict_pack_spans(
    df: DataFrame,
    token_col: str,
    order_col: str,
    partition_cols: Sequence[str],
    budget: int,
) -> DataFrame:
    """Strict token-level sequence packing — the exact formulation
    :func:`assign_packs` documents as its simplification: documents
    are laid end to end per partition and EVERY pack holds exactly
    ``budget`` tokens (except the partition's last), so a document
    that straddles a boundary is SPLIT and emits one span row per
    pack it touches. This is what a training dataloader actually
    consumes: (pack, position, length) slices, not whole-doc
    assignments.

    Pure integer algebra: with ``s`` = exclusive prefix sum of
    tokens and ``n`` = the doc's tokens, the doc covers packs
    ``s div B .. (s+n-1) div B``; the per-pack span is the overlap of
    ``[s, s+n)`` with ``[p*B, (p+1)*B)``. One window prefix-sum per
    partition (the sessionization shuffle shape) + a map-only
    bounded explode (a doc touches at most ``n div B + 2`` packs, so
    the fan-out is ~``total_tokens / budget`` rows corpus-wide — the
    same cardinality as the output a dataloader needs).

    Emits ``pack_id`` (per partition), ``doc_id`` order column,
    ``doc_tok_start`` (offset of the span within the document),
    ``pack_tok_start`` (offset within the pack), and ``span_tokens``;
    spans of one doc concatenated across packs reconstruct the doc,
    and per-pack span sums hit exactly ``budget`` — both properties
    are what the tests pin.
    """
    b = int(budget)
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = F.col(token_col).cast("long")
    staged = df.withColumn(
        "__s", F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    ).filter(n > 0)
    first_pack = F.expr(f"__s div {b}")
    last_pack = F.expr(f"(__s + {token_col} - 1) div {b}")
    packs = F.sequence(first_pack, last_pack)
    e = staged.select(
        *partition_cols,
        order_col,
        n.alias("__n"),
        F.col("__s"),
        F.explode(packs).alias("pack_id"),
    )
    p_lo = F.col("pack_id") * b
    span_lo = F.greatest(F.col("__s"), p_lo)
    span_hi = F.least(F.col("__s") + F.col("__n"), p_lo + b)
    return e.select(
        *partition_cols,
        "pack_id",
        order_col,
        (span_lo - F.col("__s")).alias("doc_tok_start"),
        (span_lo - p_lo).alias("pack_tok_start"),
        (span_hi - span_lo).alias("span_tokens"),
    )


def weighted_sample_topn(
    df: DataFrame,
    weight: Column,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement: keep the
    ``n`` rows with the smallest ``hash(id) // weight`` — the
    integer-exact cousin of weighted reservoir sampling (Efraimidis &
    Spirakis A-Res keys ``u^(1/w)``: with ``u = hash/M`` uniform the
    ``hash/w`` key is NOT the A-Res key, so pairwise pick odds are
    only approximately ``w_i/(w_i+w_j)``; in the small ``n/N``
    sampling-fraction regime, inclusion probability ≈ ``t·w_i`` for
    threshold ``t`` — weight-proportional where it matters, with
    heavy items saturating early as the fraction grows), with the
    same portable multiplicative hash every sampler here uses (plus
    an additive pre-salt so ``id ≡ 0 (mod M)`` doesn't hash to the
    always-sampled key 0), so the EXACT sample is a pure function of
    the data — reproducible across engines, retries, and executors
    (no rand(), no float keys: the sort key is a BIGINT floor
    quotient, and ``id`` breaks ties).

    The standard move for token-budget corpus assembly: pass
    ``weight = n_tokens`` to sample documents proportional to their
    token count so the EXPECTED token mass, not the doc count, hits
    the budget.

    Scale shape: the key is map-only; top-n is TakeOrderedAndProject
    (per-partition bounded heaps — no global sort at any corpus
    size). Zero-or-negative weights are excluded outright (a weight
    of 0 must never be sampled; guarding here keeps the division
    ANSI-safe too).
    """
    from pg2kafka_spark.operators.similarity import (
        PORTABLE_SAMPLE_MOD,
        PORTABLE_SAMPLE_OFFSET,
        PORTABLE_SAMPLE_SALT,
    )

    h = F.pmod(
        (
            F.pmod(F.col(id_col).cast("bigint"), F.lit(PORTABLE_SAMPLE_MOD))
            + F.lit(PORTABLE_SAMPLE_OFFSET)
        )
        * F.lit(PORTABLE_SAMPLE_SALT),
        F.lit(PORTABLE_SAMPLE_MOD),
    )
    key = F.expr(f"__wsh div __wsw")
    return (
        df.withColumn("__wsw", weight.cast("bigint"))
        .filter(F.col("__wsw") > 0)
        .withColumn("__wsh", h)
        .withColumn("sample_key", key)
        .orderBy(F.col("sample_key").asc(), F.col(id_col).asc())
        .limit(n)
        .drop("__wsw", "__wsh")
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    target_rows: int,
    id_col: str = "doc_id",
    n_salts: int = 32,
) -> DataFrame:
    """Square-root temperature source mixing (the mBERT/XLM-R
    exponent-smoothed sampling, alpha = 0.5): each stratum's quota of
    the ``target_rows`` budget is proportional to ``sqrt(n_s)`` —
    large sources are downweighted, the tail is boosted, the published
    fix for multilingual/ multi-source corpora where proportional
    sampling drowns low-resource strata (Devlin et al. 2019 mBERT
    notes; Conneau et al. 2020 XLM-R §3).

    Integer-exact and engine-portable end to end: ``sqrt`` over an
    integer count is correctly rounded by IEEE-754 (bit-identical on
    any engine — the reason alpha is fixed at 0.5; a general alpha
    needs exp/ln, which is NOT exactly rounded), the weight is
    ``floor(sqrt(n_s)·1e6)`` as BIGINT, the quota is
    ``target_rows·w_s div SUM(w)`` (pure integer — quotas sum to at
    most ``target_rows``, short by at most n_strata rounding rows),
    and WHICH rows fill a quota is the portable content-hash order
    (``portable_int_hash(id), id``) — reproducible across runs,
    retries, and engines.

    Scale shape: stratum counts are one map-side-partial agg on a
    tiny keyspace; the quota table broadcasts; the per-stratum
    top-quota runs the exact salted two-phase rank of
    :func:`per_key_cap` (a hot source never concentrates in one
    task — phase 2 sees at most ``quota·n_salts`` rows per key...
    bounded by the QUOTA, not the corpus).

    Emits kept rows: ``(id, stratum, n_stratum, quota, key_rank)``.
    """
    from pg2kafka_spark.operators.sketch import portable_int_hash

    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_stratum"))
    quotas = (
        counts.withColumn(
            "__w",
            F.floor(F.sqrt(F.col("n_stratum").cast("double")) * F.lit(1.0e6))
            .cast("bigint"),
        )
        .withColumn(
            "quota",
            F.expr(f"(CAST({int(target_rows)} AS BIGINT) * __w)"
                   " div (sum(__w) OVER ())"),
        )
        .drop("__w")
    )
    h = portable_int_hash(F.col(id_col))
    salt = F.pmod(h, F.lit(int(n_salts)))
    w1 = Window.partitionBy(F.col(strata_col), salt).orderBy(h, F.col(id_col))
    w2 = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    return (
        df.select(id_col, strata_col)
        .join(F.broadcast(quotas), strata_col)
        .withColumn("__rk1", F.row_number().over(w1))
        .filter(F.col("__rk1") <= F.col("quota"))
        .withColumn("key_rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("key_rank") <= F.col("quota"))
        .drop("__rk1")
    )


def training_order_assign(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    ``(shard, position)`` — shard by the portable content hash,
    position by ``(hash, id)`` rank within the shard. The standard
    final pipeline step before writing training shards: the order is
    pseudo-random w.r.t. any natural key (source, time, layout) yet a
    PURE FUNCTION of the data, so re-running the pipeline (or losing
    an executor mid-write) reproduces the identical epoch order —
    ``rand()`` ordering silently reshuffles on every retry.

    Scale shape: the shard key is a uniform hash residue, so the
    single exchange is balanced by construction (no hot shard); the
    per-shard rank is a window over ~N/n_shards rows — size
    ``n_shards`` so a shard fits one task (the same knob as the
    shard file size). No global sort ever materializes: position is
    per-shard, and shards are independent.

    Emits every row: ``(id, shard, position)``.
    """
    from pg2kafka_spark.operators.sketch import portable_int_hash

    h = portable_int_hash(F.col(id_col))
    shard = F.pmod(h, F.lit(int(n_shards)))
    w = Window.partitionBy(shard).orderBy(h, F.col(id_col))
    return df.select(
        F.col(id_col),
        shard.cast("long").alias("shard"),
        F.row_number().over(w).cast("long").alias("position"),
    )


def source_epoch_allocation(
    df: DataFrame,
    token_budget: int,
    max_epochs: int = 4,
    strata_col: str = "source",
    token_count_col: Column | None = None,
) -> DataFrame:
    """Data-constrained epoch allocation (Muennighoff et al. 2023,
    "Scaling Data-Constrained Language Models", arXiv:2305.16264:
    repeating unique data up to ~4 epochs costs almost nothing, so a
    token budget above the unique-token supply should be filled by
    REPETITION, bounded by ``max_epochs``): every source contributes
    ``full_epochs = min(max_epochs, budget div Σtokens)`` whole
    epochs of its unique tokens, and the remaining budget is split
    one level deeper — ``extra_s = rem · tokens_s div Σtokens``, a
    proportional partial epoch. If the budget exceeds
    ``max_epochs · Σtokens`` the surplus is reported unused (the
    data-constrained regime's actual message: go find more data).

    Pure integer arithmetic on exact token counts — the plan every
    pretraining run starts from, auditable and engine-portable (no
    float shares; allocations sum to ≤ budget by construction with a
    per-source remainder of < 1 token-share each).

    Scale shape: one map-side-partial aggregation onto the tiny
    source keyspace, then window totals over that |sources|-row
    frame — nothing returns to the corpus.

    Emits per source: ``(stratum, n_docs, n_tokens, full_epochs,
    extra_tokens, total_tokens)``.
    """
    from pg2kafka_spark.operators.text import token_count

    tok = (
        token_count_col
        if token_count_col is not None
        else token_count(F.col("text"))
    )
    per = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tok.cast("bigint")).alias("n_tokens"),
    )
    total = F.sum("n_tokens").over(Window.partitionBy())
    b = F.lit(int(token_budget)).cast("bigint")
    # full epochs shared by every source; remainder split proportionally
    out = (
        per.withColumn("__tot", total)
        .withColumn(
            "full_epochs",
            F.least(
                F.lit(int(max_epochs)).cast("bigint"),
                F.expr(f"CAST({int(token_budget)} AS BIGINT) div __tot"),
            ),
        )
        .withColumn(
            "__rem",
            F.greatest(
                F.lit(0).cast("bigint"),
                b - F.col("full_epochs") * F.col("__tot"),
            ),
        )
        .withColumn(
            "extra_tokens",
            F.when(
                F.col("full_epochs") >= F.lit(int(max_epochs)),
                F.lit(0).cast("bigint"),
            ).otherwise(F.expr("(__rem * n_tokens) div __tot")),
        )
        .withColumn(
            "total_tokens",
            F.col("n_tokens") * F.col("full_epochs") + F.col("extra_tokens"),
        )
    )
    return out.select(
        strata_col,
        "n_docs",
        "n_tokens",
        "full_epochs",
        "extra_tokens",
        "total_tokens",
    )
