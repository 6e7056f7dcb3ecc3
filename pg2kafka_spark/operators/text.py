"""Text-analysis operators for large-scale training-data pipelines:
tokenization, quality scoring, language-ID heuristic, fingerprinting,
shingling. (BASELINE.json north-star extras beyond the reference's own
surface — SURVEY.md §7 M5.)

All pure column expressions (whole-stage codegen, zero shuffles, zero
UDFs): at 100 TB every per-document feature here is a map-only pass
that preserves input partitioning.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window, functions as F

# Marker tokens per language for the n-gram/stopword-hit heuristic.
# Deliberately tiny: real language ID would load fastText-style
# profiles; the heuristic shape (per-language hit counts → argmax) is
# what matters for the pipeline.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "scan", "table"),
    "es": ("data", "row", "query", "filter"),
    "de": ("join", "merge", "stream", "window"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (documents.text is space-separated)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def unique_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def type_token_ratio(text: Column) -> Column:
    """Lexical diversity: unique/total tokens (a standard quality
    signal; near-zero for boilerplate/spam)."""
    return unique_token_count(text) / token_count(text)


def normalized_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse runs of
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text. Exact-dup
    detection key; 128-bit so collision-free at any realistic corpus
    size."""
    return F.md5(normalized_text(text))


def bag_of_words_fingerprint(text: Column) -> Column:
    """Order-insensitive fingerprint: md5 of the sorted token list —
    catches token-permutation near-dups exactly."""
    return F.md5(F.concat_ws(" ", F.array_sort(tokens(text))))


def shingles(toks: Column, n: int = 3) -> Column:
    """Token n-gram shingles (contiguous windows joined by a space).

    1-based starts 1..size-n+1; documents shorter than ``n`` tokens
    yield NULL (dropped by ``explode``/``aggregate`` downstream) —
    matching the oracle formulation, which emits no shingles for
    sub-``n``-token documents.
    """
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    )


#: Tiny fixed stopword list for ratio features (the heuristic shape is
#: what matters; a real pipeline loads a per-language list).
STOPWORDS: tuple[str, ...] = ("the", "a", "and", "of", "to", "in", "is", "on")

#: BPE-ish pre-tokenizer: letter runs | digit runs | single
#: non-alphanumeric marks. Kept to character classes that behave
#: identically under Java regex (Spark) and RE2-ish engines (oracle).
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

#: Rolling-hash parameters: base 131 polynomial over code points,
#: modulus 2^31-1 (keeps every intermediate < 2^39 — exact in int64
#: on any engine).
ROLLING_BASE = 131
ROLLING_MOD = (1 << 31) - 1


def bpe_token_count(text: Column) -> Column:
    """Sub-word-style token count: number of BPE-ish pre-tokens (the
    regex above). Proxy for LLM token budgeting — whitespace tokens
    undercount code/punctuation-heavy text."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0))


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars — boilerplate/spam signal.

    try_divide: under Spark 4's default ANSI mode a zero-length
    document would raise DIVIDE_BY_ZERO and kill the whole job;
    NULL-for-empty matches DuckDB's divide-by-zero result, so the
    oracle comparison holds on degenerate corpora too."""
    return F.try_divide(
        F.length(F.regexp_replace(text, r"[^.,!?;:]", "")), F.length(text)
    )


def stopword_ratio(text: Column) -> Column:
    """Stopword tokens / total tokens — near-zero for keyword-stuffed
    or non-natural text, another standard cheap quality gate.
    try_divide for the same ANSI DIVIDE_BY_ZERO reason as
    ``punct_ratio`` (split("", " ") yields [""] so the count is ≥ 1
    today, but a tokenizer change must not turn empty docs into a
    job-killer)."""
    toks = tokens(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.try_divide(
        F.size(F.filter(toks, lambda t: F.array_contains(sw, t))), F.size(toks)
    )


def rolling_hash(text: Column) -> Column:
    """Polynomial rolling-hash fingerprint of the normalized text:
    ``h = fold(h*131 + codepoint) mod 2^31-1``. Order-sensitive like
    md5 but incrementally maintainable (a CDC consumer can extend it
    per appended chunk without re-reading the document)."""
    codes = F.transform(F.split(normalized_text(text), ""), lambda ch: F.ascii(ch))
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, c: F.pmod(acc * ROLLING_BASE + c, F.lit(ROLLING_MOD)),
    )


def language_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit counts over the token stream."""
    toks = tokens(text)
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        scores[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
    return scores


def predict_language(text: Column) -> Column:
    """Argmax of marker hits (ties broken by fixed language order:
    en > es > de), 'und' when nothing matched."""
    s = language_scores(text)
    return (
        F.when((s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] > 0), F.lit("en"))
        .when((s["es"] >= s["de"]) & (s["es"] > 0), F.lit("es"))
        .when(s["de"] > 0, F.lit("de"))
        .otherwise(F.lit("und"))
    )


def with_quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append standard quality columns; keeps the plan map-only."""
    t = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(t))
        .withColumn("n_uniq_tokens", unique_token_count(t))
        .withColumn("ttr", type_token_ratio(t))
        .withColumn("mean_token_len", (F.length(t) - F.col("n_tokens") + 1) / F.col("n_tokens"))
    )


# ---------------------------------------------------------------------------
# PII redaction (training-data hygiene)
# ---------------------------------------------------------------------------

#: Redaction patterns, ordered (emails before phones: an address's
#: digit runs must not be half-eaten by the phone pattern first).
#: Kept to constructs Java regex (Spark) and RE2 (DuckDB) interpret
#: identically: character classes, bounded quantifiers, \b — no
#: lookaround, no backreferences.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("phone", r"\+?[0-9][0-9()\-. ]{7,}[0-9]"),
)


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII pattern — ``split`` length minus one,
    the formulation both engines evaluate identically (regexp_count
    exists in Spark 4 but not in every oracle dialect)."""
    pat = dict(PII_PATTERNS)[kind]
    return (F.size(F.split(text, pat)) - 1).cast("long")


def redact_pii(text: Column, token: str = "<PII>") -> Column:
    """Replace every PII match with ``token`` — chained
    ``regexp_replace`` in PII_PATTERNS order, one streaming pass per
    pattern, map-only (the standard pre-training scrub stage). The
    pattern list is deliberately high-precision/modest-recall: at
    100 TB a false positive deletes real data silently, while missed
    PII is caught by the dedicated downstream audit."""
    out = text
    for _, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def unigram_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_lo: int = 4_880_000,
    keep_hi: int = 4_920_000,
) -> DataFrame:
    """CCNet-style language-model quality gate with a corpus-trained
    unigram LM (Wenzek et al. 2020, arXiv:1911.00359, use a LM over
    the corpus and keep the middle of the perplexity distribution:
    too-predictable = templated/repetitive, too-surprising = garbage).

    Scoring is the document's mean token surprisal −log2 p(token)
    under the corpus's own unigram distribution, carried in FIXED-
    POINT MICRO-BITS: each token contributes
    ``round(ln(T/c)/ln(2)·1e6)`` as a BIGINT (T = corpus token count,
    c = token count), summed exactly per document — the one float op
    (a log per DISTINCT token) happens before the sum, so the
    aggregate is order-independent and engine-portable (same
    discipline as tfidf's integer idf surrogate; a double sum of
    per-token logs would be partition-order-dependent).

    Returns ``(id, n_tokens, mean_surprisal_microbits, kept)`` where
    ``kept`` bands the mean into [keep_lo, keep_hi] micro-bits.

    Scale shape: one uniform-key shuffle to count terms, one
    broadcast of the 1-row corpus total, one uniform-key shuffle to
    re-aggregate per document — the tf-idf plan. The unigram "model"
    never materializes on the driver.
    """
    import math

    from pg2kafka_spark.operators.scale import spread_small_input

    # r20: spread the (id, text) projection by id before tokenizing —
    # the O(chars) tokenize+explode otherwise runs inside the serial
    # single-row-group scan task (guide §2.5); keyed hash spread, no
    # sortBeforeRepartition, identity at scale.
    tok = spread_small_input(
        docs.select(id_col, text_col), key=id_col
    ).select(
        F.col(id_col), F.explode(tokens(normalized_text(F.col(text_col)))).alias("term")
    )
    cnt = tok.groupBy("term").agg(F.count(F.lit(1)).alias("__c"))
    # total token count derived from the count table (Σ__c ≡ count of
    # tok rows, exactly) instead of re-tokenizing the corpus for one
    # scalar — drops a full tokenize+explode pass (r19, guide §1.2);
    # same idiom as `vocabulary`'s tot
    tot = cnt.agg(F.sum("__c").alias("__t"))
    sbits = F.round(
        F.log(F.col("__t").cast("double") / F.col("__c")) / math.log(2.0) * 1e6
    ).cast("bigint")
    per_doc = (
        tok.join(cnt, "term")
        .crossJoin(F.broadcast(tot))
        .select(F.col(id_col), sbits.alias("__sb"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("__sb").alias("__s"))
    )
    mean = F.expr("__s div n_tokens")
    return per_doc.select(
        F.col(id_col),
        "n_tokens",
        mean.alias("mean_surprisal_microbits"),
        mean.between(F.lit(keep_lo), F.lit(keep_hi)).alias("kept"),
    )


def chunk_token_windows(
    docs: DataFrame,
    window: int = 64,
    stride: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token windows — the standard
    context-length chunking step before tokenize-and-pack (stride <
    window gives the half-window overlap RAG/pretraining chunkers use
    so no span is ever split across a boundary without a copy that
    contains it whole).

    Map-only: tokenize once, explode the start offsets
    (``sequence(0, n−1, stride)``), slice per start — no shuffle, no
    UDF; at 100 TB the expansion factor is bounded by
    ``⌈window/stride⌉`` and the op runs inside the scan stage.

    Returns ``(id, chunk_idx, start_idx, n_chunk_tokens,
    chunk_text)``; ``chunk_idx`` is the 0-based window ordinal.
    """
    toks = tokens(normalized_text(F.col(text_col)))
    n = F.size(F.col("__toks"))
    return (
        docs.select(F.col(id_col), toks.alias("__toks"))
        .filter(n > 0)
        .select(
            F.col(id_col),
            "__toks",
            F.explode(
                F.sequence(F.lit(0), n - F.lit(1), F.lit(stride))
            ).alias("start_idx"),
        )
        .select(
            F.col(id_col),
            F.expr(f"start_idx div {stride}").alias("chunk_idx"),
            "start_idx",
            F.slice(F.col("__toks"), F.col("start_idx") + 1, window).alias("__chunk"),
        )
        .select(
            F.col(id_col),
            "chunk_idx",
            "start_idx",
            F.size("__chunk").alias("n_chunk_tokens"),
            F.array_join("__chunk", " ").alias("chunk_text"),
        )
    )


def bigram_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_lo: int = 4_800_000,
    keep_hi: int = 5_000_000,
) -> DataFrame:
    """Bigram-LM quality gate — the conditional-probability upgrade of
    :func:`unigram_surprisal` (CCNet's actual filter is a 5-gram
    KenLM; a corpus-trained bigram with add-one smoothing is the same
    shape one order up: templated text now scores low because its
    TRANSITIONS are predictable, not just its vocabulary).

    Per-token surprisal is ``−log2 P(w_i | w_{i−1})`` with
    ``P = (c2+1) / (c1+V)`` (``c2`` bigram count, ``c1`` unigram
    count of the context, ``V`` vocabulary size), carried in the same
    fixed-point micro-bit BIGINTs as the unigram gate: the single
    float op (one log per joined row, on a ratio of exact integers)
    happens before the sum, so the per-doc aggregate is
    order-independent and engine-portable.

    Documents with fewer than 2 tokens have no bigrams and are
    absent (the shingle rule).

    Scale shape: two uniform-key count shuffles (bigrams + unigrams),
    a 1-row vocab total broadcast, then one uniform-key per-doc
    re-aggregation — the tf-idf plan one order up. The bigram table
    IS the model; it never materializes on the driver.
    """
    import math

    from pg2kafka_spark.operators.scale import spread_small_input

    toks = tokens(normalized_text(F.col(text_col)))
    # r20: spread the (id, text) projection by id before tokenizing —
    # BOTH consumers (unigram + bigram explode) re-run the tokenize
    # from the scan, and unspread each pass sat in the serial
    # single-row-group scan task (event log: two wall==cpu==max-task
    # jobs of 0.60 s and 0.47 s per rep). The shared spread exchange
    # is runtime-reused; identity at scale (guide §2.5).
    base = spread_small_input(
        docs.select(id_col, text_col), key=id_col
    ).select(F.col(id_col), toks.alias("__tk"))
    uni = base.select(F.col(id_col), F.explode(F.col("__tk")).alias("term"))
    c1 = uni.groupBy("term").agg(F.count(F.lit(1)).alias("__c1"))
    # |vocab| derived from the count table (rows of c1 ≡ countDistinct
    # over uni, exactly) instead of re-tokenizing the corpus plus a
    # distinct shuffle for one scalar (r19, guide §1.2)
    v = c1.agg(F.count(F.lit(1)).alias("__v"))
    bg = base.filter(F.size("__tk") >= 2).select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__tk") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("__tk"), i).alias("w1"),
                    F.concat_ws(
                        " ",
                        F.element_at(F.col("__tk"), i),
                        F.element_at(F.col("__tk"), i + 1),
                    ).alias("b"),
                ),
            )
        ).alias("__p"),
    ).select(id_col, F.col("__p.w1").alias("w1"), F.col("__p.b").alias("b"))
    c2 = bg.groupBy("b").agg(F.count(F.lit(1)).alias("__c2"))
    sbits = F.round(
        F.log(
            (F.col("__c1") + F.col("__v")).cast("double")
            / (F.col("__c2") + F.lit(1))
        )
        / math.log(2.0)
        * 1e6
    ).cast("bigint")
    per_doc = (
        bg.join(c2, "b")
        .join(c1, F.col("w1") == F.col("term"))
        .crossJoin(F.broadcast(v))
        .select(F.col(id_col), sbits.alias("__sb"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("__sb").alias("__s"))
    )
    mean = F.expr("__s div n_bigrams")
    return per_doc.select(
        F.col(id_col),
        "n_bigrams",
        mean.alias("mean_surprisal_microbits"),
        mean.between(F.lit(keep_lo), F.lit(keep_hi)).alias("kept"),
    )


def dsir_importance_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023,
    arXiv:2302.03169: select pretraining data by importance
    resampling toward a target domain): each document's weight is its
    mean per-token log-likelihood RATIO between an add-one-smoothed
    unigram model of the ``target`` slice and one of the full corpus
    — positive means "looks more like the target than like the
    corpus average". Carried in the fixed-point micro-bit discipline
    of :func:`unigram_surprisal`: one float log per joined row on
    ratios of exact integers, rounded to BIGINT micro-bits BEFORE the
    order-independent sum, so the weights are engine-portable.

    ``log2 p_t(w) − log2 p_c(w) = log2((c_t+1)/(T_t+V)) −
    log2((c_c+1)/(T_c+V))`` with a SHARED vocabulary V (the union
    vocab — tokens absent from the target get smoothed mass, which is
    the whole point: unseen-in-target tokens get negative weight).

    Downstream, keep via hash-thresholding against the weight band
    (same retry-safe pattern as ``stratified_hash_sample``) — the
    resampling step is a filter, not new machinery.

    Scale shape: two unigram count shuffles (target is typically a
    small quality slice — its count table broadcasts), one 1-row
    totals broadcast, one per-doc re-aggregation on the uniform id
    key. The tf-idf plan with a second count table.
    """
    import math

    from pg2kafka_spark.operators.scale import spread_small_input

    # r20: keyed spread before the serial-scan tokenize (guide §2.5)
    tok_all = spread_small_input(
        docs.select(id_col, text_col), key=id_col
    ).select(
        F.col(id_col),
        F.explode(tokens(normalized_text(F.col(text_col)))).alias("term"),
    )
    tok_t = target.select(
        F.explode(tokens(normalized_text(F.col(text_col)))).alias("term")
    )
    cc = tok_all.groupBy("term").agg(F.count(F.lit(1)).alias("__cc"))
    ct = tok_t.groupBy("term").agg(F.count(F.lit(1)).alias("__ct"))
    # FULL outer: V must be the true union vocabulary — a LEFT join
    # dropped target-only tokens from both V and T_t, silently wrong
    # for a disjoint target corpus (round-7 advice fix; identical
    # results when target ⊆ docs, as in the registered query, since
    # the right-only side is then empty).
    counts = cc.join(ct, "term", "full").select(
        "term",
        F.coalesce(F.col("__cc"), F.lit(0)).alias("__cc"),
        F.coalesce(F.col("__ct"), F.lit(0)).alias("__ct"),
    )
    tots = (
        counts.agg(
            F.sum("__cc").alias("__tc"),
            F.sum("__ct").alias("__tt"),
            F.count(F.lit(1)).alias("__v"),
        )
    )
    lr_bits = F.round(
        (
            F.log(
                (F.col("__ct") + 1).cast("double")
                / (F.col("__tt") + F.col("__v"))
            )
            - F.log(
                (F.col("__cc") + 1).cast("double")
                / (F.col("__tc") + F.col("__v"))
            )
        )
        / math.log(2.0)
        * 1e6
    ).cast("bigint")
    per_doc = (
        tok_all.join(counts, "term")
        .crossJoin(F.broadcast(tots))
        .select(F.col(id_col), lr_bits.alias("__lr"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("__lr").alias("__s"))
    )
    # FLOOR division, explicitly: likelihood-ratio sums are routinely
    # NEGATIVE, where trunc and floor differ by one — and BOTH Spark's
    # `div` AND DuckDB's `//` truncate toward zero (measured), so the
    # surprisal queries' `div` idiom would work here only by accident
    # of sign. floor(double-div) is exact for |sum| < 2^53 (micro-bit
    # sums are ~5e6 per token — fine to ~10^9-token documents) and the
    # oracle spells the identical floor.
    return per_doc.select(
        F.col(id_col),
        "n_tokens",
        F.floor(F.col("__s") / F.col("n_tokens"))
        .cast("bigint")
        .alias("mean_lr_microbits"),
    )


def dsir_resample(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    base_rate: int = 50,
    microbits_per_point: int = 20_000,
) -> DataFrame:
    """The resampling step DSIR exists for (Xie et al. 2023 §3:
    sample the pretraining corpus with probability increasing in the
    importance weight): documents are kept by hash-thresholding
    against a weight-derived rate — ``rate = clamp(base_rate +
    weight // microbits_per_point, 0, 100)`` percent, so a doc 1 bit
    more target-like than corpus-average (+1e6 micro-bits) gains
    ``1e6 / microbits_per_point`` points of keep probability.

    Deterministic and engine-portable end to end: the weight is the
    fixed-point :func:`dsir_importance_weights` integer, the rate is
    integer arithmetic (floor division toward −∞ on a possibly
    NEGATIVE weight — ``F.floor`` of the exact double quotient, the
    same discipline as the weight's own mean), and the coin is the
    portable multiplicative id-hash used by every sampler here —
    reruns and engines agree on the EXACT kept set, which is what
    makes the step auditable (the whole point of hash-thresholding
    over RNG sampling in a retried pipeline).

    Scale shape: the weight join is the DSIR plan; the keep decision
    adds one map-only projection. Emits every doc with its
    ``(mean_lr_microbits, keep_rate, kept)`` verdict.
    """
    from pg2kafka_spark.operators.similarity import (
        PORTABLE_SAMPLE_MOD,
        PORTABLE_SAMPLE_SALT,
    )

    w = dsir_importance_weights(docs, target, id_col, text_col)
    rate = F.greatest(
        F.lit(0),
        F.least(
            F.lit(100),
            F.lit(base_rate)
            + F.floor(
                F.col("mean_lr_microbits")
                / F.lit(float(microbits_per_point))
            ).cast("bigint"),
        ),
    )
    # Reduce mod M BEFORE mod 100: ``(id·SALT) mod 100`` collapses to
    # a fixed permutation of the id's low decimal digits (SALT mod 100
    # times id mod 100), so structured id spaces (all-even, strided)
    # cover only a subset of residues; the inner mod-M reduction makes
    # the coin actually mix (r7 ADVICE).
    coin = F.pmod(
        F.pmod(
            F.pmod(F.col(id_col).cast("bigint"), F.lit(PORTABLE_SAMPLE_MOD))
            * F.lit(PORTABLE_SAMPLE_SALT),
            F.lit(PORTABLE_SAMPLE_MOD),
        ),
        F.lit(100),
    )
    return w.select(
        F.col(id_col),
        "mean_lr_microbits",
        rate.alias("keep_rate"),
        (coin < rate).alias("kept"),
    )


def surprisal_band_fit(
    docs: DataFrame,
    lo_q_pct: int = 25,
    hi_q_pct: int = 75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Percentile-FIT surprisal gate: instead of the fixture-tuned
    fixed band of :func:`unigram_surprisal`, the keep band is the
    corpus's own [P25, P75] of mean surprisal — the actual CCNet
    recipe (Wenzek et al. 2020 keep the middle perplexity tertiles of
    the corpus distribution, re-fit per corpus).

    The cuts are DISCRETE order statistics, not interpolated
    quantiles: value at 0-indexed rank ``(n-1) * q // 100`` under the
    deterministic ``(score, id)`` order. Interpolating engines differ
    in tie/lerp rules; the order statistic is exact on both. And it
    needs no global sort: each cut is ``max(score)`` over an
    ``ORDER BY ... LIMIT k+1`` prefix — a bounded per-partition heap
    (TakeOrderedAndProject), the same scan shape at any corpus size.

    Emits every doc with its score and the fitted band
    ``(band_lo, band_hi, kept)`` — downstream is one map-only filter.
    """
    scored = unigram_surprisal(docs, id_col, text_col).select(
        id_col, "n_tokens", "mean_surprisal_microbits"
    )
    from pg2kafka_spark.operators.dedup import _persist

    scored = _persist(scored)
    n = scored.count()

    def cut(q_pct: int) -> DataFrame:
        k = (n - 1) * q_pct // 100
        return (
            scored.orderBy(
                F.col("mean_surprisal_microbits").asc(), F.col(id_col).asc()
            )
            .limit(k + 1)
            .agg(F.max("mean_surprisal_microbits").alias(f"band_q{q_pct}"))
        )

    lo = cut(lo_q_pct).withColumnRenamed(f"band_q{lo_q_pct}", "band_lo")
    hi = cut(hi_q_pct).withColumnRenamed(f"band_q{hi_q_pct}", "band_hi")
    band = lo.crossJoin(hi)
    return scored.crossJoin(F.broadcast(band)).select(
        id_col,
        "mean_surprisal_microbits",
        "band_lo",
        "band_hi",
        (
            (F.col("mean_surprisal_microbits") >= F.col("band_lo"))
            & (F.col("mean_surprisal_microbits") <= F.col("band_hi"))
        ).alias("kept"),
    )


def stratified_surprisal_band(
    docs: DataFrame,
    strata_col: str = "source",
    lo_q_pct: int = 25,
    hi_q_pct: int = 75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum percentile-fit surprisal gate: the keep band is
    re-fit WITHIN each stratum — [P25, P75] of mean surprisal per
    source — instead of :func:`surprisal_band_fit`'s single corpus
    band. The reason the per-domain refit exists: surprisal
    distributions differ by domain (code vs news vs forums), so one
    corpus-wide band systematically over-prunes whichever domain sits
    off-center (the CCNet per-language-bucket / FineWeb per-language
    filtering argument applied to sources).

    Same exactness discipline as the corpus-wide fit: cuts are
    DISCRETE order statistics (value at 0-indexed rank
    ``(n_s - 1)·q div 100`` under the total ``(score, id)`` order —
    no interpolation, so engines cannot differ on tie/lerp rules),
    and the score is the fixed-point micro-bits integer.

    Plan shape: the unigram-surprisal score table, one id-keyed join
    to recover the stratum, then ONE stratum-keyed exchange carries
    rank, per-stratum count, and both conditional-max band cuts as
    window functions over the same sort. A giant stratum sorts in one
    partition here (exact per-stratum order statistics need the total
    order); at 100 TB either gate per (stratum, score-range) shard or
    accept the corpus-wide :func:`surprisal_band_fit` whose cuts are
    TakeOrdered prefixes.

    Emits every doc: ``(id, stratum, mean_surprisal_microbits,
    band_lo, band_hi, kept)``.
    """
    scored = unigram_surprisal(docs, id_col, text_col).select(
        id_col, "mean_surprisal_microbits"
    )
    st = scored.join(docs.select(id_col, strata_col), id_col)
    order_w = Window.partitionBy(strata_col).orderBy(
        F.col("mean_surprisal_microbits").asc(), F.col(id_col).asc()
    )
    full_w = Window.partitionBy(strata_col).orderBy(
        F.col("mean_surprisal_microbits").asc(), F.col(id_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    s = F.col("mean_surprisal_microbits")
    ranked = st.withColumn("__rk", F.row_number().over(order_w)).withColumn(
        "__n", F.count(F.lit(1)).over(full_w)
    )

    def cut(q_pct: int) -> Column:
        k1 = F.expr(f"((__n - 1) * {int(q_pct)}) div 100") + F.lit(1)
        return F.max(F.when(F.col("__rk") <= k1, s)).over(full_w)

    return (
        ranked.withColumn("band_lo", cut(lo_q_pct))
        .withColumn("band_hi", cut(hi_q_pct))
        .select(
            id_col,
            strata_col,
            "mean_surprisal_microbits",
            "band_lo",
            "band_hi",
            ((s >= F.col("band_lo")) & (s <= F.col("band_hi"))).alias("kept"),
        )
    )


def vocabulary_top_terms(
    df: DataFrame, text_col: str = "text", top_n: int = 200
) -> DataFrame:
    """Corpus vocabulary build: global token counts, the ``top_n``
    most frequent terms, and each prefix's cumulative corpus
    coverage in fixed-point micro-fractions — the first artifact of
    any tokenizer-training / vocab-pruning pass over a corpus.

    Scale shape: ONE uniform-key shuffle (term counts, map-side
    partial agg — term keys are near-uniform, the Zipf head is
    absorbed by the partial agg), then the top-n runs as
    TakeOrderedAndProject (per-partition heads, no global sort) and
    the rank/cumsum window sees only ``top_n`` rows. The corpus
    token total rides in as a broadcast 1-row cross join. Coverage
    is exact DECIMAL(38) arithmetic (cum·1e6 overflows int64 at
    ~9e12 tokens — a real corpus), floored via the exact-multiple
    trick so no decimal rounding can bump a boundary value.
    Cumulative sums over a (count desc, term) prefix are invariant
    to the truncation, so computing them after the top-n cut is
    exact.
    """
    from pg2kafka_spark.operators.dedup import _persist

    from pg2kafka_spark.operators.scale import spread_small_input

    # r20: keyed spread before the serial-scan tokenize (guide §2.5);
    # the text itself is the only available high-cardinality key
    tok = spread_small_input(df.select(text_col), key=text_col).select(
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("term")
    )
    # persist the vocab-sized count table: top-n AND the corpus total
    # both derive from it, so the corpus is scanned ONCE (uncached,
    # each consumer would re-run the tokenize+count pass)
    cnt = _persist(
        tok.groupBy("term").agg(F.count(F.lit(1)).alias("term_count"))
    )
    tot = cnt.agg(F.sum("term_count").alias("__t"))
    top = cnt.orderBy(F.col("term_count").desc(), F.col("term").asc()).limit(
        int(top_n)
    )
    order_w = Window.orderBy(F.col("term_count").desc(), F.col("term").asc())
    cum_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    q = F.col("cum_count").cast("decimal(38,0)") * F.lit(1000000)
    return (
        top.crossJoin(F.broadcast(tot))
        .withColumn("rnk", F.row_number().over(order_w).cast("long"))
        .withColumn("cum_count", F.sum("term_count").over(cum_w))
        .select(
            "term",
            "term_count",
            "rnk",
            "cum_count",
            ((q - q % F.col("__t")) / F.col("__t"))
            .cast("bigint")
            .alias("coverage_micros"),
        )
    )


def bpe_pair_stats(
    df: DataFrame, text_col: str = "text", top_n: int = 50
) -> DataFrame:
    """First-merge-step BPE statistics: corpus-weighted counts of
    adjacent symbol (character) pairs — exactly the quantity a BPE
    tokenizer trainer maximizes per merge — with the number of
    distinct vocabulary words each pair occurs in.

    Scale shape — the 100 TB-safe formulation: token occurrences
    collapse to the DISTINCT word vocabulary first (one uniform-key
    shuffle with map-side partial agg), so the O(word_len) pair
    explosion runs over vocab rows (~1e7 at web scale) weighted by
    their counts, never over the ~1e14 corpus token occurrences.
    The pair agg is a second small uniform shuffle (≤ |alphabet|²
    keys after partial agg) and the top-n is TakeOrderedAndProject;
    the rank window sees ``top_n`` rows. A pair occurring twice in
    one word ("aaa" → (a,a)×2) counts both occurrences, as BPE
    requires.
    """
    from pg2kafka_spark.operators.scale import spread_small_input

    # r20: keyed spread before the serial-scan tokenize (guide §2.5)
    words = spread_small_input(df.select(text_col), key=text_col).select(
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("w")
    )
    wc = (
        words.filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = wc.select(
        "w",
        "c",
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
    ).select(
        F.col("w").substr(F.col("i"), F.lit(1)).alias("pair_a"),
        F.col("w").substr(F.col("i") + 1, F.lit(1)).alias("pair_b"),
        "w",
        "c",
    )
    agg = pairs.groupBy("pair_a", "pair_b").agg(
        F.sum("c").alias("total_count"),
        F.count_distinct("w").alias("n_vocab_words"),
    )
    top = agg.orderBy(
        F.col("total_count").desc(), F.col("pair_a").asc(), F.col("pair_b").asc()
    ).limit(int(top_n))
    order_w = Window.orderBy(
        F.col("total_count").desc(), F.col("pair_a").asc(), F.col("pair_b").asc()
    )
    return top.select(
        "pair_a",
        "pair_b",
        "total_count",
        "n_vocab_words",
        F.row_number().over(order_w).cast("long").alias("rnk"),
    )


def source_quality_drift(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    n_bins: int = 16,
    bin_width: int = 32,
) -> DataFrame:
    """Ingest-drift monitor: per source, the total-variation distance
    between the token-count distributions of two ingest halves (docs
    split by id parity — in production, by batch/date). A pipeline
    that gates on quality needs to notice when a source's
    distribution MOVES between crawls before the gates silently
    change their accept rate.

    All integer/fixed-point arithmetic: per-bin shares in exact
    DECIMAL(38) micro-fractions (exact-multiple floor — counts·1e6
    overflows int64 at real volume), TV = Σ|p_a − p_b| / 2 floored in
    micros. Scale shape: ONE corpus pass partial-aggregating to
    (source, bin) cells; everything after runs on |sources|·n_bins
    rows (totals join broadcast). A source empty in one half reports
    NULL tv (no distribution to compare).

    The half assignment hashes the id with the portable permutation
    (``(id mod M)·salt mod M``, the sketch-family constants) — raw
    ``id % 2`` parity is correlated with any block-allocated id
    scheme (the fixture allocates contiguous per-source ranges, which
    makes parity degenerate per source).
    """
    mod = F.lit(2147483647)  # 2^31-1, the portable-sample modulus
    half_hash = F.pmod(
        F.pmod(F.col(id_col).cast("bigint"), mod) * F.lit(2654435761), mod
    )
    t = token_count(F.col(text_col))
    b = F.least(
        F.lit(int(n_bins) - 1), F.floor(t / F.lit(int(bin_width)))
    ).cast("long")
    cells = (
        df.select(
            group_col,
            b.alias("bin"),
            (half_hash % 2 == 0).alias("__a"),
        )
        .groupBy(group_col, "bin")
        .agg(
            F.sum(F.when(F.col("__a"), 1).otherwise(0)).alias("ca"),
            F.sum(F.when(~F.col("__a"), 1).otherwise(0)).alias("cb"),
        )
    )
    tots = cells.groupBy(group_col).agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    qa = F.col("ca").cast("decimal(38,0)") * F.lit(1000000)
    qb = F.col("cb").cast("decimal(38,0)") * F.lit(1000000)
    shares = cells.join(F.broadcast(tots), group_col).select(
        group_col,
        "n_a",
        "n_b",
        # guard the empty-half case (ANSI REMAINDER_BY_ZERO): NULL
        # share -> NULL tv for that source, same as the oracle's
        # NULL-on-zero-divisor `//`
        F.when(
            F.col("n_a") > 0,
            ((qa - qa % F.col("n_a")) / F.col("n_a")).cast("bigint"),
        ).alias("pa"),
        F.when(
            F.col("n_b") > 0,
            ((qb - qb % F.col("n_b")) / F.col("n_b")).cast("bigint"),
        ).alias("pb"),
    )
    sum_abs = F.sum(F.abs(F.col("pa") - F.col("pb")))
    return shares.groupBy(group_col).agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        (sum_abs - sum_abs % 2).cast("bigint").alias("__t2"),
    ).select(
        group_col,
        "n_a",
        "n_b",
        (F.col("__t2") / 2).cast("bigint").alias("tv_micros"),
    )


def bpe_train_merges(
    df: DataFrame, text_col: str = "text", n_merges: int = 8
) -> DataFrame:
    """BPE merge-table training, exactly unrolled: run ``n_merges``
    iterations of (count adjacent symbol pairs over the corpus →
    take the argmax pair → fuse it into one symbol everywhere), the
    algorithm of Sennrich et al.'s subword-units tokenizer. Emits
    one row per merge step — (step, pair_a, pair_b, new_symbol,
    total_count) — the merge table a tokenizer ships.

    Symbol representation: each word is a WRAPPED string — every
    symbol enclosed in single spaces, so adjacent symbols are
    separated by a double space (" a  b  c "). A merge (a, b) is then
    a plain literal string replace of " a  b " with " ab ": string
    replace scans left-to-right over NON-overlapping occurrences,
    which is precisely BPE's greedy within-word merge order
    ("aaa" + (a,a) → "aa a", first pair wins), and because each
    symbol carries its OWN wrap spaces, consuming a match leaves the
    neighbouring symbols' boundaries intact ("b a b a b" + (b,a) →
    "ba ba b", not the boundary-starved "ba b a b" a single-space
    join would give). No fold/UDF, no lookaround — portable to any
    engine with literal replace, so the whole trainer is
    oracle-checkable.

    Scale shape (the 100 TB formulation, same spine as
    :func:`bpe_pair_stats`): the corpus collapses ONCE to the
    DISTINCT word vocabulary with counts (one uniform-key shuffle);
    every iteration after that runs on vocab-sized data (~1e7 rows at
    web scale, never the ~1e14 token occurrences): pair explosion
    over the persisted vocab weighted by counts → ≤|symbols|² keys
    after map-side partial agg → argmax as TakeOrdered(1) → the
    1-row winner broadcast-cross-joined back so the replace is
    map-side. Each step's vocab and winner are LAZY localCheckpoints
    (graph.py's iterative precedent): the lineage truncates to a flat
    RDD scan per step — a ``persist`` alone leaves the logical plan
    nesting the whole history, 2^n_merges plan text and an
    exponential recompute race if union branches materialize
    concurrently — while construction stays lazy so benchmarks time
    the training itself. ``n_merges`` stays small here so the oracle
    can unroll the steps as CTEs (the unrolled-Lloyd precedent); a
    production 30k-merge trainer runs the same loop driver-side with
    reliable checkpoints instead of local ones (executor loss must
    not lose a step at cluster scale).
    """
    steps, _vocab = _bpe_train(df, text_col, int(n_merges))
    out = steps[0]
    for fr in steps[1:]:
        out = out.unionByName(fr)
    return out


def _bpe_train(
    df: DataFrame, text_col: str, n_merges: int, checkpoint: bool = True
) -> tuple[list[DataFrame], DataFrame]:
    """The BPE training loop: returns (per-step 1-row winner frames,
    final vocabulary frame (w, w2, c) after all merges). See
    :func:`bpe_train_merges` for semantics and scale notes.
    ``checkpoint=False`` keeps the raw nested logical plan — ONLY for
    plan-shape tests at tiny n_merges (the text grows 2^n)."""

    def _cut(frame: DataFrame) -> DataFrame:
        return frame.localCheckpoint(eager=False) if checkpoint else frame

    from pg2kafka_spark.operators.scale import spread_small_input

    # r20: keyed spread before the serial-scan tokenize (guide §2.5)
    words = spread_small_input(df.select(text_col), key=text_col).select(
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("w")
    )
    wc = (
        words.filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # wrap: every char becomes " c " → " a  b  c " (double space
    # between symbols, single at the ends)
    vocab = _cut(
        wc.select("w", F.regexp_replace("w", "(.)", " $1 ").alias("w2"), "c")
    )
    step_frames = []
    for step in range(1, n_merges + 1):
        syms = F.split(F.trim(F.col("w2")), "  ")
        # Words that collapsed to ONE symbol contribute no pairs.
        # Must be an explicit guard: Spark's sequence(1, 0) yields a
        # DESCENDING [1, 0] (not empty like the oracle's
        # generate_series), and element_at(s, 0) then throws.
        pairs = vocab.filter(F.size(syms) >= 2).select(
            syms.alias("s"),
            "c",
            F.explode(F.sequence(F.lit(1), F.size(syms) - 1)).alias("i"),
        ).select(
            F.element_at("s", F.col("i")).alias("pair_a"),
            F.element_at("s", F.col("i") + 1).alias("pair_b"),
            "c",
        )
        agg = pairs.groupBy("pair_a", "pair_b").agg(
            F.sum("c").alias("total_count")
        )
        best = (
            agg.orderBy(
                F.col("total_count").desc(),
                F.col("pair_a").asc(),
                F.col("pair_b").asc(),
            )
            .limit(1)
            .select(
                F.lit(step).alias("step"),
                "pair_a",
                "pair_b",
                F.concat("pair_a", "pair_b").alias("new_symbol"),
                "total_count",
            )
        )
        best = _cut(best)
        step_frames.append(best)
        vocab = (
            vocab.crossJoin(F.broadcast(best.select("pair_a", "pair_b")))
            .select(
                "w",
                F.replace(
                    F.col("w2"),
                    F.concat(
                        F.lit(" "), F.col("pair_a"),
                        F.lit("  "), F.col("pair_b"), F.lit(" "),
                    ),
                    F.concat(
                        F.lit(" "), F.col("pair_a"), F.col("pair_b"),
                        F.lit(" "),
                    ),
                ).alias("w2"),
                "c",
            )
        )
        vocab = _cut(vocab)
    return step_frames, vocab


def bpe_compression_by_source(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    n_merges: int = 8,
) -> DataFrame:
    """Apply the trained BPE merge table back to the corpus: per
    source, word occurrences, characters, post-merge symbol count,
    and the compression ratio (symbols/chars) in exact fixed-point
    micros — the metric a tokenizer team watches per ingest source
    (a source whose compression ratio drifts up is one the learned
    vocabulary no longer fits: new language, new boilerplate, spam).

    Scale shape: training runs on the vocab-sized frames
    (:func:`_bpe_train`); application needs NO second corpus text
    pass of its own — the corpus collapses once to (source, word)
    occurrence counts (uniform keys, map-side partial agg), then
    LEFT-joins the final vocabulary's per-word symbol count (both
    sides vocab-sized; uniform word key — broadcast when the vocab
    fits, AQE decides). Words shorter than 2 chars never enter the
    trainer and count as 1 symbol (coalesce), which is exact — a
    single char cannot merge. All ratio arithmetic is DECIMAL(38)
    exact-multiple floor division.
    """
    _steps, vocab = _bpe_train(df, text_col, int(n_merges))
    nsyms = vocab.select(
        "w", F.size(F.split(F.trim(F.col("w2")), "  ")).alias("n_syms")
    )
    sw = (
        df.select(
            group_col,
            F.explode(
                F.split(normalized_text(F.col(text_col)), " ")
            ).alias("w"),
        )
        .groupBy(group_col, "w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    j = sw.join(nsyms, "w", "left")
    agg = j.groupBy(group_col).agg(
        F.sum("wc").cast("bigint").alias("n_words"),
        F.sum(F.col("wc") * F.length("w")).cast("bigint").alias("n_chars"),
        F.sum(F.col("wc") * F.coalesce(F.col("n_syms"), F.lit(1)))
        .cast("bigint")
        .alias("n_symbols"),
    )
    q = F.col("n_symbols").cast("decimal(38,0)") * F.lit(1000000)
    return agg.select(
        group_col,
        "n_words",
        "n_chars",
        "n_symbols",
        F.when(
            F.col("n_chars") > 0,
            ((q - q % F.col("n_chars")) / F.col("n_chars")).cast("bigint"),
        ).alias("compression_micros"),
    )


def bpe_token_frequencies(
    df: DataFrame, text_col: str = "text", n_merges: int = 8
) -> DataFrame:
    """Post-merge token frequency table — the artifact a tokenizer
    vocab build actually ships alongside the merge list: every symbol
    surviving ``n_merges`` BPE merges, weighted by corpus occurrence
    (word count × within-word symbol multiplicity). Single-char words
    never enter the trainer (nothing to merge) but ARE corpus tokens,
    so they union in atomically — total frequency mass equals the
    corpus character-grouped token count exactly.

    Scale shape: training runs on the vocab-sized frames
    (:func:`_bpe_train`); the frequency table is one explode of the
    FINAL vocabulary (vocab-sized, never corpus-sized) plus a map-only
    single-char count, aggregated on the tiny symbol domain."""
    _steps, vocab = _bpe_train(df, text_col, int(n_merges))
    toks = vocab.select(
        F.explode(F.split(F.trim(F.col("w2")), "  ")).alias("token"), "c"
    )
    shorts = (
        df.select(
            F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("w")
        )
        .filter(F.length("w") == 1)
        .groupBy(F.col("w").alias("token"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        toks.unionByName(shorts)
        .groupBy("token")
        .agg(F.sum("c").cast("bigint").alias("freq"))
    )


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained BPE merge table to (possibly NEW) text — the
    SERVING half of the tokenizer whose training half is
    :func:`bpe_train_merges`. ``merges`` is the trainer's output
    frame (step, pair_a, pair_b, ...); encoding replays the merges
    in step order over each word's wrapped-symbol form (the same
    " a  b  c " representation, so each merge is the same
    non-overlapping left-to-right literal replace the trainer used —
    greedy BPE application, byte-for-byte the trainer's semantics).

    Returns one row per document: (id, n_words, n_tokens, encoded)
    where ``encoded`` is the full space-joined token sequence in
    original word order.

    Scale shape: the merge table aggregates to ONE row holding the
    step-ordered array of pairs, broadcast to every task; merges then
    replay per DISTINCT word (``F.aggregate`` fold over the broadcast
    array — vocab-sized work, never corpus-sized, exactly the
    trainer's economy). The corpus-sized pass is word extraction
    (posexplode, map-only) plus one join from occurrences to the
    encoded vocabulary — skewed by common words, which AQE skew-join
    handles; the per-doc reassembly groups on the uniform doc key.
    A production encoder with a 30k-merge table replays merges via a
    linear-scan pair-ranking kernel instead of 30k folds; the 8-merge
    fold here keeps the whole path oracle-checkable."""
    ms = merges.agg(
        F.sort_array(
            F.collect_list(F.struct("step", "pair_a", "pair_b"))
        ).alias("ms")
    )
    from pg2kafka_spark.operators.scale import spread_small_input

    words = spread_small_input(
        docs.select(id_col, text_col), key=id_col
    ).select(
        F.col(id_col),
        F.posexplode(
            F.split(normalized_text(F.col(text_col)), " ")
        ).alias("i", "w"),
    ).filter(F.length("w") >= 1)
    dw = words.select("w").distinct()
    wrapped = F.regexp_replace("w", "(.)", " $1 ")
    enc = (
        dw.crossJoin(F.broadcast(ms))
        .select(
            "w",
            F.aggregate(
                "ms",
                wrapped,
                lambda acc, m: F.replace(
                    acc,
                    F.concat(
                        F.lit(" "), m["pair_a"],
                        F.lit("  "), m["pair_b"], F.lit(" "),
                    ),
                    F.concat(
                        F.lit(" "), m["pair_a"], m["pair_b"], F.lit(" ")
                    ),
                ),
            ).alias("w2"),
        )
        .select(
            "w",
            F.replace(F.trim("w2"), F.lit("  "), F.lit(" ")).alias("toks"),
            F.size(F.split(F.trim("w2"), "  ")).cast("bigint").alias(
                "n_syms"
            ),
        )
    )
    return (
        words.join(enc, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_syms").cast("bigint").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "toks"))),
                    lambda x: x["toks"],
                ),
                " ",
            ).alias("encoded"),
        )
    )


def _bpe_encode_word(word: str, ranks: dict) -> list:
    """The linear-scan pair-ranking kernel: repeatedly merge the
    LOWEST-RANK adjacent token pair present (all its occurrences,
    left-to-right, non-overlapping — exactly the trainer's replace
    semantics) until no table pair remains. Work per word is
    O(len × merges_that_fire), INDEPENDENT of merge-table size — the
    property that makes a 30 k-merge production table servable, where
    the fold's O(n_merges × len) replay is not.

    Equivalent to the in-rank-order fold whenever every merged
    token's constituents precede it in rank — true by construction
    for any table :func:`_bpe_train` emits (a pair is only learnable
    at step k if both sides exist in the step-k corpus), pinned by
    tests/test_bpe_production.py against the fold on trained tables."""
    toks = list(word)
    while len(toks) >= 2:
        best_rank = None
        best_pair = None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (toks[i], toks[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        out = []
        i = 0
        n = len(toks)
        while i < n:
            if i < n - 1 and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


# One executor-side broadcast per DISTINCT merge table per Spark
# application, not per call: repeated invocations (bench reps, parity
# suites) previously accumulated an orphan ~1 MB broadcast each (r13
# advice). Keyed by content so a retrained table gets a fresh
# broadcast; entries from dead applications are dropped (their
# broadcasts died with the context); small FIFO bound with an
# explicit unpersist keeps a long session from pinning stale tables.
_RANK_BCASTS: dict = {}


def _ranks_broadcast(spark, ranks: dict):
    app = spark.sparkContext.applicationId
    # Collision-resistant digest of the canonical serialization, NOT
    # Python hash(): a hash collision between two distinct merge
    # tables in one application would silently reuse the wrong rank
    # broadcast and produce wrong encodings with no error (r14 ADVICE).
    digest = hashlib.md5(
        repr(sorted(ranks.items())).encode("utf-8")
    ).hexdigest()
    key = (app, digest)
    if key in _RANK_BCASTS:
        return _RANK_BCASTS[key]
    for k in [k for k in _RANK_BCASTS if k[0] != app]:
        del _RANK_BCASTS[k]
    while len(_RANK_BCASTS) >= 4:
        old = _RANK_BCASTS.pop(next(iter(_RANK_BCASTS)))
        try:
            old.unpersist()
        except Exception:
            pass  # context mid-shutdown: nothing to release
    b = spark.sparkContext.broadcast(ranks)
    _RANK_BCASTS[key] = b
    return b


def bpe_encode_production(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """PRODUCTION twin of :func:`bpe_encode` — same (id, n_words,
    n_tokens, encoded) output, but the per-word merge replay is the
    linear-scan pair-ranking kernel (:func:`_bpe_encode_word`) instead
    of one fold step per table row. The fold is perfect for the
    oracle-checkable 8-merge table; a real tokenizer ships ~30 k
    merges, where 30 k sequential string replaces per word is the
    wrong machine — the scan kernel pays only for merges that FIRE in
    the word.

    Scale shape (everything outside the kernel is the fold twin's
    plan): the merge table is a MODEL artifact, vocab-sized, collected
    once and shipped to Python workers via a SparkContext broadcast
    (~1 MB at 30 k merges); the kernel runs Arrow-batched over the
    DISTINCT words only (vocab-sized work, never corpus-sized); the
    corpus-sized passes — word posexplode, occurrence→encoding join
    (AQE skew-handled), per-doc reassembly on the uniform doc key —
    are identical to :func:`bpe_encode`, so the two plans differ only
    inside the vocab-sized stage."""
    import pandas as pd
    from pyspark.sql import types as T

    spark = docs.sparkSession
    rank_rows = (
        merges.select("step", "pair_a", "pair_b")
        .orderBy("step")
        .collect()
    )
    ranks = {(r["pair_a"], r["pair_b"]): r["step"] for r in rank_rows}
    b_ranks = _ranks_broadcast(spark, ranks)

    def _enc_fn(words):
        rk = b_ranks.value
        toks_out = []
        n_out = []
        for w in words:
            ts = _bpe_encode_word(w, rk)
            toks_out.append(" ".join(ts))
            n_out.append(len(ts))
        return pd.DataFrame({"toks": toks_out, "n_syms": n_out})

    # real annotation objects (the module's `from __future__ import
    # annotations` would stringify inline hints, which the pandas_udf
    # signature parser rejects)
    _enc_fn.__annotations__ = {"words": pd.Series, "return": pd.DataFrame}
    _enc = F.pandas_udf(
        _enc_fn,
        T.StructType([
            T.StructField("toks", T.StringType()),
            T.StructField("n_syms", T.LongType()),
        ]),
    )

    from pg2kafka_spark.operators.scale import spread_small_input

    words = spread_small_input(
        docs.select(id_col, text_col), key=id_col
    ).select(
        F.col(id_col),
        F.posexplode(
            F.split(normalized_text(F.col(text_col)), " ")
        ).alias("i", "w"),
    ).filter(F.length("w") >= 1)
    enc = (
        words.select("w")
        .distinct()
        .select("w", _enc(F.col("w")).alias("e"))
        .select("w", F.col("e.toks").alias("toks"),
                F.col("e.n_syms").alias("n_syms"))
    )
    return (
        words.join(enc, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_syms").cast("bigint").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "toks"))),
                    lambda x: x["toks"],
                ),
                " ",
            ).alias("encoded"),
        )
    )
