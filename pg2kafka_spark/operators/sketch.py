"""Engine-portable sketch formulations with exact oracles.

``user_value_sketches`` (q_relational.py) uses Spark's production
sketches — HyperLogLog++ ``approx_count_distinct`` and the Greenwald-
Khanna-style ``percentile_approx`` — whose internals are
engine-specific, so the driver can only rows-check it. This module is
the hash-checkable twin (same role as the portable MinHash/SimHash
twins in ``dedup.py``): the SAME sketch math — HLL register/rank
voting with the standard bias constant, and a fixed-bin mergeable
histogram quantile — expressed as plain integer/IEEE column algebra
that DuckDB reproduces bit-for-bit at 6-decimal rounding.

Portability rules (shared with the other twins):

* the hash is a 31-bit xorshift-multiply mixer (murmur3-finalizer
  shape) — xor/shift/multiply/mod only, every intermediate positive
  and < 2^63, exact in int64 on any engine. A plain affine hash is
  NOT enough here: sequential ids form a lattice whose leading-zero
  distribution is far from geometric, and the register maxes (hence
  the estimate) were off by 50-90% — the avalanche steps are
  load-bearing, not style;
* rank (leading-zero count) is a CASE chain over power-of-two
  thresholds, not ``log()``;
* the harmonic sum adds exact powers of two (span < 52 bits — no
  rounding, hence order-independent), so float determinism holds;
* float literals are injected into the oracle SQL via ``repr`` and
  CAST to DOUBLE (DuckDB parses bare decimals as DECIMAL, which would
  silently change the arithmetic).

Scale shape: both sketches are the textbook two-level aggregation —
map-side partial per (group, register/bin), then a tiny per-group
reduce — exactly how a 100 TB cardinality/quantile rollup should run:
state per group is O(m) registers / O(bins) counters, never the data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

#: 2^6 registers — small enough for a compact oracle, real enough to
#: exercise the estimator (±13% rsd; accuracy pinned in tests).
HLL_M = 64
HLL_REG_BITS = 6
#: Hash is 31 bits: low 6 select the register, the remaining 25 feed
#: the leading-zero rank.
HLL_RANK_BITS = 25
#: Hash domain: [0, 2^31).
HLL_MOD = 1 << 31
#: murmur3 finalizer multipliers (public constants).
HLL_MIX1 = 0x85EBCA6B
HLL_MIX2 = 0xC2B2AE35
#: Standard HLL bias constant alpha_m for m = 64.
HLL_ALPHA = 0.709


def portable_int_hash(x: Column) -> Column:
    """31-bit xorshift-multiply mixer (murmur3 finalizer shape) of an
    integer key. Every step keeps values in [0, 2^31) and products
    under 2^63, so the arithmetic is exact int64 on any engine."""
    h = F.pmod(F.abs(x.cast("bigint")), F.lit(HLL_MOD))
    h = h.bitwiseXOR(F.shiftright(h, 16))
    h = F.pmod(h * F.lit(HLL_MIX1), F.lit(HLL_MOD))
    h = h.bitwiseXOR(F.shiftright(h, 13))
    h = F.pmod(h * F.lit(HLL_MIX2), F.lit(HLL_MOD))
    return h.bitwiseXOR(F.shiftright(h, 16))


def portable_int_hash_sql(x: str) -> str:
    """The DuckDB spelling of ``portable_int_hash`` over expression
    ``x`` — generated from the same constants so the sides can't
    drift. Nested, since SQL lacks local bindings; every sub-term is
    positive so ``%``/``>>`` agree with Spark's pmod/shiftright."""
    h0 = f"(abs(CAST({x} AS BIGINT)) % {HLL_MOD})"
    h1 = f"xor({h0}, {h0} >> 16)"
    h2 = f"(({h1} * {HLL_MIX1}) % {HLL_MOD})"
    h3 = f"xor({h2}, {h2} >> 13)"
    h4 = f"(({h3} * {HLL_MIX2}) % {HLL_MOD})"
    return f"xor({h4}, {h4} >> 16)"


def hll_rank(w: Column) -> Column:
    """1 + leading-zero count of ``w`` in ``HLL_RANK_BITS``-bit space
    (the HLL register update value), as a power-of-two-threshold CASE
    chain — no ``log()``, so bit-identical on any engine."""
    c = F.when(w >= F.lit(1 << (HLL_RANK_BITS - 1)), F.lit(1))
    for k in range(HLL_RANK_BITS - 2, -1, -1):
        c = c.when(w >= F.lit(1 << k), F.lit(HLL_RANK_BITS - k))
    return c.otherwise(F.lit(HLL_RANK_BITS + 1))


def hll_rank_sql(w: str) -> str:
    """The DuckDB spelling of ``hll_rank`` over SQL expression ``w``."""
    whens = " ".join(
        f"WHEN {w} >= {1 << k} THEN {HLL_RANK_BITS - k}"
        for k in range(HLL_RANK_BITS - 1, -1, -1)
    )
    return f"CASE {whens} ELSE {HLL_RANK_BITS + 1} END"


def hll_distinct(
    df: DataFrame, group_cols: Sequence[str], value_col: str, out_col: str
) -> DataFrame:
    """Portable-HLL distinct-count estimate per group.

    Register table (one uniform-key shuffle with map-side partial
    max), then the standard estimator: harmonic mean of ``2^-rank``
    over all m registers (absent register = rank 0 = summand 1.0),
    with the small-range linear-counting correction
    ``m * ln(m / zero_registers)`` below ``2.5 m``. NULL keys are
    ignored, matching ``approx_count_distinct``."""
    h = portable_int_hash(F.col(value_col))
    regs = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            F.pmod(h, F.lit(HLL_M)).alias("__reg"),
            hll_rank(F.shiftright(h, HLL_REG_BITS)).alias("__rank"),
        )
        .groupBy(*group_cols, "__reg")
        .agg(F.max("__rank").alias("__mr"))
    )
    g = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("__mr"))).alias("__ps"),
        F.count(F.lit(1)).alias("__npres"),
    )
    m = float(HLL_M)
    v = (F.lit(HLL_M) - F.col("__npres")).cast("double")
    raw = F.lit(HLL_ALPHA * m * m) / (F.col("__ps") + v)
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0), F.lit(m) * F.log(F.lit(m) / v)
    ).otherwise(raw)
    return g.select(*group_cols, F.round(est, 6).alias(out_col))


def histogram_quantile(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str,
    q: float = 0.5,
    scale: int = 16,
) -> DataFrame:
    """Fixed-bin histogram quantile per group — the mergeable sketch
    form of a percentile: bin = ``floor(value * scale)`` (width
    1/scale, data-independent so partial histograms merge by count
    addition), estimate = linear interpolation inside the first bin
    whose cumulative count reaches ``q * n``.

    Float determinism: the target ``q*n`` and bin bounds are exact
    doubles; the interpolation is one IEEE division — identical on
    both engines, rounded to 6 dp for the oracle row."""
    binc = F.floor(F.col(value_col) * scale).cast("bigint")
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, binc.alias("__bin"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(*group_cols)
    cum = hist.withColumn("__cum", F.sum("__c").over(wcum)).withColumn(
        "__n", F.sum("__c").over(wall)
    )
    target = F.lit(float(q)) * F.col("__n")
    wpick = Window.partitionBy(*group_cols).orderBy("__bin")
    picked = (
        cum.filter(F.col("__cum") >= target)
        .withColumn("__rn", F.row_number().over(wpick))
        .filter(F.col("__rn") == 1)
    )
    est = (
        F.col("__bin") + (target - (F.col("__cum") - F.col("__c"))) / F.col("__c")
    ) / F.lit(float(scale))
    return picked.select(*group_cols, F.round(est, 6).alias(out_col))


#: Count-min row-salt (Knuth multiplicative constant — also the
#: portable-sample salt in similarity.py); < 2^31 so ``key_mod +
#: depth·salt`` stays far under 2^63.
CM_SALT = 2654435761


def count_min_heavy_hitters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    phi: float = 0.0075,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) frequency
    estimates + heavy-hitter flags per distinct key, engine-portable.

    The sketch table is ``depth × width`` counters: row j counts keys
    by ``portable_int_hash(key_mod + j·CM_SALT) mod width``;
    ``cm_est(k) = min_j counter[j][h_j(k)]`` — an overestimate-only
    bound (never under), with ``err ≤ e/width · N`` at probability
    ``1 − e^-depth``. ``is_heavy`` flags keys with ``cm_est ≥ φ·N`` —
    a superset of the true heavy hitters, the standard batch use of
    CM. ``exact_n`` rides along so the overestimate is visible (and
    the oracle checks both). Integer arithmetic end-to-end — exact
    hash-match, no float caveats.

    Scale shape: building the sketch is one map-side ``depth``-fold
    explode into a ``(row, bucket)`` groupBy — depth·width counters
    TOTAL regardless of N, so the reduce state is O(1); the probe
    joins distinct keys against the BROADCAST counter table and
    min-reduces per key. At 100 TB the counter table is still
    depth·width rows — the whole point of sketching the stream
    instead of counting it.
    """
    keymod = F.pmod(F.abs(F.col(key_col).cast("bigint")), F.lit(HLL_MOD))
    rep = (
        df.filter(F.col(key_col).isNotNull())
        .select(keymod.alias("__k"))
        .withColumn("__d", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))))
        .select(
            "__d",
            F.pmod(
                portable_int_hash(F.col("__k") + F.col("__d") * F.lit(CM_SALT)),
                F.lit(width),
            ).alias("__b"),
        )
    )
    table = rep.groupBy("__d", "__b").agg(F.count(F.lit(1)).alias("__c"))
    ncnt = df.filter(F.col(key_col).isNotNull()).agg(
        F.count(F.lit(1)).alias("__n")
    )
    probes = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col))
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .select(key_col, "exact_n", keymod.alias("__k"))
        .withColumn("__d", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))))
        .select(
            key_col,
            "exact_n",
            "__d",
            F.pmod(
                portable_int_hash(F.col("__k") + F.col("__d") * F.lit(CM_SALT)),
                F.lit(width),
            ).alias("__b"),
        )
    )
    est = (
        probes.join(F.broadcast(table), ["__d", "__b"])
        .groupBy(key_col, "exact_n")
        .agg(F.min("__c").alias("cm_est"))
    )
    # φ·N as an integer ceiling: is_heavy = cm_est·1e6 ≥ φ·1e6·N keeps
    # the comparison in exact int64 (φ scaled to ppm)
    phi_ppm = int(round(phi * 1_000_000))
    return est.crossJoin(F.broadcast(ncnt)).select(
        key_col,
        "cm_est",
        "exact_n",
        (F.col("cm_est") * F.lit(1_000_000) >= F.col("__n") * F.lit(phi_ppm)).alias(
            "is_heavy"
        ),
    )


def count_min_heavy_hitters_sql(
    key_expr: str,
    from_clause: str,
    depth: int = 4,
    width: int = 64,
    phi: float = 0.0075,
) -> str:
    """DuckDB twin of :func:`count_min_heavy_hitters` — generated
    from the same constants so the sides cannot drift."""
    phi_ppm = int(round(phi * 1_000_000))

    def bucket(k: str, d: str) -> str:
        kmod = f"(abs(CAST({k} AS BIGINT)) % {HLL_MOD})"
        return f"({portable_int_hash_sql(f'({kmod} + {d} * {CM_SALT})')} % {width})"

    return f"""
    WITH src AS (SELECT {key_expr} AS k FROM {from_clause}
                 WHERE {key_expr} IS NOT NULL),
    depths AS (SELECT unnest(range({depth})) AS __d),
    rep AS (
      SELECT __d, {bucket('k', '__d')} AS __b
      FROM src CROSS JOIN depths
    ),
    tbl AS (SELECT __d, __b, count(*) AS c FROM rep GROUP BY 1, 2),
    n AS (SELECT count(*) AS n FROM src),
    probes AS (
      SELECT k, count(*) AS exact_n FROM src GROUP BY 1
    ),
    est AS (
      SELECT p.k, p.exact_n, min(t.c) AS cm_est
      FROM probes p CROSS JOIN depths d
      JOIN tbl t ON t.__d = d.__d
        AND t.__b = {bucket('p.k', 'd.__d')}
      GROUP BY 1, 2
    )
    SELECT k, cm_est, exact_n,
           cm_est * 1000000 >= n.n * {phi_ppm} AS is_heavy
    FROM est CROSS JOIN n
    """


#: Bloom word size: 32 bits per int64 word keeps every mask
#: ``1 << bit`` positive (no sign-bit), so ``&``/``bit_or`` agree
#: between engines with zero two's-complement caveats.
BLOOM_WORD_BITS = 32


def _bloom_word_bit(key_mod: Column, j: int, m_bits: int) -> tuple[Column, Column]:
    h = F.pmod(
        portable_int_hash(key_mod + F.lit(j) * F.lit(CM_SALT)), F.lit(m_bits)
    )
    return F.shiftright(h, 5), F.pmod(h, F.lit(BLOOM_WORD_BITS))


def _bit_mask(b: Column) -> Column:
    # SQL shiftleft accepts a column bit count; the Python wrapper
    # doesn't — call the JVM function directly
    return F.call_function("shiftleft", F.lit(1).cast("bigint"), b)


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 32768, k: int = 3
) -> DataFrame:
    """Build a Bloom filter over ``keys`` as ONE row holding a dense
    ``array<bigint>`` bitset (``m_bits/32`` words) — the compact form
    a semi-join pushdown ships to every executor. ``k`` portable
    hashes per key (same mixer family as the CM/HLL sketches), words
    OR-merged with ``bit_or`` — integer-exact, so the filter (and its
    false-positive set) is bit-identical on any engine.

    Scale shape: one uniform-key aggregate over k·|keys| (word, mask)
    rows into ≤ m_bits/32 words, densified against a ``range`` frame,
    collapsed to one broadcastable row. m_bits=2²⁵ (1 MiB words) still
    broadcasts trivially; size by the standard
    ``m ≈ −k·n / ln(1 − fp^(1/k))``."""
    assert m_bits % BLOOM_WORD_BITS == 0 and (m_bits & (m_bits - 1)) == 0
    n_words = m_bits // BLOOM_WORD_BITS
    keymod = F.pmod(F.abs(F.col(key_col).cast("bigint")), F.lit(HLL_MOD))
    parts = []
    for j in range(k):
        w, b = _bloom_word_bit(keymod, j, m_bits)
        parts.append(
            keys.filter(F.col(key_col).isNotNull()).select(
                w.alias("word"),
                _bit_mask(b).alias("mask"),
            )
        )
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.unionAll(p)
    words = rep.groupBy("word").agg(F.bit_or("mask").alias("bits"))
    dense = (
        keys.sparkSession.range(n_words)
        .withColumnRenamed("id", "word")
        .join(F.broadcast(words), "word", "left")
        .na.fill({"bits": 0})
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(word, bits))),"
                " s -> s.bits)"
            ).alias("bloom")
        )
    )
    return dense


def bloom_might_contain(
    key: Column, bloom_col: Column, m_bits: int = 32768, k: int = 3
) -> Column:
    """Membership test against a ``bloom_build`` bitset column: true
    iff ALL k bits are set (no false negatives; false positives at
    the designed rate, deterministically). Pure column algebra —
    map-only over the probe side with the bitset broadcast."""
    keymod = F.pmod(F.abs(key.cast("bigint")), F.lit(HLL_MOD))
    cond = F.lit(True)
    for j in range(k):
        w, b = _bloom_word_bit(keymod, j, m_bits)
        mask = _bit_mask(b)
        cond = cond & (
            F.element_at(bloom_col, (w + F.lit(1)).cast("int")).bitwiseAND(mask)
            != F.lit(0)
        )
    return cond


def _bloom_word_bit_sql(key: str, j: int, m_bits: int) -> tuple[str, str]:
    kmod = f"(abs(CAST({key} AS BIGINT)) % {HLL_MOD})"
    h = f"({portable_int_hash_sql(f'({kmod} + {j} * {CM_SALT})')} % {m_bits})"
    return f"({h} >> 5)", f"({h} % {BLOOM_WORD_BITS})"


def bloom_build_sql(
    keys_sql: str, key: str, m_bits: int = 32768, k: int = 3
) -> str:
    """DuckDB twin of :func:`bloom_build` — CTE body ending in a
    1-row ``bloom`` list. ``keys_sql`` provides the key rows."""
    n_words = m_bits // BLOOM_WORD_BITS
    arms = " UNION ALL ".join(
        f"SELECT {w} AS word, (CAST(1 AS BIGINT) << {b}) AS mask "
        f"FROM __bloom_keys WHERE {key} IS NOT NULL"
        for w, b in (_bloom_word_bit_sql(key, j, m_bits) for j in range(k))
    )
    return f"""
    __bloom_keys AS ({keys_sql}),
    __bloom_rep AS ({arms}),
    __bloom_words AS (SELECT word, bit_or(mask) AS bits FROM __bloom_rep GROUP BY 1),
    __bloom AS (
      SELECT list(coalesce(w.bits, 0) ORDER BY r.i) AS bloom
      FROM range({n_words}) r(i) LEFT JOIN __bloom_words w ON w.word = r.i
    )"""


def bloom_might_contain_sql(
    key: str, m_bits: int = 32768, k: int = 3
) -> str:
    """DuckDB spelling of :func:`bloom_might_contain` against the
    ``__bloom`` CTE's ``bloom`` list (1-indexed like Spark's
    element_at)."""
    conds = []
    for j in range(k):
        w, b = _bloom_word_bit_sql(key, j, m_bits)
        conds.append(f"(bloom[CAST({w} + 1 AS INT)] & (CAST(1 AS BIGINT) << {b})) <> 0")
    return "(" + " AND ".join(conds) + ")"


__all__ = [
    "HLL_M",
    "HLL_REG_BITS",
    "HLL_RANK_BITS",
    "HLL_MOD",
    "HLL_MIX1",
    "HLL_MIX2",
    "HLL_ALPHA",
    "portable_int_hash",
    "portable_int_hash_sql",
    "hll_rank",
    "hll_rank_sql",
    "hll_distinct",
    "histogram_quantile",
    "CM_SALT",
    "count_min_heavy_hitters",
    "count_min_heavy_hitters_sql",
    "BLOOM_WORD_BITS",
    "bloom_build",
    "bloom_might_contain",
    "bloom_build_sql",
    "bloom_might_contain_sql",
]
