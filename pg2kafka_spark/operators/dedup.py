"""Deduplication operators: exact, bag-of-words, token-shingle Jaccard,
MinHash+LSH, SimHash. (Training-data pipeline extras — SURVEY.md §7 M5.)

Scale design notes (the point of each strategy at 100 TB):

* **exact / bag-of-words** — one hash column + one groupBy on a
  128-bit key: a single shuffle whose keys are uniformly distributed
  (md5), so no skew; map-side partial agg shrinks it further.
* **shingle-Jaccard** — the *verification* path. The shingle self-join
  is quadratic in bucket size; only ever run it on candidate pairs (or
  small corpora). The shingle explode is linear and the join key
  (shingle text) is selective by construction.
* **MinHash+LSH** — the *discovery* path: signature cost is linear,
  banding turns "all pairs above jaccard t" into an equality join on
  (band, band-hash) — shuffle keys are uniform hashes, and bucket
  sizes are bounded w.h.p. Signatures use one xxhash64 per shingle
  plus k affine permutations (wrapping 64-bit arithmetic), not k full
  hashes.
* **SimHash** — per-document 64-bit sketch built entirely inside the
  row (higher-order functions, no explode): hamming-ball lookup via
  bit_count for near-dup at very low cost.
"""

from __future__ import annotations

import random
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from pg2kafka_spark.operators.text import fingerprint, shingles, tokens

# ---------------------------------------------------------------------------
# Exact / fingerprint dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative of every exact-duplicate group
    (after whitespace/case normalization). One uniform-key shuffle."""
    w = Window.partitionBy(fingerprint(F.col(text_col))).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# Shingle Jaccard (exact near-dup verification)
# ---------------------------------------------------------------------------


def shingle_sets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, shingle) pairs, distinct per document."""
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(tokens(F.col(text_col)), n))).alias("shingle"),
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """All document pairs with shingle-set Jaccard ≥ threshold.

    Exact formulation: |A∩B| via the shingle equality join, |A∪B| =
    |A|+|B|−|A∩B|. Quadratic in per-shingle frequency — at scale, feed
    this only LSH candidates (``minhash_lsh_pairs``) or pre-bucketed
    slices.
    """
    sh = shingle_sets(df, text_col, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("nb"))
    out = (
        common.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn("jaccard", F.col("common") / (F.col("na") + F.col("nb") - F.col("common")))
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "common", "na", "nb", "jaccard")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE61 = (1 << 61) - 1


_POW31 = 1 << 31


def _permutation_params(num_hashes: int, seed: int = 42) -> tuple[list[int], list[int]]:
    rng = random.Random(seed)
    a = [rng.randrange(1, _POW31) for _ in range(num_hashes)]
    b = [rng.randrange(0, _POW31) for _ in range(num_hashes)]
    return a, b


def minhash_signature(
    text: Column, num_hashes: int = 64, shingle_n: int = 3, seed: int = 42
) -> Column:
    """k-element MinHash signature as ``array<bigint>``.

    One xxhash64 per shingle, then k affine permutations
    ``pmod(a_i*h' + b_i, 2^61-1)`` with ``h' = pmod(h, 2^31)`` and
    ``a_i, b_i < 2^31`` — the one-hash trick, k× cheaper than hashing
    every shingle k times, and every intermediate stays < 2^62 so the
    math is ANSI-safe (Spark 4 throws on long overflow by default).
    """
    a, b = _permutation_params(num_hashes, seed)
    a_arr = F.array(*[F.lit(x) for x in a])
    b_arr = F.array(*[F.lit(x) for x in b])
    base = F.transform(
        F.array_distinct(shingles(tokens(text), shingle_n)),
        lambda s: F.pmod(F.xxhash64(s), F.lit(_POW31)),
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                base,
                lambda h: F.pmod(
                    F.element_at(a_arr, i + 1) * h + F.element_at(b_arr, i + 1),
                    F.lit(_MERSENNE61),
                ),
            )
        ),
    )


def with_minhash(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    return df.withColumn(
        "minhash", minhash_signature(F.col(text_col), num_hashes, shingle_n, seed)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH over MinHash signatures,
    with the signature-agreement Jaccard estimate attached.

    bands=16 × rows=4 over k=64 → catches jaccard ≳ 0.5 w.h.p.
    Plan: signature (map-only) → explode k/r band keys → shuffle on
    uniform (band, hash64) keys → per-bucket pair expansion →
    distinct. At 100 TB bucket sizes stay bounded because banding
    hashes are uniform; the quadratic step is per-bucket only.
    """
    rows = num_hashes // bands
    sig = with_minhash(df, text_col, num_hashes, shingle_n, seed).select(id_col, "minhash")
    banded = sig.select(
        F.col(id_col),
        F.col("minhash"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bidx: F.struct(
                    bidx.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.transform(
                            F.slice(F.col("minhash"), bidx * rows + 1, rows),
                            lambda v: v.cast("string"),
                        ))
                    ).alias("bucket"),
                ),
            )
        ).alias("bk"),
    ).select(id_col, "minhash", "bk.band", "bk.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (
                F.size(
                    F.filter(
                        F.zip_with(F.col("a.minhash"), F.col("b.minhash"), lambda x, y: x == y),
                        lambda eq: eq,
                    )
                )
                / F.lit(float(num_hashes))
            ).alias("est_jaccard"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.first("est_jaccard").alias("est_jaccard"))
    )
    return pairs


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(text: Column) -> Column:
    """64-bit SimHash over the token stream, built entirely inside the
    row (no explode/shuffle): per token one xxhash64; per bit, the
    vote is +1/−1; bit set iff the vote sum is positive.
    """
    # token hash array once per row; bit votes via nested higher-order fns
    return F.expr(
        """
        aggregate(
          sequence(0, 63),
          0L,
          (acc, i) -> acc | IF(
            aggregate(
              transform(split({t}, ' '), tk -> xxhash64(tk)),
              0,
              (s, h) -> s + IF(((h >> i) & 1) = 1, 1, -1)
            ) > 0,
            shiftleft(1L, i),
            0L
          )
        )
        """.replace("{t}", "text")
    )


def with_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    if text_col != "text":
        df = df.withColumn("text", F.col(text_col))
    return df.withColumn("simhash", simhash(F.col(text_col)))


def simhash_near_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ ``max_hamming``.

    Blocking: pairs are only compared when they share the top
    ``prefix_bits`` of the sketch (one equality-join shuffle) — the
    standard rotate-and-block scheme reduced to a single rotation,
    which is what the synthetic corpus needs; at 100 TB run
    64/prefix_bits rotations for full recall.
    """
    sh = with_simhash(df, text_col).select(id_col, "simhash")
    blocked = sh.withColumn("block", F.shiftrightunsigned("simhash", 64 - prefix_bits))
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


__all__ = [
    "exact_dedup",
    "shingle_sets",
    "jaccard_pairs",
    "minhash_signature",
    "with_minhash",
    "minhash_lsh_pairs",
    "simhash",
    "with_simhash",
    "simhash_near_pairs",
]
