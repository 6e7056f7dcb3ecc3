"""Multi-dimensional data-layout operators: z-order (Morton)
clustering keys and layout-quality statistics.

Why this exists at 100 TB: parquet scan pruning is driven by per-file
and per-row-group min/max statistics, and a sort on ONE column makes
those stats tight for that column only — a range predicate on any
other column still reads every file. Interleaving the bits of two
quantized columns into a single z-value and range-partitioning +
sorting on it makes the min/max envelopes tight on BOTH dimensions at
once (each z-contiguous run covers a small rectangle of the 2-D key
space), so `WHERE day BETWEEN ... AND part BETWEEN ...` prunes
multiplicatively. This is the layout trick behind Delta/Iceberg
`OPTIMIZE ZORDER BY`, re-expressed as plain column algebra so it runs
on any DataFrame and stays engine-portable (the same arithmetic is
generated as DuckDB SQL for the oracle).

Everything is integer math on non-negative quantized values — no
floats anywhere near the key, so the layout is bit-stable across
engines, core counts, and retries.

No reference counterpart (pg2kafka moves rows, it doesn't lay out
files); this is north-star scale tooling (SURVEY.md §7 M5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def quantize(v: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map integer ``v`` in ``[lo, hi]`` to a ``bits``-bit bucket with
    exact integer division. PySpark Columns have no floor-div
    operator and double division loses bits past 2^53, so the
    quotient is computed in DECIMAL(38) — exact for any 64-bit
    input — then floored; DuckDB's ``//`` on BIGINTs is the same
    floor-division for the non-negative operands here."""
    span = (hi - lo + F.lit(1)).cast("decimal(38,0)")
    q = (v - lo).cast("decimal(38,0)") * F.lit(1 << bits)
    return F.least(
        F.lit((1 << bits) - 1).cast("long"),
        F.floor(q / span).cast("long"),
    )


def quantize_sql(v: str, lo: str, hi: str, bits: int) -> str:
    """DuckDB spelling of :func:`quantize` — generated from the same
    constants so the sides cannot drift."""
    return (
        f"least({(1 << bits) - 1}, "
        f"(CAST({v} AS BIGINT) - {lo}) * {1 << bits} // ({hi} - {lo} + 1))"
    )


def z_value(q1: Column, q2: Column, bits: int) -> Column:
    """Morton interleave of two ``bits``-bit non-negative values:
    bit ``b`` of ``q1`` lands at position ``2b+1``, of ``q2`` at
    ``2b``. Unrolled shift/mask chain — constant-folds into one
    whole-stage-codegen expression, zero UDFs."""
    z: Column = F.lit(0).cast("long")
    for b in range(bits):
        z = (
            z
            + F.shiftright(q1, b).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * b + 1))
            + F.shiftright(q2, b).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * b))
        )
    return z


def z_value_sql(q1: str, q2: str, bits: int) -> str:
    """DuckDB spelling of :func:`z_value` over expressions ``q1``/
    ``q2`` (assumed already-quantized non-negative BIGINTs)."""
    terms = []
    for b in range(bits):
        terms.append(f"(({q1} >> {b}) & 1) * {1 << (2 * b + 1)}")
        terms.append(f"(({q2} >> {b}) & 1) * {1 << (2 * b)}")
    return "(" + " + ".join(terms) + ")"


def zorder_repartition(
    df: DataFrame, z_col: Column, num_partitions: int
) -> DataFrame:
    """Lay a frame out for writing: range-partition on the z-value
    (each output file owns a contiguous z-run = a small rectangle of
    the key space) and sort within partitions so parquet row-group
    stats are tight too. ``repartitionByRange`` samples quantiles —
    the one intentionally non-deterministic step, which affects file
    BOUNDARIES only, never row content; all correctness-checked
    consumers use the deterministic fixed-width bucketing of
    :func:`zorder_bucket_stats` instead."""
    return (
        df.withColumn("__z", z_col)
        .repartitionByRange(num_partitions, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def zorder_bucket_stats(
    df: DataFrame,
    day: Column,
    key: Column,
    bits: int = 8,
    bucket_bits: int = 6,
) -> DataFrame:
    """Layout-quality measurement: quantize both dimensions against
    their global min/max, z-interleave, split the z-space into
    ``2^bucket_bits`` fixed-width buckets (deterministic — a stand-in
    for "files"), and report each bucket's row count and min/max
    envelope per dimension plus the envelope's fraction of the global
    span. With ``bucket_bits=6`` each bucket is addressed by the top
    3 interleaved bits of each dimension, so a well-laid-out bucket
    covers ~1/8 of each dimension's range — the multiplicative
    pruning a 2-D range scan gets from this layout, measured rather
    than asserted.

    Plan: one global min/max reduction (broadcast back — a 1-row
    frame), then a map-only z/bucket projection, then one
    uniform-key groupBy. Scale-safe: the only shuffle is on the
    bucket id, bounded by ``2^bucket_bits`` groups with map-side
    partial aggs.
    """
    stats = df.agg(
        F.min(day).cast("long").alias("__dlo"),
        F.max(day).cast("long").alias("__dhi"),
        F.min(key).cast("long").alias("__klo"),
        F.max(key).cast("long").alias("__khi"),
    )
    j = df.crossJoin(F.broadcast(stats))
    qd = quantize(day.cast("long"), F.col("__dlo"), F.col("__dhi"), bits)
    qk = quantize(key.cast("long"), F.col("__klo"), F.col("__khi"), bits)
    z = z_value(qd, qk, bits)
    bucket = F.shiftright(z, 2 * bits - bucket_bits).cast("long")
    per = (
        j.select(
            bucket.alias("bucket"),
            day.cast("long").alias("__d"),
            key.cast("long").alias("__k"),
            F.col("__dlo"),
            F.col("__dhi"),
            F.col("__klo"),
            F.col("__khi"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__d").alias("day_lo"),
            F.max("__d").alias("day_hi"),
            F.min("__k").alias("key_lo"),
            F.max("__k").alias("key_hi"),
            F.min("__dlo").alias("__gdlo"),
            F.min("__dhi").alias("__gdhi"),
            F.min("__klo").alias("__gklo"),
            F.min("__khi").alias("__gkhi"),
        )
    )
    dfrac = (F.col("day_hi") - F.col("day_lo") + 1) / (
        F.col("__gdhi") - F.col("__gdlo") + 1
    )
    kfrac = (F.col("key_hi") - F.col("key_lo") + 1) / (
        F.col("__gkhi") - F.col("__gklo") + 1
    )
    return per.select(
        "bucket",
        "n_rows",
        "day_lo",
        "day_hi",
        "key_lo",
        "key_hi",
        dfrac.alias("day_extent_frac"),
        kfrac.alias("key_extent_frac"),
    )
