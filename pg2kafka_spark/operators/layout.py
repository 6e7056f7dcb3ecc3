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
    # every subtraction happens IN decimal: `hi - lo + 1` as longs
    # overflows (ANSI throws) the moment the span covers most of the
    # 64-bit range — caught by the 2^62-extremes test
    vd = v.cast("decimal(38,0)")
    lod = lo.cast("decimal(38,0)")
    hid = hi.cast("decimal(38,0)")
    span = hid - lod + F.lit(1)
    q = (vd - lod) * F.lit(1 << bits)
    # floor(q/span) via the exact-multiple trick: Spark's decimal
    # division ROUNDS to the result scale before any floor (a true
    # quotient of 127.999999999...97 rounds to 128.000000 — caught by
    # the 2^62-extremes test). `q - q%span` is an exact multiple, so
    # its division is an integer the rounding cannot move.
    exact_multiple = q - (q % span)
    return F.least(
        F.lit((1 << bits) - 1).cast("long"),
        (exact_multiple / span).cast("long"),
    )


def quantize_sql(v: str, lo: str, hi: str, bits: int) -> str:
    """DuckDB spelling of :func:`quantize` — generated from the same
    constants so the sides cannot drift. HUGEINT (int128) carries the
    wide arithmetic, mirroring the Spark side's DECIMAL: a BIGINT
    `hi - lo + 1` overflows on near-full-range spans."""
    return (
        f"CAST(least({(1 << bits) - 1}, "
        f"(CAST({v} AS HUGEINT) - {lo}) * {1 << bits}"
        f" // (CAST({hi} AS HUGEINT) - {lo} + 1)) AS BIGINT)"
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
    from pg2kafka_spark.operators.scale import spread_small_input

    stats = df.agg(
        F.min(day).cast("long").alias("__dlo"),
        F.max(day).cast("long").alias("__dhi"),
        F.min(key).cast("long").alias("__klo"),
        F.max(key).cast("long").alias("__khi"),
    )
    # spread BEFORE the z projection: the interleave is the heavy
    # per-row stage, and a small local scan plans 1-3 splits (r14 —
    # the 5.4 s single-straggler-task bench row); no-op at scale
    j = spread_small_input(df, key=key).crossJoin(F.broadcast(stats))
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


def with_hilbert_value(
    df: DataFrame, qx: Column, qy: Column, bits: int, out_col: str = "__h"
) -> DataFrame:
    """Hilbert-curve index of two ``bits``-bit quantized coordinates —
    the better-locality space-filling curve (no long diagonal jumps,
    unlike Morton; what Databricks liquid clustering / Iceberg
    ``sort-order hilbert`` use): every curve-contiguous run is a
    tighter rectangle than the z-order equivalent on average.

    The standard xy→d algorithm is a LOOP carrying (x, y, d) through
    one rotate/flip step per bit. Naively composing those steps as
    nested expressions doubles-to-quadruples the tree per level
    (x_{i+1} references x_i and y_i several times — ~4^bits nodes);
    instead each step is its OWN projection, so x/y/d are attribute
    reads and the plan grows LINEARLY in ``bits`` (the HOF-CSE
    staging discipline from the dedup kernels, applied to iteration).
    All arithmetic (floor-div by power of two via shiftright, parity,
    multiply-add) — portable, and generated identically as SQL by
    :func:`hilbert_sql_ctes`.
    """
    staged = df.select("*", qx.alias("__hx"), qy.alias("__hy"),
                       F.lit(0).cast("long").alias("__hd"))
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.shiftright(F.col("__hx"), i).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("__hy"), i).bitwiseAND(F.lit(1))
        d2 = F.col("__hd") + F.lit(s * s) * (
            F.lit(3) * rx + ry - F.lit(2) * rx * ry
        )
        # rotate the frame: ry==1 keeps (x,y); ry==0 flips (iff rx==1)
        # then swaps
        fx = F.when(rx == 1, F.lit(s - 1) - F.col("__hx")).otherwise(
            F.col("__hx")
        )
        fy = F.when(rx == 1, F.lit(s - 1) - F.col("__hy")).otherwise(
            F.col("__hy")
        )
        x2 = F.when(ry == 1, F.col("__hx")).otherwise(fy)
        y2 = F.when(ry == 1, F.col("__hy")).otherwise(fx)
        keep = [c for c in staged.columns if c not in ("__hx", "__hy", "__hd")]
        staged = staged.select(
            *keep, x2.alias("__hx"), y2.alias("__hy"), d2.alias("__hd")
        )
    return staged.withColumnRenamed("__hd", out_col).drop("__hx", "__hy")


def hilbert_sql_ctes(
    src: str, qx: str, qy: str, bits: int, keep: str
) -> str:
    """DuckDB spelling of :func:`with_hilbert_value`: one chained CTE
    per bit (same staging, same arithmetic), starting from ``src``
    (which must provide ``{qx}``/``{qy}`` and the ``keep`` columns).
    Ends with a CTE named ``hil`` exposing ``keep`` + ``hd``."""
    parts = [
        f"h{bits} AS (SELECT {keep}, CAST({qx} AS BIGINT) AS hx, "
        f"CAST({qy} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM {src})"
    ]
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = f"((hx >> {i}) & 1)"
        ry = f"((hy >> {i}) & 1)"
        d2 = f"hd + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry})"
        fx = f"CASE WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END"
        fy = f"CASE WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END"
        x2 = f"CASE WHEN {ry} = 1 THEN hx ELSE ({fy}) END"
        y2 = f"CASE WHEN {ry} = 1 THEN hy ELSE ({fx}) END"
        parts.append(
            f"h{i} AS (SELECT {keep}, ({x2}) AS hx, ({y2}) AS hy, "
            f"({d2}) AS hd FROM h{i + 1})"
        )
    parts.append(f"hil AS (SELECT {keep}, hd FROM h0)")
    return ",\n    ".join(parts)


def hilbert_bucket_stats(
    df: DataFrame,
    day: Column,
    key: Column,
    bits: int = 8,
    bucket_bits: int = 6,
) -> DataFrame:
    """Hilbert analog of :func:`zorder_bucket_stats`: same global
    min/max quantization and fixed-width bucketing, but over the
    Hilbert index — per-bucket envelopes and extent fractions for a
    direct curve-quality comparison. Same plan: two pruned scans, a
    1-row broadcast, the staged curve steps (all map-only), one
    bucket-keyed exchange."""
    stats = df.agg(
        F.min(day).cast("long").alias("__dlo"),
        F.max(day).cast("long").alias("__dhi"),
        F.min(key).cast("long").alias("__klo"),
        F.max(key).cast("long").alias("__khi"),
    )
    from pg2kafka_spark.operators.scale import spread_small_input

    # spread: the staged curve steps are the heavy per-row stage (r14)
    j = spread_small_input(
        df.select(
            day.cast("long").alias("__d"), key.cast("long").alias("__k")
        ),
        key="__k",
    ).crossJoin(F.broadcast(stats))
    qd = quantize(F.col("__d"), F.col("__dlo"), F.col("__dhi"), bits)
    qk = quantize(F.col("__k"), F.col("__klo"), F.col("__khi"), bits)
    cur = with_hilbert_value(j, qd, qk, bits, out_col="__curve")
    bucket = F.shiftright(F.col("__curve"), 2 * bits - bucket_bits).cast(
        "long"
    )
    per = (
        cur.select(
            bucket.alias("bucket"), "__d", "__k",
            "__dlo", "__dhi", "__klo", "__khi",
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
        "bucket", "n_rows", "day_lo", "day_hi", "key_lo", "key_hi",
        dfrac.alias("day_extent_frac"), kfrac.alias("key_extent_frac"),
    )
