"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting (on in `session.py`) is the first line of
defense — it re-plans oversized shuffle partitions at runtime. These
utilities cover the cases AQE can't fix:

* a *stateful* aggregation where one key receives a large share of all
  rows (AQE can split a partition, not a key): pre-aggregate under a
  salt, then combine — the hot key's work spreads over ``salt``
  reducers and the final combine touches ``salt`` rows per key;
* a shuffle join against a hot key when the small side is too big to
  broadcast outright: salt the big side randomly, replicate the small
  side across the salt range — per-key join work spreads ``salt``-wide
  at the cost of a ``salt``× replication of the small side (choose
  ``salt`` ≈ hot-partition-size / target-partition-size).

The reference never needed this (single-threaded relay), but its
per-key ordering contract maps to key-partitioned state at scale, and
real CDC feeds are Zipfian (one hot entity). This is the documented
strategy for that: BASELINE.md scale notes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: Aggregations that combine with themselves (partial = final op).
_SELF_COMBINING = {"sum", "min", "max"}


def _salt_column(salt: int) -> Column:
    """Deterministic-within-a-run row salt: hash of the row's split
    position, not ``rand()`` (which breaks on task retry — a retried
    task re-draws and double-counts under at-least-once sinks)."""
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation under a row salt.

    ``aggs`` maps output column → (fn, input column) with fn ∈
    {sum, count, min, max, avg}. Phase 1 groups by (keys…, salt) —
    the hot key fans out over ``salt`` reducers; phase 2 combines the
    ``salt`` partials per key (sum-of-counts, sum/count for avg, …).
    Result is exactly ``df.groupBy(keys).agg(...)``.

    Bit-stability caveat: for DOUBLE columns, sum/avg are exact only
    up to floating-point association — and the association here
    depends on the salt AND the partition layout, so results can
    differ in the last ulp across core counts. Callers needing
    bit-stable output (oracle-checked queries, checkpoint replays)
    should cast the summed column to DECIMAL first, as
    ``user_event_rollup_salted`` does; min/max/count are order-free.
    """
    partials = []
    finals = []
    for out, (fn, col) in aggs.items():
        p = f"__p_{out}"
        if fn in _SELF_COMBINING:
            partials.append(getattr(F, fn)(col).alias(p))
            finals.append(getattr(F, fn)(p).alias(out))
        elif fn == "count":
            partials.append(F.count(col).alias(p))
            finals.append(F.sum(p).cast("long").alias(out))
        elif fn == "avg":
            partials.append(F.sum(col).alias(f"{p}_s"))
            partials.append(F.count(col).alias(f"{p}_c"))
            finals.append((F.sum(f"{p}_s") / F.sum(f"{p}_c")).alias(out))
        else:
            raise ValueError(f"unsupported agg {fn!r} (not decomposable)")
    phase1 = (
        df.withColumn("__salt", _salt_column(salt))
        .groupBy(*keys, "__salt")
        .agg(*partials)
    )
    return phase1.groupBy(*keys).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side
    replicated ``salt``×, so a hot join key spreads over ``salt``
    shuffle partitions. Semantically identical to
    ``big.join(small, on, how)`` for inner/left joins on unique
    small-side keys.
    """
    salted_big = big.withColumn("__salt", _salt_column(salt))
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_big.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")


__all__ = ["salted_agg", "salted_join"]
