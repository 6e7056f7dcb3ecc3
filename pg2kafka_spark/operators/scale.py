"""Shared scale helpers for heavy per-row kernels.

``spread_small_input`` was born as dedup's private ``_spread`` (r5)
and is promoted here (r14) because the same pathology bit every
kernel family: the sf0.1 test tables are single parquet files under
``spark.sql.files.maxPartitionBytes``, so Spark plans ONE split and a
multi-second per-row kernel (z-interleave, multi-distinct Expand,
k-means assignment, quantization codes) runs on one of 32 cores —
the r14 labeled event-log capture showed the top bench rows each
dominated by a single straggler task. At 100 TB the scan has
thousands of splits and this is a no-op (never repartitions DOWN).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def spread_small_input(df: DataFrame, key: str | Column | None = None) -> DataFrame:
    """Repartition up to the session's parallelism when the input is
    small; identity otherwise.

    Smallness comes from the optimizer's size estimate (one
    analyze+optimize pass on the tiny projection), not an ``df.rdd``
    probe — ``.rdd`` forces full physical planning plus an RDD
    conversion per call (the round-5 lesson). Threshold: anything
    under ``parallelism × 128 MiB`` gains more from the extra cores
    on the per-row compute than the one small round-robin shuffle
    costs; above it the scan already has ≥ parallelism splits.

    ``key`` (r20): spread by HASH of a high-cardinality column
    instead of round-robin. Every keyless ``repartition(n)`` first
    pays a local sort of its input (``sortBeforeRepartition``, kept
    on for retry determinism — guide §2.5), which the r20 event logs
    showed dominating the serial single-row-group scan task the
    spread exists to relieve (sort+write 0.6–0.8 s vs decode ~0.2 s).
    A hash spread needs no sort, is retry-deterministic by
    construction (the guide's own recommendation over round-robin),
    and when ``key`` is the next aggregation's grouping column the
    downstream exchange collapses into this one. The pinned partition
    number also keeps AQE from byte-coalescing the downstream stage —
    the right call exactly here, where the stage's compute is far
    heavier than its input bytes."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        # py4j hands back a Java BigInt proxy for parquet scans but a
        # plain Python int for some leaf plans (e.g. Range) — str()
        # normalizes both.
        size = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        # Fail OPEN: the stats probe walks a version-sensitive internal
        # API (_jdf.queryExecution). If it ever breaks, the safe
        # behaviour is identity — repartitioning without a size
        # estimate would turn a transient probe failure on a 100 TB
        # scan into a full-table round-robin shuffle in front of a
        # kernel that needed no spread (r14 ADVICE, medium).
        return df
    if size < target * (128 << 20):
        if key is not None:
            col = F.col(key) if isinstance(key, str) else key
            return df.repartition(target, col)
        return df.repartition(target)
    return df
