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

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame) -> DataFrame:
    """Repartition up to the session's parallelism when the input is
    small; identity otherwise.

    Smallness comes from the optimizer's size estimate (one
    analyze+optimize pass on the tiny projection), not an ``df.rdd``
    probe — ``.rdd`` forces full physical planning plus an RDD
    conversion per call (the round-5 lesson). Threshold: anything
    under ``parallelism × 128 MiB`` gains more from the extra cores
    on the per-row compute than the one small round-robin shuffle
    costs; above it the scan already has ≥ parallelism splits."""
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
        return df.repartition(target)
    return df
