"""O12/O13 — ordered paginated outbox scan + count/page math.

Reference: ``SELECT * FROM outbound_event_queue WHERE processed = false
ORDER BY id ASC LIMIT 1000`` (eventqueue/event_queue.go:15-21) and
``ceil(count/limit)`` page math (eventqueue/event_queue.go:29-33,
108-117; drain loop main.go:106-115).

In the streaming engine these die (micro-batch offsets replace them —
see ``pg2kafka_spark.streaming``), but the batch analogs remain part of
the consumer surface. Spark plans ``orderBy().limit()`` as
TakeOrderedAndProject: each partition keeps a bounded heap of the top
N, only N×partitions rows ever reach the driver-side merge — no global
sort at 100 TB. The ``processed = false`` predicate pushes down to the
parquet/Delta scan (partial-index analog: row-group skipping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PAGE_SIZE = 1000  # reference's hard-coded LIMIT (eventqueue/event_queue.go:20)


def unprocessed(events: DataFrame) -> DataFrame:
    """O12 predicate: the not-yet-relayed slice, pushed to the scan."""
    return events.filter(F.col("processed") == F.lit(False))


def fetch_page(events: DataFrame, limit: int = PAGE_SIZE) -> DataFrame:
    """O12 — first page of unprocessed events in commit (``id``) order."""
    return unprocessed(events).orderBy(F.col("id").asc()).limit(limit)


def unprocessed_count(events: DataFrame) -> int:
    """O13 count — executes as a partial-count + single-row exchange."""
    return unprocessed(events).count()


def unprocessed_pages(events: DataFrame, limit: int = PAGE_SIZE) -> int:
    """O13 page math — ``ceil(count/limit)`` (eventqueue/event_queue.go:115-116)."""
    import math

    return math.ceil(unprocessed_count(events) / limit)
