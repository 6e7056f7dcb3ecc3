"""Event-time operators for the streaming consumer surface.

The reference has no event-time logic (``created_at`` is transaction
wall-clock; commit order ``id`` is the only order — SURVEY.md §2.1).
These are the additive capabilities a consumer of the CDC feed needs,
built on Structured Streaming's native state machinery:

* watermarks bound state for late data;
* tumbling/sliding windows via ``F.window``, session windows via
  ``F.session_window`` — both run as streaming state-store aggs with
  partial aggregation, identical code path in batch mode (which is
  what the oracle-backed batch queries ``events_hourly`` /
  ``sessionize_events`` check);
* ``dropDuplicatesWithinWatermark`` on ``uuid`` upgrades the relay's
  at-least-once floor to effectively-once for consumers (the
  reference ships a uuid per event for exactly this,
  sql/migrations.sql:8);
* ``applyInPandasWithState`` for custom per-key state — the
  latest-state compaction that ``latest_state_per_user`` computes in
  batch, maintained incrementally.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def with_watermark(events: DataFrame, delay: str = "10 minutes", ts_col: str = "created_at") -> DataFrame:
    """Bound event-time lateness: state for windows/dedup older than
    max(event time) − delay is reclaimed. At 100 TB the watermark is
    what keeps state size O(active keys), not O(history)."""
    return events.withWatermark(ts_col, delay)


def events_per_window(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    ts_col: str = "created_at",
    watermark: str = "10 minutes",
    group_cols: tuple[str, ...] = ("table_name",),
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is given) event-time counts
    per group — streaming-safe (append output once the watermark
    passes). Partial aggregation happens map-side before the state
    store, so the shuffle carries one row per (group, window) per
    input partition."""
    win = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide is not None
        else F.window(F.col(ts_col), window_duration)
    )
    return (
        with_watermark(events, watermark, ts_col)
        .groupBy(win.alias("w"), *[F.col(c) for c in group_cols])
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
        )
    )


def events_per_session_window(
    events: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "external_id",
    ts_col: str = "created_at",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows (dynamic, gap-closed) per key — the streaming
    formulation of the batch ``sessionize_events`` query. Spark merges
    adjacent session state in the state store; a session closes (and
    emits) when the watermark passes its end."""
    return (
        with_watermark(events, watermark, ts_col)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("s"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_events_by_uuid(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """At-least-once → effectively-once: drop redelivered uuids within
    the watermark horizon. State is one uuid per event for the horizon
    only (vs unbounded for plain dropDuplicates) — the crash-replay
    window is minutes, so that horizon is exactly the dedup we need
    (reference redelivery scenario: crash between produce main.go:161
    and mark main.go:172)."""
    return with_watermark(events, watermark).dropDuplicatesWithinWatermark(["uuid"])


#: Output schema of :func:`latest_state_stream`.
_LATEST_SCHEMA = (
    "external_id string, table_name string, statement string, "
    "data string, created_at timestamp, n_changes bigint"
)
_STATE_SCHEMA = "statement string, data string, created_at timestamp, n_changes bigint"


def _latest_state_fn(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-key reducer: keep the newest (created_at, id)-ordered event
    plus a lifetime change counter. State is one tuple per key."""
    if state.exists:
        stmt, data, created_at, n = state.get
    else:
        stmt, data, created_at, n = None, None, None, 0
    for pdf in batches:
        pdf = pdf.sort_values(["created_at", "id"])
        n += len(pdf)
        last = pdf.iloc[-1]
        if created_at is None or last["created_at"] >= created_at:
            stmt, data, created_at = last["statement"], last["data"], last["created_at"]
    state.update((stmt, data, created_at, n))
    yield pd.DataFrame(
        {
            "external_id": [key[0]],
            "table_name": [key[1]],
            "statement": [stmt],
            "data": [data],
            "created_at": [created_at],
            "n_changes": [n],
        }
    )


def latest_state_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator: incrementally-maintained per-key
    latest state (the streaming twin of the batch ``max_by``
    compaction in ``latest_state_per_user``).

    ``applyInPandasWithState`` keeps one row of state per
    (external_id, table_name); every micro-batch folds its events into
    that state Arrow-batched, and emits the key's current state in
    update mode. At 100 TB state is O(live keys) and partitioned by
    key hash — no skew beyond the key distribution itself.
    """
    return (
        events.groupBy("external_id", "table_name")
        .applyInPandasWithState(
            _latest_state_fn,
            outputStructType=_LATEST_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
