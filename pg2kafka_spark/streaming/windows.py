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


def join_streams_within(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    lookback: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Watermarked stream-stream interval join: each left-stream row
    pairs with right-stream rows of the same key whose event time lies
    in ``[left_ts - lookback, left_ts]`` — the streaming twin of the
    batch ``operators/temporal.interval_join`` (and the bounded-state
    approximation of an as-of join: an exact streaming as-of would
    need unbounded right-side retention; the lookback IS the state
    bound).

    Both sides get event-time watermarks and the range condition is
    explicit, so Spark can size and expire the join state — without
    the time bound a stream-stream join must keep every right row
    forever. Outer joins emit NULL matches only once the watermark
    passes (standard Structured Streaming semantics).
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lookback}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    for lk, rk in key_cols:
        cond = cond & (F.col(f"l.{lk}") == F.col(f"r.{rk}"))
    joined = l.join(r, cond, how)
    out = [F.col(f"l.{c}").alias(c) for c in left.columns]
    out += [F.col(f"r.{c}").alias(f"{right_prefix}{c}") for c in right.columns]
    return joined.select(*out)


def _build_change_stats_processor():
    """Build the StatefulProcessor for :func:`change_stats_stream`
    lazily — subclassing the pyspark 4 class at module import would
    break older runtimes; deferring keeps the module importable
    everywhere."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ChangeStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "stats", "n_changes BIGINT, last_us BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._st.exists():
                prev = self._st.get()
                n, last = int(prev[0]), int(prev[1])
            else:
                n, last = 0, 0
            for pdf in rows:
                n += len(pdf)
                last = max(last, int(pdf["ts_us"].max()))
            self._st.update((n, last))
            yield pd.DataFrame(
                {
                    "external_id": [key[0]],
                    "n_changes": [n],
                    "last_us": [last],
                }
            )

        def close(self) -> None:
            pass

    return ChangeStats()


def change_stats_stream(events: DataFrame) -> DataFrame:
    """Per-key change statistics on the relay stream via
    ``transformWithStateInPandas`` — the Spark 4 arbitrary-state API
    (successor to ``applyInPandasWithState``): named state variables
    with their own schemas, explicit ``exists()/get()/update()``, and
    room for timers/TTL — the API surface a production relay's
    per-key bookkeeping (counts, last-seen, compaction hints) grows
    into. Maintains one (n_changes, last_us) ValueState per
    external_id, folded across micro-batches; emits the key's running
    totals each batch in update mode.

    Same scale contract as ``latest_state_stream``: state is O(live
    keys), hash-partitioned by key.

    Runtime dependency: the TWS state server speaks protobuf
    (``google.protobuf``) between the JVM and the Python driver
    worker — absent from this container, so the e2e test import-skips
    (the operator itself is plain pyspark and runs wherever Spark 4's
    streaming extras are installed).
    """
    ev = events.withColumn("ts_us", F.unix_micros(F.col("created_at")))
    return ev.groupBy("external_id").transformWithStateInPandas(
        statefulProcessor=_build_change_stats_processor(),
        outputStructType="external_id string, n_changes bigint, last_us bigint",
        outputMode="Update",
        timeMode="None",
    )


#: Output schema of :func:`funnel_state_stream`.
_FUNNEL_SCHEMA = "user_id bigint, t1 bigint, t2 bigint, t3 bigint, stage int"
_FUNNEL_STATE = "t1 bigint, t2 bigint, t3 bigint"


def _build_funnel_stages_fn(stages: list, window_us: int | None = None):
    """N-stage generalization of the per-user funnel fold — the
    streaming twin of the batch ``ordered_funnel`` stage list
    (operators/funnel.py, r13). State is one earliest-qualifying
    instant per stage; step k qualifies strictly after step k−1
    (within ``window_us`` of it when banded). Same chunk-concat rule
    as the 3-stage machine: batch-wide order independence only holds
    over the concatenated group frame."""
    n = len(stages)

    def _fn(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ts = list(state.get) if state.exists else [None] * n
        chunks = [c for c in batches if len(c)]
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
            first = pdf.loc[pdf["event_type"] == stages[0], "ts_us"]
            if len(first):
                v = int(first.min())
                ts[0] = v if ts[0] is None else min(ts[0], v)
            for k in range(1, n):
                if ts[k - 1] is None or ts[k] is not None:
                    continue
                qual = (pdf["event_type"] == stages[k]) & (
                    pdf["ts_us"] > ts[k - 1]
                )
                if window_us is not None:
                    qual &= pdf["ts_us"] <= ts[k - 1] + window_us
                cand = pdf.loc[qual, "ts_us"]
                if len(cand):
                    ts[k] = int(cand.min())
        state.update(tuple(ts))
        stage = 0
        for k in range(n):
            if ts[k] is None:
                break
            stage = k + 1
        out = {"user_id": [key[0]]}
        for k in range(n):
            out[f"t{k + 1}"] = [ts[k]]
        out["stage"] = [stage]
        yield pd.DataFrame(out)

    return _fn


def funnel_state_stream_stages(
    events: DataFrame, stages: list, window_us: int | None = None
) -> DataFrame:
    """Streaming ordered funnel over an ARBITRARY stage list — the
    incremental twin of ``ordered_funnel`` (operators/funnel.py): the
    r13 batch fold generalized the 3-stage chain to N stages; this
    closes the same asymmetry on the streaming side. Output is
    (user_id, t1..tN, stage); state is N bigints per live user,
    hash-partitioned on the user key. Delivery contract, banding, and
    the chunk-concat order-independence rule are the 3-stage
    machine's, documented on :func:`funnel_state_stream`."""
    n = len(stages)
    if n < 2:
        raise ValueError("a funnel needs at least 2 stages")
    t_cols = ", ".join(f"t{k + 1} bigint" for k in range(n))
    ev = events.select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _build_funnel_stages_fn(list(stages),
                                None if window_us is None else int(window_us)),
        outputStructType=f"user_id bigint, {t_cols}, stage int",
        stateStructType=t_cols,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _build_funnel_fn(window_us: int | None = None):
    """The classic view→click→purchase machine as the 3-stage
    instance of :func:`_build_funnel_stages_fn` (one kernel since
    r14; the chunk-concat order-independence test drives this
    directly)."""
    return _build_funnel_stages_fn(
        ["view", "click", "purchase"], window_us
    )


def funnel_state_stream(
    events: DataFrame, window_us: int | None = None
) -> DataFrame:
    """Streaming ordered funnel (view → click → purchase): the
    incremental twin of the batch ``event_funnel_counts`` — per-user
    conversion state maintained live instead of recomputed per query.
    ``window_us`` switches to the max-conversion-window semantics
    (the incremental twin of ``event_funnel_windowed_counts``): step
    k counts only within ``window_us`` µs of step k−1 — the state
    shape is unchanged (the band check is a predicate on the same
    three scalars).

    State per user is THREE integers (earliest view, earliest click
    after it, earliest purchase after that), updated vectorized per
    micro-batch and emitted in update mode — a live product-analytics
    dashboard reads the emitted stage transitions directly.

    Delivery contract (documented, and what makes 3 scalars exact):
    each user's events arrive in event-time order across micro-batches
    — the CDC outbox delivers in commit order (``id``/``created_at``,
    eventqueue/event_queue.go:60-75), and the relay's pages preserve
    it. Under reordering ACROSS batches a later-arriving EARLIER view
    could retroactively qualify a click already seen and discarded;
    handling that exactly requires keeping each user's full event
    horizon (watermark-bounded) in state — the 3-scalar machine is
    the right trade on an ordered feed. Within a batch, order is
    irrelevant: the fold concatenates every Arrow chunk of the group
    before taking mins, so a view arriving in a later chunk still
    qualifies a click from an earlier one (chunk-sequential folding
    would re-introduce order sensitivity at the ~10k-row Arrow
    chunk boundary).

    At 100 TB state is O(live users) × 24 bytes, hash-partitioned on
    the user key; stream-vs-batch parity is pinned by
    tests/test_streaming.py."""
    ev = events.select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _build_funnel_fn(None if window_us is None else int(window_us)),
        outputStructType=_FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
