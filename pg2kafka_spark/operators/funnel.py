"""N-stage ordered funnel: the 3-stage view→click→purchase chain
(q_relational.event_funnel_counts / event_funnel_windowed_counts)
generalized to a fold over ANY stage list, with an optional
max-conversion-window band.

Same plan shape at every length — that is the point of the fold:
stage k filters events to one type AT THE SCAN (pushed predicate),
reduces to a user-sized min, and joins the previous stage's frame on
the SAME uniform user key, so frames only shrink down the funnel and
every exchange hashes one key. No windows, no per-user sorts;
timestamps compare as integer epoch-µs (the qreg rule). The streaming
twin keeps one scalar per stage per live user
(streaming/windows.funnel_state_stream).

Consumer-side analytics over the reference's CDC feed — the outbox
delivers the events (eventqueue/event_queue.go:60-75); the reference
itself ships no analytics, this is the surface its consumers build.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def funnel_stage_frames(
    ev: DataFrame,
    stages: list[str] | tuple[str, ...],
    window_us: int | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
) -> list[DataFrame]:
    """One user-keyed frame per funnel stage: frame k holds
    (user, t{k+1}) — each user's earliest stage-k event strictly after
    (and, when ``window_us`` is set, within the band of) their
    stage-(k−1) conversion instant."""
    if len(stages) < 1:
        raise ValueError("funnel needs at least one stage")
    frames: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, etype in enumerate(stages):
        typed = ev.filter(F.col(type_col) == etype)
        out_t = f"t{i + 1}"
        if prev is None:
            f = typed.groupBy(user_col).agg(F.min(ts_col).alias(out_t))
        else:
            prev_t = f"t{i}"
            cond = F.col(ts_col) > F.col(prev_t)
            if window_us is not None:
                cond &= F.col(ts_col) <= F.col(prev_t) + F.lit(int(window_us))
            f = (
                typed.join(prev, user_col)
                .filter(cond)
                .groupBy(user_col)
                .agg(F.min(ts_col).alias(out_t))
            )
        frames.append(f)
        prev = f
    return frames


def funnel_counts(
    frames: list[DataFrame], stages: list[str] | tuple[str, ...]
) -> DataFrame:
    """(step, event_type, n_users) — one row per stage, the classic
    funnel report. Each count is a 1-row aggregate of an already
    user-sized frame."""
    rows = [
        frame.agg(
            F.lit(i + 1).alias("step"),
            F.lit(etype).alias("event_type"),
            F.count(F.lit(1)).alias("n_users"),
        )
        for i, (etype, frame) in enumerate(zip(stages, frames))
    ]
    return reduce(lambda a, b: a.unionByName(b), rows)


def ordered_funnel(
    ev: DataFrame,
    stages: list[str] | tuple[str, ...],
    window_us: int | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
) -> DataFrame:
    """The full funnel report for ``stages`` over an
    (user, event_type, ts_us) frame."""
    return funnel_counts(
        funnel_stage_frames(ev, stages, window_us, user_col, type_col, ts_col),
        stages,
    )


def funnel_oracle_sql(
    stages: list[str] | tuple[str, ...], window_us: int | None = None
) -> str:
    """The DuckDB spelling of the same fold — generated from the SAME
    stage list so query and oracle cannot drift."""
    ctes = []
    for i, etype in enumerate(stages):
        if i == 0:
            ctes.append(
                f"s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 "
                f"FROM events WHERE event_type = '{etype}' GROUP BY 1)"
            )
        else:
            band = (
                f" AND epoch_us(ts) <= t{i} + {int(window_us)}"
                if window_us is not None
                else ""
            )
            ctes.append(
                f"s{i + 1} AS (SELECT e.user_id, min(epoch_us(ts)) AS "
                f"t{i + 1} FROM events e JOIN s{i} ON e.user_id = "
                f"s{i}.user_id WHERE event_type = '{etype}' AND "
                f"epoch_us(ts) > t{i}{band} GROUP BY 1)"
            )
    selects = " UNION ALL ".join(
        f"SELECT {i + 1} AS step, '{etype}' AS event_type, "
        f"count(*) AS n_users FROM s{i + 1}"
        for i, etype in enumerate(stages)
    )
    return f"WITH {', '.join(ctes)} SELECT * FROM ({selects})"
