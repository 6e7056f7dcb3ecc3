"""Session path analysis — the product-analytics classic on top of
gap-based sessionization: what ordered event paths do users walk, and
which entry events convert.

Reference parity: the reference's consumers sessionize the outbox
feed downstream (SURVEY.md §2.1 window surface); funnels
(operators/funnel.py) answer "did the user pass these stages EVER",
paths answer "what did sessions actually look like". Same event feed,
same one-key shuffle discipline.

Scale shape (the whole module rides ONE user_id exchange):
- session assignment is lag + running-sum windows on user_id;
- the per-session path aggregation groups on (user_id, session_id),
  which hash-partitioning on user_id already satisfies
  (ClusteredDistribution over a superset key) — Catalyst inserts a
  sort, NOT a second exchange;
- per-session state is a ≤ ``max_steps``-slice of the event-type
  array (paths are bounded by construction, sessions are human-sized;
  the slice caps the degenerate bot-session tail);
- only (path, count) partials shuffle into the final tiny path-key
  aggregation; top-k is a bounded heap (TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

GAP_US = 30 * 60 * 1_000_000  # 30-min session gap, integer µs


def _ts_us(ev: DataFrame) -> DataFrame:
    return ev.select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )


def assign_sessions(ev: DataFrame, gap_us: int = GAP_US) -> DataFrame:
    """Events → (user_id, session_id, step, ts_us, event_id,
    event_type).

    session_id is the running count of gap-exceeding boundaries per
    user; ``step`` is the 1-based position within the session,
    derived as row_number − session-start row_number + 1 so that
    EVERY window function here (lag, running sum, running max,
    row_number) shares the ONE user_id/(ts, event_id) window spec —
    a single Exchange and a single Sort feed one WindowExec; no
    (user, session)-keyed second sort pass exists anywhere in the
    family. Deterministic because the order carries the unique
    event_id tiebreak."""
    ev = _ts_us(ev)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(w)) > gap_us),
            1,
        ).otherwise(0),
    ).withColumn("__rn", F.row_number().over(w))
    return (
        flagged.withColumn(
            "session_id", F.sum("is_new").over(running).cast("bigint")
        )
        .withColumn(
            "step",
            (
                F.col("__rn")
                - F.max(
                    F.when(F.col("is_new") == 1, F.col("__rn"))
                ).over(running)
                + 1
            ).cast("int"),
        )
        .drop("is_new", "__rn")
    )


def session_paths(
    ev: DataFrame,
    gap_us: int = GAP_US,
    max_steps: int = 5,
    window_us: int | None = None,
) -> DataFrame:
    """One row per session: (user_id, session_id, path, n_events,
    entry_type, converted). ``path`` joins the first ``max_steps``
    event types with '>'; ``converted`` = a 'purchase' occurs at step
    ≥ 2 (a session ENTERED on purchase hasn't converted from
    anything — entry purchases count as their own entry_type
    instead).

    ``window_us`` adds the funnel family's max-conversion band
    (operators/funnel.py): the purchase must also land within
    ``window_us`` of the session's ENTRY event — "converted within
    10 min of landing", stricter than "converted before the gap
    closed the session". Implemented as two more conditional-min
    aggregates (entry ts and first qualifying purchase ts) over the
    SAME per-session aggregation — no extra window pass, no second
    exchange, same bounded state.

    Per-session aggregation state is BOUNDED AND CODEGEN-FRIENDLY:
    the path is assembled from ``max_steps`` conditional-max string
    aggregates (step k has exactly one row, so ``max(when(step=k))``
    picks it) joined by NULL-skipping ``concat_ws`` — a plain
    sort-based aggregate over fixed per-session state, not an
    ObjectHashAggregate collecting and sorting struct arrays
    (measured 20.5 s → 6.4 s at 1 M events, the array formulation's
    per-session allocate+sort dominating; the string agg buffer
    keeps this SortAggregate — input arrives nearly session-sorted
    from the window stage, so the extra sort is cheap). Conversion is an aggregate
    flag, not a scan of a collected array; a degenerate bot session
    costs the same ≤ max_steps strings as a human one. The step
    numbering comes free from the session-assignment window spec
    (one Exchange, one Sort, one WindowExec for everything
    event-sized)."""
    stepped = assign_sessions(ev, gap_us)
    step_cols = [
        F.max(F.when(F.col("step") == k, F.col("event_type"))).alias(
            f"__s{k}"
        )
        for k in range(1, max_steps + 1)
    ]
    is_conv = (F.col("step") >= 2) & (F.col("event_type") == "purchase")
    if window_us is None:
        converted = (
            F.sum(F.when(is_conv, 1).otherwise(0)) > 0
        ).alias("converted")
    else:
        converted = (
            F.min(F.when(is_conv, F.col("ts_us"))).isNotNull()
            & (
                F.min(F.when(is_conv, F.col("ts_us")))
                - F.min(F.when(F.col("step") == 1, F.col("ts_us")))
                <= F.lit(int(window_us))
            )
        ).alias("converted")
    per = stepped.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        *step_cols,
        converted,
    )
    return per.select(
        "user_id",
        "session_id",
        F.concat_ws(
            ">", *[F.col(f"__s{k}") for k in range(1, max_steps + 1)]
        ).alias("path"),
        "n_events",
        F.col("__s1").alias("entry_type"),
        "converted",
    )


def top_paths(
    ev: DataFrame,
    gap_us: int = GAP_US,
    max_steps: int = 5,
    k: int = 20,
    window_us: int | None = None,
) -> DataFrame:
    """Top-k session paths by frequency (path-asc tiebreak keeps the
    LIMIT deterministic across engines).

    ``window_us`` (r15) carries the funnel family's max-conversion
    band into the ranking: the output gains ``n_converted`` — how
    many of each path's sessions converted within ``window_us`` of
    their entry event — so the report reads "the most-travelled
    paths AND which of them convert quickly". Free at scale: the
    banded ``converted`` flag is already an aggregate of the same
    per-session fold (:func:`session_paths`), so the ranking adds one
    conditional sum to the tiny (path, count) aggregation — no new
    exchange, no second event pass."""
    paths = session_paths(ev, gap_us, max_steps, window_us)
    conv_cols = (
        [
            F.sum(F.when(F.col("converted"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_converted")
        ]
        if window_us is not None
        else []
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            *conv_cols,
        )
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(k)
    )


def transition_matrix(ev: DataFrame, gap_us: int = GAP_US) -> DataFrame:
    """First-order Markov transition matrix over within-session event
    steps: (from_type, to_type, n_transitions, prob_micros). The
    probability is row-normalized per from_type in exact integer
    micros (truncating integer division — portable).

    Scale shape: the lead() window rides the session-assignment
    user_id exchange (same clustering); transitions aggregate
    map-side onto the tiny |types|² key domain, and the
    row-normalizing window runs over that already-aggregated frame —
    nothing event-sized ever sorts globally. Session boundaries are
    respected by a lead(session_id) guard over the SAME user_id
    window spec the session assignment uses — one Exchange, one
    Sort, one WindowExec for the event-sized stage; the last event
    of a session transitions to nothing."""
    sess = assign_sessions(ev, gap_us)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    trans = sess.select(
        "session_id",
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
        F.lead("session_id").over(w).alias("__to_sid"),
    ).filter(
        F.col("to_type").isNotNull()
        & (F.col("__to_sid") == F.col("session_id"))
    )
    agg = trans.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions")
    )
    tot = agg.withColumn(
        "__tot",
        F.sum("n_transitions").over(Window.partitionBy("from_type")),
    )
    return tot.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.expr("(n_transitions * 1000000) div __tot").alias(
            "prob_micros"
        ),
    )


def entry_conversion(
    ev: DataFrame,
    gap_us: int = GAP_US,
    max_steps: int = 5,
    window_us: int | None = None,
) -> DataFrame:
    """Conversion by session entry event: sessions, converted
    sessions (purchase at step ≥ 2 — within ``window_us`` of entry
    when set), and the conversion share in exact integer micros
    (truncating integer division — both engines floor positives
    identically)."""
    paths = session_paths(ev, gap_us, max_steps, window_us)
    agg = paths.groupBy("entry_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum(F.col("converted").cast("bigint"))
        .cast("bigint")
        .alias("n_converted"),
    )
    return agg.select(
        "entry_type",
        "n_sessions",
        "n_converted",
        F.expr("(n_converted * 1000000) div n_sessions").alias(
            "conversion_micros"
        ),
    )
