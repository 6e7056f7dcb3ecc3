"""Session path analysis (operators/paths.py): gap/order semantics,
path truncation, conversion definition, and the one-exchange plan
shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pg2kafka_spark.operators.paths import (
    GAP_US,
    assign_sessions,
    entry_conversion,
    session_paths,
    top_paths,
)

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    """rows: (event_id, user_id, offset_seconds, event_type)."""
    data = [
        (eid, BASE + dt.timedelta(seconds=off), uid, et, 1.0, "{}")
        for eid, uid, off, et in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


class TestSessionAssignment:
    def test_gap_splits_exactly_beyond_30min(self, spark):
        # 1800s gap = SAME session (strictly-greater boundary);
        # 1801s gap = new session.
        ev = _ev(spark, [
            (1, 1, 0, "view"),
            (2, 1, 1800, "view"),
            (3, 1, 3601, "view"),
        ])
        sess = assign_sessions(ev).orderBy("event_id").collect()
        assert [r["session_id"] for r in sess] == [1, 1, 2]

    def test_sessions_are_per_user(self, spark):
        ev = _ev(spark, [
            (1, 1, 0, "view"),
            (2, 2, 5, "view"),
            (3, 1, 10, "view"),
        ])
        sess = assign_sessions(ev).collect()
        by_user = {(r["user_id"], r["event_id"]): r["session_id"] for r in sess}
        assert by_user[(1, 1)] == by_user[(1, 3)] == 1
        assert by_user[(2, 2)] == 1

    def test_event_id_breaks_timestamp_ties(self, spark):
        ev = _ev(spark, [
            (2, 1, 0, "b"),
            (1, 1, 0, "a"),
        ])
        p = session_paths(ev).collect()[0]
        assert p["path"] == "a>b"


class TestSessionPaths:
    def test_path_truncates_but_conversion_sees_whole_session(self, spark):
        # 7 events; purchase at step 7 — beyond the 5-step path, but
        # the session still counts as converted.
        rows = [(i, 1, i * 10, "view") for i in range(1, 7)]
        rows.append((7, 1, 70, "purchase"))
        p = session_paths(_ev(spark, rows)).collect()[0]
        assert p["path"] == "view>view>view>view>view"
        assert p["n_events"] == 7
        assert p["converted"] is True

    def test_entry_purchase_is_not_conversion(self, spark):
        p = session_paths(
            _ev(spark, [(1, 1, 0, "purchase"), (2, 1, 10, "view")])
        ).collect()[0]
        assert p["entry_type"] == "purchase"
        assert p["converted"] is False

    def test_purchase_at_step2_converts(self, spark):
        p = session_paths(
            _ev(spark, [(1, 1, 0, "view"), (2, 1, 10, "purchase")])
        ).collect()[0]
        assert p["converted"] is True

    def test_single_event_session(self, spark):
        p = session_paths(_ev(spark, [(1, 1, 0, "click")])).collect()[0]
        assert p["path"] == "click"
        assert p["entry_type"] == "click"
        assert p["converted"] is False

    def test_conversion_does_not_cross_sessions(self, spark):
        # purchase in the user's SECOND session must not convert the
        # first.
        ev = _ev(spark, [
            (1, 1, 0, "view"),
            (2, 1, 4000, "view"),
            (3, 1, 4010, "purchase"),
        ])
        rows = {r["session_id"]: r for r in session_paths(ev).collect()}
        assert rows[1]["converted"] is False
        assert rows[2]["converted"] is True


class TestAggregates:
    def test_top_paths_orders_count_desc_then_path(self, spark):
        ev = _ev(spark, [
            (1, 1, 0, "a"),
            (2, 2, 0, "b"),
            (3, 3, 0, "b"),
            (4, 4, 0, "a"),
        ])
        rows = top_paths(ev, k=10).collect()
        assert [(r["path"], r["n_sessions"]) for r in rows] == [
            ("a", 2), ("b", 2),
        ]

    def test_entry_conversion_micros_exact(self, spark):
        # 3 'view'-entry sessions, 1 converts → 333333 µ (truncated).
        ev = _ev(spark, [
            (1, 1, 0, "view"), (2, 1, 10, "purchase"),
            (3, 2, 0, "view"),
            (4, 3, 0, "view"),
        ])
        r = {x["entry_type"]: x for x in entry_conversion(ev).collect()}
        assert r["view"]["n_sessions"] == 3
        assert r["view"]["n_converted"] == 1
        assert r["view"]["conversion_micros"] == 333333


class TestPlanShape:
    def test_single_user_exchange_feeds_whole_session_pipeline(
        self, spark, sf_dir
    ):
        """Session assignment, step numbering, AND the per-session
        aggregation must all ride ONE user_id exchange — the step
        window and session groupBy cluster on a superset key, so
        Catalyst may only add sorts. Total exchanges: user_id + the
        tiny path-key aggregation."""
        from pg2kafka_spark.catalog import load_table

        ev = load_table(spark, "events", sf_dir)
        plan = (
            top_paths(ev)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # upper bound, not exact count (r13 advice): the guard is against
        # REGRESSION (an extra session-key exchange); fewer/renamed
        # nodes across Spark versions must not fail spuriously
        assert plan.count("Exchange hashpartitioning") <= 2
        assert "TakeOrderedAndProject" in plan


class TestTransitionMatrix:
    def test_transitions_do_not_cross_sessions(self, spark):
        from pg2kafka_spark.operators.paths import transition_matrix

        # view→(gap)→purchase: the purchase opens a NEW session, so
        # NO view→purchase transition may appear.
        ev = _ev(spark, [
            (1, 1, 0, "view"),
            (2, 1, 4000, "purchase"),
            (3, 1, 4010, "error"),
        ])
        rows = {(r["from_type"], r["to_type"]): r
                for r in transition_matrix(ev).collect()}
        assert ("view", "purchase") not in rows
        assert rows[("purchase", "error")]["n_transitions"] == 1

    def test_row_normalization_exact_micros(self, spark):
        from pg2kafka_spark.operators.paths import transition_matrix

        # from 'a': 2× to 'b', 1× to 'c' → 666666 / 333333 µ.
        ev = _ev(spark, [
            (1, 1, 0, "a"), (2, 1, 1, "b"),
            (3, 2, 0, "a"), (4, 2, 1, "b"),
            (5, 3, 0, "a"), (6, 3, 1, "c"),
        ])
        rows = {(r["from_type"], r["to_type"]): r["prob_micros"]
                for r in transition_matrix(ev).collect()}
        assert rows[("a", "b")] == 666666
        assert rows[("a", "c")] == 333333

    def test_event_id_tiebreak_orders_transitions(self, spark):
        from pg2kafka_spark.operators.paths import transition_matrix

        ev = _ev(spark, [(2, 1, 0, "b"), (1, 1, 0, "a")])
        rows = {(r["from_type"], r["to_type"])
                for r in transition_matrix(ev).collect()}
        assert rows == {("a", "b")}

    def test_matrix_aggregates_on_tiny_domain(self, spark, sf_dir):
        """The event-sized stage must end at the (from,to) partial
        aggregation: one user_id exchange, one (from,to) exchange,
        one from_type window exchange over the aggregated frame."""
        from pg2kafka_spark.catalog import load_table
        from pg2kafka_spark.operators.paths import transition_matrix

        ev = load_table(spark, "events", sf_dir)
        plan = (
            transition_matrix(ev)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") <= 3


class TestSessionFunnel:
    def test_conversion_must_complete_within_one_session(self, spark):
        """view→click split across a session gap must NOT count: the
        in-session funnel is stricter than the lifetime funnel."""
        from pg2kafka_spark.operators.funnel import ordered_funnel

        ev = _ev(spark, [
            (1, 1, 0, "view"),
            (2, 1, 4000, "click"),      # next session — lifetime-only
            (3, 2, 0, "view"),
            (4, 2, 10, "click"),         # same session — counts
            (5, 2, 20, "purchase"),
        ])
        sess = assign_sessions(ev)
        rows = {
            r["event_type"]: r["n_sessions"]
            for r in ordered_funnel(
                sess,
                ["view", "click", "purchase"],
                user_col=["user_id", "session_id"],
                count_alias="n_sessions",
            ).collect()
        }
        # sessions containing a view: user1-session1 + user2-session1
        # (user1's click landed in a view-less second session)
        assert rows == {"view": 2, "click": 1, "purchase": 1}

    def test_composite_key_fold_matches_single_key_when_one_session(
        self, spark
    ):
        """With every user in a single session the composite fold must
        equal the plain per-user funnel."""
        from pg2kafka_spark.operators.funnel import ordered_funnel

        ev = _ev(spark, [
            (1, 1, 0, "view"), (2, 1, 5, "click"), (3, 1, 9, "purchase"),
            (4, 2, 0, "view"), (5, 2, 3, "click"),
        ])
        sess = assign_sessions(ev)
        by_session = {
            (r["step"], r["n_sessions"])
            for r in ordered_funnel(
                sess, ["view", "click", "purchase"],
                user_col=["user_id", "session_id"],
                count_alias="n_sessions",
            ).collect()
        }
        by_user = {
            (r["step"], r["n_users"])
            for r in ordered_funnel(
                sess, ["view", "click", "purchase"]
            ).collect()
        }
        assert by_session == by_user


class TestWindowedConversion:
    """The max-conversion band (r14): purchase must land within
    window_us of the session's ENTRY event, not merely inside the
    session."""

    def test_purchase_outside_band_does_not_convert(self, spark):
        # session stays open (gaps < 30 min) but the purchase lands
        # 900 s after entry — outside a 600 s band, inside the session
        ev = _ev(spark, [
            (1, 1, 0, "view"),
            (2, 1, 450, "click"),
            (3, 1, 900, "purchase"),
        ])
        unbanded = session_paths(ev).collect()[0]
        banded = session_paths(ev, window_us=600_000_000).collect()[0]
        assert unbanded["converted"] is True
        assert banded["converted"] is False

    def test_purchase_at_band_edge_converts(self, spark):
        ev = _ev(spark, [
            (1, 1, 0, "view"),
            (2, 1, 600, "purchase"),   # exactly window_us after entry
        ])
        banded = session_paths(ev, window_us=600_000_000).collect()[0]
        assert banded["converted"] is True

    def test_entry_purchase_still_not_converted(self, spark):
        # a session OPENING on purchase converted from nothing — the
        # band must not change that rule
        ev = _ev(spark, [
            (1, 1, 0, "purchase"),
            (2, 1, 10, "view"),
        ])
        banded = session_paths(ev, window_us=600_000_000).collect()[0]
        assert banded["converted"] is False

    def test_first_qualifying_purchase_decides(self, spark):
        # late purchase outside the band, but an EARLIER one inside:
        # converted (min-ts semantics)
        ev = _ev(spark, [
            (1, 1, 0, "view"),
            (2, 1, 100, "purchase"),
            (3, 1, 900, "purchase"),
        ])
        banded = session_paths(ev, window_us=600_000_000).collect()[0]
        assert banded["converted"] is True

    def test_entry_conversion_windowed_rollup(self, spark):
        ev = _ev(spark, [
            (1, 1, 0, "view"), (2, 1, 100, "purchase"),   # in band
            (3, 2, 0, "view"), (4, 2, 900, "purchase"),   # out of band
            (5, 3, 0, "click"),                            # no purchase
        ])
        rows = {
            r["entry_type"]: r
            for r in entry_conversion(
                ev, window_us=600_000_000
            ).collect()
        }
        assert rows["view"]["n_sessions"] == 2
        assert rows["view"]["n_converted"] == 1
        assert rows["view"]["conversion_micros"] == 500000
        assert rows["click"]["n_converted"] == 0

    def test_top_paths_windowed_counts_banded_conversions(self, spark):
        # same path travelled by three users: one converts in-band,
        # one out-of-band, one never — n_sessions counts all three,
        # n_converted only the in-band one
        ev = _ev(spark, [
            (1, 1, 0, "view"), (2, 1, 100, "purchase"),
            (3, 2, 0, "view"), (4, 2, 900, "purchase"),
            (5, 3, 0, "view"), (6, 3, 50, "click"),
        ])
        rows = {
            r["path"]: r
            for r in top_paths(ev, window_us=600_000_000).collect()
        }
        assert rows["view>purchase"]["n_sessions"] == 2
        assert rows["view>purchase"]["n_converted"] == 1
        assert rows["view>click"]["n_converted"] == 0
        # unwindowed ranking keeps its original 2-column shape
        plain = top_paths(ev).columns
        assert plain == ["path", "n_sessions"]
