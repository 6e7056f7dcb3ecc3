"""Temporal-join operators (operators/temporal.py): brute-force
equivalence against the naive theta-join formulation, edge cases the
sf fixtures don't cover, and plan-shape guards (the whole point of the
bucketed/union formulations is what they DON'T plan: no
nested-loop join, no per-row join node for as-of)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from pg2kafka_spark.catalog import load_table
from pg2kafka_spark.operators.temporal import asof_join, interval_join


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _events_orders(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    od = load_table(spark, "orders", sf_dir).select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_us"),
    )
    return ev, od


def test_asof_join_matches_bruteforce(spark, sf_dir):
    ev, od = _events_orders(spark, sf_dir)
    got = asof_join(
        ev,
        od,
        key_cols=[("user_id", "o_custkey")],
        left_ts="ts_us",
        right_ts="o_us",
        right_cols=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
    ).select("event_id", "asof_o_orderkey", "asof_o_totalprice")

    # naive: left join on key + time band, keep max-(o_us, o_orderkey)
    exp = (
        ev.join(od, (ev.user_id == od.o_custkey) & (od.o_us <= ev.ts_us), "left")
        .groupBy("event_id")
        .agg(
            F.max_by(
                F.struct("o_orderkey", "o_totalprice"), F.struct("o_us", "o_orderkey")
            ).alias("m")
        )
        .select(
            "event_id",
            F.col("m.o_orderkey").alias("asof_o_orderkey"),
            F.col("m.o_totalprice").alias("asof_o_totalprice"),
        )
    )
    assert got.count() == ev.count()
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_asof_join_edges(spark):
    # equal timestamp is inclusive; tie on timestamp takes max tiebreak;
    # no prior right row -> NULLs; keys never cross.
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 50, "b"), (2, 10, "c")], "k long, t long, tag string"
    )
    right = spark.createDataFrame(
        [(1, 100, 7), (1, 100, 9), (1, 60, 1), (9, 5, 99)], "k long, t long, rid int"
    )
    out = {
        r["tag"]: r["asof_rid"]
        for r in asof_join(
            left,
            right,
            key_cols=[("k", "k")],
            left_ts="t",
            right_ts="t",
            right_cols=["rid"],
            tiebreak="rid",
        ).collect()
    }
    assert out == {"a": 9, "b": None, "c": None}


def test_asof_join_plan_has_single_shuffle_no_join(spark, sf_dir):
    ev, od = _events_orders(spark, sf_dir)
    p = _plan(
        asof_join(
            ev,
            od,
            key_cols=[("user_id", "o_custkey")],
            left_ts="ts_us",
            right_ts="o_us",
            right_cols=["o_orderkey"],
            tiebreak="o_orderkey",
        )
    )
    assert "Join" not in p  # union trick: no join node at all
    assert p.count(" Exchange (") == 1  # one hash exchange on the key
    assert "Window" in p


def test_interval_join_matches_bruteforce(spark, sf_dir):
    ev, od = _events_orders(spark, sf_dir)
    week = 7 * 86400 * 1_000_000
    iv = od.withColumn("end_us", F.col("o_us") + week)
    got = interval_join(
        ev,
        iv,
        key_cols=[("user_id", "o_custkey")],
        point_ts="ts_us",
        start_ts="o_us",
        end_ts="end_us",
        bucket=week,
    ).select("event_id", "o_orderkey")
    exp = ev.join(
        iv,
        (ev.user_id == iv.o_custkey) & (ev.ts_us >= iv.o_us) & (ev.ts_us < iv.end_us),
    ).select("event_id", "o_orderkey")
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0
    assert got.count() == exp.count()


def test_interval_join_edges(spark):
    # half-open [start, end): end excluded, start included; an interval
    # wider than the bucket matches points in every covered bucket; a
    # zero-length interval matches nothing but doesn't error.
    pts = spark.createDataFrame(
        [(1, 0), (1, 10), (1, 19), (1, 20), (1, 35)], "k long, t long"
    )
    ivs = spark.createDataFrame(
        [(1, 10, 20, "ten"), (1, 0, 36, "wide"), (1, 5, 5, "empty")],
        "k long, s long, e long, name string",
    )
    got = sorted(
        (r["t"], r["name"])
        for r in interval_join(
            pts, ivs, [("k", "k")], "t", "s", "e", bucket=10
        ).collect()
    )
    assert got == [
        (0, "wide"),
        (10, "ten"),
        (10, "wide"),
        (19, "ten"),
        (19, "wide"),
        (20, "wide"),
        (35, "wide"),
    ]


def test_interval_join_plan_is_equijoin(spark, sf_dir):
    ev, od = _events_orders(spark, sf_dir)
    week = 7 * 86400 * 1_000_000
    iv = od.withColumn("end_us", F.col("o_us") + week)
    p = _plan(
        interval_join(
            ev, iv, [("user_id", "o_custkey")], "ts_us", "o_us", "end_us", bucket=week
        )
    )
    # the naive range predicate would plan BroadcastNestedLoopJoin
    assert "NestedLoop" not in p and "CartesianProduct" not in p


def test_gap_filled_rollup_zero_fills_empty_buckets(spark):
    from datetime import datetime

    from pg2kafka_spark.operators.temporal import gap_filled_rollup

    rows = [
        ("a", datetime(2024, 1, 1, 0, 10), 1.0),
        ("a", datetime(2024, 1, 1, 3, 59), 2.0),  # hours 1,2 empty for a
        ("b", datetime(2024, 1, 1, 1, 30), 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = gap_filled_rollup(
        df,
        ts_col="ts",
        dim_cols=["k"],
        unit="hour",
        aggs={"n": F.count(F.lit(1)), "s": F.round(F.sum("v"), 2)},
        fills={"n": F.lit(0), "s": F.lit(0.0)},
    )
    got = {(r["k"], r["bucket"].hour): (r["n"], r["s"]) for r in out.collect()}
    # spine spans hours 0..3 for BOTH dims (bounds are global)
    assert len(got) == 8
    assert got[("a", 0)] == (1, 1.0)
    assert got[("a", 1)] == (0, 0.0)
    assert got[("a", 2)] == (0, 0.0)
    assert got[("a", 3)] == (1, 2.0)
    assert got[("b", 1)] == (1, 5.0)
    assert got[("b", 0)] == (0, 0.0)


def test_asof_and_interval_join_fuzz_vs_python_oracle(spark):
    """Seeded-random keys/timestamps (heavy ties, sparse keys) through
    both operators in one Spark job each, checked against a plain
    Python oracle of the definitions."""
    import random

    rng = random.Random(42)
    left = [(rng.randint(1, 8), rng.randint(0, 50), i) for i in range(300)]
    right = [(rng.randint(1, 8), rng.randint(0, 50), 1000 + i) for i in range(200)]
    ldf = spark.createDataFrame(left, "k long, t long, lid long")
    rdf = spark.createDataFrame(right, "k long, t long, rid long")

    got = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(
            ldf, rdf, [("k", "k")], "t", "t", ["rid"], tiebreak="rid"
        ).collect()
    }
    for k, t, lid in left:
        cands = [(rt, rid) for rk, rt, rid in right if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, (lid, got[lid], want)

    width = 7
    # non-key names must be disjoint between sides (enforced)
    ivs = rdf.select("k", F.col("t").alias("s"), "rid").withColumn(
        "e", F.col("s") + width
    )
    import pytest

    with pytest.raises(ValueError, match="collision"):
        interval_join(ldf, rdf, [("k", "k")], "t", "t", "e", bucket=5)
    pairs = {
        (r["lid"], r["rid"])
        for r in interval_join(
            ldf, ivs, [("k", "k")], "t", "s", "e", bucket=5
        ).collect()
    }
    want_pairs = {
        (lid, rid)
        for k, t, lid in left
        for rk, rt, rid in right
        if rk == k and rt <= t < rt + width
    }
    assert pairs == want_pairs


def test_locf_and_interpolate_hand_series(spark):
    """Crafted series with an interior 2-bucket gap, a leading gap,
    and a trailing gap: locf carries forward, interp blends linearly
    by bucket distance, edges backfill/carry."""
    import datetime as dt

    from pyspark.sql import functions as F

    from pg2kafka_spark.operators.temporal import locf_and_interpolate

    h = lambda i: dt.datetime(2024, 1, 1, i)
    rows = [
        ("a", h(0), None),    # leading gap -> backfill from 10.0
        ("a", h(1), 10.0),
        ("a", h(2), None),    # interior gap: 1/3 of the way 10 -> 40
        ("a", h(3), None),    # 2/3 of the way
        ("a", h(4), 40.0),
        ("a", h(5), None),    # trailing gap -> carry 40.0
    ]
    df = spark.createDataFrame(rows, ["event_type", "bucket", "sum_value"])
    out = {
        r["bucket"].hour: r
        for r in locf_and_interpolate(
            df, "bucket", ["event_type"], "sum_value"
        ).collect()
    }
    assert out[0]["sum_value_locf"] is None
    assert out[0]["sum_value_interp"] == 10.0
    assert out[1]["sum_value_interp"] == 10.0
    assert out[2]["sum_value_locf"] == 10.0
    assert out[2]["sum_value_interp"] == 20.0
    assert out[3]["sum_value_interp"] == 30.0
    assert out[4]["sum_value_interp"] == 40.0
    assert out[5]["sum_value_locf"] == 40.0
    assert out[5]["sum_value_interp"] == 40.0


def test_locf_interpolate_fuzz_vs_python_reference(spark):
    """Property fuzz: arbitrary gap patterns against an independent
    Python reference for both fill modes."""
    import datetime as dt

    from hypothesis import given, settings, strategies as st
    from pyspark.sql import functions as F

    from pg2kafka_spark.operators.temporal import locf_and_interpolate

    def ref(vals):
        n = len(vals)
        obs = [(i, v) for i, v in enumerate(vals) if v is not None]
        locf, interp = [], []
        for i, v in enumerate(vals):
            prev = next(((j, x) for j, x in reversed(obs) if j <= i), None)
            nxt = next(((j, x) for j, x in obs if j >= i), None)
            locf.append(prev[1] if prev else None)
            if v is not None:
                interp.append(float(v))
            elif prev is None:
                interp.append(float(nxt[1]) if nxt else None)
            elif nxt is None:
                interp.append(float(prev[1]))
            else:
                (pj, pv), (nj, nv) = prev, nxt
                frac = (i - pj) * 3600 * 1.0 / ((nj - pj) * 3600)
                interp.append(round(pv + (nv - pv) * frac, 6))
        return locf, interp

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.one_of(
                st.none(),
                st.floats(
                    min_value=-100, max_value=100,
                    allow_nan=False, allow_infinity=False,
                ).map(lambda x: round(x, 2)),
            ),
            min_size=1,
            max_size=10,
        )
    )
    def check(vals):
        base = dt.datetime(2024, 3, 1)
        rows = [
            ("k", base + dt.timedelta(hours=i), v)
            for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(
            rows, "event_type string, bucket timestamp, sum_value double"
        )
        out = sorted(
            locf_and_interpolate(
                df, "bucket", ["event_type"], "sum_value"
            ).collect(),
            key=lambda r: r["bucket"],
        )
        want_locf, want_interp = ref(vals)
        got_locf = [r["sum_value_locf"] for r in out]
        got_interp = [r["sum_value_interp"] for r in out]
        assert got_locf == want_locf, (vals, got_locf, want_locf)
        for g, w in zip(got_interp, want_interp):
            if w is None:
                assert g is None
            else:
                assert abs(g - w) < 1e-9, (vals, got_interp, want_interp)

    check()
