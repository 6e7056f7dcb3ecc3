"""Scale-strategy tests: skew salting and bucketed co-located joins.

These verify the *mechanisms* the engine reaches for when data
outgrows the happy path — salting when a single key is hot (AQE can
split partitions, not keys), bucketing when two fact tables join on
the same key repeatedly (pay the shuffle once at write time, never at
read time).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from pg2kafka_spark.catalog import load_table
from pg2kafka_spark.operators.skew import salted_agg, salted_join


def test_salted_agg_matches_direct_groupby(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    direct = {
        r.user_id: (r.n, r.total, r.mx, r.av)
        for r in ev.groupBy("user_id")
        .agg(
            F.count("event_id").alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("mx"),
            F.avg("value").alias("av"),
        )
        .collect()
    }
    salted = {
        r.user_id: (r.n, r.total, r.mx, r.av)
        for r in salted_agg(
            ev,
            ["user_id"],
            {
                "n": ("count", "event_id"),
                "total": ("sum", "value"),
                "mx": ("max", "value"),
                "av": ("avg", "value"),
            },
            salt=8,
        ).collect()
    }
    assert direct.keys() == salted.keys()
    for k, (n, total, mx, av) in direct.items():
        sn, st, sm, sa = salted[k]
        assert sn == n and sm == mx
        assert abs(st - total) < 1e-6 * max(1.0, abs(total))  # float re-order
        assert abs(sa - av) < 1e-9 * max(1.0, abs(av))


def test_salted_join_matches_plain_join_on_skewed_key(spark):
    # Zipfian big side: 10k rows of one hot key + a uniform tail.
    big = spark.range(0, 12000).select(
        F.when(F.col("id") < 10000, F.lit(7)).otherwise(F.col("id") % 40).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame([Row(k=i, label=f"L{i}") for i in range(40)])
    plain = big.join(small, "k").groupBy("k", "label").count()
    salted = salted_join(big, small, "k", salt=8).groupBy("k", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Pay the partitioning once at write time: two tables bucketed by
    the join key co-locate, and the join plan has NO exchange — the
    pattern for repeated fact-fact joins (e.g. events ⋈ events
    history) at 100 TB."""
    ev = spark.range(0, 5000).select(
        (F.col("id") % 97).alias("user_id"), F.col("id").alias("event_id")
    )
    profiles = spark.range(0, 97).select(
        F.col("id").alias("user_id"), (F.col("id") * 10).alias("score")
    )
    for name, df in [("ev_bucketed", ev), ("prof_bucketed", profiles)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .option("path", str(tmp_path / name))
            .bucketBy(8, "user_id")
            .sortBy("user_id")
            .saveAsTable(name)
        )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast plan so co-location is what's tested
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("ev_bucketed").join(spark.table("prof_bucketed"), "user_id")
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert " Exchange (" not in plan  # bucket layout replaces the shuffle
        # and the result is right
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        for name in ("ev_bucketed", "prof_bucketed"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
