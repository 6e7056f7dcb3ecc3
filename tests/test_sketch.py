"""Portable-sketch accuracy: the DuckDB oracle proves the Spark and
SQL formulations compute the SAME numbers; these prove the numbers
are USEFUL — the HLL estimate lands near the exact distinct count and
the histogram quantile near the exact percentile."""

from __future__ import annotations

from pyspark.sql import functions as F

from pg2kafka_spark.operators import sketch as K


def test_hll_estimate_tracks_exact_distinct(spark):
    # three groups with known cardinalities spanning the linear-
    # counting and raw-estimator regimes of m=64
    rows = [("lo", i % 23) for i in range(200)]
    rows += [("mid", i % 150) for i in range(600)]
    rows += [("hi", i) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, uid long")
    est = {
        r["g"]: r["e"]
        for r in K.hll_distinct(df, ["g"], "uid", "e").collect()
    }
    for g, exact in (("lo", 23), ("mid", 150), ("hi", 2000)):
        # m=64 → rsd ≈ 1.04/sqrt(64) ≈ 13%; allow 3 sigma
        assert abs(est[g] - exact) / exact < 0.4, (g, est[g], exact)


def test_hll_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", None), ("a", None)], "g string, uid long"
    )
    got = K.hll_distinct(df, ["g"], "uid", "e").collect()[0]["e"]
    want = K.hll_distinct(
        spark.createDataFrame([("a", 1), ("a", 2)], "g string, uid long"),
        ["g"], "uid", "e",
    ).collect()[0]["e"]
    assert got == want


def test_histogram_quantile_tracks_exact_percentile(spark):
    # uniform-ish values: the bin-interpolated median must land
    # within one bin width (1/16) of the exact percentile
    rows = [("g", (i * 37 % 1000) / 10.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "g string, value double")
    est = K.histogram_quantile(df, ["g"], "value", "p50").collect()[0]["p50"]
    exact = df.agg(F.expr("percentile(value, 0.5)")).collect()[0][0]
    assert abs(est - exact) <= 1.0 / 16 + 1e-9, (est, exact)


def test_histogram_quantile_exact_on_point_mass(spark):
    # all mass in one bin: interpolation stays inside it
    df = spark.createDataFrame([("g", 2.5)] * 10, "g string, value double")
    est = K.histogram_quantile(df, ["g"], "value", "p50").collect()[0]["p50"]
    assert 2.4375 <= est <= 2.5625  # the [2.4375, 2.5) bin ± width
