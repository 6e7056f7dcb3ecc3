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


def test_count_min_never_underestimates_and_flags_planted_hitter(spark):
    """CM is overestimate-only (min over depth rows of colliding-key
    sums ≥ the key's own count), and a planted key owning ~30% of the
    stream must be flagged heavy while the long tail is not."""
    rows = [(777,)] * 300 + [(i,) for i in range(700)]
    df = spark.createDataFrame(rows, "user_id long")
    out = K.count_min_heavy_hitters(df, "user_id", width=64, phi=0.05).collect()
    assert len(out) == 701
    by_id = {r["user_id"]: r for r in out}
    for r in out:
        assert r["cm_est"] >= r["exact_n"], (r["user_id"], r["cm_est"], r["exact_n"])
    assert by_id[777]["exact_n"] == 300 and by_id[777]["is_heavy"]
    # tail keys: exact 1 of 1000 — only collision-inflated estimates
    # could flag them; with depth 4 the min row keeps them below 5%
    n_false = sum(1 for r in out if r["user_id"] != 777 and r["is_heavy"])
    assert n_false == 0, f"{n_false} tail keys wrongly flagged heavy"


def test_count_min_width_tightens_error(spark):
    """Widening the sketch reduces total overestimate — the e/width·N
    error bound in action."""
    rows = [(i % 97,) for i in range(2000)]
    df = spark.createDataFrame(rows, "user_id long")
    err = {}
    for w in (16, 256):
        out = K.count_min_heavy_hitters(df, "user_id", width=w).collect()
        err[w] = sum(r["cm_est"] - r["exact_n"] for r in out)
    assert err[256] < err[16], err


def test_bloom_no_false_negatives_and_designed_fp_rate(spark):
    """Every inserted key must pass (Bloom guarantees no false
    negatives); disjoint probe keys pass only at ~the designed
    false-positive rate."""
    keys = spark.range(3000).select((F.col("id") * 7 + 1).alias("k"))
    bloom = K.bloom_build(keys, "k", m_bits=32768, k=3)
    probe_in = keys.crossJoin(F.broadcast(bloom)).select(
        K.bloom_might_contain(F.col("k"), F.col("bloom")).alias("p")
    )
    assert probe_in.filter(~F.col("p")).count() == 0
    # disjoint probes: ids shifted out of the inserted key range
    probe_out = (
        spark.range(5000)
        .select((F.col("id") * 7 + 1_000_000).alias("k"))
        .crossJoin(F.broadcast(bloom))
        .select(K.bloom_might_contain(F.col("k"), F.col("bloom")).alias("p"))
    )
    fp = probe_out.filter(F.col("p")).count() / 5000
    # designed rate (1 - e^(-k n / m))^k ≈ 1.3% for n=3000, m=32768, k=3
    assert fp < 0.05, f"false-positive rate {fp:.3f}"
