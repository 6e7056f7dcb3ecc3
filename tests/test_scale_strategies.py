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


def test_z_value_interleaves_bits(spark):
    from pg2kafka_spark.operators import layout as L

    df = spark.createDataFrame([(0b101, 0b011)], ["a", "b"])
    (z,) = df.select(
        L.z_value(F.col("a"), F.col("b"), bits=3).alias("z")
    ).first()
    # a=101 -> odd positions 5,1 set (32+2); b=011 -> even positions 2,0 (4+1)
    assert z == 32 + 2 + 4 + 1 == 39


def test_quantize_is_bounded_and_monotone(spark):
    from pg2kafka_spark.operators import layout as L

    rows = [(v,) for v in (0, 1, 499, 500, 999, 1000)]
    df = spark.createDataFrame(rows, ["v"])
    out = df.select(
        F.col("v"),
        L.quantize(
            F.col("v").cast("long"), F.lit(0).cast("long"),
            F.lit(1000).cast("long"), bits=4
        ).alias("q"),
    ).collect()
    qs = {r["v"]: r["q"] for r in out}
    assert qs[0] == 0 and qs[1000] == 15
    assert all(0 <= q <= 15 for q in qs.values())
    vals = [qs[v] for v in (0, 1, 499, 500, 999, 1000)]
    assert vals == sorted(vals)


def test_zorder_buckets_cover_small_rectangles(spark, sf_dir):
    """The point of the layout: each z-bucket's envelope spans a
    small fraction of BOTH dimensions, so 2-D range predicates prune
    multiplicatively. With bucket_bits=6 each bucket is the top 3
    quantized bits per dim -> ~1/8 of each range (+1 quant cell)."""
    from pg2kafka_spark.catalog import load_table
    from pg2kafka_spark.operators import layout as L

    li = load_table(spark, "lineitem", sf_dir)
    day = F.datediff(F.col("l_shipdate"), F.lit("1970-01-01"))
    stats = L.zorder_bucket_stats(
        li, day=day, key=F.col("l_partkey"), bits=8, bucket_bits=6
    ).collect()
    assert len(stats) > 8
    for r in stats:
        assert r["day_extent_frac"] <= 0.2, r
        assert r["key_extent_frac"] <= 0.2, r
    # and the buckets tile the corpus: every row landed somewhere
    assert sum(r["n_rows"] for r in stats) == li.count()


def test_zorder_write_produces_tight_file_envelopes(spark, sf_dir, tmp_path):
    """End-to-end layout proof: range-partition+sort on the z-value,
    WRITE parquet, and read the per-file min/max envelopes back from
    the actual footers (what a scan planner prunes on). Each file's
    envelope must cover a small fraction of BOTH dimensions — vs ~1.0
    for the unsorted layout."""
    import pyarrow.parquet as pq

    from pg2kafka_spark.catalog import load_table
    from pg2kafka_spark.operators import layout as L

    li = load_table(spark, "lineitem", sf_dir).select(
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01"))
        .cast("long")
        .alias("day"),
        F.col("l_partkey").cast("long").alias("key"),
    )
    lo_d, hi_d, lo_k, hi_k = li.agg(
        F.min("day"), F.max("day"), F.min("key"), F.max("key")
    ).first()
    qd = L.quantize(F.col("day"), F.lit(lo_d), F.lit(hi_d), 8)
    qk = L.quantize(F.col("key"), F.lit(lo_k), F.lit(hi_k), 8)
    z = L.z_value(qd, qk, 8)

    out = str(tmp_path / "zorder")
    L.zorder_repartition(li, z, num_partitions=16).write.mode(
        "overwrite"
    ).parquet(out)

    import glob

    day_span = hi_d - lo_d + 1
    key_span = hi_k - lo_k + 1
    fracs = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        d_lo = k_lo = None
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            cols = {
                row.column(i).path_in_schema: row.column(i).statistics
                for i in range(row.num_columns)
            }
            s_d, s_k = cols["day"], cols["key"]
            d_lo = s_d.min if d_lo is None else min(d_lo, s_d.min)
            k_lo = s_k.min if k_lo is None else min(k_lo, s_k.min)
            d_hi = s_d.max if rg == 0 else max(d_hi, s_d.max)
            k_hi = s_k.max if rg == 0 else max(k_hi, s_k.max)
        if d_lo is None:
            continue
        fracs.append(
            (
                (d_hi - d_lo + 1) / day_span,
                (k_hi - k_lo + 1) / key_span,
            )
        )
    assert len(fracs) >= 8
    mean_d = sum(f[0] for f in fracs) / len(fracs)
    mean_k = sum(f[1] for f in fracs) / len(fracs)
    # 16 z-contiguous files over an 8-bit x 8-bit plane: each should
    # cover well under half of each dimension (exact widths depend on
    # the sampled range boundaries; unsorted layout gives ~1.0)
    assert mean_d < 0.5, (mean_d, fracs)
    assert mean_k < 0.5, (mean_k, fracs)


def test_hilbert_value_matches_reference_algorithm(spark):
    from pg2kafka_spark.operators import layout as L

    def xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    pts = [(x, y) for x in range(0, 256, 37) for y in range(0, 256, 41)]
    pts += [(0, 0), (255, 255), (0, 255), (255, 0)]
    df = spark.createDataFrame(pts, ["x", "y"])
    out = L.with_hilbert_value(
        df, F.col("x").cast("long"), F.col("y").cast("long"), 8, "hd"
    ).collect()
    for r in out:
        assert r["hd"] == xy2d(256, r["x"], r["y"]), (r["x"], r["y"])
    # a Hilbert index is a bijection onto [0, 4^bits)
    small = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], ["x", "y"]
    )
    hs = [
        r["hd"]
        for r in L.with_hilbert_value(
            small, F.col("x").cast("long"), F.col("y").cast("long"), 3, "hd"
        ).collect()
    ]
    assert sorted(hs) == list(range(64))


def test_hilbert_buckets_cover_small_rectangles(spark, sf_dir):
    from pg2kafka_spark.catalog import load_table
    from pg2kafka_spark.operators import layout as L

    li = load_table(spark, "lineitem", sf_dir)
    day = F.datediff(F.col("l_shipdate"), F.lit("1970-01-01"))
    stats = L.hilbert_bucket_stats(
        li, day=day, key=F.col("l_partkey"), bits=8, bucket_bits=6
    ).collect()
    assert len(stats) > 8
    assert sum(r["n_rows"] for r in stats) == li.count()
    for r in stats:
        assert r["day_extent_frac"] <= 0.2, r
        assert r["key_extent_frac"] <= 0.2, r


def test_quantize_exact_at_64bit_extremes(spark):
    """The DECIMAL(38) quantizer claims exactness for ANY 64-bit
    input — double math would silently misbucket past 2^53. Check
    against Python big-int floor division at the extremes."""
    from pg2kafka_spark.operators import layout as L

    lo, hi = -(1 << 62), (1 << 62) - 1
    span = hi - lo + 1
    vals = [
        lo, hi, 0, 1, -1,
        (1 << 53) + 1, -(1 << 53) - 1,
        (1 << 61) + 12345, -(1 << 61) - 54321,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = {
        r["v"]: r["q"]
        for r in df.select(
            "v",
            L.quantize(
                F.col("v"), F.lit(lo).cast("long"),
                F.lit(hi).cast("long"), 8,
            ).alias("q"),
        ).collect()
    }
    for v in vals:
        want = min(255, ((v - lo) * 256) // span)
        assert out[v] == want, (v, out[v], want)


def test_per_key_cap_fuzz_matches_naive_window(spark):
    from hypothesis import given, settings, strategies as st
    from pyspark.sql import Window

    from pg2kafka_spark.operators.assembly import per_key_cap
    from pg2kafka_spark.operators.sketch import portable_int_hash

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=500),
                st.sampled_from(["a", "b", "c"]),
            ),
            min_size=1,
            max_size=40,
            unique_by=lambda t: t[0],
        ),
        st.integers(min_value=1, max_value=6),
        st.integers(min_value=1, max_value=8),
    )
    def check(rows, cap, n_salts):
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        got = {
            (r["doc_id"], r["key_rank"])
            for r in per_key_cap(
                df, key_col="source", id_col="doc_id",
                cap=cap, n_salts=n_salts,
            ).collect()
        }
        h = portable_int_hash(F.col("doc_id"))
        w = Window.partitionBy("source").orderBy(h, F.col("doc_id"))
        want = {
            (r["doc_id"], r["key_rank"])
            for r in df.withColumn("key_rank", F.row_number().over(w))
            .filter(F.col("key_rank") <= cap)
            .collect()
        }
        assert got == want, (rows, cap, n_salts)

    check()


@pytest.mark.heavy_e2e
def test_ivf_index_save_load_roundtrip_prunes_partitions(spark, sf_dir, tmp_path):
    """The index AT REST (r8): save_ivf_index writes centroids + a
    cid-partitioned cells layout; load_ivf_topk must (a) return
    bit-identical results to the in-memory ivf_topk over the same
    corpus (deterministic training + assignment), and (b) plan the
    probe join with DYNAMIC PARTITION PRUNING on the cells scan — the
    serving read path touches n_probe/n_centroids of the index, not a
    full scan."""
    import contextlib
    import io
    import os

    from pyspark.sql import functions as F

    from pg2kafka_spark.catalog import load_table
    from pg2kafka_spark.operators import similarity as S
    from pg2kafka_spark.operators.index_store import (
        load_ivf_topk,
        save_ivf_index,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "ivfidx")
    save_ivf_index(emb, path)
    # at-rest layout: one directory per inverted list
    assert sorted(
        d for d in os.listdir(f"{path}/cells") if d.startswith("cid=")
    )
    got = load_ivf_topk(spark, path, queries, k=3)
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, S.ivf_topk(emb, queries, k=3).collect()))
    assert a == b and len(a) == 15
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    p = buf.getvalue()
    assert "dynamicpruning" in p.lower()
    assert "PartitionFilters" in p


@pytest.mark.heavy_e2e
def test_ivf_pq_index_stores_codes_and_serves_identically(spark, sf_dir, tmp_path):
    """The COMPRESSED index at rest (r8): cells hold (id, codes[m]) —
    raw vectors are NOT stored — plus tiny centroid/codebook tables.
    Serving must reconstruct probed rows from their code words against
    the broadcast codebooks and return bit-identical results to the
    in-memory ivf_pq_topk, with the cells scan dynamic-partition-
    pruned to the probed lists."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from pg2kafka_spark.catalog import load_table
    from pg2kafka_spark.operators import similarity as S
    from pg2kafka_spark.operators.index_store import (
        load_ivf_pq_topk,
        save_ivf_pq_index,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "pqidx")
    save_ivf_pq_index(emb, path)
    # the stored representation is the m code words, not the vector
    cells = spark.read.parquet(f"{path}/cells")
    assert set(cells.columns) == {"vec_id", "codes", "cid"}
    assert cells.select(F.size("codes")).distinct().collect()[0][0] == 8
    got = load_ivf_pq_topk(spark, path, queries, k=3)
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, S.ivf_pq_topk(emb, queries, k=3).collect()))
    assert a == b and len(a) == 15
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    p = buf.getvalue()
    assert "dynamicpruning" in p.lower()
    assert "PartitionFilters" in p


def test_spread_small_input_spreads_small_and_fails_open(spark):
    """spread_small_input must (a) fan a tiny input out to the
    session's parallelism, and (b) be IDENTITY when the optimizer
    size estimate is unavailable — the r14 fallback repartitioned
    unconditionally, which at 100 TB would turn a transient stats
    failure into a full-table shuffle (ADVICE r14, medium)."""
    from unittest import mock

    from pg2kafka_spark.operators.scale import spread_small_input

    target = spark.sparkContext.defaultParallelism
    df = spark.range(100).coalesce(1)
    spread = spread_small_input(df)
    assert spread.rdd.getNumPartitions() == target

    # Break the internal stats probe (instance attribute in pyspark 4):
    # the helper must return the SAME frame, not a repartitioned one.
    real_jdf = df._jdf
    try:
        df._jdf = mock.Mock(
            queryExecution=mock.Mock(side_effect=RuntimeError("no stats"))
        )
        assert spread_small_input(df) is df
    finally:
        df._jdf = real_jdf


def test_spread_small_input_keyed_hash_spread(spark):
    """Keyed spread (r20): ``key=`` must produce a HASH repartition at
    the session's parallelism — not round-robin, whose
    sortBeforeRepartition local sort was the dominant cost of the
    serial scan task the spread exists to relieve — and stay identity
    when stats are unavailable."""
    from unittest import mock

    from pg2kafka_spark.operators.scale import spread_small_input

    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).coalesce(1)
    spread = spread_small_input(df, key="id")
    assert spread.rdd.getNumPartitions() == target
    plan = spread._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" in plan
    assert "RoundRobinPartitioning" not in plan

    real_jdf = df._jdf
    try:
        df._jdf = mock.Mock(
            queryExecution=mock.Mock(side_effect=RuntimeError("no stats"))
        )
        assert spread_small_input(df, key="id") is df
    finally:
        df._jdf = real_jdf


def test_spread_small_input_identity_above_threshold(spark):
    """The at-scale branch: when the optimizer's size estimate says
    the input already exceeds parallelism × 128 MiB, the helper must
    return the SAME frame — spreading a 100 TB scan would be a
    full-table shuffle."""
    from unittest import mock

    from pg2kafka_spark.operators.scale import spread_small_input

    df = spark.range(10)
    big = mock.Mock()
    big.queryExecution.return_value.optimizedPlan.return_value.stats.return_value.sizeInBytes.return_value = (
        1 << 60
    )
    real = df._jdf
    try:
        df._jdf = big
        assert spread_small_input(df) is df
    finally:
        df._jdf = real
