"""Bucketed-table co-location (operators/bucketed.py): the write pays
one shuffle-equivalent pass, every keyed read after it is
shuffle-free. Plans are pinned on the EXECUTED plan (AQE final)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from pg2kafka_spark.catalog import load_table
from pg2kafka_spark.operators.bucketed import cocluster_join, write_bucketed

SF = "/root/testdata/sf0.001"


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@contextlib.contextmanager
def _no_broadcast(spark):
    """Force real join strategies so Exchange assertions test
    bucketing, not broadcast-size luck."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, "orders", SF)
    li = load_table(spark, "lineitem", SF)
    # one write task -> one file per bucket, the precondition for the
    # reader to trust per-bucket sort order (a multi-file bucket is
    # only PARTITIONED sorted, so the reader must re-sort); production
    # writers get this by repartitioning on the bucket key first
    write_bucketed(
        orders.coalesce(1), "b_orders", "o_orderkey", 8,
        sort_cols=("o_orderkey",), path=str(root / "orders"),
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey").coalesce(1),
        "b_lineitem", "o_orderkey", 8,
        sort_cols=("o_orderkey",), path=str(root / "lineitem"),
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem_16", "o_orderkey", 16,
        path=str(root / "lineitem16"),
    )
    yield
    for t in ("b_orders", "b_lineitem", "b_lineitem_16"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_matched_buckets_join_without_exchange(spark, bucketed_tables):
    """Same (key, n_buckets) on both sides: the join consumes the
    scans in place — ZERO Exchange of any kind in the plan."""
    with _no_broadcast(spark):
        df = cocluster_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        p = _formatted(df)
        assert "Exchange" not in p
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
        # result parity with the plain parquet join
        n = df.count()
    orders = load_table(spark, "orders", SF)
    li = load_table(spark, "lineitem", SF)
    expect = orders.join(
        li, orders.o_orderkey == li.l_orderkey
    ).count()
    assert n == expect


def test_bucket_sorted_single_file_skips_sort(spark, bucketed_tables):
    """sort_cols=(key,) with one file per bucket: the merge join reads
    pre-sorted buckets — no Sort node on either side. Spark 3+ hides
    scan output ordering behind a legacy flag (reading sortedness from
    a MULTI-file bucket was wrong, SPARK-28067 era); with single-file
    buckets it is sound, so the test opts in, scoped."""
    old = spark.conf.get("spark.sql.legacy.bucketedTableScan.outputOrdering")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        with _no_broadcast(spark):
            p = _formatted(
                cocluster_join(spark, "b_orders", "b_lineitem", "o_orderkey")
            )
        assert "SortMergeJoin" in p
        assert " Sort (" not in p
    finally:
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", old
        )


def test_groupby_bucket_key_has_no_exchange(spark, bucketed_tables):
    """Aggregation keyed on the bucket column: bucketing satisfies the
    required hash distribution, so the agg is single-stage."""
    df = (
        spark.table("b_lineitem")
        .groupBy("o_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
    )
    p = _formatted(df)
    assert "Exchange" not in p
    # values still correct vs the plain-parquet aggregation
    li = load_table(spark, "lineitem", SF)
    expect = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q")
    )
    got = {r.o_orderkey: r.q for r in df.collect()}
    want = {r.l_orderkey: r.q for r in expect.collect()}
    assert got == want


def test_mismatched_bucket_counts_degrade_to_shuffle(spark, bucketed_tables):
    """8-bucket vs 16-bucket sides violate the co-location contract:
    the planner must re-shuffle (at least one Exchange) — pinned so
    the degradation mode is a measured fact, not a silent surprise."""
    with _no_broadcast(spark):
        p = _formatted(
            cocluster_join(spark, "b_orders", "b_lineitem_16", "o_orderkey")
        )
    assert "Exchange" in p


def test_ensure_bucketed_registers_without_rewriting(spark):
    """Cross-process completeness gate (r17, catalog.py advice): a
    process whose session catalog lacks the bucketed tables but whose
    shared tempdir holds a _COMPLETE-marked layout must REGISTER the
    existing files (CREATE ... CLUSTERED BY ... LOCATION), never
    rewrite them — a rewrite would race a sibling process mid-read.
    Simulated by dropping the catalog entries (a fresh process's
    empty catalog) with files + marker intact."""
    import os

    from pg2kafka_spark.q_relational import _ensure_bucketed_tables

    tc, to = _ensure_bucketed_tables(spark, SF)
    h = tc.removeprefix("bkt_customer_")
    import tempfile

    root = os.path.join(tempfile.gettempdir(), f"pg2kafka_bucketed_{h}")
    assert os.path.exists(os.path.join(root, "_COMPLETE"))
    before = {r.c_mktsegment: r.n for r in (
        cocluster_join(spark, tc, to, "c_custkey")
        .groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()
    )}

    def _mtimes():
        out = {}
        for sub in ("customer", "orders"):
            d = os.path.join(root, sub)
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    out[f] = os.path.getmtime(os.path.join(d, f))
        return out

    m0 = _mtimes()
    for t in (tc, to):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    tc2, to2 = _ensure_bucketed_tables(spark, SF)
    assert (tc2, to2) == (tc, to)
    assert _mtimes() == m0, "register path must not rewrite files"
    # the re-registered tables keep the (c_custkey, 16) contract: the
    # co-located join plans without an Exchange on the join key
    with _no_broadcast(spark):
        p = _formatted(cocluster_join(spark, tc2, to2, "c_custkey"))
    assert "Exchange hashpartitioning(c_custkey" not in p
    after = {r.c_mktsegment: r.n for r in (
        cocluster_join(spark, tc2, to2, "c_custkey")
        .groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()
    )}
    assert after == before

    # stale / missing marker ⇒ full rebuild (files rewritten)
    os.remove(os.path.join(root, "_COMPLETE"))
    tc3, to3 = _ensure_bucketed_tables(spark, SF)
    assert (tc3, to3) == (tc, to)
    assert os.path.exists(os.path.join(root, "_COMPLETE"))
    assert _mtimes() != m0, "marker removal must force the rebuild"
