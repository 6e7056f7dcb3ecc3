"""Relational-operator stress measurements for BASELINE.md: scale the
fact tables by RELSTRESS_SCALE (orderkey-shifted copies of sf0.1
lineitem/orders/customer keep join keys consistent) and measure the
claims the r12 query docstrings make:

1. part_pair_cooccurrence: basket-explode spelling vs the classic
   fact self-join — the explode must win and the gap must WIDEN with
   scale (the self-join shuffles the fact twice and blows up on hot
   shingle-frequency orders; the explode shuffles bounded pairs).
2. bucketed co-located join vs plain shuffled join on the same
   custkey rollup — the bucketed read must beat re-shuffling the
   fact, the gap widening with scale (the one-shuffle-at-ingest
   trade).

Usage: [RELSTRESS_SCALE=10] PYTHONPATH=. python tools/relational_stress.py
(RELSTRESS_ONLY=cooccurrence,bucketed restricts measurements.)
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from pg2kafka_spark.catalog import load_table
from pg2kafka_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def timed(label: str, df) -> None:
    t0 = time.perf_counter()
    n = df.count()
    print(f"{label:52s} {time.perf_counter() - t0:7.2f} s   n={n}", flush=True)


def main() -> None:
    scale = int(os.environ.get("RELSTRESS_SCALE", "10"))
    only = [t for t in os.environ.get("RELSTRESS_ONLY", "").split(",") if t]

    def want(label: str) -> bool:
        return not only or any(t in label for t in only)

    spark = get_spark("relational-stress")
    li = load_table(spark, "lineitem", SF_DIR).select(
        "l_orderkey", "l_partkey"
    )
    copies = spark.range(scale).select(F.col("id").alias("__c"))
    # orderkey-shifted copies: same basket contents per order, disjoint
    # order keys — pair counts scale exactly ×scale
    fact = li.crossJoin(F.broadcast(copies)).select(
        (F.col("l_orderkey") + F.col("__c") * 100_000_000).alias("l_orderkey"),
        "l_partkey",
    )
    print(f"lineitem rows: {fact.count()}", flush=True)

    if want("cooccurrence"):
        baskets = (
            fact.groupBy("l_orderkey")
            .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
            .filter(F.size("parts") >= 2)
        )
        pairs = baskets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("parts"),
                        lambda a, i: F.transform(
                            F.slice(
                                F.col("parts"), i + 2,
                                F.size(F.col("parts")) - i - 1,
                            ),
                            lambda b: F.struct(
                                a.alias("part_a"), b.alias("part_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        ).select("p.part_a", "p.part_b")
        timed(
            f"cooccurrence basket-explode ({scale}x)",
            pairs.groupBy("part_a", "part_b").agg(
                F.count(F.lit(1)).alias("n")
            ),
        )
        d = fact.distinct()
        a, b = d.alias("a"), d.alias("b")
        selfjoin = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .groupBy(
                F.col("a.l_partkey").alias("part_a"),
                F.col("b.l_partkey").alias("part_b"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )
        timed(f"cooccurrence fact self-join ({scale}x)", selfjoin)

    if want("bucketed"):
        import tempfile

        orders = load_table(spark, "orders", SF_DIR).select(
            "o_custkey", "o_totalprice"
        )
        big_orders = orders.crossJoin(F.broadcast(copies)).select(
            (F.col("o_custkey") + F.col("__c") * 10_000_000).alias("c_custkey"),
            "o_totalprice",
        )
        customer = load_table(spark, "customer", SF_DIR).select(
            "c_custkey", "c_mktsegment"
        )
        big_cust = customer.crossJoin(F.broadcast(copies)).select(
            (F.col("c_custkey") + F.col("__c") * 10_000_000).alias("c_custkey"),
            "c_mktsegment",
        )
        root = tempfile.mkdtemp(prefix="relstress_bkt_")
        from pg2kafka_spark.operators.bucketed import (
            cocluster_join,
            write_bucketed,
        )

        t0 = time.perf_counter()
        write_bucketed(big_cust, "rs_cust", "c_custkey", 32,
                       path=f"{root}/cust")
        write_bucketed(big_orders, "rs_ord", "c_custkey", 32,
                       path=f"{root}/ord")
        print(f"bucketed ingest write ({scale}x)               "
              f"{time.perf_counter() - t0:7.2f} s", flush=True)

        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            agg = (
                cocluster_join(spark, "rs_cust", "rs_ord", "c_custkey")
                .groupBy("c_custkey", "c_mktsegment")
                .agg(F.count(F.lit(1)).alias("n_orders"))
            )
            timed(f"bucketed join+agg ({scale}x, no shuffle)", agg)
            plain = (
                big_cust.join(big_orders, "c_custkey")
                .groupBy("c_custkey", "c_mktsegment")
                .agg(F.count(F.lit(1)).alias("n_orders"))
            )
            timed(f"plain shuffled join+agg ({scale}x)", plain)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            for t in ("rs_cust", "rs_ord"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")




def events_axis() -> None:
    """Funnel-family scaling: user-shifted copies of sf0.1 events
    (each copy is an independent user population, so stage counts
    scale exactly ×scale). Run via RELSTRESS_ONLY=funnel
    (RELSTRESS_ONLY=paths runs only the r13 session-path rows)."""
    scale = int(os.environ.get("RELSTRESS_SCALE", "10"))
    only = os.environ.get("RELSTRESS_ONLY", "")
    spark = get_spark("relational-stress")
    ev = load_table(spark, "events", SF_DIR).select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    copies = spark.range(scale).select(F.col("id").alias("__c"))
    big = ev.crossJoin(F.broadcast(copies)).select(
        (F.col("user_id") + F.col("__c") * 1_000_000_000).alias("user_id"),
        "event_type",
        "ts_us",
    )
    if "paths" not in only:
        print(f"events rows: {big.count()}", flush=True)

    def stage(prev, etype, prev_t, out_t):
        return (
            big.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("ts_us") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts_us").alias(out_t))
        )

    if "paths" not in only:
        s1 = (big.filter(F.col("event_type") == "view")
              .groupBy("user_id").agg(F.min("ts_us").alias("t1")))
        s2 = stage(s1, "click", "t1", "t2")
        s3 = stage(s2, "purchase", "t2", "t3")
        timed(f"funnel 3-stage ({scale}x events)", s3)

        f = big.groupBy("user_id").agg(F.min("ts_us").alias("f_us"))
        ret = (
            big.join(f, "user_id")
            .select(
                F.expr("f_us div 86400000000").alias("cohort_day"),
                F.expr("(ts_us - f_us) div 604800000000").alias("week_offset"),
                "user_id",
            )
            .groupBy("cohort_day", "week_offset")
            .agg(F.countDistinct("user_id").alias("n_users"))
        )
        timed(f"weekly retention cohorts ({scale}x events)", ret)

    # session path family (r13): needs event_id + event_type; the
    # user-shifted copies keep per-user event counts constant, so
    # per-session state stays bounded while session count scales ×scale.
    ev2 = load_table(spark, "events", SF_DIR).select(
        "event_id", "user_id", "event_type", "ts",
    )
    big2 = ev2.crossJoin(F.broadcast(copies)).select(
        (F.col("event_id") + F.col("__c") * 10_000_000_000).alias("event_id"),
        (F.col("user_id") + F.col("__c") * 1_000_000_000).alias("user_id"),
        "event_type",
        "ts",
    )
    from pg2kafka_spark.operators.paths import top_paths, transition_matrix

    timed(f"session top paths ({scale}x events)", top_paths(big2))
    timed(
        f"session transition matrix ({scale}x events)",
        transition_matrix(big2),
    )


def retention_partials_axis() -> None:
    """The r12 verdict's named scale-killer measured against its fix
    (operators/retention.py): event VOLUME scales ×scale via
    µs-jittered copies of every event — same users, same
    (cohort, week, user) triples — so the raw-events query's distinct
    must carry ×scale rows through its shuffle while the maintained
    day-partials table is INVARIANT. The from-partials query reads the
    materialized parquet (what the daily job writes), isolating the
    recurring query cost from the one-time build. Run via
    RELSTRESS_ONLY=retention."""
    import shutil
    import tempfile

    from pg2kafka_spark.operators.retention import retention_from_partials

    scale = int(os.environ.get("RELSTRESS_SCALE", "10"))
    spark = get_spark("relational-stress")
    ev = load_table(spark, "events", SF_DIR).select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    copies = spark.range(scale).select(F.col("id").alias("__c"))
    # +__c µs jitter: distinct rows, identical day/week bucketing
    big = ev.crossJoin(F.broadcast(copies)).select(
        "user_id", (F.col("ts_us") + F.col("__c")).alias("ts_us")
    )
    print(f"events rows: {big.count()}", flush=True)

    f = big.groupBy("user_id").agg(F.min("ts_us").alias("f_us"))
    ret = (
        big.join(f, "user_id")
        .select(
            F.expr("f_us div 86400000000").alias("cohort_day"),
            F.expr("(ts_us - f_us) div 604800000000").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
    timed(f"weekly retention from raw events ({scale}x volume)", ret)

    tmp = tempfile.mkdtemp(prefix="retpart-")
    try:
        parts = (
            big.join(f, "user_id")
            .select(
                F.expr("ts_us div 86400000000").alias("ingest_day"),
                F.expr("f_us div 86400000000")
                .cast("bigint")
                .alias("cohort_day"),
                F.expr("(ts_us - f_us) div 604800000000")
                .cast("bigint")
                .alias("week_offset"),
                "user_id",
            )
            .distinct()
        )
        t0 = time.perf_counter()
        parts.write.mode("overwrite").parquet(tmp)
        build_s = time.perf_counter() - t0
        pr = spark.read.parquet(tmp)
        n_parts = pr.count()
        print(
            f"retention partials build ({scale}x volume)          "
            f"{build_s:7.2f} s   n={n_parts} partial rows",
            flush=True,
        )
        timed(
            f"weekly retention from day-partials ({scale}x volume)",
            retention_from_partials(pr),
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def retention_stream_axis() -> None:
    """The r14 maintenance loop measured as it runs: ×scale jittered
    event volume drained through start_retention_stream in 8
    day-sliced micro-batches. The claim under test is the 100 TB
    shape — per-batch cost tracks the BATCH (its day-min scan) plus
    the user-bounded candidates fold, and does NOT trend upward as
    the maintained state accumulates across batches (batch 8 folds
    against 7 batches of candidates). Prints per-batch trigger
    durations from the query's own progress log. Run via
    RELSTRESS_ONLY=retention_stream."""
    import json
    import shutil
    import tempfile

    from pg2kafka_spark.streaming.retention import start_retention_stream

    scale = int(os.environ.get("RELSTRESS_SCALE", "10"))
    spark = get_spark("relational-stress")
    ev = load_table(spark, "events", SF_DIR).select("user_id", "ts")
    copies = spark.range(scale).select(F.col("id").alias("__c"))
    big = ev.crossJoin(F.broadcast(copies)).select(
        "user_id",
        F.timestamp_micros(
            F.unix_micros("ts") + F.col("__c")
        ).alias("ts"),
    )
    n = big.count()
    print(f"events rows: {n}", flush=True)
    b = big.agg(
        F.min(F.expr("unix_micros(ts) div 86400000000")).alias("lo"),
        F.max(F.expr("unix_micros(ts) div 86400000000")).alias("hi"),
    ).collect()[0]
    lo, hi = int(b.lo), int(b.hi) + 1
    n_slices = 8
    step = max(1, (hi - lo + n_slices - 1) // n_slices)
    root = tempfile.mkdtemp(prefix="retstream-")
    try:
        incoming = os.path.join(root, "incoming")
        os.makedirs(incoming)
        t_base = 1_700_000_000
        # one slice per trigger at any scale: files-per-slice and
        # maxFilesPerTrigger move together (single-file slices would
        # single-thread the 1000x slice writes)
        fps = max(1, scale // 25)
        i = 0
        for d in range(lo, hi, step):
            day = big.filter(
                (F.expr("unix_micros(ts) div 86400000000") >= d)
                & (F.expr("unix_micros(ts) div 86400000000") < d + step)
            )
            stage = os.path.join(incoming, f"__stage_{i}")
            # repartition (not coalesce): EXACTLY fps files per slice so
            # maxFilesPerTrigger=fps maps one slice to one trigger
            day.repartition(fps).write.mode("overwrite").parquet(stage)
            parts = [
                f for f in os.listdir(stage) if f.endswith(".parquet")
            ]
            sub = os.path.join(incoming, f"slice_{i:03d}")
            os.makedirs(sub)
            for j, f_ in enumerate(parts):
                dst = os.path.join(sub, f"part_{j}.parquet")
                shutil.move(os.path.join(stage, f_), dst)
                os.utime(dst, (t_base + i, t_base + i))
            shutil.rmtree(stage)
            i += 1
        t0 = time.perf_counter()
        q = start_retention_stream(
            spark,
            incoming + "/*",
            "user_id bigint, ts timestamp",
            first_seen_dir=os.path.join(root, "first_seen"),
            partials_dir=os.path.join(root, "partials"),
            checkpoint_dir=os.path.join(root, "ckpt"),
            max_files_per_trigger=fps,
            available_now=True,
        )
        q.awaitTermination(3600)
        wall = time.perf_counter() - t0
        def _prog(p):
            if isinstance(p, str):
                return json.loads(p)
            if isinstance(p, dict):
                return p
            return json.loads(p.json)  # StreamingQueryProgress object

        per_batch = [
            (p["batchId"], p["durationMs"].get("triggerExecution"))
            for p in (_prog(x) for x in q.recentProgress)
            if p.get("numInputRows", 0) > 0
        ]
        print(
            f"retention stream drain ({scale}x volume, {i} slices)   "
            f"{wall:7.2f} s   batches={per_batch}",
            flush=True,
        )
        pr = spark.read.parquet(os.path.join(root, "partials"))
        print(f"maintained partial rows: {pr.count()}", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    only = os.environ.get("RELSTRESS_ONLY", "")
    if "funnel" in only or "paths" in only:
        events_axis()
    elif "retention_stream" in only:
        retention_stream_axis()
    elif "retention" in only:
        retention_partials_axis()
    else:
        main()
