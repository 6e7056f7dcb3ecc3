"""Catalog loading contracts — above all the events.ts normalization:
the generator has shipped the column as TIMESTAMP(NANOS) (reads as
LONG under nanosAsLong) and as TIMESTAMP(MICROS, isAdjustedToUTC=false)
(reads as TIMESTAMP_NTZ); round 4's driver run broke on the second
encoding because every ``unix_micros("ts")`` call site assumes a
session-tz TIMESTAMP. load_table owns the normalization."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F, types as T

from pg2kafka_spark.catalog import load_table


def test_events_ts_is_session_timestamp_at_every_sf(spark):
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        df = load_table(spark, "events", f"/root/testdata/{sf}")
        assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
            f"{sf}: ts is {df.schema['ts'].dataType}, unix_micros would fail"
        )


def test_events_ts_epoch_matches_duckdb(spark):
    """The normalized instant must agree with DuckDB's epoch_us on the
    same parquet — the invariant every ts-based oracle rests on."""
    sf_dir = "/root/testdata/sf0.01"
    got = (
        load_table(spark, "events", sf_dir)
        .select(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
            # epoch-µs sum overflows int64 at 10k rows — sum in decimal
            F.sum(F.unix_micros("ts").cast("decimal(38,0)")).alias("s"),
        )
        .collect()[0]
    )
    exp = duckdb.sql(
        "SELECT CAST(epoch_us(min(ts)) AS BIGINT),"
        "       CAST(epoch_us(max(ts)) AS BIGINT),"
        "       sum(CAST(epoch_us(ts) AS HUGEINT)) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchone()
    assert (got.lo, got.hi, int(got.s)) == (exp[0], exp[1], int(exp[2]))


def test_store_build_lock_excludes_across_processes(tmp_path):
    """r16: the build lock must hold across PROCESSES, not just
    threads — a bench and a parity sweep sharing one tempdir race the
    same store path. A child process holds the lock for ~1.2 s; the
    parent's acquisition must block until it releases."""
    import multiprocessing as mp
    import time

    from pg2kafka_spark.catalog import store_build_lock

    root = str(tmp_path / "store")

    def hold(path, held):
        from pg2kafka_spark.catalog import store_build_lock as sbl

        with sbl(path):
            held.set()
            time.sleep(1.2)

    ctx = mp.get_context("fork")
    held = ctx.Event()
    p = ctx.Process(target=hold, args=(root, held))
    p.start()
    try:
        assert held.wait(10), "child never acquired"
        t0 = time.monotonic()
        with store_build_lock(root):
            waited = time.monotonic() - t0
        assert waited > 0.5, f"parent did not block on the file lock ({waited:.2f}s)"
    finally:
        p.join(10)
    # reentrant-by-sequence: a fresh acquisition succeeds immediately
    with store_build_lock(root):
        pass
