"""Table catalog over the driver-generated parquet test data.

TESTDATA.md: ten tables per scale factor under
``/root/testdata/sf{0.001,0.01,0.1}/<name>.parquet``. Loading stays a
plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown,
column pruning and partition-split sizing; we never materialize or cache
here (at 100 TB a cache of a scan is a bug, not an optimization).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should always hash-broadcast in joins.
DIM_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_session_confs(spark: SparkSession) -> None:
    """Settings our queries depend on for *correctness* (not tuning),
    applied to whatever session the caller hands us — the driver
    harness builds its own vanilla session, so these cannot live only
    in our session factory:

    * ``nanosAsLong`` — events.ts is TIMESTAMP(NANOS) parquet, which
      Spark 4 otherwise refuses to read;
    * UTC session timezone — timestamp literals/formatting must agree
      with the DuckDB oracle's naive-UTC semantics.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Normalize events.ts to a session-tz TIMESTAMP regardless of
        # how the generator wrote it — the column has shipped as both
        # TIMESTAMP(NANOS) (reads as LONG ns under ``nanosAsLong``) and
        # TIMESTAMP(MICROS, isAdjustedToUTC=false) (reads as
        # TIMESTAMP_NTZ). Downstream code assumes ``unix_micros(ts)``
        # works and matches DuckDB's ``epoch_us``; with the session tz
        # pinned to UTC both conversions below are exact and stay pure
        # projections (pushdown/pruning-friendly).
        from pyspark.sql import functions as F, types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # integer `div`, not `/`: ns epochs (~1.7e18) overflow double precision
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # NTZ→LTZ cast interprets the naive value in the session tz
            # (UTC, ensure_session_confs) — same instant DuckDB sees.
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view for ``spark.sql`` queries."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)


def source_signature(sf_dir: str, table: str) -> str:
    """Identity digest of one source table's files (name, size,
    mtime_ns) — the cache key every session-materialized at-rest
    store derives its path from (`_ensure_retention_store`,
    `_ensure_ann_index`), so a regenerated source can never be served
    stale derived state. Nanosecond mtimes: second-granularity keying
    could miss a same-second regeneration with identical names/sizes
    (r14 advice)."""
    import hashlib
    import os

    sig = [sf_dir]
    src_dir = os.path.join(sf_dir, f"{table}.parquet")
    src = src_dir if os.path.exists(src_dir) else sf_dir
    if os.path.isdir(src):
        # Full-tree walk, not a top-level listdir: a partitioned
        # source rewritten in place inside a subdirectory (same leaf
        # name/size, parent mtime untouched) must still change the
        # digest, else a regenerated source serves stale derived
        # stores — the exact failure the mtime_ns keying exists to
        # prevent (r15 advice).
        for dirpath, dirnames, filenames in os.walk(src):
            dirnames.sort()
            for f in sorted(filenames):
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                rel = os.path.relpath(p, src)
                sig.append(f"{rel}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.isfile(src):
        st = os.stat(src)
        sig.append(f"{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(sig).encode()).hexdigest()[:12]


import threading as _threading

_STORE_LOCKS: dict = {}
_STORE_LOCKS_GUARD = _threading.Lock()


class _StoreBuildLock:
    """Thread lock + advisory file lock on ``<root>.lock``, acquired
    in that order. The file lock is what makes the guard hold across
    PROCESSES; the kernel releases it if the holder dies, so a
    crashed build never wedges later sessions."""

    def __init__(self, root: str, tlock: _threading.Lock):
        self._root = root
        self._tlock = tlock
        self._fh = None

    def __enter__(self):
        self._tlock.acquire()
        try:
            import fcntl

            self._fh = open(self._root.rstrip("/") + ".lock", "a")
            fcntl.flock(self._fh, fcntl.LOCK_EX)
        except BaseException:
            if self._fh is not None:
                self._fh.close()
                self._fh = None
            self._tlock.release()
            raise
        return self

    def __exit__(self, *exc):
        import fcntl

        fcntl.flock(self._fh, fcntl.LOCK_UN)
        self._fh.close()
        self._fh = None
        self._tlock.release()
        return False


def store_build_lock(root: str) -> _StoreBuildLock:
    """Per-store-path build lock: the bench warms query plans from a
    thread pool, and two serve queries backed by the SAME session
    store (retention partials, ANN index, bucketed tables) would
    otherwise race the exists-check/overwrite window of their ensure
    function — observed as mid-write chmod failures on the shared
    path. r16: ALSO a file lock, so two PROCESSES sharing a tempdir
    (a bench beside a parity sweep) serialize the same way — the
    separate-TMPDIR convention in tools/run_tests.sh remains the
    belt-and-braces for full isolation, but is no longer load-bearing
    for correctness. Every caller re-checks store existence INSIDE
    the lock, so the loser of the race serves the winner's build."""
    with _STORE_LOCKS_GUARD:
        tlock = _STORE_LOCKS.setdefault(root, _threading.Lock())
    return _StoreBuildLock(root, tlock)
