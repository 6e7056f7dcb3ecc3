"""Focused A/B bench probe — the adjudication tool BASELINE.md's
"r11→r12 adjudication" section describes, extracted so drift rows can
be re-timed without a full-suite run.

Runs a comma-listed subset of registered queries (``PROBE_QUERIES``)
for ``PROBE_REPS`` reps each at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1), with the bench's fixed sentinel plan timed
before and after every query's rep block, and prints ONE JSON object.
Optionally warms the FULL registered suite first (``PROBE_FULL_WARM=1``)
to reproduce the round-bench context (plan-cache/codegen pressure of
~170 plans) vs the default isolated context (only the probed plans
warmed) — the difference between those two readings is exactly the
"per-plan interaction vs host state" question the r13 verdict asks.

Usage (from any worktree/HEAD):
    PROBE_QUERIES=brand_supplier_revenue,embedding_ann_ivf \
    PROBE_REPS=5 python tools/ab_probe.py > /tmp/probe.json
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARM_SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [
        n for n in os.environ.get("PROBE_QUERIES", "").split(",") if n
    ]
    reps = int(os.environ.get("PROBE_REPS", "5"))
    full_warm = os.environ.get("PROBE_FULL_WARM", "0") == "1"
    # warm only the first N registered plans (sorted) — the dial that
    # separates "session has MANY compiled plans" from any specific
    # query's interaction
    warm_limit = int(os.environ.get("PROBE_WARM_LIMIT", "0"))
    # warm everything EXCEPT these — the dial that tests whether a
    # SPECIFIC plan set (e.g. the queries a round added) causes the
    # pressure, independent of total count
    warm_exclude = {
        n for n in os.environ.get("PROBE_WARM_EXCLUDE", "").split(",") if n
    }

    from pg2kafka_spark.operators.dedup import release_sketch_caches
    from pg2kafka_spark.session import get_spark

    spark = get_spark("pg2kafka_spark-ab-probe")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"[probe] unknown queries: {missing}", file=sys.stderr)
        return 1

    def run(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    def jvm_stats() -> dict:
        """Code-cache / metaspace / GC readings from the driver JVM —
        the session-pressure axis of the r13 drift adjudication."""
        jvm = spark.sparkContext._jvm
        mf = jvm.java.lang.management.ManagementFactory
        pools = {}
        for p in mf.getMemoryPoolMXBeans().toArray():
            nm = p.getName()
            if "CodeHeap" in nm or nm in ("Metaspace", "Compressed Class Space"):
                u = p.getUsage()
                pools[nm] = {
                    "used_mb": round(u.getUsed() / 1e6, 1),
                    "max_mb": round(u.getMax() / 1e6, 1),
                }
        gc_ms = sum(
            g.getCollectionTime()
            for g in mf.getGarbageCollectorMXBeans().toArray()
        )
        comp = mf.getCompilationMXBean()
        return {
            "pools": pools,
            "gc_total_ms": int(gc_ms),
            "jit_total_ms": int(comp.getTotalCompilationTime()),
        }

    from concurrent.futures import ThreadPoolExecutor

    if full_warm:
        warm_names = sorted(qs)
    elif warm_limit:
        warm_names = sorted(qs)[:warm_limit]
    elif warm_exclude:
        warm_names = [n for n in sorted(qs) if n not in warm_exclude]
    else:
        warm_names = names
    t_warm = time.perf_counter()

    def warm(name: str) -> None:
        try:
            run(qs[name](spark, WARM_SF_DIR))
        except Exception:
            print(f"[probe] warmup {name} failed:\n"
                  f"{traceback.format_exc(limit=3)}", file=sys.stderr)

    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(warm, warm_names))
    release_sketch_caches()
    warm_secs = round(time.perf_counter() - t_warm, 2)

    def sentinel_run() -> float:
        from pyspark.sql import functions as F

        from pg2kafka_spark.catalog import load_table

        df = (
            load_table(spark, "lineitem", sf_dir)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
            )
        )
        t0 = time.perf_counter()
        run(df)
        return round(time.perf_counter() - t0, 4)

    # settle, as bench.py does after the warmup pool
    prev = sentinel_run()
    for _ in range(4):
        cur = sentinel_run()
        if abs(cur - prev) <= 0.25 * max(cur, prev):
            break
        prev = cur

    out: dict = {
        "sf_dir": sf_dir,
        "reps": reps,
        "full_warm": full_warm,
        "warm_limit": warm_limit,
        "n_warmed": len(warm_names),
        "warm_secs": warm_secs,
        "jvm_after_warm": jvm_stats(),
        "queries": {},
    }
    for name in names:
        s_before = sentinel_run()
        runs: list[float] = []
        rep_jvm: list[dict] = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(
                f"{name}#rep{len(runs)}"
            )
            df = qs[name](spark, sf_dir)
            j0 = jvm_stats()
            t0 = time.perf_counter()
            run(df)
            secs = round(time.perf_counter() - t0, 4)
            j1 = jvm_stats()
            runs.append(secs)
            # per-rep JIT/GC deltas: a spike rep with a matching JIT
            # delta is a compile storm; high wall at flat JIT/GC is
            # the interpreted-path class
            rep_jvm.append({
                "jit_ms": j1["jit_total_ms"] - j0["jit_total_ms"],
                "gc_ms": j1["gc_total_ms"] - j0["gc_total_ms"],
            })
            release_sketch_caches()
        s_after = sentinel_run()
        srt = sorted(runs)
        mid = len(srt) // 2
        median = srt[mid] if len(srt) % 2 else (srt[mid - 1] + srt[mid]) / 2
        out["queries"][name] = {
            "best": srt[0],
            "median": round(median, 4),
            "runs": runs,
            "rep_jvm": rep_jvm,
            "sentinel": [s_before, s_after],
        }
        print(f"[probe] {name}: best={srt[0]} runs={runs} "
              f"sentinel=[{s_before},{s_after}]", file=sys.stderr)

    out["jvm_after_timed"] = jvm_stats()
    os.write(real_stdout, (json.dumps(out) + "\n").encode())
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
