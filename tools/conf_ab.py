"""Alternating conf A/B — the adjudication the r19 verdict asks for
(shingle_jaccard_pairs regressed −14% in the driver run under the SHJ
session confs while the builder's isolated probe said improved; two
dueling anecdotes need ONE pinned experiment).

Runs each query in ``AB_QUERIES`` for ``AB_REPS`` ALTERNATING rep
pairs — one rep with conf set A, one with conf set B, A first, then
B first on the next pair (order-balanced so JIT/GC drift cannot favor
a side) — inside one session, using runtime-settable SQL confs only.
Prints ONE JSON object with per-rep times, medians, and the sentinel
before/after each block.

Usage:
    AB_QUERIES=shingle_jaccard_pairs AB_REPS=4 \
    AB_CONF_A='{"spark.sql.join.preferSortMergeJoin":"false"}' \
    AB_CONF_B='{"spark.sql.join.preferSortMergeJoin":"true",
                "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold":"0"}' \
    python tools/conf_ab.py > /tmp/ab.json
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
    names = [n for n in os.environ.get("AB_QUERIES", "").split(",") if n]
    reps = int(os.environ.get("AB_REPS", "4"))
    conf_a = json.loads(os.environ.get("AB_CONF_A", "{}"))
    conf_b = json.loads(os.environ.get("AB_CONF_B", "{}"))

    from pg2kafka_spark.operators.dedup import release_sketch_caches
    from pg2kafka_spark.session import get_spark

    spark = get_spark("pg2kafka_spark-conf-ab")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"[ab] unknown queries: {missing}", file=sys.stderr)
        return 1

    def run(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    def set_confs(confs: dict) -> None:
        for k, v in confs.items():
            spark.conf.set(k, v)

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

    # warm every probed plan under BOTH conf sets (plan shape differs)
    for name in names:
        for confs in (conf_a, conf_b):
            set_confs(confs)
            try:
                run(qs[name](spark, WARM_SF_DIR))
            except Exception:
                print(f"[ab] warmup {name} failed:\n"
                      f"{traceback.format_exc(limit=3)}", file=sys.stderr)
    release_sketch_caches()

    prev = sentinel_run()
    for _ in range(4):
        cur = sentinel_run()
        if abs(cur - prev) <= 0.25 * max(cur, prev):
            break
        prev = cur

    out: dict = {
        "sf_dir": sf_dir,
        "reps_per_side": reps,
        "conf_a": conf_a,
        "conf_b": conf_b,
        "queries": {},
    }
    for name in names:
        s0 = sentinel_run()
        a_runs: list[float] = []
        b_runs: list[float] = []
        for pair in range(reps):
            order = ("a", "b") if pair % 2 == 0 else ("b", "a")
            for side in order:
                set_confs(conf_a if side == "a" else conf_b)
                spark.sparkContext.setJobDescription(
                    f"{name}#ab-{side}{pair}"
                )
                df = qs[name](spark, sf_dir)
                t0 = time.perf_counter()
                run(df)
                dt = time.perf_counter() - t0
                (a_runs if side == "a" else b_runs).append(round(dt, 4))
                release_sketch_caches()
        s1 = sentinel_run()

        def med(rs: list[float]) -> float:
            srt = sorted(rs)
            mid = len(srt) // 2
            return round(
                srt[mid] if len(srt) % 2 else (srt[mid - 1] + srt[mid]) / 2, 4
            )

        out["queries"][name] = {
            "a_runs": a_runs,
            "b_runs": b_runs,
            "a_best": min(a_runs),
            "b_best": min(b_runs),
            "a_median": med(a_runs),
            "b_median": med(b_runs),
            "sentinels": [s0, s1],
        }
        print(f"[ab] {name}: A best {min(a_runs)} median {med(a_runs)} | "
              f"B best {min(b_runs)} median {med(b_runs)}", file=sys.stderr)

    os.write(real_stdout, (json.dumps(out) + "\n").encode())
    return 0


if __name__ == "__main__":
    sys.exit(main())
