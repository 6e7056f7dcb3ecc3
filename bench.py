"""Benchmark harness — runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes end-to-end into the ``noop`` sink: the full plan
runs (scan → shuffle → agg/window), nothing is converted to Python
rows — measuring collect() would benchmark Py4J serialization of
result sets, not the engine. A warm-up pass amortizes JVM/codegen
startup so the numbers measure the plans, not the JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pg2kafka_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("pg2kafka_spark-bench")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def run(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # Warm-up: codegen/classloading (JVM path) AND the Arrow Python
    # worker pool (mapInPandas path) — otherwise the alphabetically
    # first UDF query pays ~1-2 s of worker startup inside its timing.
    from pg2kafka_spark.operators.dedup import release_sketch_caches

    run(qs["top_orders"](spark, sf_dir))
    run(qs["multimodal_features"](spark, sf_dir))
    release_sketch_caches()

    # Best-of-2 per query: single-run local timings have multi-second
    # noise (shared host); the min is the engine's capability.

    timings: dict[str, float] = {}
    for name in sorted(qs):
        best = float("inf")
        for _ in range(2):
            df = qs[name](spark, sf_dir)
            t0 = time.perf_counter()
            run(df)
            best = min(best, time.perf_counter() - t0)
            # drop persisted sketch intermediates between runs so the
            # suite measures each query cold and storage never accrues
            release_sketch_caches()
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
