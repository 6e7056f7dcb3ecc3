"""Measure the scaling shape BASELINE.md claims: run the headline
pipeline queries at sf0.001 / sf0.01 / sf0.1 (100× input span) and
report wall seconds and ms per 1k input rows at each point. For
map-only / bucketed paths the ms/krow column should be ~flat (or
falling, as fixed overheads amortize); super-linear growth is a
regression.

Usage: python tools/scaling_curve.py  (prints a markdown table)
"""

from __future__ import annotations

import time

from pg2kafka_spark.operators.dedup import release_sketch_caches
from pg2kafka_spark.session import get_spark

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

#: query name → table whose row count is the input size
HEADLINE = {
    "exact_dedup_documents": "documents",
    "minhash_signatures_portable": "documents",
    "decontamination_check": "documents",
    "minhash_lsh_pairs": "documents",
    "simhash_near_pairs": "documents",
    "training_corpus_assembly": "documents",
    "embedding_near_dup_pairs": "embeddings",
    "user_event_rollup_salted": "events",
    "multimodal_features_real": "documents",
    "doc_segment_scrub": "documents",
    "doc_duplicate_ngrams": "documents",
    "incremental_near_dup_batch": "documents",
    "zorder_layout_stats": "lineitem",
    "doc_pack_spans_strict": "documents",
    "hilbert_layout_stats": "lineitem",
    "daily_ingest_keep_list": "documents",
    "doc_bigram_surprisal": "documents",
    "scd2_user_history": "events",
}


def main() -> None:
    spark = get_spark("scaling-curve")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    # warm-up (codegen/classloader)
    run(qs["exact_dedup_documents"](spark, SF_DIRS[0]))
    release_sketch_caches()

    counts: dict[tuple[str, str], int] = {}
    for sf_dir in SF_DIRS:
        for t in set(HEADLINE.values()):
            counts[(sf_dir, t)] = (
                spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
            )

    print("| query | " + " | ".join(d.rsplit("/", 1)[-1] + " s (ms/krow)" for d in SF_DIRS) + " |")
    print("|---|" + "---|" * len(SF_DIRS))
    for name, table in HEADLINE.items():
        cells = []
        for sf_dir in SF_DIRS:
            best = float("inf")
            for _ in range(2):
                best = min(best, run(qs[name](spark, sf_dir)))
                release_sketch_caches()
            n = counts[(sf_dir, table)]
            cells.append(f"{best:.2f} ({best / n * 1e6:.1f})")
        print(f"| {name} | " + " | ".join(cells) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
