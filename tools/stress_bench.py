"""10× stress measurements for BASELINE.md: dup-heavy 55k-doc corpus
(10 mutated variants of every sf0.1 document PLUS a 5 000-copy
boilerplate cluster — the input that makes uncapped LSH quadratic)
and a 20k-vector embedding set. Prints one line per measurement.

Usage: PYTHONPATH=. python tools/stress_bench.py
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from pg2kafka_spark.catalog import load_table
from pg2kafka_spark.operators import dedup as D
from pg2kafka_spark.operators import similarity as S
from pg2kafka_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
BOILER = (
    "subscribe to our newsletter for the latest updates terms of service "
    "privacy policy all rights reserved contact us about careers"
)


def timed(label, df):
    t0 = time.perf_counter()
    n = df.count()
    print(f"{label:48s} {time.perf_counter() - t0:7.2f} s   n={n}", flush=True)
    D.release_sketch_caches()
    return n


def main() -> None:
    spark = get_spark("stress-bench")
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    variants = spark.range(10).select(F.col("id").alias("__v"))
    corpus = (
        docs.crossJoin(F.broadcast(variants))
        .select(
            (F.col("doc_id") + F.col("__v") * 1_000_000).alias("doc_id"),
            # variant 0 keeps the text; others append a marker token —
            # near-dup-rich (j ≈ n/(n+1) per pair) but not exact-dup
            F.when(F.col("__v") == 0, F.col("text"))
            .otherwise(F.concat_ws(" ", "text", F.concat(F.lit("v"), "__v")))
            .alias("text"),
        )
    )
    boiler = spark.range(5000).select(
        (F.col("id") + 50_000_000).alias("doc_id"), F.lit(BOILER).alias("text")
    )
    corpus = corpus.unionByName(boiler)
    print(f"corpus rows: {corpus.count()}", flush=True)

    timed("exact_dedup (55k docs)", D.exact_dedup(corpus))
    timed(
        "minhash_lsh_pairs CAPPED (5k-copy cluster dropped)",
        D.minhash_lsh_pairs(corpus),
    )
    timed("simhash_near_pairs r=1 capped", D.simhash_near_pairs(corpus))
    timed(
        "simhash_near_pairs r=4 capped (full recall h<4)",
        D.simhash_near_pairs(corpus, rotations=4),
    )
    timed(
        "doc_segment_scrub (55k docs, 5k-copy boilerplate)",
        D.duplicated_segment_scrub(corpus),
    )
    # store = variants 0-4 of every doc; batch = variants 5-9 + the
    # boilerplate cluster — every batch variant near-dups 5 store
    # variants of its base doc, and the 5k-copy cluster exercises the
    # store-side band cap from the batch direction
    store = corpus.filter(F.col("doc_id") < 5_000_000)
    batch = corpus.filter(F.col("doc_id") >= 5_000_000)
    timed(
        "incremental_near_dup CAPPED (25k store / 30k batch)",
        D.incremental_near_dup(store, batch),
    )

    emb = load_table(spark, "embeddings", SF_DIR).select("vec_id", "embedding")
    embx = (
        emb.crossJoin(F.broadcast(variants))
        .select(
            (F.col("vec_id") + F.col("__v") * 1_000_000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.col("__v").cast("float") * F.lit(0.001)
            ).alias("embedding"),
        )
    )
    print(f"embedding rows: {embx.count()}", flush=True)
    timed(
        "embedding_near_dup block matmul (20k vecs, 400M pairs)",
        S.embedding_near_dup_pairs(embx, threshold=0.95),
    )
    timed(
        "embedding_near_dup LSH discovery (20k vecs)",
        S.embedding_near_dup_lsh(embx, threshold=0.95),
    )
    queries = embx.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    timed("ivf_topk k-means trained (20k vecs)", S.ivf_topk(embx, queries))
    spark.stop()


if __name__ == "__main__":
    main()
