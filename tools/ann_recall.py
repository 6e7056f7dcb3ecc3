"""Recall@k of every ANN variant against the exact brute-force top-k,
on the same queries the registered surface uses (vec_id < 5) — the
accuracy side of the index-family trade-offs BASELINE.md records.

Usage: PYTHONPATH=. python tools/ann_recall.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from pg2kafka_spark.catalog import load_table
from pg2kafka_spark.operators import similarity as S
from pg2kafka_spark.operators.dedup import release_sketch_caches
from pg2kafka_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
K = 3


def main() -> None:
    spark = get_spark("ann-recall")
    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def topsets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    exact = topsets(S.brute_force_topk(emb, queries, k=K))
    variants = {
        "lsh_multiprobe": lambda: S.lsh_bucket_topk(emb, queries, k=K),
        "ivf_kmeans": lambda: S.ivf_topk(emb, queries, k=K),
        "sq8": lambda: S.quantized_topk(emb, queries, k=K),
        "ivf_sq8": lambda: S.ivf_sq8_topk(emb, queries, k=K),
        "pq_8x8": lambda: S.pq_topk(emb, queries, k=K),
        "ivf_pq": lambda: S.ivf_pq_topk(emb, queries, k=K),
        "ivf_sampled": lambda: S.ivf_topk(emb, queries, k=K, train_sample=200),
        "ivf_pq_sampled": lambda: S.ivf_pq_topk(
            emb, queries, k=K, train_sample=200
        ),
    }
    print("| index | recall@3 vs exact | bytes/vector (64-dim) |")
    print("|---|---|---|")
    bytes_per = {
        "lsh_multiprobe": "256 (f32) + 8 bucket",
        "ivf_kmeans": "256 (f32) + 8 cell id",
        "sq8": "64 (int8)",
        "ivf_sq8": "64 (int8) + 8 cell id",
        "pq_8x8": "8 codes (3 bit each here; 8 in prod)",
        "ivf_pq": "8 codes + 8 cell id",
        "ivf_sampled": "256 (f32) + 8 cell id; trains on 200 vecs",
        "ivf_pq_sampled": "8 codes + 8 cell id; trains on 200 vecs",
    }
    for name, fn in variants.items():
        got = topsets(fn())
        hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
        total = sum(len(v) for v in exact.values())
        print(f"| {name} | {hits}/{total} = {hits / total:.2f} | {bytes_per[name]} |")
        release_sketch_caches()
    spark.stop()


if __name__ == "__main__":
    main()
