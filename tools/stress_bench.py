"""Stress measurements for BASELINE.md: dup-heavy corpus
(STRESS_SCALE mutated variants of every sf0.1 document PLUS a
500×STRESS_SCALE-copy boilerplate cluster — the input that makes
uncapped LSH quadratic) and a 2k×STRESS_SCALE-vector embedding set.
Prints one line per measurement.

STRESS_SCALE=10 (default) reproduces the round-6 10× table
(55k docs / 20k vectors); STRESS_SCALE=100 is the round-7 100× axis
(550k docs / 200k vectors). The all-pairs block matmul is skipped
above 10× — it is quadratic BY CONSTRUCTION (the LSH path exists
precisely to replace it there).

Usage: [STRESS_SCALE=100] PYTHONPATH=. python tools/stress_bench.py
(STRESS_ONLY=exact_dedup,segment_scrub restricts to the named
measurements — how the 1000× linear-path decade is run.)
"""

from __future__ import annotations

import os
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
    scale = int(os.environ.get("STRESS_SCALE", "10"))
    # STRESS_ONLY=exact_dedup,segment_scrub runs just the named
    # measurements (label substring match) — the 1000× decade is
    # feasible only for the linear paths, so the selector lets that
    # run skip the (by-construction output-bound) pair-discovery rows.
    only = [t for t in os.environ.get("STRESS_ONLY", "").split(",") if t]

    def want(label: str) -> bool:
        return not only or any(t in label for t in only)

    spark = get_spark("stress-bench")
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    variants = spark.range(scale).select(F.col("id").alias("__v"))
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
    boiler = spark.range(500 * scale).select(
        (F.col("id") + 500_000_000).alias("doc_id"), F.lit(BOILER).alias("text")
    )
    corpus = corpus.unionByName(boiler)
    # fixture lineage (crossJoin + string concat) is recomputed inside
    # every measured operator — measured: persisting it instead costs
    # MORE (cache write + deserialized-row reads beat cheap string
    # regeneration), so the numbers below include it deliberately
    print(f"corpus rows: {corpus.count()}", flush=True)

    if want("exact_dedup"):
        timed(f"exact_dedup ({scale}x corpus)", D.exact_dedup(corpus))
    if want("minhash_lsh_pairs"):
        timed(
            f"minhash_lsh_pairs CAPPED ({scale}x, copy cluster dropped)",
            D.minhash_lsh_pairs(corpus),
        )
    if want("simhash_near_pairs"):
        timed(
            f"simhash_near_pairs r=1 capped ({scale}x)",
            D.simhash_near_pairs(corpus),
        )
        timed(
            f"simhash_near_pairs r=4 capped ({scale}x, full recall h<4)",
            D.simhash_near_pairs(corpus, rotations=4),
        )
    if want("segment_scrub"):
        timed(
            f"doc_segment_scrub ({scale}x, copy-cluster boilerplate)",
            D.duplicated_segment_scrub(corpus),
        )
    # store = the first half of the variants of every doc; batch = the
    # second half + the boilerplate cluster — every batch variant
    # near-dups scale/2 store variants of its base doc, and the copy
    # cluster exercises the store-side band cap from the batch
    # direction
    half = (scale // 2) * 1_000_000
    store = corpus.filter(F.col("doc_id") < half)
    batch = corpus.filter(F.col("doc_id") >= half)
    if want("incremental_near_dup"):
        timed(
            f"incremental_near_dup CAPPED ({scale}x split store/batch)",
            D.incremental_near_dup(store, batch),
        )

    # daily-ingest composition at stress scale (the q_pipeline
    # daily_ingest_keep_list stages on the stress corpus): quality
    # gates -> within-batch exact dedup -> fingerprint-store anti-join
    # -> near-dup verify vs store -> keep list
    if want("daily_ingest"):
        from pg2kafka_spark.operators import text as X

        t = F.col("text")
        n_tok = X.token_count(t)
        gated = batch.filter(
            (n_tok >= 10) & (X.unique_token_count(t) * 1.0 / n_tok >= 0.3)
        )
        store_fps = store.select(X.fingerprint(t).alias("fp")).distinct()
        fresh = D.incremental_exact_dedup(gated, store_fps)
        near = (
            D.incremental_near_dup(store, fresh, threshold=0.5)
            .select(F.col("batch_id").alias("doc_id"))
            .distinct()
        )
        keep = fresh.join(near, "doc_id", "left_anti").select("doc_id")
        timed(f"daily_ingest composition ({scale}x corpus)", keep)

    # r10 tokenizer/overlap statistics: vocabulary + BPE pairs are
    # linear map+agg paths (decade candidates); the source-overlap
    # sketch is the map-side-mergeable replacement for a quadratic
    # cross-source join — its wall must track corpus size, with the
    # pairwise stage constant in |sources|².
    if (
        want("vocabulary")
        or want("bpe_pairs")
        or want("bpe_encode")
        or want("source_overlap")
    ):
        from pg2kafka_spark.operators import text as X

        if want("vocabulary"):
            timed(
                f"corpus_vocabulary ({scale}x corpus)",
                X.vocabulary_top_terms(corpus),
            )
        if want("bpe_pairs"):
            timed(
                f"bpe_pair_counts ({scale}x corpus)",
                X.bpe_pair_stats(corpus),
            )
        if want("bpe_encode"):
            # full tokenizer loop: train 8 merges on the corpus, then
            # encode every document with the trained table. Training
            # is vocab-sized per iteration; encoding adds ONE
            # corpus-sized word explode + the per-doc reassembly
            # shuffle (the linear path under test here).
            merges = X.bpe_train_merges(corpus, n_merges=8)
            timed(
                f"bpe_train_encode ({scale}x corpus)",
                X.bpe_encode(corpus, merges),
            )
        if want("source_overlap"):
            src_corpus = corpus.withColumn(
                "source",
                F.concat(F.lit("src_"), (F.col("doc_id") % 20).cast("string")),
            )
            timed(
                f"source_minhash_overlap ({scale}x, 20 sources)",
                D.source_minhash_overlap(src_corpus),
            )

    if only and not any(
        want(k) for k in ("embedding_near_dup", "ivf_topk", "index_serve")
    ):
        spark.stop()
        return

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
    if scale <= 10 and want("embedding_near_dup"):
        timed(
            "embedding_near_dup block matmul (quadratic baseline)",
            S.embedding_near_dup_pairs(embx, threshold=0.95),
        )
    if want("embedding_near_dup"):
        timed(
            f"embedding_near_dup LSH discovery ({scale}x vecs)",
            S.embedding_near_dup_lsh(embx, threshold=0.95),
        )
    if want("ivf_topk"):
        queries = embx.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        timed(
            f"ivf_topk k-means trained ({scale}x vecs)",
            S.ivf_topk(
                embx, queries, train_sample=20_000 if scale > 10 else None
            ),
        )
    if want("index_serve"):
        # build-once / serve-many: the at-rest index story measured —
        # build+save pays training and the partitioned write ONCE;
        # each serve pays probes + a partition-pruned read of
        # n_probe/n_centroids of the cells.
        import shutil
        import tempfile

        from pg2kafka_spark.operators.index_store import (
            load_ivf_topk,
            save_ivf_index,
        )

        queries = embx.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        # 8 lists = the same train+assign work as the ivf_topk row
        # above, so BUILD+SAVE − ivf_topk isolates the write cost and
        # SERVE shows what every further query batch pays instead of
        # retraining. (More lists prune serving harder but multiply
        # the training cosines — the standard build/serve trade.)
        idx_dir = tempfile.mkdtemp(prefix="stress_ivfidx_")
        t0 = time.perf_counter()
        save_ivf_index(
            embx,
            idx_dir,
            n_centroids=8,
            train_sample=20_000 if scale > 10 else None,
        )
        print(
            f"{'ivf index BUILD+SAVE (8 lists)':48s} "
            f"{time.perf_counter() - t0:7.2f} s",
            flush=True,
        )
        timed(
            "ivf index SERVE (probe 2/8 lists, pruned read)",
            load_ivf_topk(spark, idx_dir, queries, k=3),
        )
        shutil.rmtree(idx_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
