"""Measured scale axis for the ANN index maintenance loop
(streaming/annindex.py), the same evidence shape the dedup-store and
retention loops carry in BASELINE.md: per-batch ingest cost must stay
FLAT as the maintained index grows (assignment is O(batch ×
n_centroids), the append O(batch) — nothing touches the accreted
cells), and the partition-pruned serve must grow with the PROBED
lists, not the index.

Fixture lineage mirrors tools/stress_bench.py: synthetic batches are
deterministic element-wise perturbations of the sf0.1 embeddings with
shifted ids — no randomness, re-runnable bit-for-bit.

MODE=pq (r16) runs the COMPRESSED loop instead: bootstrap
``save_ivf_pq_index(keep_raw=True)``, accrete code words + the raw
side store in lockstep, and finish with one ``retrain_pq_index`` from
the accreted raw store alone — the self-contained retrain's measured
cost at the accreted size, plus the raw/codes storage ratio (the
side-store trade quantified).

MODE=pq SIDE=manifest (r18, r17 verdict item 5) runs the same loop
over the MANIFEST pointer store instead: every batch lands as a
durable parquet file first (the landing corpus the manifest points
at), pointer rows accrete in lockstep from ``_metadata.file_path``
exactly as the ingest stream does, and the final ``retrain_pq_index``
re-reads ONLY the manifest-referenced landing files semi-joined on
the manifest ids — timing the trade's other leg next to the raw-scan
retrain. Measured same-day at 202k vectors (r18): the walls are
EQUAL (manifest 39.5 s vs raw 43.5 s — both k-means-training-bound),
so the decision is storage (0.84 MB vs 91.8 MB) vs self-containment.

Usage: [BATCHES=15] [BATCH_SCALE=10] [MODE=pq] [SIDE=raw|manifest]
       PYTHONPATH=. python tools/annindex_stress.py
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from pg2kafka_spark.catalog import load_table
from pg2kafka_spark.operators.index_store import (
    load_ivf_pq_topk,
    load_ivf_topk,
    save_ivf_index,
    save_ivf_pq_index,
)
from pg2kafka_spark.session import get_spark
from pg2kafka_spark.streaming.annindex import (
    drift_stats,
    index_ingest_batch,
    pq_index_ingest_batch,
    retrain_pq_index,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _dir_bytes(d: str) -> int:
    total = 0
    for cur, _dirs, files in os.walk(d):
        for f in files:
            total += os.path.getsize(os.path.join(cur, f))
    return total


def main() -> None:
    n_batches = int(os.environ.get("BATCHES", "15"))
    batch_scale = int(os.environ.get("BATCH_SCALE", "10"))
    pq = os.environ.get("MODE", "").lower() == "pq"
    manifest = pq and os.environ.get("SIDE", "raw").lower() == "manifest"
    spark = get_spark("annindex-stress")
    emb = load_table(spark, "embeddings", SF_DIR).select(
        "vec_id", "embedding"
    )
    base_n = emb.count()
    path = os.path.join(tempfile.gettempdir(), "pg2kafka_annindex_stress")
    shutil.rmtree(path, ignore_errors=True)
    landing = os.path.join(
        tempfile.gettempdir(), "pg2kafka_annindex_landing"
    )
    shutil.rmtree(landing, ignore_errors=True)

    t0 = time.monotonic()
    if manifest:
        # the landing corpus the manifest points at — durably at rest
        base_dir = os.path.join(landing, "base")
        emb.write.parquet(base_dir)
        save_ivf_pq_index(
            spark.read.parquet(base_dir), path, manifest_source=base_dir
        )
    elif pq:
        save_ivf_pq_index(emb, path, keep_raw=True)
    else:
        save_ivf_index(emb, path)
    # force the write before timing batches
    boot_n = spark.read.parquet(f"{path}/cells").count()
    boot_s = time.monotonic() - t0
    cents = spark.read.parquet(f"{path}/centroids")
    books = spark.read.parquet(f"{path}/codebooks") if pq else None
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def one_batch(bid: int):
        """batch_scale perturbed copies of the corpus, ids shifted
        past everything already indexed — deterministic (id-keyed
        scale factor), no randomness."""
        copies = spark.range(batch_scale).select(
            F.col("id").alias("copy")
        )
        return (
            emb.crossJoin(copies)
            .select(
                (
                    F.col("vec_id")
                    + (F.lit(bid) * batch_scale + F.col("copy") + 1)
                    * base_n
                ).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: x
                    * (
                        1.0
                        + ((F.col("vec_id") + i) % 13).cast("double") / 100.0
                    ),
                ).alias("embedding"),
            )
        )

    print(f"| step | index rows | batch rows | ingest s | serve s |")
    print(f"|---|---|---|---|---|")
    print(f"| bootstrap | {boot_n} | — | {boot_s:.2f} | — |")
    index_rows = boot_n
    for bid in range(n_batches):
        if manifest:
            # the batch LANDS first (upstream of the loop, untimed —
            # the stream's file source sees it arrive); the loop then
            # reads it back with its own path, as the ingest stream
            # does via _metadata.file_path. Landed at the CORPUS
            # schema (array<float>, like the base table) — a landing
            # corpus has one schema, and the retrain's multi-file
            # read requires it
            land_dir = os.path.join(landing, f"batch_{bid:03d}")
            one_batch(bid).select(
                "vec_id",
                F.col("embedding").cast("array<float>").alias(
                    "embedding"
                ),
            ).write.parquet(land_dir)
            batch = (
                spark.read.parquet(land_dir)
                .select(
                    "*", F.col("_metadata.file_path").alias("__src")
                )
                .localCheckpoint()
            )
        else:
            batch = one_batch(bid).localCheckpoint()
        bn = batch.count()
        t = time.monotonic()
        if pq:
            assigned = pq_index_ingest_batch(
                batch, cents, books
            ).localCheckpoint()
        else:
            assigned = index_ingest_batch(batch, cents).localCheckpoint()
        assigned.drop("cell_sim").write.mode("append").partitionBy(
            "cid"
        ).parquet(f"{path}/cells")
        if manifest:
            # pointer rows accrete in lockstep, as the ingest stream
            # does — part of the timed per-batch cost
            batch.select(
                "vec_id", F.col("__src").alias("source_path")
            ).write.mode("append").parquet(f"{path}/manifest")
        elif pq:
            # the raw side store accretes in lockstep, as the ingest
            # stream does — part of the timed per-batch cost
            from pg2kafka_spark.operators.similarity import as_double

            batch.select(
                "vec_id", as_double(F.col("embedding")).alias("vec")
            ).join(assigned.select("vec_id", "cid"), "vec_id").write.mode(
                "append"
            ).partitionBy("cid").parquet(f"{path}/raw")
        drift_stats(assigned).withColumn("batch_id", F.lit(bid)).write.mode(
            "append"
        ).parquet(f"{path}/drift")
        ingest_s = time.monotonic() - t
        index_rows += bn
        serve_s = None
        if (bid + 1) % 5 == 0 or bid == n_batches - 1:
            t = time.monotonic()
            if pq:
                load_ivf_pq_topk(
                    spark, path, queries, k=3, absorb_duplicates=True
                ).count()
            else:
                load_ivf_topk(spark, path, queries, k=3).count()
            serve_s = time.monotonic() - t
        print(
            f"| batch {bid} | {index_rows} | {bn} | {ingest_s:.2f} | "
            f"{f'{serve_s:.2f}' if serve_s is not None else '—'} |",
            flush=True,
        )
    if pq:
        side_name = "manifest" if manifest else "raw"
        codes_b = _dir_bytes(f"{path}/cells")
        side_b = _dir_bytes(f"{path}/{side_name}")
        t = time.monotonic()
        retrain_pq_index(spark, path)
        retrain_s = time.monotonic() - t
        retrained_n = spark.read.parquet(f"{path}/cells").count()
        verb = (
            "re-reads the manifest-referenced landing files"
            if manifest
            else "self-contained, no source re-read"
        )
        print(
            f"\nretrain from {side_name}/ over {retrained_n} vectors "
            f"({verb}): {retrain_s:.2f} s"
        )
        print(
            f"storage: codes {codes_b / 1e6:.1f} MB vs {side_name} side "
            f"store {side_b / 1e6:.2f} MB "
            f"({side_b / max(codes_b, 1):.2f}x — the documented "
            "side-store trade)"
        )
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(landing, ignore_errors=True)


if __name__ == "__main__":
    main()
