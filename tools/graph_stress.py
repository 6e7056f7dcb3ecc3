"""Measured scale axis for the incremental connected-components fold
(operators/graph.incremental_components), the same evidence shape the
dedup store / retention partials / ANN index loops carry in
BASELINE.md: the daily fold's cost must track |V| + |batch|, NOT the
accumulated pair history — while a cold rebuild re-pays the whole
history every day.

Deterministic fixture (no randomness), shaped like a REAL near-dup
graph (short-diameter clusters, not adversarial chains): V nodes in
clusters of K; every batch stars new members onto each cluster head
(diameter 2, like boilerplate dup clusters) and bridges heads in a
binary-tree pattern (batch b connects head c to head c+2^b), so
clusters keep merging across batches without the graph ever growing a
long chain. Each step we (a) fold the batch into yesterday's labels
with incremental_components and (b) cold-rebuild over the full
accumulated pair list, assert EQUAL labels, and report both walls.

Usage: [NODES=200000] [BATCHES=8] [BATCH_PAIRS=100000]
       [MODE=direct|stream] PYTHONPATH=. python tools/graph_stress.py

MODE=direct (default) times the bare fold (incremental_components →
fold math only). MODE=stream (r17) drives each batch through the
CHECKPOINTED loop end to end — the batch lands as a parquet file in
an incoming dir and ``run_components_maintenance`` drains it
(availableNow) into the sentinel-bracketed label store — so the
measured wall includes the stream trigger, the staged swap, and the
checkpoint commit, i.e. exactly what a nightly cycle pays.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from pg2kafka_spark.operators.graph import (
    connected_components,
    incremental_components,
)
from pg2kafka_spark.session import get_spark


def main() -> None:
    v = int(os.environ.get("NODES", "200000"))
    n_batches = int(os.environ.get("BATCHES", "8"))
    batch_pairs = int(os.environ.get("BATCH_PAIRS", "100000"))
    mode = os.environ.get("MODE", "direct")
    spark = get_spark("graph-stress")

    k = 20  # cluster span; heads at multiples of k
    n_clusters = v // k
    per_cluster = max(1, batch_pairs // n_clusters)

    def batch(b: int):
        # star edges: new members onto each cluster head (diameter 2;
        # offsets wrap, so late batches replay earlier members — the
        # at-least-once shape the fold must absorb anyway)
        members = spark.range(n_clusters * per_cluster).select(
            ((F.col("id") / per_cluster).cast("bigint") * k).alias(
                "id_a"
            ),
            (
                (F.col("id") / per_cluster).cast("bigint") * k
                + (F.col("id") % per_cluster + F.lit(b * per_cluster))
                % (k - 1)
                + 1
            ).alias("id_b"),
        )
        # binary-tree head bridges: batch b merges cluster c with
        # c + 2^b — components keep merging, diameter stays O(b)
        stride = 2**b
        bridges = (
            spark.range(n_clusters)
            .filter(
                (F.col("id") % (2 * stride) == 0)
                & (F.col("id") + stride < n_clusters)
            )
            .select(
                (F.col("id") * k).alias("id_a"),
                ((F.col("id") + stride) * k).alias("id_b"),
            )
        )
        return members.unionByName(bridges)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    if mode == "stream":
        import tempfile

        from pg2kafka_spark.streaming.graphstore import (
            run_components_maintenance,
        )

        work = tempfile.mkdtemp(prefix="graph_stress_stream_")
        incoming = os.path.join(work, "incoming")
        labels_dir = os.path.join(work, "labels")
        ckpt = os.path.join(work, "ckpt")
        os.makedirs(incoming, exist_ok=True)

    history = None
    labels = None
    mode_col = "warm fold s" if mode == "direct" else "stream cycle s"
    print(f"| step | pairs in history | {mode_col} | cold rebuild s |")
    print("|---|---|---|---|")
    for b in range(n_batches):
        nb = batch(b).localCheckpoint()
        history = (
            nb if history is None else history.unionByName(nb)
        ).localCheckpoint()
        hist_n = history.count()
        if mode == "stream":
            # land the batch as a file; the maintenance cycle drains
            # it through the checkpointed, sentinel-bracketed loop
            nb.write.mode("overwrite").parquet(
                os.path.join(incoming, f"batch_{b:03d}")
            )
            t = time.monotonic()
            run_components_maintenance(
                spark,
                os.path.join(incoming, "*"),
                "id_a bigint, id_b bigint",
                labels_dir=labels_dir,
                checkpoint_dir=ckpt,
                timeout_s=1800,
            )
            warm_s = time.monotonic() - t
            labels = spark.read.parquet(labels_dir)
        elif labels is None:
            t = time.monotonic()
            labels = connected_components(nb)
            warm_s = time.monotonic() - t
        else:
            t = time.monotonic()
            labels = incremental_components(labels, nb)
            warm_s = time.monotonic() - t
        t = time.monotonic()
        cold = connected_components(history)
        cold_s = time.monotonic() - t
        assert rows(labels) == rows(cold), f"warm != cold at step {b}"
        print(
            f"| batch {b} | {hist_n} | {warm_s:.2f} | {cold_s:.2f} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
