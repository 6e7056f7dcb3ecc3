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
       [MODE=direct|stream] [CANON=0|1]
       PYTHONPATH=. python tools/graph_stress.py

MODE=direct (default) times the bare fold (incremental_components →
fold math only). MODE=stream (r17) drives each batch through the
CHECKPOINTED loop end to end — the batch lands as a parquet file in
an incoming dir and ``run_components_maintenance`` drains it
(availableNow) into the sentinel-bracketed label store — so the
measured wall includes the stream trigger, the staged swap, and the
checkpoint commit, i.e. exactly what a nightly cycle pays.

CANON=1 (r18, r17 verdict item 6) additionally times the CANONICAL
SERVE each step — ``near_dup_canonical_served``'s exact shape
(components_with_isolates over a |V|-node attribute table + ONE
window pass on component_id via canonical_per_component) read off
the maintained labels (the at-rest store in stream mode) — and the
same window pass over the cold-rebuilt labels, asserting equal
keep-lists. The serve claim under test: serve cost tracks |V|,
independent of the accumulated pair history; the full recompute a
store-less pipeline pays per day is the ``cold rebuild`` column PLUS
the ``cold canon`` column.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from pg2kafka_spark.operators.graph import (
    canonical_per_component,
    components_with_isolates,
    connected_components,
    incremental_components,
)
from pg2kafka_spark.session import get_spark


def main() -> None:
    v = int(os.environ.get("NODES", "200000"))
    n_batches = int(os.environ.get("BATCHES", "8"))
    batch_pairs = int(os.environ.get("BATCH_PAIRS", "100000"))
    mode = os.environ.get("MODE", "direct")
    canon = os.environ.get("CANON", "0") == "1"
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

    if canon:
        # deterministic per-node attribute (the n_chars stand-in the
        # canonical rank orders by) — built once, |V| rows
        nodes_attr = (
            spark.range(v)
            .select(
                F.col("id").alias("node"),
                (F.col("id") * F.lit(2654435761) % 10000).alias(
                    "n_chars"
                ),
            )
            .localCheckpoint()
        )

        def canonical(labels_df):
            labeled = components_with_isolates(labels_df, nodes_attr)
            return canonical_per_component(
                labeled, [F.col("n_chars").desc(), F.col("node").asc()]
            ).select("node", "component_id", "comp_size", "is_canonical")

    history = None
    labels = None
    mode_col = "warm fold s" if mode == "direct" else "stream cycle s"
    canon_cols = " serve canon s | cold canon s |" if canon else ""
    print(
        f"| step | pairs in history | {mode_col} | cold rebuild s |"
        + canon_cols
    )
    print("|---|---|---|---|" + ("---|---|" if canon else ""))
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
        canon_cells = ""
        if canon:
            # the serve reads the MAINTAINED labels — the at-rest
            # parquet store in stream mode, the fold result in direct
            serve_src = (
                spark.read.parquet(labels_dir)
                if mode == "stream"
                else labels
            )
            t = time.monotonic()
            served = canonical(serve_src).collect()
            serve_s = time.monotonic() - t
            t = time.monotonic()
            cold_canon = canonical(cold).collect()
            cold_canon_s = time.monotonic() - t
            assert sorted(map(tuple, served)) == sorted(
                map(tuple, cold_canon)
            ), f"served canonicals != cold canonicals at step {b}"
            canon_cells = f" {serve_s:.2f} | {cold_canon_s:.2f} |"
        print(
            f"| batch {b} | {hist_n} | {warm_s:.2f} | {cold_s:.2f} |"
            + canon_cells,
            flush=True,
        )


if __name__ == "__main__":
    main()
