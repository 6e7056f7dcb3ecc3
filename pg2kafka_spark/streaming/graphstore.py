"""Self-maintaining duplicate-cluster LABEL store: incremental
connected components (operators/graph.incremental_components) as a
Structured Streaming loop — the FOURTH maintained-state family, with
the same loop shape as the dedup store (streaming/ingest.py), the
retention partials (streaming/retention.py), and the ANN index
(streaming/annindex.py).

Reference parity: pg2kafka's queue is append-only and consumers fold
it incrementally (eventqueue/event_queue.go:60-75); this module is
that contract applied to the near-dup PAIR feed — each micro-batch of
discovered candidate pairs (LSH/MinHash output upstream) folds into
the accumulated component labels, so the keep-list/canonical decision
downstream always reads a label table that is current to the last
drained batch, and the historical pair log is never re-read.

State under ``labels_dir``: one ``(node, component_id)`` parquet
table — REPLACED per micro-batch by a staged, sentinel-bracketed
directory swap. Unlike the other three stores this state is a FOLD,
not a log: yesterday's labels are a connectivity-exact compression of
every pair ever ingested (star edges node→component_id), which is
exactly why the fold's cost tracks |V| + |batch| and never the pair
history (measured: tools/graph_stress.py — warm fold flat while the
cold rebuild grows with history).

Crash contract (at-least-once, never loss, same discipline as the
other loops): the fold is IDEMPOTENT — re-folding an already-folded
batch over the post-fold labels is a no-op (the labels' star edges
already connect everything the batch connected, and min-labels are
stable) — so a replay after a crash-before-checkpoint converges to
the identical fixpoint. A crash INSIDE the swap bracket leaves the
sentinel on disk; the next batch (and any reader using
``_labels_or_empty``) fails loudly instead of folding against a
missing or half-swapped table — the retention compaction's r14
convention. Either directory state behind the sentinel is
value-complete (old = pre-fold, staging = post-fold; re-running the
batch from the checkpoint reproduces post-fold from either).

Scale notes: the per-batch fold is the measured graph_stress shape —
|V| star edges + |batch| pairs through min-label propagation, rounds
tracking how many existing clusters the batch bridges (stars have
diameter ≤ 2). The label table is uniform on node id; at 100 TB
partition it on ``pmod(node, N)`` so the swap writes in parallel.

Design-note refs: the reference has no graph stage (blendle/pg2kafka
relays rows, main.go:68-120); this module exists for the M5 pipeline
surface (SURVEY.md §7), closing the maintained-state pattern over it.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from pg2kafka_spark.operators.graph import (
    connected_components,
    incremental_components,
)


def _swap_sentinel(labels_dir: str) -> str:
    return labels_dir.rstrip("/") + ".__swap__"


def _labels_or_empty(
    spark: SparkSession, labels_dir: str
) -> DataFrame | None:
    """The accumulated label table, or None before the first fold.
    RAISES if a swap sentinel is present — a missing/half-swapped
    table must never be read as 'no labels yet' (that would silently
    fork every historical cluster on the next fold)."""
    if os.path.exists(_swap_sentinel(labels_dir)):
        raise RuntimeError(
            f"label store {labels_dir!r} is mid-swap (sentinel "
            "present) — a fold crashed inside the swap bracket; "
            "re-run the stream from its checkpoint (the fold is "
            "idempotent) after re-pointing the directory"
        )
    if not os.path.isdir(labels_dir):
        return None
    return spark.read.parquet(labels_dir)


def fold_pairs_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    labels_dir: str,
    src: str = "id_a",
    dst: str = "id_b",
    node_col: str = "node",
    label_col: str = "component_id",
    max_iter: int = 25,
    n_partitions: int | None = None,
) -> None:
    """Fold ONE batch of candidate pairs into the at-rest label table
    (staged, sentinel-bracketed swap). This is the unit of work the
    stream runs per micro-batch; callable directly for a scheduled
    batch job. Idempotent: re-folding the same pairs is a no-op.
    ``n_partitions`` sizes the swap write (hash on the node id) — the
    at-scale knob the module header names; default keeps the fold's
    own partitioning (fine while the label table is small)."""
    labels = _labels_or_empty(spark, labels_dir)
    if labels is None:
        new_labels = connected_components(
            batch_df, src, dst, node_col, label_col, max_iter
        )
    else:
        new_labels = incremental_components(
            labels, batch_df, src, dst, node_col, label_col, max_iter
        )
    if n_partitions:
        new_labels = new_labels.repartition(
            int(n_partitions), node_col
        )
    staging = labels_dir.rstrip("/") + ".__fold__"
    new_labels.write.mode("overwrite").parquet(staging)
    old = labels_dir.rstrip("/") + ".__old__"
    # A crash after the sentinel removal but before the old-dir rmtree
    # leaves a value-complete-but-stale __old__ behind; clearing it
    # BEFORE writing the sentinel keeps the rename below from failing
    # ENOTEMPTY and wedging the store mid-swap.
    shutil.rmtree(old, ignore_errors=True)
    sentinel = _swap_sentinel(labels_dir)
    with open(sentinel, "w"):
        pass
    if os.path.isdir(labels_dir):
        os.rename(labels_dir, old)
    os.rename(staging, labels_dir)
    os.remove(sentinel)
    if os.path.isdir(old):
        shutil.rmtree(old)


def start_components_stream(
    spark: SparkSession,
    incoming_dir: str,
    schema,
    labels_dir: str,
    checkpoint_dir: str,
    src: str = "id_a",
    dst: str = "id_b",
    node_col: str = "node",
    label_col: str = "component_id",
    max_iter: int = 25,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    n_partitions: int | None = None,
):
    """Maintenance stream for the label store: drain candidate-pair
    files from ``incoming_dir`` and fold each micro-batch into
    ``labels_dir``. availableNow for the nightly-drain spelling;
    processingTime for a live tail — same knobs as the other loops.
    ``n_partitions`` threads through to the fold's swap write (hash
    on the node id) — the at-scale knob the module header names."""
    if os.path.exists(_swap_sentinel(labels_dir)):
        raise RuntimeError(
            f"label store {labels_dir!r} is mid-swap (sentinel "
            "present) — clear the crashed fold before resuming ingest"
        )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", int(max_files_per_trigger)
        )
    stream = reader.parquet(incoming_dir)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint()
        if batch_df.isEmpty():
            return
        fold_pairs_batch(
            spark,
            batch_df,
            labels_dir,
            src,
            dst,
            node_col,
            label_col,
            max_iter,
            n_partitions,
        )

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="10 seconds")
    return writer.start()


def run_components_maintenance(
    spark: SparkSession,
    incoming_dir: str,
    schema,
    labels_dir: str,
    checkpoint_dir: str,
    src: str = "id_a",
    dst: str = "id_b",
    node_col: str = "node",
    label_col: str = "component_id",
    max_iter: int = 25,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 600,
    n_partitions: int | None = None,
) -> None:
    """One scheduled maintenance cycle for the label store — the
    nightly-job spelling that mirrors ``run_index_maintenance`` /
    ``run_retention_maintenance``: drain the candidate-pair backlog
    with an availableNow run of :func:`start_components_stream`, with
    the same drain-timeout contract (stop + raise, never proceed over
    a still-running drain). Unlike the other three loops there is NO
    post-drain compaction or retrain step: the state is a REPLACED
    fold, not a log — every micro-batch already rewrites the label
    table to its compacted form, so the cycle is drain-only. The
    mid-swap sentinel check lives in ``start_components_stream``; a
    timeout leaves the checkpoint intact, so re-running the cycle
    resumes the drain with no progress lost (the fold is
    idempotent)."""
    from pg2kafka_spark.streaming.relay import scrub_virgin_checkpoint

    # a prior cycle's stop/crash can interrupt the FIRST offset write,
    # leaving an orphan .tmp that Spark 4.x refuses to restart over
    # (STATE_STORE_CHECKPOINT_LOCATION_NOT_EMPTY) — scrub it; a no-op
    # the moment any offset has committed.
    scrub_virgin_checkpoint(spark, checkpoint_dir)
    q = start_components_stream(
        spark,
        incoming_dir,
        schema,
        labels_dir=labels_dir,
        checkpoint_dir=checkpoint_dir,
        src=src,
        dst=dst,
        node_col=node_col,
        label_col=label_col,
        max_iter=max_iter,
        max_files_per_trigger=max_files_per_trigger,
        available_now=True,
        n_partitions=n_partitions,
    )
    # awaitTermination returns False on timeout with the stream STILL
    # RUNNING; returning then would let a caller read/serve labels
    # while folds continue behind its back — the between-runs race
    # discipline of the other maintained-state loops.
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"label-store drain exceeded {timeout_s}s; stream stopped "
            "— re-run the cycle (drain is checkpointed and the fold "
            "is idempotent, so no progress is lost)"
        )
