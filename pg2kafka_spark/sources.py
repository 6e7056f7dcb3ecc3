"""Batch/stream source and sink constructors for real deployments.

The reference's I/O surface is: Postgres in (libpq,
eventqueue/event_queue.go), Kafka out (librdkafka, main.go:179-201).
The engine's equivalents, kept as thin option-builders so every knob
is visible and testable without a live server:

* Postgres  → ``spark.read.jdbc`` with range partitioning (a snapshot
  scan O1 at scale must split: one JDBC cursor is the reference's
  single-threaded loop all over again);
* Kafka in  → ``readStream.format("kafka")`` (the outbox topic as the
  change feed);
* Kafka out → producer options mirroring the reference's config map:
  snappy compression and the Java-compatible murmur2 default
  partitioner (main.go:190-195) so key placement matches what a
  pg2kafka consumer already observes.

Nothing here imports a driver: JDBC/Kafka jars are deploy-time
``--packages`` concerns; these builders are pure configuration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pg2kafka_spark.event import EVENT_SCHEMA


def read_postgres_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetch_size: int = 10_000,
) -> DataFrame:
    """O1 snapshot source: partitioned JDBC read of a Postgres table.

    With ``partition_column`` (a numeric/indexed column — the
    external-id or a serial pk), Spark issues ``num_partitions``
    range-bounded cursors in parallel; without it the scan is one
    cursor (only acceptable for dim-sized tables). ``fetch_size``
    bounds per-round-trip rows like the reference's LIMIT pages.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC reads need lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()


def read_kafka_event_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """O2 change source over Kafka: value holds the JSON event
    envelope; parse to the canonical schema. ``maxOffsetsPerTrigger``
    is the page-size analog (O12)."""
    from pyspark.sql import functions as F

    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    raw = reader.load()
    parsed = F.from_json(
        F.col("value").cast("string"),
        EVENT_SCHEMA,
    )
    return raw.select(parsed.alias("e")).select("e.*")


def kafka_sink_options(
    brokers: str,
    compression: str = "snappy",
    acks: str = "all",
    idempotent: bool = True,
) -> dict[str, str]:
    """O17 producer config, mirroring main.go:179-201: snappy
    compression; ordering under retries via the idempotent producer
    (the batched equivalent of the reference's one-in-flight sync
    ack); the default partitioner is already murmur2-compatible with
    Java clients, so keyed placement matches pg2kafka's."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "kafka.compression.type": compression,
        "kafka.acks": acks,
    }
    if idempotent:
        opts["kafka.enable.idempotence"] = "true"
    return opts


__all__ = ["read_postgres_table", "read_kafka_event_stream", "kafka_sink_options"]
