"""O15/O16/O20 — wire-format JSON encode, topic routing, null-safe key.

Reference: ``json.Marshal(event)`` with ``json:"-"`` omissions leaves
exactly ``uuid, external_id, statement, data, created_at`` on the wire
(main.go:143-146, eventqueue/event_queue.go:41-50, README.md:76-86);
topic is ``pg2kafka.$namespace.$table`` where namespace is the database
name optionally prefixed by ``TOPIC_NAMESPACE`` (main.go:203-222);
message key = external_id, NULL key ⇒ unkeyed message
(eventqueue/event_queue.go:157-164, main_test.go:98-100).

Spark-first: projections only — the Kafka sink consumes ``key``,
``value``, ``topic`` columns directly, routing per-row, so one stream
serves every tracked table (the reference runs one topic per table from
one process the same way). NULL external_id naturally becomes a Kafka
null key (round-robin partition — same ordering caveat as the
reference).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def parse_topic_namespace(database: str, topic_namespace: str | None = None) -> str:
    """``parseTopicNamespace`` (main.go:215-222): optional prefix + dbname."""
    if topic_namespace:
        return f"{topic_namespace}.{database}"
    return database


def topic_name(table_name: str, database: str, topic_namespace: str | None = None) -> str:
    """``topicName`` (main.go:203-205): ``pg2kafka.$namespace.$table``."""
    return f"pg2kafka.{parse_topic_namespace(database, topic_namespace)}.{table_name}"


def topic_column(database: str, topic_namespace: str | None = None) -> Column:
    """Per-row topic routing expression over ``table_name``."""
    ns = parse_topic_namespace(database, topic_namespace)
    return F.concat_ws(".", F.lit("pg2kafka"), F.lit(ns), F.col("table_name"))


def with_topic(events: DataFrame, database: str, topic_namespace: str | None = None) -> DataFrame:
    return events.withColumn("topic", topic_column(database, topic_namespace))


def wire_value(timestamp_format: str = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX") -> Column:
    """The JSON wire payload (O15). ``data`` is already a JSON string;
    re-parsing it server-side just to re-serialize would be wasted work
    at scale, so we splice it in as a raw fragment: serialize the other
    four fields, strip the closing brace, append ``"data": <raw>``.

    ``created_at`` renders ISO-8601 with microseconds, matching
    Postgres/Go wire output (README.md:85).
    """
    head = F.to_json(
        F.struct(
            F.col("uuid"),
            F.col("external_id"),
            F.col("statement"),
            F.date_format(F.col("created_at"), timestamp_format).alias("created_at"),
        ),
        {"ignoreNullFields": "false"},
    )
    return F.concat(
        head.substr(F.lit(1), F.length(head) - F.lit(1)),
        F.lit(',"data":'),
        F.col("data"),
        F.lit("}"),
    )


def ordered_for_delivery(
    events: DataFrame,
    num_partitions: int | None = None,
    key_col: str = "external_id",
    seq_col: str = "id",
) -> DataFrame:
    """Enforce the reference's per-key delivery order for a PARALLEL
    producer (README.md:38-40: murmur2 partitioning on external_id +
    one-in-flight sync produce ⇒ strict per-entity order).

    A micro-batch's rows for one key can span source partitions
    (different outbox files), and a parallel sink would interleave
    them. This is the standard Spark fix, applied ONCE at the sink
    edge: hash-repartition on the key so every key lands in exactly
    one task, then sort within each task by (key, seq). A foreachBatch
    producer that iterates its partition in order then emits each
    key's events in outbox-id order; with the checkpoint's ordered
    micro-batches that extends to the whole stream. NULL keys (the
    reference's unkeyed ByteString-nil messages) all hash to one task
    but carry no ordering contract, same as the reference's
    round-robin produce.

    The wire projection (:func:`to_wire`) is narrow, so applying it
    AFTER this preserves the per-partition order. Scale: one shuffle
    of the micro-batch (bounded by the paging knob), sort is per-task
    over that batch's rows — the price of the reference's contract at
    any parallelism, vs the reference's single-process serial produce.
    """
    parted = (
        events.repartition(int(num_partitions), F.col(key_col))
        if num_partitions
        else events.repartition(F.col(key_col))
    )
    return parted.sortWithinPartitions(key_col, seq_col)


def from_wire(
    messages: DataFrame,
    data_schema: str,
    value_col: str = "value",
    timestamp_format: str = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    rescue: bool = False,
) -> DataFrame:
    """CONSUMER-side decode — the inverse of :func:`wire_value`, the
    parse every downstream service of the reference writes by hand
    against the documented payload (README.md:75-90): one
    ``from_json`` recovers the envelope (uuid, external_id,
    statement, created_at) and the TYPED row under ``data``
    (``data_schema`` is the tracked table's DDL — schema-pinned like
    every text source here, never inferred). Returns the input
    columns plus the five decoded ones; gate on ``data IS NULL`` for
    quarantine (PERMISSIVE parse, malformed payloads decode to
    NULL row).

    ``rescue=True`` adds a ``rescued`` column — ``map<string,string>``
    of the payload keys NOT in the pinned schema, each value the raw
    JSON text. A pinned ``from_json`` silently drops unknown keys, so
    an upstream ``ALTER TABLE ADD COLUMN`` (which the reference's
    schemaless jsonb capture forwards on the wire unasked,
    sql/triggers.sql:21-29) would otherwise be invisible downstream;
    with rescue the drifted keys are observable (alert on
    ``size(rescued) > 0``, backfill from the raw text after the
    schema catches up). Empty map = no drift; NULL = the payload
    itself failed to parse (the quarantine gate above).

    Scale shape: JVM-side JacksonParser projections inside codegen
    next to whatever scan carries the messages — the decode twin of
    the encode's splice, no Python, no shuffle; ``rescue`` adds two
    more parser passes over the same in-register string (envelope as
    map to slice the raw ``data`` fragment, fragment as map to diff
    keys), still map-only."""
    full = (
        "uuid string, external_id string, statement string, "
        f"created_at string, data struct<{data_schema}>"
    )
    w = F.from_json(F.col(value_col), full)
    cols = [
        w.getField("uuid").alias("uuid"),
        w.getField("external_id").alias("external_id"),
        w.getField("statement").alias("statement"),
        F.to_timestamp(
            w.getField("created_at"), timestamp_format
        ).alias("created_at"),
        w.getField("data").alias("data"),
    ]
    if rescue:
        from pyspark.sql.types import StructType

        known = [f.name for f in StructType.fromDDL(data_schema).fields]
        # map<string,string> parse keeps unknown structure: non-string
        # JSON values (numbers, nested objects) come through as their
        # raw text, so nothing the producer added is lost.
        raw_data = F.from_json(
            F.col(value_col), "map<string,string>"
        ).getItem("data")
        cols.append(
            F.map_filter(
                F.from_json(raw_data, "map<string,string>"),
                lambda k, _v: ~k.isin(known),
            ).alias("rescued")
        )
    return messages.select("*", *cols)


def to_wire(
    events: DataFrame,
    database: str,
    topic_namespace: str | None = None,
    timestamp_format: str = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
) -> DataFrame:
    """Project canonical events to Kafka sink shape:
    ``key`` (nullable binary-safe string), ``value`` (JSON),
    ``topic``, ``headers``.

    Drop-on-the-floor columns (``id``/``table_name``/``processed``)
    match the ``json:"-"`` omissions. Spark's Kafka sink consumes
    only key/value/topic/partition/headers — it cannot set the
    broker-side message timestamp from a column (that is assigned at
    produce time), so the event's own ``created_at`` rides as a
    ``created_at`` message HEADER (ISO-8601 µs, same rendering as the
    payload field) in addition to the JSON body. Consumers that read
    the reference's timestamped messages read the header instead.
    """
    return events.select(
        F.col("external_id").alias("key"),
        wire_value(timestamp_format).alias("value"),
        topic_column(database, topic_namespace).alias("topic"),
        F.array(
            F.struct(
                F.lit("created_at").alias("key"),
                F.encode(
                    F.date_format(F.col("created_at"), timestamp_format), "UTF-8"
                ).alias("value"),
            )
        ).alias("headers"),
    )
