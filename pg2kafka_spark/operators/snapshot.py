"""O1/O8 — snapshot scan: full table → SNAPSHOT events.

Reference: ``create_snapshot_events(regclass)`` loops ``SELECT * FROM
t``, wraps every row as a ``SNAPSHOT`` event via ``row_to_json`` and
appends it to the outbox with sequence/uuid/timestamp defaults
(sql/triggers.sql:49-75; defaults sql/migrations.sql:7-13).

Spark-first: one narrow ``select`` over the scan — no shuffle, no UDF.
At 100 TB the snapshot is embarrassingly parallel: each input split maps
straight to event rows; Catalyst prunes unread columns if the caller
projects, and the JSON serialization runs inside whole-stage codegen.

``id`` ordering: the reference gets a global sequence from Postgres.
A global order is inherently serial, so at scale we keep only what the
contract needs — per-key order (Kafka keys it anyway, README.md:38-40) —
and use ``monotonically_increasing_id()`` (partition-major, unique,
monotone within a partition) as the outbox ``id`` analog.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from pg2kafka_spark.event import EVENT_COLUMNS, STMT_SNAPSHOT


def snapshot_events(
    df: DataFrame,
    table_name: str,
    external_id_column: str | None,
    payload_columns: Sequence[str] | None = None,
    id_column: Column | None = None,
) -> DataFrame:
    """Wrap every row of ``df`` as a SNAPSHOT event.

    ``external_id_column`` None ⇒ NULL external_id (untracked key —
    unkeyed Kafka message, sql/sql_test.go:220-222). A NULL value in
    the key column likewise passes through as NULL (ByteString nil
    semantics, eventqueue/event_queue.go:157-164).

    ``payload_columns`` restricts ``row_to_json`` to a projection
    (default: all columns). ``id_column`` overrides the outbox-id
    expression (e.g. a source offset for exactly-ordered handoff).
    """
    cols = list(payload_columns) if payload_columns is not None else df.columns
    key = (
        F.col(external_id_column).cast("string")
        if external_id_column is not None
        else F.lit(None).cast("string")
    )
    out = df.select(
        (id_column if id_column is not None else F.monotonically_increasing_id()).alias("id"),
        F.expr("uuid()").alias("uuid"),
        key.alias("external_id"),
        F.lit(table_name).alias("table_name"),
        F.lit(STMT_SNAPSHOT).alias("statement"),
        # row_to_json(rec) analog (sql/triggers.sql:66); nulls kept as
        # JSON null — an explicit reference behavior (sql/sql_test.go:92-110).
        F.to_json(
            F.struct(*[F.col(c) for c in cols]),
            {"ignoreNullFields": "false"},
        ).alias("data"),
        F.current_timestamp().alias("created_at"),
        F.lit(False).alias("processed"),
    )
    return out.select(*EVENT_COLUMNS)
