"""Deployment-surface tests: the daemon entry point and source/sink
config builders (the parts that need no live Postgres/Kafka)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from pg2kafka_spark import __main__ as daemon
from pg2kafka_spark.sources import kafka_sink_options, read_postgres_table
from pg2kafka_spark.streaming import bootstrap_outbox


def test_kafka_sink_options_mirror_reference_producer_config():
    opts = kafka_sink_options("broker:9092")
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["kafka.compression.type"] == "snappy"  # main.go:194
    assert opts["kafka.acks"] == "all"
    assert opts["kafka.enable.idempotence"] == "true"  # ordered retries


def test_partitioned_jdbc_read_requires_bounds(spark):
    with pytest.raises(ValueError, match="bounds"):
        read_postgres_table(
            spark, "jdbc:postgresql://h/db", "users", partition_column="id"
        )


def test_daemon_dry_run_drains_and_exits(spark, tmp_path, capsys):
    # RELAY_ONCE + DRY_RUN = the reference's startup drain with the
    # stdout producer (main.go:106-115,158-160): processes the backlog,
    # prints, returns 0.
    outbox = str(tmp_path / "outbox")
    users = spark.createDataFrame([Row(uid="u1", name="a"), Row(uid="u2", name="b")])
    bootstrap_outbox(users, outbox, "users", "uid")
    rc = daemon.main(
        {
            "OUTBOX_DIR": outbox,
            "DATABASE": "testdb",
            "TOPIC_NAMESPACE": "staging",
            "DRY_RUN": "true",
            "RELAY_ONCE": "true",
            "CHECKPOINT_DIR": str(tmp_path / "ckpt"),
        }
    )
    assert rc == 0


def test_daemon_requires_outbox_dir():
    assert daemon.main({}) == 2
