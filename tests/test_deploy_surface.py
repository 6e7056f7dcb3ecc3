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


def test_daemon_ordered_delivery_drains_and_exits(spark, tmp_path):
    """ORDERED_DELIVERY=true routes each micro-batch through
    ordered_for_delivery before the wire projection (the reference's
    per-entity order contract, README.md:38-40) — the daemon must
    drain cleanly with the keyed shuffle in the loop."""
    outbox = str(tmp_path / "outbox")
    users = spark.createDataFrame(
        [Row(uid="u1", name="a"), Row(uid="u2", name="b"),
         Row(uid=None, name="c")]
    )
    bootstrap_outbox(users, outbox, "users", "uid")
    rc = daemon.main(
        {
            "OUTBOX_DIR": outbox,
            "DATABASE": "testdb",
            "DRY_RUN": "true",
            "RELAY_ONCE": "true",
            "ORDERED_DELIVERY": "true",
            "ORDERED_PARTITIONS": "4",
            "CHECKPOINT_DIR": str(tmp_path / "ckpt"),
        }
    )
    assert rc == 0


def test_daemon_requires_outbox_dir():
    assert daemon.main({}) == 2


# --- migrations bootstrap (PERFORM_MIGRATIONS analog, main.go:58-61) ------


def test_perform_migrations_creates_and_is_idempotent(tmp_path):
    from pg2kafka_spark.migrations import (
        MANIFEST_NAME,
        load_registry,
        perform_migrations,
    )
    from pg2kafka_spark.registry import Registry

    outbox = str(tmp_path / "fresh" / "outbox")  # nested: mkdir -p semantics
    assert perform_migrations(outbox, Registry({"products": "sku"})) is True
    assert (tmp_path / "fresh" / "outbox" / MANIFEST_NAME).exists()
    # CREATE IF NOT EXISTS: second run is a no-op, not an error
    assert perform_migrations(outbox) is False
    assert load_registry(outbox).key_column("products") == "sku"


def test_perform_migrations_warns_and_keeps_mapping_on_rekey(tmp_path):
    # the setup() guard (sql/triggers.sql:86-94): re-registering with a
    # different key column warns and keeps the original
    from pg2kafka_spark.migrations import load_registry, perform_migrations
    from pg2kafka_spark.registry import Registry

    outbox = str(tmp_path / "outbox")
    perform_migrations(outbox, Registry({"products": "sku"}))
    with pytest.warns(UserWarning, match="already registered"):
        perform_migrations(outbox, Registry({"products": "id", "users": "uid"}))
    reg = load_registry(outbox)
    assert reg.key_column("products") == "sku"  # original kept
    assert reg.key_column("users") == "uid"  # new table added


def test_perform_migrations_fails_fast_on_envelope_conflict(tmp_path):
    import json

    from pg2kafka_spark.migrations import MANIFEST_NAME, perform_migrations

    outbox = str(tmp_path / "outbox")
    perform_migrations(outbox)
    path = tmp_path / "outbox" / MANIFEST_NAME
    doc = json.loads(path.read_text())
    doc["event_schema"]["fields"] = doc["event_schema"]["fields"][:-1]
    path.write_text(json.dumps(doc))
    with pytest.raises(RuntimeError, match="different event envelope"):
        perform_migrations(outbox)


def test_daemon_bootstraps_outbox_with_perform_migrations(spark, tmp_path):
    # a fresh deployment: PERFORM_MIGRATIONS creates the outbox layout,
    # the drain finds an empty log and exits cleanly (main.go:58-61
    # before the drain at main.go:85-93)
    from pg2kafka_spark.migrations import MANIFEST_NAME

    outbox = str(tmp_path / "outbox")
    rc = daemon.main(
        {
            "OUTBOX_DIR": outbox,
            "PERFORM_MIGRATIONS": "true",
            "DATABASE": "testdb",
            "DRY_RUN": "true",
            "RELAY_ONCE": "true",
            "CHECKPOINT_DIR": str(tmp_path / "ckpt"),
        }
    )
    assert rc == 0
    assert (tmp_path / "outbox" / MANIFEST_NAME).exists()


class TestTextFormatSources:
    """JSONL/CSV corpus sources (sources.py): schema-pinned reads
    must reproduce the parquet table exactly, and malformed lines
    must quarantine instead of killing the job or vanishing."""

    DOC_SCHEMA = (
        "doc_id bigint, source string, lang string, text string"
    )

    def _docs(self, spark):
        from pg2kafka_spark.catalog import load_table

        return load_table(
            spark, "documents", "/root/testdata/sf0.001"
        ).select("doc_id", "source", "lang", "text")

    def test_jsonl_roundtrips_parquet_table(self, spark, tmp_path):
        from pg2kafka_spark.sources import read_jsonl, split_quarantine

        docs = self._docs(spark)
        p = str(tmp_path / "docs_jsonl")
        docs.write.json(p)
        clean, bad = split_quarantine(
            read_jsonl(spark, p, self.DOC_SCHEMA)
        )
        assert bad.count() == 0
        a = sorted(map(tuple, docs.collect()))
        b = sorted(map(tuple, clean.select(*docs.columns).collect()))
        assert a == b

    def test_csv_roundtrips_parquet_table(self, spark, tmp_path):
        from pg2kafka_spark.sources import read_csv, split_quarantine

        docs = self._docs(spark)
        p = str(tmp_path / "docs_csv")
        # corpus text is space-separated tokens (no quoting needed for
        # the fixture, but write with defaults so quoting is exercised
        # if present)
        docs.write.option("header", "true").csv(p)
        clean, bad = split_quarantine(
            read_csv(spark, p, self.DOC_SCHEMA)
        )
        assert bad.count() == 0
        a = sorted(map(tuple, docs.collect()))
        b = sorted(map(tuple, clean.select(*docs.columns).collect()))
        assert a == b

    def test_csv_header_variants_filtered(self, spark, tmp_path):
        """Quoted and CRLF header renderings must not leak as data
        rows (r13 advice) — and with a typed column, an exotically
        spaced header quarantines instead of parsing clean."""
        from pg2kafka_spark.sources import read_csv, split_quarantine

        p = tmp_path / "hdr.csv"
        p.write_text(
            '"doc_id","source","lang","text"\r\n'
            "1,s,en,hello\r\n"
            "doc_id,source,lang,text\n"
            "2,s,en,world\n"
            # exotic spacing: not a recognized variant, but doc_id is
            # BIGINT so coercion fails -> quarantine, not a clean row
            "doc_id, source, lang, text\n"
        )
        clean, bad = split_quarantine(
            read_csv(spark, str(p), self.DOC_SCHEMA)
        )
        got = sorted(
            (r.doc_id, r.text.rstrip("\r")) for r in clean.collect()
        )
        assert got == [(1, "hello"), (2, "world")]
        assert bad.count() == 1  # the spaced header, via coercion

    def test_corrupt_column_collision_rejected(self, spark, tmp_path):
        from pg2kafka_spark.sources import read_csv, read_jsonl

        p = tmp_path / "x.jsonl"
        p.write_text('{"a": 1}\n')
        bad_schema = "a bigint, _corrupt_record string"
        for reader in (read_jsonl, read_csv):
            try:
                reader(spark, str(p), bad_schema)
                raise AssertionError("collision must raise")
            except ValueError as e:
                assert "_corrupt_record" in str(e)

    def test_malformed_jsonl_lines_quarantine_not_crash(
        self, spark, tmp_path
    ):
        from pg2kafka_spark.sources import read_jsonl, split_quarantine

        p = tmp_path / "mixed.jsonl"
        p.write_text(
            '{"doc_id": 1, "source": "s", "lang": "en", "text": "ok"}\n'
            "{this is not json at all\n"
            '{"doc_id": 2, "source": "s", "lang": "en", "text": "ok2"}\n'
        )
        clean, bad = split_quarantine(
            read_jsonl(spark, str(p), self.DOC_SCHEMA)
        )
        assert clean.count() == 2
        bad_rows = bad.collect()
        assert len(bad_rows) == 1
        assert "not json" in bad_rows[0]["_corrupt_record"]
        assert bad_rows[0]["doc_id"] is None

    def test_jsonl_parse_stays_jvm_side(self, spark, tmp_path):
        """The parse must run as a JVM projection over the text scan
        (JacksonParser in codegen), never as a Python stage — no
        ArrowEvalPython/BatchEvalPython in the plan."""
        from pg2kafka_spark.sources import read_jsonl

        p = str(tmp_path / "docs_plan")
        self._docs(spark).limit(10).write.json(p)
        plan = (
            read_jsonl(spark, p, self.DOC_SCHEMA)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan
        assert "FileScan text" in plan
        assert "from_json" in plan


class TestCsvAllStringHeaderQuarantine:
    """All-string schemas make header-shaped lines ambiguous with
    data; the reader must route them to quarantine (countable,
    resurrectable) instead of an uncountable drop (r14 advice)."""

    SCHEMA = "a string, b string"

    def test_header_shaped_rows_quarantine_not_drop(self, spark, tmp_path):
        from pg2kafka_spark.sources import read_csv, split_quarantine

        p = tmp_path / "allstr.csv"
        p.write_text(
            "a,b\n"          # real header
            "x,y\n"
            '"a","b"\n'      # data row that renders like the quoted header
            "z,w\n"
        )
        clean, bad = split_quarantine(
            read_csv(spark, str(p), self.SCHEMA)
        )
        assert sorted((r.a, r.b) for r in clean.collect()) == [
            ("x", "y"),
            ("z", "w"),
        ]
        # both header-shaped lines are observable, raw line preserved
        quarantined = sorted(r[ "_corrupt_record"] for r in bad.collect())
        assert quarantined == ['"a","b"', "a,b"]

    def test_typed_schema_still_filters_header(self, spark, tmp_path):
        from pg2kafka_spark.sources import read_csv, split_quarantine

        p = tmp_path / "typed.csv"
        p.write_text("a,b\n1,y\n2,w\n")
        clean, bad = split_quarantine(
            read_csv(spark, str(p), "a bigint, b string")
        )
        assert bad.count() == 0
        assert sorted((r.a, r.b) for r in clean.collect()) == [
            (1, "y"),
            (2, "w"),
        ]

    def test_all_string_corrupt_collision_still_rejected(
        self, spark, tmp_path
    ):
        from pg2kafka_spark.sources import read_csv

        p = tmp_path / "c.csv"
        p.write_text("a,_corrupt_record\nx,y\n")
        try:
            read_csv(spark, str(p), "a string, _corrupt_record string")
            raise AssertionError("collision must raise")
        except ValueError as e:
            assert "_corrupt_record" in str(e)


def test_from_wire_quarantines_malformed_payloads(spark):
    """Consumer-side decode: malformed wire values decode to NULL
    data (PERMISSIVE), clean ones recover the typed row — consumers
    gate on data IS NULL exactly like the text sources."""
    from pg2kafka_spark.operators.wire import from_wire

    msgs = spark.createDataFrame(
        [
            ('{"external_id":"1","statement":"INSERT",'
             '"data":{"uid":7,"plan":"pro"}}',),
            ("{this is not json",),
        ],
        "value string",
    )
    out = from_wire(msgs, "uid bigint, plan string").collect()
    by_ok = {r.data is not None: r for r in out}
    assert by_ok[True].data.uid == 7 and by_ok[True].data.plan == "pro"
    assert by_ok[False].external_id is None


def test_from_wire_rescues_drifted_producer_columns(spark):
    """Schema drift e2e (r16): the producer's table grew columns the
    consumer's pinned schema doesn't know (the reference's jsonb
    capture forwards them unasked). rescue=True surfaces exactly the
    unknown keys with raw-text values — numbers and nested objects
    included — while the typed decode stays intact; an undrifted
    payload rescues an EMPTY map and a malformed one rescues NULL
    (same quarantine gate as data)."""
    from pg2kafka_spark.operators.wire import from_wire

    msgs = spark.createDataFrame(
        [
            # drifted: upstream added added_s (string), added_n
            # (number) and added_o (nested object)
            ('{"external_id":"1","statement":"UPDATE",'
             '"data":{"uid":7,"plan":"pro","added_s":"x",'
             '"added_n":25,"added_o":{"a":1}}}',),
            # clean producer, no drift
            ('{"external_id":"2","statement":"INSERT",'
             '"data":{"uid":8,"plan":"basic"}}',),
            ("{not json",),
        ],
        "value string",
    )
    out = from_wire(msgs, "uid bigint, plan string", rescue=True)
    rows = {r.external_id: r for r in out.collect()}
    drifted = rows["1"]
    # typed decode unaffected by the unknown keys
    assert drifted.data.uid == 7 and drifted.data.plan == "pro"
    assert drifted.rescued == {
        "added_s": "x",
        "added_n": "25",
        "added_o": '{"a":1}',
    }
    assert rows["2"].rescued == {}
    assert rows[None].rescued is None


def test_source_signature_tracks_content_identity(spark, tmp_path):
    """The at-rest store cache key must change when the source's
    bytes change (even same-second, same-size rewrites — mtime_ns)
    and stay stable across reads."""
    import os

    from pg2kafka_spark.catalog import source_signature

    d = tmp_path / "t.parquet"
    spark.range(10).coalesce(1).write.mode("overwrite").parquet(str(d))
    s1 = source_signature(str(tmp_path), "t")
    assert s1 == source_signature(str(tmp_path), "t")
    part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
    os.utime(os.path.join(d, part), ns=(1, 1))
    assert source_signature(str(tmp_path), "t") != s1
