"""pg2kafka_spark — a PySpark-native engine with the query and
data-processing capabilities of blendle/pg2kafka (trigger-based
Postgres→Kafka CDC outbox relay), rebuilt Spark-first.

Reference semantics (see SURVEY.md for the full operator inventory,
citations into /root/reference):

* CDC core — snapshot scan, change capture, changed-columns-only diff,
  no-op suppression, keyed wire format, topic routing, at-least-once
  ordered delivery (``pg2kafka_spark.operators``, ``.streaming``).
* Relational consumer surface — the batch DataFrame/SQL operators a
  consumer of the CDC feed needs (joins, aggregations, windows, …).
* Pipeline extras — dedup, similarity search, text analysis, multimodal
  column plumbing for large-scale training-data pipelines.

Everything is expressed with the DataFrame API so Catalyst/Tungsten/AQE
pick the physical strategy; Python UDFs appear only where built-in
functions genuinely cannot express the semantics (Arrow-batched).
"""

from pg2kafka_spark.session import get_spark, stop_spark
from pg2kafka_spark.catalog import load_table, load_tables, TABLES

__all__ = ["get_spark", "stop_spark", "load_table", "load_tables", "TABLES"]

__version__ = "0.1.0"
