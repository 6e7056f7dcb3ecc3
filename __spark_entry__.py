"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``pg2kafka_spark.queries`` — the registry maps every
implemented operator from SURVEY.md §2 to a (spark, sf_dir) →
DataFrame callable plus, where ANSI-SQL-expressible, a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pg2kafka_spark.queries import ORACLES, QUERIES

FLAGSHIP = "latest_state_per_user"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: per-key latest-state compaction of
    the events change stream (the canonical pg2kafka-consumer query —
    per-key ordering contract, reference README.md:38-40)."""
    return QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
