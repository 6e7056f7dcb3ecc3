"""Query/oracle registry primitives (shared by the q_* modules).

Determinism rules every registered query follows (driver hash-matches
row count + schema + order-insensitive values against DuckDB):

* every computed column aliased identically in Spark and oracle SQL;
* double aggregates rounded the same on both sides;
* ``events.ts`` never emitted raw (the parquet encoding has shipped
  as both ns and µs-NTZ; ``load_table`` normalizes, but timestamp
  RENDERING differs across engines) — use ``unix_micros``/
  ``epoch_us`` or formatted strings;
* any LIMIT/top-k ordering carries a unique key as tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
