"""Every queries() entry with an oracle must match DuckDB at sf0.001 —
a local replica of the driver's correctness gate (row count + schema +
order-insensitive values), run on the smallest scale factor for speed.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from pg2kafka_spark.testing import compare_frames, duckdb_connection

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF_DIR)
    yield con
    con.close()


def _oracle_names() -> list[str]:
    return sorted(entrymod.oracle_sql().keys())


def test_every_query_has_callable():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs, f"oracle {name} has no queries() entry"


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    oracle_pdf = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems[:5])


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
