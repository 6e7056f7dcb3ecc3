"""Every queries() entry with an oracle must match DuckDB at sf0.001 —
a local replica of the driver's correctness gate (row count + schema +
order-insensitive values), run on the smallest scale factor for speed.

``PARITY_SHARD=k/n`` (r18, r17 verdict item 1) restricts the
parametrized sweep to every n-th query (round-robin over the sorted
names, so the expensive families scatter evenly) — tools/run_tests.sh
runs this file as TWO concurrent lanes (0/2 and 1/2) because the
single-process sweep alone bound the r17 suite wall at ~997 s. The
union of the shards is exactly the full name set; with the variable
unset (plain ``pytest tests/``), nothing is sharded. The two
unparametrized tests run only in shard 0 (or unsharded) — they need
the registry, not the sweep.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from pg2kafka_spark.testing import compare_frames, duckdb_connection

SF_DIR = "/root/testdata/sf0.001"
_SHARD = os.environ.get("PARITY_SHARD")  # "k/n" or unset


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF_DIR)
    yield con
    con.close()


def _shard_names(names: list[str], shard: str | None) -> list[str]:
    if not shard:
        return names
    k, n = (int(x) for x in shard.split("/"))
    return [m for i, m in enumerate(names) if i % n == k]


def _oracle_names() -> list[str]:
    return _shard_names(sorted(entrymod.oracle_sql().keys()), _SHARD)


def test_parity_shards_partition_the_names():
    """The k/n shards must be disjoint and their union the FULL name
    set — a sharding typo must fail here, not silently drop queries
    from the suite's coverage."""
    names = sorted(entrymod.oracle_sql().keys())
    s0 = _shard_names(names, "0/2")
    s1 = _shard_names(names, "1/2")
    assert sorted(s0 + s1) == names
    assert not set(s0) & set(s1)
    assert _shard_names(names, None) == names


def _in_primary_shard() -> bool:
    return _SHARD is None or _SHARD.split("/")[0] == "0"


@pytest.mark.skipif(
    not _in_primary_shard(), reason="runs once, in shard 0"
)
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


@pytest.mark.skipif(
    not _in_primary_shard(), reason="runs once, in shard 0"
)
def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
