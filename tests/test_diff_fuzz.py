"""Randomized semantics check of the capture pipeline (O2..O8).

The trigger-semantics unit tests cover the reference's specific
scenarios (sql/sql_test.go); this fuzzes 300 seeded-random change rows
— nulls, update-to-null, nested map (hstore analog) changes, no-op
updates, deletes — through ``capture_changes`` in ONE Spark job and
checks every emitted payload against an independent Python oracle of
the trigger rules (sql/triggers.sql:20-37).
"""

from __future__ import annotations

import json
import random

from pyspark.sql import types as T

from pg2kafka_spark.operators.diff import capture_changes

SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("case_id", T.LongType(), False),
        T.StructField(
            "before",
            T.StructType(
                [
                    T.StructField("uid", T.StringType(), True),
                    T.StructField("n", T.IntegerType(), True),
                    T.StructField("name", T.StringType(), True),
                    T.StructField("m", T.MapType(T.StringType(), T.StringType()), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "after",
            T.StructType(
                [
                    T.StructField("uid", T.StringType(), True),
                    T.StructField("n", T.IntegerType(), True),
                    T.StructField("name", T.StringType(), True),
                    T.StructField("m", T.MapType(T.StringType(), T.StringType()), True),
                ]
            ),
            True,
        ),
    ]
)

COLUMNS = ["uid", "n", "name", "m"]


def _rand_value(rng: random.Random, col: str):
    if rng.random() < 0.25:
        return None
    if col == "n":
        return rng.randrange(0, 5)
    if col == "m":
        return {k: str(rng.randrange(0, 3)) for k in rng.sample("abc", rng.randrange(0, 3))} or None
    return rng.choice(["x", "y", 'quo"te', "unié", ""])


def _rand_row(rng: random.Random):
    return {c: _rand_value(rng, c) for c in COLUMNS}


def _gen_cases(n: int, seed: int = 13):
    rng = random.Random(seed)
    cases = []
    for i in range(n):
        op = rng.choice(["INSERT", "UPDATE", "UPDATE", "DELETE"])  # UPDATEs dominate
        before = _rand_row(rng) if op != "INSERT" else None
        if op == "UPDATE":
            if rng.random() < 0.2:
                after = dict(before)  # guaranteed no-op
            else:
                after = dict(before)
                for c in rng.sample(COLUMNS, rng.randrange(1, 4)):
                    after[c] = _rand_value(rng, c)
        elif op == "INSERT":
            after = _rand_row(rng)
        else:
            after = None
        cases.append((op, i, before, after))
    return cases


def _tuple(row: dict | None):
    if row is None:
        return None
    return (row["uid"], row["n"], row["name"], row["m"])


def _expected_payload(op: str, before: dict | None, after: dict | None):
    """Python oracle of the trigger rules. None ⇒ event suppressed."""
    if op == "INSERT":
        return {c: after[c] for c in COLUMNS}
    if op == "DELETE":
        return {}
    diff = {c: after[c] for c in COLUMNS if after[c] != before[c]}
    return diff if diff else None


def test_capture_changes_fuzz(spark):
    cases = _gen_cases(300)
    rows = [(op, i, _tuple(b), _tuple(a)) for op, i, b, a in cases]
    df = spark.createDataFrame(rows, SCHEMA)
    # case_id doubles as the outbox id so output maps back to inputs
    from pyspark.sql import functions as F

    out = capture_changes(
        df, "users", "uid", COLUMNS, id_column=F.col("case_id")
    ).collect()
    got = {r.id: r for r in out}

    for op, i, before, after in cases:
        expected = _expected_payload(op, before, after)
        if expected is None:
            assert i not in got, f"case {i}: no-op UPDATE must be suppressed"
            continue
        assert i in got, f"case {i} ({op}): event missing"
        r = got[i]
        assert r.statement == op
        assert json.loads(r.data) == expected, (
            f"case {i} ({op}): payload {r.data!r} != {expected!r}"
        )
        # key: NEW on INSERT, OLD otherwise (sql/triggers.sql:14-18)
        key_src = after if op == "INSERT" else before
        assert r.external_id == key_src["uid"]
        assert r.table_name == "users"
        assert r.processed is False
