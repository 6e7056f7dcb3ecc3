"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors the documented check (row count + schema + order-insensitive
value match) so every query is validated here before the driver ever
sees it. Used by tests/test_oracle_parity.py and ad-hoc debugging.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from pg2kafka_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canonical(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by all values — order-insensitive."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="first", kind="mergesort")
    return df.reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"schema mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    s, o = _canonical(spark_pdf), _canonical(oracle_pdf)
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if _values_equal(a, b):
                continue
            problems.append(f"value mismatch col={col} row={i}: spark={a!r} oracle={b!r}")
            if len(problems) > 10:
                return problems
    return problems


def _values_equal(a: object, b: object) -> bool:
    a_nan = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NaT
    b_nan = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NaT
    if a_nan or b_nan:
        return a_nan and b_nan
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9):
            return True
        return False
    if type(a) is not type(b):
        return str(a) == str(b)
    return a == b
