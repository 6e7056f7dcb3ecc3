"""Local stand-in for the driver's correctness gate: run every
registered query AND its DuckDB oracle at sf0.01, compare row count,
sorted-column schema, and an order-insensitive value hash.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

from pg2kafka_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> int:
    # exact bit-pattern hashing, like the driver: no rounding slack
    return int(pd.util.hash_pandas_object(df, index=False).sum())


def main() -> None:
    from pg2kafka_spark.queries import ORACLES, QUERIES

    spark = get_spark("parity", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    from pg2kafka_spark.operators.dedup import release_sketch_caches

    failures = []
    for name, fn in sorted(QUERIES.items()):
        if ONLY and name not in ONLY:
            continue
        release_sketch_caches()  # no storage accrual across the suite
        if name not in ORACLES:
            try:
                n = fn(spark, SF_DIR).count()
                print(f"{name:32s} rows-only   n={n}")
            except Exception as e:  # noqa: BLE001
                failures.append(name)
                print(f"{name:32s} ERROR {e}")
            continue
        try:
            sdf = canon(fn(spark, SF_DIR).toPandas())
            odf = canon(con.sql(ORACLES[name]).fetchdf())
            rows = len(sdf) == len(odf)
            schema = list(sdf.columns) == list(odf.columns)
            dtypes_differ = rows and schema and not all(
                sdf[c].dtype == odf[c].dtype for c in sdf.columns
            )
            if rows and schema:
                try:
                    odf2 = odf.astype(sdf.dtypes.to_dict())
                except (TypeError, ValueError):
                    odf2 = odf
                hmatch = value_hash(sdf) == value_hash(odf2)
            else:
                hmatch = False
            flag = "OK " if (rows and schema and hmatch) else "FAIL"
            note = " (dtype-coerced)" if dtypes_differ else ""
            if flag == "FAIL":
                failures.append(name)
            print(
                f"{name:32s} {flag} rows={len(sdf)}/{len(odf)} schema={schema} hash={hmatch}{note}"
            )
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:32s} ERROR {type(e).__name__}: {str(e)[:200]}")
    print("FAILURES:", failures or "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
