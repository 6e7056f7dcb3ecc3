"""Dump .explain("formatted") for named queries to plans/<dir>/.

Usage:
    PLAN_QUERIES=a,b PLAN_OUT=plans/r20 PLAN_SUFFIX=before \
    python tools/dump_plan.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [n for n in os.environ.get("PLAN_QUERIES", "").split(",") if n]
    out_dir = os.environ.get("PLAN_OUT", "plans/r20")
    suffix = os.environ.get("PLAN_SUFFIX", "before")

    from pg2kafka_spark.session import get_spark

    spark = get_spark("pg2kafka_spark-dump-plan")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"[plan] wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
