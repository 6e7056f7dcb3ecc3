"""Temporal joins: as-of join and bucketed interval (range) join.

The reference has no join operator at all (SURVEY.md §2.1 — its only
join-shaped step is the 1-row registry probe, sql/triggers.sql:10-12),
but every CDC *consumer* needs temporal joins the moment it correlates
the change feed with another time-ordered table ("which order was this
user's latest when the event fired?"). Spark has no built-in as-of or
band join, so both are implemented here as compositions of existing
DataFrame ops — no UDFs, fully inside whole-stage codegen.

Scale notes (the point of these formulations):

* ``asof_join`` is the union trick: tag both sides, ONE shuffle on the
  join key, per-key sort by (time, side), and ``last(..., ignorenulls)``
  over an unbounded-preceding frame carries the most recent right-side
  row forward onto each left row. No join node at all — cost is one
  hash exchange + per-key sort, the same shape as any windowed query,
  so it survives 1000 executors as long as single keys fit a partition
  (skewed keys: pre-split by coarse time bucket and carry state across
  bucket boundaries, same trick as sessionization).
* ``interval_join`` avoids the O(|L|·|R|) theta-join Spark would plan
  for ``l.ts BETWEEN r.start AND r.end`` by bucketing time: intervals
  explode to the fixed-width buckets they overlap (≤ ceil(width/bucket)
  + 1 rows), points land in exactly one bucket, and the join becomes an
  EQUI-join on (key, bucket) + residual range filter — shuffle-hash
  joinable, AQE-skew-splittable, linear in data size for bounded
  interval width.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tiebreak: str,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: each left row gains the right row with the
    greatest ``right_ts`` ≤ ``left_ts`` for the same key (NULLs when no
    prior right row exists — left-outer semantics).

    ``key_cols`` pairs (left_name, right_name); ``tiebreak`` is a
    unique right column — among right rows sharing the max timestamp
    the one with the greatest tiebreak wins, making results
    deterministic (hash-checkable) rather than "whichever the sort
    happened to leave last".

    Both timestamp columns must be mutually comparable (use the same
    epoch unit on both sides). Right values travel as ONE struct so the
    matched columns always come from the same physical row.
    """
    lkeys = [lk for lk, _ in key_cols]
    payload = F.struct(*[F.col(c) for c in right_cols])
    payload_type = right.select(payload.alias("r")).schema["r"].dataType
    tb_type = right.schema[tiebreak].dataType

    left_u = left.select(
        *[F.col(lk) for lk in lkeys],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(tb_type).alias("__tb"),
        F.lit(None).cast(payload_type).alias("__r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    right_u = right.select(
        *[F.col(rk).alias(lk) for lk, rk in key_cols],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.col(tiebreak).alias("__tb"),
        payload.alias("__r"),
        F.lit(None).cast(left.select(F.struct(*left.columns).alias("l")).schema["l"].dataType).alias("__l"),
    )

    # Right rows sort before left rows at equal timestamps (__is_left
    # 0 < 1) so the match is inclusive (right_ts == left_ts counts);
    # __tb orders equal-timestamp right rows so last() is the max
    # tiebreak. Left-row order within a tie is irrelevant: they all see
    # the same preceding right rows.
    w = (
        Window.partitionBy(*lkeys)
        .orderBy("__t", "__is_left", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        left_u.unionByName(right_u)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in right_cols]
    return matched.select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: Sequence[tuple[str, str]],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket: int,
) -> DataFrame:
    """Inner join of point rows to interval rows on matching key with
    ``start_ts <= point_ts < end_ts`` (half-open), via fixed-width time
    bucketing. ``point_ts``/``start_ts``/``end_ts`` are numeric (same
    epoch unit); ``bucket`` is the bucket width in that unit — pick it
    ≈ the typical interval width so intervals explode to ~2 rows.

    Output: all point columns + all interval columns (key pair kept
    once, under the point-side name). Non-key column names must be
    disjoint between the two sides (rename before calling — silently
    prefixing would surprise downstream selects).
    """
    pkeys = [pk for pk, _ in key_cols]
    ikeys = {ik for _, ik in key_cols}
    clash = (set(points.columns) - set(pkeys)) & (set(intervals.columns) - ikeys)
    if clash:
        raise ValueError(
            f"interval_join: column name collision between sides: {sorted(clash)}"
        )
    p = points.withColumn("__bucket", F.floor(F.col(point_ts) / bucket))
    i = intervals.select(
        *[F.col(ik).alias(pk) for pk, ik in key_cols],
        *[F.col(c) for c in intervals.columns if c not in ikeys],
        F.explode(
            F.sequence(
                F.floor(F.col(start_ts) / bucket),
                # end is exclusive: a zero-length interval still lands
                # in its start bucket; greatest() guards inverted input
                F.floor(F.greatest(F.col(end_ts) - 1, F.col(start_ts)) / bucket),
            )
        ).alias("__bucket"),
    )
    return (
        p.join(i, on=[*pkeys, "__bucket"])
        .filter((F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts)))
        .drop("__bucket")
    )


def gap_filled_rollup(
    df: DataFrame,
    ts_col: str,
    dim_cols: Sequence[str],
    unit: str,
    aggs: dict[str, Column],
    fills: dict[str, Column],
) -> DataFrame:
    """Hypertable-style continuous aggregate with gap filling: roll
    ``df`` up to ``unit`` (``minute``/``hour``/``day``) buckets per
    dimension combination, then left-join the aggregate onto a dense
    time spine so empty buckets appear with their ``fills`` values —
    the shape a monitoring/feature pipeline needs (a missing hour must
    read 0, not vanish).

    The spine is (distinct dims) x (bucket range) — tiny next to the
    fact table — so the plan is one fact-side hash agg plus a
    broadcast join of the spine bounds; the fact table is scanned
    once. At 100 TB the agg shuffle carries one row per (dims, bucket)
    per partition (map-side partials), never raw events.
    """
    bucket = F.date_trunc(unit, F.col(ts_col))
    agg = df.groupBy(*dim_cols, bucket.alias("bucket")).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    bounds = df.agg(
        F.date_trunc(unit, F.min(ts_col)).alias("lo"),
        F.date_trunc(unit, F.max(ts_col)).alias("hi"),
    )
    spine = (
        df.select(*dim_cols)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            *dim_cols,
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL 1 {unit}"))
            ).alias("bucket"),
        )
    )
    out = spine.join(agg, [*dim_cols, "bucket"], "left")
    return out.select(
        *dim_cols,
        F.col("bucket"),
        *[
            F.coalesce(F.col(name), fills[name]).alias(name)
            for name in aggs
        ],
    )


def locf_and_interpolate(
    filled: DataFrame,
    bucket_col: str,
    dim_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """TimescaleDB ``locf()``/``interpolate()`` over a gap-filled
    rollup: given a dense spine where gap buckets carry NULL in
    ``value_col``, append

    * ``<value>_locf`` — last observation carried forward, and
    * ``<value>_interp`` — linear interpolation between the
      neighboring observed buckets (leading edge backfills from the
      next observation; trailing edge carries forward) —

    the two standard continuous-aggregate fill modes. Two windows per
    dimension group (IGNORE NULLS last/first), no extra shuffle beyond
    the spine's own partitioning. The interpolation weight uses only
    epoch DIFFERENCES, so it is timezone-convention-independent and
    engine-portable; the blend is one multiply-add on already-rounded
    aggregates, rounded to 6 decimals.
    """
    v = F.col(value_col)
    wp = (
        Window.partitionBy(*dim_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy(*dim_cols)
        .orderBy(bucket_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    t = F.unix_timestamp(F.col(bucket_col))
    mt = F.when(v.isNotNull(), t)
    pv = F.last(v, ignorenulls=True).over(wp)
    pt = F.last(mt, ignorenulls=True).over(wp)
    nv = F.first(v, ignorenulls=True).over(wn)
    nt = F.first(mt, ignorenulls=True).over(wn)
    frac = (t - pt) * F.lit(1.0) / (nt - pt)
    interp = (
        F.when(v.isNotNull(), v.cast("double"))
        .when(pt.isNull(), nv.cast("double"))
        .when(nt.isNull(), pv.cast("double"))
        .otherwise(F.round(pv + (nv - pv) * frac, 6))
    )
    return filled.select(
        *filled.columns,
        pv.alias(f"{value_col}_locf"),
        interp.alias(f"{value_col}_interp"),
    )
