"""Distributed model training as pure DataFrame algebra — no MLlib,
no driver-side math: the classifier the modern quality-filtering
pipelines actually use (a cheap supervised model over the text
features, cf. GPT-3/PaLM quality classifiers), trained with unrolled
gradient-descent iterations under the same engine-portability
discipline as the k-means trainer:

* every feature and every weight is rounded to 6 decimals, so
  cross-engine ulp noise in ``exp``/division cannot accumulate;
* every gradient component is summed in DECIMAL(27,15) — partial-sum
  order never changes the result (the salted-agg lesson);
* iteration count is fixed and small, so the oracle unrolls the
  training loop as SQL CTEs and the WEIGHTS themselves hash-match.

Scale shape per iteration: one map-only scoring pass against the
broadcast 1-row weight table + one global aggregate (map-side
partials). Nothing ever collects to the driver; the weights live in a
1-row DataFrame exactly like the centroid table.

No reference counterpart (pg2kafka relays rows; SURVEY.md §7 M5
north-star surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def sigmoid6(z: Column) -> Column:
    """σ(z) rounded to 6 decimals — the rounding is the portability
    contract (libm vs JVM ``exp`` can differ in the last ulp; 6-dp
    rounding absorbs it everywhere except a measure-zero boundary)."""
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


def logistic_train(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 2,
    lr: float = 4.0,
) -> DataFrame:
    """Batch gradient descent for logistic regression, weights as a
    1-row DataFrame (``w0`` = bias, ``w1..wk`` per feature). Feature
    values are assumed pre-rounded to 6 decimals by the caller."""
    spark = feats.sparkSession
    k = len(feature_cols)
    w = spark.range(1).select(
        *[F.lit(0.0).alias(f"w{j}") for j in range(k + 1)]
    )
    for _ in range(int(iters)):
        j = feats.crossJoin(F.broadcast(w))
        z: Column = F.col("w0")
        for i, c in enumerate(feature_cols):
            z = z + F.col(f"w{i + 1}") * F.col(c)
        r = sigmoid6(z) - F.col(label_col)
        aggs = [F.count(F.lit(1)).alias("__n"),
                F.sum(r.cast("decimal(27,15)")).alias("__g0")]
        for i, c in enumerate(feature_cols):
            aggs.append(
                F.sum((F.col(c) * r).cast("decimal(27,15)")).alias(f"__g{i + 1}")
            )
        sums = j.agg(*aggs)
        w = sums.crossJoin(F.broadcast(w)).select(
            *[
                F.round(
                    F.col(f"w{j_}")
                    - F.lit(float(lr))
                    * (F.col(f"__g{j_}").cast("double") / F.col("__n")),
                    6,
                ).alias(f"w{j_}")
                for j_ in range(k + 1)
            ]
        )
    return w


def logistic_score(
    feats: DataFrame, weights: DataFrame, feature_cols: list[str]
) -> DataFrame:
    """Score rows against the trained 1-row weight table (broadcast;
    map-only): appends ``p`` (6-dp σ) and ``pred`` (p ≥ 0.5)."""
    j = feats.crossJoin(F.broadcast(weights))
    z: Column = F.col("w0")
    for i, c in enumerate(feature_cols):
        z = z + F.col(f"w{i + 1}") * F.col(c)
    return j.select(
        *feats.columns,
        sigmoid6(z).alias("p"),
        (sigmoid6(z) >= F.lit(0.5)).alias("pred"),
    )
