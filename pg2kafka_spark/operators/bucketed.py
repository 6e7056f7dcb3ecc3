"""Bucketed-table layout: storage-level hash partitioning so repeated
joins and aggregations on the bucket key need NO shuffle at read time.

The missing piece of the co-location toolkit (skew.py salts hot keys,
layout.py orders files for range pruning — this pre-shuffles storage):
``df.write.bucketBy(n, key)`` hashes every row into one of ``n``
buckets per write task, the table's scan then reports
``HashPartitioning(key, n)`` to the planner, and any join or groupBy
keyed on the bucket column consumes the scan IN PLACE — zero Exchange
in the plan, verified by tests/test_bucketed.py.

At 100 TB this is the difference between a consumer fleet re-shuffling
the fact table on EVERY query and shuffling it exactly once at ingest:
the reference's outbox is one Postgres table consumers re-scan per
query (eventqueue/event_queue.go:60-75, the ordered paginated scan);
the Spark-scale analog materializes the outbox/fact bucketed by its
join key (orderkey, custkey, fingerprint ...) so the nightly rebuild
pays the one shuffle and every downstream join is map-side.

Operational notes baked into the API:

* bucket count is a PUBLISHED CONTRACT — both sides of a co-located
  join must agree on (key, n_buckets); a mismatch silently degrades to
  a plain shuffled join (tests pin the degradation too, so the failure
  mode is a measured fact, not a surprise);
* ``sort_cols`` additionally orders rows inside each bucket file
  (one file per bucket per write task), which lets a sort-merge join
  skip its Sort when each bucket is a single file — Spark gates
  reading that sortedness behind
  ``spark.sql.legacy.bucketedTableScan.outputOrdering`` (trusting a
  MULTI-file bucket's order was a correctness bug, so the default is
  off; enable it only for single-file-per-bucket tables, as the test
  does scoped);
* writes go through ``saveAsTable`` because bucket metadata lives in
  the catalog, not in parquet footers — ``path`` keeps the bytes at an
  external location so the catalog entry is a pointer, droppable
  without deleting data (the 100 TB operational default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | tuple[str, ...],
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` hash-bucketed by ``key`` (one column or a
    tuple — composite join keys like (band, bkey) bucket on the
    combined hash) into ``n_buckets`` as catalog table ``table``
    (external at ``path`` if given).

    One shuffle-equivalent pass at write time buys every future
    key-joined read a shuffle-free plan. ``sort_cols`` orders within
    buckets (pass the key itself to enable sort-skipping merge
    joins)."""
    keys = (key,) if isinstance(key, str) else tuple(key)
    writer = df.write.mode(mode).format("parquet").bucketBy(
        int(n_buckets), keys[0], *keys[1:]
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def cocluster_join(
    spark: SparkSession, left: str, right: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two bucketed catalog tables on their shared bucket key.

    When both tables were written with the same (key, n_buckets)
    contract the physical plan contains NO Exchange: each task merges
    bucket i of the left with bucket i of the right straight off
    storage."""
    return spark.table(left).join(spark.table(right), key, how)
