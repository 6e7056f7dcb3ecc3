"""Connected components over a near-duplicate pair graph.

The reference pipeline stops at pair discovery (MinHash/SimHash/
embedding LSH emit candidate pairs); a training-data pipeline needs
one more step before it can drop documents: group the pairs into
duplicate CLUSTERS and keep one canonical document per cluster.
Pair-wise keep-lists (drop the larger id of every pair) over-delete
on transitive chains — if A~B and B~C but A!~C, dropping the larger
id of each pair can delete both B and C when only one of them
duplicates A. Component-wise canonical selection is the standard fix
(e.g. the dedup stage of public C4/Gopher/RefinedWeb-style pipelines).

Algorithm: iterative min-label propagation to a fixpoint. Every node
starts labelled with its own id; each round every node takes the min
label among itself and its neighbours; at convergence every node
carries the min node id reachable from it — a canonical, engine-
portable component id (DuckDB reproduces it with a recursive-CTE
transitive closure, so the operator is oracle-checkable).

Scale shape (100 TB): the input is the POST-DISCOVERY pair list —
orders of magnitude smaller than the corpus (LSH already pruned
non-candidates, hot buckets are capped upstream). Each round is one
shuffle join of the edge list against the current labels on uniform
id keys plus one min-aggregate; rounds needed = the diameter of the
largest duplicate cluster, which for near-dup graphs is small (a
boilerplate cluster of B copies is a clique: diameter 1). Label
state is localCheckpoint-ed per round so the plan and lineage stay
O(1) per iteration instead of nesting, and convergence is detected
by the (strictly decreasing) sum of labels going flat — one tiny
aggregate action per round. For graphs with adversarially long
chains, swap the propagation step for large-star/small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) — same join-per-round shape, O(log²) rounds; not needed
for duplicate clusters.

Design-note refs: the reference has no graph stage (blendle/pg2kafka
relays rows, main.go:68-120); this module exists for the M5 pipeline
surface (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    node_col: str = "node",
    label_col: str = "component_id",
    max_iter: int = 25,
) -> DataFrame:
    """``(node, component_id)`` for every node appearing in ``edges``,
    where ``component_id`` is the minimum node id in the node's
    connected component (undirected). Runs min-label propagation to
    the fixpoint (bounded by ``max_iter``; raises if the bound is hit
    before convergence rather than returning silently-partial
    components).

    Materializes per round (localCheckpoint) — callers get back a
    small, fully-resolved label table, not a lazily nested plan.
    """
    und = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .localCheckpoint()
    )
    labels = und.select(F.col("s").alias(node_col)).distinct().withColumn(
        "__lbl", F.col(node_col)
    ).localCheckpoint()
    prev_sum = labels.agg(F.sum("__lbl")).first()[0]
    if prev_sum is None:  # no edges at all
        return labels.select(
            F.col(node_col), F.col("__lbl").alias(label_col)
        )
    for _ in range(max_iter):
        msgs = und.join(
            labels.withColumnRenamed(node_col, "s"), "s"
        ).select(F.col("d").alias(node_col), "__lbl")
        labels = (
            labels.union(msgs)
            .groupBy(node_col)
            .agg(F.min("__lbl").alias("__lbl"))
            .localCheckpoint()
        )
        new_sum = labels.agg(F.sum("__lbl")).first()[0]
        if new_sum == prev_sum:
            return labels.select(F.col(node_col), F.col("__lbl").alias(label_col))
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "the duplicate graph has a longer chain than expected — raise "
        "max_iter or switch to the large-star/small-star formulation"
    )


def components_with_isolates(
    components: DataFrame,
    nodes: DataFrame,
    node_col: str = "node",
    label_col: str = "component_id",
) -> DataFrame:
    """Extend a ``connected_components`` result to the full node set:
    nodes with no edges become their own singleton component. Keeps
    every column of ``nodes``. One shuffle join on uniform id keys
    (or broadcast when the component table is small, which
    Catalyst/AQE picks by stats)."""
    return nodes.join(components, node_col, "left").withColumn(
        label_col, F.coalesce(F.col(label_col), F.col(node_col))
    )


def canonical_per_component(
    labeled: DataFrame,
    order_cols: list[Column],
    label_col: str = "component_id",
) -> DataFrame:
    """Flag one canonical row per component: rank by ``order_cols``
    within each component and keep rank 1, plus the component size.
    Both run in ONE window pass over the component key — a single
    shuffle on component_id (uniform: min doc ids), no second
    aggregate-and-join round trip."""
    w = Window.partitionBy(label_col)
    ranked = labeled.withColumn(
        "__rk", F.row_number().over(w.orderBy(*order_cols))
    ).withColumn("comp_size", F.count(F.lit(1)).over(w))
    return ranked.withColumn("is_canonical", F.col("__rk") == 1).drop("__rk")
