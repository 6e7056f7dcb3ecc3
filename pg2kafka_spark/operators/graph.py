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

import threading

from pyspark.sql import Column, DataFrame, Window, functions as F

#: Checkpoint RDD ids still holding executor storage, as (SparkContext,
#: rdd id) pairs — see ``release_graph_state``.
_TRACKED: list[tuple[object, int]] = []

#: Serializes the before/checkpoint/after id-diff in ``_checkpoint``:
#: two THREADS checkpointing concurrently (e.g. bench warmup running
#: queries in a pool) would otherwise each see the other's fresh RDD
#: ids in their diff and later unpersist them — observed as
#: CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND mid-query.
_CKPT_LOCK = threading.Lock()


def _persistent_ids(sc) -> set[int]:
    return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}


def _unpersist_ids(sc, ids) -> None:
    jmap = sc._jsc.getPersistentRDDs()
    for rid in ids:
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)


def _checkpoint(df: DataFrame) -> tuple[DataFrame, set[int]]:
    """``localCheckpoint`` the frame (eager — materializes now, truncates
    lineage so iterative plans stay O(1) deep) and report which storage
    RDD ids it created, so superseded rounds can be dropped eagerly and
    suite runners can release the final state between queries."""
    sc = df.sparkSession.sparkContext
    with _CKPT_LOCK:
        before = _persistent_ids(sc)
        out = df.localCheckpoint()
        new = _persistent_ids(sc) - before
        _TRACKED.extend((sc, rid) for rid in new)
    return out, new


def _release(sc, ids: set[int]) -> None:
    _unpersist_ids(sc, ids)
    # Rebuild under the checkpoint lock: a concurrent _checkpoint (the
    # bench suite warms queries from multiple threads) can extend
    # _TRACKED between the comprehension and the slice assignment,
    # silently dropping its entries from tracking — an executor-storage
    # leak until session end (r7 ADVICE).
    with _CKPT_LOCK:
        _TRACKED[:] = [
            (c, rid) for (c, rid) in _TRACKED if rid not in ids
        ]


def release_graph_state() -> None:
    """Unpersist every tracked checkpoint (idempotent). Unlike the
    sketch caches (which lazily recompute if consumed after release),
    a localCheckpoint IS the data — a ``connected_components`` result
    consumed after this call fails rather than recomputing, so
    materialize results before releasing. Suite runners (bench.py,
    check_parity) call this between queries via
    ``release_sketch_caches``."""
    while True:
        with _CKPT_LOCK:
            if not _TRACKED:
                return
            sc, rid = _TRACKED.pop()
        _unpersist_ids(sc, {rid})


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
    sc = edges.sparkSession.sparkContext
    # materialize the caller's pair lineage ONCE before the
    # undirected union consumes it twice (r19): edge lists arriving
    # here are jaccard/LSH pair builds — a shingle self-join — and
    # the two union branches re-ran that build back to back
    ed, ed_ids = _checkpoint(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    )
    und, und_ids = _checkpoint(
        ed.union(ed.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
    )
    _release(sc, ed_ids)
    labels, lbl_ids = _checkpoint(
        und.select(F.col("s").alias(node_col)).distinct().withColumn(
            "__lbl", F.col(node_col)
        )
    )
    prev_sum = labels.agg(F.sum("__lbl")).first()[0]
    if prev_sum is None:  # no edges at all
        _release(sc, und_ids)
        return labels.select(
            F.col(node_col), F.col("__lbl").alias(label_col)
        )
    for _ in range(max_iter):
        msgs = und.join(
            labels.withColumnRenamed(node_col, "s"), "s"
        ).select(F.col("d").alias(node_col), "__lbl")
        labels, new_ids = _checkpoint(
            labels.union(msgs)
            .groupBy(node_col)
            .agg(F.min("__lbl").alias("__lbl"))
        )
        # the new round is materialized — the superseded label state is
        # dead weight; drop it NOW so executor storage holds exactly one
        # label table regardless of round count (at 100 TB the pair
        # graph's label table is the big state here)
        _release(sc, lbl_ids)
        lbl_ids = new_ids
        new_sum = labels.agg(F.sum("__lbl")).first()[0]
        if new_sum == prev_sum:
            _release(sc, und_ids)
            return labels.select(F.col(node_col), F.col("__lbl").alias(label_col))
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "the duplicate graph has a longer chain than expected — raise "
        "max_iter or switch to the large-star/small-star formulation"
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    node_col: str = "node",
    label_col: str = "component_id",
    max_iter: int = 50,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    diameter-robust alternative to :func:`connected_components`:
    min-label propagation needs O(diameter) rounds (a 10⁶-node chain
    would need 10⁶ joins), this converges in O(log² n) rounds on ANY
    graph shape. Same per-round plan shape — one groupBy-min over the
    adjacency plus one join — so it scales wherever the propagation
    loop does, minus the pathological-chain failure mode.

    * large-star: every node u connects its LARGER neighbours to
      ``m = min(Γ(u) ∪ u)`` — kills long chains by halving them;
    * small-star: every node u connects its smaller-or-equal
      neighbours (and itself) to m — flattens local trees into stars.

    The fixed point is a forest of stars rooted at each component's
    minimum id, so the output contract matches
    :func:`connected_components` exactly: ``(node, component_id)``
    with ``component_id`` = min reachable node id — the same oracle
    (recursive-CTE transitive closure) checks both.

    Convergence is detected on an EXACT edge-set signature
    (count + sum of per-edge xxhash64): star steps are monotone
    (neither count nor the canonical edge set oscillates at the fixed
    point), and two consecutive identical signatures at 2⁻⁶⁴
    per-round collision odds is not a practical correctness risk.
    Per-round state is localCheckpoint-ed and the superseded round
    released, like the propagation loop."""
    sc = edges.sparkSession.sparkContext
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # checkpoint the canonical edge set FIRST and derive the node set
    # from the materialized table (r19): canon is the caller's pair
    # build — previously it ran three times (the e checkpoint plus
    # both all_nodes union branches)
    e, e_ids = _checkpoint(canon)
    all_nodes = (
        e.select(F.col("a").alias(node_col))
        .union(e.select(F.col("b").alias(node_col)))
        .distinct()
    )
    all_nodes, nodes_ids = _checkpoint(all_nodes)

    def _sig(cur: DataFrame) -> tuple[int, int]:
        # DECIMAL(38) sum: xxhash64 values span the full int64 range,
        # so a LONG sum throws ANSI overflow after a handful of edges
        row = cur.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    def _large_star(cur: DataFrame) -> DataFrame:
        adj = cur.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            cur.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        mins = adj.groupBy("u").agg(F.min("v").alias("__mn"))
        return (
            adj.join(mins, "u")
            .select(
                "u", "v", F.least(F.col("__mn"), F.col("u")).alias("__m")
            )
            .filter(F.col("v") > F.col("u"))
            .select(
                F.least(F.col("v"), F.col("__m")).alias("a"),
                F.greatest(F.col("v"), F.col("__m")).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def _small_star(cur: DataFrame) -> DataFrame:
        # edges directed larger→smaller: u > v, so m = min(Γ≤(u))
        d = cur.select(F.col("b").alias("u"), F.col("a").alias("v"))
        mins = d.groupBy("u").agg(F.min("v").alias("__m"))
        nbrs = (
            d.join(mins, "u")
            .filter(F.col("v") != F.col("__m"))
            .select(F.col("__m").alias("a"), F.col("v").alias("b"))
        )
        selfe = mins.select(F.col("__m").alias("a"), F.col("u").alias("b"))
        return (
            nbrs.union(selfe)
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    prev_sig = _sig(e)
    for _ in range(max_iter):
        e2, e2_ids = _checkpoint(_small_star(_large_star(e)))
        _release(sc, e_ids)
        e, e_ids = e2, e2_ids
        new_sig = _sig(e)
        if new_sig == prev_sig:
            # fixed point: stars rooted at component minima — label
            # every b with its root a, roots label themselves, and
            # nodes that lost all edges along the way (they were
            # folded into a star early) still appear in `e` as leaves
            labels = e.select(
                F.col("b").alias(node_col), F.col("a").alias("__lbl")
            ).union(
                e.select(F.col("a").alias(node_col), F.col("a").alias("__lbl"))
            )
            out = (
                all_nodes.join(labels, node_col, "left")
                .groupBy(node_col)
                .agg(
                    F.coalesce(F.min("__lbl"), F.min(node_col)).alias(
                        label_col
                    )
                )
            )
            out, out_ids = _checkpoint(out)
            _release(sc, e_ids)
            _release(sc, nodes_ids)
            return out
        prev_sig = new_sig
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} rounds "
        "— not expected for ANY graph at this bound (O(log² n))"
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


def incremental_components(
    labels: DataFrame,
    new_edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    node_col: str = "node",
    label_col: str = "component_id",
    max_iter: int = 25,
) -> DataFrame:
    """MAINTAINED component labels (r16): fold a new batch of
    candidate pairs into yesterday's fixpoint WITHOUT re-running
    components over the historical pair graph — the daily-ingest
    spelling of ``connected_components``, the same incremental
    contract as the dedup fingerprint store and the retention
    partials.

    The old label table is itself a connectivity-exact compression of
    the old graph: the star edges ``(node → component_id)`` connect
    exactly what the old edges connected (component_id is the min
    NODE id of the component — our CC convention — so it is a node of
    the component, and min labels are preserved). Running the same
    min-label propagation over ``stars ∪ new_edges`` therefore equals
    the cold rebuild over ``old_edges ∪ new_edges`` — pinned by the
    registered query's oracle (the FULL-graph recursive closure) and
    an equality test.

    Scale shape: the folded edge list is |V_old| star edges (diameter
    ≤ 2 after one round) + |batch| new pairs — independent of how
    many historical PAIRS ever existed; rounds track how many old
    components the new batch chains together, not old cluster
    diameters. Labels must be node-id-valued (any CC output here
    qualifies)."""
    stars = labels.select(
        F.col(node_col).alias(src), F.col(label_col).alias(dst)
    )
    # keep self-stars (roots label themselves): they carry edge-less
    # old nodes through CC so the output still covers every labeled
    # node; a self-edge is a no-op message in the propagation.
    merged = stars.unionByName(
        new_edges.select(F.col(src), F.col(dst))
    )
    return connected_components(
        merged, src, dst, node_col, label_col, max_iter
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


def guarded_local_checkpoint(df: DataFrame) -> DataFrame:
    """``localCheckpoint`` under the SAME lock as :func:`_checkpoint`,
    WITHOUT tracking — for operator-internal materializations (the
    dedup LSH candidate list) whose lifetime is the returned plan,
    not graph round state. The lock keeps the new RDD ids out of a
    concurrent ``_checkpoint``'s before/after id-diff: without it, a
    graph query in another thread (bench warms queries from a pool)
    adopts the ids into ``_TRACKED`` and a later release unpersists
    them mid-query — observed as CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND in
    the r13 bench warmup."""
    with _CKPT_LOCK:
        return df.localCheckpoint()


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000_000,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    conserve_dangling: bool = False,
) -> DataFrame:
    """Weighted PageRank in FIXED-POINT integer arithmetic — the same
    engine-portability discipline as the portable k-means: every
    rank is a bigint in units of 1/``scale``, every per-edge
    contribution is a truncating integer division, so the per-node
    sums are order-independent and DuckDB reproduces the iteration
    bit-for-bit (the floating-point formulation would drift in the
    last ulp with summation order). Returns ``(node, rank_fp)`` after
    ``iters`` power iterations from the uniform start.

    Semantics notes, shared verbatim with the oracle: damping is the
    integer percentage ``damping_pct``; contributions split an
    out-node's damped rank proportionally to edge weight
    (``weight_col``, default 1); dangling mass (nodes without
    out-edges) is DROPPED by default, the common large-graph
    simplification — ranks are comparable, not a strict probability
    distribution. ``conserve_dangling=True`` (r16) instead
    redistributes each iteration's dangling mass uniformly — the
    textbook formulation a ranking consumer usually wants: total mass
    stays ``scale`` up to per-division truncation, so ranks read as a
    distribution. Costs one tiny extra aggregate per iteration (the
    dangling node SET is fixed — computed once — only its current
    mass is re-summed, a 1-row scalar broadcast into the update).

    Scale shape: the node and out-weight tables are one aggregation
    each; every iteration is one src-keyed join of the edge list
    against the current ranks plus one dst-keyed partial-aggregated
    sum — the standard edge-partitioned power iteration, O(|E|) per
    round, no global state beyond the rank table. Overflow bound:
    ``rank ≤ scale`` (mass never grows), so the per-edge product is
    ≤ scale·damping_pct·weight — keep ``scale·weight`` under ~1e14.
    """
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col
        else F.lit(1).cast("bigint")
    )
    # persist the edge table: it is consumed by the node set, the
    # out-weight aggregate, AND every power iteration's join — the
    # callers' edge builds are star joins over the fact table, and
    # uncached each consumer re-ran that build (r19 event-log
    # attribution: 60+ jobs per pagerank rep, most of them repeated
    # edge-build stages). Tracked in the shared sketch-cache registry
    # so suite runners release it between queries like any
    # intermediate; iterative-graph standard practice at any scale.
    from pg2kafka_spark.operators.dedup import _persist

    e = _persist(
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            w.alias("w"),
        )
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # one scalar: sizes the uniform start
    outw = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    base_fp = ((100 - damping_pct) * scale) // (100 * n_nodes)
    pr = nodes.select(
        "node", F.lit(scale // n_nodes).cast("bigint").alias("rank_fp")
    )
    dangling = (
        nodes.join(outw, nodes.node == outw.src, "left_anti")
        if conserve_dangling
        else None
    )
    for _ in range(iters):
        contrib = (
            e.join(pr, e.src == pr.node)
            .join(outw, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"rank_fp * {damping_pct} * w div (100 * out_w)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_c"))
        )
        if conserve_dangling:
            # the dangling nodes' damped mass from the PREVIOUS
            # ranks, split uniformly: one 1-row aggregate
            # (overflow-safe: dm ≤ scale, ×damping ≤ ~1e11)
            # broadcast-crossed into the update
            dm = pr.join(dangling, "node").agg(
                F.coalesce(F.sum("rank_fp"), F.lit(0))
                .cast("bigint")
                .alias("dm")
            )
            pr = (
                nodes.join(contrib, "node", "left")
                .crossJoin(F.broadcast(dm))
                .select(
                    "node",
                    (
                        F.lit(base_fp).cast("bigint")
                        + F.expr(
                            f"(dm * {damping_pct}) div {100 * n_nodes}"
                        )
                        + F.coalesce(F.col("in_c"), F.lit(0))
                    )
                    .cast("bigint")
                    .alias("rank_fp"),
                )
            )
        else:
            pr = nodes.join(contrib, "node", "left").select(
                "node",
                (
                    F.lit(base_fp).cast("bigint")
                    + F.coalesce(F.col("in_c"), F.lit(0))
                )
                .cast("bigint")
                .alias("rank_fp"),
            )
        pr = guarded_local_checkpoint(pr)
    return pr
