"""Distributed connected components (duplicate-cluster resolution).

The training-data dedup endgame: near-dup PAIRS (from MinHash/LSH,
SimHash, or exact Jaccard — operators/dedup.py) must collapse into
CLUSTERS so exactly one canonical document per cluster survives. That is
connected components over the pair graph.

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round every node takes the min of its label and its
neighbors' labels; converged when no label changes. Rounds = graph
diameter, and near-dup clusters are dense and tiny (diameter ≤ ~3), so
this terminates in a handful of rounds even at corpus scale.

100 TB design:

* Each round is two shuffles (join on src, groupBy dst), both on node-id
  keys — no global structure, no driver-side graph.
* Labels persist per round and unpersist the round after; at very long
  lineages you'd localCheckpoint every ~10 rounds (not needed at
  diameter-3).
* Convergence is ONE driver-side count per round (an aggregate, not a
  collect of the labels).
* Giant components (boilerplate duplicated millions of times) skew the
  final cluster-size aggregation; AQE skew-join handles the label joins,
  and the canonical-pick is a groupBy min, which map-side combines.

Reference scope note: the reference repo (uwe-uffuchs/formula-1) has no
graph operators; this is part of the training-data-pipeline extension
surface (SURVEY.md §7.1(7)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "doc_id",
    src_col: str = "a",
    dst_col: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster_id) — cluster_id = min node id in the component.

    ``nodes`` must contain every node (isolated nodes become singleton
    clusters labeled by themselves); ``edges`` is an undirected pair list
    (each pair listed once in either orientation).
    """
    # persist: the edge list is re-joined every round — without the cache
    # an expensive upstream (e.g. the Jaccard pair pipeline) would re-run
    # per iteration.
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .persist()
    )

    # Only edge-incident nodes participate in propagation — isolated nodes
    # (the overwhelming majority of a deduped corpus) can never change
    # label and rejoin as singletons at the end. At 100 TB this keeps the
    # iteration working set at O(|edges|), not O(|corpus|).
    labels = sym.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).persist()

    # Convergence via the label SUM: labels only ever decrease, so the sum
    # strictly decreases until fixpoint — one cheap aggregate per round
    # instead of an old⋈new join. The upfront sum doubles as the cache
    # materialization of the initial labels, and lets a diameter-d graph
    # stop after exactly d+1 rounds (pair-clusters: 2).
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.src == labels.node)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.dst, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .persist()
        )
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    return (
        nodes.select(F.col(node_col).alias("node"))
        .join(labels, "node", "left")
        .select(
            "node", F.coalesce(F.col("label"), F.col("node")).alias("cluster_id")
        )
    )


PR_SCALE = 1_000_000_000_000  # pagerank mass grid (1e12): exact in bigint


def pagerank_quantized(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 8,
    damping_pct: int = 85,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "n",
) -> DataFrame:
    """Weighted PageRank with EXACT integer arithmetic — bit-identical in
    any engine and under any aggregation order.

    A float PageRank is accumulation-order-dependent (incoming
    contributions sum in nondeterministic order), so every quantity here
    is a scaled bigint on the ``PR_SCALE`` grid: mass starts at
    ``SCALE div N`` per node; the contribution along edge (u, v) is
    ``(pr_q(u) * w(u,v)) div out_w(u)`` (floor division — exact);
    incoming mass is an exact integer SUM; the update is
    ``tele_q + (damping_pct * in_sum) div 100`` with
    ``tele_q = ((100 - damping_pct) * (SCALE div N)) div 100``. Dangling
    mass (nodes without out-edges) is dropped, not redistributed — the
    standard simplification, identical in the oracle.

    Bounds: pr_q <= SCALE (1e12) and the edge product pr_q * w needs
    w < 9e6 to stay under 2^63 — holds far past this testdata; at larger
    weights pre-divide weights by their GCD or lift to decimal(38,0).

    Scale design: each iteration is one join of the rank relation with
    the (persisted) out-weighted edge list on the source key and one
    map-side-combined groupBy on the destination — the canonical
    distributed PageRank shape. Ranks persist per round; the driver sees
    no data, only the loop counter.
    """
    ew = edges.groupBy(src_col).agg(F.sum(weight_col).alias("ow")).join(
        edges, src_col
    ).persist()

    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank_quantized: empty node relation")
    # Enforce the documented bigint bound: pr_q (<= PR_SCALE) * w must
    # stay under 2^63, so w must stay under 2^63 / PR_SCALE. One scalar
    # travels to the driver; an oversized weight fails loudly here
    # instead of silently wrapping int64 mid-iteration.
    max_w = edges.agg(F.max(weight_col)).first()[0]
    w_bound = (2**63 - 1) // PR_SCALE
    if max_w is not None and max_w > w_bound:
        raise ValueError(
            f"pagerank_quantized: max edge weight {max_w} exceeds the "
            f"overflow-safe bound {w_bound} (pr_q * w must fit int64); "
            "pre-divide weights by their GCD or lift to decimal(38,0)"
        )
    tele_q = ((100 - damping_pct) * (PR_SCALE // n_nodes)) // 100
    base = nodes.select(F.col(node_col).alias("node")).persist()
    pr = base.withColumn("pr_q", F.lit(PR_SCALE // n_nodes)).persist()

    for _ in range(iters):
        contrib = ew.join(pr, ew[src_col] == pr.node).select(
            F.col(dst_col).alias("node"),
            F.expr(f"(pr_q * {weight_col}) div ow").alias("c"),
        )
        insum = contrib.groupBy("node").agg(F.sum("c").alias("m"))
        nxt = (
            base.join(insum, "node", "left")
            .select(
                "node",
                (
                    F.lit(tele_q)
                    + F.expr(f"({damping_pct} * coalesce(m, 0L)) div 100")
                ).alias("pr_q"),
            )
            .persist()
        )
        pr.unpersist()
        pr = nxt
    ew.unpersist()
    return pr


def dedup_cluster_assignment(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size, is_canonical) — full
    keep-one-per-cluster dedup decision over a near-dup pair list.
    Canonical = min doc_id of the cluster (the cluster label itself)."""
    cc = connected_components(docs.select(id_col), pairs, node_col=id_col)
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id")
    return cc.select(
        F.col("node").alias(id_col),
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.col("node") == F.col("cluster_id")).alias("is_canonical"),
    )


HITS_SCALE = 1_000_000_000  # hub/authority grid (1e9): headroom for w-sums


def hits_quantized(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 6,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "n",
) -> DataFrame:
    """Weighted HITS (Kleinberg hubs/authorities) with EXACT integer
    arithmetic — bit-identical in any engine and aggregation order.

    Per iteration: ``a_raw(v) = SUM_u w(u,v) * h_q(u)`` then
    ``h_raw(u) = SUM_v w(u,v) * a_q(v)``, each renormalized back onto the
    ``HITS_SCALE`` grid by FLOOR DIVISION with ``d = max(sum_raw div
    SCALE, 1)`` — a deterministic integer rescale (within 2x of the exact
    L1 normalization, which is irrelevant to the fixpoint direction and,
    being the same ops in both engines, bit-reproducible; a true
    ``(raw * SCALE) div sum`` would overflow int64 on the raw*SCALE
    product). Nodes without in-(out-)edges keep score 0 via left joins.

    The rescale runs as a GLOBAL WINDOW over the node-grain relation (a
    bounded aggregate: one row per node, tiny at any corpus scale) so
    every iteration's intermediate is referenced exactly ONCE by the
    next — a separate scalar-aggregate + join-back would reference each
    intermediate twice and double the logical plan per iteration
    (2^iters analysis blow-up, measured minutes at 6 iterations).

    Each half-iteration's score relation is EAGERLY localCheckpoint-ed
    (guide §5: cut lineage of reused tiny intermediates): the relation is
    one row per node, so the materialization is trivially small, and the
    final action then executes 2*iters shallow single-join plans instead
    of one 24-level nested DAG whose every level re-plans under AQE
    (measured 6.8 s -> 4.3 s warm / 14.0 -> ~10 s cold on the sf0.1
    nation-trade HITS query; values bit-identical — checkpointing is a
    materialization boundary, not a semantic change).

    Scale design: each half-iteration is one join of the score relation
    with the persisted edge list on its key + one map-side-combined
    groupBy on the other key — the same distributed shape as
    ``pagerank_quantized``. Scores persist per round; the driver sees
    only the loop counter.

    Overflow bound: ``h_q, a_q <= ~2 * HITS_SCALE`` after rescale, so
    ``SUM(w * q)`` needs ``total_w < 2^62 / HITS_SCALE`` — enforced
    loudly below (same contract as pagerank_quantized).
    """
    if iters < 1:
        raise ValueError(
            f"hits_quantized: iters must be >= 1 (got {iters}) — zero "
            "iterations would leave the authority relation undefined"
        )
    ew = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"),
        F.col(weight_col).alias("w"),
    ).persist()
    total_w = ew.agg(F.sum("w")).first()[0] or 0
    w_bound = (2**62 - 1) // HITS_SCALE
    if total_w > w_bound:
        raise ValueError(
            f"hits_quantized: total edge weight {total_w} exceeds the "
            f"overflow-safe bound {w_bound} (sum(w * q) must fit int64); "
            "pre-divide weights by their GCD or lift to decimal(38,0)"
        )
    base = nodes.select(F.col(node_col).alias("node")).persist()
    h0 = base.withColumn("h_q", F.lit(HITS_SCALE).cast("bigint")).persist()
    h, a = h0, None
    rescale = (
        "coalesce(r, 0L) div "
        f"greatest(sum(coalesce(r, 0L)) over () div {HITS_SCALE}, 1L)"
    )
    for _ in range(iters):
        araw = (
            ew.join(h, ew.src == h.node)
            .select("dst", F.expr("w * h_q").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("r"))
        )
        nxt_a = (
            base.join(araw, base.node == araw.dst, "left")
            .select("node", F.expr(rescale).alias("a_q"))
            .localCheckpoint(eager=True)
        )
        hraw = (
            ew.join(nxt_a, ew.dst == nxt_a.node)
            .select("src", F.expr("w * a_q").alias("c"))
            .groupBy("src")
            .agg(F.sum("c").alias("r"))
        )
        nxt_h = (
            base.join(hraw, base.node == hraw.src, "left")
            .select("node", F.expr(rescale).alias("h_q"))
            .localCheckpoint(eager=True)
        )
        h, a = nxt_h, nxt_a
    # ew stays persisted for the caller's action: it is referenced by all
    # 2*iters half-steps and recomputing the upstream edge aggregation per
    # reference would repeat the expensive fact join. Node-pair grain, so
    # the pinned footprint is <= |nodes|^2 rows at any corpus size.
    # h0 and base, by contrast, are cheap projections each referenced a
    # bounded number of times — drop their cache pins so they never hold
    # executor storage past this builder (they recompute trivially if the
    # lazy plan touches them at action time).
    h0.unpersist()
    base.unpersist()
    return h.join(a, "node")


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """Synchronous weighted label propagation (Raghavan et al. 2007) —
    community detection over an undirected weighted graph, fully
    deterministic so any engine replays it bit-for-bit.

    Every node starts labeled with its own id. Each round, node v adopts
    the label maximizing ``sum(w(v, u))`` over neighbors u currently
    holding that label; ties break to the SMALLEST label (argmax via
    ``row_number() OVER (PARTITION BY node ORDER BY s DESC, lbl ASC)``).
    Weights are exact integers, so scores never float-drift.

    Callers pass ``edges`` already expanded to BOTH directions of each
    undirected edge. A zero-weight self-loop is unioned in for every
    node, which keeps isolated nodes present in the per-round argmax
    (their own label wins at s = 0) WITHOUT a second reference to the
    label relation — each round's plan references its predecessor exactly
    once, so the logical plan grows linearly in ``iters`` (the 2^iters
    double-reference blow-up measured on hits_quantized cannot occur).

    100 TB design: per round one src-keyed join of the node-grain label
    relation with the persisted edge list, one map-side-combined groupBy
    on (dst, label), and one node-partitioned window at (node, label)
    grain — all key-partitioned shuffles, no driver-side graph state.
    """
    from pyspark.sql import Window

    if iters < 1:
        raise ValueError(
            f"label_propagation: iters must be >= 1 (got {iters})"
        )
    base = nodes.select(F.col(node_col).alias("node"))
    ew = (
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.col(weight_col).cast("bigint").alias("w"),
        )
        .unionByName(
            base.select(
                F.col("node").alias("src"),
                F.col("node").alias("dst"),
                F.lit(0).cast("bigint").alias("w"),
            )
        )
        .persist()
    )
    lbl = base.withColumn("lbl", F.col("node"))
    arg = Window.partitionBy("node").orderBy(F.desc("s"), F.asc("lbl"))
    for _ in range(iters):
        scores = (
            ew.join(lbl, ew.src == lbl.node)
            .select(F.col("dst").alias("node"), "lbl", "w")
            .groupBy("node", "lbl")
            .agg(F.sum("w").alias("s"))
        )
        lbl = (
            scores.withColumn("r", F.row_number().over(arg))
            .filter(F.col("r") == 1)
            .select("node", "lbl")
        )
    # ew stays pinned for the caller's action (referenced by every round).
    return lbl
