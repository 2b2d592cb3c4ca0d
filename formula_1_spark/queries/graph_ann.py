"""Graph-based ANN: NN-descent k-NN graph construction + recall audit.

The third major ANN index family (after the bucketed LSH/IVF/PQ paths in
:mod:`formula_1_spark.queries.similarity`): real vector stores build a
neighbor GRAPH (HNSW/NSG descend from NN-descent) because graph search
beats bucket probing at high recall. The construction here is the
distributed NN-descent round: candidates = current ∪ reversed ∪
through-one-hop edges, exact-cosine top-k per node, repeat. Everything
is deterministic (arithmetic init, left-fold double cosine, id
tiebreaks) so DuckDB replays the build bit-for-bit.

No reference counterpart (extension surface; the reference is an F1
notebook pipeline — see SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from formula_1_spark.operators.similarity import nndescent_graph
from formula_1_spark.queries.registry import register
from formula_1_spark.queries.similarity import _COS
from formula_1_spark.sources.tables import load_table

_K = 8
_ITERS = 2
_PANEL = 20
_A = 2654435761
_B = 40503


def _nndescent_ctes() -> str:
    """The shared CTE chain: arithmetic init g0, then per round t the
    candidate union, exact cosine scoring, and windowed top-k — the SQL
    twin of :func:`nndescent_graph` (same constants, same tiebreaks)."""
    cos = _COS.format(a="q.embedding", b="x.embedding")
    parts = [
        "nn AS (SELECT COUNT(*) AS n FROM embeddings)",
        f"""g0 AS (
  SELECT DISTINCT e.vec_id AS v,
         (e.vec_id + 1 + ((e.vec_id * {_A} + j.j * {_B}) % (n.n - 1))) % n.n AS nb
  FROM embeddings e, (SELECT unnest(range(1, {_K + 1})) AS j) j, nn n
)""",
    ]
    for t in range(1, _ITERS + 1):
        p = t - 1
        parts.append(f"""cand{t} AS (
  SELECT v, nb FROM g{p}
  UNION
  SELECT nb AS v, v AS nb FROM g{p}
  UNION
  SELECT a.v, b.nb FROM g{p} a JOIN g{p} b ON a.nb = b.v AND b.nb <> a.v
)""")
        parts.append(f"""sc{t} AS (
  SELECT c.v, c.nb, {cos} AS cos
  FROM cand{t} c
  JOIN embeddings q ON q.vec_id = c.v
  JOIN embeddings x ON x.vec_id = c.nb
)""")
        parts.append(f"""g{t}r AS (
  SELECT v, nb, cos, ROW_NUMBER() OVER (
    PARTITION BY v ORDER BY cos DESC, nb ASC) AS r
  FROM sc{t}
)""")
        parts.append(
            f"g{t} AS (SELECT v, nb FROM g{t}r WHERE r <= {_K})"
        )
    return ",\n".join(parts)


@register(
    "ann_nndescent_graph",
    ops="EXT-sim-graphann,J1,A1,W1 (NN-descent k-NN graph build)",
    doc=f"NN-descent k-NN graph construction (Dong et al., WWW'11 — the "
    f"graph-ANN family HNSW/NSG descend from): every corpus vector "
    f"holds a best-{_K} neighbor list seeded by deterministic "
    f"arithmetic, refined for {_ITERS} rounds by scoring only "
    f"current/reversed/through-one-hop candidate edges (≤ N·(2k+k²) "
    f"pairs per round, every join keyed by vector id — never "
    f"all-pairs). Output: the final graph rows for the vec_id<{_PANEL} "
    f"panel. The oracle replays init, candidate unions, cosine "
    f"scoring, and tie-broken top-k bit-for-bit.",
    oracle=f"""
WITH {_nndescent_ctes()}
SELECT v AS vec_id, nb AS neighbor_id, cos, CAST(r AS INT) AS rank
FROM g{_ITERS}r WHERE r <= {_K} AND v < {_PANEL}
ORDER BY vec_id, rank
""",
)
def ann_nndescent_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        shared_nndescent_graph(spark, sf_dir)
        .filter(F.col("vec_id") < _PANEL)
        .orderBy("vec_id", "rank")
    )


@register(
    "nndescent_recall_audit",
    ops="EXT-sim-graphann-audit,A3,J-semi (graph recall@k vs exact)",
    doc=f"Recall@{_K} audit of the NN-descent graph against exact "
    f"brute-force top-{_K} for the vec_id<{_PANEL} panel — the "
    f"graph-family twin of ann_recall_audit: how much of the true "
    f"neighborhood did {_ITERS} refinement rounds recover from an "
    f"arithmetic (content-blind) init? Per panel vector: hit count and "
    f"floor-ppm recall.",
    oracle=f"""
WITH {_nndescent_ctes()},
gt AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY {_COS.format(a="q.embedding", b="x.embedding")} DESC,
                      x.vec_id ASC) AS r
    FROM embeddings q JOIN embeddings x ON x.vec_id <> q.vec_id
    WHERE q.vec_id < {_PANEL}) gr WHERE r <= {_K}
),
hits AS (
  SELECT query_id, COUNT(1) AS hits FROM (
    SELECT v AS query_id, nb AS neighbor_id FROM g{_ITERS} WHERE v < {_PANEL}
    INTERSECT
    SELECT query_id, neighbor_id FROM gt) h
  GROUP BY query_id
),
qids AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < {_PANEL})
SELECT qi.query_id,
       CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits_topk,
       CAST(COALESCE(h.hits, 0) * 1000000 // {_K} AS BIGINT) AS recall_ppm
FROM qids qi LEFT JOIN hits h USING (query_id)
ORDER BY query_id
""",
)
def nndescent_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    panel = emb.filter(F.col("vec_id") < _PANEL)
    gt = brute_force_topk(emb, panel, k=_K).select("query_id", "neighbor_id")
    graph = (
        shared_nndescent_graph(spark, sf_dir)
        .filter(F.col("vec_id") < _PANEL)
        .select(F.col("vec_id").alias("query_id"), F.col("neighbor_id"))
    )
    hits = (
        graph.join(gt, ["query_id", "neighbor_id"], "leftsemi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    qids = panel.select(F.col("vec_id").alias("query_id"))
    return (
        qids.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("hits", F.lit(0)).cast("bigint").alias("hits_topk"),
            F.expr(
                f"cast((coalesce(hits, 0) * 1000000) div {_K} as bigint)"
            ).alias("recall_ppm"),
        )
        .orderBy("query_id")
    )


# The three graph-family queries (build, recall audit, beam search) all
# need the IDENTICAL 2-round NN-descent graph. The build is cheap to
# EXECUTE but its unrolled candidate-union plan costs seconds to analyze
# per occurrence — so the ranked graph relation (N·k rows) is memoized
# per (session, embeddings identity) as an eager localCheckpoint, the
# same amortization shared_centroids gives the IVF family. Values are
# unaffected (the build is bit-deterministic; oracles rebuild from
# scratch).
_GRAPH_MEMO: dict[tuple, DataFrame] = {}


def shared_nndescent_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, neighbor_id, cos, rank) for the full corpus at the
    default knobs (k=8, 2 rounds)."""
    from formula_1_spark.queries import memo

    key = memo.file_key(spark, sf_dir, "embeddings")
    df = memo.get(_GRAPH_MEMO, key)
    if df is None:
        emb = load_table(spark, sf_dir, "embeddings")
        df = nndescent_graph(emb, k=_K, iters=_ITERS).localCheckpoint(
            eager=True
        )
        memo.install(_GRAPH_MEMO, key, df)
    return df


_BEAM = 8
_HOPS = 3
_SEARCH_K = 10
_ENTRY = 0  # fixed entry node (single-layer greedy search; documented)


def _beam_ctes() -> str:
    """Beam-search CTE chain over the built graph: frontier_0 = {entry};
    each hop scores frontier ∪ out-neighbors against the query and keeps
    the beam; the final top-k ranks every node VISITED across hops."""
    cos = _COS.format(a="q.embedding", b="x.embedding")
    parts = [
        f"""qrys AS (
  SELECT vec_id AS query_id FROM embeddings WHERE vec_id < {_SEARCH_K}
)""",
        f"f0 AS (SELECT query_id, CAST({_ENTRY} AS BIGINT) AS node FROM qrys)",
        "seen0 AS (SELECT query_id, node FROM f0)",
    ]
    for t in range(1, _HOPS + 1):
        p = t - 1
        parts.append(f"""e{t} AS (
  SELECT f.query_id, g.nb AS node FROM f{p} f JOIN g{_ITERS} g ON g.v = f.node
  UNION
  SELECT query_id, node FROM f{p}
)""")
        parts.append(f"""s{t} AS (
  SELECT e.query_id, e.node, {cos} AS cos
  FROM e{t} e
  JOIN embeddings q ON q.vec_id = e.query_id
  JOIN embeddings x ON x.vec_id = e.node
)""")
        parts.append(f"""f{t} AS (
  SELECT query_id, node FROM (
    SELECT query_id, node, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cos DESC, node ASC) AS r
    FROM s{t}) WHERE r <= {_BEAM}
)""")
        parts.append(f"""seen{t} AS (
  SELECT query_id, node FROM seen{p}
  UNION
  SELECT query_id, node FROM e{t}
)""")
    return ",\n".join(parts)


@register(
    "ann_graph_beam_search",
    ops="EXT-sim-graphann-search,J1,W1 (HNSW-style greedy graph search)",
    doc=f"Graph-ANN SEARCH over the built NN-descent graph (the query "
    f"half of ann_nndescent_graph — HNSW-style single-layer greedy beam "
    f"search): from a fixed entry node, {_HOPS} hops each expand the "
    f"beam's out-neighbors, score against the query, and keep the "
    f"best-{_BEAM}; the answer is the exact top-{_SEARCH_K} among ALL "
    f"visited nodes. Per query the frontier is ≤ beam·(k+1) nodes per "
    f"hop — search cost is O(hops·beam·k) regardless of corpus size, "
    f"the property graph indexes exist for. Oracle replays graph build, "
    f"hops, and tie-broken beams bit-for-bit.",
    oracle=f"""
WITH {_nndescent_ctes()},
{_beam_ctes()},
final AS (
  SELECT e.query_id, e.node,
         {_COS.format(a="q.embedding", b="x.embedding")} AS cos
  FROM seen{_HOPS} e
  JOIN embeddings q ON q.vec_id = e.query_id
  JOIN embeddings x ON x.vec_id = e.node
  WHERE e.node <> e.query_id
)
SELECT query_id, node AS neighbor_id, cos, CAST(r AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos DESC, node ASC) AS r
  FROM final) fr
WHERE r <= {_SEARCH_K}
ORDER BY query_id, rank
""",
)
def ann_graph_beam_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.functions.vectors import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    graph = shared_nndescent_graph(spark, sf_dir).select(
        F.col("vec_id").alias("v"), F.col("neighbor_id").alias("nb")
    )
    qv = emb.filter(F.col("vec_id") < _SEARCH_K).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    xv = emb.select(
        F.col("vec_id").alias("node"), F.col("embedding").alias("x_vec")
    )
    frontier = qv.select(
        "query_id", F.lit(_ENTRY).cast("bigint").alias("node")
    )
    seen = frontier
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("node"))
    for _ in range(_HOPS):
        # Eager per-hop checkpoints (the trade_hits iterative-lineage
        # pattern, guide §5/§7.3): `expanded` is consumed TWICE per hop
        # (scoring chain + seen union) and `seen` feeds both the next hop
        # and the final rank, so without a barrier the plan doubles per
        # hop (~2^hops analysis). Both relations are search-state-bounded
        # — ≤ |queries|·beam·(k+1) rows regardless of corpus size — so
        # materializing them per hop is O(1) work and the action becomes
        # `hops` shallow plans.
        expanded = (
            frontier.join(graph, frontier["node"] == graph["v"])
            .select("query_id", F.col("nb").alias("node"))
            .unionByName(frontier)
            .distinct()
            .localCheckpoint(eager=True)
        )
        scored = (
            expanded.join(F.broadcast(qv), "query_id")
            .join(xv, "node")
            .withColumn("cos", cosine(F.col("q_vec"), F.col("x_vec")))
        )
        frontier = (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= _BEAM)
            .select("query_id", "node")
        )
        seen = (
            seen.unionByName(expanded)
            .distinct()
            .localCheckpoint(eager=True)
        )
    final = (
        seen.filter(F.col("node") != F.col("query_id"))
        .join(F.broadcast(qv), "query_id")
        .join(xv, "node")
        .withColumn("cos", cosine(F.col("q_vec"), F.col("x_vec")))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= _SEARCH_K)
    )
    return final.select(
        "query_id",
        F.col("node").alias("neighbor_id"),
        "cos",
        F.col("r").cast("int").alias("rank"),
    ).orderBy("query_id", "rank")
