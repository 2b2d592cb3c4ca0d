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

from pyspark.sql import DataFrame, SparkSession
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
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        nndescent_graph(emb, k=_K, iters=_ITERS)
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
        nndescent_graph(emb, k=_K, iters=_ITERS)
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
