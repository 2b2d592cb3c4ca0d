"""Ranking-quality metrics for the ANN retrieval families.

Retrieval pipelines are judged by ranking metrics, not just recall:
MRR (how early the first true neighbor appears) and nDCG@k (how much of
the ideal discounted gain the returned ORDER captures). Both are
computed here on an exact integer grid: the log2 position discounts
1/log2(i+1) are floor-ppm literals precomputed in Python and embedded
identically in both engines (libm never has to agree cross-engine), so
DCG is an integer SUM, and nDCG/MRR are integer floor divisions —
bit-exact at any corpus size.

Relevance is binary: a returned neighbor is relevant iff it is in the
exact brute-force top-10 for that query. |ideal| = k, so IDCG@k is the
constant sum of all k discounts.

No reference counterpart (extension surface; SURVEY.md §2.13).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.queries.similarity import (
    _BANDS_CTE,
    _BANDS_LONG,
    _COS,
    _GT_CTES,
    _RECALL_K,
    shared_centroids,
)
from formula_1_spark.sources.tables import load_table

# Floor-ppm position discounts 1/log2(i+1), i = 1..k.
_W_PPM = [
    int(1_000_000 / math.log2(i + 1)) for i in range(1, _RECALL_K + 1)
]
_IDCG_PPM = sum(_W_PPM)


def _res_rank_ctes() -> str:
    """LSH and IVF result lists WITH ranks (the recall-audit CTEs drop
    them), built on the shared banding / k-means training CTEs."""
    from formula_1_spark.queries.similarity import _kmeans_ctes

    return f"""
lq AS (SELECT * FROM bands WHERE vec_id < 10),
lsh_cand AS (
  SELECT DISTINCT lq.vec_id AS query_id, lq.embedding AS q_vec,
                  c.vec_id AS neighbor_id, c.embedding AS c_vec
  FROM lq JOIN bands c ON lq.band_id = c.band_id AND lq.band_key = c.band_key
  WHERE lq.vec_id <> c.vec_id
),
lshr AS (
  SELECT 'lsh' AS method, query_id, neighbor_id, r FROM (
    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY {_COS.format(a="q_vec", b="c_vec")} DESC,
                                     neighbor_id ASC) AS r
    FROM lsh_cand) lr WHERE r <= {_RECALL_K}
),
{_kmeans_ctes(n_cells=8, iters=2)},
corpus_scored AS (
  SELECT e.vec_id AS neighbor_id, e.embedding AS c_vec, c.cell_id,
         {_COS.format(a="e.embedding", b="c.cent")} AS cell_cos
  FROM embeddings e, centroids c
),
corpus_cells AS (
  SELECT neighbor_id, c_vec, cell_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY neighbor_id
      ORDER BY cell_cos DESC, cell_id ASC) AS r
    FROM corpus_scored) ccr WHERE r = 1
),
query_scored AS (
  SELECT qq.vec_id AS query_id, qq.embedding AS q_vec, c.cell_id,
         {_COS.format(a="qq.embedding", b="c.cent")} AS cell_cos
  FROM embeddings qq, centroids c WHERE qq.vec_id < 10
),
query_cells AS (
  SELECT query_id, q_vec, cell_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cell_cos DESC, cell_id ASC) AS r
    FROM query_scored) qcr WHERE r <= 2
),
ivf_cand AS (
  SELECT DISTINCT qc.query_id, qc.q_vec, cc.neighbor_id, cc.c_vec
  FROM query_cells qc JOIN corpus_cells cc ON qc.cell_id = cc.cell_id
  WHERE qc.query_id <> cc.neighbor_id
),
ivfr AS (
  SELECT 'ivf' AS method, query_id, neighbor_id, r FROM (
    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY {_COS.format(a="q_vec", b="c_vec")} DESC,
                                     neighbor_id ASC) AS r
    FROM ivf_cand) ir WHERE r <= {_RECALL_K}
),
res AS (SELECT * FROM lshr UNION ALL SELECT * FROM ivfr)
"""


@register(
    "ranking_metrics_battery",
    ops="EXT-eval-ranking,A3,J-semi,W1 (MRR + integer-grid nDCG@k)",
    doc=f"Ranking-quality battery for BOTH bucketed ANN paths vs the "
    f"exact top-{_RECALL_K} (binary relevance): per (method, query) the "
    f"hit count, MRR (floor ppm of 1/first-relevant-rank), and nDCG@"
    f"{_RECALL_K} with 1/log2(i+1) position discounts as Python-"
    f"precomputed floor-ppm integer literals in BOTH engines — DCG is "
    f"an exact integer sum, so the metric is bit-stable with no "
    f"cross-engine libm. The ORDER-sensitivity complement of "
    f"ann_recall_audit (a method can tie on recall yet rank true "
    f"neighbors later).",
    oracle=f"""
WITH {_BANDS_CTE},
{_BANDS_LONG},
{_GT_CTES},
{_res_rank_ctes()},
rel AS (
  SELECT r.method, r.query_id, r.r
  FROM res r JOIN gt g
    ON g.query_id = r.query_id AND g.neighbor_id = r.neighbor_id
),
w AS (
  SELECT UNNEST(range(1, {_RECALL_K + 1})) AS r,
         UNNEST({_W_PPM}) AS w_ppm
),
per AS (
  SELECT method, query_id,
         CAST(COUNT(1) AS BIGINT) AS hits,
         CAST(1000000 // MIN(r) AS BIGINT) AS mrr_ppm,
         CAST(SUM(w.w_ppm) * 1000000 // {_IDCG_PPM} AS BIGINT) AS ndcg_ppm
  FROM rel JOIN w USING (r)
  GROUP BY method, query_id
),
qids AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10),
methods AS (SELECT 'lsh' AS method UNION ALL SELECT 'ivf')
SELECT m.method, qi.query_id,
       CAST(COALESCE(p.hits, 0) AS BIGINT) AS hits,
       CAST(COALESCE(p.mrr_ppm, 0) AS BIGINT) AS mrr_ppm,
       CAST(COALESCE(p.ndcg_ppm, 0) AS BIGINT) AS ndcg_ppm
FROM methods m CROSS JOIN qids qi
LEFT JOIN per p ON p.method = m.method AND p.query_id = qi.query_id
ORDER BY m.method, qi.query_id
""",
)
def ranking_metrics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.similarity import ivf_topk, lsh_topk
    from formula_1_spark.queries.similarity import (
        shared_corpus_bands,
        shared_recall_gt,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    gt = shared_recall_gt(spark, sf_dir).select("query_id", "neighbor_id")
    w_arr = F.array(*[F.lit(w) for w in _W_PPM])

    def metrics_of(res: DataFrame, method: str) -> DataFrame:
        rel = res.select("query_id", "neighbor_id", F.col("rank").alias("r")).join(
            gt, ["query_id", "neighbor_id"], "leftsemi"
        )
        per = rel.groupBy("query_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("hits"),
            F.expr("cast(1000000 div min(r) as bigint)").alias("mrr_ppm"),
            (
                F.sum(F.element_at(w_arr, F.col("r"))) * 1_000_000
            ).cast("bigint").alias("dcg_num"),
        )
        qids = q.select(F.col("vec_id").alias("query_id"))
        return qids.join(per, "query_id", "left").select(
            F.lit(method).alias("method"),
            "query_id",
            F.coalesce("hits", F.lit(0)).cast("bigint").alias("hits"),
            F.coalesce("mrr_ppm", F.lit(0)).cast("bigint").alias("mrr_ppm"),
            F.coalesce(
                F.expr(f"cast(dcg_num div {_IDCG_PPM} as bigint)"), F.lit(0)
            ).alias("ndcg_ppm"),
        )

    lsh = metrics_of(
        lsh_topk(
            emb, q, k=_RECALL_K, corpus_bands=shared_corpus_bands(spark, sf_dir)
        ),
        "lsh",
    )
    ivf = metrics_of(
        ivf_topk(
            emb, q, k=_RECALL_K, centroids=shared_centroids(spark, sf_dir)
        ),
        "ivf",
    )
    return lsh.unionByName(ivf).orderBy("method", "query_id")
