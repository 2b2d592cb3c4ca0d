"""Similarity-search queries over ``embeddings`` with DuckDB oracles.

Query set = vectors with ``vec_id < 10``. Both the exact brute-force
baseline and the LSH-bucketed ANN path are fully deterministic (md5-seeded
hyperplanes, left-fold double arithmetic), so BOTH get exact oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from formula_1_spark.operators.similarity import (
    BAND_BITS,
    N_BANDS,
    N_PLANES,
    brute_force_topk,
    ivf_topk,
    kmeans_centroids,
    lsh_topk,
)
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table

# The five IVF-family queries (ann_ivf, ann_ivfpq coarse, recall audit,
# cell balance, nprobe curve) train the IDENTICAL deterministic coarse
# quantizer on the full embeddings table at the default knobs. Training is
# cheap to EXECUTE but the unrolled-iteration plan costs ~3-4 s to
# physically plan per occurrence — so the trained relation (<= 8 rows) is
# memoized per (session, testdata identity) as an eager localCheckpoint
# and every consumer gets a LogicalRDD leaf, the same amortization the
# dedup family's _shared_relations provides. Values are unaffected:
# k-means here is bit-deterministic, and each query's DuckDB oracle still
# retrains from scratch, so a stale/wrong memo hash-mismatches.
_CENTROIDS_MEMO: dict[tuple, DataFrame] = {}


def shared_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.queries import memo

    key = memo.file_key(spark, sf_dir, "embeddings")
    df = memo.get(_CENTROIDS_MEMO, key)
    if df is None:
        emb = load_table(spark, sf_dir, "embeddings")
        df = kmeans_centroids(emb, n_cells=8, iters=2).localCheckpoint(
            eager=True
        )
        memo.install(_CENTROIDS_MEMO, key, df)
    return df


_PQ_CENTS_MEMO: dict[tuple, DataFrame] = {}


def shared_pq_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized trained PQ codebooks (m x n_codes rows) for the
    full embeddings table at the default knobs — the PQ twin of
    :func:`shared_centroids`, shared by ann_pq / ann_ivfpq /
    pq_distortion_audit / pq_recall_audit."""
    from formula_1_spark.operators.similarity import pq_subspace_model
    from formula_1_spark.queries import memo

    key = memo.file_key(spark, sf_dir, "embeddings")
    df = memo.get(_PQ_CENTS_MEMO, key)
    if df is None:
        emb = load_table(spark, sf_dir, "embeddings")
        _long, cents, _structs, _w = pq_subspace_model(
            emb, m=_PQ_M, n_codes=_PQ_CODES, learn_iters=_PQ_ITERS, dims=64
        )
        df = cents.localCheckpoint(eager=True)
        memo.install(_PQ_CENTS_MEMO, key, df)
    return df

# The corpus-side LSH band index (neighbor_id, band_id, band_key) at the
# default 16-plane/4-band layout is identical across the four LSH
# consumers (ann_lsh, ann_multiprobe, recall audits, ranking battery) —
# and its 16 hyperplane projections per vector are the only
# corpus-proportional cost of the index. Memoized per (session,
# embeddings identity) as a lazy localCheckpoint; operationally this is
# what a persisted LSH index stores on disk. Oracles re-derive bands.
_CORPUS_BANDS_MEMO: dict[tuple, DataFrame] = {}


def shared_corpus_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.similarity import _vec_base, _with_bands
    from formula_1_spark.queries import memo

    # dims in the key (r11 ADVICE): a future caller at a different
    # hyperplane layout must miss this memo, not silently reuse it.
    key = memo.file_key(spark, sf_dir, "embeddings", extra=(64,))
    df = memo.get(_CORPUS_BANDS_MEMO, key)
    if df is None:
        emb = load_table(spark, sf_dir, "embeddings")
        cv = _vec_base(emb, "neighbor_id", "c_vec")
        df = _with_bands(cv, "neighbor_id", "c_vec", 64).localCheckpoint(
            eager=False
        )
        memo.install(_CORPUS_BANDS_MEMO, key, df)
    return df


# The exact brute-force top-10 over the fixed vec_id < 10 probe panel is
# the ground truth of FIVE recall/ranking audits (ann_recall_audit,
# multiprobe_recall_gain, pq_recall_audit, ivf_nprobe_recall_curve,
# ranking_metrics_battery) and the declared result of
# similarity_topk_bruteforce — six executions of the same panel x corpus
# exact-cosine pass per suite before this memo. Same key/lifecycle as
# shared_centroids; every oracle still recomputes its ground truth.
_RECALL_GT_MEMO: dict[tuple, DataFrame] = {}


def shared_recall_gt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized ``brute_force_topk(emb, vec_id < 10, k=10)`` — full
    (query_id, neighbor_id, cos, rank) relation; consumers project."""
    from formula_1_spark.queries import memo

    key = memo.file_key(spark, sf_dir, "embeddings")
    df = memo.get(_RECALL_GT_MEMO, key)
    if df is None:
        emb = load_table(spark, sf_dir, "embeddings")
        df = brute_force_topk(
            emb, emb.filter(F.col("vec_id") < 10), k=_RECALL_K
        ).localCheckpoint(eager=False)
        memo.install(_RECALL_GT_MEMO, key, df)
    return df


_COS = """
list_reduce(list_transform(list_zip({a}, {b}),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, v) -> acc + v)
/ (sqrt(list_reduce(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        (acc, v) -> acc + v))
 * sqrt(list_reduce(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        (acc, v) -> acc + v)))
"""


def _proj_sql(p: int) -> str:
    """Signed projection of `embedding` onto md5-derived hyperplane p —
    mirrors operators.similarity._projection op-for-op, with the SAME
    Python-precomputed ±1 literals baked in."""
    from formula_1_spark.operators.similarity import plane_sign

    signs = ", ".join(str(plane_sign(p, d)) for d in range(64))
    return (
        f"list_reduce(list_transform(list_zip(embedding, [{signs}]), "
        "x -> CAST(x[1] AS DOUBLE) * x[2]), (acc, v) -> acc + v)"
    )


def _band_sql(b: int) -> str:
    bits = [
        f"(CASE WHEN {_proj_sql(b * BAND_BITS + i)} > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(BAND_BITS)
    ]
    return " + ".join(bits)


_BANDS_CTE = "banded AS (\n  SELECT vec_id, embedding,\n" + ",\n".join(
    f"         {_band_sql(b)} AS band_{b}" for b in range(N_BANDS)
) + "\n  FROM embeddings\n)"

_BANDS_LONG = (
    "bands AS (\n"
    + "  UNION ALL\n".join(
        f"  SELECT vec_id, embedding, {b} AS band_id, band_{b} AS band_key FROM banded\n"
        for b in range(N_BANDS)
    )
    + ")"
)


@register(
    "similarity_topk_bruteforce",
    ops="EXT-sim-bruteforce,W1,J1",
    doc="Exact cosine top-10 neighbors per query vector (vec_id < 10); "
    "broadcast nested-loop + per-query window rank.",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_COS.format(a="q.q_vec", b="e.embedding")} AS cos
  FROM embeddings e, q
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 10
""",
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The declared relation IS the family ground-truth memo (identical
    # call: k=10 over the vec_id < 10 panel). Reassert the declared
    # contract at the call site (r11 ADVICE): this query's oracle encodes
    # rank <= 10, so if the memo's panel k ever diverges the filter keeps
    # the declared result identical instead of silently widening it.
    assert _RECALL_K == 10, "memo k diverged from the declared oracle (k=10)"
    return shared_recall_gt(spark, sf_dir).filter(F.col("rank") <= 10)


@register(
    "similarity_ann_lsh",
    ops="EXT-sim-lsh,J4,W1",
    doc=f"ANN top-10 via {N_PLANES}-bit hyperplane LSH ({N_BANDS} bands x "
    f"{BAND_BITS} bits) + exact cosine re-rank among bucket candidates. "
    "Deterministic md5 hyperplanes → exact oracle.",
    oracle=f"""
WITH {_BANDS_CTE},
{_BANDS_LONG},
q AS (SELECT * FROM bands WHERE vec_id < 10),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, q.embedding AS q_vec,
                  c.vec_id AS neighbor_id, c.embedding AS c_vec
  FROM q JOIN bands c ON q.band_id = c.band_id AND q.band_key = c.band_key
  WHERE q.vec_id <> c.vec_id
),
scored AS (
  SELECT query_id, neighbor_id,
         {_COS.format(a="q_vec", b="c_vec")} AS cos
  FROM cand
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 10
""",
)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        corpus_bands=shared_corpus_bands(spark, sf_dir),
    )


def _kmeans_ctes(
    n_cells: int = 8,
    iters: int = 2,
    dims: int = 64,
    k_expr: str | None = None,
) -> str:
    """Unrolled deterministic spherical-k-means CTE chain mirroring
    operators.similarity.kmeans_centroids iteration-for-iteration:
    assign by argmax cosine (cell_id tie-break), recompute means over
    floor-quantized integer component sums (order-independent, so both
    engines agree bit-for-bit). ``k_expr`` (a scalar SQL subquery string)
    makes the cell count data-dependent — the corpus-scaled variant
    derives k from COUNT(1) so the oracle tracks the engine's knob."""
    k_sql = f"({k_expr})" if k_expr is not None else str(n_cells)
    parts = [
        f"""c0 AS (
  SELECT vec_id AS cell_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
  FROM embeddings WHERE vec_id < {k_sql}
)"""
    ]
    for t in range(1, iters + 1):
        cos = _COS.format(a="e.embedding", b="c.cent")
        parts.append(f"""a{t} AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT e.vec_id, e.embedding, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {cos} DESC, c.cell_id ASC) AS r
    FROM embeddings e, c{t - 1} c) WHERE r = 1
)""")
        parts.append(f"""m{t} AS (
  SELECT cell_id, d.dim AS dim,
         CAST(SUM(CAST(FLOOR(CAST(a.embedding[d.dim + 1] AS DOUBLE) * 1000000.0)
                       AS BIGINT)) AS DOUBLE) / (1000000.0 * COUNT(*)) AS comp
  FROM a{t} a, (SELECT unnest(range(0, {dims})) AS dim) d
  GROUP BY cell_id, d.dim
)""")
        parts.append(
            f"c{t} AS (SELECT cell_id, list(comp ORDER BY dim) AS cent "
            f"FROM m{t} GROUP BY cell_id)"
        )
    parts.append(f"centroids AS (SELECT cell_id, cent FROM c{iters})")
    return ",\n".join(parts)


@register(
    "similarity_ann_ivf",
    ops="EXT-sim-ivf,J4,W1",
    doc="IVF ANN top-10: 8-cell coarse quantizer LEARNED by 2 "
    "deterministic spherical k-means iterations (floor-quantized exact "
    "means — SQL-reproducible bit-for-bit), queries probe 2 nearest "
    "cells, exact re-rank within.",
    oracle=f"""
WITH {_kmeans_ctes(n_cells=8, iters=2)},
corpus_scored AS (
  SELECT e.vec_id AS neighbor_id, e.embedding AS c_vec, c.cell_id,
         {_COS.format(a="e.embedding", b="c.cent")} AS cell_cos
  FROM embeddings e, centroids c
),
corpus_cells AS (
  SELECT neighbor_id, c_vec, cell_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY neighbor_id ORDER BY cell_cos DESC, cell_id ASC) AS r
    FROM corpus_scored) WHERE r <= 1
),
query_scored AS (
  SELECT e.vec_id AS query_id, e.embedding AS q_vec, c.cell_id,
         {_COS.format(a="e.embedding", b="c.cent")} AS cell_cos
  FROM embeddings e, centroids c
  WHERE e.vec_id < 10
),
query_cells AS (
  SELECT query_id, q_vec, cell_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cell_cos DESC, cell_id ASC) AS r
    FROM query_scored) WHERE r <= 2
),
cand AS (
  SELECT DISTINCT q.query_id, q.q_vec, c.neighbor_id, c.c_vec
  FROM query_cells q JOIN corpus_cells c ON q.cell_id = c.cell_id
  WHERE q.query_id <> c.neighbor_id
),
scored AS (
  SELECT query_id, neighbor_id,
         {_COS.format(a="q_vec", b="c_vec")} AS cos
  FROM cand
)
SELECT query_id, neighbor_id, cos,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= 10
""",
)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        centroids=shared_centroids(spark, sf_dir),
    )


@register(
    "embedding_quantization",
    ops="EXT-embedding-quantization,A1,F-HOF",
    doc="Int8 scalar quantization of the embedding column: per-dimension "
    "corpus min/max (one 64-group aggregate) -> affine uint8 codes -> "
    "dequantized reconstruction, reporting per-vector cosine(original, "
    "reconstruction) and max absolute error. The 4x storage cut is the "
    "standard ANN-at-scale move; the error report is the audit that the "
    "cut is safe. floor(x + 0.5) rounding and left-fold sums keep both "
    "engines bit-identical.",
    oracle="""
WITH ex AS (
  SELECT vec_id, i.i AS dim, CAST(embedding[i.i + 1] AS DOUBLE) AS v
  FROM embeddings, (SELECT unnest(range(0, 64)) AS i) i
),
stats AS (SELECT dim, MIN(v) AS mn, MAX(v) AS mx FROM ex GROUP BY dim),
srow AS (
  SELECT list(mn ORDER BY dim) AS mns,
         list(mx - mn ORDER BY dim) AS rngs
  FROM stats
),
vecs AS (
  SELECT e.vec_id,
         list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS orig,
         s.mns, s.rngs
  FROM embeddings e, srow s
),
coded AS (
  SELECT vec_id, orig, mns, rngs,
         list_transform(
           list_zip(list_transform(list_zip(orig, mns), p -> p[1] - p[2]), rngs),
           p -> CASE WHEN p[2] > 0 THEN floor(p[1] / p[2] * 255 + 0.5)
                     ELSE 0 END) AS codes
  FROM vecs
),
deq AS (
  SELECT vec_id, orig,
         list_transform(
           list_zip(list_transform(list_zip(codes, rngs),
                                   p -> p[1] * p[2] / 255.0), mns),
           p -> p[1] + p[2]) AS rec
  FROM coded
)
SELECT vec_id,
       list_reduce(list_transform(list_zip(orig, rec), p -> p[1] * p[2]),
                   (a, b) -> a + b)
         / (sqrt(list_reduce(list_transform(orig, x -> x * x), (a, b) -> a + b))
            * sqrt(list_reduce(list_transform(rec, x -> x * x), (a, b) -> a + b)))
         AS cos_rec,
       list_max(list_transform(list_zip(orig, rec), p -> abs(p[1] - p[2])))
         AS max_abs_err
FROM deq
""",
)
def embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.functions.vectors import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    dims = 64
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "vf")
    ).select("vec_id", "dim", F.col("vf").cast("double").alias("v"))
    stats = ex.groupBy("dim").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    # 64 rows -> one broadcast row of dim-ordered stat arrays
    srow = stats.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mn"))), lambda s: s["mn"]
        ).alias("mns"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mn", "mx"))),
            lambda s: s["mx"] - s["mn"],
        ).alias("rngs"),
    )
    orig = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    vecs = emb.join(F.broadcast(srow), F.lit(True)).select(
        "vec_id", orig.alias("orig"), "mns", "rngs"
    )
    codes = F.zip_with(
        F.zip_with(F.col("orig"), F.col("mns"), lambda v, mn: v - mn),
        F.col("rngs"),
        lambda d, r: F.when(r > 0, F.floor(d / r * 255 + 0.5)).otherwise(F.lit(0)),
    )
    coded = vecs.select("vec_id", "orig", "mns", "rngs", codes.alias("codes"))
    rec = F.zip_with(
        F.zip_with(F.col("codes"), F.col("rngs"), lambda c, r: c * r / 255.0),
        F.col("mns"),
        lambda d, mn: d + mn,
    )
    deq = coded.select("vec_id", "orig", rec.alias("rec"))
    return deq.select(
        "vec_id",
        cosine(F.col("orig"), F.col("rec")).alias("cos_rec"),
        F.array_max(
            F.zip_with(F.col("orig"), F.col("rec"), lambda a, b: F.abs(a - b))
        ).alias("max_abs_err"),
    )


# ---------------------------------------------------------------------------
# Product quantization (ADC) ANN
# ---------------------------------------------------------------------------

_DOT = """
list_reduce(list_transform(list_zip({a}, {b}),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, v) -> acc + v)
"""

_PQ_M = 4
_PQ_SUB = 16
_PQ_CODES = 8
_PQ_ITERS = 2
_PQ_CAND = 20


def _kmeans_ctes_src(prefix: str, src: str, n_cells: int, iters: int, dims: int) -> str:
    """:func:`_kmeans_ctes` generalized to a named source CTE and a name
    prefix, so PQ can train one codebook per subspace in one statement."""
    parts = [
        f"""{prefix}c0 AS (
  SELECT vec_id AS cell_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
  FROM {src} WHERE vec_id < {n_cells}
)"""
    ]
    for t in range(1, iters + 1):
        cos = _COS.format(a="e.embedding", b="c.cent")
        parts.append(f"""{prefix}a{t} AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT e.vec_id, e.embedding, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {cos} DESC, c.cell_id ASC) AS r
    FROM {src} e, {prefix}c{t - 1} c) WHERE r = 1
)""")
        parts.append(f"""{prefix}m{t} AS (
  SELECT cell_id, d.dim AS dim,
         CAST(SUM(CAST(FLOOR(CAST(a.embedding[d.dim + 1] AS DOUBLE) * 1000000.0)
                       AS BIGINT)) AS DOUBLE) / (1000000.0 * COUNT(*)) AS comp
  FROM {prefix}a{t} a, (SELECT unnest(range(0, {dims})) AS dim) d
  GROUP BY cell_id, d.dim
)""")
        parts.append(
            f"{prefix}c{t} AS (SELECT cell_id, list(comp ORDER BY dim) AS cent "
            f"FROM {prefix}m{t} GROUP BY cell_id)"
        )
    parts.append(f"{prefix}cent AS MATERIALIZED (SELECT cell_id, cent FROM {prefix}c{iters})")
    return ",\n".join(parts)


def _pq_parts(extra_joins: str = "", extra_pred: str = "") -> list[str]:
    """The PQ oracle's shared CTE chain up to and including ``approx``
    (codebook training -> encoding -> ADC tables -> approx scores).
    ``extra_joins``/``extra_pred`` let the IVFPQ variant restrict the
    approx pair space to IVF-probed cells."""
    parts = []
    for s in range(_PQ_M):
        lo, hi = s * _PQ_SUB + 1, (s + 1) * _PQ_SUB
        parts.append(
            f"sub{s} AS MATERIALIZED (SELECT vec_id, embedding[{lo}:{hi}] AS embedding "
            f"FROM embeddings)"
        )
        parts.append(_kmeans_ctes_src(f"s{s}", f"sub{s}", _PQ_CODES, _PQ_ITERS, _PQ_SUB))
        cos = _COS.format(a="e.embedding", b="c.cent")
        parts.append(f"""s{s}code AS (
  SELECT vec_id, cell_id AS code_{s} FROM (
    SELECT e.vec_id, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {cos} DESC, c.cell_id ASC) AS r
    FROM sub{s} e, s{s}cent c) WHERE r = 1
)""")
        dotsql = _DOT.format(a="e.embedding", b="c.cent")
        parts.append(f"""s{s}adc AS (
  SELECT e.vec_id AS query_id, c.cell_id AS code_{s}, {dotsql} AS d_{s}
  FROM sub{s} e, s{s}cent c WHERE e.vec_id < 10
)""")
    code_join = "s0code c0" + "".join(
        f" JOIN s{s}code c{s} USING (vec_id)" for s in range(1, _PQ_M)
    )
    code_cols = ", ".join(f"c{s}.code_{s}" for s in range(_PQ_M))
    parts.append(
        f"codes AS (SELECT c0.vec_id, {code_cols} FROM {code_join})"
    )
    adc_joins = "JOIN s0adc a0 ON a0.code_0 = x.code_0" + "".join(
        f"\n  JOIN s{s}adc a{s} ON a{s}.query_id = a0.query_id "
        f"AND a{s}.code_{s} = x.code_{s}"
        for s in range(1, _PQ_M)
    )
    approx_sum = " + ".join(f"a{s}.d_{s}" for s in range(_PQ_M))
    parts.append(f"""approx AS (
  SELECT a0.query_id, x.vec_id AS neighbor_id, {approx_sum} AS approx
  FROM codes x
  {adc_joins}
  {extra_joins}
  WHERE x.vec_id <> a0.query_id{extra_pred}
)""")
    return parts


def _pq_oracle() -> str:
    parts = _pq_parts()
    parts.append(f"""cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY approx DESC, neighbor_id ASC) AS cr
    FROM approx) WHERE cr <= {_PQ_CAND}
)""")
    final_cos = _COS.format(a="q.embedding", b="x.embedding")
    return (
        "WITH " + ",\n".join(parts) + f""",
scored AS (
  SELECT c.query_id, c.neighbor_id, {final_cos} AS cos
  FROM cand c
  JOIN embeddings q ON q.vec_id = c.query_id
  JOIN embeddings x ON x.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cos, CAST(r AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS r
  FROM scored
) WHERE r <= 10
"""
    )


@register(
    "similarity_ann_pq",
    ops="EXT-sim-pq,J4,W1 (product quantization + ADC)",
    doc=f"Product-quantization ANN top-10 (Jégou et al. 2011): "
    f"{_PQ_M} subspaces x {_PQ_CODES}-cell codebooks learned by the same "
    "deterministic spherical k-means as IVF, corpus compressed to "
    f"{_PQ_M} codes/vector, queries score candidates via a broadcast "
    "ADC lookup table (fixed-order subspace-dot sum — bit-exact), "
    f"top-{_PQ_CAND} ADC candidates re-ranked by exact cosine. The "
    "oracle replays codebook training, encoding, ADC, and re-rank "
    "bit-for-bit.",
    oracle=_pq_oracle(),
)
def similarity_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.similarity import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        k=10,
        m=_PQ_M,
        n_codes=_PQ_CODES,
        learn_iters=_PQ_ITERS,
        n_candidates=_PQ_CAND,
        cents=shared_pq_cents(spark, sf_dir),
    )


@register(
    "ivf_incremental_assign",
    ops="EXT-sim-ivf-maintenance,J1,A1,W1 (index append + drift audit)",
    doc="IVF index MAINTENANCE — the append path a 100 TB vector store "
    "runs per batch: centroids stay trained on the BASE snapshot "
    "(vec_id%5<4, 2 deterministic k-means iterations, floor-quantized "
    "exact means), the delta batch (vec_id%5==4) is assigned to the "
    "frozen cells by broadcast argmax-cosine, and the per-cell occupancy "
    "report contrasts delta vs base share on a ppm grid — the drift "
    "signal that schedules a retrain. No retraining per batch: delta "
    "work is O(batch x k). Seed quirk: init cells are base-side vec_id "
    "< 8, i.e. 7 seeds here (vec_id 4 is delta) — both engines agree.",
    oracle=f"""
WITH base AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 < 4
),
{_kmeans_ctes_src("b", "base", 8, 2, 64)},
assigned AS (
  SELECT vec_id, cell_id FROM (
    SELECT e.vec_id, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_COS.format(a="e.embedding", b="c.cent")} DESC,
                      c.cell_id ASC) AS r
    FROM embeddings e, bcent c) WHERE r = 1
),
cells AS (
  SELECT cell_id,
         CAST(COUNT(1) FILTER (WHERE vec_id % 5 < 4) AS BIGINT) AS n_base,
         CAST(COUNT(1) FILTER (WHERE vec_id % 5 = 4) AS BIGINT) AS n_delta
  FROM assigned GROUP BY cell_id
),
tot AS (
  SELECT CAST(SUM(n_base) AS BIGINT) AS tb,
         CAST(SUM(n_delta) AS BIGINT) AS td
  FROM cells
)
SELECT cell_id, n_base, n_delta,
       CAST((n_delta * 1000000) // td - (n_base * 1000000) // tb AS BIGINT)
         AS drift_ppm
FROM cells, tot
ORDER BY cell_id
""",
)
def ivf_incremental_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from formula_1_spark.functions.vectors import cosine
    from formula_1_spark.operators.similarity import kmeans_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 < 4)
    cents = kmeans_centroids(base, n_cells=8, iters=2).localCheckpoint(eager=False)
    scored = emb.join(F.broadcast(cents), F.lit(True)).withColumn(
        "cell_cos", cosine(F.col("embedding"), F.col("cent"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cell_cos"), F.asc("cell_id"))
    assign = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("vec_id", "cell_id")
    )
    cells = assign.groupBy("cell_id").agg(
        F.count_if(F.col("vec_id") % 5 < 4).alias("n_base"),
        F.count_if(F.col("vec_id") % 5 == 4).alias("n_delta"),
    )
    tot = cells.agg(F.sum("n_base").alias("tb"), F.sum("n_delta").alias("td"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "cell_id",
            "n_base",
            "n_delta",
            F.expr(
                "(n_delta * 1000000) div td - (n_base * 1000000) div tb"
            ).alias("drift_ppm"),
        )
        .orderBy("cell_id")
    )


# ---------------------------------------------------------------------------
# ANN recall audit: approximate top-10 vs exact top-10 (round 6)
# ---------------------------------------------------------------------------

_RECALL_K = 10

_GT_CTES = f"""
bf_scored AS (
  SELECT qq.vec_id AS query_id, e.vec_id AS neighbor_id,
         {_COS.format(a="qq.embedding", b="e.embedding")} AS cos
  FROM embeddings e, embeddings qq
  WHERE qq.vec_id < 10 AND e.vec_id <> qq.vec_id
),
gt AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS r
    FROM bf_scored) bfr WHERE r <= {_RECALL_K}
)"""

_LSH_RES_CTES = f"""
lq AS (SELECT * FROM bands WHERE vec_id < 10),
lsh_cand AS (
  SELECT DISTINCT lq.vec_id AS query_id, lq.embedding AS q_vec,
                  c.vec_id AS neighbor_id, c.embedding AS c_vec
  FROM lq JOIN bands c ON lq.band_id = c.band_id AND lq.band_key = c.band_key
  WHERE lq.vec_id <> c.vec_id
),
lsh_res AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY {_COS.format(a="q_vec", b="c_vec")} DESC,
                                     neighbor_id ASC) AS r
    FROM lsh_cand) lr WHERE r <= {_RECALL_K}
)"""

_IVF_RES_CTES = f"""
corpus_scored AS (
  SELECT e.vec_id AS neighbor_id, e.embedding AS c_vec, c.cell_id,
         {_COS.format(a="e.embedding", b="c.cent")} AS cell_cos
  FROM embeddings e, centroids c
),
corpus_cells AS (
  SELECT neighbor_id, c_vec, cell_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY neighbor_id ORDER BY cell_cos DESC, cell_id ASC) AS r
    FROM corpus_scored) ccr WHERE r <= 1
),
query_scored AS (
  SELECT e.vec_id AS query_id, e.embedding AS q_vec, c.cell_id,
         {_COS.format(a="e.embedding", b="c.cent")} AS cell_cos
  FROM embeddings e, centroids c
  WHERE e.vec_id < 10
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
ivf_res AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY {_COS.format(a="q_vec", b="c_vec")} DESC,
                                     neighbor_id ASC) AS r
    FROM ivf_cand) ir WHERE r <= {_RECALL_K}
)"""


@register(
    "ann_recall_audit",
    ops="EXT-sim-recall-audit,A3,J-semi (ANN recall@10 vs exact)",
    doc="Recall@10 audit for BOTH ANN paths against the exact brute-force "
    "top-10 (the measurement behind choosing banding/cell knobs, same "
    "role minhash_recall_audit plays for the dedup family): per (method, "
    "query) the approximate-vs-exact top-10 intersection size and recall "
    "ppm. All three pipelines are deterministic (md5 hyperplanes, "
    "floor-quantized k-means, neighbor-id tiebreaks), so the audit is "
    "exactly oracle-checkable.",
    oracle=f"""
WITH {_BANDS_CTE},
{_BANDS_LONG},
{_kmeans_ctes(n_cells=8, iters=2)},
{_GT_CTES},
{_LSH_RES_CTES},
{_IVF_RES_CTES},
per AS (
  SELECT 'ivf' AS method, query_id, COUNT(1) AS hits
  FROM (SELECT * FROM ivf_res INTERSECT SELECT * FROM gt) ih GROUP BY query_id
  UNION ALL
  SELECT 'lsh' AS method, query_id, COUNT(1) AS hits
  FROM (SELECT * FROM lsh_res INTERSECT SELECT * FROM gt) lh GROUP BY query_id
),
qids AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10),
methods AS (SELECT 'ivf' AS method UNION ALL SELECT 'lsh')
SELECT m.method, qi.query_id,
       CAST(COALESCE(p.hits, 0) AS BIGINT) AS hits_top10,
       CAST(COALESCE(p.hits, 0) * 1000000 // {_RECALL_K} AS BIGINT)
         AS recall_ppm
FROM methods m CROSS JOIN qids qi
LEFT JOIN per p ON p.method = m.method AND p.query_id = qi.query_id
ORDER BY m.method, qi.query_id
""",
)
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    gt = shared_recall_gt(spark, sf_dir).select("query_id", "neighbor_id")
    gt = gt.localCheckpoint(eager=False)  # ground truth reused by both methods
    qids = q.select(F.col("vec_id").alias("query_id"))

    def recall_of(res: DataFrame, method: str) -> DataFrame:
        hits = (
            res.select("query_id", "neighbor_id")
            .join(gt, ["query_id", "neighbor_id"], "leftsemi")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("hits"))
        )
        return qids.join(hits, "query_id", "left").select(
            F.lit(method).alias("method"),
            "query_id",
            F.coalesce("hits", F.lit(0)).cast("bigint").alias("hits_top10"),
            F.expr(
                f"cast((coalesce(hits, 0) * 1000000) div {_RECALL_K} as bigint)"
            ).alias("recall_ppm"),
        )

    ivf = recall_of(
        ivf_topk(emb, q, k=_RECALL_K, centroids=shared_centroids(spark, sf_dir)),
        "ivf",
    )
    lsh = recall_of(
        lsh_topk(
            emb, q, k=_RECALL_K, corpus_bands=shared_corpus_bands(spark, sf_dir)
        ),
        "lsh",
    )
    return ivf.unionByName(lsh).orderBy("method", "query_id")


# ---------------------------------------------------------------------------
# PQ distortion / codebook-balance audit (round 6)
# ---------------------------------------------------------------------------


def _pq_distortion_oracle() -> str:
    parts = []
    unions = []
    for s in range(_PQ_M):
        lo, hi = s * _PQ_SUB + 1, (s + 1) * _PQ_SUB
        parts.append(
            f"sub{s} AS MATERIALIZED (SELECT vec_id, embedding[{lo}:{hi}] "
            f"AS embedding FROM embeddings)"
        )
        parts.append(
            _kmeans_ctes_src(f"s{s}", f"sub{s}", _PQ_CODES, _PQ_ITERS, _PQ_SUB)
        )
        cos = _COS.format(a="e.embedding", b="c.cent")
        parts.append(f"""asg{s} AS (
  SELECT vec_id, cell_id, cos FROM (
    SELECT e.vec_id, c.cell_id, {cos} AS cos,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {cos} DESC, c.cell_id ASC) AS r
    FROM sub{s} e, s{s}cent c) q{s} WHERE r = 1
)""")
        unions.append(
            f"SELECT {s} AS subspace, vec_id, cell_id, cos FROM asg{s}"
        )
    parts.append("allsub AS (\n" + "\nUNION ALL\n".join(unions) + "\n)")
    parts.append("""per_cell AS (
  SELECT subspace, cell_id, COUNT(1) AS n FROM allsub GROUP BY subspace, cell_id
),
balance AS (
  SELECT subspace, COUNT(1) AS n_codes_used, MAX(n) AS max_cell,
         SUM(n) AS n_vectors
  FROM per_cell GROUP BY subspace
),
dist AS (
  SELECT subspace,
         SUM(CAST(FLOOR(cos * 1000000.0) AS BIGINT)) AS sumq,
         MIN(CAST(FLOOR(cos * 1000000.0) AS BIGINT)) AS min_cos_ppm
  FROM allsub GROUP BY subspace
)""")
    return (
        "WITH " + ",\n".join(parts) + """
SELECT b.subspace,
       CAST(b.n_vectors AS BIGINT) AS n_vectors,
       CAST(b.n_codes_used AS BIGINT) AS n_codes_used,
       CAST(b.max_cell * 1000000 // b.n_vectors AS BIGINT)
         AS max_cell_share_ppm,
       CAST(d.sumq // b.n_vectors AS BIGINT) AS mean_cos_ppm,
       CAST(d.min_cos_ppm AS BIGINT) AS min_cos_ppm
FROM balance b JOIN dist d USING (subspace)
ORDER BY b.subspace
"""
    )


@register(
    "pq_distortion_audit",
    ops="EXT-sim-pq-audit,A1,W1 (PQ reconstruction + balance audit)",
    doc="Is the 4x-compression PQ codebook safe? Per subspace: vectors, "
    "codes actually used, the hottest code's share (codebook balance — "
    "a collapsed codebook means ADC scores carry no signal), and the "
    "mean/min cosine between each sub-vector and its assigned centroid "
    "(reconstruction quality) in floor-quantized integer ppm. The "
    "compression-side complement of ann_recall_audit, sharing "
    "pq_subspace_model with similarity_ann_pq.",
    oracle=_pq_distortion_oracle(),
)
def pq_distortion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.similarity import cosine, pq_subspace_model

    emb = load_table(spark, sf_dir, "embeddings")
    corpus_long, cents, _, w_assign = pq_subspace_model(
        emb,
        m=_PQ_M,
        n_codes=_PQ_CODES,
        learn_iters=_PQ_ITERS,
        dims=64,
        cents=shared_pq_cents(spark, sf_dir),
    )
    assigned = (
        corpus_long.join(F.broadcast(cents), "s")
        .withColumn("cell_cos", cosine(F.col("embedding"), F.col("cent")))
        .withColumn("r", F.row_number().over(w_assign))
        .filter(F.col("r") == 1)
        .select(
            F.col("s").alias("subspace"),
            "vec_id",
            "cell_id",
            F.floor(F.col("cell_cos") * 1000000.0)
            .cast("bigint")
            .alias("cos_q"),
        )
    )
    per_cell = assigned.groupBy("subspace", "cell_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    balance = per_cell.groupBy("subspace").agg(
        F.count(F.lit(1)).alias("n_codes_used"),
        F.max("n").alias("max_cell"),
        F.sum("n").alias("n_vectors"),
    )
    dist = assigned.groupBy("subspace").agg(
        F.sum("cos_q").alias("sumq"),
        F.min("cos_q").alias("min_cos_ppm"),
    )
    return (
        balance.join(dist, "subspace")
        .select(
            "subspace",
            F.col("n_vectors").cast("bigint").alias("n_vectors"),
            F.col("n_codes_used").cast("bigint").alias("n_codes_used"),
            F.expr("cast((max_cell * 1000000) div n_vectors as bigint)").alias(
                "max_cell_share_ppm"
            ),
            F.expr("cast(sumq div n_vectors as bigint)").alias(
                "mean_cos_ppm"
            ),
            F.col("min_cos_ppm").cast("bigint").alias("min_cos_ppm"),
        )
        .orderBy("subspace")
    )


# ---------------------------------------------------------------------------
# Bitext mining with the forward margin criterion (round 6)
# ---------------------------------------------------------------------------

_MARGIN_K = 4  # margin denominator: mean of the top-4 neighborhood
_MARGIN_THR = 1_020_000  # accept margin >= 1.02 (ppm)
_BUCKET_SQL_VEC = "('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT % 10"


@register(
    "bitext_margin_mining",
    ops="EXT-sim-bitext,J4,W1 (margin-criterion pair mining)",
    doc="Bitext-style pair mining (Artetxe & Schwenk 2019 forward margin "
    "criterion): deterministic md5 buckets split the embedding corpus "
    "into side A (buckets 0-4) and side B (5-9); for each probe in a "
    "FIXED panel of A ids (every 5th id < 250 — probe-broadcast "
    "discipline of embedding_decontamination, probe count pinned so "
    "the brute B-scan stays linear in the corpus), score all of B, "
    "and accept the top "
    "neighbor iff cos / mean(top-4 cos) clears the margin (ratio of "
    "FIXED-ORDER 4-term sums, floor-ppm). At 100 TB the B-side scan is "
    "replaced by IVF/LSH candidates (similarity_ann_*); the margin "
    "math is identical.",
    oracle=f"""
WITH sides AS (
  SELECT vec_id, embedding, {_BUCKET_SQL_VEC} AS b FROM embeddings
),
probes AS (
  SELECT vec_id AS src_id, embedding AS x FROM sides
  WHERE b < 5 AND vec_id % 5 = 0 AND vec_id < 250
),
tgt AS (SELECT vec_id AS tgt_id, embedding AS y FROM sides WHERE b >= 5),
scored AS (
  SELECT p.src_id, t.tgt_id,
         {_COS.format(a="p.x", b="t.y")} AS cos
  FROM probes p, tgt t
),
ranked AS (
  SELECT src_id, tgt_id, cos,
         ROW_NUMBER() OVER (PARTITION BY src_id
                            ORDER BY cos DESC, tgt_id ASC) AS r
  FROM scored
),
piv AS (
  SELECT src_id,
         MAX(CASE WHEN r = 1 THEN tgt_id END) AS tgt_id,
         MAX(CASE WHEN r = 1 THEN cos END) AS c1,
         MAX(CASE WHEN r = 2 THEN cos END) AS c2,
         MAX(CASE WHEN r = 3 THEN cos END) AS c3,
         MAX(CASE WHEN r = 4 THEN cos END) AS c4
  FROM ranked WHERE r <= {_MARGIN_K} GROUP BY src_id
)
SELECT src_id, tgt_id,
       CAST(FLOOR(c1 * {_MARGIN_K} * 1000000.0 / (((c1 + c2) + c3) + c4))
            AS BIGINT) AS margin_ppm,
       CAST(CASE WHEN FLOOR(c1 * {_MARGIN_K} * 1000000.0
                            / (((c1 + c2) + c3) + c4)) >= {_MARGIN_THR}
                 THEN 1 ELSE 0 END AS INT) AS accepted
FROM piv
ORDER BY src_id
""",
)
def bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.queries.decontam import split_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    sides = emb.withColumn("b", split_bucket("vec_id"))
    # Fixed probe panel (~25 ids at any corpus size): the registered
    # query measures the margin math, not a corpus-wide mine — a full
    # mine routes candidates through similarity_ann_* instead of the
    # brute B-side scan, which would scale as probes x corpus.
    probes = sides.filter(
        (F.col("b") < 5) & (F.col("vec_id") % 5 == 0) & (F.col("vec_id") < 250)
    ).select(F.col("vec_id").alias("src_id"), F.col("embedding").alias("x"))
    tgt = sides.filter(F.col("b") >= 5).select(
        F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("y")
    )
    from formula_1_spark.operators.similarity import cosine

    scored = F.broadcast(probes).crossJoin(tgt).select(
        "src_id", "tgt_id", cosine(F.col("x"), F.col("y")).alias("cos")
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("cos"), F.asc("tgt_id"))
    piv = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= _MARGIN_K)
        .groupBy("src_id")
        .agg(
            F.max(F.when(F.col("r") == 1, F.col("tgt_id"))).alias("tgt_id"),
            *[
                F.max(F.when(F.col("r") == i, F.col("cos"))).alias(f"c{i}")
                for i in range(1, _MARGIN_K + 1)
            ],
        )
    )
    margin = F.floor(
        F.col("c1")
        * _MARGIN_K
        * 1000000.0
        / (((F.col("c1") + F.col("c2")) + F.col("c3")) + F.col("c4"))
    ).cast("bigint")
    return piv.select(
        "src_id",
        "tgt_id",
        margin.alias("margin_ppm"),
        F.when(margin >= _MARGIN_THR, 1).otherwise(0).cast("int").alias(
            "accepted"
        ),
    ).orderBy("src_id")


# ---------------------------------------------------------------------------
# IVF cell-balance diagnostics (round 7)
# ---------------------------------------------------------------------------


@register(
    "ivf_cell_balance",
    ops="EXT-sim-ivf,A1 (coarse-quantizer balance audit)",
    doc="Cell-occupancy audit for the IVF coarse quantizer "
    "(similarity_ann_ivf's 8 learned cells, 2 deterministic spherical "
    "k-means iterations): per cell — vector count, corpus share ppm, "
    "and balance ppm (share x n_cells; 1e6 = perfectly uniform). THE "
    "knob check before shipping an IVF index at 100 TB: probe cost and "
    "per-cell shuffle skew are both bounded by the heaviest cell, and "
    "a balance far above 1e6 says the quantizer needs re-training or "
    "more cells. Empty cells drop out in both engines.",
    oracle=f"""
WITH {_kmeans_ctes(n_cells=8, iters=2)},
scored AS (
  SELECT e.vec_id, c.cell_id,
         {_COS.format(a="e.embedding", b="c.cent")} AS cell_cos
  FROM embeddings e, centroids c
),
assign AS (
  SELECT vec_id, cell_id FROM (
    SELECT vec_id, cell_id, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY cell_cos DESC, cell_id ASC) AS r
    FROM scored) WHERE r = 1
),
per_cell AS (
  SELECT cell_id, CAST(COUNT(1) AS BIGINT) AS n_vectors
  FROM assign GROUP BY cell_id
),
tot AS (SELECT SUM(n_vectors) AS n_total, COUNT(1) AS n_cells FROM per_cell)
SELECT CAST(p.cell_id AS BIGINT) AS cell_id, p.n_vectors,
       CAST(p.n_vectors * 1000000 // t.n_total AS BIGINT) AS share_ppm,
       CAST(p.n_vectors * t.n_cells * 1000000 // t.n_total AS BIGINT)
         AS balance_ppm
FROM per_cell p, tot t
ORDER BY cell_id
""",
)
def ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    cents = shared_centroids(spark, sf_dir)
    scored = emb.join(F.broadcast(cents), F.lit(True)).withColumn(
        "cell_cos", cosine(F.col("embedding"), F.col("cent"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cell_cos"), F.asc("cell_id")
    )
    assign = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("vec_id", "cell_id")
    )
    per_cell = assign.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )
    tot = per_cell.agg(
        F.sum("n_vectors").alias("n_total"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    return (
        per_cell.join(F.broadcast(tot))
        .select(
            F.col("cell_id").cast("bigint").alias("cell_id"),
            F.col("n_vectors").cast("bigint").alias("n_vectors"),
            F.expr("cast(n_vectors * 1000000 div n_total as bigint)").alias(
                "share_ppm"
            ),
            F.expr(
                "cast(n_vectors * n_cells * 1000000 div n_total as bigint)"
            ).alias("balance_ppm"),
        )
        .orderBy("cell_id")
    )


# ---------------------------------------------------------------------------
# Multi-probe LSH (round 7)
# ---------------------------------------------------------------------------

_PROBE_FLIPS = ", ".join(
    f"xor(band_key, {1 << i})" for i in range(BAND_BITS)
)


@register(
    "similarity_ann_multiprobe",
    ops="EXT-sim-lsh,J4,W1 (multi-probe LSH, Lv et al. 2007)",
    doc=f"ANN top-10 via multi-probe LSH: the {N_BANDS}x{BAND_BITS}-bit "
    "banding of similarity_ann_lsh, but each query also probes every "
    "Hamming-1 perturbation of its band keys (one hyperplane bit "
    "flipped) — near neighbors that landed just across a hyperplane "
    "are recovered without adding hash tables. Probe fan-out is "
    "query-side only; the corpus index is bit-identical to the "
    "single-probe one. Exact cosine re-rank among candidates.",
    oracle=f"""
WITH {_BANDS_CTE},
{_BANDS_LONG},
q AS (SELECT * FROM bands WHERE vec_id < 10),
probes AS (
  SELECT vec_id, embedding, band_id, u.pk AS band_key
  FROM q, unnest([band_key, {_PROBE_FLIPS}]) u(pk)
),
cand AS (
  SELECT DISTINCT p.vec_id AS query_id, p.embedding AS q_vec,
                  c.vec_id AS neighbor_id, c.embedding AS c_vec
  FROM probes p JOIN bands c
    ON p.band_id = c.band_id AND p.band_key = c.band_key
  WHERE p.vec_id <> c.vec_id
),
scored AS (
  SELECT query_id, neighbor_id,
         {_COS.format(a="q_vec", b="c_vec")} AS cos
  FROM cand
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 10
""",
)
def similarity_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.similarity import multiprobe_lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return multiprobe_lsh_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        corpus_bands=shared_corpus_bands(spark, sf_dir),
    )


# ---------------------------------------------------------------------------
# Multi-probe recall/cost audit (round 7)
# ---------------------------------------------------------------------------


@register(
    "multiprobe_recall_gain",
    ops="EXT-sim-recall-audit,A3 (multi-probe cost/recall tradeoff)",
    doc="The multi-probe LSH trade quantified: per (method, query) — "
    "single-probe vs Hamming-1 multi-probe — the candidate-set size "
    "(the cost side: extra buckets probed) and recall@10 against the "
    "exact brute-force top-10 (the win side). The operational readout "
    "for choosing probe depth before scaling the index: at 100 TB, "
    "candidates/query is the per-query scan budget, and recall ppm is "
    "what it buys. Ground truth is computed once and shared.",
    oracle=f"""
WITH {_BANDS_CTE},
{_BANDS_LONG},
{_GT_CTES},
{_LSH_RES_CTES},
mq AS (
  SELECT vec_id, embedding, band_id, u.pk AS band_key
  FROM (SELECT * FROM bands WHERE vec_id < 10) q,
       unnest([band_key, {_PROBE_FLIPS}]) u(pk)
),
mp_cand AS (
  SELECT DISTINCT mq.vec_id AS query_id, mq.embedding AS q_vec,
                  c.vec_id AS neighbor_id, c.embedding AS c_vec
  FROM mq JOIN bands c ON mq.band_id = c.band_id AND mq.band_key = c.band_key
  WHERE mq.vec_id <> c.vec_id
),
mp_res AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY {_COS.format(a="q_vec", b="c_vec")} DESC,
                                     neighbor_id ASC) AS r
    FROM mp_cand) mr WHERE r <= {_RECALL_K}
),
counts AS (
  SELECT 'lsh_single' AS method, query_id, COUNT(1) AS n_candidates
  FROM lsh_cand GROUP BY query_id
  UNION ALL
  SELECT 'lsh_multiprobe', query_id, COUNT(1) FROM mp_cand GROUP BY query_id
),
hits AS (
  SELECT 'lsh_single' AS method, query_id, COUNT(1) AS hits
  FROM (SELECT * FROM lsh_res INTERSECT SELECT * FROM gt) sh GROUP BY query_id
  UNION ALL
  SELECT 'lsh_multiprobe', query_id, COUNT(1)
  FROM (SELECT * FROM mp_res INTERSECT SELECT * FROM gt) mh GROUP BY query_id
),
qids AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10),
methods AS (SELECT 'lsh_single' AS method UNION ALL SELECT 'lsh_multiprobe')
SELECT m.method, qi.query_id,
       CAST(COALESCE(c.n_candidates, 0) AS BIGINT) AS n_candidates,
       CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits_top10,
       CAST(COALESCE(h.hits, 0) * 1000000 // {_RECALL_K} AS BIGINT)
         AS recall_ppm
FROM methods m CROSS JOIN qids qi
LEFT JOIN counts c ON c.method = m.method AND c.query_id = qi.query_id
LEFT JOIN hits h ON h.method = m.method AND h.query_id = qi.query_id
ORDER BY m.method, qi.query_id
""",
)
def multiprobe_recall_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.similarity import (
        _vec_base,
        _with_bands,
        expand_multiprobe,
        rerank_exact_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    gt = shared_recall_gt(spark, sf_dir).select("query_id", "neighbor_id")
    qv = _vec_base(q, "query_id", "q_vec")
    cv = _vec_base(emb, "neighbor_id", "c_vec")
    # Family-memoized corpus band index — previously re-banded the corpus
    # once per audit arm (two executions per call).
    cb = shared_corpus_bands(spark, sf_dir)
    qids = q.select(F.col("vec_id").alias("query_id"))

    def audit(multi: bool, method: str) -> DataFrame:
        qb = _with_bands(qv, "query_id", "q_vec", 64)
        if multi:
            # The SAME probe fan-out multiprobe_lsh_topk uses — shared
            # helper, so the audit can never drift from the operator.
            qb = expand_multiprobe(qb, "query_id")
        cand = (
            F.broadcast(qb)
            .join(cb, ["band_id", "band_key"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
            .distinct()
            .localCheckpoint(eager=False)  # shared by count + re-rank
        )
        ncand = cand.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n_candidates")
        )
        res = rerank_exact_topk(cand, qv, cv, _RECALL_K).select(
            "query_id", "neighbor_id"
        )
        hits = (
            res.join(gt, ["query_id", "neighbor_id"], "leftsemi")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("hits"))
        )
        return (
            qids.join(ncand, "query_id", "left")
            .join(hits, "query_id", "left")
            .select(
                F.lit(method).alias("method"),
                "query_id",
                F.coalesce("n_candidates", F.lit(0))
                .cast("bigint")
                .alias("n_candidates"),
                F.coalesce("hits", F.lit(0)).cast("bigint").alias("hits_top10"),
                F.expr(
                    f"cast((coalesce(hits, 0) * 1000000) div {_RECALL_K}"
                    " as bigint)"
                ).alias("recall_ppm"),
            )
        )

    return (
        audit(False, "lsh_single")
        .unionByName(audit(True, "lsh_multiprobe"))
        .orderBy("method", "query_id")
    )


# ---------------------------------------------------------------------------
# PQ recall audit (round 7) — completes the ANN recall matrix
# ---------------------------------------------------------------------------


@register(
    "pq_recall_audit",
    ops="EXT-sim-recall-audit,A3 (PQ-ADC recall@10 vs exact)",
    doc="Recall@10 for the product-quantization ADC path against the "
    "exact brute-force top-10 — the third column of the ANN recall "
    "matrix (ann_recall_audit covers LSH and IVF): per query, the "
    "PQ top-10 intersection with ground truth and recall ppm. What it "
    "measures operationally: how much the m=4 x 8-code compression "
    "(16 bytes/vector) costs in answer quality before any re-rank "
    "budget changes.",
    oracle=f"""
WITH pq_res AS (
  SELECT query_id, neighbor_id FROM ({_pq_oracle()}) pz
),
{_GT_CTES},
hits AS (
  SELECT query_id, COUNT(1) AS hits
  FROM (SELECT * FROM pq_res INTERSECT SELECT * FROM gt) ph
  GROUP BY query_id
),
qids AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10)
SELECT 'pq' AS method, qi.query_id,
       CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits_top10,
       CAST(COALESCE(h.hits, 0) * 1000000 // {_RECALL_K} AS BIGINT)
         AS recall_ppm
FROM qids qi LEFT JOIN hits h USING (query_id)
ORDER BY query_id
""",
)
def pq_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.similarity import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    gt = shared_recall_gt(spark, sf_dir).select("query_id", "neighbor_id")
    res = pq_topk(
        emb,
        q,
        k=_RECALL_K,
        m=_PQ_M,
        n_codes=_PQ_CODES,
        learn_iters=_PQ_ITERS,
        n_candidates=_PQ_CAND,
        cents=shared_pq_cents(spark, sf_dir),
    ).select("query_id", "neighbor_id")
    hits = (
        res.join(gt, ["query_id", "neighbor_id"], "leftsemi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    qids = q.select(F.col("vec_id").alias("query_id"))
    return (
        qids.join(hits, "query_id", "left")
        .select(
            F.lit("pq").alias("method"),
            "query_id",
            F.coalesce("hits", F.lit(0)).cast("bigint").alias("hits_top10"),
            F.expr(
                f"cast((coalesce(hits, 0) * 1000000) div {_RECALL_K}"
                " as bigint)"
            ).alias("recall_ppm"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# IVF n_probe recall curve (round 8) — the IVF analog of
# multiprobe_recall_gain, completing the recall-vs-candidate-budget matrix
# ---------------------------------------------------------------------------

_NPROBE_SWEEP = (1, 2, 4, 8)


@register(
    "ivf_nprobe_recall_curve",
    ops="EXT-sim-ivf-sweep,A3,W1,J-semi (recall vs candidate budget)",
    doc="Recall@10 vs candidate budget as IVF n_probe sweeps 1/2/4/8 over "
    "the 8 learned cells — the knob-tuning curve an IVF deployment reads "
    "before fixing its latency/recall point (the IVF analog of "
    "multiprobe_recall_gain's LSH curve). ONE pass: corpus cells are "
    "assigned once, query cells ranked once to max(n_probe), each "
    "(query, neighbor) candidate pair is scored by exact cosine ONCE and "
    "tagged with the minimum probe rank that discovers it; the 4 sweep "
    "points are then a constant fan-out over the scored pairs, never 4 "
    "re-scans — at 100 TB the corpus is touched once regardless of how "
    "many sweep points the curve has. Deterministic k-means + tiebreaks "
    "=> exactly oracle-checkable.",
    oracle=f"""
WITH {_kmeans_ctes(n_cells=8, iters=2)},
{_GT_CTES},
nc_scored AS (
  SELECT e.vec_id AS neighbor_id, c.cell_id,
         {_COS.format(a="e.embedding", b="c.cent")} AS cell_cos
  FROM embeddings e, centroids c
),
nc_cells AS (
  SELECT neighbor_id, cell_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY neighbor_id ORDER BY cell_cos DESC, cell_id ASC) AS r
    FROM nc_scored) nr WHERE r <= 1
),
qc_scored AS (
  SELECT e.vec_id AS query_id, c.cell_id,
         {_COS.format(a="e.embedding", b="c.cent")} AS cell_cos
  FROM embeddings e, centroids c
  WHERE e.vec_id < 10
),
qc_cells AS (
  SELECT query_id, cell_id, CAST(r AS BIGINT) AS cell_rank FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cell_cos DESC, cell_id ASC) AS r
    FROM qc_scored) qr WHERE r <= {max(_NPROBE_SWEEP)}
),
pair0 AS (
  SELECT qc.query_id, nc.neighbor_id, MIN(qc.cell_rank) AS mr
  FROM qc_cells qc JOIN nc_cells nc USING (cell_id)
  WHERE qc.query_id <> nc.neighbor_id
  GROUP BY qc.query_id, nc.neighbor_id
),
pairs AS (
  SELECT p.query_id, p.neighbor_id, p.mr,
         {_COS.format(a="q.embedding", b="c.embedding")} AS cos
  FROM pair0 p
  JOIN embeddings q ON q.vec_id = p.query_id
  JOIN embeddings c ON c.vec_id = p.neighbor_id
),
probes AS (SELECT CAST(unnest([{", ".join(str(p) for p in _NPROBE_SWEEP)}]) AS BIGINT) AS n_probe),
pp AS (
  SELECT pr.n_probe, p.query_id, p.neighbor_id, p.cos
  FROM probes pr JOIN pairs p ON p.mr <= pr.n_probe
),
res AS (
  SELECT n_probe, query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY n_probe, query_id ORDER BY cos DESC, neighbor_id ASC) AS r
    FROM pp) rr WHERE r <= {_RECALL_K}
),
ncand AS (
  SELECT n_probe, query_id, COUNT(1) AS n_candidates
  FROM pp GROUP BY n_probe, query_id
),
hits AS (
  SELECT n_probe, query_id, COUNT(1) AS hits
  FROM res r JOIN gt g USING (query_id, neighbor_id)
  GROUP BY n_probe, query_id
),
qids AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10)
SELECT pr.n_probe, qi.query_id,
       CAST(COALESCE(nc.n_candidates, 0) AS BIGINT) AS n_candidates,
       CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits_top10,
       CAST(COALESCE(h.hits, 0) * 1000000 // {_RECALL_K} AS BIGINT)
         AS recall_ppm
FROM probes pr CROSS JOIN qids qi
LEFT JOIN ncand nc ON nc.n_probe = pr.n_probe AND nc.query_id = qi.query_id
LEFT JOIN hits h ON h.n_probe = pr.n_probe AND h.query_id = qi.query_id
ORDER BY pr.n_probe, qi.query_id
""",
)
def ivf_nprobe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.functions.vectors import cosine as _cosine
    from formula_1_spark.operators.similarity import _vec_base

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    gt = shared_recall_gt(spark, sf_dir).select("query_id", "neighbor_id")
    centroids = shared_centroids(spark, sf_dir)
    qv = _vec_base(q, "query_id", "q_vec")
    cv = _vec_base(emb, "neighbor_id", "c_vec")

    def assign(base, id_alias, vec_alias, top):
        scored = base.join(F.broadcast(centroids), F.lit(True)).withColumn(
            "cell_cos", _cosine(F.col(vec_alias), F.col("cent"))
        )
        w = Window.partitionBy(id_alias).orderBy(
            F.desc("cell_cos"), F.asc("cell_id")
        )
        return (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= top)
            .select(id_alias, "cell_id", F.col("r").cast("bigint").alias("cell_rank"))
        )

    # Every pair scored exactly once, tagged with the cheapest probe
    # budget that discovers it; sweep points fan out from this relation.
    pair0 = (
        assign(qv, "query_id", "q_vec", max(_NPROBE_SWEEP))
        .join(
            assign(cv, "neighbor_id", "c_vec", 1).drop("cell_rank"),
            "cell_id",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.min("cell_rank").alias("mr"))
    )
    pairs = (
        pair0.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "mr",
            _cosine(F.col("q_vec"), F.col("c_vec")).alias("cos"),
        )
        .localCheckpoint(eager=False)  # shared by all 4 sweep points
    )
    probes = F.array(*[F.lit(p).cast("bigint") for p in _NPROBE_SWEEP])
    pp = pairs.select(
        F.explode(probes).alias("n_probe"), "query_id", "neighbor_id", "cos", "mr"
    ).filter(F.col("mr") <= F.col("n_probe"))
    w = Window.partitionBy("n_probe", "query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    res = (
        pp.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= _RECALL_K)
        .select("n_probe", "query_id", "neighbor_id")
    )
    ncand = pp.groupBy("n_probe", "query_id").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    hits = (
        res.join(gt, ["query_id", "neighbor_id"], "leftsemi")
        .groupBy("n_probe", "query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    grid = q.select(
        F.col("vec_id").alias("query_id"),
        F.explode(probes).alias("n_probe"),
    )
    return (
        grid.join(ncand, ["n_probe", "query_id"], "left")
        .join(hits, ["n_probe", "query_id"], "left")
        .select(
            "n_probe",
            "query_id",
            F.coalesce("n_candidates", F.lit(0))
            .cast("bigint")
            .alias("n_candidates"),
            F.coalesce("hits", F.lit(0)).cast("bigint").alias("hits_top10"),
            F.expr(
                f"cast((coalesce(hits, 0) * 1000000) div {_RECALL_K}"
                " as bigint)"
            ).alias("recall_ppm"),
        )
        .orderBy("n_probe", "query_id")
    )


# ---------------------------------------------------------------------------
# IVF-PQ combined ANN (round 8) — the FAISS IVFADC serving layout
# ---------------------------------------------------------------------------


def _ivfpq_oracle() -> str:
    cells = f"""nc_scored AS (
  SELECT e.vec_id AS neighbor_id, c.cell_id,
         {_COS.format(a="e.embedding", b="c.cent")} AS cell_cos
  FROM embeddings e, centroids c
),
nc_cells AS (
  SELECT neighbor_id, cell_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY neighbor_id ORDER BY cell_cos DESC, cell_id ASC) AS r
    FROM nc_scored) nr WHERE r <= 1
),
qc_scored AS (
  SELECT e.vec_id AS query_id, c.cell_id,
         {_COS.format(a="e.embedding", b="c.cent")} AS cell_cos
  FROM embeddings e, centroids c
  WHERE e.vec_id < 10
),
qc_cells AS (
  SELECT query_id, cell_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cell_cos DESC, cell_id ASC) AS r
    FROM qc_scored) qr WHERE r <= 2
)"""
    pq = _pq_parts(
        extra_joins=(
            "JOIN qc_cells qc ON qc.query_id = a0.query_id\n"
            "  JOIN nc_cells cc ON cc.neighbor_id = x.vec_id"
            " AND cc.cell_id = qc.cell_id"
        )
    )
    final_cos = _COS.format(a="q.embedding", b="x.embedding")
    return (
        f"WITH {_kmeans_ctes(n_cells=8, iters=2)},\n"
        + cells
        + ",\n"
        + ",\n".join(pq)
        + f""",
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY approx DESC, neighbor_id ASC) AS cr
    FROM approx) cq WHERE cr <= {_PQ_CAND}
),
scored AS (
  SELECT c.query_id, c.neighbor_id, {final_cos} AS cos
  FROM cand c
  JOIN embeddings q ON q.vec_id = c.query_id
  JOIN embeddings x ON x.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cos, CAST(r AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS r
  FROM scored
) fr WHERE r <= 10
"""
    )


@register(
    "similarity_ann_ivfpq",
    ops="EXT-sim-ivfpq,J4,W1 (IVF pruning + PQ-ADC scoring)",
    doc="IVF-PQ ANN top-10 — the FAISS IVFADC billion-scale serving "
    "layout (by_residual=False variant): the 8-cell IVF coarse "
    "quantizer prunes candidates to the query's 2 nearest cells, PQ-ADC "
    "(4 subspaces x 8 codes, broadcast lookup tables, fixed-order sums) "
    "scores only the pruned pairs, top-20 re-rank by exact cosine. "
    "Corpus state per vector: 1 cell id + 4 codes; the full embedding "
    "is read only at re-rank. Combines similarity_ann_ivf's pruning "
    "with similarity_ann_pq's compression; the oracle replays coarse + "
    "subspace codebook training, encoding, cell probing, ADC, and "
    "re-rank bit-for-bit.",
    oracle=_ivfpq_oracle(),
)
def similarity_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.similarity import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        coarse=shared_centroids(spark, sf_dir),
        pq_cents=shared_pq_cents(spark, sf_dir),
        k=10,
        n_cells=8,
        n_probe=2,
        m=_PQ_M,
        n_codes=_PQ_CODES,
        learn_iters=_PQ_ITERS,
        n_candidates=_PQ_CAND,
    )
