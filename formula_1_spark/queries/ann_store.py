"""Persisted IVF-PQ ANN index store + probe-only query path.

The operational shape of similarity search at 100 TB is NOT "retrain the
quantizers and rescan the corpus every query batch" — it is a materialized
index: IVF coarse centroids + per-subspace PQ codebooks (tiny, broadcast),
the corpus PQ codes partitioned by IVF cell (the RAM-resident serving
index: m bytes + 1 cell id per vector), and the raw vectors partitioned by
the same cell for re-rank locality. A query batch broadcasts the centroids
and codebooks, probes its ``n_probe`` nearest cells, ADC-scores only the
cell-pruned candidates against the ON-DISK code table, and reads full
vectors only for the final top-``n_candidates`` exact re-rank.

``similarity_ann_ivfpq`` (queries/similarity.py) proves the IVFADC math
with everything computed inline; this module materializes the trained
index to a fingerprint-keyed parquet fixture (``sources/fixtures.py``) and
answers queries against the persisted artifacts, so the driver's green
hash covers the store round-trip (schema, cell partition layout, code
width, codebook ordering) end-to-end — the ANN mirror of the MinHash
store in ``queries/signature_store.py`` (VERDICT r10 "next round" item 5).
The DuckDB oracle recomputes coarse training, codebook training, encoding,
cell probing, ADC and re-rank from ``embeddings`` directly — an index
written or read wrongly (dropped cell partition, re-typed code, truncated
codebook) hash-mismatches.

Reference scope: the reference (uwe-uffuchs/formula-1) has no similarity
search; engine-native extension surface (SURVEY.md §7.1(8)).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from formula_1_spark.functions.vectors import cosine, dot
from formula_1_spark.operators.similarity import (
    kmeans_centroids,
    pq_subspace_model,
    rerank_exact_topk,
)
from formula_1_spark.queries.registry import register
from formula_1_spark.queries.similarity import _COS, _DOT, _kmeans_ctes_src
from formula_1_spark.sources.fixtures import building_dir, fixture_root, publish
from formula_1_spark.sources.tables import load_table

_N_CELLS, _N_PROBE, _ITERS, _DIMS = 8, 2, 2, 64
_M, _SUB, _CODES = 4, 16, 8
_CAND, _K = 20, 10
# Frozen corpus = 80% of vec_ids (always includes 0..7, the deterministic
# k-means seeds); the probing "new batch" is the %10==9 decile. Pure
# vec_id functions so the oracle replays the split exactly.
_FROZEN_MOD, _FROZEN_LT, _BATCH_RES = 10, 8, 9

# Fixture kind folds every algorithm parameter in so that editing any of
# them self-invalidates the on-disk index instead of silently serving a
# stale index trained under the old parameters.
_STORE_KIND = (
    f"ann_ivfpq_store_c{_N_CELLS}p{_N_PROBE}i{_ITERS}"
    f"m{_M}x{_CODES}f{_FROZEN_MOD}-{_FROZEN_LT}_v1"
)


def _frozen(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % _FROZEN_MOD < _FROZEN_LT
    )


def _cell_assign(base: DataFrame, coarse: DataFrame, id_col: str, top: int) -> DataFrame:
    """Top-``top`` IVF cells per vector by cosine (cell_id tie-break) —
    one broadcast of ``n_cells`` centroids, never a corpus shuffle."""
    w = Window.partitionBy(id_col).orderBy(F.desc("cell_cos"), F.asc("cell_id"))
    return (
        base.join(F.broadcast(coarse), F.lit(True))
        .withColumn("cell_cos", cosine(F.col("embedding"), F.col("cent")))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= top)
        .select(id_col, "cell_id")
    )


def _ann_store_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per testdata fingerprint) the persisted IVF-PQ index.

    Layout (all plain parquet — at 100 TB each is an append-friendly lake
    table):

    * ``coarse/``    (cell_id, cent)       — n_cells rows, broadcast side.
    * ``codebooks/`` (s, code, cent)       — m x n_codes rows, broadcast.
    * ``coded/``     (neighbor_id, code_0..code_{m-1}) PARTITIONED BY
      cell_id — the serving index: m small ints + the partition column
      per corpus vector; a probe touches only its probed cells'
      partitions (partition pruning on the cell join key).
    * ``vectors/``   (neighbor_id, c_vec) PARTITIONED BY cell_id — raw
      vectors co-partitioned with their codes so the exact re-rank reads
      only probed cells.
    """
    root = fixture_root(_STORE_KIND, sf_dir, "embeddings")
    if not os.path.isdir(root):
        scratch = building_dir(root)
        frozen = _frozen(spark, sf_dir)
        coarse = kmeans_centroids(
            frozen, n_cells=_N_CELLS, iters=_ITERS, dims=_DIMS
        ).localCheckpoint(eager=False)
        coarse.write.mode("overwrite").parquet(os.path.join(scratch, "coarse"))

        cells = _cell_assign(
            frozen.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
            coarse,
            "neighbor_id",
            1,
        )

        corpus_long, books, _sub_structs, w_assign = pq_subspace_model(
            frozen, m=_M, n_codes=_CODES, learn_iters=_ITERS, dims=_DIMS
        )
        books.select(
            "s", F.col("cell_id").alias("code"), "cent"
        ).write.mode("overwrite").parquet(os.path.join(scratch, "codebooks"))

        codes_wide = (
            corpus_long.join(F.broadcast(books), "s")
            .withColumn("cell_cos", cosine(F.col("embedding"), F.col("cent")))
            .withColumn("r", F.row_number().over(w_assign))
            .filter(F.col("r") == 1)
            .groupBy(F.col("vec_id").alias("neighbor_id"))
            .agg(
                *[
                    F.max(F.when(F.col("s") == s, F.col("cell_id")))
                    .cast("int")
                    .alias(f"code_{s}")
                    for s in range(_M)
                ]
            )
        )
        codes_wide.join(cells, "neighbor_id").write.mode("overwrite").partitionBy(
            "cell_id"
        ).parquet(os.path.join(scratch, "coded"))

        frozen.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_vec"),
        ).join(cells, "neighbor_id").write.mode("overwrite").partitionBy(
            "cell_id"
        ).parquet(os.path.join(scratch, "vectors"))
        publish(scratch, root)
    return root


def _store_oracle() -> str:
    """DuckDB replay of the full persisted-index pipeline from the raw
    ``embeddings`` table: frozen split, coarse k-means, per-subspace PQ
    codebook training + encoding, query cell probing, ADC over the
    cell-pruned pairs, exact re-rank — bit-for-bit (floor-quantized
    means, fixed-order float sums, cell_id/neighbor_id tie-breaks)."""
    parts = [
        f"""frozen AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id % {_FROZEN_MOD} < {_FROZEN_LT}
)""",
        f"""qpanel AS MATERIALIZED (
  SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings
  WHERE vec_id % {_FROZEN_MOD} = {_BATCH_RES}
)""",
        _kmeans_ctes_src("cq", "frozen", _N_CELLS, _ITERS, _DIMS),
        f"""nc AS (
  SELECT neighbor_id, cell_id FROM (
    SELECT e.vec_id AS neighbor_id, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_COS.format(a="e.embedding", b="c.cent")} DESC,
                      c.cell_id ASC) AS r
    FROM frozen e, cqcent c) WHERE r = 1
)""",
        f"""qc AS (
  SELECT query_id, cell_id FROM (
    SELECT q.query_id, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
             ORDER BY {_COS.format(a="q.q_vec", b="c.cent")} DESC,
                      c.cell_id ASC) AS r
    FROM qpanel q, cqcent c) WHERE r <= {_N_PROBE}
)""",
    ]
    for s in range(_M):
        lo, hi = s * _SUB + 1, (s + 1) * _SUB
        parts.append(
            f"sub{s} AS MATERIALIZED (SELECT vec_id, embedding[{lo}:{hi}]"
            f" AS embedding FROM frozen)"
        )
        parts.append(_kmeans_ctes_src(f"s{s}", f"sub{s}", _CODES, _ITERS, _SUB))
        cos = _COS.format(a="e.embedding", b="c.cent")
        parts.append(f"""s{s}code AS (
  SELECT vec_id, cell_id AS code_{s} FROM (
    SELECT e.vec_id, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {cos} DESC, c.cell_id ASC) AS r
    FROM sub{s} e, s{s}cent c) WHERE r = 1
)""")
        dotsql = _DOT.format(a="q.embedding", b="c.cent")
        parts.append(f"""s{s}adc AS (
  SELECT q.query_id, c.cell_id AS code_{s}, {dotsql} AS d_{s}
  FROM (SELECT query_id, q_vec[{lo}:{hi}] AS embedding FROM qpanel) q,
       s{s}cent c
)""")
    code_join = "s0code c0" + "".join(
        f" JOIN s{s}code c{s} USING (vec_id)" for s in range(1, _M)
    )
    code_cols = ", ".join(f"c{s}.code_{s}" for s in range(_M))
    parts.append(f"codes AS (SELECT c0.vec_id, {code_cols} FROM {code_join})")
    adc_joins = "JOIN s0adc a0 ON a0.code_0 = x.code_0" + "".join(
        f"\n  JOIN s{s}adc a{s} ON a{s}.query_id = a0.query_id"
        f" AND a{s}.code_{s} = x.code_{s}"
        for s in range(1, _M)
    )
    approx_sum = " + ".join(f"a{s}.d_{s}" for s in range(_M))
    parts.append(f"""approx AS (
  SELECT a0.query_id, x.vec_id AS neighbor_id, {approx_sum} AS approx
  FROM codes x
  {adc_joins}
  JOIN qc ON qc.query_id = a0.query_id
  JOIN nc ON nc.neighbor_id = x.vec_id AND nc.cell_id = qc.cell_id
)""")
    parts.append(f"""cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY approx DESC, neighbor_id ASC) AS cr
    FROM approx) WHERE cr <= {_CAND}
)""")
    final_cos = _COS.format(a="q.q_vec", b="x.embedding")
    return (
        "WITH " + ",\n".join(parts) + f""",
scored AS (
  SELECT c.query_id, c.neighbor_id, {final_cos} AS cos
  FROM cand c
  JOIN qpanel q USING (query_id)
  JOIN frozen x ON x.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cos, CAST(r AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS r
  FROM scored
) WHERE r <= {_K}
"""
    )


@register(
    "similarity_ann_store_probe",
    ops="EXT-sim-ivfpq,EXT-ann-store,S6,S7,J4,W1",
    doc="ANN top-10 against a PERSISTED IVF-PQ index: coarse centroids, "
    "PQ codebooks, cell-partitioned PQ codes and cell-partitioned raw "
    "vectors are materialized once to a parquet index fixture (trained "
    "on the frozen 80% of vec_ids); the probing batch (the %10==9 "
    "decile) broadcasts the tiny centroid/codebook tables, probes its 2 "
    "nearest cells, ADC-scores only cell-pruned pairs against the "
    "ON-DISK code table (4 broadcast code-lookup joins — the corpus "
    "side never shuffles), and reads full vectors only for the top-20 "
    "exact re-rank. The ANN mirror of dedup_signature_store_probe: "
    "query cost scales with batch x probed-cell occupancy, independent "
    "of corpus size, and the index grows by parquet appends into the "
    "same cell partitions. Oracle retrains/re-encodes everything from "
    "embeddings, so any store round-trip defect hash-mismatches.",
    oracle=_store_oracle(),
)
def similarity_ann_store_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _ann_store_fixture(spark, sf_dir)
    coarse = spark.read.parquet(os.path.join(root, "coarse"))
    books = spark.read.parquet(os.path.join(root, "codebooks"))
    coded = spark.read.parquet(os.path.join(root, "coded"))
    vectors = spark.read.parquet(os.path.join(root, "vectors"))

    qv = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % _FROZEN_MOD == _BATCH_RES)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec"))
    )
    qcells = _cell_assign(
        qv.select("query_id", F.col("q_vec").alias("embedding")),
        coarse,
        "query_id",
        _N_PROBE,
    )

    sub_structs = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.slice("q_vec", s * _SUB + 1, _SUB).alias("sub_emb"),
            )
            for s in range(_M)
        ]
    )
    adc = (
        qv.select("query_id", F.explode(sub_structs).alias("x"))
        .select("query_id", "x.s", F.col("x.sub_emb").alias("q_sub"))
        .join(F.broadcast(books), "s")
        .select(
            "query_id",
            "s",
            "code",
            dot(F.col("q_sub"), F.col("cent")).alias("d"),
        )
    )

    # Cell-pruned pairs from the on-disk index, then one broadcast ADC
    # lookup join per subspace (each table is |batch| x n_codes rows) —
    # the code table itself never shuffles and never reads vectors.
    pair = qcells.join(coded, "cell_id")
    for s in range(_M):
        adc_s = adc.filter(F.col("s") == s).select(
            "query_id", F.col("code").alias(f"code_{s}"), F.col("d").alias(f"d_{s}")
        )
        pair = pair.join(F.broadcast(adc_s), ["query_id", f"code_{s}"])
    approx = F.col("d_0")
    for s in range(1, _M):
        approx = approx + F.col(f"d_{s}")
    wc = Window.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("neighbor_id"))
    cand = (
        pair.select("query_id", "neighbor_id", approx.alias("approx"))
        .withColumn("cr", F.row_number().over(wc))
        .filter(F.col("cr") <= _CAND)
        .select("query_id", "neighbor_id")
    )
    return rerank_exact_topk(
        cand, qv, vectors.select("neighbor_id", "c_vec"), _K
    )
