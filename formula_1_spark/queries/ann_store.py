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
# The appended batch for the grown-index lifecycle (encoded with the
# frozen quantizers, appended into the same cell partitions).
_APPEND_RES = 8

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

        _long, books, _sub_structs, _w = pq_subspace_model(
            frozen, m=_M, n_codes=_CODES, learn_iters=_ITERS, dims=_DIMS
        )
        books = books.select("s", F.col("cell_id").alias("code"), "cent")
        books.write.mode("overwrite").parquet(os.path.join(scratch, "codebooks"))

        coded, vectors = _encode(
            frozen.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
            coarse,
            books,
        )
        coded.write.mode("overwrite").partitionBy("cell_id").parquet(
            os.path.join(scratch, "coded")
        )
        vectors.write.mode("overwrite").partitionBy("cell_id").parquet(
            os.path.join(scratch, "vectors")
        )
        publish(scratch, root)
    return root


def _sub_split(vec_col: str):
    return F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.slice(vec_col, s * _SUB + 1, _SUB).alias("sub_emb"),
            )
            for s in range(_M)
        ]
    )


def _encode(
    batch: DataFrame, coarse: DataFrame, books: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Encode ``(neighbor_id, embedding)`` rows with EXISTING quantizers
    (no retraining — how a persisted index admits new vectors): top-1 IVF
    cell by cosine, one PQ code per subspace (code_cos DESC, code ASC
    tie-break — identical to training-time assignment). Returns
    ``(coded, vectors)``, both carrying cell_id for the partition write.
    Encoding the training corpus with its own final codebooks equals the
    final training assignment, so the build path shares this helper."""
    cells = _cell_assign(batch, coarse, "neighbor_id", 1)
    w = Window.partitionBy("s", "neighbor_id").orderBy(
        F.desc("code_cos"), F.asc("code")
    )
    codes_wide = (
        batch.select("neighbor_id", F.explode(_sub_split("embedding")).alias("x"))
        .select("neighbor_id", "x.s", F.col("x.sub_emb").alias("sub_emb"))
        .join(F.broadcast(books), "s")
        .withColumn("code_cos", cosine(F.col("sub_emb"), F.col("cent")))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .groupBy("neighbor_id")
        .agg(
            *[
                F.max(F.when(F.col("s") == s, F.col("code")))
                .cast("int")
                .alias(f"code_{s}")
                for s in range(_M)
            ]
        )
    )
    coded = codes_wide.join(cells, "neighbor_id")
    vectors = batch.select(
        "neighbor_id", F.col("embedding").alias("c_vec")
    ).join(cells, "neighbor_id")
    return coded, vectors


def _store_oracle(corpus_where: str | None = None, cohort: bool = False) -> str:
    """DuckDB replay of the full persisted-index pipeline from the raw
    ``embeddings`` table: frozen split, coarse k-means, per-subspace PQ
    codebook training + encoding, query cell probing, ADC over the
    cell-pruned pairs, exact re-rank — bit-for-bit (floor-quantized
    means, fixed-order float sums, cell_id/neighbor_id tie-breaks).

    ``corpus_where`` widens the ENCODED population beyond the training
    corpus (the append lifecycle: new vectors coded with the FROZEN
    quantizers — training CTEs always read ``frozen``); ``cohort`` adds
    the frozen/batch1 provenance column the append probe reports."""
    corpus_where = corpus_where or f"vec_id % {_FROZEN_MOD} < {_FROZEN_LT}"
    parts = [
        f"""frozen AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id % {_FROZEN_MOD} < {_FROZEN_LT}
)""",
        f"""corpus AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings
  WHERE {corpus_where}
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
    FROM corpus e, cqcent c) WHERE r = 1
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
            f"t{s}sub AS MATERIALIZED (SELECT vec_id, embedding[{lo}:{hi}]"
            f" AS embedding FROM frozen)"
        )
        parts.append(
            f"sub{s} AS MATERIALIZED (SELECT vec_id, embedding[{lo}:{hi}]"
            f" AS embedding FROM corpus)"
        )
        parts.append(_kmeans_ctes_src(f"s{s}", f"t{s}sub", _CODES, _ITERS, _SUB))
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
    cohort_col = (
        f""",
       CASE WHEN neighbor_id % {_FROZEN_MOD} = {_APPEND_RES}
            THEN 'batch1' ELSE 'frozen' END AS cohort"""
        if cohort
        else ""
    )
    return (
        "WITH " + ",\n".join(parts) + f""",
scored AS (
  SELECT c.query_id, c.neighbor_id, {final_cos} AS cos
  FROM cand c
  JOIN qpanel q USING (query_id)
  JOIN corpus x ON x.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cos, CAST(r AS INT) AS rank{cohort_col}
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
    return _probe_store(spark, _ann_store_fixture(spark, sf_dir), sf_dir)


def _probe_store(
    spark: SparkSession, root: str, sf_dir: str, cohort: bool = False
) -> DataFrame:
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

    adc = (
        qv.select("query_id", F.explode(_sub_split("q_vec")).alias("x"))
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
    for s_ in range(_M):
        adc_s = adc.filter(F.col("s") == s_).select(
            "query_id", F.col("code").alias(f"code_{s_}"), F.col("d").alias(f"d_{s_}")
        )
        pair = pair.join(F.broadcast(adc_s), ["query_id", f"code_{s_}"])
    approx = F.col("d_0")
    for s_ in range(1, _M):
        approx = approx + F.col(f"d_{s_}")
    wc = Window.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("neighbor_id"))
    cand = (
        pair.select("query_id", "neighbor_id", approx.alias("approx"))
        .withColumn("cr", F.row_number().over(wc))
        .filter(F.col("cr") <= _CAND)
        .select("query_id", "neighbor_id")
    )
    out = rerank_exact_topk(cand, qv, vectors.select("neighbor_id", "c_vec"), _K)
    if cohort:
        out = out.withColumn(
            "cohort",
            F.when(
                F.col("neighbor_id") % _FROZEN_MOD == _APPEND_RES, "batch1"
            ).otherwise("frozen"),
        )
    return out


def _grown_ann_store_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Base index + the %10==8 batch physically APPENDED: each new vector
    is encoded with the FROZEN quantizers (centroids/codebooks untouched —
    retraining would invalidate every stored code) and its code/vector
    rows land via parquet ``mode("append")`` in the same cell_id
    partition layout. The store only ever grows by appends — the 100 TB
    operational contract (a cell-at-a-time compactor can bin-pack small
    files later without changing content)."""
    import shutil

    root = fixture_root(_STORE_KIND.replace("_v1", "_grown_v1"), sf_dir, "embeddings")
    if not os.path.isdir(root):
        base = _ann_store_fixture(spark, sf_dir)
        scratch = building_dir(root)
        shutil.copytree(base, scratch)
        batch1 = (
            load_table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") % _FROZEN_MOD == _APPEND_RES)
            .select(F.col("vec_id").alias("neighbor_id"), "embedding")
        )
        coarse = spark.read.parquet(os.path.join(base, "coarse"))
        books = spark.read.parquet(os.path.join(base, "codebooks"))
        coded, vectors = _encode(batch1, coarse, books)
        coded.write.mode("append").partitionBy("cell_id").parquet(
            os.path.join(scratch, "coded")
        )
        vectors.write.mode("append").partitionBy("cell_id").parquet(
            os.path.join(scratch, "vectors")
        )
        publish(scratch, root)
    return root


@register(
    "similarity_ann_store_append_probe",
    ops="EXT-sim-ivfpq,EXT-ann-store,S6,S7,J4,W1 (append lifecycle)",
    doc="ANN index-store APPEND lifecycle: the %10==8 batch is encoded "
    "with the FROZEN quantizers (no retraining — retraining would "
    "invalidate every stored code) and its code/vector rows are "
    "physically appended (parquet mode-append) into the same cell_id "
    "partitions; the %10==9 batch then probes the GROWN index and each "
    "hit is labeled with its cohort (original frozen doc vs batch1 "
    "admission) — the cross-snapshot recall an append-only index exists "
    "to provide. Oracle re-trains on frozen only, re-encodes the grown "
    "corpus and replays the probe, so a wrong append (lost partition, "
    "duplicated rows, codes from retrained books) hash-mismatches.",
    oracle=_store_oracle(
        corpus_where=f"vec_id % {_FROZEN_MOD} <= {_FROZEN_LT}", cohort=True
    ),
)
def similarity_ann_store_append_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _probe_store(
        spark, _grown_ann_store_fixture(spark, sf_dir), sf_dir, cohort=True
    )


def _drift_oracle() -> str:
    """Recompute both populations' cell assignments from ``embeddings``
    (training on frozen only) and aggregate per-cell occupancy before /
    after the append — the split/compaction planning signal."""
    parts = [
        f"""frozen AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id % {_FROZEN_MOD} < {_FROZEN_LT}
)""",
        f"""corpus AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id % {_FROZEN_MOD} <= {_FROZEN_LT}
)""",
        _kmeans_ctes_src("cq", "frozen", _N_CELLS, _ITERS, _DIMS),
        f"""assign AS (
  SELECT vec_id, cell_id FROM (
    SELECT e.vec_id, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_COS.format(a="e.embedding", b="c.cent")} DESC,
                      c.cell_id ASC) AS r
    FROM corpus e, cqcent c) WHERE r = 1
)""",
        f"""occ AS (
  SELECT cell_id,
         CAST(COUNT(CASE WHEN vec_id % {_FROZEN_MOD} < {_FROZEN_LT}
                         THEN 1 END) AS BIGINT) AS n_frozen,
         CAST(COUNT(1) AS BIGINT) AS n_after
  FROM assign GROUP BY cell_id
)""",
        f"""tot AS (
  SELECT CAST(((SUM(n_after) + {_N_CELLS} - 1) // {_N_CELLS}) * 3 // 2
              AS BIGINT) AS target
  FROM occ
)""",
    ]
    return (
        "WITH " + ",\n".join(parts) + """
SELECT o.cell_id, o.n_frozen, o.n_after,
       CASE WHEN o.n_frozen = 0 THEN CAST(NULL AS BIGINT)
            ELSE CAST((o.n_after - o.n_frozen) * 1000000 // o.n_frozen
                      AS BIGINT) END AS growth_ppm,
       CAST(CASE WHEN o.n_after > t.target THEN 1 ELSE 0 END AS INT)
         AS over_target
FROM occ o, tot t
ORDER BY o.cell_id
"""
    )


@register(
    "ann_store_cell_drift",
    ops="EXT-ann-store,EXT-lake-maintenance,A1,A3 (index maintenance signal)",
    doc="Persisted-index MAINTENANCE audit: per-IVF-cell occupancy of the "
    "on-disk code table before vs after the append batch, growth in ppm, "
    "and an over-target flag at 1.5x the balanced share (ceil division, "
    "exact integers) — the signal that schedules cell splits and "
    "small-file compaction on a 100 TB index. Reads ONLY the partition "
    "column of both stores (count per cell_id — no codes, no vectors "
    "deserialized). Oracle recomputes both populations' assignments from "
    "embeddings, so a lost/duplicated append partition mismatches.",
    oracle=_drift_oracle(),
)
def ann_store_cell_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = spark.read.parquet(
        os.path.join(_ann_store_fixture(spark, sf_dir), "coded")
    )
    grown = spark.read.parquet(
        os.path.join(_grown_ann_store_fixture(spark, sf_dir), "coded")
    )
    # LEFT join from the grown side: a cell can gain its FIRST members
    # from the append batch (frozen-trained centroid, no frozen member),
    # so n_frozen coalesces to 0 and growth_ppm is NULL there.
    occ = grown.groupBy("cell_id").agg(F.count(F.lit(1)).alias("n_after")).join(
        base.groupBy("cell_id").agg(F.count(F.lit(1)).alias("n_frozen")),
        "cell_id",
        "left",
    ).select(
        "cell_id",
        F.coalesce("n_frozen", F.lit(0)).alias("n_frozen"),
        "n_after",
    )
    tot = occ.agg(
        F.expr(
            f"CAST((sum(n_after) + {_N_CELLS} - 1) div {_N_CELLS} * 3 div 2"
            " AS BIGINT)"
        ).alias("target")
    )
    return (
        occ.join(F.broadcast(tot))
        .select(
            "cell_id",
            "n_frozen",
            "n_after",
            F.expr(
                "CASE WHEN n_frozen = 0 THEN CAST(NULL AS BIGINT)"
                " ELSE CAST((n_after - n_frozen) * 1000000 div n_frozen"
                " AS BIGINT) END"
            ).alias("growth_ppm"),
            (F.col("n_after") > F.col("target")).cast("int").alias("over_target"),
        )
        .orderBy("cell_id")
    )


# ---------------------------------------------------------------------------
# Cell split planning (index maintenance: drift -> split plan)
# ---------------------------------------------------------------------------

_SPLIT_TOP = 2  # plan splits for the 2 most-occupied cells
_SPLIT_K = 2  # binary split


def _split_oracle() -> str:
    """Within-cell grouped 2-means replay: pick the two most-occupied
    cells of the GROWN index (occupancy DESC, cell_id ASC), init each
    cell's sub-centroids from its two smallest vec_ids, run the same
    floor-quantized deterministic iterations as every k-means here, and
    report the member split — the plan a 100 TB index maintainer executes
    as a one-cell rewrite."""
    cos = _COS.format(a="e.embedding", b="c.cent")
    parts = [
        f"""frozen AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id % {_FROZEN_MOD} < {_FROZEN_LT}
)""",
        f"""corpus AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id % {_FROZEN_MOD} <= {_FROZEN_LT}
)""",
        _kmeans_ctes_src("cq", "frozen", _N_CELLS, _ITERS, _DIMS),
        f"""assign AS (
  SELECT vec_id, cell_id FROM (
    SELECT e.vec_id, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_COS.format(a="e.embedding", b="c.cent")} DESC,
                      c.cell_id ASC) AS r
    FROM corpus e, cqcent c) WHERE r = 1
)""",
        f"""hot AS (
  SELECT cell_id FROM (
    SELECT cell_id, COUNT(1) AS n FROM assign GROUP BY cell_id)
  ORDER BY n DESC, cell_id ASC LIMIT {_SPLIT_TOP}
)""",
        """members AS MATERIALIZED (
  SELECT a.cell_id, e.vec_id, e.embedding
  FROM assign a JOIN corpus e USING (vec_id) JOIN hot USING (cell_id)
)""",
        f"""g0 AS (
  SELECT cell_id, CAST(rn - 1 AS BIGINT) AS sub_cell,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY cell_id
                    ORDER BY vec_id) AS rn FROM members)
  WHERE rn <= {_SPLIT_K}
)""",
    ]
    for t in range(1, _ITERS + 1):
        parts.append(f"""ga{t} AS (
  SELECT cell_id, vec_id, embedding, sub_cell FROM (
    SELECT e.cell_id, e.vec_id, e.embedding, c.sub_cell,
           ROW_NUMBER() OVER (PARTITION BY e.cell_id, e.vec_id
             ORDER BY {cos} DESC, c.sub_cell ASC) AS r
    FROM members e JOIN g{t - 1} c USING (cell_id)) WHERE r = 1
)""")
        parts.append(f"""gm{t} AS (
  SELECT cell_id, sub_cell, d.dim AS dim,
         CAST(SUM(CAST(FLOOR(CAST(a.embedding[d.dim + 1] AS DOUBLE)
                             * 1000000.0) AS BIGINT)) AS DOUBLE)
           / (1000000.0 * COUNT(*)) AS comp
  FROM ga{t} a, (SELECT unnest(range(0, {_DIMS})) AS dim) d
  GROUP BY cell_id, sub_cell, d.dim
)""")
        parts.append(
            f"g{t} AS (SELECT cell_id, sub_cell, list(comp ORDER BY dim)"
            f" AS cent FROM gm{t} GROUP BY cell_id, sub_cell)"
        )
    return (
        "WITH " + ",\n".join(parts) + f""",
sub AS (
  SELECT cell_id, sub_cell, CAST(COUNT(1) AS BIGINT) AS n_members
  FROM ga{_ITERS} GROUP BY cell_id, sub_cell
)
SELECT cell_id, sub_cell, n_members,
       CAST(n_members * 1000000 //
            SUM(n_members) OVER (PARTITION BY cell_id) AS BIGINT)
         AS share_ppm
FROM sub
ORDER BY cell_id, sub_cell
"""
    )


@register(
    "ann_store_split_plan",
    ops="EXT-ann-store,EXT-lake-maintenance,A1,W1 (cell split planning)",
    doc="Index-maintenance SPLIT PLAN for the persisted IVF store: take "
    "the 2 most-occupied cells of the grown index (occupancy DESC, "
    "cell_id tie-break), run a deterministic within-cell 2-means (init = "
    "the cell's two smallest vec_ids, floor-quantized exact means — the "
    "same reproducible k-means as every quantizer here, batched per cell "
    "in ONE keyed DAG, sub-centroids broadcast each iteration), and "
    "report each cell's member split with share_ppm — the plan a "
    "maintainer executes as a one-cell rewrite (everything outside the "
    "hot cells untouched, exactly like a band-at-a-time MinHash-store "
    "compaction). Oracle replays assignment, hot-cell choice and the "
    "grouped 2-means bit-for-bit.",
    oracle=_split_oracle(),
)
def ann_store_split_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.similarity import KMEANS_SCALE

    root = _grown_ann_store_fixture(spark, sf_dir)
    vectors = spark.read.parquet(os.path.join(root, "vectors"))

    occ = vectors.groupBy("cell_id").agg(F.count(F.lit(1)).alias("n"))
    w_hot = Window.orderBy(F.desc("n"), F.asc("cell_id"))
    # Window over the <= n_cells occupancy rows only — never data rows.
    hot = (
        occ.withColumn("r", F.row_number().over(w_hot))
        .filter(F.col("r") <= _SPLIT_TOP)
        .select("cell_id")
    )
    members = vectors.join(F.broadcast(hot), "cell_id").select(
        "cell_id", F.col("neighbor_id").alias("vec_id"),
        F.col("c_vec").alias("embedding"),
    )

    w_init = Window.partitionBy("cell_id").orderBy("vec_id")
    cents = (
        members.withColumn("rn", F.row_number().over(w_init))
        .filter(F.col("rn") <= _SPLIT_K)
        .select(
            "cell_id",
            (F.col("rn") - 1).cast("bigint").alias("sub_cell"),
            F.transform("embedding", lambda x: x.cast("double")).alias("cent"),
        )
    )
    w_assign = Window.partitionBy("cell_id", "vec_id").orderBy(
        F.desc("sub_cos"), F.asc("sub_cell")
    )
    assign = None
    for _ in range(_ITERS):
        assign = (
            members.join(F.broadcast(cents), "cell_id")
            .withColumn("sub_cos", cosine(F.col("embedding"), F.col("cent")))
            .withColumn("r", F.row_number().over(w_assign))
            .filter(F.col("r") == 1)
            .select("cell_id", "vec_id", "embedding", "sub_cell")
        )
        comp = (
            assign.select(
                "cell_id", "sub_cell",
                F.posexplode("embedding").alias("dim", "val"),
            )
            .select(
                "cell_id", "sub_cell", "dim",
                F.floor(F.col("val").cast("double") * F.lit(KMEANS_SCALE)).alias("q"),
            )
            .groupBy("cell_id", "sub_cell", "dim")
            .agg(
                (
                    F.sum("q").cast("double")
                    / (F.lit(KMEANS_SCALE) * F.count(F.lit(1)))
                ).alias("comp")
            )
        )
        cents = comp.groupBy("cell_id", "sub_cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "comp"))),
                lambda st: st["comp"],
            ).alias("cent")
        )
    sub = assign.groupBy("cell_id", "sub_cell").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return sub.select(
        "cell_id",
        "sub_cell",
        "n_members",
        F.expr(
            "CAST(n_members * 1000000 div "
            "(sum(n_members) OVER (PARTITION BY cell_id)) AS BIGINT)"
        ).alias("share_ppm"),
    ).orderBy("cell_id", "sub_cell")


# ---------------------------------------------------------------------------
# Index staleness audit (quantizer distortion by cohort -> retrain signal)
# ---------------------------------------------------------------------------


def _staleness_oracle() -> str:
    """Replay encoding of the grown corpus with the frozen-trained
    codebooks, reconstruct each vector from its codes (subspace centroid
    concat), and aggregate 1 - cos(x, recon) per cohort on the 1e-9
    integer grid (order-independent exact means)."""
    parts = [
        f"""frozen AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id % {_FROZEN_MOD} < {_FROZEN_LT}
)""",
        f"""corpus AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id % {_FROZEN_MOD} <= {_FROZEN_LT}
)""",
    ]
    for s in range(_M):
        lo, hi = s * _SUB + 1, (s + 1) * _SUB
        parts.append(
            f"t{s}sub AS MATERIALIZED (SELECT vec_id, embedding[{lo}:{hi}]"
            f" AS embedding FROM frozen)"
        )
        parts.append(
            f"sub{s} AS MATERIALIZED (SELECT vec_id, embedding[{lo}:{hi}]"
            f" AS embedding FROM corpus)"
        )
        parts.append(_kmeans_ctes_src(f"s{s}", f"t{s}sub", _CODES, _ITERS, _SUB))
        cos = _COS.format(a="e.embedding", b="c.cent")
        parts.append(f"""s{s}pick AS (
  SELECT vec_id, cent AS cent_{s} FROM (
    SELECT e.vec_id, c.cent,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {cos} DESC, c.cell_id ASC) AS r
    FROM sub{s} e, s{s}cent c) WHERE r = 1
)""")
    pick_join = "s0pick p0" + "".join(
        f" JOIN s{s}pick p{s} USING (vec_id)" for s in range(1, _M)
    )
    recon = " || ".join(f"p{s}.cent_{s}" for s in range(_M))
    cosr = _COS.format(a="e.embedding", b="r.recon")
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
recon AS (
  SELECT p0.vec_id, {recon} AS recon FROM {pick_join}
),
dist AS (
  SELECT CASE WHEN e.vec_id % {_FROZEN_MOD} = {_APPEND_RES}
              THEN 'batch1' ELSE 'frozen' END AS cohort,
         CAST(FLOOR((1.0 - ({cosr})) * 1000000000.0) AS BIGINT) AS d9
  FROM corpus e JOIN recon r ON r.vec_id = e.vec_id
)
SELECT cohort, CAST(COUNT(1) AS BIGINT) AS n_vectors,
       CAST(CAST(SUM(d9) AS HUGEINT) // (COUNT(1) * 1000) AS BIGINT)
         AS mean_distortion_ppm,
       CAST(MAX(d9) // 1000 AS BIGINT) AS max_distortion_ppm
FROM dist GROUP BY cohort
ORDER BY cohort
"""
    )


@register(
    "ann_store_staleness_audit",
    ops="EXT-ann-store,A1,A3 (quantizer staleness / retrain signal)",
    doc="Index STALENESS audit: reconstruct every vector of the grown "
    "store from its PQ codes (subspace-centroid concat — the codebooks "
    "were trained on the FROZEN corpus only) and aggregate the "
    "reconstruction distortion 1 - cos(x, recon) per cohort on the 1e-9 "
    "integer grid (floor-quantized exact means + max). batch1 distorting "
    "materially worse than frozen is THE retrain/re-index trigger for a "
    "100 TB serving index — drift the append lifecycle creates and this "
    "audit measures. One codes+vectors join per subspace (broadcast "
    "codebooks), one corpus-grain aggregate.",
    oracle=_staleness_oracle(),
)
def ann_store_staleness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _grown_ann_store_fixture(spark, sf_dir)
    books = spark.read.parquet(os.path.join(root, "codebooks"))
    coded = spark.read.parquet(os.path.join(root, "coded"))
    vectors = spark.read.parquet(os.path.join(root, "vectors"))

    recon = coded.select("neighbor_id", *[f"code_{s}" for s in range(_M)])
    for s in range(_M):
        bk = books.filter(F.col("s") == s).select(
            F.col("code").alias(f"code_{s}"), F.col("cent").alias(f"cent_{s}")
        )
        recon = recon.join(F.broadcast(bk), f"code_{s}")
    recon = recon.select(
        "neighbor_id",
        F.concat(*[F.col(f"cent_{s}") for s in range(_M)]).alias("recon"),
    )
    dist = (
        vectors.select("neighbor_id", "c_vec")
        .join(recon, "neighbor_id")
        .select(
            F.when(
                F.col("neighbor_id") % _FROZEN_MOD == _APPEND_RES, "batch1"
            )
            .otherwise("frozen")
            .alias("cohort"),
            F.floor(
                (F.lit(1.0) - cosine(F.col("c_vec"), F.col("recon")))
                * F.lit(1000000000.0)
            )
            .cast("bigint")
            .alias("d9"),
        )
    )
    return (
        dist.groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            # DECIMAL(38) sum: a BIGINT sum of the 1e-9 grid overflows
            # past ~4.6e9 vectors per cohort; decimal `div` is exact floor
            # like DuckDB's HUGEINT `//` (same fix as gini_ppm).
            F.expr(
                "CAST(sum(CAST(d9 AS DECIMAL(38,0)))"
                " div (count(1) * 1000) AS BIGINT)"
            ).alias("mean_distortion_ppm"),
            F.expr("CAST(max(d9) div 1000 AS BIGINT)").alias(
                "max_distortion_ppm"
            ),
        )
        .orderBy("cohort")
    )
