"""Persisted MinHash signature store + incremental new-batch probe.

The operational shape of dedup at 100 TB is NOT "re-pair the corpus every
crawl" — it is an append-only LSH band index materialized on disk
(partitioned by band_id, at real scale additionally bucketed by band_key)
plus the per-doc shingle sets needed for exact verification. Each incoming
batch computes its own signatures, joins its band rows against the frozen
index, and exact-verifies only the candidates — O(batch x bucket) work,
independent of corpus size, with the store growing by plain parquet
appends after each admitted batch.

``dedup_incremental_minhash`` (queries/dedup.py) proves the asymmetric
band-join math with both sides computed inline; this module materializes
the frozen side to a fingerprint-keyed parquet fixture
(``sources/fixtures.py``) and runs the probe against the ON-DISK store, so
the driver's green hash covers the store round-trip (schema, partition
layout, band-key encoding) end-to-end. The DuckDB oracle recomputes the
identical math from ``documents`` directly — a store written or read
wrongly (dropped partition, re-typed band_id, truncated band_key)
hash-mismatches.

Reference scope: the reference (uwe-uffuchs/formula-1) has no dedup at
all; this is engine-native extension surface (SURVEY.md §7.1(7)),
round-10 VERDICT "next round" item 6a.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from formula_1_spark.operators.dedup import (
    MINHASH_P,
    lsh_band_rows,
    minhash_signatures,
)
from formula_1_spark.queries.dedup import (
    _MINHASH_MINS,
    _SHINGLES_CTE,
    _SIG_ARRAY,
    _shared_relations,
)
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.fixtures import building_dir, fixture_root, publish

_K, _BANDS, _R = 32, 8, 4
_THRESHOLD = 0.5
# Frozen corpus = 80% of doc_ids; the incoming "crawl" is the rest. The
# split is a pure doc_id function so the oracle replays it exactly.
_FROZEN_MOD, _FROZEN_LT = 10, 8

# Fixture kind folds every algorithm parameter in so that editing any of
# them self-invalidates the on-disk index instead of silently serving a
# stale store built under the old parameters.
_STORE_KIND = (
    f"minhash_store_k{_K}b{_BANDS}t{int(_THRESHOLD * 100)}"
    f"f{_FROZEN_MOD}-{_FROZEN_LT}_v1"
)


def _store_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per testdata fingerprint) the frozen-corpus signature
    store: band rows partitioned by band_id + exact-verify shingle sets.

    At 100 TB both relations are append-only lake tables: a batch that
    passes admission appends its band rows (into the same band_id
    partitions) and shingle sets; nothing is ever rewritten. Partitioning
    by band_id keeps any single probe's shuffle bounded to the bands it
    actually touches and lets a band-at-a-time compaction job run without
    touching the rest of the index."""
    root = fixture_root(_STORE_KIND, sf_dir, "documents")
    if not os.path.isdir(root):
        scratch = building_dir(root)
        frozen_sh = _shared_relations(spark, sf_dir)["sh"].filter(
            F.col("doc_id") % _FROZEN_MOD < _FROZEN_LT
        )
        _batch_bands(frozen_sh).write.mode("overwrite").partitionBy("band_id").parquet(
            os.path.join(scratch, "bands")
        )
        frozen_sh.select("doc_id", "sh", F.size("sh").alias("n_sh")).write.mode(
            "overwrite"
        ).parquet(os.path.join(scratch, "shingles"))
        publish(scratch, root)
    return root


@register(
    "dedup_signature_store_probe",
    ops="EXT-dedup-incremental,EXT-signature-store,S6,S7,J4,W1",
    doc="Incremental cross-snapshot dedup against a PERSISTED MinHash "
    "signature store: the frozen 80% of documents is materialized to a "
    "parquet band index (partitioned by band_id) plus shingle sets; the "
    "incoming 20% batch computes its own band rows in memory, joins them "
    "against the on-disk index, exact-Jaccard-verifies candidates "
    "(>= 0.5) against the stored shingle sets, and reports one "
    "disposition row per duplicate-of-corpus batch doc (match count, "
    "best frozen match by (jaccard DESC, doc_id)). Candidate work is "
    "O(batch x bucket) — corpus-size independent; the oracle recomputes "
    "everything from documents, so a store round-trip defect "
    "hash-mismatches. Builds on operators/dedup.py "
    "minhash_lsh_cross_pairs (VERDICT r9 item 6a).",
    oracle=f"""
WITH {_SHINGLES_CTE},
base AS (
  SELECT doc_id, shingle % {MINHASH_P} AS x
  FROM (SELECT doc_id, unnest(sh) AS shingle FROM shf)
),
sigagg AS (
  SELECT doc_id,
{_MINHASH_MINS}
  FROM base GROUP BY doc_id
),
sigs AS (SELECT doc_id, {_SIG_ARRAY} AS sigs FROM sigagg),
bands AS (
  SELECT doc_id, j.j AS band_id,
         array_to_string(list_slice(sigs, j.j * {_R} + 1, j.j * {_R} + {_R}), ',')
           AS band_key
  FROM sigs, (SELECT unnest(range(0, {_BANDS})) AS j) j
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x
  JOIN bands y ON x.band_id = y.band_id AND x.band_key = y.band_key
  WHERE x.doc_id % {_FROZEN_MOD} < {_FROZEN_LT}
    AND y.doc_id % {_FROZEN_MOD} >= {_FROZEN_LT}
),
verified AS (
  SELECT c.a, c.b,
         len(list_intersect(sa.sh, sb.sh))
           / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh))) AS jaccard
  FROM cand c
  JOIN shf sa ON sa.doc_id = c.a
  JOIN shf sb ON sb.doc_id = c.b
),
hits AS (SELECT a, b, jaccard FROM verified WHERE jaccard >= {_THRESHOLD}),
sel AS (
  SELECT b, a, jaccard,
         ROW_NUMBER() OVER (PARTITION BY b ORDER BY jaccard DESC, a) AS rn,
         COUNT(1) OVER (PARTITION BY b) AS n,
         MAX(jaccard) OVER (PARTITION BY b) AS mx
  FROM hits
)
SELECT b AS new_doc_id,
       CAST(n AS BIGINT) AS n_base_matches,
       a AS best_base_id,
       CAST(FLOOR(mx * 1000000) AS BIGINT) AS best_jaccard_ppm
FROM sel WHERE rn = 1
""",
)
def dedup_signature_store_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _store_fixture(spark, sf_dir)
    batch_sh = _shared_relations(spark, sf_dir)["sh"].filter(
        F.col("doc_id") % _FROZEN_MOD >= _FROZEN_LT
    )
    best = _best_store_match(_store_hits(root, spark, batch_sh))
    return best.select(
        F.col("b").alias("new_doc_id"),
        F.col("n").alias("n_base_matches"),
        F.col("a").alias("best_base_id"),
        F.floor(F.col("mx") * 1000000).cast("bigint").alias("best_jaccard_ppm"),
    )


# ---------------------------------------------------------------------------
# Store APPEND lifecycle: admit batch1, grow the index, probe with batch2
# ---------------------------------------------------------------------------

_B1, _B2 = 8, 9  # doc_id % 10 cohorts: frozen < 8, batch1 == 8, batch2 == 9


def _batch_bands(sh: DataFrame) -> DataFrame:
    return lsh_band_rows(
        minhash_signatures(sh, k=_K), bands=_BANDS, r=_K // _BANDS
    )


def _store_hits(store_root: str, spark: SparkSession, batch_sh: DataFrame) -> DataFrame:
    """(a = store doc, b = batch doc, jaccard) pairs >= threshold of a
    batch against an on-disk store — the shared probe core.

    Join strategy: the batch's band rows are tiny relative to the store,
    so THEY broadcast and the store-side scan never shuffles (at 100 TB
    that's the whole point: per-probe cost is a scan of the touched
    band partitions, or a bucket-pruned lookup once the store is
    additionally bucketed by band_key). The verify joins the candidate
    pairs back to the shingle sets: the BATCH arrays broadcast, but the
    STORE arrays are corpus-sized, so that side carries no hint — at
    fixture scale AQE broadcasts it, at store scale it becomes a shuffle
    join on the band-bounded candidate keys (or swap to the
    posting-count formulation — see operators/dedup._verify_jaccard)."""
    store_bands = spark.read.parquet(os.path.join(store_root, "bands")).select(
        F.col("doc_id").alias("a"), "band_id", "band_key"
    )
    store_sh = spark.read.parquet(os.path.join(store_root, "shingles"))
    batch_bands = _batch_bands(batch_sh).select(
        F.col("doc_id").alias("b"), "band_id", "band_key"
    )
    cand = (
        store_bands.join(F.broadcast(batch_bands), ["band_id", "band_key"])
        .select("a", "b")
        .distinct()
    )
    a_side = store_sh.select(
        F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"), F.col("n_sh").alias("na")
    )
    b_side = batch_sh.select(
        F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"), F.size("sh").alias("nb")
    )
    return (
        cand.join(a_side, "a")
        .join(F.broadcast(b_side), "b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard", F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
        )
        .filter(F.col("jaccard") >= _THRESHOLD)
        .select("a", "b", "jaccard")
    )


def _best_store_match(hits: DataFrame) -> DataFrame:
    """One row per duplicate batch doc: (b, a=best match, n, mx) with the
    best store match by (jaccard DESC, doc_id ASC). The window partitions
    on the batch doc — per-partition width is the candidate fan-in,
    band-bounded."""
    w = Window.partitionBy("b")
    sel = (
        hits.withColumn(
            "rn", F.row_number().over(w.orderBy(F.desc("jaccard"), F.asc("a")))
        )
        .withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("mx", F.max("jaccard").over(w))
    )
    return sel.filter(F.col("rn") == 1)


def _grown_store_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Base store + batch1's ADMITTED docs physically APPENDED: parquet
    `mode("append")` into the same band_id partition layout — the store
    only ever grows by appends, exactly the 100 TB operational contract
    (no rewrite, no compaction required for correctness; a band-at-a-time
    compactor can bin-pack small files later without changing content)."""
    import shutil

    root = fixture_root("minhash_store_grown_v1", sf_dir, "documents")
    if not os.path.isdir(root):
        base = _store_fixture(spark, sf_dir)
        scratch = building_dir(root)
        shutil.copytree(base, scratch)
        b1_sh = _shared_relations(spark, sf_dir)["sh"].filter(
            F.col("doc_id") % _FROZEN_MOD == _B1
        )
        caught = _store_hits(base, spark, b1_sh).select("b").distinct()
        admitted_sh = b1_sh.join(
            caught, b1_sh["doc_id"] == caught["b"], "left_anti"
        )
        _batch_bands(admitted_sh).write.mode("append").partitionBy(
            "band_id"
        ).parquet(os.path.join(scratch, "bands"))
        admitted_sh.select("doc_id", "sh", F.size("sh").alias("n_sh")).write.mode(
            "append"
        ).parquet(os.path.join(scratch, "shingles"))
        publish(scratch, root)
    return root


@register(
    "dedup_signature_store_append_probe",
    ops="EXT-dedup-incremental,EXT-signature-store,S6,S7,J4,W1 (append lifecycle)",
    doc="Signature-store APPEND lifecycle: batch1 (doc_id%10==8) probes "
    "the frozen store, its non-duplicate docs are ADMITTED and their "
    "band rows / shingle sets physically appended (parquet mode-append "
    "into the same band_id partitions — the store only grows); batch2 "
    "(doc_id%10==9) then probes the GROWN store, and each duplicate's "
    "disposition says whether its best match is an original frozen doc "
    "or a batch1 admission — the cross-SNAPSHOT catch an append-only "
    "index exists to provide. Oracle recomputes the full two-stage "
    "admission from documents, so a wrong append (lost partition, "
    "duplicated rows, missed admission) hash-mismatches.",
    oracle=f"""
WITH {_SHINGLES_CTE},
base AS (
  SELECT doc_id, shingle % {MINHASH_P} AS x
  FROM (SELECT doc_id, unnest(sh) AS shingle FROM shf)
),
sigagg AS (
  SELECT doc_id,
{_MINHASH_MINS}
  FROM base GROUP BY doc_id
),
sigs AS (SELECT doc_id, {_SIG_ARRAY} AS sigs FROM sigagg),
bands AS (
  SELECT doc_id, j.j AS band_id,
         array_to_string(list_slice(sigs, j.j * {_R} + 1, j.j * {_R} + {_R}), ',')
           AS band_key
  FROM sigs, (SELECT unnest(range(0, {_BANDS})) AS j) j
),
froz_hit AS (
  SELECT DISTINCT y.doc_id
  FROM bands x
  JOIN bands y ON x.band_id = y.band_id AND x.band_key = y.band_key
  JOIN shf sa ON sa.doc_id = x.doc_id
  JOIN shf sb ON sb.doc_id = y.doc_id
  WHERE x.doc_id % {_FROZEN_MOD} < {_FROZEN_LT}
    AND y.doc_id % {_FROZEN_MOD} = {_B1}
    AND len(list_intersect(sa.sh, sb.sh))
        / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh)))
        >= {_THRESHOLD}
),
store_docs AS (
  SELECT doc_id FROM shf WHERE doc_id % {_FROZEN_MOD} < {_FROZEN_LT}
  UNION ALL
  SELECT doc_id FROM shf
  WHERE doc_id % {_FROZEN_MOD} = {_B1}
    AND doc_id NOT IN (SELECT doc_id FROM froz_hit)
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x
  JOIN store_docs s ON s.doc_id = x.doc_id
  JOIN bands y ON x.band_id = y.band_id AND x.band_key = y.band_key
  WHERE y.doc_id % {_FROZEN_MOD} = {_B2}
),
verified AS (
  SELECT c.a, c.b,
         len(list_intersect(sa.sh, sb.sh))
           / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh))) AS jaccard
  FROM cand c
  JOIN shf sa ON sa.doc_id = c.a
  JOIN shf sb ON sb.doc_id = c.b
),
hits AS (SELECT a, b, jaccard FROM verified WHERE jaccard >= {_THRESHOLD}),
sel AS (
  SELECT b, a, jaccard,
         ROW_NUMBER() OVER (PARTITION BY b ORDER BY jaccard DESC, a) AS rn,
         COUNT(1) OVER (PARTITION BY b) AS n,
         MAX(jaccard) OVER (PARTITION BY b) AS mx
  FROM hits
)
SELECT b AS new_doc_id,
       CAST(n AS BIGINT) AS n_store_matches,
       a AS best_store_id,
       CASE WHEN a % {_FROZEN_MOD} = {_B1} THEN 'batch1' ELSE 'frozen' END
         AS best_cohort,
       CAST(FLOOR(mx * 1000000) AS BIGINT) AS best_jaccard_ppm
FROM sel WHERE rn = 1
""",
)
def dedup_signature_store_append_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    root = _grown_store_fixture(spark, sf_dir)
    b2_sh = _shared_relations(spark, sf_dir)["sh"].filter(
        F.col("doc_id") % _FROZEN_MOD == _B2
    )
    best = _best_store_match(_store_hits(root, spark, b2_sh))
    return best.select(
        F.col("b").alias("new_doc_id"),
        F.col("n").alias("n_store_matches"),
        F.col("a").alias("best_store_id"),
        F.when(F.col("a") % _FROZEN_MOD == _B1, F.lit("batch1"))
        .otherwise(F.lit("frozen"))
        .alias("best_cohort"),
        F.floor(F.col("mx") * 1000000).cast("bigint").alias("best_jaccard_ppm"),
    )
