"""Deduplication queries over ``documents`` with full DuckDB oracles.

Even the probabilistic variants (MinHash+LSH, SimHash) are exactly
oracle-checked: the hash family ``int(md5(i || ':' || s)[:15 hex])`` is
computed identically in Spark (``conv(substr(md5(..),1,15),16,10)``) and
DuckDB (``('0x' || substr(md5(..),1,15))::BIGINT``), so candidate sets and
verified pair sets agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.operators.dedup import (
    MINHASH_P,
    containment_pairs_from_shingles,
    exact_dedup,
    jaccard_pairs_from_shingles,
    rare_shingle_candidates,
    minhash_coeffs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles_from_tokens,
    simhash_pairs,
    tokenized,
)
from formula_1_spark.operators.sampling import hash_uniform_sql
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table, table_row_count

# The four doc-dedup queries share the tokenize → shingle → verified-pair
# prefix. Computed once per (session, sf_dir) and persisted: in the
# driver/bench suite each query is invoked independently, and without the
# cache the shingle pipeline re-runs up to 4x (~7s at sf0.1). Values are
# unaffected — the cached relations are exactly what each query built
# inline before.
_SHARED: dict[tuple, dict[str, DataFrame]] = {}


def _shared_relations(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    # Keyed/evicted/budgeted by queries.memo (one ledger for every
    # family memo): a regenerated documents.parquet invalidates the key;
    # superseded same-app entries release the four persist-backed
    # relations via unpersist() while the lazily-added checkpoint-backed
    # members (jaccard_pairs_loose, simhash_sigs, clusters, grams13 —
    # where unpersist() would be a no-op, the r11 ADVICE leak) are
    # released by reference drop to the ContextCleaner.
    from formula_1_spark.queries import memo

    key = memo.file_key(spark, sf_dir, "documents")
    ent = memo.get(_SHARED, key)
    if ent is None:
        docs = load_table(spark, sf_dir, "documents")
        tok = tokenized(docs).persist()
        sh = shingles_from_tokens(tok, n=3).persist()
        cand = rare_shingle_candidates(sh, max_df=50).persist()
        jac = jaccard_pairs_from_shingles(
            sh, threshold=0.5, max_df=50, cand=cand
        ).persist()
        ent = {"tok": tok, "sh": sh, "cand": cand, "jaccard_pairs": jac}
        memo.install(
            _SHARED, key, ent, persisted=("tok", "sh", "cand", "jaccard_pairs")
        )
    return ent


def _shared_loose_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized LOOSE (>= 0.25) exact-Jaccard verify over the shared
    candidate index: three tuning queries (dedup_threshold_sweep,
    lsh_band_planning, simhash_hamming_roc) run the identical loosest
    verify pass and then aggregate it differently — the pass now executes
    once per (session, sf_dir) and each consumer reads the checkpointed
    pair relation. Same lifecycle as the 0.5-threshold ``jaccard_pairs``
    entry; each oracle still recomputes the verify from documents."""
    ent = _shared_relations(spark, sf_dir)
    if "jaccard_pairs_loose" not in ent:
        from formula_1_spark.operators.dedup import jaccard_pairs_from_shingles

        ent["jaccard_pairs_loose"] = jaccard_pairs_from_shingles(
            ent["sh"], threshold=0.25, max_df=50, cand=ent["cand"]
        ).localCheckpoint(eager=False)
    return ent["jaccard_pairs_loose"]


def _shared_simhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized 60-bit SimHash signature relation over the shared token
    relation. The per-token md5 + 60 grouped ±1 sums is the dominant
    cost of both signature consumers, and before the memo it executed
    THREE times per suite: once in dedup_simhash and twice in
    simhash_hamming_roc (the sig_a and sig_b sides of its pair join).
    Same lifecycle as ``jaccard_pairs_loose``; every oracle still
    recomputes signatures from documents, so a stale memo would
    hash-mismatch."""
    ent = _shared_relations(spark, sf_dir)
    if "simhash_sigs" not in ent:
        from formula_1_spark.operators.dedup import simhash_signatures

        ent["simhash_sigs"] = simhash_signatures(ent["tok"]).localCheckpoint(
            eager=False
        )
    return ent["simhash_sigs"]


def _shared_cluster_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized (doc_id, cluster_id, cluster_size, is_canonical): the
    iterative min-label propagation runs once per (session, sf_dir) and
    both cluster-grain queries read the same checkpointed assignment."""
    ent = _shared_relations(spark, sf_dir)
    if "clusters" not in ent:
        from formula_1_spark.operators.graph import dedup_cluster_assignment

        docs = load_table(spark, sf_dir, "documents")
        pairs = ent["jaccard_pairs"].select(
            F.col("doc_id_1").alias("a"), F.col("doc_id_2").alias("b")
        )
        ent["clusters"] = dedup_cluster_assignment(docs, pairs).localCheckpoint(
            eager=False
        )
    return ent["clusters"]


# The two corpus-scaled SEMANTIC queries (dedup_semantic_clusters_scaled,
# semdedup_prune_report) train the IDENTICAL sqrt(n)-cell flat k-means on
# the embeddings table and run the identical assignment pass. The flat
# kernel is cheap to EXECUTE but its k x dims unrolled expressions cost
# ~10 s of analysis per occurrence at sf0.1 — so the (base, assignment)
# pair is memoized per (session, embeddings identity) as eager
# localCheckpoints, the embedding-side twin of _shared_relations (and of
# queries.similarity.shared_centroids). Values unaffected: training is
# bit-deterministic and each oracle retrains from scratch, so a stale
# memo hash-mismatches. The base checkpoint holds the corpus projection
# for the session — same storage tradeoff _shared_relations already makes
# for the token/shingle relations.
_SEM_SHARED: dict[tuple, dict[str, DataFrame]] = {}


def _shared_semantic_relations(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """{"base": (vec_id, embedding, na), "assign": (vec_id, cell_id,
    cell_cos)} for the corpus-scaled (k = max(8, ceil(sqrt(n))), 2-iter)
    semantic quantizer."""
    import math

    from pyspark.sql import Window

    from formula_1_spark.operators.similarity import (
        _flat_cell_cos,
        kmeans_centroids_flat,
        norm,
    )
    from formula_1_spark.queries import memo
    from formula_1_spark.sources.tables import fan_out

    key = memo.file_key(spark, sf_dir, "embeddings")
    ent = memo.get(_SEM_SHARED, key)
    if ent is None:
        emb = load_table(spark, sf_dir, "embeddings")
        n = table_row_count(spark, sf_dir, "embeddings")
        k = max(8, int(math.ceil(math.sqrt(float(n)))))
        cents = kmeans_centroids_flat(emb, n_cells=k, iters=2)
        base = emb.select(
            "vec_id", "embedding", norm(F.col("embedding")).alias("na")
        ).localCheckpoint(eager=True)
        scored = _flat_cell_cos(cents, fan_out(base), 64)
        w = Window.partitionBy("vec_id").orderBy(
            F.desc("cell_cos"), F.asc("cell_id")
        )
        assign = (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select("vec_id", "cell_id", "cell_cos")
            .localCheckpoint(eager=True)
        )
        ent = {"base": base, "assign": assign}
        memo.install(_SEM_SHARED, key, ent)
    return ent

# Every embedding pair-verify tail (band path, cell path) flattens the
# SAME unit vectors (embedding[d] / na, d < 64) per call — and analyzing
# those 2 x 64 division expressions costs ~1-2 s of driver time per
# query. The pre-flattened relation is memoized per (session, embeddings
# identity) as a lazy localCheckpoint; consumers rename attribute refs
# off the leaf. Values identical: u_d is the same expression, evaluated
# once at checkpoint time, and every oracle renormalizes from embeddings.
_FLAT_MEMO: dict[tuple, DataFrame] = {}


def _shared_flat_units(
    spark: SparkSession, sf_dir: str, dims: int = 64
) -> DataFrame:
    from formula_1_spark.functions.vectors import flatten_vec, norm
    from formula_1_spark.queries import memo

    key = memo.file_key(spark, sf_dir, "embeddings", extra=(dims,))
    df = memo.get(_FLAT_MEMO, key)
    if df is None:
        emb = load_table(spark, sf_dir, "embeddings")
        # Barrier under the flatten so CollapseProject cannot inline the
        # norm fold into all `dims` divisions (the flatten_vec caveat).
        base = emb.select(
            "vec_id", "embedding", norm(F.col("embedding")).alias("na")
        ).localCheckpoint(eager=False)
        df = base.selectExpr(
            "vec_id", *flatten_vec("u", "embedding", dims, denom="na")
        ).localCheckpoint(eager=False)
        memo.install(_FLAT_MEMO, key, df)
    return df


# Shared oracle CTEs: tokens → distinct word-3-gram shingles → 32-bit
# md5-hashed shingle sets (mirrors operators.dedup.md5_int32/_shingled).
_SHINGLES_CTE = """
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(range(0, greatest(len(t) - 2, 0)),
                       i -> array_to_string(list_slice(t, i + 1, i + 3), ' '))) AS g
  FROM toks
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(g, s ->
           ('0x' || substr(md5(s), 1, 8))::BIGINT)) AS sh
  FROM grams
),
shf AS (SELECT doc_id, sh, len(sh) AS n_sh FROM sh WHERE len(sh) > 0)
"""


@register(
    "dedup_exact",
    ops="EXT-dedup-exact,A1",
    doc="Exact dedup via normalized-text fingerprint hash-groupBy; "
    "canonical id = min(doc_id).",
    oracle="""
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
       MIN(doc_id) AS canonical_id,
       COUNT(1) AS n_copies
FROM documents
GROUP BY 1
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard",
    ops="EXT-dedup-jaccard,J4,A1",
    doc="Exact word-3-gram Jaccard >= 0.5 pairs; candidates via "
    "rare-shingle inverted index (df <= 50), verified on full sets.",
    oracle=f"""
WITH {_SHINGLES_CTE},
posting AS (SELECT doc_id, unnest(sh) AS shingle FROM shf),
rare AS (
  SELECT shingle FROM posting GROUP BY shingle HAVING COUNT(1) <= 50
),
cand AS (
  SELECT DISTINCT p1.doc_id AS a, p2.doc_id AS b
  FROM posting p1
  JOIN rare r ON p1.shingle = r.shingle
  JOIN posting p2 ON p2.shingle = p1.shingle
  WHERE p1.doc_id < p2.doc_id
),
verified AS (
  SELECT c.a, c.b,
         len(list_intersect(sa.sh, sb.sh))
           / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh))) AS jaccard
  FROM cand c
  JOIN shf sa ON sa.doc_id = c.a
  JOIN shf sb ON sb.doc_id = c.b
)
SELECT a AS doc_id_1, b AS doc_id_2, jaccard
FROM verified WHERE jaccard >= 0.5
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shared_relations(spark, sf_dir)["jaccard_pairs"]


_MINHASH_MINS = ",\n".join(
    f"         MIN(({a} * x + {b}) % {MINHASH_P}) AS s{i}"
    for i, (a, b) in enumerate(minhash_coeffs(32))
)
_SIG_ARRAY = "[" + ", ".join(f"s{i}" for i in range(32)) + "]"


@register(
    "dedup_minhash_lsh",
    ops="EXT-dedup-minhash,J4",
    doc="MinHash(32) (one md5 base hash + 32 linear permutations mod "
    "2^31-1) + LSH (8 bands x 4 rows) candidates, exact-Jaccard verified "
    ">= 0.5. Shared deterministic hash family makes it oracle-exact.",
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
         array_to_string(list_slice(sigs, j.j * 4 + 1, j.j * 4 + 4), ',') AS band_key
  FROM sigs, (SELECT unnest(range(0, 8)) AS j) j
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x
  JOIN bands y ON x.band_id = y.band_id AND x.band_key = y.band_key
  WHERE x.doc_id < y.doc_id
),
verified AS (
  SELECT c.a, c.b,
         len(list_intersect(sa.sh, sb.sh))
           / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh))) AS jaccard
  FROM cand c
  JOIN shf sa ON sa.doc_id = c.a
  JOIN shf sb ON sb.doc_id = c.b
)
SELECT a AS doc_id_1, b AS doc_id_2, jaccard
FROM verified WHERE jaccard >= 0.5
""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    shared = _shared_relations(spark, sf_dir)
    return minhash_lsh_pairs(None, sh=shared["sh"])


@register(
    "dedup_simhash",
    ops="EXT-dedup-simhash,J4",
    doc="60-bit SimHash over token multisets; candidates via 4x15-bit "
    "chunk pigeonhole, verified by bit_count(xor) <= 3.",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
  FROM documents
),
th AS (
  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok
),
bits AS (
  SELECT doc_id, j.j AS j,
         SUM(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th, (SELECT unnest(range(0, 60)) AS j) j
  GROUP BY doc_id, j.j
),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS sig
  FROM bits GROUP BY doc_id
),
chunks AS (
  SELECT doc_id, sig, c.c AS chunk_id, (sig >> (c.c * 15)) & 32767 AS chunk_val
  FROM sig, (SELECT unnest(range(0, 4)) AS c) c
),
pairs AS (
  SELECT DISTINCT x.doc_id AS doc_id_1, y.doc_id AS doc_id_2,
         CAST(bit_count(xor(x.sig, y.sig)) AS INTEGER) AS hamming
  FROM chunks x
  JOIN chunks y ON x.chunk_id = y.chunk_id AND x.chunk_val = y.chunk_val
  WHERE x.doc_id < y.doc_id
)
SELECT doc_id_1, doc_id_2, hamming FROM pairs WHERE hamming <= 3
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_pairs(None, sigs=_shared_simhash_sigs(spark, sf_dir))


@register(
    "dedup_clusters",
    ops="EXT-dedup-clusters,J4,A1",
    doc="Duplicate-cluster resolution: exact word-3-gram Jaccard >= 0.5 "
    "pairs -> connected components (iterative min-label propagation) -> "
    "(doc_id, cluster_id, cluster_size, is_canonical). Cluster id = min "
    "doc_id of the component; singletons are their own canonical. The "
    "oracle resolves the same components with a recursive CTE.",
    oracle=f"""
WITH RECURSIVE {_SHINGLES_CTE},
posting AS (SELECT doc_id, unnest(sh) AS shingle FROM shf),
rare AS (
  SELECT shingle FROM posting GROUP BY shingle HAVING COUNT(1) <= 50
),
cand AS (
  SELECT DISTINCT p1.doc_id AS a, p2.doc_id AS b
  FROM posting p1
  JOIN rare r ON p1.shingle = r.shingle
  JOIN posting p2 ON p2.shingle = p1.shingle
  WHERE p1.doc_id < p2.doc_id
),
verified AS (
  SELECT c.a, c.b,
         len(list_intersect(sa.sh, sb.sh))
           / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh))) AS jaccard
  FROM cand c
  JOIN shf sa ON sa.doc_id = c.a
  JOIN shf sb ON sb.doc_id = c.b
),
pairs AS (SELECT a, b FROM verified WHERE jaccard >= 0.5),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, rr.r FROM reach rr JOIN edges e ON e.src = rr.node
),
lbl AS (SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       doc_id = cluster_id AS is_canonical
FROM lbl
""",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shared_cluster_assignment(spark, sf_dir)


# Banded-LSH candidate CTEs for the oracle — the SAME md5-derived
# hyperplane signs the Spark side bakes in (operators.similarity), so
# candidate sets agree bit-for-bit.
from formula_1_spark.queries.similarity import _BANDS_CTE, _BANDS_LONG  # noqa: E402

_EMB_BANDS = f"{_BANDS_CTE},\n{_BANDS_LONG}"


@register(
    "dedup_embedding_cosine",
    ops="EXT-dedup-embedding,J4",
    doc="Embedding-cosine near-dup pairs (cosine >= 0.45), the SCALE path: "
    "candidates = pairs sharing >= 1 hyperplane-LSH band (16 md5-seeded "
    "planes, 4 bands x 4 bits — deterministic, so the oracle replicates "
    "the exact candidate set), then exact cosine re-verification. The "
    "bucket self-join shuffles ids only (no vectors, no all-pairs "
    "explosion); unit-normalized vectors are flattened to scalar columns "
    "once per side so the verify is a codegen'd multiply-add chain. "
    "Recall vs exact all-pairs is asserted in tests/test_dedup.py.",
    oracle=f"""
WITH {_EMB_BANDS},
cand AS (
  SELECT DISTINCT x.vec_id AS vec_id_1, y.vec_id AS vec_id_2
  FROM bands x
  JOIN bands y ON x.band_id = y.band_id AND x.band_key = y.band_key
  WHERE x.vec_id < y.vec_id
),
unit AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)
           / sqrt(list_reduce(
               list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),
               (acc, v) -> acc + v))) AS u
  FROM embeddings
),
pairs AS (
  SELECT c.vec_id_1, c.vec_id_2,
         list_reduce(list_transform(list_zip(a.u, b.u), x -> x[1] * x[2]),
                     (acc, v) -> acc + v) AS cos
  FROM cand c
  JOIN unit a ON a.vec_id = c.vec_id_1
  JOIN unit b ON b.vec_id = c.vec_id_2
)
SELECT vec_id_1, vec_id_2, cos FROM pairs WHERE cos >= 0.45
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.similarity import cosine_near_dup_pairs
    from formula_1_spark.sources.tables import fan_out

    # The 0.45 threshold is data-bound (the synthetic embeddings have no
    # true near-dups; max pair cosine ~0.6). At this near-random angle the
    # banded candidates recall ~50% of exact all-pairs — inherent to LSH,
    # documented in the operator; recall ≈ 1 at real near-dup thresholds
    # (planted-pair test in tests/test_dedup.py). The ORACLE replicates
    # the banded candidate set exactly, so the check is still hash-exact.
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    return cosine_near_dup_pairs(
        emb, threshold=0.45, flat=_shared_flat_units(spark, sf_dir)
    )


@register(
    "dedup_embedding_cosine_scaled",
    ops="EXT-dedup-embedding,J4 (corpus-scaled banding — production default)",
    doc="Embedding-cosine near-dup pairs with CORPUS-SCALED banding: bits "
    "per band = clamp(log2(n/32)+1, 4, 16) so expected bucket occupancy "
    "stays ~32 at ANY corpus size (the fixed 16-plane variant's bucket "
    "size grows linearly with n and its in-bucket pair work "
    "quadratically — measured 10x data -> 10x+ wall there vs ~2x here). "
    "Plane indices stride by 16 per band, so the layout is corpus-size "
    "independent and the oracle derives the SAME md5-parity hyperplane "
    "signs itself (range(128) x range(64) + md5 — no baked literals) and "
    "gates each bit slot on the same count-derived bits scalar.",
    oracle="""
WITH params AS (
  SELECT GREATEST(4, LEAST(16,
           CAST(FLOOR(LOG2(COUNT(1) / 32.0 + 1)) AS INT) + 1)) AS bits
  FROM embeddings
),
planes AS (
  SELECT p, list(CASE WHEN substr(md5(p || ',' || d), 1, 1)
                        IN ('1','3','5','7','9','b','d','f')
                      THEN CAST(1.0 AS DOUBLE)
                      ELSE CAST(-1.0 AS DOUBLE) END ORDER BY d) AS signs
  FROM (SELECT a.range AS p FROM range(128) a),
       (SELECT b.range AS d FROM range(64) b)
  GROUP BY p
),
proj AS (
  SELECT e.vec_id, pl.p,
         list_reduce(list_transform(list_zip(e.embedding, pl.signs),
                     x -> CAST(x[1] AS DOUBLE) * x[2]),
                     (acc, v) -> acc + v) AS pr
  FROM embeddings e, planes pl, params
  WHERE pl.p % 16 < params.bits
),
bands AS (
  SELECT vec_id, CAST(p // 16 AS INT) AS band_id,
         SUM(CASE WHEN pr > 0 THEN 1 << (p % 16) ELSE 0 END) AS band_key
  FROM proj GROUP BY vec_id, band_id
),
cand AS (
  SELECT DISTINCT x.vec_id AS vec_id_1, y.vec_id AS vec_id_2
  FROM bands x
  JOIN bands y ON x.band_id = y.band_id AND x.band_key = y.band_key
  WHERE x.vec_id < y.vec_id
),
unit AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)
           / sqrt(list_reduce(
               list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),
               (acc, v) -> acc + v))) AS u
  FROM embeddings
),
pairs AS (
  SELECT c.vec_id_1, c.vec_id_2,
         list_reduce(list_transform(list_zip(a.u, b.u), x -> x[1] * x[2]),
                     (acc, v) -> acc + v) AS cos
  FROM cand c
  JOIN unit a ON a.vec_id = c.vec_id_1
  JOIN unit b ON b.vec_id = c.vec_id_2
)
SELECT vec_id_1, vec_id_2, cos FROM pairs WHERE cos >= 0.45
""",
)
def dedup_embedding_cosine_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.similarity import cosine_near_dup_pairs_scaled
    from formula_1_spark.sources.tables import fan_out

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    n = table_row_count(spark, sf_dir, "embeddings")
    return cosine_near_dup_pairs_scaled(
        emb, threshold=0.45, n_vectors=n, flat=_shared_flat_units(spark, sf_dir)
    )


# SemDeDup-style semantic dedup: k-means cells as candidate buckets,
# exact cosine verify within a cell. Reuses the similarity module's
# deterministic k-means CTE chain so the oracle replicates the exact
# cell assignment (and therefore the exact candidate set).
from formula_1_spark.queries.similarity import _COS, _kmeans_ctes  # noqa: E402


@register(
    "dedup_semantic_clusters",
    ops="EXT-dedup-semantic,A1,J4,W1 (k-means bucketed pairwise verify)",
    doc="SemDeDup-style semantic dedup: embeddings clustered by 2 "
    "deterministic spherical k-means iterations (8 cells), pairwise "
    "exact cosine ONLY within a cell (>= 0.45). The cluster count is the "
    "scale knob: per-cell pair work stays bounded as n_cells grows with "
    "the corpus.",
    oracle=f"""
WITH {_kmeans_ctes(n_cells=8, iters=2)},
scored AS (
  SELECT e.vec_id, c.cell_id,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
           ORDER BY {_COS.format(a="e.embedding", b="c.cent")} DESC,
                    c.cell_id ASC) AS r
  FROM embeddings e, centroids c
),
cells AS (SELECT vec_id, cell_id FROM scored WHERE r = 1),
unit AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)
           / sqrt(list_reduce(
               list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),
               (acc, v) -> acc + v))) AS u
  FROM embeddings
),
pairs AS (
  SELECT x.cell_id, x.vec_id AS vec_id_1, y.vec_id AS vec_id_2
  FROM cells x JOIN cells y
    ON x.cell_id = y.cell_id AND x.vec_id < y.vec_id
)
SELECT p.cell_id, p.vec_id_1, p.vec_id_2,
       list_reduce(list_transform(list_zip(a.u, b.u), x -> x[1] * x[2]),
                   (acc, v) -> acc + v) AS cos
FROM pairs p
JOIN unit a ON a.vec_id = p.vec_id_1
JOIN unit b ON b.vec_id = p.vec_id_2
WHERE list_reduce(list_transform(list_zip(a.u, b.u), x -> x[1] * x[2]),
                  (acc, v) -> acc + v) >= 0.45
""",
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.similarity import semantic_dedup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_pairs(
        emb,
        n_cells=8,
        iters=2,
        threshold=0.45,
        flat=_shared_flat_units(spark, sf_dir),
    )


@register(
    "dedup_semantic_clusters_scaled",
    ops="EXT-dedup-semantic,J4,W1 (corpus-scaled cells — production default)",
    doc="SemDeDup with CORPUS-SCALED cells: k = max(8, ceil(sqrt(n))) "
    "balances the two cost terms at O(n^1.5) — assignment is n x k flat "
    "codegen dots, per-cell verify is k x (n/k)^2 pair dots — where the "
    "fixed-8-cell variant's verify is O(n^2/8) (measured ~30x wall at "
    "the 10x probe vs ~3x here). The oracle derives the SAME k from "
    "COUNT(1) (IEEE sqrt+ceil in both engines) and replays every k-means "
    "iteration bit-for-bit; cosine semantics identical to the fixed "
    "variant (dot/(|a||b|) for assignment, prenormalized flat dot for "
    "the pair verify).",
    oracle=f"""
WITH params AS (
  SELECT GREATEST(8, CAST(CEIL(SQRT(COUNT(1))) AS BIGINT)) AS k
  FROM embeddings
),
{_kmeans_ctes(iters=2, k_expr="SELECT k FROM params")},
scored AS (
  SELECT e.vec_id, c.cell_id,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
           ORDER BY {_COS.format(a="e.embedding", b="c.cent")} DESC,
                    c.cell_id ASC) AS r
  FROM embeddings e, centroids c
),
cells AS (SELECT vec_id, cell_id FROM scored WHERE r = 1),
unit AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)
           / sqrt(list_reduce(
               list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),
               (acc, v) -> acc + v))) AS u
  FROM embeddings
),
pairs AS (
  SELECT x.cell_id, x.vec_id AS vec_id_1, y.vec_id AS vec_id_2
  FROM cells x JOIN cells y
    ON x.cell_id = y.cell_id AND x.vec_id < y.vec_id
)
SELECT p.cell_id, p.vec_id_1, p.vec_id_2,
       list_reduce(list_transform(list_zip(a.u, b.u), x -> x[1] * x[2]),
                   (acc, v) -> acc + v) AS cos
FROM pairs p
JOIN unit a ON a.vec_id = p.vec_id_1
JOIN unit b ON b.vec_id = p.vec_id_2
WHERE list_reduce(list_transform(list_zip(a.u, b.u), x -> x[1] * x[2]),
                  (acc, v) -> acc + v) >= 0.45
""",
)
def dedup_semantic_clusters_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from formula_1_spark.operators.similarity import semantic_dedup_pairs_scaled

    emb = load_table(spark, sf_dir, "embeddings")
    n = table_row_count(spark, sf_dir, "embeddings")
    k = max(8, int(math.ceil(math.sqrt(float(n)))))
    sem = _shared_semantic_relations(spark, sf_dir)
    return semantic_dedup_pairs_scaled(
        emb,
        n_cells=k,
        iters=2,
        threshold=0.45,
        base=sem["base"],
        assign=sem["assign"],
        flat=_shared_flat_units(spark, sf_dir),
    )


_SEM_EPS = 0.40  # SemDeDup epsilon: pairwise-cos duplicate threshold


@register(
    "semdedup_prune_report",
    ops="EXT-dedup-semantic,A1,J4,W1 (SemDeDup keep/prune decision stage)",
    doc="SemDeDup prune stage (Abbas et al. 2023 arXiv:2303.09540 §3, on "
    "top of dedup_semantic_clusters' pair discovery): within each k-means "
    "cell, every pair with exact cosine >= 0.40 is a semantic-duplicate "
    "pair, and from each pair the member CLOSER to its centroid is "
    "pruned — the paper keeps the low-centroid-similarity extrema as the "
    "most diverse exemplars (ties: prune the higher vec_id). Per cell: "
    "vectors, duplicate pairs, pruned docs, kept docs, pruned ppm. One "
    "k-means + ONE assignment pass shared (localCheckpoint) by the pair "
    "verify, the prune join, and the cell counts. Scale: k = max(8, "
    "ceil(sqrt(n))) cells (same knob as dedup_semantic_clusters_scaled) "
    "balances assignment and in-cell verify at O(n^1.5) — the fixed-8 "
    "variant read 5.4x wall on the 10x probe (quadratic in-cell pairs), "
    "this one 1.9x; the oracle derives the SAME k from COUNT(1).",
    oracle=f"""
WITH params AS (
  SELECT GREATEST(8, CAST(CEIL(SQRT(COUNT(1))) AS BIGINT)) AS k
  FROM embeddings
),
{{kmeans}},
scored AS (
  SELECT e.vec_id, c.cell_id,
         {{cos}} AS cell_cos
  FROM embeddings e, centroids c
),
assign AS (
  SELECT vec_id, cell_id, cell_cos FROM (
    SELECT vec_id, cell_id, cell_cos,
           ROW_NUMBER() OVER (PARTITION BY vec_id
             ORDER BY cell_cos DESC, cell_id ASC) AS r
    FROM scored) WHERE r = 1
),
unit AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)
           / sqrt(list_reduce(
               list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),
               (acc, v) -> acc + v))) AS u
  FROM embeddings
),
dup AS (
  SELECT p.cell_id, p.vec_id_1, p.vec_id_2
  FROM (SELECT x.cell_id, x.vec_id AS vec_id_1, y.vec_id AS vec_id_2
        FROM assign x JOIN assign y
          ON x.cell_id = y.cell_id AND x.vec_id < y.vec_id) p
  JOIN unit a ON a.vec_id = p.vec_id_1
  JOIN unit b ON b.vec_id = p.vec_id_2
  WHERE list_reduce(list_transform(list_zip(a.u, b.u), x -> x[1] * x[2]),
                    (acc, v) -> acc + v) >= {_SEM_EPS}
),
pruned AS (
  SELECT DISTINCT d.cell_id,
         CASE WHEN x.cell_cos > y.cell_cos
                   OR (x.cell_cos = y.cell_cos AND d.vec_id_1 > d.vec_id_2)
              THEN d.vec_id_1 ELSE d.vec_id_2 END AS vec_id
  FROM dup d
  JOIN assign x ON x.vec_id = d.vec_id_1
  JOIN assign y ON y.vec_id = d.vec_id_2
),
per_cell AS (
  SELECT cell_id, CAST(COUNT(1) AS BIGINT) AS n_vectors
  FROM assign GROUP BY cell_id
),
dup_cell AS (
  SELECT cell_id, CAST(COUNT(1) AS BIGINT) AS dup_pairs
  FROM dup GROUP BY cell_id
),
pr_cell AS (
  SELECT cell_id, CAST(COUNT(1) AS BIGINT) AS pruned_docs
  FROM pruned GROUP BY cell_id
)
SELECT CAST(p.cell_id AS BIGINT) AS cell_id,
       p.n_vectors,
       CAST(COALESCE(d.dup_pairs, 0) AS BIGINT) AS dup_pairs,
       CAST(COALESCE(r.pruned_docs, 0) AS BIGINT) AS pruned_docs,
       CAST(p.n_vectors - COALESCE(r.pruned_docs, 0) AS BIGINT) AS kept_docs,
       CAST(COALESCE(r.pruned_docs, 0) * 1000000 // p.n_vectors AS BIGINT)
         AS pruned_ppm
FROM per_cell p
LEFT JOIN dup_cell d USING (cell_id)
LEFT JOIN pr_cell r USING (cell_id)
ORDER BY cell_id
""".format(
        kmeans=_kmeans_ctes(iters=2, k_expr="SELECT k FROM params"),
        cos=_COS.format(a="e.embedding", b="c.cent"),
    ),
)
def semdedup_prune_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.similarity import _pairs_within_cells

    # Shared by the pair verify, both prune joins, and the cell counts —
    # and across the whole scaled-semantic family via the session memo.
    sem = _shared_semantic_relations(spark, sf_dir)
    base, assign = sem["base"], sem["assign"]
    dup = _pairs_within_cells(
        base,
        assign.select("vec_id", "cell_id"),
        threshold=_SEM_EPS,
        dims=64,
        flat=_shared_flat_units(spark, sf_dir),
    )
    ca = assign.select(
        F.col("vec_id").alias("vec_id_1"), F.col("cell_cos").alias("cc1")
    )
    cb = assign.select(
        F.col("vec_id").alias("vec_id_2"), F.col("cell_cos").alias("cc2")
    )
    # cell_cos is the identical left-fold double in both engines, so the
    # closer-to-centroid comparison (and its equality tie) is bit-stable.
    loser = F.when(
        (F.col("cc1") > F.col("cc2"))
        | ((F.col("cc1") == F.col("cc2")) & (F.col("vec_id_1") > F.col("vec_id_2"))),
        F.col("vec_id_1"),
    ).otherwise(F.col("vec_id_2"))
    scored_dup = dup.join(ca, "vec_id_1").join(cb, "vec_id_2")
    pruned = scored_dup.select("cell_id", loser.alias("vec_id")).distinct()
    per_cell = assign.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )
    dup_cell = scored_dup.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("dup_pairs")
    )
    pr_cell = pruned.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("pruned_docs")
    )
    return (
        per_cell.join(dup_cell, "cell_id", "left")
        .join(pr_cell, "cell_id", "left")
        .select(
            F.col("cell_id").cast("bigint").alias("cell_id"),
            "n_vectors",
            F.coalesce(F.col("dup_pairs"), F.lit(0)).cast("bigint").alias(
                "dup_pairs"
            ),
            F.coalesce(F.col("pruned_docs"), F.lit(0)).cast("bigint").alias(
                "pruned_docs"
            ),
            (
                F.col("n_vectors")
                - F.coalesce(F.col("pruned_docs"), F.lit(0))
            )
            .cast("bigint")
            .alias("kept_docs"),
            F.expr(
                "CAST(coalesce(pruned_docs, 0) * 1000000 div n_vectors"
                " AS BIGINT)"
            ).alias("pruned_ppm"),
        )
        .orderBy("cell_id")
    )


@register(
    "dedup_incremental_minhash",
    ops="EXT-dedup-incremental,J4",
    doc="Incremental (cross-corpus) near-dup: incoming docs (odd doc_id) "
    "checked against the base corpus (even doc_id) via asymmetric "
    "MinHash-LSH band join, exact-Jaccard verified >= 0.5. The batch "
    "never self-pairs — candidate work is O(batch x bucket), not "
    "O(corpus^2), the shape of deduping a new crawl against an existing "
    "100 TB corpus index.",
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
         array_to_string(list_slice(sigs, j.j * 4 + 1, j.j * 4 + 4), ',') AS band_key
  FROM sigs, (SELECT unnest(range(0, 8)) AS j) j
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x
  JOIN bands y ON x.band_id = y.band_id AND x.band_key = y.band_key
  WHERE x.doc_id % 2 = 0 AND y.doc_id % 2 = 1
),
verified AS (
  SELECT c.a, c.b,
         len(list_intersect(sa.sh, sb.sh))
           / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh))) AS jaccard
  FROM cand c
  JOIN shf sa ON sa.doc_id = c.a
  JOIN shf sb ON sb.doc_id = c.b
)
SELECT a AS doc_id_1, b AS doc_id_2, jaccard
FROM verified WHERE jaccard >= 0.5
""",
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.dedup import minhash_lsh_cross_pairs

    shared = _shared_relations(spark, sf_dir)
    return minhash_lsh_cross_pairs(
        shared["sh"], base_pred=F.col("doc_id") % 2 == 0, threshold=0.5
    )


# ---------------------------------------------------------------------------
# Train/test split leakage audit
# ---------------------------------------------------------------------------


@register(
    "split_leakage_audit",
    ops="EXT-leakage-audit,EXT-dedup-jaccard,J4,A5 (cross-split near-dup audit)",
    doc="Train/test contamination audit — the eval-integrity step after "
    "dedup: documents split 80/20 by the shared salted-md5 grid, then "
    "every exact-Jaccard>=0.5 near-dup pair (the shared rare-shingle "
    "inverted-index pipeline) is classified train-train / test-test / "
    "LEAK (one side in each split). Reports pair and distinct-document "
    "counts per category; a nonzero leak row is the signal that the "
    "test split is contaminated by training near-duplicates. One pass "
    "over the pair list; the split relation is a broadcast.",
    oracle=f"""
WITH {_SHINGLES_CTE},
posting AS (SELECT doc_id, unnest(sh) AS shingle FROM shf),
rare AS (
  SELECT shingle FROM posting GROUP BY shingle HAVING COUNT(1) <= 50
),
cand AS (
  SELECT DISTINCT p1.doc_id AS a, p2.doc_id AS b
  FROM posting p1
  JOIN rare r ON p1.shingle = r.shingle
  JOIN posting p2 ON p2.shingle = p1.shingle
  WHERE p1.doc_id < p2.doc_id
),
verified AS (
  SELECT c.a, c.b,
         len(list_intersect(sa.sh, sb.sh))
           / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh))) AS jaccard
  FROM cand c
  JOIN shf sa ON sa.doc_id = c.a
  JOIN shf sb ON sb.doc_id = c.b
),
pairsq AS MATERIALIZED (SELECT a, b FROM verified WHERE jaccard >= 0.5),
folds AS (
  SELECT doc_id,
         CASE WHEN {{u}} < 0.8 THEN 'train' ELSE 'test' END AS fold
  FROM documents
),
cat AS MATERIALIZED (
  SELECT p.a, p.b,
         CASE WHEN fa.fold = 'train' AND fb.fold = 'train' THEN 'train-train'
              WHEN fa.fold = 'test' AND fb.fold = 'test' THEN 'test-test'
              ELSE 'leak-train-test' END AS category
  FROM pairsq p
  JOIN folds fa ON fa.doc_id = p.a
  JOIN folds fb ON fb.doc_id = p.b
),
mem AS (SELECT category, unnest([a, b]) AS d FROM cat)
SELECT m.category, CAST(x.n_pairs AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT m.d) AS BIGINT) AS n_docs
FROM mem m
JOIN (SELECT category, COUNT(1) AS n_pairs FROM cat GROUP BY category) x
  USING (category)
GROUP BY m.category, x.n_pairs
""".format(u=hash_uniform_sql("doc_id", "split")),
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.sampling import hash_uniform

    pairs = _shared_relations(spark, sf_dir)["jaccard_pairs"].select(
        F.col("doc_id_1").alias("a"), F.col("doc_id_2").alias("b")
    )
    folds = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(hash_uniform(F.col("doc_id"), "split") < 0.8, F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("fold"),
    )
    fa = folds.select(F.col("doc_id").alias("a"), F.col("fold").alias("fold_a"))
    fb = folds.select(F.col("doc_id").alias("b"), F.col("fold").alias("fold_b"))
    cat = (
        pairs.join(F.broadcast(fa), "a")
        .join(F.broadcast(fb), "b")
        .select(
            "a",
            "b",
            F.when(
                (F.col("fold_a") == "train") & (F.col("fold_b") == "train"),
                F.lit("train-train"),
            )
            .when(
                (F.col("fold_a") == "test") & (F.col("fold_b") == "test"),
                F.lit("test-test"),
            )
            .otherwise(F.lit("leak-train-test"))
            .alias("category"),
        )
    )
    n_pairs = cat.groupBy("category").agg(F.count(F.lit(1)).alias("n_pairs"))
    mem = cat.select(
        "category", F.explode(F.array(F.col("a"), F.col("b"))).alias("d")
    )
    n_docs = mem.groupBy("category").agg(F.countDistinct("d").alias("n_docs"))
    return n_pairs.join(n_docs, "category").select(
        "category", "n_pairs", "n_docs"
    )


@register(
    "dedup_containment",
    ops="EXT-dedup-containment,J4,A1 (asymmetric quote/partial-copy pairs)",
    doc="Shingle-set containment pairs C = |A∩B|/min(|A|,|B|) >= 0.8 — "
    "the asymmetric detector for a short doc embedded in a long one, "
    "which symmetric Jaccard under-scores. Candidates from the shared "
    "rare-shingle inverted index; verification via the posting-list "
    "COUNT formulation (postings pruned to candidate docs, self-joined "
    "on shingle, grouped per pair) — the no-broadcast scale path: every "
    "shuffle carries only (id, shingle) ints.",
    oracle=f"""
WITH {_SHINGLES_CTE},
posting AS (SELECT doc_id, unnest(sh) AS shingle FROM shf),
rare AS (
  SELECT shingle FROM posting GROUP BY shingle HAVING COUNT(1) <= 50
),
cand AS (
  SELECT DISTINCT p1.doc_id AS a, p2.doc_id AS b
  FROM posting p1
  JOIN rare r ON p1.shingle = r.shingle
  JOIN posting p2 ON p2.shingle = p1.shingle
  WHERE p1.doc_id < p2.doc_id
),
verified AS (
  SELECT c.a, c.b,
         CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS common,
         CAST(sa.n_sh AS INT) AS na, CAST(sb.n_sh AS INT) AS nb
  FROM cand c
  JOIN shf sa ON sa.doc_id = c.a
  JOIN shf sb ON sb.doc_id = c.b
)
SELECT a AS doc_id_1, b AS doc_id_2, common, na, nb,
       common / least(na, nb) AS containment,
       common / (na + nb - common) AS jaccard
FROM verified
WHERE common / least(na, nb) >= 0.8
""",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    shared = _shared_relations(spark, sf_dir)
    return containment_pairs_from_shingles(
        shared["sh"], threshold=0.8, max_df=50, cand=shared["cand"]
    )


@register(
    "minhash_recall_audit",
    ops="EXT-lsh-recall,J4,A1 (probabilistic-operator evaluation)",
    doc="Self-evaluation of the MinHash+LSH candidate generator against "
    "ground truth: recall (ppm) of the banded LSH pair set vs the exact "
    "rare-shingle Jaccard >= 0.5 pair set, per Jaccard band (0.5-0.7, "
    "0.7-0.9, 0.9-1.0) — the measurement that justifies banding "
    "parameters before scaling them. Reuses the shared cached shingle/"
    "pair relations; the only new work is one anti-join per band.",
    oracle=f"""
WITH {_SHINGLES_CTE},
posting AS (SELECT doc_id, unnest(sh) AS shingle FROM shf),
rare AS (
  SELECT shingle FROM posting GROUP BY shingle HAVING COUNT(1) <= 50
),
cand AS (
  SELECT DISTINCT p1.doc_id AS a, p2.doc_id AS b
  FROM posting p1
  JOIN rare r ON p1.shingle = r.shingle
  JOIN posting p2 ON p2.shingle = p1.shingle
  WHERE p1.doc_id < p2.doc_id
),
truth AS (
  SELECT c.a, c.b,
         len(list_intersect(sa.sh, sb.sh))
           / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh))) AS jaccard
  FROM cand c
  JOIN shf sa ON sa.doc_id = c.a
  JOIN shf sb ON sb.doc_id = c.b
),
tp AS (SELECT a, b, jaccard FROM truth WHERE jaccard >= 0.5),
base AS (
  SELECT doc_id, shingle % {{P}} AS x
  FROM (SELECT doc_id, unnest(sh) AS shingle FROM shf)
),
sigagg AS (
  SELECT doc_id,
{{MINS}}
  FROM base GROUP BY doc_id
),
sigs AS (SELECT doc_id, {{SIGA}} AS sigs FROM sigagg),
bands AS (
  SELECT doc_id, j.j AS band_id,
         array_to_string(list_slice(sigs, j.j * 4 + 1, j.j * 4 + 4), ',') AS band_key
  FROM sigs, (SELECT unnest(range(0, 8)) AS j) j
),
lsh AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x
  JOIN bands y ON x.band_id = y.band_id AND x.band_key = y.band_key
  WHERE x.doc_id < y.doc_id
),
banded AS (
  SELECT t.a, t.b,
         CASE WHEN t.jaccard >= 0.9 THEN '0.9-1.0'
              WHEN t.jaccard >= 0.7 THEN '0.7-0.9'
              ELSE '0.5-0.7' END AS jband,
         (l.a IS NOT NULL) AS found
  FROM tp t LEFT JOIN lsh l ON l.a = t.a AND l.b = t.b
)
SELECT jband,
       CAST(COUNT(1) AS BIGINT) AS n_true_pairs,
       CAST(COUNT(1) FILTER (WHERE found) AS BIGINT) AS n_lsh_found,
       (COUNT(1) FILTER (WHERE found) * 1000000) // COUNT(1) AS recall_ppm
FROM banded
GROUP BY jband
""".format(P=MINHASH_P, MINS=_MINHASH_MINS, SIGA=_SIG_ARRAY),
)
def minhash_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    shared = _shared_relations(spark, sf_dir)
    truth = shared["jaccard_pairs"].select(
        F.col("doc_id_1").alias("a"), F.col("doc_id_2").alias("b"), "jaccard"
    )
    lsh = minhash_lsh_pairs(None, sh=shared["sh"]).select(
        F.col("doc_id_1").alias("a"), F.col("doc_id_2").alias("b")
    )
    # LSH verified pairs are a subset of candidates; for recall we need
    # the CANDIDATE set (pre-verify) — but verified-at-0.5 equals the
    # candidate set intersected with truth, which is exactly what recall
    # against truth measures.
    banded = (
        truth.join(lsh.withColumn("found", F.lit(True)), ["a", "b"], "left")
        .select(
            F.when(F.col("jaccard") >= 0.9, "0.9-1.0")
            .when(F.col("jaccard") >= 0.7, "0.7-0.9")
            .otherwise("0.5-0.7")
            .alias("jband"),
            F.coalesce("found", F.lit(False)).alias("found"),
        )
    )
    return banded.groupBy("jband").agg(
        F.count(F.lit(1)).alias("n_true_pairs"),
        F.count_if("found").alias("n_lsh_found"),
        F.expr("(count_if(found) * 1000000) div count(1)").alias("recall_ppm"),
    )


@register(
    "shingle_df_profile",
    ops="EXT-df-profile,A1 (inverted-index occupancy audit)",
    doc="Document-frequency profile of the dedup shingle index — the "
    "evidence behind the max_df=50 candidate cap (key_skew_profile's "
    "counterpart for the text index): shingles bucketed by "
    "floor(log2(df)) via bit length (integer-exact, no log()), per "
    "bucket: shingle count, total postings, and the share of all "
    "postings in ppm. A fat high-df tail here is exactly the quadratic "
    "candidate noise the cap removes. Aggregates run over the shingle "
    "rollup, never over postings twice.",
    oracle=f"""
WITH {_SHINGLES_CTE},
posting AS (SELECT doc_id, unnest(sh) AS shingle FROM shf),
dfs AS (
  SELECT shingle, CAST(COUNT(1) AS BIGINT) AS df
  FROM posting GROUP BY shingle
),
bucketed AS (
  SELECT CAST(length(bin(df)) - 1 AS INT) AS df_log2_bucket, df FROM dfs
),
tot AS (SELECT CAST(SUM(df) AS BIGINT) AS t FROM bucketed)
SELECT b.df_log2_bucket,
       CAST(COUNT(1) AS BIGINT) AS n_shingles,
       CAST(SUM(b.df) AS BIGINT) AS total_postings,
       CAST((SUM(b.df) * 1000000) // any_value(t.t) AS BIGINT)
         AS postings_share_ppm,
       CAST(MAX(b.df) AS BIGINT) AS max_df
FROM bucketed b, tot t
GROUP BY b.df_log2_bucket
""",
)
def shingle_df_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shared_relations(spark, sf_dir)["sh"]
    posting = sh.select("doc_id", F.explode("sh").alias("shingle"))
    dfs = posting.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    # floor(log2(df)) via bit length (length of the binary string minus
    # 1) — integer-exact in both engines; float log2 floors can flip at
    # exact powers of two depending on the libm.
    bucketed = dfs.select(
        (F.length(F.bin("df")) - 1).cast("int").alias("df_log2_bucket"),
        "df",
    )
    tot = bucketed.agg(F.sum("df").alias("t"))
    return (
        bucketed.crossJoin(F.broadcast(tot))
        .groupBy("df_log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("df").alias("total_postings"),
            # decimal(38,0) lift: per-bucket postings approach the corpus
            # posting total (~1e15 at 100 TB), so the x1e6 scaling would
            # wrap int64. div returns BIGINT.
            F.expr(
                "(cast(sum(df) as decimal(38,0)) * 1000000) div any_value(t)"
            ).alias("postings_share_ppm"),
            F.max("df").alias("max_df"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-snapshot incremental compaction
# ---------------------------------------------------------------------------


@register(
    "dedup_incremental_compaction",
    ops="EXT-dedup-compaction,J4,A1,A5 (snapshot admission manifest)",
    doc="Cross-snapshot dedup COMPACTION — the admission manifest an "
    "incremental corpus build emits per batch: delta docs (doc_id%5==4) "
    "are checked against the base snapshot (doc_id%5<4) for (1) exact "
    "content dups (md5 text hash semi-join), (2) near-dups of base via "
    "the asymmetric MinHash-LSH band join, and (3) intra-delta near-dups "
    "(greedy keep-lowest-id within the batch); the rollup reports, per "
    "source, how many delta docs each gate caught and how many were "
    "admitted. At scale the base band rows/hashes are a precomputed "
    "append-only index, so per-batch work is O(batch x bucket) — "
    "independent of corpus size; the three flag joins are delta-grain.",
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
         array_to_string(list_slice(sigs, j.j * 4 + 1, j.j * 4 + 4), ',') AS band_key
  FROM sigs, (SELECT unnest(range(0, 8)) AS j) j
),
near_base AS (
  SELECT DISTINCT y.doc_id
  FROM bands x
  JOIN bands y ON x.band_id = y.band_id AND x.band_key = y.band_key
  JOIN shf sa ON sa.doc_id = x.doc_id
  JOIN shf sb ON sb.doc_id = y.doc_id
  WHERE x.doc_id % 5 < 4 AND y.doc_id % 5 = 4
    AND len(list_intersect(sa.sh, sb.sh))
        / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh))) >= 0.5
),
intra_drop AS (
  SELECT DISTINCT y.doc_id
  FROM bands x
  JOIN bands y ON x.band_id = y.band_id AND x.band_key = y.band_key
  JOIN shf sa ON sa.doc_id = x.doc_id
  JOIN shf sb ON sb.doc_id = y.doc_id
  WHERE x.doc_id % 5 = 4 AND y.doc_id % 5 = 4 AND x.doc_id < y.doc_id
    AND len(list_intersect(sa.sh, sb.sh))
        / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh))) >= 0.5
),
exact_dup AS (
  SELECT DISTINCT d.doc_id
  FROM documents d
  WHERE d.doc_id % 5 = 4
    AND EXISTS (SELECT 1 FROM documents b
                WHERE b.doc_id % 5 < 4 AND md5(b.text) = md5(d.text))
),
flags AS (
  SELECT d.doc_id, d.source,
         (e.doc_id IS NOT NULL) AS f_exact,
         (nb.doc_id IS NOT NULL) AS f_base,
         (it.doc_id IS NOT NULL) AS f_intra
  FROM documents d
  LEFT JOIN exact_dup e ON e.doc_id = d.doc_id
  LEFT JOIN near_base nb ON nb.doc_id = d.doc_id
  LEFT JOIN intra_drop it ON it.doc_id = d.doc_id
  WHERE d.doc_id % 5 = 4
)
SELECT source,
       CAST(COUNT(1) AS BIGINT) AS n_delta,
       CAST(COUNT(1) FILTER (WHERE f_exact) AS BIGINT) AS n_exact_dup,
       CAST(COUNT(1) FILTER (WHERE f_base) AS BIGINT) AS n_near_dup_base,
       CAST(COUNT(1) FILTER (WHERE f_intra) AS BIGINT) AS n_intra_dup,
       CAST(COUNT(1) FILTER (WHERE NOT (f_exact OR f_base OR f_intra))
            AS BIGINT) AS n_admitted
FROM flags
GROUP BY source
ORDER BY source
""",
)
def dedup_incremental_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.dedup import (
        minhash_lsh_cross_pairs,
        minhash_lsh_pairs,
    )

    shared = _shared_relations(spark, sf_dir)
    sh = shared["sh"]
    docs = load_table(spark, sf_dir, "documents")
    is_base = F.col("doc_id") % 5 < 4
    delta = docs.filter(~is_base).select("doc_id", "source", F.md5("text").alias("h"))
    base_hashes = docs.filter(is_base).select(F.md5("text").alias("h")).distinct()
    exact = delta.join(base_hashes, "h", "left_semi").select("doc_id")
    near_base = (
        minhash_lsh_cross_pairs(sh, base_pred=is_base, threshold=0.5)
        .select(F.col("doc_id_2").alias("doc_id"))
        .distinct()
    )
    # Greedy intra-batch policy: a delta doc is dropped iff it near-dups a
    # LOWER-id delta doc (doc_id_2 of each a<b pair) — deterministic and
    # index-free, the standard streaming-compaction rule.
    intra_drop = (
        minhash_lsh_pairs(None, sh=sh.filter(~is_base), threshold=0.5)
        .select(F.col("doc_id_2").alias("doc_id"))
        .distinct()
    )
    flags = (
        delta.select("doc_id", "source")
        .join(exact.withColumn("f_exact", F.lit(True)), "doc_id", "left")
        .join(near_base.withColumn("f_base", F.lit(True)), "doc_id", "left")
        .join(intra_drop.withColumn("f_intra", F.lit(True)), "doc_id", "left")
    )
    admitted = (
        F.col("f_exact").isNull()
        & F.col("f_base").isNull()
        & F.col("f_intra").isNull()
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_delta"),
            F.count("f_exact").alias("n_exact_dup"),
            F.count("f_base").alias("n_near_dup_base"),
            F.count("f_intra").alias("n_intra_dup"),
            F.count_if(admitted).alias("n_admitted"),
        )
        .orderBy("source")
    )


@register(
    "dedup_cluster_canonical_quality",
    ops="EXT-dedup-canonical-quality,J4,A1,W1 (best-doc-per-cluster keep)",
    doc="Quality-aware cluster compaction: near-dup clusters (exact "
    "Jaccard >= 0.5 connected components, shared pair pipeline) keep the "
    "BEST document — max n_chars, doc_id tie-break — instead of the "
    "min-id convention, the policy a curation pipeline actually ships "
    "(keep the longest/cleanest copy). Emits one row per multi-doc "
    "cluster: canonical doc, docs and chars dropped. The rank window is "
    "partitioned by cluster_id (component-grain, spreadable); no global "
    "windows, no collects.",
    oracle=f"""
WITH RECURSIVE {_SHINGLES_CTE},
posting AS (SELECT doc_id, unnest(sh) AS shingle FROM shf),
rare AS (
  SELECT shingle FROM posting GROUP BY shingle HAVING COUNT(1) <= 50
),
cand AS (
  SELECT DISTINCT p1.doc_id AS a, p2.doc_id AS b
  FROM posting p1
  JOIN rare r ON p1.shingle = r.shingle
  JOIN posting p2 ON p2.shingle = p1.shingle
  WHERE p1.doc_id < p2.doc_id
),
verified AS (
  SELECT c.a, c.b,
         len(list_intersect(sa.sh, sb.sh))
           / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh))) AS jaccard
  FROM cand c
  JOIN shf sa ON sa.doc_id = c.a
  JOIN shf sb ON sb.doc_id = c.b
),
pairs AS (SELECT a, b FROM verified WHERE jaccard >= 0.5),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, rr.r FROM reach rr JOIN edges e ON e.src = rr.node
),
lbl AS (SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
ranked AS (
  SELECT l.cluster_id, l.doc_id, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                            ORDER BY d.n_chars DESC, l.doc_id ASC) AS rn
  FROM lbl l JOIN documents d ON d.doc_id = l.doc_id
)
SELECT cluster_id,
       CAST(COUNT(1) AS BIGINT) AS cluster_size,
       CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
         AS canonical_doc_id,
       CAST(MAX(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT)
         AS canonical_chars,
       CAST(COUNT(1) - 1 AS BIGINT) AS n_dropped,
       CAST(SUM(n_chars) - MAX(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT)
         AS dropped_chars
FROM ranked
GROUP BY cluster_id
HAVING COUNT(1) > 1
ORDER BY cluster_id
""",
)
def dedup_cluster_canonical_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    assignment = _shared_cluster_assignment(spark, sf_dir).select(
        "doc_id", "cluster_id"
    )
    joined = assignment.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ranked = joined.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias(
                "canonical_doc_id"
            ),
            F.max(F.when(F.col("rn") == 1, F.col("n_chars"))).alias(
                "canonical_chars"
            ),
            (F.count(F.lit(1)) - 1).alias("n_dropped"),
            (
                F.sum("n_chars")
                - F.max(F.when(F.col("rn") == 1, F.col("n_chars")))
            ).alias("dropped_chars"),
        )
        .filter(F.col("cluster_size") > 1)
        .orderBy("cluster_id")
    )


@register(
    "cluster_aware_split",
    ops="EXT-split-leakfree,J1,A1 (cluster-atomic train/val/test split)",
    doc="Leakage-FREE dataset split: near-dup clusters are assigned to "
    "train/val/test ATOMICALLY — the split key is md5(cluster_id) mod "
    "10 (8/1/1), so two near-duplicate documents can never straddle a "
    "split boundary (the failure mode split_leakage_audit measures on "
    "the naive per-doc split). Reuses the memoized label-propagation "
    "assignment; reports per split: docs, clusters, tokens, and docs "
    "living in multi-doc clusters. The oracle re-derives components "
    "with the recursive CTE and applies the identical hash rule.",
    oracle=f"""
WITH RECURSIVE {_SHINGLES_CTE},
posting AS (SELECT doc_id, unnest(sh) AS shingle FROM shf),
rare AS (
  SELECT shingle FROM posting GROUP BY shingle HAVING COUNT(1) <= 50
),
cand AS (
  SELECT DISTINCT p1.doc_id AS a, p2.doc_id AS b
  FROM posting p1
  JOIN rare r ON p1.shingle = r.shingle
  JOIN posting p2 ON p2.shingle = p1.shingle
  WHERE p1.doc_id < p2.doc_id
),
verified AS (
  SELECT c.a, c.b,
         len(list_intersect(sa.sh, sb.sh))
           / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh))) AS jaccard
  FROM cand c
  JOIN shf sa ON sa.doc_id = c.a
  JOIN shf sb ON sb.doc_id = c.b
),
pairs AS (SELECT a, b FROM verified WHERE jaccard >= 0.5),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, rr.r FROM reach rr JOIN edges e ON e.src = rr.node
),
lbl AS (SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
sized AS (
  SELECT doc_id, cluster_id,
         COUNT(1) OVER (PARTITION BY cluster_id) AS cluster_size
  FROM lbl
),
tagged AS (
  SELECT s.doc_id, s.cluster_id, s.cluster_size,
         CASE WHEN ('0x' || substr(md5(s.cluster_id::VARCHAR), 1, 8))::BIGINT
                   % 10 < 8 THEN 'train'
              WHEN ('0x' || substr(md5(s.cluster_id::VARCHAR), 1, 8))::BIGINT
                   % 10 = 8 THEN 'val'
              ELSE 'test' END AS split,
         len(string_split(d.text, ' ')) AS n_tokens
  FROM sized s JOIN documents d USING (doc_id)
)
SELECT split,
       CAST(COUNT(1) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN cluster_size > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS clustered_docs
FROM tagged
GROUP BY split
ORDER BY split
""",
)
def cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    assignment = _shared_cluster_assignment(spark, sf_dir).select(
        "doc_id", "cluster_id", "cluster_size"
    )
    b = (
        F.conv(
            F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 10
    )
    tagged = (
        assignment.withColumn(
            "split",
            F.when(b < 8, "train").when(b == 8, "val").otherwise("test"),
        )
        .join(docs.select("doc_id", "text"), "doc_id")
        .select(
            "split",
            "cluster_id",
            "cluster_size",
            F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        )
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum(
                F.when(F.col("cluster_size") > 1, 1).otherwise(0)
            ).alias("clustered_docs"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# Jaccard threshold sensitivity sweep (round 6)
# ---------------------------------------------------------------------------

_SWEEP_THRESHOLDS_PPM = (250_000, 400_000, 500_000, 600_000, 750_000, 900_000)


@register(
    "dedup_threshold_sweep",
    ops="EXT-dedup-tuning,A3,J4 (threshold sensitivity curve)",
    doc="Threshold-sensitivity curve for near-dup dedup: verify exact "
    "word-3-gram Jaccard once at the loosest setting (>= 0.25, same "
    "shared shingle relation and df<=50 inverted index as the Jaccard "
    "family), then report pair count and affected-doc count at each "
    "candidate threshold from ONE pass of conditional aggregates. The "
    "tuning evidence for picking the production threshold — how many "
    "pairs/docs each notch of strictness gives up.",
    oracle=f"""
WITH {_SHINGLES_CTE},
posting AS (SELECT doc_id, unnest(sh) AS shingle FROM shf),
rare AS (
  SELECT shingle FROM posting GROUP BY shingle HAVING COUNT(1) <= 50
),
cand AS (
  SELECT DISTINCT p1.doc_id AS a, p2.doc_id AS b
  FROM posting p1
  JOIN rare r ON p1.shingle = r.shingle
  JOIN posting p2 ON p2.shingle = p1.shingle
  WHERE p1.doc_id < p2.doc_id
),
verified AS (
  SELECT c.a, c.b,
         len(list_intersect(sa.sh, sb.sh))
           / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh))) AS jaccard
  FROM cand c
  JOIN shf sa ON sa.doc_id = c.a
  JOIN shf sb ON sb.doc_id = c.b
  WHERE len(list_intersect(sa.sh, sb.sh))
          / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh))) >= 0.25
),
thr AS (
  SELECT unnest([{", ".join(str(t) for t in _SWEEP_THRESHOLDS_PPM)}])
    AS threshold_ppm
),
hits AS (
  SELECT t.threshold_ppm, v.a, v.b
  FROM verified v JOIN thr t
    ON v.jaccard * 1000000 >= t.threshold_ppm
),
docs_hit AS (
  SELECT threshold_ppm, doc_id FROM (
    SELECT threshold_ppm, a AS doc_id FROM hits
    UNION
    SELECT threshold_ppm, b FROM hits
  ) u
)
SELECT t.threshold_ppm,
       CAST(COALESCE(p.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(d.n_docs, 0) AS BIGINT) AS docs_affected
FROM thr t
LEFT JOIN (SELECT threshold_ppm, COUNT(1) AS n_pairs FROM hits
           GROUP BY threshold_ppm) p USING (threshold_ppm)
LEFT JOIN (SELECT threshold_ppm, COUNT(DISTINCT doc_id) AS n_docs
           FROM docs_hit GROUP BY threshold_ppm) d USING (threshold_ppm)
ORDER BY t.threshold_ppm
""",
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Loosest verify once (shared shingles + candidate index, memoized
    # across the three tuning consumers); every threshold row is a
    # conditional aggregate over the SAME relation — the sweep costs one
    # verification pass, not six.
    verified = _shared_loose_jaccard_pairs(spark, sf_dir).select(
        "doc_id_1", "doc_id_2", "jaccard"
    )
    thr = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(t) for t in _SWEEP_THRESHOLDS_PPM])
        ).alias("threshold_ppm")
    )
    hits = verified.join(
        F.broadcast(thr),
        F.col("jaccard") * 1_000_000 >= F.col("threshold_ppm"),
    )
    pairs = hits.groupBy("threshold_ppm").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    docs_hit = (
        hits.select("threshold_ppm", F.col("doc_id_1").alias("doc_id"))
        .union(hits.select("threshold_ppm", "doc_id_2"))
        .distinct()
        .groupBy("threshold_ppm")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
    )
    return (
        thr.join(pairs, "threshold_ppm", "left")
        .join(docs_hit, "threshold_ppm", "left")
        .select(
            "threshold_ppm",
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0))
            .cast("bigint")
            .alias("docs_affected"),
        )
        .orderBy("threshold_ppm")
    )


@register(
    "dedup_cluster_density",
    ops="EXT-dedup-cluster-audit,A1,J4 (per-cluster edge density)",
    doc="Cluster cohesion audit over the shared connected components: "
    "per non-singleton duplicate cluster, member count, verified-pair "
    "edge count, and edge density vs the complete graph in integer ppm "
    "(2E*1e6 div n(n-1)). Low-density giants are the classic LSH "
    "false-merge signature (chains through borderline pairs) — this is "
    "the audit that catches them before canonical selection collapses "
    "distinct documents. Reuses the memoized assignment and pair "
    "relations; only cluster-grain rows aggregate.",
    oracle=f"""
WITH RECURSIVE {_SHINGLES_CTE},
posting AS (SELECT doc_id, unnest(sh) AS shingle FROM shf),
rare AS (
  SELECT shingle FROM posting GROUP BY shingle HAVING COUNT(1) <= 50
),
cand AS (
  SELECT DISTINCT p1.doc_id AS a, p2.doc_id AS b
  FROM posting p1
  JOIN rare r ON p1.shingle = r.shingle
  JOIN posting p2 ON p2.shingle = p1.shingle
  WHERE p1.doc_id < p2.doc_id
),
verified AS (
  SELECT c.a, c.b,
         len(list_intersect(sa.sh, sb.sh))
           / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh))) AS jaccard
  FROM cand c
  JOIN shf sa ON sa.doc_id = c.a
  JOIN shf sb ON sb.doc_id = c.b
),
pairs AS (SELECT a, b FROM verified WHERE jaccard >= 0.5),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, rr.r FROM reach rr JOIN edges e ON e.src = rr.node
),
lbl AS (SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
sizes AS (
  SELECT cluster_id, CAST(COUNT(1) AS BIGINT) AS n_members
  FROM lbl GROUP BY cluster_id HAVING COUNT(1) >= 2
),
edge_cl AS (
  SELECT la.cluster_id, CAST(COUNT(1) AS BIGINT) AS n_edges
  FROM pairs p JOIN lbl la ON la.doc_id = p.a
  GROUP BY la.cluster_id
)
SELECT s.cluster_id, s.n_members,
       CAST(COALESCE(e.n_edges, 0) AS BIGINT) AS n_edges,
       CAST(COALESCE(e.n_edges, 0) * 2 * 1000000
            // (s.n_members * (s.n_members - 1)) AS BIGINT) AS density_ppm
FROM sizes s LEFT JOIN edge_cl e USING (cluster_id)
ORDER BY s.cluster_id
""",
)
def dedup_cluster_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    assignment = _shared_cluster_assignment(spark, sf_dir)
    pairs = _shared_relations(spark, sf_dir)["jaccard_pairs"].select(
        F.col("doc_id_1").alias("a"), F.col("doc_id_2").alias("b")
    )
    sizes = (
        assignment.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )
    # Both endpoints of a verified pair share a cluster by construction,
    # so attributing by endpoint a is exact.
    edge_cl = (
        pairs.join(
            assignment.select(F.col("doc_id").alias("a"), "cluster_id"), "a"
        )
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    return (
        sizes.join(edge_cl, "cluster_id", "left")
        .select(
            "cluster_id",
            F.col("n_members").cast("bigint").alias("n_members"),
            F.coalesce("n_edges", F.lit(0)).cast("bigint").alias("n_edges"),
            F.expr(
                "cast((coalesce(n_edges, 0) * 2 * 1000000)"
                " div (n_members * (n_members - 1)) as bigint)"
            ).alias("density_ppm"),
        )
        .orderBy("cluster_id")
    )


@register(
    "dedup_pipeline_funnel",
    ops="EXT-dedup-funnel,A1,A3 (end-to-end dedup stage accounting)",
    doc="The whole dedup pipeline as one accounting query — doc and "
    "token survival through stage 0 (raw), stage 1 (exact: one doc per "
    "normalized fingerprint, min-id canonical), stage 2 (near-dup "
    "APPLIED ON TOP of stage 1: kept docs are exact canonicals that "
    "are also their Jaccard>=0.5 connected-component canonical — "
    "monotone by construction). Normally the composition equals the "
    "cluster-canonical set: exact dups have Jaccard 1, so a cluster "
    "canonical is its fingerprint group's min id unless the exact pair "
    "escaped the df-capped candidate index (all-hot shingles or <3 "
    "tokens), in which case such a cluster conservatively keeps no "
    "doc. The per-stage kept ppm is the headline number a corpus "
    "report quotes; every relation is family-shared (fingerprint "
    "groupBy, memoized components).",
    oracle=f"""
WITH RECURSIVE {_SHINGLES_CTE},
posting AS (SELECT doc_id, unnest(sh) AS shingle FROM shf),
rare AS (
  SELECT shingle FROM posting GROUP BY shingle HAVING COUNT(1) <= 50
),
cand AS (
  SELECT DISTINCT p1.doc_id AS a, p2.doc_id AS b
  FROM posting p1
  JOIN rare r ON p1.shingle = r.shingle
  JOIN posting p2 ON p2.shingle = p1.shingle
  WHERE p1.doc_id < p2.doc_id
),
verified AS (
  SELECT c.a, c.b,
         len(list_intersect(sa.sh, sb.sh))
           / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh))) AS jaccard
  FROM cand c
  JOIN shf sa ON sa.doc_id = c.a
  JOIN shf sb ON sb.doc_id = c.b
),
pairs AS (SELECT a, b FROM verified WHERE jaccard >= 0.5),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, rr.r FROM reach rr JOIN edges e ON e.src = rr.node
),
lbl AS (SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
base AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\\s+')) AS n_tok,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
  FROM documents
),
exact_keep AS (
  SELECT fp, MIN(doc_id) AS keep_id FROM base GROUP BY fp
),
flagged AS (
  SELECT b.doc_id, b.n_tok,
         CASE WHEN e.keep_id = b.doc_id THEN 1 ELSE 0 END AS k1,
         CASE WHEN l.cluster_id = b.doc_id THEN 1 ELSE 0 END AS k2
  FROM base b
  JOIN exact_keep e USING (fp)
  JOIN lbl l USING (doc_id)
),
stages AS (
  SELECT 0 AS stage, 'raw' AS name, COUNT(1) AS docs, SUM(n_tok) AS toks
  FROM flagged
  UNION ALL
  SELECT 1, 'exact', SUM(k1), SUM(k1 * n_tok) FROM flagged
  UNION ALL
  -- stage 2 composes on stage 1 (k1 * k2): monotone even when an exact
  -- dup escapes the df-capped candidate index and sits in its own
  -- singleton cluster (k2=1 while k1=0)
  SELECT 2, 'near_dup', SUM(k1 * k2), SUM(k1 * k2 * n_tok) FROM flagged
),
tot AS (SELECT docs AS d0, toks AS t0 FROM stages WHERE stage = 0)
SELECT CAST(stage AS INT) AS stage, name,
       CAST(docs AS BIGINT) AS docs_kept,
       CAST(toks AS BIGINT) AS tokens_kept,
       CAST(docs * 1000000 // t.d0 AS BIGINT) AS docs_kept_ppm,
       CAST(toks * 1000000 // t.t0 AS BIGINT) AS tokens_kept_ppm
FROM stages, tot t
ORDER BY stage
""",
)
def dedup_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.functions.text import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    assignment = _shared_cluster_assignment(spark, sf_dir)
    base = docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_tok"),
        fingerprint("text").alias("fp"),
    )
    exact_keep = base.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    flagged = (
        base.join(exact_keep, "fp")
        .join(assignment.select("doc_id", "cluster_id"), "doc_id")
        .select(
            "n_tok",
            F.when(F.col("keep_id") == F.col("doc_id"), 1)
            .otherwise(0)
            .alias("k1"),
            F.when(F.col("cluster_id") == F.col("doc_id"), 1)
            .otherwise(0)
            .alias("k2"),
        )
    )
    stages = flagged.agg(
        F.count(F.lit(1)).alias("d0"),
        F.sum("n_tok").alias("t0"),
        F.sum("k1").alias("d1"),
        F.sum(F.col("k1") * F.col("n_tok")).alias("t1"),
        F.sum(F.col("k1") * F.col("k2")).alias("d2"),
        F.sum(F.col("k1") * F.col("k2") * F.col("n_tok")).alias("t2"),
    )
    rows = []
    for stage, name, dc, tc in (
        (0, "raw", "d0", "t0"),
        (1, "exact", "d1", "t1"),
        (2, "near_dup", "d2", "t2"),
    ):
        rows.append(
            stages.select(
                F.lit(stage).cast("int").alias("stage"),
                F.lit(name).alias("name"),
                F.col(dc).cast("bigint").alias("docs_kept"),
                F.col(tc).cast("bigint").alias("tokens_kept"),
                F.expr(f"cast(({dc} * 1000000) div d0 as bigint)").alias(
                    "docs_kept_ppm"
                ),
                F.expr(f"cast(({tc} * 1000000) div t0 as bigint)").alias(
                    "tokens_kept_ppm"
                ),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("stage")


# ---------------------------------------------------------------------------
# LSH band-occupancy diagnostics (round 7)
# ---------------------------------------------------------------------------


@register(
    "lsh_band_occupancy",
    ops="EXT-dedup-minhash,A1 (LSH tuning diagnostics)",
    doc="Band-bucket occupancy audit for the MinHash-LSH index "
    "(dedup_minhash_lsh's 8 bands x 4 rows): per band — bucket count, "
    "docs, singleton buckets (no candidate work), max bucket size (the "
    "skew that bounds in-bucket pair explosion), and the exact "
    "candidate-pair budget sum k*(k-1)/2. THE number to watch before "
    "running LSH at 100 TB: if max_bucket grows super-linearly with the "
    "corpus, the banding needs more rows per band. One extra aggregate "
    "over the family-shared signature relation.",
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
         array_to_string(list_slice(sigs, j.j * 4 + 1, j.j * 4 + 4), ',') AS band_key
  FROM sigs, (SELECT unnest(range(0, 8)) AS j) j
),
occ AS (
  SELECT band_id, band_key, CAST(COUNT(1) AS BIGINT) AS k
  FROM bands GROUP BY band_id, band_key
)
SELECT CAST(band_id AS INT) AS band_id,
       CAST(COUNT(1) AS BIGINT) AS n_buckets,
       CAST(SUM(k) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS singleton_buckets,
       CAST(MAX(k) AS BIGINT) AS max_bucket,
       CAST(SUM(k * (k - 1) // 2) AS BIGINT) AS candidate_pairs
FROM occ
GROUP BY band_id
ORDER BY band_id
""",
)
def lsh_band_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.dedup import (
        lsh_band_rows,
        minhash_signatures,
    )

    sh = _shared_relations(spark, sf_dir)["sh"]
    rows = lsh_band_rows(minhash_signatures(sh, 32), bands=8, r=4)
    occ = rows.groupBy("band_id", "band_key").agg(
        F.count(F.lit(1)).alias("k")
    )
    return (
        occ.groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("k").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("k") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("singleton_buckets"),
            F.max("k").cast("bigint").alias("max_bucket"),
            F.sum(F.expr("k * (k - 1) div 2"))
            .cast("bigint")
            .alias("candidate_pairs"),
        )
        .select(
            F.col("band_id").cast("int").alias("band_id"),
            "n_buckets",
            "n_docs",
            "singleton_buckets",
            "max_bucket",
            "candidate_pairs",
        )
        .orderBy("band_id")
    )


# ---------------------------------------------------------------------------
# Cross-source near-dup rate (round 7)
# ---------------------------------------------------------------------------


@register(
    "dedup_cross_source_rate",
    ops="EXT-dedup-jaccard,A1,J1 (within- vs cross-source dup structure)",
    doc="Where does near-duplication live — inside sources (internal "
    "boilerplate) or across them (syndication/mirrors)? Every verified "
    "Jaccard>=0.5 pair (family-shared relation) is labeled with its "
    "endpoints' sources; the matrix row (source_lo, source_hi, "
    "n_pairs, within flag) plus each row's share of all pairs in ppm. "
    "One join pass over the pair list against the doc->source map — "
    "the curation signal that decides whether dedup should run "
    "per-source (cheap, shardable) or corpus-global (one shuffle "
    "domain).",
    oracle=f"""
WITH {_SHINGLES_CTE},
posting AS (SELECT doc_id, unnest(sh) AS shingle FROM shf),
rare AS (
  SELECT shingle FROM posting GROUP BY shingle HAVING COUNT(1) <= 50
),
cand AS (
  SELECT DISTINCT p1.doc_id AS a, p2.doc_id AS b
  FROM posting p1
  JOIN rare r ON p1.shingle = r.shingle
  JOIN posting p2 ON p2.shingle = p1.shingle
  WHERE p1.doc_id < p2.doc_id
),
verified AS (
  SELECT c.a, c.b,
         len(list_intersect(sa.sh, sb.sh))
           / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh))) AS jaccard
  FROM cand c
  JOIN shf sa ON sa.doc_id = c.a
  JOIN shf sb ON sb.doc_id = c.b
),
pairs AS (SELECT a, b FROM verified WHERE jaccard >= 0.5),
src AS (SELECT doc_id, source FROM documents),
labeled AS (
  SELECT LEAST(xa.source, xb.source) AS source_lo,
         GREATEST(xa.source, xb.source) AS source_hi
  FROM pairs p
  JOIN src xa ON xa.doc_id = p.a
  JOIN src xb ON xb.doc_id = p.b
),
tot AS (SELECT COUNT(1) AS n_total FROM labeled)
SELECT source_lo, source_hi,
       CAST(COUNT(1) AS BIGINT) AS n_pairs,
       source_lo = source_hi AS within_source,
       CAST(COUNT(1) * 1000000 // t.n_total AS BIGINT) AS share_ppm
FROM labeled, tot t
GROUP BY source_lo, source_hi, t.n_total
ORDER BY source_lo, source_hi
""",
)
def dedup_cross_source_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _shared_relations(spark, sf_dir)["jaccard_pairs"].select(
        F.col("doc_id_1").alias("a"), F.col("doc_id_2").alias("b")
    )
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("a"), F.col("source").alias("src_a"))
    sb = src.select(F.col("doc_id").alias("b"), F.col("source").alias("src_b"))
    labeled = (
        pairs.join(F.broadcast(sa), "a")
        .join(F.broadcast(sb), "b")
        .select(
            F.least("src_a", "src_b").alias("source_lo"),
            F.greatest("src_a", "src_b").alias("source_hi"),
        )
    )
    tot = labeled.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        labeled.groupBy("source_lo", "source_hi")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .join(F.broadcast(tot))
        .select(
            "source_lo",
            "source_hi",
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            (F.col("source_lo") == F.col("source_hi")).alias("within_source"),
            F.expr("cast(n_pairs * 1000000 div n_total as bigint)").alias(
                "share_ppm"
            ),
        )
        .orderBy("source_lo", "source_hi")
    )
