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
    exact_dedup,
    minhash_coeffs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table

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
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


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
    return minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


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
    return simhash_pairs(load_table(spark, sf_dir, "documents"))


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
    from formula_1_spark.operators.graph import dedup_cluster_assignment

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs).select(
        F.col("doc_id_1").alias("a"), F.col("doc_id_2").alias("b")
    )
    return dedup_cluster_assignment(docs, pairs)


@register(
    "dedup_embedding_cosine",
    ops="EXT-dedup-embedding,J4",
    doc="Embedding-cosine near-dup pairs (cosine >= 0.45): exact "
    "broadcast all-pairs at this corpus size; vectors are unit-normalized "
    "and flattened to scalar columns ONCE per side so the per-pair work "
    "is a codegen'd multiply-add chain (no per-pair array access or "
    "interpreted HOF fold — measured 59s -> 17s -> ~1s at sf0.1). At "
    "scale the candidate stage swaps to banded hyperplane LSH with the "
    "same exact re-verification.",
    oracle="""
WITH unit AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)
           / sqrt(list_reduce(
               list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),
               (acc, v) -> acc + v))) AS u
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
         list_reduce(list_transform(list_zip(a.u, b.u), x -> x[1] * x[2]),
                     (acc, v) -> acc + v) AS cos
  FROM unit a, unit b
  WHERE a.vec_id < b.vec_id
)
SELECT vec_id_1, vec_id_2, cos FROM pairs WHERE cos >= 0.45
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from formula_1_spark.functions.vectors import flat_dot, flatten_vec, norm
    from formula_1_spark.sources.tables import fan_out

    dims = 64
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    # Normalize ONCE per row and persist BEFORE flattening: the norm (an
    # interpreted HOF fold) must be materialized as a plain column, or
    # CollapseProject re-inlines the whole fold into every one of the 64
    # element columns (64x the work, measured ~8s of pure interpretation).
    # Both pair sides then flatten from the same cached base — per-element
    # `element_at(embedding, d) / na` divides exactly like the oracle's
    # unit CTE, so values stay bit-identical.
    base = emb.select(
        F.col("vec_id"), F.col("embedding"), norm(F.col("embedding")).alias("na")
    ).persist()
    a = base.select(
        F.col("vec_id").alias("vec_id_1"),
        *flatten_vec("x", F.col("embedding"), dims, denom=F.col("na")),
    )
    b = base.select(
        F.col("vec_id").alias("vec_id_2"),
        *flatten_vec("y", F.col("embedding"), dims, denom=F.col("na")),
    )
    # The embeddings relation is the smallest table — broadcast one side;
    # the all-pairs comparison runs map-side. The flat multiply-add chain
    # codegens and adds left-to-right in element order, bit-identical to
    # the oracle's list_reduce fold.
    pairs = a.join(F.broadcast(b), F.col("vec_id_1") < F.col("vec_id_2"))
    return (
        pairs.withColumn("cos", flat_dot("x", "y", dims))
        .filter(F.col("cos") >= 0.45)
        .select("vec_id_1", "vec_id_2", "cos")
    )
