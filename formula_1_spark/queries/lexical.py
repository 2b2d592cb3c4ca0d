"""Lexical retrieval queries: TF-IDF document similarity and BM25 search.

Complements the embedding-space similarity family
(``queries/similarity.py``) with the sparse/lexical half of a
training-data pipeline's retrieval needs. Both queries are exact
cross-engine (quantized rational IDF, integer dots, fixed-order float
sums — see ``operators/tfidf.py``), so both carry full value-hash
oracles.

Reference scope note: the reference (uwe-uffuchs/formula-1) has no text
retrieval surface; these are extension operators per SURVEY.md §2's
"beyond the reference" list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.operators.tfidf import (
    BM25_B,
    BM25_K1,
    IDF_SCALE,
    bm25_scores,
    tfidf_topk_pairs,
)
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table, table_row_count

# The three lexical queries all start from the identical corpus
# tokenize -> (doc_id, term, tf) relation and its term-grain IDF; before
# the memo each query rebuilt both per call (rrf_rank_fusion twice: its
# own tf·idf arm plus the bm25_scores call inside it), each behind a
# leaked per-call persist. Memoized per (session, documents identity) as
# lazy localCheckpoints — the lexical twin of dedup._shared_relations.
# Values unaffected: the relations are exactly what each query built
# inline, and every oracle retokenizes from documents.
_LEX_SHARED: dict[tuple, dict[str, DataFrame]] = {}


def _shared_lexical(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    from formula_1_spark.operators.tfidf import doc_terms, idf_table
    from formula_1_spark.queries import memo

    key = memo.file_key(spark, sf_dir, "documents")
    ent = memo.get(_LEX_SHARED, key)
    if ent is None:
        docs = load_table(spark, sf_dir, "documents")
        n = table_row_count(spark, sf_dir, "documents")
        terms = doc_terms(docs).localCheckpoint(eager=False)
        idf = idf_table(terms, n).localCheckpoint(eager=False)
        ent = {"terms": terms, "idf": idf}
        memo.install(_LEX_SHARED, key, ent)
    return ent


# Shared CTE prefix: tokenize -> tf -> df -> quantized rational idf.
_TERMS_CTES = f"""
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(1) AS tf FROM toks GROUP BY doc_id, term),
nd AS (SELECT COUNT(1) AS n FROM documents),
dfs AS (SELECT term, COUNT(1) AS df FROM tf GROUP BY term),
idf AS (
  SELECT term, df, ({IDF_SCALE} * (n + 1)) // (df + 1) AS idf_q FROM dfs, nd
)"""


@register(
    "tfidf_lexical_topk",
    ops="EXT-tfidf,A1,J4,W1 (sparse lexical similarity top-k)",
    doc="Exact TF-IDF cosine top-10 lexical neighbors for each query doc "
    "(doc_id < 10): inverted-index candidate join on shared terms, exact "
    "bigint sparse dot over ALL shared terms, two window ranks. IDF is "
    "the quantized rational (SCALE*(N+1)) div (df+1) — floor division in "
    "both engines — so weights, dots, and norms are exact integers and "
    "the cosine is a bit-identical IEEE double in Spark and DuckDB. The "
    "scale knob (not needed on this corpus) is the max_df candidate cap: "
    "stopword-frequency terms stop generating candidate pairs while "
    "still contributing to surviving pairs' scores.",
    oracle=f"""
WITH {_TERMS_CTES},
w AS (
  SELECT tf.doc_id, tf.term, tf.tf * idf.idf_q AS w
  FROM tf JOIN idf USING (term)
),
norms AS (SELECT doc_id, SUM(w * w) AS n2 FROM w GROUP BY doc_id),
pairs AS (
  SELECT DISTINCT q.doc_id AS query_id, c.doc_id AS neighbor_id
  FROM w q JOIN w c USING (term)
  WHERE q.doc_id < 10 AND c.doc_id <> q.doc_id
),
dots AS (
  SELECT p.query_id, p.neighbor_id, SUM(a.w * b.w) AS dot
  FROM pairs p
  JOIN w a ON a.doc_id = p.query_id
  JOIN w b ON b.doc_id = p.neighbor_id AND b.term = a.term
  GROUP BY p.query_id, p.neighbor_id
),
scored AS (
  SELECT d.query_id, d.neighbor_id,
         CAST(d.dot AS DOUBLE)
           / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos
  FROM dots d
  JOIN norms na ON na.doc_id = d.query_id
  JOIN norms nb ON nb.doc_id = d.neighbor_id
)
SELECT query_id, neighbor_id, cos, CAST(rk AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rk
  FROM scored
) WHERE rk <= 10
""",
)
def tfidf_lexical_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = table_row_count(spark, sf_dir, "documents")
    ent = _shared_lexical(spark, sf_dir)
    return tfidf_topk_pairs(
        docs,
        F.col("doc_id") < 10,
        k=10,
        n_docs=n,
        terms=ent["terms"],
        idf=ent["idf"],
    )


_QUERY_TERMS = ("spark", "query", "join")
# Inline the exact Python doubles (repr round-trips) so both engines
# compute with literally the same IEEE constants.
_K1P1 = BM25_K1 + 1.0
_ONE_MINUS_B = 1.0 - BM25_B


@register(
    "bm25_corpus_search",
    ops="EXT-bm25,A1,J1,W2 (ranked corpus search, two-phase top-k)",
    doc=f"BM25 top-15 documents for the fixed query {_QUERY_TERMS} "
    "(k1=1.2, b=0.75, quantized rational IDF). Per-term partial scores "
    "are doubles built only from exact integers (tf, dl, idf_q, exact "
    "rational avgdl) and summed in the FIXED literal term order via "
    "conditional aggregation — never an accumulation-order-dependent "
    "float SUM — so scores are bit-identical cross-engine. The global "
    "top-k is the two-phase per-partition-prune -> tiny-merge pattern, "
    "not a single-partition window.",
    oracle=f"""
WITH {_TERMS_CTES},
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
tot AS (SELECT SUM(dl) AS total_len FROM dl),
matched AS (
  SELECT tf.doc_id, tf.term, tf.tf, dl.dl
  FROM tf JOIN dl USING (doc_id)
  WHERE tf.term IN {_QUERY_TERMS!r}
),
part AS (
  SELECT m.doc_id, m.term, m.dl,
         CAST(i.idf_q AS DOUBLE)
           * (CAST(m.tf AS DOUBLE) * CAST({_K1P1!r} AS DOUBLE))
           / (CAST(m.tf AS DOUBLE)
              + CAST({BM25_K1!r} AS DOUBLE)
                * (CAST({_ONE_MINUS_B!r} AS DOUBLE)
                   + CAST({BM25_B!r} AS DOUBLE) * CAST(m.dl AS DOUBLE)
                     / (CAST(t.total_len AS DOUBLE) / CAST(n.n AS DOUBLE))))
           AS part
  FROM matched m
  JOIN idf i USING (term), tot t, nd n
),
piv AS (
  SELECT doc_id, dl,
         MAX(CASE WHEN term = '{_QUERY_TERMS[0]}' THEN part END) AS s_0,
         MAX(CASE WHEN term = '{_QUERY_TERMS[1]}' THEN part END) AS s_1,
         MAX(CASE WHEN term = '{_QUERY_TERMS[2]}' THEN part END) AS s_2
  FROM part GROUP BY doc_id, dl
),
scored AS (
  SELECT doc_id, dl,
         0.0 + COALESCE(s_0, 0.0) + COALESCE(s_1, 0.0) + COALESCE(s_2, 0.0)
           AS score
  FROM piv
)
SELECT doc_id, dl, score, CAST(rk AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rk
  FROM scored
) WHERE rk <= 15
""",
)
def bm25_corpus_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = table_row_count(spark, sf_dir, "documents")
    ent = _shared_lexical(spark, sf_dir)
    return bm25_scores(
        docs,
        list(_QUERY_TERMS),
        k=15,
        n_docs=n,
        terms=ent["terms"],
        idf=ent["idf"],
    )


_PPM = 1_000_000

_RRF_K = 60  # standard RRF damping constant (Cormack et al., SIGIR 2009)
_FUSE_TOPK = 50  # depth of each input ranking


@register(
    "rrf_rank_fusion",
    ops="EXT-rrf,J1,W2 (reciprocal-rank fusion of two retrieval signals)",
    doc=f"Reciprocal-rank fusion (RRF, k={_RRF_K}) of two rankings of "
    f"the corpus for the fixed query {_QUERY_TERMS}: BM25 top-"
    f"{_FUSE_TOPK} and a plain integer tf x idf_q sum top-{_FUSE_TOPK}. "
    "Each input ranking is an exact two-phase global top-k; the fused "
    "relation is bounded at 2k rows, so the final re-rank is another "
    "two-phase pass over a tiny relation. rrf_ppm = sum over lists of "
    "1e6 div (60 + rank), with 0 for a list the doc missed (rank "
    "sentinel 0) — pure integer math, bit-exact cross-engine.",
    oracle=f"""
WITH {_TERMS_CTES},
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
tot AS (SELECT SUM(dl) AS total_len FROM dl),
matched AS (
  SELECT tf.doc_id, tf.term, tf.tf, dl.dl
  FROM tf JOIN dl USING (doc_id)
  WHERE tf.term IN {_QUERY_TERMS!r}
),
part AS (
  SELECT m.doc_id, m.term, m.dl,
         CAST(i.idf_q AS DOUBLE)
           * (CAST(m.tf AS DOUBLE) * CAST({_K1P1!r} AS DOUBLE))
           / (CAST(m.tf AS DOUBLE)
              + CAST({BM25_K1!r} AS DOUBLE)
                * (CAST({_ONE_MINUS_B!r} AS DOUBLE)
                   + CAST({BM25_B!r} AS DOUBLE) * CAST(m.dl AS DOUBLE)
                     / (CAST(t.total_len AS DOUBLE) / CAST(n.n AS DOUBLE))))
           AS part
  FROM matched m
  JOIN idf i USING (term), tot t, nd n
),
piv AS (
  SELECT doc_id,
         MAX(CASE WHEN term = '{_QUERY_TERMS[0]}' THEN part END) AS s_0,
         MAX(CASE WHEN term = '{_QUERY_TERMS[1]}' THEN part END) AS s_1,
         MAX(CASE WHEN term = '{_QUERY_TERMS[2]}' THEN part END) AS s_2
  FROM part GROUP BY doc_id
),
bm AS (
  SELECT doc_id, CAST(rk AS BIGINT) AS r_bm25
  FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY
      0.0 + COALESCE(s_0, 0.0) + COALESCE(s_1, 0.0) + COALESCE(s_2, 0.0)
        DESC, doc_id ASC) AS rk
    FROM piv
  ) WHERE rk <= {_FUSE_TOPK}
),
ti AS (
  SELECT doc_id, CAST(rk AS BIGINT) AS r_tfidf
  FROM (
    SELECT m.doc_id, ROW_NUMBER() OVER (
      ORDER BY SUM(m.tf * i.idf_q) DESC, m.doc_id ASC) AS rk
    FROM matched m JOIN idf i USING (term)
    GROUP BY m.doc_id
  ) WHERE rk <= {_FUSE_TOPK}
),
fused AS (
  SELECT COALESCE(b.doc_id, t.doc_id) AS doc_id,
         COALESCE(b.r_bm25, 0) AS bm25_rank,
         COALESCE(t.r_tfidf, 0) AS tfidf_rank,
         COALESCE({_PPM} // ({_RRF_K} + b.r_bm25), 0)
           + COALESCE({_PPM} // ({_RRF_K} + t.r_tfidf), 0) AS rrf_ppm
  FROM bm b FULL OUTER JOIN ti t ON b.doc_id = t.doc_id
)
SELECT doc_id, bm25_rank, tfidf_rank,
       CAST(rrf_ppm AS BIGINT) AS rrf_ppm,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf_ppm DESC, doc_id ASC)
            AS BIGINT) AS fused_rank
FROM fused
ORDER BY fused_rank
""",
)
def rrf_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.windows import two_phase_global_topk

    docs = load_table(spark, sf_dir, "documents")
    n = table_row_count(spark, sf_dir, "documents")
    qt = list(_QUERY_TERMS)
    ent = _shared_lexical(spark, sf_dir)

    bm = bm25_scores(
        docs, qt, k=_FUSE_TOPK, n_docs=n, terms=ent["terms"], idf=ent["idf"]
    ).select("doc_id", F.col("rank").cast("bigint").alias("r_bm25"))

    terms = ent["terms"]
    idf = ent["idf"].filter(F.col("term").isin(qt))
    ti_scored = (
        terms.filter(F.col("term").isin(qt))
        .join(F.broadcast(idf.select("term", "idf_q")), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("idf_q")).alias("score2"))
    )
    ti = two_phase_global_topk(
        ti_scored,
        [F.desc("score2"), F.asc("doc_id")],
        _FUSE_TOPK,
        alias="rk",
        unique_order=True,
    ).select("doc_id", F.col("rk").cast("bigint").alias("r_tfidf"))

    rrf = F.coalesce(
        F.expr(f"{_PPM} div ({_RRF_K} + r_bm25)"), F.lit(0)
    ) + F.coalesce(F.expr(f"{_PPM} div ({_RRF_K} + r_tfidf)"), F.lit(0))
    fused = bm.join(ti, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("r_bm25", F.lit(0)).alias("bm25_rank"),
        F.coalesce("r_tfidf", F.lit(0)).alias("tfidf_rank"),
        rrf.cast("bigint").alias("rrf_ppm"),
    )
    # Bounded re-rank: the fused relation holds at most 2k rows at ANY
    # corpus scale, so a second two-phase pass is effectively free.
    return two_phase_global_topk(
        fused,
        [F.desc("rrf_ppm"), F.asc("doc_id")],
        2 * _FUSE_TOPK,
        alias="fused_rank",
        unique_order=True,
    ).withColumn(
        "fused_rank", F.col("fused_rank").cast("bigint")
    ).orderBy("fused_rank")
