"""Lexical relevance operators: TF-IDF document similarity and BM25 search.

The embedding-space paths (``operators/similarity.py``) cover semantic
retrieval; these cover the *lexical* half every training-data pipeline
also needs (query-document retrieval for decontamination audits,
sparse near-dup scoring, corpus search).

Cross-engine exactness: a float ``ln``-based IDF is not reproducible
between libms (JVM ``Math.log`` and DuckDB's libm may differ in the last
ulp), so the IDF here is the *quantized rational* inverse document
frequency

    idf_q(t) = (IDF_SCALE * (N + 1)) // (df(t) + 1)        (bigint)

— monotone in df like the log form, but exact integer arithmetic in both
engines. Weights ``w = tf * idf_q`` are bigints; dots and squared norms
are bigint sums (bounded: tf <= doc length, idf_q <= IDF_SCALE * (N+1)/2,
so with IDF_SCALE = 1e3 the squared terms stay far under 2^63 for any
corpus this engine's testdata reaches — at larger N, lower IDF_SCALE or
lift the sums to ``decimal(38,0)``); the final cosine divides exact
integers through correctly-rounded IEEE double ops, hence bit-identical
in Spark and DuckDB.

Scale design (100 TB): the only shuffles are (a) the explode→groupBy
that builds the doc-term relation — map-side partial aggregation, O(tokens)
once, (b) the term-keyed candidate join — bounded by ``max_df`` (an
inverted index keyed on every term degenerates on stopwords; candidates
come from terms under the cap, scoring still uses ALL shared terms of
surviving pairs), and (c) the pair-keyed score aggregation, O(candidate
pairs x shared terms). No all-pairs stage, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

IDF_SCALE = 1_000

# BM25 constants (Robertson et al.); fixed so the oracle can inline them.
BM25_K1 = 1.2
BM25_B = 0.75


def doc_terms(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(doc_id, term, tf)`` from single-space-tokenized text — one
    explode + one map-side-combined groupBy."""
    from formula_1_spark.sources.tables import fan_out

    toks = fan_out(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    return toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))


def idf_table(terms: DataFrame, n_docs: int) -> DataFrame:
    """Per-term quantized rational IDF (see module docstring). Integer
    ``div`` — exact floor division in both engines (DuckDB ``//``),
    never a rounded double quotient."""
    return terms.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    ).withColumn(
        "idf_q", F.expr(f"{IDF_SCALE * (n_docs + 1)}L div (df + 1)")
    )


def tfidf_topk_pairs(
    docs: DataFrame,
    query_pred: Column,
    k: int = 10,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_docs: int | None = None,
    terms: DataFrame | None = None,
    idf: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` lexically-similar documents for every query doc
    (``query_pred`` selects the query set) by exact TF-IDF cosine.

    Candidates come from the inverted index over terms with
    ``df <= max_df`` (None = no cap — only sane on small corpora or
    post-stopword-strip corpora; at scale set the cap so bucket sizes
    stay bounded). Scoring of surviving pairs uses all shared terms.

    ``terms``/``idf`` short-circuit the tokenize→tf and df→idf builds
    with the lexical family's session-memoized relations — the three
    registered lexical queries otherwise rebuild the identical corpus
    tokenization per call. All per-call reuse barriers here (fallback
    ``terms``, the weighted relation ``w``) are lazy localCheckpoints, so
    repeated calls leak nothing: blocks are GC-freed once the caller's
    result DataFrame drops (a per-call ``persist()`` would accumulate in
    the CacheManager for the session's lifetime — the r11 ADVICE leak).
    """
    if n_docs is None:
        n_docs = docs.count()  # fallback; callers pass the memoized count
    if terms is None:
        # localCheckpoint, not persist (r11 ADVICE): a per-call persist is
        # never released in a long-lived session; checkpoint blocks are
        # GC-freed once the caller's result DataFrame drops.
        terms = doc_terms(docs, id_col, text_col).localCheckpoint(eager=False)
    if idf is None:
        idf = idf_table(terms, n_docs)

    w = (
        terms.join(idf.select("term", "df", "idf_q"), "term")
        .withColumn("w", F.col("tf") * F.col("idf_q"))
        .localCheckpoint(eager=False)  # 4 consumers below; GC-freed
    )
    norms = w.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))

    q_ids = docs.filter(query_pred).select(F.col(id_col).alias("doc_id"))
    qw = w.join(F.broadcast(q_ids), "doc_id")

    cand_terms = w if max_df is None else w.filter(F.col("df") <= max_df)
    q_cand = qw if max_df is None else qw.filter(F.col("df") <= max_df)
    pairs = (
        q_cand.select(F.col("doc_id").alias("query_id"), "term")
        .join(
            cand_terms.select(F.col("doc_id").alias("neighbor_id"), "term"),
            "term",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )

    # Exact sparse dot over ALL shared terms of each candidate pair.
    dots = (
        pairs.join(
            qw.select(F.col("doc_id").alias("query_id"), "term", F.col("w").alias("wq")),
            "query_id",
        )
        .join(
            w.select(
                F.col("doc_id").alias("neighbor_id"),
                "term",
                F.col("w").alias("wn"),
            ),
            ["neighbor_id", "term"],
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("wq") * F.col("wn")).alias("dot"))
    )
    scored = (
        dots.join(
            norms.select(F.col("doc_id").alias("query_id"), F.col("n2").alias("qn2")),
            "query_id",
        )
        .join(
            norms.select(
                F.col("doc_id").alias("neighbor_id"), F.col("n2").alias("nn2")
            ),
            "neighbor_id",
        )
        .withColumn(
            "cos",
            F.col("dot").cast("double")
            / (F.sqrt(F.col("qn2").cast("double")) * F.sqrt(F.col("nn2").cast("double"))),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.desc("cos"), F.asc("neighbor_id")
        )
    )
    return (
        scored.withColumn("rank", rk)
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 15,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_docs: int | None = None,
    terms: DataFrame | None = None,
    idf: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents for a fixed term query under BM25
    (k1=1.2, b=0.75, quantized rational IDF).

    Determinism: per-term partial scores are doubles computed from exact
    integers (tf, dl, idf_q) and the exact rational avgdl, then summed in
    the FIXED literal order of ``query_terms`` via conditional
    aggregation — never a float SUM whose accumulation order floats.

    ``terms``/``idf`` short-circuit the corpus tokenize/idf builds with
    the family-memoized relations (see ``tfidf_topk_pairs``).
    """
    if n_docs is None:
        n_docs = docs.count()  # fallback; callers pass the memoized count
    if terms is None:
        terms = doc_terms(docs, id_col, text_col).persist()
    dl = terms.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    total_len = dl.agg(F.sum("dl").alias("total_len"))  # 1 row

    qt = [t for t in query_terms]
    matched = (
        terms.filter(F.col("term").isin(qt))
        .join(dl, "doc_id")
        .join(F.broadcast(total_len), F.lit(True))
    )
    if idf is None:
        idf = idf_table(terms, n_docs)
    idf = idf.filter(F.col("term").isin(qt))
    matched = matched.join(F.broadcast(idf.select("term", "idf_q")), "term")

    # avgdl as the exact rational total_len / n_docs (double division of
    # exact integers — correctly rounded, identical in both engines).
    avgdl = F.col("total_len").cast("double") / F.lit(float(n_docs))
    tf_d = F.col("tf").cast("double")
    part = (
        F.col("idf_q").cast("double")
        * (tf_d * F.lit(BM25_K1 + 1.0))
        / (
            tf_d
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl").cast("double") / avgdl)
        )
    )
    per_term = matched.withColumn("part", part)

    # Fixed-order sum: one conditional-max column per literal query term.
    pivoted = per_term.groupBy("doc_id", "dl").agg(
        *[
            F.max(F.when(F.col("term") == t, F.col("part"))).alias(f"s_{i}")
            for i, t in enumerate(qt)
        ]
    )
    score: Column = F.lit(0.0)
    for i in range(len(qt)):
        score = score + F.coalesce(F.col(f"s_{i}"), F.lit(0.0))
    scored = pivoted.withColumn("score", score)
    # Two-phase global top-k (per-partition prune -> tiny global merge);
    # (score desc, doc_id asc) is a total order so rank == row_number.
    from formula_1_spark.operators.windows import two_phase_global_topk

    top = two_phase_global_topk(
        scored, [F.desc("score"), F.asc("doc_id")], k, alias="rank",
        unique_order=True,
    )
    return top.select(
        "doc_id", "dl", "score", F.col("rank").cast("int").alias("rank")
    )
