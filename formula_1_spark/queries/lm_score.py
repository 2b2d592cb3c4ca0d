"""N-gram language-model scoring: a perplexity proxy as pure Column math.

The classic data-quality filter (CCNet, Gopher/MassiveText, RefinedWeb)
scores each document by the perplexity of a small n-gram LM and drops the
tails. This module implements the Spark-native version of that filter with
a word-bigram LM trained ON the corpus itself in the same plan:

* ``c_bg(w1,w2)`` and prefix totals ``c_pre(w1)`` come from aggregates
  over the doc×bigram relation (the prefix total is a two-level hash
  aggregate over the bigram-TYPE relation joined back on ``w1`` —
  vocabulary-grain, never the token stream, and no hot-prefix window
  partition a stopword ``w1`` could pin to one core).
* Per-bigram add-one-smoothed probability ``p = (c_bg+1)/(c_pre+V)``.
* Cross-entropy is accumulated in INTEGER BITS: ``floor(log2(1/p)) =
  length(bin((c_pre+V) div (c_bg+1))) - 1`` — exact in both engines
  (``floor(log2(a div b)) == floor(log2(a/b))`` for positive ints), so
  the score needs no float ``ln`` whose last ulp differs between libm
  implementations and would make rank boundaries flaky cross-engine.
* Doc score = total bits / n_bigrams on a millibit grid — high
  bits/token ⇒ surprising under the corpus LM ⇒ boilerplate/garbled text.

Scale notes (100 TB): the heavy relations are bigram-TYPE grain (|vocab|²
bounded, Heaps-sublinear in practice), not token grain; the doc-side join
key (w1,w2) is Zipf-skewed and relies on AQE skew-join splitting; the
top-k is ``TakeOrderedAndProject`` (per-partition heads + driver merge of
k rows), never a global sort.

Reference scope note: the reference (uwe-uffuchs/formula-1) has no text
scoring; extension per SURVEY.md §2's training-data-pipeline list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import fan_out, load_table

_TOP_K = 50


@register(
    "ngram_lm_surprisal",
    ops="EXT-lm-perplexity-proxy,A1,W1,J1,O3 (bigram LM quality score)",
    doc="Perplexity-proxy quality scoring: corpus-trained word-bigram LM "
    "with add-one smoothing, per-doc cross-entropy in exact integer bits "
    "(floor-log2 via bin-length, no float ln), millibits-per-token on an "
    "integer grid, top-50 most-surprising docs. All counting runs at "
    "bigram-TYPE grain; the doc join is (w1,w2)-keyed with AQE skew "
    "splitting; top-k is TakeOrderedAndProject.",
    oracle=f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
bg AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
         unnest(list_transform(range(1, len(t)), i -> t[i + 1])) AS w2
  FROM toks WHERE len(t) >= 2
),
dbg AS (
  SELECT doc_id, w1, w2, CAST(COUNT(1) AS BIGINT) AS c_in_doc
  FROM bg GROUP BY doc_id, w1, w2
),
cbg AS (
  SELECT w1, w2, CAST(SUM(c_in_doc) AS BIGINT) AS c_bg
  FROM dbg GROUP BY w1, w2
),
cbg2 AS (
  SELECT w1, w2, c_bg,
         CAST(SUM(c_bg) OVER (PARTITION BY w1) AS BIGINT) AS c_pre
  FROM cbg
),
voc AS (SELECT CAST(COUNT(DISTINCT w2) AS BIGINT) AS v FROM bg),
scored AS (
  SELECT d.doc_id, d.c_in_doc,
         (c.c_pre + voc.v) // (c.c_bg + 1) AS ratio
  FROM dbg d JOIN cbg2 c ON d.w1 = c.w1 AND d.w2 = c.w2, voc
),
doc AS (
  SELECT doc_id,
         CAST(SUM(c_in_doc) AS BIGINT) AS n_bigrams,
         CAST(SUM(c_in_doc * (length(bin(ratio)) - 1)) AS BIGINT)
           AS total_bits
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_bigrams, total_bits,
       CAST((total_bits * 1000) // n_bigrams AS BIGINT)
         AS millibits_per_token
FROM doc
ORDER BY millibits_per_token DESC, doc_id ASC
LIMIT {_TOP_K}
""",
)
def ngram_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = doc_surprisal(spark, sf_dir)
    return (
        doc.withColumn(
            "millibits_per_token", F.expr("(total_bits * 1000) div n_bigrams")
        )
        .orderBy(F.desc("millibits_per_token"), F.asc("doc_id"))
        .limit(_TOP_K)
        .select("doc_id", "n_bigrams", "total_bits", "millibits_per_token")
    )


def doc_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bigram cross-entropy relation (doc_id, n_bigrams,
    total_bits) — the full-corpus LM scoring shared by the registered
    top-k view and the correlation audit."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    ).filter(F.size("t") >= 2)
    # (doc_id, w1, w2) consecutive-pair rows. t[i] is 0-based here vs
    # 1-based in the DuckDB oracle — both enumerate pairs (token_j,
    # token_j+1) for j = 0..n-2.
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    dbg = bg.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("c_in_doc"))
    # Corpus bigram counts derive from dbg (sum of per-doc counts), so the
    # token stream shuffles ONCE; the prefix total is a window over the
    # bigram-TYPE relation — vocabulary-grain, spillable, never the docs.
    cbg = dbg.groupBy("w1", "w2").agg(F.sum("c_in_doc").alias("c_bg"))
    # Prefix totals as a two-level aggregate (map-side partials -> tiny
    # w1-grain merge) joined back on w1, NOT a Window.partitionBy("w1"):
    # a window must colocate every bigram type sharing a hot prefix
    # ("the", ...) in ONE unsplittable partition, while the hash
    # aggregate merges <= num_partitions partial sums per w1 and the
    # w1-keyed join back is AQE-skew-splittable.
    c_pre_tbl = cbg.groupBy("w1").agg(F.sum("c_bg").alias("c_pre"))
    cbg2 = cbg.join(c_pre_tbl, "w1")
    voc = bg.agg(F.count_distinct("w2").alias("v"))
    scored = (
        dbg.join(cbg2, ["w1", "w2"])
        .crossJoin(F.broadcast(voc))
        .withColumn("ratio", F.expr("(c_pre + v) div (c_bg + 1)"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("c_in_doc").alias("n_bigrams"),
        F.sum(
            F.col("c_in_doc") * (F.length(F.bin(F.col("ratio"))) - 1).cast("bigint")
        ).alias("total_bits"),
    )


# ---------------------------------------------------------------------------
# Does the LM filter agree with the heuristic quality score? (round 6)
# ---------------------------------------------------------------------------

_LM_CTES = """
WITH toks AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
bg AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
         unnest(list_transform(range(1, len(t)), i -> t[i + 1])) AS w2
  FROM toks WHERE len(t) >= 2
),
dbg AS (
  SELECT doc_id, w1, w2, CAST(COUNT(1) AS BIGINT) AS c_in_doc
  FROM bg GROUP BY doc_id, w1, w2
),
cbg AS (
  SELECT w1, w2, CAST(SUM(c_in_doc) AS BIGINT) AS c_bg
  FROM dbg GROUP BY w1, w2
),
cbg2 AS (
  SELECT w1, w2, c_bg,
         CAST(SUM(c_bg) OVER (PARTITION BY w1) AS BIGINT) AS c_pre
  FROM cbg
),
voc AS (SELECT CAST(COUNT(DISTINCT w2) AS BIGINT) AS v FROM bg),
lm_scored AS (
  SELECT d.doc_id, d.c_in_doc,
         (c.c_pre + voc.v) // (c.c_bg + 1) AS ratio
  FROM dbg d JOIN cbg2 c ON d.w1 = c.w1 AND d.w2 = c.w2, voc
),
doc AS (
  SELECT doc_id,
         CAST(SUM(c_in_doc) AS BIGINT) AS n_bigrams,
         CAST(SUM(c_in_doc * (length(bin(ratio)) - 1)) AS BIGINT)
           AS total_bits
  FROM lm_scored GROUP BY doc_id
)
"""


@register(
    "surprisal_quality_correlation",
    ops="EXT-lm-quality-audit,A1 (exact-sufficient-statistics Pearson r)",
    doc="Cross-family calibration audit: does the bigram-LM surprisal "
    "filter agree with the cheap distinct-token quality proxy? Pearson "
    "r between per-doc millibits-per-token and distinct-token ppm from "
    "EXACT decimal(38,0) sufficient statistics (n, Σx, Σy, Σxy, Σx², "
    "Σy² — map-side combinable, no streaming-float corr), one identical "
    "double formula both engines. On real corpora repetitive docs are "
    "low-surprisal AND low-distinct (positive r); near-zero r on the "
    "synthetic corpus means the two filters are complementary there.",
    oracle=_LM_CTES
    + """,
pts AS (
  SELECT d.doc_id,
         (d.total_bits * 1000) // d.n_bigrams AS x,
         len(list_distinct(string_split(t2.text, ' '))) * 1000000
           // len(string_split(t2.text, ' ')) AS y
  FROM doc d JOIN documents t2 USING (doc_id)
),
stats AS (
  SELECT CAST(COUNT(1) AS BIGINT) AS n_docs,
         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
         SUM(CAST(y AS DECIMAL(38,0))) AS sy,
         SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
         SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
         SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
  FROM pts
)
SELECT n_docs,
       CAST(sx AS BIGINT) AS sum_surprisal,
       CAST(sy AS BIGINT) AS sum_quality,
       (n_docs * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (sqrt(n_docs * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(n_docs * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         AS pearson_r
FROM stats
""",
)
def surprisal_quality_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    doc = doc_surprisal(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    quality = docs.select(
        "doc_id",
        F.expr(
            "CAST(size(array_distinct(split(text, ' '))) * 1000000"
            " div size(split(text, ' ')) AS BIGINT)"
        ).alias("y"),
    )
    pts = doc.select(
        "doc_id", F.expr("(total_bits * 1000) div n_bigrams").alias("x")
    ).join(quality, "doc_id")
    d = lambda c: F.col(c).cast("decimal(38,0)")
    stats = pts.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(d("x")).alias("sx"),
        F.sum(d("y")).alias("sy"),
        F.sum(d("x") * F.col("y")).alias("sxy"),
        F.sum(d("x") * F.col("x")).alias("sxx"),
        F.sum(d("y") * F.col("y")).alias("syy"),
    )
    dd = lambda c: F.col(c).cast("double")
    n = F.col("n_docs")
    r = (n * dd("sxy") - dd("sx") * dd("sy")) / (
        F.sqrt(n * dd("sxx") - dd("sx") * dd("sx"))
        * F.sqrt(n * dd("syy") - dd("sy") * dd("sy"))
    )
    return stats.select(
        "n_docs",
        F.col("sx").cast("bigint").alias("sum_surprisal"),
        F.col("sy").cast("bigint").alias("sum_quality"),
        r.alias("pearson_r"),
    )
